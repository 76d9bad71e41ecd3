package graft.operators

import graft.functions.VectorFns
import graft.rng.Rng

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceKnn`: exact top-k by cosine for a (small, broadcast) query
  *    set against the full corpus — the correctness baseline; scales linearly
  *    in corpus size with zero shuffle beyond the final per-query top-k.
  *  - `lshKnn`: random-hyperplane LSH — corpus is bucketed by a `planes`-bit
  *    signature; queries only compare within matching buckets (equi-join on
  *    the signature), turning O(n*q) into O(bucket*q). Hyperplanes are
  *    derived from a seed via the same stateless hash as the generation
  *    engine, so signatures are deterministic on any cluster.
  */
object Similarity {

  /** Exact cosine top-k: every query row against every corpus row, then a
    * per-query window rank. `queries` is expected to be small (broadcast). */
  def bruteForceKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val prep = (df: DataFrame) =>
      df.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
        .withColumn("n2", VectorFns.norm2Q(col("qv")))
    val c = prep(corpus).as("c")
    val q = prep(queries).as("q")
    val joined = broadcast(q).crossJoin(c)
      .filter(col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        VectorFns.cosinePre(col("q.qv"), col("q.n2"), col("c.qv"), col("c.n2")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Hard-negative mining for contrastive training: per anchor, the `k`
    * MOST SIMILAR corpus vectors carrying a DIFFERENT label — the negatives
    * that actually move a contrastive loss (uniform negatives like
    * [[negativeSample]] saturate early; the hard ones define the margin).
    * Same exact-cosine scoring as [[bruteForceKnn]], with the
    * label-mismatch filter BEFORE the per-anchor rank so the top-k ranges
    * over true negatives only. At corpus scale swap the brute crossJoin for
    * the IVF probe — the ranking contract is unchanged (shortlist ⊇ top-k). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val prep = (df: DataFrame) =>
      df.select(col(idCol), col(labelCol).cast("long").as("lbl"),
        VectorFns.quantize(col(vecCol)).as("qv"))
        .withColumn("n2", VectorFns.norm2Q(col("qv")))
    val c = prep(corpus).as("c")
    val q = prep(queries).as("q")
    val joined = broadcast(q).crossJoin(c)
      .filter(col("q.lbl") =!= col("c.lbl"))
      .select(
        col(s"q.$idCol").as("anchor_id"),
        col(s"c.$idCol").as("negative_id"),
        col("c.lbl").as("neg_label"),
        VectorFns.cosinePre(col("q.qv"), col("q.n2"), col("c.qv"), col("c.n2")).as("cosine"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("negative_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("negative_id"),
        col("neg_label"), col("cosine"))
  }

  /** ±1 hyperplane weight for (seed, plane, dim): bit 0 of the md5-derived
    * 60-bit hash of "lsh:seed:h:d" — deterministic on any cluster AND
    * expressible in plain SQL (`('0x'||substr(md5(...),1,15))::BIGINT & 1`),
    * so LSH bucketing itself is oracle-checkable. */
  def hyperplaneWeight(seed: Long, h: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"lsh:$seed:$h:$d".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xf0L) >> 4)
    if ((v & 1L) == 1L) 1L else -1L
  }

  /** Deterministic random-hyperplane signature: bit h = sign of the dot
    * product with a ±1 hyperplane derived from (seed, h, dim). Weights are
    * driver-computed literals — pure config, nothing shipped. */
  def lshSignature(vec: Column, planes: Int, seed: Long, dims: Int): Column = {
    val qv = VectorFns.quantize(vec)
    (0 until planes).map { h =>
      val weights = array((0 until dims).map(d => lit(hyperplaneWeight(seed, h, d))): _*)
      val dot = VectorFns.dotQ(qv, weights)
      when(dot > 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Integer centroid weight for (seed, cell, dim) in [-1000, 1000]: derived
    * from the 60-bit md5 hash of "ivf:seed:c:d" — deterministic on any
    * cluster and oracle-expressible
    * (`('0x'||substr(md5(...),1,15))::BIGINT % 2001 - 1000`). */
  def centroidWeight(seed: Long, c: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"ivf:$seed:$c:$d".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xf0L) >> 4)
    v % 2001L - 1000L
  }

  /** Exact integer dot of a quantized vector against centroid `c` —
    * driver-computed literal weights, nothing shipped. */
  private def centroidDot(qv: Column, seed: Long, c: Int, dims: Int): Column = {
    val weights = array((0 until dims).map(d => lit(centroidWeight(seed, c, d))): _*)
    VectorFns.dotQ(qv, weights)
  }

  /** Per-row cell ranking by centroid dot product: rank 0 = best cell (max
    * dot, ties to the smallest cell id). Returns the top `take` cell ids. */
  private[operators] def rankedCells(qv: Column, cells: Int, seed: Long, dims: Int, take: Int): Column = {
    // sortable key: dot DESC then cell ASC, packed so array_sort gives the
    // centroid ranking without a per-row loop in the driver
    val keyed = array((0 until cells).map { c =>
      struct((-centroidDot(qv, seed, c, dims)).as("negdot"), lit(c.toLong).as("cell"))
    }: _*)
    slice(transform(array_sort(keyed), e => e.getField("cell")), 1, take)
  }

  /** Best Voronoi cell for an already-quantized vector — the single-cell
    * form of [[rankedCells]], shared with [[graft.operators.Dedup.semanticDedup]]
    * so dedup clusters and the ANN inverted file use the SAME partitioning. */
  private[operators] def cellOf(qv: Column, cells: Int, seed: Long, dims: Int): Column =
    element_at(rankedCells(qv, cells, seed, dims, 1), 1)

  /** ANN via an IVF-style inverted file index: the embedding space is
    * partitioned into `cells` Voronoi cells of deterministic pseudo-random
    * integer centroids; every corpus vector is assigned to its best cell (one
    * shuffle on the cell id — the "inverted file"), and a query scans only
    * its `nprobe` best cells (equi-join on the cell id). The recall/cost knob
    * is `nprobe`; candidate count scales with cell sizes, never corpus².
    *
    * This is the data-INDEPENDENT flavor (fixed centroids, no Lloyd
    * iterations): assignment is a pure function of the vector, so the index
    * needs no training pass, is reproducible on any cluster, and — unlike
    * trained centroids — is exactly expressible in the DuckDB oracle. At
    * 100 TB the cell assignment becomes the partition/bucket key of the
    * stored index, making probes partition-pruned scans. */
  def ivfKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cells: Int = 16, nprobe: Int = 4, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val prep = (df: DataFrame) =>
      df.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
        .withColumn("n2", VectorFns.norm2Q(col("qv")))
    val c = prep(corpus)
      .withColumn("cell", element_at(rankedCells(col("qv"), cells, seed, dims, 1), 1))
      .as("c")
    val q = prep(queries)
      .withColumn("cell", explode(rankedCells(col("qv"), cells, seed, dims, nprobe)))
      .as("q")
    val joined = q.join(c, col("q.cell") === col("c.cell")
        && col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        VectorFns.cosinePre(col("q.qv"), col("q.n2"), col("c.qv"), col("c.n2")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Persist the IVF inverted file as a hive-partitioned parquet layout:
    * one directory per Voronoi cell, rows pre-quantized with their squared
    * norms so probes skip the prep pass. This is the serving-side shape of
    * [[ivfKnn]]: at 100 TB the index is written once and every query batch
    * reads ONLY its probed cells' directories (partition pruning), turning
    * probe I/O into `nprobe/cells` of the index instead of a full scan. */
  private def indexRows(
      corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, seed: Long, dims: Int): DataFrame =
    corpus
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
      .withColumn("cell", element_at(rankedCells(col("qv"), cells, seed, dims, 1), 1))

  def writeIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      cells: Int = 16, seed: Long = 42L, dims: Int = 64): Unit =
    indexRows(corpus, idCol, vecCol, cells, seed, dims)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Append a batch of NEW vectors to a persisted IVF index
    * ([[writeIvfIndex]]) — partition-LOCAL maintenance: part-files are
    * written only under the `cell=` directories the delta's vectors land
    * in; every other cell is untouched (no read, no rewrite, no shuffle of
    * the existing index — pinned by spec). Because cell assignment is a
    * pure function of the vector, probing the grown index is bit-identical
    * to probing a full rebuild, which is what turns continuous
    * embedding-index ingestion into a delta-sized job instead of a corpus
    * re-cluster. Centroid DRIFT (enough new data to warrant new cells) is
    * the one event that forces a rebuild — by design, so reads never see a
    * half-migrated layout. */
  def appendIvfIndex(
      delta: DataFrame, idCol: String, vecCol: String, path: String,
      cells: Int = 16, seed: Long = 42L, dims: Int = 64): Unit =
    indexRows(delta, idCol, vecCol, cells, seed, dims)
      .write.partitionBy("cell").mode("append").parquet(path)

  /** Probe a persisted IVF index ([[writeIvfIndex]]) — identical results to
    * [[ivfKnn]] with the same parameters, but reading the on-disk layout.
    * The probed cell ids are resolved first and pushed as a STATIC partition
    * filter (`cell IN (...)`), so the scan provably touches only those
    * directories; the resolve step materializes `queries × nprobe` cell ids
    * — bounded by the query batch, the right trade for query serving. */
  def ivfIndexKnn(
      index: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cells: Int = 16, nprobe: Int = 4, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val q = queries
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
      .withColumn("cell", explode(rankedCells(col("qv"), cells, seed, dims, nprobe)))
      .as("q")
    val probed = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val c = index.filter(col("cell").isin(probed: _*)).as("c")
    val joined = broadcast(q.toDF()).join(c, col("q.cell") === col("c.cell")
        && col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        VectorFns.cosinePre(col("q.qv"), col("q.n2"), col("c.qv"), col("c.n2")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic negative sampling for contrastive/embedding training:
    * for each anchor, `k` negatives drawn from OUTSIDE the anchor's semantic
    * cell (the same Voronoi cells as [[ivfKnn]]/`semanticDedup` — excluding
    * the cell filters out likely-positives, the standard false-negative
    * guard), ranked by md5(anchor:candidate) so the sample is uniform,
    * reproducible across runs/engines, and stable under corpus growth
    * (a new candidate displaces at most one pick).
    *
    * Plan shape: anchors are a small broadcast side against the corpus scan
    * (same contract as [[bruteForceKnn]]); at 100 TB sample the corpus down
    * with a scan-speed hash filter first (`Sampling.mixWeighted`) — the
    * ranking is hash-based, so pre-filtering by the SAME hash family keeps
    * the final picks identical. */
  def negativeSample(
      corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cells: Int = 16, seed: Long = 42L, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prep = (df: DataFrame) =>
      df.select(col(idCol),
        cellOf(VectorFns.quantize(col(vecCol)), cells, seed, dims).as("cell"))
    val a = prep(anchors).withColumnRenamed(idCol, "anchor_id")
      .withColumnRenamed("cell", "a_cell")
    val c = prep(corpus)
    val ranked = broadcast(a).join(c, col("a_cell") =!= col("cell"))
      .select(col("anchor_id"), col(idCol).as("neg_id"),
        md5(concat_ws(":", col("anchor_id"), col(idCol))).as("h"))
    val w = Window.partitionBy(col("anchor_id")).orderBy(col("h"), col("neg_id"))
    ranked
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("neg_id"))
  }

  /** One-or-more Lloyd refinement steps over the deterministic IVF seeding:
    * assign every vector to its max-dot cell, recompute each non-empty
    * cell's centroid as the ELEMENT-WISE TRUNCATING INTEGER MEAN of its
    * member vectors (quantized 1e-6 ints — sum div count per dimension),
    * re-assign against the refined centroids. Integer means make the
    * trained centroids — normally the classic source of float-accumulation
    * nondeterminism in distributed k-means — a pure function of the data,
    * so even the TRAINING step is oracle-checkable.
    *
    * Scale shape per iteration: one posexplode shuffle keyed (cell, dim)
    * with map-side partial sums (the standard distributed-Lloyd shape), then
    * centroids collect to the driver — k·d longs, centroids are by
    * definition broadcast-sized — and re-assignment is a scan-speed
    * projection against literal arrays. Returns (id, cell_init,
    * cell_refined) plus the per-row refined dot for downstream ranking. */
  def kmeansRefine(
      corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int = 16, seed: Long = 42L, dims: Int = 64, iters: Int = 1): DataFrame = {
    require(iters >= 1)
    val base = corpus.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("cell_init", cellOf(col("qv"), cells, seed, dims))
    var assigned = base.withColumn("cell", col("cell_init"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      // distributed Lloyd update: per-(cell, dim) integer mean
      val cent = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(expr("sum(x) div count(1)").as("wt"))
        .groupBy(col("cell"))
        .agg(map_from_arrays(collect_list(col("d")), collect_list(col("wt"))).as("m"))
        .collect()
        .map { r =>
          val m = r.getMap[Int, Long](1)
          r.getLong(0) -> (0 until dims).map(m(_)).toArray
        }.sortBy(_._1)
      // re-assign against the refined centroids (literal arrays, scan-speed)
      val keyed = array(cent.map { case (c, w) =>
        struct((-VectorFns.dotQ(col("qv"), array(w.map(lit(_)): _*))).as("negdot"),
          lit(c).as("cell"))
      }: _*)
      val next = base
        .withColumn("cell", element_at(array_sort(keyed), 1).getField("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assigned.unpersist()
      assigned = next
    }
    val finAssigned = assigned
    Residuals.register(() => finAssigned.unpersist(blocking = false))
    val out = assigned.select(col(idCol), col("cell_init"), col("cell").as("cell_refined"))
    out
  }

  // ------------------------------------------------- product quantization

  /** Integer PQ codebook SEED weight for (seed, subspace, code, sub-dim),
    * scaled to ±125000 — about one standard deviation of the 1e-6-quantized
    * unit-ish embeddings, so the Lloyd round starts inside the data cloud —
    * derived from the 60-bit md5 hash of "pq:seed:m:c:d", deterministic on
    * any cluster and oracle-expressible
    * (`('0x'||substr(md5(...),1,15))::BIGINT % 250001 - 125000`). */
  def pqWeight(seed: Long, m: Int, c: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"pq:$seed:$m:$c:$d".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xf0L) >> 4)
    v % 250001L - 125000L
  }

  /** Flattened `[m][c][d]` codebook as one literal array column — constant-
    * folded to a single array Literal, referenced exactly once per kernel
    * call. (The earlier per-term Column-tree formulation was a measured
    * 15x slowdown: after Catalyst's projection collapse each of its ~1024
    * element_at terms re-evaluated the upstream quantize kernel.) */
  private def booksLit(books: Array[Array[Array[Long]]]): Column =
    array(books.flatMap(_.flatMap(_.toSeq)).map(lit(_)).toIndexedSeq: _*)

  /** Train the `mSub x ksub` PQ codebooks: md5-derived integer seeds pulled
    * through `iters` Lloyd rounds where each codeword becomes the
    * ELEMENT-WISE TRUNCATING INTEGER MEAN of its members (`sum div count`
    * per sub-dim — the same cross-engine-exact update as [[kmeansRefine]];
    * codewords that attract no members keep their previous weights). Per
    * round: one scan assigning codes (literal-array projection), one
    * aggregation keyed (subspace, code) with map-side partials, and a
    * driver collect of at most `mSub·ksub·sub` longs (1 KB at the defaults
    * — broadcast-sized by definition). Returns `[m][c][d]` weights. */
  def pqTrainBooks(
      corpus: DataFrame, vecCol: String,
      mSub: Int = 8, ksub: Int = 16, seed: Long = 42L, dims: Int = 64,
      iters: Int = 1): Array[Array[Array[Long]]] = {
    require(dims % mSub == 0, s"dims=$dims must split evenly into mSub=$mSub subspaces")
    val sub = dims / mSub
    var books: Array[Array[Array[Long]]] =
      Array.tabulate(mSub, ksub, sub)((m, c, d) => pqWeight(seed, m, c, d))
    if (iters > 0) {
      val base = corpus.select(VectorFns.quantize(col(vecCol)).as("qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      for (_ <- 1 to iters) {
        val codesCol = graft.functions.Kernels.pqAssignCol(
          col("qv"), booksLit(books), mSub, ksub)
        val aggCols = (0 until sub).map(d =>
          expr(s"sum(element_at(qv, m * $sub + $d + 1)) div count(1)").as(s"w$d"))
        val rows = base
          .select(col("qv"), posexplode(codesCol).as(Seq("m", "code")))
          .groupBy(col("m"), col("code"))
          .agg(aggCols.head, aggCols.tail: _*)
          .collect()
        val next = books.map(_.map(_.clone()))
        rows.foreach { r =>
          next(r.getInt(0))(r.getLong(1).toInt) =
            Array.tabulate(sub)(d => r.getLong(2 + d))
        }
        books = next
      }
      base.unpersist()
    }
    books
  }

  /** Product-quantization encoding: `dims` is split into `mSub` contiguous
    * subspaces; each subspace is vector-quantized against its own `ksub`-way
    * codebook. A 64-dim float vector (256 B) compresses to `mSub` small ints
    * (8 B at the defaults) — the 32x memory/IO reduction that makes
    * billion-vector serving fit a cluster's RAM. Codebooks are trained
    * integer literals ([[pqTrainBooks]] — reproducible, oracle-expressible);
    * encoding is a scan-speed projection, no shuffle. */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Long]]]): DataFrame = {
    val mSub = books.length
    val ksub = books.head.length
    corpus
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("codes",
        graft.functions.Kernels.pqAssignCol(col("qv"), booksLit(books), mSub, ksub))
      .select(col(idCol), col("codes"))
  }

  /** ANN via PQ asymmetric distance computation (ADC) with exact re-rank:
    * queries stay uncompressed and precompute their `mSub x ksub` table of
    * subspace distances to every codeword; a corpus item's approximate
    * distance is then `mSub` table lookups over its codes (8 adds instead of
    * 64 multiplies, against an 8-byte code instead of a 256-byte vector).
    * The ADC pass shortlists `shortlist` candidates per query; only those
    * fetch their full vectors (a shortlist-sized equi-join back to the
    * corpus) for exact cosine re-ranking — the standard PQ serving shape.
    *
    * The ADC scan itself is the compressed-domain LINEAR baseline (broadcast
    * queries x corpus codes, same contract as [[bruteForceKnn]] — documented
    * deliberately): the sublinear path is [[ivfPqKnn]], which prunes the
    * scan to `nprobe` Voronoi cells first. */
  def pqKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      mSub: Int = 8, ksub: Int = 16, shortlist: Int = 40,
      seed: Long = 42L, dims: Int = 64, iters: Int = 1): DataFrame = {
    val books = pqTrainBooks(corpus, vecCol, mSub, ksub, seed, dims, iters)
    val codes = pqEncode(corpus, idCol, vecCol, books).as("c")
    val q = queries
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("tab",
        graft.functions.Kernels.pqDistTableCol(col("qv"), booksLit(books), mSub, ksub))
      .select(col(idCol), col("tab"))
      .as("q")
    val adist = graft.functions.Kernels.pqAdcCol(col("q.tab"), col("c.codes"), ksub)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val short = broadcast(q.toDF().as("q")).crossJoin(codes)
      .filter(col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        adist.as("adist"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= shortlist)
    rerank(corpus, queries, idCol, vecCol, k, short)
  }

  /** IVF + PQ: the faiss-style architecture for corpus-scale serving — the
    * inverted file prunes the scan to `nprobe` Voronoi cells (equi-join on
    * the cell id, the same deterministic cells as [[ivfKnn]]), ADC over the
    * surviving codes shortlists candidates, and only the shortlist fetches
    * full vectors for exact re-rank. At 100 TB: the codes relation is ~1/32
    * the corpus bytes, partition-pruned by cell, and full vectors are read
    * for `shortlist x queries` rows only. */
  def ivfPqKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cells: Int = 16, nprobe: Int = 4, mSub: Int = 8, ksub: Int = 16,
      shortlist: Int = 40, seed: Long = 42L, dims: Int = 64, iters: Int = 1): DataFrame = {
    val books = pqTrainBooks(corpus, vecCol, mSub, ksub, seed, dims, iters)
    val codes = corpus
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("cell", cellOf(col("qv"), cells, seed, dims))
      .withColumn("codes",
        graft.functions.Kernels.pqAssignCol(col("qv"), booksLit(books), mSub, ksub))
      .select(col(idCol), col("cell"), col("codes"))
      .as("c")
    val q = queries
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("tab",
        graft.functions.Kernels.pqDistTableCol(col("qv"), booksLit(books), mSub, ksub))
      .withColumn("cell", explode(rankedCells(col("qv"), cells, seed, dims, nprobe)))
      .select(col(idCol), col("tab"), col("cell"))
      .as("q")
    val adist = graft.functions.Kernels.pqAdcCol(col("q.tab"), col("c.codes"), ksub)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val short = q.join(codes, col("q.cell") === col("c.cell")
        && col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        adist.as("adist"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= shortlist)
    rerank(corpus, queries, idCol, vecCol, k, short)
  }

  /** Exact-cosine re-rank of an ADC shortlist: full vectors are fetched for
    * shortlist rows ONLY (two id-keyed joins, shortlist-sized), never for
    * the whole corpus. */
  private def rerank(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, short: DataFrame): DataFrame = {
    val prep = (df: DataFrame) =>
      df.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
        .withColumn("n2", VectorFns.norm2Q(col("qv")))
    val cv = prep(corpus).as("cv")
    val qv = prep(queries).as("qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short
      .join(qv, col("query_id") === col(s"qv.$idCol"))
      .join(cv, col("neighbor_id") === col(s"cv.$idCol"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFns.cosinePre(col("qv.qv"), col("qv.n2"), col("cv.qv"), col("cv.n2")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** ANN via LSH bucketing: compare only within matching signatures.
    * Multi-probe would raise recall further; here signature equality is the
    * bucket key (an equi-join — shuffle on the bucket, never a cross join). */
  def lshKnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val sig = (df: DataFrame) =>
      df.select(
        col(idCol),
        VectorFns.quantize(col(vecCol)).as("qv"),
        lshSignature(col(vecCol), planes, seed, dims).as("sig"))
        .withColumn("n2", VectorFns.norm2Q(col("qv")))
    val c = sig(corpus).as("c")
    // multi-probe: each query also probes the `planes` buckets at Hamming
    // distance 1 from its own signature — the standard recall/cost knob
    // (probe count scales the equi-join fanout, never a cross join)
    val probeSigs = array((lit(0L) +: (0 until planes).map(h => lit(1L << h))): _*)
    val q = sig(queries)
      .withColumn("probe", explode(probeSigs))
      .withColumn("sig", col("sig").bitwiseXOR(col("probe")))
      .as("q")
    val joined = q.join(c, col("q.sig") === col("c.sig")
        && col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("neighbor_id"),
        VectorFns.cosinePre(col("q.qv"), col("q.n2"), col("c.qv"), col("c.n2")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .distinct() // a neighbor can match via several probes
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Greedy k-center coreset selection (Gonzalez '85) — the
    * maximal-diversity data-selection step (active learning seeds, dataset
    * pruning, landmark picking): start from the smallest id, then k−1
    * rounds of "pick the point FARTHEST from every center chosen so far"
    * (2-approximation of the optimal k-center cover). Returns the k center
    * rows as (round, vec_id, d2) where `d2` is the chosen point's squared
    * distance to its nearest earlier center — the radius curve that prices
    * how well the coreset covers the corpus (round 0 seeds at d2 = 0).
    *
    * Exactness: distances are EXACT integer squared L2 over the
    * 1e-6-quantized vectors (|d2| ≤ dims·(2·10⁶)² ≈ 2.6e14 at 64 dims —
    * 48 bits, no overflow), argmax totally ordered by (d2 desc, id asc),
    * so all k rounds hash-match an unrolled oracle.
    *
    * Scale: the driver holds only the k chosen centers (k·dims longs —
    * metadata); each round is ONE scan computing min-distance against the
    * centers as literal arrays (no join, no shuffle) finished by a
    * TakeOrdered(1). Total cost O(k²·n·dims) — the k² from re-deriving the
    * min over all centers each round, the price of keeping rounds
    * stateless (no n-sized distance relation to persist or checkpoint). */
  def kcenterSelect(vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 32, "k must be in [1, 32] (driver iterates k rounds)")
    val spark = vecs.sparkSession
    import spark.implicits._
    val prep = vecs.select(col(idCol).cast("long").as("vid"),
      VectorFns.quantize(col(vecCol)).as("qv"))
      .transform(Residuals.persist)
    val seed = prep.orderBy(col("vid")).limit(1).head()
    var centers = List(seed.getSeq[Long](1).toArray)
    val out = scala.collection.mutable.ArrayBuffer((0L, seed.getLong(0), 0L))
    for (r <- 1 until k) {
      val dExprs = centers.map { cq =>
        val c2 = cq.map(v => v * v).sum
        VectorFns.norm2Q(col("qv")) -
          lit(2L) * VectorFns.dotQ(col("qv"), array(cq.map(lit(_)): _*)) + lit(c2)
      }
      val minD = if (dExprs.sizeIs == 1) dExprs.head else least(dExprs: _*)
      val next = prep.select(col("vid"), col("qv"), minD.as("d2"))
        .orderBy(col("d2").desc, col("vid").asc).limit(1).head()
      centers ::= next.getSeq[Long](1).toArray
      out += ((r.toLong, next.getLong(0), next.getLong(2)))
    }
    out.toSeq.toDF("round", "vec_id", "d2")
  }
}
