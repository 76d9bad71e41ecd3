package graft.operators

import graft.functions.VectorFns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column maintenance ops for vector corpora: L2 normalization and
  * int8 quantization — the two standard preprocessing steps before ANN
  * indexing / storage (normalized vectors make cosine = dot; int8 cuts
  * vector bytes 4x for the index shuffle).
  *
  * Both are pure per-row projections (scan speed, no shuffle) emitted in
  * EXPLODED form — (vec_id, dim, value) — with all arithmetic in the fixed
  * point of [[VectorFns]] plus single IEEE ops (`sqrt`, one divide, `floor`)
  * that are bit-identical across engines, so the results hash-match a SQL
  * oracle exactly. The explode happens AFTER the vector-level math: the
  * per-element work downstream of it is plain codegen'd column arithmetic,
  * not an interpreted lambda.
  */
object Embeddings {

  /** L2-normalized vector in 1e-6 fixed point: for each dimension,
    * `floor(q_i * 1e6 / sqrt(sum q_j^2))` where `q` is the 1e-6-quantized
    * input. Zero vectors normalize to zero. Output: (id, dim [1-based],
    * nq [normalized component in 1e-6 units]). */
  def normalizedQ(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
    q.select(col(idCol), col("n2"), posexplode(col("qv")).as(Seq("pos", "qval")))
      .select(
        col(idCol), (col("pos") + 1).cast("long").as("dim"),
        when(col("n2") === 0, lit(0L))
          .otherwise(floor(col("qval") * lit(1000000.0) / sqrt(col("n2").cast("double")))
            .cast("long"))
          .as("nq"))
  }

  /** Mean-pool member vectors into one group vector — chunk embeddings →
    * document embedding, the standard pooling step between chunk-level
    * encoding and document-level retrieval. Element-wise TRUNCATING INTEGER
    * MEAN of the 1e-6-quantized vectors (`sum div count` per (group, dim) —
    * the same exactness trick as kmeansRefine's centroids), so the pooled
    * vectors hash-match a SQL oracle. One posexplode shuffle keyed
    * (group, dim) with map-side partial sums; output exploded
    * (group, dim [1-based], pooled). */
  def meanPool(
      embs: DataFrame, groupCol: Column, vecCol: String): DataFrame =
    embs
      .select(groupCol.as("grp"), posexplode(VectorFns.quantize(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(col("grp"), (col("pos") + 1).cast("long").as("dim"))
      .agg(expr("sum(x) div count(1)").as("pooled"))

  /** Johnson-Lindenstrauss random projection to `outDims` dimensions with a
    * DETERMINISTIC ±1 projection matrix (Achlioptas-style sign matrix,
    * derived per (seed, j, i) from the same md5 scheme as
    * [[Similarity.hyperplaneWeight]] — pure config, reproducible on any
    * cluster AND re-derivable in plain SQL). Components are integer dot
    * products over the 1e-6-quantized input: y_j = Σ_i w_ji · q_i — no
    * float accumulation, so the projected vectors hash-match an oracle.
    *
    * This is the standard cheap dim-reduction in front of ANN / clustering
    * at corpus scale: distances are preserved within (1±ε) w.h.p. while the
    * shuffle payload shrinks dims/outDims ×. Scan-speed projection — the
    * matrix is outDims×dims literal ±1s, never shipped as data. Output:
    * (id, dim [1-based], y) exploded like the other embedding ops. */
  def randomProject(
      embs: DataFrame, idCol: String, vecCol: String,
      outDims: Int, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
    val projected = array((0 until outDims).map { j =>
      val weights = array((0 until dims).map(i =>
        lit(Similarity.hyperplaneWeight(seed, j, i))): _*)
      VectorFns.dotQ(col("qv"), weights)
    }: _*)
    q.select(col(idCol), posexplode(projected).as(Seq("pos", "y")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("dim"), col("y"))
  }

  /** Norm-distribution health histogram: squared L2 norms of the quantized
    * vectors bucketed at fixed width — the two failure modes an embedding
    * feed shows up with (collapsed vectors piling into bucket 0 after an
    * encoder regression; exploding norms in the top bucket after a scale
    * bug) read directly off the shape. Both tails clamped like the drift
    * bucketer so nothing vanishes from the frame. All integer. */
  def normHistogram(embs: DataFrame, vecCol: String,
      width: Long, buckets: Int, offset: Long = 0L): DataFrame = {
    require(width > 0 && buckets > 1)
    val n2 = embs.select(
      VectorFns.norm2Q(VectorFns.quantize(col(vecCol))).as("n2"))
    // `offset` centers the frame on the expected norm mass (a normalized
    // corpus concentrates at |v|²≈1, i.e. 1e12 in quantized units — an
    // unshifted coarse histogram would collapse it into one bucket)
    n2.groupBy(
      greatest(least(expr(s"(n2 - $offset) div $width"), lit(buckets - 1L)), lit(0L))
        .as("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("n2")).as("min_n2"),
        max(col("n2")).as("max_n2"))
  }

  /** Label-conditioned outlier flags: per label, the integer-mean centroid
    * (`sum div count` per dim — the kmeans exactness trick), each member's
    * INTEGER squared distance to its own centroid, and a robust flag
    * `dist2 > 1.5·median(dist2)` compared as `4·dist2 > 3·med_x2` on the
    * doubled-median integers — the
    * mislabeled-embedding / contaminated-cluster detector run before
    * training on labeled vector data. All BIGINT end to end (distances,
    * medians, comparison), so the flags themselves hash-match.
    *
    * Shape: one posexplode aggregate for centroids (label·d rows,
    * broadcast-sized), one scan-speed distance projection, one per-label
    * median over the member-count-sized relation. Overflow: per-dim diff ≤
    * 2·10⁶ ⇒ dist2 ≤ d·4·10¹² — BIGINT-safe to d ~ 10⁶. */
  def centroidOutliers(embs: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val el = embs.select(col(idCol).as("id"), col(labelCol).as("label"),
      posexplode(VectorFns.quantize(col(vecCol))).as(Seq("dim", "x")))
    val cent = el.groupBy(col("label"), col("dim"))
      .agg(expr("sum(x) div count(1)").as("c"))
    val dist = el.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("id"), col("label"))
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist2"))
    val med = dist.groupBy(col("label"))
      .agg(expr("percentile(dist2 * 2, 0.5)").cast("long").as("med_x2"))
    dist.join(broadcast(med), "label")
      .withColumn("is_outlier",
        when(col("dist2") * 2 * 2 > lit(3L) * col("med_x2"), 1L).otherwise(0L))
      .select(col("id"), col("label"), col("dist2"), col("med_x2"), col("is_outlier"))
  }

  /** Symmetric int8 quantization against the per-vector abs-max:
    * `floor(q_i * 127 / max|q_j| + 0.5)` (round-half-up; exact in both
    * engines). Output: (id, dim [1-based], q8, scale_q [the abs-max in 1e-6
    * units — the dequantization factor]). */
  /** Upper-triangle covariance NUMERATORS of the quantized embedding cloud:
    * per dimension pair (i ≤ j), `cov_num = n·Σx_i x_j − Σx_i·Σx_j` — the
    * integer-exact, ORDER-FREE second-moment matrix that PCA/whitening/
    * Mahalanobis-drift all consume (divide by n·(n−1) downstream for the
    * unbiased covariance; keeping the integer numerator is what makes the
    * matrix bit-portable AND mergeable: all three sums add component-wise
    * across shards, the [[Features.powerSums]] pattern lifted to matrices).
    *
    * Shape (r17): ONE corpus pass — `Kernels.covMomentTerms` emits every
    * pair product (i, j, x_i·x_j) plus a (i, -1, x_i) first-moment sentinel
    * row-locally, and a single map-side-combined aggregation over the
    * (i, j) key domain (d(d+1)/2 + d rows of metadata) produces both
    * moments. The previous formulation posexploded the corpus three times
    * (per-dim sums + both legs of an id-keyed self-join) and shuffled it by
    * id; every Σ here is the same order-free integer sum, so the output is
    * bit-identical. The d² blowup is inherent to a covariance, not the
    * plan: at d=64 it is 2,144 terms per vector. Overflow: |q| ≤ Q ⇒
    * |cov_num| ≤ 2n²Q² — safe in BIGINT while n·Q < ~2·10⁹ (Q=10⁶ ⇒ n up
    * to ~2000 per shard; merge shard numerators via their component sums
    * beyond that). */
  def covarianceNum(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val n = embs.count()
    // metadata-sized after the aggregation; persisted because dims + pair
    // sums + the final projection all read it
    val moments = embs
      .select(inline(graft.functions.Kernels.covMomentTermsCol(
        VectorFns.quantize(col(vecCol)))))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("s"))
      .transform(Residuals.persist)
    val dims = moments.filter(col("j") === -1L).select(col("i"), col("s"))
    val p = moments.filter(col("j") >= 0L)
      .select(col("i"), col("j"), col("s").as("s_ij"))
    p.join(broadcast(dims.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(dims.select(col("i").as("j"), col("s").as("sj"))), "j")
      .select(col("i"), col("j"),
        lit(n).as("n"), col("s_ij"),
        (lit(n) * col("s_ij") - col("si") * col("sj")).as("cov_num"))
  }

  /** Top principal direction by FIXED-POINT power iteration over the
    * [[covarianceNum]] matrix — the PCA step embedding pipelines use for
    * whitening, ABTT ("all-but-the-top" common-direction removal) and
    * anisotropy diagnostics. Every round is v ← C·v with ∞-norm
    * renormalization, all in truncating integer arithmetic: matrix entries
    * are `cov_num div 10⁹`, the matvec accumulates `c·v div 10⁶`-scaled
    * longs (order-free sum), and the new vector is `u·10⁶ div max|u|` — so
    * a fixed round count starting from the all-ones vector is a pure
    * function of the data, bit-identical across engines (no sign ambiguity:
    * the start vector is fixed, no random init).
    *
    * Shape: the corpus is touched ONCE by [[covarianceNum]] (the only
    * distributed work); the d²-sized covariance matrix is METADATA by
    * definition (4,096 longs at d=64), so it collects to the driver and the
    * iteration is driver-local long arithmetic — the kmeans-centroid
    * principle: iterating on the cluster over a metadata-sized relation
    * buys nothing but per-round scheduler latency (measured 4.1 s → ~1.2 s
    * at sf0.1). Scala `Long` division truncates toward zero exactly like
    * Spark `div` / DuckDB `//`, so the driver math is bit-identical to the
    * oracle's unrolled SQL rounds. */
  def pcaPower(embs: DataFrame, idCol: String, vecCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val spark = embs.sparkSession
    val upper = covarianceNum(embs, idCol, vecCol)
      .select(col("i"), col("j"), expr("cov_num div 1000000000").as("c"))
      .collect()
    require(upper.nonEmpty, "empty embedding input")
    val d = (upper.iterator.map(_.getLong(1)).max + 1L).toInt
    val cm = Array.ofDim[Long](d, d)
    upper.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      cm(i)(j) = c
      cm(j)(i) = c
    }
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to rounds) {
      val u = Array.tabulate(d) { i =>
        var s = 0L
        var j = 0
        while (j < d) { s += cm(i)(j) * v(j); j += 1 }
        s / 1000000L
      }
      val m = u.iterator.map(math.abs).max
      require(m > 0, "zero covariance matrix — no principal direction")
      v = u.map(x => x * 1000000L / m)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("dim", "v_scaled")
  }

  /** All-but-the-top (Mu & Viswanath, ICLR'18): remove the dominant
    * principal direction from every embedding — the standard post-
    * processing that fixes embedding anisotropy (the common direction
    * carries corpus-frequency signal, not meaning, and inflates every
    * cosine). `x' = x − (x·v / v·v)·v` with v from [[pcaPower]], entirely
    * in truncating integer arithmetic:
    * `corrected = q − ((proj div 10³)·v) div (vn2 div 10³)` — the staged
    * downscale keeps every product under 2^63 (proj ≤ d·Q·10⁶, times v
    * would overflow raw; after div 10³ the product is ≤ d·Q·10⁹ ≈ 10¹⁶).
    *
    * Shape: the direction collects to the driver (d longs — literal-array
    * broadcast, the decayWeights pattern), so the correction is a pure
    * scan-speed projection over the corpus — one pass, no join, no
    * shuffle. Output exploded (id, dim, corrected) like [[normalizedQ]]. */
  def removeTopComponent(embs: DataFrame, idCol: String, vecCol: String,
      rounds: Int = 2): DataFrame = {
    val dir = pcaPower(embs, idCol, vecCol, rounds).orderBy(col("dim")).collect()
    val v = dir.map(_.getAs[Long]("v_scaled"))
    val vn2 = v.map(x => x * x).sum
    require(vn2 > 0, "zero principal direction")
    val vArr = array(v.map(lit(_)): _*)
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("proj", VectorFns.dotQ(col("qv"), vArr))
    q.select(col(idCol), col("proj"), posexplode(col("qv")).as(Seq("pos", "qval")))
      .withColumn("vi", element_at(vArr, col("pos") + 1))
      .select(col(idCol), (col("pos") + 1).cast("long").as("dim"),
        (col("qval") - expr(s"(proj div 1000) * vi div ${vn2 / 1000L}")).as("corrected"))
  }

  /** Per-DIMENSION min/max scalar quantization to 8-bit codes — the
    * faiss-SQ/int8-range calibration twin of [[quantizeInt8]]'s global
    * absmax scaling: each dimension gets its own [min, max] range over the
    * corpus, `code = (x − min)·255 div (max − min)`, reconstruction
    * `min + code·(max − min) div 255`. Per-dim calibration survives the
    * one-hot-ish dimensions that blow up a global scale. All integer over
    * the 1e-6-quantized vectors, so codes AND reconstruction error are
    * exactly oracle-checkable. Constant dimensions (max == min) code to 0
    * and reconstruct exactly. Returns (id, dim, code, err) with
    * err = x − recon ≥ 0 (truncating reconstruction never overshoots).
    *
    * Scale: one per-dim min/max aggregate (d-row broadcast), one
    * scan-speed projection — the stats pass is the only shuffle. */
  def quantizeScalar(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val el = embs.select(col(idCol),
      posexplode(VectorFns.quantize(col(vecCol))).as(Seq("pos", "x")))
    val stats = el.groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    el.join(broadcast(stats), "pos")
      .withColumn("code",
        when(col("mx") === col("mn"), 0L)
          .otherwise(expr("(x - mn) * 255 div (mx - mn)")))
      .withColumn("recon", expr("mn + code * (mx - mn) div 255"))
      .select(col(idCol), (col("pos") + 1).cast("long").as("dim"),
        col("code"), col("recon"), (col("x") - col("recon")).as("err"))
  }

  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("mq", array_max(transform(col("qv"), x => abs(x))))
    q.select(col(idCol), col("mq"), posexplode(col("qv")).as(Seq("pos", "qval")))
      .select(
        col(idCol), (col("pos") + 1).cast("long").as("dim"),
        when(col("mq") === 0, lit(0L))
          .otherwise(floor(col("qval") * lit(127.0) / col("mq").cast("double") + lit(0.5))
            .cast("long"))
          .as("q8"),
        col("mq").as("scale_q"))
  }

  /** MIPS→cosine reduction (Shrivastava & Li '14): append one completion
    * dimension `floor(√(M² − ‖x‖²))` — M² the corpus max squared norm —
    * so every augmented vector has (near-)equal norm and maximum-inner-
    * product search over the originals becomes cosine/L2 search over the
    * augmented vectors, unlocking EVERY gated ANN index (LSH/IVF/PQ) for
    * recommender-style MIPS workloads. Integer-exact: norms are the
    * quantized `norm2Q`, sqrt is IEEE-correctly-rounded in both engines
    * (the r8 precedent) and floor lands it on a BIGINT; the augmented
    * norm overshoots M² by at most 2√M²  (floor slack), reported as
    * `slack = M² − aug_norm2` per vector. Output exploded: dims 1..d are
    * the quantized components, dim d+1 the completion.
    *
    * Shape: one norm aggregate (one-row broadcast M²) + a scan-speed
    * projection; no shuffle keyed on data. */
  def mipsTransform(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = embs.select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
    val m = q.agg(max(col("n2")).as("m2"))
    val aug = q.crossJoin(broadcast(m))
      .withColumn("extra",
        floor(sqrt((col("m2") - col("n2")).cast("double"))).cast("long"))
    aug.select(col(idCol), posexplode(col("qv")).as(Seq("pos", "v")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("dim"), col("v"))
      .unionByName(aug.select(col(idCol),
        (size(col("qv")) + 1).cast("long").as("dim"), col("extra").as("v")))
  }

  /** Two-stage residual quantization (the RQ family behind modern ANN
    * compression): stage 1 is the trained-range scalar quantizer of
    * [[quantizeScalar]]; stage 2 quantizes the RESIDUAL x − recon₁ against
    * the residual's own per-dim range. Because the truncating stage-1
    * reconstruction never overshoots (err ≥ 0 by construction), the
    * residual domain is non-negative and the second code refines the
    * first: final `err = x − recon₁ − recon₂` is still ≥ 0 and ≤ the
    * stage-1 error — 16 bits/dim with two 8-bit codebooks. All integer
    * (`div` truncation both engines). Output: (id, dim, code1, code2,
    * recon, err).
    *
    * Shape: two per-dim stats aggregates (d-row broadcasts) + scan-speed
    * projections — the quantizeScalar plan doubled, nothing new. */
  def residualQuantize(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val el = embs.select(col(idCol),
      posexplode(VectorFns.quantize(col(vecCol))).as(Seq("pos", "x")))
    val s1 = el.groupBy(col("pos")).agg(min(col("x")).as("mn1"), max(col("x")).as("mx1"))
    val q1 = el.join(broadcast(s1), "pos")
      .withColumn("code1",
        when(col("mx1") === col("mn1"), 0L)
          .otherwise(expr("(x - mn1) * 255 div (mx1 - mn1)")))
      .withColumn("recon1", expr("mn1 + code1 * (mx1 - mn1) div 255"))
      .withColumn("r", col("x") - col("recon1"))
    val s2 = q1.groupBy(col("pos")).agg(min(col("r")).as("mn2"), max(col("r")).as("mx2"))
    q1.join(broadcast(s2), "pos")
      .withColumn("code2",
        when(col("mx2") === col("mn2"), 0L)
          .otherwise(expr("(r - mn2) * 255 div (mx2 - mn2)")))
      .withColumn("recon2", expr("mn2 + code2 * (mx2 - mn2) div 255"))
      .select(col(idCol), (col("pos") + 1).cast("long").as("dim"),
        col("code1"), col("code2"),
        (col("recon1") + col("recon2")).as("recon"),
        (col("x") - col("recon1") - col("recon2")).as("err"))
  }

  /** Sign-bit binary quantization against per-dimension integer-mean
    * thresholds, packed into two 32-bit words — the 32×-compression end of
    * the spectrum past [[quantizeInt8]] (8 bits/dim) and [[quantizeScalar]]
    * (8 bits/dim, trained range): one BIT per dimension, Hamming distance
    * as the similarity surrogate (`bit_count(xor(...))` is exact and
    * identical in both engines — the r10 pHash precedent). Thresholding at
    * the per-dim mean rather than zero keeps the bits balanced even for
    * biased dimensions, which is what preserves ranking power.
    *
    * Everything is integer: thresholds are truncating means `Σx div n` of
    * the 1e-6-quantized components (the kmeans-centroid trick — truncation
    * toward zero matches DuckDB `//`), bits pack as Σ b_d·2^(d mod 32) into
    * a low and a high word, so values stay non-negative (no sign-bit edge
    * at 2⁶³). Dimensions beyond 64 raise at execution rather than silently
    * dropping bits. Output: (id, word_lo [dims 0–31], word_hi [dims
    * 32–63], bits_set).
    *
    * Shape: one map-side-combined aggregate to the d-row threshold relation
    * (broadcast back), one scan-speed projection + per-id aggregation —
    * same plan family as [[quantizeScalar]]. */
  def binaryQuantize(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val el = embs.select(col(idCol).as("id"),
      posexplode(VectorFns.quantize(col(vecCol))).as(Seq("d", "x")))
    val thr = el.groupBy(col("d")).agg(expr("sum(x) div count(1)").as("m"))
    val pw = array((0 until 32).map(i => lit(1L << i)): _*)
    val dOk = when(col("d") >= 64,
      raise_error(concat(lit("binaryQuantize: packs at most 64 dims, got dim "),
        col("d").cast("string")))).otherwise(col("d"))
    el.join(broadcast(thr), "d")
      .select(col("id"), dOk.as("d"),
        when(col("x") > col("m"), 1L).otherwise(0L).as("b"))
      .groupBy(col("id"))
      .agg(
        sum(when(col("d") < 32, col("b") * element_at(pw, col("d") + 1))
          .otherwise(0L)).as("word_lo"),
        sum(when(col("d") >= 32, col("b") * element_at(pw, col("d") - 31))
          .otherwise(0L)).as("word_hi"),
        sum(col("b")).as("bits_set"))
  }
}
