package graft.operators

import graft.functions.Kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on the interleaved
  * bits of several dimensions so parquet min/max (row-group / file) statistics
  * prune multi-dimensional range queries.
  *
  * A table range-partitioned and sorted on ONE column prunes filters on that
  * column only; filters on any other dimension read everything. Interleaving
  * the bits of d rank-normalized dimensions gives every file a tight
  * bounding box in ALL of them — a `WHERE x BETWEEN .. AND y BETWEEN ..` box
  * query touches only the files whose boxes intersect it (the classic
  * Z-order/Hilbert layout every lakehouse table format exposes; built here
  * from Spark primitives: rank-bucketing, a codegen'd interleave kernel,
  * `repartitionByRange` + `sortWithinPartitions`).
  *
  * Scale path: exact equi-depth rank buckets come from [[Ranks.rankBucket]]
  * (distributed — value-domain offsets + per-value windows, bit-identical
  * to a global ntile); the WRITE path skips ranking entirely and buckets by
  * `approx_percentile` boundaries ([[approxBoundaries]] — one scan, no
  * window, no join) since layout quality doesn't need exact tiles.
  */
object Layout {

  /** Morton z-value of pre-bucketed dimension columns (each in [0, 2^bits)).
    * Pure arithmetic — interleave in codegen via the shared kernel. */
  def zValue(bucketCols: Seq[Column], bits: Int = 16): Column =
    Kernels.interleaveBitsCol(array(bucketCols.map(_.cast("long")): _*), bits)

  /** Hilbert clustering value for two rank-bucketed dimensions — strictly
    * better locality than [[zValue]]: consecutive Hilbert indices are
    * grid-ADJACENT (Morton jumps at every power-of-two boundary), so
    * range-partitioned files cover tighter (x, y) rectangles and zone maps
    * prune harder on either dimension. Same usage: bucket ranks in
    * [0, 2^bits), then range-partition + sort by the value at write time. */
  def hilbertValue(xBucket: Column, yBucket: Column, bits: Int = 16): Column =
    Kernels.hilbertDCol(xBucket, yBucket, bits)

  /** Bucket a dimension by FIXED quantile boundaries computed in one
    * aggregation pass (`approx_percentile`) — the 100 TB path: no global
    * window, no full sort; boundaries broadcast as a literal array. */
  def approxBoundaries(df: DataFrame, valueCol: String, buckets: Int): Array[Double] = {
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    df.select(expr(
      s"approx_percentile($valueCol, array(${probs.mkString(",")}), 10000)")).head()
      .getSeq[Any](0).map {
        case d: java.lang.Number => d.doubleValue()
      }.toArray
  }

  def boundaryBucket(valueCol: Column, boundaries: Array[Double]): Column = {
    // boundaries sorted ascending; bucket = #boundaries below value
    val arr = array(boundaries.map(lit(_)): _*)
    size(filter(arr, b => b <= valueCol.cast("double"))).cast("long")
  }

  /** Write `df` z-ordered on `dims` into `path` (parquet): bucket each dim by
    * approx quantile boundaries, interleave, range-partition on the z-value
    * into `numFiles` output tasks and sort rows by z inside each — so each
    * file owns a contiguous z-range = a tight box in every dimension. */
  def writeZOrdered(
      df: DataFrame, dims: Seq[String], path: String,
      numFiles: Int = 32, bits: Int = 16): Unit = {
    val bucketed = dims.foldLeft(df) { (acc, d) =>
      val bs = approxBoundaries(df, d, 1 << math.min(bits, 12))
      acc.withColumn(s"__zb_$d", boundaryBucket(col(d), bs))
    }
    bucketed
      .withColumn("__z", zValue(dims.map(d => col(s"__zb_$d")), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((dims.map(d => s"__zb_$d") :+ "__z"): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a dataset into ~`targetRowsPerFile`-sized
    * files, preserving content byte-for-byte. Streaming/incremental
    * pipelines at 100 TB accrete millions of KB-scale part files whose
    * metadata and open() overhead come to dominate scans; compaction
    * bin-packs them back to scan-efficient sizes. `repartitionByRange` on
    * `sortCol` (+ in-file sort) keeps the data clustered, so parquet min/max
    * pruning on the sort key SURVIVES the rewrite — a plain `coalesce` would
    * destroy it. One count pass sizes the job; at scale run per partition
    * (the unit streaming appends dirty) rather than per table. */
  def compact(
      df: DataFrame, path: String, sortCol: String,
      targetRowsPerFile: Long): Int = {
    val rows = df.count()
    val numFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
    numFiles
  }

  // ------------------------------------------------------- zone-map skipping

  /** Build a zone map for a parquet dataset: one row per FILE with the min
    * and max of `keyCol` — the same metadata lakehouse formats (Delta,
    * Iceberg) keep in their transaction log to skip files without opening
    * them. One scan builds it (projected to the key column only); it is
    * metadata-sized (a few values per file), so persist it next to the data
    * and maintain it incrementally on append. */
  def buildZoneMap(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n_rows"))

  /** Clustering-quality audit over a zone-map manifest: for each zone/file,
    * how many OTHER zones' closed [min,max] key ranges intersect it, plus
    * the range itself — the "should I re-cluster" gauge. Zero overlaps
    * everywhere means a range query opens ~1 file (perfect clustering);
    * overlap counts near the file count mean the zone maps prune nothing
    * and the layout needs a [[compact]]/[[writeZOrdered]] pass. THE metric
    * that prices a re-clustering job before running it.
    *
    * Pure composition: closed integer intervals ride [[RangeJoin.overlap]]
    * (half-open) via `max+1`; the manifest is metadata-sized, so the
    * bucketed self-join is trivially cheap at any table size — the cost
    * scales with files, never rows. Zones with null min/max (all-null key
    * files) report 0 overlaps rather than crashing. */
  def clusteringDepth(zones: DataFrame, zoneCol: String,
      minCol: String, maxCol: String, bucketWidth: Double = 64.0): DataFrame = {
    val base = zones.select(col(zoneCol).as("zone"),
      col(minCol).cast("long").as("min_key"), col(maxCol).cast("long").as("max_key"))
    val l = base.select(col("zone").as("zone_a"), col("min_key").as("lo_a"),
      (col("max_key") + 1).as("hi_a"))
    val r = base.select(col("zone").as("zone_b"), col("min_key").as("lo_b"),
      (col("max_key") + 1).as("hi_b"))
    val pairs = RangeJoin.overlap(l, "lo_a", "hi_a", r, "lo_b", "hi_b", bucketWidth)
      .filter(col("zone_a") =!= col("zone_b"))
      .groupBy(col("zone_a").as("zone")).agg(count(lit(1)).as("n_overlaps"))
    base.join(pairs, Seq("zone"), "left")
      .withColumn("n_overlaps", coalesce(col("n_overlaps"), lit(0L)))
      .select(col("zone"), col("min_key"), col("max_key"), col("n_overlaps"))
  }

  /** Read only the files whose [min,max] zone intersects [lo,hi], then apply
    * the residual row filter. On a range-clustered layout ([[compact]] /
    * [[writeZOrdered]]) a selective range predicate opens a small fraction
    * of the files; the zone map is tiny, so the pruning decision is a
    * driver-side metadata operation — exactly how lakehouse data skipping
    * works, built from Spark primitives. Returns (pruned reader, files
    * kept, files total) so callers/tests can assert skipping happened. */
  def skippingRead(
      spark: org.apache.spark.sql.SparkSession, path: String, zoneMap: DataFrame,
      keyCol: String, lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val zones = zoneMap.select(col("file"), col("min_key"), col("max_key")).collect()
    val kept = zones.filter { r =>
      val mn = r.get(1); val mx = r.get(2)
      // a file whose key column is entirely null has null min/max: its rows
      // can never satisfy the range filter, so it is always prunable
      mn != null && mx != null &&
        cmpAny(mx, lo) >= 0 && cmpAny(mn, hi) <= 0 // zone intersects [lo, hi]
    }.map(_.getString(0))
    val df =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi)),
      kept.length, zones.length)
  }

  /** [[skippingRead]] with the prune decision DISTRIBUTED: the probe range
    * is filtered against the zone map as a DataFrame (Spark SQL comparison
    * semantics, no driver-side type dispatch) and only the SURVIVING file
    * names are collected — the unavoidable driver cost, since the reader
    * takes paths. Use when the manifest outgrows comfortable driver memory
    * (millions of files); [[skippingRead]] stays the fast default, whose
    * whole-manifest collect is the same design as Delta's driver-side log
    * replay. Returns (pruned reader, files kept, files total). */
  def skippingReadDistributed(
      spark: org.apache.spark.sql.SparkSession, path: String, zoneMap: DataFrame,
      keyCol: String, lo: Any, hi: Any): (DataFrame, Long, Long) = {
    val total = zoneMap.count()
    // all-null-key files have null min/max: never a range match, prunable
    val kept = zoneMap
      .filter(col("min_key").isNotNull && col("max_key").isNotNull
        && col("max_key") >= lit(lo) && col("min_key") <= lit(hi))
      .select(col("file")).collect().map(_.getString(0))
    val df =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi)),
      kept.length.toLong, total)
  }

  // -------------------------------------------------- bloom file skipping

  /** Per-file Bloom filter over `keyCol` — the EQUALITY complement to
    * [[buildZoneMap]]'s range pruning: a zone map only skips files when the
    * probe column is what the layout is clustered on; a per-file bloom
    * skips equality probes on ANY column (Parquet column indexes / Delta
    * bloom files do exactly this). The index row is (file, set bit
    * positions): `collect_set` state is bounded by `bits`, so index size is
    * files × bits booleans at worst — metadata-sized. */
  def buildBloomIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String, bits: Int = 1024, hashes: Int = 2): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        explode(array((0 until hashes).map(i =>
          pmod(graft.functions.TextFns.md5Long(col(keyCol).cast("string"), i), lit(bits))): _*))
          .as("bit"))
      .groupBy(col("file"))
      .agg(collect_set(col("bit")).as("bits"))

  /** Driver-side twin of [[graft.functions.TextFns.md5Long]] (same digest,
    * same family split) so a probe value's bit positions are computed
    * without a Spark job. */
  private def md5LongDriver(s: String, family: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${family / 2}:$s".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(15 * (family % 2), 15 * (family % 2) + 15), 16)
  }

  /** Read only the files whose bloom filter contains every probe bit, then
    * apply the exact equality filter (bloom hits may be false positives,
    * never false negatives). Returns (reader, kept, total). */
  def bloomSkippingRead(
      spark: org.apache.spark.sql.SparkSession, path: String, index: DataFrame,
      keyCol: String, value: String, bits: Int = 1024, hashes: Int = 2): (DataFrame, Int, Int) = {
    val probeBits = (0 until hashes)
      .map(i => (md5LongDriver(value, i) % bits + bits) % bits).toSet
    val files = index.select(col("file"), col("bits")).collect()
    val kept = files.filter(r => probeBits.subsetOf(r.getSeq[Long](1).toSet))
      .map(_.getString(0))
    val df =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.filter(col(keyCol) === lit(value)), kept.length, files.length)
  }

  /** Mixed integral types compare via longValue — doubleValue loses
    * precision above 2^53, which could wrongly prune a zone whose long
    * min/max exceeds 2^53 when probed with Int bounds. The double path is
    * reserved for genuine floating types. */
  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => true
    case _ => false
  }

  private[graft] def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) if isIntegral(x) && isIntegral(y) =>
      java.lang.Long.compare(x.longValue(), y.longValue())
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(s"unsupported zone key type: $a / $b")
  }

  /** Compaction PLANNER — the metadata half of OPTIMIZE: given a file
    * manifest (path, rows, clustering-key min), group KEY-ADJACENT files
    * into rewrite groups of ~`targetRows` by linear packing (group =
    * cumulative-rows-before div target). Key adjacency keeps the rewritten
    * files' min/max ranges as tight as the originals ([[clusteringDepth]]
    * prices the win); a file already at target size lands alone in its
    * group by the same arithmetic. Pure manifest math — zero data reads,
    * so the plan costs O(files) at any table size: the single-partition
    * window's input is exactly one row PER FILE (row count == file count,
    * PlanSpec-pinned), i.e. ~1M rows for a 1M-file table — driver-window
    * scale, not data scale; persist the manifest as a table and
    * range-partition it when files outgrow one task (zone-map precedent). */
  def compactionPlan(manifest: DataFrame, pathCol: String, rowsCol: String,
      minKeyCol: String, targetRows: Long): DataFrame = {
    require(targetRows >= 1, "targetRows must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(minKeyCol), col(pathCol))
    val g = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    manifest
      .select(col(pathCol).as("path"), col(rowsCol).cast("long").as("rows"),
        col(minKeyCol).cast("long").as("min_key"))
      .withColumn("cum_before", coalesce(
        sum(col("rows")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("grp", expr(s"cum_before div ${targetRows}L"))
      .withColumn("grp_rows", sum(col("rows")).over(g))
      .withColumn("grp_files", count(lit(1)).over(g).cast("long"))
      .select(col("path"), col("rows"), col("min_key"), col("grp"),
        col("grp_rows"), col("grp_files"))
  }
}
