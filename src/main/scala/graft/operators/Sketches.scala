package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketch: K-Minimum-Values over a 60-bit
  * md5-derived hash.
  *
  * Unlike HLL (`approx_count_distinct`), KMV over a FIXED hash is exactly
  * reproducible across engines — the estimate is a pure function of the data,
  * so a DuckDB oracle can hash-match it. The estimator is the classic
  * (k-1) * H / h_(k) for uniform hashes on [0, H); groups with fewer than k
  * distinct hashes report the exact count.
  *
  * Scale shape: the aggregation state is a SORTED ARRAY OF AT MOST K LONGS,
  * merged map-side like any partial aggregate — each task ships k longs per
  * group, never the distinct set itself (a `collect_set`-based rewrite
  * shuffles every distinct value and OOMs on high-cardinality groups). This
  * is the custom-`Aggregator` extension point: bounded-state algebraic
  * aggregation that Spark's built-ins don't cover.
  */
object Sketches {

  /** 60-bit hash space: 15 hex chars of md5, identical to
    * `('0x' || substr(md5(x), 1, 15))::BIGINT` in DuckDB. */
  private val HashSpace = 1152921504606846976.0 // 2^60 as an exact double

  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Typed aggregator keeping the k smallest DISTINCT input values in a
    * sorted array — O(k) state, O(log k) probe + O(k) insert per new small
    * value (values above the current k-th are rejected in O(log k)). */
  final class KMinValues(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0)

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(b: Array[Long], a: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, a)
      if (pos >= 0) b // already present
      else {
        val ins = -pos - 1
        if (b.length >= k && ins >= k) b // larger than the current k-th
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = a
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      // sorted-unique merge, truncated at k
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < b1.length || j < b2.length)) {
        val take =
          if (i >= b1.length) { j += 1; b2(j - 1) }
          else if (j >= b2.length) { i += 1; b1(i - 1) }
          else if (b1(i) < b2(j)) { i += 1; b1(i - 1) }
          else if (b2(j) < b1(i)) { j += 1; b2(j - 1) }
          else { i += 1; j += 1; b1(i - 1) }
        out(n) = take
        n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Array[Long]]()
  }

  /** The KMV estimate from a k-min array: exact count below k, else
    * (k-1)·H/h_(k). */
  private def estimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble * HashSpace)
        / element_at(mins, k).cast("double"))

  /** Per-group approximate distinct count of `valueCol`, exact below k.
    * Output: groupCols ++ (est_distinct: Double). Deterministic — same
    * estimate on every engine computing the same md5. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String, k: Int): DataFrame = {
    val kmv = udaf(new KMinValues(k))
    df.select((groupCols.map(col) :+ hash60(col(valueCol)).as("__hv")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("__hv")).as("__mins"))
      .select((groupCols.map(col) :+ estimate(col("__mins"), k).as("est_distinct")): _*)
  }

  /** Merges ALREADY-BUILT k-min sketches — the second level of a rollup. */
  final class KMinValuesMerge(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val inner = new KMinValues(k)
    override def zero: Array[Long] = Array.empty[Long]
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = inner.merge(b, a)
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = inner.merge(b1, b2)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Array[Long]]()
  }

  /** Two-level sketch rollup: build per-fine-group sketches once, then MERGE
    * the stored sketches into coarser-group estimates WITHOUT re-scanning
    * raw data. The merge is lossless — every coarse-group k-min hash is by
    * definition among its own fine group's k smallest — so the rolled-up
    * estimate is bit-identical to sketching the coarse group directly
    * (pinned by spec and by sharing the direct oracle).
    *
    * This is the property that makes sketches the right aggregate shape for
    * layered rollups (source → corpus, day → month) at 100 TB: the second
    * level aggregates k longs per fine group instead of re-reading the
    * corpus, so incremental/maintained rollups become metadata-sized jobs. */
  /** Count-Min frequency sketch, build side: `depth` hash families ×
    * `width` buckets of plain COUNTERS. Counters are order-free sums, so —
    * unlike Misra-Gries/space-saving, whose state depends on arrival order —
    * the sketch is deterministic, mergeable (bucket-wise addition), and
    * exactly oracle-expressible. Completes the sketch family next to KMV
    * (distinct counts) and the approx-percentile twin (quantiles).
    *
    * Build is ONE map-side-combined aggregation into depth×width cells
    * (bounded state regardless of cardinality); at 100 TB per-day/per-source
    * sketches add bucket-wise, the same layered-rollup shape as
    * [[kmvRollup]]. */
  def cmsBuild(df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame =
    cmsBuildWeighted(df.select(col(valueCol), lit(1L).as("__w")),
      valueCol, "__w", depth, width)

  /** [[cmsBuild]] over an already-aggregated (value, weight) relation:
    * `cnt` per counter is Σ weight — identical to counting the expanded
    * occurrence stream (integer sums reorder freely), so building from a
    * pre-aggregated vocabulary yields the SAME sketch while hashing each
    * distinct value once instead of once per occurrence (r17: the md5
    * family is 4 digests per row — per-token it dominated the gate cell;
    * per-word it is vocabulary-sized work at any corpus scale). */
  def cmsBuildWeighted(df: DataFrame, valueCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame =
    df.select(col(weightCol).as("__cms_w"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("family"),
            (graft.functions.TextFns.md5Long(col(valueCol), i) % width).as("bucket"))): _*))
        .as("fb"))
      .groupBy(col("fb.family").as("family"), col("fb.bucket").as("bucket"))
      .agg(sum(col("__cms_w")).as("cnt"))

  /** Probe a built CMS for `words`: est(w) = min over families of the probed
    * counter — the classic overestimate bound (est >= true count;
    * est - true <= corpus/width w.h.p. per family). */
  def cmsEstimate(cms: DataFrame, words: Seq[String], depth: Int, width: Int): DataFrame = {
    val spark = cms.sparkSession
    import spark.implicits._
    val probe = words.toDF("word")
      .select(col("word"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("family"),
          (graft.functions.TextFns.md5Long(col("word"), i) % width).as("bucket"))): _*))
        .as("fb"))
      .select(col("word"), col("fb.family").as("family"), col("fb.bucket").as("bucket"))
    probe.join(cms, Seq("family", "bucket"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------------ HLL

  /** HyperLogLog parameters chosen for cross-engine exactness: m = 32
    * buckets over a 40-bit md5-derived hash. The 40-bit space keeps every
    * intermediate an exact BIGINT: the scaled harmonic-mean denominator
    * Σ 2^(36-register) is at most 32·2^36 = 2^41 — integer addition is
    * order-free, so unlike a float Σ 2^-register the sketch is bit-identical
    * on any engine and any partitioning. */
  private val HllM = 32          // buckets (5 index bits)
  private val HllRestBits = 35   // 40 - 5
  private val HllRestMask = (1L << HllRestBits) - 1
  private val HllAlpha = 0.697   // published alpha_32 constant

  /** 40-bit hash = first 10 hex chars of md5 — same as DuckDB's
    * ('0x' || substr(md5(x), 1, 10))::BIGINT. */
  private[graft] def hash40(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 10), 16, 10).cast("long")

  /** Per-(group, bucket) max rank-of-first-set-bit — the HLL register file.
    * rho = (leading zeros of the 35-bit rest) + 1, via bin() string length
    * (identical semantics in Spark and DuckDB, incl. bin(0) = "0").
    * Registers are integer MAXes: order-free, mergeable, partial-aggregated
    * map-side like any algebraic aggregate — the sketch state is at most
    * m = 32 small longs per group no matter the cardinality. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = hash40(col(valueCol))
    val rest = h.bitwiseAND(lit(HllRestMask))
    val rho = when(rest === 0, lit(HllRestBits + 1))
      .otherwise(lit(HllRestBits + 1) - length(bin(rest)))
    df.select((groupCols.map(col) :+ shiftright(h, HllRestBits).as("bucket")
      :+ rho.cast("long").as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("register"))
  }

  /** Collapse a register file to the HLL estimate. All arithmetic before the
    * single final division is exact BIGINT; the raw estimate applies the
    * standard small-range (linear counting) correction. The estimate is
    * quantized to 1e-6 so the one transcendental (ln in the linear-counting
    * branch) cannot surface a sub-ulp libm difference in the hash compare. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val scaledTerm = expr(
      s"shiftleft(CAST(1 AS BIGINT), CAST(${HllRestBits + 1} - register AS INT))")
    val scaleF = (1L << (HllRestBits + 1)).toDouble
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(scaledTerm).as("s_present"), count(lit(1)).as("v_filled"))
      // empty buckets contribute 2^-0 = 1 → 2^36 scaled
      .withColumn("s_scaled",
        col("s_present") + (lit(HllM.toLong) - col("v_filled")) * (1L << (HllRestBits + 1)))
      .withColumn("est_distinct", {
        val empty = lit(HllM.toLong) - col("v_filled")
        val raw = lit(HllAlpha * HllM * HllM * scaleF) / col("s_scaled").cast("double")
        val corrected = when(raw <= lit(2.5 * HllM) && empty > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / empty.cast("double"))).otherwise(raw)
        floor(corrected * 1e6 + lit(0.5)) / 1e6
      })
      .select((groupCols.map(col) :+ col("v_filled") :+ col("s_scaled") :+ col("est_distinct")): _*)
  }

  /** Per-group HLL distinct estimate: build registers, collapse. One
    * map-side-combined aggregation end to end. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol), groupCols)

  /** The register file as a single custom `Aggregator` (state = one array of
    * m longs): the form STRUCTURED STREAMING needs — a streaming query allows
    * exactly ONE aggregation, so the two-level groupBy of [[hllRegisters]] +
    * [[hllEstimate]] cannot run on a stream, but group→udaf→projection can.
    * Same math, bit-identical output; per-window state is m longs regardless
    * of cardinality, which is the whole point of sketches under watermarked
    * windows. */
  final class HllRegisterAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](HllM)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val bucket = (h >>> HllRestBits).toInt
      val rest = h & HllRestMask
      val rho = HllRestBits + 1 - (if (rest == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > b(bucket)) b(bucket) = rho.toLong
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < HllM) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Array[Long]]()
  }

  /** Post-aggregation projection collapsing a register ARRAY column (from
    * [[HllRegisterAgg]]) to the same (v_filled, s_scaled, est_distinct)
    * triple as [[hllEstimate]] — bit-identical by construction, pinned by
    * spec. HOF lambdas run per OUTPUT row over m elements: interpreted
    * evaluation is irrelevant at that cardinality. */
  def hllFinalize(df: DataFrame, regsCol: String): DataFrame = {
    val emptyTerm = 1L << (HllRestBits + 1)
    df
      .withColumn("v_filled",
        expr(s"CAST(size(filter($regsCol, r -> r > 0)) AS BIGINT)"))
      .withColumn("s_scaled",
        expr(s"""aggregate($regsCol, CAST(0 AS BIGINT), (acc, r) -> acc +
                |  CASE WHEN r > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(${HllRestBits + 1} - r AS INT))
                |       ELSE CAST($emptyTerm AS BIGINT) END)""".stripMargin))
      .withColumn("est_distinct", {
        val empty = lit(HllM.toLong) - col("v_filled")
        val raw = lit(HllAlpha * HllM * HllM * emptyTerm.toDouble) / col("s_scaled").cast("double")
        val corrected = when(raw <= lit(2.5 * HllM) && empty > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / empty.cast("double"))).otherwise(raw)
        floor(corrected * 1e6 + lit(0.5)) / 1e6
      })
      .drop(regsCol)
  }

  /** Rollup of STORED register files into coarser groups. Register max is
    * associative, so merging fine-grained sketches is lossless — the rolled-
    * up estimate is bit-identical to sketching the coarse group directly
    * (shares the direct oracle, like [[kmvRollup]]). At 100 TB this turns
    * source→corpus / day→month distinct-count rollups into metadata-sized
    * jobs over m longs per fine group. */
  def hllRollup(
      df: DataFrame, fineCols: Seq[String], coarseCols: Seq[String],
      valueCol: String): DataFrame = {
    val fine = hllRegisters(df, fineCols, valueCol)
    val merged = fine
      .groupBy((coarseCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("register")).as("register"))
    hllEstimate(merged, coarseCols)
  }

  /** KMV set operations (theta-sketch style): estimate the union size,
    * intersection size and Jaccard of TWO SETS from their k-min sketches
    * alone — no join between the corpora ever happens. Key property: the
    * k smallest hashes of A ∪ B are a subset of sketchA ∪ sketchB, so the
    * union sketch derives from the two k-long arrays; the fraction of the
    * union sketch present in both sides estimates Jaccard, and
    * intersection ≈ jaccard · union. When both sketches are under k they
    * ARE their sets and every figure is exact (the small-set fast path).
    *
    * At 100 TB this answers "how much does corpus A overlap corpus B"
    * (vocabulary contamination, source dedup planning) from two
    * metadata-sized sketch rows — each side scanned once, independently,
    * possibly on different days. All integer until the final divisions. */
  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: String, k: Int): DataFrame = {
    val kmv = udaf(new KMinValues(k))
    val sa = a.select(hash60(col(valueCol)).as("h")).agg(kmv(col("h")).as("ka"))
    val sb = b.select(hash60(col(valueCol)).as("h")).agg(kmv(col("h")).as("kb"))
    val both = (arr: Column) => size(filter(arr,
      x => array_contains(col("ka"), x) && array_contains(col("kb"), x))).cast("long")
    sa.crossJoin(sb)
      .withColumn("ud", array_sort(array_distinct(concat(col("ka"), col("kb")))))
      .withColumn("exact", size(col("ka")) < k && size(col("kb")) < k)
      .withColumn("ku", slice(col("ud"), 1, k))
      .withColumn("u_size", size(col("ud")).cast("long"))
      .withColumn("c_both", when(col("exact"), both(col("ud"))).otherwise(both(col("ku"))))
      .withColumn("est_union",
        when(col("exact"), col("u_size").cast("double"))
          .otherwise(lit((k - 1).toDouble * HashSpace) / element_at(col("ku"), k).cast("double")))
      .withColumn("est_jaccard",
        when(col("exact"), col("c_both").cast("double") / col("u_size").cast("double"))
          .otherwise(col("c_both").cast("double") / k.toDouble))
      .withColumn("est_inter",
        when(col("exact"), col("c_both").cast("double"))
          .otherwise(col("c_both").cast("double") * col("est_union") / k.toDouble))
      .select(col("u_size"), col("c_both"), col("est_union"), col("est_inter"),
        col("est_jaccard"))
  }

  def kmvRollup(
      df: DataFrame, fineCols: Seq[String], coarseCols: Seq[String],
      valueCol: String, k: Int): DataFrame = {
    val kmv = udaf(new KMinValues(k))
    val kmvMerge = udaf(new KMinValuesMerge(k))
    val fine = df
      .select((fineCols.map(col) :+ hash60(col(valueCol)).as("__hv")): _*)
      .groupBy(fineCols.map(col): _*)
      .agg(kmv(col("__hv")).as("__sketch"))
    fine
      .groupBy(coarseCols.map(col): _*)
      .agg(kmvMerge(col("__sketch")).as("__mins"))
      .select((coarseCols.map(col) :+ estimate(col("__mins"), k).as("est_distinct")): _*)
  }
}
