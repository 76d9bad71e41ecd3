package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * check a continuously-maintained training corpus runs after every
  * ingest/curation change: has the length/score/source mix moved?
  *
  * Population Stability Index over fixed-width buckets:
  *   PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)
  * with Laplace(+1) smoothing so empty buckets stay defined. All inputs are
  * integer counts; each bucket's ln is quantized to 1e-9 BEFORE the
  * order-free integer sum (the repo's standard exactness pattern), and the
  * (p−q) difference is carried as the exact integer numerator over the
  * common denominator (Nb+B)(Nc+B) — so the statistic hash-matches a SQL
  * oracle despite being "floating-point" math on paper.
  *
  * Scale shape: one map-side-combined count aggregation per snapshot (B
  * bucket rows each), a B-row join, a B-row sum. The corpus is scanned
  * once per side regardless of B; everything after the counts is
  * metadata-sized. Conventional read: PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted.
  */
object Drift {

  /** Per-bucket smoothed PSI terms plus totals. Buckets are fixed-width
    * (`width`) with the last bucket catching the tail — fixed boundaries
    * (not quantiles) so the bucketing is a pure function of the value and
    * two snapshots bucket identically. Returns one row per bucket id
    * 0..buckets-1 with both counts and the 1e-9-scaled term. */
  def psiBuckets(
      base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame = {
    require(width > 0 && buckets > 1)
    val spark = base.sparkSession
    // clamp BOTH tails: values below 0 land in bucket 0, above the range in
    // the last bucket — otherwise negative scores fall outside the bucket
    // frame join and silently vanish from counts AND totals
    def side(df: DataFrame, name: String): DataFrame =
      df.select(greatest(least(floor(col(valueCol) / width), lit(buckets - 1)), lit(0))
          .cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(name))
    val b = side(base, "n_base")
    val c = side(current, "n_cur")
    spark.range(buckets).select(col("id").as("bucket"))
      .join(b, Seq("bucket"), "left")
      .join(c, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
  }

  /** The PSI statistic from [[psiBuckets]] output: single row
    * (n_base, n_cur, psi_scaled, psi). */
  def psi(bucketCounts: DataFrame, buckets: Int): DataFrame = {
    val tot = bucketCounts.agg(
      sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    bucketCounts.crossJoin(broadcast(tot))
      .select(col("n_base"), col("n_cur"), col("tb"), col("tc"),
        // smoothed ratio p/q = (cb+1)(tc+B) / ((cc+1)(tb+B)); ln quantized
        floor(log(((col("n_base") + 1) * (col("tc") + buckets)).cast("double")
            / ((col("n_cur") + 1) * (col("tb") + buckets)).cast("double")) * 1e9 + lit(0.5))
          .cast("long").as("qln"),
        // exact integer numerator of (p - q) over (tb+B)(tc+B)
        ((col("n_base") + 1) * (col("tc") + buckets)
          - (col("n_cur") + 1) * (col("tb") + buckets)).as("pq_num"))
      .groupBy(col("tb"), col("tc"))
      .agg(sum(col("pq_num") * col("qln")).as("psi_scaled"))
      .select(col("tb").as("n_base"), col("tc").as("n_cur"),
        col("psi_scaled"),
        (col("psi_scaled").cast("double")
          / (col("tb") + buckets).cast("double")
          / (col("tc") + buckets).cast("double") / 1e9).as("psi"))
  }

  /** One-call form: PSI of `valueCol` between two snapshots. */
  def psiOf(base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame =
    psi(psiBuckets(base, current, valueCol, width, buckets), buckets)

  /** Per-GROUP PSI — the form a stratified corpus monitor actually runs
    * ("which language/source drifted?"): the same smoothed integer algebra
    * computed independently inside each group, one row per group. The
    * bucket frame is (groups present on either side) × buckets, so a group
    * that vanished from the current snapshot still reports (its PSI is
    * driven entirely by the smoothing floor — loud, not absent). */
  def psiByGroup(
      base: DataFrame, current: DataFrame, groupCol: String, valueCol: String,
      width: Long, buckets: Int): DataFrame = {
    require(width > 0 && buckets > 1)
    val spark = base.sparkSession
    def side(df: DataFrame, name: String): DataFrame =
      df.select(col(groupCol).as("g"),
        greatest(least(floor(col(valueCol) / width), lit(buckets - 1)), lit(0))
          .cast("long").as("bucket"))
        .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as(name))
    val groups = base.select(col(groupCol).as("g"))
      .union(current.select(col(groupCol).as("g"))).distinct()
    val frame = groups.crossJoin(spark.range(buckets).select(col("id").as("bucket")))
    val j = frame
      .join(side(base, "n_base"), Seq("g", "bucket"), "left")
      .join(side(current, "n_cur"), Seq("g", "bucket"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val tot = j.groupBy(col("g"))
      .agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    j.join(tot, "g")
      .select(col("g"), col("tb"), col("tc"),
        floor(log(((col("n_base") + 1) * (col("tc") + buckets)).cast("double")
            / ((col("n_cur") + 1) * (col("tb") + buckets)).cast("double")) * 1e9 + lit(0.5))
          .cast("long").as("qln"),
        ((col("n_base") + 1) * (col("tc") + buckets)
          - (col("n_cur") + 1) * (col("tb") + buckets)).as("pq_num"))
      .groupBy(col("g"), col("tb"), col("tc"))
      .agg(sum(col("pq_num") * col("qln")).as("psi_scaled"))
      .select(col("g").as(groupCol), col("tb").as("n_base"), col("tc").as("n_cur"),
        col("psi_scaled"),
        (col("psi_scaled").cast("double")
          / (col("tb") + buckets).cast("double")
          / (col("tc") + buckets).cast("double") / 1e9).as("psi"))
  }
}
