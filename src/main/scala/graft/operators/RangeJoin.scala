package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points x intervals with NO equi key — "which price
  * band / IP block / time window does this value fall in". Spark has no
  * native operator: a bare `p JOIN i ON p.v >= i.lo AND p.v < i.hi` has no
  * equi condition, so Catalyst's only physical choices are
  * BroadcastNestedLoopJoin (O(|P| * |I|) comparisons) or a cartesian product
  * — both non-starters once either side is large.
  *
  * The bucketed rewrite turns it into an equi-join: pick a bucket width W,
  * replicate each interval onto every W-aligned bucket it overlaps
  * (`explode(sequence(floor(lo/W), floor(hi/W)))`), hash points to
  * `floor(v/W)`, equi-join on the bucket id and re-check the exact bounds.
  * Cost: one shuffle keyed by bucket; interval replication factor is
  * `len/W + 1`, so W trades replication against per-bucket fan-in. Skewed
  * value distributions degrade to hot BUCKETS (splittable by AQE — unlike
  * the un-bucketed join, which has no key to split at all).
  */
object RangeJoin {

  /** Inner-join `points` to every interval of `intervals` containing
    * `pointCol` (inclusive lo, exclusive hi). Overlapping intervals yield
    * one output row per match; points in no interval are dropped.
    * `bucketWidth` should be of the order of the typical interval length. */
  def bucketed(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val ints = intervals.withColumn(
      "__bucket", explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val pts = points.withColumn("__bucket", bucketOf(col(pointCol)))
    pts.join(ints, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
