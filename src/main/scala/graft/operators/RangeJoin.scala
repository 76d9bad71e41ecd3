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

  /** Interval × interval OVERLAP join (genomics/session-overlap staple):
    * pair every left interval `[lLo, lHi)` with every right interval
    * `[rLo, rHi)` they intersect — again with NO equi key, so the same
    * bucket rewrite applies with one extra twist: a pair of long intervals
    * co-occupies MANY buckets, so the match is emitted only from the bucket
    * containing `greatest(lLo, rLo)` (the overlap's start — exactly one
    * bucket per pair, the standard distributed-interval-join dedup; no
    * DISTINCT pass over the output). Replication factor `len/W + 1` per
    * side; shuffle keyed by bucket; AQE-splittable hot buckets. */
  def overlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    // Empty/ill-formed intervals (hi <= lo) match nothing — dropped up
    // front. Also the guard against the r6 sequence() trap: a descending
    // bucket range would silently replicate onto wrong buckets.
    val l = left.filter(col(lHiCol) > col(lLoCol)).withColumn(
      "__bucket", explode(sequence(bucketOf(col(lLoCol)), bucketOf(col(lHiCol)))))
    val r = right.filter(col(rHiCol) > col(rLoCol)).withColumn(
      "__bucket", explode(sequence(bucketOf(col(rLoCol)), bucketOf(col(rHiCol)))))
    l.join(r, Seq("__bucket"))
      .filter(col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol))
      .filter(col("__bucket") === bucketOf(greatest(col(lLoCol), col(rLoCol))))
      .drop("__bucket")
  }
}
