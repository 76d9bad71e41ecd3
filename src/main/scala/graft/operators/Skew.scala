package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot-key workloads at cluster scale.
  *
  * AQE's skew-join splitting (enabled in the session defaults) covers sort-
  * merge joins; these helpers cover the remaining shapes:
  *
  *  - `saltedAgg`: two-stage aggregation — pre-aggregate on (key, salt) so a
  *    hot key's rows spread over `buckets` reducers, then merge. Works for
  *    any algebraic aggregate (sum/count/min/max pairs passed in).
  *  - `saltedBroadcastableJoin`: replicate the SMALL side `buckets` times and
  *    salt the big side's key, so one hot key no longer lands on a single
  *    task even when the join must shuffle.
  *
  * The salt is derived from a stable hash of a tiebreaker column (never
  * rand() — results must be deterministic under retries and re-runs; a
  * speculative re-execution of a rand()-salted task would change results).
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a tiebreaker column. */
  def salt(tiebreaker: Column, buckets: Int): Column =
    pmod(xxhash64(tiebreaker), lit(buckets))

  /** Two-stage salted aggregation: `aggs` maps output name -> (partial,
    * merge) expressions, e.g. "n" -> (count(lit(1)), sum(col("n"))). */
  def saltedAgg(
      df: DataFrame, keyCols: Seq[String], tiebreaker: String, buckets: Int,
      aggs: Map[String, (Column, Column)]): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(col(tiebreaker), buckets))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        aggs.head._2._2.as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m.as(n) }.toSeq: _*)
  }

  /** Salted join for a skewed big side against a small (replicable) side:
    * small side is exploded once per salt bucket, big side joins on
    * (key, salt) — the hot key's rows fan out over `buckets` tasks. */
  def saltedBroadcastableJoin(
      big: DataFrame, small: DataFrame, key: String, bigTiebreaker: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(col(bigTiebreaker), buckets))
    val replicatedSmall = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit(_)): _*)))
    saltedBig
      .join(broadcast(replicatedSmall), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
