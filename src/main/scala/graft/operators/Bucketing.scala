package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: the storage-side answer to repeated large joins.
  *
  * At 100 TB the dominant cost of a fact-fact join (lineitem x orders,
  * events x sessions) is shuffling both sides by the join key on EVERY query.
  * Writing the tables bucketed (hash-partitioned into a fixed number of
  * files per key, sorted within buckets) moves that shuffle to write time,
  * once: Spark's scan reports the hash partitioning, and joins or
  * aggregations on the bucket key run shuffle-free (SortMergeJoin with no
  * Exchange on either side). The reference engine's hive-style partition
  * router (SURVEY §2.2) covers value-partitioned layout; bucketing is the
  * complementary hash layout for high-cardinality keys where one directory
  * per value is impossible.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed and sorted by `key`. Co-locate
    * two tables by using the SAME bucket count and key semantics. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — shuffle-free when
    * both were written with [[writeBucketed]] and equal bucket counts. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
