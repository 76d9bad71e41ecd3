package graft

import graft.operators.Skew

import org.apache.spark.sql.functions._

/** Salted aggregation/join must produce exactly the unsalted results while
  * spreading hot keys over many partitions. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  // heavily skewed: 90% of rows share one key
  private lazy val skewed = spark.range(0, 100000)
    .select(
      when($"id" % 10 < 9, lit("hot")).otherwise(concat(lit("k"), $"id" % 50)).as("key"),
      $"id".as("v"))

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"), max($"v").as("mx"))
      .orderBy("key").collect().toSeq
    val salted = Skew.saltedAgg(
      skewed, Seq("key"), tiebreaker = "v", buckets = 16,
      aggs = Map(
        "n" -> (count(lit(1)), sum(col("n"))),
        "s" -> (sum(col("v")), sum(col("s"))),
        "mx" -> (max(col("v")), max(col("mx")))))
      .orderBy("key").collect().toSeq
    assert(salted == plain)
    // the partial stage really spreads the hot key over the salt space
    val partials = skewed.withColumn("__salt", Skew.salt($"v", 16))
      .filter($"key" === "hot").select("__salt").distinct().count()
    assert(partials == 16)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val plain = skewed.join(dim, Seq("key")).groupBy("label").count()
      .orderBy("label").collect().toSeq
    val salted = Skew.saltedBroadcastableJoin(skewed, dim, "key", "v", buckets = 8)
      .groupBy("label").count().orderBy("label").collect().toSeq
    assert(salted == plain)
  }
}
