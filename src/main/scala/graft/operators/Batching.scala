package graft.operators

import graft.functions.TextFns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch construction: deterministic epoch ordering, round-robin
  * source interleaving, and token-budget sequence packing.
  *
  * Scale rule obeyed throughout: NO GLOBAL WINDOW. A running index over the
  * whole corpus (`row_number() OVER (ORDER BY ...)`) collapses onto a single
  * task; instead these operators emit SORT KEYS (epoch ordering, interleave)
  * or partition their window by a deterministic shard (packing), so every
  * step stays parallel — a range-partitioned sort by key is Spark's native
  * distributed total order.
  */
object Batching {

  /** Reproducible epoch shuffle: `order_key = md5(seed ":" id)`. Sorting by
    * (order_key, id) is a uniform deterministic permutation of the corpus —
    * different per `seed` (epoch), identical across runs/clusters. The sort
    * itself is left to the consumer (`orderBy` = parallel range sort). */
  def epochOrderKey(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("order_key",
      md5(concat_ws(":", lit(seed).cast("string"), col(idCol).cast("string"))))

  /** Round-robin source interleaving key: rank within stratum (by a
    * seed-keyed md5, so the within-source order is itself shuffled), paired
    * with the stratum. Sorting by (rr_rank, stratum) yields the
    * source-interleaved training order — the standard fair-mixing pass.
    * The window partitions by stratum: parallel across sources. */
  def interleaveKey(
      df: DataFrame, idCol: String, strataCol: String, seed: Long): DataFrame = {
    val h = md5(concat_ws(":", lit(seed).cast("string"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("rr_rank", row_number().over(w).cast("long"))
  }

  /** Token-budget sequence packing, shard-local: documents are
    * deterministically sharded (first hex digit of md5(id) — 16 shards;
    * real pipelines shard by output partition), and within a shard, taken
    * in id order, `bin = floor(exclusive_cumulative_tokens / budget)` —
    * contiguous bins of ~`budget` tokens each (a doc straddling a boundary
    * belongs to the bin its first token falls in). Downstream concatenates
    * each (shard, bin) group into one training sequence. The window
    * partitions by shard, so packing is parallel and adding shards scales
    * it linearly; bins are stable under re-runs (pure function of ids). */
  def packByTokenBudget(
      df: DataFrame, idCol: String, textCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val shard = substring(md5(col(idCol).cast("string")), 1, 1)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(idCol), shard.as("shard"),
      TextFns.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget)).cast("long"))
  }

  /** Length-bucketed batch assembly — the dynamic-batching trick that cuts
    * padding waste: documents are grouped into token-length buckets
    * (`bucket = n_tokens div bucketWidth`), ordered within a bucket by a
    * seed-keyed md5 (shuffled but reproducible), and cut into batches of
    * `batchSize`. Because every batch draws from ONE bucket, its max-length
    * spread — and so its padding — is bounded by `bucketWidth`. Emits
    * per-batch audit rows: size, token min/max/sum, and
    * `padding_waste = n·max − sum` (the tokens a pad-to-max collator burns);
    * compare against the unbucketed waste to price the bucketing.
    *
    * Scale: the window partitions by BUCKET (parallel across buckets; no
    * global window); per-batch aggregation is map-combinable. A bucket is
    * the natural output-partition key for the downstream writer. */
  def lengthBucketedBatches(
      df: DataFrame, idCol: String, textCol: String,
      bucketWidth: Long, batchSize: Long, seed: Long): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "bucketWidth and batchSize must be positive")
    val h = md5(concat_ws(":", lit(seed).cast("string"), col(idCol).cast("string")))
    val toks = df.select(col(idCol),
      TextFns.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $bucketWidth"))
    val w = Window.partitionBy(col("bucket")).orderBy(h, col(idCol))
    toks
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("batch_idx", expr(s"rn div $batchSize"))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"), sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }
}
