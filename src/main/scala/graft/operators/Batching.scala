package graft.operators

import graft.functions.TextFns

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Curriculum ordering (Bengio et al. '09): phase training data
    * easy-to-hard by an integer difficulty signal, shuffled reproducibly
    * WITHIN each phase so the model sees a phase's examples in random
    * order but never a hard example before its phase opens. The curriculum
    * consumption order is `ORDER BY (phase, order_key, id)` — emitted as
    * sort KEYS, not a global row number, so the writer range-partitions it
    * ([[epochOrderKey]]'s rule: no single-partition global window at any
    * corpus size).
    *
    * Phase boundaries are interpolated percentiles of the difficulty
    * distribution (equal-population phases): BIGINT-input `percentile`
    * is bit-stable cross-engine (the CCNet-buckets precedent), thresholds
    * ride a one-row broadcast, and `phase` counts strictly-exceeded
    * thresholds — ties at a boundary land in the earlier (easier) phase.
    * Shape: one scan + one tiny agg + a broadcast cross join; no shuffle
    * keyed on data. */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: Column,
      phases: Int = 4, seed: Long = 7L): DataFrame = {
    require(phases >= 2 && phases <= 20, "phases must be in [2, 20]")
    val d = df.select(col(idCol), difficultyCol.cast("long").as("difficulty"))
    val aggs = (1 until phases).map(i =>
      expr(f"percentile(difficulty, ${i.toDouble / phases}%.9f)").as(s"t${i - 1}"))
    val th = d.agg(aggs.head, aggs.drop(1): _*)
    val phase = (0 until phases - 1).map(i =>
      (col("difficulty") > col(s"t$i")).cast("long")).reduce(_ + _)
    d.crossJoin(broadcast(th))
      .select(col(idCol), col("difficulty"), phase.as("phase"),
        md5(concat_ws(":", lit(seed).cast("string"), col(idCol).cast("string")))
          .as("order_key"))
  }

  /** Size-balanced shard assignment for training-shard writes: documents
    * stratify into equal-population SIZE bands (the [[curriculumOrder]]
    * percentile machinery over a size signal), and within each band deal
    * round-robin — shuffled reproducibly by a seed-keyed md5 — onto
    * `nShards` shards. Every shard then holds (to within one doc per band)
    * the same count from every size band, so both document counts AND total
    * sizes balance without any global coordination: plain `shard =
    * hash % n` balances counts but lets a shard draw all the long docs,
    * and the exact LPT bin-packing answer is an inherently sequential
    * greedy. Output: (id, size, band, shard).
    *
    * Shape: one tiny percentile agg + broadcast (band thresholds), then a
    * window PARTITIONED BY BAND (parallel across bands — never global).
    * Within-band order is the md5 key, so the dealing is deterministic and
    * cluster-independent. */
  def shardBySize(df: DataFrame, idCol: String, sizeCol: Column,
      nShards: Int, bands: Int = 8, seed: Long = 11L): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val banded = curriculumOrder(df, idCol, sizeCol, bands, seed)
      .withColumnRenamed("difficulty", "size")
      .withColumnRenamed("phase", "band")
    val w = Window.partitionBy(col("band")).orderBy(col("order_key"), col(idCol))
    banded
      .withColumn("shard", pmod(row_number().over(w) - 1, lit(nShards)).cast("long"))
      .select(col(idCol), col("size"), col("band"), col("shard"))
  }
}
