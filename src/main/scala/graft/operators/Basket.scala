package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis: which items appear together in the
  * same basket (order, session, document) more often than chance — the
  * classic association-mining surface (support / confidence-free lift)
  * behind "frequently bought together" and feature co-occurrence audits.
  *
  * lift(a,b) = N · n_ab / (n_a · n_b): all counts are integers; the single
  * final expression is a division chain on identical operands in both
  * engines, so the statistic hash-matches a SQL oracle.
  *
  * Scale shape: one self equi-join on the BASKET key — both sides hash-
  * partition on basket id, never a cartesian — with the `item_a < item_b`
  * canonical ordering halving the pair space; pair counts partial-aggregate
  * map-side. Pair fanout is Σ_basket k², bounded by basket size, not corpus
  * size; `minSupport` prunes the long tail before the lift join, and the
  * per-item counts are a vocabulary-sized broadcast.
  */
object Basket {

  /** Item-pair co-occurrence with lift. `df` is one row per (basket, item)
    * occurrence; duplicates within a basket are collapsed first (an item
    * twice in one order is one co-occurrence). Returns
    * (item_a, item_b, n_ab, n_a, n_b, lift) for pairs with n_ab >= minSupport. */
  def coOccurrence(
      df: DataFrame, basketCol: String, itemCol: String, minSupport: Long): DataFrame = {
    // persisted: the distinct (basket, item) relation feeds the basket
    // count, the item counts AND both self-join sides — without the cache
    // the scan+distinct replays up to four times. Stays cached for the
    // caller's lifetime (same residual contract as connectedComponents).
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
      .transform(Residuals.persist)
    val n = bi.select(col("b")).distinct().count()
    val itemCounts = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    liftJoin(bi, itemCounts, n, minSupport)
  }

  /** Document-frequency-banded variant for vocabulary-as-items workloads
    * (documents are baskets, tokens are items). Plain `coOccurrence`'s
    * Σ basket² fanout is bounded by basket size only when baskets are small
    * (orders); when baskets are documents, stopwords pair each document's
    * ENTIRE vocabulary — the quadratic blowup at corpus scale. This variant
    * prunes the (basket, item) stream to items whose document frequency lies
    * in [minDf, n·maxDfPerMille div 1000] BEFORE the self-join, via a
    * broadcast semi-join against the vocabulary-sized band.
    *
    * The relation is distinct per (basket, item), so per-item count == df
    * and the lift denominators come straight from the banded vocabulary.
    * `n` (lift's corpus size) stays the FULL basket count, band-independent.
    * A pair with n_ab >= minSupport has df >= minSupport on both items, so
    * minDf <= minSupport is a pure pruning win (cannot change the result);
    * the maxDf cut is the deliberate stopword exclusion. */
  def coOccurrenceBanded(
      df: DataFrame, basketCol: String, itemCol: String, minSupport: Long,
      minDf: Long, maxDfPerMille: Long): DataFrame = {
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
      .transform(Residuals.persist)
    val n = bi.select(col("b")).distinct().count()
    val maxDf = n * maxDfPerMille / 1000 // driver Long div == DuckDB `//`
    // persisted: the banded vocabulary feeds the semi-join AND both lift
    // denominators — without the cache each broadcast re-aggregates bi
    val vocab = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
      .filter(col("n_i") >= minDf && col("n_i") <= maxDf)
      .transform(Residuals.persist)
    val banded = bi.join(broadcast(vocab.select(col("i"))), Seq("i"), "left_semi")
    liftJoin(banded, vocab, n, minSupport)
  }

  private def liftJoin(
      bi: DataFrame, itemCounts: DataFrame, n: Long, minSupport: Long): DataFrame = {
    val a = bi.as("a")
    val c = bi.as("c")
    val pairs = a.join(c, col("a.b") === col("c.b") && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("item_a"), col("c.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("i", "item_a").withColumnRenamed("n_i", "n_a")), "item_a")
      .join(broadcast(itemCounts.withColumnRenamed("i", "item_b").withColumnRenamed("n_i", "n_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        (lit(n.toDouble) * col("n_ab") / col("n_a") / col("n_b")).as("lift"))
  }
}
