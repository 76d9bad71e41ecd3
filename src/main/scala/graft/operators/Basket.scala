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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = bi.select(col("b")).distinct().count()
    val itemCounts = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
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
