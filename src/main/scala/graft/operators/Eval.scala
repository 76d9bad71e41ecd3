package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval/ranking evaluation operators — the harness that answers "how
  * faithful is the cheap ranking to the expensive one" when a pipeline
  * swaps brute-force scoring for a compressed or projected variant.
  */
object Eval {

  /** Per-query Kendall tau-a between two score columns over the same item
    * set: every unordered item pair contributes +1 (both scores order it
    * the same way), −1 (opposite), or 0 (a tie in either score);
    * tau = (concordant − discordant) / n_pairs. All counting is exact
    * integers over sign comparisons of bit-identical doubles, so the
    * metric itself is oracle-checkable — an eval number you can trust
    * across engines.
    *
    * Shape: one self equi-join on the query key with `item < item` — the
    * fanout is Σ per-query k², bounded by the top-k lists being compared,
    * never the corpus. */
  def kendallTau(
      scored: DataFrame, qCol: String, itemCol: String,
      scoreA: String, scoreB: String): DataFrame = {
    val l = scored.select(col(qCol).as("q"), col(itemCol).as("i"),
      col(scoreA).as("a"), col(scoreB).as("b"))
    val r = scored.select(col(qCol).as("q2"), col(itemCol).as("i2"),
      col(scoreA).as("a2"), col(scoreB).as("b2"))
    l.join(r, col("q") === col("q2") && col("i") < col("i2"))
      .select(col("q").as("query_id"),
        (signum(col("a") - col("a2")) * signum(col("b") - col("b2"))).as("sgn"))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("sgn") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("sgn") < 0, 1L).otherwise(0L)).as("discordant"))
      .withColumn("tau",
        (col("concordant") - col("discordant")).cast("double")
          / col("n_pairs").cast("double"))
  }
}
