package graft.operators

import graft.functions.TextFns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level text analysis: token counting, quality scoring, language
  * ID, fingerprinting. All pure per-row projections (no shuffle) built from
  * codegen'd expressions — at 100 TB these run at scan speed with full
  * column pruning.
  */
object TextAnalysis {

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with")

  def withTokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      TextFns.tokenCount(col(textCol)).as("n_tokens"),
      length(col(textCol)).as("len_chars"),
      size(array_distinct(TextFns.tokens(col(textCol)))).as("n_distinct_tokens"))

  /** Quality features + a composite score: length band, stopword share,
    * alphabetic share, token diversity. Score is built from exact
    * divisions and power-of-two weights so it is bit-reproducible everywhere. */
  def withQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val nToks = size(toks).cast("double")
    val diversity = when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / nToks)
    docs.select(
      col(idCol),
      length(col(textCol)).as("len_chars"),
      size(toks).as("n_tokens"),
      TextFns.stopwordRatio(col(textCol), EnStopwords).as("stopword_ratio"),
      TextFns.charRatio(col(textCol), "[a-zA-Z]").as("alpha_ratio"),
      diversity.as("token_diversity"))
      .withColumn(
        "quality_score",
        when(col("len_chars") < 20, lit(0.0)).otherwise(lit(0.25))
          + when(col("stopword_ratio").between(0.01, 0.6), lit(0.25)).otherwise(lit(0.0))
          + when(col("alpha_ratio") >= 0.6, lit(0.25)).otherwise(lit(0.0))
          + col("token_diversity") * lit(0.25))
  }

  def withLangId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextFns.langId(col(textCol)).as("predicted_lang"))

  def withFingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextFns.fingerprint(col(textCol)).as("fingerprint"))

  /** Corpus-wide top-k word n-grams by DOCUMENT frequency (each doc counts a
    * gram once — `wordNgramsSorted` emits distinct grams per doc). Shape:
    * explode -> hash-partial count (map-side combine absorbs the explosion
    * before the single shuffle) -> global top-k. At 100 TB the shuffle
    * carries one row per distinct (partition, gram), not per occurrence. */
  def topkNgrams(docs: DataFrame, textCol: String, n: Int = 3, k: Int = 20): DataFrame =
    docs
      .select(explode(graft.functions.Kernels.wordNgramsSortedCol(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram"))
      .limit(k)

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{7,}"

  /** PII scrubbing for training corpora: redacts email addresses and long
    * digit runs (phone/account numbers) and reports match counts. Patterns
    * are kept to the regex subset with identical semantics in Java regex and
    * RE2, so the redaction is oracle-checkable cross-engine. Pure per-row
    * projection — scan speed, no shuffle. */
  def withPiiRedaction(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(LongNumberPattern), lit(0))).as("n_numbers"),
      regexp_replace(
        regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        LongNumberPattern, "<NUM>").as("redacted"))
}
