package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives as pure Catalyst column builders (codegen'd, no
  * UDFs) — the building blocks for dedup, quality scoring, language ID and
  * fingerprinting over a document corpus. Every function is expressible in
  * portable ANSI-ish SQL, so each operator has a DuckDB oracle.
  */
object TextFns {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer pattern, restricted to the regex subset with
    * identical semantics in Java regex and RE2 (no lookahead — the original
    * pattern's `\s+(?!\S)` trailing-space rule is dropped; contractions,
    * space-prefixed letter runs, digit runs, punctuation runs, whitespace
    * runs are kept). Both engines match leftmost-first over the same
    * alternation order, so token boundaries agree by construction. */
  val BpeTokenPattern: String =
    "'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+"

  /** Subword-style token count: how many BPE pre-tokens a tokenizer would
    * see — the budget unit of sequence packing and training-cost estimates,
    * vs [[tokenCount]]'s whitespace words. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Distinct word n-grams, joined by a single space. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(filter(
      transform(toks, (_, i) => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      (_, i) => i <= size(toks) - n))
  }

  /** 60-bit hash of a string via md5 (stable across engines). Families come
    * in pairs sharing one digest: family 2p = hex chars 1..15 of
    * md5(p + ":" + s), family 2p+1 = hex chars 16..30 (see [[Kernels]]). */
  def md5Long(s: Column, family: Int): Column =
    conv(
      substring(md5(concat(lit((family / 2).toString), lit(":"), s)), 1 + 15 * (family % 2), 15),
      16, 10).cast("long")

  /** MinHash signature value j over a shingle array (interpreted reference
    * implementation of [[Kernels.minhashSig]]). */
  def minhash(shingles: Column, j: Int): Column =
    array_min(transform(shingles, s => md5Long(s, j)))

  /** SimHash over tokens: `bits`-wide sign-aggregated fingerprint.
    * bit k of the result = 1 iff sum over tokens of (+1/-1 by token-hash bit
    * k) is positive. */
  def simhash(toks: Column, bits: Int): Column = {
    val hashes = transform(toks,
      t => conv(substring(md5(concat(lit("7919:"), t)), 1, 15), 16, 10).cast("long"))
    (0 until bits).map { k =>
      val contrib = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, k) % 2 === 1, lit(1L)).otherwise(lit(-1L)))
      when(contrib > 0, lit(1L) * lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exact Jaccard similarity of two distinct-element arrays, as an exact
    * rational in doubles (one division of two ints — engine-portable). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Polynomial rolling-hash fingerprint of the full text: fold over
    * character codes, h = (h*31 + code) mod 1e9+7. Uses only int arithmetic
    * below 2^63 — portable. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, code) => (acc * 31L + code) % 1000000007L)

  /** Ratio of characters matching a regex, an exact single division of int counts
    * (bitwise-reproducible in any engine; no rounding — engines round differently). */
  def charRatio(text: Column, pattern: String): Column = {
    val total = length(text)
    val matched = total - length(regexp_replace(text, pattern, ""))
    when(total === 0, lit(0.0)).otherwise(matched.cast("double") / total.cast("double"))
  }

  /** Stopword hit ratio over tokens. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Heuristic language ID over script ranges + stopword families.
    * Deterministic scoring; returns the arg-max language code. */
  def langId(text: Column): Column = {
    val cyr = length(regexp_replace(text, "[\\u0400-\\u04FF]", ""))
    val cjk = length(regexp_replace(text, "[\\u4E00-\\u9FFF]", ""))
    val total = length(text)
    val toks = tokens(text)
    def hits(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
    val en = hits(Seq("the", "a", "and", "of", "to", "in", "is"))
    val es = hits(Seq("el", "la", "de", "que", "y", "los"))
    val de = hits(Seq("der", "die", "das", "und", "ist", "ein"))
    val fr = hits(Seq("le", "la", "les", "et", "est", "une"))
    when(total - cyr > 0, lit("ru"))
      .when(total - cjk > 0, lit("zh"))
      .when(es > en && es >= de && es >= fr, lit("es"))
      .when(de > en && de >= fr, lit("de"))
      .when(fr > en, lit("fr"))
      .otherwise(lit("en"))
  }
}
