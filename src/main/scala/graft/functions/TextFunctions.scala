package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale training-data
 * pipelines: tokenization, token counting (whitespace + BPE-ish),
 * quality scoring, language ID (stopword heuristic), fingerprinting.
 *
 * All are composed from org.apache.spark.sql.functions (codegen'd,
 * whole-stage) — no UDFs in the hot path, so they scan at parquet
 * speed on 100 TB.
 */
object TextFunctions {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces OR single non-space symbols —
    * the standard pre-tokenizer regex shape. */
  val bpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Ratio of alphabetic chars to total chars. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      length(text).cast("double")

  // Tiny per-language stopword profiles (language-ID heuristic).
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "un", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))
  val langs: Seq[String] = Seq("de", "en", "es", "fr", "zh") // tie-break order

  /** Count of tokens belonging to `lang`'s stopword set. */
  def stopwordHits(text: Column, lang: String): Column = {
    val set = stopwords(lang)
    size(filter(tokens(text), t => t.isin(set: _*)))
  }

  /** Stopword ratio against the union of all profiles. */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct
    size(filter(tokens(text), t => t.isin(all: _*))).cast("double") /
      greatest(wsTokenCount(text).cast("double"), lit(1.0))
  }

  /**
   * Language ID: argmax of per-language stopword hits, ties broken by
   * [[langs]] order, no hits at all → "und". A real deployment swaps
   * in char-trigram profiles; the pipeline shape (pure column expr,
   * no shuffle) is identical.
   */
  def langId(text: Column): Column = {
    val hits = langs.map(l => l -> stopwordHits(text, l))
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === best && h > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /**
   * Heuristic quality score in [0,1]: alphabetic density + length
   * saturation + stopword presence. Deterministic double arithmetic.
   */
  def qualityScore(text: Column): Column =
    lit(0.4) * alphaRatio(text) +
      lit(0.3) * least(lit(1.0), wsTokenCount(text).cast("double") / lit(100.0)) +
      lit(0.3) * stopwordRatio(text)

  /** Content fingerprint: md5 hex of the exact text. */
  def fingerprintMd5(text: Column): Column = md5(text.cast("binary"))

  // PII redaction patterns — restricted to character classes and
  // counted quantifiers so Java regex (Spark) and RE2 (DuckDB) agree.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longDigitPattern = "[0-9]{7,}"

  /** PII scrubbing: emails → <EMAIL>, 7+-digit runs (phone/account
    * numbers) → <NUM>. Pure regexp_replace — scan-speed, no shuffle.
    * A real deployment adds NER-based passes; the pipeline shape
    * (columnar rewrite before tokenization) is identical. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      longDigitPattern, "<NUM>")

  /** Distinct-token ratio — the cheap repetition/quality signal (low
    * ratio = boilerplate or degenerate repetition). */
  def distinctTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") /
      greatest(wsTokenCount(text).cast("double"), lit(1.0))

  /**
   * Rolling polynomial fingerprint over whitespace tokens
   * (order-sensitive, whitespace-normalizing — unlike md5):
   * h = (h*31 + x) mod 2^57-13, overflow-free under ANSI arithmetic
   * (h < 2^57, 31h + x32 < 2^62+2^32 < 2^63).
   *
   * The per-token 32-bit value is the first 8 hex digits of the
   * token's md5 — md5 (not xxhash64) so the whole fingerprint is
   * engine-replicable and DuckDB-oracled; the bits are equally uniform.
   */
  val FpSeed: Long = 1125899906842597L
  val FpP: Long = (1L << 57) - 13
  def fingerprintRolling(text: Column): Column =
    aggregate(
      transform(tokens(text),
        t => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long")),
      lit(FpSeed % FpP),
      (h, x) => pmod(h * lit(31L) + x, lit(FpP)))
}
