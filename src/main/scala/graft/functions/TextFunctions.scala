package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline
  * operators (SURVEY.md §7.4). All pure `functions._` compositions —
  * codegen'd, no UDFs, embarrassingly parallel (no shuffle), so they
  * scale linearly with the corpus: the properties that matter at
  * 100 TB.
  *
  * Every function here has an exact ANSI-SQL mirror (used by the
  * DuckDB oracle), so hash-level cross-engine parity is testable.
  */
object TextFunctions {

  /** Whitespace-collapsed, lowercased canonical form. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Whitespace word split with empties dropped (handles leading /
    * trailing / repeated whitespace). */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  // Counts are cast to long: Spark's size()/length() return int32
  // while the oracle engine's return int64 — matching output types
  // keeps the driver's value hashing type-stable.
  def wordCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish tokenization: letter runs, single digits, single
    * non-alphanumeric marks — the shape of a byte-pair pre-tokenizer
    * (letters merge, digits don't, punctuation is its own token). */
  val BpeishPattern = "[a-z]+|[A-Z]+|[0-9]|[^A-Za-z0-9\\s]"
  // Typed function form, not expr(): inside a SQL string literal the
  // pattern's backslashes would need double-escaping.
  def bpeishTokenCount(textCol: String): Column =
    size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0))).cast("long")

  /** Punctuation-ish characters: anything outside [a-z0-9\s] on the
    * normalized form. */
  def punctCount(text: Column): Column =
    length(regexp_replace(normalized(text), "[a-z0-9 ]", "")).cast("long")

  /** Occurrences of `word` as a standalone word — counted via the
    * length-delta trick so the exact same arithmetic runs in the
    * oracle: `(len(padded) - len(replace(padded, w, ''))) / len(w)`
    * over the space-padded text. */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), normalized(text), lit(" "))
    val target = s" $word "
    // Plain (non-regex) replace: both engines scan left-to-right,
    // non-overlapping, so counts agree bit-exactly — including the
    // adjacent-repeat edge (" the the ") where one match consumes the
    // shared space.
    ((length(padded) - length(call_function("replace", padded, lit(target), lit(" ")))) /
      lit(target.length - 1)).cast("long")
  }

  /** Content fingerprint: md5 of the canonical form — the exact-dup
    * key (SURVEY.md §7.4 dedup family, tier 0). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Polynomial rolling hash over the word sequence — an
    * order-sensitive document fingerprint (two documents with the
    * same words in different order get different hashes, unlike the
    * set-based fingerprints). Folds `acc*31 + len(w)*ascii(first(w))`
    * mod 1e9+7 — every step is SQL-expressible, so the DuckDB oracle
    * replays it with `list_reduce`. */
  def rollingHash(textCol: String): Column =
    expr(
      s"""aggregate(
         |  filter(split(regexp_replace(lower($textCol), '\\\\s+', ' '), ' '), w -> w != ''),
         |  0L,
         |  (acc, w) -> (acc * 31L + length(w) * ascii(substring(w, 1, 1))) % 1000000007L
         |)""".stripMargin)

  /** Word n-gram shingles of the normalized text (MinHash input).
    * A document with fewer than `n` words yields one shingle of all
    * its words. */
  def shingles(wordsCol: String, n: Int): Column =
    expr(
      s"""transform(
         |  sequence(0, greatest(size($wordsCol) - $n, 0)),
         |  i -> array_join(slice($wordsCol, i + 1, $n), ' ')
         |)""".stripMargin)

  /** Small per-language stopword marker sets for the language-ID
    * heuristic. Intentionally tiny: the heuristic is
    * occurrence-counting, not a model. */
  val StopwordMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "une", "et", "est"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
  )

  def stopwordHits(text: Column, lang: String): Column =
    StopwordMarkers(lang).map(w => wordOccurrences(text, w))
      .reduce(_ + _)

  /** CJK codepoint count — the zh detector. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")).cast("long")
}
