package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for corpus curation, built entirely from
  * codegen'd Spark built-ins so every score is also expressible as the
  * DuckDB oracle's ANSI SQL (the driver hash-compares both).
  */
object TextFunctions {

  /** Whitespace token count; 0 for blank strings (split of "" yields [""]
    * in both engines, so the blank guard keeps them aligned).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword-budget estimate: count of GPT-2-style pre-tokenizer
    * matches — letter runs, digit runs, and non-space symbol runs each
    * seed at least one merge group [public: Radford et al. 2019 BPE
    * pre-tokenization]. A cheap codegen'd stand-in for a real tokenizer
    * when budgeting token volume at corpus scale; real BPE merges only
    * split within runs, so this lower-bounds the true count.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))
      .cast("long")

  /** Engine-independent HALF-UP rounding at 6 decimals:
    * FLOOR(x·10^6 + 0.5)/10^6. `round(x, 6)` rounds the double's
    * shortest decimal repr (Spark) vs its binary value (DuckDB) and the
    * two diverge on ties; floor of bit-identical doubles cannot
    * (ARCHITECTURE.md "Correctness strategy"). These ratios divide exact
    * integer counts, so the pre-round doubles ARE bit-identical.
    */
  private def round6(x: Column): Column =
    floor(x * 1000000.0 + 0.5) / 1000000.0

  /** Fraction of characters that are ASCII letters, 6 decimals. */
  def alphaRatio(text: Column): Column =
    round6(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(length(text), lit(1)))

  /** Mean token length (whitespace removed / token count), 6 decimals. */
  def avgWordLen(text: Column): Column =
    round6(length(regexp_replace(text, "\\s", "")).cast("double") /
      greatest(tokenCount(text), lit(1)))

  /** Composite quality score in [0,1]: letter density x saturating length
    * factor (>= 20 tokens = full credit) — the usual cheap pre-filter for
    * training corpora, 6 decimals.
    */
  def qualityScore(text: Column): Column =
    round6(
      (length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
        greatest(length(text), lit(1))) *
        least(lit(1.0), tokenCount(text).cast("double") / 20.0))

  /** Per-language stopword marker lists for the n-gram/stopword-count
    * language heuristic. Deliberately tiny and public: the top function
    * words of each language.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  private def markerHits(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(markers.map(lit): _*), t)))

  /** Stopword-count language ID: argmax of per-language marker hits over
    * lowercased whitespace tokens; ties break in lang-code order; zero
    * hits everywhere -> 'und' (undetermined), mirroring BCP-47.
    */
  def langId(text: Column): Column = {
    val tokens = split(lower(text), "\\s+")
    val hits = LangMarkers.map { case (lang, ms) => lang -> markerHits(tokens, ms) }
    val maxHits = greatest(hits.map(_._2): _*)
    // first language (in declared order) reaching the max
    hits.reverse.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(maxHits > 0 && h === maxHits, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical-form content fingerprint: md5 of lowercased,
    * whitespace-collapsed text — the exact-dup key that survives
    * formatting noise. (The incremental/rolling variant is
    * RollingHashExpr.)
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** PII patterns, shared verbatim with the DuckDB oracle SQL. Kept to the
    * RE2-compatible subset (no lookarounds, no backreferences) so the same
    * pattern string means the same thing under Java regex (Spark) and RE2
    * (DuckDB). Deliberately high-recall / moderate-precision — the standard
    * posture for a training-corpus scrub, where a false redaction costs one
    * token and a miss leaks PII into model weights.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"

  /** Redact emails, IPv4 addresses, and international-format phone numbers
    * with typed placeholder tokens. Email runs first (its local part may
    * contain digits-and-dots that the IP pattern would otherwise bite),
    * then IP, then phone. Pure codegen'd regexp_replace chain — no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Fraction of characters that are neither alphanumeric nor whitespace,
    * 6 decimals — the "symbol soup" signal in C4/Gopher-style quality
    * rules [public: Raffel et al. 2020; Rae et al. 2021].
    */
  def symbolRatio(text: Column): Column =
    round6(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)))
}
