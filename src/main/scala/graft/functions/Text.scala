package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Frozen tokenizer + token-hash used by every text operator (BM25, dedup,
  * fingerprinting). Spark and the DuckDB oracle must tokenize identically,
  * so the regex is fixed here and mirrored in [[sqlTokens]].
  *
  * Tokenization ≈ lucene.standard for this corpus (reference `indexes.py:84`
  * declares the `title` full-text field; testdata `documents.text` is a
  * lowercase keyword bag): lowercase, split on runs of non-alphanumerics,
  * drop empties.
  */
object Text {
  /** Split regex — identical string passed to Spark `split` and DuckDB
    * `string_split_regex`. */
  val SplitRe = "[^a-z0-9]+"

  /** UNICODE split regex — any run of code points outside letters,
    * COMBINING MARKS, and digits (general categories L, M, N, which Java
    * regex and DuckDB's RE2 implement identically for the planted
    * fixtures the gate checks). Marks are in the alphabet because Indic
    * and Arabic-script words are SPELLED with them — under a bare
    * `\p{L}\p{N}` rule Devanagari "नमस्ते" splits at its virama and vowel
    * signs into word fragments (caught by the hand-computed spec, not by
    * the mark-free planted oracles). The frozen [[SplitRe]] silently
    * tokenizes ALL non-Latin text to [] — the majority of a real
    * multilingual crawl would dedup, score and vocab-learn as EMPTY — so
    * every text consumer accepts an alphabet parameter defaulting to the
    * frozen rule, with this as the variant a real corpus run passes. CJK
    * has no word separators, so an ideograph run is ONE token under this
    * rule (deterministic; real segmentation is a tokenizer-model
    * concern, not the engine's). */
  val UnicodeSplitRe = "[^\\p{L}\\p{M}\\p{N}]+"

  /** tokens(text): array<string> of non-empty lowercase tokens. */
  def tokens(text: Column): Column = tokens(text, SplitRe)

  /** [[tokens]] under an explicit split alphabet. */
  def tokens(text: Column, splitRe: String): Column =
    filter(split(lower(text), splitRe), t => t =!= lit(""))

  /** [[tokens]] under [[UnicodeSplitRe]] — non-Latin text tokenizes
    * non-empty (lowercasing is Unicode-aware in both engines). */
  def tokensUnicode(text: Column): Column = tokens(text, UnicodeSplitRe)

  /** DuckDB rendition of [[tokens]] for oracle SQL (an expression producing
    * a VARCHAR[]; typically fed to unnest). */
  def sqlTokens(textExpr: String): String = sqlTokens(textExpr, SplitRe)

  /** DuckDB rendition of [[tokens]] under an explicit split alphabet. */
  def sqlTokens(textExpr: String, splitRe: String): String =
    s"list_filter(string_split_regex(lower($textExpr), '$splitRe'), t -> t <> '')"

  /** DuckDB rendition of [[tokensUnicode]] (RE2 shares Java's \\p{L}/\\p{N}
    * general-category classes). */
  def sqlTokensUnicode(textExpr: String): String =
    sqlTokens(textExpr, UnicodeSplitRe)

  /** A 60-bit integer hash of a string: first 15 hex chars of md5, as a
    * BIGINT. md5 is the one hash both Spark and DuckDB expose with identical
    * output, and 15 hex digits (60 bits) always fits signed 64-bit.
    * DuckDB rendition: [[sqlHash60]].
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** DuckDB rendition of [[hash60]] — DuckDB lacks conv(); use md5_number_lower
    * ( = little-endian uint64 of the md5 lower half)? No: to stay exactly
    * aligned with Spark's hex-prefix semantics we parse the hex prefix:
    * 15 hex chars via a manual fold is painful in SQL, but DuckDB CAN cast
    * hex literals: ('0x' || prefix)::BIGINT works (hex string → int cast).
    */
  def sqlHash60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Driver-side evaluation of [[hash60]] (same md5-hex-prefix semantics) —
    * for planning-time decisions like index-bucket pruning. */
  def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
