package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation (north-star addition): replace
  * emails, IPv4 addresses, international phone numbers and long digit runs
  * with typed placeholder tokens, and count what was redacted — the
  * standard scrub every LLM pipeline runs before text reaches a tokenizer
  * (and the per-doc counts feed the same threshold gates as
  * [[graft.pipeline.Curation.qualityFilter]]: a document that is mostly
  * PII is usually a directory dump, not prose).
  *
  * Scale shape: one narrow projection — four codegen'd `regexp_replace` /
  * `regexp_count` pairs per row, zero shuffles, zero joins; trivially
  * linear at 100 TB and pipelines into whatever scan precedes it.
  *
  * Pattern discipline: every regex stays inside the Java-regex ∩ RE2
  * common subset (no backreferences, no lookaround) so the DuckDB oracle
  * executes the IDENTICAL pattern — with ONE declared boundary caveat:
  * `\b` in [[Ipv4Re]] is Unicode-aware in Java (a Cyrillic letter is a
  * word character, so "ип10.0.0.5" has NO boundary before the digits and
  * the IP is NOT redacted) but ASCII-only in RE2 (which WOULD redact
  * it). The engine semantic is Java's — an IP glued into a non-Latin
  * word is left alone, conservatively — and the multilingual gate row
  * exercises only the portable cases (space-separated IPs; digit runs
  * and emails glued to Cyrillic, whose patterns carry no `\b`). Pinned
  * in PiiScrubSpec. Redaction is SEQUENCED —
  * email → IPv4 → phone → digit-run — with each count taken on the
  * previous stage's output, so a token never double-counts (an email's
  * digits are gone before the digit-run pass looks). */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** E.164-ish: '+' then 7–15 digits. Redacted before the generic digit
    * run so '+123456789' counts once as a phone, not again as a number. */
  val PhoneRe = "\\+\\d{7,15}"
  /** Bare digit runs long enough to be identifiers (account/ticket/SSN
    * shapes), not prose numbers. */
  val NumRe = "\\d{6,}"

  private case class Stage(re: String, token: String, countCol: String)
  private val Stages = Seq(
    Stage(EmailRe, "<EMAIL>", "n_emails"),
    Stage(Ipv4Re, "<IP>", "n_ips"),
    Stage(PhoneRe, "<PHONE>", "n_phones"),
    Stage(NumRe, "<NUM>", "n_numbers"))

  /** (id, clean_text, n_emails, n_ips, n_phones, n_numbers). Null text
    * stays null with zero counts. */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scrubbed = Stages.foldLeft(
        docs.select(col(idCol).as("id"), col(textCol).as("clean_text"))) {
      case (df, Stage(re, token, countCol)) =>
        df.withColumn(countCol,
            coalesce(regexp_count(col("clean_text"), lit(re)), lit(0)).cast("long"))
          .withColumn("clean_text", regexp_replace(col("clean_text"), re, token))
    }
    scrubbed.select(col("id"), col("clean_text"),
      col("n_emails"), col("n_ips"), col("n_phones"), col("n_numbers"))
  }

  /** Oracle rendition: the same staged patterns (DuckDB regexp_replace
    * needs the 'g' flag — it is first-match-only by default, where Spark's
    * replaces all). */
  def sqlScrub(docsTable: String, idExpr: String, textExpr: String): String = {
    val (finalExpr, selects) = Stages.foldLeft((textExpr, Seq.empty[String])) {
      case ((cur, acc), Stage(re, token, countCol)) =>
        val counted =
          s"coalesce(len(regexp_extract_all($cur, '$re')), 0)::BIGINT AS $countCol"
        (s"regexp_replace($cur, '$re', '$token', 'g')", acc :+ counted)
    }
    s"""SELECT $idExpr AS id, $finalExpr AS clean_text,
       |       ${selects.mkString(",\n       ")}
       |FROM $docsTable""".stripMargin
  }
}
