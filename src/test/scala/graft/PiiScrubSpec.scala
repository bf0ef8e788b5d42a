package graft

import graft.text.PiiScrub
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction: typed tokens, staged counts, null safety. */
class PiiScrubSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("scrub: hand-built redactions, staged counts never double-count") {
    val docs = Seq(
      (1L, "mail alice.smith+x@corp-mail.co.uk now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +4915123456789 today"),
      (4L, "ticket 123456789 closed"),
      // an email whose local part is a long digit run, a phone, and a bare
      // run together: each must count exactly once, in stage order
      (5L, "from 12345678@spam.cn dial +1234567 ref 987654"),
      (6L, "no pii here at all"),
      (7L, "short digits 12345 stay"), // below the 6-digit identifier bound
      (8L, null: String),
    ).toDF("id", "text")
    val got = PiiScrub.scrub(docs, "id", "text").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === ((Some("mail <EMAIL> now"), 1L, 0L, 0L, 0L)))
    assert(got(2L) === ((Some("server <IP> and <IP> up"), 0L, 2L, 0L, 0L)))
    assert(got(3L) === ((Some("call <PHONE> today"), 0L, 0L, 1L, 0L)))
    assert(got(4L) === ((Some("ticket <NUM> closed"), 0L, 0L, 0L, 1L)))
    assert(got(5L) === ((Some("from <EMAIL> dial <PHONE> ref <NUM>"), 1L, 0L, 1L, 1L)))
    assert(got(6L) === ((Some("no pii here at all"), 0L, 0L, 0L, 0L)))
    assert(got(7L) === ((Some("short digits 12345 stay"), 0L, 0L, 0L, 0L)))
    assert(got(8L) === ((None, 0L, 0L, 0L, 0L)))
  }

  test("scrub next to non-Latin text: portable patterns redact, the \\b caveat holds") {
    // the declared Java/RE2 divergence (PiiScrub scaladoc): Java's \b is
    // Unicode-aware, so a Cyrillic letter IS a word character and an IP
    // glued to it has no boundary — the ENGINE leaves it alone (RE2
    // would redact it; the gate row only exercises portable shapes).
    // Email and bare-digit-run patterns carry no \b and redact glued.
    val docs = Seq(
      (1L, "контакт user7@example.com от нас"),
      (2L, "ип10.0.0.5 glued"), // NOT redacted: п is a Java word char
      (3L, "ип 10.0.0.5 spaced"),
      (4L, "реф123456789 glued digits"),
    ).toDF("id", "text")
    val got = PiiScrub.scrub(docs, "id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === (("контакт <EMAIL> от нас", 1L, 0L, 0L, 0L)))
    assert(got(2L) === (("ип10.0.0.5 glued", 0L, 0L, 0L, 0L)))
    assert(got(3L) === (("ип <IP> spaced", 0L, 1L, 0L, 0L)))
    assert(got(4L) === (("реф<NUM> glued digits", 0L, 0L, 0L, 1L)))
  }

  test("scrub is one narrow projection: no shuffle, no join in the plan") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    val plan = PiiScrub.scrub(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"scrub must not join:\n$plan")
  }
}
