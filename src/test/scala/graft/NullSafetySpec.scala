package graft

import graft.dedup.Dedup
import graft.search.TextSearch
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Codified edge-case behavior: null/empty text, empty tables. An engine's
  * contract on degenerate input is part of its semantics, not an accident. */
class NullSafetySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docsWithNull = Seq(
    (1L, "normal document text here"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "!!! ***"),
  ).toDF("id", "text")

  test("tokenizer: null text → null; empty/punct-only text → empty array") {
    val got = docsWithNull
      .select(col("id"), graft.functions.Text.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(got(2L) === null)
    assert(got(3L) === Seq.empty)
    assert(got(4L) === Seq.empty)
  }

  test("bm25: null/empty docs never match, stats ignore token-less docs") {
    val idx = TextSearch.buildIndex(docsWithNull, "id", "text")
    assert(idx.numDocs === 1) // only doc 1 has tokens
    val hits = TextSearch.fullTextSearch(docsWithNull, "id", "text", "document")
      .select("id").as[Long].collect()
    assert(hits === Seq(1L))
  }

  test("shingles and fingerprints: degenerate docs yield empty/null, not errors") {
    val fps = docsWithNull
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .select("id", "fp.fp_min")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!fps(1L))
    assert(fps(2L) && fps(3L) && fps(4L)) // null min over no shingles
  }

  test("exact dedup groups null texts together (null-safe grouping)") {
    val twoNulls = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Dedup.exact(twoNulls, "id", "text")
      .select("id", "group_n", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 2L, true), (2L, 2L, false)))
  }

  test("dedup pair ops on an empty table return empty, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.jaccardPairs(empty, "id", "text", 0.5).count() === 0)
    assert(Dedup.minhashPairs(empty, "id", "text", 0.5).count() === 0)
    assert(Dedup.simhashPairs(Dedup.simhash(empty, "id", "text"), 2).count() === 0)
  }

  test("quality/langid handle null text as null / 'und'") {
    val got = docsWithNull.select(col("id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got(2L)._1) // null text → null quality
    assert(got(3L) === ((false, "und")))
    assert(got(4L)._2 === "und")
  }
}
