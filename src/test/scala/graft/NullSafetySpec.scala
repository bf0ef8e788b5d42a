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

  test("round-8 surface on degenerate input: phrase locate, corpus diff, funnel, retention") {
    // phrase locate: null/empty/punct-only docs yield no grams → never
    // candidates, never errors
    val ab = Seq(Tuple1(Seq("normal", "document"))).toDF("p")
    val occ = TextSearch.phraseOccurrences(docsWithNull, "id", "text", ab, k = 2)
      .as[(Long, Int)].collect().toSeq
    assert(occ === Seq((1L, 0)))
    // corpus diff: null documents carry presence via markers, so a null
    // doc present in both versions is unchanged, not added
    val diff = graft.pipeline.Curation.corpusDiff(
        docsWithNull, docsWithNull, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(diff.values.forall(_ == "unchanged"))
    // funnel/retention: null event rows (no matching type) simply never
    // advance; empty event input yields empty relations, not errors
    val emptyEv = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    assert(graft.operators.EventAnalytics.funnel(emptyEv, "user_id",
      "event_type", "ts", Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSeq
      === Seq((0, "view", 0L), (1, "click", 0L)))
    assert(graft.operators.EventAnalytics.retention(emptyEv, "user_id",
      "ts", "2024-01-01").count() === 0L)
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

  test("incremental containment screen: null/empty/short docs and empty batches are inert") {
    // index over degenerate docs: only doc 1 shingles (the rest have no
    // 5-gram), so the persisted tables silently hold one document — same
    // semantics as containmentPairs, which never sees shingle-less docs
    val dir = java.nio.file.Files.createTempDirectory("contnull").toString
    graft.index.IndexStore.saveContainment(docsWithNull, "id", "text", 0.9, dir)
    val idx = graft.index.IndexStore.loadContainment(spark, dir)
    assert(idx.sizes.count() === 1)
    // a batch of nothing but degenerate docs screens to zero pairs; an
    // empty batch too — no NPE from the empty bucket collect
    val degenerate = docsWithNull.where(col("id") =!= 1L)
    assert(Dedup.containmentPairsAgainst(degenerate, "id", "text", idx, 0.9)
      .count() === 0)
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.containmentPairsAgainst(empty, "id", "text", idx, 0.9)
      .count() === 0)
    // a real containment pair still surfaces through the same index: a
    // batch doc holding doc 1's text plus a tail contains it fully
    val containing = Seq((9L, "normal document text here and a longer tail"))
      .toDF("id", "text")
    val got = Dedup.containmentPairsAgainst(containing, "id", "text", idx, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 9L, 1.0)))
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

  test("mixSources: null/empty texts count as docs with no token mass, never error") {
    val docs = Seq(
      (1L, "s1", "five token doc right here"),
      (2L, "s1", null.asInstanceOf[String]),
      (3L, "s2", ""),
      (4L, "s2", "two tokens"),
    ).toDF("doc_id", "source", "text")
    val rep = graft.pipeline.Curation.mixSources(docs, "doc_id", "source",
        "text", 1000)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc counts include degenerate docs; token mass ignores them
    assert(rep("s1") === ((2L, 5L)))
    assert(rep("s2") === ((2L, 2L)))
  }

  test("qualityTiers: null-text docs still receive a tier (null ppm sorts last)") {
    val docs = Seq(
      (1L, "en", "good normal document text"),
      (2L, "en", null.asInstanceOf[String]),
      (3L, "en", "another fine document here"),
    ).toDF("doc_id", "lang", "text")
    val got = graft.pipeline.Curation.qualityTiers(docs, "doc_id", "text",
        "lang", tiers = 3, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got.size === 3)
    // DESC NULLS LAST: the null-quality doc lands in the worst tier
    assert(got(2L) === 3)
  }

  test("rerank pipeline: null candidate text scores 0 overlap, never errors") {
    val cands = Seq(
      (1L, 10L, "query words", "query words match"),
      (1L, 11L, "query words", null.asInstanceOf[String]),
    ).toDF("query_id", "id", "qtext", "dtext")
    val got = graft.search.Rerank.rerankJoin(cands, "query_id", "id",
        "qtext", "dtext", k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(got(11L) === 0.0)
    assert(got(10L) > 0.0)
  }
}
