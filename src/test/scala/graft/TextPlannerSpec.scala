package graft

import java.nio.file.Files

import graft.index.IndexStore
import graft.search.{TextPlanner, TextSearch}
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Phrase-path planner contracts: the cost table's arithmetic and
  * argmin flips, the dispatch equivalence (every chosen path returns
  * the same exact occurrences), the loud missing-asset/width-mismatch
  * surface, and the build advisor's economics. */
class TextPlannerSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val K = graft.dedup.SubstringDedup.DefaultGramTokens // 8

  private lazy val docs = Tables.documents(spark, Sf0001)
    .select("doc_id", "text").localCheckpoint(true)

  private lazy val (gramIdx, phraseIdx) = {
    val gp = Files.createTempDirectory("tpgrams").toString
    val pp = Files.createTempDirectory("tpphrase").toString
    IndexStore.saveGrams(docs, "doc_id", "text", K, gp)
    IndexStore.savePhrase(docs, "doc_id", "text", K, pp)
    (IndexStore.loadGrams(spark, gp), IndexStore.loadPhrase(spark, pp))
  }

  private def both = TextPlanner.PhraseAssets(Some(gramIdx), Some(phraseIdx))

  test("cost table arithmetic and argmin flips") {
    val dummyG = TextPlanner.PhraseAssets(
      gramIndex = Some(IndexStore.GramIndex(null, K)))
    val dummyBoth = TextPlanner.PhraseAssets(
      Some(IndexStore.GramIndex(null, K)),
      Some(IndexStore.PhraseIndex(null, K)))
    // n=6400, B=64: probe=100. 10 tokens → m=3 → indexed 300;
    // screened (f=1) 100+6400; scan 6400 → indexed wins
    val p1 = TextPlanner.planPhrase(6400, 10, K, 1.0, dummyBoth)
    assert(p1.chosen === "indexed")
    assert(p1.cost("indexed") === 300.0)
    assert(p1.cost("screened") === 6500.0)
    assert(p1.cost("scan") === 6400.0)
    // absent-heavy workload without the positional index: the screen's
    // veto carries it — 100 + 0.01·6400 = 164 < 6400
    val p2 = TextPlanner.planPhrase(6400, 10, K, 0.01, dummyG)
    assert(p2.chosen === "screened")
    assert(p2.cost("screened") === 164.0)
    // no assets at all: the scan is the only executable row
    val p3 = TextPlanner.planPhrase(6400, 10, K, 0.01,
      TextPlanner.PhraseAssets())
    assert(p3.chosen === "scan")
    // a phrase wide enough that m ≥ B probes out-prices the scan —
    // the indexed path is NOT an unconditional winner
    val p4 = TextPlanner.planPhrase(6400, K + 64, K, 1.0, dummyBoth)
    assert(p4.m === 65)
    assert(p4.chosen === "scan")
    // refusals: short phrase, bad fraction, width drift
    intercept[IllegalArgumentException](
      TextPlanner.planPhrase(6400, K - 1, K, 1.0, dummyBoth))
    intercept[IllegalArgumentException](
      TextPlanner.planPhrase(6400, 10, K, 1.5, dummyBoth))
    intercept[IllegalArgumentException](
      TextPlanner.planPhrase(6400, 10, K + 2, 1.0, dummyBoth))
  }

  test("dispatch: every chosen path returns the same exact occurrences") {
    val n = docs.count()
    val toks = docs.orderBy("doc_id")
      .select(slice(graft.functions.Text.tokens(col("text")), 1, 10).as("p"))
      .head.getSeq[String](0)
    val want = TextSearch.phraseOccurrences(docs, "doc_id", "text",
        Seq(toks).toDF("p"), K)
      .orderBy("id", "pos").as[(String, Int)].collect().toSeq
    assert(want.nonEmpty) // the phrase matches at least its source doc
    // force each path by shaping the asset set; the planner must pick
    // the expected one, and all three must agree
    val planIdx = TextPlanner.planPhrase(n, toks.size, K, 1.0,
      TextPlanner.PhraseAssets(phraseIndex = Some(phraseIdx)))
    assert(planIdx.chosen === "indexed")
    val planScr = TextPlanner.planPhrase(n, toks.size, K, 0.0,
      TextPlanner.PhraseAssets(gramIndex = Some(gramIdx)))
    assert(planScr.chosen === "screened")
    val planScan = TextPlanner.planPhrase(n, toks.size, K, 1.0,
      TextPlanner.PhraseAssets())
    assert(planScan.chosen === "scan")
    for (plan <- Seq(planIdx, planScr, planScan)) {
      val got = TextPlanner.executePhrase(plan, docs, "doc_id", "text",
          toks, both)
        .orderBy("id", "pos").as[(String, Int)].collect().toSeq
      assert(got === want, s"path ${plan.chosen} drifted")
    }
    // a plan whose chosen asset is missing fails loudly at execute —
    // never a silent fallback to a path nobody priced
    intercept[IllegalStateException](
      TextPlanner.executePhrase(planIdx, docs, "doc_id", "text", toks,
        TextPlanner.PhraseAssets()))
    // and a phrase that doesn't match the plan's priced m re-plans
    intercept[IllegalArgumentException](
      TextPlanner.executePhrase(planIdx, docs, "doc_id", "text",
        toks.take(K), both))
  }

  test("batch planner: touched-bucket pricing, amortization receipt, dispatch parity") {
    val dummyP = TextPlanner.PhraseAssets(
      phraseIndex = Some(IndexStore.PhraseIndex(null, K)))
    // a one-gram phrase touches exactly one bucket: indexed = n/64
    val one = Seq(Seq.fill(K)("tok"))
    val p1 = TextPlanner.planPhraseBatch(6400, one, K, dummyP)
    assert(p1.touched === 1)
    assert(p1.chosen === "batch_indexed")
    assert(p1.cost("batch_indexed") === 100.0)
    assert(p1.cost("batch_scan") === 6400.0)
    // the naive loop rides as a non-executable receipt row
    assert(p1.cost("per_phrase_loop") === 6400.0)
    assert(!p1.costs.find(_.path == "per_phrase_loop").get.executable)
    // without the index the one scan is the only executable batch path
    assert(TextPlanner.planPhraseBatch(6400, one, K,
      TextPlanner.PhraseAssets()).chosen === "batch_scan")
    // a batch whose grams cover every bucket ties with the scan; the
    // tie breaks toward the narrower postings read
    val wide = (0 until 1000).map(i => (0 until K).map(j => s"w$i-$j"))
    val pw = TextPlanner.planPhraseBatch(6400, wide, K, dummyP)
    assert(pw.touched === 64)
    assert(pw.cost("batch_indexed") === pw.cost("batch_scan"))
    assert(pw.chosen === "batch_indexed")
    // refusals: empty batch, short phrase, width drift
    intercept[IllegalArgumentException](
      TextPlanner.planPhraseBatch(6400, Seq.empty, K, dummyP))
    intercept[IllegalArgumentException](
      TextPlanner.planPhraseBatch(6400, Seq(Seq("a")), K, dummyP))
    intercept[IllegalArgumentException](
      TextPlanner.planPhraseBatch(6400, one, K + 1, dummyP))
    // dispatch parity on the real corpus: both batch paths return the
    // same exact relation for a real suspect batch
    val phrases = docs.orderBy("doc_id").limit(3)
      .select(col("doc_id").as("phrase_id"),
        slice(graft.functions.Text.tokens(col("text")), 1, 10).as("p"))
    val toks = phrases.select("p").collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    val n = docs.count()
    val planIdx = TextPlanner.planPhraseBatch(n, toks, K,
      TextPlanner.PhraseAssets(phraseIndex = Some(phraseIdx)))
    assert(planIdx.chosen === "batch_indexed")
    val planScan = TextPlanner.planPhraseBatch(n, toks, K,
      TextPlanner.PhraseAssets())
    val want = TextPlanner.executePhraseBatch(planScan, docs, "doc_id",
        "text", phrases, both)
      .orderBy("phrase_id", "id", "pos")
      .as[(String, String, Int)].collect().toSeq
    assert(want.nonEmpty)
    val got = TextPlanner.executePhraseBatch(planIdx, docs, "doc_id",
        "text", phrases, both)
      .orderBy("phrase_id", "id", "pos")
      .as[(String, String, Int)].collect().toSeq
    assert(got === want)
    // missing asset fails loudly
    intercept[IllegalStateException](
      TextPlanner.executePhraseBatch(planIdx, docs, "doc_id", "text",
        phrases, TextPlanner.PhraseAssets()))
  }

  test("build advisor: savings from the planner's own table, break-even flips") {
    // without the index the best path is the scan (f=1 makes the screen
    // worthless): saving = n − m·n/64, build cost 2n
    val a = TextPlanner.adviseBuildPhraseIndex(6400, 10, K, 1.0,
      TextPlanner.PhraseAssets(), expectedQueries = 3)
    assert(a.withoutPath === "scan")
    assert(a.withPath === "indexed")
    assert(a.buildCostUnits === 12800.0)
    assert(a.perQuerySavingUnits === 6400.0 - 300.0)
    // break-even 12800/6100 ≈ 2.1 → 3 queries pay, 2 don't
    assert(a.build)
    assert(!TextPlanner.adviseBuildPhraseIndex(6400, 10, K, 1.0,
      TextPlanner.PhraseAssets(), expectedQueries = 2).build)
    // a workload whose phrases are so wide the index never wins is
    // refused at any query count (the advisor can't recommend a path
    // its own cost table wouldn't choose)
    val never = TextPlanner.adviseBuildPhraseIndex(6400, K + 64, K, 1.0,
      TextPlanner.PhraseAssets(), expectedQueries = Long.MaxValue)
    assert(!never.build)
    assert(never.breakEvenQueries.isPosInfinity)
  }
}
