package graft

import graft.text.LanguageModel
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM perplexity scoring: hand-computed probabilities on a toy
  * corpus, cross-corpus scoring with unseen events, and degenerate docs. */
class LanguageModelSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // corpus: doc1 = "a b a b", doc2 = "a c"
  // pairs:  doc1 (a,b)(b,a)(a,b); doc2 (a,c)
  // counts: c(a,b)=2 c(b,a)=1 c(a,c)=1; prefixes a=3 b=1; V=3
  private def toy = Seq((1L, "a b a b"), (2L, "a c")).toDF("id", "text")

  test("self-score matches hand-computed add-one bigram probabilities") {
    val got = LanguageModel.selfScore(toy, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc1: p(b|a)=(2+1)/(3+3)=1/2, p(a|b)=(1+1)/(1+3)=1/2 → nlp = ln 2
    assert(got(1L) === ((r6(math.log(2)), r6(2.0), 3L)))
    // doc2: p(c|a)=(1+1)/(3+3)=1/3 → nlp = ln 3, ppl = 3
    assert(got(2L) === ((r6(math.log(3)), r6(3.0), 1L)))
  }

  test("cross-corpus scoring: unseen bigrams/prefixes smooth to 1/(cc+V), never NaN") {
    val lm = LanguageModel.train(toy, "id", "text")
    // "a z": prefix a seen (cc=3), bigram (a,z) unseen → p = 1/(3+3)
    // "z a": prefix z unseen → p = 1/(0+3)
    val other = Seq((10L, "a z"), (11L, "z a")).toDF("id", "text")
    val got = LanguageModel.score(lm, other, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(10L) === r6(math.log(6)))
    assert(got(11L) === r6(math.log(3)))
  }

  test("trigram stupid backoff: every branch matches hand-computed values") {
    // train: "a b c a b d" — trigrams (a,b,c)(b,c,a)(c,a,b)(a,b,d);
    // bigrams (a,b)×2 (b,c)(c,a)(a,b→ again)(b,d); unigrams a2 b2 c1 d1;
    // N=6, V=4
    val train = Seq((1L, "a b c a b d")).toDF("id", "text")
    val lm = LanguageModel.train3(train, "id", "text")
    assert(lm.totalTokens === 6L && lm.vocabSize === 4L)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val got = LanguageModel.score3(lm,
        Seq((10L, "a b c"),   // observed trigram: S = c3/c(a,b) = 1/2
          (11L, "d a b"),     // backoff to bigram: S = 0.4·c(a,b)/c(a) = 0.4·2/2
          (12L, "b d x"))     // unigram floor, x unseen: S = 0.16·(0+1)/(6+4)
          .toDF("id", "text"),
        "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got(10L) === ((r6(-math.log(0.5)), r6(2.0), 1L)))
    assert(got(11L) === ((r6(-math.log(0.4)), r6(2.5), 1L)))
    assert(got(12L) === ((r6(-math.log(0.016)), r6(62.5), 1L)))
    // the unigram-floor branch for a SEEN word: (d, b, a) — trigram and
    // bigram (b,a) unseen, a seen twice → S = 0.16·(2+1)/10 = 0.048
    val seen = LanguageModel.score3(lm,
        Seq((13L, "d b a")).toDF("id", "text"), "id", "text")
      .collect().head
    assert(seen.getDouble(1) === r6(-math.log(0.048)))
    // < 3 tokens → no trigram position, no row
    assert(LanguageModel.score3(lm,
      Seq((14L, "a b")).toDF("id", "text"), "id", "text").isEmpty)
  }

  test("lm3 persisted family: fold == fresh train3 through append/delete/compaction/as-of") {
    import graft.index.IndexStore
    import graft.util.Tables
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
      .localCheckpoint(true)
    val a = docs.where($"doc_id" % 3 === 0)
    val b = docs.where($"doc_id" % 3 === 1)
    val c = docs.where($"doc_id" % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("lm3fam").toString
    def rows(lm: LanguageModel.TrigramLm) =
      LanguageModel.score3(lm, docs, "doc_id", "text")
        .as[(Long, Double, Double, Long)].collect().toSet
    IndexStore.saveLm3(a, "doc_id", "text", dir)
    IndexStore.appendBatchLm3(b, "doc_id", "text", dir, 0L)
    val ab = a.unionByName(b)
    assert(rows(IndexStore.loadLm3Checked(spark, dir, ab, "doc_id", "text"))
      === rows(LanguageModel.train3(ab, "doc_id", "text")))
    // staleness refuses a moved-on corpus
    assert(intercept[IllegalStateException] {
      IndexStore.loadLm3Checked(spark, dir, docs, "doc_id", "text")
    }.getMessage.contains("STALE"))
    IndexStore.appendBatchLm3(c, "doc_id", "text", dir, 1L)
    // delete wave b: fold equals a fresh train over a∪c
    IndexStore.deleteBatchLm3(b, "doc_id", "text", dir, 2L)
    val ac = a.unionByName(c)
    assert(rows(IndexStore.loadLm3Checked(spark, dir, ac, "doc_id", "text"))
      === rows(LanguageModel.train3(ac, "doc_id", "text")))
    // as-of horizon 0 = a∪b (wave 1 and the delete invisible)
    assert(rows(IndexStore.loadLm3AsOf(spark, dir, 0L))
      === rows(LanguageModel.train3(ab, "doc_id", "text")))
    // compaction folds to one base; checked load still accepts a∪c and
    // pre-floor horizons refuse
    IndexStore.compactLm3(spark, dir)
    assert(rows(IndexStore.loadLm3Checked(spark, dir, ac, "doc_id", "text"))
      === rows(LanguageModel.train3(ac, "doc_id", "text")))
    assert(intercept[IllegalArgumentException] {
      IndexStore.loadLm3AsOf(spark, dir, 0L)
    }.getMessage.contains("compaction"))
  }

  test("lm3 join regimes: broadcast/bucketed/auto identical rows, distinct plans, advise flips at the constant") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").localCheckpoint(true)
    val lm = LanguageModel.train3(docs, "doc_id", "text")
    def rows(mode: String) = LanguageModel.score3Join(lm, docs, "doc_id",
        "text", graft.functions.Text.SplitRe, mode)
      .orderBy("id").collect().toSeq
    val auto = rows("auto")
    // the regime is a physical-plan choice, never a semantics choice
    assert(rows("broadcast") === auto)
    assert(rows("bucketed") === auto)
    // and the plans genuinely differ: broadcast builds hash relations,
    // bucketed shuffle-hashes the count tables (zero broadcast joins)
    def plan(mode: String) = LanguageModel.score3Join(lm, docs, "doc_id",
      "text", graft.functions.Text.SplitRe, mode)
      .queryExecution.executedPlan.toString
    assert(plan("broadcast").contains("BroadcastHashJoin"))
    val bucketed = plan("bucketed")
    assert(!bucketed.contains("BroadcastHashJoin"),
      s"bucketed regime must not broadcast:\n$bucketed")
    assert(bucketed.contains("ShuffledHashJoin"),
      s"bucketed regime should shuffle-hash the count tables:\n$bucketed")
    // the advice constant is the declared crossover
    assert(LanguageModel.adviseScore3Join(
      LanguageModel.Lm3BroadcastMaxCountRows) === "broadcast")
    assert(LanguageModel.adviseScore3Join(
      LanguageModel.Lm3BroadcastMaxCountRows + 1) === "bucketed")
    intercept[IllegalArgumentException](LanguageModel.score3Join(
      lm, docs, "doc_id", "text", graft.functions.Text.SplitRe, "bogus"))
  }

  test("docs with < 2 tokens produce no score row; empty corpus trains without error") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("id", "text")
    val scored = LanguageModel.selfScore(docs, "id", "text")
    assert(scored.collect().map(_.getLong(0)).toSeq === Seq(3L))
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(LanguageModel.selfScore(empty, "id", "text").count() === 0L)
  }
}
