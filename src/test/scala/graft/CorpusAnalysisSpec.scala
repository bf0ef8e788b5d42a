package graft

import graft.text.CorpusAnalysis
import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the Gopher-family repetition stats and the
  * corpus vocabulary stats (frozen semantics in [[CorpusAnalysis]]). */
class CorpusAnalysisSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("repetition stats: bigram mass, duplicated trigrams, longest run") {
    val docs = Seq(
      // "a b a b a b": 6 tokens; bigrams ab×3, ba×2 → top=3 → 2*3/6 = 1.0;
      // trigrams aba×2, bab×2 → all 4 positions duplicated → 1.0; runs all 1
      (1L, "a b a b a b"),
      // "x x x x y": top bigram xx×3 → 2*3/5 = 1.2 is impossible — overlap
      // counting is intentional (Gopher counts occurrences, not disjoint
      // covers) → round(6/5) = 1.2; trigrams xxx×2 dup, xxy×1 → 2/3;
      // run of x = 4
      (2L, "x x x x y"),
      // all-distinct: no repetition anywhere
      (3L, "one two three four"),
      // single token: too short for any n-gram stat
      (4L, "solo"),
      // empty + null → zero row, not a dropped doc
      (5L, ""),
      (6L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val got = CorpusAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got(1L) === ((6L, 1.0, 1.0, 1L)))
    assert(got(2L) === ((5L, 1.2, 0.666667, 4L)))
    assert(got(3L) === ((4L, 0.5, 0.0, 1L)))
    assert(got(4L) === ((1L, 0.0, 0.0, 1L)))
    assert(got(5L) === ((0L, 0.0, 0.0, 0L)))
    assert(got(6L) === ((0L, 0.0, 0.0, 0L)))
  }

  test("source overlap: hand-built pair matrix; sketched twin exact in the complete regime") {
    val docs = Seq(
      // srcA's two docs share shingles — the per-source set is DISTINCT,
      // so the second doc must not inflate n_a
      ("A", "a b c d"), ("A", "a b c"),
      ("B", "b c d e"),
      ("C", "x y"),
      // a NULL source names no dataset: both paths must drop it, not
      // crash (the sketched driver map would otherwise carry a null key)
      (null.asInstanceOf[String], "b c d"),
    ).toDF("source", "text")
    // 2-token shingles: A = {a b, b c, c d}, B = {b c, c d, d e}, C = {x y}
    val got = CorpusAnalysis.sourceOverlap(docs, "text", "source", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    // only the sharing pair appears; inter=2 (b c, c d), |A|=|B|=3 →
    // jaccard 2/(3+3-2)=0.5, both containments 2/3
    assert(got.toSeq === Seq(
      ("A", "B", 2L, 3L, 3L, 0.5, 0.666667, 0.666667)))
    // sketched twin in the COMPLETE regime (k ≥ every source's set):
    // min-sets are the whole sets, so counts are exact — SAME schema as
    // the exact matrix (incl. the directed containments), and DISJOINT
    // pairs are reported with inter=0 rather than dropped
    val sk = CorpusAnalysis.sourceOverlapSketched(docs, "text", "source",
        sketchK = 64, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq.sorted
    assert(sk === Seq(
      ("A", "B", 2L, 3L, 3L, 0.5, 0.666667, 0.666667),
      ("A", "C", 0L, 3L, 1L, 0.0, 0.0, 0.0),
      ("B", "C", 0L, 3L, 1L, 0.0, 0.0, 0.0)))
    // real-corpus complete regime: a sketch wide enough to hold every
    // source's distinct shingles reproduces the exact matrix's counts
    val corpus = Tables.documents(spark, Sf0001).select("source", "text")
    val exact = CorpusAnalysis.sourceOverlap(corpus, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val wide = CorpusAnalysis.sourceOverlapSketched(corpus, "text",
        "source", sketchK = 1 << 20)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(exact.nonEmpty) // the fixture corpus really does cross-share
    for ((pair, (inter, na, nb)) <- exact)
      assert(wide(pair) === ((inter, na, nb)), s"pair $pair")
    for ((pair, (inter, _, _)) <- wide if !exact.contains(pair))
      assert(inter === 0L, s"pair $pair sketched non-zero but absent exact")
  }

  test("source overlap from persisted per-source summaries equals the one-pass sketch") {
    import graft.index.IndexStore
    val docs = Seq(
      ("A", "a b c d"), ("A", "a b c"),
      ("B", "b c d e"),
      ("C", "x y"),
    ).toDF("source", "text")
    // one persisted summary per source over its shingle item stream —
    // the wave-fed production shape; hash60-of-string on both paths
    val summaries = Seq("A", "B", "C").map { s =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"overlapsum$s").toString
      IndexStore.saveSummary(
        CorpusAnalysis.shingleItems(
          docs.where($"source" === s), "text", k = 2),
        "sh", kMg = 8, kKmv = 64, dir)
      s -> IndexStore.loadSummary(spark, dir)
    }
    val fromSummaries = CorpusAnalysis
      .sourceOverlapFromSummaries(spark, summaries)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq.sorted
    val oneTrip = CorpusAnalysis
      .sourceOverlapSketched(docs, "text", "source", sketchK = 64, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq.sorted
    assert(fromSummaries === oneTrip)
    // comparability contract: a mismatched KMV k refuses
    val odd = {
      val dir = java.nio.file.Files
        .createTempDirectory("overlapsumodd").toString
      IndexStore.saveSummary(
        CorpusAnalysis.shingleItems(
          docs.where($"source" === "A"), "text", k = 2),
        "sh", kMg = 8, kKmv = 32, dir)
      "D" -> IndexStore.loadSummary(spark, dir)
    }
    intercept[IllegalArgumentException](
      CorpusAnalysis.sourceOverlapFromSummaries(spark, summaries :+ odd))
    intercept[IllegalArgumentException](
      CorpusAnalysis.sourceOverlapFromSummaries(spark, Seq.empty))
  }

  test("vocab stats: totals, hapaxes, head coverage with deterministic top-k") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d"),
    ).toDF("doc_id", "text")
    // counts: a=4, b=3, c=1, d=1 → total 9, vocab 4, hapax 2;
    // top-2 head (count desc, term asc) = {a, b} → 7/9
    val r = CorpusAnalysis.vocabStats(docs, "text", topK = 2).head()
    assert(r.getLong(0) === 9L)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 2L)
    assert(r.getDouble(3) === math.rint(7.0 / 9.0 * 1e6) / 1e6)
  }

  test("vocab stats head selection plans as TakeOrderedAndProject (no global sort)") {
    val docs = Tables.documents(spark, Sf0001)
    val plan = CorpusAnalysis.vocabStats(docs, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan in:\n$plan")
  }

  test("dupNgramProfile: hand-built cross-doc shares, edge rows clean, no self-join") {
    // shingle size 3: docs 1 and 2 share exactly the 'one two three'
    // window; doc 3 repeats doc 1 verbatim (all shingles duplicated);
    // doc 4 is disjoint; doc 5 too short (whole-text shingle, unique);
    // doc 6 null text → zero-shingle clean row
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "zero one two three"),
      (3L, "one two three four"),
      (4L, "totally different words here"),
      (5L, "too short"),
      (6L, null: String),
    ).toDF("doc_id", "text")
    val got = CorpusAnalysis.dupNgramProfile(docs, "doc_id", "text")
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) === ((2L, 2L, 1.0)))      // both shingles shared (with 2 and 3)
    assert(rows(2L) === ((2L, 1L, 0.5)))      // 'one two three' only
    assert(rows(3L) === ((2L, 2L, 1.0)))
    assert(rows(4L) === ((2L, 0L, 0.0)))
    assert(rows(5L) === ((1L, 0L, 0.0)))
    assert(rows(6L) === ((0L, 0L, 0.0)))
    // the plan is aggregation+join shaped — no postings self-join pairs,
    // no cartesian product (the quadratic trap this operator exists to avoid)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"unexpected cross product:\n$plan")
  }
}
