package graft

import graft.search.{OverlapReranker, Rerank, RerankFailedException, Reranker, RetryingReranker}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieve-then-rerank: deterministic overlap-F1 scores, the external
  * service retry/validation contract, and the bounded per-query window. */
class RerankSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("OverlapReranker is F1 of distinct token sets") {
    val r = new OverlapReranker
    // q = {a,b,c}, d = {b,c,d}: overlap 2, F1 = 2*2/(3+3)
    assert(r.scoreBatch(Seq(("a b c", "b c d"))) === Seq(2.0 * 2 / 6))
    // duplicate tokens collapse before scoring
    assert(r.scoreBatch(Seq(("a a b", "a b b"))) === Seq(1.0))
    // punctuation/case are normalized by the frozen tokenizer
    assert(r.scoreBatch(Seq(("Foo, BAR!", "foo bar"))) === Seq(1.0))
    // empty on both sides scores 0, not NaN
    assert(r.scoreBatch(Seq(("", ""))) === Seq(0.0))
    assert(r.scoreBatch(Seq((null, "x"))) === Seq(0.0))
  }

  test("RetryingReranker retries transient failures then succeeds") {
    var calls = 0
    val flaky = new Reranker {
      def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        pairs.map(_ => 0.5)
      }
    }
    val out = new RetryingReranker(flaky, maxAttempts = 3)
      .scoreBatch(Seq(("a", "b")))
    assert(out === Seq(0.5) && calls === 3)
  }

  test("RetryingReranker fails loudly on exhausted attempts and bad shape") {
    val broken = new Reranker {
      def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] =
        throw new RuntimeException("down")
    }
    intercept[RerankFailedException] {
      new RetryingReranker(broken, maxAttempts = 2).scoreBatch(Seq(("a", "b")))
    }
    // one score per pair is ENFORCED, not trusted
    val short = new Reranker {
      def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] = Seq.empty
    }
    intercept[RerankFailedException] {
      new RetryingReranker(short, maxAttempts = 1).scoreBatch(Seq(("a", "b")))
    }
  }

  test("rerankJoin keeps top-k per query with (score DESC, id ASC) ties") {
    val cands = Seq(
      // query 10: doc 1 overlaps fully, docs 2 and 3 tie, doc 4 no overlap
      (10L, 1L, "alpha beta", "alpha beta"),
      (10L, 2L, "alpha beta", "alpha gamma"),
      (10L, 3L, "alpha beta", "beta delta"),
      (10L, 4L, "alpha beta", "epsilon zeta"),
      // query 20: single candidate
      (20L, 9L, "foo", "foo bar"),
    ).toDF("query_id", "id", "qtext", "dtext")
    val got = Rerank.rerankJoin(cands, "query_id", "id", "qtext", "dtext", k = 2)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got === Array(
      (10L, 1L, 1.0, 1),
      (10L, 2L, 0.5, 2), // ties with doc 3 at 0.5 — lower id wins
      (20L, 9L, 0.666667, 1))) // 2/3 rounded to ScoreDecimals
  }

  test("relational scorer (overlapF1 column) is row-identical to the mapPartitions shape") {
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def text() = Seq.fill(rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" ")
    val cands = (1 to 40).map(i => (i.toLong / 8, i.toLong, text(), text()))
      .toDF("query_id", "id", "qtext", "dtext")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(
      rows(Rerank.rerankJoinRelational(cands, "query_id", "id", "qtext", "dtext", k = 3)) ===
      rows(Rerank.rerankJoin(cands, "query_id", "id", "qtext", "dtext", k = 3)))
  }

  test("rerankJoin scores ride partition-local batches (parity with driver-side scorer)") {
    val n = 2 * Reranker.BatchSize + 3 // forces multiple batches per partition
    val cands = (1 to n).map(i =>
      (1L, i.toLong, "common term", s"common term$i extra$i")).toDF(
      "query_id", "id", "qtext", "dtext").repartition(3)
    val got = Rerank.rerankJoin(cands, "query_id", "id", "qtext", "dtext", k = n)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val scorer = new OverlapReranker
    (1 to n).foreach { i =>
      val exp = java.math.BigDecimal.valueOf(
          scorer.scoreBatch(Seq(("common term", s"common term$i extra$i"))).head)
        .setScale(Rerank.ScoreDecimals, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(got(i.toLong) === exp, s"id=$i")
    }
  }
}
