package graft

import graft.search.Negatives
import org.scalatest.funsuite.AnyFunSuite

/** Hard-negative mining: positive excluded, near-dups screened as false
  * negatives, hardest (highest-scored) survivors first. */
class NegativesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("mine: drops the positive, screens near-dups, ranks hardest first") {
    val cands = Seq(
      (1L, 100L, 0.9), // the positive itself — must vanish
      (1L, 101L, 0.8), // near-dup of positive (sim .95) — false negative, screened
      (1L, 102L, 0.7), // genuine hard negative
      (1L, 103L, 0.6), // genuine negative
      (1L, 104L, 0.5), // genuine negative
    ).toDF("query_id", "id", "score")
    val positives = Seq((1L, 100L)).toDF("query_id", "pos_id")
    val sims = Seq(
      (1L, 101L, 0.95), (1L, 102L, 0.3), (1L, 103L, 0.1),
      // 104 has no sim row → treated as 0
    ).toDF("query_id", "id", "sim")
    val got = Negatives.mine(cands, positives, sims, nearDupThr = 0.8, n = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(got === Array(
      (102L, 0.7, 0.3, 1),
      (103L, 0.6, 0.1, 2)))
  }

  test("mine: a query whose candidates are all positives/near-dups yields no rows") {
    val cands = Seq((1L, 100L, 0.9), (1L, 101L, 0.8))
      .toDF("query_id", "id", "score")
    val positives = Seq((1L, 100L)).toDF("query_id", "pos_id")
    val sims = Seq((1L, 101L, 0.99)).toDF("query_id", "id", "sim")
    assert(Negatives.mine(cands, positives, sims, 0.8, 3).count() === 0)
  }

  test("multiple positives per query: max-sim screen, no fan-out, no positive leaks as a negative") {
    val cands = Seq(
      (1L, 100L, 0.9), // positive A — excluded
      (1L, 101L, 0.8), // positive B — excluded (must not survive via A's row)
      (1L, 102L, 0.7), // near-dup of B only (max sim .9) — screened
      (1L, 103L, 0.6), // far from both — kept, exactly once
    ).toDF("query_id", "id", "score")
    val positives = Seq((1L, 100L), (1L, 101L)).toDF("query_id", "pos_id")
    val emb = Seq(
      (100L, 0, 1.0),
      (101L, 1, 1.0),
      (102L, 0, 0.1), (102L, 1, 0.9), // sim to A = .1, to B = .9 → max .9
      (103L, 0, 0.1), (103L, 1, 0.1), // max .1
    ).toDF("id", "dim", "val")
    val simsDf = Negatives.simToPositive(cands, positives, emb)
    val sims = simsDf.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(sims(102L) === 0.9 && sims(103L) === 0.1)
    val got = Negatives.mine(cands, positives, simsDf, nearDupThr = 0.8, n = 5)
      .collect().map(r => (r.getLong(1), r.getInt(4)))
    assert(got === Array((103L, 1)))
  }

  test("simToPositive: sparse cosine of each candidate to its query's positive") {
    val cands = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "id")
    val positives = Seq((1L, 99L)).toDF("query_id", "pos_id")
    val emb = Seq(
      (99L, 0, 0.6), (99L, 1, 0.8),
      (10L, 0, 1.0),            // sim to pos: 0.6
      (11L, 2, 1.0),            // no shared dim → absent
    ).toDF("id", "dim", "val")
    val got = Negatives.simToPositive(cands, positives, emb)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got === Map(10L -> 0.6))
  }
}
