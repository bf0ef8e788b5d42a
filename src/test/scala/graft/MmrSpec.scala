package graft

import graft.search.Mmr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversified selection: redundancy is penalized, greedy parity with
  * a driver-side reference, under-k queries degrade gracefully. */
class MmrSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("mmrSelect: near-duplicate of the top pick loses rank 2 to a diverse candidate") {
    // doc 1 most relevant; doc 2 slightly less relevant but nearly
    // identical to 1; doc 3 less relevant still but orthogonal
    val cands = Seq((7L, 1L, 0.9), (7L, 2L, 0.85), (7L, 3L, 0.5))
      .toDF("query_id", "id", "score")
    val sims = Seq(
      (7L, 1L, 2L, 0.95), (7L, 2L, 1L, 0.95),
      (7L, 1L, 3L, 0.05), (7L, 3L, 1L, 0.05),
      (7L, 2L, 3L, 0.05), (7L, 3L, 2L, 0.05),
    ).toDF("query_id", "id1", "id2", "sim")
    val got = Mmr.mmrSelect(cands, sims, k = 3, lambda = 0.7)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    // plain top-3 would be (1,2,3); MMR demotes the near-dup:
    // round 2: doc2 mmr = .7*.85 − .3*.95 = .31 < doc3 mmr = .7*.5 − .3*.05 = .335
    assert(got === Array((1L, 1), (3L, 2), (2L, 3)))
  }

  test("mmrSelect: lambda = 1 reduces to plain relevance top-k") {
    val cands = Seq((1L, 10L, 0.3), (1L, 11L, 0.9), (1L, 12L, 0.6))
      .toDF("query_id", "id", "score")
    val sims = Seq((1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99))
      .toDF("query_id", "id1", "id2", "sim")
    val got = Mmr.mmrSelect(cands, sims, k = 3, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(got === Array(11L, 12L, 10L))
  }

  test("mmrSelect matches a driver-side greedy reference on multi-query input") {
    val rnd = new scala.util.Random(42)
    val cands = for (q <- 1L to 5L; d <- 1L to 8L)
      yield (q, d, math.rint(rnd.nextDouble() * 1e6) / 1e6)
    val simPairs = for (q <- 1L to 5L; a <- 1L to 8L; b <- 1L to 8L if a != b)
      yield (q, a, b, math.rint(rnd.nextDouble() * 1e6) / 1e6)
    // symmetrize: keep max of the two directions so sim(a,b) == sim(b,a)
    val symm = simPairs.groupBy(t => (t._1, math.min(t._2, t._3), math.max(t._2, t._3)))
      .map { case ((q, a, b), vs) => (q, a, b, vs.map(_._4).max) }.toSeq
    val simsDf = (symm ++ symm.map(t => (t._1, t._3, t._2, t._4)))
      .toDF("query_id", "id1", "id2", "sim")
    val simMap = symm.map(t => ((t._1, t._2, t._3), t._4)).toMap
    def sim(q: Long, a: Long, b: Long): Double =
      simMap.getOrElse((q, math.min(a, b), math.max(a, b)), 0.0)
    val lambda = 0.7
    val expected = cands.groupBy(_._1).flatMap { case (q, rows) =>
      var pool = rows.map(t => t._2 -> t._3).toMap
      var sel = List.empty[Long]
      (1 to 4).flatMap { t =>
        if (pool.isEmpty) None else {
          val scored = pool.map { case (id, rel) =>
            val pen = if (sel.isEmpty) 0.0 else sel.map(s => sim(q, id, s)).max
            val mmr = if (sel.isEmpty) rel
              else java.math.BigDecimal.valueOf(lambda * rel - (1 - lambda) * pen)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            (id, mmr)
          }
          val pick = scored.minBy { case (id, m) => (-m, id) }._1
          pool -= pick; sel ::= pick
          Some((q, pick, t))
        }
      }
    }.toSet
    val got = Mmr.mmrSelect(cands.toDF("query_id", "id", "score"), simsDf,
        k = 4, lambda = lambda)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got === expected)
  }

  test("mmrSelectAgg (bounded-state shape) is row-identical to the relational unrolling") {
    val rnd = new scala.util.Random(7)
    val cands = (for (q <- 1L to 6L; d <- 1L to 9L)
      yield (q, d, math.rint(rnd.nextDouble() * 1e6) / 1e6))
      .toDF("query_id", "id", "score")
    val sym = (for (q <- 1L to 6L; a <- 1L to 9L; b <- a + 1 to 9L)
      yield (q, a, b, math.rint(rnd.nextDouble() * 1e6) / 1e6))
    val sims = (sym ++ sym.map(t => (t._1, t._3, t._2, t._4)))
      .toDF("query_id", "id1", "id2", "sim")
    val rel = graft.search.Mmr.mmrSelect(cands, sims, k = 4, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val agg = graft.search.Mmr.mmrSelectAgg(cands, sims, k = 4, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg === rel)
  }

  test("mmrSelect: a query with fewer than k candidates yields fewer rows") {
    val cands = Seq((1L, 1L, 0.9), (1L, 2L, 0.8), (2L, 5L, 0.7))
      .toDF("query_id", "id", "score")
    val sims = Seq.empty[(Long, Long, Long, Double)]
      .toDF("query_id", "id1", "id2", "sim")
    val got = Mmr.mmrSelect(cands, sims, k = 3, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got === Set((1L, 1L, 1), (1L, 2L, 2), (2L, 5L, 1)))
  }

  test("candidatePairSims: cosines of sparse embeddings, zero-overlap pairs absent") {
    val cands = Seq((1L, 10L), (1L, 11L), (1L, 12L))
      .toDF("query_id", "id")
    val emb = Seq(
      (10L, 0, 0.6), (10L, 1, 0.8),
      (11L, 1, 1.0),
      (12L, 2, 1.0), // no shared dim with 10 or 11
    ).toDF("id", "dim", "val")
    val got = Mmr.candidatePairSims(cands, emb)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got === Map((10L, 11L) -> 0.8, (11L, 10L) -> 0.8))
  }
}
