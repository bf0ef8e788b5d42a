package graft

import graft.search.{LateInteraction, VectorSearch}
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Late-interaction (ColBERT maxsim) retrieval: window vectors are unit
  * sparse vectors, the join scores Σ_qw max(0, max_dw cos) exactly
  * (checked against a driver-side brute force), multi-topic queries rank
  * both-topic documents first, and the plan keeps the sparse broadcast
  * shape (no cartesian, no corpus shuffle before aggregation). */
class LateInteractionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("windowVectors: unit L2 norm per (doc, window), windows split every W tokens") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"tok$i").mkString(" ")), // 20 tokens → 3 windows at W=8
      (2L, "solo")).toDF("id", "text")
    val wv = LateInteraction.windowVectors(docs, "id", "text", windowTokens = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2), r.getDouble(3)))
    assert(wv.map(_._1._2).toSet === Set(0L, 1L, 2L),
      "20 tokens at W=8 must yield windows 0, 1, 2")
    wv.groupBy(_._1).foreach { case (key, rows) =>
      val n2 = rows.map(t => t._3 * t._3).sum
      assert(math.abs(n2 - 1.0) < 1e-4, s"window $key norm² = $n2")
    }
    // distinct dims within a window (grouped), and the 1-token doc is one window
    assert(wv.filter(_._1._1 == 2L).map(_._1._2).toSet === Set(0L))
  }

  test("maxSimJoin equals the driver-side brute force on real documents") {
    val docs = Tables.documents(spark, Sf0001).limit(60).cache()
    val queries = docs.where($"doc_id" % 7 === 0)
    val got = LateInteraction.maxSimJoin(queries, "doc_id", "text",
        docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // brute force from the same window relation: dense dot per window
    // pair, max per (qw, doc) floored at 0, micro-unit sum, rank
    val wv = LateInteraction.windowVectors(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byDocWin: Map[(Long, Long), Map[Int, Double]] =
      wv.groupBy(t => (t._1, t._2)).map { case (kk, rows) =>
        kk -> rows.map(t => t._3 -> t._4).toMap }
    val qIds = queries.select("doc_id").as[Long].collect().toSet
    val expected = qIds.toSeq.sorted.flatMap { qid =>
      val qWins = byDocWin.keys.filter(_._1 == qid).toSeq
      // the join emits a (query, doc) pair only when SOME window pair
      // shares a dim (inner join on dim) — a doc sharing no dim at all is
      // absent even at score 0.0, so the brute force must skip it too
      // (while keeping docs whose shared-dim dots merely cancel to 0)
      val scores = byDocWin.keys.map(_._1).filter(_ != qid).toSeq.distinct
        .filter { did =>
          val dWins = byDocWin.keys.filter(_._1 == did).toSeq
          qWins.exists(qw => dWins.exists(dw =>
            byDocWin(qw).keysIterator.exists(byDocWin(dw).contains)))
        }
        .map { did =>
          val dWins = byDocWin.keys.filter(_._1 == did).toSeq
          val micro = qWins.map { qw =>
            val best = dWins.map { dw =>
              val qv = byDocWin(qw); val dv = byDocWin(dw)
              val dot = qv.keysIterator.filter(dv.contains)
                .map(d => qv(d) * dv(d)).sum
              BigDecimal(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            }.foldLeft(0.0)(math.max)
            math.round(best * 1e6)
          }.sum
          did -> micro / 1e6
        }
      scores.sortBy { case (did, s) => (-s, did) }.take(3).zipWithIndex
        .map { case ((did, s), i) => (qid, did, s, i + 1) }
    }
    // compare as sets of (query, nbr, sim) and per-query rank orders —
    // ties beyond k could legitimately differ only if sims tie at the
    // boundary with different ids, which nbr_id ASC tie-break pins too
    assert(got.toSet === expected.toSet,
      s"maxsim join diverged from brute force:\n got=${got.toSeq.sorted}\n exp=${expected.sorted}")
  }

  test("a both-topic document beats single-topic documents for a two-topic query") {
    // query = topic A window + topic B window. docMix carries one window
    // of each topic; docAA carries topic A twice. Single-vector cosine
    // cannot prefer docMix (docAA's pooled vector points straight at A,
    // matching half the query as well as possible) — maxsim must: each
    // query window finds its own best document window, so docMix scores
    // ~cos(A,A)+cos(B,B) ≈ 2 while docAA scores ~cos(A,A)+max(0,cos(A,B)).
    val topicA = (1 to 8).map(i => s"alpha$i").mkString(" ")
    val topicB = (1 to 8).map(i => s"beta$i").mkString(" ")
    val queries = Seq((100L, s"$topicA $topicB")).toDF("id", "text")
    val corpus = Seq(
      (1L, s"$topicA $topicB"), // both topics
      (2L, s"$topicA $topicA"), // topic A twice
      (3L, s"$topicB $topicB"), // topic B twice
    ).toDF("id", "text")
    val ranked = LateInteraction.maxSimJoin(queries, "id", "text",
        corpus, "id", "text", k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(ranked.head._1 === 1L,
      s"both-topic doc must rank first under maxsim: $ranked")
    assert(math.abs(ranked.head._2 - 2.0) < 1e-4,
      s"perfect two-window match should score ≈ 2: $ranked")
    assert(ranked.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("maxSimRerank over all-pairs candidates equals the exhaustive join") {
    val docs = Tables.documents(spark, Sf0001).limit(50).cache()
    val queries = docs.where($"doc_id" % 7 === 0)
    val allPairs = queries.select($"doc_id".as("query_id"))
      .crossJoin(docs.select($"doc_id".as("nbr_id")))
    val rerank = LateInteraction.maxSimRerank(queries, "doc_id", "text",
        docs, "doc_id", "text", allPairs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val full = LateInteraction.maxSimJoin(queries, "doc_id", "text",
        docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rerank === full,
      "rerank with the complete candidate set must reproduce the exhaustive ranking")
  }

  test("maxSimRerank scores only candidate pairs") {
    val topicA = (1 to 8).map(i => s"alpha$i").mkString(" ")
    val topicB = (1 to 8).map(i => s"beta$i").mkString(" ")
    val queries = Seq((100L, s"$topicA $topicB")).toDF("id", "text")
    val corpus = Seq(
      (1L, s"$topicA $topicB"), (2L, topicA), (3L, topicB)).toDF("id", "text")
    // doc 1 (the best match) is NOT a candidate — it must not appear
    val cand = Seq((100L, 2L), (100L, 3L)).toDF("query_id", "nbr_id")
    val got = LateInteraction.maxSimRerank(queries, "id", "text",
        corpus, "id", "text", cand, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.map(_._1).toSet === Set(2L, 3L),
      s"only candidates may be scored: ${got.toSeq}")
  }

  test("persisted-index join and rerank equal the fresh-build forms") {
    val docs = Tables.documents(spark, Sf0001).limit(60).cache()
    val queries = docs.where($"doc_id" % 7 === 0)
    val dir = java.nio.file.Files.createTempDirectory("li_widx").toString
    graft.index.IndexStore.saveWindows(docs, "doc_id", "text",
      LateInteraction.DefaultWindowTokens, dir)
    val idx = graft.index.IndexStore.loadWindows(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rows(LateInteraction.maxSimJoin(queries, "doc_id", "text", idx, k = 3)) ===
      rows(LateInteraction.maxSimJoin(queries, "doc_id", "text",
        docs, "doc_id", "text", k = 3)),
      "indexed exhaustive join must equal the text-derived form")
    val cand = VectorSearch.sparseKnnJoin(
        graft.embed.EmbedJob.embedRelational(queries, "doc_id", "text"),
        graft.embed.EmbedJob.embedRelational(docs, "doc_id", "text"), k = 10)
      .select($"query_id", $"id".as("nbr_id"))
    assert(rows(LateInteraction.maxSimRerank(queries, "doc_id", "text",
        idx, cand, k = 3)) ===
      rows(LateInteraction.maxSimRerank(queries, "doc_id", "text",
        docs, "doc_id", "text", cand, k = 3)),
      "indexed rerank must equal the text-derived form")

    // bucket pruning correctness: a single-candidate rerank reads only
    // that doc's bucket — if the probe-side bucket function disagreed
    // with the writer's placement, the row would be pruned AWAY and this
    // would come back empty instead of scored
    val oneQ = queries.limit(1)
    val qid = oneQ.select("doc_id").as[Long].head()
    val nbr = docs.where($"doc_id" =!= qid).select("doc_id").as[Long].head()
    val one = Seq((qid, nbr)).toDF("query_id", "nbr_id")
    val prunedGot = rows(LateInteraction.maxSimRerank(oneQ, "doc_id", "text",
      idx, one, k = 1))
    val prunedExp = rows(LateInteraction.maxSimRerank(oneQ, "doc_id", "text",
      docs, "doc_id", "text", one, k = 1))
    assert(prunedGot === prunedExp,
      "bucket-pruned single-candidate rerank must equal the fresh-build form")

    // and the plan genuinely prunes: the windows scan carries a bucket
    // partition filter
    val plan = LateInteraction.maxSimRerank(oneQ, "doc_id", "text",
      idx, one, k = 1).queryExecution.executedPlan.toString
    assert(plan.contains("bucket"),
      s"windows scan must carry the bucket partition filter:\n$plan")
  }

  test("an unbounded candidate relation fails loudly before any broadcast") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("id", "text")
    val tooMany = spark.range(LateInteraction.MaxRerankCandidates + 1)
      .select($"id".as("query_id"), $"id".as("nbr_id"))
    val e = intercept[IllegalArgumentException] {
      LateInteraction.maxSimRerank(docs.where($"id" === 1L), "id", "text",
        docs, "id", "text", tooMany, k = 3)
    }
    assert(e.getMessage.contains("candidate relation"),
      s"guard must name the candidate side: ${e.getMessage}")
  }

  test("plan: query windows broadcast, no cartesian product") {
    val docs = Tables.documents(spark, Sf0001).limit(40)
    val plan = LateInteraction.maxSimJoin(docs.where($"doc_id" % 7 === 0),
        "doc_id", "text", docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"query windows must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"dim equi-join must never degrade to a cartesian:\n$plan")
  }
}
