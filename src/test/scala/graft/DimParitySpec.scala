package graft

import graft.api.FoodFinder
import graft.embed.{EmbedJob, Embedder, HashingEmbedder}
import graft.index.{Ivf, Pq}
import graft.search.VectorSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-dimension parity (SURVEY §7.4 risk 7): the reference embeds at
  * 1024 dims (`voyage-3.5`, `/root/reference/README.md:24`) while every
  * driver fixture is 64-dim — this suite runs the vector family end-to-end
  * at dim=1024 to prove the dimension is a parameter everywhere, with no
  * literal-64 assumption hiding in knn, IVF (build/ann/ball-cover join),
  * PQ/ADC, fusion, or the embed job. */
class DimParitySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val Dim = 1024
  private val emb = new HashingEmbedder(Dim)
  // 120 docs of deterministic token soup; hashing-embedded at 1024 dims on
  // the driver (the same embedder production would configure for 1024)
  private lazy val rows = (1L to 120L).map { i =>
    val text = s"doc $i " +
      (0 until 12).map(j => s"tok${(i * 7 + j) % 97}").mkString(" ")
    (i, text, emb.embed(text).toSeq)
  }
  private lazy val df = rows.toDF("id", "text", "emb").cache()
  private lazy val queryVec = emb.embed("tok10 tok11 tok12 shared doc")

  private def cosine(a: Array[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  test("1024-dim knn matches a driver-side brute-force oracle on all three metrics") {
    assert(rows.forall(_._3.length == Dim))
    val expected = rows
      .map { case (id, _, v) => (id, BigDecimal(cosine(queryVec, v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val got = VectorSearch.knn(df, "id", "emb", queryVec, k = 10)
      .select("id").as[Long].collect().toSeq
    assert(got === expected)
    // the other two DDL metrics run at 1024 too (shape check: full depth)
    for (m <- Seq("dotProduct", "euclidean"))
      assert(VectorSearch.knn(df, "id", "emb", queryVec, k = 10, metric = m)
        .count() === 10L)
  }

  test("1024-dim IVF: DDL dim recorded, exhaustive ann exact, ball-cover join exact") {
    val idx = Ivf.build(df, "id", "emb")
    assert(idx.dim === Dim)
    val exactTop = VectorSearch.knn(df, "id", "emb", queryVec, k = 10)
      .select("id").as[Long].collect().toSeq
    val annTop = Ivf.ann(idx, df, "id", "emb", queryVec,
        k = 10, numCandidates = Int.MaxValue)
      .select("id").as[Long].collect().toSeq
    assert(annTop === exactTop)
    // a 64-dim query against the 1024-dim DDL must be rejected, like Atlas
    val e = intercept[IllegalArgumentException] {
      Ivf.ann(idx, df, "id", "emb", Embedder.default.embed("wrong dim"),
        k = 5, numCandidates = 50)
    }
    assert(e.getMessage.contains("1024"))
    val batch = df.where(col("id") <= 10)
    val exactJoin = VectorSearch.knnJoin(batch, df, "id", "emb", "id", "emb", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val routed = Ivf.knnJoinExact(idx, batch, df, "id", "emb", "id", "emb",
        k = 3, probeMass = 0.5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(routed === exactJoin)
  }

  test("Matryoshka prefix ANN: exhaustive overfetch exact; guards loud; prefix at 1024 dims") {
    val exact = VectorSearch.knn(df, "id", "emb", queryVec, k = 5)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    // overfetch = n degenerates to exact regardless of prefix quality —
    // the forced-deep contract that licenses the declared query's oracle
    // prefixDims = 256 (not 32): the 1024-dim hashed QUERY vector has ~5
    // nonzero entries, and the all-zero-query-prefix guard is loud (a
    // 32-dim prefix of it is empty — asserted below)
    val deep = VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = 256, overfetch = rows.length)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    assert(deep === exact)
    // the coarse stage really narrows: sub-exhaustive overfetch returns k
    // rows scored on FULL vectors (scores equal exact knn's for the ids
    // it returns — re-rank never scores a truncated vector)
    val shallow = VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = 256, overfetch = 40)
      .select("id", "score").as[(Long, Double)].collect().toMap
    val exactAll = VectorSearch.knn(df, "id", "emb", queryVec, k = rows.length)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(shallow.size === 5)
    shallow.foreach { case (id, s) => assert(s === exactAll(id)) }
    // persisted-prefix discipline: a pre-sliced narrow relation (what the
    // declared query reads from parquet) gives the identical answer, and
    // combining it with preFilter is refused (the narrow relation must be
    // filtered by the caller — a post-filter would truncate below k)
    val preRel = df.select(col("id"), slice(col("emb"), 1, 256).as("emb"))
    val viaRel = VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = 256, overfetch = 40, prefixRel = Some(preRel))
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(viaRel === shallow)
    assert(intercept[IllegalArgumentException] {
      VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = 256, overfetch = 40,
        preFilter = Some(col("id") > 10), prefixRel = Some(preRel))
    }.getMessage.contains("prefix relation"))
    // misuse is loud, not silently wrong
    assert(intercept[IllegalArgumentException] {
      VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = Dim + 1, overfetch = 50)
    }.getMessage.contains("prefixDims"))
    assert(intercept[IllegalArgumentException] {
      VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = 256, overfetch = 3)
    }.getMessage.contains("overfetch"))
    // an all-zero QUERY prefix cannot rank the coarse stage — loud, not
    // silently degenerate (the 13-token hash embedding misses dims 1–32)
    assert(intercept[IllegalArgumentException] {
      VectorSearch.knnPrefix(df, "id", "emb", queryVec, k = 5,
        prefixDims = 32, overfetch = 50)
    }.getMessage.contains("all zero"))
  }

  test("1024-dim PQ: 128 subspaces train/encode/ADC; deep overfetch recovers exact top-k") {
    // m=128 → 8-dim subspaces (the 32× compression story at reference dim)
    val pq = Pq.build(df, "id", "emb", m = 128, ksub = 16)
    assert(pq.dim === Dim && pq.m === 128 && pq.dsub === 8)
    val exact = VectorSearch.knn(df, "id", "emb", queryVec, k = 5)
      .select("id").as[Long].collect().toSeq
    val adc = Pq.ann(pq, df, "id", "emb", queryVec,
        k = 5, overfetch = rows.length)
      .select("id").as[Long].collect().toSeq
    assert(adc === exact)
  }

  test("1024-dim hybrid fusion and the embed job carry the dimension through") {
    val tbl = FoodFinder.SearchTable(df, idCol = "id", embCol = "emb",
      textCol = "text", dim = Some(Dim))
    val fused = FoodFinder.hybrid(tbl, queryVec, "doc tok10", k = 5)
    assert(fused.count() === 5L)
    val embedded = EmbedJob.embedBatched(
      df.select("id", "text").limit(8), "text", emb)
    assert(embedded.select(size(col("emb"))).as[Int].collect()
      .forall(_ == Dim))
  }
}
