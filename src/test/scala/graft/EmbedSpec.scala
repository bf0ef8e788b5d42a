package graft

import graft.embed.{EmbedFailedException, EmbedJob, Embedder, HttpEmbedder, RetryingEmbedder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embed ETL: batched mapPartitions shape ≡ driver-side embedder ≡
  * relational sparse shape; skip-existing semantics. */
class EmbedSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = Seq(
    (1L, "nuggets para desayuno"),
    (2L, "fast table scan merge"),
    (3L, "the quick brown fox"),
  ).toDF("id", "text")

  test("embedBatched equals driver-side embedder per row") {
    val got = EmbedJob.embedBatched(docs, "text")
      .select("id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    docs.collect().foreach { r =>
      val exp = Embedder.default.embed(r.getString(1)).toSeq
      assert(got(r.getLong(0)) === exp)
    }
  }

  test("relational sparse embedding equals the dense embedder's nonzero dims") {
    val sparse = EmbedJob.embedRelational(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    docs.collect().foreach { r =>
      val dense = Embedder.default.embed(r.getString(1))
      dense.zipWithIndex.foreach { case (v, d) =>
        val expected = java.math.BigDecimal.valueOf(v)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val got = sparse.getOrElse((r.getLong(0), d), 0.0)
        assert(got === expected, s"id=${r.getLong(0)} dim=$d")
      }
    }
  }

  test("embedder failure contract: transient errors retry, exhaustion fails the job") {
    // transient: first two calls throw, third succeeds → retry absorbs it
    class Flaky(failures: Int) extends Embedder {
      private var calls = 0
      def dim: Int = Embedder.TestdataDim
      def embed(text: String): Array[Double] = embedBatch(Seq(text)).head
      override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
        calls += 1
        if (calls <= failures) throw new RuntimeException(s"503 from upstream (call $calls)")
        texts.map(Embedder.default.embed)
      }
    }
    val retried = EmbedJob.embedBatched(
        docs.repartition(1), "text", new RetryingEmbedder(new Flaky(2), maxAttempts = 3))
      .select("id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(retried(1L) === Embedder.default.embed("nuggets para desayuno").toSeq)

    // exhaustion: the reference's API maps embed failure to an explicit 500
    // (backend/api.py:161-162) — here the typed exception fails the Spark
    // job rather than silently dropping the batch
    val direct = intercept[EmbedFailedException] {
      new RetryingEmbedder(new Flaky(99), maxAttempts = 2).embedBatch(Seq("x"))
    }
    assert(direct.attempts === 2)
    val jobFailure = intercept[org.apache.spark.SparkException] {
      EmbedJob.embedBatched(
        docs.repartition(1), "text", new RetryingEmbedder(new Flaky(99), maxAttempts = 2))
        .count()
    }
    val chain = Iterator.iterate[Throwable](jobFailure)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("failed after 2 attempt"), chain)

    // a service returning the wrong vector count / dim is a failure too,
    // never a silent partial result
    class WrongShape extends Embedder {
      def dim: Int = Embedder.TestdataDim
      def embed(text: String): Array[Double] = new Array[Double](dim)
      override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
        texts.drop(1).map(_ => new Array[Double](dim))
    }
    intercept[EmbedFailedException] {
      new RetryingEmbedder(new WrongShape, maxAttempts = 1).embedBatch(Seq("a", "b"))
    }
  }

  test("embedMissing only embeds null rows and keeps existing vectors") {
    val pre = Seq(
      (1L, "some text", Some(Seq(9.0, 9.0))),
      (2L, "other text", None),
    ).toDF("id", "text", "emb")
    val out = EmbedJob.embedMissing(pre, "text", "emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(out(1L) === Seq(9.0, 9.0)) // untouched
    assert(out(2L) === Embedder.default.embed("other text").toSeq)
  }

  test("HttpEmbedder speaks the Voyage-shaped wire contract against a local stub server") {
    // a JDK HttpServer standing in for the external embedding service:
    // first two requests fail 500 (transient outage), then vectors are
    // served deterministically as [len(text), 1] — exercising transport,
    // JSON round-trip, auth header pass-through, AND the RetryingEmbedder
    // composition production code would use
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val seenAuth = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      seenAuth.set(exchange.getRequestHeaders.getFirst("Authorization"))
      val resp =
        if (failures.getAndDecrement() > 0) ("""{"error":"overloaded"}""", 500)
        else {
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val input = mapper.readTree(body).path("input")
          val out = mapper.createObjectNode()
          val data = out.putArray("data")
          (0 until input.size()).foreach { i =>
            val e = data.addObject().putArray("embedding")
            e.add(input.get(i).asText().length.toDouble); e.add(1.0)
          }
          (out.toString, 200)
        }
      val bytes = resp._1.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(resp._2, bytes.length.toLong)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings"
      val http = new HttpEmbedder(url, dim = 2, model = "stub-embed",
        apiKey = "test-key")
      // bare client: the 500s surface as exceptions (no silent retries)
      intercept[java.io.IOException] { http.embedBatch(Seq("x")) }
      // behind the retry contract the transient outage is absorbed
      val retrying = new RetryingEmbedder(http, maxAttempts = 3)
      val got = retrying.embedBatch(Seq("alpha", "zz"))
      assert(got.map(_.toSeq) === Seq(Seq(5.0, 1.0), Seq(2.0, 1.0)))
      assert(seenAuth.get() === "Bearer test-key")
      // a dimension-garbled response is rejected, not returned: dim=3
      // client against the 2-dim stub exhausts retries and fails loudly
      val wrongDim = new RetryingEmbedder(
        new HttpEmbedder(url, dim = 3), maxAttempts = 2)
      intercept[EmbedFailedException] { wrongDim.embedBatch(Seq("y")) }
    } finally server.stop(0)
  }
}
