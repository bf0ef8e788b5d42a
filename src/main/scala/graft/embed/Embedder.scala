package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Query/corpus text embedding (reference R16, `embed.py:88-89` /
  * `backend/api.py:154-160` — Voyage API calls).
  *
  * The build is zero-egress, so the default implementation is a
  * deterministic local feature-hashing embedder: tokenize, hash each token
  * to a (dimension, sign) via md5, accumulate term frequency, L2-normalize.
  * A real client (Voyage-like) can implement the same trait; batch size 16
  * mirrors the reference (`embed.py:29-32`).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Double]
  def embedBatch(texts: Seq[String]): Seq[Array[Double]] = texts.map(embed)
}

/** Feature-hashing embedder. Pure function of (text, dim): stable across
  * JVMs and sessions — required because query vectors are interpolated into
  * the DuckDB oracle SQL as literals and must never drift.
  */
final class HashingEmbedder(val dim: Int) extends Embedder {
  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def md5Long(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    // first 8 bytes big-endian
    d.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  def embed(text: String): Array[Double] = {
    val v = new Array[Double](dim)
    tokenize(text).foreach { t =>
      val h = md5Long(t)
      val idx = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
      val sign = if (((h >>> 62) & 1L) == 0L) 1.0 else -1.0
      v(idx) += sign
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }
}

/** A batch embedding call failed after every retry. The reference surfaces
  * embed failure as an explicit API error (`backend/api.py:161-162` returns
  * 500 with the failure message) rather than dropping rows — this is the
  * engine-side rendition: the exception propagates out of the Spark task,
  * failing the job loudly instead of silently producing a partial corpus. */
final class EmbedFailedException(val attempts: Int, cause: Throwable)
  extends RuntimeException(
    s"embedding batch failed after $attempts attempt(s): ${cause.getMessage}", cause)

/** Failure contract for external embedding services (the Voyage-shaped HTTP
  * boundary, `embed.py:88-89`): retry each `embedBatch` up to `maxAttempts`
  * times (transient network errors), validate the response shape (one vector
  * per input text, each of `dim`), and throw [[EmbedFailedException]] when
  * attempts are exhausted — never return fewer/garbled vectors.
  *
  * Serializable wrapper so it rides inside `mapPartitions` tasks; retries
  * are therefore PER BATCH, partition-local, exactly where the RPC happens.
  */
final class RetryingEmbedder(inner: Embedder, maxAttempts: Int = 3)
    extends Embedder {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")
  def dim: Int = inner.dim
  def embed(text: String): Array[Double] = embedBatch(Seq(text)).head
  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val out = inner.embedBatch(texts)
        if (out.length != texts.length)
          throw new IllegalStateException(
            s"embedder returned ${out.length} vectors for ${texts.length} texts")
        out.find(_.length != dim).foreach(v =>
          throw new IllegalStateException(
            s"embedder returned a ${v.length}-dim vector, expected $dim"))
        return out
      } catch {
        case e: Throwable => last = e
      }
    }
    throw new EmbedFailedException(maxAttempts, last)
  }
}

/** HTTP JSON embedding client — the production implementation of the
  * Voyage-shaped service boundary the reference calls
  * (`embed.py:88-89` `voyage_client.embed(...)`, `backend/voyage.py:7-13`;
  * request/response shape is the public embeddings-API convention:
  * POST `{"input": [texts...], "model": "..."}` →
  * `{"data": [{"embedding": [floats...]}, ...]}` in input order).
  *
  * OFF by default — nothing in the engine constructs one (the zero-egress
  * build keeps [[HashingEmbedder]] as [[Embedder.default]]); a deployment
  * opts in explicitly, normally wrapped in [[RetryingEmbedder]]:
  *
  * {{{
  *   val embedder = new RetryingEmbedder(
  *     new HttpEmbedder("https://api.example.com/v1/embeddings",
  *       dim = 1024, model = "voyage-3.5", apiKey = sys.env("EMBED_KEY")))
  * }}}
  *
  * Built on JDK `java.net.http.HttpClient` and the Jackson that already
  * ships with Spark — zero new dependencies. The client is `@transient
  * lazy`, so the instance serializes into `mapPartitions` tasks and each
  * executor builds its own connection pool (the [[graft.embed.EmbedJob]]
  * partition-local RPC contract). Validation (vector count, dimension) is
  * done HERE so a garbled response throws inside [[RetryingEmbedder]]'s
  * retry loop rather than poisoning the corpus. */
final class HttpEmbedder(
    endpoint: String,
    val dim: Int,
    model: String = "",
    apiKey: String = "",
    timeoutMs: Int = 30000) extends Embedder {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
    .build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  def embed(text: String): Array[Double] = embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    if (texts.isEmpty) return Seq.empty
    val body = mapper.createObjectNode()
    val input = body.putArray("input")
    texts.foreach(input.add)
    if (model.nonEmpty) body.put("model", model)
    val reqB = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.toString))
    if (apiKey.nonEmpty) reqB.header("Authorization", s"Bearer $apiKey")
    val resp = client.send(reqB.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"embedding endpoint returned HTTP ${resp.statusCode()}: " +
          resp.body().take(200))
    val data = mapper.readTree(resp.body()).path("data")
    if (!data.isArray || data.size() != texts.length)
      throw new IllegalStateException(
        s"embedding response carried ${data.size()} vectors for ${texts.length} texts")
    (0 until data.size()).map { i =>
      val emb = data.get(i).path("embedding")
      if (!emb.isArray || emb.size() != dim)
        throw new IllegalStateException(
          s"embedding $i has ${emb.size()} dims, expected $dim")
      Array.tabulate(emb.size())(j => emb.get(j).asDouble())
    }
  }
}

object Embedder {
  /** Testdata embedding dimension (FIXTURES.md §1); the reference uses 1024
    * (`README.md:24`) — dimension is a parameter everywhere.
    */
  val TestdataDim = 64
  /** Batch size of the reference's embedding requests (`embed.py:29-32`). */
  val BatchSize = 16
  val default: Embedder = new HashingEmbedder(TestdataDim)
}
