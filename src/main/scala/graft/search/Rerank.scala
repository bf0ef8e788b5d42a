package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-stage reranking for retrieve-then-rerank pipelines.
  *
  * The reference ranks once (vector, BM25, or fused — `backend/api.py`
  * modes); production retrieval-dataset builders add a SECOND stage: a
  * cross-encoder scores each (query, candidate) PAIR jointly and re-orders
  * the first stage's top-k. The first stage is cheap and recall-oriented
  * (ANN/BM25 over 100 TB); the rerank stage is expensive and
  * precision-oriented, so it only ever sees first-stage survivors —
  * |queries| × k pairs, never the corpus.
  *
  * Execution shape is the [[graft.embed.Embedder]] boundary again (R16):
  * partition-local batches of [[Reranker.BatchSize]] pairs per external
  * call, zero shuffle before the per-query rank window (whose partitions
  * are ≤ first-stage-k rows — bounded regardless of corpus size). The
  * default [[OverlapReranker]] is a deterministic token-overlap F1, so the
  * whole pipeline stays DuckDB-oracle-checkable; a real cross-encoder
  * client implements the same trait and inherits the retry/validation
  * contract via [[RetryingReranker]].
  */
trait Reranker extends Serializable {
  /** Joint relevance score for each (queryText, docText) pair, one output
    * per input pair, same order. */
  def scoreBatch(pairs: Seq[(String, String)]): Seq[Double]
}

object Reranker {
  /** Pairs per external call — the reference's embed batch size
    * (`embed.py:29-32`); cross-encoder services batch the same way. */
  val BatchSize = 16
}

/** A rerank batch call failed after every retry — same loud-failure
  * contract as [[graft.embed.EmbedFailedException]] (`backend/api.py:161-162`
  * surfaces external-model failure as a 500, never a partial result). */
final class RerankFailedException(val attempts: Int, cause: Throwable)
  extends RuntimeException(
    s"rerank batch failed after $attempts attempt(s): ${cause.getMessage}", cause)

/** Deterministic local "cross-encoder": F1 overlap of the DISTINCT token
  * sets of query and document (2·|q∩d| / (|q|+|d|); 0 when both are empty).
  * Tokenization is the frozen [[graft.functions.Text.SplitRe]] so the score
  * is reproducible and mirrored exactly by [[Rerank.sqlOverlapF1]]. */
final class OverlapReranker extends Reranker {
  private def tokenSet(text: String): Set[String] =
    text.toLowerCase.split(graft.functions.Text.SplitRe).filter(_.nonEmpty).toSet
  def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] = pairs.map {
    case (q, d) =>
      val (qs, ds) = (tokenSet(Option(q).getOrElse("")),
        tokenSet(Option(d).getOrElse("")))
      val denom = qs.size + ds.size
      if (denom == 0) 0.0 else 2.0 * qs.intersect(ds).size / denom
  }
}

/** Retry + response-shape validation for external rerank services —
  * [[graft.embed.RetryingEmbedder]]'s contract at the rerank boundary:
  * per-batch partition-local retries, one score per pair enforced, and a
  * loud [[RerankFailedException]] when attempts are exhausted. */
final class RetryingReranker(inner: Reranker, maxAttempts: Int = 3)
    extends Reranker {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")
  def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val out = inner.scoreBatch(pairs)
        require(out.length == pairs.length,
          s"reranker returned ${out.length} scores for ${pairs.length} pairs")
        return out
      } catch { case e: Throwable => last = e }
    }
    throw new RerankFailedException(maxAttempts, last)
  }
}

object Rerank {
  /** Rounding applied to scores before ranking/compare — the repo-wide
    * cross-engine float contract ([[VectorSearch.ScoreDecimals]]). */
  val ScoreDecimals = 6

  /** Re-score first-stage candidate pairs and keep each query's rerank
    * top-k.
    *
    * `candidates` carries one row per (query, candidate) pair with the two
    * text columns already attached — at scale that attach is a broadcast of
    * the (|queries| × first-stage-k)-row candidate table against the
    * corpus, never a corpus shuffle. Scoring is partition-local batched
    * calls ([[Reranker.BatchSize]] pairs per call, the external-service
    * boundary); the final window partitions by query over ≤ first-stage-k
    * rows.
    *
    * Output: (`qIdCol`, `idCol`, rr_score, rank ≤ k), rank by
    * (rr_score DESC, id ASC), score rounded to [[ScoreDecimals]]. */
  def rerankJoin(candidates: DataFrame, qIdCol: String, idCol: String,
      qTextCol: String, dTextCol: String, k: Int,
      reranker: Reranker = new RetryingReranker(new OverlapReranker)): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = candidates.sparkSession
    val in = candidates.select(qIdCol, idCol, qTextCol, dTextCol)
    val schema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+ org.apache.spark.sql.types.StructField(
        "__rr_raw", org.apache.spark.sql.types.DoubleType, nullable = false))
    val rows = in.rdd.mapPartitions { it =>
      it.grouped(Reranker.BatchSize).flatMap { batch =>
        // one external call per batch (R16 boundary)
        val scores = reranker.scoreBatch(batch.map(r =>
          (Option(r.getString(2)).getOrElse(""),
            Option(r.getString(3)).getOrElse(""))))
        batch.lazyZip(scores).map { (r, s) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s)
        }
      }
    }
    val scored = spark.createDataFrame(rows, schema)
      .withColumn("rr_score", round(col("__rr_raw"), ScoreDecimals))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("rr_score").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("rr_score"), col("rank"))
  }

  /** [[OverlapReranker]]'s score as a pure CATALYST column — the
    * relational twin of the mapPartitions shape (the
    * embedBatched/embedRelational duality): array_intersect over the
    * distinct token arrays, fully codegen'd, no external-service
    * boundary. Use when the scorer is a closed-form function; use
    * [[rerankJoin]] when it is a real model call. Bit-identical to the
    * scorer (parity in RerankSpec). */
  def overlapF1(qText: Column, dText: Column): Column = {
    def toks(c: Column) =
      array_distinct(graft.functions.Text.tokens(coalesce(c, lit(""))))
    val (q, d) = (toks(qText), toks(dText))
    val denom = size(q) + size(d)
    round(when(denom === 0, 0.0)
      .otherwise(lit(2.0) * size(array_intersect(q, d)) / denom),
      ScoreDecimals)
  }

  /** [[rerankJoin]] with the relational scorer: same output columns and
    * ranking contract, one codegen'd projection instead of batched
    * external calls — zero shuffle before the bounded per-query window. */
  def rerankJoinRelational(candidates: DataFrame, qIdCol: String,
      idCol: String, qTextCol: String, dTextCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("rr_score").desc, col(idCol).asc)
    candidates
      .withColumn("rr_score", overlapF1(col(qTextCol), col(dTextCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("rr_score"), col("rank"))
  }

  /** DuckDB rendition of [[OverlapReranker]]'s score for oracle SQL: F1 of
    * the distinct token sets of `qTextExpr` and `dTextExpr`, rounded to
    * [[ScoreDecimals]]. */
  def sqlOverlapF1(qTextExpr: String, dTextExpr: String): String = {
    def distinctToks(e: String) =
      s"list_distinct(${graft.functions.Text.sqlTokens(e)})"
    val (q, d) = (distinctToks(qTextExpr), distinctToks(dTextExpr))
    s"""round(CASE WHEN len($q) + len($d) = 0 THEN 0.0
       |           ELSE 2.0 * len(list_intersect($q, $d)) / (len($q) + len($d))
       |      END, $ScoreDecimals)""".stripMargin
  }
}
