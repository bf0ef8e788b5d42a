package graft.search

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact vector top-k — the Spark rendition of the reference's
  * `$vectorSearch` stage (`backend/api.py:168-180`, `local-test.py:145-155`).
  *
  * Semantics preserved exactly:
  *   - optional pre-filter applied BEFORE top-k selection (Atlas evaluates
  *     the `filter` clause inside the index probe), so k survivors return
  *     even under selective filters;
  *   - similarity ∈ {cosine, dotProduct, euclidean} fixed per "index"
  *     (reference `indexes.py:28-31`);
  *   - score exposed as a [0,1]-normalized `score` column (R8);
  *   - deterministic tie-break `score DESC, id ASC` so results are
  *     hash-comparable (FIXTURES.md invariants).
  *
  * Physical shape: `WHERE pre → score each row → ORDER BY … LIMIT k` plans
  * as filter-pushdown + `TakeOrderedAndProject` — a single scan with a
  * per-partition heap then a k-row driver merge; no global sort, no shuffle
  * of the data. That is the plan that survives 100 TB: each executor scans
  * its split and ships k rows. `numCandidates` (R9) is a no-op here
  * (recall = 1); the IVF path in [[graft.index.Ivf]] consumes it.
  *
  * Scores are rounded to 6 decimals BEFORE ranking so the Spark and DuckDB
  * top-k boundaries agree even when two candidates differ by < 1e-6.
  */
object VectorSearch {

  val ScoreDecimals = 6

  /** The three Atlas similarities an index can be declared with
    * (`indexes.py:28-31`). */
  val Metrics: Set[String] = Set("cosine", "dotProduct", "euclidean")

  /** @param df        table holding the vectors
    * @param idCol     unique id column name (tie-breaker)
    * @param embCol    `array<double>` vector column name
    * @param queryVec  query embedding (driver-side literal)
    * @param k         top-k
    * @param metric    cosine | dotProduct | euclidean
    * @param preFilter optional predicate applied before ranking
    */
  def knn(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryVec: Array[Double],
      k: Int,
      metric: String = "cosine",
      preFilter: Option[Column] = None): DataFrame = {
    require(queryVec.length > 0, "empty query vector")
    val filtered = preFilter.map(df.where).getOrElse(df)
    filtered
      .withColumn("score",
        round(Vectors.score(metric, col(embCol), Vectors.vecLit(queryVec)), ScoreDecimals))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Reference request clamp: limit ∈ [1, 25], default 5
    * (`backend/api.py:116-119`). */
  def clampLimit(k: Int): Int = math.max(1, math.min(k, 25))

  /** Over-fetch heuristics for ANN (`backend/api.py:120`,
    * `local-test.py:151`). */
  def numCandidatesWeb(k: Int): Int = k * 20
  def numCandidatesCli(k: Int): Int = math.max(k * 5, 200)
}
