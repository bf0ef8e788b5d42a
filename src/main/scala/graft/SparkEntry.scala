package graft

import graft.embed.Embedder
import graft.functions.Vectors
import graft.search.VectorSearch
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the north-star LLM-pipeline ops)
  * gets one `queries` entry and, when ANSI-SQL-expressible, a matching
  * DuckDB `oracleSql` entry. Column names/aliases are kept identical on
  * both sides; every ranked query tie-breaks on a unique id; every float
  * is rounded identically on both sides (see VectorSearch.ScoreDecimals).
  */
object SparkEntry {

  /** Fixed flagship query text — the reference's own CLI smoke query
    * (`README.md:28`: "nuggets para desayuno"). Embedded once,
    * deterministically, and interpolated into the oracle SQL as a literal.
    */
  private val flagshipQueryVec: Array[Double] =
    Embedder.default.embed("nuggets para desayuno")
  private val flagshipQueryVecSql: String = Vectors.vecSql(flagshipQueryVec)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qVectorKnn(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** R7/R8/R5 exact filtered vector top-k (SURVEY §7.1 minimum slice):
    * embeddings ⋈ documents, pre-filter, cosine score, top-5. */
  private def qVectorKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val d = Tables.documents(spark, dir)
    val joined = e.join(d, e("vec_id") === d("doc_id"))
    VectorSearch
      .knn(joined, "vec_id", "embedding", flagshipQueryVec, k = 5,
        metric = "cosine", preFilter = Some(col("lang") === "en"))
      .select("vec_id", "text", "score")
  }

  /** R2 distinct + sort (the /api/restaurants pipeline,
    * `backend/api.py:87-94`) over documents.source. */
  private def qDistinctSort(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select("source")
      .where(col("source").isNotNull)
      .distinct()
      .orderBy("source")

  /** Baseline relational aggregation (north-star; TPC-H Q1 shape). */
  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vector_knn" -> ((s, dir) => qVectorKnn(s, dir)),
    "q_distinct_sort" -> ((s, dir) => qDistinctSort(s, dir)),
    "q1_agg" -> ((s, dir) => q1Agg(s, dir)),
  )

  // ----------------------------------------------------------------- oracle

  def oracleSql: Map[String, String] = Map(
    "q_vector_knn" ->
      s"""WITH scored AS (
         |  SELECT e.vec_id, d.text,
         |         round((1.0 + list_cosine_similarity(e.embedding::DOUBLE[], $flagshipQueryVecSql)) / 2.0, 6) AS score
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en'
         |)
         |SELECT vec_id, text, score FROM scored
         |ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,
    "q_distinct_sort" ->
      "SELECT DISTINCT source FROM documents WHERE source IS NOT NULL ORDER BY source",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
