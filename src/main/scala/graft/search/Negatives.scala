package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining — the training-pair construction step for
  * contrastive retrieval models (DPR/SBERT-style): for each (query,
  * positive) pair, the best negatives are documents the FIRST-STAGE
  * retriever ranked high (hard: the model currently confuses them with
  * relevant) but that are NOT near-duplicates of the positive (a near-dup
  * scored as a negative is a FALSE negative and poisons the loss — the
  * standard mining pitfall).
  *
  * Execution shape: everything is keyed by query_id over first-stage
  * survivors (≤ k' candidates per query) — the [[Rerank]]/[[Mmr]] flat-in-
  * corpus-size property. The near-dup screen needs only the ≤ k'
  * (candidate, positive) sims per query, built from the sparse embedding
  * relation by [[simToPositive]]; no candidate×candidate work.
  */
object Negatives {

  /** (query_id, id, sim) — each candidate's MAX cosine to any of its
    * query's POSITIVE documents, from a sparse embedding relation (`emb` =
    * (id, dim, val)). Per-(candidate, positive) dots are rounded first,
    * then the max taken, so a query with several positives screens against
    * its closest one — summing across positives would fabricate a
    * meaningless combined score. Zero-overlap candidates absent (consumers
    * coalesce 0). `positives`: (query_id, pos_id), one row per positive. */
  def simToPositive(candidates: DataFrame, positives: DataFrame,
      emb: DataFrame): DataFrame = {
    // prune the corpus-sized embedding to candidate ∪ positive rows with
    // one broadcast semi-join (the Mmr.candidatePairSims pattern) — the
    // corpus is scanned once, never shuffled for the pair work
    val ids = candidates.select(col("id"))
      .union(positives.select(col("pos_id").as("id"))).distinct()
    // deliberately NOT checkpointed: e1/e2 re-evaluate the pruned
    // semi-join, but each evaluation is a broadcast probe of the (usually
    // cached) embedding relation; a checkpoint boundary here measured
    // slower in both eager and lazy variants at sf0.1. The ids broadcast
    // costs one extra first-stage evaluation, which is the right trade —
    // without the prune, the e2 join would SHUFFLE the corpus-sized
    // embedding relation, the thing this stage must never do.
    val embC = emb.join(broadcast(ids), "id")
    val e1 = embC.select(col("id"), col("dim"), col("val").as("v1"))
    val e2 = embC.select(col("id").as("pos_id"), col("dim"),
      col("val").as("v2"))
    candidates.select("query_id", "id")
      .join(positives, "query_id")
      .join(e1, "id").join(e2, Seq("pos_id", "dim"))
      .groupBy("query_id", "id", "pos_id")
      .agg(round(sum(col("v1") * col("v2")), Rerank.ScoreDecimals).as("__pair_sim"))
      .groupBy("query_id", "id")
      .agg(max("__pair_sim").as("sim"))
  }

  /** Mine up to `n` hard negatives per query from first-stage candidates.
    *
    * Drops the positive itself and any candidate with
    * sim-to-positive ≥ `nearDupThr` (false-negative screen), then keeps
    * the `n` HIGHEST-scored survivors — hardest first. Output:
    * (query_id, neg_id, score, sim_to_pos, rank ≤ n), rank by
    * (score DESC, id ASC). */
  def mine(candidates: DataFrame, positives: DataFrame, sims: DataFrame,
      nearDupThr: Double, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id").asc)
    candidates.select("query_id", "id", "score")
      // drop any candidate that IS one of the query's positives — an
      // anti-join against the positive SET, so several positives per
      // query neither fan rows out nor let a positive slip through as
      // its sibling's "negative"
      .join(positives.select(col("query_id"), col("pos_id").as("id")),
        Seq("query_id", "id"), "left_anti")
      .join(sims, Seq("query_id", "id"), "left")
      .withColumn("sim_to_pos", coalesce(col("sim"), lit(0.0)))
      .where(col("sim_to_pos") < nearDupThr)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .select(col("query_id"), col("id").as("neg_id"), col("score"),
        col("sim_to_pos"), col("rank"))
  }

  /** DuckDB rendition of [[simToPositive]]+[[mine]] over relation texts
    * `candRel` (query_id, id, score), `posRel` (query_id, pos_id) and
    * `embRel` (id, dim, val): (query_id, neg_id, score, sim_to_pos,
    * rank ≤ n). */
  def sqlMine(candRel: String, posRel: String, embRel: String,
      nearDupThr: Double, n: Int): String =
    s"""WITH __cand AS ($candRel
       |), __pos AS ($posRel
       |), __emb AS ($embRel
       |), __simpos AS (
       |  SELECT query_id, id, max(pair_sim) AS sim FROM (
       |    SELECT c.query_id, c.id, p.pos_id,
       |           round(sum(e1.val * e2.val), ${Rerank.ScoreDecimals}) AS pair_sim
       |    FROM __cand c JOIN __pos p ON c.query_id = p.query_id
       |    JOIN __emb e1 ON e1.id = c.id
       |    JOIN __emb e2 ON e2.id = p.pos_id AND e2.dim = e1.dim
       |    GROUP BY c.query_id, c.id, p.pos_id
       |  ) GROUP BY query_id, id
       |), screened AS (
       |  SELECT c.query_id, c.id, c.score,
       |         coalesce(s.sim, 0.0) AS sim_to_pos
       |  FROM __cand c
       |  LEFT JOIN __simpos s ON s.query_id = c.query_id AND s.id = c.id
       |  WHERE coalesce(s.sim, 0.0) < $nearDupThr
       |    AND NOT EXISTS (SELECT 1 FROM __pos p
       |                    WHERE p.query_id = c.query_id AND p.pos_id = c.id)
       |), ranked AS (
       |  SELECT query_id, id AS neg_id, score, sim_to_pos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, id ASC)::INTEGER AS rank
       |  FROM screened
       |)
       |SELECT query_id, neg_id, score, sim_to_pos, rank
       |FROM ranked WHERE rank <= $n""".stripMargin
}
