package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) diversified top-k — the
  * diversity-aware second stage of a retrieval pipeline: greedily pick k
  * results that are RELEVANT to the query but not redundant with what was
  * already picked,
  *
  *   pick_t = argmax_(d ∈ C∖S) [ λ·rel(d) − (1−λ)·max_(s∈S) sim(d, s) ]
  *
  * (Carbonell & Goldstein 1998). A training-data builder uses this where
  * plain top-k returns k near-copies of the same document (the usual
  * outcome after retrieving from a corpus with residual near-dups).
  *
  * Execution shape: the greedy loop is UNROLLED into k relational rounds
  * (each an anti-join + a max-penalty aggregation + one per-query argmax
  * window). Every round touches only (query_id, candidate) rows — the
  * first stage's ≤ \|queries\|×k' survivors, never the corpus — so cost is
  * flat in corpus size (the [[Rerank]] property) and every shuffle is
  * keyed by query_id. Candidate-pair similarities are ≤ k'·(k'−1) rows per
  * query, built once by [[candidatePairSims]] from the sparse embedding
  * relation. Plan depth grows with k: this is for the usual small k
  * (diversified SERP / few-shot pools), not k in the thousands.
  *
  * Determinism: scores and sims arrive rounded to [[Rerank.ScoreDecimals]],
  * the MMR objective is re-rounded each role, ties break (mmr DESC, id
  * ASC) — bit-reproducible and mirrored by [[sqlMmrSelect]] for the
  * DuckDB oracle.
  */
object Mmr {

  /** Symmetric per-query candidate-pair cosines from a SPARSE embedding
    * relation (`emb` = (id, dim, val), [[graft.embed.EmbedJob.embedRelational]]
    * shape): (query_id, id1, id2, sim) for id1 ≠ id2 of the same query,
    * sim = round(Σ val·val, [[Rerank.ScoreDecimals]]). Zero-overlap pairs
    * are absent — consumers coalesce to 0. */
  def candidatePairSims(candidates: DataFrame, emb: DataFrame): DataFrame = {
    // ONE broadcast semi-join prunes the corpus-sized embedding relation
    // to candidate rows before any pair work — the corpus is scanned once
    // and never shuffled (the pair joins below run over ≤ |cands|·dims
    // rows). Checkpointed because e1/e2 both read it.
    val embC = emb.join(
        broadcast(candidates.select(col("id")).distinct()), "id")
      .localCheckpoint(true)
    val a = candidates.select(col("query_id"), col("id").as("id1"))
    val b = candidates.select(col("query_id"), col("id").as("id2"))
    val e1 = embC.select(col("id").as("id1"), col("dim"), col("val").as("v1"))
    val e2 = embC.select(col("id").as("id2"), col("dim"), col("val").as("v2"))
    a.join(b, "query_id").where(col("id1") =!= col("id2"))
      .join(e1, "id1").join(e2, Seq("id2", "dim"))
      .groupBy("query_id", "id1", "id2")
      .agg(round(sum(col("v1") * col("v2")), Rerank.ScoreDecimals).as("sim"))
  }

  /** Greedy MMR selection, unrolled to `k` rounds.
    *
    * `candidates`: (query_id, id, score) — first-stage results, score
    * already rounded. `sims`: symmetric (query_id, id1, id2, sim) as from
    * [[candidatePairSims]]. Queries with fewer than k candidates yield
    * fewer rows, like the reference's may-return-under-k modes.
    *
    * Output: (query_id, id, score, rank) with rank = selection order. */
  def mmrSelect(candidates: DataFrame, sims: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    // Both inputs are referenced by EVERY unrolled round (k anti-joins /
    // penalty joins over the same two tables); without a lineage break
    // Spark recomputes the whole upstream retrieval per round — measured
    // 3× the runtime at k=3. Both are per-query bounded (≤ k' candidates,
    // ≤ k'² sims per query), so executor-local materialization is the
    // same bounded-small-table call as Dedup.components' per-round
    // checkpoint; recompute-on-executor-loss is acceptable for a
    // driver-checked query (rerun the query).
    val cand = candidates.select("query_id", "id", "score")
      .localCheckpoint(true)
    val simsC = sims.localCheckpoint(true)
    val w = Window.partitionBy("query_id")
      .orderBy(col("__mmr").desc, col("id").asc)
    def argmax(scored: DataFrame, rank: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("query_id"), col("id"), col("score"), lit(rank).as("rank"))
    // round 1: pure relevance
    var selected = argmax(cand.withColumn("__mmr", col("score")), 1)
    for (t <- 2 to k) {
      val remaining = cand.join(selected.select("query_id", "id"),
        Seq("query_id", "id"), "left_anti")
      // penalty: max sim to ANY already-selected doc of the same query
      // (≤ t−1 rows per candidate reach the max — bounded state)
      val simToSel = simsC.join(
        selected.select(col("query_id"), col("id").as("id2")),
        Seq("query_id", "id2"))
      val scored = remaining
        .join(simToSel.select(col("query_id"), col("id1").as("id"),
          col("sim")), Seq("query_id", "id"), "left")
        .groupBy("query_id", "id")
        .agg(first("score").as("score"),
          coalesce(max("sim"), lit(0.0)).as("__pen"))
        .withColumn("__mmr", round(
          lit(lambda) * col("score") - lit(1.0 - lambda) * col("__pen"),
          Rerank.ScoreDecimals))
      // checkpoint per round: `selected` is referenced 3× by round t+1
      // (anti-join, penalty semi-join, union base), so an un-broken
      // lineage grows the plan O(3^k) — linear with the break (the
      // Dedup.components per-round pattern; ≤ |queries|·t rows)
      selected = selected.unionByName(argmax(scored, t)).localCheckpoint(true)
    }
    selected
  }

  /** [[mmrSelect]] as ONE bounded-state aggregation — the fast execution
    * shape (the embedBatched/embedRelational duality): collect each
    * query's ≤ k' candidates and ≤ k'² pair sims into per-query structs
    * (one shuffle keyed by query_id, state bounded by the first stage's k'
    * — the [[VectorSearch]] TopK-aggregator argument), then run the greedy
    * loop per query in a typed map. Identical output to [[mmrSelect]]
    * (same rounded arithmetic, same tie-breaks — parity pinned in
    * MmrSpec); the relational unrolling remains the SQL-mirror shape the
    * DuckDB oracle checks. Prefer this one in pipelines: the unrolled
    * plan pays k rounds of join/window scheduling for the same answer. */
  def mmrSelectAgg(candidates: DataFrame, sims: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val candAgg = candidates.groupBy("query_id")
      .agg(collect_list(struct(col("id"), col("score"))).as("cands"))
    val simAgg = sims.groupBy("query_id")
      .agg(collect_list(struct(col("id1"), col("id2"), col("sim"))).as("sims"))
    val joined = candAgg.join(simAgg, Seq("query_id"), "left")
      .select(col("query_id").cast("long"),
        col("cands").cast("array<struct<id:long,score:double>>"),
        coalesce(col("sims"),
          array().cast("array<struct<id1:long,id2:long,sim:double>>"))
          .as("sims"))
      .as[(Long, Seq[(Long, Double)], Seq[(Long, Long, Double)])]
    joined.flatMap { case (qid, cands, simRows) =>
      val sim = simRows.map(t => (t._1, t._2) -> t._3).toMap
      var pool = cands.toMap
      var sel = List.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
      var t = 1
      while (t <= k && pool.nonEmpty) {
        val pick = pool.map { case (id, rel) =>
          val mmr =
            if (sel.isEmpty) rel
            else {
              val pen = sel.map(s => sim.getOrElse((id, s), 0.0)).max
              java.math.BigDecimal.valueOf(lambda * rel - (1.0 - lambda) * pen)
                .setScale(Rerank.ScoreDecimals, java.math.RoundingMode.HALF_UP)
                .doubleValue()
            }
          (id, mmr)
        }.minBy { case (id, m) => (-m, id) }._1
        out += ((qid, pick, pool(pick), t))
        pool -= pick; sel ::= pick; t += 1
      }
      out
    }.toDF("query_id", "id", "score", "rank")
  }

  /** DuckDB rendition of [[mmrSelect]] over relation text `candRel`
    * (query_id, id, score) and `simsRel` (query_id, id1, id2, sim) —
    * the same unrolled rounds as CTE layers. Returns a SELECT producing
    * (query_id, id, score, rank). */
  def sqlMmrSelect(candRel: String, simsRel: String, k: Int,
      lambda: Double): String = {
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0)
    val sb = new StringBuilder
    sb ++= s"""WITH __cand AS ($candRel
              |), __sims AS ($simsRel
              |), sel1 AS (
              |  SELECT query_id, id, score, 1 AS rank FROM (
              |    SELECT query_id, id, score,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY score DESC, id ASC) AS rn
              |    FROM __cand) WHERE rn = 1
              |)""".stripMargin
    for (t <- 2 to k) {
      val prevSel = (1 until t).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      sb ++= s""",
                |prev$t AS ($prevSel),
                |rem$t AS (
                |  SELECT c.* FROM __cand c
                |  LEFT JOIN prev$t p ON c.query_id = p.query_id AND c.id = p.id
                |  WHERE p.id IS NULL
                |),
                |pen$t AS (
                |  SELECT r.query_id, r.id, any_value(r.score) AS score,
                |         coalesce(max(m.sim), 0.0) AS pen
                |  FROM rem$t r
                |  LEFT JOIN (__sims m JOIN prev$t s
                |             ON m.query_id = s.query_id AND m.id2 = s.id)
                |    ON m.query_id = r.query_id AND m.id1 = r.id
                |  GROUP BY r.query_id, r.id
                |),
                |sel$t AS (
                |  SELECT query_id, id, score, $t AS rank FROM (
                |    SELECT query_id, id, score,
                |           row_number() OVER (PARTITION BY query_id
                |                              ORDER BY round($lambda * score - ${1.0 - lambda} * pen, ${Rerank.ScoreDecimals}) DESC,
                |                              id ASC) AS rn
                |    FROM pen$t) WHERE rn = 1
                |)""".stripMargin
    }
    val all = (1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    sb ++= s"\nSELECT query_id, id, score, rank FROM ($all)"
    sb.toString
  }
}
