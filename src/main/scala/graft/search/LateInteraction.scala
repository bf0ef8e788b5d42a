package graft.search

import graft.embed.EmbedJob
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LATE-INTERACTION retrieval (the ColBERT shape, Khattab & Zaharia 2020):
  * instead of one vector per document, each document is a BAG of window
  * vectors, and query–document relevance is
  *
  *   score(q, d) = Σ_{qw ∈ windows(q)} max(0, max_{dw ∈ windows(d)} cos(qw, dw))
  *
  * — every query window independently finds its best-matching document
  * window and the per-window evidence sums. This scores multi-topic
  * queries the single-vector cosine structurally cannot: a document
  * matching BOTH topics of a two-topic query beats a document matching
  * one topic twice, because the two query windows max against DIFFERENT
  * document windows. The reference's single-vector search
  * (`/root/reference/backend/api.py:203-254`) has no rendition of this;
  * it is part of the LLM-pipeline surface (retrieval for RAG / training-
  * pair mining) this engine adds.
  *
  * Representation: windows are consecutive runs of `windowTokens` tokens;
  * each window's vector is the deterministic hashing embedder applied to
  * the window's token bag ([[EmbedJob.termDim]]/[[EmbedJob.termSign]] —
  * the SAME md5 coordinates as [[EmbedJob.embedRelational]], so the
  * window relation is the per-window refinement of the whole-document
  * sparse embedding), L2-normalized, kept SPARSE as (id, w, dim, val).
  * cos(qw, dw) is then a postings-style sum of val products over shared
  * dims — no dense fan-out anywhere.
  *
  * Scale shape (the [[VectorSearch.sparseKnnJoin]] discipline, one level
  * finer): the query side is a bounded batch
  * ([[VectorSearch.requireBoundedBatch]]) whose window relation
  * broadcasts; the corpus window relation streams through a broadcast
  * equi-join on `dim` — work ∝ |corpus windows| × (query windows per
  * dim), zero corpus shuffle before aggregation. The three aggregations
  * (dot per window pair → max per query window × doc → sum per query ×
  * doc) each shrink the relation and all run with map-side partial
  * aggregation; the final top-k is the bounded-state
  * [[VectorSearch.topKScored]] aggregator, never a rank window over all
  * scored pairs.
  *
  * Cross-engine determinism: window dots round to
  * [[VectorSearch.ScoreDecimals]] (max is then order-independent), and
  * the outer sum runs on integer MICRO-UNITS (the `Curation.mixSources`
  * pattern) — `sum(long)` is exact and order-independent, and the single
  * trailing division is IEEE-correctly-rounded in both engines, so the
  * DuckDB oracle ([[sqlMaxSimJoin]]) agrees bit-for-bit.
  */
object LateInteraction {

  /** Default window width. Eight tokens ≈ a clause — fine enough that a
    * window means one thing, coarse enough that |windows| stays ~n/8. */
  val DefaultWindowTokens = 8

  /** Batch cap for [[maxSimJoin]] — much tighter than
    * [[VectorSearch.MaxQueryBatch]] (which bounds broadcast memory, not
    * this operator's fan-out): the exhaustive dim join multiplies every
    * corpus window by |batch windows|/dims, so a broadcast-sized batch
    * that passes the generic guard still detonates the pre-aggregation
    * relation. Larger batches belong on [[maxSimRerank]]. */
  val MaxExhaustiveBatch = 4096

  /** Cap on the CANDIDATE-PAIR side of [[maxSimRerank]] — the relation is
    * broadcast, so an unbounded first stage (a retriever bug emitting the
    * cross product, say) must fail loudly rather than detonate executor
    * memory. 2²⁰ (query, nbr) pairs ≈ 16 MB broadcast — comfortably inside
    * the [[VectorSearch.MaxQueryBatch]] broadcast posture, and far above
    * any sane top-k fan-out (65k queries × 16 candidates each). */
  val MaxRerankCandidates = 1 << 20

  private def requireExhaustiveBatch(queries: DataFrame): Unit = {
    val n = queries.limit(MaxExhaustiveBatch + 1).count()
    require(n <= MaxExhaustiveBatch,
      s"LateInteraction.maxSimJoin: query batch has > $MaxExhaustiveBatch " +
        "rows; the exhaustive dim join fans out by |batch windows|/dims " +
        "per corpus window and would build an enormous pre-aggregation " +
        "relation. Use maxSimRerank with first-stage candidates " +
        "(pooled-vector ANN / BM25) for large batches.")
  }

  /** Bound AND materialize the candidate relation in one pass: the
    * `limit` means at most [[MaxRerankCandidates]]+1 rows are ever
    * computed or stored however pathological the input (the loud-guard
    * discipline of [[VectorSearch.requireBoundedBatch]]), the guard then
    * checks the MATERIALIZED count (≤ max ⇒ the limit didn't truncate, so
    * the checkpoint IS the full candidate set), and the returned relation
    * feeds the bucket probe, the broadcast, and any caller reuse — the
    * first-stage retriever executes exactly ONCE per rerank instead of
    * once per consumer (guard, bucket probe, join would otherwise each
    * re-run it). */
  private def boundedCandidates(candidates: DataFrame): DataFrame = {
    val cp = candidates.select(col("query_id"), col("nbr_id"))
      .limit(MaxRerankCandidates + 1).localCheckpoint(true)
    require(cp.count() <= MaxRerankCandidates,
      s"LateInteraction.maxSimRerank: candidate relation has > " +
        s"$MaxRerankCandidates rows; candidates are broadcast, so an " +
        "unbounded first stage is a memory blow-up, not a planned " +
        "degradation. Tighten the first-stage retriever's top-k (the " +
        "candidate count should be |queries| × a small per-query k).")
    cp
  }

  /** Windowed sparse multi-vector representation: one row per
    * (document, window, non-zero dim) — `(id, w, dim, val)` with each
    * window L2-normalized. A window whose term signs fully cancel on
    * every dim (zero vector) drops out entirely, on both engines, by the
    * `raw <> 0` filter — it can score nothing anyway. */
  def windowVectors(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = DefaultWindowTokens): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "term")))
      // pos ≥ 0 and far below 2^53, so floor(pos / W) is exact double math
      .select(col("id"), floor(col("pos") / windowTokens).as("w"),
        md5(col("term")).as("md5hex"))
    val raw = toks
      .select(col("id"), col("w"), EmbedJob.termDim(col("md5hex")).as("dim"),
        EmbedJob.termSign(col("md5hex")).as("sign"))
      .groupBy("id", "w", "dim").agg(sum(col("sign")).as("raw"))
    val norms = raw.groupBy("id", "w")
      .agg(sqrt(sum(col("raw") * col("raw"))).as("nrm"))
    raw.join(norms, Seq("id", "w"))
      .where(col("raw") =!= 0.0)
      .select(col("id"), col("w"), col("dim"),
        round(col("raw") / col("nrm"), VectorSearch.ScoreDecimals).as("val"))
  }

  private def queryWindows(queries: DataFrame, qIdCol: String,
      qTextCol: String, windowTokens: Int): DataFrame =
    broadcast(
      windowVectors(queries.select(col(qIdCol), col(qTextCol)),
          qIdCol, qTextCol, windowTokens)
        .select(col("id").as("query_id"), col("w").as("__qw"),
          col("dim"), col("val").as("__qval")))

  private def corpusWindows(corpus: DataFrame, cIdCol: String,
      cTextCol: String, windowTokens: Int): DataFrame =
    windowVectors(corpus.select(col(cIdCol), col(cTextCol)),
        cIdCol, cTextCol, windowTokens)
      .select(col("id").as("nbr_id"), col("w").as("__dw"),
        col("dim"), col("val").as("__dval"))

  /** The corpus window relation read FROM a persisted index
    * ([[graft.index.IndexStore.loadWindows]]) instead of re-derived from
    * text — the production daily-retrieval shape: the per-run cost drops
    * from three shuffles over every corpus token to one columnar scan of
    * (id, w, dim, val). `windows` is the index relation, possibly already
    * bucket-pruned by the caller. */
  private def corpusWindowsFromIndex(windows: DataFrame): DataFrame =
    windows.select(col("id").as("nbr_id"), col("w").as("__dw"),
      col("dim"), col("val").as("__dval"))

  /** The maxsim algebra over an already-joined window-pair relation
    * (query_id, __qw, nbr_id, __dw, __qval, __dval): dot per window pair
    * (unit vectors → the dot over shared dims IS the cosine; pairs with
    * no shared dim are absent, and the greatest(·, 0) floor makes absence
    * and zero coincide) → each query window's best doc window floored at
    * 0 (a window pair that only disagrees contributes no evidence) →
    * exact integer micro-unit sum (order-independent, one trailing
    * correctly-rounded division — the cross-engine-sum pattern) →
    * bounded-state top-k. */
  private def rankMaxSim(pairRows: DataFrame, k: Int): DataFrame = {
    val pairSim = pairRows
      .where(col("nbr_id") =!= col("query_id"))
      .groupBy("query_id", "__qw", "nbr_id", "__dw")
      .agg(round(sum(col("__qval") * col("__dval")),
        VectorSearch.ScoreDecimals).as("__sim"))
    val best = pairSim
      .groupBy("query_id", "__qw", "nbr_id")
      .agg(greatest(max(col("__sim")), lit(0.0)).as("__m"))
    val scored = best
      .groupBy("query_id", "nbr_id")
      .agg((sum(round(col("__m") * 1e6).cast("long")).cast("double") / 1e6)
        .as("sim"))
    VectorSearch.topKScored(scored, k)
  }

  /** EXHAUSTIVE batch late-interaction retrieval: top-k corpus documents
    * per query document under the maxsim score, every document scored.
    * Self-pairs are excluded (the batch is typically a corpus slice);
    * output is (query_id, nbr_id, sim, rank), rank 1 = best, ties broken
    * nbr_id ASC inside the bounded-state aggregator. A query whose
    * windows share no dim with any corpus window is absent from the
    * output (nothing to rank), matching the oracle's inner join.
    *
    * ORACLE-BASELINE, not the scale path: the dim equi-join's key has
    * only `dim`-many distinct values (64 here), so each corpus window row
    * fans out to ~|batch windows|/dims query rows — the pre-aggregation
    * relation is |corpus windows| × |batch windows| / dims and grows
    * LINEARLY IN THE BATCH with a big constant (measured: a 515-doc batch
    * over 50k docs ≈ 1.1e9 intermediate rows). Exhaustive maxsim over
    * everything is exactly what ColBERT-style systems avoid; production
    * routes through [[maxSimRerank]] (first-stage retrieval bounds the
    * candidate set, maxsim re-scores candidates exactly). This form
    * exists to pin the semantics — point it at small batches
    * ([[MaxExhaustiveBatch]] enforced). */
  def maxSimJoin(queries: DataFrame, qIdCol: String, qTextCol: String,
      corpus: DataFrame, cIdCol: String, cTextCol: String,
      k: Int, windowTokens: Int = DefaultWindowTokens): DataFrame = {
    requireExhaustiveBatch(queries)
    val qw = queryWindows(queries, qIdCol, qTextCol, windowTokens)
    val dw = corpusWindows(corpus, cIdCol, cTextCol, windowTokens)
    rankMaxSim(dw.join(qw, "dim"), k)
  }

  /** [[maxSimJoin]] against a PERSISTED window index: identical semantics
    * and guards, but the corpus side is the loaded (id, w, dim, val)
    * relation — no per-run corpus window rebuild. The window width is the
    * index's DDL, so queries window at `index.windowTokens` by
    * construction. */
  def maxSimJoin(queries: DataFrame, qIdCol: String, qTextCol: String,
      index: graft.index.IndexStore.WindowIndex, k: Int): DataFrame = {
    requireExhaustiveBatch(queries)
    val qw = queryWindows(queries, qIdCol, qTextCol, index.windowTokens)
    rankMaxSim(corpusWindowsFromIndex(index.windows).join(qw, "dim"), k)
  }

  /** The PRODUCTION late-interaction shape — retrieve-then-rerank, the
    * two-stage architecture ColBERT systems deploy: a first-stage
    * retriever supplies `candidates` (query_id, nbr_id) — pooled-vector
    * ANN, BM25, a hybrid — and maxsim re-scores exactly those pairs. The
    * corpus window relation is first semi-joined down to candidate
    * documents, and the window join adds `query_id` to the join key, so
    * the pre-aggregation relation is |candidate pairs| × (window pairs
    * per doc pair / dims) — flat in corpus size and free of the
    * [[maxSimJoin]] batch-windows fan-out. Scoring semantics (and the
    * absent-pair contract: a candidate pair whose windows share no dim
    * produces no row) are identical to [[maxSimJoin]]; only the scored
    * set differs.
    *
    * ID-SPACE CONTRACT: query ids and corpus ids must live in ONE id
    * space (the batch is a corpus slice, the standard shape here — the
    * candidates relation already implies it by naming both sides).
    * Self-pairs (query_id == nbr_id) are excluded from scoring exactly
    * as in [[maxSimJoin]]; a caller whose query and corpus ids are
    * unrelated relations that merely collide numerically must remap ids
    * first, or the colliding candidate pair is silently skipped. */
  def maxSimRerank(queries: DataFrame, qIdCol: String, qTextCol: String,
      corpus: DataFrame, cIdCol: String, cTextCol: String,
      candidates: DataFrame, k: Int,
      windowTokens: Int = DefaultWindowTokens): DataFrame = {
    VectorSearch.requireBoundedBatch(queries, "LateInteraction.maxSimRerank")
    val cand0 = boundedCandidates(candidates)
    val qw = queryWindows(queries, qIdCol, qTextCol, windowTokens)
    val cand = broadcast(cand0.distinct())
    val dw = corpusWindows(corpus, cIdCol, cTextCol, windowTokens)
    rankMaxSim(dw.join(cand, Seq("nbr_id")).join(qw, Seq("query_id", "dim")), k)
  }

  /** [[maxSimRerank]] against a PERSISTED window index — the production
    * daily-retrieval plan: first-stage candidates bound the scored set,
    * and their doc ids' buckets PRUNE the index scan
    * ([[graft.index.IndexStore.windowBucket]] — the candidate set is
    * bounded and known up front, so the scan reads only the buckets
    * holding candidate documents instead of the corpus-sized window
    * table; the corpus text is never re-windowed). Semantics, guards, and
    * the ID-SPACE CONTRACT are identical to the text-derived form; the
    * window width comes from the index DDL. */
  def maxSimRerank(queries: DataFrame, qIdCol: String, qTextCol: String,
      index: graft.index.IndexStore.WindowIndex, candidates: DataFrame,
      k: Int): DataFrame = {
    VectorSearch.requireBoundedBatch(queries, "LateInteraction.maxSimRerank")
    val cand0 = boundedCandidates(candidates)
    val qw = queryWindows(queries, qIdCol, qTextCol, index.windowTokens)
    val cand = broadcast(cand0.distinct())
    // ≤ WindowBuckets rows off the MATERIALIZED candidates (the
    // containment-screen bucket-probe discipline — no retriever re-run)
    val buckets = cand0
      .select(graft.index.IndexStore.windowBucket(col("nbr_id")).as("b"))
      .distinct().collect().map(_.getLong(0))
    val pruned = index.windows.where(col("bucket").isin(buckets: _*))
    rankMaxSim(corpusWindowsFromIndex(pruned)
      .join(cand, Seq("nbr_id")).join(qw, Seq("query_id", "dim")), k)
  }

  /** The shared window-vector CTEs (toks → wt → rawv → norms → wvec) —
    * the SQL rendition of [[windowVectors]]. */
  private def sqlWindowCtes(docsTable: String, idExpr: String,
      textExpr: String, windowTokens: Int): String =
    s"""toks AS (
       |  SELECT $idExpr AS id,
       |         unnest(${Text.sqlTokens(textExpr)}) AS term,
       |         generate_subscripts(${Text.sqlTokens(textExpr)}, 1) - 1 AS pos
       |  FROM $docsTable
       |), wt AS (
       |  SELECT id, pos // $windowTokens AS w,
       |         ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
       |  FROM toks
       |), rawv AS (
       |  SELECT id, w, (h % 64)::INT AS dim,
       |         sum(CASE WHEN ((h >> 62) & 1) = 0 THEN 1.0 ELSE -1.0 END) AS raw
       |  FROM wt GROUP BY 1, 2, 3
       |), norms AS (
       |  SELECT id, w, sqrt(sum(raw * raw)) AS nrm FROM rawv GROUP BY 1, 2
       |), wvec AS (
       |  SELECT r.id, r.w, r.dim, round(r.raw / n.nrm, ${VectorSearch.ScoreDecimals}) AS val
       |  FROM rawv r JOIN norms n USING (id, w) WHERE r.raw <> 0.0
       |)""".stripMargin

  /** The maxsim tail (best → score → ranked → top-k) over a `pairsim`
    * CTE — the SQL rendition of [[rankMaxSim]]'s aggregations. */
  private def sqlMaxSimTail(k: Int): String =
    s""", best AS (
       |  SELECT query_id, qw, nbr_id, greatest(max(sim), 0.0) AS m
       |  FROM pairsim GROUP BY 1, 2, 3
       |), score AS (
       |  SELECT query_id, nbr_id,
       |         sum(round(m * 1e6)::BIGINT)::DOUBLE / 1e6 AS sim
       |  FROM best GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, nbr_id, sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sim DESC, nbr_id ASC)::INTEGER AS rank
       |  FROM score
       |)
       |SELECT query_id, nbr_id, sim, rank FROM ranked WHERE rank <= $k""".stripMargin

  /** DuckDB twin of [[maxSimJoin]] over one table: queries are the rows
    * satisfying `queryCond(id)`, corpus is the whole table. Every stage
    * mirrors the Spark plan's arithmetic exactly — same 6-decimal round
    * on window dots, same greatest-with-0 floor, same micro-unit integer
    * sum (cast off DuckDB's HUGEINT before the division). */
  def sqlMaxSimJoin(docsTable: String, idExpr: String, textExpr: String,
      queryCond: String => String, k: Int,
      windowTokens: Int = DefaultWindowTokens): String =
    s"""WITH ${sqlWindowCtes(docsTable, idExpr, textExpr, windowTokens)},
       |pairsim AS (
       |  SELECT q.id AS query_id, q.w AS qw, d.id AS nbr_id, d.w AS dw,
       |         round(sum(q.val * d.val), ${VectorSearch.ScoreDecimals}) AS sim
       |  FROM wvec q JOIN wvec d ON q.dim = d.dim AND d.id <> q.id
       |  WHERE ${queryCond("q.id")}
       |  GROUP BY 1, 2, 3, 4
       |)${sqlMaxSimTail(k)}""".stripMargin

  /** DuckDB twin of [[maxSimRerank]] over one table: `candSql` is any
    * query producing (query_id, nbr_id) candidate pairs — spliced in as a
    * CTE, exactly the relation the Spark side broadcasts. */
  def sqlMaxSimRerank(docsTable: String, idExpr: String, textExpr: String,
      candSql: String, k: Int,
      windowTokens: Int = DefaultWindowTokens): String =
    s"""WITH ${sqlWindowCtes(docsTable, idExpr, textExpr, windowTokens)},
       |cand AS (
       |  SELECT DISTINCT query_id, nbr_id FROM ($candSql)
       |), pairsim AS (
       |  SELECT q.id AS query_id, q.w AS qw, d.id AS nbr_id, d.w AS dw,
       |         round(sum(q.val * d.val), ${VectorSearch.ScoreDecimals}) AS sim
       |  FROM wvec q
       |  JOIN cand c ON c.query_id = q.id
       |  JOIN wvec d ON d.id = c.nbr_id AND d.dim = q.dim AND d.id <> q.id
       |  GROUP BY 1, 2, 3, 4
       |)${sqlMaxSimTail(k)}""".stripMargin
}
