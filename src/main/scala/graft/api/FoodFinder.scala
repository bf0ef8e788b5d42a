package graft.api

import graft.search.{ScoreFusion, TextSearch, VectorSearch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three search modes end-to-end — the parity façade over
  * `POST /api/search` (`backend/api.py:98-291`).
  *
  * Mode semantics (filter PLACEMENT differs per mode — SURVEY §4.1, the one
  * hand-rolled "optimization" in the reference that is actually semantics):
  *
  *   - vector  : filter BEFORE top-k (inside `$vectorSearch`) → always
  *               min(k, matching) rows;
  *   - hybrid  : vector branch pre-filtered AND fused result post-filtered
  *               (same predicate both places, `backend/api.py:178-180` +
  *               `238-239`); text branch never filtered; may return < k;
  *   - fulltext: post-filter after ranking (`backend/api.py:265-266`);
  *               may return < k.
  *
  * Generic over table shape: the reference hard-codes
  * `product_detail(_id, emb_description, title, …)`; here any DataFrame
  * with a unique id, a vector column and a text column works.
  */
object FoodFinder {
  val Modes = Set("vector", "hybrid", "fulltext")
  val DefaultLimit = 5

  /** A searchable table: `df` must expose unique `idCol`, an
    * `array<double>` `embCol` and a string `textCol`.
    *
    * Dimensionality is ENFORCED by default: Atlas always knows its index's
    * `numDimensions` (`indexes.py:64`) and errors on mismatched query
    * vectors, so every vector-consuming mode validates against
    * [[resolvedDim]] — the declared `dim` if given, else derived once per
    * table from a [[DimSampleRows]]-row sample (a bounded scan, not a full
    * pass; the lazy Spark job runs on first vector-mode use). Derivation
    * ASSUMES homogeneous vector lengths — the invariant every indexed table
    * honors by construction (`indexes.py:64` bakes one numDimensions into
    * the index) — and asserts it on the sample (min(size) == max(size)),
    * so a mixed-dim table fails loudly instead of enforcing whichever
    * length an arbitrary first row happened to have (partition-order
    * nondeterminism). Heterogeneity hiding beyond the sample is the
    * caller's contract to keep: declare `dim` explicitly to skip
    * derivation. `dim` stays an Option only so construction is free; there
    * is no opt-out of the check itself (SURVEY §7.4 risk 7). */
  final case class SearchTable(df: DataFrame, idCol: String, embCol: String,
      textCol: String, dim: Option[Int] = None) {
    lazy val resolvedDim: Option[Int] = dim.orElse {
      val r = df.where(col(embCol).isNotNull)
        .limit(FoodFinder.DimSampleRows)
        .agg(min(size(col(embCol))).as("lo"), max(size(col(embCol))).as("hi"))
        .collect().headOption.filter(!_.isNullAt(0))
      r.map { row =>
        val (lo, hi) = (row.getInt(0), row.getInt(1))
        require(lo == hi,
          s"embedding column '$embCol' has heterogeneous dimensions " +
            s"($lo..$hi within a ${FoodFinder.DimSampleRows}-row sample); " +
            "an index has exactly one numDimensions — fix the table or " +
            "declare SearchTable(dim = ...) explicitly")
        lo
      }
    }
  }

  /** Rows sampled when deriving [[SearchTable.resolvedDim]]: enough to
    * catch mixed-dim tables in practice, bounded so the derivation job
    * never scans a 100 TB corpus. */
  val DimSampleRows = 10000

  /** R18 request validation: mode whitelist, required args, limit clamp
    * (`backend/api.py:100-137`). Returns the clamped limit. */
  def validate(mode: String, description: Option[String], title: Option[String],
      limit: Int): Int = {
    require(Modes.contains(mode), s"mode must be one of $Modes, got '$mode'")
    if (mode == "vector" || mode == "hybrid")
      require(description.exists(_.trim.nonEmpty), s"'description' is required for $mode search")
    if (mode == "hybrid" || mode == "fulltext")
      require(title.exists(_.trim.nonEmpty), s"'title' is required for $mode search")
    VectorSearch.clampLimit(limit)
  }

  /** Vector mode: pre-filter → exact top-k → (id, score). */
  def vector(tbl: SearchTable, queryVec: Array[Double], k: Int,
      filter: Option[Column] = None, metric: String = "cosine"): DataFrame = {
    tbl.resolvedDim.foreach(d => require(queryVec.length == d,
      s"query vector dimension ${queryVec.length} != index dimension $d"))
    VectorSearch.knn(tbl.df, tbl.idCol, tbl.embCol, queryVec, k, metric, filter)
      .select(col(tbl.idCol).as("id"), col("score"))
  }

  /** Fulltext mode: rank all matches → post-filter → limit → (id, score).
    * The post-filter predicate is evaluated against `tbl.df` columns via a
    * join back on id (the reference's `$match` sees the full document).
    * Pass a prebuilt `index` (the reference's offline DDL lifecycle,
    * `indexes.py`) to avoid rebuilding corpus statistics per query. */
  def fulltext(tbl: SearchTable, queryText: String, k: Int,
      filter: Option[Column] = None,
      index: Option[TextSearch.Bm25Index] = None): DataFrame = {
    val ranked = TextSearch.search(
      index.getOrElse(TextSearch.buildIndex(tbl.df, tbl.idCol, tbl.textCol)), queryText)
    postFilterLimit(tbl, ranked, filter, k)
  }

  /** Hybrid mode: sigmoid-fused vector(pre-filtered, top-k) + fulltext(all),
    * post-filter, limit. Returns (id, score, vec_norm, vec_raw, txt_norm,
    * txt_raw) — the flattened scoreDetails (R13). With
    * `nestedDetails = true` a `scoreDetails` struct column in the
    * reference's exact nested shape is appended
    * ([[ScoreFusion.nestScoreDetails]]); flattened columns stay for
    * hash-comparable oracles. */
  def hybrid(tbl: SearchTable, queryVec: Array[Double], queryText: String, k: Int,
      filter: Option[Column] = None, metric: String = "cosine",
      index: Option[TextSearch.Bm25Index] = None,
      nestedDetails: Boolean = false): DataFrame = {
    val vecBranch = vector(tbl, queryVec, k, filter, metric)
    val txtBranch = TextSearch.search(
      index.getOrElse(TextSearch.buildIndex(tbl.df, tbl.idCol, tbl.textCol)), queryText)
    val fused = postFilterLimit(tbl, ScoreFusion.fuse(vecBranch, txtBranch), filter, k)
    if (nestedDetails) ScoreFusion.nestScoreDetails(fused) else fused
  }

  /** Hybrid mode with RANK fusion ([[ScoreFusion.rrf]]) instead of score
    * fusion — the `$rankFusion` rendition of [[hybrid]]: same branch
    * construction (pre-filtered vector top-k + unfiltered full-text), same
    * post-filter + trailing-limit placement (SURVEY §4.1), only the
    * combination rule differs. Returns (id, score, vec_rank, txt_rank). */
  def hybridRankFusion(tbl: SearchTable, queryVec: Array[Double], queryText: String, k: Int,
      filter: Option[Column] = None, metric: String = "cosine",
      index: Option[TextSearch.Bm25Index] = None): DataFrame = {
    val vecBranch = vector(tbl, queryVec, k, filter, metric)
    val txtBranch = TextSearch.search(
      index.getOrElse(TextSearch.buildIndex(tbl.df, tbl.idCol, tbl.textCol)), queryText)
    postFilterLimit(tbl, ScoreFusion.rrf(vecBranch, txtBranch), filter, k)
  }

  /** R15 result sanitization (`backend/api.py:53-81`): ids as strings,
    * scores as doubles, the whole row as a plain-JSON column — the shape
    * the reference's API layer emits. */
  def sanitize(results: DataFrame): DataFrame = {
    val cols = results.columns.map {
      case "id" => col("id").cast("string").as("id")
      case c if c == "score" || c.endsWith("_norm") || c.endsWith("_raw") =>
        col(c).cast("double").as(c)
      case c => col(c)
    }
    val projected = results.select(cols.toIndexedSeq: _*)
    projected.withColumn("json", to_json(struct(projected.columns.map(col).toIndexedSeq: _*)))
  }

  /** `$match` after ranking + trailing `$limit` — order preserved exactly
    * (a filter must NOT be pushed below the fusion/ranking, and Catalyst
    * won't: the join keeps it above). */
  private def postFilterLimit(tbl: SearchTable, ranked: DataFrame,
      filter: Option[Column], k: Int): DataFrame = {
    val filtered = filter match {
      case None => ranked
      case Some(pred) =>
        // semi-join against the ids that survive the predicate; broadcast
        // the ranked side (≤ matched docs) at scale, not the base table
        val surviving = tbl.df.where(pred).select(col(tbl.idCol).as("id"))
        ranked.join(surviving, "id")
    }
    filtered.orderBy(col("score").desc, col("id").asc).limit(k)
  }
}
