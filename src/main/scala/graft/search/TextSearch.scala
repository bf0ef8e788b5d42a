package graft.search

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text search — the Spark rendition of the reference's
  * `$search.text` stage (`backend/api.py:256-263`), whose Lucene index is
  * declared in `indexes.py:73-88` (field `title`, dynamic:false).
  *
  * The Lucene inverted index becomes two side tables (reference S6):
  *
  *   - `postings(id, term, tf, dl)` — per (document, term) frequency with
  *     the document length denormalized in, so scoring needs no second join;
  *   - `termDf(term, df)` — document frequency per term;
  *
  * plus two scalars (`numDocs`, `avgdl`) fixed at index-build time.
  *
  * Scale shape: the index build is one explode + two hash aggregations
  * (map-side partial combine applies to both). At 100 TB the postings table
  * is written bucketed/partitioned by `term` so a query's
  * `WHERE term IN (...)` prunes to the touched buckets; `termDf` is tiny
  * (vocabulary-sized) and always broadcast. A query then scans only the
  * postings of its 3–10 terms — no full-corpus pass — and the final
  * `ORDER BY score LIMIT k` is a TakeOrderedAndProject.
  *
  * Scoring (documented semantics, frozen — SURVEY §7.4 risk 1):
  * classic BM25 with Lucene's idf,
  *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   contrib(t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with k1 = 1.2, b = 0.75 (Lucene defaults). Query terms are distinct.
  */
object TextSearch {
  val K1 = 1.2
  val B = 0.75
  val ScoreDecimals = 6

  /** Bucket count of the persisted postings layout (IndexStore); bucket =
    * pmod(hash60(term), TermBuckets), computable on the driver for pruning. */
  val TermBuckets = 64

  def termBucket(term: String): Long =
    math.floorMod(Text.hash60Local(term), TermBuckets.toLong)

  /** Inverted-index side tables (reference S6 DDL → batch build job). */
  final case class Bm25Index(postings: DataFrame, termDf: DataFrame, numDocs: Long, avgdl: Double)

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Bm25Index =
    buildIndex(docs, idCol, textCol, Text.SplitRe)

  /** [[buildIndex]] under an explicit token alphabet (e.g.
    * [[Text.UnicodeSplitRe]] for a multilingual corpus — the frozen
    * default indexes non-Latin documents as EMPTY). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      splitRe: String): Bm25Index =
    buildIndex(docs, idCol, textCol, Text.Tokenizer(splitRe))

  /** [[buildIndex]] under a full [[Text.Tokenizer]] contract —
    * [[Text.MultilingualTokenizer]] adds NFC normalization and CJK
    * bigram expansion on top of the Unicode alphabet (without the
    * bigrams, an ideograph run is ONE token and a two-character Han
    * query can never match inside a longer run). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      tok: Text.Tokenizer): Bm25Index = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tok(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val postings = tf.join(dl, "id")
    val termDf = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // numDocs counts docs with ≥1 token == docs that can ever match;
    // avgdl over the same set (exact integer ratio, oracle-reproducible).
    val statsRow = dl.agg(count(lit(1)), avg(col("dl"))).head()
    val n = statsRow.getLong(0)
    Bm25Index(postings, termDf, n, if (n == 0) 0.0 else statsRow.getDouble(1))
  }

  def queryTerms(queryText: String): Seq[String] =
    queryTerms(queryText, Text.SplitRe)

  /** [[queryTerms]] under an explicit token alphabet (ROOT-locale
    * lowercase — the engine-side `lower` is locale-independent too). */
  def queryTerms(queryText: String, splitRe: String): Seq[String] =
    queryTerms(queryText, Text.Tokenizer(splitRe))

  /** [[queryTerms]] under a full [[Text.Tokenizer]] contract. */
  def queryTerms(queryText: String, tok: Text.Tokenizer): Seq[String] =
    tok.local(queryText).distinct

  /** Scored matches (id, score). With a finite `k`: ranked score DESC,
    * id ASC, top k (a TakeOrderedAndProject — no full sort). With
    * `k = Int.MaxValue` = unlimited (the reference's `$search` stage has no
    * internal limit — trailing `$limit` is a separate stage) the relation
    * comes back UNRANKED: every caller of the unlimited form re-ranks after
    * post-filtering/fusion anyway ([[graft.api.FoodFinder]],
    * [[ScoreFusion.fuse]]), so an internal global sort would be a dead
    * Sort+Exchange in the plan. */
  def search(index: Bm25Index, queryText: String, k: Int = Int.MaxValue): DataFrame =
    search(index, queryText, k, Text.SplitRe)

  /** [[search]] under an explicit token alphabet — must match the one the
    * index was built with (a Unicode query against a frozen-alphabet
    * index finds nothing, and vice versa). */
  def search(index: Bm25Index, queryText: String, k: Int,
      splitRe: String): DataFrame =
    search(index, queryText, k, Text.Tokenizer(splitRe))

  /** [[search]] under a full [[Text.Tokenizer]] contract (must match the
    * index build's). */
  def search(index: Bm25Index, queryText: String, k: Int,
      tok: Text.Tokenizer): DataFrame = {
    val terms = queryTerms(queryText, tok)
    if (terms.isEmpty)
      return index.postings.select(col("id"), lit(0.0).as("score")).where(lit(false))
    // a persisted index exposes the bucket partition column — pruning it
    // driver-side turns the postings scan into only the touched buckets
    val postings =
      if (index.postings.columns.contains("bucket"))
        index.postings.where(col("bucket").isin(terms.map(termBucket): _*)).drop("bucket")
      else index.postings
    val matched = postings
      .where(col("term").isin(terms: _*))
      .join(broadcast(index.termDf.where(col("term").isin(terms: _*))), "term")
    val idf = log(lit(1.0) + (lit(index.numDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(index.avgdl)))
    val scored = matched
      .withColumn("contrib", contrib)
      .groupBy("id")
      .agg(round(sum(col("contrib")), ScoreDecimals).as("score"))
    if (k == Int.MaxValue) scored
    else scored.orderBy(col("score").desc, col("id").asc).limit(k)
  }

  /** End-to-end convenience: build + search over a raw document table. */
  def fullTextSearch(docs: DataFrame, idCol: String, textCol: String,
      queryText: String, k: Int = Int.MaxValue): DataFrame =
    search(buildIndex(docs, idCol, textCol), queryText, k)

  /** Batch BM25 JOIN: top-k matches for EVERY query row — the full-text
    * twin of [[VectorSearch.knnJoin]] (batch retrieval: a RAG pipeline
    * resolving a batch of text queries against a 100 TB corpus in one job,
    * instead of |batch| driver-side [[search]] calls each paying its own
    * scan).
    *
    * Scale shape: query texts are tokenized into a (query_id, term)
    * relation — bounded by [[VectorSearch.requireBoundedBatch]], so it
    * BROADCASTS — and the postings table joins it on `term`: each postings
    * partition emits only rows whose term some query mentions, work ∝
    * matched postings, zero shuffle of the corpus-sized postings side. On a
    * persisted index the touched term-hash buckets are collected from the
    * (bounded) batch first, so the scan statically prunes to those bucket
    * directories — the batch rendition of [[search]]'s driver-side `isin`
    * pruning. Per-query scoring is one (query_id, id) hash aggregation
    * (map-side combinable sum) and the per-query top-k is
    * [[VectorSearch.TopKByScore]]'s bounded-state aggregation — ≤ k rows
    * per map task per query reach the shuffle, never a rank window's full
    * match list.
    *
    * Query terms are DISTINCT per query (the [[search]]/[[queryTerms]]
    * contract). Scores round to [[ScoreDecimals]] before ranking
    * (tie-break id ASC) so the DuckDB oracle's boundary agrees.
    *
    * Output: (query_id, id, score, rank ≤ k). */
  def bm25Join(index: Bm25Index, queries: DataFrame,
      qIdCol: String, qTextCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    VectorSearch.requireBoundedBatch(queries, "bm25Join")
    val qterms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(Text.tokens(col(qTextCol)))).as("term"))
    val postings =
      if (index.postings.columns.contains("bucket")) {
        val touched = qterms
          .select(pmod(Text.hash60(col("term")), lit(TermBuckets.toLong)).as("b"))
          .distinct().collect().map(_.getLong(0))
        index.postings.where(col("bucket").isin(touched: _*)).drop("bucket")
      } else index.postings
    // termDf is vocabulary-sized (one row per distinct corpus term) —
    // broadcast only the rows for terms the batch actually uses, the
    // same discipline as search()'s isin-filtered broadcast. A semi-join
    // against the (bounded) qterms keeps this fully relational.
    val touchedDf = index.termDf.join(
      qterms.select("term").distinct(), "term")
    val matched = postings
      .join(broadcast(qterms), "term")
      .join(broadcast(touchedDf), "term")
    val idf = log(lit(1.0) + (lit(index.numDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(index.avgdl)))
    val scored = matched
      .withColumn("contrib", contrib)
      .groupBy("query_id", "id")
      .agg(round(sum(col("contrib")), ScoreDecimals).as("score"))
    val topk = udaf(new VectorSearch.TopKByScore(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    scored
      .groupBy("query_id")
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry._2").as("id"),
        col("entry._1").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** DuckDB rendition of [[bm25Join]]: `queriesRel` must be a relation
    * exposing (query_id, qtext). Composes the [[oracleCtes]] statistics with
    * a per-query term list and a per-query rank window. */
  def sqlBm25Join(docsTable: String, idExpr: String, textExpr: String,
      queriesRel: String, k: Int): String =
    s"""WITH toks AS (
       |  SELECT $idExpr AS id, unnest(${Text.sqlTokens(textExpr)}) AS term FROM $docsTable
       |), tf AS (
       |  SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2
       |), dl AS (
       |  SELECT id, count(*) AS dl FROM toks GROUP BY 1
       |), bstats AS (
       |  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
       |), df AS (
       |  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
       |), q AS ($queriesRel
       |), qterm AS (
       |  SELECT DISTINCT query_id, unnest(${Text.sqlTokens("qtext")}) AS term FROM q
       |), contrib AS (
       |  SELECT qterm.query_id, tf.id,
       |         ln(1.0 + (bstats.n - df.df + 0.5) / (df.df + 0.5))
       |           * (tf.tf * ${K1 + 1.0}) / (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / bstats.avgdl)) AS c
       |  FROM tf JOIN qterm USING (term) JOIN df USING (term) JOIN dl USING (id)
       |  CROSS JOIN bstats
       |), scored AS (
       |  SELECT query_id, id, round(sum(c), $ScoreDecimals) AS score
       |  FROM contrib GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, id ASC)::INTEGER AS rank
       |  FROM scored
       |)
       |SELECT query_id, id, score, rank FROM ranked WHERE rank <= $k""".stripMargin

  /** DuckDB CTE block for the same computation (shares the frozen tokenizer
    * and constants), ending in a `bm25(id, score)` relation — unranked, so
    * callers compose post-filters / fusion / limits around it exactly like
    * the Spark side does. Paste after `WITH `. */
  def oracleCtes(docsTable: String, idExpr: String, textExpr: String,
      queryText: String): String =
    oracleCtes(docsTable, idExpr, textExpr, queryText, Text.SplitRe)

  /** [[oracleCtes]] under an explicit token alphabet (must match the
    * alphabet the Spark-side [[buildIndex]] was given). */
  def oracleCtes(docsTable: String, idExpr: String, textExpr: String,
      queryText: String, splitRe: String): String =
    oracleCtes(docsTable, idExpr, textExpr, queryText,
      Text.Tokenizer(splitRe))

  /** [[oracleCtes]] under a full [[Text.Tokenizer]] contract. */
  def oracleCtes(docsTable: String, idExpr: String, textExpr: String,
      queryText: String, tok: Text.Tokenizer): String = {
    val terms = queryTerms(queryText, tok).map(t => s"'$t'").mkString(", ")
    s"""toks AS (
       |  SELECT $idExpr AS id, unnest(${tok.sql(textExpr)}) AS term FROM $docsTable
       |), tf AS (
       |  SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2
       |), dl AS (
       |  SELECT id, count(*) AS dl FROM toks GROUP BY 1
       |), bstats AS (
       |  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
       |), df AS (
       |  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
       |), contrib AS (
       |  SELECT tf.id,
       |         ln(1.0 + (bstats.n - df.df + 0.5) / (df.df + 0.5))
       |           * (tf.tf * ${K1 + 1.0}) / (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / bstats.avgdl)) AS c
       |  FROM tf JOIN df USING (term) JOIN dl USING (id) CROSS JOIN bstats
       |  WHERE tf.term IN ($terms)
       |), bm25 AS (
       |  SELECT id, round(sum(c), $ScoreDecimals) AS score FROM contrib GROUP BY 1
       |)""".stripMargin
  }

  /** EXACT token-phrase locate — distributed grep: every (doc, token
    * position) where the corpus contains `phrase` verbatim. BM25 ranks by
    * term overlap; this is the other text-search primitive, the one
    * contamination forensics / span provenance / quote attribution need
    * (WHICH doc, WHERE exactly), with exactness Lucene's scored retrieval
    * does not promise.
    *
    * `phrase` is a ONE-ROW relation with column `p` (array<string>, the
    * tokenized phrase, ≥ `k` tokens) — relational on purpose: the
    * declared query derives it from the corpus itself, both engines
    * tokenize with the same frozen rule, and no driver-side tokenizer
    * can drift from the engine's.
    *
    * Plan shape (the 100 TB contract): positional grams stream out of a
    * narrow codegen'd scan ([[graft.dedup.SubstringDedup.gramPostings]]),
    * are prefiltered by ONE broadcast hash — the 60-bit hash of the
    * phrase's first `k` tokens kills ~everything before any join — and
    * only the surviving (id, pos) candidates join the corpus tokens for
    * the exact slice comparison, pruned to candidate docs by a broadcast
    * semi-join. No shuffle touches the corpus; a 2⁻⁶⁰ hash collision is
    * removed by the exact verify, so the output is exact, not
    * probabilistic. The persisted gram-hash index
    * ([[graft.index.IndexStore.GramIndex]]) can pre-screen EXISTENCE
    * (skip the scan entirely when the first gram is absent) — membership
    * is all it stores; the locate itself is this scan. */
  def phraseOccurrences(docs: DataFrame, idCol: String, textCol: String,
      phrase: DataFrame,
      k: Int = graft.dedup.SubstringDedup.DefaultGramTokens,
      splitRe: String = Text.SplitRe): DataFrame = {
    require(phrase.columns.contains("p"),
      "phrase must be a one-row relation with column `p` (array<string>)")
    // loud, not silently empty: a phrase shorter than the gram width has
    // no valid prefilter key (its k-token prefix hash can never match a
    // corpus gram), which would read as "no occurrences" — a lie
    val sizes = phrase.select(size(col("p"))).collect()
    require(sizes.nonEmpty, "phrase relation is empty — expected one row")
    // loud, not silently wrong: a multi-row phrase relation would pass the
    // first-row guards and silently cross-join every row against the gram
    // scan, unioning/multiplying results — the batch contract is
    // [[phrasesOccurrences]], which keys every output row by phrase_id
    require(sizes.length == 1,
      s"phrase relation has ${sizes.length} rows — the contract is ONE " +
        "phrase; for a batch of phrases use phrasesOccurrences")
    require(sizes.head.getInt(0) >= k,
      s"phrase has ${sizes.head.getInt(0)} tokens; the gram prefilter " +
        s"needs ≥ $k (the gram width) — widen the phrase or lower k")
    // the broadcast prefilter key: hash of the phrase's first k tokens,
    // computed IN-ENGINE with the same hash the gram scan uses
    val key = phrase.select(
      Text.hash60(concat_ws(" ", slice(col("p"), 1, k))).as("__ph"),
      col("p").as("__p"))
    val cands = graft.dedup.SubstringDedup.gramPostings(docs, idCol,
        textCol, k, splitRe)
      .join(broadcast(key), col("h") === col("__ph"))
    val toks = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol), splitRe).as("__toks"))
    cands
      .join(toks, "id")
      .where(size(col("__p")) >= k &&
        slice(col("__toks"), col("pos") + 1, size(col("__p"))) === col("__p"))
      .select(col("id"), col("pos"))
  }

  /** [[phraseOccurrences]] behind the persisted gram-hash MEMBERSHIP index
    * ([[graft.index.IndexStore.GramIndex]]): the phrase's prefilter key is
    * probed against ONE bucket partition of the index (~8 B/distinct gram,
    * partition-pruned by the bucket literal) and the corpus scan runs ONLY
    * if the gram exists — an absent phrase costs one narrow bucket read,
    * never a 100 TB pass. Present phrases pay the index probe plus the
    * exact locate; the result is identical to [[phraseOccurrences]] by
    * construction (membership can only veto, never add). The index must
    * have been built at the same gram width (its DDL, checked loudly). */
  def phraseOccurrencesScreened(index: graft.index.IndexStore.GramIndex,
      docs: DataFrame, idCol: String, textCol: String,
      phrase: DataFrame): DataFrame = {
    val k = index.k
    require(phrase.columns.contains("p"),
      "phrase must be a one-row relation with column `p` (array<string>)")
    // one tiny collect: the phrase row (the IVF centroid-probe posture —
    // driver-side routing state, bounded by construction)
    val rows = phrase
      .select(Text.hash60(concat_ws(" ", slice(col("p"), 1, k))).as("ph"),
        size(col("p")).as("n"))
      .collect()
    require(rows.nonEmpty, "phrase relation is empty — expected one row")
    require(rows.length == 1,
      s"phrase relation has ${rows.length} rows — the contract is ONE " +
        "phrase; for a batch of phrases use phrasesOccurrences")
    require(rows.head.getInt(1) >= k,
      s"phrase has ${rows.head.getInt(1)} tokens; the index gram width " +
        s"is $k — widen the phrase or rebuild the index narrower")
    val ph = rows.head.getLong(0)
    val bucket = math.floorMod(ph, graft.dedup.Dedup.ShingleBuckets.toLong)
    // single-bucket membership probe (PartitionFilters prune to bucket=B)
    val present = index.hashes
      .where(col("bucket") === bucket && col("h") === ph)
      .limit(1).count() == 1L
    if (present) phraseOccurrences(docs, idCol, textCol, phrase, k)
    else
      // empty result with the exact (id, pos) schema, id typed from docs
      docs.select(col(idCol).as("id"))
        .withColumn("pos", lit(0).cast("int"))
        .where(lit(false))
  }

  /** [[phraseOccurrences]] over the POSITIONAL phrase index
    * ([[graft.index.IndexStore.PhraseIndex]]) — the no-corpus-scan
    * lookup: for an n-token phrase (n ≥ k) the m = n−k+1 consecutive
    * gram hashes are computed DRIVER-side (the [[termBucket]] posture —
    * [[Text.hash60Local]] is the same hash the index writer used), each
    * probes ONE bucket partition of the postings (PartitionFilters prune
    * to its literal bucket), and a candidate is a (doc, base position)
    * where ALL m offset-aligned grams matched — one groupBy-count
    * intersection, no join chain, no corpus pass. The corpus text is
    * opened only to exact-verify the candidates' docs (removing 2⁻⁶⁰
    * hash collisions), pruned by a broadcast semi-join — at 100 TB a
    * phrase lookup reads a few bucket partitions plus the candidate
    * docs, nothing else. Output identical to [[phraseOccurrences]].
    *
    * `phraseTokens` must be ENGINE-TOKENIZED output ([[Text.tokens]] —
    * lowercase, split on non-alphanumerics): the index hashed engine
    * tokens, so a raw/cased phrase would silently miss. The declared
    * query collects its phrase THROUGH the engine tokenizer for exactly
    * this reason. */
  def phraseOccurrencesIndexed(index: graft.index.IndexStore.PhraseIndex,
      docs: DataFrame, idCol: String, textCol: String,
      phraseTokens: Seq[String]): DataFrame = {
    val k = index.k
    require(phraseTokens.size >= k,
      s"phrase has ${phraseTokens.size} tokens; the index gram width is " +
        s"$k — widen the phrase or rebuild the index narrower")
    val buckets = graft.dedup.Dedup.ShingleBuckets.toLong
    val m = phraseTokens.size - k + 1
    val probes = (0 until m).map { off =>
      val h = Text.hash60Local(phraseTokens.slice(off, off + k).mkString(" "))
      index.postings
        .where(col("bucket") === math.floorMod(h, buckets) && col("h") === h)
        .select(col("id"), (col("pos") - off).as("base"), lit(off).as("__off"))
    }.reduce(_ unionByName _)
    // count DISTINCT offsets, not rows: a doc re-ingested under a NEW
    // batch id (source replay, checkpoint reset) is double-indexed —
    // appendBatchPhrase's idempotence is keyed by batchId only — so a
    // probe can emit one row per copy, and a plain count(m) would skip
    // true occurrences (false negatives in an operator documented as
    // exact). Distinct-offset counting makes duplicate postings harmless
    // like the grams family's membership semantics; the exact slice
    // verify below still removes any hash-collision false positives.
    val cands = probes.groupBy("id", "base")
      .agg(countDistinct(col("__off")).as("__hits"))
      .where(col("__hits") === m)
      .select(col("id"), col("base").as("pos"))
    val toks = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("__toks"))
    val pLit = array(phraseTokens.map(lit): _*)
    cands.join(toks, "id")
      .where(slice(col("__toks"), col("pos") + 1,
        lit(phraseTokens.size)) === pLit)
      .select(col("id"), col("pos").cast("int").as("pos"))
  }

  /** BATCH exact phrase locate — the [[bm25Join]] posture applied to
    * [[phraseOccurrences]]: every (phrase, doc, token position) where the
    * corpus contains that phrase verbatim, for a BOUNDED batch of phrases
    * in ONE corpus scan. Contamination forensics / quote attribution holds
    * thousands of suspect strings; without this the driver loops
    * [[phraseOccurrences]] — |batch| corpus-scan jobs instead of one
    * (round-8 verdict gap 2).
    *
    * `phrases` is a (phrase_id, p) relation, `p` the ENGINE-tokenized
    * phrase (array<string>, every row ≥ `k` tokens — checked loudly, a
    * short phrase has no valid prefilter key and would read as "no
    * occurrences"). The batch is bounded
    * ([[VectorSearch.requireBoundedBatch]]) and BROADCAST: positional
    * grams stream out of the same narrow corpus scan as the single-phrase
    * path, the broadcast hash of every phrase's first-`k`-token prefix
    * kills ~everything before any join, and only surviving (phrase_id,
    * id, pos) candidates join the corpus tokens for the exact slice
    * verify. No shuffle touches the corpus; work ∝ matched candidates,
    * not |batch| × corpus.
    *
    * Output: (phrase_id, id, pos) — exact, 2⁻⁶⁰ prefix-hash collisions
    * removed by the slice comparison. */
  def phrasesOccurrences(docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame,
      k: Int = graft.dedup.SubstringDedup.DefaultGramTokens,
      splitRe: String = Text.SplitRe): DataFrame = {
    require(phrases.columns.contains("phrase_id") &&
        phrases.columns.contains("p"),
      "phrases must be a (phrase_id, p) relation with p = array<string>")
    VectorSearch.requireBoundedBatch(phrases, "phrasesOccurrences")
    // loud, not silently empty — the one-row path's gram-width contract,
    // enforced over the whole batch with one early-stopped probe
    val short = phrases.where(size(col("p")) < k).limit(1).count()
    require(short == 0L,
      s"phrases batch contains a phrase shorter than the gram width $k — " +
        "its prefix hash can never match a corpus gram; widen the " +
        "phrases or lower k")
    val keys = phrases.select(col("phrase_id"),
      Text.hash60(concat_ws(" ", slice(col("p"), 1, k))).as("__ph"),
      col("p").as("__p"))
    val cands = graft.dedup.SubstringDedup.gramPostings(docs, idCol,
        textCol, k, splitRe)
      .join(broadcast(keys), col("h") === col("__ph"))
    val toks = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol), splitRe).as("__toks"))
    cands
      .join(toks, "id")
      .where(slice(col("__toks"), col("pos") + 1, size(col("__p"))) === col("__p"))
      .select(col("phrase_id"), col("id"), col("pos"))
  }

  /** BATCH phrase locate over the PERSISTED positional index
    * ([[phraseOccurrencesIndexed]] × [[phrasesOccurrences]]) — the
    * no-corpus-scan batch forensics shape: thousands of suspect phrases
    * resolved against the bucket-partitioned (id, pos, h) postings in ONE
    * job, corpus text opened only for candidates' exact verify.
    *
    * Fully RELATIONAL, unlike the single-phrase indexed path's per-offset
    * probe unions (which would explode the plan at |batch| × m probes):
    * the bounded batch explodes to a (phrase_id, off, h) gram-key
    * relation — [[graft.functions.Text.hash60]] IN-ENGINE over the same
    * space-joined token grams the index writer hashed, so no driver
    * tokenizer can drift — the touched bucket set is collected from the
    * bounded batch and statically prunes the postings scan (the
    * [[bm25Join]] discipline), and ONE broadcast equi-join on `h` +
    * countDistinct(off)-per-(phrase, doc, base) intersection replaces the
    * probe chain. Distinct-offset counting keeps the duplicate-postings
    * robustness of the single-phrase path; the slice verify removes 2⁻⁶⁰
    * collisions. Output: (phrase_id, id, pos) — identical to
    * [[phrasesOccurrences]] over the indexed corpus. */
  def phrasesOccurrencesIndexed(index: graft.index.IndexStore.PhraseIndex,
      docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame): DataFrame = {
    val k = index.k
    require(phrases.columns.contains("phrase_id") &&
        phrases.columns.contains("p"),
      "phrases must be a (phrase_id, p) relation with p = array<string>")
    VectorSearch.requireBoundedBatch(phrases, "phrasesOccurrencesIndexed")
    val short = phrases.where(size(col("p")) < k).limit(1).count()
    require(short == 0L,
      s"phrases batch contains a phrase shorter than the index gram " +
        s"width $k — widen the phrases or rebuild the index narrower")
    val buckets = graft.dedup.Dedup.ShingleBuckets.toLong
    // per-(phrase, offset) gram keys — bounded (batch × phrase length)
    val keys = phrases.select(col("phrase_id"),
        explode(sequence(lit(0), size(col("p")) - k)).as("off"),
        col("p"))
      .select(col("phrase_id"), col("off"),
        Text.hash60(concat_ws(" ",
          slice(col("p"), col("off") + 1, lit(k)))).as("h"))
    // static bucket pruning: collect the touched set from the BOUNDED
    // batch, so PartitionFilters prune the postings directories
    val touched = keys
      .select(pmod(col("h"), lit(buckets)).as("b")).distinct()
      .collect().map(_.getLong(0))
    val posts = index.postings.where(col("bucket").isin(touched: _*))
    val perPhraseM = phrases.select(col("phrase_id"),
      (size(col("p")) - k + 1).as("__m"))
    val cands = posts.join(broadcast(keys), "h")
      .groupBy(col("phrase_id"), col("id"),
        (col("pos") - col("off")).as("base"))
      .agg(countDistinct(col("off")).as("__hits"))
      .join(broadcast(perPhraseM), "phrase_id")
      .where(col("__hits") === col("__m"))
    val toks = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("__toks"))
    cands
      .join(broadcast(phrases), "phrase_id")
      .join(toks, "id")
      .where(slice(col("__toks"), col("base") + 1, size(col("p"))) === col("p"))
      .select(col("phrase_id"), col("id"), col("base").cast("int").as("pos"))
  }

  /** SQL twin of [[phrasesOccurrences]] (DuckDB): `phrasesRel` must be a
    * query producing (phrase_id, p VARCHAR[]); emits (phrase_id, id, pos)
    * with 0-based token positions, positions verified directly (the hash
    * prefilter is a plan optimization, not a semantic). */
  def sqlPhrasesOccurrences(docsTable: String, idExpr: String,
      textExpr: String, phrasesRel: String, k: Int,
      splitRe: String = Text.SplitRe): String =
    s"""SELECT ph.phrase_id, tk.id, (u.pos - 1)::INT AS pos
       |FROM (SELECT $idExpr AS id, ${Text.sqlTokens(textExpr, splitRe)} AS t
       |      FROM $docsTable) tk
       |CROSS JOIN ($phrasesRel) ph,
       |     UNNEST(range(1, greatest(len(tk.t) - len(ph.p) + 1, 0) + 1)) AS u(pos)
       |WHERE len(ph.p) >= $k
       |  AND list_slice(tk.t, u.pos, u.pos + len(ph.p) - 1) = ph.p""".stripMargin

  /** SQL twin of [[phraseOccurrences]] (DuckDB): `phraseTable` must expose
    * a one-row column `p` (VARCHAR[]); emits (id, pos) with 0-based token
    * positions. The SQL verifies every start position directly (no hash
    * stage — the hash prefilter is a plan optimization, not a semantic). */
  def sqlPhraseOccurrences(docsTable: String, idExpr: String,
      textExpr: String, phraseTable: String, k: Int,
      splitRe: String = Text.SplitRe): String =
    s"""SELECT tk.id, (u.pos - 1)::INT AS pos
       |FROM (SELECT $idExpr AS id, ${Text.sqlTokens(textExpr, splitRe)} AS t
       |      FROM $docsTable) tk
       |CROSS JOIN $phraseTable ph,
       |     UNNEST(range(1, greatest(len(tk.t) - len(ph.p) + 1, 0) + 1)) AS u(pos)
       |WHERE len(ph.p) >= $k
       |  AND list_slice(tk.t, u.pos, u.pos + len(ph.p) - 1) = ph.p""".stripMargin
}
