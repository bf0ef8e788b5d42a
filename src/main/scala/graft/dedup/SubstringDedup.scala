package graft.dedup

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT SUBSTRING-SPAN dedup (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): find every maximal token span that
  * occurs (at token granularity) more than once in the corpus — the
  * signal used to CUT duplicated passages out of web-scale training text,
  * rather than dropping whole documents the way document-level dedup
  * ([[Dedup.exact]] / [[Dedup.minhashPairs]]) does. The reference engine
  * has no rendition of this (its dedup story is document-level Atlas
  * `$group`); it is part of the LLM-pipeline surface this engine adds.
  *
  * The paper builds a suffix array over the concatenated corpus — an
  * inherently sequential, memory-heavy structure. The Spark-native
  * rendition reaches the same spans relationally:
  *
  *   1. POSITIONAL k-token grams at stride 1 — one (id, pos, hash) row per
  *      token position (not the distinct shingle SET [[Dedup.shinglePostings]]
  *      keeps: spans need every occurrence and its position);
  *   2. a gram is DUPLICATED when its hash occurs ≥ `minCount` times
  *      corpus-wide (one hash-groupBy — within-doc repeats count, exactly
  *      as they do in the paper's concatenated suffix array);
  *   3. per document, maximal runs of consecutive duplicated start
  *      positions merge into spans (gaps-and-islands: `pos − row_number()`
  *      is constant exactly on a consecutive run). A run of start
  *      positions [a..b] covers tokens [a .. b+k−1]: every k-gram inside a
  *      duplicated passage of length L ≥ k is itself duplicated, so the
  *      passage surfaces as one span of exactly its own extent.
  *
  * Scale shape, 100 TB: every stage is LINEAR in corpus tokens. The gram
  * explode is a narrow map (tokens staged as a column — the
  * [[graft.text.TextAnalysis.shinglesFromTokens]] hot-path discipline);
  * the duplicate set is one map-side-combinable hash-groupBy; marking is a
  * hash semi-join of postings against the (far smaller) duplicate-hash
  * set; the island window partitions by document, so its sort is bounded
  * by document length, never corpus length. No stage is quadratic and no
  * all-pairs comparison exists — unlike [[Dedup.jaccardPairs]] this IS the
  * production path, not an oracle baseline.
  *
  * Each derived operator re-tokenizes the source relation per branch
  * (grams, token counts, span rendering) instead of caching a staged
  * token column — deliberate, the
  * [[graft.pipeline.Contamination.ngramOverlapBloom]] posture: at corpus
  * scale re-scanning source parquet through a narrow codegen'd map is
  * cheaper than materializing a corpus-sized token-array relation, and
  * each branch's scan carries its own pushed filters.
  *
  * Grams are compared by [[Text.hash60]] (60-bit md5 prefix), the same
  * collision posture as every hash-keyed op here (Jaccard postings,
  * MinHash, exact dedup's md5): a collision can merge unrelated grams, with
  * probability ~n²/2⁶¹ — and the DuckDB oracle hashes identically, so the
  * gate compares bit-for-bit regardless. Determinism: integer-only
  * arithmetic end to end (positions, counts) — no float drift surface.
  */
object SubstringDedup {

  /** Span-detection gram width. Lee et al. use 50 tokens on web crawl; the
    * testdata documents run ~50 tokens total, so the declared queries use
    * this smaller default — the operator takes any k ≥ 1. */
  val DefaultGramTokens = 8

  /** Positional gram postings: (id, pos, h) — one row per token start
    * position, `h` = [[Text.hash60]] of the k tokens from `pos` (0-based)
    * joined by single spaces. Documents shorter than k tokens yield ONE
    * gram at pos 0 covering the whole document (the
    * [[graft.text.TextAnalysis.shinglesFromTokens]] short-doc contract, so
    * two identical short documents still count as duplicated); null/empty
    * text yields no rows. */
  def gramPostings(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultGramTokens,
      splitRe: String = Text.SplitRe): DataFrame = {
    require(k >= 1, s"gram width must be >= 1, got $k")
    // positional gram explosion is the engine's biggest per-byte fan-out
    // (one row per token position) — floor its parallelism at the core
    // count when the scan's split count can't (no-op at corpus scale)
    graft.util.Par.spread(docs, Seq(col(idCol)))
      .select(col(idCol).as("id"),
        Text.tokens(col(textCol), splitRe).as("__toks"))
      .where(col("__toks").isNotNull && size(col("__toks")) > 0)
      .select(col("id"), col("__toks"),
        // start indices are 1-based for slice(); pos below is 0-based
        sequence(lit(1), greatest(size(col("__toks")) - lit(k - 1), lit(1)))
          .as("__idx"))
      .select(col("id"), posexplode(
        transform(col("__idx"),
          i => Text.hash60(concat_ws(" ", slice(col("__toks"), i, lit(k)))))
      ).as(Seq("pos", "h")))
  }

  /** Maximal duplicated token spans: (id, span_start, span_end, n_grams)
    * with token indices 0-based inclusive, `span_end` clamped to the
    * document's last token (a short-doc whole-document gram never claims
    * tokens past the text), and `n_grams` = duplicated gram start
    * positions merged into the span. Ordering is unspecified (gate sorts).
    *
    * Spans are DISJOINT per document: start-position islands whose
    * covered extents [start, start+k−1] still overlap (two duplicated
    * runs separated by fewer than k start positions — e.g. a doc whose
    * prefix matches one neighbor and whose overlapping suffix matches
    * another) are merged by a second interval-merge pass, so every token
    * is claimed by at most one span and coverage arithmetic can sum span
    * lengths. Extents that merely TOUCH (adjacent, no shared token) stay
    * separate — they are distinct evidence runs.
    *
    * @param minCount occurrences (corpus-wide, within-doc repeats
    *                 included) for a gram to count as duplicated; 2 =
    *                 "appears anywhere else". */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultGramTokens, minCount: Long = 2L,
      splitRe: String = Text.SplitRe): DataFrame = {
    require(minCount >= 2, s"minCount < 2 would flag every gram, got $minCount")
    val grams = gramPostings(docs, idCol, textCol, k, splitRe)
    val dup = grams.groupBy("h").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minCount).select("h")
    spansFromMarked(grams.join(dup, Seq("h"), "left_semi"),
      docs, idCol, textCol, k, splitRe)
  }

  /** The islands → clamp → interval-merge tail shared by
    * [[duplicatedSpans]] and [[spansAgainst]]: `marked` is the (id, pos)
    * relation of duplicated gram start positions; `docs` supplies token
    * counts for the end clamp. */
  private def spansFromMarked(marked: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, k: Int, splitRe: String): DataFrame = {
    val isl = marked.withColumn("__grp",
      col("pos") - row_number().over(Window.partitionBy("id").orderBy("pos")))
    val spans = isl.groupBy("id", "__grp")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("long").as("__end_raw"),
        count(lit(1)).as("n_grams"))
    val nTokens = docs
      .select(col(idCol).as("id"),
        Text.tokens(col(textCol), splitRe).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("__n_toks"))
    val clamped = spans.join(nTokens, "id")
      .select(col("id"), col("span_start"),
        least(col("__end_raw"), col("__n_toks") - 1).as("span_end"),
        col("n_grams"))
    // interval merge: islands are disjoint in START positions, but their
    // k-wide extents overlap when islands sit < k starts apart — a new
    // merged group begins where a span starts past every previous end
    val byStart = Window.partitionBy("id").orderBy("span_start")
    val prevMaxEnd = max(col("span_end"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    clamped
      .withColumn("__new",
        when(col("span_start") > coalesce(prevMaxEnd, lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("__mg", sum(col("__new"))
        .over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("id", "__mg")
      .agg(min(col("span_start")).as("span_start"),
        max(col("span_end")).as("span_end"),
        sum(col("n_grams")).as("n_grams"))
      .select("id", "span_start", "span_end", "n_grams")
  }

  /** INCREMENTAL duplicated spans — the daily-ingest screen: which token
    * spans of a NEW batch duplicate anything the corpus has already seen
    * (or that arrive ≥ 2× inside the batch itself)? Work ∝ batch plus ONE
    * narrow scan of the persisted hash column; the corpus text is never
    * re-grammed.
    *
    * EXACTNESS: a batch gram is globally duplicated (total occurrences
    * across corpus ∪ batch ≥ 2) iff it appears ANYWHERE in the corpus
    * (then its batch occurrence makes two) OR ≥ 2 times within the batch
    * — so the output EQUALS [[duplicatedSpans]] over corpus ∪ batch
    * restricted to batch documents (assuming the index covers the corpus;
    * spec-pinned structurally). The join shape: the batch's distinct gram
    * hashes broadcast AGAINST the index scan (the index side is the big
    * one), hits union the batch-internal repeats, and the batch postings
    * semi-join that small duplicated-hash set. */
  def spansAgainst(batch: DataFrame, idCol: String, textCol: String,
      index: graft.index.IndexStore.GramIndex): DataFrame = {
    // the persisted gram index is built under the frozen alphabet
    // (its hashes bake the tokenization in) — alphabet variants need a
    // matching index build, so no splitRe parameter here
    graft.search.VectorSearch.requireBoundedBatch(
      batch, "SubstringDedup.spansAgainst")
    val grams = gramPostings(batch, idCol, textCol, index.k)
    val batchH = grams.select("h").distinct()
    val idxHits = index.hashes.join(broadcast(batchH), "h").select("h").distinct()
    val batchDup = grams.groupBy("h").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= 2L).select("h")
    val dupH = idxHits.unionByName(batchDup).distinct()
    spansFromMarked(grams.join(broadcast(dupH), Seq("h"), "left_semi"),
      batch, idCol, textCol, index.k, Text.SplitRe)
  }

  /** Per-document duplication coverage — the curation signal built on
    * [[duplicatedSpans]]: (id, n_tokens, dup_tokens, dup_ratio). Spans
    * are disjoint (the interval-merge pass in [[duplicatedSpans]] — NOT
    * the start-islands alone, whose extents can overlap), so their
    * lengths sum to the covered-token count and the ratio is ≤ 1. Every
    * document gets a row (clean docs: 0, 0.0); ratio rounds to 6
    * decimals from an integer-exact quotient. */
  def duplicationCoverage(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultGramTokens, minCount: Long = 2L,
      splitRe: String = Text.SplitRe): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, k, minCount, splitRe)
    val perDoc = spans.groupBy("id")
      .agg(sum(col("span_end") - col("span_start") + 1L).as("dup_tokens"))
    docs
      .select(col(idCol).as("id"),
        Text.tokens(col(textCol), splitRe).as("__toks"))
      // null text → null tokens; the oracle coalesces len() to 0, and the
      // explicit isNull branch is immune to size()'s legacy -1-on-null mode
      .select(col("id"),
        when(col("__toks").isNull, lit(0)).otherwise(size(col("__toks")))
          .cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ratio",
        when(col("n_tokens") > 0,
          round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
  }

  /** The most-repeated passages — the "what IS the boilerplate" report a
    * curation engineer runs before choosing cut thresholds: each
    * duplicated span's covered tokens rendered back to (normalized) text,
    * grouped by content: (passage, n_tokens, n_spans, n_docs), top `topN`
    * by occurrence count (ties broken on the passage's [[Text.hash60]], so
    * the cut is deterministic and content-only on both engines).
    *
    * The aggregation groups by a 60-BIT CONTENT HASH of the passage, never
    * the passage string: the render + hash is a narrow map fused into the
    * span-tokens join (the string exists only inside its task), so the
    * only passage-sized shuffle in the whole report is ~30 bytes/span of
    * (hash, counts) — at corpus scale the full-string groupBy this
    * replaces would shuffle every duplicated passage's text once per
    * occurrence. Text is rendered for the ≤ `topN` WINNERS only, via one
    * broadcast join back to their representative documents' token arrays
    * (representative = lexicographic min (id, span) — deterministic, and
    * any member renders identical text barring a 60-bit collision, the
    * ~n²/2⁶¹ posture shared with every hash-keyed op here). */
  def topDuplicatedPassages(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultGramTokens, minCount: Long = 2L,
      topN: Int = 20, splitRe: String = Text.SplitRe): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, k, minCount, splitRe)
    val toks = docs
      .select(col(idCol).as("id"),
        Text.tokens(col(textCol), splitRe).as("__toks"))
    val renderPassage = (toksCol: Column) => concat_ws(" ", slice(toksCol,
      (col("span_start") + 1).cast("int"),
      (col("span_end") - col("span_start") + 1).cast("int")))
    val winners = spans.join(toks, "id")
      .select(
        Text.hash60(renderPassage(col("__toks"))).as("__ph"),
        (col("span_end") - col("span_start") + 1).as("n_tokens"), col("id"),
        col("span_start"), col("span_end"))
      .groupBy("__ph", "n_tokens")
      .agg(count(lit(1)).as("n_spans"), countDistinct(col("id")).as("n_docs"),
        min(struct(col("id"), col("span_start"), col("span_end"))).as("__rep"))
      .orderBy(col("n_spans").desc, col("__ph"))
      .limit(topN)
    broadcast(winners
        .select(col("n_tokens"), col("n_spans"), col("n_docs"),
          col("__rep.id").as("id"), col("__rep.span_start").as("span_start"),
          col("__rep.span_end").as("span_end")))
      .join(toks, "id")
      .select(renderPassage(col("__toks")).as("passage"),
        col("n_tokens"), col("n_spans"), col("n_docs"))
      .orderBy(col("n_spans").desc, col("passage"))
  }

  /** The Lee et al. REMEDIATION: remove every duplicated span from every
    * document's token stream — (id, n_tokens, n_removed, clean_text), with
    * `clean_text` the kept tokens of the NORMALIZED stream (lowercased,
    * space-joined: the tokenizer is lossy by design, and the output is a
    * training-text transform, not a byte-faithful edit). Cutting all
    * occurrences (not all-but-one) is the conservative variant — electing
    * one global keeper per passage would serialize on a corpus-wide
    * arbitration this stays free of. Docs with no spans pass through
    * unchanged; null-text docs yield an empty clean_text.
    *
    * Scale: the per-doc span list ([[duplicatedSpans]] output grouped by
    * doc) is bounded by document length, so the position filter is a
    * narrow per-row lambda — no extra shuffle beyond the span join. */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultGramTokens, minCount: Long = 2L,
      splitRe: String = Text.SplitRe): DataFrame = {
    val spanLists = duplicatedSpans(docs, idCol, textCol, k, minCount,
      splitRe)
      .groupBy("id")
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__sl"))
    val emptySpans = array().cast("array<struct<s:long,e:long>>")
    docs
      .select(col(idCol).as("id"),
        Text.tokens(col(textCol), splitRe).as("__toks"))
      .join(spanLists, Seq("id"), "left")
      .select(col("id"), col("__toks"),
        coalesce(col("__sl"), emptySpans).as("__sl"))
      .select(col("id"), col("__toks"),
        filter(col("__toks"), (t, i) => !exists(col("__sl"),
          sp => i.cast("long") >= sp.getField("s") &&
            i.cast("long") <= sp.getField("e"))).as("__kept"))
      .select(col("id"),
        when(col("__toks").isNull, lit(0)).otherwise(size(col("__toks")))
          .cast("long").as("n_tokens"),
        when(col("__toks").isNull, lit(0))
          .otherwise(size(col("__toks")) - size(col("__kept")))
          .cast("long").as("n_removed"),
        when(col("__toks").isNull, lit(""))
          .otherwise(concat_ws(" ", col("__kept"))).as("clean_text"))
  }

  private def sqlGramCtes(docsTable: String, idExpr: String,
      textExpr: String, k: Int, minCount: Long,
      splitRe: String = Text.SplitRe): String = {
    val toks = Text.sqlTokens(textExpr, splitRe)
    val gramHash = Text.sqlHash60(s"array_to_string(list_slice(t, i, i + ${k - 1}), ' ')")
    s"""toks AS (
       |  SELECT $idExpr AS id, $toks AS t FROM $docsTable
       |), grams0 AS (
       |  SELECT id, [$gramHash
       |              for i in generate_series(1, greatest(len(t) - ${k - 1}, 1))] AS gs
       |  FROM toks WHERE t IS NOT NULL AND len(t) > 0
       |), grams AS (
       |  SELECT id, unnest(gs) AS h, generate_subscripts(gs, 1) - 1 AS pos FROM grams0
       |), dup AS (
       |  SELECT h FROM grams GROUP BY h HAVING count(*) >= $minCount
       |), marked AS (
       |  -- dup projects a grouped (distinct) h, so the inner join IS the
       |  -- semi join the Spark side uses
       |  SELECT id, pos FROM grams JOIN dup USING (h)
       |)${sqlSpanTailCtes(k)}""".stripMargin
  }

  /** The islands → clamp → interval-merge tail as CTEs — assumes CTEs
    * `marked(id, pos)` (duplicated gram start positions) and `toks(id, t)`
    * are in scope; ends with the `spans` CTE every consumer reads. */
  private def sqlSpanTailCtes(k: Int): String =
    s""", isl AS (
       |  SELECT id, pos,
       |         pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS grp
       |  FROM marked
       |), clamped AS (
       |  SELECT s.id, s.span_start,
       |         least(s.end_raw, n.n_toks - 1) AS span_end, s.n_grams
       |  FROM (SELECT id, min(pos)::BIGINT AS span_start,
       |               (max(pos) + ${k - 1})::BIGINT AS end_raw,
       |               count(*)::BIGINT AS n_grams
       |        FROM isl GROUP BY id, grp) s
       |  JOIN (SELECT id, len(t)::BIGINT AS n_toks FROM toks) n USING (id)
       |), flagged AS (
       |  -- interval merge (mirrors the Spark side): k-wide extents of
       |  -- nearby start-islands can overlap; merge where they do
       |  SELECT id, span_start, span_end, n_grams,
       |         CASE WHEN span_start > coalesce(
       |                max(span_end) OVER (PARTITION BY id ORDER BY span_start
       |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |                -1) THEN 1 ELSE 0 END AS newg
       |  FROM clamped
       |), mgrp AS (
       |  SELECT id, span_start, span_end, n_grams,
       |         sum(newg) OVER (PARTITION BY id ORDER BY span_start
       |                         ROWS UNBOUNDED PRECEDING) AS mg
       |  FROM flagged
       |), spans AS (
       |  SELECT id, min(span_start)::BIGINT AS span_start,
       |         max(span_end)::BIGINT AS span_end,
       |         sum(n_grams)::BIGINT AS n_grams
       |  FROM mgrp GROUP BY id, mg
       |)""".stripMargin

  /** DuckDB twin of [[spansAgainst]] over one table: the batch is the
    * rows satisfying `batchCond(id)`, the "index" is every other row's
    * gram-hash set — the whole-relation rendition of the incremental
    * contract (a gram is duplicated iff the rest of the corpus has it, or
    * it repeats within the batch), which equals [[sqlDuplicatedSpans]]
    * restricted to batch ids. */
  def sqlSpansAgainst(docsTable: String, idExpr: String, textExpr: String,
      batchCond: String => String, k: Int = DefaultGramTokens): String = {
    // frozen alphabet on purpose — the twin of the index-backed path
    val toks = Text.sqlTokens(textExpr)
    val gramHash = Text.sqlHash60(s"array_to_string(list_slice(t, i, i + ${k - 1}), ' ')")
    s"""WITH toks AS (
       |  SELECT $idExpr AS id, $toks AS t FROM $docsTable
       |), grams0 AS (
       |  SELECT id, [$gramHash
       |              for i in generate_series(1, greatest(len(t) - ${k - 1}, 1))] AS gs
       |  FROM toks WHERE t IS NOT NULL AND len(t) > 0
       |), allgrams AS (
       |  SELECT id, unnest(gs) AS h, generate_subscripts(gs, 1) - 1 AS pos FROM grams0
       |), grams AS (
       |  SELECT id, h, pos FROM allgrams WHERE ${batchCond("id")}
       |), dup AS (
       |  SELECT DISTINCT h FROM grams WHERE h IN (
       |    SELECT h FROM allgrams WHERE NOT (${batchCond("id")}))
       |  UNION
       |  SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
       |), marked AS (
       |  SELECT id, pos FROM grams JOIN dup USING (h)
       |)${sqlSpanTailCtes(k)}
       |SELECT id, span_start, span_end, n_grams FROM spans""".stripMargin
  }

  /** DuckDB twin of [[duplicatedSpans]] — the same grams/dup/islands/clamp
    * algebra spelled as CTEs (integer-only, so the hash compare is exact). */
  def sqlDuplicatedSpans(docsTable: String, idExpr: String, textExpr: String,
      k: Int = DefaultGramTokens, minCount: Long = 2L,
      splitRe: String = Text.SplitRe): String =
    s"""WITH ${sqlGramCtes(docsTable, idExpr, textExpr, k, minCount, splitRe)}
       |SELECT id, span_start, span_end, n_grams FROM spans""".stripMargin

  /** DuckDB twin of [[topDuplicatedPassages]] — same selection contract:
    * top `topN` groups by count with ties broken on the passage's
    * [[Text.sqlHash60]] (identical bits to the Spark side), then the final
    * presentation sort on the rendered text. */
  def sqlTopDuplicatedPassages(docsTable: String, idExpr: String,
      textExpr: String, k: Int = DefaultGramTokens, minCount: Long = 2L,
      topN: Int = 20, splitRe: String = Text.SplitRe): String =
    s"""WITH ${sqlGramCtes(docsTable, idExpr, textExpr, k, minCount, splitRe)},
       |passages AS (
       |  SELECT array_to_string(list_slice(t.t, s.span_start + 1, s.span_end + 1), ' ') AS passage,
       |         s.span_end - s.span_start + 1 AS n_tokens, s.id
       |  FROM spans s JOIN toks t USING (id)
       |), winners AS (
       |  SELECT passage, n_tokens, count(*)::BIGINT AS n_spans,
       |         count(DISTINCT id)::BIGINT AS n_docs
       |  FROM passages GROUP BY 1, 2
       |  ORDER BY n_spans DESC, ${Text.sqlHash60("passage")}
       |  LIMIT $topN
       |)
       |SELECT passage, n_tokens, n_spans, n_docs FROM winners
       |ORDER BY n_spans DESC, passage""".stripMargin

  /** DuckDB twin of [[cutSpans]] — the kept-token comprehension mirrors
    * the Spark positional filter (0-based positions, inclusive spans). */
  def sqlCutSpans(docsTable: String, idExpr: String, textExpr: String,
      k: Int = DefaultGramTokens, minCount: Long = 2L,
      splitRe: String = Text.SplitRe): String =
    s"""WITH ${sqlGramCtes(docsTable, idExpr, textExpr, k, minCount, splitRe)},
       |sps AS (
       |  SELECT id, list({'s': span_start, 'e': span_end}) AS sl
       |  FROM spans GROUP BY id
       |)
       |SELECT t.id, coalesce(len(t.t), 0)::BIGINT AS n_tokens,
       |       (coalesce(len(t.t), 0) - coalesce(len(
       |          [t.t[i+1] for i in generate_series(0, len(t.t)-1)
       |           if len(list_filter(coalesce(sps.sl, []), sp -> i >= sp.s AND i <= sp.e)) = 0]), 0))::BIGINT AS n_removed,
       |       coalesce(array_to_string(
       |          [t.t[i+1] for i in generate_series(0, len(t.t)-1)
       |           if len(list_filter(coalesce(sps.sl, []), sp -> i >= sp.s AND i <= sp.e)) = 0], ' '), '') AS clean_text
       |FROM toks t LEFT JOIN sps ON t.id = sps.id""".stripMargin

  /** DuckDB twin of [[duplicationCoverage]]. */
  def sqlDuplicationCoverage(docsTable: String, idExpr: String,
      textExpr: String, k: Int = DefaultGramTokens,
      minCount: Long = 2L, splitRe: String = Text.SplitRe): String =
    s"""WITH ${sqlGramCtes(docsTable, idExpr, textExpr, k, minCount, splitRe)},
       |per_doc AS (
       |  SELECT id, sum(span_end - span_start + 1)::BIGINT AS dup_tokens
       |  FROM spans GROUP BY id
       |)
       |SELECT b.id, b.n_tokens,
       |       coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       |       CASE WHEN b.n_tokens > 0
       |            THEN round(coalesce(p.dup_tokens, 0)::DOUBLE / b.n_tokens, 6)
       |            ELSE 0.0 END AS dup_ratio
       |FROM (SELECT id, coalesce(len(t), 0)::BIGINT AS n_tokens FROM toks) b
       |LEFT JOIN per_doc p USING (id)""".stripMargin
}
