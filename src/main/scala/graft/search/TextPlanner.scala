package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cost-based physical-path choice for EXACT PHRASE LOOKUP — the text
  * twin of [[AnnPlanner.planKnn]]: three executable paths resolve the
  * same (id, pos) contract with wildly different scan shapes, and which
  * wins is arithmetic over catalog numbers, not folklore.
  *
  * Paths (reference behavior: exact `$regex`-style containment,
  * `backend/api.py` text search; here with positions):
  *
  *  - `scan` — [[TextSearch.phraseOccurrences]]: stream positional grams
  *    out of ONE corpus scan, broadcast-prefilter on the phrase's
  *    first-k-token hash. Reads every document's gram stream.
  *  - `screened` — [[TextSearch.phraseOccurrencesScreened]]: probe ONE
  *    bucket of the persisted gram MEMBERSHIP index
  *    ([[graft.index.IndexStore.GramIndex]]); an absent phrase is vetoed
  *    for that bucket read alone, a present one pays the probe PLUS the
  *    scan. Wins on absent-heavy workloads (contamination forensics
  *    where most suspect strings don't occur).
  *  - `indexed` — [[TextSearch.phraseOccurrencesIndexed]]: the phrase's
  *    m = tokens−k+1 consecutive gram hashes each probe one bucket of
  *    the POSITIONAL index ([[graft.index.IndexStore.PhraseIndex]]);
  *    no corpus gram scan at all.
  *
  * Cost model, in DOC-GRAM-STREAM units (1 = one document's positional
  * gram stream): the corpus scan reads n docs → n units; one hash bucket
  * holds ~1/B of all grams under uniform hashing (the ONE analytic
  * assumption, same one the bucint layout itself rests on — xxhash64
  * uniformity is closed-form-ish, unlike the geometry-dependent ANN
  * recall that forces [[AnnPlanner]]'s measured-depth inputs) → a bucket
  * probe is n/B units. The exact slice verify on surviving candidates is
  * IDENTICAL across paths (same candidates by construction) and excluded
  * from the table. Because every row scales linearly in the corpus's
  * average gram count, that factor cancels out of the argmin — the
  * decision needs only (n, m, B, presentFraction), all catalog/driver
  * numbers, never a corpus scan at plan time.
  *
  * `presentFraction` is the WORKLOAD's measured rate of phrases that
  * exist in the corpus — workload geometry, so the caller measures it
  * (the covering-depth honesty discipline); 1.0 (every phrase present,
  * the screen never vetoes) is the conservative default.
  *
  * Reference: josmanperez/hybrid-vector-search `backend/api.py` (exact
  * text containment is the only text path the reference has; the index
  * choices are this engine's scale surface).
  */
object TextPlanner {

  /** Which persisted assets exist — a plan can only dispatch over paths
    * whose assets are LOADED (a missing index fails loudly at execute,
    * never silently falls back: the [[AnnPlanner.execute]] contract). */
  final case class PhraseAssets(
      gramIndex: Option[graft.index.IndexStore.GramIndex] = None,
      phraseIndex: Option[graft.index.IndexStore.PhraseIndex] = None)

  /** One cost-table row: path, its price in doc-gram-stream units,
    * whether its asset exists, and the one-line pricing rationale. */
  final case class CostRow(path: String, units: Double,
      executable: Boolean, why: String)

  /** The whole table rides in the plan for audit (the [[AnnPlanner]]
    * posture): `chosen` is the argmin over executable rows. */
  final case class PhrasePlan(chosen: String, nDocs: Long, m: Int, k: Int,
      buckets: Int, presentFraction: Double, costs: Seq[CostRow]) {
    def cost(path: String): Double = costs.find(_.path == path).get.units
  }

  /** Price the three phrase-lookup paths for an n-doc corpus and an
    * engine-tokenized phrase of `phraseTokens` tokens. Ties break toward
    * the path listed first in ascending-cost-at-scale order (indexed,
    * screened, scan) — at equal units the narrower scan shape wins. */
  def planPhrase(nDocs: Long, phraseTokens: Int, k: Int,
      presentFraction: Double, assets: PhraseAssets,
      buckets: Int = graft.dedup.Dedup.ShingleBuckets): PhrasePlan = {
    require(nDocs >= 0, s"nDocs must be >= 0, got $nDocs")
    require(k >= 1, s"gram width k must be >= 1, got $k")
    require(phraseTokens >= k,
      s"phrase has $phraseTokens tokens; every path needs >= k=$k " +
        "(a shorter phrase has no valid gram key and would read as " +
        "\"no occurrences\" — a lie)")
    require(presentFraction >= 0 && presentFraction <= 1,
      s"presentFraction is a fraction, got $presentFraction")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // gram-width agreement is each index's DDL — a mismatched plan would
    // dispatch to a path that throws (or worse, silently misses)
    assets.gramIndex.foreach(g => require(g.k == k,
      s"gram index width ${g.k} != planned k=$k — rebuild or re-plan"))
    assets.phraseIndex.foreach(p => require(p.k == k,
      s"phrase index width ${p.k} != planned k=$k — rebuild or re-plan"))
    val n = nDocs.toDouble
    val m = phraseTokens - k + 1
    val probe = n / buckets
    val rows = Seq(
      CostRow("indexed", m * probe, assets.phraseIndex.isDefined,
        s"$m gram probes x one bucket each (~n/$buckets of the corpus " +
          "gram stream under uniform hashing); no corpus scan"),
      CostRow("screened", probe + presentFraction * n,
        assets.gramIndex.isDefined,
        s"one membership bucket probe + presentFraction=$presentFraction" +
          " of the workload still pays the full corpus gram scan"),
      CostRow("scan", n, executable = true,
        "every document's positional gram stream, one corpus scan"))
    val chosen = rows.filter(_.executable).minBy(_.units).path
    PhrasePlan(chosen, nDocs, m, k, buckets, presentFraction, rows)
  }

  /** Dispatch the planned path. `phraseTokens` must be ENGINE-TOKENIZED
    * ([[graft.functions.Text.tokens]] output) — every path hashes engine
    * tokens, so a raw/cased phrase would silently miss (the
    * [[TextSearch.phraseOccurrencesIndexed]] contract). A plan whose
    * chosen path's asset is missing fails loudly here rather than
    * silently falling back to a slower path nobody priced. */
  def executePhrase(plan: PhrasePlan, docs: DataFrame, idCol: String,
      textCol: String, phraseTokens: Seq[String],
      assets: PhraseAssets): DataFrame = {
    require(phraseTokens.size - plan.k + 1 == plan.m,
      s"phrase has ${phraseTokens.size} tokens but the plan priced " +
        s"m=${plan.m} probes at k=${plan.k} — re-plan for this phrase")
    lazy val phraseDf = {
      val spark = docs.sparkSession
      import spark.implicits._
      Seq(phraseTokens).toDF("p")
    }
    plan.chosen match {
      case "indexed" =>
        val idx = assets.phraseIndex.getOrElse(throw new IllegalStateException(
          "plan chose the positional-index path but no phrase index was " +
            "passed — load it or re-plan without the asset"))
        TextSearch.phraseOccurrencesIndexed(idx, docs, idCol, textCol,
          phraseTokens)
      case "screened" =>
        val idx = assets.gramIndex.getOrElse(throw new IllegalStateException(
          "plan chose the gram-screened path but no gram index was " +
            "passed — load it or re-plan without the asset"))
        TextSearch.phraseOccurrencesScreened(idx, docs, idCol, textCol,
          phraseDf)
      case "scan" =>
        TextSearch.phraseOccurrences(docs, idCol, textCol, phraseDf, plan.k)
      case other => throw new IllegalStateException(s"unknown path $other")
    }
  }

  // ------------------------------------------------------- batch lookups
  //
  // The workload a 100 TB contamination-forensics run actually has is a
  // BATCH of suspect phrases, not one — the round-9 critique of the ANN
  // planner (single-query pricing for a batch workload), preempted here
  // for text. Both batch paths amortize across the batch: ONE corpus
  // gram scan serves every phrase (TextSearch.phrasesOccurrences), or
  // ONE bucket-pruned postings read serves every probe
  // (phrasesOccurrencesIndexed reads the UNION of the batch's touched
  // buckets). The naive per-phrase loop rides in the cost table as a
  // non-executable reference row so the amortization is a visible
  // receipt, never a silent assumption.

  /** Batch cost table: `chosen` is the argmin over executable rows;
    * `touched` is the batch's distinct bucket count (driver arithmetic
    * over the bounded batch's gram hashes — the same set the indexed
    * path's PartitionFilters prune to). */
  final case class PhraseBatchPlan(chosen: String, nDocs: Long,
      nPhrases: Int, touched: Int, k: Int, buckets: Int,
      costs: Seq[CostRow]) {
    def cost(path: String): Double = costs.find(_.path == path).get.units
  }

  /** Price the batch paths for engine-tokenized `phraseTokens` (the
    * bounded, collected batch — driver-side routing state, the
    * [[TextSearch.phrasesOccurrencesIndexed]] posture). Tie-break
    * favors the indexed path: at equal gram-stream units it reads
    * narrow postings columns instead of tokenizing text. */
  def planPhraseBatch(nDocs: Long, phraseTokens: Seq[Seq[String]], k: Int,
      assets: PhraseAssets,
      buckets: Int = graft.dedup.Dedup.ShingleBuckets): PhraseBatchPlan = {
    require(nDocs >= 0, s"nDocs must be >= 0, got $nDocs")
    require(k >= 1, s"gram width k must be >= 1, got $k")
    require(phraseTokens.nonEmpty, "batch planning needs >= 1 phrase")
    require(phraseTokens.forall(_.size >= k),
      s"every phrase needs >= k=$k tokens — a shorter one has no valid " +
        "gram key and would read as \"no occurrences\"")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    assets.phraseIndex.foreach(p => require(p.k == k,
      s"phrase index width ${p.k} != planned k=$k — rebuild or re-plan"))
    val n = nDocs.toDouble
    // the batch's touched-bucket set: the same driver arithmetic the
    // indexed path runs for its PartitionFilters (hash60Local is the
    // frozen twin of the index writer's hash)
    val touched = (for {
      p <- phraseTokens
      off <- 0 to (p.size - k)
    } yield math.floorMod(
      graft.functions.Text.hash60Local(p.slice(off, off + k).mkString(" ")),
      buckets.toLong)).distinct.size
    val rows = Seq(
      CostRow("batch_indexed", math.min(touched, buckets).toDouble / buckets * n,
        assets.phraseIndex.isDefined,
        s"ONE postings read pruned to the batch's $touched touched " +
          s"buckets of $buckets (~touched/B of the corpus gram stream)"),
      CostRow("batch_scan", n, executable = true,
        "ONE corpus gram scan serves the whole broadcast batch"),
      CostRow("per_phrase_loop", phraseTokens.size * n,
        executable = false,
        s"the naive loop: ${phraseTokens.size} single-phrase scans — " +
          "never dispatched, shown for the amortization receipt"))
    val chosen = rows.filter(_.executable).minBy(_.units).path
    PhraseBatchPlan(chosen, nDocs, phraseTokens.size, touched, k, buckets,
      rows)
  }

  /** Dispatch the planned batch path over a (phrase_id, p) relation —
    * the relation must hold exactly the tokenized phrases the plan
    * priced. */
  def executePhraseBatch(plan: PhraseBatchPlan, docs: DataFrame,
      idCol: String, textCol: String, phrases: DataFrame,
      assets: PhraseAssets): DataFrame =
    plan.chosen match {
      case "batch_indexed" =>
        val idx = assets.phraseIndex.getOrElse(throw new IllegalStateException(
          "plan chose the batch-indexed path but no phrase index was " +
            "passed — load it or re-plan without the asset"))
        TextSearch.phrasesOccurrencesIndexed(idx, docs, idCol, textCol,
          phrases)
      case "batch_scan" =>
        TextSearch.phrasesOccurrences(docs, idCol, textCol, phrases, plan.k)
      case other => throw new IllegalStateException(s"unknown path $other")
    }

  /** Ownership advice for the POSITIONAL phrase index — the
    * [[AnnPlanner.adviseBuild]] discipline: build cost (read the corpus
    * gram stream + write it back as postings ≈ 2n units) against the
    * per-query saving taken from [[planPhrase]]'s OWN cost table (best
    * executable path WITHOUT the index vs WITH it — the two can never
    * disagree about lookup cost). An index that wouldn't be chosen at
    * any workload is never recommended. */
  final case class BuildAdvice(buildCostUnits: Double,
      perQuerySavingUnits: Double, breakEvenQueries: Double,
      build: Boolean, withPath: String, withoutPath: String)

  def adviseBuildPhraseIndex(nDocs: Long, phraseTokens: Int, k: Int,
      presentFraction: Double, existing: PhraseAssets,
      expectedQueries: Long,
      buckets: Int = graft.dedup.Dedup.ShingleBuckets): BuildAdvice = {
    require(expectedQueries >= 0,
      s"expectedQueries must be >= 0, got $expectedQueries")
    // price both worlds with dummy (width-k) assets: planPhrase only
    // consults presence and width, never the relations themselves
    val without = planPhrase(nDocs, phraseTokens, k, presentFraction,
      existing.copy(phraseIndex = None), buckets)
    val withIdx = planPhrase(nDocs, phraseTokens, k, presentFraction,
      existing.copy(phraseIndex = Some(
        graft.index.IndexStore.PhraseIndex(null, k))), buckets)
    val saving = without.cost(without.chosen) - withIdx.cost(withIdx.chosen)
    val buildCost = 2.0 * nDocs
    if (saving <= 0)
      BuildAdvice(buildCost, 0.0, Double.PositiveInfinity, build = false,
        withIdx.chosen, without.chosen)
    else
      BuildAdvice(buildCost, saving, buildCost / saving,
        build = expectedQueries >= buildCost / saving,
        withIdx.chosen, without.chosen)
  }
}
