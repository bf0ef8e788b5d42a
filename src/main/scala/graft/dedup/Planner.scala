package graft.dedup

import org.apache.spark.sql.DataFrame

/** Cost-based REGIME PLANNER for the dedup families — the dedup analog of
  * the ANN `numCandidates` heuristics (reference `local-test.py:118-131`
  * sizes probe depth from k; here band layouts are sized from the
  * threshold): given a cosine/Jaccard threshold, a corpus size, and a
  * per-pair miss budget, return the EXECUTABLE path + parameters that
  * minimize estimated work subject to recall.
  *
  * The engine ships several production dedup regimes on purpose
  * (SCALE.md §5: recall-first 2-bit bands for the low-cosine regime,
  * selective 8/12-bit bands for clone detection, cluster-scoped
  * semantic pairs, prefix containment, 16-sig MinHash) — this object is
  * the decision procedure that picks among them, so a 100 TB curation
  * run starts from an analytic plan instead of a folk default. All
  * arithmetic is driver-side closed form; the probabilities agree with
  * [[Dedup.selectiveMissProb]]/[[Dedup.selectiveMissProbMultiProbe]] by
  * construction (shared formulas, pinned in PlannerSpec), and the
  * recommended layouts are directly runnable because the selective paths
  * take (bands, rows) as parameters. Plans report EXPECTED background
  * work; the measured counterpart (receipts) is
  * [[Dedup.signLshCandidateVolume]] / [[Dedup.signLshScreenWithStats]] —
  * plan analytically, then budget with the estimators before launch.
  */
object Planner {

  /** Per-bit sign-LSH agreement probability at cosine exactly `t`
    * (Goemans–Williamson): 1 − acos(t)/π. */
  def bitAgreeProb(t: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, t))) / math.Pi

  /** Probability one `rows`-bit band hits, given per-bit agreement `p`:
    * exact key agreement p^rows, plus — under Hamming-1 multi-probe —
    * exactly-one-bit disagreement rows·p^(rows−1)·(1−p) (the probe set
    * covers both; [[Dedup.signLshProbes]]). */
  def bandHitProb(p: Double, rows: Int, multiProbe: Boolean): Double = {
    val exact = math.pow(p, rows)
    if (multiProbe) exact + rows * math.pow(p, rows - 1) * (1.0 - p)
    else exact
  }

  /** Per-pair miss probability at cosine exactly `t` for a (bands, rows,
    * multiProbe) layout — the generalization of
    * [[Dedup.selectiveMissProb]] (multiProbe = false) and
    * [[Dedup.selectiveMissProbMultiProbe]] (multiProbe = true); equality
    * with both is pinned in PlannerSpec. */
  def missProb(t: Double, bands: Int, rows: Int, multiProbe: Boolean): Double =
    math.pow(1.0 - bandHitProb(bitAgreeProb(t), rows, multiProbe), bands)

  /** Expected fraction of a RANDOM background pair (cos ≈ 0 in high
    * dimension ⇒ per-bit agreement ½) admitted as a candidate — the
    * false-positive mass the exact verify pays for. */
  def randomPairHitProb(bands: Int, rows: Int, multiProbe: Boolean): Double =
    1.0 - math.pow(1.0 - bandHitProb(0.5, rows, multiProbe), bands)

  /** One executable cosine-dedup recommendation.
    *
    * `path` names the [[Dedup]] entry point; for the two selective paths
    * `bands`/`rows`/`multiProbe` are its direct arguments ([[execute]]
    * dispatches). `missProb` is the per-pair miss at exactly the
    * threshold (pairs above it miss less); `randomPairHitProb` the
    * background admission rate; `expectedVerifyPairs` its n(n−1)/2
    * scaling (BACKGROUND-only — clone families add their own irreducible
    * verify mass, which is why receipts exist); `estimatedWork` the
    * abstract unit-cost objective the grid search minimized. */
  case class CosinePlan(path: String, bands: Int, rows: Int,
      multiProbe: Boolean, missProb: Double, randomPairHitProb: Double,
      expectedVerifyPairs: Double, estimatedWork: Double,
      rationale: Seq[String])

  /** The implementation floor of the selective paths (their `require`):
    * below cos 0.85 selective recall collapses and the recall-first /
    * cluster-scoped regimes are the right tools. */
  val SelectiveFloor = 0.85

  /** Abstract work model for a selective layout on an n-vector corpus:
    * sketch (n·bands·rows·dim hyperplane dots) + band-join row volume
    * (n·bands, ×(1+rows) probe fanout under multi-probe) + background
    * verify (pairs·randomHit·dim). Unit-free — only used to COMPARE
    * layouts, never to predict seconds. */
  private def estimatedWork(n: Double, dim: Int, bands: Int, rows: Int,
      multiProbe: Boolean): Double = {
    val sketch = n * bands * rows * dim
    val joinRows = n * bands * (if (multiProbe) 1.0 + rows else 1.0)
    val verify = n * (n - 1) / 2.0 * randomPairHitProb(bands, rows, multiProbe) * dim
    sketch + joinRows + verify
  }

  private val BandGrid = Seq(4, 8, 16, 24, 32, 48, 64, 96, 128)
  private val MaxSketchBits = 1024

  /** Shared grid search: the (bands, rows, multiProbe) layout minimizing
    * `work` subject to miss ≤ `missBudget` at exactly `threshold`. */
  private def searchGrid(threshold: Double, missBudget: Double)(
      work: (Int, Int, Boolean) => Double): (Double, Int, Int, Boolean) = {
    val candidates = for {
      mp <- Seq(false, true)
      rows <- 2 to 24
      bands <- BandGrid
      if bands * rows <= MaxSketchBits
      if missProb(threshold, bands, rows, mp) <= missBudget
    } yield (work(bands, rows, mp), bands, rows, mp)
    require(candidates.nonEmpty,
      f"no selective layout meets miss ≤ $missBudget%.1e at cos " +
        f"$threshold%.2f — raise the budget or use semanticPairs")
    candidates.minBy(_._1)
  }

  /** Plan a full-corpus cosine dedup at `threshold` over `n` vectors of
    * `dim` dimensions, subject to per-pair miss ≤ `missBudget` at exactly
    * the threshold.
    *
    *  - threshold ≥ [[SelectiveFloor]]: grid-search (bands, rows,
    *    multiProbe) over the selective layouts (rows 2–24, bands×rows ≤
    *    1024 — bkey must fit a long and sketch cost is real), minimizing
    *    [[estimatedWork]] subject to the miss budget. The winner is
    *    directly executable: [[Dedup.cosinePairsLshSelective]] /
    *    [[Dedup.cosinePairsLshSelectiveMultiProbe]] with these params.
    *  - threshold < floor, `ivfAvailable`: [[Dedup.semanticPairs]] —
    *    cluster-scoped verify, recall bounded by cluster assignment
    *    (SemDeDup's regime), no banding miss to budget.
    *  - threshold < floor otherwise: [[Dedup.cosinePairsLsh]] — the
    *    recall-first 2-bit layout, with the measured warning that its
    *    verify join approaches all-pairs (SCALE.md §5: 98.6% at sf0.1);
    *    the plan says so rather than pretending a prune exists.
    *  - `exact = true` (recall EXACTLY 1 required — no per-pair miss
    *    bound is acceptable) overrides every banded regime: with an IVF
    *    index, [[Dedup.cosinePairsBallCover]] — recall 1 is a triangle-
    *    inequality theorem and the candidate mass is budgetable by
    *    arithmetic before launch ([[Dedup.ballCoverClusterPairs]]);
    *    without one, the quadratic [[Dedup.cosinePairs]] baseline is the
    *    ONLY exact path and the plan says so loudly. */
  def planCosine(threshold: Double, n: Long, dim: Int,
      missBudget: Double = 1e-3, ivfAvailable: Boolean = false,
      exact: Boolean = false): CosinePlan = {
    require(threshold > 0 && threshold < 1.0001,
      s"cosine threshold must be in (0, 1], got $threshold")
    require(missBudget > 0 && missBudget < 1, s"missBudget in (0,1), got $missBudget")
    val pairs = n.toDouble * (n - 1) / 2.0
    if (exact) {
      if (ivfAvailable)
        CosinePlan(path = "cosinePairsBallCover", bands = 0, rows = 0,
          multiProbe = false, missProb = 0.0, randomPairHitProb = Double.NaN,
          expectedVerifyPairs = Double.NaN, estimatedWork = Double.NaN,
          rationale = Seq(
            "exact contract: recall 1 required, so no banded layout (analytic " +
              "miss bound > 0) qualifies at any threshold",
            "IVF ball cover available: cluster-pair screen keeps every pair " +
              "that could reach the threshold (triangle inequality), verify " +
              "work = Σ|Cᵢ||Cⱼ| over surviving pairs — budget it with " +
              "Dedup.ballCoverClusterPairs before launch"))
      else
        CosinePlan(path = "cosinePairs", bands = 0, rows = 0,
          multiProbe = false, missProb = 0.0, randomPairHitProb = 1.0,
          expectedVerifyPairs = pairs,
          estimatedWork = pairs * dim,
          rationale = Seq(
            "exact contract with NO index: the quadratic baseline is the " +
              f"only exact path — ${pairs}%.3g pair comparisons",
            "build an IVF over the corpus first (Ivf.build) and re-plan: the " +
              "ball-cover screen keeps recall 1 while pruning cluster pairs"))
    } else if (threshold >= SelectiveFloor) {
      val (w, bands, rows, mp) = searchGrid(threshold, missBudget)(
        estimatedWork(n.toDouble, dim, _, _, _))
      CosinePlan(
        path = if (mp) "cosinePairsLshSelectiveMultiProbe"
               else "cosinePairsLshSelective",
        bands = bands, rows = rows, multiProbe = mp,
        missProb = missProb(threshold, bands, rows, mp),
        randomPairHitProb = randomPairHitProb(bands, rows, mp),
        expectedVerifyPairs = pairs * randomPairHitProb(bands, rows, mp),
        estimatedWork = w,
        rationale = Seq(
          f"high-threshold regime (cos ≥ $SelectiveFloor%.2f): selective banding prunes",
          f"$bands×$rows-bit bands${if (mp) " + Hamming-1 multi-probe" else ""}: " +
            f"per-pair miss ${missProb(threshold, bands, rows, mp)}%.2e ≤ budget $missBudget%.1e",
          f"background admission ${randomPairHitProb(bands, rows, mp) * 100}%.3f%% " +
            f"of ${pairs}%.3g pairs — budget the real corpus with signLshCandidateVolume before launch"))
    } else if (ivfAvailable) {
      CosinePlan(path = "semanticPairs", bands = 0, rows = 0,
        multiProbe = false, missProb = Double.NaN,
        randomPairHitProb = Double.NaN, expectedVerifyPairs = Double.NaN,
        estimatedWork = Double.NaN,
        rationale = Seq(
          f"cos $threshold%.2f is below the selective floor $SelectiveFloor%.2f",
          "an IVF index is available: cluster-scoped verify (SemDeDup regime) — " +
            "recall bounded by cluster assignment, verify mass ∝ Σ cluster²"))
    } else {
      CosinePlan(path = "cosinePairsLsh", bands = Dedup.SignLshBands,
        rows = Dedup.SignLshRows, multiProbe = false,
        missProb = missProb(threshold, Dedup.SignLshBands, Dedup.SignLshRows,
          multiProbe = false),
        randomPairHitProb = randomPairHitProb(Dedup.SignLshBands,
          Dedup.SignLshRows, multiProbe = false),
        expectedVerifyPairs = pairs * randomPairHitProb(Dedup.SignLshBands,
          Dedup.SignLshRows, multiProbe = false),
        estimatedWork = estimatedWork(n.toDouble, dim, Dedup.SignLshBands,
          Dedup.SignLshRows, multiProbe = false),
        rationale = Seq(
          f"cos $threshold%.2f is below the selective floor $SelectiveFloor%.2f and no IVF index is available",
          "recall-first 2-bit banding: per-pair miss stays tiny, but the verify " +
            "join approaches ALL-PAIRS on random backgrounds (measured 98.6% at " +
            "sf0.1, SCALE.md §5) — budget with signLshCandidateVolume, or build " +
            "an IVF index and re-plan"))
    }
  }

  /** Run a [[CosinePlan]]'s recommended path — the executable link from
    * plan to engine, so a caller (and PlannerSpec) can hold one object
    * and get the pairs it promises. Only the three index-free paths
    * dispatch here; a `semanticPairs` plan needs the caller's IVF index
    * ([[Dedup.semanticPairs]] directly). */
  def execute(plan: CosinePlan, embs: DataFrame, idCol: String,
      embCol: String, threshold: Double, dim: Int,
      seed: Long = 42L): DataFrame = plan.path match {
    case "cosinePairsLshSelective" =>
      Dedup.cosinePairsLshSelective(embs, idCol, embCol, threshold, dim,
        seed, plan.bands, plan.rows)
    case "cosinePairsLshSelectiveMultiProbe" =>
      Dedup.cosinePairsLshSelectiveMultiProbe(embs, idCol, embCol,
        threshold, dim, seed, plan.bands, plan.rows)
    case "cosinePairsLsh" =>
      Dedup.cosinePairsLsh(embs, idCol, embCol, threshold, dim, seed,
        plan.bands, plan.rows)
    case "cosinePairs" =>
      Dedup.cosinePairs(embs, idCol, embCol, threshold)
    case other => throw new IllegalArgumentException(
      s"plan path '$other' needs caller-held state (e.g. an IVF index); " +
        "call the Dedup entry point directly, or executeWithIndex")
  }

  /** [[execute]] for a caller who HOLDS an IVF index — completes the
    * plan→engine link for the [[planCosine]] regimes `execute` cannot
    * dispatch: below the selective floor with `ivfAvailable = true` the
    * plan recommends [[Dedup.semanticPairs]] (SemDeDup's cluster-scoped
    * verify), and under the exact contract
    * [[Dedup.cosinePairsBallCover]] (recall-1 cluster-pair screen) —
    * both need the index itself, not just (bands, rows).
    * Index-free plans fall through to [[execute]] unchanged, so a caller
    * with an index can dispatch EVERY [[CosinePlan]] through this one
    * entry point. Plan with `ivfAvailable = true` iff you will call this
    * — planning index-free and executing with an index (or vice versa)
    * silently changes which regime the threshold lands in. */
  def executeWithIndex(plan: CosinePlan, index: graft.index.Ivf.IvfIndex,
      embs: DataFrame, idCol: String, embCol: String, threshold: Double,
      dim: Int, seed: Long = 42L): DataFrame = plan.path match {
    case "semanticPairs" =>
      Dedup.semanticPairs(index, embs, idCol, embCol, threshold)
    case "cosinePairsBallCover" =>
      Dedup.cosinePairsBallCover(index, embs, idCol, embCol, threshold)
    case _ => execute(plan, embs, idCol, embCol, threshold, dim, seed)
  }

  /** One executable INCREMENTAL (daily-ingest) screen recommendation —
    * [[planIncrementalCosine]]. `path` names the screen family
    * ([[executeIncremental]] dispatches): `selectiveScreen` sketches with
    * [[Dedup.signLshSketchesSelective]] and screens with
    * [[Dedup.selectiveScreenWithStats]]; `signLshScreen` is the shipped
    * recall-first packed layout ([[Dedup.signLshSketches]] +
    * [[Dedup.signLshScreenWithStats]]). Sketch BOTH sides with
    * [[sketchIncremental]] — the persisted index must have been built
    * with the SAME layout (rebuild or re-plan, never mix — band keys
    * from different layouts never collide correctly).
    * `expectedCandidates` is batchN·indexN·randomHit (background-only);
    * the measured counterpart after the index exists is
    * [[Dedup.signLshCandidateVolumeAgainst]] and the screen's own
    * receipts. */
  case class IncrementalCosinePlan(path: String, bands: Int, rows: Int,
      multiProbe: Boolean, missProb: Double, randomPairHitProb: Double,
      expectedCandidates: Double, estimatedWork: Double,
      rationale: Seq[String])

  /** Plan the daily-ingest screen: a `batchN`-vector batch against an
    * `indexN`-vector persisted sketch index at `threshold`. Differs from
    * [[planCosine]] only in the work model — the corpus side is already
    * sketched (the index), so sketch cost covers the batch alone, the
    * band join probes batchN·bands·fanout rows, and the background
    * verify is batchN·indexN·randomHit·dim. Below the selective floor
    * the shipped recall-first layout is returned with its all-pairs
    * warning (the declared `q_dedup_incremental` regime), since the
    * screen must not silently lose recall. */
  def planIncrementalCosine(threshold: Double, batchN: Long, indexN: Long,
      dim: Int, missBudget: Double = 1e-3): IncrementalCosinePlan = {
    require(threshold > 0 && threshold < 1.0001,
      s"cosine threshold must be in (0, 1], got $threshold")
    require(missBudget > 0 && missBudget < 1, s"missBudget in (0,1), got $missBudget")
    val crossPairs = batchN.toDouble * indexN.toDouble
    def screenWork(bands: Int, rows: Int, mp: Boolean): Double = {
      val sketch = batchN.toDouble * bands * rows * dim
      val joinRows = batchN.toDouble * bands * (if (mp) 1.0 + rows else 1.0)
      val verify = crossPairs * randomPairHitProb(bands, rows, mp) * dim
      sketch + joinRows + verify
    }
    if (threshold >= SelectiveFloor) {
      val (w, bands, rows, mp) = searchGrid(threshold, missBudget)(screenWork)
      IncrementalCosinePlan("selectiveScreen", bands, rows, mp,
        missProb = missProb(threshold, bands, rows, mp),
        randomPairHitProb = randomPairHitProb(bands, rows, mp),
        expectedCandidates = crossPairs * randomPairHitProb(bands, rows, mp),
        estimatedWork = w,
        rationale = Seq(
          f"daily-ingest screen, $batchN%d × $indexN%d at cos ≥ $threshold%.2f",
          f"$bands×$rows-bit bands${if (mp) " + Hamming-1 multi-probe" else ""}: " +
            f"miss ${missProb(threshold, bands, rows, mp)}%.2e, background " +
            f"candidates ≈ ${crossPairs * randomPairHitProb(bands, rows, mp)}%.3g",
          "rebuild the sketch index with this layout; budget the real join " +
            "with signLshCandidateVolumeAgainst before launch"))
    } else
      IncrementalCosinePlan("signLshScreen", Dedup.SignLshBands,
        Dedup.SignLshRows, multiProbe = false,
        missProb = missProb(threshold, Dedup.SignLshBands, Dedup.SignLshRows,
          multiProbe = false),
        randomPairHitProb = randomPairHitProb(Dedup.SignLshBands,
          Dedup.SignLshRows, multiProbe = false),
        expectedCandidates = crossPairs * randomPairHitProb(
          Dedup.SignLshBands, Dedup.SignLshRows, multiProbe = false),
        estimatedWork = screenWork(Dedup.SignLshBands, Dedup.SignLshRows,
          mp = false),
        rationale = Seq(
          f"cos $threshold%.2f is below the selective floor $SelectiveFloor%.2f",
          "recall-first 2-bit banding: the verify join approaches ALL batch×index " +
            "pairs on random backgrounds (measured 98.6% at sf0.1, SCALE.md §5/§7) — " +
            "the screen keeps recall and the receipts (signLshScreenWithStats) " +
            "price the bill"))
  }

  /** Sketch a relation with an [[IncrementalCosinePlan]]'s layout — used
    * for BOTH sides of the screen: the corpus side once at index-build
    * time (persist via `IndexStore.saveSignLsh`; the banded shape is
    * layout-agnostic), the batch side per ingest wave. One definition so
    * the two sides cannot drift. */
  def sketchIncremental(plan: IncrementalCosinePlan, embs: DataFrame,
      idCol: String, embCol: String, dim: Int,
      seed: Long = 42L): DataFrame = plan.path match {
    case "selectiveScreen" =>
      Dedup.signLshSketchesSelective(embs, idCol, embCol, dim, seed,
        plan.bands, plan.rows)
    case "signLshScreen" =>
      Dedup.signLshSketches(embs, idCol, embCol, dim, seed,
        plan.bands, plan.rows)
    case other => throw new IllegalArgumentException(
      s"unknown incremental plan path '$other'")
  }

  /** Run an [[IncrementalCosinePlan]]'s screen — the daily-ingest
    * rendition of [[execute]], closing the round-8 "plan-driven intake"
    * gap: the composed pipeline picks its layout from (batchN, indexN,
    * threshold) instead of a folk default, and the returned
    * [[Dedup.SignLshScreenStats]] receipts say what the screen actually
    * did (budgeted join rows priced BEFORE launch, candidate/verified/
    * emitted pairs after). `batchBanded` and `indexBanded` must both be
    * [[sketchIncremental]] output for THIS plan. Directed pairs
    * (id1 = batch, id2 = index), work ∝ batch. */
  def executeIncremental(plan: IncrementalCosinePlan,
      batchBanded: DataFrame, indexBanded: DataFrame, embs: DataFrame,
      idCol: String, embCol: String,
      threshold: Double): (DataFrame, Dedup.SignLshScreenStats) =
    plan.path match {
      case "selectiveScreen" =>
        Dedup.selectiveScreenWithStats(batchBanded, indexBanded, embs,
          idCol, embCol, threshold, plan.multiProbe, plan.bands, plan.rows)
      case "signLshScreen" =>
        Dedup.signLshScreenWithStats(batchBanded, indexBanded, embs,
          idCol, embCol, threshold, plan.multiProbe, plan.bands, plan.rows)
      case other => throw new IllegalArgumentException(
        s"unknown incremental plan path '$other'")
    }

  /** Jaccard (MinHash) recommendation for the FIXED 16-signature 4×4
    * layout the engine ships ([[Dedup.NumHashes]]/[[Dedup.Bands]]): the
    * layout is part of the persisted sketch-index format, so the planner
    * reports honestly what it can and cannot do instead of inventing
    * unshippable layouts. */
  case class JaccardPlan(path: String, missProb: Double,
      recallFloor: Double, rationale: Seq[String])

  /** Per-pair miss of the shipped MinHash layout at Jaccard exactly `t`:
    * (1 − t^rows)^bands with rows = 4, bands = 4. */
  def minhashMissProb(t: Double): Double =
    math.pow(1.0 - math.pow(t, Dedup.RowsPerBand), Dedup.Bands)

  /** Smallest threshold at which the shipped layout's per-pair miss is
    * within `missBudget`: t* = (1 − budget^(1/bands))^(1/rows). */
  def minhashRecallFloor(missBudget: Double): Double =
    math.pow(1.0 - math.pow(missBudget, 1.0 / Dedup.Bands),
      1.0 / Dedup.RowsPerBand)

  /** Plan a Jaccard dedup at `threshold`:
    *  - above the layout's recall floor: [[Dedup.minhashPairs]];
    *  - below it: [[Dedup.jaccardPairsViaContainment]] — the prefix
    *    containment screen has recall EXACTLY 1 at any threshold by
    *    pigeonhole (no banding probability at all), and J(A,B) ≥ t ⇒
    *    C(A→B) ≥ t makes it a superset screen for Jaccard; exact Jaccard
    *    is verified on its candidates. The guarded quadratic
    *    [[Dedup.jaccardPairs]] stays what it is: an oracle baseline, so
    *    it is never recommended. Both paths dispatch through
    *    [[executeJaccard]]. */
  def planJaccard(threshold: Double, missBudget: Double = 1e-3): JaccardPlan = {
    require(threshold > 0 && threshold < 1.0001,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val floor = minhashRecallFloor(missBudget)
    if (threshold >= floor)
      JaccardPlan("minhashPairs", minhashMissProb(threshold), floor,
        Seq(f"16-sig 4×4 MinHash: per-pair miss ${minhashMissProb(threshold)}%.2e ≤ $missBudget%.1e at J=$threshold%.2f"))
    else
      JaccardPlan("jaccardPairsViaContainment", 0.0, floor,
        Seq(
          f"the shipped 16-sig 4×4 MinHash misses ${minhashMissProb(threshold) * 100}%.1f%% of borderline pairs at J=$threshold%.2f (floor ≈ $floor%.3f)",
          "prefix containment screens with recall exactly 1 at any threshold " +
            "(pigeonhole, no banding probability): J(A,B) ≥ t implies " +
            "C(A→B) ≥ t, so screen at t and verify exact Jaccard on candidates"))
  }

  /** Run a [[JaccardPlan]]'s recommended path — the Jaccard twin of
    * [[execute]], closing the plan→engine link for both regimes: above
    * the MinHash recall floor the banded-candidate path, below it the
    * containment-screened exact-Jaccard path (recall 1 by pigeonhole).
    * Either way the output matches the quadratic [[Dedup.jaccardPairs]]
    * oracle definition at the threshold. */
  def executeJaccard(plan: JaccardPlan, docs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = plan.path match {
    case "minhashPairs" =>
      Dedup.minhashPairs(docs, idCol, textCol, threshold)
    case "jaccardPairsViaContainment" =>
      Dedup.jaccardPairsViaContainment(docs, idCol, textCol, threshold)
    case other => throw new IllegalArgumentException(
      s"unknown jaccard plan path '$other'")
  }
}
