package graft

import graft.index.{Ivf, Pq}
import graft.search.{AnnPlanner, VectorSearch}
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN physical-path planner: cost-table consistency (the winner IS
  * the argmin of the published table), regime flips (exact contract,
  * filtered break-even, asset availability, trained-vs-untrained
  * depths), and the executable link — every dispatchable path, run
  * through AnnPlanner.execute with the planner's own knobs, equals the
  * direct engine call and (at covering depth) the exact scan. */
class AnnPlannerSpec extends AnyFunSuite with SparkTest {

  private lazy val embs = Tables.embeddings(spark, Sf0001)
  private lazy val n = embs.count()
  private lazy val ivf = Ivf.build(embs, "vec_id", "embedding")
  private lazy val pq = Pq.build(embs, "vec_id", "embedding")
  private val dim = 64
  private val queryVec = graft.embed.Embedder.default.embed("planner probe")
  private def fullAssets = AnnPlanner.AnnAssets(
    ivfClusters = ivf.centroids.size, pqM = pq.m, prefixDims = 32)

  test("the winner is the argmin of the plan's own published cost table") {
    val plan = AnnPlanner.planKnn(n, dim, k = 10, assets = fullAssets)
    assert(plan.costs.nonEmpty)
    val (bestPath, bestCost) = plan.costs.minBy(_._2)
    assert(plan.path === bestPath)
    assert(plan.estimatedScanUnits === bestCost)
    // all four paths were priced (three assets + the exact baseline)
    assert(plan.costs.map(_._1).toSet ===
      Set("exactScan", "ivfProbe", "pqAdc", "mrlPrefix"))
  }

  test("no assets -> exact scan is the only path") {
    val plan = AnnPlanner.planKnn(n, dim, k = 10)
    assert(plan.path === "exactScan")
    assert(plan.costs.map(_._1) === Seq("exactScan"))
  }

  test("exact contract overrides the cost table") {
    val plan = AnnPlanner.planKnn(n, dim, k = 10, assets = fullAssets,
      exact = true)
    assert(plan.path === "exactScan")
    // the cost table is still published — the caller sees what exactness cost
    assert(plan.costs.size === 4)
  }

  test("a selective filter flips the winner to the filtered exact scan") {
    val unfiltered = AnnPlanner.planKnn(n, dim, k = 10, assets = fullAssets)
    assert(unfiltered.path !== "exactScan",
      "fixture premise: some routed path beats the unfiltered scan")
    val filtered = AnnPlanner.planKnn(n, dim, k = 10, assets = fullAssets,
      filterSelectivity = Some(0.05))
    assert(filtered.path === "exactScan")
    assert(filtered.rationale.exists(_.contains("filter selectivity")))
  }

  test("trained (shallow) depths flip the winner at cluster scale") {
    // untrained posture at 1e9 x 1024: every approximate path is dominated
    // by its fraction-of-n coarse stage; trained depths (1% covering) make
    // the IVF probe the clear winner over both the scan and the ADC path
    val big = AnnPlanner.AnnAssets(ivfClusters = 31623L, pqM = 8,
      prefixDims = 64)
    val shallow = AnnPlanner.planKnn(1000000000L, 1024, k = 10, assets = big,
      depths = AnnPlanner.AnnDepths(ivfMassFraction = 0.01,
        pqOverfetchFraction = 0.01, mrlOverfetchFraction = 0.01))
    assert(shallow.path === "ivfProbe")
    // and the planned probe mass is the fraction the caller measured
    assert(shallow.numCandidates === 10000000)
  }

  test("executable link: every dispatched path matches the direct engine call") {
    val plan = AnnPlanner.planKnn(n, dim, k = 5, assets = fullAssets)
    val viaPlanner = AnnPlanner.execute(plan, embs, "vec_id", "embedding",
        queryVec, k = 5, ivf = Some(ivf), pq = Some(pq))
      .select("vec_id", "score").collect().toSeq
    val direct = plan.path match {
      case "pqAdc" =>
        Pq.ann(pq, embs, "vec_id", "embedding", queryVec, k = 5,
          overfetch = plan.overfetch)
      case "ivfProbe" =>
        Ivf.ann(ivf, embs, "vec_id", "embedding", queryVec, k = 5,
          numCandidates = plan.numCandidates)
      case "mrlPrefix" =>
        VectorSearch.knnPrefix(embs, "vec_id", "embedding", queryVec, k = 5,
          prefixDims = plan.prefixDims, overfetch = plan.overfetch)
      case _ =>
        VectorSearch.knn(embs, "vec_id", "embedding", queryVec, k = 5)
    }
    assert(viaPlanner === direct.select("vec_id", "score").collect().toSeq)
    // and at the fixture's covering depths the routed result IS exact
    assert(viaPlanner ===
      VectorSearch.knn(embs, "vec_id", "embedding", queryVec, k = 5)
        .select("vec_id", "score").collect().toSeq)
  }

  test("execute: the filtered exact plan prunes before top-k") {
    val plan = AnnPlanner.planKnn(n, dim, k = 5, assets = fullAssets,
      filterSelectivity = Some(0.1))
    assert(plan.path === "exactScan")
    val got = AnnPlanner.execute(plan, embs, "vec_id", "embedding",
        queryVec, k = 5, preFilter = Some(col("label") === 3))
      .select("vec_id", "score").collect().toSeq
    val want = VectorSearch.knn(embs.where(col("label") === 3), "vec_id",
        "embedding", queryVec, k = 5)
      .select("vec_id", "score").collect().toSeq
    assert(got === want)
    assert(got.size === 5, "pre-filter placement must not truncate below k")
  }

  test("execute refuses a plan whose asset is missing — no silent fallback") {
    val plan = AnnPlanner.planKnn(n, dim, k = 5, assets = fullAssets)
    assert(plan.path === "pqAdc", "fixture premise: ADC wins at this scale")
    val e = intercept[IllegalArgumentException] {
      AnnPlanner.execute(plan, embs, "vec_id", "embedding", queryVec, k = 5)
    }
    assert(e.getMessage.contains("no PQ index"))
  }

  test("covering-depth sidecar: save/load roundtrip, defaults, staleness") {
    import graft.index.IndexStore
    val p = java.nio.file.Files.createTempDirectory("graft_depth").toString
    assert(IndexStore.loadDepth(spark, p).isEmpty)
    IndexStore.saveDepth(spark, p, IndexStore.DepthRecord(0.9, n, 10))
    assert(IndexStore.loadDepth(spark, p) ===
      Some(IndexStore.DepthRecord(0.9, n, 10)))
    // a re-measure supersedes
    IndexStore.saveDepth(spark, p, IndexStore.DepthRecord(0.25, 2 * n, 10))
    assert(IndexStore.loadDepth(spark, p).get.fraction === 0.25)
    assert(!IndexStore.DepthRecord(0.9, n, 10).staleAt(2 * n))
    assert(IndexStore.DepthRecord(0.9, n, 10).staleAt(2 * n + 1))
    intercept[IllegalArgumentException] {
      IndexStore.DepthRecord(1.5, n, 10)
    }
  }

  test("depthsFromSidecars reads recorded depths, falls back, flags stale") {
    import graft.index.IndexStore
    val p = java.nio.file.Files.createTempDirectory("graft_depth2").toString
    IndexStore.saveDepth(spark, p, IndexStore.DepthRecord(0.33, n, 10))
    // recorded path read, unrecorded paths fall back to the defaults
    val (depths, stale) = AnnPlanner.depthsFromSidecars(spark, n,
      ivfPath = Some(p), pqPath = Some(p + "/nope"))
    assert(depths.ivfMassFraction === 0.33)
    assert(depths.pqOverfetchFraction ===
      AnnPlanner.AnnDepths().pqOverfetchFraction)
    assert(stale.isEmpty)
    // a corpus that outgrew the measurement is still planned but flagged
    val (depths2, stale2) = AnnPlanner.depthsFromSidecars(spark, 3 * n,
      ivfPath = Some(p))
    assert(depths2.ivfMassFraction === 0.33)
    assert(stale2.exists(_.contains("re-measure")))
  }

  test("planKnnJoin: winner is the argmin; exact contract excludes routed") {
    val assets = AnnPlanner.AnnAssets(ivfClusters = ivf.centroids.size)
    val exact = AnnPlanner.planKnnJoin(50L, n, dim, k = 3, assets = assets,
      exact = true)
    assert(exact.path === exact.costs.minBy(_._2)._1)
    assert(exact.costs.map(_._1).toSet === Set("bruteJoin", "ballCoverJoin"))
    val approx = AnnPlanner.planKnnJoin(50L, n, dim, k = 3, assets = assets,
      exact = false)
    assert(approx.costs.map(_._1).toSet ===
      Set("bruteJoin", "ballCoverJoin", "ivfRoutedJoin"))
    // no IVF asset -> brute is the only path, exact or not
    assert(AnnPlanner.planKnnJoin(50L, n, dim, k = 3).costs.map(_._1) ===
      Seq("bruteJoin"))
    // at trained (shallow) depths the routed join dominates by ~50x
    val big = AnnPlanner.planKnnJoin(1000L, 1000000000L, 1024, k = 10,
      assets = AnnPlanner.AnnAssets(ivfClusters = 31623L),
      depths = AnnPlanner.AnnDepths(ivfMassFraction = 0.01),
      exact = false)
    assert(big.path === "ivfRoutedJoin")
    assert(big.numCandidates === 10000000)
  }

  test("executeKnnJoin: the dispatched exact path equals the brute join") {
    val assets = AnnPlanner.AnnAssets(ivfClusters = ivf.centroids.size)
    val plan = AnnPlanner.planKnnJoin(10L, n, dim, k = 3, assets = assets,
      exact = true)
    val batch = embs.where(col("vec_id") < 10)
    val got = AnnPlanner.executeKnnJoin(plan, batch, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3,
        ivf = Some(ivf))
      .orderBy("query_id", "rank").collect().toSeq
    val want = VectorSearch.knnJoin(batch, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
    // a ball-cover plan without its index fails loudly, never falls back
    if (plan.path != "bruteJoin")
      assert(intercept[IllegalArgumentException] {
        AnnPlanner.executeKnnJoin(plan, batch, embs,
          "vec_id", "embedding", "vec_id", "embedding", k = 3)
      }.getMessage.contains("no IVF index"))
  }

  test("degenerate inputs fail loudly") {
    intercept[IllegalArgumentException] {
      AnnPlanner.planKnn(0L, dim, k = 10)
    }
    intercept[IllegalArgumentException] {
      AnnPlanner.planKnn(n, dim, k = 0)
    }
    intercept[IllegalArgumentException] {
      AnnPlanner.planKnn(n, dim, k = 10, filterSelectivity = Some(1.5))
    }
    intercept[IllegalArgumentException] {
      AnnPlanner.planKnn(n, dim, k = 10,
        assets = AnnPlanner.AnnAssets(prefixDims = dim + 1))
    }
    intercept[IllegalArgumentException] {
      AnnPlanner.AnnDepths(ivfMassFraction = 0.0)
    }
  }

  // ---- measurement instruments: the measured depth is minimal-covering

  // queryVec ("planner probe") hashes to all-zero on the 32-dim prefix —
  // exactly the degenerate probe knnPrefix/mrlCoarseKey refuse — so the
  // measurement sample uses a prefix-bearing embedded query instead
  private lazy val measureVec =
    graft.embed.Embedder.default.embed("nuggets para desayuno")
  private lazy val sampleQueries: Seq[(Long, Array[Double])] =
    (100L, measureVec) +: embs.orderBy("vec_id").limit(3)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  private def exactIds(qv: Array[Double], k: Int): Seq[Long] =
    VectorSearch.knn(embs, "vec_id", "embedding", qv, k)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq

  test("measureMrlDepth: measured overfetch covers every sampled query; one less does not") {
    val k = 5
    val d = AnnPlanner.measureMrlDepth(embs, "vec_id", "embedding",
      sampleQueries, k, prefixDims = 32)
    assert(d.measuredAtN === n)
    val depth = math.ceil(d.fraction * n).toInt
    assert(depth >= k && depth < n, s"degenerate measured depth $depth")
    for ((_, qv) <- sampleQueries) {
      val routed = VectorSearch.knnPrefix(embs, "vec_id", "embedding", qv,
          k, prefixDims = 32, overfetch = depth)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
      assert(routed === exactIds(qv, k), "measured depth must cover")
    }
    // minimality: at depth - 1 at least one sampled query loses a member
    val undershot = sampleQueries.exists { case (_, qv) =>
      VectorSearch.knnPrefix(embs, "vec_id", "embedding", qv, k,
          prefixDims = 32, overfetch = depth - 1)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
        .toSeq !== exactIds(qv, k)
    }
    assert(undershot, "measured depth is the max member rank — one " +
      "shallower must lose that member for its query")
  }

  test("measurePqDepth: measured ADC overfetch covers; one less does not") {
    val k = 5
    val d = AnnPlanner.measurePqDepth(pq, embs, "vec_id", "embedding",
      sampleQueries, k)
    val depth = math.ceil(d.fraction * n).toInt
    assert(depth >= k && depth < n, s"degenerate measured depth $depth")
    for ((_, qv) <- sampleQueries) {
      val routed = Pq.ann(pq, embs, "vec_id", "embedding", qv, k,
          overfetch = depth, forceRerank = true)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
      assert(routed === exactIds(qv, k), "measured depth must cover")
    }
    val undershot = sampleQueries.exists { case (_, qv) =>
      Pq.ann(pq, embs, "vec_id", "embedding", qv, k,
          overfetch = depth - 1, forceRerank = true)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
        .toSeq !== exactIds(qv, k)
    }
    assert(undershot)
  }

  test("measureIvfDepth: measured probe mass covers; below the last needed cluster does not") {
    val k = 5
    val d = AnnPlanner.measureIvfDepth(ivf, embs, "vec_id", "embedding",
      sampleQueries, k)
    val mass = math.ceil(d.fraction * n).toInt
    assert(mass >= k && mass <= n)
    for ((_, qv) <- sampleQueries) {
      val routed = Ivf.ann(ivf, embs, "vec_id", "embedding", qv, k,
          numCandidates = mass)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
      assert(routed === exactIds(qv, k), "measured mass must cover")
    }
    // minimality: drop the deepest picked cluster (probe strictly below
    // the measured mass) — some sampled query must lose a member
    val undershot = sampleQueries.exists { case (_, qv) =>
      val picked = Ivf.probeSet(ivf, qv, mass)
      val below = picked.dropRight(1)
        .map(cid => ivf.sizes.getOrElse(cid, 0L)).sum.toInt
      below > 0 && (Ivf.ann(ivf, embs, "vec_id", "embedding", qv, k,
          numCandidates = below)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
        .toSeq !== exactIds(qv, k))
    }
    assert(undershot, "the measured mass ends at some query's deepest " +
      "member cluster — probing below it must lose that member")
  }

  test("measureExtendFraction: the recorded fraction prices the pass-2 volume; sidecar roundtrip") {
    import graft.index.IndexStore
    val ivfR = Ivf.build(embs, "vec_id", "embedding") // with radii
    val batch = embs.where(col("vec_id") < 20)
    val d = AnnPlanner.measureExtendFraction(ivfR, batch, embs,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, probeMass = 0.5)
    assert(d.fraction >= 0 && d.fraction <= 1)
    assert(d.measuredAtN === n)
    // the stats the fraction summarizes: extensionMass is the summed size
    // of extended clusters, so fraction * (nq * n) reconstructs it
    val (_, stats) = Ivf.knnJoinExactWithStats(ivfR, batch, embs,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, probeMass = 0.5)
    assert(math.round(d.fraction * 20 * n) === stats.extensionMass)
    // named sidecar roundtrip next to a depth record — the two coexist
    val dir = java.nio.file.Files.createTempDirectory("extsidecar").toString
    IndexStore.saveDepth(spark, dir,
      IndexStore.DepthRecord(0.4, n, 3))
    IndexStore.saveDepth(spark, dir, d, name = "extend")
    assert(IndexStore.loadDepth(spark, dir).get.fraction === 0.4)
    assert(IndexStore.loadDepth(spark, dir, name = "extend").get === d)
  }

  test("adviseBuild: break-even arithmetic, workload flips, losing path never recommended") {
    val cand = AnnPlanner.AnnAssets(ivfClusters = 100, pqM = 8,
      prefixDims = 32)
    // measured-style depths (a trained deployment's shallow fractions) —
    // at the conservative fixture defaults the MRL path prices exactly
    // the exact scan (n·32 + n/2·64 = n·64) and saves nothing, which is
    // itself the advisor's honest answer; the flips need real savings
    val measured = AnnPlanner.AnnDepths(ivfMassFraction = 0.1,
      pqOverfetchFraction = 0.05, mrlOverfetchFraction = 0.05)
    val bigN = 10000000L
    // consistency with planKnn's own table: savings = exact − path row
    val table = AnnPlanner.planKnn(bigN, dim, k = 10, assets = cand,
      depths = measured).costs.toMap
    val advice = AnnPlanner.adviseBuild(bigN, dim, k = 10,
      queriesPerWave = 1000L, candidates = cand, depths = measured)
    assert(advice.map(_.asset).toSet === Set("ivf", "pq", "prefix"))
    for (a <- advice; if a.perQuerySavings > 0) {
      val path = Map("ivf" -> "ivfProbe", "pq" -> "pqAdc",
        "prefix" -> "mrlPrefix")(a.asset)
      assert(a.perQuerySavings === table("exactScan") - table(path))
      assert(a.queriesToBreakEven === a.buildCost / a.perQuerySavings)
    }
    // the cheap one-pass prefix build amortizes over a small workload...
    val prefix = advice.find(_.asset == "prefix").get
    assert(prefix.recommend,
      s"prefix build should pay at 1000 q/wave: $prefix")
    // ...and every recommendation flips off when the workload vanishes
    val idle = AnnPlanner.adviseBuild(bigN, dim, k = 10,
      queriesPerWave = 0L, candidates = cand, depths = measured)
    assert(idle.forall(!_.recommend))
    // a longer horizon amortizes an expensive build the single wave
    // could not: the IVF k-means bill needs more queries than one wave
    val ivfOneWave = advice.find(_.asset == "ivf").get
    assert(!ivfOneWave.recommend,
      s"the IVF k-means bill should exceed one 1000-query wave: $ivfOneWave")
    val long = AnnPlanner.adviseBuild(bigN, dim, k = 10,
      queriesPerWave = 1000L,
      horizonWaves = 2 * ivfOneWave.queriesToBreakEven / 1000L,
      candidates = cand, depths = measured)
    assert(long.find(_.asset == "ivf").get.recommend)
    // a path priced WORSE than the exact scan is never recommended: at a
    // tiny corpus the IVF centroid scan alone exceeds one exact pass
    val losing = AnnPlanner.adviseBuild(64L, dim, k = 10,
      queriesPerWave = Long.MaxValue / 4, candidates = cand,
      depths = measured)
    val lost = losing.filter(_.perQuerySavings <= 0)
    assert(lost.nonEmpty, s"expected a losing path at n=64: $losing")
    assert(lost.forall(!_.recommend))
    assert(lost.forall(_.queriesToBreakEven.isPosInfinity))
  }

  // ---------------------------------------- range (radius) planner — r13

  test("planRange: argmin over the two exact paths; caps and refusals") {
    import graft.pipeline.Contamination
    // spread geometry (measured fraction ~= 1): the literal scan wins —
    // the ball cover pays the centroid term for no pruning
    val spread = AnnPlanner.planRange(nQueries = 100, n = 100000, dim = 64,
      threshold = 0.4, assets = AnnPlanner.AnnAssets(ivfClusters = 316),
      candidateMassFraction = 1.0)
    assert(spread.path === "literalScan")
    assert(spread.costs.toMap.keySet === Set("literalScan", "ballCoverRange"))
    // clustered geometry (measured fraction small): the pruned range
    // join wins by ~the fraction
    val clustered = AnnPlanner.planRange(nQueries = 100, n = 100000,
      dim = 64, threshold = 0.9,
      assets = AnnPlanner.AnnAssets(ivfClusters = 316),
      candidateMassFraction = 0.05)
    assert(clustered.path === "ballCoverRange")
    // past the plan-literal cap the literal path is structurally
    // unavailable — the ball cover is the only path, at ANY fraction
    val big = AnnPlanner.planRange(
      nQueries = Contamination.MaxLiteralEval + 1L, n = 100000, dim = 64,
      threshold = 0.4, assets = AnnPlanner.AnnAssets(ivfClusters = 316),
      candidateMassFraction = 1.0)
    assert(big.path === "ballCoverRange")
    assert(big.costs.size === 1)
    // ... and with no IVF either, the planner refuses loudly instead of
    // inventing a path
    val e = intercept[IllegalArgumentException] {
      AnnPlanner.planRange(nQueries = Contamination.MaxLiteralEval + 1L,
        n = 100000, dim = 64, threshold = 0.4)
    }
    assert(e.getMessage.contains("no range path available"))
    intercept[IllegalArgumentException](
      AnnPlanner.planRange(10, 100, 8, threshold = 1.5))
    intercept[IllegalArgumentException](
      AnnPlanner.planRange(10, 100, 8, 0.4, candidateMassFraction = 1.5))
  }

  test("measureRangeMassFraction equals the range join's own receipts; zero corpus touch") {
    val queries = embs.where(col("vec_id") % 41 === 0)
    val thr = 0.4
    val frac = AnnPlanner.measureRangeMassFraction(ivf, queries,
      "vec_id", "embedding", thr)
    val (_, stats) = Ivf.rangeJoinExactWithStats(ivf, queries, embs,
      "vec_id", "embedding", "vec_id", "embedding", thr)
    val fromStats = stats.candidateMass.toDouble /
      (queries.count().toDouble * stats.totalMass)
    assert(math.abs(frac - fromStats) < 1e-12,
      s"instrument $frac vs receipts $fromStats")
    // zero-norm probe refused, same as the join it prices for
    import spark.implicits._
    val zq = Seq((9L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      AnnPlanner.measureRangeMassFraction(ivf, zq, "vec_id", "embedding",
        thr))
  }

  test("executeRange: both dispatched paths return identical rows; missing asset refuses") {
    val queries = embs.where(col("vec_id") % 41 === 0)
    val corpus = embs.where(col("vec_id") % 41 =!= 0)
    val thr = 0.4
    def run(path: String) = AnnPlanner.executeRange(
        AnnPlanner.RangePlan(path, 0.0, Seq.empty, Seq.empty),
        queries, corpus, "vec_id", "embedding", "vec_id", "embedding",
        thr, ivf = Some(ivf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(run("literalScan") === run("ballCoverRange"))
    assert(run("literalScan").nonEmpty, "fixture must have qualifying pairs")
    intercept[IllegalArgumentException](AnnPlanner.executeRange(
      AnnPlanner.RangePlan("ballCoverRange", 0.0, Seq.empty, Seq.empty),
      queries, corpus, "vec_id", "embedding", "vec_id", "embedding", thr))
    intercept[IllegalArgumentException](AnnPlanner.executeRange(
      AnnPlanner.RangePlan("warp", 0.0, Seq.empty, Seq.empty),
      queries, corpus, "vec_id", "embedding", "vec_id", "embedding", thr,
      ivf = Some(ivf)))
  }
}
