package graft

import scala.util.Random

import graft.dedup.Planner
import graft.index.IndexStore
import graft.search.AnnPlanner
import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property sweeps over the planners' and advisors' pure
  * arithmetic — hundreds of shapes per contract instead of the spec
  * suites' hand-picked fixtures (the offline cache has no
  * scalatest-scalacheck bridge, so these are deterministic seeded loops:
  * same cases every run, shrink-by-rerun with the printed seed case).
  * Every property here is an identity or inequality the planner's OWN
  * scaladoc promises; a regression that holds on the fixtures but breaks
  * on some shape shows up as the failing case's parameters. */
class ArithmeticPropertySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("planKnn: winner is its own table's argmin; knobs clamp at k; filtered exact prices sel·n·dim") {
    val rnd = new Random(42)
    for (i <- 1 to 300) {
      val n = 1000L + rnd.nextInt(1000000000)
      val dim = 8 + rnd.nextInt(1016)
      val k = 1 + rnd.nextInt(100)
      val assets = AnnPlanner.AnnAssets(
        ivfClusters = rnd.nextInt(3) match {
          case 0 => 0L; case _ => 10L + rnd.nextInt(10000) },
        pqM = if (rnd.nextBoolean()) 4 + rnd.nextInt(60) else 0,
        prefixDims = if (rnd.nextBoolean()) 1 + rnd.nextInt(dim) else 0)
      val depths = AnnPlanner.AnnDepths(
        0.001 + rnd.nextDouble() * 0.999,
        0.001 + rnd.nextDouble() * 0.999,
        0.001 + rnd.nextDouble() * 0.999)
      val sel = if (rnd.nextBoolean()) Some(0.001 + rnd.nextDouble() * 0.999)
                else None
      val plan = AnnPlanner.planKnn(n, dim, k, assets, depths,
        filterSelectivity = sel)
      val ctx = s"case $i: n=$n dim=$dim k=$k $assets $depths sel=$sel"
      assert(plan.path === plan.costs.minBy(_._2)._1, ctx)
      val tbl = plan.costs.toMap
      assert(plan.estimatedScanUnits === tbl(plan.path), ctx)
      // exactScan always in the table, priced sel·n·dim
      assert(tbl("exactScan") === sel.getOrElse(1.0) * n.toDouble * dim, ctx)
      // engine knobs never fall below k (a probe shallower than k cannot
      // return k rows)
      if (plan.path == "ivfProbe") assert(plan.numCandidates >= k, ctx)
      if (plan.path == "pqAdc" || plan.path == "mrlPrefix")
        assert(plan.overfetch >= k, ctx)
      // the exact contract overrides the whole table
      val exact = AnnPlanner.planKnn(n, dim, k, assets, depths,
        exact = true, filterSelectivity = sel)
      assert(exact.path === "exactScan", ctx)
    }
  }

  test("maintenance-wave marker namespaces are pairwise disjoint and avoid append/compaction ids") {
    // the whole deletion/split/merge safety argument rests on this
    // arithmetic: no delete, split, or merge wave id can ever collide
    // with an append/stream id (≥ 0), the compaction base (−1), or a
    // wave of ANOTHER kind — a collision would either silently no-op an
    // erasure or make a layout repair recover the wrong wave's children
    val rnd = new Random(44)
    val seen = scala.collection.mutable.Map.empty[Long, String]
    for (i <- 1 to 3000) {
      val n = if (i <= 100) (i - 1).toLong else math.abs(rnd.nextLong()) % (1L << 40)
      for ((kind, mid) <- Seq(
          "delete" -> IndexStore.deleteMarkerId(n),
          "split" -> IndexStore.splitMarkerId(n),
          "merge" -> IndexStore.mergeMarkerId(n))) {
        assert(mid <= -2, s"$kind($n)=$mid must sit below the " +
          "compaction base")
        val key = s"$kind#$n"
        seen.get(mid).foreach(prev =>
          assert(prev == key, s"collision: $prev and $key both map " +
            s"to marker $mid"))
        seen(mid) = key
      }
    }
  }

  test("planCosine: exact contract has zero miss; banded regimes hold the declared budget") {
    val rnd = new Random(43)
    for (i <- 1 to 300) {
      val thr = 0.05 + rnd.nextDouble() * 0.93
      val n = 1000L + rnd.nextInt(100000000)
      val dim = 8 + rnd.nextInt(1016)
      val budget = math.pow(10, -(1 + rnd.nextInt(5)))
      val ivf = rnd.nextBoolean()
      val ctx = s"case $i: thr=$thr n=$n dim=$dim budget=$budget ivf=$ivf"
      val ex = Planner.planCosine(thr, n, dim, budget, ivf, exact = true)
      assert(ex.missProb === 0.0, ctx)
      assert(ex.path === (if (ivf) "cosinePairsBallCover" else "cosinePairs"),
        ctx)
      // the banded grid either meets its own budget or fails loudly
      // (the infeasible-budget contract) — never a silent worst layout
      try {
        val banded = Planner.planCosine(thr, n, dim, budget, ivf)
        if (thr >= Planner.SelectiveFloor) {
          assert(banded.path.startsWith("cosinePairsLshSelective"), ctx)
          assert(banded.missProb <= budget,
            s"$ctx: grid layout busts its own budget: $banded")
        }
      } catch {
        case e: IllegalArgumentException =>
          assert(thr >= Planner.SelectiveFloor,
            s"$ctx: only the selective grid may refuse: ${e.getMessage}")
      }
    }
  }

  test("adviseBuild: recommendations respect their own break-even; losing paths never recommended") {
    val rnd = new Random(44)
    for (i <- 1 to 300) {
      val n = 10000L + rnd.nextInt(1000000000)
      val dim = 8 + rnd.nextInt(1016)
      val k = 1 + rnd.nextInt(50)
      val qpw = rnd.nextInt(3) match {
        case 0 => 0L; case 1 => rnd.nextInt(1000).toLong
        case _ => rnd.nextInt(100000000).toLong }
      val horizon = 0.5 + rnd.nextDouble() * 99.5
      val cand = AnnPlanner.AnnAssets(
        ivfClusters = 10L + rnd.nextInt(10000),
        pqM = 4 + rnd.nextInt(60), prefixDims = 1 + rnd.nextInt(dim))
      val depths = AnnPlanner.AnnDepths(
        0.001 + rnd.nextDouble() * 0.999,
        0.001 + rnd.nextDouble() * 0.999,
        0.001 + rnd.nextDouble() * 0.999)
      val table = AnnPlanner.planKnn(n, dim, k, cand, depths).costs.toMap
      val advice = AnnPlanner.adviseBuild(n, dim, k, qpw, horizon, cand,
        depths)
      val ctx = s"case $i: n=$n dim=$dim k=$k qpw=$qpw horizon=$horizon"
      assert(advice.map(_.asset).sorted === Seq("ivf", "pq", "prefix"), ctx)
      for (a <- advice) {
        val path = Map("ivf" -> "ivfProbe", "pq" -> "pqAdc",
          "prefix" -> "mrlPrefix")(a.asset)
        assert(a.perQuerySavings === table("exactScan") - table(path),
          s"$ctx ${a.asset}")
        assert(a.buildCost > 0, s"$ctx ${a.asset}")
        if (a.perQuerySavings <= 0) {
          assert(!a.recommend && a.queriesToBreakEven.isPosInfinity,
            s"$ctx ${a.asset}: a losing path must never be recommended")
        } else {
          assert(a.queriesToBreakEven === a.buildCost / a.perQuerySavings,
            s"$ctx ${a.asset}")
          assert(a.recommend ===
            (qpw.toDouble * horizon >= a.queriesToBreakEven),
            s"$ctx ${a.asset}: $a")
        }
      }
    }
  }

  test("histSelectivity: aligned ranges exact, any range within edge-bucket mass, over random data") {
    val rnd = new Random(45)
    val h = IndexStore.HistSpec(0L, 640L, 16)
    for (ds <- 1 to 4) {
      // mixtures of uniform + clumped values, with under/overflow strays
      val vals: Seq[Long] = Seq.fill(400)(rnd.nextInt(3) match {
        case 0 => rnd.nextInt(700) - 30   // strays below 0 / above 640
        case 1 => 200 + rnd.nextInt(120)  // clump
        case _ => rnd.nextInt(640)
      }).map(_.toLong)
      // stats relation built from pure bucket counts (the save path has
      // its own spec; this sweeps the ESTIMATOR)
      val stats = vals
        .map(v => if (v < 0) -1L else if (v >= 640) 16L else v / 40)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case (b, c) => ("x", b.toString, c) }
        .toDF("field", "value", "cnt")
        .localCheckpoint(true)
      val n = vals.size.toDouble
      for (r <- 1 to 15) {
        val a = rnd.nextInt(640).toLong
        val b = a + 1 + rnd.nextInt((640 - a).toInt)
        val truth = vals.count(v => v >= a && v < b) / n
        val est = IndexStore.histSelectivity(stats, "x", h, a, b)
        val loEdge = a / 40 * 40
        val hiEdge = math.min(640, (b + 39) / 40 * 40)
        val edgeMass = vals.count(v =>
          (v >= loEdge && v < math.min(loEdge + 40, 640)) ||
          (v >= math.max(hiEdge - 40, 0) && v < hiEdge)) / n
        val ctx = s"ds=$ds range=[$a,$b) truth=$truth est=$est"
        if (a % 40 == 0 && b % 40 == 0) assert(est === truth, ctx)
        else assert(math.abs(est - truth) <= edgeMass + 1e-12, ctx)
      }
    }
  }

  test("planCompaction: identities and workload monotonicity on a real appended index") {
    val rnd = new Random(46)
    val dir = java.nio.file.Files.createTempDirectory("compprop").toString
    val embs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").limit(60).localCheckpoint(true)
    IndexStore.saveSignLsh(
      graft.dedup.Dedup.signLshSketches(
        embs.where($"vec_id" % 2 === 0), "vec_id", "embedding", 64),
      dir, source = Some((embs.where($"vec_id" % 2 === 0),
        "vec_id", "embedding")))
    IndexStore.appendBatchSignLsh(embs.where($"vec_id" % 2 === 1),
      "vec_id", "embedding", 64, dir, 0L)
    for (i <- 1 to 12) {
      val q = rnd.nextInt(1000000).toLong
      val horizon = 0.5 + rnd.nextDouble() * 9.5
      val p = IndexStore.planCompaction(spark, dir, "sign-lsh", q, horizon)
      val ctx = s"case $i: q=$q horizon=$horizon $p"
      assert(p.batches === 2, ctx)
      assert(p.foldCost === 2.0 * p.totalRows, ctx)
      assert(p.savingsPerWave === q.toDouble * p.perQueryExtraCost, ctx)
      // the recommend identity IS the monotonicity proof: recommend ⇔
      // q·extra·horizon ≥ foldCost, left side monotone in q and horizon
      assert(p.recommend ===
        (p.savingsPerWave * horizon >= p.foldCost && p.batches > 1), ctx)
    }
  }
}
