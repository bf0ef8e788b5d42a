package graft

import graft.dedup.{Dedup, Planner}
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dedup regime planner: formula agreement with the shipped miss-prob
  * functions, regime dispatch across thresholds, budget feasibility of
  * every recommended layout, and the executable link (the planner's
  * winning layout, run through Planner.execute, equals brute force on a
  * planted corpus). */
class PlannerSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("missProb agrees with Dedup.selectiveMissProb / MultiProbe at the shipped layouts") {
    for (t <- Seq(0.85, 0.90, 0.95, 0.99)) {
      assert(math.abs(Planner.missProb(t, 16, 8, multiProbe = false) -
        Dedup.selectiveMissProb(t, 16, 8)) < 1e-15)
      assert(math.abs(Planner.missProb(t, 32, 12, multiProbe = true) -
        Dedup.selectiveMissProbMultiProbe(t, 32, 12)) < 1e-15)
    }
  }

  test("planCosine: every in-regime plan meets its miss budget and actually prunes") {
    for (t <- Seq(0.85, 0.88, 0.90, 0.92, 0.95, 0.99)) {
      val plan = Planner.planCosine(t, n = 1000000L, dim = 64)
      assert(plan.missProb <= 1e-3, s"t=$t: ${plan.missProb}")
      assert(plan.path.startsWith("cosinePairsLshSelective"), s"t=$t: ${plan.path}")
      // the point of planning: the layout prunes the background hard —
      // far better than the shipped single-probe default's 6% admission
      assert(plan.randomPairHitProb < 0.01,
        s"t=$t admits ${plan.randomPairHitProb} of random pairs")
      assert(plan.bands * plan.rows <= 1024)
    }
  }

  test("planCosine: work never increases as the threshold rises") {
    val works = Seq(0.85, 0.88, 0.90, 0.92, 0.95, 0.97, 0.99)
      .map(t => Planner.planCosine(t, n = 1000000L, dim = 64).estimatedWork)
    assert(works.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 },
      s"estimated work must be monotone non-increasing in t: $works")
  }

  test("planCosine: below the selective floor the regime switches, with honest warnings") {
    val semantic = Planner.planCosine(0.45, n = 1000000L, dim = 64,
      ivfAvailable = true)
    assert(semantic.path === "semanticPairs")
    val lsh = Planner.planCosine(0.45, n = 1000000L, dim = 64)
    assert(lsh.path === "cosinePairsLsh")
    assert(lsh.bands === Dedup.SignLshBands && lsh.rows === Dedup.SignLshRows)
    // the recall-first layout admits ~everything — the plan must SAY so
    assert(lsh.randomPairHitProb > 0.95)
    assert(lsh.rationale.exists(_.contains("ALL-PAIRS")))
    // and still be recall-safe at its own threshold
    assert(lsh.missProb < 1e-3)
  }

  test("planCosine: an infeasible budget fails loudly, not with a silent worst layout") {
    // the grid's best achievable miss at cos 0.85 is bounded below by the
    // most-redundant layout (rows=2 multi-probe, bands=128: ~1e-192), so a
    // budget under that is genuinely unmeetable and must throw, not return
    // the least-bad layout as if it qualified
    val e = intercept[IllegalArgumentException] {
      Planner.planCosine(0.85, n = 1000L, dim = 64, missBudget = 1e-300)
    }
    assert(e.getMessage.contains("no selective layout"))
  }

  test("executable link: the planned layout run via execute equals brute force on planted clones") {
    val base = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val embs = base.unionByName(base
        .where($"vec_id" % 7 === 0)
        .withColumn("vec_id", $"vec_id" + 1000000L))
      .localCheckpoint(true)
    val plan = Planner.planCosine(0.95, n = embs.count(), dim = 64)
    val got = Planner.execute(plan, embs, "vec_id", "embedding", 0.95, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val brute = Dedup.cosinePairs(embs, "vec_id", "embedding", 0.95)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got === brute,
      s"plan ${plan.path} ${plan.bands}x${plan.rows} lost pairs vs brute force")
    assert(got.nonEmpty)
    // a plan that needs caller-held state refuses to execute blind
    val sem = Planner.planCosine(0.45, n = 100L, dim = 64, ivfAvailable = true)
    assert(intercept[IllegalArgumentException] {
      Planner.execute(sem, embs, "vec_id", "embedding", 0.45, 64)
    }.getMessage.contains("IVF"))
  }

  test("executeWithIndex: the semanticPairs regime dispatches; index-free plans fall through") {
    val embs = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
      .localCheckpoint(true)
    val ivf = graft.index.Ivf.build(embs, "vec_id", "embedding")
    // below the floor with an index: the one regime execute() cannot run
    val sem = Planner.planCosine(0.60, n = embs.count(), dim = 64,
      ivfAvailable = true)
    assert(sem.path === "semanticPairs")
    val got = Planner.executeWithIndex(sem, ivf, embs, "vec_id", "embedding",
        0.60, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val direct = Dedup.semanticPairs(ivf, embs, "vec_id", "embedding", 0.60)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got === direct)
    // an in-regime (selective) plan takes the same entry point unchanged
    val selPlan = Planner.planCosine(0.95, n = embs.count(), dim = 64,
      ivfAvailable = true)
    assert(selPlan.path.startsWith("cosinePairsLshSelective"))
    val viaIdx = Planner.executeWithIndex(selPlan, ivf, embs, "vec_id",
        "embedding", 0.95, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val viaPlain = Planner.execute(selPlan, embs, "vec_id", "embedding",
        0.95, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(viaIdx === viaPlain)
  }

  test("exact contract: ball cover with an index, loud quadratic without; dispatch equals brute") {
    val embs = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
      .localCheckpoint(true)
    val ivf = graft.index.Ivf.build(embs, "vec_id", "embedding")
    // the exact contract overrides every banded regime at ANY threshold:
    // a banded layout's analytic miss bound is > 0, so none qualifies
    val withIdx = Planner.planCosine(0.45, n = embs.count(), dim = 64,
      ivfAvailable = true, exact = true)
    assert(withIdx.path === "cosinePairsBallCover")
    assert(withIdx.missProb === 0.0)
    val got = Planner.executeWithIndex(withIdx, ivf, embs, "vec_id",
        "embedding", 0.45, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val brute = Dedup.cosinePairs(embs, "vec_id", "embedding", 0.45)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(brute.nonEmpty)
    assert(got === brute)
    // no index: the quadratic baseline is the only exact path, and the
    // plan carries the full pair count as its honest work estimate
    val noIdx = Planner.planCosine(0.45, n = embs.count(), dim = 64,
      exact = true)
    assert(noIdx.path === "cosinePairs")
    assert(noIdx.rationale.exists(_.contains("quadratic")))
    val viaExec = Planner.execute(noIdx, embs, "vec_id", "embedding",
        0.45, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(viaExec === brute)
  }

  test("planIncrementalCosine: budget held in-regime, honest below the floor") {
    for (t <- Seq(0.85, 0.90, 0.95)) {
      val p = Planner.planIncrementalCosine(t, batchN = 10000L,
        indexN = 10000000L, dim = 64)
      assert(p.missProb <= 1e-3, s"t=$t: ${p.missProb}")
      // the screen must prune: background candidates ≪ the 1e4 × 1e7 =
      // 1e11 cross pairs
      assert(p.expectedCandidates < 1e11 * 0.01,
        s"t=$t admits ${p.expectedCandidates} of 1e11 cross pairs")
    }
    val lo = Planner.planIncrementalCosine(0.45, batchN = 100L,
      indexN = 1000L, dim = 64)
    assert(lo.bands === Dedup.SignLshBands && lo.rows === Dedup.SignLshRows)
    assert(lo.randomPairHitProb > 0.95)
    assert(lo.rationale.exists(_.contains("ALL batch")))
  }

  test("executable link: the incremental plan's layout screens batch vs index exactly, with receipts") {
    val base = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    // batch = replicas of every 7th base vector (planted ≥0.90 structure
    // against the index), index = the base corpus — screened at 0.9, the
    // round-8 item's band (the intake threshold a production wave runs)
    val batch = base.where($"vec_id" % 7 === 0)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val embs = base.unionByName(batch).localCheckpoint(true)
    val plan = Planner.planIncrementalCosine(0.90,
      batchN = batch.count(), indexN = base.count(), dim = 64)
    assert(plan.path === "selectiveScreen")
    val bb = Planner.sketchIncremental(plan, batch, "vec_id", "embedding", 64)
    val ib = Planner.sketchIncremental(plan, base, "vec_id", "embedding", 64)
    val (pairs, stats) = Planner.executeIncremental(plan, bb, ib, embs,
      "vec_id", "embedding", 0.90)
    val got = pairs.orderBy("id1", "id2")
      .as[(Long, Long, Double)].collect().toSeq
    // ground truth: exact cosine over ALL directed batch×index pairs
    val allPairs = batch.select($"vec_id".as("id1"))
      .crossJoin(base.select($"vec_id".as("id2")))
    val want = Dedup.cosineVerify(allPairs, embs, "vec_id", "embedding", 0.90)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got === want,
      s"planned ${plan.bands}x${plan.rows} mp=${plan.multiProbe} screen lost pairs")
    assert(got.nonEmpty, "the planted replicas must surface")
    // receipts are coherent: every emitted pair was verified, every
    // verified candidate was a candidate, and the screen PRUNED — far
    // fewer candidates than the batch×index cross
    assert(stats.emittedPairs === got.size.toLong)
    assert(stats.verifiedPairs <= stats.candidatePairs)
    assert(stats.emittedPairs <= stats.verifiedPairs)
    val cross = batch.count() * base.count()
    assert(stats.candidatePairs < cross / 4,
      s"planned screen admitted ${stats.candidatePairs} of $cross cross pairs")
    // the point of planning: the planned layout's measured band-join
    // volume undercuts the shipped recall-first default's at 0.9 (the
    // default admits ~all pairs at ANY threshold — its bands are sized
    // for recall at cos 0.45, not pruning at 0.9)
    val defBatch = Dedup.signLshSketches(batch, "vec_id", "embedding", 64)
    val defIndex = Dedup.signLshSketches(base, "vec_id", "embedding", 64)
    val defaultVolume = Dedup.signLshCandidateVolumeAgainst(defBatch, defIndex)
    assert(stats.budgetedJoinRows < defaultVolume / 5,
      s"planned ${stats.budgetedJoinRows} vs default $defaultVolume band-join rows")
  }

  test("planJaccard: floor arithmetic and regime dispatch") {
    // floor at budget 1e-3 for the 16-sig 4x4 layout: (1-(1e-3)^(1/4))^(1/4)
    val floor = Planner.minhashRecallFloor(1e-3)
    assert(math.abs(floor - math.pow(1.0 - math.pow(1e-3, 0.25), 0.25)) < 1e-12)
    assert(floor > 0.9 && floor < 0.99)
    val hi = Planner.planJaccard(0.97)
    assert(hi.path === "minhashPairs" && hi.missProb <= 1e-3)
    val lo = Planner.planJaccard(0.5)
    assert(lo.path === "jaccardPairsViaContainment")
    assert(lo.missProb === 0.0) // pigeonhole: recall exactly 1
    assert(lo.rationale.exists(_.contains("pigeonhole")))
    // honesty check: the shipped layout really does miss most borderline
    // pairs at J=0.5 — the number the plan quotes
    assert(Planner.minhashMissProb(0.5) > 0.7)
  }

  test("executable link at the 0.85 regime FLOOR: the grid's most aggressive layout equals brute force") {
    // 0.85 is where selective recall is hardest (the weakest-recall band
    // of the clone regime) and where the grid search picks its longest
    // keys — exactly the layouts that had never executed before round 9.
    // Plant a sign-flip family (cos = 1 − 2·v₀²/‖v‖², spread ~0.69–1.0)
    // so pairs STRADDLE the threshold.
    val base = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val embs = base.unionByName(base
        .select(($"vec_id" + 1000000L).as("vec_id"),
          concat(array(negate(element_at($"embedding", 1))),
            slice($"embedding", 2, 63)).as("embedding")))
      .localCheckpoint(true)
    val plan = Planner.planCosine(0.85, n = embs.count(), dim = 64)
    assert(plan.missProb <= 1e-3)
    val got = Planner.execute(plan, embs, "vec_id", "embedding", 0.85, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val brute = Dedup.cosinePairs(embs, "vec_id", "embedding", 0.85)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got === brute,
      s"plan ${plan.path} ${plan.bands}x${plan.rows} mp=${plan.multiProbe} " +
        "lost pairs vs brute force at the floor")
    assert(got.nonEmpty)
  }

  test("executeJaccard: both regimes dispatch and match the quadratic baseline") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    def viaPlan(t: Double) = {
      val plan = Planner.planJaccard(t)
      Planner.executeJaccard(plan, docs, "doc_id", "text", t)
        .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    }
    def brute(t: Double) =
      Dedup.jaccardPairs(docs, "doc_id", "text", t)
        .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    // below the MinHash floor: containment-screened exact Jaccard,
    // recall 1 by pigeonhole — must equal the baseline EXACTLY
    assert(viaPlan(0.5) === brute(0.5))
    assert(viaPlan(0.5).nonEmpty, "fixture has near-dup pairs at J=0.5")
    // above the floor the dispatch goes to minhashPairs (recall within
    // its budget; on this fixture it is exact)
    assert(Planner.planJaccard(0.97).path === "minhashPairs")
    assert(viaPlan(0.97) === brute(0.97))
    // unknown path refuses loudly
    assert(intercept[IllegalArgumentException] {
      Planner.executeJaccard(
        Planner.JaccardPlan("nope", 0.0, 0.5, Nil), docs, "doc_id", "text", 0.5)
    }.getMessage.contains("unknown"))
  }
}
