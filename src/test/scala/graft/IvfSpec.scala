package graft

import graft.embed.Embedder
import graft.index.Ivf
import graft.search.VectorSearch
import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: exhaustive probe ≡ exact search; sub-exhaustive probe keeps
  * high recall at a fraction of the scan (SURVEY §7.2 step 9). */
class IvfSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val embs = Tables.embeddings(spark, Sf0001).cache()
  private lazy val index = Ivf.build(embs, "vec_id", "embedding")
  private val query = Embedder.default.embed("nuggets para desayuno")

  test("index partitions all vectors across ~sqrt(N) clusters") {
    assert(index.sizes.values.sum === embs.count())
    assert(index.centroids.size === math.ceil(math.sqrt(embs.count().toDouble)).toInt)
  }

  test("exhaustive probe returns exactly the exact-kNN result") {
    val exact = VectorSearch.knn(embs, "vec_id", "embedding", query, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val ann = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = Int.MaxValue)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann === exact)
  }

  test("probe set grows with numCandidates and stays nearest-first") {
    val small = Ivf.probeSet(index, query, 10)
    val big = Ivf.probeSet(index, query, 200)
    assert(small.size <= big.size)
    assert(big.startsWith(small))
  }

  test("IVF-routed batch kNN join at exhaustive depth equals the exact knnJoin") {
    import org.apache.spark.sql.functions.col
    val queries = embs.where(col("vec_id") < 20)
    val exact = VectorSearch.knnJoin(queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    // default exhaustive call SHORT-CIRCUITS: no probe pairs, no
    // assignments join — the plan is the exact join's plan
    val routedDf = Ivf.knnJoin(index, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3,
        numCandidates = Int.MaxValue)
      .orderBy("query_id", "rank")
    assert(!routedDf.queryExecution.optimizedPlan.toString.contains("cluster"),
      "exhaustive depth must skip the assignments routing entirely")
    assert(routedDf.collect().toSeq === exact)
    // forceRoute (the verification mode) runs the FULL routed plan at the
    // same depth — assignments join and all — and still returns the exact
    // result (corpus == indexed table, so coverage holds)
    val forced = Ivf.knnJoin(index, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3,
        numCandidates = Int.MaxValue, forceRoute = true)
      .orderBy("query_id", "rank")
    assert(forced.queryExecution.optimizedPlan.toString.contains("cluster"),
      "forceRoute must keep the assignments routing in the plan")
    assert(forced.collect().toSeq === exact)
  }

  test("IVF-routed batch kNN join: sub-exhaustive probe keeps recall, scans a fraction") {
    import org.apache.spark.sql.functions.col
    val queries = embs.where(col("vec_id") < 20)
    val nCand = VectorSearch.numCandidatesCli(3) // max(k*5, 200) = 200 of 500
    val exactPairs = VectorSearch.knnJoin(queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val routedPairs = Ivf.knnJoin(index, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3,
        numCandidates = nCand)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (exactPairs & routedPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.7, s"recall $recall")
    // and the probe really does restrict the candidate set: every query's
    // probe set must be a strict subset of the clusters
    val probe = Ivf.probeSet(index, query, nCand)
    assert(probe.size < index.centroids.size)
  }

  test("knnJoin (exact and IVF-routed) refuses an unbounded query batch, loudly") {
    import org.apache.spark.sql.functions.{array, col, lit}
    val big = spark.range(VectorSearch.MaxQueryBatch + 1)
      .select(col("id"), array(lit(1.0), lit(0.0)).as("emb"))
    val small = spark.range(4)
      .select(col("id"), array(lit(1.0), lit(0.0)).as("emb"))
    val e1 = intercept[IllegalArgumentException] {
      VectorSearch.knnJoin(big, small, "id", "emb", "id", "emb", k = 1)
    }
    assert(e1.getMessage.contains("cosinePairsLsh"),
      "the failure must point at the all-pairs LSH alternative")
    val e2 = intercept[IllegalArgumentException] {
      Ivf.knnJoin(index, big, small, "id", "emb", "id", "emb",
        k = 1, numCandidates = 10)
    }
    assert(e2.getMessage.contains("Ivf.knnJoin"))
  }

  test("IVF-routed knnJoin enforces the index metric and dimension contract") {
    import org.apache.spark.sql.functions.{array, col, lit}
    val queries = embs.where(col("vec_id") < 3)
    val dot = index.copy(metric = "dotProduct")
    assert(intercept[IllegalArgumentException] {
      Ivf.knnJoin(dot, queries, embs, "vec_id", "embedding",
        "vec_id", "embedding", k = 3, numCandidates = 10)
    }.getMessage.contains("cosine"))
    val wrongDim = spark.range(2)
      .select(col("id"), array(lit(1.0), lit(0.0)).as("emb"))
    assert(intercept[IllegalArgumentException] {
      Ivf.knnJoin(index, wrongDim, embs, "id", "emb",
        "vec_id", "embedding", k = 3, numCandidates = 10)
    }.getMessage.contains("numDimensions"))
  }

  test("sub-exhaustive probe recall@10 >= 0.7 while scanning a fraction") {
    val exact = VectorSearch.knn(embs, "vec_id", "embedding", query, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val nCand = VectorSearch.numCandidatesCli(10) // max(k*5, 200) = 200 of 500
    val probe = Ivf.probeSet(index, query, nCand)
    val scanned = probe.map(index.sizes(_)).sum
    assert(scanned < embs.count(), "probe should not scan everything")
    val ann = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = nCand)
      .select("vec_id").as[Long].collect().toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("knnJoinExact equals the exact join at EVERY probe mass (ball-cover bound)") {
    import org.apache.spark.sql.functions.col
    // radii metadata: a real ball radius for every non-empty cluster
    assert(index.radii.keySet === index.sizes.filter(_._2 > 0).keySet)
    assert(index.radii.values.forall(r => r >= 0 && r <= Ivf.TrivialRadius))
    val queries = embs.where(col("vec_id") < 20)
    val exact = VectorSearch.knnJoin(queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    for (mass <- Seq(0.2, 0.5, 0.9)) {
      val (routed, stats) = Ivf.knnJoinExactWithStats(index, queries, embs,
          "vec_id", "embedding", "vec_id", "embedding", k = 3,
          probeMass = mass)
      // the routed plan ran (pass-1 probed real clusters), and at
      // sub-exhaustive mass it probed a strict subset of the index
      assert(stats.probedClusters > 0)
      if (mass < 0.9)
        assert(stats.probedClusters < stats.nonEmptyClusters,
          s"probeMass=$mass should leave clusters for the bound to rule out: $stats")
      assert(routed.orderBy("query_id", "rank").collect().toSeq === exact,
        s"ball-cover-pruned join diverged from exact at probeMass=$mass ($stats)")
    }
  }

  test("knnJoinExact: a zero-norm query fails loudly on BOTH paths, never silently diverges") {
    import org.apache.spark.sql.functions.col
    // every cosine against a zero vector is 0/0. Under Spark's default
    // ANSI mode that is a loud DIVIDE_BY_ZERO on the exact join AND on
    // the routed pass-1 — the acceptable outcome. The unacceptable one
    // (guarded by the NaN→-∞ collapse on the kth-best, which non-ANSI
    // deployments would hit) is pass-1 quietly producing NaN sims whose
    // NaN kth-best fails every >= bound check and disables the extension
    // exactly where cosUpperBound returns the never-prune 1.0 — an
    // "exact" join silently restricted to pass-1 clusters.
    val dim = embs.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val queries = Seq((999L, Seq.fill(dim)(0.0))).toDF("vec_id", "embedding")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val eExact = intercept[Exception] {
      VectorSearch.knnJoin(queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3).collect()
    }
    assert(messages(eExact).contains("DIVIDE_BY_ZERO"), messages(eExact))
    // pass-1 runs eagerly inside the call, so the routed path raises at
    // call time — same error, not a quietly-narrower result
    val eRouted = intercept[Exception] {
      Ivf.knnJoinExactWithStats(index, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, probeMass = 0.2)
    }
    assert(messages(eRouted).contains("DIVIDE_BY_ZERO"), messages(eRouted))
  }

  test("knnJoinExact prunes far clusters when geometry allows (angular two-group corpus)") {
    // two tight angular groups, near-opposite directions: queries from
    // group A never need group B's clusters — their cos upper bound is far
    // below the pass-1 kth-best, so the bounded extension must not re-add
    // them and the final member scan's IN-list stays a strict subset
    val rows =
      (0 until 40).map { i => (i.toLong,
        Seq(1.0, 0.05 * (i % 5), 0.03 * (i % 3))) } ++
      (40 until 80).map { i => (i.toLong,
        Seq(-1.0, -0.05 * (i % 5), 0.03 * (i % 3))) }
    val df = rows.toDF("id", "emb")
    // persist so the member scan is a real parquet FileScan — on an
    // in-memory corpus Catalyst constant-folds the isin into a
    // LocalRelation and the pruning would be invisible to the plan
    val dir = java.nio.file.Files.createTempDirectory("ivfexact").toString
    graft.index.IndexStore.saveIvf(
      Ivf.build(df, "id", "emb", numClusters = 8), dir)
    val idx = graft.index.IndexStore.loadIvf(spark, dir)
    val queries = df.where($"id" < 5)
    val exact = VectorSearch.knnJoin(queries, df, "id", "emb", "id", "emb", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val (routed, stats) = Ivf.knnJoinExactWithStats(idx, queries, df,
      "id", "emb", "id", "emb", k = 3, probeMass = 0.4)
    assert(routed.orderBy("query_id", "rank").collect().toSeq === exact)
    // pass-1 probed a strict subset (the group-A clusters), and the
    // bound ruled group B out entirely — no extension fired, so the
    // final pass is the collected survivors alone: its plan must not
    // touch the assignments parquet (or the corpus) at all
    assert(stats.probedClusters < stats.nonEmptyClusters,
      s"probeMass=0.4 should probe a strict cluster subset: $stats")
    assert(stats.extensionPairs === 0,
      s"far clusters' cos upper bound must stay below s_k: $stats")
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("assignments"),
      s"extension-free final pass must not re-scan the inverted file:\n$plan")
  }

  test("filtered ANN: preFilter prunes BEFORE top-k on both plans (Atlas filter placement)") {
    import org.apache.spark.sql.functions.col
    val filteredExact = VectorSearch.knn(embs.where(col("label") === 3),
        "vec_id", "embedding", query, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    // a post-filter of the UNfiltered top-10 would return fewer rows and
    // different ids — assert the pre-filter result has full depth
    assert(filteredExact.size === 10)
    // short-circuited exhaustive plan
    val viaShortCircuit = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = Int.MaxValue,
        preFilter = Some(col("label") === 3))
      .select("vec_id").as[Long].collect().toSeq
    assert(viaShortCircuit === filteredExact)
    // forceRoute: the member-semi-join plan genuinely executes with the
    // filter and still yields the exact filtered top-k at full probe depth
    val viaRoute = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = Int.MaxValue,
        preFilter = Some(col("label") === 3), forceRoute = true)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaRoute === filteredExact)
    // sub-exhaustive filtered probe: every hit honors the filter
    val labels = embs.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    val subEx = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = VectorSearch.numCandidatesCli(10),
        preFilter = Some(col("label") === 3))
      .select("vec_id").as[Long].collect().toSeq
    assert(subEx.nonEmpty && subEx.forall(labels(_) === 3))
  }

  test("coverage probe: stale-index corpus rows are found, and loud under selfcheck") {
    import org.apache.spark.sql.functions.{col, lit}
    // a corpus the index has never seen one row of: routing would silently
    // drop it (Atlas semantics — unindexed docs never surface)
    val maxId = embs.agg(org.apache.spark.sql.functions.max("vec_id"))
      .head.getLong(0)
    val ghost = embs.limit(1)
      .select(lit(maxId + 1).cast("long").as("vec_id"), col("embedding"))
    val stale = embs.select("vec_id", "embedding").union(ghost)
    assert(Ivf.coverageHoles(index, embs, "vec_id").isEmpty,
      "the indexed table itself must be fully covered")
    assert(Ivf.coverageHoles(index, stale, "vec_id") === Seq(maxId + 1))
    // production call: silent (the probe would be a per-query tax) …
    val queries = embs.where(col("vec_id") < 5)
    Ivf.knnJoin(index, queries, stale, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, numCandidates = 50).collect()
    // … but at the correctness gate (graft.selfcheck, set by Verify)
    // BOTH routed joins refuse the stale index instead of dropping rows
    sys.props("graft.selfcheck") = "1"
    try {
      val e1 = intercept[IllegalArgumentException] {
        Ivf.knnJoin(index, queries, stale, "vec_id", "embedding",
          "vec_id", "embedding", k = 3, numCandidates = 50)
      }
      assert(e1.getMessage.contains("silently invisible"))
      val e2 = intercept[IllegalArgumentException] {
        Ivf.knnJoinExact(index, queries, stale, "vec_id", "embedding",
          "vec_id", "embedding", k = 3, probeMass = 0.5)
      }
      assert(e2.getMessage.contains("silently invisible"))
      // covered corpus: the gate passes and the join still runs
      Ivf.knnJoin(index, queries, embs, "vec_id", "embedding",
        "vec_id", "embedding", k = 3, numCandidates = 50).collect()
    } finally sys.props.remove("graft.selfcheck")
  }

  private def bruteRangePairs(queries: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame, qId: String, qEmb: String,
      cId: String, cEmb: String, thr: Double): Set[(Long, Long, Double)] = {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    queries
      .select(col(qId).cast("long").as("query_id"),
        col(qEmb).cast("array<double>").as("__qv"))
      .crossJoin(corpus.select(col(cId).cast("long").as("nbr_id"),
        col(cEmb).cast("array<double>").as("__cv")))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(Vectors.cosine(col("__qv"), col("__cv")), 6).as("sim"))
      .where(col("sim") >= thr)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("rangeJoinExact equals the brute-force cosine range join at every threshold") {
    import org.apache.spark.sql.functions.col
    val queries = embs.where(col("vec_id") % 41 === 0)
    for (thr <- Seq(0.2, 0.4, 0.6)) {
      val brute = bruteRangePairs(queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", thr)
      val (routed, stats) = Ivf.rangeJoinExactWithStats(index, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", thr)
      val got = routed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === brute, s"range join diverged from brute at thr=$thr ($stats)")
      // receipts are coherent: candidate volume never exceeds the
      // un-pruned scan, and the mass sums real member counts
      assert(stats.candidateMass <= stats.totalMass * queries.count())
      assert(stats.nonEmptyClusters === index.sizes.count(_._2 > 0))
    }
  }

  test("rangeJoinExact prunes far clusters when geometry allows, exactness intact") {
    // the knnJoinExact two-group fixture, range-search rendition: at a
    // high threshold, group-B clusters' ball bounds sit far below the
    // cut for group-A queries, so the routed scan must skip them — and
    // still return exactly the brute pairs
    val rows =
      (0 until 40).map { i => (i.toLong,
        Seq(1.0, 0.05 * (i % 5), 0.03 * (i % 3))) } ++
      (40 until 80).map { i => (i.toLong,
        Seq(-1.0, -0.05 * (i % 5), 0.03 * (i % 3))) }
    val df = rows.toDF("id", "emb")
    val idx = Ivf.build(df, "id", "emb", numClusters = 8)
    val queries = df.where($"id" < 5)
    val thr = 0.9
    val brute = bruteRangePairs(queries, df, "id", "emb", "id", "emb", thr)
    assert(brute.nonEmpty, "fixture must have qualifying pairs")
    val (routed, stats) = Ivf.rangeJoinExactWithStats(idx, queries, df,
      "id", "emb", "id", "emb", thr)
    val got = routed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute, s"pruned range join diverged ($stats)")
    assert(stats.candidatePairs < 5 * stats.nonEmptyClusters,
      s"group-B clusters must be pruned by the bound: $stats")
    assert(stats.candidateMass < stats.totalMass * 5,
      s"pruned scan mass must undercut the full scan: $stats")
  }

  test("rangeJoinExact refuses zero-norm queries; zero-norm corpus rows report clean") {
    // ADVICE r12: a zero-norm query (qNorm null, bound 1.0, never pruned)
    // or zero-norm corpus row used to reach scoreCandidates with a 0/0
    // cosine — NaN under non-ANSI Spark, which compares GREATER than any
    // threshold, silently flagging every probed pair as contaminated.
    val rows = (0 until 30).map { i =>
      (i.toLong, Seq(1.0 + 0.01 * (i % 5), 0.02 * (i % 3), 0.01 * i))
    } :+ (30L, Seq(0.0, 0.0, 0.0)) // zero-norm corpus row
    val df = rows.toDF("id", "emb")
    val idx = Ivf.build(df, "id", "emb", numClusters = 4)
    // query side: the zero-norm probe refuses loudly
    val zq = Seq((99L, Seq(0.0, 0.0, 0.0))).toDF("id", "emb")
    val e = intercept[IllegalArgumentException] {
      Ivf.rangeJoinExact(idx, zq, df, "id", "emb", "id", "emb", 0.5)
        .collect()
    }
    assert(e.getMessage.contains("zero-norm"))
    // corpus side: the zero-norm member must report CLEAN (absent), and
    // every well-formed pair must still match brute force exactly
    val queries = df.where($"id" < 3)
    val clean = df.where($"id" < 30)
    val brute = bruteRangePairs(queries, clean, "id", "emb", "id", "emb", 0.5)
    val (routed, _) = Ivf.rangeJoinExactWithStats(idx, queries, df,
      "id", "emb", "id", "emb", 0.5)
    val got = routed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(!got.exists(_._2 == 30L),
      "zero-norm corpus row must never be flagged (its cosine is 0/0)")
    assert(got === brute)
  }

  test("rangeJoinExact slicing: bounded probe-pair slices reproduce the one-slice output") {
    // ADVICE r12: degenerate geometry can make EVERY (query, cluster)
    // pair survive the bound — the pair list must never materialize
    // unbounded on the driver. Sliced execution is a plain union of
    // per-pair filters, so any slice size yields identical rows.
    import org.apache.spark.sql.functions.col
    val queries = embs.where(col("vec_id") % 41 === 0)
    val (one, statsOne) = Ivf.rangeJoinExactWithStats(index, queries, embs,
      "vec_id", "embedding", "vec_id", "embedding", 0.4)
    val (sliced, statsSliced) = Ivf.rangeJoinExactWithStats(index, queries,
      embs, "vec_id", "embedding", "vec_id", "embedding", 0.4,
      maxPairsPerSlice = 7)
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(set(sliced) === set(one))
    // receipts are slice-invariant: same pair count, same scanned mass
    assert(statsSliced.candidatePairs === statsOne.candidatePairs)
    assert(statsSliced.candidateMass === statsOne.candidateMass)
    assert(statsOne.candidatePairs > 7, "fixture must actually slice")
  }

  test("rangeJoinExact refuses a non-cosine index and out-of-range thresholds") {
    import org.apache.spark.sql.functions.col
    val queries = embs.where(col("vec_id") < 3)
    val dot = index.copy(metric = "dotProduct")
    val e1 = intercept[IllegalArgumentException] {
      Ivf.rangeJoinExact(dot, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", 0.4)
    }
    assert(e1.getMessage.contains("cosine"))
    val e2 = intercept[IllegalArgumentException] {
      Ivf.rangeJoinExact(index, queries, embs,
        "vec_id", "embedding", "vec_id", "embedding", 1.5)
    }
    assert(e2.getMessage.contains("threshold"))
  }
}
