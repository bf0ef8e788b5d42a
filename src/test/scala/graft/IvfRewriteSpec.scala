package graft

import graft.embed.Embedder
import graft.index.Ivf
import graft.search.VectorSearch
import graft.util.Tables
import org.apache.spark.sql.graftshim.IvfRewrite
import org.scalatest.funsuite.AnyFunSuite

/** The Catalyst IVF rewrite: a registered index turns unchanged exact
  * top-k queries into probe-narrowed scans; unregistering restores exact
  * plans. */
class IvfRewriteSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val path = s"$Sf0001/embeddings.parquet"
  private val query = Embedder.default.embed("nuggets para desayuno")

  private def knn() = VectorSearch.knn(
    Tables.embeddings(spark, Sf0001), "vec_id", "embedding", query, k = 10)

  test("registered index narrows the unchanged exact query to an IVF probe") {
    // another suite may have cached this table; a cached scan plans as an
    // InMemoryRelation, which the path-keyed rewrite intentionally skips
    spark.catalog.clearCache()
    val index = Ivf.build(Tables.embeddings(spark, Sf0001), "vec_id", "embedding")
    try {
      Ivf.registerForRewrite(spark, path, index, "vec_id", numCandidates = 200)
      val df = knn()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains(IvfRewrite.MemberCol),
        s"expected the member semi-join in:\n$optimized")
      // result set must equal the explicit ANN probe at the same depth
      val viaRule = df.select("vec_id").as[Long].collect().toSeq
      IvfRewrite.clear()
      val viaAnn = Ivf.ann(index, Tables.embeddings(spark, Sf0001),
          "vec_id", "embedding", query, k = 10, numCandidates = 200)
        .select("vec_id").as[Long].collect().toSeq
      assert(viaRule === viaAnn)
    } finally IvfRewrite.clear()
  }

  test("without a registered index the plan is untouched and exact") {
    IvfRewrite.clear()
    val df = knn()
    assert(!df.queryExecution.optimizedPlan.toString.contains(IvfRewrite.MemberCol))
    val ids = df.select("vec_id").as[Long].collect().toSeq
    val exact = VectorSearch.knn(Tables.embeddings(spark, Sf0001),
        "vec_id", "embedding", query, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids === exact)
  }

  test("registered filter selectivity: selective filtered top-k is NOT rewritten, unfiltered still is") {
    import org.apache.spark.sql.functions.col
    spark.catalog.clearCache()
    val index = Ivf.build(Tables.embeddings(spark, Sf0001), "vec_id", "embedding")
    try {
      // measured label=3 selectivity ~0.1 on the fixture; the probe depth
      // (200 of 500 ≈ 0.4·n) cannot beat a 0.1·n filtered exact scan, so
      // the planner consult must leave the filtered plan alone…
      Ivf.registerForRewrite(spark, path, index, "vec_id",
        numCandidates = 200, filterSelectivity = Some(0.1))
      val filtered = VectorSearch.knn(Tables.embeddings(spark, Sf0001),
        "vec_id", "embedding", query, k = 10,
        preFilter = Some(col("label") === 3))
      assert(!filtered.queryExecution.optimizedPlan.toString
        .contains(IvfRewrite.MemberCol),
        "selective filtered top-k must keep the exact scan")
      // …and the un-rewritten plan IS the exact filtered result
      val ids = filtered.select("vec_id").as[Long].collect().toSeq
      IvfRewrite.clear()
      val exact = VectorSearch.knn(
          Tables.embeddings(spark, Sf0001).where(col("label") === 3),
          "vec_id", "embedding", query, k = 10)
        .select("vec_id").as[Long].collect().toSeq
      assert(ids === exact)
      // the unfiltered query over the same registration still rewrites
      Ivf.registerForRewrite(spark, path, index, "vec_id",
        numCandidates = 200, filterSelectivity = Some(0.1))
      assert(knn().queryExecution.optimizedPlan.toString
        .contains(IvfRewrite.MemberCol),
        "unfiltered top-k must still route through the probe")
      // with NO measured selectivity the filtered query rewrites as before
      Ivf.registerForRewrite(spark, path, index, "vec_id", numCandidates = 200)
      assert(VectorSearch.knn(Tables.embeddings(spark, Sf0001),
          "vec_id", "embedding", query, k = 10,
          preFilter = Some(col("label") === 3))
        .queryExecution.optimizedPlan.toString.contains(IvfRewrite.MemberCol))
    } finally IvfRewrite.clear()
  }

  test("registered stats catalog prices the predicate itself: equality and histogram ranges flip the rewrite") {
    import org.apache.spark.sql.functions.col
    import graft.index.IndexStore
    val embs = Tables.embeddings(spark, Sf0001)
    val index = Ivf.build(embs, "vec_id", "embedding")
    // catalog with label as a CATEGORICAL field (exact value counts)
    val cdir = java.nio.file.Files.createTempDirectory("rwcat").toString
    IndexStore.saveStats(embs, "vec_id", "embedding", Seq("label"), cdir)
    val cat = IndexStore.collectStats(IndexStore.loadStats(spark, cdir))
    // catalog with label as a width-1 HISTOGRAM (range estimates)
    val hdir = java.nio.file.Files.createTempDirectory("rwhist").toString
    IndexStore.saveStats(embs, "vec_id", "embedding", Seq(), hdir,
      hists = Map("label" -> IndexStore.HistSpec(0L, 10L, 10)))
    val hist = IndexStore.collectStats(IndexStore.loadStats(spark, hdir),
      IndexStore.loadHistSpecs(spark, hdir))
    def planOf(preFilter: org.apache.spark.sql.Column): String =
      VectorSearch.knn(embs, "vec_id", "embedding", query, k = 10,
        preFilter = Some(preFilter)).queryExecution.optimizedPlan.toString
    try {
      // EQUALITY pricing: label = 3 is ~10% selective → the filtered
      // exact scan wins and the rule declines; no scalar selectivity was
      // registered — the catalog priced the predicate itself
      Ivf.registerForRewrite(spark, path, index, "vec_id",
        numCandidates = 200, stats = Some(cat))
      assert(!planOf(col("label") === 3).contains(IvfRewrite.MemberCol),
        "catalog-priced selective equality must keep the exact scan")
      // a predicate the catalog cannot price keeps the prior default
      // (rewrite on the user's explicit recall choice)
      assert(planOf(col("vec_id") > 100L).contains(IvfRewrite.MemberCol),
        "unpriceable predicate must rewrite as before")
      // and the unfiltered query still routes through the probe
      assert(knn().queryExecution.optimizedPlan.toString
        .contains(IvfRewrite.MemberCol))
      // RANGE pricing from the histogram: a narrow band is ~20%
      // selective → exact scan; the full domain is ~100% → probe
      Ivf.registerForRewrite(spark, path, index, "vec_id",
        numCandidates = 200, stats = Some(hist))
      assert(!planOf(col("label") >= 2 && col("label") < 4)
        .contains(IvfRewrite.MemberCol),
        "histogram-priced narrow range must keep the exact scan")
      assert(planOf(col("label") >= 0 && col("label") < 10)
        .contains(IvfRewrite.MemberCol),
        "a full-domain range is unselective and must still probe")
      // the kept exact plan returns the exact filtered result
      Ivf.registerForRewrite(spark, path, index, "vec_id",
        numCandidates = 200, stats = Some(hist))
      val kept = VectorSearch.knn(embs, "vec_id", "embedding", query,
          k = 10, preFilter = Some(col("label") >= 2 && col("label") < 4))
        .select("vec_id").as[Long].collect().toSeq
      IvfRewrite.clear()
      val exact = VectorSearch.knn(
          embs.where(col("label") >= 2 && col("label") < 4),
          "vec_id", "embedding", query, k = 10)
        .select("vec_id").as[Long].collect().toSeq
      assert(kept === exact)
    } finally IvfRewrite.clear()
  }

  test("a query on a different table is not rewritten") {
    val index = Ivf.build(Tables.embeddings(spark, Sf0001), "vec_id", "embedding")
    try {
      Ivf.registerForRewrite(spark, path, index, "vec_id", numCandidates = 200)
      // same shape, different (unregistered) source table: sf0.01
      val other = VectorSearch.knn(
        Tables.embeddings(spark, "/root/testdata/sf0.01"), "vec_id", "embedding", query, k = 10)
      assert(!other.queryExecution.optimizedPlan.toString.contains(IvfRewrite.MemberCol))
    } finally IvfRewrite.clear()
  }
}
