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
