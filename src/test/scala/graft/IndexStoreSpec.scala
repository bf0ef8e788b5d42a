package graft

import java.nio.file.Files

import graft.embed.Embedder
import graft.index.{IndexStore, Ivf}
import graft.search.{TextSearch, VectorSearch}
import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Index persistence round-trips: saved+loaded indexes answer queries
  * identically to freshly-built ones; overwrite is idempotent replace. */
class IndexStoreSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val query = Embedder.default.embed("nuggets para desayuno")

  test("bm25 save/load round-trip preserves search results; overwrite replaces") {
    val dir = Files.createTempDirectory("bm25idx").toString
    val docs = Tables.documents(spark, Sf0001)
    val built = TextSearch.buildIndex(docs, "doc_id", "text")
    IndexStore.saveBm25(built, dir)
    val loaded = IndexStore.loadBm25(spark, dir)
    assert(loaded.numDocs === built.numDocs && loaded.avgdl === built.avgdl)
    val a = TextSearch.search(built, "fast table scan merge", 10)
      .as[(Long, Double)].collect().toSeq
    val b = TextSearch.search(loaded, "fast table scan merge", 10)
      .as[(Long, Double)].collect().toSeq
    assert(a === b)
    // S7 --replace: a second create over the same path must not fail or dup
    IndexStore.saveBm25(built, dir)
    assert(IndexStore.loadBm25(spark, dir).postings.count() === built.postings.count())
    // persisted-index search prunes postings partitions by term bucket
    val pruned = TextSearch.search(loaded, "fast table scan merge", 10)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"expected bucket partition pruning in:\n$plan")
  }

  test("ivf save/load round-trip preserves ann results and probe pruning") {
    val dir = Files.createTempDirectory("ivfidx").toString
    val embs = Tables.embeddings(spark, Sf0001)
    val built = Ivf.build(embs, "vec_id", "embedding")
    IndexStore.saveIvf(built, dir)
    val loaded = IndexStore.loadIvf(spark, dir)
    assert(loaded.centroids.keySet === built.centroids.keySet)
    assert(loaded.sizes === built.sizes)
    val a = Ivf.ann(built, embs, "vec_id", "embedding", query, 10, 200)
      .select("vec_id").as[Long].collect().toSeq
    val b = Ivf.ann(loaded, embs, "vec_id", "embedding", query, 10, 200)
      .select("vec_id").as[Long].collect().toSeq
    assert(a === b)
    // partition pruning: reading one cluster must scan only its directory
    val one = loaded.assignments.where(org.apache.spark.sql.functions.col("cluster") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cluster"),
      s"expected cluster partition filter in:\n$plan")
  }
}
