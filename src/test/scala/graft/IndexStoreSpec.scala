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

  test("streaming incremental BM25 equals a full rebuild over the final corpus") {
    val dir = Files.createTempDirectory("bm25inc").toString
    val ckpt = Files.createTempDirectory("bm25ckpt").toString
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text").cache()
    val half1 = docs.where($"doc_id" % 2 === 0)
    val half2 = docs.where($"doc_id" % 2 === 1).as[(Long, String)].collect()
    // offline DDL on the first half…
    IndexStore.saveBm25(TextSearch.buildIndex(half1, "doc_id", "text"), dir)
    // …then the second half arrives as a stream, split across two batches
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q = IndexStore.streamIntoBm25(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, ckpt)
    try {
      val (b1, b2) = half2.splitAt(half2.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val inc = IndexStore.loadBm25(spark, dir)
    val full = TextSearch.buildIndex(docs, "doc_id", "text")
    assert(inc.numDocs === full.numDocs)
    assert(inc.avgdl === full.avgdl)
    val a = TextSearch.search(inc, "fast table scan merge", 10)
      .as[(Long, Double)].collect().toSeq
    val b = TextSearch.search(full, "fast table scan merge", 10)
      .as[(Long, Double)].collect().toSeq
    assert(a === b)
    // replaying an already-applied batch id is a no-op (foreachBatch retry)
    val before = inc.postings.count()
    IndexStore.appendBatchBm25(half1.limit(5), "doc_id", "text", dir, batchId = 0L)
    assert(IndexStore.loadBm25(spark, dir).postings.count() === before)
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
