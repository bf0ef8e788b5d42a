package graft

import java.nio.file.Files

import graft.index.{IndexStore, Ivf}
import graft.util.{Tables, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Erasure edge cases the round-11 advice surfaced: the audit must stay
  * honest for non-numeric id columns, hash-addressed tombstone ledgers
  * must refuse (not silently hide) re-ingested content, a fully-erased
  * quantile sketch must stay loadable, and merge advice must not fuse
  * distant clouds. */
class ErasureEdgeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("erasure audit is exact for STRING id columns; NULL erased ids refuse") {
    // string ids everywhere: a long cast would NULL both sides of the
    // residual join and certify residual=0 for rows that are still live —
    // the false-clean GDPR certificate this pins against
    val docs = Tables.documents(spark, Sf0001)
      .select(concat(lit("doc-"), col("doc_id")).as("sid"), col("text"),
        col("n_chars"))
      .localCheckpoint(true)
    val doomed = docs.where(col("sid").endsWith("0")).localCheckpoint(true)
    val nDocs = doomed.count()
    assert(nDocs > 0)
    val bmDir = Files.createTempDirectory("auditstrbm").toString
    val qDir = Files.createTempDirectory("auditstrq").toString
    IndexStore.createBm25(docs, "sid", "text", bmDir)
    IndexStore.saveQuantile(docs, "sid", "n_chars", 2048, qDir)
    def audit() = IndexStore.erasureAudit(spark, doomed, "sid",
        Seq("bm25" -> bmDir, "quantile" -> qDir))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // BEFORE the wave every erased id is still visible — residual = wave,
    // in BOTH the relational join (bm25) and the hash-set probe (quantile,
    // whose hash must match the append-time hash60(cast(id as string)))
    assert(audit() === Seq(("bm25", nDocs, nDocs), ("quantile", nDocs, nDocs)))
    IndexStore.deleteBatchBm25(doomed, "sid", "text", bmDir, 0L)
    IndexStore.deleteBatchQuantile(doomed, "sid", "n_chars", qDir, 0L)
    assert(audit() === Seq(("bm25", nDocs, 0L), ("quantile", nDocs, 0L)))
    // a NULL id addresses no row: refuse rather than shrink erased_n
    val withNull = doomed.select(
      when(col("sid").endsWith("00"), lit(null)).otherwise(col("sid"))
        .as("sid"))
    assert(intercept[IllegalArgumentException](
      IndexStore.erasureAudit(spark, withNull, "sid", Seq("bm25" -> bmDir)))
      .getMessage.contains("NULL"))
  }

  test("z-order append refuses resurrected content until the fold purges the ledger") {
    val rnd = new scala.util.Random(29)
    val df = Seq.fill(800)(
        (rnd.nextInt(200).toLong, rnd.nextInt(50).toLong, rnd.nextDouble()))
      .toDF("x", "y", "v").localCheckpoint(true)
    val dx = ZOrder.Dim("x", 0, 199); val dy = ZOrder.Dim("y", 0, 49)
    val p = Files.createTempDirectory("zresurrect").toString
    IndexStore.saveZOrder(df, dx, dy, 3, p, validate = true)
    val doomed = df.where($"y" % 5 === 0).localCheckpoint(true)
    val survivors = df.where($"y" % 5 =!= 0).localCheckpoint(true)
    IndexStore.deleteBatchZOrder(doomed, p, 0L)
    // re-ingesting erased content while its hash sits in the ledger would
    // pass the fprint guard (+h cancels −h) while the anti-join hides the
    // live row — the append must refuse instead
    val resurrected = doomed.limit(3).localCheckpoint(true)
    assert(intercept[IllegalArgumentException](
      IndexStore.appendBatchZOrder(resurrected, p, 1L))
      .getMessage.contains("tombstoned"))
    // fresh (never-erased) content still appends fine alongside the ledger
    val fresh = Seq((150L, 13L, 123.456)).toDF("x", "y", "v")
    IndexStore.appendBatchZOrder(fresh, p, 2L)
    // the fold purges the ledger; the same re-ingest then lands and the
    // checked loader accepts the corpus WITH the resurrected rows
    IndexStore.compactZOrder(spark, p)
    IndexStore.appendBatchZOrder(resurrected, p, 3L)
    val corpus = survivors.unionByName(fresh).unionByName(resurrected)
    val live = IndexStore.loadZOrderChecked(spark, p, corpus)
    assert(live.count() === corpus.count())
    // and the re-appended rows are actually VISIBLE to box queries
    val r = resurrected.head()
    val seen = IndexStore.boxZOrder(spark, p, r.getLong(0), r.getLong(0),
      r.getLong(1), r.getLong(1))
    assert(seen.where(col("v") === r.getDouble(2)).count() >= 1L)
  }

  test("quantile append refuses resurrected ids; fully-erased sketch folds and loads empty") {
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "n_chars").localCheckpoint(true)
    val p = Files.createTempDirectory("qresurrect").toString
    IndexStore.saveQuantile(docs, "doc_id", "n_chars", 4096, p)
    val doomed = docs.where($"doc_id" % 4 === 0).localCheckpoint(true)
    IndexStore.deleteBatchQuantile(doomed, "doc_id", "n_chars", p, 0L)
    // re-appending a tombstoned id would leave its sampled row anti-joined
    // out at load while the marks count it live — refuse until the fold
    assert(intercept[IllegalArgumentException](
      IndexStore.appendBatchQuantile(doomed.limit(5), "doc_id", "n_chars",
        p, 1L)).getMessage.contains("tombstoned"))
    IndexStore.compactQuantile(spark, p)
    val back = doomed.limit(5).localCheckpoint(true)
    IndexStore.appendBatchQuantile(back, "doc_id", "n_chars", p, 1L)
    val corpus = docs.where($"doc_id" % 4 =!= 0).unionByName(back)
    val s = IndexStore.loadQuantileChecked(spark, p, corpus, "doc_id",
      "n_chars")
    assert(s.n === corpus.count())
    assert(s.complete) // k=4096 ≥ corpus: the sample must hold every row
    assert(s.m.toLong === corpus.count())
    // ---- the all-erased fold: no q data files is a legal empty sketch,
    // not a schema-inference crash
    val p2 = Files.createTempDirectory("qempty").toString
    val tiny = docs.limit(20).localCheckpoint(true)
    IndexStore.saveQuantile(tiny, "doc_id", "n_chars", 64, p2)
    IndexStore.deleteBatchQuantile(tiny, "doc_id", "n_chars", p2, 0L)
    IndexStore.compactQuantile(spark, p2)
    val empty = IndexStore.loadQuantile(spark, p2)
    assert(empty.m === 0 && empty.n === 0L)
    assert(intercept[IllegalArgumentException](empty.quantile(0.5))
      .getMessage.contains("empty quantile sample"))
    // the grouped family: same refusal on resurrected ids, same legal
    // empty state after an all-erased fold
    val gdocs = Tables.documents(spark, Sf0001)
      .select("doc_id", "source", "n_chars").limit(30).localCheckpoint(true)
    val p3 = Files.createTempDirectory("gqempty").toString
    IndexStore.saveGroupedQuantile(gdocs, "doc_id", "source", "n_chars",
      64, p3)
    IndexStore.deleteBatchGroupedQuantile(gdocs, "doc_id", "source",
      "n_chars", p3, 0L)
    assert(intercept[IllegalArgumentException](
      IndexStore.appendBatchGroupedQuantile(gdocs.limit(3), "doc_id",
        "source", "n_chars", p3, 1L)).getMessage.contains("tombstoned"))
    IndexStore.compactGroupedQuantile(spark, p3)
    val gEmpty = IndexStore.loadGroupedQuantile(spark, p3)
    assert(gEmpty.groups.isEmpty)
    // a tombstoned id riding a NULL-VALUE row is never ingested
    // (writeQuantileBatch drops it), so it must not refuse the wave
    val p4 = Files.createTempDirectory("qnullval").toString
    IndexStore.saveQuantile(docs, "doc_id", "n_chars", 64, p4)
    IndexStore.deleteBatchQuantile(doomed, "doc_id", "n_chars", p4, 0L)
    val nullVal = doomed.limit(2)
      .select($"doc_id", lit(null).cast("double").as("n_chars"))
      .unionByName(Seq((999999L, 42.0)).toDF("doc_id", "n_chars"))
    IndexStore.appendBatchQuantile(nullVal, "doc_id", "n_chars", p4, 1L)
  }

  test("compactQuantile refuses the incomplete-and-fully-erased fold (k would brick to 0)") {
    import graft.functions.Text
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "n_chars").localCheckpoint(true)
    val p = Files.createTempDirectory("qbrick").toString
    // k = 3 over the full corpus: INCOMPLETE; the sample holds exactly
    // the 3 ids with the smallest hash60(doc_id) — erase those
    IndexStore.saveQuantile(docs, "doc_id", "n_chars", 3, p)
    val sampled = docs.collect()
      .map(r => r.getLong(0))
      .sortBy(id => Text.hash60Local(id.toString)).take(3).toSet
    val doomed = docs.where($"doc_id".isin(sampled.toSeq: _*))
    IndexStore.deleteBatchQuantile(doomed, "doc_id", "n_chars", p, 0L)
    val s = IndexStore.loadQuantile(spark, p)
    assert(s.m === 0 && s.n > 0 && !s.complete)
    // folding would write k = 0: a sketch that accepts appends but
    // keeps nothing, forever — refuse toward a rebuild instead
    assert(intercept[IllegalArgumentException](
      IndexStore.compactQuantile(spark, p))
      .getMessage.contains("rebuild with saveQuantile"))
  }

  test("merge advice prefers the CLOSEST qualifying pair, not the two globally smallest") {
    val dummy = Seq((0L, 0)).toDF("id", "cluster")
    // two small cells FAR apart (2: -x, 3: +y) vs two medium cells CLOSE
    // together (0, 1 — ~2.6° apart on the unit circle): size-only advice
    // fuses 2+3 and parks the member-mean centroid far from both clouds;
    // proximity-aware advice fuses 0+1
    val idx = Ivf.IvfIndex(dummy,
      centroids = Map(
        0 -> Array(1.0, 0.0), 1 -> Array(0.999, 0.045),
        2 -> Array(-1.0, 0.0), 3 -> Array(0.0, 1.0)),
      sizes = Map(0 -> 3L, 1 -> 3L, 2 -> 1L, 3 -> 2L),
      metric = "cosine", dim = 2)
    val a = IndexStore.adviseMergeIvf(idx, factor = 100.0)
    assert(a.advise)
    assert(Set(a.clusterA, a.clusterB) === Set(0, 1))
    assert(a.combinedSize === 6L)
    assert(a.centroidDist < 0.1)
    // the mass gate still gates: a factor admitting ONLY the smallest
    // pair's combined mass must pick that pair even though it is distant
    // (even share = 9/4; factor 1.4 → cap 3.15 admits only 1+2=3)
    val tight = IndexStore.adviseMergeIvf(idx, factor = 1.4)
    assert(tight.advise)
    assert(Set(tight.clusterA, tight.clusterB) === Set(2, 3))
    assert(tight.centroidDist > 1.0) // distant — surfaced for a policy veto
    // nothing qualifies: report the two smallest, advise = false
    val none = IndexStore.adviseMergeIvf(idx, factor = 0.01)
    assert(!none.advise)
    assert(Set(none.clusterA, none.clusterB) === Set(2, 3))
  }
}
