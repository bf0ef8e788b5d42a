package graft

import java.nio.file.Files

import graft.index.IndexStore
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wave operations: one erasure wave drains into every id-linked
  * family and returns the zero-residual certificate; one maintenance
  * sweep prices and executes the folds the amortization arithmetic
  * recommends. */
class OpsWaveSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("erasure wave: one call, every family, zero-residual certificate; replay idempotent") {
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text", "source", "n_chars").localCheckpoint(true)
    val doomed = docs.where($"doc_id" % 6 === 0).localCheckpoint(true)
    val survivors = docs.where($"doc_id" % 6 =!= 0).localCheckpoint(true)
    val bm = Files.createTempDirectory("wavebm").toString
    val ph = Files.createTempDirectory("waveph").toString
    val q = Files.createTempDirectory("waveq").toString
    val gq = Files.createTempDirectory("wavegq").toString
    val wc = Files.createTempDirectory("wavewc").toString
    IndexStore.createBm25(docs, "doc_id", "text", bm)
    IndexStore.savePhrase(docs, "doc_id", "text", 8, ph)
    IndexStore.saveQuantile(docs, "doc_id", "n_chars", 2048, q)
    IndexStore.saveGroupedQuantile(docs, "doc_id", "source", "n_chars",
      2048, gq)
    IndexStore.saveWordCounts(docs, "doc_id", "text", wc)
    val targets = Seq(
      IndexStore.ErasureTarget("bm25", bm, Seq("text")),
      IndexStore.ErasureTarget("phrase", ph, Seq("text")),
      IndexStore.ErasureTarget("quantile", q, Seq("n_chars")),
      IndexStore.ErasureTarget("gquantile", gq, Seq("source", "n_chars")),
      IndexStore.ErasureTarget("wordcount", wc, Seq("text")))
    val cert = IndexStore.executeErasureWave(doomed, "doc_id", targets, 0L)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val n = doomed.count()
    assert(cert === Seq(("bm25", n, 0L), ("gquantile", n, 0L),
      ("phrase", n, 0L), ("quantile", n, 0L), ("wordcount", n, 0L)))
    // the post-wave indexes ARE the survivors' indexes: checked loaders
    // accept the surviving corpus (the wave really subtracted everywhere)
    IndexStore.loadBm25Checked(spark, bm, survivors, "doc_id", "text")
    IndexStore.loadQuantileChecked(spark, q, survivors, "doc_id",
      "n_chars")
    IndexStore.loadWordCountsChecked(spark, wc, survivors, "doc_id",
      "text")
    // replaying the SAME wave id is a fleet-wide no-op: certificate still
    // zero, checked loaders still accept (no double subtraction)
    val again = IndexStore.executeErasureWave(doomed, "doc_id", targets, 0L)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(again === cert)
    IndexStore.loadQuantileChecked(spark, q, survivors, "doc_id",
      "n_chars")
    IndexStore.loadWordCountsChecked(spark, wc, survivors, "doc_id",
      "text")
    // non-id-addressed families are refused, not silently skipped — a
    // fleet wave must never claim an erasure it cannot certify
    for (fam <- Seq("zorder", "grams", "summary", "stats"))
      assert(intercept[IllegalArgumentException](
        IndexStore.executeErasureWave(doomed, "doc_id",
          Seq(IndexStore.ErasureTarget(fam, bm, Seq("text"))), 1L))
        .getMessage.contains("not id-addressed"))
    // arity guard: gquantile needs (group, value)
    intercept[IllegalArgumentException](
      IndexStore.executeErasureWave(doomed, "doc_id",
        Seq(IndexStore.ErasureTarget("gquantile", gq, Seq("n_chars"))), 2L))
    intercept[IllegalArgumentException](
      IndexStore.executeErasureWave(doomed, "doc_id", Seq.empty, 3L))
  }

  test("erasure wave spans BOTH id spaces: doc-keyed and embedding-keyed families in one call") {
    // the real GDPR shape: a user's documents AND their embeddings erase
    // in one wave — one catalog mixing bm25 (doc text) with ivf (vector),
    // one certificate covering both
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").localCheckpoint(true)
    val embs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").localCheckpoint(true)
    val joined = docs.join(embs, docs("doc_id") === embs("vec_id"))
      .drop("vec_id").localCheckpoint(true)
    val doomed = joined.where($"doc_id" % 7 === 0).localCheckpoint(true)
    val bm = Files.createTempDirectory("mixbm").toString
    val iv = Files.createTempDirectory("mixivf").toString
    val l3 = Files.createTempDirectory("mixlm3").toString
    IndexStore.createBm25(docs, "doc_id", "text", bm)
    IndexStore.createIvf(embs, "vec_id", "embedding", iv, numClusters = 8)
    IndexStore.saveLm3(docs, "doc_id", "text", l3)
    val cert = IndexStore.executeErasureWave(doomed, "doc_id", Seq(
        IndexStore.ErasureTarget("bm25", bm, Seq("text")),
        IndexStore.ErasureTarget("ivf", iv, Seq("embedding")),
        IndexStore.ErasureTarget("lm3", l3, Seq("text"))), 0L)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val n = doomed.count()
    assert(cert === Seq(("bm25", n, 0L), ("ivf", n, 0L), ("lm3", n, 0L)))
    // both id spaces' checked loaders accept exactly the survivors
    IndexStore.loadBm25Checked(spark, bm,
      docs.where($"doc_id" % 7 =!= 0), "doc_id", "text")
    IndexStore.loadIvfChecked(spark, iv,
      embs.where($"vec_id" % 7 =!= 0), "vec_id", "embedding")
    IndexStore.loadLm3Checked(spark, l3,
      docs.where($"doc_id" % 7 =!= 0), "doc_id", "text")
  }

  test("erasure wave with DIVERGENT coverage: left-join wave erases every doomed doc, ivf narrows to embedded rows") {
    // the r14-advice production shape: not every user has an embedding
    // (sf0.1 ships 5,000 docs vs 2,000 embeddings) — a wave built with
    // an INNER join silently skips the unembedded users for the
    // doc-keyed families. The left-join wave + executeErasureWave's
    // per-family narrowing must erase EVERY doomed doc from bm25 while
    // ivf deletes only the rows that carry a vector; the certificate's
    // erased_n counts the full request for both and residual 0 certifies
    // both.
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").localCheckpoint(true)
    // only half the docs are embedded — the divergent-cardinality corpus
    val embs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").where($"vec_id" % 2 === 0)
      .localCheckpoint(true)
    val doomed = docs
      .join(embs, docs("doc_id") === embs("vec_id"), "left").drop("vec_id")
      .where($"doc_id" % 7 === 0).localCheckpoint(true)
    // the wave genuinely mixes coverage: some doomed rows carry vectors,
    // some don't
    assert(doomed.where($"embedding".isNull).count() > 0)
    assert(doomed.where($"embedding".isNotNull).count() > 0)
    val bm = Files.createTempDirectory("divbm").toString
    val iv = Files.createTempDirectory("divivf").toString
    IndexStore.createBm25(docs, "doc_id", "text", bm)
    IndexStore.createIvf(embs, "vec_id", "embedding", iv, numClusters = 8)
    val cert = IndexStore.executeErasureWave(doomed, "doc_id", Seq(
        IndexStore.ErasureTarget("bm25", bm, Seq("text")),
        IndexStore.ErasureTarget("ivf", iv, Seq("embedding"))), 0L)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val n = doomed.count()
    assert(cert === Seq(("bm25", n, 0L), ("ivf", n, 0L)))
    // bm25 erased EVERY doomed doc (incl. unembedded ones); ivf holds
    // exactly the surviving embedded rows
    IndexStore.loadBm25Checked(spark, bm,
      docs.where($"doc_id" % 7 =!= 0), "doc_id", "text")
    IndexStore.loadIvfChecked(spark, iv,
      embs.where($"vec_id" % 7 =!= 0), "vec_id", "embedding")
  }

  test("maintenance wave: folds where the arithmetic says so, receipts relation, state resets") {
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text", "n_chars").localCheckpoint(true)
    val q = Files.createTempDirectory("mwq").toString
    val bm = Files.createTempDirectory("mwbm").toString
    // quantile: base + two appended waves → 3 committed batches, a hot
    // read workload → the amortization inequality recommends folding
    IndexStore.saveQuantile(docs.where($"doc_id" % 3 === 0), "doc_id",
      "n_chars", 2048, q)
    IndexStore.appendBatchQuantile(docs.where($"doc_id" % 3 === 1),
      "doc_id", "n_chars", q, 0L)
    IndexStore.appendBatchQuantile(docs.where($"doc_id" % 3 === 2),
      "doc_id", "n_chars", q, 1L)
    // bm25: fresh base only → nothing to fold, recommend = false
    IndexStore.createBm25(docs, "doc_id", "text", bm)
    val receipts = IndexStore.maintenanceWave(spark,
        Seq("quantile" -> q, "bm25" -> bm), queriesPerWave = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(2), r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(receipts("quantile") === ((3, true, true)))
    assert(receipts("bm25") === ((1, false, false)))
    // the fold really ran: one base batch, append count reset, still the
    // same live corpus under the checked loader
    val st = IndexStore.describeFamily(spark, "quantile", q)
    assert(st.base && st.appends === 0L)
    val s = IndexStore.loadQuantileChecked(spark, q, docs, "doc_id",
      "n_chars")
    assert(s.n === docs.count())
    // dry-run mode prices without acting
    val dry = IndexStore.maintenanceWave(spark, Seq("bm25" -> bm),
      queriesPerWave = 50L, execute = false)
      .collect().head
    assert(!dry.getBoolean(7))
    // the layout family refuses the generic sweep (its cost model is a
    // tail scan per box query, priced by planZOrderCompaction)
    intercept[IllegalArgumentException](
      IndexStore.maintenanceWave(spark, Seq("zorder" -> q), 50L))
    // quantile folds are priced from the PERSISTED sample, not the
    // corpus the marks fingerprint: with k=50 each of the 3 waves keeps
    // 50 rows, so the fold reads/rewrites 150 rows — pricing it at the
    // ~500 ingested corpus rows would leave a large sketch (tiny sample,
    // huge corpus) unfolded forever
    val qs = Files.createTempDirectory("mwqsmall").toString
    IndexStore.saveQuantile(docs.where($"doc_id" % 3 === 0), "doc_id",
      "n_chars", 50, qs)
    IndexStore.appendBatchQuantile(docs.where($"doc_id" % 3 === 1),
      "doc_id", "n_chars", qs, 0L)
    IndexStore.appendBatchQuantile(docs.where($"doc_id" % 3 === 2),
      "doc_id", "n_chars", qs, 1L)
    val plan = IndexStore.planCompaction(spark, qs, "quantile",
      queriesPerWave = 50L)
    assert(plan.totalRows === 150L)
    assert(plan.foldCost === 300.0)
  }

  test("lm3 family rides the fleet surfaces: inventory, priced fold, post-fold checkability") {
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").localCheckpoint(true)
    val dir = Files.createTempDirectory("mwlm3").toString
    IndexStore.saveLm3(docs.where($"doc_id" % 3 === 0), "doc_id", "text",
      dir)
    IndexStore.appendBatchLm3(docs.where($"doc_id" % 3 === 1), "doc_id",
      "text", dir, 0L)
    IndexStore.appendBatchLm3(docs.where($"doc_id" % 3 === 2), "doc_id",
      "text", dir, 1L)
    // inventoriable like every family
    val st = IndexStore.describeFamily(spark, "lm3", dir)
    assert(st.base && st.appends === 2L && st.deletes === 0L)
    // priceable + foldable through the generic sweep (fold cost reads
    // the n-gram delta tables, not the corpus docs the marks count)
    val receipts = IndexStore.maintenanceWave(spark, Seq("lm3" -> dir),
        queriesPerWave = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(2), r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(receipts("lm3") === ((3, true, true)))
    val st2 = IndexStore.describeFamily(spark, "lm3", dir)
    assert(st2.base && st2.appends === 0L)
    // the folded model still scores exactly like a fresh train
    import graft.text.LanguageModel
    val fold = IndexStore.loadLm3Checked(spark, dir, docs, "doc_id",
      "text")
    val fresh = LanguageModel.train3(docs, "doc_id", "text")
    assert(LanguageModel.score3(fold, docs, "doc_id", "text")
        .as[(Long, Double, Double, Long)].collect().toSet
      === LanguageModel.score3(fresh, docs, "doc_id", "text")
        .as[(Long, Double, Double, Long)].collect().toSet)
  }

  test("both sign-lsh spellings ride the erasure wave, the audit, and the maintenance sweep") {
    import graft.dedup.Dedup
    val embs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").localCheckpoint(true)
    val dir = Files.createTempDirectory("wavesignlsh").toString
    IndexStore.saveSignLsh(
      Dedup.signLshSketches(embs, "vec_id", "embedding", dim = 64), dir,
      source = Some((embs, "vec_id", "embedding")))
    val doomed = embs.where($"vec_id" % 5 === 0).localCheckpoint(true)
    // the catalog spelling the family-map comment blesses must work
    // end-to-end, not just in the maintenance twin
    val cert = IndexStore.executeErasureWave(doomed, "vec_id",
        Seq(IndexStore.ErasureTarget("sign-lsh", dir, Seq("embedding"))),
        0L)
      .as[(String, Long, Long)].collect().toSeq
    assert(cert === Seq(("sign-lsh", doomed.count(), 0L)))
    assert(IndexStore.maintenanceWave(spark, Seq("sign-lsh" -> dir),
      queriesPerWave = 10L, execute = false).count() === 1L)
    assert(IndexStore.describeFamily(spark, "sign-lsh", dir).deletes
      === 1L)
  }

  test("word-count erased-id ledger: overlapping waves dedupe, audit names the gap, re-ingest refuses, fold keeps the ledger") {
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").localCheckpoint(true)
    val dir = Files.createTempDirectory("wcledger").toString
    IndexStore.saveWordCounts(docs, "doc_id", "text", dir)
    // two OVERLAPPING erasure requests under DIFFERENT wave ids (two GDPR
    // tickets naming one user) — before the ledger this double-subtracted
    // and poisoned the fold until rebuild
    val w1 = docs.where($"doc_id" % 6 === 0)
    val w2 = docs.where($"doc_id" % 4 === 0) // overlaps w1 at % 12 == 0
    IndexStore.deleteBatchWordCounts(w1, "doc_id", "text", dir, 0L)
    IndexStore.deleteBatchWordCounts(w2, "doc_id", "text", dir, 1L)
    val survivors = docs.where($"doc_id" % 6 =!= 0 && $"doc_id" % 4 =!= 0)
    // the fold equals a fresh build over the survivors — the overlap
    // subtracted exactly once (checked loader recomputes the fingerprint)
    IndexStore.loadWordCountsChecked(spark, dir, survivors, "doc_id",
      "text")
    // audit certificate: all requested ids carry committed ledger entries
    val ok = IndexStore.erasureAudit(spark,
        w1.unionByName(w2).select("doc_id"), "doc_id",
        Seq("wordcount" -> dir))
      .as[(String, Long, Long)].collect().head
    assert(ok._3 === 0L, s"residual must be zero after both waves: $ok")
    // a request naming an id NO wave ever served surfaces as residual
    val ghost = IndexStore.erasureAudit(spark,
        docs.where($"doc_id" % 6 === 1).limit(3).select("doc_id"),
        "doc_id", Seq("wordcount" -> dir))
      .as[(String, Long, Long)].collect().head
    assert(ghost._3 === ghost._2 && ghost._2 > 0,
      s"unserved ids must count as residual: $ghost")
    // re-ingesting a ledgered id refuses loudly (its next erasure request
    // would dedupe against the old entry and silently never subtract)
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendBatchWordCounts(w1.limit(1), "doc_id", "text",
        dir, 7L)
    }
    assert(e.getMessage.contains("re-ingests erased id"))
    // compaction PRESERVES the ledger (the fold cannot re-derive which
    // ids were erased): a post-fold replay of an already-served request
    // still dedupes to a no-op and the checked loader still accepts
    IndexStore.compactWordCounts(spark, dir)
    IndexStore.deleteBatchWordCounts(w1, "doc_id", "text", dir, 9L)
    IndexStore.loadWordCountsChecked(spark, dir, survivors, "doc_id",
      "text")
    assert(IndexStore.erasureAudit(spark, w1.select("doc_id"), "doc_id",
        Seq("wordcount" -> dir))
      .as[(String, Long, Long)].collect().head._3 === 0L)
    // and the maintenance sweep prices + folds the family like any other
    assert(IndexStore.maintenanceWave(spark, Seq("wordcount" -> dir),
      queriesPerWave = 10L, execute = false).count() === 1L)
  }
}
