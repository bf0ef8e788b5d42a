package graft

import graft.pipeline.Curation
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keyword extraction and sequence packing semantics. */
class CurationSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("corpusDiff: all four statuses; presence markers, not text-null sniffing") {
    val old = Seq(
      (1L, Option("same text")),
      (2L, Option("will change")),
      (3L, Option("will be removed")),
      (5L, Option.empty[String]), // null doc PRESENT in both → unchanged
    ).toDF("doc_id", "text")
    val next = Seq(
      (1L, Option("same text")),
      (2L, Option("has changed")),
      (4L, Option("brand new")),
      (5L, Option.empty[String]),
    ).toDF("doc_id", "text")
    val got = Curation.corpusDiff(old, next, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "added"), (5L, "unchanged")))
  }

  test("topTerms: tf-idf ranks distinctive terms above common ones") {
    val docs = Seq(
      (1L, "spark spark catalyst common"),
      (2L, "duck duck arrow common"),
      (3L, "iceberg delta lake common"),
    ).toDF("id", "text")
    val got = Curation.topTerms(docs, "id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // 'common' has df=3 → idf=ln(1)=0 → never in top-2 of any doc
    assert(!got.exists(_._2 == "common"))
    // doc 1's top term is its tf=2 distinctive term
    assert(got.collect { case (1L, t, 1) => t }.head === "spark")
    // every doc gets exactly k rows (enough distinct terms exist)
    assert(got.groupBy(_._1).values.forall(_.length == 2))
  }

  test("packSequences: greedy packing respects order, never splits a doc") {
    val docs = Seq(
      ("s1", 1L, "a b c"),        // 3 tokens, cum_excl 0  → seq 0, off 0
      ("s1", 2L, "d e f g"),      // 4 tokens, cum_excl 3  → seq 0, off 3
      ("s1", 3L, "h i"),          // 2 tokens, cum_excl 7  → seq 1, off 2  (budget 5)
      ("s2", 9L, "x y z w v u"),  // separate shard restarts at seq 0
    ).toDF("source", "id", "text")
    val got = Curation.packSequences(docs, "source", "id", "text", tokenBudget = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      ("s1", 1L, 3L, 0L, 0L),
      ("s1", 2L, 4L, 0L, 3L),
      ("s1", 3L, 2L, 1L, 2L),
      ("s2", 9L, 6L, 0L, 0L),
    ))
  }

  test("packChunkId: >1000-chunk documents no longer alias across doc ids") {
    // 1,200 chunks at the 160-char stride — past the old id*1000 packing's
    // silent-collision point (doc 1 chunk 1000 aliased doc 2 chunk 0)
    val stride = 160
    val docs = Seq((1L, "x" * (40 + stride * 1200)), (2L, "y" * 100))
      .toDF("id", "text")
    val chunks = Curation.chunkDocuments(docs, "id", "text",
      chunkChars = 200, overlap = 40).cache()
    assert(chunks.where(col("id") === 1L).count() === 1200L)
    val packed = chunks.select(
      Curation.packChunkId(col("id"), col("chunk_idx")).as("cid"))
    assert(packed.distinct().count() === chunks.count())
    // the regression this guards: old narrow packing collides on this input
    val oldPacked = chunks.select((col("id") * 1000 + col("chunk_idx")).as("cid"))
    assert(oldPacked.distinct().count() < chunks.count())
    chunks.unpersist()
  }

  test("packChunkId: out-of-range coordinates fail loudly, never alias") {
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val overflowIdx = intercept[Exception] {
      Seq((1L, 5)).toDF("id", "chunk_idx")
        .select(Curation.packChunkId(col("id"), col("chunk_idx"), idxBits = 2))
        .collect()
    }
    assert(messages(overflowIdx).contains("packing"))
    val overflowId = intercept[Exception] {
      Seq((Long.MaxValue, 0)).toDF("id", "chunk_idx")
        .select(Curation.packChunkId(col("id"), col("chunk_idx")))
        .collect()
    }
    assert(messages(overflowId).contains("packing"))
  }

  test("splitCorpus: deterministic, exhaustive, stable under corpus growth") {
    val docs = (1L to 1000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val split = Curation.splitCorpus(docs, "id", 800, 100)
    val byId = split.select("id", "split").as[(Long, String)].collect().toMap
    // exhaustive partition of the corpus
    assert(byId.size === 1000)
    val counts = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    // ~80/10/10 with hash noise
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
    // growth stability: the first 500 docs keep their split when 500 more
    // arrive (no RNG/partition sensitivity — eval sets stay frozen)
    val small = Curation.splitCorpus(docs.where(col("id") <= 500), "id", 800, 100)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => byId(id) == s })
    // different salt → different (still deterministic) assignment
    val resalted = Curation.splitCorpus(docs, "id", 800, 100, salt = "other")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(resalted != byId)
  }

  test("contamination: hand-built overlap, short docs clean, eval side broadcast") {
    import graft.pipeline.Contamination
    // shingle size 3: t1 shares its full shingle set with e1; t2 shares
    // one 3-gram window; t3 disjoint; t4 shorter than one shingle (gets
    // the single whole-text shingle); t5 null text (no shingles at all)
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three nine ten"),
      (3L, "totally unrelated words here"),
      (4L, "too short"),
      (5L, null: String),
    ).toDF("id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "zero one two three"),
    ).toDF("id", "text")
    val got = Contamination.ngramOverlap(train, eval, "id", "text")
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(rows(1L) === ((2L, 2L, true)))  // both shingles contaminated
    assert(rows(2L) === ((3L, 1L, true)))  // 'one two three' only
    assert(rows(3L) === ((2L, 0L, false)))
    assert(rows(4L) === ((1L, 0L, false))) // whole-text shingle, clean
    assert(rows(5L) === ((0L, 0L, false))) // null text → no shingles, clean row
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingle set must broadcast:\n$plan")
  }

  test("bloom-prefiltered contamination equals the exact path bit-for-bit") {
    import graft.pipeline.Contamination
    import graft.util.Tables
    val d = Tables.documents(spark, Sf0001)
    val train = d.where($"doc_id" % 20 =!= 0)
    val eval = d.where($"doc_id" % 20 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("id").collect().toSeq
    val exact = rows(Contamination.ngramOverlap(train, eval, "doc_id", "text"))
    // default fpp, and an absurdly high fpp that guarantees bloom false
    // positives — the exact verify join must remove every one of them
    assert(rows(Contamination.ngramOverlapBloom(train, eval, "doc_id", "text")) === exact)
    assert(rows(Contamination.ngramOverlapBloom(train, eval, "doc_id", "text",
      fpp = 0.5)) === exact)
    // the short-doc/null-text edge rows keep the exact path's contract too
    val toyTrain = Seq((1L, "too short"), (2L, null: String)).toDF("id", "text")
    val toyEval = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    assert(rows(Contamination.ngramOverlapBloom(toyTrain, toyEval, "id", "text")) ===
      rows(Contamination.ngramOverlap(toyTrain, toyEval, "id", "text")))
  }

  test("semanticOverlap: hand-built geometry, tie-break, null vector, zero-shuffle plan") {
    import graft.pipeline.Contamination
    val train = Seq(
      (1L, Seq(1.0, 0.0)),          // cos 1.0 against e100
      (2L, Seq(0.8, 0.6)),          // cos 0.8 vs e100, 0.6 vs e101
      (3L, Seq(0.0, 1.0)),          // cos 1.0 against e101
      (4L, Seq(-1.0, 0.0)),         // best is the LESS bad eval: 0.0 vs e101
      (5L, null: Seq[Double]),      // no position in embedding space
      (6L, Seq(0.0, 0.0)),          // no DIRECTION: 0/0 cos must not flag
    ).toDF("id", "vec")
    val eval = Seq(
      (100L, Seq(1.0, 0.0)),
      (101L, Seq(0.0, 1.0)),
    ).toDF("id", "vec")
    val got = Contamination.semanticOverlap(train, eval, "id", "vec", 0.75)
    val rows = got.collect().map(r => r.getLong(0) ->
      ((if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        r.getBoolean(3)))).toMap
    assert(rows(1L) === ((100L, 1.0, true)))
    assert(rows(2L) === ((100L, 0.8, true)))
    assert(rows(3L) === ((101L, 1.0, true)))
    assert(rows(4L)._1 === 101L)      // argmax picks the 0.0-cos eval
    assert(rows(4L)._3 === false)
    assert(rows(5L)._1 === -1L)       // null vec: no best, clean
    assert(rows(5L)._3 === false)
    assert(rows(6L)._1 === -1L)       // zero-norm vec: NaN gated out, clean
    assert(rows(6L)._3 === false)
    // cos ties break toward the larger eval id (both engines' rule)
    val tied = Contamination.semanticOverlap(
      Seq((9L, Seq(1.0, 1.0))).toDF("id", "vec"), eval, "id", "vec", 0.9)
    assert(tied.head().getLong(1) === 101L)
    // the scale contract: a literal-array scan — no join, no shuffle
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"semanticOverlap must be a single zero-shuffle scan:\n$plan")
    // empty and oversized eval sets are refused loudly
    val e = intercept[IllegalArgumentException] {
      Contamination.semanticOverlap(train,
        eval.where($"id" < 0), "id", "vec", 0.5)
    }
    assert(e.getMessage.contains("empty eval set"))
    // beyond benchmark size the literal path refuses and names the
    // range-join alternative
    val big = spark.range(Contamination.MaxLiteralEval + 1)
      .select($"id", array(lit(1.0), lit(0.0)).as("vec"))
    val e2 = intercept[IllegalArgumentException] {
      Contamination.semanticOverlap(train, big, "id", "vec", 0.5)
    }
    assert(e2.getMessage.contains("rangeJoinExact"))
  }

  test("salted two-phase aggregation equals direct aggregation (skew path)") {
    import graft.util.{Skew, Tables}
    val ev = Tables.events(spark, Sf0001)
    val direct = ev.groupBy("event_type")
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(ev, "event_type", "value", col("event_id"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
    // phase-1 spreads each key across multiple reducers
    val plan = Skew.saltedSumCount(ev, "event_type", "value", col("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "partial agg must group by the salt")
  }

  test("diversitySample: farthest-from-centroid per label, deterministic ranks") {
    // label 0: centroid of (0,0),(4,0),(0,4) is (4/3, 4/3); farthest is the
    // most off-center corner — all three dists distinct, ranks stable.
    // label 1: a lone vector is its own centroid → dist 0, rank 1.
    val embs = Seq(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(4.0, 0.0), 0), (3L, Seq(0.0, 4.0), 0),
      (9L, Seq(7.0, 7.0), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Curation.diversitySample(embs, "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(3)) -> r.getLong(1)).toMap
    // c = (1.333333, 1.333333): dist(1)=1.885618; dist(2)=2.981424 = dist(3)
    // → tie broken by id: rank1=2, rank2=3; k=2 drops vector 1
    assert(got === Map((0, 1) -> 2L, (0, 2) -> 3L, (1, 1) -> 9L))
  }

  test("exactWithPriority keeps the trusted source's copy, id breaks rank ties") {
    import graft.dedup.Dedup
    val docs = Seq(
      (1L, "same text", "web"),   // rank 9 (default)
      (2L, "same text", "wiki"),  // rank 0 → keeper despite larger id
      (3L, "same text", "web"),
      (4L, "other", "web"),       // singleton keeps itself
      (5L, "tied", "web"), (6L, "tied", "web"), // same rank → min id keeps
    ).toDF("doc_id", "text", "source")
    val got = Dedup.exactWithPriority(docs, "doc_id", "text", "source",
        Map("wiki" -> 0), defaultPriority = 9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((3L, 2L, false)))
    assert(got(2L) === ((3L, 2L, true)))
    assert(got(3L) === ((3L, 2L, false)))
    assert(got(4L) === ((1L, 4L, true)))
    assert(got(5L) === ((2L, 5L, true)))
    assert(got(6L) === ((2L, 5L, false)))
  }

  test("packSequences window is partitioned (no single global sort partition)") {
    val docs = Seq(("s1", 1L, "a"), ("s2", 2L, "b")).toDF("source", "id", "text")
    val plan = Curation.packSequences(docs, "source", "id", "text", 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(group"),
      s"window must hash-partition by group, not sort globally:\n$plan")
  }

  test("intakeLedger: durable gates resume from the crash point, same ledger") {
    import graft.dedup.Dedup
    import graft.pipeline.Contamination
    import graft.util.Tables
    val docs = Tables.documents(spark, Sf0001)
      .where($"doc_id" % 20 =!= 0).cache()
    val eval = Tables.documents(spark, Sf0001).where($"doc_id" % 20 === 0)
    def run(path: String) =
      Curation.intakeLedger(docs, eval, "doc_id", "text", path,
        minTokens = 5, maxTokens = 500, minQualityPpm = 650000L,
        langs = Seq("en", "es"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().toSeq

    // fresh run: ledger semantics equal the same gates composed in-memory
    val d1 = java.nio.file.Files.createTempDirectory("intake1").toString
    val fresh = rows(run(d1))
    val gateQ = Curation.qualityFilter(docs, "doc_id", "text", 5, 500, 650000L,
        Seq("en", "es")).select($"id", $"keep".as("keep_quality"))
    val kept = docs.select($"doc_id".as("id"), $"text")
      .join(gateQ.where($"keep_quality").select("id"), "id")
    val gateD = Dedup.exact(kept, "id", "text")
      .select($"id", $"keep".as("keep_dedup"))
    val surv = kept.join(gateD.where($"keep_dedup").select("id"), "id")
    val gateC = Contamination.ngramOverlap(surv,
        eval.select($"doc_id".as("id"), $"text"), "id", "text")
      .select($"id", $"contaminated")
    val expected = rows(docs.select($"doc_id".as("id"))
      .join(gateQ, Seq("id"), "left")
      .join(gateD, Seq("id"), "left")
      .join(gateC, Seq("id"), "left")
      .join(Curation.splitCorpus(docs.select($"doc_id".as("id")), "id", 800, 100)
        .select("id", "split"), Seq("id"), "left")
      .select($"id", $"keep_quality",
        coalesce($"keep_dedup", lit(false)).as("keep_dedup"),
        coalesce($"contaminated", lit(false)).as("contaminated"),
        $"split",
        ($"keep_quality" && coalesce($"keep_dedup", lit(false)) &&
          !coalesce($"contaminated", lit(false))).as("final_keep")))
    assert(fresh === expected)

    // crash simulation: dedup gate died mid-write (no _SUCCESS marker),
    // contam/splits never ran — the retry must rewrite dedup, run the
    // missing gates, and NOT recompute the committed quality gate
    val d2 = java.nio.file.Files.createTempDirectory("intake2").toString
    run(d2).collect()
    val fs = java.nio.file.Paths.get(d2)
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    java.nio.file.Files.delete(fs.resolve("dedup/_SUCCESS"))
    rmrf(fs.resolve("contam"))
    rmrf(fs.resolve("splits"))
    val qualityMarkerMtime =
      java.nio.file.Files.getLastModifiedTime(fs.resolve("quality/_SUCCESS"))
    val resumed = rows(run(d2))
    assert(resumed === fresh)
    assert(java.nio.file.Files.getLastModifiedTime(fs.resolve("quality/_SUCCESS"))
      === qualityMarkerMtime, "a committed gate must not be recomputed")
  }

  test("intakeLedger refuses to resume a path committed with different params/inputs") {
    import graft.util.Tables
    val docs = Tables.documents(spark, Sf0001).where($"doc_id" % 20 =!= 0)
    val eval = Tables.documents(spark, Sf0001).where($"doc_id" % 20 === 0)
    val path = java.nio.file.Files.createTempDirectory("intakefp").toString
    Curation.intakeLedger(docs, eval, "doc_id", "text", path,
      minTokens = 5, maxTokens = 500, minQualityPpm = 650000L,
      langs = Seq("en", "es")).collect()

    // changed threshold → stale gates must not be served
    val exParams = intercept[IllegalStateException] {
      Curation.intakeLedger(docs, eval, "doc_id", "text", path,
        minTokens = 10, maxTokens = 500, minQualityPpm = 650000L,
        langs = Seq("en", "es")).collect()
    }
    assert(exParams.getMessage.contains("different inputs/parameters"))

    // changed input relation (different filter → different canonical plan)
    val exInput = intercept[IllegalStateException] {
      Curation.intakeLedger(
        Tables.documents(spark, Sf0001).where($"doc_id" % 10 =!= 0),
        eval, "doc_id", "text", path,
        minTokens = 5, maxTokens = 500, minQualityPpm = 650000L,
        langs = Seq("en", "es")).collect()
    }
    assert(exInput.getMessage.contains("different inputs/parameters"))

    // identical rerun still resumes cleanly
    assert(Curation.intakeLedger(docs, eval, "doc_id", "text", path,
      minTokens = 5, maxTokens = 500, minQualityPpm = 650000L,
      langs = Seq("en", "es")).count() > 0)
  }

  private def mixDocs = Seq(
    // big source: 8 docs × 6 tokens; small source: 2 docs × 3 tokens
    (1 to 8).map(i => (i.toLong, "big", "a b c d e f")) ++
      Seq((100L, "small", "x y z"), (101L, "small", "x y w")): _*
  ).toDF("doc_id", "source", "text")

  test("mixSources: √-temperature flattening keeps small sources at a higher rate") {
    val rep = Curation.mixSources(mixDocs, "doc_id", "source", "text",
        budgetPermille = 500)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (bigDocs, bigToks, bigKept, bigTokKept) = rep("big")
    val (smDocs, smToks, smKept, smTokKept) = rep("small")
    assert((bigDocs, bigToks) === (8L, 48L) && (smDocs, smToks) === (2L, 6L))
    // acceptance ppm: w_big=√48·1e6≈6.93e6, w_small=√6·1e6≈2.45e6,
    // B=27 ⇒ r_big = (6.93/9.38)·27/48 ≈ 0.415, r_small = min(1, (2.45/9.38)·27/6) ≈ 1
    // small is kept whole (rate clamps at 1), big is downsampled
    assert(smKept === 2L && smTokKept === 6L)
    assert(bigKept < 8L)
    assert(bigTokKept === bigKept * 6)
  }

  test("mixSources: budget 0 keeps nothing; acceptance matches the integer spec exactly") {
    val zero = Curation.mixSources(mixDocs, "doc_id", "source", "text", 0)
      .agg(sum("docs_kept")).collect().head.getLong(0)
    assert(zero === 0L)
    // recompute the division-free acceptance test independently (BigInt)
    // and require the reported kept counts to match document-for-document
    val perDoc = Map("big" -> 6L, "small" -> 3L)
    val nS = Map("big" -> 48L, "small" -> 6L)
    val wS = nS.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val w = wS.values.sum
    val budget = nS.values.sum * 700 / 1000
    val expected = mixDocs.collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, src) =>
        // hash60 is 60-bit ⇒ non-negative, so % is already pmod
        val ppm = BigInt(
          graft.functions.Text.hash60Local(s"$id:graft-mix") % 1000000L)
        ppm * w * nS(src) < BigInt(wS(src)) * budget * 1000000L
      }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Curation.mixSources(mixDocs, "doc_id", "source", "text", 700)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    Seq("big", "small").foreach { s =>
      val kept = expected.getOrElse(s, 0L)
      assert(got(s) === ((kept, kept * perDoc(s))), s"source=$s")
    }
  }

  test("exportPackedShards: loader-ready layout, manifest agrees with shards exactly") {
    val docs = Tables.documents(spark, Sf0001).limit(200)
    val path = java.nio.file.Files.createTempDirectory("graft_export").toString
    val manifest = Curation.exportPackedShards(docs, "source", "doc_id",
      "text", tokenBudget = 256, path = path)
    val shards = spark.read.parquet(s"$path/shards")
    // every doc exported once, with its text
    assert(shards.count() === docs.count())
    assert(shards.columns.toSet ===
      Set("id", "text", "n_tokens", "seq_id", "seq_offset", "group"))
    // manifest is the exact index of the shards
    val fromShards = shards.groupBy("group", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val fromManifest = manifest.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fromManifest === fromShards)
    // partition layout: one directory per source shard
    val dirs = new java.io.File(s"$path/shards").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("group=")))
    // packing invariant: every document STARTS inside the budget (a doc
    // is never split, so totals may overflow by the last doc's tail)
    assert(shards.where(col("seq_offset") >= 256).count() === 0)
  }

  test("qualityTiers: balanced per-(stratum,shard) buckets ordered by score, stable under repartitioning") {
    val docs = Tables.documents(spark, Sf0001)
    val tiers = Curation.qualityTiers(docs, "doc_id", "text", "lang",
      tiers = 4, shards = 2).cache()
    val rows = tiers.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // within every window partition: bucket sizes differ by ≤ 1 and the
    // worst doc of tier t scores ≥ the best doc of tier t+1
    rows.groupBy(t => (t._2, t._3)).foreach { case ((stratum, shard), part) =>
      val bySize = part.groupBy(_._5).view.mapValues(_.length).values.toSeq
      assert(bySize.max - bySize.min <= 1, s"unbalanced tiers in $stratum/$shard")
      val byTier = part.groupBy(_._5).view.mapValues(_.map(_._4)).toMap
      for (t <- 1 until byTier.keys.max)
        assert(byTier(t).min >= byTier(t + 1).max,
          s"tier $t should outrank tier ${t + 1} in $stratum/$shard")
    }
    // pure-function determinism: partitioning must not change any tier
    val again = Curation.qualityTiers(docs.repartition(7), "doc_id", "text",
      "lang", tiers = 4, shards = 2).collect()
      .map(r => (r.getLong(0), r.getInt(4))).toSet
    assert(again === rows.map(t => (t._1, t._5)).toSet)
  }

  test("mixSources invariants over seeded random corpora: bounds and budget monotonicity") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val nSrc = 2 + rnd.nextInt(5)
      val docs = (1 to 60 + rnd.nextInt(120)).map { i =>
        val words = 1 + rnd.nextInt(30)
        (i.toLong + trial * 10000L, s"s${rnd.nextInt(nSrc)}",
          Seq.fill(words)("w" + rnd.nextInt(50)).mkString(" "))
      }.toDF("doc_id", "source", "text")
      def report(b: Int) = Curation.mixSources(docs, "doc_id", "source", "text", b)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val budgets = Seq(100, 400, 900).map(b => b -> report(b)).toMap
      budgets.values.foreach(_.foreach { case (_, (nd, nt, dk, tk)) =>
        assert(dk <= nd && tk <= nt && dk >= 0 && tk >= 0)
      })
      // acceptance ppm grows with the budget and the hash is fixed, so
      // kept docs at a smaller budget are a subset — counts must be
      // monotone per source
      for (s <- budgets(100).keys) {
        assert(budgets(100)(s)._3 <= budgets(400)(s)._3)
        assert(budgets(400)(s)._3 <= budgets(900)(s)._3)
        assert(budgets(100)(s)._4 <= budgets(400)(s)._4)
        assert(budgets(400)(s)._4 <= budgets(900)(s)._4)
      }
    }
  }

  test("mixSources: verdicts are a pure id-hash — stable across partitioning and salt-sensitive") {
    val a = Curation.mixSources(mixDocs, "doc_id", "source", "text", 500)
      .collect().toSet
    val b = Curation.mixSources(mixDocs.repartition(7), "doc_id", "source",
        "text", 500)
      .collect().toSet
    assert(a === b)
    val salted = Curation.mixSources(mixDocs, "doc_id", "source", "text", 500,
        salt = "other")
      .collect().toSet
    // different salt → a different (valid) sample; rates identical, so the
    // per-source totals columns agree even when kept counts differ
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }
}
