package graft

import graft.dedup.Dedup
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-family semantics: exact groups, Jaccard math, MinHash recall vs
  * the exact baseline, SimHash chunk-join completeness. */
class DedupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the fast brown fox jumps over the lazy dog"),
    (2L, "the fast brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text about spark engines"),
    (4L, "the fast brown fox jumps over the lazy dog"), // exact dup of 1
  ).toDF("id", "text")

  test("exact dedup keeps the min id per identical-text group") {
    val got = Dedup.exact(docs, "id", "text")
      .select("id", "group_n", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 2L, true), (4L, 2L, false), (2L, 1L, true), (3L, 1L, true)))
  }

  test("exactVectors: identical embeddings collapse to the min id") {
    val e = Seq(
      (10L, Seq(1.0, 2.0)),
      (3L, Seq(1.0, 2.0)),   // dup of 10, smaller id wins
      (7L, Seq(1.0, 2.0001)), // near but NOT identical
      (8L, Seq(5.0, 5.0)),
    ).toDF("id", "emb")
    val got = Dedup.exactVectors(e, "id", "emb")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === Map(
      10L -> ((2L, false)), 3L -> ((2L, true)),
      7L -> ((1L, true)), 8L -> ((1L, true))))
  }

  test("jaccard pairs: hand-computed shingle overlap") {
    // docs 1 & 4 identical → jaccard 1.0; docs 1 & 2 each have 7 distinct
    // 3-shingles and share all but the last → intersection 6, union 8 → 0.75
    val got = Dedup.jaccardPairs(docs, "id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 4L)) === 1.0)
    assert(got((1L, 2L)) === 0.75)
    assert(got((2L, 4L)) === got((1L, 2L))) // 4 is a copy of 1
    assert(got.size === 3)
  }

  test("jaccardPairs refuses corpus-sized input unless forced (quadratic baseline fence)") {
    val big = spark.range(Dedup.JaccardMaxDocs + 1L)
      .select(col("id"), concat(lit("doc text number "), col("id")).as("text"))
    val ex = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(big, "id", "text", 0.5)
    }
    assert(ex.getMessage.contains("minhashPairs"),
      "the failure must point at the banded-candidates alternative")
    // force = true is the documented escape hatch (plan builds; not executed
    // — actually running the quadratic join on 100k rows is the point of
    // the fence)
    Dedup.jaccardPairs(big, "id", "text", 0.5, force = true)
  }

  test("minhash LSH finds the full exact-Jaccard pair set on sf0.001 (recall 1 here)") {
    val d = Tables.documents(spark, Sf0001)
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(d, "doc_id", "text", 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh === exact)
  }

  test("simhash chunked candidate join equals brute-force pairs") {
    val d = Tables.documents(spark, Sf0001)
    val sigs = Dedup.simhash(d, "doc_id", "text").cache()
    val chunked = Dedup.simhashPairs(sigs, 2)
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
    // brute force over the same signatures
    val a = sigs.select(col("id").as("id1"), col("simhash").as("s1"))
    val b = sigs.select(col("id").as("id2"), col("simhash").as("s2"))
    val brute = a.crossJoin(b).where(col("id1") < col("id2"))
      .withColumn("x", col("s1").bitwiseXOR(col("s2")))
      .select(col("id1"), col("id2"), expr("bit_count(x)").cast("long").as("dist"))
      .where(col("dist") <= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(chunked === brute)
    assert(brute.nonEmpty)
  }

  test("sign-LSH cosine pairs equal brute force at the declared banding; no CartesianProduct") {
    val e = Tables.embeddings(spark, Sf0001)
    // the declared q_neardup_cosine config: 16 bands × 2 rows at θ=0.4
    // (this corpus's max pairwise cosine ≈ 0.51) must reproduce brute
    // exactly — precision 1 by exact verify, recall 1 by banding margin
    val brute = Dedup.cosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    val lshDf = Dedup.cosinePairsLsh(e, "vec_id", "embedding", 0.4, dim = 64)
    val lsh = lshDf.select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(lsh === brute)
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH path must not be all-pairs")
  }

  test("sign-LSH prunes hard at a tight threshold (injected near-dups)") {
    // 400 near-orthogonal base vectors + 5 injected noisy copies: at
    // θ=0.8 only the copies qualify, and banding discards the bulk
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Double] = Seq.fill(64)(rnd.nextGaussian())
    val base = (1L to 400L).map(i => (i, vec()))
    val dups = (1L to 5L).map { i =>
      val v = base((i * 7).toInt)._2
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 0.05))
    }
    val e = (base ++ dups).toDF("id", "emb")
    val got = Dedup.cosinePairsLsh(e, "id", "emb", 0.8, dim = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val brute = Dedup.cosinePairs(e, "id", "emb", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got === brute)
    assert(brute.size >= 5, s"expected the injected dups, got ${brute.size}")
  }

  test("connected components: chains merge transitively, components stay separate") {
    // chain 1-2-3 (transitive near-dups), separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val got = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain still converges (diameter > 1 iteration)
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got2 = Dedup.components(chain).collect().map(r => r.getLong(1)).distinct
    assert(got2 === Array(1L))
    // pointer doubling: a 200-node chain (diameter 199) inside 10 rounds —
    // one-hop propagation would need ~199; 2^10 = 1024 covers it
    val long = (1L until 200L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got3 = Dedup.components(long, maxIter = 10)
      .collect().map(r => r.getLong(1)).distinct
    assert(got3 === Array(1L))
  }

  test("connected components match a union-find reference on random graphs (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(40)
      val edges = (1 to n).map(_ =>
        (1L + rnd.nextInt(n).toLong, 1L + rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (edges.nonEmpty) {
        // reference: plain union-find with min-label extraction
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.map(v => v -> find(v)).toMap
        val got = Dedup.components(edges.toDF("id1", "id2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"trial $trial: n=$n edges=$edges")
      }
    }
  }

  test("incremental components == full recompute on random graphs and splits") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 8) {
      val n = 8 + rnd.nextInt(40)
      val edges = (1 to 2 * n).map(_ =>
        (1L + rnd.nextInt(n).toLong, 1L + rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // random edge split: the wave may merge old components, attach new
      // nodes, or both
      val (w2, w1) = edges.partition(_ => rnd.nextBoolean())
      if (w1.nonEmpty && w2.nonEmpty) {
        val full = Dedup.components(edges.toDF("id1", "id2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
        val inc = Dedup.componentsIncremental(
            Dedup.components(w1.toDF("id1", "id2")), w2.toDF("id1", "id2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
        assert(inc === full, s"trial $trial: w1=$w1 w2=$w2")
      }
    }
    // the hand-checkable merge shape: two settled components bridged by
    // one wave edge relabel to the global min; a fresh chain attaches
    val oldMap = Dedup.components(Seq((1L, 2L), (10L, 11L)).toDF("id1", "id2"))
    val updated = Dedup.componentsIncremental(oldMap,
        Seq((2L, 10L), (11L, 20L), (20L, 21L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(updated === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 1L, 21L -> 1L))
    // an empty wave is the identity
    val same = Dedup.componentsIncremental(oldMap,
        Seq.empty[(Long, Long)].toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cosine near-dup pairs: identical vector pair detected, threshold respected") {
    val e = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0)),
    ).toDF("id", "emb")
    val got = Dedup.cosinePairs(e, "id", "emb", 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("semanticPairs: single-cluster degenerate equals brute pairs; clusters scope") {
    import graft.index.Ivf
    val embs = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val n = embs.count()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val brute = pairs(Dedup.cosinePairs(embs, "vec_id", "embedding", 0.45))

    // degenerate single-cluster index: all pairs share the cell, so the
    // cluster-scoped join must reproduce the brute result exactly
    val oneCell = Ivf.IvfIndex(
      embs.select(col("vec_id").as("id"), lit(0).as("cluster")),
      Map(0 -> Array.fill(64)(0.0)), Map(0 -> n), "cosine", 64)
    assert(pairs(Dedup.semanticPairs(oneCell, embs, "vec_id", "embedding", 0.45))
      === brute)

    // real multi-cluster index: a SUBSET of brute pairs with identical
    // sims (cross-cluster pairs are the documented loss), nonempty at
    // this threshold, via a cluster equi-join (never a cartesian product)
    val idx = Ivf.build(embs, "vec_id", "embedding")
    val semDf = Dedup.semanticPairs(idx, embs, "vec_id", "embedding", 0.45)
    assert(!semDf.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val sem = pairs(semDf)
    assert(sem.nonEmpty)
    assert(sem.toSet.subsetOf(brute.toSet),
      "cluster-scoped pairs must be brute pairs (same rounded sims)")

    // runaway-cluster guard: loud failure, force overrides
    val hot = oneCell.copy(sizes = Map(0 -> (Dedup.SemanticMaxClusterSize + 1)))
    val ex = intercept[IllegalArgumentException] {
      Dedup.semanticPairs(hot, embs, "vec_id", "embedding", 0.45)
    }
    assert(ex.getMessage.contains("quadratic"))
    assert(pairs(Dedup.semanticPairs(hot, embs, "vec_id", "embedding", 0.45,
      force = true)) === brute)
  }

  test("signLshCandidatesAgainst: directed batch→index candidates, no self-pairs, each pair once") {
    val e = Tables.embeddings(spark, Sf0001)
    val index = Dedup.signLshSketches(e, "vec_id", "embedding", 64)
    val batch = e.where(col("vec_id") % 5 === 0)
    val cands = Dedup.signLshCandidatesAgainst(
        Dedup.signLshSketches(batch, "vec_id", "embedding", 64), index)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // directed: id1 always from the batch; never a self-pair
    assert(cands.nonEmpty)
    assert(cands.forall { case (id1, id2) => id1 % 5 == 0 && id1 != id2 })
    // first-agreeing-band dedup: each (batch, index) pair at most once
    assert(cands.length === cands.distinct.length)
    // the verified output over these candidates equals the batch-filtered
    // rows of the SELF-join path (same sketches, same recall): every
    // brute near-dup pair touching the batch must survive
    val verified = Dedup.cosineVerify(
        Dedup.signLshCandidatesAgainst(
          Dedup.signLshSketches(batch, "vec_id", "embedding", 64), index),
        e, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.cosinePairs(e, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(_._1 % 5 == 0).toSet
    assert(verified === brute)
  }

  test("signLsh batch guard counts DOCUMENTS, not banded rows") {
    // 10,000 ids × 16 bands = 160,000 banded rows — well inside the
    // 65,536-DOCUMENT broadcast contract; a guard that counted banded
    // rows would refuse this legitimate daily batch 16× too early
    val big = spark.range(10000L * 16)
      .select((col("id") / 16).cast("long").as("id"), lit(0L).as("sk"),
        (col("id") % 16).cast("int").as("band"), col("id").as("bkey"))
    val emptyIndex = big.limit(0)
    assert(Dedup.signLshCandidatesAgainst(big, emptyIndex).count() === 0)
    assert(Dedup.signLshCandidatesAgainstMultiProbe(big, emptyIndex).count() === 0)
  }

  test("containmentPairs: subset doc scores C=1 against its superset where Jaccard stays low") {
    // doc 2 = the first third of doc 1: every shingle of 2 is in 1
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val subset = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, subset), (3L, "totally different words entirely here now"))
      .toDF("id", "text")
    val got = Dedup.containmentPairs(docs, "id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // directed: 2 ⊂ 1 only; the reverse direction (C(1→2) ≈ 0.23) and
    // doc 3 must be absent
    assert(got.keySet === Set((2L, 1L)))
    assert(got((2L, 1L)) === 1.0)
    // symmetric Jaccard misses this pair at the same threshold
    assert(Dedup.jaccardPairs(docs, "id", "text", 0.9).count() === 0)
    // guard parity with jaccardPairs: loud on oversized input
    val many = (1L to (Dedup.JaccardMaxDocs + 1).toLong).toDF("id")
      .withColumn("text", lit("x"))
    assert(intercept[IllegalArgumentException] {
      Dedup.containmentPairs(many, "id", "text", 0.9)
    }.getMessage.contains("quadratic"))
  }

  test("containmentPairsPrefix equals the quadratic baseline; minhash bands would miss the subset pairs") {
    // subset docs engineered for HIGH containment / LOW Jaccard — the
    // regime the prefix filter exists for: doc 2 ⊂ doc 1, doc 5 ⊂ doc 4,
    // plus shared-boilerplate noise docs that stress the rarest-first
    // prefix ordering (the boilerplate shingles are the most frequent,
    // so they must stay OUT of every prefix)
    val boiler = "terms of service apply all rights reserved contact us"
    val bigA = (1 to 60).map(i => s"alpha$i").mkString(" ") + " " + boiler
    val subA = (11 to 25).map(i => s"alpha$i").mkString(" ")
    val bigB = (1 to 50).map(i => s"beta$i").mkString(" ") + " " + boiler
    val subB = (20 to 32).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, bigA), (2L, subA), (4L, bigB), (5L, subB),
      (7L, "unrelated filler content " + boiler),
      (8L, "another separate page " + boiler),
    ).toDF("id", "text")
    for (thr <- Seq(0.9, 0.7, 0.5)) {
      val base = Dedup.containmentPairs(docs, "id", "text", thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fast = Dedup.containmentPairsPrefix(docs, "id", "text", thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast === base, s"prefix path diverged from baseline at thr=$thr")
    }
    // the subset pairs are present at 0.9 ...
    val pairs = Dedup.containmentPairsPrefix(docs, "id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)) && pairs.contains((5L, 4L)))
    // ... while their Jaccard is far below the banding threshold minhash
    // candidates are tuned for — the structural miss this path closes
    // (the boilerplate noise pair may clear 0.5 symmetrically; the SUBSET
    // pairs must not)
    val j05 = Dedup.jaccardPairs(docs, "id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j05.contains((1L, 2L)) && !j05.contains((4L, 5L)),
      "subset pairs should be invisible to symmetric Jaccard at 0.5")
    assert(Dedup.minhashPairs(docs, "id", "text", 0.9).count() === 0)
  }

  test("containmentPairsAgainst: incremental screen equals the batch-restricted baseline in BOTH directions") {
    // corpus: the engineered subset fixture; batch: a NEW doc contained
    // by corpus doc 1 (batch→corpus), a NEW doc CONTAINING corpus doc 5
    // (corpus→batch, the direction only the INDEXED prefixes can catch),
    // a RE-INGESTED corpus doc (must pair with its superset, never with
    // itself), and an unrelated doc (must stay silent)
    val boiler = "terms of service apply all rights reserved contact us"
    val bigA = (1 to 60).map(i => s"alpha$i").mkString(" ") + " " + boiler
    val subA = (11 to 25).map(i => s"alpha$i").mkString(" ")
    val bigB = (1 to 50).map(i => s"beta$i").mkString(" ") + " " + boiler
    val subB = (20 to 32).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, bigA), (2L, subA), (4L, bigB), (5L, subB),
      (7L, "unrelated filler content " + boiler)).toDF("id", "text")
    val batch = Seq(
      (10L, (1 to 12).map(i => s"alpha$i").mkString(" ")), // ⊂ doc 1
      (11L, (15 to 40).map(i => s"beta$i").mkString(" ")), // ⊃ doc 5
      (2L, subA),                                          // re-ingest
      (12L, (1 to 20).map(i => s"delta$i").mkString(" ")), // unrelated
    ).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("continc").toString
    graft.index.IndexStore.saveContainment(corpus, "id", "text", 0.9, dir)
    val idx = graft.index.IndexStore.loadContainment(spark, dir)
    val got = Dedup.containmentPairsAgainst(batch, "id", "text", idx, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // oracle: the quadratic baseline over corpus ∪ batch, restricted to
    // pairs with one side in the batch and the other in the index
    val union = corpus.unionByName(batch).dropDuplicates("id")
    val batchIds = Set(10L, 11L, 2L, 12L)
    val indexIds = Set(1L, 2L, 4L, 5L, 7L)
    val expected = Dedup.containmentPairs(union, "id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) =>
        (batchIds(a) && indexIds(b)) || (batchIds(b) && indexIds(a)) }
      .toSet
    assert(got === expected)
    // both directions genuinely present: the new subset doc found its
    // corpus superset, and the indexed subset doc found its new superset
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs.contains((10L, 1L)), s"batch→corpus direction missing: $pairs")
    assert(pairs.contains((5L, 11L)), s"corpus→batch direction missing: $pairs")
    assert(pairs.contains((2L, 1L)), "re-ingested doc must still pair with its superset")
    assert(!pairs.exists(p => p._1 === p._2), "re-ingest must never self-pair")
    // prefixes built for t=0.9 cannot guarantee recall below it — loud
    assert(intercept[IllegalArgumentException] {
      Dedup.containmentPairsAgainst(batch, "id", "text", idx, 0.8)
    }.getMessage.contains("too short"))

    // receipts: same output, and the stats describe the work coherently —
    // the screen scanned a strict subset (or all) of the buckets, every
    // emitted pair was verified, every verified pair was a candidate
    val (outDf, stats) = Dedup.containmentPairsAgainstWithStats(
      batch, "id", "text", idx, 0.9)
    assert(outDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === expected)
    assert(stats.totalBuckets === Dedup.ShingleBuckets)
    assert(stats.bucketsScanned > 0 && stats.bucketsScanned <= stats.totalBuckets)
    assert(stats.emittedPairs === expected.size.toLong)
    assert(stats.verifiedPairs >= stats.emittedPairs,
      s"verified must cover emitted: $stats")
    assert(stats.candidatePairs >= stats.verifiedPairs,
      s"candidates must cover verified: $stats")
  }

  test("containment screen receipts cost one execution, not one per count") {
    // the WithStats variant localCheckpoints each screen stage once and
    // counts the checkpoints — before that fix the three counts re-ran
    // the candidate/intersection joins ~3×. Pin it with the public
    // statusTracker job-group API: total Spark stages executed by the
    // stats path must stay within a small additive overhead of the lazy
    // path's single execution (the checkpoint/count jobs), nowhere near
    // the ~2.5× a per-count re-execution costs.
    val corpus = (1 to 30).map(i =>
      (i.toLong, (i to i + 25).map(j => s"tok$j").mkString(" "))).toDF("id", "text")
    val batch = (3 to 12).map(i =>
      (100L + i, (i to i + 24).map(j => s"tok$j").mkString(" "))).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("contstage").toString
    graft.index.IndexStore.saveContainment(corpus, "id", "text", 0.9, dir)
    val idx = graft.index.IndexStore.loadContainment(spark, dir)
    var lazyOut: Set[(Long, Long, Double)] = null
    val lazyStages = stagesFor {
      lazyOut = Dedup.containmentPairsAgainst(batch, "id", "text", idx, 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    var statsOut: Set[(Long, Long, Double)] = null
    var stats: Dedup.ContainmentScreenStats = null
    val statsStages = stagesFor {
      val (df, s) = Dedup.containmentPairsAgainstWithStats(
        batch, "id", "text", idx, 0.9)
      stats = s
      statsOut = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(statsOut === lazyOut, "receipts must not change the output")
    assert(stats.emittedPairs === lazyOut.size.toLong)
    assert(lazyOut.nonEmpty, "fixture must emit pairs or the pin is vacuous")
    // additive overhead: 3 checkpoint-backed counts + the final collect
    // over a checkpoint are ~2 stages each; a per-count re-execution of
    // the screen would roughly TRIPLE the join stages instead
    assert(statsStages <= lazyStages + 12,
      s"stats path executed $statsStages stages vs lazy $lazyStages — " +
        "receipts are re-running the screen instead of counting checkpoints")
  }

  test("containmentPairsAgainst fails loudly when a re-ingested id's text changed") {
    // both pair members ride in the batch AND sit in the index, and id 2's
    // batch text DIFFERS from its indexed postings: the two candidate
    // orientations then count different shingle intersections
    // (S_new(1)∩S_idx(2) = |subA| vs S_new(2)∩S_idx(1) = |changed2|) — a
    // stale index. Any silent pick would emit containment from mismatched
    // sets (values > 1.0 reachable), so the screen must raise instead.
    val bigA = (1 to 60).map(i => s"alpha$i").mkString(" ")
    val subA = (11 to 25).map(i => s"alpha$i").mkString(" ")
    val changed2 = (5 to 35).map(i => s"alpha$i").mkString(" ")
    val corpus = Seq((1L, bigA), (2L, subA)).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("contstale").toString
    graft.index.IndexStore.saveContainment(corpus, "id", "text", 0.9, dir)
    val idx = graft.index.IndexStore.loadContainment(spark, dir)
    val batch = Seq((1L, bigA), (2L, changed2)).toDF("id", "text")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val e = intercept[Exception] {
      Dedup.containmentPairsAgainst(batch, "id", "text", idx, 0.9).collect()
    }
    assert(messages(e).contains("stale index"), messages(e))
  }

  test("containment prefix candidates cover every qualifying pair and prune hot boilerplate") {
    // every doc shares the same 20-token boilerplate block; only 2 ⊂ 1 is
    // a real containment pair. The hot boilerplate shingles have df = n,
    // so rarest-first prefixes exclude them and candidate count stays far
    // below the all-pairs count the boilerplate postings would induce.
    val boiler = (1 to 20).map(i => s"common$i").mkString(" ")
    val uniq = (1 to 40).map(j => (100L + j, s"page$j " + boiler + s" tail$j extra$j more$j words$j here$j now$j end$j fin$j"))
    val bigA = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val docs = (Seq((1L, bigA + " " + boiler), (2L, (5 to 18).map(i => s"gamma$i").mkString(" "))) ++ uniq)
      .toDF("id", "text")
    val p = Dedup.shinglePostings(docs, "id", "text").cache()
    val cands = Dedup.containmentCandidates(p, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qualifying = Dedup.containmentPairs(docs, "id", "text", 0.9)
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(qualifying.subsetOf(cands), "prefix candidates missed a qualifying pair")
    // 42 docs all sharing boilerplate → 861 all-pairs; the prefix join on
    // rarest shingles must not reconstruct that clique
    val allPairs = 42 * 41 / 2
    assert(cands.size < allPairs / 4,
      s"candidate set ${cands.size} is close to all-pairs $allPairs — hot shingles leaked into prefixes")
    p.unpersist()
  }

  test("selective banding: high-threshold pairs equal brute force AND the candidates actually prune") {
    // plant guaranteed ≥0.95 structure: exact replicas (cos 1.0 — every
    // selective band agrees, recall is certain, and the hyperplanes are
    // seeded so the whole test is deterministic)
    val base = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val embs = base.unionByName(base
        .where($"vec_id" % 7 === 0)
        .withColumn("vec_id", $"vec_id" + 1000000L))
      .localCheckpoint(true)
    val n = embs.count()
    val got = Dedup.cosinePairsLshSelective(embs, "vec_id", "embedding",
        0.95, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val brute = Dedup.cosinePairs(embs, "vec_id", "embedding", 0.95)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got === brute,
      "selective-banding output must equal the brute-force oracle at 0.95")
    assert(got.nonEmpty, "the planted replicas must surface")
    // the point of the regime: candidates are a small fraction of all
    // pairs (the recall-first 2-bit design emits ~99% — measured in
    // SCALE.md round-7 §5)
    val vol = Dedup.signLshCandidateVolume(
      Dedup.signLshSketchesSelective(embs, "vec_id", "embedding", 64))
    val allPairs = n * (n - 1) / 2
    assert(vol < allPairs / 10,
      s"selective banding must prune: $vol candidates of $allPairs pairs")
    // the threshold floor is loud: below the regime this path LOSES
    // recall, so it refuses rather than silently missing pairs
    assert(intercept[IllegalArgumentException] {
      Dedup.cosinePairsLshSelective(embs, "vec_id", "embedding", 0.45, 64)
    }.getMessage.contains("high-threshold regime"))
    // analytic miss probability: tiny in-regime, catastrophic below it
    assert(Dedup.selectiveMissProb(0.95) < 1e-3)
    assert(Dedup.selectiveMissProb(0.45) > 0.5)
  }

  test("multi-probe selective banding: 0.85 pairs equal brute force where single-probe is weakest") {
    // plant GENUINELY-NEAR (not exact) clones: sign-flip the first
    // dimension, cos = 1 − 2·v₀²/‖v‖² — spread over ~0.66–1.0 on this
    // data, i.e. exactly the 0.85–0.95 band where 8-bit single-probe
    // recall decays (per-pair miss 2.2e-2 at cos exactly 0.85) and
    // Hamming-1 probing earns its fanout (1.2e-6)
    val base = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val embs = base.unionByName(base
        .where($"vec_id" % 3 === 0)
        .select(($"vec_id" + 1000000L).as("vec_id"),
          concat(array(negate(element_at($"embedding", 1))),
            slice($"embedding", 2, 63)).as("embedding")))
      .localCheckpoint(true)
    val n = embs.count()
    val got = Dedup.cosinePairsLshSelectiveMultiProbe(embs, "vec_id",
        "embedding", 0.85, 64)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val brute = Dedup.cosinePairs(embs, "vec_id", "embedding", 0.85)
      .orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    assert(got === brute,
      "multi-probe selective output must equal the brute-force oracle at 0.85")
    // the plant must actually exercise the near-but-not-exact band —
    // all-exact clones (sim 1.0) would prove nothing about probing
    assert(brute.exists(p => p._3 < 0.99 && p._3 >= 0.85),
      "fixture must contain genuinely near (sub-0.99) qualifying pairs")
    // candidates stay a small fraction of all pairs even with the ×13
    // probe fanout — the longer 12-bit keys are what keep probing a
    // prune (analytic random-pair admit ≈ 9.7%; probing the single-probe
    // 16×8 layout admits ~44%, measured before the defaults changed)
    val banded = Dedup.signLshSketchesSelective(embs, "vec_id", "embedding",
      64, bands = 2 * Dedup.SignLshBands, rows = 12)
    val cands = Dedup.selectiveCandidatesMultiProbe(banded).count()
    val allPairs = n * (n - 1) / 2
    assert(cands < allPairs / 5,
      s"multi-probe candidates must prune: $cands of $allPairs pairs")
    // analytic receipts: multi-probe closes the single-probe recall gap
    // at 0.85 by four orders of magnitude, and never probes worse
    assert(Dedup.selectiveMissProbMultiProbe(0.85) < 1e-4)
    assert(Dedup.selectiveMissProb(0.85) > 1e-2)
    assert(Seq(0.85, 0.90, 0.95, 0.99).forall(t =>
      Dedup.selectiveMissProbMultiProbe(t) <= Dedup.selectiveMissProb(t)))
    // same loud floor as single-probe
    assert(intercept[IllegalArgumentException] {
      Dedup.cosinePairsLshSelectiveMultiProbe(embs, "vec_id", "embedding",
        0.45, 64)
    }.getMessage.contains("high-threshold regime"))
  }

  test("signLshCandidateVolume is the exact pre-filter bucket join size and flags clone blowup") {
    val embs = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val banded = Dedup.signLshSketches(embs, "vec_id", "embedding", 64)
      .localCheckpoint(true)
    // self-join volume = Σ n·(n−1)/2 per (band, bkey) — brute-force check
    val buckets = banded.groupBy("band", "bkey").count()
      .as[(Int, Long, Long)].collect()
    val expectedSelf = buckets.map { case (_, _, n) => n * (n - 1) / 2 }.sum
    assert(Dedup.signLshCandidateVolume(banded) === expectedSelf)
    // batch-vs-index volume = Σ batchCount × indexCount on shared buckets
    val batch = Dedup.signLshSketches(embs.where($"vec_id" % 5 === 0),
      "vec_id", "embedding", 64).localCheckpoint(true)
    val batchBuckets = batch.groupBy("band", "bkey").count()
      .as[(Int, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val expectedAgainst = buckets.collect {
      case (b, k, n) if batchBuckets.contains((b, k)) => batchBuckets((b, k)) * n
    }.sum
    assert(Dedup.signLshCandidateVolumeAgainst(batch, banded) === expectedAgainst)
    // the budget signal: a clone-inflated index (every vector duplicated
    // 4×) must blow the estimate up ~quadratically in the clone factor,
    // BEFORE anyone pays for the verify join
    val cloned = (0 until 4)
      .map(i => embs.withColumn("vec_id", $"vec_id" + (i * 1000000L)))
      .reduce(_ unionByName _)
    val clonedVol = Dedup.signLshCandidateVolumeAgainst(batch,
      Dedup.signLshSketches(cloned, "vec_id", "embedding", 64))
    assert(clonedVol >= 4 * expectedAgainst,
      s"4x clones must inflate the volume ≥ 4x: $clonedVol vs $expectedAgainst")
    // degenerate inputs budget to 0, never NPE
    assert(Dedup.signLshCandidateVolume(banded.limit(0)) === 0L)
    assert(Dedup.signLshCandidateVolumeAgainst(batch.limit(0), banded) === 0L)
  }

  test("containmentCandidateVolume is the exact pre-filter candidate join size") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"va$i").mkString(" ")),
      (2L, (5 to 18).map(i => s"va$i").mkString(" ")),
      (3L, (1 to 25).map(i => s"vb$i").mkString(" ")),
      (4L, "totally different words entirely over here now friends"),
    ).toDF("id", "text")
    val p = Dedup.shinglePostings(docs, "id", "text").cache()
    val vol = Dedup.containmentCandidateVolume(p, 0.9)
    // ground truth: materialize the same prefix relation and count the
    // equi-join rows before self-pair filtering and dedup
    val docFreq = p.groupBy("h").agg(count(lit(1)).as("df"))
    val sizes = p.groupBy("id").agg(count(lit(1)).as("sz"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("h").asc)
    val prefix = p.join(docFreq, "h")
      .withColumn("rk", row_number().over(rk)).join(sizes, "id")
      .where(col("rk") <= col("sz") - ceil(lit(0.9) * col("sz")) + 1)
      .select(col("id").as("qid"), col("h"))
    val joined = prefix.join(p.select(col("id").as("cid"), col("h")), "h").count()
    assert(vol === joined)
    assert(vol > 0)
    // an empty corpus partition budgets to 0 (sum-over-nothing is SQL
    // null — must not NPE the budgeting call)
    assert(Dedup.containmentCandidateVolume(p.limit(0), 0.9) === 0L)
    p.unpersist()
  }

  /** Total Spark stages executed by `body`, via the public statusTracker
    * job-group API — the one-execution pin for the receipts variants. */
  private def stagesFor(body: => Unit): Int = {
    val group = "stage-probe-" + java.util.UUID.randomUUID().toString
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    val t = spark.sparkContext.statusTracker
    t.getJobIdsForGroup(group)
      .flatMap(id => t.getJobInfo(id).map(_.stageIds().length)).sum
  }

  test("multi-probe candidates are a strict superset of exact-band candidates") {
    val e = Tables.embeddings(spark, Sf0001)
    val index = Dedup.signLshSketches(e, "vec_id", "embedding", 64)
    val batchSk = Dedup.signLshSketches(
      e.where(col("vec_id") % 5 === 0), "vec_id", "embedding", 64)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.signLshCandidatesAgainst(batchSk, index))
    val multi = pairSet(
      Dedup.signLshCandidatesAgainstMultiProbe(batchSk, index))
    assert(exact.subsetOf(multi),
      "flip 0 reproduces every exact-band candidate")
    // Hamming-1 probing must genuinely widen the candidate set on this
    // fixture (otherwise the knob is untested dead weight)
    assert(multi.size > exact.size)
    // contract parity: directed, no self-pairs, distinct
    assert(multi.forall { case (a, b) => a % 5 == 0 && a != b })
  }

  test("sign-LSH screen receipts: budget bounds candidates, one execution, missing vectors surface") {
    val e = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val index = Dedup.signLshSketches(e, "vec_id", "embedding", 64)
      .localCheckpoint(true)
    val batchSk = Dedup.signLshSketches(
      e.where(col("vec_id") % 5 === 0), "vec_id", "embedding", 64)
    for (mp <- Seq(false, true)) {
      var lazyOut: Set[(Long, Long, Double)] = null
      val lazyStages = stagesFor {
        lazyOut = Dedup.signLshScreen(batchSk, index, e, "vec_id",
            "embedding", 0.45, multiProbe = mp)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      }
      // the budget is a deliberate extra aggregation with its own stages —
      // measure it apart so the one-execution bound below is additive over
      // (one screen) + (one budget), not polluted by it
      val budgetStages = stagesFor {
        Dedup.signLshCandidateVolumeAgainst(
          if (mp) Dedup.signLshProbes(batchSk) else batchSk, index)
      }
      var statsOut: Set[(Long, Long, Double)] = null
      var stats: Dedup.SignLshScreenStats = null
      var statsDf: org.apache.spark.sql.DataFrame = null
      val statsStages = stagesFor {
        val (df, s) = Dedup.signLshScreenWithStats(batchSk, index, e,
          "vec_id", "embedding", 0.45, multiProbe = mp)
        stats = s
        statsDf = df
        statsOut = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      }
      assert(statsOut === lazyOut, s"receipts must not change the output (mp=$mp)")
      assert(lazyOut.nonEmpty, "fixture must emit pairs or the pin is vacuous")
      // coherence: the budget is the raw equi-join row count (self rows
      // and per-band repeats included), so it bounds the distinct
      // candidate set; on a fully-enriched corpus every candidate
      // verifies; emitted pairs passed the threshold filter
      assert(stats.budgetedJoinRows >= stats.candidatePairs, s"$stats")
      assert(stats.verifiedPairs === stats.candidatePairs,
        s"all ids carry embeddings here: $stats")
      assert(stats.emittedPairs <= stats.verifiedPairs, s"$stats")
      assert(stats.emittedPairs === lazyOut.size.toLong)
      assert(stats.probeFanout === (if (mp) 1 + Dedup.SignLshRows else 1))
      assert(stats.bandsProbed === Dedup.SignLshBands)
      // one-execution pin (the containment-receipts discipline): counts
      // read checkpoints, so the stats path stays within an additive
      // overhead of (one screen execution) + (one budget aggregation) —
      // re-running the screen per count would multiply the join stages
      assert(statsStages <= lazyStages + budgetStages + 14,
        s"stats path executed $statsStages stages vs lazy $lazyStages + " +
          s"budget $budgetStages (mp=$mp)")
      // structural half of the pin: the returned relation READS the sims
      // checkpoint (a LogicalRDD leaf), so consuming it — as the counts
      // did — never re-runs the candidate or verify joins
      assert(statsDf.queryExecution.optimizedPlan.collectLeaves().forall(
          _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
        "stats output must read the checkpointed sims, not re-plan the joins")
    }
    // a sketch-indexed id with NO embedding row cannot verify: the
    // verified count drops below candidates — the stale-enrichment signal
    val someIndexed = Dedup.signLshScreen(batchSk, index, e, "vec_id",
      "embedding", 0.45).select("id2").head.getLong(0)
    val (_, holed) = Dedup.signLshScreenWithStats(batchSk, index,
      e.where(col("vec_id") =!= someIndexed), "vec_id", "embedding", 0.45)
    assert(holed.verifiedPairs < holed.candidatePairs,
      s"dropping vec $someIndexed must surface as a verify shortfall: $holed")
  }

  test("ball-cover cosine pairs equal brute force; no CartesianProduct; coverage hole refuses") {
    import graft.index.Ivf
    val e = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val idx = Ivf.build(e, "vec_id", "embedding")
    // loose threshold on the near-random fixture: the screen keeps ~every
    // cluster pair (the documented graceful decay) but the rows are still
    // exactly brute and the join is bucketed, never all-pairs
    val brute = Dedup.cosinePairs(e, "vec_id", "embedding", 0.45)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    val ballDf = Dedup.cosinePairsBallCover(idx, e, "vec_id", "embedding", 0.45)
    val ball = ballDf.select("id1", "id2", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(ball === brute)
    assert(!ballDf.queryExecution.executedPlan.toString
      .contains("CartesianProduct"), "ball-cover path must not be all-pairs")
    // a corpus row missing from the assignments is invisible to the pair
    // screen — under the Verify gate the operator must refuse, not miss
    val prev = sys.props.get("graft.selfcheck")
    sys.props("graft.selfcheck") = "1"
    try {
      val extra = e.limit(1)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      assert(intercept[IllegalArgumentException] {
        Dedup.cosinePairsBallCover(idx, e.unionByName(extra),
          "vec_id", "embedding", 0.45).collect()
      }.getMessage.contains("missing from the index"))
    } finally prev match {
      case Some(v) => sys.props("graft.selfcheck") = v
      case None => sys.props.remove("graft.selfcheck")
    }
  }

  test("ball-cover screen prunes on clustered geometry and its mass is the verify work") {
    import graft.index.Ivf
    // three tight blobs on the unit sphere, far apart: within-blob cosine
    // ~1, cross-blob ~0 — the production-embedding geometry the screen is
    // built for. 30 vectors per blob around orthogonal anchors.
    val vecs = for {
      blob <- 0 until 3
      i <- 0 until 30
    } yield {
      val v = Array.fill(8)(0.0)
      v(blob) = 1.0
      v((blob + 3) % 8) = 0.01 * (i % 7) // tiny within-blob jitter
      (blob * 100L + i, v.toSeq)
    }
    val e = vecs.toDF("vec_id", "embedding")
    val idx = Ivf.build(e, "vec_id", "embedding", numClusters = 3)
    val (screen, mass) = Dedup.ballCoverClusterPairs(idx, 0.85)
    val n = vecs.size.toLong
    // the screen must drop every cross-blob cluster pair: candidate mass
    // collapses to the within-cluster pair count, a third of all pairs
    val within = idx.sizes.values.map(s => s * (s - 1) / 2).sum
    assert(mass === within,
      s"expected within-cluster mass only, got $mass (screen: $screen)")
    assert(mass < n * (n - 1) / 2 / 2,
      "pruned mass must be well below the all-pairs count")
    // and the pruned result still equals brute exactly (recall-1 theorem)
    val brute = Dedup.cosinePairs(e, "vec_id", "embedding", 0.85)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    val ball = Dedup.cosinePairsBallCover(idx, e, "vec_id", "embedding", 0.85)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(ball === brute)
  }

  test("ball-cover screen covers the verify filter's rounding boundary") {
    import graft.index.Ivf
    // a pair whose TRUE cosine sits 2.5e-7 BELOW the threshold: the
    // verify filter (round(sim, 6) ≥ t, matching the brute oracle)
    // accepts it, so the geometric screen must too — a bound evaluated
    // at the unrounded t would prune this cluster pair and silently
    // break the recall-1 contract at the rounding boundary
    val cos0 = 0.79999975
    val sin0 = math.sqrt(1 - cos0 * cos0)
    val e = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(cos0, sin0)))
      .toDF("vec_id", "embedding")
    val idx = Ivf.IvfIndex(
      assignments = Seq((1L, 0), (2L, 1)).toDF("id", "cluster"),
      centroids = Map(0 -> Array(1.0, 0.0), 1 -> Array(cos0, sin0)),
      sizes = Map(0 -> 1L, 1 -> 1L), metric = "cosine", dim = 2,
      radii = Map(0 -> 0.0, 1 -> 0.0))
    val (screen, _) = Dedup.ballCoverClusterPairs(idx, 0.8)
    assert(screen.contains((0, 1)),
      "the screen must keep a cluster pair whose members round up to t")
    val brute = Dedup.cosinePairs(e, "vec_id", "embedding", 0.8)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    val ball = Dedup.cosinePairsBallCover(idx, e, "vec_id", "embedding", 0.8)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect().toSet
    assert(brute === Set((1L, 2L, 0.8)))
    assert(ball === brute)
  }
}
