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
}
