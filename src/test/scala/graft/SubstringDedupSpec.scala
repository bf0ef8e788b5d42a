package graft

import graft.dedup.SubstringDedup
import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Exact substring-span dedup (Lee et al. shape): a shared passage
  * surfaces as one span of exactly its own extent in BOTH documents,
  * within-doc repetition counts, short docs clamp, coverage sums span
  * lengths, and the plan stays linear (no cartesian). */
class SubstringDedupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def uniq(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("a shared 12-token passage yields one span per doc covering exactly the passage") {
    val passage = (1 to 12).map(i => s"shared$i").mkString(" ")
    // docA: 10 unique tokens, passage, 5 unique tokens → span tokens 10..21
    // docB: 3 unique tokens, passage, 7 unique tokens  → span tokens 3..14
    val docs = Seq(
      (1L, s"${uniq("aaa", 10)} $passage ${uniq("bbb", 5)}"),
      (2L, s"${uniq("ccc", 3)} $passage ${uniq("ddd", 7)}"),
      (3L, uniq("eee", 30))).toDF("id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // passage length 12 at k=8 → dup start positions p..p+4 (5 grams),
    // covered tokens p..p+11
    assert(spans === Seq((1L, 10L, 21L, 5L), (2L, 3L, 14L, 5L)),
      s"got ${spans.toSeq}")
  }

  test("within-doc repetition is duplication (the concatenated-corpus contract)") {
    val run = (1 to 9).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run ${uniq("mid", 6)} $run"),
      (2L, uniq("other", 25))).toDF("id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    // 9-token run at positions 0 and 15 → dup starts {0,1} and {15,16} →
    // two spans covering tokens 0..8 and 15..23
    assert(spans === Seq((1L, 0L, 8L), (1L, 15L, 23L)), s"got ${spans.toSeq}")
  }

  test("identical short docs (< k tokens) dedup whole-doc; span_end clamps to the text") {
    val docs = Seq(
      (1L, "tiny pair"), (2L, "tiny pair"), (3L, "lonely text here"))
      .toDF("id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(spans === Seq((1L, 0L, 1L, 1L), (2L, 0L, 1L, 1L)), s"got ${spans.toSeq}")
  }

  test("overlapping extents merge: nearby islands yield ONE span and coverage stays <= 1") {
    // d1 = t0..t9; d2 duplicates d1's tokens 0..7, d3 duplicates 2..9.
    // d1's dup gram starts are {0, 2} (start 1 is unique) → two islands
    // whose 8-wide extents [0,7] and [2,9] overlap → MUST merge to one
    // span [0,9] (n_grams 2), and coverage must report 10/10, not 16/10.
    val t = (0 to 9).map(i => s"tok$i")
    val docs = Seq(
      (1L, t.mkString(" ")),
      (2L, t.take(8).mkString(" ")),
      (3L, t.drop(2).mkString(" "))).toDF("id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(spans === Seq((1L, 0L, 9L, 2L), (2L, 0L, 7L, 1L), (3L, 0L, 7L, 1L)),
      s"got ${spans.toSeq}")
    val cov = SubstringDedup.duplicationCoverage(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(cov === Seq((1L, 10L, 1.0), (2L, 8L, 1.0), (3L, 8L, 1.0)),
      s"coverage must never exceed 1: ${cov.toSeq}")
  }

  test("coverage: clean docs get 0.0, duped docs get exact token ratios, null text is 0-token") {
    val passage = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage ${uniq("pad", 8)}"), // 12 of 20 tokens covered
      (2L, s"$passage"),                   // 12 of 12
      (3L, uniq("fff", 40)),               // clean
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val cov = SubstringDedup.duplicationCoverage(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(cov === Seq(
      (1L, 20L, 12L, 0.6), (2L, 12L, 12L, 1.0),
      (3L, 40L, 0L, 0.0), (4L, 0L, 0L, 0.0)), s"got ${cov.toSeq}")
  }

  test("minCount raises the duplication bar") {
    val passage = (1 to 10).map(i => s"tri$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage ${uniq("x", 5)}"), (2L, s"$passage ${uniq("y", 5)}"),
      (3L, s"${uniq("z", 5)} $passage"), (4L, uniq("w", 20))).toDF("id", "text")
    val at2 = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8, minCount = 2)
      .select("id").as[Long].collect().toSet
    val at4 = SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8, minCount = 4)
      .count()
    assert(at2 === Set(1L, 2L, 3L), s"3 occurrences pass minCount=2: $at2")
    assert(at4 === 0L, "minCount=4 must reject a 3-occurrence passage")
  }

  test("real documents: spans are within doc bounds, disjoint per doc, and non-empty at sf0.001") {
    val docs = Tables.documents(spark, Sf0001)
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty, "testdata's planted near-dup clones must surface spans")
    spans.foreach { case (_, s, e, n) =>
      assert(s >= 0 && e >= s && n >= 1, s"degenerate span ($s,$e,$n)")
    }
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2).toSeq
      sorted.sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) =>
          assert(e1 < s2, s"doc $id spans overlap: $sorted")
        case _ =>
      }
    }
  }

  test("cutSpans removes exactly the duplicated tokens and passes clean docs through") {
    val passage = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("aaa", 4)} $passage"),
      (2L, s"$passage ${uniq("bbb", 4)}"),
      (3L, uniq("ccc", 20)),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val cut = SubstringDedup.cutSpans(docs, "id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(cut === Seq(
      (1L, 16L, 12L, uniq("aaa", 4)),
      (2L, 16L, 12L, uniq("bbb", 4)),
      (3L, 20L, 0L, uniq("ccc", 20)),
      (4L, 0L, 0L, "")), s"got ${cut.toSeq}")
  }

  test("topDuplicatedPassages reports the shared passage once with its occurrence counts") {
    val passage = (1 to 10).map(i => s"boil$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage ${uniq("x", 6)}"), (2L, s"${uniq("y", 6)} $passage"),
      (3L, s"$passage ${uniq("z", 6)}"), (4L, uniq("w", 20))).toDF("id", "text")
    val top = SubstringDedup.topDuplicatedPassages(docs, "id", "text", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top === Seq((passage, 10L, 3L, 3L)), s"got ${top.toSeq}")
  }

  test("hash-grouped passage report equals a direct string-grouped baseline") {
    // multiple distinct passages with distinct counts, so the top-N
    // selection exercises real ordering — the hash-group path must render
    // exactly the text the full-string groupBy would have produced
    val p3 = (1 to 10).map(i => s"three$i").mkString(" ")
    val p2 = (1 to 9).map(i => s"two$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p3 ${uniq("a", 5)} $p2"),
      (2L, s"${uniq("b", 5)} $p3 ${uniq("c", 3)}"),
      (3L, s"$p2 ${uniq("d", 5)} $p3"),
      (4L, uniq("e", 25))).toDF("id", "text")
    val got = SubstringDedup.topDuplicatedPassages(docs, "id", "text", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val baseline = {
      import org.apache.spark.sql.functions._
      SubstringDedup.duplicatedSpans(docs, "id", "text", k = 8)
        .join(docs.select(col("id"),
          graft.functions.Text.tokens(col("text")).as("t")), "id")
        .select(concat_ws(" ", slice(col("t"),
          (col("span_start") + 1).cast("int"),
          (col("span_end") - col("span_start") + 1).cast("int"))).as("passage"),
          (col("span_end") - col("span_start") + 1).as("n_tokens"), col("id"))
        .groupBy("passage", "n_tokens")
        .agg(count(lit(1)).as("n_spans"), countDistinct(col("id")).as("n_docs"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (-t._3, t._1))
    }
    assert(got.toSeq === baseline.toSeq, s"got ${got.toSeq}\nbaseline ${baseline.toSeq}")
    assert(got.map(_._1).toSet === Set(p3, p2), "both planted passages must surface")
  }

  test("spansAgainst equals duplicatedSpans over corpus+batch restricted to batch ids") {
    val docs = Tables.documents(spark, Sf0001)
    val batch = docs.where($"doc_id" % 5 === 0)
    val corpus = docs.where($"doc_id" % 5 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("grams_idx").toString
    graft.index.IndexStore.saveGrams(corpus, "doc_id", "text", 8, path)
    val idx = graft.index.IndexStore.loadGrams(spark, path)
    assert(idx.k === 8)
    val inc = SubstringDedup.spansAgainst(batch, "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val full = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(t => batchIds.contains(t._1)).toSet
    assert(inc === full,
      s"incremental screen must equal the full computation on batch docs:\n inc=$inc\n full=$full")
    assert(inc.nonEmpty, "testdata's planted clones must produce batch spans")
  }

  test("gram index lifecycle: append becomes visible, compact preserves answers") {
    val d1 = Seq((1L, uniq("base", 20))).toDF("id", "text")
    val passage = (1 to 10).map(i => s"app$i").mkString(" ")
    val d2 = Seq((2L, s"$passage ${uniq("pad", 4)}")).toDF("id", "text")
    val batch = Seq((100L, s"${uniq("new", 3)} $passage")).toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("grams_life").toString
    graft.index.IndexStore.saveGrams(d1, "id", "text", 8, path)
    val before = SubstringDedup.spansAgainst(batch, "id", "text",
      graft.index.IndexStore.loadGrams(spark, path)).count()
    assert(before === 0L, "the passage is not indexed yet")
    graft.index.IndexStore.appendBatchGrams(d2, "id", "text", path, batchId = 0L)
    def screen() = SubstringDedup.spansAgainst(batch, "id", "text",
        graft.index.IndexStore.loadGrams(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val after = screen()
    // passage occupies batch tokens 3..12 → dup starts {3, 4, 5} → one span
    assert(after === Seq((100L, 3L, 12L)), s"got $after")
    // idempotent re-append, then compact: answers identical
    graft.index.IndexStore.appendBatchGrams(d2, "id", "text", path, batchId = 0L)
    graft.index.IndexStore.compactGrams(spark, path)
    assert(screen() === after, "compaction must not change the screen")
  }

  test("spansAgainst flags batch-internal repetition without any index hit") {
    val path = java.nio.file.Files
      .createTempDirectory("grams_int").toString
    graft.index.IndexStore.saveGrams(
      Seq((1L, uniq("corp", 20))).toDF("id", "text"), "id", "text", 8, path)
    val passage = (1 to 9).map(i => s"twin$i").mkString(" ")
    val batch = Seq(
      (100L, s"$passage ${uniq("xx", 3)}"),
      (101L, s"${uniq("yy", 3)} $passage")).toDF("id", "text")
    val got = SubstringDedup.spansAgainst(batch, "id", "text",
        graft.index.IndexStore.loadGrams(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === Seq((100L, 0L, 8L), (101L, 3L, 11L)), s"got $got")
  }

  test("plan: no cartesian product anywhere in the span pipeline") {
    val docs = Tables.documents(spark, Sf0001).limit(100)
    val plan = SubstringDedup.duplicatedSpans(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"span dedup must stay linear:\n$plan")
  }
}
