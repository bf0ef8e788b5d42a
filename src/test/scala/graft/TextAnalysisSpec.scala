package graft

import graft.etl.Flatten
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token counting, quality heuristic, language ID, fingerprint and the
  * flatten ETL invariants. */
class TextAnalysisSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(text).toDF("t").select(c(col("t")).as("r")).head()

  test("whitespace and bpe token counts, hand-computed") {
    assert(one("the fast  fox", TextAnalysis.wsTokenCount).getInt(0) === 3)
    // bpe: ceil(3/4)+ceil(4/4)+ceil(3/4)=3 words + 0 punct runs
    assert(one("the fast fox", TextAnalysis.bpeTokenCount).getLong(0) === 3L)
    // "extraordinarily" = 15 chars → ceil(15/4)=4; "!!" is one punct run
    assert(one("extraordinarily!!", TextAnalysis.bpeTokenCount).getLong(0) === 5L)
    assert(one("", TextAnalysis.wsTokenCount).getInt(0) === 0)
  }

  test("quality score stays in [0,1]; repetitive text scores below diverse text") {
    val diverse = one("spark catalyst tungsten shuffle partition broadcast", TextAnalysis.qualityScore).getDouble(0)
    val repetitive = one("the the the the the the", TextAnalysis.qualityScore).getDouble(0)
    assert(diverse > repetitive)
    assert(diverse >= 0.0 && diverse <= 1.0 && repetitive >= 0.0)
  }

  test("qualityPpm tracks qualityScore within 1 ppm (floor vs round) on real docs") {
    val docs = graft.util.Tables.documents(spark, Sf0001).limit(200)
    val both = docs.select(
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.qualityPpm(col("text")).as("ppm")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val q = r.getDouble(0); val ppm = r.getLong(1)
      assert(math.abs(q * 1e6 - ppm) <= 1.0, s"q=$q ppm=$ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    // edge cases: empty text and whitespace-only (n=0, c>0)
    assert(one("", TextAnalysis.qualityPpm).getLong(0) === 300000L)
    assert(one("   ", TextAnalysis.qualityPpm).getLong(0) === 300000L + 200000L)
  }

  test("langId picks the marker-dominant language; 'und' when no tokens") {
    assert(one("el la es de que para un los", TextAnalysis.langId).getString(0) === "es")
    assert(one("the and is of to in it", TextAnalysis.langId).getString(0) === "en")
    assert(one("zzz qqq xxx", TextAnalysis.langId).getString(0) === "und")
    assert(one("!!!", TextAnalysis.langId).getString(0) === "und")
  }

  test("staged gateStats path equals the HOF formulation on real docs and edges") {
    import graft.functions.Text
    // the codegen'd one-pass TokenSetStats must be observationally
    // identical to the interpreted filter/array_distinct formulation —
    // quality_ppm, langId, and en-score compared row by row
    val docs = graft.util.Tables.documents(spark, Sf0001).limit(300)
      .select(col("doc_id"), col("text"))
      .union(Seq(
        (900001L, ""), (900002L, "   "), (900003L, null.asInstanceOf[String]),
        (900004L, "the the the der die das"), (900005L, "!!!"),
      ).toDF("doc_id", "text"))
    val staged = docs
      .withColumn("__stats", TextAnalysis.gateStats(Text.tokens(col("text"))))
      .select(col("doc_id"),
        TextAnalysis.qualityPpmFromGateStats(col("text"), col("__stats")).as("ppm"),
        TextAnalysis.langIdFromGateStats(col("__stats")).as("lang"),
        TextAnalysis.langScoreFromGateStats(col("__stats"), "en").as("en"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val hof = docs.select(col("doc_id"),
        TextAnalysis.qualityPpm(col("text")).as("ppm"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.langScore(col("text"), "en").as("en"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(staged === hof)
  }

  test("shingles: k-grams with short-document fallback") {
    val got = one("a b c d", t => TextAnalysis.shingles(t)).getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
    val short = one("a b", t => TextAnalysis.shingles(t)).getSeq[String](0)
    assert(short === Seq("a b"))
    assert(one("", t => TextAnalysis.shingles(t)).getSeq[String](0).isEmpty)
  }

  test("fingerprint is order-insensitive on identical text, differs across texts") {
    val fps = Seq("the fast fox jumps high", "the fast fox jumps high", "other words entirely here")
      .toDF("t").select(TextAnalysis.fingerprint(col("t")).as("fp"))
      .select("fp.fp_min", "fp.fp_max").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("flatten: explode multiplies rows by array size and keeps parent columns") {
    val nested = Seq(
      (1L, "p1", Seq("a", "b", "c")),
      (2L, "p2", Seq("d")),
    ).toDF("id", "parent", "items")
    val flat = Flatten.unwind(nested, "items", "item")
    assert(flat.count() === 4)
    assert(flat.columns.toSet === Set("id", "parent", "item"))
    val p1 = flat.where(col("id") === 1).select("item").as[String].collect().toSet
    assert(p1 === Set("a", "b", "c"))
  }
}
