package graft

import graft.embed.{EmbedJob, Embedder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embed ETL: batched mapPartitions shape ≡ driver-side embedder ≡
  * relational sparse shape; skip-existing semantics. */
class EmbedSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = Seq(
    (1L, "nuggets para desayuno"),
    (2L, "fast table scan merge"),
    (3L, "the quick brown fox"),
  ).toDF("id", "text")

  test("embedBatched equals driver-side embedder per row") {
    val got = EmbedJob.embedBatched(docs, "text")
      .select("id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    docs.collect().foreach { r =>
      val exp = Embedder.default.embed(r.getString(1)).toSeq
      assert(got(r.getLong(0)) === exp)
    }
  }

  test("relational sparse embedding equals the dense embedder's nonzero dims") {
    val sparse = EmbedJob.embedRelational(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    docs.collect().foreach { r =>
      val dense = Embedder.default.embed(r.getString(1))
      dense.zipWithIndex.foreach { case (v, d) =>
        val expected = java.math.BigDecimal.valueOf(v)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val got = sparse.getOrElse((r.getLong(0), d), 0.0)
        assert(got === expected, s"id=${r.getLong(0)} dim=$d")
      }
    }
  }

  test("embedMissing only embeds null rows and keeps existing vectors") {
    val pre = Seq(
      (1L, "some text", Some(Seq(9.0, 9.0))),
      (2L, "other text", None),
    ).toDF("id", "text", "emb")
    val out = EmbedJob.embedMissing(pre, "text", "emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(out(1L) === Seq(9.0, 9.0)) // untouched
    assert(out(2L) === Embedder.default.embed("other text").toSeq)
  }
}
