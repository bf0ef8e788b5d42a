package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI walkthrough: the reference's script sequence
  * (transform-seed → embed → indexes → local-test) through graft.Cli on
  * the nested-catalog fixture; plus SQL function registration. */
class CliSpec extends AnyFunSuite with SparkTest {
  import ReferenceParitySpec._
  import spark.implicits._

  test("flatten → embed → index → search pipeline through the CLI") {
    val base = Files.createTempDirectory("cli").toString
    // the FULL §1.2 catalog shape: weekday availability with nested time
    // periods, per-product areas, optional sizes (p11 only) and
    // isPromoFlex (p12 only) — exercising flatten over every nesting level
    val catalogs = Seq(
      Catalog("c1", "Desayuno", "PE", "LIMA", Seq(
        Product("p11", "11111", "Nuggets Box", "nuggets de pollo para el desayuno",
          Price(7.5, "S/7,50"), available = true, combo = false,
          areas = Seq("MOP", "AUT"), sizes = Some(Seq(Size("s1", "MED"), Size("s2", "GDE")))),
        Product("p12", "11112", "Big Combo", "hamburguesa doble con papas",
          Price(12.0, "S/12,00"), available = true, combo = true,
          areas = Seq("MOP"), isPromoFlex = Some(true)),
      ), availability = Seq(
        Availability("MONDAY", Seq(TimePeriod("08:00", "12:00"), TimePeriod("18:00", "22:00"))),
        Availability("TUESDAY", Seq(TimePeriod("08:00", "12:00"))),
      )),
    ).toDF()
    catalogs.write.parquet(s"$base/catalog")

    Cli.main(Array("flatten", s"$base/catalog", s"$base/detail"))
    val detail = spark.read.parquet(s"$base/detail")
    assert(detail.count() === 2)
    assert(detail.columns.contains("catalogId"))
    // parent nested fields are copied verbatim (transform-seed.py:72-76):
    // the availability array-of-structs-of-arrays survives per product row
    val avail = detail.select(explode(col("availability")).as("a"))
      .select(col("a.dayOfWeek"), size(col("a.timePeriods")).as("np"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(avail === Map("MONDAY" -> 2, "TUESDAY" -> 1))
    // optional product sub-fields keep their per-row presence
    val p11 = detail.where(col("_id") === "p11").head()
    val p12 = detail.where(col("_id") === "p12").head()
    assert(p11.getAs[org.apache.spark.sql.Row]("product")
      .getAs[Seq[org.apache.spark.sql.Row]]("sizes").map(_.getString(1)) === Seq("MED", "GDE"))
    assert(p12.getAs[org.apache.spark.sql.Row]("product").isNullAt(
      p12.getAs[org.apache.spark.sql.Row]("product").fieldIndex("sizes")))
    assert(p12.getAs[org.apache.spark.sql.Row]("product").getAs[Boolean]("isPromoFlex"))

    // the reference embeds product.description; surface it as a column first
    detail.withColumn("description", col("product.description"))
      .write.mode("overwrite").parquet(s"$base/detail2")
    Cli.main(Array("embed", s"$base/detail2", "description", s"$base/embedded"))
    val embedded = spark.read.parquet(s"$base/embedded")
    assert(embedded.schema("emb_description").dataType.typeName === "array")

    Cli.main(Array("index", s"$base/embedded", "_id", "emb_description",
      s"$base/ivf", "--type", "vector"))
    assert(new java.io.File(s"$base/ivf/centroids").exists())
    Cli.main(Array("index", s"$base/embedded", "_id", "description",
      s"$base/bm25", "--type", "fulltext"))
    assert(new java.io.File(s"$base/bm25/postings").exists())

    // vector search with the reference's CLI filters — must not throw and
    // must respect the pre-filter (only the <8.0 available product remains)
    Cli.main(Array("search", s"$base/embedded", "vector", "nuggets para desayuno",
      "5", "--available", "true", "--max-price", "8"))
  }

  test("graft functions are callable from SQL after registration") {
    org.apache.spark.sql.graftshim.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_sqdist(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS s").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
    // gate stats from pure SQL: [n, distinct, stopwords, de, en, es, fr, zh]
    // over "the the fox": n=3, distinct=2, stop=2 ("the"×2), en=2, others 0
    val st = spark.sql(
      "SELECT graft_gate_stats(array('the', 'the', 'fox')) AS st").head()
      .getSeq[Long](0)
    assert(st === Seq(3L, 2L, 2L, 0L, 2L, 0L, 0L, 0L))
  }
}
