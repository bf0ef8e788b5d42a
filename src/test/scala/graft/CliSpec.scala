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
    val catalogs = Seq(
      Catalog("c1", "Desayuno", "PE", "LIMA", Seq(
        Product("p11", "11111", "Nuggets Box", "nuggets de pollo para el desayuno",
          Price(7.5, "S/7,50"), available = true, combo = false),
        Product("p12", "11112", "Big Combo", "hamburguesa doble con papas",
          Price(12.0, "S/12,00"), available = true, combo = true),
      )),
    ).toDF()
    catalogs.write.parquet(s"$base/catalog")

    Cli.main(Array("flatten", s"$base/catalog", s"$base/detail"))
    val detail = spark.read.parquet(s"$base/detail")
    assert(detail.count() === 2)
    assert(detail.columns.contains("catalogId"))

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
  }
}
