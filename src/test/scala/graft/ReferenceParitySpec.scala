package graft

import graft.api.FoodFinder
import graft.embed.{EmbedJob, Embedder}
import graft.etl.Flatten
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end walkthrough of the reference's own pipeline on its own
  * document shape (FIXTURES.md §2): nested catalog → flatten
  * (`transform-seed.py`) → embed (`embed.py`) → the three search modes
  * (`backend/api.py`). A user of the reference switching to this library
  * runs exactly these calls.
  */
object ReferenceParitySpec {
  // the full catalog shape of SURVEY §1.2 (seed.py:62-173): nested
  // availability periods, optional sizes (~60% of products) and
  // isPromoFlex (~40%) — defaults keep the minimal fixtures terse
  case class TimePeriod(startTime: String, endTime: String)
  case class Availability(dayOfWeek: String, timePeriods: Seq[TimePeriod])
  case class Size(id: String, code: String)
  case class Price(amount: Double, formatted: String)
  case class Product(_id: String, id: String, name: String, description: String,
      price: Price, available: Boolean, combo: Boolean,
      areas: Seq[String] = Nil, sizes: Option[Seq[Size]] = None,
      isPromoFlex: Option[Boolean] = None)
  case class Catalog(_id: String, title: String, countryCode: String,
      restaurantName: String, products: Seq[Product],
      availability: Seq[Availability] = Nil)
}

class ReferenceParitySpec extends AnyFunSuite with SparkTest {
  import ReferenceParitySpec._
  import spark.implicits._

  private def catalogs = Seq(
    Catalog("c1", "McOfertas Deluxe (Desayuno)", "PE", "LIMA", Seq(
      Product("p11", "11111", "Nuggets Box", "nuggets de pollo para el desayuno", Price(7.5, "S/7,50"), available = true, combo = false),
      Product("p12", "11112", "Big Combo", "hamburguesa doble con papas", Price(12.0, "S/12,00"), available = true, combo = true),
    )),
    Catalog("c2", "Menú Central (Almuerzo)", "CL", "SANTIAGO", Seq(
      Product("p21", "22221", "Ensalada Fresh", "ensalada fresca con pollo", Price(6.0, "S/6,00"), available = false, combo = false),
      Product("p22", "22222", "Nuggets Familiar", "nuggets para compartir en familia", Price(15.0, "S/15,00"), available = true, combo = false),
      Product("p23", "22223", "Café del desayuno", "café con leche para el desayuno", Price(3.0, "S/3,00"), available = true, combo = false),
    )),
  ).toDF()

  test("flatten: catalog → product_detail with reference field semantics") {
    val flat = Flatten.productDetail(catalogs)
    assert(flat.count() === 5) // 2 + 3 products
    assert(!flat.columns.contains("products"))
    assert(flat.columns.contains("catalogId") && flat.columns.contains("product"))
    val r = flat.where(col("_id") === "p11").head()
    assert(r.getAs[String]("catalogId") === "c1")
    assert(r.getAs[String]("restaurantName") === "LIMA")
    // _id re-rooted to the product's own _id (transform-seed.py:82-91)
    assert(r.getAs[String]("_id") === "p11")
  }

  test("the reference CLI query end-to-end: vector mode with pre-filters") {
    // 'nuggets para desayuno' --k 5 --filter-available true --max-price 8
    val detail = Flatten.productDetail(catalogs)
    val embedded = EmbedJob.embedBatched(
        detail.withColumn("description", col("product.description")), "description")
      .withColumnRenamed("emb", "emb_description")
    val tbl = FoodFinder.SearchTable(embedded, "_id", "emb_description", "description")
    val q = Embedder.default.embed("nuggets para desayuno")
    val filter = col("product.available") === true &&
      col("product.price.amount") < 8.0 // the Mongo dialect $lt (api.py:29-50)
    val got = FoodFinder.vector(tbl, q, k = 5, filter = Some(filter))
      .as[(String, Double)].collect()
    // only p11 (nuggets, 7.5, available) and p23 (desayuno, 3.0, available)
    // survive the pre-filter; nuggets+desayuno doc must rank first
    assert(got.map(_._1).toSet === Set("p11", "p23"))
    assert(got.head._1 === "p11")
  }

  test("hybrid mode: fused vector+text ranking with scoreDetails columns") {
    val detail = Flatten.productDetail(catalogs)
    val embedded = EmbedJob.embedBatched(
        detail.withColumn("description", col("product.description"))
          .withColumn("name", col("product.name")), "description")
      .withColumnRenamed("emb", "emb_description")
    val tbl = FoodFinder.SearchTable(embedded, "_id", "emb_description", "name")
    val q = Embedder.default.embed("nuggets para desayuno")
    val got = FoodFinder.hybrid(tbl, q, "nuggets", k = 5)
    assert(got.columns.toSeq ===
      Seq("id", "score", "vec_norm", "vec_raw", "txt_norm", "txt_raw"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    // docs titled 'Nuggets …' must carry a text contribution; others must not
    val byId = rows.map(r => r.getString(0) -> r).toMap
    assert(byId.contains("p11") && !byId("p11").isNullAt(5))
    // fused score ∈ (0, 11): 10·sigmoid + sigmoid (FIXTURES invariant)
    rows.foreach(r => assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 11.0))
  }

  test("fulltext mode post-filter can shrink results below k (api.py:265-266)") {
    val detail = Flatten.productDetail(catalogs)
    val embedded = EmbedJob.embedBatched(
        detail.withColumn("name", col("product.name")), "name")
      .withColumnRenamed("emb", "emb_description")
    val tbl = FoodFinder.SearchTable(embedded, "_id", "emb_description", "name")
    val all = FoodFinder.fulltext(tbl, "nuggets", k = 5)
    val filtered = FoodFinder.fulltext(tbl, "nuggets", k = 5,
      filter = Some(col("product.price.amount") < 8.0))
    assert(all.count() === 2)      // Nuggets Box + Nuggets Familiar
    assert(filtered.count() === 1) // post-filter drops the 15.0 one
  }

  test("restaurants listing: distinct non-null names ascending (api.py:87-94)") {
    val got = Flatten.productDetail(catalogs)
      .select("restaurantName").where(col("restaurantName").isNotNull)
      .distinct().orderBy("restaurantName")
      .as[String].collect()
    assert(got === Seq("LIMA", "SANTIAGO"))
  }
}
