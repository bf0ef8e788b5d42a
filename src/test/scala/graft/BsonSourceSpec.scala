package graft

import graft.sources.BsonSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BSON/mongodump ingestion: byte-level parser semantics on a hand-built
  * document, then the REAL reference dump (`/root/reference/dump/catalog`)
  * end-to-end — the migration path for the reference's canonical data. */
class BsonSourceSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  /** Build a BSON document from (name, tag, payload) elements. */
  private def doc(elems: (String, Int, Array[Byte])*): Array[Byte] = {
    val body = elems.flatMap { case (name, tag, payload) =>
      Array(tag.toByte) ++ name.getBytes("UTF-8") ++ Array(0.toByte) ++ payload
    }.toArray
    val len = body.length + 5
    Array[Byte](
      (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      ((len >> 16) & 0xff).toByte, ((len >> 24) & 0xff).toByte) ++
      body ++ Array(0.toByte)
  }
  private def i32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def i64(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  private def str(s: String): Array[Byte] =
    i32(s.length + 1) ++ s.getBytes("UTF-8") ++ Array(0.toByte)

  test("parser: every supported BSON type renders to the expected JSON") {
    val inner = doc(("k", 0x10, i32(7)))
    val arr = doc(("0", 0x02, str("a")), ("1", 0x10, i32(2))) // array = doc with index keys
    val bytes = doc(
      ("d", 0x01, i64(java.lang.Double.doubleToLongBits(2.5))),
      ("s", 0x02, str("hi \"there\"")),
      ("sub", 0x03, inner),
      ("xs", 0x04, arr),
      ("bin", 0x05, i32(3) ++ Array(0.toByte) ++ "abc".getBytes),
      ("oid", 0x07, (1 to 12).map(_.toByte).toArray),
      ("t", 0x08, Array(1.toByte)),
      ("f", 0x08, Array(0.toByte)),
      ("when", 0x09, i64(1700000000123L)),
      ("nul", 0x0a, Array.empty[Byte]),
      ("n32", 0x10, i32(-5)),
      ("n64", 0x12, i64(1234567890123L)),
      ("dec", 0x13, Array.fill(16)(0.toByte)),
      // zero-payload exotics: deprecated undefined, MaxKey, MinKey — one
      // of these in a collection must not abort the migration
      ("und", 0x06, Array.empty[Byte]),
      ("mx", 0x7f, Array.empty[Byte]),
      ("mn", 0xff, Array.empty[Byte]),
    )
    val docs = BsonSource.parseDocuments(bytes).toSeq
    assert(docs.length === 1)
    assert(docs.head ===
      """{"d":2.5,"s":"hi \"there\"","sub":{"k":7},"xs":["a",2],""" +
      """"bin":"YWJj","oid":"0102030405060708090a0b0c","t":true,"f":false,""" +
      """"when":1700000000123,"nul":null,"n32":-5,"n64":1234567890123,"dec":null,""" +
      """"und":null,"mx":null,"mn":null}""")
    // two concatenated documents parse as two (the mongodump layout)
    assert(BsonSource.parseDocuments(bytes ++ bytes).size === 2)
    // corrupt length fails loudly, never silently truncates
    val broken = bytes.clone(); broken(0) = 100.toByte
    intercept[IllegalArgumentException] {
      BsonSource.parseDocuments(broken).toSeq
    }
  }

  test("reference mongodump ingests end-to-end: catalog collections to queryable JSON") {
    val dump = BsonSource.readDump(spark, "/root/reference/dump/catalog").cache()
    val byColl = dump.groupBy("collection").count()
      .as[(String, Long)].collect().toMap
    assert(byColl.contains("products"), s"collections found: ${byColl.keySet}")
    assert(byColl("products") > 100, "the catalog dump holds the menu corpus")
    val products = dump.where(col("collection") === "products")
      .select(
        get_json_object(col("doc_json"), "$._id").as("_id"),
        get_json_object(col("doc_json"), "$.id").as("id"),
        get_json_object(col("doc_json"), "$.title").as("title"),
        get_json_object(col("doc_json"), "$.countryCode").as("cc"),
        get_json_object(col("doc_json"), "$.availability[0].dayOfWeek").as("day"))
      .cache()
    // every document has a well-formed ObjectId and the flagship fields
    assert(products.where(col("_id").rlike("^[0-9a-f]{24}$")).count()
      === byColl("products"))
    assert(products.where(col("id").isNull || col("title").isNull).count() === 0)
    // the first document of the dump (byte-level ground truth, see the
    // hexdump in the source scaladoc): MX drive-thru breakfast menu
    val mx = products.where(col("id") === "MX-DRIVE_THRU-510851").collect()
    assert(mx.length === 1)
    assert(mx.head.getAs[String]("title") === "Menu Ejecutivo Flex (Desayuno)")
    assert(mx.head.getAs[String]("cc") === "MX")
    assert(mx.head.getAs[String]("day") === "SUNDAY")
    // nested availability arrays survived as real JSON arrays
    val days = products.where(col("day").isNotNull).select("day")
      .distinct().as[String].collect().toSet
    assert(days.nonEmpty && days.subsetOf(Set("MONDAY", "TUESDAY", "WEDNESDAY",
      "THURSDAY", "FRIDAY", "SATURDAY", "SUNDAY")))
    dump.unpersist(); products.unpersist()
  }
}
