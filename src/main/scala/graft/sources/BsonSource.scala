package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mongodump/BSON ingestion — the migration step for the reference's
  * canonical dataset (`/root/reference/dump/` is a `mongodump` of the
  * `catalog` database, `README.md:3-4`): a `.bson(.gz)` collection file is
  * a raw concatenation of BSON documents (one length-prefixed document
  * after another — the public BSON spec, bsonspec.org), so a user moving
  * off the reference stack can land their actual data as parquet with
  * nothing but this file and `spark.read`.
  *
  * Design: the parser renders each document to a JSON STRING rather than
  * inventing a Row schema — Mongo collections are schemaless, and Spark
  * already owns the schemaless-to-structured step (`schema_of_json` /
  * `from_json` / `get_json_object`, the same machinery the `q_json_extract`
  * query uses). Type mapping keeps values queryable as plain JSON:
  * ObjectId → 24-char hex string, UTC datetime → epoch millis, binary →
  * base64 string, Decimal128/unknown types → `null` (loud in the output,
  * never a crash). No external BSON library — the format is 11 tag types
  * of length-prefixed bytes.
  *
  * Scale shape: `binaryFile` rows are one per collection FILE (mongodump
  * writes one file per collection), so parallelism is per-collection —
  * the right shape for a one-time migration job, not a hot query path;
  * land to parquet once (`toParquet`) and query that. */
object BsonSource {

  /** Parse one BSON document starting at `off`; returns (json, nextOff). */
  private def parseDoc(b: Array[Byte], off: Int): (String, Int) = {
    val len = readInt(b, off)
    require(len >= 5 && off + len <= b.length,
      s"corrupt BSON document at offset $off: declared length $len")
    val sb = new StringBuilder("{")
    var p = off + 4
    var first = true
    while (b(p) != 0) {
      val tag = b(p) & 0xff
      p += 1
      val nameEnd = { var q = p; while (b(q) != 0) q += 1; q }
      val name = new String(b, p, nameEnd - p, "UTF-8")
      p = nameEnd + 1
      if (!first) sb.append(',')
      first = false
      sb.append(quote(name)).append(':')
      p = appendValue(sb, b, p, tag)
    }
    // the terminator must sit exactly where the length prefix said the
    // document ends — a flipped prefix that still passes the range check
    // would otherwise parse THIS document fine and then resume the
    // document stream at a garbage offset (silent corruption of every
    // later document, the one failure mode worse than a crash)
    require(p == off + len - 1,
      s"corrupt BSON document at offset $off: content terminates at $p " +
        s"but the declared length $len puts the terminator at ${off + len - 1}")
    sb.append('}')
    (sb.toString, off + len)
  }

  /** Append one value of type `tag` at offset `p`; returns the offset past
    * it. Unknown tags render as null ONLY when their length is knowable;
    * otherwise the document is corrupt and parsing fails loudly. */
  private def appendValue(sb: StringBuilder, b: Array[Byte], p: Int, tag: Int): Int =
    tag match {
      case 0x01 => // double
        val v = java.lang.Double.longBitsToDouble(readLong(b, p))
        sb.append(if (v.isNaN || v.isInfinite) "null" else v.toString); p + 8
      case 0x02 => // string (int32 length incl. trailing NUL)
        val n = readInt(b, p)
        sb.append(quote(new String(b, p + 4, n - 1, "UTF-8"))); p + 4 + n
      case 0x03 => // embedded document
        val (json, next) = parseDoc(b, p); sb.append(json); next
      case 0x04 => // array: a document with "0","1",... keys → JSON array
        val len = readInt(b, p)
        require(len >= 5 && p + len <= b.length,
          s"corrupt BSON array at offset $p: declared length $len")
        sb.append('[')
        var q = p + 4; var first = true
        while (b(q) != 0) {
          val t = b(q) & 0xff; q += 1
          while (b(q) != 0) q += 1 // skip the index key
          q += 1
          if (!first) sb.append(','); first = false
          q = appendValue(sb, b, q, t)
        }
        require(q == p + len - 1,
          s"corrupt BSON array at offset $p: content terminates at $q " +
            s"but the declared length $len puts the terminator at ${p + len - 1}")
        sb.append(']'); p + len
      case 0x05 => // binary → base64
        val n = readInt(b, p) // subtype byte at p+4, payload after
        sb.append(quote(java.util.Base64.getEncoder
          .encodeToString(java.util.Arrays.copyOfRange(b, p + 5, p + 5 + n))))
        p + 5 + n
      case 0x07 => // ObjectId → 24-char hex
        val hex = (p until p + 12).map(i => f"${b(i) & 0xff}%02x").mkString
        sb.append(quote(hex)); p + 12
      case 0x08 => sb.append(if (b(p) != 0) "true" else "false"); p + 1
      case 0x09 => sb.append(readLong(b, p).toString); p + 8 // UTC ms
      case 0x0a => sb.append("null"); p
      case 0x10 => sb.append(readInt(b, p).toString); p + 4
      case 0x11 => sb.append(readLong(b, p).toString); p + 8 // timestamp
      case 0x12 => sb.append(readLong(b, p).toString); p + 8
      case 0x13 => sb.append("null"); p + 16 // Decimal128: fixed width, unsupported value
      // zero-payload types: deprecated `undefined` (0x06) and the MinKey/
      // MaxKey sentinels (0xFF signed = -1 → masked 0xff, 0x7F). Render
      // null and advance 0 bytes — exact, and one exotic value must not
      // abort a whole-collection migration.
      case 0x06 | 0x7f | 0xff => sb.append("null"); p
      case other => throw new IllegalArgumentException(
        f"unsupported BSON type 0x$other%02x at offset $p — cannot skip safely")
    }

  private def readInt(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def readLong(b: Array[Byte], p: Int): Long =
    (0 until 8).foldLeft(0L)((acc, i) => acc | ((b(p + i) & 0xffL) << (8 * i)))

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** All documents in one raw BSON byte blob (a mongodump collection file),
    * as JSON strings. */
  def parseDocuments(bytes: Array[Byte]): Iterator[String] =
    new Iterator[String] {
      private var off = 0
      def hasNext: Boolean = off < bytes.length
      def next(): String = {
        val (json, nextOff) = parseDoc(bytes, off)
        off = nextOff
        json
      }
    }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Hard per-file ceiling inherited from Spark's `binaryFile` source,
    * which materializes each file as one `Array[Byte]` (JVM arrays are
    * Int-indexed). Checked up front from the file LISTING so an oversized
    * dump fails at submit time with migration guidance, not mid-job with
    * the source's opaque "exceeds the max length" task failure. */
  val MaxFileBytes: Long = Int.MaxValue.toLong - 512

  /** Read mongodump collection files (`*.bson` / `*.bson.gz`) under `path`
    * into (collection, doc_json) rows — one row per BSON document, one
    * task per file. `collection` is the file stem, mongodump's collection
    * name.
    *
    * Scale contract: parallelism is PER FILE, and each file (plus its
    * gunzipped expansion) is held in one task's memory — the right shape
    * for mongodump output, which is one file per collection. Files are
    * capped at [[MaxFileBytes]] (~2 GB, the `binaryFile` limit) and a
    * `.bson.gz` must also EXPAND within executor heap. Collections
    * beyond that should be re-dumped with `mongodump --query` range
    * splits (or `bsondump | split` piped through a JSON reader) — each
    * split lands under the cap and the per-file parallelism then works
    * FOR the migration instead of against it. */
  def readDump(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bson*")
      .load(path)
    // metadata-only preflight: column pruning keeps `content` unread, so
    // this is one row per FILE (a mongodump has one per collection)
    val oversized = files.select(col("path"), col("length"))
      .as[(String, Long)].collect().filter(_._2 > MaxFileBytes)
    require(oversized.isEmpty,
      s"BsonSource.readDump: ${oversized.length} collection file(s) exceed " +
        s"the $MaxFileBytes-byte per-file cap (binaryFile materializes " +
        "each file as one in-memory array): " +
        oversized.map { case (p, l) => s"$p ($l bytes)" }.mkString(", ") +
        ". Re-dump the collection in range splits (mongodump --query) so " +
        "each file lands under the cap.")
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, content) =>
        val name = file.split('/').last
          .stripSuffix(".gz").stripSuffix(".bson")
        val raw = if (file.endsWith(".gz")) gunzip(content) else content
        parseDocuments(raw).map(j => (name, j))
      }
      .toDF("collection", "doc_json")
  }

  /** One-shot migration: dump directory → parquet, partitioned by
    * collection (the "BSON→parquet step" a reference user needs exactly
    * once — everything downstream queries the parquet). */
  def toParquet(spark: SparkSession, dumpPath: String, outPath: String): Unit =
    readDump(spark, dumpPath)
      .write.mode("overwrite").partitionBy("collection").parquet(outPath)
}
