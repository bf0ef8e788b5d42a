package graft.embed

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-embedding ETL — the Spark rendition of the reference's `embed.py`
  * (R16 batched external map + R17 `--skip-existing` incremental recompute).
  *
  * Two interchangeable execution shapes:
  *
  *   - [[embedBatched]] — `mapPartitions` with intra-partition batches of
  *     [[Embedder.BatchSize]] texts, mirroring the reference's 16-text
  *     Voyage requests (`embed.py:29-32,88-89`). This is the shape a real
  *     network/model call needs (one RPC per batch, partition-local, zero
  *     shuffle). The default [[HashingEmbedder]] is deterministic, so the
  *     result is reproducible.
  *   - [[embedRelational]] — the same hashing embedder expressed as pure
  *     relational ops (explode → hash → groupBy → normalize), emitting a
  *     SPARSE (id, dim, val) relation. Fully Catalyst-planned and
  *     DuckDB-oracle-checkable; the shape of choice when the embedder is
  *     a closed-form function rather than an external service. At 100 TB
  *     both scale linearly; the relational one additionally benefits from
  *     whole-stage codegen and map-side partial aggregation.
  *
  * Parity of the two shapes is asserted in EmbedSpec.
  */
object EmbedJob {

  /** Dense per-row embedding via partition-local batched calls.
    * Output: input columns + `emb` array&lt;double&gt;. */
  def embedBatched(docs: DataFrame, textCol: String,
      embedder: Embedder = Embedder.default): DataFrame = {
    val spark = docs.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.fields :+ org.apache.spark.sql.types.StructField(
        "emb", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)))
    val textIdx = docs.schema.fieldIndex(textCol)
    val rows = docs.rdd.mapPartitions { it =>
      it.grouped(Embedder.BatchSize).flatMap { batch =>
        // one embedder call per batch — the external-API boundary (R16)
        val vecs = embedder.embedBatch(batch.map(r => Option(r.getString(textIdx)).getOrElse("")))
        batch.lazyZip(vecs).map { (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** R17 `--skip-existing`: embed only rows whose `embCol` is null, keep
    * the rest untouched (null-filter + union — `embed.py:33-37,95-96`). */
  def embedMissing(docs: DataFrame, textCol: String, embCol: String,
      embedder: Embedder = Embedder.default): DataFrame = {
    val todo = docs.where(col(embCol).isNull).drop(embCol)
    val done = docs.where(col(embCol).isNotNull)
    val embedded = embedBatched(todo, textCol, embedder)
      .withColumnRenamed("emb", embCol)
      .select(done.columns.map(col).toIndexedSeq: _*)
    done.unionByName(embedded)
  }

  /** The hashing embedder's per-term coordinates, readable straight off the
    * md5 hex (cheap long arithmetic, no decimal(20,0)): hex chars 15-16 =
    * low byte → & 63 = dim; hex char 1 = bits 63..60 → >> 2 & 1 = bit 62 =
    * sign. Shared by [[embedRelational]] and the late-interaction window
    * vectors ([[graft.search.LateInteraction]]) so the two relational
    * renditions can never drift from each other (or their DuckDB twins). */
  private[graft] def termDim(md5hex: Column): Column =
    conv(substring(md5hex, 15, 2), 16, 10).cast("long").bitwiseAND(lit(63L)).cast("int")
  private[graft] def termSign(md5hex: Column): Column =
    when(shiftright(conv(substring(md5hex, 1, 1), 16, 10).cast("long"), 2)
      .bitwiseAND(lit(1L)) === 0L, 1.0).otherwise(-1.0)

  /** The feature-hashing embedder as relational ops over a 64-bit token
    * hash (first 16 hex chars of md5 = [[HashingEmbedder.md5Long]]):
    * index = low 6 bits, sign = bit 62; tf-accumulated, L2-normalized.
    * Output SPARSE: (id, dim, val) with val rounded to 6 decimals —
    * zero-weight dims absent. */
  def embedRelational(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = Embedder.TestdataDim): DataFrame = {
    require(dim == 64, "relational embedder is specialized to dim=64 (low 6 bits of the hash)")
    val toks = docs.select(col(idCol).as("id"),
      explode(Text.tokens(col(textCol))).as("term"))
    val raw = toks
      .withColumn("md5hex", md5(col("term")))
      .withColumn("dim", termDim(col("md5hex")))
      .withColumn("sign", termSign(col("md5hex")))
      .groupBy("id", "dim").agg(sum(col("sign")).as("raw"))
    val norms = raw.groupBy("id").agg(sqrt(sum(col("raw") * col("raw"))).as("nrm"))
    raw.join(norms, "id")
      .where(col("raw") =!= 0.0)
      .select(col("id"), col("dim"), round(col("raw") / col("nrm"), 6).as("val"))
  }

  def sqlEmbedRelational(docsTable: String, idExpr: String, textExpr: String): String =
    s"""WITH toks AS (
       |  SELECT $idExpr AS id, unnest(${Text.sqlTokens(textExpr)}) AS term FROM $docsTable
       |), hashed AS (
       |  SELECT id, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM toks
       |), rawv AS (
       |  SELECT id, (h % 64)::INT AS dim,
       |         sum(CASE WHEN ((h >> 62) & 1) = 0 THEN 1.0 ELSE -1.0 END) AS raw
       |  FROM hashed GROUP BY 1, 2
       |), norms AS (
       |  SELECT id, sqrt(sum(raw * raw)) AS nrm FROM rawv GROUP BY 1
       |)
       |SELECT r.id, r.dim, round(r.raw / n.nrm, 6) AS val
       |FROM rawv r JOIN norms n USING (id)
       |WHERE r.raw <> 0.0""".stripMargin
}
