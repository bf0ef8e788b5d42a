package graft.index

import graft.search.TextSearch
import graft.search.TextSearch.Bm25Index
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Index DDL as batch jobs — the Spark rendition of the reference's
  * `indexes.py` (S5 vector index, S6 full-text index, S7 `--replace`).
  *
  * Atlas builds indexes server-side from a DDL document; here an "index" is
  * a set of Parquet side tables written by a batch job and loaded at query
  * time. `SaveMode.Overwrite` is the `--replace` semantics (idempotent
  * drop-and-recreate, `indexes.py:108-116`).
  *
  * Scale notes, encoded in the layout:
  *   - BM25 postings are written partitioned by a bucket of the term hash
  *     ([[TermBuckets]] dirs): a query's `term IN (...)` prunes to the
  *     touched buckets at scan time instead of reading the whole postings
  *     table. `termDf` is vocabulary-sized and loaded for broadcast.
  *   - IVF assignments are written partitioned by `cluster`: a probe reads
  *     only the probed clusters' files — the on-disk analogue of the
  *     inverted file. Centroids/sizes are k rows, read to the driver.
  */
object IndexStore {

  // ------------------------------------------------------------------ BM25

  def saveBm25(index: Bm25Index, path: String): Unit = {
    import graft.functions.Text
    index.postings
      .withColumn("bucket", pmod(Text.hash60(col("term")), lit(TextSearch.TermBuckets.toLong)))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$path/postings")
    index.termDf.write.mode(SaveMode.Overwrite).parquet(s"$path/term_df")
    val spark = index.postings.sparkSession
    import spark.implicits._
    Seq((index.numDocs, index.avgdl)).toDF("num_docs", "avgdl")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  def loadBm25(spark: SparkSession, path: String): Bm25Index = {
    val stats = spark.read.parquet(s"$path/stats").head()
    Bm25Index(
      // keep the bucket partition column: TextSearch.search prunes on it
      spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/term_df"),
      stats.getLong(0), stats.getDouble(1))
  }

  /** Build-and-persist in one step (the `indexes.py` CLI shape). */
  def createBm25(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, path: String): Bm25Index = {
    val idx = TextSearch.buildIndex(docs, idCol, textCol)
    saveBm25(idx, path)
    loadBm25(docs.sparkSession, path)
  }

  // ------------------------------------------------------------------- IVF

  def saveIvf(index: Ivf.IvfIndex, path: String): Unit = {
    index.assignments.write.mode(SaveMode.Overwrite).partitionBy("cluster")
      .parquet(s"$path/assignments")
    val spark = index.assignments.sparkSession
    import spark.implicits._
    index.centroids.toSeq
      .map { case (cid, c) => (cid, c.toSeq, index.sizes.getOrElse(cid, 0L)) }
      .toDF("cluster", "centroid", "size")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  def loadIvf(spark: SparkSession, path: String): Ivf.IvfIndex = {
    val meta = spark.read.parquet(s"$path/centroids").collect()
    Ivf.IvfIndex(
      spark.read.parquet(s"$path/assignments"),
      meta.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap,
      meta.map(r => r.getInt(0) -> r.getLong(2)).toMap)
  }
}
