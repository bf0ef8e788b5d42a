package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4.3 / the 100 TB
  * join strategy): writing both sides bucketed and sorted by the join key
  * lets SortMergeJoin run with NO Exchange — each task zips bucket i of
  * both tables. At cluster scale this is the difference between a full
  * network shuffle of the fact table per join and none at all; the layout
  * cost is paid once at write time.
  *
  * Parquet `bucketBy` requires the session catalog (`saveAsTable`), so
  * these helpers speak table names, not paths.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, buckets: Int, keyCol: String, table: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
