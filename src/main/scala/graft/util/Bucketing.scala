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

  def writeBucketed(df: DataFrame, buckets: Int, keyCol: String, table: String): Unit = {
    val spark = df.sparkSession
    // an in-memory catalog forgets tables across JVMs while the warehouse
    // dir survives — drop both the entry and any orphaned location, or
    // saveAsTable fails with LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
