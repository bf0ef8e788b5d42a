package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine operators take DataFrames, so these are thin; they exist so
  * every query names tables one way and so the embedding column is cast to
  * `array<double>` exactly once (float→double widening must happen before
  * any similarity math for oracle parity — DuckDB computes on DOUBLE[]).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  /** embeddings with `embedding` widened float→double (see scaladoc above). */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "embeddings")
    df.withColumn("embedding", df.col("embedding").cast("array<double>"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
}
