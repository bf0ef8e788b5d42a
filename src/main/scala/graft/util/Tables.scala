package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** events with `ts` normalized to a microsecond TimestampType, whatever
    * physical shape the fixture stored:
    *
    *  - TIMESTAMP(NANOS) parquet (early fixtures): Spark 4 refuses to read
    *    nanos as a timestamp; `nanosAsLong` reads Long nanos, and the
    *    truncating `div 1000` matches DuckDB's TIMESTAMP_NS→TIMESTAMP cast;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet (current
    *    fixtures): Spark reads TIMESTAMP_NTZ; the session runs in UTC, so
    *    the cast to TimestampType keeps the same micros value.
    *
    * Either way the result is the instant DuckDB sees for `ts::TIMESTAMP`,
    * so oracle SQL must wrap events.ts in `ts::TIMESTAMP` (a no-op cast on
    * the micros fixture — kept so the SQL works against both). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // the NTZ→TZ cast is value-preserving ONLY in a UTC session — a
        // non-UTC session would silently shift every event instant away
        // from what the DuckDB oracle computes, so refuse loudly instead
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events(): the TIMESTAMP_NTZ fixture requires " +
            "spark.sql.session.timeZone=UTC for oracle parity; set it in " +
            "the SparkSession builder")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      // a drifted fixture (string/int ts) must fail at load, not flow on
      // to mysterious oracle mismatches — this loader exists for parity
      case other => throw new IllegalStateException(
        s"events.parquet ts has unexpected type $other; expected " +
          "TIMESTAMP(NANOS) (legacy long), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
}
