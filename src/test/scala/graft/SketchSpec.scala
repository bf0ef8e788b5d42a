package graft

import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch accuracy vs exact values (the sketches have no SQL
  * oracle, so the accuracy contract lives here). */
class SketchSpec extends AnyFunSuite with SparkTest {

  test("approx_count_distinct within 5% of exact; quantiles within the value spread") {
    val ev = Tables.events(spark, Sf0001)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    approx.foreach { case (t, a, p50) =>
      val e = exact(t)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$t: approx $a vs exact $e")
      // p50 must sit between the column min and max for the group
      val Array(mn, mx) = ev.where(col("event_type") === t)
        .agg(min(col("value")), max(col("value"))).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      assert(p50 >= mn && p50 <= mx)
    }
  }
}
