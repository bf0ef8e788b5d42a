package graft

import graft.operators.Sketches
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch contracts: approximate (HLL++/t-digest) accuracy vs exact values,
  * and the deterministic KMV / discrete-quantile operators that back the
  * q_sketches oracle row. */
class SketchSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

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

  test("KMV aggregator equals the windowed reference formulation on events") {
    val ev = Tables.events(spark, Sf0001)
    val h = graft.functions.Text.hash60(col("user_id").cast("string"))
    val agg = Sketches.kmvDistinct(ev, "event_type", h, Sketches.DefaultK, "kmv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val win = Sketches.kmvDistinctWindowed(ev, "event_type", h, Sketches.DefaultK, "kmv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg === win)
    assert(agg.nonEmpty)
  }

  test("KMV is exact below k, within 2/sqrt(k) above, and ignores duplicates") {
    // 40 distinct users (< k=64): estimate must be the exact count, even
    // with every row duplicated (hash-set semantics)
    val small = (1 to 40).flatMap(i => Seq(("g", s"u$i"), ("g", s"u$i"))).toDF("grp", "uid")
    val hs = graft.functions.Text.hash60(col("uid"))
    val est = Sketches.kmvDistinct(small, "grp", hs).head().getLong(1)
    assert(est === 40L)
    // 5000 distinct (>> k): classic KMV error bound ~1/sqrt(k-1); allow 3x
    val big = (1 to 5000).map(i => ("g", s"user$i")).toDF("grp", "uid")
    val estBig = Sketches.kmvDistinct(big, "grp", hs).head().getLong(1)
    assert(math.abs(estBig - 5000.0) / 5000.0 <= 3.0 / math.sqrt(Sketches.DefaultK - 1),
      s"estimate $estBig too far from 5000")
  }

  test("quantilesDisc returns the exact rank-ceil(p*n/100) value per group") {
    val ev = Tables.events(spark, Sf0001)
    val got = Sketches.quantilesDisc(ev, "event_type", "value", Seq(50, 95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val types = got.keySet
    assert(types.nonEmpty)
    types.foreach { t =>
      val vals = ev.where(col("event_type") === t && col("value").isNotNull)
        .select("value").as[Double].collect().sorted
      def at(p: Int) = vals((p * vals.length + 99) / 100 - 1)
      assert(got(t) === (at(50), at(95)), s"group $t")
    }
  }
}
