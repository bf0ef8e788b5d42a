package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 smoke probe: runs the new declared queries
  * (q_funnel_reconcile, q_knn_join_plan, q_ann_plan, q_ann_depth) with
  * the Verify self-check enabled at the two small SFs, so the new gates
  * (non-empty reconcile corrections, routed==exact, measured-depth
  * re-plan) are exercised before the full Verify run. Usage:
  * `sbt "runMain graft.tools.Round10Probe"`. */
object Round10Probe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.selfcheck") = "1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val sf = dir.split('/').last
      val d = graft.SparkEntry.queries("q_ann_depth")(spark, dir)
      d.write.mode("overwrite").parquet(s"/tmp/anndepth_$sf.parquet")
      println(s"PROBE ann_depth $dir -> " + d.collect().mkString("; "))
      val r1 = graft.SparkEntry.queries("q_funnel_reconcile")(spark, dir).collect()
      println(s"PROBE reconcile $dir -> " + r1.mkString("; "))
      val r2 = graft.SparkEntry.queries("q_knn_join_plan")(spark, dir).count()
      println(s"PROBE knn_join_plan $dir rows=" + r2)
      val r3 = graft.SparkEntry.queries("q_ann_plan")(spark, dir).count()
      println(s"PROBE ann_plan $dir rows=" + r3)
      val r4 = graft.SparkEntry.queries("q_ann_plan_filtered")(spark, dir).count()
      println(s"PROBE ann_plan_filtered $dir rows=" + r4)
    }
    spark.stop()
  }
}
