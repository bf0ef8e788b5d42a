package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit instrument: print the EXECUTED physical plan of declared
  * queries, so the `.explain`-and-iterate discipline (SCALE.md design
  * table) has a runnable entry point — `sbt "runMain graft.PlanDump
  * <sfDir> [name,name,...]"`. Prints each query's executed plan plus a
  * one-line red-flag summary (CartesianProduct / non-broadcast join /
  * missing partition filters are the usual suspects); no data is
  * materialized beyond what plan construction itself runs (index
  * builds, planner lookups). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(',').map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      println(s"==== $name")
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "single-partition-window" ->
            plan.contains("WindowExec: No Partition Defined"))
          .collect { case (f, true) => f }
        println(plan)
        println(s"---- $name flags: " +
          (if (flags.isEmpty) "none" else flags.mkString(", ")))
      } catch { case e: Throwable =>
        println(s"---- $name FAILED to construct: ${e.toString.take(300)}")
      }
    }
    spark.stop()
  }
}
