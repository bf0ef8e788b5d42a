package graft.tools

import graft.index.Ivf
import graft.search.VectorSearch
import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: minimum IVF probe-mass fraction with batch recall 1.
  *
  * The sub-exhaustive index queries license their exact-kNN oracles via a
  * Verify-time routed==exact check, so their probe-depth constants must
  * clear recall 1 at the driver's correctness SF with margin. This main
  * measures, per SF dir given on the command line, whether
  * [[Ivf.knnJoin]] (the 50-query flagship batch, k=3) and [[Ivf.ann]]
  * (the flagship single query, k=10) match the exact result at a ladder
  * of probe-mass fractions — the evidence behind the constants in
  * SparkEntry (not a guess, and re-runnable when testdata regenerates).
  *
  * Usage: runMain graft.tools.ProbeRecall /root/testdata/sf0.01 [...]
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val e = Tables.embeddings(spark, dir).cache()
      val idx0 = Ivf.build(e, "vec_id", "embedding")
      val idx = idx0.copy(assignments = idx0.assignments.cache())
      val total = idx.sizes.values.sum
      val batch = e.where(col("vec_id") < 50)
      val exactJoin = VectorSearch.knnJoin(batch, e,
          "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rank").collect().toSeq
      println(s"== $dir  (n=$total, clusters=${idx.sizes.size})")
      for (f <- Seq(0.80, 0.85, 0.90, 0.925, 0.95, 0.975, 0.99)) {
        val nc = math.max(10, (total * f).toInt)
        val routed = Ivf.knnJoin(idx, batch, e,
            "vec_id", "embedding", "vec_id", "embedding", k = 3,
            numCandidates = nc)
          .orderBy("query_id", "rank").collect().toSeq
        val diverging = routed.zip(exactJoin).count { case (a, b) => a != b }
        println(f"  knnJoin       mass=$f%5.3f  rowsDiffer=$diverging")
      }
      // the ball-cover-pruned exact join must match at EVERY probe mass
      for (f <- Seq(0.30, 0.60, 0.90)) {
        val routed = Ivf.knnJoinExact(idx, batch, e,
            "vec_id", "embedding", "vec_id", "embedding", k = 3,
            probeMass = f)
          .orderBy("query_id", "rank").collect().toSeq
        val diverging = routed.zip(exactJoin).count { case (a, b) => a != b }
        println(f"  knnJoinExact  mass=$f%5.3f  rowsDiffer=$diverging" +
          (if (diverging > 0) "  <-- BUG" else ""))
      }
      e.unpersist(); idx.assignments.unpersist()
    }
    spark.stop()
  }
}
