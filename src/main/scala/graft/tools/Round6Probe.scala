package graft.tools

import graft.dedup.Dedup
import graft.index.Ivf
import graft.search.VectorSearch
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replication scaling probe for the round-6 operators (the
  * [[graft.ScaleProbe]] protocol): does prefix-filter containment and the
  * ball-cover exact batch join track input size, or bend quadratic?
  *
  * Replication design differs per operator because "adversarial" differs:
  *
  *   - containment: exact clones would create REAL quadratic output (every
  *     clone pair has C = 1 — the measured clone pathology of SCALE.md
  *     round-5c, answered there by exact-dedup-first). Linearity of the
  *     CANDIDATE MACHINERY is what this probe measures, so replicas get
  *     token-suffixed text (`regexp_replace(text, token, token_i)`):
  *     shingle spaces are disjoint across replicas, pair density per doc
  *     is constant, and any superlinear bend is the operator's fault, not
  *     the data's.
  *   - knnJoinExact: exact vector clones are FINE (top-k per query stays
  *     bounded) and adversarial in the right way — clone mass inflates
  *     every probed cluster.
  *
  * Prints `PROBE <op>_x<n> <sec> rows=<out>` lines; ×1 carries JVM warmup.
  * Usage: `sbt "runMain graft.tools.Round6Probe"` (env SPARK_GRAFT_SF_DIR,
  * default sf0.1; SPARK_GRAFT_PROBE_REPS, default 1,4,16). */
object Round6Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1,4,16")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val embs0 = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

    // replica texts must keep the base corpus's TOKEN structure: the
    // suffix is appended alphanumerically ("z<i>"), because a separator
    // the tokenizer strips (e.g. "_") would split every token and turn
    // trigram shingles into bigram-like ones — a denser-overlap corpus
    // that superlinearly inflates REAL candidates (measured: the first
    // probe draft did exactly that and filled the disk at ×16)
    def repDocsDisjoint(n: Int): DataFrame = (0 until n)
      .map(i => docs0
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text",
          if (i == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", s"$$1z$i")))
      .reduce(_ unionByName _).cache()
    def repEmbs(n: Int): DataFrame = (0 until n)
      .map(i => embs0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _).cache()

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count()
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warmup

    for (n <- reps) {
      val d = repDocsDisjoint(n); d.count()
      // budget first, like a production caller would: the exact candidate
      // mass is one aggregate, and a hot number here means the CORPUS is
      // pairwise-dense (route through exact-dedup first), not that the
      // operator bent
      val vol = Dedup.containmentCandidateVolume(
        Dedup.shinglePostings(d, "doc_id", "text"), 0.9)
      println(s"PROBE containment_candidate_volume_x$n $vol")
      t(s"containment_prefix_x$n")(
        Dedup.containmentPairsPrefix(d, "doc_id", "text", threshold = 0.9))
      d.unpersist()

      val e = repEmbs(n); e.count()
      val idx0 = Ivf.build(e, "vec_id", "embedding") // DDL, untimed
      val idx = idx0.copy(assignments = idx0.assignments.cache())
      idx.assignments.count()
      val batch = e.where(col("vec_id") < 50)
      t(s"knn_join_exact_x$n")(
        Ivf.knnJoinExact(idx, batch, e, "vec_id", "embedding",
          "vec_id", "embedding", k = 3, probeMass = 0.9))
      // sanity at every scale: ball-cover output == exact join
      val exact = VectorSearch.knnJoin(batch, e, "vec_id", "embedding",
          "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rank").collect().toSeq
      val routed = Ivf.knnJoinExact(idx, batch, e, "vec_id", "embedding",
          "vec_id", "embedding", k = 3, probeMass = 0.9)
        .orderBy("query_id", "rank").collect().toSeq
      println(s"PROBE knn_join_exact_x${n}_matches_exact ${routed == exact}")
      e.unpersist(); idx.assignments.unpersist()
    }
    spark.stop()
  }
}
