package graft

import graft.index.Pq
import graft.search.VectorSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: exhaustive-degenerate exactness, sub-exhaustive
  * recall on clustered data, reconstruction, determinism, and the DDL
  * contracts (metric/dim enforcement). */
class PqSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // 120 vectors in 3 well-separated 8-dim clusters (seeded, deterministic)
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(10.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 10, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 10, 0, 0, 0, 0, 0))
    (0 until 120).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.5).toSeq)
    }.toDF("id", "emb")
  }

  private lazy val index = Pq.build(clustered, "id", "emb", m = 4, ksub = 4, metric = "cosine")

  test("exhaustive overfetch equals exact knn — short-circuit AND forced-rerank paths") {
    val q = Array(9.5, 0.5, 0, 0, 0, 0, 0, 0)
    val exact = VectorSearch.knn(clustered, "id", "emb", q, k = 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (force <- Seq(false, true)) {
      val got = Pq.ann(index, clustered, "id", "emb", q, k = 10,
          overfetch = Int.MaxValue, forceRerank = force)
        .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === exact, s"forceRerank=$force")
    }
  }

  test("sub-exhaustive ADC overfetch keeps high recall on clustered data") {
    val q = Array(9.5, 0.5, 0, 0, 0, 0, 0, 0)
    val exact = VectorSearch.knn(clustered, "id", "emb", q, k = 10)
      .select("id").as[Long].collect().toSet
    // scan 1/4 of the corpus by ADC rank, then exact re-rank
    val got = Pq.ann(index, clustered, "id", "emb", q, k = 10, overfetch = 30)
      .select("id").as[Long].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 at overfetch 30/120")
  }

  test("codes are m small ints (the 32x story) and encoding is deterministic") {
    val rows = index.codes.select(col("codes")).collect()
    assert(rows.forall(_.getSeq[Int](0).length === 4))
    assert(rows.forall(_.getSeq[Int](0).forall(c => c >= 0 && c < 4)))
    val again = Pq.build(clustered, "id", "emb", m = 4, ksub = 4, metric = "cosine")
    assert(index.codes.orderBy("id").collect().toSeq ===
      again.codes.orderBy("id").collect().toSeq)
  }

  test("reconstruction error is bounded by cluster spread; centroid inputs reconstruct closely") {
    val recon = reconstructAll()
    // every vector's reconstruction lands within its cluster (distance to
    // original << distance between the 10-separated cluster centers)
    recon.foreach { case (orig, rec) =>
      val d = math.sqrt(orig.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d < 5.0, s"reconstruction drifted across clusters: $d")
    }
  }

  private def reconstructAll(): Seq[(Array[Double], Array[Double])] = {
    val codes = index.codes.orderBy("id").collect().map(_.getSeq[Int](1).toSeq)
    val orig = clustered.orderBy("id").collect().map(_.getSeq[Double](1).toArray)
    orig.zip(codes.map(Pq.reconstruct(index, _))).toSeq
  }

  test("ivf-pq composed: forced-exhaustive equals exact; sub-exhaustive keeps recall") {
    val ivf = graft.index.Ivf.build(clustered, "id", "emb", numClusters = 3)
    val q = Array(9.5, 0.5, 0, 0, 0, 0, 0, 0)
    val exact = VectorSearch.knn(clustered, "id", "emb", q, k = 10)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val forced = Pq.annIvf(ivf, index, clustered, "id", "emb", q, k = 10,
        numCandidates = Int.MaxValue, overfetch = Int.MaxValue, forceRerank = true)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(forced === exact)
    // probe ~1 cluster of 3, ADC-overfetch a quarter of the corpus: the
    // true neighbors live in the probed cluster on this geometry
    val sub = Pq.annIvf(ivf, index, clustered, "id", "emb", q, k = 10,
        numCandidates = 40, overfetch = 30)
      .select("id").as[Long].collect().toSet
    val recall = (exact.map(_._1).toSet & sub).size.toDouble / exact.size
    assert(recall >= 0.9, s"composed recall $recall < 0.9")
  }

  test("pq save/load round-trip preserves ann results and the DDL contract") {
    val path = java.nio.file.Files.createTempDirectory("graft_pq").toString
    graft.index.IndexStore.savePq(index, path)
    val loaded = graft.index.IndexStore.loadPq(spark, path)
    assert(loaded.metric === index.metric)
    assert(loaded.dim === index.dim)
    assert(loaded.n === index.n)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      index.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val q = Array(9.5, 0.5, 0, 0, 0, 0, 0, 0)
    val mem = Pq.ann(index, clustered, "id", "emb", q, k = 10, overfetch = 30)
      .select("id").as[Long].collect().toSeq
    val disk = Pq.ann(loaded, clustered, "id", "emb", q, k = 10, overfetch = 30)
      .select("id").as[Long].collect().toSeq
    assert(mem === disk)
  }

  test("DDL contracts: metric and dim mismatches throw; dim must divide into m") {
    val q = Array(1.0, 0, 0, 0, 0, 0, 0, 0)
    val e1 = intercept[IllegalArgumentException] {
      Pq.ann(index, clustered, "id", "emb", q, k = 5, overfetch = 10, metric = "euclidean")
    }
    assert(e1.getMessage.contains("similarity"))
    val e2 = intercept[IllegalArgumentException] {
      Pq.ann(index, clustered, "id", "emb", Array(1.0, 0.0), k = 5, overfetch = 10)
    }
    assert(e2.getMessage.contains("numDimensions"))
    val e3 = intercept[IllegalArgumentException] {
      Pq.build(clustered, "id", "emb", m = 3)
    }
    assert(e3.getMessage.contains("divisible"))
  }

  test("preFilter prunes the ADC scan BEFORE overfetch truncation (never starves below k)") {
    import org.apache.spark.sql.functions.col
    // filter = cluster-2 rows only (ids ≡ 2 mod 3): a third of the corpus.
    // With a small overfetch, a POST-filter would keep mostly cluster-0
    // candidates (the query's own cluster dominates ADC scores) and starve
    // the result; the pre-filter contract must return a full k of matching
    // rows.
    val query = Array(10.0, 0, 0, 0, 0, 0, 0, 0) // sits in cluster 0
    val filtered = Pq.ann(index, clustered, "id", "emb", query, k = 5,
        overfetch = 12, preFilter = Some(col("id") % 3 === 2),
        forceRerank = true)
      .collect().map(_.getLong(0))
    assert(filtered.length === 5, s"starved: ${filtered.mkString(",")}")
    assert(filtered.forall(_ % 3 == 2))
    // at overfetch ≥ matching rows the result equals the exact filtered knn
    val exact = graft.search.VectorSearch.knn(
        clustered.where(col("id") % 3 === 2), "id", "emb", query, k = 5)
      .collect().map(_.getLong(0))
    val full = Pq.ann(index, clustered, "id", "emb", query, k = 5,
        overfetch = 40, preFilter = Some(col("id") % 3 === 2),
        forceRerank = true)
      .collect().map(_.getLong(0))
    assert(full === exact)
  }
}
