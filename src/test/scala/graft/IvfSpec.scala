package graft

import graft.embed.Embedder
import graft.index.Ivf
import graft.search.VectorSearch
import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: exhaustive probe ≡ exact search; sub-exhaustive probe keeps
  * high recall at a fraction of the scan (SURVEY §7.2 step 9). */
class IvfSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val embs = Tables.embeddings(spark, Sf0001).cache()
  private lazy val index = Ivf.build(embs, "vec_id", "embedding")
  private val query = Embedder.default.embed("nuggets para desayuno")

  test("index partitions all vectors across ~sqrt(N) clusters") {
    assert(index.sizes.values.sum === embs.count())
    assert(index.centroids.size === math.ceil(math.sqrt(embs.count().toDouble)).toInt)
  }

  test("exhaustive probe returns exactly the exact-kNN result") {
    val exact = VectorSearch.knn(embs, "vec_id", "embedding", query, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val ann = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = Int.MaxValue)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann === exact)
  }

  test("probe set grows with numCandidates and stays nearest-first") {
    val small = Ivf.probeSet(index, query, 10)
    val big = Ivf.probeSet(index, query, 200)
    assert(small.size <= big.size)
    assert(big.startsWith(small))
  }

  test("sub-exhaustive probe recall@10 >= 0.7 while scanning a fraction") {
    val exact = VectorSearch.knn(embs, "vec_id", "embedding", query, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val nCand = VectorSearch.numCandidatesCli(10) // max(k*5, 200) = 200 of 500
    val probe = Ivf.probeSet(index, query, nCand)
    val scanned = probe.map(index.sizes(_)).sum
    assert(scanned < embs.count(), "probe should not scan everything")
    val ann = Ivf.ann(index, embs, "vec_id", "embedding", query,
        k = 10, numCandidates = nCand)
      .select("vec_id").as[Long].collect().toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }
}
