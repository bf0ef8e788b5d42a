package graft

import java.nio.file.Files

import graft.index.{IndexStore, Ivf}
import graft.search.VectorSearch
import org.scalatest.funsuite.AnyFunSuite

/** IVF drift-monitor contracts: same-distribution waves stay below the
  * declared factor, a shifted wave is measurably flagged, executing the
  * recommended retrain resets the ledger and restores the quantization
  * baseline, an unmeasurable index is refused, and replays don't double
  * the ledger. */
class DriftSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val Dim = 8

  /** A unit-ish blob around axis `axis` with small deterministic noise. */
  private def blob(axis: Int, n: Int, seed: Int,
      startId: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(Dim)(rnd.nextGaussian() * 0.05)
      v(axis) += 1.0
      val norm = math.sqrt(v.map(x => x * x).sum)
      (startId + i, v.map(_ / norm).toSeq)
    }
  }

  private def df(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding").localCheckpoint(true)

  test("drift monitor: in-distribution waves pass, a shifted wave is flagged, retrain resets") {
    val dir = Files.createTempDirectory("ivfdrift").toString
    val base = blob(0, 60, 1, 0) ++ blob(1, 60, 2, 100) ++ blob(2, 60, 3, 200)
    IndexStore.createIvf(df(base), "vec_id", "embedding", dir,
      numClusters = 3)
    val p0 = IndexStore.planRetrain(spark, dir)
    assert(p0.wavesN === 0 && p0.ratio === 1.0 && !p0.recommend)
    // a wave drawn from the SAME blobs quantizes like the training set
    val wave1 = blob(0, 20, 4, 300) ++ blob(2, 20, 5, 400)
    IndexStore.appendBatchIvf(df(wave1), "vec_id", "embedding", dir, 0L)
    val p1 = IndexStore.planRetrain(spark, dir)
    assert(p1.wavesN === 40)
    assert(p1.ratio < 1.25,
      s"in-distribution wave should not trip the monitor: $p1")
    assert(!p1.recommend)
    assert(!IndexStore.executeRetrain(spark, dir, p1,
      df(base ++ wave1), "vec_id", "embedding", numClusters = 3))
    // a replayed wave doesn't double the ledger
    IndexStore.appendBatchIvf(df(wave1), "vec_id", "embedding", dir, 0L)
    assert(IndexStore.planRetrain(spark, dir).wavesN === 40)
    // a SHIFTED wave (a blob none of the trained cells cover) is flagged
    val wave2 = blob(5, 40, 6, 500)
    IndexStore.appendBatchIvf(df(wave2), "vec_id", "embedding", dir, 1L)
    val p2 = IndexStore.planRetrain(spark, dir)
    assert(p2.wavesN === 80)
    assert(p2.ratio >= 1.25,
      s"shifted wave should trip the monitor: $p2")
    assert(p2.recommend)
    // executing the retrain rebuilds from the full corpus: the ledger
    // resets, the new baseline covers the shifted blob, and the checked
    // loader accepts the rebuilt index against the full corpus
    val full = base ++ wave1 ++ wave2
    assert(IndexStore.executeRetrain(spark, dir, p2, df(full), "vec_id",
      "embedding", numClusters = 4))
    val p3 = IndexStore.planRetrain(spark, dir)
    assert(p3.wavesN === 0 && !p3.recommend)
    assert(p3.baseN === full.size)
    // the retrained cells cover the shifted geometry: the new baseline's
    // mean cell distance is back at blob-noise scale, far below the
    // drifted waves' pooled mean
    assert(p3.baseMean < p2.wavesMean / 2,
      s"retrained baseline ${p3.baseMean} vs drifted ${p2.wavesMean}")
    val idx = IndexStore.loadIvfChecked(spark, dir, df(full), "vec_id",
      "embedding")
    // routed at exhaustive depth == exact over the rebuilt index
    val q = full.head._2.toArray
    val routed = Ivf.ann(idx, df(full), "vec_id", "embedding", q, k = 5,
        numCandidates = Int.MaxValue, forceRoute = true)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val exact = VectorSearch.knn(df(full), "vec_id", "embedding", q, k = 5)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(routed === exact)
  }

  test("PQ drift: frozen codebooks flag a shifted wave; retrain resets the ledger") {
    import graft.index.Pq
    val dir = Files.createTempDirectory("pqdrift").toString
    val base = blob(0, 60, 11, 0) ++ blob(1, 60, 12, 100)
    IndexStore.savePq(
      Pq.build(df(base), "vec_id", "embedding", m = 4, ksub = 8), dir,
      source = Some((df(base), "vec_id", "embedding")))
    val p0 = IndexStore.planRetrain(spark, dir)
    assert(p0.wavesN === 0 && !p0.recommend)
    // in-distribution wave: reconstruction error ≈ the trained residual
    IndexStore.appendBatchPq(df(blob(0, 20, 13, 300)), "vec_id",
      "embedding", dir, 0L)
    val p1 = IndexStore.planRetrain(spark, dir)
    assert(p1.ratio < 1.25 && !p1.recommend,
      s"in-distribution PQ wave should not trip the monitor: $p1")
    // shifted wave: codebooks trained elsewhere quantize it badly
    val wave2 = blob(5, 40, 14, 500)
    IndexStore.appendBatchPq(df(wave2), "vec_id", "embedding", dir, 1L)
    val p2 = IndexStore.planRetrain(spark, dir)
    assert(p2.ratio >= 1.25 && p2.recommend,
      s"shifted PQ wave should trip the monitor: $p2")
    val full = base ++ blob(0, 20, 13, 300) ++ wave2
    assert(IndexStore.executeRetrainPq(spark, dir, p2, df(full), "vec_id",
      "embedding", m = 4, ksub = 8))
    val p3 = IndexStore.planRetrain(spark, dir)
    assert(p3.wavesN === 0 && !p3.recommend)
    assert(p3.baseMean < p2.wavesMean / 2,
      s"retrained codebooks ${p3.baseMean} vs drifted ${p2.wavesMean}")
    // the rebuilt index is checkable against the full corpus
    assert(IndexStore.loadPqChecked(spark, dir, df(full), "vec_id",
      "embedding").n === full.size)
  }

  test("an index without a source has no baseline: unpriceable, loudly") {
    val dir = Files.createTempDirectory("ivfnodrift").toString
    val base = blob(0, 30, 7, 0) ++ blob(1, 30, 8, 100)
    val idx = Ivf.build(df(base), "vec_id", "embedding", numClusters = 2)
    IndexStore.saveIvf(idx, dir) // no source
    val e = intercept[IllegalArgumentException](
      IndexStore.planRetrain(spark, dir))
    assert(e.getMessage.contains("drift baseline"))
    intercept[IllegalArgumentException](
      IndexStore.planRetrain(spark, dir, driftFactor = 0.0))
  }
}
