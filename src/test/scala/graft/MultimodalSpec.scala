package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, AssetMeta}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary-column plumbing: schema, batch shape, stub determinism,
  * feature math. */
class MultimodalSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val meta = AssetMeta("fake/raw", 4, 1, 1, 0, 0L)

  test("asset schema: binary payload + typed metadata struct") {
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromDocuments(docs, "doc_id", "text")
    val f = assets.schema("payload")
    assert(f.dataType.typeName === "binary")
    assert(assets.schema("meta").dataType.typeName === "struct")
    val a = assets.head()
    assert(a.payload.toSeq === "abcd".getBytes("UTF-8").toSeq)
    assert(a.meta.width === 4)
  }

  test("feature extraction: hand-computed bytes, mean, histogram") {
    // bytes of "ab z": 97, 98, 32, 122 → mean 87.25; bins: 32→0, rest→1
    val f = Multimodal.extractFeatures(Asset(7L, "image", "ab z".getBytes("UTF-8"), meta))
    assert(f.n_bytes === 4L)
    assert(f.mean_byte === 87.25)
    assert((f.h0, f.h1, f.h2, f.h3) === ((1L, 3L, 0L, 0L)))
    val empty = Multimodal.extractFeatures(Asset(8L, "image", Array.emptyByteArray, meta))
    assert(empty.n_bytes === 0L && empty.mean_byte === 0.0)
    // null payload (null source text) behaves exactly like empty — no NPE
    val nul = Multimodal.extractFeatures(Asset(9L, "image", null, meta))
    assert(nul.n_bytes === 0L && nul.mean_byte === 0.0)
    assert((nul.h0, nul.h1, nul.h2, nul.h3) === ((0L, 0L, 0L, 0L)))
  }

  test("decode stage batches per partition at DecodeBatchSize and is exhaustive") {
    val n = 50 // → batches of 16,16,16,2 in a single partition
    val docs = (1L to n).map(i => (i, s"text number $i")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromDocuments(docs, "doc_id", "text").repartition(1)
    // count batch boundaries by instrumenting the same grouped iteration
    val batchSizes = assets.mapPartitions { it =>
      it.grouped(Multimodal.DecodeBatchSize).map(_.size)
    }.collect().toSeq
    assert(batchSizes === Seq(16, 16, 16, 2))
    val feats = Multimodal.imageFeatures(assets)
    assert(feats.count() === n)
    assert(feats.select("asset_id").as[Long].collect().toSet === (1L to n).toSet)
  }

  test("resize stub: stride downsample, deterministic") {
    val px = Array[Byte](0, 1, 2, 3, 4, 5, 6)
    assert(Multimodal.resizeStub(px, 2).toSeq === Seq[Byte](0, 2, 4, 6))
    assert(Multimodal.resizeStub(px, 1).toSeq === px.toSeq)
    assertThrows[IllegalArgumentException](Multimodal.resizeStub(px, 0))
  }

  test("frame sample stub: fixed-size frames, every nth") {
    val payload = (0 until 12).map(_.toByte).toArray
    val frames = Multimodal.frameSampleStub(payload, frameBytes = 3, everyNth = 2)
    assert(frames.map(_.toSeq) === Seq(Seq[Byte](0, 1, 2), Seq[Byte](6, 7, 8)))
  }
}
