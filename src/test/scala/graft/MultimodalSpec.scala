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

  test("real decode: an externally-crafted PNG yields exact dims and pixel sums") {
    // the PNG bytes were produced OUTSIDE this codebase (hand-built
    // chunks + zlib, not ImageIO) — the decode is checked against a
    // foreign encoder's output, not our own round-trip. 3x2 RGB:
    // row0 (255,0,0)(0,255,0)(0,0,255); row1 (10,20,30)(40,50,60)(70,80,90)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAIAAAASFvFNAAAAF0lEQVR4nGP4z8" +
        "DAAMFcInIaRjZuAVEAM1kEwOQkmMsAAAAASUVORK5CYII=")
    val s = Multimodal.decodeImageStats(7L, png)
    assert(s === Multimodal.ImageStats(7L, 3L, 2L, 375L, 405L, 435L))
    // planted fixture: encode-through-real-codec round-trips the
    // construction arithmetic (the q_multimodal_decode contract)
    val docs = Seq(0L, 1L, 5L, 11L).toDF("doc_id")
    val stats = Multimodal.imageStats(
        Multimodal.plantedImageAssets(docs, "doc_id"))
      .collect().map(st => st.asset_id -> st).toMap
    for (id <- Seq(0L, 1L, 5L, 11L)) {
      val w = (3 + id % 4).toInt
      val h = (2 + id % 3).toInt
      val px = for (x <- 0 until w; y <- 0 until h) yield (x, y)
      val expect = Multimodal.ImageStats(id, w.toLong, h.toLong,
        px.map { case (x, _) => (id + x) % 256 }.sum,
        px.map { case (_, y) => (id + y) % 256 }.sum,
        px.map { case (x, y) => (id + x.toLong * y) % 256 }.sum)
      assert(stats(id) === expect, s"id $id")
    }
    // corrupt payloads refuse loudly with the asset id
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeImageStats(42L, Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("42"))
  }

  test("real audio decode: an externally-crafted WAV yields exact format and sample sum") {
    // RIFF/fmt/data chunks hand-built outside this codebase (struct
    // packing, not javax.sound): mono 16-bit 8 kHz, samples
    // [100, -200, 300, -400, 32767, -32768] → sum −201, 6 frames
    val wav = java.util.Base64.getDecoder.decode(
      "UklGRjAAAABXQVZFZm10IBAAAAABAAEAQB8AAIA+AAACABAAZGF0YQwAAABkADj/" +
        "LAFw/v9/AIA=")
    assert(Multimodal.decodeWavStats(3L, wav) ===
      Multimodal.AudioStats(3L, 8000L, 1L, 6L, -201L))
    // planted fixture round-trips the construction arithmetic through a
    // real encode+parse (the q_multimodal_audio contract)
    val docs = Seq(0L, 4L, 9L).toDF("doc_id")
    val stats = Multimodal.audioStats(
        Multimodal.plantedAudioAssets(docs, "doc_id"))
      .collect().map(st => st.asset_id -> st).toMap
    for (id <- Seq(0L, 4L, 9L)) {
      val n = (20 + id % 16).toInt
      val sum = (0 until n).map(i => (id * 37 + i.toLong * 11) % 4001 - 2000).sum
      assert(stats(id) === Multimodal.AudioStats(id, 8000L, 1L, n.toLong, sum),
        s"id $id")
    }
    // corrupt payloads refuse loudly with the asset id
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeWavStats(42L, Array[Byte](9, 9, 9)))
    assert(e.getMessage.contains("42"))
  }

  test("video container: round-trip, truncation refuses, sampled decode matches arithmetic") {
    // container round-trip preserves every frame byte-exactly
    val frames = Seq(Array[Byte](1, 2, 3), Array.emptyByteArray,
      Array[Byte](9))
    val enc = Multimodal.encodeFrames(frames)
    val dec = Multimodal.decodeFrames(5L, enc)
    assert(dec.map(_.toSeq) === frames.map(_.toSeq))
    // bad magic and truncated streams refuse with the asset id
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeFrames(7L, "XXXX????".getBytes))
      .getMessage.contains("7"))
    intercept[java.io.EOFException](
      Multimodal.decodeFrames(7L, enc.dropRight(2)))
    // planted fixture: every-2nd-frame decode equals the construction
    // arithmetic (the q_multimodal_frames contract)
    val docs = Seq(0L, 1L, 5L, 11L).toDF("doc_id")
    val stats = Multimodal.videoFrameStats(
        Multimodal.plantedVideoAssets(docs, "doc_id"), everyNth = 2)
      .collect().map(st => st.asset_id -> st).toMap
    for (id <- Seq(0L, 1L, 5L, 11L)) {
      val nF = (2 + id % 3).toInt
      val sampled = (0 until nF).filter(_ % 2 == 0)
      val px = for {
        k <- sampled
        x <- 0 until (2 + (id + k) % 3).toInt
        y <- 0 until (1 + (id + k) % 2).toInt
      } yield (k, x, y)
      val expect = Multimodal.VideoStats(id, nF.toLong, sampled.size.toLong,
        px.map { case (k, x, _) => (id + k + x) % 256 }.sum,
        px.map { case (k, _, y) => (id + k + y) % 256 }.sum,
        px.map { case (k, x, y) => (id + k + x.toLong * y) % 256 }.sum)
      assert(stats(id) === expect, s"id $id")
    }
  }

  test("AVI demux: a HAND-ASSEMBLED container parses; round-trip; truncation and count mismatch refuse") {
    // truth pin (the externally-crafted-PNG discipline): the container
    // bytes here are assembled by hand from the public AVI spec,
    // independent of encodeAviMjpeg, so parser and writer cannot share
    // a wrong layout
    def le32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def fcc(s: String) = s.getBytes("US-ASCII")
    val f0 = Array[Byte](10, 20, 30) // 3 bytes → odd, needs pad
    val f1 = Array[Byte](40, 50, 60, 70)
    val bos = new java.io.ByteArrayOutputStream()
    def w(bs: Array[Byte]*): Unit = bs.foreach(bos.write)
    // avih: 56 bytes, dwTotalFrames (5th dword) = 2
    val avih = new java.io.ByteArrayOutputStream()
    avih.write(fcc("avih")); avih.write(le32(56))
    Seq(100000, 0, 0, 0x10, 2, 0, 1, 4, 4, 3, 0, 0, 0, 0)
      .foreach(v => avih.write(le32(v)))
    val hdrlBody = avih.toByteArray
    val moviBody = new java.io.ByteArrayOutputStream()
    moviBody.write(fcc("00dc")); moviBody.write(le32(3)); moviBody.write(f0)
    moviBody.write(0) // even pad
    moviBody.write(fcc("00dc")); moviBody.write(le32(4)); moviBody.write(f1)
    val body = new java.io.ByteArrayOutputStream()
    body.write(fcc("AVI "))
    body.write(fcc("LIST")); body.write(le32(hdrlBody.length + 4))
    body.write(fcc("hdrl")); body.write(hdrlBody)
    body.write(fcc("LIST")); body.write(le32(moviBody.size() + 4))
    body.write(fcc("movi")); body.write(moviBody.toByteArray)
    w(fcc("RIFF"), le32(body.size()), body.toByteArray)
    val handMade = bos.toByteArray
    val parsed = Multimodal.decodeAviFrames(1L, handMade)
    assert(parsed.map(_.toSeq) === IndexedSeq(f0.toSeq, f1.toSeq))
    // writer → parser round-trip with real JPEG frames
    val j0 = Multimodal.encodeJpeg(5, 4, (x, y) => (x * 40) << 16 | y * 60)
    val j1 = Multimodal.encodeJpeg(6, 3, (x, y) => (x + y) * 20)
    val avi = Multimodal.encodeAviMjpeg(Seq(j0, j1), 5, 4)
    val rt = Multimodal.decodeAviFrames(2L, avi)
    assert(rt.map(_.toSeq) === IndexedSeq(j0.toSeq, j1.toSeq))
    // and the frames decode through the real JPEG codec with exact dims
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rt(0)))
    assert(img0.getWidth === 5 && img0.getHeight === 4)
    // truncation refuses loudly (RIFF size now overruns the buffer)
    assertThrows[IllegalArgumentException](
      Multimodal.decodeAviFrames(3L, avi.dropRight(6)))
    // a frame chunk torn out (declared frame count ≠ movi content)
    // refuses: rebuild the hand-made container with dwTotalFrames = 3
    val tampered = handMade.clone()
    // avih dwTotalFrames sits at: 12 (RIFF hdr) + 12 (LIST/hdrl) +
    // 8 (avih hdr) + 16 = offset 48
    tampered(48) = 3
    assertThrows[IllegalArgumentException](
      Multimodal.decodeAviFrames(4L, tampered))
    // not a RIFF stream at all
    assertThrows[IllegalArgumentException](
      Multimodal.decodeAviFrames(5L, "GVID junk bytes".getBytes))
  }

  test("avi frame stats: demux + sampled real JPEG decode matches plant arithmetic") {
    val docs = Seq(0L, 1L, 5L, 11L).toDF("doc_id")
    val stats = Multimodal.aviFrameStats(
        Multimodal.plantedAviAssets(docs, "doc_id"), everyNth = 2)
      .collect().map(st => st.asset_id -> st).toMap
    for (id <- Seq(0L, 1L, 5L, 11L)) {
      val nF = (2 + id % 3).toInt
      val sampled = (0 until nF).filter(_ % 2 == 0)
      val expect = Multimodal.AviStats(id, nF.toLong, sampled.size.toLong,
        sampled.map(k => 4 + (id + k) % 5).sum,
        sampled.map(k => 3 + (id + k) % 4).sum)
      assert(stats(id) === expect, s"id $id")
    }
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
