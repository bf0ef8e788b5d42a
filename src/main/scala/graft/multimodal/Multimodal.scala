package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * addition): image/audio/video as opaque `binary` payload columns with a
  * typed metadata struct, processed per-partition in fixed-size batches —
  * the Scala/Dataset rendition of a `mapInPandas` decode stage.
  *
  * The IMAGE and AUDIO decodes are REAL — [[decodeImageStats]] via the
  * JDK's built-in `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with
  * every JRE) and [[decodeWavStats]] via `javax.sound.sampled` (WAV/
  * AIFF/AU) — both gate-checked over planted in-query payloads whose
  * decoded statistics the oracle recomputes from the construction
  * arithmetic. VIDEO is real from the post-demux boundary down: the JDK
  * ships no MP4/WebM codec (a real pipeline demuxes outside the JVM),
  * so the engine owns the frame-container parse → frame sampling →
  * per-frame REAL image decode → aggregation ([[videoFrameStats]],
  * gate-checked the same way); [[frameSampleStub]] remains only for raw
  * fixed-size byte streams. The Spark-side contract is real and
  * tested:
  *
  *   - schema: (asset_id BIGINT, kind STRING, payload BINARY,
  *     meta STRUCT&lt;format,width,height,channels,sample_rate_hz,duration_ms&gt;);
  *   - partition-local batched iteration ([[DecodeBatchSize]] assets per
  *     decode call, mirroring the reference's 16-text embed batches,
  *     `embed.py:29-32`) via `mapPartitions` — zero shuffle, linear scale:
  *     at 100 TB each executor decodes its own splits; payloads never move
  *     across the network because every op here is a narrow map;
  *   - typed `Dataset[T]` with case-class encoders at the edges, DataFrame
  *     in/out for composability.
  */
object Multimodal {

  val DecodeBatchSize = 16

  final case class AssetMeta(
      format: String, width: Int, height: Int, channels: Int,
      sampleRateHz: Int, durationMs: Long)

  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte], meta: AssetMeta)

  final case class ImageFeatures(
      asset_id: Long, n_bytes: Long, mean_byte: Double,
      h0: Long, h1: Long, h2: Long, h3: Long)

  /** STUB decoder — stands in for a real codec (libjpeg/ffmpeg/…): the
    * "decoded pixels" are the payload bytes themselves. Deterministic by
    * construction; swap for a real decoder without touching the pipeline. */
  def decodeImageStub(payload: Array[Byte], meta: AssetMeta): Array[Byte] = payload

  /** STUB resize — nearest-neighbor downsample of the fake pixel stream by
    * integer stride (a real impl would do 2-D interpolation). */
  def resizeStub(pixels: Array[Byte], stride: Int): Array[Byte] = {
    require(stride >= 1, "stride must be >= 1")
    val out = new Array[Byte]((pixels.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = pixels(i * stride); i += 1 }
    out
  }

  /** STUB frame sampler — treats the payload as fixed-size frames and keeps
    * every `everyNth` frame (a real impl would decode container timestamps). */
  def frameSampleStub(payload: Array[Byte], frameBytes: Int, everyNth: Int): Seq[Array[Byte]] = {
    require(frameBytes >= 1 && everyNth >= 1)
    payload.grouped(frameBytes).zipWithIndex.collect {
      case (f, i) if i % everyNth == 0 => f
    }.toSeq
  }

  /** Feature extraction over decoded bytes: length, mean value, and a 4-bin
    * value histogram (bins = byte >> 6 over unsigned bytes). */
  def extractFeatures(a: Asset): ImageFeatures = {
    // null payload (e.g. a null source text) decodes as empty, mirroring how
    // the text operators treat null text — never an NPE mid-pipeline
    val raw = if (a.payload == null) Array.emptyByteArray else a.payload
    val px = decodeImageStub(raw, a.meta)
    val hist = new Array[Long](4)
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val u = px(i) & 0xff
      hist(u >> 6) += 1
      sum += u
      i += 1
    }
    // HALF_UP at 6 decimals — the same rule Spark SQL round / DuckDB round
    // apply, so features hash-match the oracle
    val mean =
      if (px.isEmpty) 0.0
      else java.math.BigDecimal.valueOf(sum.toDouble / px.length)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    ImageFeatures(a.asset_id, px.length.toLong, mean, hist(0), hist(1), hist(2), hist(3))
  }

  /** The decode → featurize stage: partition-local, batched like a
    * mapInPandas UDF (batch shape asserted in the spec). */
  def imageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // one "vectorized decode call" per batch — the boundary a real
        // codec/model invocation would cross
        batch.map(extractFeatures)
      }
    }
  }

  // ------------------------------------------------------- real image path

  /** Decoded-image statistics: dimensions + per-channel pixel sums —
    * the deterministic features the gate can recompute from the planted
    * construction arithmetic. All BIGINT so the DuckDB twin needs no
    * type coercion. */
  final case class ImageStats(asset_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  // ImageIO's default stream cache spills to a temp FILE per read — a
  // pure-CPU decode stage must not pay executor-local disk IO per image.
  // Scoped PER CALL (memory-cached image streams built here), NOT via the
  // process-global ImageIO.setUseCache(false): an object-initializer side
  // effect would silently reconfigure every other ImageIO user in the JVM.
  private def readImageInMemory(bytes: Array[Byte])
      : java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself
    javax.imageio.ImageIO.read(iis)
  }

  /** REAL image decode — `javax.imageio.ImageIO`, which ships PNG/BMP/
    * GIF/JPEG readers with every JDK (no external codec): payload bytes →
    * pixels → per-channel sums. This replaces the round-≤13 stub for the
    * image kind (audio/video stay stubbed: the JDK ships no codecs for
    * them). Undecodable bytes refuse loudly with the asset id — a silent
    * zero row would claim "decoded, empty image" for a corrupt payload. */
  def decodeImageStats(assetId: Long, payload: Array[Byte]): ImageStats = {
    require(payload != null && payload.nonEmpty,
      s"asset $assetId: empty payload is not a decodable image")
    val img = readImageInMemory(payload)
    require(img != null,
      s"asset $assetId: ImageIO found no reader for the payload bytes " +
        "(not a PNG/BMP/GIF/JPEG stream)")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageStats(assetId, img.getWidth.toLong, img.getHeight.toLong,
      sr, sg, sb)
  }

  /** Lossless PNG encode of a pixel function — executor-side builder for
    * planted fixtures (PNG round-trips RGB exactly, so decode features
    * are pure functions of the construction arithmetic, never of encoder
    * bytes). */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int)
      : Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgb(x, y))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  /** The decode → stats stage over real image payloads: partition-local,
    * batched ([[DecodeBatchSize]]) like [[imageFeatures]] — zero shuffle;
    * each executor decodes its own splits. */
  def imageStats(assets: Dataset[Asset]): Dataset[ImageStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(a => decodeImageStats(a.asset_id, a.payload))
      }
    }
  }

  /** Planted REAL-image fixture: one PNG per document, dimensions and
    * every pixel a pure function of doc_id —
    *   w = 3 + id%4, h = 2 + id%3,
    *   r = (id+x)%256, g = (id+y)%256, b = (id+x·y)%256
    * — so an oracle recomputes the decoded sums from the arithmetic alone
    * (the q_pii_scrub planted-fixture pattern, binary edition). Encoding
    * happens ON EXECUTORS inside a narrow typed map. */
  def plantedImageAssets(docs: DataFrame, idCol: String): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val w = (3 + id % 4).toInt
      val h = (2 + id % 3).toInt
      val payload = encodePng(w, h, (x, y) =>
        ((((id + x) % 256).toInt << 16) |
          (((id + y) % 256).toInt << 8) |
          ((id + x.toLong * y) % 256).toInt))
      Asset(id, "image", payload,
        AssetMeta("image/png", w, h, 3, 0, 0L))
    }
  }

  // ------------------------------------------------------- real audio path

  /** Decoded-audio statistics: format facts + the exact integer sum of
    * all PCM samples — WAV PCM is lossless, so the sum is a pure
    * function of the encoded samples and an oracle can recompute it from
    * planted construction arithmetic. */
  final case class AudioStats(asset_id: Long, sample_rate: Long,
      channels: Long, n_frames: Long, sum_samples: Long)

  /** REAL audio decode — `javax.sound.sampled` (the WAV/AIFF/AU readers
    * ship with every JDK, like ImageIO's image readers): payload bytes →
    * PCM frames → exact sample sum. 16-bit signed PCM only (the planted
    * fixture's format and the overwhelmingly common raw-PCM case);
    * anything else refuses loudly with the asset id. */
  def decodeWavStats(assetId: Long, payload: Array[Byte]): AudioStats = {
    require(payload != null && payload.nonEmpty,
      s"asset $assetId: empty payload is not a decodable audio stream")
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"asset $assetId: no JDK reader for the payload bytes " +
              "(not a WAV/AIFF/AU stream)", e)
      }
    try {
      val f = in.getFormat
      require(f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16,
        s"asset $assetId: expected 16-bit signed PCM, got $f")
      val bytes = in.readAllBytes()
      // refuse-loudly discipline (the decodeFrames contract): a trailing
      // odd byte or a torn multi-channel frame must not pass as a shorter
      // valid clip
      require(bytes.length % (2 * f.getChannels) == 0,
        s"asset $assetId: truncated PCM stream — ${bytes.length} bytes is " +
          s"not a whole number of ${f.getChannels}-channel 16-bit frames")
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var n = 0L
      while (bb.remaining() >= 2) { sum += bb.getShort(); n += 1 }
      AudioStats(assetId, f.getSampleRate.toLong, f.getChannels.toLong,
        n / f.getChannels, sum)
    } finally in.close()
  }

  /** Lossless 16-bit mono WAV encode — executor-side builder for planted
    * fixtures. */
  def encodeWav(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRateHz.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The decode → stats stage over real WAV payloads — partition-local,
    * batched, zero shuffle (the [[imageStats]] shape). */
  def audioStats(assets: Dataset[Asset]): Dataset[AudioStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(a => decodeWavStats(a.asset_id, a.payload))
      }
    }
  }

  /** Planted REAL-audio fixture: one mono 16-bit 8 kHz WAV per document,
    * frame count and every sample a pure function of doc_id —
    *   n = 20 + id%16,  sample(i) = (id·37 + i·11) % 4001 − 2000
    * — so an oracle recomputes the decoded sample sum from the
    * arithmetic alone. Encoding happens ON EXECUTORS in a narrow typed
    * map. */
  def plantedAudioAssets(docs: DataFrame, idCol: String): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val n = (20 + id % 16).toInt
      val samples = Array.tabulate(n)(i =>
        ((id * 37 + i.toLong * 11) % 4001 - 2000).toShort)
      Asset(id, "audio", encodeWav(8000, samples),
        AssetMeta("audio/wav", 0, 0, 1, 8000, n * 1000L / 8000))
    }
  }

  // ------------------------------------------------------- real video path

  /** Length-prefixed frame container: `GVID` magic, BE frame count, then
    * per frame a BE byte length + the frame's PNG bytes. A real pipeline
    * demuxes MP4/WebM OUTSIDE the JVM (the JDK ships no video codec) into
    * exactly this shape — a byte stream of independently-decodable
    * frames — so the engine-side contract (container parse → frame
    * sample → per-frame REAL image decode → aggregate) is what this
    * implements and the gate checks. */
  def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeBytes("GVID")
    d.writeInt(frames.length)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    out.toByteArray
  }

  /** Parse the frame container back into per-frame payloads — refuses
    * loudly on a bad magic or a truncated stream (a silently-short frame
    * list would under-sample every downstream feature). */
  def decodeFrames(assetId: Long, payload: Array[Byte])
      : IndexedSeq[Array[Byte]] = {
    require(payload != null && payload.length >= 8 &&
        payload(0) == 'G' && payload(1) == 'V' && payload(2) == 'I' &&
        payload(3) == 'D',
      s"asset $assetId: payload is not a GVID frame container")
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(payload, 4, payload.length - 4))
    val n = d.readInt()
    require(n >= 0, s"asset $assetId: negative frame count $n")
    (0 until n).map { k =>
      val len = d.readInt()
      require(len >= 0, s"asset $assetId: negative frame length at frame $k")
      val f = new Array[Byte](len)
      d.readFully(f) // EOFException names a truncated container
      f
    }
  }

  /** Per-video frame-sampled statistics: total frames, frames sampled
    * (every `everyNth`, from frame 0), and the channel sums of the
    * SAMPLED frames summed — each sampled frame decoded through the real
    * image codec ([[decodeImageStats]]). */
  final case class VideoStats(asset_id: Long, n_frames: Long,
      n_sampled: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** The demux → sample → decode → aggregate stage: partition-local,
    * batched, zero shuffle (each executor decodes its own splits; only
    * every `everyNth` frame pays the codec — the frame-sampling economics
    * a 100 TB video corpus needs). */
  def videoFrameStats(assets: Dataset[Asset], everyNth: Int)
      : Dataset[VideoStats] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { a =>
          val frames = decodeFrames(a.asset_id, a.payload)
          var (sr, sg, sb, ns) = (0L, 0L, 0L, 0L)
          var k = 0
          while (k < frames.length) {
            if (k % everyNth == 0) {
              val st = decodeImageStats(a.asset_id, frames(k))
              sr += st.sum_r; sg += st.sum_g; sb += st.sum_b
              ns += 1
            }
            k += 1
          }
          VideoStats(a.asset_id, frames.length.toLong, ns, sr, sg, sb)
        }
      }
    }
  }

  /** Planted REAL-video fixture: per document, `2 + id%3` PNG frames;
    * frame k has w = 2+((id+k)%3), h = 1+((id+k)%2) and pixels
    * r = (id+k+x)%256, g = (id+k+y)%256, b = (id+k+x·y)%256 — the
    * [[plantedImageAssets]] arithmetic with the frame index folded in,
    * so the oracle recomputes sampled-frame sums from pure arithmetic. */
  def plantedVideoAssets(docs: DataFrame, idCol: String): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val nF = (2 + id % 3).toInt
      val frames = (0 until nF).map { k =>
        val w = (2 + (id + k) % 3).toInt
        val h = (1 + (id + k) % 2).toInt
        encodePng(w, h, (x, y) =>
          ((((id + k + x) % 256).toInt << 16) |
            (((id + k + y) % 256).toInt << 8) |
            ((id + k + x.toLong * y) % 256).toInt))
      }
      val payload = encodeFrames(frames)
      Asset(id, "video", payload, AssetMeta("video/gvid", 0, 0, 3, 0, 0L))
    }
  }

  // -------------------------------------------------- real AVI-MJPEG path

  /** Minimal but REAL RIFF/AVI writer — fourcc `MJPG`, one video stream,
    * every frame an independent JPEG in a `00dc` chunk, `idx1` keyframe
    * index. This is the public container the r14 `GVID` house format
    * stood in for: MJPEG-in-AVI is exactly "a byte stream of
    * independently-decodable frames", and the JDK's own ImageIO JPEG
    * reader decodes each frame — so from container bytes to per-frame
    * pixels the whole path is real with zero external codecs. Layout per
    * the public AVI spec: RIFF('AVI ') → LIST(hdrl: avih + LIST(strl:
    * strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) → LIST(movi: 00dc…) →
    * idx1; all sizes little-endian, chunks even-padded. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(fps >= 1, s"fps must be >= 1, got $fps")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def fourcc(s: String): Array[Byte] = {
      require(s.length == 4, s"fourcc must be 4 bytes: '$s'")
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(fourcc(id)); b.write(le32(body.length)); b.write(body)
      if (body.length % 2 == 1) b.write(0) // RIFF chunks are even-aligned
      b.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(fourcc("LIST")); b.write(le32(body.length + 4))
      b.write(fourcc(listType)); b.write(body)
      b.toByteArray
    }
    def concat(parts: Array[Byte]*): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      parts.foreach(b.write)
      b.toByteArray
    }
    val maxBytes = (frames.map(_.length) :+ 0).max
    // MainAVIHeader (avih, 56 bytes)
    val avih = chunk("avih", concat(
      le32(1000000 / fps), le32(maxBytes * fps), le32(0),
      le32(0x10), // AVIF_HASINDEX
      le32(frames.length), le32(0), le32(1), le32(maxBytes),
      le32(width), le32(height), le32(0), le32(0), le32(0), le32(0)))
    // AVIStreamHeader (strh, 56 bytes): vids/MJPG, rate/scale = fps
    val strh = chunk("strh", concat(
      fourcc("vids"), fourcc("MJPG"), le32(0), le32(0), le32(0),
      le32(1), le32(fps), le32(0), le32(frames.length), le32(maxBytes),
      le32(-1), le32(0),
      // rcFrame: four 16-bit shorts (left, top, right, bottom)
      Array[Byte](0, 0, 0, 0), le32(width & 0xffff | (height << 16))))
    // BITMAPINFOHEADER (strf, 40 bytes), biCompression = 'MJPG'
    val strf = chunk("strf", concat(
      le32(40), le32(width), le32(height), le32(1 | (24 << 16)),
      fourcc("MJPG"), le32(width * height * 3), le32(0), le32(0),
      le32(0), le32(0)))
    val hdrl = list("hdrl", concat(avih, list("strl", concat(strh, strf))))
    val moviBody = new java.io.ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4 // offset from 'movi' fourcc start
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx = new java.io.ByteArrayOutputStream()
    frames.zip(offsets).foreach { case (f, off) =>
      idx.write(fourcc("00dc")); idx.write(le32(0x10)) // AVIIF_KEYFRAME
      idx.write(le32(off)); idx.write(le32(f.length))
    }
    val riffBody = concat(fourcc("AVI "), hdrl, movi,
      chunk("idx1", idx.toByteArray))
    out.write(fourcc("RIFF")); out.write(le32(riffBody.length))
    out.write(riffBody)
    out.toByteArray
  }

  /** DEMUX a RIFF/AVI stream into its video frame payloads — the real
    * public-container replacement for [[decodeFrames]]'s `GVID` parse:
    * validates the RIFF/'AVI ' magic, walks the chunk tree to LIST(movi),
    * extracts every `??dc`/`??db` frame chunk, and cross-checks the
    * count against the avih header's dwTotalFrames. Refuses loudly on a
    * bad magic, a chunk overrunning its parent, or a frame-count
    * mismatch — a silently-short frame list would under-sample every
    * downstream feature (the [[decodeFrames]] discipline). */
  def decodeAviFrames(assetId: Long, payload: Array[Byte])
      : IndexedSeq[Array[Byte]] = {
    require(payload != null && payload.length >= 12,
      s"asset $assetId: payload too short for a RIFF header")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(fourcc() == "RIFF",
      s"asset $assetId: payload is not a RIFF stream")
    val riffSize = bb.getInt
    require(riffSize >= 4 && 8L + riffSize <= payload.length,
      s"asset $assetId: truncated RIFF — declared ${riffSize} bytes, " +
        s"container holds ${payload.length - 8}")
    require(fourcc() == "AVI ",
      s"asset $assetId: RIFF form is not 'AVI '")
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    var declaredFrames = -1
    // walk one chunk level within [start, end); recurse into LISTs
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        bb.position(pos)
        val id = fourcc()
        val sz = bb.getInt
        require(sz >= 0 && pos + 8 + sz <= end,
          s"asset $assetId: chunk '$id' at $pos overruns its parent " +
            s"(size $sz, parent ends $end) — truncated or corrupt AVI")
        if (id == "LIST") {
          val listType = fourcc()
          if (listType == "hdrl" || listType == "movi" ||
              listType == "strl")
            walk(pos + 12, pos + 8 + sz)
        } else if (id == "avih") {
          require(sz >= 24,
            s"asset $assetId: avih header too short ($sz bytes)")
          bb.position(pos + 8 + 16) // dwTotalFrames is the 5th dword
          declaredFrames = bb.getInt
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))
            && id.take(2).forall(_.isDigit)) {
          val f = new Array[Byte](sz)
          bb.position(pos + 8); bb.get(f)
          frames += f
        }
        pos += 8 + sz + (sz % 2) // even padding
      }
    }
    walk(12, 8 + riffSize)
    val out = frames.result()
    require(declaredFrames >= 0,
      s"asset $assetId: no avih header — not a playable AVI")
    require(out.length == declaredFrames,
      s"asset $assetId: avih declares $declaredFrames frames, movi " +
        s"holds ${out.length} — truncated or corrupt AVI")
    out
  }

  /** Lossy-codec-safe per-video statistics over a REAL AVI-MJPEG
    * container: total frames, frames sampled (every `everyNth`, from
    * frame 0), and the summed DIMENSIONS of the sampled frames — each
    * sampled frame demuxed by [[decodeAviFrames]] and decoded through
    * the real ImageIO JPEG codec. Dimensions (not pixel sums) are the
    * deterministic observable here: JPEG is lossy and pixel values are
    * decoder-implementation-defined, but the decoded geometry is exact —
    * so the oracle recomputes every output from construction arithmetic
    * while the engine still runs the full demux → sample → decode path.
    * (Exact pixel-sum verification lives on the lossless PNG container
    * row, [[videoFrameStats]].) */
  final case class AviStats(asset_id: Long, n_frames: Long,
      n_sampled: Long, sum_w: Long, sum_h: Long)

  def aviFrameStats(assets: Dataset[Asset], everyNth: Int)
      : Dataset[AviStats] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { a =>
          val frames = decodeAviFrames(a.asset_id, a.payload)
          var (sw, sh, ns) = (0L, 0L, 0L)
          var k = 0
          while (k < frames.length) {
            if (k % everyNth == 0) {
              val img = readImageInMemory(frames(k))
              require(img != null,
                s"asset ${a.asset_id}: frame $k is not a decodable image")
              sw += img.getWidth; sh += img.getHeight
              ns += 1
            }
            k += 1
          }
          AviStats(a.asset_id, frames.length.toLong, ns, sw, sh)
        }
      }
    }
  }

  /** JPEG encode of a pixel function — executor-side builder for planted
    * AVI-MJPEG fixtures (dims are exact through the lossy codec; pixel
    * values are not, see [[aviFrameStats]]). */
  def encodeJpeg(width: Int, height: Int, rgb: (Int, Int) => Int)
      : Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, "jpg", ios) finally ios.close()
    out.toByteArray
  }

  /** Planted REAL AVI-MJPEG fixture: per document, `2 + id%3` JPEG
    * frames; frame k is (4 + (id+k)%5) × (3 + (id+k)%4) with a
    * deterministic gradient — the oracle recomputes n_frames/n_sampled/
    * dimension sums from the arithmetic alone. Container bytes built ON
    * EXECUTORS through the real RIFF writer. */
  def plantedAviAssets(docs: DataFrame, idCol: String): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val nF = (2 + id % 3).toInt
      val frames = (0 until nF).map { k =>
        val w = (4 + (id + k) % 5).toInt
        val h = (3 + (id + k) % 4).toInt
        encodeJpeg(w, h, (x, y) =>
          ((((id + k + x) % 256).toInt << 16) |
            (((id + k + y) % 256).toInt << 8) |
            ((id + k) % 256).toInt))
      }
      // header dims = frame-0 dims (MJPEG allows per-frame dims; the
      // header carries the nominal geometry)
      val payload = encodeAviMjpeg(frames, (4 + id % 5).toInt,
        (3 + id % 4).toInt)
      Asset(id, "video", payload, AssetMeta("video/x-msvideo",
        (4 + id % 5).toInt, (3 + id % 4).toInt, 3, 0, nF * 100L))
    }
  }

  /** Fake-asset builder: documents → image-kind assets whose payload is the
    * UTF-8 text bytes (deterministic stand-in corpus for the binary path). */
  def assetsFromDocuments(docs: DataFrame, idCol: String, textCol: String): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
        col(idCol).cast("long").as("asset_id"),
        lit("image").as("kind"),
        col(textCol).cast("binary").as("payload"),
        struct(
          lit("fake/raw").as("format"),
          length(col(textCol)).cast("int").as("width"),
          lit(1).as("height"),
          lit(1).as("channels"),
          lit(0).as("sampleRateHz"),
          lit(0L).as("durationMs")).as("meta"))
      .as[Asset]
  }
}
