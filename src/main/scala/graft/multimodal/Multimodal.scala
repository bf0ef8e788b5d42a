package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * addition): image/audio/video as opaque `binary` payload columns with a
  * typed metadata struct, processed per-partition in fixed-size batches —
  * the Scala/Dataset rendition of a `mapInPandas` decode stage.
  *
  * The IMAGE decode is REAL — [[decodeImageStats]] via the JDK's
  * built-in `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with every
  * JRE), gate-checked over planted in-query PNGs whose pixel sums the
  * oracle recomputes from the construction arithmetic. Audio/video
  * decode stays STUBBED (the JDK ships no codecs for them — see
  * [[decodeImageStub]]/[[frameSampleStub]]): a deterministic pure
  * function of the payload bytes, so every downstream feature is
  * reproducible and oracle-checkable either way. The Spark-side
  * contract is real and tested:
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
  // pure-CPU decode stage must not pay executor-local disk IO per image
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode — `javax.imageio.ImageIO`, which ships PNG/BMP/
    * GIF/JPEG readers with every JDK (no external codec): payload bytes →
    * pixels → per-channel sums. This replaces the round-≤13 stub for the
    * image kind (audio/video stay stubbed: the JDK ships no codecs for
    * them). Undecodable bytes refuse loudly with the asset id — a silent
    * zero row would claim "decoded, empty image" for a corrupt payload. */
  def decodeImageStats(assetId: Long, payload: Array[Byte]): ImageStats = {
    require(payload != null && payload.nonEmpty,
      s"asset $assetId: empty payload is not a decodable image")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
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
    javax.imageio.ImageIO.write(img, "png", out)
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
