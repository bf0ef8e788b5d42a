package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * addition): image/audio/video as opaque `binary` payload columns with a
  * typed metadata struct, processed per-partition in fixed-size batches —
  * the Scala/Dataset rendition of a `mapInPandas` decode stage.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs — see [[decodeImageStub]]): it is a deterministic pure function of
  * the payload bytes, so every downstream feature is reproducible and
  * oracle-checkable. The Spark-side contract is real and tested:
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
