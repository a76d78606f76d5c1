package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling (mandate): image/audio/video payloads as
  * opaque `binary` columns with typed metadata alongside.
  *
  * IMAGES are decoded for real: `decodeImage` parses the container
  * header with the JDK's own codec stack (`javax.imageio.ImageIO` —
  * PNG/JPEG/GIF/BMP readers ship in every JRE, no external libraries),
  * and `synthesizeImage` produces genuine tiny PNG/JPEG payloads so the
  * round-trip is oracle-checkable (q89: dims are doc_id arithmetic on
  * both sides, but the value flows THROUGH a real encoder and a real
  * header parse). Only VIDEO/AUDIO remain stubbed (`fakeDecode`): this
  * container has no media demuxers, so that path derives deterministic
  * metadata from the bytes; swapping in a real codec means replacing
  * ONE function body — the mapPartitions batch shape, output schema,
  * and downstream grouping are the production plumbing either way.
  *
  * Decode runs via `mapPartitions` deliberately: real codecs amortize
  * per-partition init (native lib handles, thread-local buffers), which
  * per-row UDFs cannot. At scale, partition sizing bounds decoder memory:
  * payload bytes stream through one partition at a time.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, format: String)

  /** Deterministic tiny raster per doc — dims from doc_id arithmetic,
    * alternating PNG/JPEG containers, encoded by the JDK's ImageIO.
    * Pixel content is a reproducible function of (doc_id, x, y); only
    * the header matters to the decode path, but reproducible bytes keep
    * the fixture stable within a run.
    */
  def synthesizeImage(docId: Long): Array[Byte] = {
    val w = (docId % 64 + 1).toInt
    val h = (docId * 7 % 48 + 1).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((docId * 31 + x * 7 + y) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (docId % 2 == 0) "png" else "jpg", bos)
    bos.toByteArray
  }

  /** (doc_id, payload) with REAL image bytes per document — the fixture
    * column for the image-decode path.
    */
  def imagePayloads(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthesizeImage(id))))
      .toDF("doc_id", "payload")
  }

  /** REAL image decode: header-only parse through the JDK's ImageIO
    * reader registry — width/height/frame count come from the container
    * header without materializing pixel data (the cheap metadata scan a
    * 100 TB image corpus wants), format from the matched reader.
    * Unrecognized payloads degrade to ("unknown", -1×-1), not an
    * exception — one corrupt blob must not kill a partition.
    */
  def decodeImage(docId: Long, payload: Array[Byte]): MediaMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        MediaMeta(docId, payload.length.toLong, -1, -1, 0, "unknown")
      else {
        val r = readers.next()
        r.setInput(iis)
        try MediaMeta(docId, payload.length.toLong, r.getWidth(0), r.getHeight(0),
          r.getNumImages(true), r.getFormatName.toLowerCase(java.util.Locale.ROOT))
        finally r.dispose()
      }
    } catch {
      case _: java.io.IOException =>
        MediaMeta(docId, payload.length.toLong, -1, -1, 0, "unknown")
    } finally iis.close()
  }

  /** Per-partition REAL image decode — the de-stubbed [[decodeMeta]]. */
  def decodeImageMeta(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeImage(id, bytes) })
  }

  /** STUB decoder — deterministic fake, now standing in ONLY for the
    * media kinds this container cannot decode (video/audio demuxing);
    * images go through [[decodeImage]]. Real implementation would parse
    * the container header here.
    */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = (n % 640 + 1).toInt,
      height = (n * 7 % 480 + 1).toInt,
      n_frames = (docId % 30 + 1).toInt,
      format = if (n % 2 == 0) "png" else "jpeg")
  }

  /** Binary payload column + per-partition decode through the
    * VIDEO/AUDIO stub ([[fakeDecode]]). Input needs (doc_id: Long,
    * payload: Binary). Images: use [[decodeImageMeta]].
    */
  def decodeMeta(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs would init native handles once per partition here
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Documents → opaque binary payloads (utf-8 bytes stand in for media
    * blobs; establishes BinaryType flowing through project/filter/join).
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "utf-8"))

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: emit every `stride`-th fixed-size chunk of the
    * payload as its own row — the batch shape of video frame extraction
    * (1 blob in, N frames out, flatMap not map). STUB chunking stands in
    * for a container demuxer; the row-explosion plumbing, schema, and
    * per-partition iteration are the real thing.
    */
  def frameSample(spark: SparkSession, withPayload: DataFrame,
      frameSize: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          bytes.grouped(frameSize).zipWithIndex.collect {
            case (chunk, i) if i % stride == 0 => Frame(id, i, chunk)
          }
        }
      }
  }

  case class Resized(doc_id: Long, payload: Array[Byte])

  /** Resize: deterministic byte-domain downscale (every `factor`-th
    * byte) — STUB for an image resampler; binary-in/binary-out through
    * the same per-partition batch shape real resamplers need.
    */
  def resize(spark: SparkSession, withPayload: DataFrame, factor: Int): Dataset[Resized] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Resized(id, bytes.zipWithIndex.collect {
          case (b, i) if i % factor == 0 => b
        })
      })
  }

  /** Feature extraction: deterministic pseudo-embedding from payload
    * bytes (STUB for a vision encoder) — dim floats derived from
    * xxhash64 of (payload, i). Output plugs straight into
    * VectorSearch.knnIvf / nearDupPairs, closing the multimodal →
    * similarity-search loop.
    */
  def fakeEmbedding(payload: org.apache.spark.sql.Column, dim: Int = 16): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(2000L)).cast("float") - 1000f) / 1000f)
}
