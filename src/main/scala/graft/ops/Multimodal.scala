package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling (mandate): image/audio/video payloads as
  * opaque `binary` columns with typed metadata alongside.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batch
  * transform, metadata projection; only the codec itself is a STUB
  * (`fakeDecode`): this container has no image/audio libraries, so the
  * decode derives deterministic metadata from the bytes. Swapping in a
  * real codec means replacing ONE function body; everything around it
  * (the mapPartitions batch shape, the output schema, the downstream
  * grouping) is production plumbing.
  *
  * Decode runs via `mapPartitions` deliberately: real codecs amortize
  * per-partition init (native lib handles, thread-local buffers), which
  * per-row UDFs cannot. At scale, partition sizing bounds decoder memory:
  * payload bytes stream through one partition at a time.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, format: String)

  /** STUB decoder — deterministic fake in place of a real image codec.
    * Real implementation would parse the container header here.
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

  /** Binary payload column + per-partition decode. Input needs
    * (doc_id: Long, payload: Binary).
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
