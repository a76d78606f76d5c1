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
}
