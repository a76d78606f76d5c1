package graft

import graft.ops.{Multimodal, VectorSearch}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: blob → frames/resize/meta/pseudo-embedding, and
  * the composition with similarity search (the training-pipeline loop).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001).limit(50)
  private lazy val withPayload = Multimodal.withBinaryPayload(docs)

  test("decodeMeta: one meta row per blob, deterministic byte-derived fields") {
    val meta = Multimodal.decodeMeta(spark, withPayload).collect()
    assert(meta.length == 50)
    meta.foreach { m =>
      assert(m.width == (m.n_bytes % 640 + 1).toInt)
      assert(m.n_bytes > 0 && m.width >= 1 && m.height >= 1)
    }
  }

  test("decodeImage parses REAL PNG/JPEG headers back from synthesized payloads") {
    val meta = Multimodal.decodeImageMeta(spark,
      Multimodal.imagePayloads(spark, docs)).collect()
    assert(meta.length == 50)
    meta.foreach { m =>
      // the dims come out of the container header via ImageIO, not from
      // arithmetic on the bytes — matching proves the encode+parse loop
      assert(m.width == (m.doc_id % 64 + 1).toInt, s"doc ${m.doc_id}")
      assert(m.height == (m.doc_id * 7 % 48 + 1).toInt, s"doc ${m.doc_id}")
      assert(m.format == (if (m.doc_id % 2 == 0) "png" else "jpeg"))
      assert(m.n_frames == 1)
      assert(m.n_bytes > 0)
    }
    // real container magics: PNG signature / JPEG SOI marker
    val raw = Multimodal.imagePayloads(spark, docs)
      .as[(Long, Array[Byte])].collect()
    raw.foreach { case (id, bytes) =>
      if (id % 2 == 0)
        assert(bytes.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G')))
      else
        assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
          s"doc $id not JPEG SOI")
    }
  }

  test("decodeImage degrades to unknown on unparseable payloads") {
    val junk = Multimodal.decodeImage(7L, Array[Byte](1, 2, 3, 4))
    assert(junk.format == "unknown" && junk.width == -1 && junk.n_frames == 0)
  }

  test("frameSample explodes blobs into strided fixed-size frames") {
    val frames = Multimodal.frameSample(spark, withPayload, frameSize = 64, stride = 4)
      .collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).forall(_ % 4 == 0))
      assert(fs.filterNot(f => f.frame_idx == fs.map(_.frame_idx).max)
        .forall(_.frame_bytes.length == 64))
    }
    // total frames = sum over docs of ceil(n_bytes/64) strided by 4
    val expected = withPayload.select(col("doc_id"), length(col("payload")).as("n"))
      .as[(Long, Int)].collect()
      .map { case (_, n) => (0 until (n + 63) / 64).count(_ % 4 == 0) }.sum
    assert(frames.length == expected)
  }

  test("resize shrinks payloads by the factor, preserving first byte") {
    val resized = Multimodal.resize(spark, withPayload, 4).collect()
    val orig = withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().toMap
    resized.foreach { r =>
      val o = orig(r.doc_id)
      assert(r.payload.length == (o.length + 3) / 4)
      assert(r.payload.head == o.head)
    }
  }

  test("pseudo-embeddings from blobs feed straight into similarity search") {
    val emb = withPayload.select(col("doc_id").as("vec_id"),
      Multimodal.fakeEmbedding(col("payload"), 16).as("embedding"))
    val knn = VectorSearch.knnExact(emb.filter(col("vec_id") < 3), emb, 2)
    val rows = knn.collect()
    assert(rows.length == 6) // 3 queries x top-2
    // embeddings are deterministic: same blob -> same vector -> cos(self)=1
    val self = VectorSearch.knnExact(emb.filter(col("vec_id") < 3), emb, 50)
    assert(self.count() > 0)
  }
}
