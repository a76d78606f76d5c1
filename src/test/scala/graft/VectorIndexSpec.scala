package graft

import graft.ops.VectorSearch
import graft.streaming.StatefulLww.Delta
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** CDC-maintained IVF postings (VectorSearch.postingDeltas/livePostings):
  * stateless ± maintenance against a fixed quantizer, fold correctness
  * over multi-batch histories, and streaming parity.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  // 2-D quantizer with four axis-aligned cells: +x, −x, +y, −y
  private val cents: Array[Array[Float]] = Array(
    Array(1f, 0f), Array(-1f, 0f), Array(0f, 1f), Array(0f, -1f))

  private def vec(id: Long, x: Float, y: Float) =
    s"""{"vec_id":$id,"embedding":[$x,$y]}"""

  private def fold(deltas: Seq[Delta], seqs: Seq[Long]): Map[Long, (Int, Seq[Float])] = {
    val df = deltas.zip(seqs).map { case (d, s) => (d.key, d.action, d.rowJson, d.prevJson, s) }
      .toDF("key", "action", "rowJson", "prevJson", "seq")
    VectorSearch.livePostings(VectorSearch.postingDeltas(df, cents))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Float](2).toSeq))).toMap
  }

  test("posting fold: insert, cell-moving update, same-cell update, delete") {
    val live = fold(Seq(
      Delta(1, "upsert", vec(1, 0.9f, 0.1f), null),              // cell 0 (+x)
      Delta(2, "upsert", vec(2, 0.1f, 0.9f), null),              // cell 2 (+y)
      Delta(3, "upsert", vec(3, -0.8f, 0f), null),               // cell 1 (−x)
      // update MOVES vec 1 to −y; prev row gives the old cell statelessly
      Delta(1, "upsert", vec(1, 0f, -0.7f), vec(1, 0.9f, 0.1f)),
      // update KEEPS vec 2's cell but changes the vector — the (cell,
      // vec) net is 0, the + row must still win with the NEW embedding
      Delta(2, "upsert", vec(2, 0.2f, 0.8f), vec(2, 0.1f, 0.9f)),
      Delta(3, "delete", null, vec(3, -0.8f, 0f))),
      seqs = Seq(0, 0, 0, 1, 1, 1))
    assert(live == Map(
      1L -> ((3, Seq(0f, -0.7f))),
      2L -> ((2, Seq(0.2f, 0.8f)))))
  }

  test("a collapsed one-batch history folds to the same index") {
    val live = fold(Seq(
      Delta(1, "upsert", vec(1, 0f, -0.7f), vec(1, 0.9f, 0.1f)),
      Delta(2, "upsert", vec(2, 0.2f, 0.8f), vec(2, 0.1f, 0.9f)),
      Delta(3, "delete", null, vec(3, -0.8f, 0f))),
      seqs = Seq(0, 0, 0))
    assert(live == Map(
      1L -> ((3, Seq(0f, -0.7f))),
      2L -> ((2, Seq(0.2f, 0.8f)))))
  }

  test("compactPostings preserves the livePostings fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_postlog_").toString
    // vec 1 inserted then moved cells; vec 2 inserted then deleted
    Seq((1L, 0L, 1, 0, Seq(0.9f, 0.1f)), (2L, 0L, 1, 2, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "seq", "sgn", "cell", "emb")
      .write.parquet(s"$dir/batch_id=0")
    Seq((1L, 1L, -1, 0, Seq(0.9f, 0.1f)), (1L, 1L, 1, 3, Seq(0f, -0.7f)),
      (2L, 1L, -1, 2, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "seq", "sgn", "cell", "emb")
      .write.parquet(s"$dir/batch_id=1")
    val out = java.nio.file.Files.createTempDirectory("graft_postlog_c_").toString
    graft.cdc.DeltaLog.compactPostings(spark, dir, out)
    def fold(d: String) = VectorSearch.livePostings(spark.read.parquet(d))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq)).toSet
    assert(fold(out) == fold(dir) &&
      fold(out) == Set((1L, 3, Seq(0f, -0.7f))))
    assert(spark.read.parquet(out).count() == 1, "one + row per live posting")
  }

  test("streaming posting maintenance equals the batch fold (stateless map)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Delta]
    val q = VectorSearch.postingDeltas(in.toDF(), cents).writeStream
      .format("memory").queryName("ivf_postings").outputMode("append").start()
    try {
      in.addData(
        Delta(1, "upsert", vec(1, 0.9f, 0.1f), null),
        Delta(2, "upsert", vec(2, 0.1f, 0.9f), null))
      q.processAllAvailable()
      in.addData(Delta(1, "upsert", vec(1, 0f, -0.7f), vec(1, 0.9f, 0.1f)))
      q.processAllAvailable()
      // ± rows: an index server applying them in arrival order lands on
      // the batch fold's answer
      val rows = spark.table("ivf_postings")
        .select(col("vec_id"), col("sgn"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val applied = rows.foldLeft(Map.empty[(Long, Int), Int]) {
        case (m, (id, sgn, cell)) =>
          val k = (id, cell)
          val n = m.getOrElse(k, 0) + sgn
          if (n == 0) m - k else m.updated(k, n)
      }
      assert(applied == Map((1L, 3) -> 1, (2L, 2) -> 1),
        "applying the +/- stream leaves exactly the live postings")
    } finally q.stop()
  }

  test("adaptiveProbes: clamps to [baseProbe, nCells], monotone in selectivity, restatable integer arithmetic") {
    import graft.ops.VectorSearch.adaptiveProbes
    // broad filter: the base operating point
    assert(adaptiveProbes(16, 4, 5, allowedN = 100000L) == 4)
    // the formula: ceil(8k * nCells / allowedN) between the clamps
    assert(adaptiveProbes(16, 4, 5, allowedN = 100L) == 7) // ceil(640/100)
    assert(adaptiveProbes(16, 4, 5, allowedN = 64L) == 10) // 640/64 exact
    // sharp filter saturates at nCells — the exact scan of the sliver
    assert(adaptiveProbes(16, 4, 5, allowedN = 30L) == 16)
    assert(adaptiveProbes(16, 4, 5, allowedN = 0L) == 16)
    // monotone: a sharper filter never probes fewer cells
    val widths = Seq(100000L, 5000L, 640L, 200L, 100L, 50L, 10L, 1L)
      .map(adaptiveProbes(16, 4, 5, _))
    assert(widths == widths.sorted, s"monotone widening, got $widths")
  }
}
