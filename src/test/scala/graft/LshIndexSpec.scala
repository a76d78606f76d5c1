package graft

import graft.ops.MinHashLsh
import graft.streaming.StatefulLww.Delta
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming LSH index maintenance (MinHashLsh.indexDeltaStream):
  * candidate-pair support deltas under document arrival, revision
  * (bucket moves), and deletion — the dynamics q118's single-batch
  * log replay cannot exercise.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) =
    s"""{"doc_id":$id,"text":"$text"}"""

  // three clearly-separable texts: A≈B near-dup, C unrelated; every
  // text is > 3 tokens so shingling engages
  private val tA = "the quick brown fox jumps over the lazy dog tonight"
  private val tB = "the quick brown fox jumps over the lazy dog today"
  private val tC = "completely different content about spark incremental index maintenance"
  // C revised INTO A's neighborhood
  private val tC2 = "the quick brown fox jumps over the lazy dog tomorrow"

  test("index deltas track arrival, revision into/out of a neighborhood, and deletion") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Delta]
    val q = MinHashLsh.indexDeltaStream(in.toDF()).writeStream
      .format("memory").queryName("lsh_idx").outputMode("append").start()

    def live(): Set[(Long, Long)] =
      MinHashLsh.livePairs(spark.table("lsh_idx"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    try {
      // batch 1: A, B, C arrive — only (A,B) are near-dups
      in.addData(
        Delta(1, "upsert", doc(1, tA), null),
        Delta(2, "upsert", doc(2, tB), null),
        Delta(3, "upsert", doc(3, tC), null))
      q.processAllAvailable()
      assert(live() == Set((1L, 2L)), "arrival: A-B share buckets, C does not")

      // batch 2: C revised INTO the A/B neighborhood — pairs appear for
      // C against both without touching A or B's state
      in.addData(Delta(3, "upsert", doc(3, tC2), doc(3, tC)))
      q.processAllAvailable()
      assert(live() == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        "revision moves C's bucket rows into the neighborhood")

      // batch 3: B deleted — every pair with B retracts, A-C remains
      in.addData(Delta(2, "delete", null, doc(2, tB)))
      q.processAllAvailable()
      assert(live() == Set((1L, 3L)), "deletion retracts B's pairs")

      // batch 4: C revised back OUT — support drains to zero
      in.addData(Delta(3, "upsert", doc(3, tC), doc(3, tC2)))
      q.processAllAvailable()
      assert(live() == Set.empty, "revision away retracts the last pairs")

      // bucket state is live-membership-bounded: two live docs (A, C)
      // hold at most bands buckets each — history (B's arrival and
      // departure, C's two revisions) leaves no residue
      val stateRows = q.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows <= 2 * 16,
        s"bucket state must be bounded by bands x live docs, got $stateRows")
    } finally q.stop()
  }

  test("a no-op revision (same text) emits nothing") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Delta]
    val q = MinHashLsh.indexDeltaStream(in.toDF()).writeStream
      .format("memory").queryName("lsh_idx_noop").outputMode("append").start()
    try {
      in.addData(
        Delta(1, "upsert", doc(1, tA), null),
        Delta(2, "upsert", doc(2, tB), null))
      q.processAllAvailable()
      val n0 = spark.table("lsh_idx_noop").count()
      in.addData(Delta(1, "upsert", doc(1, tA), doc(1, tA)))
      q.processAllAvailable()
      assert(spark.table("lsh_idx_noop").count() == n0,
        "same-text revision nets to zero in every bucket")
    } finally q.stop()
  }

  test("maxBucket: a bucket crossing the cap retracts its pairs and stays dark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Delta]
    val q = MinHashLsh.indexDeltaStream(in.toDF(), maxBucket = 2).writeStream
      .format("memory").queryName("lsh_idx_cap").outputMode("append").start()
    def live(): Set[(Long, Long)] =
      MinHashLsh.livePairs(spark.table("lsh_idx_cap"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // two near-identical docs: pairs granted normally
      in.addData(
        Delta(1, "upsert", doc(1, tA), null),
        Delta(2, "upsert", doc(2, tA), null))
      q.processAllAvailable()
      assert(live() == Set((1L, 2L)))
      // a third copy pushes every shared bucket past the cap: the
      // boilerplate buckets retract what they granted — the ± ledger
      // nets to zero, nothing is left dangling
      in.addData(Delta(3, "upsert", doc(3, tA), null))
      q.processAllAvailable()
      assert(live() == Set.empty,
        "overflowed buckets must retract granted pairs, not strand them")
      // sticky: shrinking back under the cap grants nothing new
      in.addData(Delta(3, "delete", null, doc(3, tA)))
      q.processAllAvailable()
      assert(live() == Set.empty, "overflow is sticky")
    } finally q.stop()
  }

  test("compactSigned preserves the livePairs fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pairlog_").toString
    // batch 0: pair (1,2) gains two buckets; batch 1: loses one, (1,3) gains one
    Seq((1L, 2L, 1), (1L, 2L, 1)).toDF("id_a", "id_b", "delta")
      .write.parquet(s"$dir/batch_id=0")
    Seq((1L, 2L, -1), (1L, 3L, 1)).toDF("id_a", "id_b", "delta")
      .write.parquet(s"$dir/batch_id=1")
    val out = java.nio.file.Files.createTempDirectory("graft_pairlog_c_").toString
    graft.cdc.DeltaLog.compactSigned(spark, dir, out, "delta")
    def fold(d: String) = MinHashLsh.livePairs(spark.read.parquet(d))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fold(out) == fold(dir) && fold(out) == Set((1L, 2L, 1L), (1L, 3L, 1L)))
    // compacted log holds only net rows, one batch
    assert(spark.read.parquet(out).count() == 2)
  }

  test("streaming fold equals the batch banding on the final corpus") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Delta]
    val q = MinHashLsh.indexDeltaStream(in.toDF()).writeStream
      .format("memory").queryName("lsh_idx_eq").outputMode("append").start()
    try {
      in.addData(
        Delta(1, "upsert", doc(1, tA), null),
        Delta(2, "upsert", doc(2, tB), null),
        Delta(3, "upsert", doc(3, tC), null))
      q.processAllAvailable()
      in.addData(Delta(3, "upsert", doc(3, tC2), doc(3, tC)),
        Delta(4, "upsert", doc(4, tC), null))
      q.processAllAvailable()

      val streamed = MinHashLsh.livePairs(spark.table("lsh_idx_eq"))
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch reference: band the FINAL corpus, pair per shared bucket
      val corpus = Seq((1L, tA), (2L, tB), (3L, tC2), (4L, tC))
        .toDF("doc_id", "text")
      val banded = MinHashLsh.bandedRows(corpus, "doc_id", "text")
        .select(col("b"), col("v"), col("id"))
      val batch = banded.as("x").join(banded.as("y"),
          col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
            col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        "incremental maintenance must land on the batch index of the final state")
    } finally q.stop()
  }
}
