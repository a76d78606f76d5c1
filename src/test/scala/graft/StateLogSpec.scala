package graft

import graft.streaming.StateLog
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/** Append-only state log: per-batch append, replay-guarded reads, and
  * base-generation compaction with retention.
  */
class StateLogSpec extends SparkSpec {
  import spark.implicits._

  private val logSchema =
    StructType.fromDDL("k BIGINT, d BIGINT, batch_id BIGINT")
  private val baseSchema = StructType.fromDDL("k BIGINT, d BIGINT")

  private def fold(base: String, currentBatch: Long): Map[Long, Long] = {
    val b = StateLog.readBase(spark, base, baseSchema)
    val l = StateLog.readLog(spark, base, logSchema, currentBatch)
      .select("k", "d")
    b.unionByName(l).groupBy("k").sum("d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("reads exclude the batch being computed and everything folded into the base") {
    val base = Files.createTempDirectory("graft_statelog_").toString
    StateLog.appendBatch(Seq((1L, 10L)).toDF("k", "d"), base, 0)
    StateLog.appendBatch(Seq((1L, 5L), (2L, 7L)).toDF("k", "d"), base, 1)
    StateLog.appendBatch(Seq((2L, 1L)).toDF("k", "d"), base, 2)

    // batch 2's own view: batches 0..1 only — ITS dir is invisible, so
    // a crash-replay of batch 2 recomputes against what it first saw
    assert(fold(base, 2) == Map(1L -> 15L, 2L -> 7L))
    assert(fold(base, 3) == Map(1L -> 15L, 2L -> 8L))

    // compact through batch 1: fold-to-1 becomes the base, dirs pruned
    StateLog.compact(Seq((1L, 15L), (2L, 7L)).toDF("k", "d"), base, upTo = 1)
    assert(StateLog.logBatchCount(base) == 1, "folded-in dirs must be pruned")
    assert(StateLog.pointer(base).upTo == 1)
    // the fold is unchanged after compaction — base + remaining log
    assert(fold(base, 3) == Map(1L -> 15L, 2L -> 8L))
    // and a replay of batch 2 still sees exactly the pre-2 state
    assert(fold(base, 2) == Map(1L -> 15L, 2L -> 7L))
  }

  test("a second compaction supersedes the first and retention prunes old generations") {
    val base = Files.createTempDirectory("graft_statelog2_").toString
    StateLog.appendBatch(Seq((1L, 1L)).toDF("k", "d"), base, 0)
    StateLog.compact(Seq((1L, 1L)).toDF("k", "d"), base, upTo = 0)
    StateLog.appendBatch(Seq((1L, 2L)).toDF("k", "d"), base, 1)
    StateLog.compact(Seq((1L, 3L)).toDF("k", "d"), base, upTo = 1, keepGens = 1)
    assert(StateLog.pointer(base) == StateLog.Pointer(Some("gen_1"), 1))
    assert(!new java.io.File(s"$base/base/gen_0").exists(),
      "keepGens=1 must prune the superseded generation")
    assert(fold(base, 10) == Map(1L -> 3L))
  }
}
