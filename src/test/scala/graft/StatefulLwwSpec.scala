package graft

import graft.streaming.StatefulLww
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Incremental LWW deltas: only changed winners emit, duplicates and
  * stale events are absorbed by state, deletes emit once.
  */
class StatefulLwwSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(key: Long, ts_ms: Long, offset: Long, op: String, after: String)

  test("flatMapGroupsWithState emits one delta per changed winner per batch") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = "stateful_lww_out"
    val q = StatefulLww.deltaStream(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    def deltasAfter(batch: Seq[Ev]): Seq[(Long, String, String, String)] = {
      val before = spark.table(name).count()
      mem.addData(batch: _*); q.processAllAvailable()
      spark.table(name).as[(Long, String, String, String)].collect()
        .drop(before.toInt).toSeq
    }

    // batch 1: two inserts — no previous row
    val d1 = deltasAfter(Seq(
      Ev(1, 10, 1, "c", """{"v":"a"}"""), Ev(2, 10, 2, "c", """{"v":"b"}""")))
    assert(d1.toSet == Set((1L, "upsert", """{"v":"a"}""", null),
      (2L, "upsert", """{"v":"b"}""", null)))

    // batch 2: update key 1 (prev carries the OLD row — what an
    // incremental aggregate retracts), STALE event for key 2, dup
    val d2 = deltasAfter(Seq(
      Ev(1, 20, 3, "u", """{"v":"a2"}"""),
      Ev(1, 20, 3, "u", """{"v":"a2"}"""),
      Ev(2, 5, 4, "u", """{"v":"stale"}""")))
    assert(d2 == Seq((1L, "upsert", """{"v":"a2"}""", """{"v":"a"}""")))

    // batch 3: delete key 1 (prev = the deleted row); re-delivery absorbed
    val d3 = deltasAfter(Seq(Ev(1, 30, 5, "d", null)))
    assert(d3 == Seq((1L, "delete", null, """{"v":"a2"}""")))
    val d4 = deltasAfter(Seq(Ev(1, 30, 5, "d", null)))
    assert(d4.isEmpty)

    q.stop()
  }

  test("RocksDB state store provider: identical LWW deltas (production state config)") {
    // the 10^9-key production config — off-heap, incrementally
    // checkpointed state; same semantics as the default HDFS-backed
    // store must hold under a provider swap
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val name = "stateful_lww_rocksdb_out"
      val q = StatefulLww.deltaStream(mem.toDF()).writeStream
        .format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      mem.addData(Ev(1, 10, 1, "c", """{"v":"a"}"""), Ev(2, 10, 2, "c", """{"v":"b"}"""))
      q.processAllAvailable()
      mem.addData(Ev(1, 20, 3, "u", """{"v":"a2"}"""), Ev(2, 5, 4, "u", """{"v":"stale"}"""))
      q.processAllAvailable()
      mem.addData(Ev(1, 30, 5, "d", null))
      q.processAllAvailable()
      val all = spark.table(name).as[(Long, String, String, String)]
        .collect().toSeq.map(d => (d._1, d._2, d._3))
      q.stop()
      assert(all.toSet == Set(
        (1L, "upsert", """{"v":"a"}"""), (2L, "upsert", """{"v":"b"}"""),
        (1L, "upsert", """{"v":"a2"}"""), (1L, "delete", null)))
      assert(all.size == 4, "stale/dup events must not emit under RocksDB either")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
