package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Streaming semantics the single-batch replay can't reach: session-gap
  * boundary behavior, cross-batch dedup state, and watermark late-data
  * drops with controlled per-batch input.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def runBatches[T <: Product : org.apache.spark.sql.Encoder](
      batches: Seq[Seq[T]])(f: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[T]
    val name = s"mem_${System.identityHashCode(mem)}"
    val q = f(mem.toDF()).writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("session window: gap exactly equal to timeout MERGES; beyond splits") {
    // pin fixture from FIXTURES.md §4: events exactly 30 minutes apart
    // merge (Spark breaks only on strictly-greater gaps); 30min+1s splits
    val rows = Seq((1L, ts(0)), (1L, ts(30)),
      (2L, ts(0)), (2L, new Timestamp(30 * 60000L + 1000L)))
      .toDF("user_id", "ts")
    val sessions = rows
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").cast("long").as("start_s"),
        col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(sessions == Set((1L, 0L, 2L), (2L, 0L, 1L), (2L, 30L * 60 + 1, 1L)))
  }

  test("streaming dedup holds state across micro-batches") {
    val out = runBatches(Seq(
      Seq((1L, ts(1)), (2L, ts(2))),
      Seq((1L, ts(1)), (3L, ts(3))))) { df => // event 1 re-delivered in batch 2
      df.toDF("event_id", "ts")
        .withWatermark("ts", "60 minutes")
        .dropDuplicates("event_id")
    }
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("watermark drops events later than the delay behind max ts") {
    val out = runBatches(Seq(
      Seq((1L, ts(100))),          // watermark advances to 90
      Seq((2L, ts(50)), (3L, ts(95))))) { df => // 50 is late, 95 within delay
      df.toDF("event_id", "ts")
        .withWatermark("ts", "10 minutes")
        .dropDuplicates("event_id")
    }
    val ids = out.select("event_id").as[Long].collect().toSet
    assert(ids.contains(1L) && ids.contains(3L))
    assert(!ids.contains(2L), "event 20 min late beyond 10-min watermark must drop")
  }

  test("outer stream-stream join: null rows emit ONLY after the watermark passes eviction") {
    // unmatched purchases at ts=10 and ts=200; join window 60min,
    // watermark delay 10min → state eviction at ts+70. A heartbeat at
    // ts=250 on BOTH sides (the join watermark is the min) moves the
    // watermark to 240: row 1 (evict 80) emits its null row, row 2
    // (evict 270) is still held — exactly the tail the q97 flush
    // sentinel exists to release.
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[(Long, Timestamp, Long)]
    val right = MemoryStream[(Long, Timestamp, Long)]
    val l = left.toDF().toDF("user_id", "p_ts", "buy_event")
      .withWatermark("p_ts", "10 minutes")
    val r = right.toDF().toDF("e_user", "e_ts", "err_event")
      .withWatermark("e_ts", "10 minutes")
    val joined = l.join(r,
      col("user_id") === col("e_user")
        && col("e_ts") > col("p_ts")
        && col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
    val name = "outer_join_evict"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: two unmatched purchases
    left.addData((1L, ts(10), 101L), (2L, ts(200), 102L))
    right.addData((99L, ts(10), 901L)) // keeps right watermark moving
    q.processAllAvailable()
    val afterB1 = spark.table(name).count()
    // batch 2: heartbeats on BOTH sides to ts=250 → join watermark 240,
    // row 1 evicts (10 + 60 + 10 = 80 < 240), row 2 stays (270 > 240)
    left.addData((98L, ts(250), 103L))
    right.addData((99L, ts(250), 902L))
    q.processAllAvailable()
    val afterB2 = spark.table(name)
      .filter(col("user_id") === 1L || col("user_id") === 2L)
      .select(col("user_id"), col("err_event")).as[(Long, Option[Long])]
      .collect().toSet
    q.stop()
    assert(afterB1 == 0, "no null rows before the watermark passes eviction")
    assert(afterB2 == Set((1L, None)),
      "row 1 evicted and emitted with nulls; row 2 still held in state")
  }

  test("quality gate over a stream: stateless map per batch, verdicts equal batch semantics") {
    // q71's gate is stateless — each doc's verdict must not depend on
    // batch boundaries; run the same docs split across 2 batches and
    // whole, and compare
    val docs = Seq(
      (1L, (0 until 30).map(i => s"w$i").mkString(" ")),
      (2L, "tiny doc"),
      (3L, Seq.fill(40)("x").mkString(" ")),
      (4L, (0 until 25).map(i => s"v$i").mkString(" ")))
    val split = runBatches(Seq(docs.take(2), docs.drop(2))) { df =>
      graft.ops.TextAnalysis.qualityFilter(df.toDF("doc_id", "text"), "text", 25, 30)
        .select(col("doc_id"), col("reason"), col("keep"))
    }.as[(Long, String, Boolean)].collect().toSet
    val whole = graft.ops.TextAnalysis.qualityFilter(
      docs.toDF("doc_id", "text"), "text", 25, 30)
      .select(col("doc_id"), col("reason"), col("keep"))
      .as[(Long, String, Boolean)].collect().toSet
    assert(split == whole)
    assert(whole == Set((1L, "ok", true), (2L, "too_short", false),
      (3L, "repetitive", false), (4L, "ok", true)))
  }
}
