package graft

import graft.streaming.StatefulVersions
import graft.streaming.StatefulVersions.{In, VersionDelta}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Multi-batch version-delta evolution: in-batch ordering, cross-batch
  * version continuity, dup/late skips, delete-close, re-open after
  * delete — and the SCD2 fold over the accumulated deltas.
  */
class StatefulVersionsSpec extends SparkSpec {
  import spark.implicits._

  test("version deltas across batches: ordered opens, dup/late skips, close, re-open") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[In]
    val name = "versions_out"
    val q = StatefulVersions.versionStream(mem.toDF()
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("rowJson", "after")).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    def step(evs: In*): Seq[VersionDelta] = {
      val before = spark.table(name).count()
      mem.addData(evs: _*); q.processAllAvailable()
      spark.table(name).as[(Long, Long, Int, String, String, Long)].collect()
        .drop(before.toInt).toSeq
        .map(t => VersionDelta(t._1, t._2, t._3, t._4, t._5, t._6))
    }

    try {
      // batch 1: out-of-order arrival WITHIN the batch is sorted; the
      // same-ts dup collapses to the max-offset copy — two versions open
      val b1 = step(
        In(1, 20, 3, "u", """{"v":"b"}"""),
        In(1, 10, 1, "r", """{"v":"a"}"""),
        In(1, 20, 4, "u", """{"v":"b"}""")) // dup delivery, same ts
      assert(b1 == Seq(
        VersionDelta(1, 10, 1, "open", """{"v":"a"}""", 1),
        VersionDelta(1, 20, 2, "open", """{"v":"b"}""", 2)))

      // batch 2: cross-batch dup (same ts) and LATE event both skip —
      // emitted history is append-only at lateness 0
      assert(step(In(1, 20, 5, "u", """{"v":"b"}"""),
        In(1, 15, 6, "u", """{"v":"late"}""")).isEmpty)

      // batch 3: delete closes the open version once; redelivery skips
      val b3 = step(In(1, 30, 7, "d", null))
      assert(b3 == Seq(VersionDelta(1, 30, 2, "close", null, 3)))
      assert(step(In(1, 30, 8, "d", null)).isEmpty)

      // batch 4: re-insert after delete CONTINUES the version numbering
      val b4 = step(In(1, 40, 9, "c", """{"v":"c"}"""))
      assert(b4 == Seq(VersionDelta(1, 40, 3, "open", """{"v":"c"}""", 4)))

      // the SCD2 fold over the accumulated deltas equals the expected
      // timeline: v1 [10,20), v2 [20,30) closed by delete, v3 [40,∞)
      val schema = StructType(Seq(StructField("v", StringType)))
      val hist = StatefulVersions.scd2FromDeltas(spark.table(name), schema)
        .select($"_key", $"version", $"valid_from_ms", $"valid_to_ms",
          $"after.v", $"is_current")
        .as[(Long, Int, Long, Option[Long], String, Boolean)]
        .collect().sortBy(_._2).toSeq
      assert(hist == Seq(
        (1L, 1, 10L, Some(20L), "a", false),
        (1L, 2, 20L, Some(30L), "b", false),
        (1L, 3, 40L, None, "c", true)))
    } finally q.stop()
  }

  test("a delete-only FIRST batch still advances the high-water mark (late events stay out)") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[In]
    val name = "versions_hwm_out"
    val q = StatefulVersions.versionStream(mem.toDF()
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("rowJson", "after")).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: a never-seen key's first event is a delete — emits
      // nothing, but the ts=50 high-water mark MUST persist
      mem.addData(In(7, 50, 1, "d", null)); q.processAllAvailable()
      assert(spark.table(name).count() == 0)
      // batch 2: a LATE insert (ts=40 < 50) must be skipped, not open v1
      mem.addData(In(7, 40, 2, "c", """{"v":"late"}""")); q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "late event admitted — the delete-only batch lost the high-water mark")
      // a genuinely newer insert still opens the next version
      mem.addData(In(7, 60, 3, "c", """{"v":"ok"}""")); q.processAllAvailable()
      assert(spark.table(name).as[(Long, Long, Int, String, String, Long)].collect()
        .toSeq == Seq((7L, 60L, 1, "open", """{"v":"ok"}""", 1L)))
    } finally q.stop()
  }

  test("bounded-lateness splice: a within-window late event renumbers and converges to scd2Typed") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[In]
    val name = "versions_splice_out"
    val q = StatefulVersions.versionStream(mem.toDF()
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("rowJson", "after"), latenessMs = 100).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: two versions open
      mem.addData(In(1, 1000, 1, "r", """{"v":"a"}"""),
        In(1, 1200, 2, "u", """{"v":"b"}"""))
      q.processAllAvailable()
      // batch 2: LATE data event at 1150 (within 100 of high-water
      // 1200) — spliced: it opens v2, and the 1200 event RENUMBERS to
      // v3 via a superseding re-emission
      mem.addData(In(1, 1150, 3, "u", """{"v":"late"}"""))
      q.processAllAvailable()
      // batch 3: an event BELOW the window (1050 <= 1200-100) skips
      mem.addData(In(1, 1050, 4, "u", """{"v":"too-late"}"""))
      q.processAllAvailable()
      val schema = StructType(Seq(StructField("v", StringType)))
      val hist = StatefulVersions.scd2FromDeltas(spark.table(name), schema)
        .select($"_key", $"version", $"valid_from_ms", $"valid_to_ms",
          $"after.v", $"is_current")
        .as[(Long, Int, Long, Option[Long], String, Boolean)]
        .collect().sortBy(_._2).toSeq
      assert(hist == Seq(
        (1L, 1, 1000L, Some(1150L), "a", false),
        (1L, 2, 1150L, Some(1200L), "late", false),
        (1L, 3, 1200L, None, "b", true)))
    } finally q.stop()
  }

  test("bounded-lateness splice: a late delete voids the no-op close it displaces") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[In]
    val name = "versions_void_out"
    val q = StatefulVersions.versionStream(mem.toDF()
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("rowJson", "after"), latenessMs = 100).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // v1 opens at 1000; the delete at 1200 closes it
      mem.addData(In(1, 1000, 1, "r", """{"v":"a"}"""),
        In(1, 1200, 2, "d", null))
      q.processAllAvailable()
      // late delete at 1150 splices BEFORE the 1200 delete: v1 now
      // closes at 1150 and the 1200 close becomes a no-op — the
      // operator must emit close@1150 AND void@1200
      mem.addData(In(1, 1150, 3, "d", null))
      q.processAllAvailable()
      val deltas = spark.table(name)
        .as[(Long, Long, Int, String, String, Long)].collect().toSeq
      assert(deltas.exists(d => d._2 == 1150 && d._4 == "close" && d._3 == 1))
      assert(deltas.exists(d => d._2 == 1200 && d._4 == "void"))
      val schema = StructType(Seq(StructField("v", StringType)))
      val hist = StatefulVersions.scd2FromDeltas(spark.table(name), schema)
        .select($"_key", $"version", $"valid_from_ms", $"valid_to_ms", $"is_current")
        .as[(Long, Int, Long, Option[Long], Boolean)].collect().toSeq
      assert(hist == Seq((1L, 1, 1000L, Some(1150L), false)))
    } finally q.stop()
  }

  test("model-based: SPLICED incremental SCD2 equals batch scd2Typed under bounded disorder") {
    import graft.cdc.{Envelope, Materialize}
    import org.apache.spark.sql.functions._
    // per-key event sequences as in the ordered model test, but batch
    // splits DISORDERED: each event's batch assignment jitters so some
    // events arrive 1-2 batches late (disorder bounded by the ts span
    // of ~2 batches, well inside latenessMs = 1000)
    val rnd = new scala.util.Random(23)
    val evs = (for {
      key <- 1L to 12L
      n = rnd.nextInt(6) + 1
      i <- 0 until n
    } yield {
      val ts = (i + 1) * 10L + rnd.nextInt(5)
      val op = if (i > 0 && rnd.nextInt(5) == 0) "d"
               else Seq("c", "u", "r")(rnd.nextInt(3))
      (key, ts, op, s"""{"k":$key,"v":"k${key}_$i"}""")
    }).zipWithIndex.map { case ((k, ts, op, js), off) => In(k, ts, off.toLong, op,
      if (op == "d") null else js) }
    val withDups = evs ++ evs.filter(_.offset % 7 == 0)
      .map(e => e.copy(offset = e.offset + 100000))

    val asEnvelope = withDups.map { e =>
      val after = if (e.op == "d") "null" else e.rowJson
      (s"""{"payload":{"before":{"k":${e.key},"v":"x"},"after":$after,""" +
        s""""source":{"db":"d","table":"t","ts_ms":${e.tsMs}},"op":"${e.op}","ts_ms":${e.tsMs}}}""",
        e.offset)
    }.toDF("value", "offset")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val expected = Materialize.scd2Typed(
        Envelope.parseTyped(asEnvelope, schema),
        coalesce(col("after.k"), col("before.k")))
      .select(col("_key"), col("version"), col("valid_from_ms"),
        col("valid_to_ms"), col("after.v"), col("is_current"))
      .as[(Long, Int, Long, Option[Long], String, Boolean)].collect().toSet

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[In]
    val name = "versions_splice_model_out"
    val q = StatefulVersions.versionStream(mem.toDF()
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("rowJson", "after"), latenessMs = 1000).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // disordered delivery: sort by ts + a random jitter of up to ±25
      // (≈ 2 batch spans), so events routinely land after later-ts ones
      val jittered = withDups.sortBy(e => e.tsMs + rnd.nextInt(51) - 25)
      jittered.grouped(math.max(1, jittered.size / 5 + 1)).foreach { b =>
        mem.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      }
      val got = StatefulVersions.scd2FromDeltas(spark.table(name), schema)
        .select($"_key", $"version", $"valid_from_ms", $"valid_to_ms",
          $"after.v", $"is_current")
        .as[(Long, Int, Long, Option[Long], String, Boolean)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("model-based: incremental SCD2 equals batch scd2Typed on random ts-ordered batch splits") {
    import graft.cdc.{Envelope, Materialize}
    import org.apache.spark.sql.functions._
    // random per-key event sequences (inserts/updates/deletes, dup
    // deliveries at the same ts) with strictly increasing ts per key,
    // split into batches along the GLOBAL ts order (the append-only
    // delivery the operator documents); arrival within a batch shuffles
    val rnd = new scala.util.Random(17)
    val evs = (for {
      key <- 1L to 12L
      n = rnd.nextInt(6) + 1
      i <- 0 until n
    } yield {
      val ts = (i + 1) * 10L + rnd.nextInt(5)
      val op = if (i > 0 && rnd.nextInt(5) == 0) "d"
               else Seq("c", "u", "r")(rnd.nextInt(3))
      (key, ts, op, s"""{"k":$key,"v":"k${key}_$i"}""")
    }).zipWithIndex.map { case ((k, ts, op, js), off) => In(k, ts, off.toLong, op,
      if (op == "d") null else js) }
    // dup delivery of every 7th event (same ts, higher offset)
    val withDups = evs ++ evs.filter(_.offset % 7 == 0)
      .map(e => e.copy(offset = e.offset + 100000))

    // batch SCD2 over the equivalent envelope relation = the model
    val asEnvelope = withDups.map { e =>
      val after = if (e.op == "d") "null" else e.rowJson
      (s"""{"payload":{"before":{"k":${e.key},"v":"x"},"after":$after,""" +
        s""""source":{"db":"d","table":"t","ts_ms":${e.tsMs}},"op":"${e.op}","ts_ms":${e.tsMs}}}""",
        e.offset)
    }.toDF("value", "offset")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val expected = Materialize.scd2Typed(
        Envelope.parseTyped(asEnvelope, schema),
        coalesce(col("after.k"), col("before.k")))
      .select(col("_key"), col("version"), col("valid_from_ms"),
        col("valid_to_ms"), col("after.v"), col("is_current"))
      .as[(Long, Int, Long, Option[Long], String, Boolean)].collect().toSet

    // stream the same events in ts-ordered batch splits, shuffled within
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[In]
    val name = "versions_model_out"
    val q = StatefulVersions.versionStream(mem.toDF()
        .withColumnRenamed("tsMs", "ts_ms")
        .withColumnRenamed("rowJson", "after")).writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      val byTs = withDups.sortBy(_.tsMs)
      byTs.grouped(math.max(1, byTs.size / 5 + 1)).foreach { b =>
        mem.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      }
      val got = StatefulVersions.scd2FromDeltas(spark.table(name), schema)
        .select($"_key", $"version", $"valid_from_ms", $"valid_to_ms",
          $"after.v", $"is_current")
        .as[(Long, Int, Long, Option[Long], String, Boolean)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}
