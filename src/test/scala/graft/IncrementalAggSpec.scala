package graft

import graft.cdc.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Retraction semantics of the incrementally-maintained top-k: deleting
  * or re-pricing a reigning maximum must surface the correct runner-up
  * from the delta history alone — no snapshot re-scan.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType),
    StructField("v", DoubleType)))

  private def row(id: Long, g: String, v: Double) =
    s"""{"id":$id,"g":"$g","v":$v}"""

  private def deltas(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("key", "action", "rowJson", "prevJson")

  private def topk(d: DataFrame, k: Int): Seq[(String, Long, Long, Double)] =
    IncrementalAgg.topKByGroup(d, rowSchema, "g", "v", "id", k)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("delete of the reigning max surfaces the runner-up; update re-ranks") {
    val b1 = deltas(
      (1L, "upsert", row(1, "a", 10.0), null),
      (2L, "upsert", row(2, "a", 8.0), null),
      (3L, "upsert", row(3, "a", 6.0), null),
      (4L, "upsert", row(4, "a", 4.0), null))
    assert(topk(b1, 2) == Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 8.0)))

    // the reigning max (id 1) is DELETED — its +row cancels, the
    // runner-up (id 2) takes rank 1 with no history replay
    val b2 = b1.unionByName(deltas((1L, "delete", null, row(1, "a", 10.0))))
    assert(topk(b2, 2) == Seq(("a", 1L, 2L, 8.0), ("a", 2L, 3L, 6.0)))

    // an UPDATE re-prices id 3 past everyone: +new/−prev swap its
    // support row and the ranking follows
    val b3 = b2.unionByName(deltas(
      (3L, "upsert", row(3, "a", 12.0), row(3, "a", 6.0))))
    assert(topk(b3, 2) == Seq(("a", 1L, 3L, 12.0), ("a", 2L, 2L, 8.0)))
  }

  test("equal values retract independently (row identity is part of the support key)") {
    val d = deltas(
      (1L, "upsert", row(1, "a", 5.0), null),
      (2L, "upsert", row(2, "a", 5.0), null),
      (1L, "delete", null, row(1, "a", 5.0)))
    // deleting id 1 must not take id 2's equal-valued row with it
    assert(topk(d, 2) == Seq(("a", 1L, 2L, 5.0)))
  }

  test("LIVE top-k leaderboard in JDBC: delete of the max surfaces the runner-up, end-to-end") {
    import graft.sinks.JdbcSink
    import graft.streaming.StatefulLww.Delta
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val url = "jdbc:derby:memory:graftboard;create=true"
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val q = IncrementalAgg.liveSupportStream(mem.toDF(), rowSchema, "g", "v", "id")
      .writeStream.outputMode("complete")
      .foreachBatch {
        (support: org.apache.spark.sql.DataFrame, _: Long) =>
          // the leaderboard is k·groups rows — rewriting it wholesale per
          // batch is idempotent, replay-safe serving
          JdbcSink.overwrite(
            IncrementalAgg.rankSupport(support, "g", "v", "id", 2),
            url, "board")
          ()
      }.start()
    def board(): Seq[(String, Long, Long, Double)] =
      spark.read.jdbc(url, "board", new java.util.Properties())
        .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    try {
      mem.addData(Delta(1, "upsert", row(1, "a", 10.0), null),
        Delta(2, "upsert", row(2, "a", 8.0), null),
        Delta(3, "upsert", row(3, "a", 6.0), null))
      q.processAllAvailable()
      assert(board() == Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 8.0)))

      // the reigning max is DELETED mid-stream: its refcount hits 0 in
      // state and the next batch's board shows the runner-up at rank 1
      mem.addData(Delta(1, "delete", null, row(1, "a", 10.0)))
      q.processAllAvailable()
      assert(board() == Seq(("a", 1L, 2L, 8.0), ("a", 2L, 3L, 6.0)))

      // a re-price past the top re-ranks without replay
      mem.addData(Delta(3, "upsert", row(3, "a", 9.5), row(3, "a", 6.0)))
      q.processAllAvailable()
      assert(board() == Seq(("a", 1L, 3L, 9.5), ("a", 2L, 2L, 8.0)))
    } finally q.stop() // a failed assert must not leak the running query
  }

  test("supportDeltaStream: state holds LIVE triples only (removed at refcnt 0), serving table converges") {
    import graft.sinks.JdbcSink
    import graft.streaming.StatefulLww.Delta
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val url = "jdbc:derby:memory:graftsupport;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    c0.createStatement().execute(
      """CREATE TABLE support ("g" VARCHAR(10) NOT NULL, "id" BIGINT NOT NULL,
        | "v" DOUBLE NOT NULL, "refcnt" BIGINT,
        | PRIMARY KEY ("g", "id", "v"))""".stripMargin.replace("\n", ""))
    c0.close()
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val q = IncrementalAgg.supportDeltaStream(mem.toDF(), rowSchema, "g", "v", "id")
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[IncrementalAgg.SupportDelta], _: Long) =>
          JdbcSink.applyViewDeltas(
            batch.toDF().select($"action", $"g", $"id", $"v", $"refcnt"),
            url, "support", Seq("g", "id", "v"),
            stagingColumnTypes = "g VARCHAR(10)",
            deleteStagingColumnTypes = "g VARCHAR(10)")
          ()
      }.start()
    def stateRows(): Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    def board(k: Int): Seq[(String, Long, Long, Double)] =
      IncrementalAgg.rankSupport(
          spark.read.jdbc(url, "support", new java.util.Properties()),
        "g", "v", "id", k)
        .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    try {
      mem.addData(Delta(1, "upsert", row(1, "a", 10.0), null),
        Delta(2, "upsert", row(2, "a", 8.0), null),
        Delta(3, "upsert", row(3, "a", 6.0), null))
      q.processAllAvailable()
      assert(board(2) == Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 8.0)))
      assert(stateRows() == 3L)

      // delete the max: its state row is REMOVED, not tombstoned
      mem.addData(Delta(1, "delete", null, row(1, "a", 10.0)))
      q.processAllAvailable()
      assert(board(2) == Seq(("a", 1L, 2L, 8.0), ("a", 2L, 3L, 6.0)))
      assert(stateRows() == 2L, "deleted triple must leave the state store")

      // re-price: old value's triple removed, new one added — net flat
      mem.addData(Delta(3, "upsert", row(3, "a", 9.5), row(3, "a", 6.0)))
      q.processAllAvailable()
      assert(board(2) == Seq(("a", 1L, 3L, 9.5), ("a", 2L, 2L, 8.0)))
      assert(stateRows() == 2L,
        "re-price must not grow state (the liveSupportStream tombstone bug)")
    } finally q.stop()
  }

  test("supportDeltaStream remembers a pending retraction (delete arriving before its upsert)") {
    import graft.streaming.StatefulLww.Delta
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val name = "support_pending_out"
    val q = IncrementalAgg.supportDeltaStream(mem.toDF(), rowSchema, "g", "v", "id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // the retraction lands FIRST (out-of-order replay): nothing
      // emitted, but the -1 must be remembered, not dropped
      mem.addData(Delta(1, "delete", null, row(1, "a", 5.0)))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0)
      // the matching +row arrives: counts cancel — the triple must NOT
      // surface as live (the ghost-row bug)
      mem.addData(Delta(1, "upsert", row(1, "a", 5.0), null))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "a cancelled pending retraction must not emit a live upsert")
      // state is empty again: a fresh insert emits normally
      mem.addData(Delta(2, "upsert", row(2, "a", 7.0), null))
      q.processAllAvailable()
      val rows = spark.table(name)
        .as[(String, Long, Double, Long, String)].collect().toSeq
      assert(rows == Seq(("a", 2L, 7.0, 1L, "upsert")))
    } finally q.stop()
  }

  test("E2E: serving server restarts from a COMPACTED log with identical state (lifecycle)") {
    import graft.cdc.DeltaLog
    import graft.sinks.JdbcSink
    import org.apache.spark.sql.streaming.Trigger
    // a multi-batch table delta log with history: re-prices and a delete
    val base = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    def writeBatch(id: Long, rows: Seq[(Long, String, String, String)]): Unit =
      rows.toDF("key", "action", "rowJson", "prevJson")
        .write.mode("overwrite").parquet(s"$base/data/batch_id=$id")
    writeBatch(0, Seq(
      (1L, "upsert", row(1, "a", 10.0), null),
      (2L, "upsert", row(2, "a", 8.0), null),
      (3L, "upsert", row(3, "b", 6.0), null)))
    writeBatch(1, Seq(
      (1L, "upsert", row(1, "a", 12.0), row(1, "a", 10.0)),
      (2L, "delete", null, row(2, "a", 8.0)),
      (4L, "upsert", row(4, "b", 7.0), null)))

    val url = "jdbc:derby:memory:graftrestart;create=true"
    def mkTable(name: String): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      c.createStatement().execute(
        s"""CREATE TABLE $name ("g" VARCHAR(10) NOT NULL, "id" BIGINT NOT NULL,
          | "v" DOUBLE NOT NULL, "refcnt" BIGINT,
          | PRIMARY KEY ("g", "id", "v"))""".stripMargin.replace("\n", ""))
      c.close()
    }
    // one serving run: stream the log's ACTIVE generation through
    // supportDeltaStream into a fresh serving table, fresh checkpoint —
    // exactly what a restarted server does
    def serve(table: String): Long = {
      mkTable(table)
      val src = DeltaLog.activeDataDir(base)
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
      val q = IncrementalAgg.supportDeltaStream(stream, rowSchema, "g", "v", "id")
        .writeStream.outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_restart_ck_").toString)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[IncrementalAgg.SupportDelta], _: Long) =>
            JdbcSink.applyViewDeltas(
              batch.toDF().select($"action", $"g", $"id", $"v", $"refcnt"),
              url, table, Seq("g", "id", "v"),
              stagingColumnTypes = "g VARCHAR(10)",
              deleteStagingColumnTypes = "g VARCHAR(10)")
            ()
        }.start()
      q.awaitTermination()
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    def board(table: String): Seq[(String, Long, Long, Double)] =
      IncrementalAgg.rankSupport(
          spark.read.jdbc(url, table, new java.util.Properties()),
          "g", "v", "id", 2)
        .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    serve("serve_v1")
    val expected = Seq(("a", 1L, 1L, 12.0), ("b", 1L, 4L, 7.0), ("b", 2L, 3L, 6.0))
    assert(board("serve_v1") == expected)

    // maintenance: compact, restart a fresh server from the compacted
    // generation — the serving state must be IDENTICAL, and the
    // replayed state must hold exactly the live triples (the bounded-
    // state restart point: no tombstones, no history)
    DeltaLog.compactLog(spark, base)
    val stateRows = serve("serve_v2")
    assert(board("serve_v2") == expected)
    assert(stateRows == 3L,
      s"restarted state must hold exactly the 3 live triples, got $stateRows")
  }

  test("rank<=k is planned as WindowGroupLimit (partition-local top-k before the shuffle)") {
    val d = deltas((1L, "upsert", row(1, "a", 1.0), null))
    val p = IncrementalAgg.topKByGroup(d, rowSchema, "g", "v", "id", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
