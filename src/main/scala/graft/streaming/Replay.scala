package graft.streaming

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Replay harness: stage the events table as a file-stream source and run
  * a Structured Streaming transform to completion with
  * `Trigger.AvailableNow` (SURVEY §7.4: compare final state only).
  *
  * Staging writes ONE parquet file so the whole replay is a single
  * micro-batch — watermarks then drop nothing and the final state equals
  * the batch semantics, which is what makes the DuckDB oracle exact.
  * Multi-batch behavior (late-data drops, cross-batch dedup state) is
  * exercised separately in tests with controlled per-batch input.
  */
object Replay {

  private val nameCounter = new AtomicLong(0)

  /** Stage events (optionally with duplicate deliveries of every 100th
    * event) into a deterministic temp dir; idempotent across runs.
    */
  def stageEvents(spark: SparkSession, dir: String, withDuplicates: Boolean): String = {
    val tag = if (withDuplicates) "dup" else "plain"
    val staged = sys.props("java.io.tmpdir") +
      s"/graft_replay_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$tag"
    if (!Files.exists(Paths.get(s"$staged/_SUCCESS"))) {
      val ev = Tables.events(spark, dir)
      val out = if (withDuplicates)
        ev.unionByName(ev.filter(col("event_id") % 100 === 0)) else ev
      out.coalesce(1).write.mode("overwrite").parquet(staged)
    }
    staged
  }

  /** File-stream over the staged events. */
  def eventsStream(spark: SparkSession, dir: String,
      withDuplicates: Boolean = false): DataFrame = {
    val staged = stageEvents(spark, dir, withDuplicates)
    val schema: StructType = spark.read.parquet(staged).schema
    spark.readStream.schema(schema).parquet(staged)
  }

  /** Run a streaming DataFrame to completion, return the final result.
    * `complete` output mode so every window/group is in the final table
    * regardless of watermark progress at termination.
    *
    * `statePartitions` sizes the state store: each stateful operator
    * keeps one store instance (files, commit log) PER shuffle partition,
    * so partition count should track STATE SIZE, not core count —
    * 100k-key local state wants a handful of stores, a 10^9-key
    * production state wants hundreds. Local measurement: 32 → 4 state
    * partitions cuts per-query overhead ~45%.
    */
  def runToResult(spark: SparkSession, streaming: DataFrame,
      statePartitions: Int = 8): DataFrame = {
    val name = s"graft_replay_result_${nameCounter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    try {
      val q = streaming.writeStream
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft_ckpt_").toString)
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }
}
