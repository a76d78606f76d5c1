package graft.streaming

import graft.cdc.{Envelope, EventFilters, Subscription}
import graft.sinks.EsSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's end-to-end CDC flow (SURVEY §3.2) rebuilt on
  * Structured Streaming: capture stream → envelope parse → R5–R9
  * filters → per-pipeline routing → id-keyed upsert/delete sink.
  *
  * One `CdcPipeline` = one of the reference's "scripts": its own
  * subscription, transform, sink, and checkpoint (the checkpoint dir IS
  * the named tailer — per-subscriber durable position, SURVEY §1.4).
  * Fan-out = N pipelines started over the same source directory; each
  * streaming query tracks offsets independently, which is exactly the
  * reference's shared-log/multi-tailer topology without the bespoke queue.
  *
  * Delivery contract (SURVEY §2.3): at-least-once via checkpoint replay;
  * effects idempotent because upserts are id-keyed; order is per-key
  * (ts_ms, offset), not global — LWW materialization makes results
  * arrival-order-free.
  */
final case class CdcPipeline(
    name: String,
    subscription: Subscription,
    rowSchema: StructType,
    idKey: String,
    transform: DataFrame => DataFrame = identity,
    deadLetterDir: Option[String] = None,
    exprTransform: Option[ExprTransform] = None,
    metrics: Option[PipelineMetrics.Target] = None,
    expectations: Seq[graft.ops.Profile.Rule] = Nil,
    driftCheck: Boolean = false,
    driftPolicy: Option[CdcPipeline.DriftPolicy] = None,
    deadLetterRetentionMs: Long = 0L) {

  require(deadLetterRetentionMs == 0L || deadLetterDir.isDefined,
    s"pipeline $name: deadLetterRetentionMs needs a deadLetterDir")

  // the shared construction-time enforcement invariants (metrics for
  // verdicts, a dead-letter dir for Drop) — Profile.requireEnforceable,
  // so API-built pipelines meet the same bar conf registration does
  graft.ops.Profile.requireEnforceable("pipeline", name, expectations,
    metrics, deadLetterDir)
  // a drift POLICY implies the check; both need the metrics store for
  // their verdict rows, and a Drop policy needs somewhere to land the
  // withheld rows — the same invariants expectations carry
  private val driftOn = driftCheck || driftPolicy.isDefined
  require(!driftOn || metrics.isDefined,
    s"pipeline $name: driftCheck needs a metrics target to record into")
  require(!driftPolicy.exists(_.action == graft.ops.Profile.Drop)
      || deadLetterDir.isDefined,
    s"pipeline $name: a drop-action drift policy needs a deadLetterDir")

  // registration-time dry-run resolution of the conf-declared transform
  // against THIS pipeline's declared schema (the reference runs
  // initCDC() at boot — a script touching a nonexistent binding dies
  // before the first event). Needs a session for analysis; when none
  // exists yet (exotic construction orders) resolution still fails fast
  // at pipeline start, the pre-r10 behavior.
  exprTransform.foreach { t =>
    // the sink extracts the document id from the outgoing row and drop
    // enforcement anti-joins on it — the serving key must survive
    require(!t.drops.contains(idKey),
      s"pipeline $name: transform must not drop the serving key '$idKey'")
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach { sp =>
        try t.validateStruct(sp, ExprTransform.cdcFrameSchema(rowSchema, idKey))
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(s"pipeline $name: ${e.getMessage}")
        }
      }
  }

  /** The OUTGOING document schema — the declared row schema as reshaped
    * by the conf-declared transform (set fields added/replaced, drop
    * fields gone), computed by running [[ExprTransform.applyToStruct]]
    * itself over an empty frame so the semantics can never drift from
    * the real reshape. This is the schema expectations resolve against
    * (both registration validation and the stateful path's re-type): a
    * conf whose transform drops a declared column referenced by an
    * expectation must die at boot, not throw in every micro-batch.
    */
  def outgoingRowSchema(spark: SparkSession): StructType =
    exprTransform.fold(rowSchema) { t =>
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        ExprTransform.cdcFrameSchema(rowSchema, idKey))
      t.applyToStruct(empty).schema("row").dataType.asInstanceOf[StructType]
    }

  /** Routed, filtered, typed change rows from a raw value stream —
    * single-pass typed envelope parse (the pipeline knows its schema).
    * The conf-declared [[ExprTransform]] (R12's data-declared reshape)
    * runs against the outgoing `row` struct first, then the compiled
    * Scala `transform` hook — both see the full envelope columns.
    */
  def changeRows(raw: DataFrame): DataFrame = {
    val routed = subscription.route(
      EventFilters.all(Envelope.parseTyped(raw, rowSchema)))
    val shaped = routed
      .withColumn("row", col("after"))
      .withColumn("key", coalesce(
        col(s"after.$idKey"), col(s"before.$idKey")))
    transform(exprTransform.fold(shaped)(_.applyToStruct(shaped)))
  }

  /** Start the pipeline over a JSON-lines source directory, applying
    * upserts/deletes per micro-batch. The sink call happens inside
    * foreachBatch: deletes for op=d winners, upserts for the rest —
    * collapsed per key within the batch so one key gets one effect.
    */
  def start(spark: SparkSession, sourceDir: String, checkpointDir: String,
      cfg: EsSink.Config, transport: EsSink.Transport): StreamingQuery = {
    val raw = spark.readStream
      .schema(StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("offset",
          org.apache.spark.sql.types.LongType))))
      .json(sourceDir)
    startOver(raw, s"cdc_$name", checkpointDir, cfg, transport)
  }

  /** DSv2 variant of [[start]]: the raw stream comes from the graft-cdc
    * source (sources.cdc.CdcEventSource) and the subscription predicate
    * is applied directly on the source relation, where DSv2 filter
    * pushdown turns it into SOURCE-side db/table pruning (reference R3:
    * the connector's include-lists) instead of a post-scan filter.
    */
  def startDsv2(spark: SparkSession, sourceDir: String, checkpointDir: String,
      cfg: EsSink.Config, transport: EsSink.Transport,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = subscription.route(
      spark.readStream.format("graft-cdc").option("path", sourceDir).load())
      .drop("src_db", "src_table")
    startOver(raw, s"cdc_v2_$name", checkpointDir, cfg, transport, trigger)
  }

  // trigger default: AvailableNow drains-and-terminates (batch-drain
  // runners, tests); a long-running server passes ProcessingTime so
  // the query keeps following the feed (Serve) — the Debezium engine's
  // run-until-stopped shape (DebeziumEngineManager.java:76-121).
  private def startOver(raw: DataFrame, queryName: String, checkpointDir: String,
      cfg: EsSink.Config, transport: EsSink.Transport,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changeRows(raw).writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, cfg, transport, batchId)
      }
      .start()

  /** Incremental variant: per-key state via StatefulLww, so the sink
    * sees exactly one delta per CHANGED key per micro-batch (the
    * per-batch variant re-sends a key's winner every batch it appears
    * in). Costs a state store keyed by table cardinality; wins when
    * update streams revisit keys often — the common CDC shape.
    *
    * The state store defaults to ROCKSDB ([[CdcPipeline.RocksDbProvider]])
    * — the production choice for table-cardinality state (off-heap,
    * incrementally checkpointed; the HDFS-backed provider holds every
    * key on-heap, which a 10⁹-key table cannot). Provider parity is
    * pinned in StatefulLwwSpec; pass `stateProvider` explicitly to
    * override (tests that sweep providers, memory-constrained local
    * runs). The provider conf is set on the session only for the
    * duration of `.start()` — StreamExecution clones the session state
    * at query start, so the previous session value is restored without
    * affecting the running query.
    */
  def startIncremental(spark: SparkSession, sourceDir: String,
      checkpointDir: String, cfg: EsSink.Config,
      transport: EsSink.Transport,
      stateProvider: String = CdcPipeline.RocksDbProvider): StreamingQuery = {
    val raw = spark.readStream
      .schema(StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("offset",
          org.apache.spark.sql.types.LongType))))
      .json(sourceDir)
    // serialize the TRANSFORMED document (`row`), not the raw `after`:
    // both transform hooks must reach the incremental sink's documents
    // exactly as they reach the per-batch path's
    val events = changeRows(raw)
      .select(col("key"), col("ts_ms"), col("offset"), col("op"),
        to_json(col("row")).as("after"))
    // expectations resolve against the POST-TRANSFORM document schema
    // (what the store actually serves) — computed once, outside the
    // per-batch closure
    val outSchema = outgoingRowSchema(spark)
    val writer = StatefulLww.deltaStream(events).writeStream
      .queryName(s"cdc_inc_$name")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (deltas: org.apache.spark.sql.Dataset[StatefulLww.Delta], batchId: Long) =>
        val t0 = System.currentTimeMillis()
        // with metrics on, pin the delta frame first: counting an
        // unmaterialized frame would re-execute the stateful plan
        val df = if (metrics.isDefined) deltas.toDF().localCheckpoint(true)
          else deltas.toDF()
        val dels = df.filter(col("action") === "delete")
          .select(col("key").cast("string").as(idKey))
        // the stored rowJson IS the (transformed) document — send it
        // verbatim: re-typing through the declared rowSchema would
        // silently drop transform-ADDED fields and resurrect DROPPED
        // ones, diverging from the per-batch path's sink documents
        val ups0 = df.filter(col("action") === "upsert")
          .select(col("key"), col("rowJson"))
        // expectations judge the serving documents re-typed through the
        // POST-TRANSFORM schema (the consumer's view), BEFORE the sink:
        // Halt fails the batch here, Drop violators dead-letter and
        // their keys are withheld from the upsert send
        val typed = ups0
          .select(col("key").as("__key"),
            from_json(col("rowJson"), outSchema).as("r"))
          .select(col("__key") +: outSchema.fieldNames.toSeq.map(f =>
            col(s"r.$f")): _*)
        val violating = PipelineMetrics.enforceBatchExpectations(metrics,
          name, batchId, expectations, typed, Seq("__key"), deadLetterDir)
        val ups = violating.fold(ups0)(v =>
          ups0.join(v.select(col("__key").as("key")), Seq("key"), "left_anti"))
        val dlDels = EsSink.delete(dels, cfg, transport)
        val dlUps = EsSink.upsertRaw(ups, "key", "rowJson", cfg, transport)
        metrics.foreach(m => PipelineMetrics.record(m, name, "lww", batchId,
          rowsIn = df.count(),
          deadLetters = dlDels.count() + dlUps.count(),
          stateRows = 0L, wallMs = System.currentTimeMillis() - t0))
        () // dead-letter frames are returned by the sink; S6 contract:
           // the stream continues regardless
      }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, stateProvider)
    try writer.start()
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** Batch application: last writer per key within the batch, then
    * deletes and upserts through the sink. Also usable directly on a
    * batch frame (tests, backfill). Undeliverable records (after the
    * sink's retries) land in `deadLetterDir` as parquet when configured
    * — S6: failures are data, the stream continues.
    */
  def applyBatch(batch: DataFrame, cfg: EsSink.Config,
      transport: EsSink.Transport, batchId: Long = 0L): Unit = {
    val t0 = System.currentTimeMillis()
    // drift check adds two more actions on the batch frame — pin it so
    // they cannot re-run the micro-batch plan (foreachBatch hazard)
    val src = if (driftOn && metrics.isDefined)
      batch.localCheckpoint(true) else batch
    val drift = recordSchemaDrift(src, batchId)
    // drift HALT: the verdict row is already recorded (observable
    // breach), then the micro-batch fails exactly like an expectation
    // halt — the store keeps its pre-batch state and the checkpoint
    // replays the batch once the conf's schema (or the wire) is fixed.
    // This is the declarative analog of the reference's DDL-event drop
    // (R7): schema change quarantines instead of silently serving.
    for (p <- driftPolicy; d <- drift)
      Drift.haltOnBreach(p, d, name, batchId)
    // a Drop policy needs the winner's RAW wire value to re-judge the
    // fields the typed struct already smoothed over — carry it through
    // the LWW collapse only when the policy asks
    val dropDrift = driftPolicy.exists(_.action == graft.ops.Profile.Drop)
    val winners = src
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(max_by(
        if (dropDrift) struct(col("op"), col("row"), col("value"))
        else struct(col("op"), col("row")),
        struct(col("ts_ms"), col("offset"))).as("w"))
    val winnersCached = winners.cache()
    try {
      val deletes = winnersCached.filter(col("w.op") === "d")
        .select(col("key").cast("string").as(idKey))
      val upserts0 = applyDriftDrop(
        winnersCached.filter(col("w.op") =!= "d"), drift, batchId)
        .select(col("w.row.*"))
      // expectations judge the batch's upsert documents BEFORE the
      // serving write: verdicts record, a breached Halt rule fails the
      // batch here (store keeps pre-batch state), and Drop violators
      // dead-letter and are withheld from the sink — the budgeted
      // verdict is monitoring, the withheld row is data protection
      val violating = PipelineMetrics.enforceBatchExpectations(metrics,
        name, batchId, expectations, upserts0, Seq(idKey), deadLetterDir)
      val upserts = violating.fold(upserts0)(v =>
        upserts0.join(v.select(col(idKey)), Seq(idKey), "left_anti"))
      val dlDeletes = EsSink.delete(deletes, cfg, transport)
      val dlUpserts = EsSink.upsert(upserts, cfg, transport)
      deadLetterDir.foreach { dir =>
        val dead = dlDeletes.unionByName(dlUpserts)
          .withColumn("pipeline", lit(name))
        if (!dead.isEmpty) dead.write.mode("append").parquet(dir)
      }
      // counts come from the CACHED winners and the localCheckpointed
      // dead-letter frames — recording never re-runs the batch plan
      metrics.foreach(m => PipelineMetrics.record(m, name, "lww", batchId,
        rowsIn = winnersCached.count(),
        deadLetters = dlDeletes.count() + dlUpserts.count(),
        stateRows = 0L, wallMs = System.currentTimeMillis() - t0))
    } finally winnersCached.unpersist()
  }

  /** Per-batch SCHEMA-DRIFT verdict — the streaming operationalization
    * of the reference's DDL-event awareness (R7): the conf's declared
    * schema is the pipeline's contract, so each drained batch records
    * how the WIRE diverged from it into the metrics store's `_drift`
    * table — undeclared payload fields (the new-column half of a DDL)
    * and declared fields whose raw value fails its declared type (the
    * type-change half). Detection is per-FIELD re-parse of the raw
    * after payload (`get_json_object` + cast), deliberately NOT the
    * typed `after` struct: a malformed numeric nulls the whole struct
    * under PERMISSIVE from_json, which would smear one bad field over
    * every declared column. Every drained batch records (zeros are the
    * healthy heartbeat); q82/q85 remain the batch-query forms, this is
    * the serving-path monitor. Two aggregate jobs over the pinned
    * batch; skipped entirely unless `driftCheck` is on.
    */
  private def recordSchemaDrift(src: DataFrame,
      batchId: Long): Option[CdcPipeline.DriftVerdict] =
    if (!driftOn) None
    else metrics.map(m =>
      Drift.recordSchemaDrift(src, rowSchema, name, batchId, m))

  /** DROP-action drift enforcement over the batch's upsert WINNERS (the
    * rows that would actually serve): a winner whose raw payload fails
    * a declared type is withheld ALWAYS (serving it would silently null
    * the field — a known-bad document; budgets govern verdicts, never
    * license serving bad rows, the expectation contract), and winners
    * carrying undeclared fields are withheld only when the batch's
    * distinct new-column count breaches `newColsBudget` (tolerated
    * schema evolution serves; a breach fences every drifted row until
    * the conf evolves). Withheld winners dead-letter under
    * `<dlDir>/_drift/pipeline=<name>/batch_id=<id>` (per-batch
    * partition OVERWRITE — replay-idempotent, and a separate subtree
    * from `_expect` so neither enforcement's write clobbers the
    * other's), tagged drift_badtype / drift_newcols. Returns the
    * winners that may serve.
    */
  private def applyDriftDrop(upsertWinners: DataFrame,
      drift: Option[CdcPipeline.DriftVerdict], batchId: Long): DataFrame = {
    val p = driftPolicy match {
      case Some(pp) if pp.action == graft.ops.Profile.Drop => pp
      case _ => return upsertWinners
    }
    val d = drift.getOrElse(return upsertWinners)
    val newColsBreached = d.newCols > p.newColsBudget
    if (d.rowsBadtype == 0L && !(newColsBreached && d.rowsNew > 0L))
      return upsertWinners
    val aj = Drift.rawAfter(col("w.value"))
    val tagged = upsertWinners.withColumn("__viol", array_compact(array(
      when(Drift.anyBadTypeOf(aj, rowSchema), lit("drift_badtype")),
      if (newColsBreached) when(size(Drift.newFieldsOf(aj, rowSchema)) > 0,
        lit("drift_newcols")) else lit(null).cast("string"))))
      .localCheckpoint(true)
    val viol = tagged.filter(size(col("__viol")) > 0)
    deadLetterDir.foreach { dir =>
      val safe = PipelineMetrics.sanitizedPipeline(name)
      // the RAW after payload, not the typed row: a bad-typed field
      // nulls the whole struct under PERMISSIVE parsing, so the typed
      // form of exactly the rows this path withholds is empty — the
      // operator repairing drift needs the original bytes (undeclared
      // fields and the malformed value included)
      viol.select(array_join(col("__viol"), ",").as("violated"),
        aj.as("row_json"))
        .write.mode("overwrite")
        .parquet(s"$dir/_drift/pipeline=$safe/batch_id=$batchId")
      PipelineMetrics.writeKindMarker(viol.sparkSession, dir, "_drift",
        safe, "lww")
    }
    tagged.filter(size(col("__viol")) === 0).drop("__viol")
  }
}

object CdcPipeline {
  /** Production state-store provider for the incremental (stateful)
    * path: RocksDB keeps table-cardinality LWW state off-heap with
    * incremental checkpoints — the 10⁹-key story the on-heap HDFS
    * provider cannot tell. Ships in Spark 4; no extra dependency.
    */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Conf-declared ESCALATION for schema drift — the enforcement half
    * of the driftCheck monitor, completing R7's streaming analog with
    * the same warn/drop/halt vocabulary expectations use:
    *  - Warn: record the `_drift` verdict row only (the monitor).
    *  - Drop: winners whose raw payload fails a declared type are
    *    withheld and dead-lettered always; winners carrying undeclared
    *    fields are withheld once the batch's distinct new-column count
    *    breaches `newColsBudget` (see [[CdcPipeline.applyDriftDrop]]).
    *  - Halt: a breach of either budget fails the micro-batch AFTER the
    *    verdict records — pipeline quarantine, store pre-batch,
    *    conf-fix → restart → replay (the expectation Halt lifecycle).
    * Budgets are exact integer counts: `newColsBudget` bounds DISTINCT
    * undeclared field names per batch; `badTypeRowsBudget` bounds rows
    * whose declared field failed its type.
    */
  final case class DriftVerdict(newCols: Long, typeChanges: Long,
      rowsNew: Long, rowsBadtype: Long)
  final case class DriftPolicy(
      newColsBudget: Long = Long.MaxValue,
      badTypeRowsBudget: Long = Long.MaxValue,
      action: graft.ops.Profile.Action = graft.ops.Profile.Warn)
}
