package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Debezium-style change-event envelope (SURVEY.md §1.1).
  *
  * The reference consumes JSON `ChangeEvent<String,String>` pairs whose
  * value carries `{schema?, payload:{before, after, source:{db,table,...},
  * op, ts_ms}}` (reference: DebeziumEngineRecordHandler.java:154-184).
  * Per SURVEY §1.1 we accept both the wrapped form and a bare payload.
  *
  * Row payloads are schemaless at ingest: `after`/`before` stay raw JSON
  * strings here (extracted with `get_json_object`, which preserves the
  * original object text), and consumers project typed columns on demand
  * with `from_json(schema)`. This keeps one envelope parser for every
  * source table and pushes schema binding to the edge — the same design
  * that lets a single bronze stream serve N typed pipelines at scale.
  */
object Envelope {

  /** Scalar envelope fields, parsed once per event. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("ddl", StringType),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("ts_ms", LongType))))))

  /** The raw payload JSON text: unwraps `{schema,payload}` when the
    * wrapper is present, otherwise treats the whole value as the payload
    * (bare form). NULL input stays NULL (tombstone, filtered later).
    */
  def payloadText(value: Column): Column = {
    val wrapped = get_json_object(value, "$.payload")
    when(wrapped.isNotNull, wrapped).otherwise(value)
  }

  /** Identity that the optimizer must treat as opaque:
    * `spark_partition_id() >= 0` is always true, but its nondeterminism
    * stops CollapseProject from inlining the wrapped expression into
    * downstream projections and stops predicate pushdown from
    * substituting it into every filter term (from_json would otherwise
    * be re-evaluated up to ~7× per row — measured 3× slower end-to-end).
    * Unlike the previous `udf(identity).asNondeterministic()` barrier it
    * stays inside whole-stage codegen and skips the per-row
    * UTF8String→String copy. Why this particular tautology: `rand() >= -1`
    * is constant-folded away by Spark 4 (rand's bounds are known to the
    * optimizer), and `monotonically_increasing_id()` is rejected in
    * streaming plans — partition id is neither folded nor banned, in
    * batch or streaming (verified empirically; the PlanSpec ≤1-from_json
    * assertion guards against regression).
    */
  private def barrier(c: Column): Column =
    when(spark_partition_id() >= 0, c)

  /** Parse a DataFrame of raw event strings into envelope columns.
    *
    * Input: `value: String` (nullable) plus any passthrough columns
    * (typically `offset: Long`, the arrival index).
    * Output adds: `payload` (raw payload text), `op`, `ts_ms`, `ddl`,
    * `src_db`, `src_table`, `before`, `after` (raw JSON text or null),
    * `has_after` (key-PRESENCE — the reference checks `containsKey`, not
    * non-null, so `"after": null` on a delete passes; SURVEY §2.4.6).
    */
  def parse(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val v = col(valueCol)
    // barrier = optimizer-opaque identity (above): each JSON scan below
    // evaluates once per row instead of being re-inlined into every
    // pushed-down filter term
    df.withColumn("_v", barrier(v))
      .withColumn("_wrapped", get_json_object(col("_v"), "$.payload"))
      .withColumn("payload",
        when(col("_wrapped").isNotNull, col("_wrapped")).otherwise(col("_v")))
      .withColumn("env", from_json(col("payload"), payloadSchema))
      .withColumn("op", col("env.op"))
      .withColumn("ts_ms", col("env.ts_ms"))
      .withColumn("ddl", col("env.ddl"))
      .withColumn("src_db", col("env.source.db"))
      .withColumn("src_table", col("env.source.table"))
      .withColumn("before", get_json_object(col("payload"), "$.before"))
      .withColumn("after", get_json_object(col("payload"), "$.after"))
      .withColumn("has_payload",
        col("_wrapped").isNotNull || col("op").isNotNull)
      // get_json_object returns NULL for both a missing key and an
      // explicit JSON null — the reference distinguishes them
      // (containsKey). JsonPayloadHasKey scans the actual JSON structure
      // in one pass: unlike a text probe it cannot match a string VALUE
      // that happens to contain `"after":`, and unlike
      // json_object_keys(payloadText(v)) it costs no extra Jackson parse.
      .withColumn("has_after", coalesce(
        graft.functions.JsonFunctions.payloadHasKey(v, "after"), lit(false)))
      .drop("env", "_v", "_wrapped")
  }

  /** Single-pass TYPED parse for pipelines that know their row schema
    * (CdcPipeline always does): ONE `from_json` whose schema describes
    * both the wrapped and bare envelope forms, with `before`/`after`
    * bound straight to `rowSchema` — no raw-JSON intermediate columns
    * and no re-parsing downstream. The generic `parse` above stays for
    * schemaless ingest; this is the hot path (~6× fewer JSON scans per
    * event).
    *
    * Emits the same columns as `parse` except `before`/`after` are
    * typed structs.
    */
  def parseTyped(df: DataFrame, rowSchema: StructType,
      valueCol: String = "value"): DataFrame = {
    val inner = StructType(Seq(
      StructField("before", rowSchema),
      StructField("after", rowSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("ddl", StringType),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("table", StringType),
        StructField("ts_ms", LongType))))))
    // wrapped form nests the same layout under `payload`; bare form has
    // it at the top level — one schema covers both, Spark fills the
    // absent half with nulls
    val both = StructType(StructField("payload", inner) +: inner.fields)
    val v = col(valueCol)
    def pick(field: String) =
      when(col("_env.payload").isNotNull, col(s"_env.payload.$field"))
        .otherwise(col(s"_env.$field"))
    // Without the barrier, predicate pushdown substitutes `_env` into
    // every downstream filter term, re-running from_json up to ~7× per
    // row (measured: 3× slower end-to-end). With it, the parse is
    // evaluated exactly once per row and filters run over the parsed
    // columns.
    df.withColumn("_env", from_json(barrier(v), both))
      .withColumn("op", pick("op"))
      .withColumn("ts_ms", pick("ts_ms"))
      .withColumn("ddl", pick("ddl"))
      .withColumn("src_db", pick("source").getField("db"))
      .withColumn("src_table", pick("source").getField("table"))
      .withColumn("before", pick("before"))
      .withColumn("after", pick("after"))
      .withColumn("has_payload",
        col("_env.payload").isNotNull || col("op").isNotNull)
      // key-presence probe on the UNWRAPPED payload (the SAME expression
      // as `parse`, so the two parsers cannot disagree): the previous
      // raw-text regex scanned the whole value, so an `"after"` key
      // inside the {schema,...} wrapper block passed R9 in this path only
      .withColumn("has_after", coalesce(
        graft.functions.JsonFunctions.payloadHasKey(v, "after"), lit(false)))
      .drop("_env")
  }
}
