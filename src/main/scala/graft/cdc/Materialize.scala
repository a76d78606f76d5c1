package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame}

/** Last-writer-wins materialization: collapse a change-event log into the
  * current snapshot of a table (SURVEY Q17 — the batch semantics of the
  * reference's id-keyed upsert/delete sink, R13/R14).
  *
  * Winner per key is the event with the greatest `(ts_ms, offset)` —
  * deterministic regardless of arrival order, which is exactly why the
  * engine can relax the reference's global total-order guarantee to
  * per-key order (SURVEY §7.4).
  *
  * Implementation note: `groupBy(key).agg(max_by(payload, (ts_ms,
  * offset)))`, NOT a `row_number` window. Both shuffle once on the key,
  * but max_by runs as a hash aggregate with map-side partial aggregation
  * — at 100 TB the partial agg collapses each partition's events per key
  * before the shuffle, while a window would sort entire partitions and
  * ship every event. Duplicate delivery (at-least-once replay) collapses
  * for free: a re-delivered event is its own max_by tie.
  */
object Materialize {

  /** @param events `Envelope.parse`d + filtered + routed change events
    * @param keyExpr expression over the envelope columns yielding the
    *                primary key (e.g. extract from `after`, falling back
    *                to `before` for deletes whose after is null)
    * @param rowSchema schema to bind the winning `after` JSON to
    * @return one row per live key, typed per rowSchema
    */
  def lww(events: DataFrame, keyExpr: Column, rowSchema: StructType): DataFrame =
    winners(events, keyExpr)
      .select(from_json(col("_w.after"), rowSchema).as("_row"))
      .select(col("_row.*"))

  /** Typed variant over `Envelope.parseTyped` output — `after` is
    * already a struct, so the winner row needs no re-parse.
    */
  def lwwTyped(events: DataFrame, keyExpr: Column): DataFrame =
    winners(events, keyExpr).select(col("_w.after.*"))

  private def winners(events: DataFrame, keyExpr: Column): DataFrame =
    events
      .withColumn("_key", keyExpr)
      .filter(col("_key").isNotNull)
      .groupBy(col("_key"))
      .agg(max_by(struct(col("op"), col("after")), struct(col("ts_ms"), col("offset")))
        .as("_w"))
      .filter(col("_w.op") =!= "d") // a delete as last writer removes the key

  /** SCD type-2 history: instead of collapsing to the latest row per key
    * (LWW), emit EVERY version with its validity interval — the
    * warehouse-grade view of the same change feed.
    *
    * Semantics: data events (op ∈ {r,c,u}) open a version at their
    * `ts_ms`; any later event on the key (data or delete) closes it
    * (`valid_to_ms` = successor's ts, null = still open). Deletes close
    * the last version without opening one. `version` numbers data events
    * 1..n per key in (ts, offset) order; `is_current` = open interval.
    * At-least-once duplicate deliveries (same key, same ts) collapse to
    * one version via a max_by-on-offset pre-aggregate — same partial-agg
    * shape as LWW, so redelivery never duplicates history.
    *
    * Cost shape: one hash aggregate (dedupe) + one shuffle on the key
    * for the two window passes (lead + row_number share the same sort) —
    * history per key is bounded by that key's change count, so partitions
    * stay balanced at scale unless one key is pathologically hot.
    */
  def scd2Typed(events: DataFrame, keyExpr: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_key")).orderBy(col("ts_ms"), col("offset"))
    events
      .withColumn("_key", keyExpr)
      .filter(col("_key").isNotNull)
      // duplicate delivery: same (key, ts) → keep the max-offset copy
      .groupBy(col("_key"), col("ts_ms"))
      .agg(max_by(struct(col("op"), col("after")), col("offset")).as("_e"),
        max(col("offset")).as("offset"))
      .select(col("_key"), col("ts_ms"), col("offset"),
        col("_e.op").as("op"), col("_e.after").as("after"))
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(w))
      .filter(col("op") =!= "d")
      .withColumn("version", row_number().over(w))
      .select(col("_key"), col("version"), col("ts_ms").as("valid_from_ms"),
        col("valid_to_ms"), col("after"),
        col("valid_to_ms").isNull.as("is_current"))
  }
}
