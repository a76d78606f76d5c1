package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's five hardcoded event filters R5–R9 (SURVEY.md §2.2;
  * reference: DebeziumEngineRecordHandler.java:156-176), as composable
  * `DataFrame => DataFrame` transforms over an `Envelope.parse`d frame.
  *
  * All are simple predicates, so Catalyst fuses them into one codegen'd
  * filter stage — per-event cost is a few branch instructions, same as
  * the reference's hand-written ifs, but vectorized and distributed.
  */
object EventFilters {

  /** R5: drop Kafka tombstones (null value). */
  def dropTombstones(df: DataFrame): DataFrame =
    df.filter(col("value").isNotNull)

  /** R6: drop events without a payload (malformed envelope). The bare
    * form counts as a payload iff it parses to an object with an `op`;
    * `has_payload` is computed once at parse time.
    */
  def requirePayload(df: DataFrame): DataFrame =
    df.filter(col("has_payload"))

  /** R7: drop DDL / schema-change events. */
  def dropDdl(df: DataFrame): DataFrame =
    df.filter(col("ddl").isNull)

  /** R8: keep only insert/update/delete/snapshot-read ops. */
  def knownOps(df: DataFrame): DataFrame =
    df.filter(col("op").isin("c", "u", "d", "r"))

  /** R9: require the `after` KEY to be present. Key-presence, not
    * non-null: a delete with explicit `"after": null` passes (the
    * reference uses `containsKey` — SURVEY §2.4.6).
    */
  def requireAfterKey(df: DataFrame): DataFrame =
    df.filter(col("has_after"))

  /** The full reference filter chain in order. */
  def all(df: DataFrame): DataFrame =
    requireAfterKey(knownOps(dropDdl(requirePayload(dropTombstones(df)))))

  /** Classify every event by the first filter that would drop it (the
    * reference's filter order, R5→R9), or `null` for accepted events.
    * Used for drop-audits and the dead-letter channel (S6: per-event
    * failure must not stop the stream — rejected events are data, not
    * exceptions).
    */
  def dropReason: org.apache.spark.sql.Column =
    when(col("value").isNull, "tombstone")
      .when(!col("has_payload"), "no_payload")
      .when(col("ddl").isNotNull, "ddl")
      .when(!col("op").isin("c", "u", "d", "r"), "bad_op")
      .when(!col("has_after"), "missing_after")
      .otherwise(lit(null))
}
