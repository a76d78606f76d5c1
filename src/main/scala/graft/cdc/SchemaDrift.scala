package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-DRIFT detection over the raw wire feed: which fields are
  * upstream tables actually shipping in their `after` payloads, beyond
  * what each subscription declares? The reference pins one fixed schema
  * per script (conf-declared, like [[graft.streaming.PipelineRegistry]]
  * here) and silently ignores everything else — so an upstream
  * `ALTER TABLE ADD COLUMN` becomes invisible data loss until someone
  * notices. This pass makes it an observable report instead: the day a
  * new column appears in the feed, it shows up with an event count.
  *
  * Works on the RAW JSON (both envelope forms), not the typed parse —
  * the typed path can only see declared fields, which is exactly the
  * blind spot being reported. Scale shape: one scan, per-row key
  * extraction, explode, then a keyed count aggregate and a broadcast
  * anti-join against the (tiny) declared-fields relation — no wide
  * shuffle, no driver-side data.
  */
object SchemaDrift {

  /** Per (src_table, field) event counts for every field OBSERVED in an
    * `after` payload. Deletes (`"after": null`), tombstones and
    * payloadless junk contribute nothing.
    */
  def observedFields(feed: DataFrame): DataFrame = {
    // single-pass envelope scans (both envelope forms handled inside
    // the probe; explicit "after": null yields SQL null so the explode
    // drops the event) — the q17d lesson: a full JSON parse per
    // extracted field is the scan's dominant cost at feed scale
    val after = graft.functions.JsonFunctions.payloadRaw(col("value"), "after")
    val table = graft.functions.JsonFunctions.payloadSourceTable(col("value"))
    feed.filter(col("value").isNotNull)
      .select(table.as("src_table"),
        explode(json_object_keys(after)).as("field"))
      .filter(col("src_table").isNotNull)
      .groupBy(col("src_table"), col("field"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Observed-minus-declared over an already-aggregated observation
    * relation — shared by the batch report and the streaming monitor
    * (whose aggregate runs inside the streaming query, with this diff
    * applied to each result snapshot).
    */
  def driftOf(spark: SparkSession, observed: DataFrame,
      declared: Map[String, Seq[String]]): DataFrame = {
    import spark.implicits._
    val decl = declared.toSeq
      .flatMap { case (t, fs) => fs.map(f => (t, f)) }
      .toDF("src_table", "field")
    observed.join(broadcast(decl), Seq("src_table", "field"), "left_anti")
  }

  /** The drift report: observed fields NOT declared by their table's
    * subscription. `declared` maps src_table -> declared field names.
    */
  def report(spark: SparkSession, feed: DataFrame,
      declared: Map[String, Seq[String]]): DataFrame =
    driftOf(spark, observedFields(feed), declared)
}
