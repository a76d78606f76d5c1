package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Dataset}

/** Incremental SCD type-2 maintenance — the HISTORY-PRESERVING
  * complement of [[StatefulLww]]: where LWW collapses each key to its
  * batch winner (intra-batch versions unobservable downstream), this
  * operator applies a batch's accepted events IN (ts, offset) ORDER
  * against per-key state and emits one "open" delta per version plus a
  * "close" delta per delete — so a version-history view stays current
  * from deltas alone, never re-scanning the feed.
  *
  * Semantics match `Materialize.scd2Typed` exactly on ordered arrival:
  * duplicate deliveries (same key, same ts) collapse to the max-offset
  * copy WITHIN a batch and are skipped across batches (ts not greater
  * than the last accepted event's); data events open version n+1 at
  * their ts; deletes close the open version. One deliberate divergence
  * is documented: a LATE event (ts below the key's high-water mark)
  * arriving in a later batch is skipped — emitted history is
  * append-only; the batch form would have spliced it in. State per key
  * is (high-water ts, version counter, open flag) — constant size,
  * unlike the unbounded history itself.
  */
object StatefulVersions {

  case class VState(tsMs: Long, version: Int, closed: Boolean)

  /** "open": version `version` of `key` begins at `tsMs` with payload
    * `rowJson`. "close": the currently-open version ends at `tsMs`
    * (delete). Superseding opens close their predecessor implicitly —
    * the fold derives `valid_to` from the key's next delta.
    */
  case class VersionDelta(key: Long, tsMs: Long, version: Int,
      action: String, rowJson: String)

  /** Not private: Catalyst's generated SafeProjection must construct it. */
  case class In(key: Long, tsMs: Long, offset: Long, op: String, rowJson: String)

  /** @param events streaming frame with columns
    *               (key: long, ts_ms: long, offset: long, op: string,
    *               after: string JSON or null) — the [[StatefulLww]]
    *               input shape.
    */
  def versionStream(events: DataFrame): Dataset[VersionDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("key").cast("long").as("key"),
      col("ts_ms").cast("long").as("tsMs"),
      col("offset").cast("long").as("offset"),
      col("op"),
      col("after").cast("string").as("rowJson")).as[In]
    typed.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, it: Iterator[In], state: GroupState[VState]) =>
        // batch-local dup collapse: per ts keep the max-offset copy
        // (scd2Typed's rule), then apply in (ts, offset) order
        val evs = it.toVector.groupBy(_.tsMs)
          .map { case (_, g) => g.maxBy(_.offset) }
          .toVector.sortBy(e => (e.tsMs, e.offset))
        val loaded = state.getOption.getOrElse(VState(Long.MinValue, 0, true))
        var st = loaded
        val out = Vector.newBuilder[VersionDelta]
        evs.foreach { e =>
          // append-only history: same-ts redelivery and late events skip
          if (e.tsMs > st.tsMs) {
            if (e.op == "d") {
              if (!st.closed)
                out += VersionDelta(key, e.tsMs, st.version, "close", null)
              st = VState(e.tsMs, st.version, closed = true)
            } else {
              val v = st.version + 1
              out += VersionDelta(key, e.tsMs, v, "open", e.rowJson)
              st = VState(e.tsMs, v, closed = false)
            }
          }
        }
        val deltas = out.result()
        // persist whenever an event was ACCEPTED (st moved) — a
        // delete-only first batch emits nothing but must still advance
        // the high-water mark, or a later out-of-order event would be
        // admitted against the append-only contract
        if (st != loaded) state.update(st)
        deltas.iterator
    }
  }

  /** Fold a version-delta relation (live stream output or a delta log)
    * into the SCD2 history: `valid_to` of each open version is the
    * key's NEXT delta's ts (a superseding open or a close), null = still
    * current — the same lead-over-events computation as the batch
    * `Materialize.scd2Typed`, applied to deltas instead of raw events.
    */
  def scd2FromDeltas(deltas: DataFrame, rowSchema: StructType): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("tsMs"))
    deltas
      .withColumn("valid_to_ms", lead(col("tsMs"), 1).over(w))
      .filter(col("action") === "open")
      .select(col("key").as("_key"), col("version"),
        col("tsMs").as("valid_from_ms"), col("valid_to_ms"),
        from_json(col("rowJson"), rowSchema).as("after"),
        col("valid_to_ms").isNull.as("is_current"))
  }
}
