package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): assign a per-user session
  * number that increments whenever the gap to the previous event exceeds
  * `gapUs`. The BATCH counterpart of the streaming `session_window`
  * (StreamingQueries q24b) with matching break semantics: a gap of
  * exactly `gapUs` stays in-session (session_window merges on gap ==
  * timeout; the break is strictly greater).
  *
  * Two window passes over the same (user, ts, id) sort order — Spark
  * computes both in ONE shuffle + sort since the window specs match.
  * Session numbers are 1-based and deterministic under the (ts, id)
  * tiebreak.
  */
object Sessions {

  def assign(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - prev > gapUs, 1L).otherwise(0L)
    events.withColumn("session_no", sum(brk).over(run))
  }
}
