package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill: bucket events to a fixed grain,
  * generate each key's dense time spine (min..max bucket), and fill
  * empty buckets — count 0, value carried forward from the last
  * observed bucket (LOCF).
  *
  * Scale shape: the bucket aggregate and the (key, bucket) join are both
  * keyed and partitionable; the spine explode is bounded per key by
  * span/grain (choose the grain so a key's spine stays thousands, not
  * millions — a years-long span at second grain belongs at a coarser
  * grain or a windowed retention cut). The LOCF window sorts each key's
  * spine once, partitioned by key.
  */
object Resample {

  /** @param grain a Spark date_trunc unit ("hour", "day", ...)
    * @param step  matching interval expression, e.g. "interval 1 hour"
    *
    * Output: key, bucket `h`, `cnt` (0 on gaps), `last_val` (LOCF of the
    * fixed-point cent-grain bucket sum; null until the key's first
    * observed bucket — cannot happen here since spines start at an
    * observed bucket).
    */
  def locf(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, grain: String, step: String): DataFrame = {
    val buckets = events
      .groupBy(col(keyCol), date_trunc(grain, col(tsCol)).as("h"))
      .agg(count(lit(1)).as("cnt"),
        FixedPoint.moneySum(col(valueCol)).as("val"))
    val span = buckets.groupBy(col(keyCol))
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val spine = span.select(col(keyCol),
      explode(sequence(col("mn"), col("mx"), expr(step))).as("h"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(buckets, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        last(col("val"), ignoreNulls = true).over(w).as("last_val"))
  }
}
