package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point money aggregation: round each value to its decimal grain
  * as an integer (floor(x·scale + 0.5) — identical IEEE double ops in
  * every engine, unlike CAST-to-DECIMAL which rounds the exact value),
  * then accumulate the integers into DECIMAL(38,0).
  *
  * Exact and order-independent like an all-DECIMAL sum, ~2× faster (the
  * hot path converts long → compact Decimal instead of running
  * BigDecimal.setScale per row), and overflow-SAFE where a raw BIGINT
  * sum is not: a micros-grain group sum passes int64 around $9.2e12 —
  * reachable in a 100 TB group — and Spark's non-ANSI long sum would
  * wrap silently there, while the decimal accumulator overflows to null
  * loudly.
  */
object FixedPoint {

  /** round(c·scale) as DECIMAL(38,0) — the per-row fixed-point term.
    * Exposed separately so grouping-sets queries can project it BEFORE
    * Expand and window queries can wrap their own `.over(w)`.
    */
  def fixed(c: Column, scale: Long): Column =
    floor(c * scale.toDouble + 0.5).cast("decimal(38,0)")

  /** Σ round(c·scale) as a double — divide by `scale` for the value. */
  def sumFixed(c: Column, scale: Long): Column =
    sum(fixed(c, scale)).cast("double")

  /** Exact order-independent money sum at 1/`scale` grain. */
  def moneySum(c: Column, scale: Long = 100): Column =
    sumFixed(c, scale) / scale.toDouble
}
