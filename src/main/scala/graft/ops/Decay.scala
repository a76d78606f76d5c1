package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exponentially time-decayed aggregates — the recency-weighted feature
  * shape (user activity scores, trending signals): each event
  * contributes `value · exp(−Δt/τ)` against a reference time, so recent
  * behavior dominates without a hard window cutoff.
  *
  * Shape at scale: the reference time is a 1-row column-pruned reduce
  * broadcast back to the scan, the decay weight is per-row codegen'd
  * arithmetic, and the whole operator is then ONE keyed aggregate with
  * map-side partials — the same cost as a plain grouped sum. All decay
  * terms are positive (no cancellation), so the float sum stays at
  * machine-epsilon relative error at any group size.
  */
object Decay {

  /** Per `keyCol`: event count and the τ-decayed sum of `valueCol`,
    * referenced to the corpus-max timestamp (deterministic — no
    * wall-clock in the result).
    */
  def decayedSum(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: Column, tauSec: Long): DataFrame = {
    val refT = df.agg(max(unix_micros(col(tsCol))).as("_T"))
    df.crossJoin(broadcast(refT)) // 1-row reference time
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(valueCol * exp((col("_T") - unix_micros(col(tsCol))).cast("double")
          / lit(-tauSec * 1e6))).as("decayed_sum"))
  }

  /** The per-row decay weight alone, for composing into other
    * aggregates: exp(−(refT − ts)/τ), timestamps in microseconds.
    */
  def weight(tsUs: Column, refTUs: Column, tauSec: Long): Column =
    exp((refTUs - tsUs).cast("double") / lit(-tauSec * 1e6))
}
