package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an append-only event log: ordered
  * funnels, cohort retention, and transition matrices — the classic
  * product-analytics trio (the reference's query surface is
  * store-level CDC; these are the downstream questions the same events
  * feed, and none of them is expressible as a single built-in operator).
  *
  * All three are engine-stable by construction: every intermediate is
  * an integer (micros, epoch weeks, counts) and each emitted double is
  * ONE division of two exactly-computed integers, so results are
  * bit-identical on any IEEE-754 engine.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, walk their events in time order and
    * record the FIRST time each step is hit strictly after the previous
    * step's time (the chained-min semantics: t₁ = min ts of step 1,
    * tᵢ = min ts of step i with ts > tᵢ₋₁). Returns one row per step:
    * users reaching it and conversion vs step 1.
    *
    * Scale shape: ONE shuffle (groupBy user) with map-side partial
    * collect; per-user state is that user's own event list — bounded by
    * per-entity activity, never by corpus size (the q51 sessionize
    * argument). Step i depends on step i−1's TIME, so the walk is
    * inherently sequential per key — the sorted-array fold is the
    * single-pass shape (a join-chain would re-shuffle the log once per
    * step). The fold is value-based (strict ts comparisons), so ties in
    * the sort order cannot change the result.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, "steps must be distinct")
    val k = steps.length
    // typed literal, not SQL-string interpolation: step names with quotes
    // or SQL metacharacters are data here, never expression text
    val stepsArr = array(steps.map(lit): _*)
    val perUser = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("ts"), col(typeCol).as("et")))).as("evs"))
      // acc = times of steps reached so far; expected step = steps(size(acc))
      .select(size(aggregate(col("evs"),
        array().cast("array<timestamp>"),
        (acc, e) =>
          when(size(acc) >= k, acc)
            .when(e.getField("et") === element_at(stepsArr, size(acc) + 1)
                && (size(acc) === 0 || e.getField("ts") > element_at(acc, -1)),
              concat(acc, array(e.getField("ts"))))
            .otherwise(acc))).as("r"))
    // coalesce: over ZERO users sum() is NULL, but the funnel's answer is 0
    val wide = perUser.agg(
      coalesce(sum(when(col("r") >= 1, 1L).otherwise(0L)), lit(0L)).as("u1"),
      (2 to k).map(i =>
        coalesce(sum(when(col("r") >= i, 1L).otherwise(0L)), lit(0L)).as(s"u$i")): _*)
    val usersArr = array((1 to k).map(i => col(s"u$i")): _*)
    wide
      .select(explode(sequence(lit(1), lit(k))).as("i"), usersArr.as("us"))
      .select(col("i").cast("long").as("step_no"),
        element_at(stepsArr, col("i")).as("step"),
        element_at(col("us"), col("i")).as("users"),
        (element_at(col("us"), col("i")).cast("double") / col("us").getItem(0)).as("conv"))
  }

  /** Weekly cohort retention: cohort = epoch week of a user's first
    * event; for each (cohort, week offset), the number of that cohort's
    * users active in that week, plus the retained fraction vs offset 0.
    *
    * Scale shape: ONE shuffle of the log (groupBy user) producing the
    * per-user (first week, distinct active weeks ≤ observation span)
    * pair, then an aggregate over the exploded per-user weeks — rows =
    * Σ active weeks per user, weeks per user bounded by the observation
    * window, so the second shuffle is a small fraction of the log. The
    * count IS the distinct-user count (one row per user per week by
    * construction) — no count(DISTINCT) rewrite, no per-key set state.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    // integer division — a double-division roundtrip can round a
    // quotient sitting just below a week boundary UP across it
    val wk = expr(s"unix_micros($tsCol) div 604800000000")
    val counts = events
      .groupBy(col(userCol))
      .agg(min(wk).as("cohort_week"), collect_set(wk).as("wks"))
      .select(col("cohort_week"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
    val w0 = Window.partitionBy(col("cohort_week"))
    counts.withColumn("retained_pct", col("users").cast("double") /
        max(when(col("week_offset") === 0L, col("users"))).over(w0))
  }

  /** Event-type transition matrix (first-order Markov): per user, each
    * consecutive (event → next event) pair under the (ts, id) tiebreak,
    * counted globally, with the per-source transition probability.
    *
    * Scale shape: one sort-shuffle by user for the lead() window —
    * partitioned by user, never a global sort — then an aggregate onto
    * the |types|² relation; the probability window runs over that tiny
    * bounded relation, not the log.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wf = Window.partitionBy(col("from_type"))
    events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        col("n").cast("double") / sum(col("n")).over(wf))
  }
}
