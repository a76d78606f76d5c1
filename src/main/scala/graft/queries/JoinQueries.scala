package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Joins
import org.apache.spark.sql.functions._

/** Scale-join operators as oracle-checked queries: as-of join (DuckDB
  * has the primitive natively — ASOF JOIN — which makes a perfect
  * oracle for our compose-first window formulation) and salted skew
  * join (oracle = the plain join it must equal).
  */
object JoinQueries {

  /** Q35: per event, the value of the user's latest purchase at-or-
    * before the event's timestamp.
    */
  val q35 = QueryDef.sql(
    "q35_asof_join",
    """SELECT t.event_id, q.value AS last_purchase_value
      |FROM events t
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
      |                WHERE event_type = 'purchase') q
      |  ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val trades = ev.select(col("user_id"), col("ts"), col("event_id"))
    val quotes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    Joins.asofJoin(trades, quotes, "user_id", "ts")
      .select(col("event_id"), col("right.value").as("last_purchase_value"))
  }

  /** Q36: salted skew join must equal the plain join — aggregated per
    * segment so the oracle is the unsalted SQL.
    */
  val q36 = QueryDef.sql(
    "q36_salted_join",
    """SELECT concat('seg', CAST(user_id % 5 AS VARCHAR)) AS segment,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("value"))
    val dim = Tables.events(spark, dir).select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg"), (col("user_id") % 5).cast("string")))
    Joins.saltedJoin(ev, dim, Seq("user_id"), numSalts = 8)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Q37: range join — per-user event pairs within a 4-hour follow
    * window (the session-stitching / attribution shape). Oracle states
    * the naive range predicate; the engine runs the bin-bucketed
    * equijoin form that bounds per-key work at scale.
    */
  val q37 = QueryDef.sql(
    "q37_range_join",
    """SELECT a.user_id,
      |       a.event_id AS l_event, b.event_id AS r_event,
      |       CAST(date_diff('microsecond', a.ts, b.ts) AS BIGINT) AS gap_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_id"))
    Joins.rangeJoin(ev, ev, "user_id", "ts", windowSec = 4 * 3600)
      .select(col("l_user_id").as("user_id"),
        col("l_event_id").as("l_event"), col("r_event_id").as("r_event"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
  }

  /** Q72: interval OVERLAP join — purchase activity windows [ts, ts+2h)
    * against error windows [ts, ts+1h) per user, with the intersection
    * duration. The oracle states the naive overlap predicate; the
    * engine runs the canonical-bin equijoin (each pair emitted in
    * exactly one bin — see Joins.intervalJoin).
    */
  val q72 = QueryDef.sql(
    "q72_interval_join",
    """WITH p AS (SELECT user_id, event_id, ts AS s, ts + INTERVAL 2 HOUR AS e
      |           FROM events WHERE event_type = 'purchase'),
      |x AS (SELECT user_id, event_id, ts AS s, ts + INTERVAL 1 HOUR AS e
      |      FROM events WHERE event_type = 'error')
      |SELECT p.user_id, p.event_id AS l_event, x.event_id AS r_event,
      |       CAST(date_diff('microsecond', greatest(p.s, x.s), least(p.e, x.e))
      |            AS BIGINT) AS overlap_us
      |FROM p JOIN x
      |  ON p.user_id = x.user_id AND p.s < x.e AND x.s < p.e""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("e"))
    val x = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
    Joins.intervalJoin(p, x, "user_id", "s", "e", binSec = 2 * 3600)
      .select(col("l_user_id").as("user_id"),
        col("l_event_id").as("l_event"), col("r_event_id").as("r_event"),
        (least(unix_micros(col("l_e")), unix_micros(col("r_e"))) -
          greatest(unix_micros(col("l_s")), unix_micros(col("r_s")))).as("overlap_us"))
  }

  val all: Seq[QueryDef] = Seq(q35, q36, q37, q72)
}
