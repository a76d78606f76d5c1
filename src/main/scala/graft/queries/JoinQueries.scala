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

  val all: Seq[QueryDef] = Seq(q35, q36)
}
