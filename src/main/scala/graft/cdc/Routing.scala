package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-pipeline db/table subscription routing.
  *
  * The reference DECLARES this (scripts carry databases/tables sets and
  * `initCDC()` exists to register them) but never enforces it — every
  * event is broadcast to every subscriber (SURVEY §2.4.2; reference:
  * DebeziumEngineRecordHandler.java:150-152,181-183). We implement the
  * intended semantics: each pipeline filters the shared bronze stream on
  * `(source.db, source.table)`. The predicate is a codegen'd IN-filter
  * applied before any shuffle, so at scale each pipeline reads only its
  * slice.
  */
final case class Subscription(databases: Set[String], tables: Set[String]) {
  def route(df: DataFrame): DataFrame = {
    val byDb = if (databases.isEmpty) lit(true)
      else col("src_db").isin(databases.toSeq: _*)
    val byTable = if (tables.isEmpty) lit(true)
      else col("src_table").isin(tables.toSeq: _*)
    df.filter(byDb && byTable)
  }
}
