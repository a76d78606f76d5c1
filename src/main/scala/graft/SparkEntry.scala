package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{BatchQueries, CdcQueries, EventQueries, JoinQueries, MandateQueries, PipelineQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; the
  * SQL-expressible ones also have an `oracleSql` entry the driver runs in
  * DuckDB over the same parquet tables.
  */
object SparkEntry {

  private[graft] def registry: Seq[QueryDef] =
    BatchQueries.all ++ CdcQueries.all ++ MandateQueries.all ++
      StreamingQueries.all ++ JoinQueries.all ++ PipelineQueries.all ++
      EventQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BatchQueries.q02.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
