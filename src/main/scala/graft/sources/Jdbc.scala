package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source (reference reads MySQL/PostgreSQL; README also claims a
  * JDBC sink — sinks.JdbcSink). Spark's JDBC relation already does
  * predicate pushdown and column pruning into the database; the part
  * worth wrapping is PARTITIONED reads: an unpartitioned `read.jdbc` is
  * a single connection streaming the whole table through one task,
  * which is the classic single-node bottleneck at scale.
  *
  * Together with cdc.Bootstrap this completes the snapshot story: read
  * the table in parallel via JDBC, encode as op="r" events, stream the
  * deltas — R1/R2's snapshot phase without a live Debezium engine.
  */
object Jdbc {

  /** Single-connection read — small dimension tables only. */
  def table(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel read: `numPartitions` range-bounded queries on
    * `partitionCol` (a numeric/indexed column — typically the PK). Each
    * executor opens its own connection for its stride; predicates still
    * push down into every partition query.
    */
  def tablePartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)
}
