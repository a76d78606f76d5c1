package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout helpers for co-located joins (SURVEY §4 / the 100 TB
  * partitioning story).
  *
  * A fact-fact join (orders ⋈ lineitem) at scale is a full shuffle of
  * both sides on every query. Bucketing both tables by the join key at
  * write time moves that shuffle to ingest: Spark's catalog records the
  * bucketing, and every subsequent equi-join on the key plans WITHOUT an
  * Exchange — each task reads matching bucket files from both sides.
  * Verified by plan assertion in BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Read a catalog table (bucketing metadata applies automatically). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Date-partitioned layout: `dt=YYYY-MM-DD/` directories so time-range
    * predicates prune at the FILE LISTING level — a day's query over a
    * year of data opens 1/365th of the files before any row is read.
    * The partition column is derived, kept alongside the original
    * timestamp (which stays full-precision for row-level filtering).
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col(tsCol)))
      .write.partitionBy("dt").mode("overwrite").parquet(path)
}
