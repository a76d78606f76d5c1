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
}
