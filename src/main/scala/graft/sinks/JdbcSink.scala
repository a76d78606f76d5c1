package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC sink — the capability the reference README claims ("built-in
  * Elasticsearch and JDBC write support") but whose code does not exist
  * anywhere in its tree (SURVEY §2.3 scans/sinks bullet). In Spark it is
  * a thin delegation to the built-in JDBC writer; the value added here
  * is the idempotent-upsert recipe for streaming use.
  */
object JdbcSink {

  /** Plain append (batch or inside foreachBatch). */
  def append(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Overwrite a table from the frame (small dimension refresh). */
  def overwrite(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** Idempotent upsert for at-least-once streaming delivery: write the
    * micro-batch to a staging table, then MERGE on the key in one
    * transaction driver-side. Executors write the staging rows in
    * parallel; only the MERGE statement runs on one connection.
    */
  def upsertViaStaging(df: DataFrame, url: String, table: String,
      keyCols: Seq[String],
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val staging = s"${table}_stage"
    df.write.mode(SaveMode.Overwrite).jdbc(url, staging, props)
    // Spark's JDBC writer creates the staging table with quoted (case-
    // preserved) identifiers — quote everywhere so the MERGE matches.
    def q(c: String) = "\"" + c + "\""
    val cols = df.columns
    val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val sets = cols.filterNot(keyCols.contains)
      .map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
    val ins = cols.map(q).mkString(", ")
    val vals = cols.map(c => s"s.${q(c)}").mkString(", ")
    val merge =
      s"""MERGE INTO $table t USING $staging s ON ($on)
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED THEN INSERT ($ins) VALUES ($vals)""".stripMargin
    val conn = java.sql.DriverManager.getConnection(url, props)
    try { val st = conn.createStatement(); try st.execute(merge) finally st.close() }
    finally conn.close()
  }
}
