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

  /** ADDITIVE merge for incrementally-maintained views: matched rows
    * get `t.c = t.c + s.c` for every `addCol` (the per-batch NET
    * contribution — cdc.IncrementalAgg.contributions), unmatched rows
    * insert, and rows whose `zeroGuard` column reaches 0 are deleted
    * (a fully-retracted group leaves the view, matching the snapshot
    * aggregate). Same staging-table shape as [[upsertViaStaging]].
    *
    * UNLIKE an id-keyed upsert, adding is NOT idempotent — foreachBatch
    * is at-least-once, and a replayed micro-batch would double-count.
    * Pass the foreachBatch `batchId` and the merge becomes exactly-once:
    * the batch id inserts into `<table>_progress` in the SAME
    * transaction as the merge, so a replay hits the primary key and the
    * whole transaction rolls back as already-applied.
    */
  def mergeAdditive(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], addCols: Seq[String], zeroGuard: String,
      props: java.util.Properties = new java.util.Properties(),
      stagingColumnTypes: String = null, batchId: Long = -1L): Unit = {
    val staging = s"${table}_stage"
    // string MERGE keys need an explicit staging type on engines that
    // map StringType to an incomparable LOB (Derby: VARCHAR vs CLOB)
    val w0 = df.write.mode(SaveMode.Overwrite)
    val w = if (stagingColumnTypes == null) w0
      else w0.option("createTableColumnTypes", stagingColumnTypes)
    w.jdbc(url, staging, props)
    def q(c: String) = "\"" + c + "\""
    val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val sets = addCols.map(c => s"t.${q(c)} = t.${q(c)} + s.${q(c)}").mkString(", ")
    val ins = (keyCols ++ addCols).map(q).mkString(", ")
    val vals = (keyCols ++ addCols).map(c => s"s.${q(c)}").mkString(", ")
    val merge =
      s"""MERGE INTO $table t USING $staging s ON ($on)
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED THEN INSERT ($ins) VALUES ($vals)""".stripMargin
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      if (batchId >= 0) ensureProgressTable(conn, table)
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        if (batchId >= 0) st.execute(
          s"INSERT INTO ${table}_progress (batch_id) VALUES ($batchId)")
        st.execute(merge)
        st.execute(s"DELETE FROM $table WHERE ${q(zeroGuard)} = 0")
        conn.commit()
      } catch {
        case e: java.sql.SQLIntegrityConstraintViolationException =>
          conn.rollback() // replayed batch: already applied, skip whole
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  private def ensureProgressTable(conn: java.sql.Connection, table: String): Unit = {
    val st = conn.createStatement()
    try st.execute(
      s"CREATE TABLE ${table}_progress (batch_id BIGINT NOT NULL PRIMARY KEY)")
    catch { case _: java.sql.SQLException => () } // exists
    finally st.close()
  }
}
