package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Conf-declared per-event column logic — the reference's dynamic
  * user-logic surface (R12: ScriptExecutor.java:167-199 runs arbitrary
  * user JavaScript per event) re-expressed the SURVEY-mandated way:
  * instead of embedding a script engine, a pipeline conf declares an
  * ORDERED list of (field, SQL expression) SET entries plus DROP
  * fields, compiled through Catalyst's `expr()`. The reshape is
  * declarative, whole-stage-codegen'd, and optimizer-visible — none of
  * which a per-event interpreter call can be — and it covers the
  * reference's observed script duties (field scrubbing/derivation/
  * renaming on the outgoing document) without arbitrary code execution
  * in the data plane.
  *
  * Expressions may reference any column of the frame they run against:
  * for [[CdcPipeline]] that is the routed envelope (`row` — the
  * outgoing document struct — plus `before`, `after`, `op`, `ts_ms`);
  * for [[ViewPipeline]] the flattened enriched serving row.
  *
  * FAIL-FAST: every expression is parsed at CONSTRUCTION, so a typo'd
  * conf dies at registration (the reference's register-at-boot
  * contract, S3), not in the first micro-batch. COLUMN resolution is
  * fail-fast too: the pipelines call [[validateStruct]]/[[validateFlat]]
  * at construction with the frame schema the transform will run on —
  * the parity of the reference compiling AND running `initCDC()` at
  * boot (ScriptExecutor.java:95-123), where a script touching a
  * nonexistent binding dies before the first event.
  */
final case class ExprTransform(sets: Seq[(String, String)],
    drops: Seq[String] = Nil) extends Serializable {

  require(sets.forall(_._1.nonEmpty) && drops.forall(_.nonEmpty),
    "transform field names must be non-empty")
  // parse-validate NOW (throws ParseException on bad syntax); the
  // compiled Columns themselves are rebuilt lazily so the case class
  // stays serialization-safe inside streaming closures. Spark 4's
  // column API defers `expr()` parsing to plan resolution, so the
  // fail-fast needs an explicit parser call.
  sets.foreach { case (_, e) =>
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(e)
    ()
  }

  @transient private lazy val compiled: Seq[(String, Column)] =
    sets.map { case (f, e) => (f, expr(e)) }

  /** Reshape the outgoing document STRUCT (CdcPipeline's `row`): SETs
    * apply in declared order via `withField` (replace or add), then
    * DROPs via `dropFields`. A null struct (op=d events have no after
    * row) passes through null, so deletes are untouched.
    */
  def applyToStruct(df: DataFrame, structCol: String = "row"): DataFrame = {
    val withSets = compiled.foldLeft(col(structCol)) {
      case (c, (f, e)) => c.withField(f, e)
    }
    val pruned =
      if (drops.isEmpty) withSets else withSets.dropFields(drops: _*)
    df.withColumn(structCol, pruned)
  }

  /** Reshape a FLAT frame (ViewPipeline's enriched serving row): SETs
    * as ordered `withColumn`s, then DROPs.
    */
  def applyFlat(df: DataFrame): DataFrame = {
    val withSets = compiled.foldLeft(df) {
      case (d, (f, e)) => d.withColumn(f, e)
    }
    drops.foldLeft(withSets)((d, f) => d.drop(f))
  }

  /** DRY-RUN RESOLUTION of the struct form against the frame schema the
    * transform will run on ([[ExprTransform.cdcFrameSchema]]): each SET
    * entry is analyzed in declared order over an empty frame, so a
    * typo'd COLUMN name (not just bad syntax) fails at registration,
    * naming the offending field; each DROP must name a field that
    * exists on the outgoing document (declared or set earlier). No
    * data moves — analysis only.
    */
  def validateStruct(spark: org.apache.spark.sql.SparkSession,
      frameSchema: org.apache.spark.sql.types.StructType,
      structCol: String = "row"): Unit = {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), frameSchema)
    var acc = col(structCol)
    sets.foreach { case (f, e) =>
      // withColumn analyzes eagerly in Spark 4 — construction itself is
      // the resolution check, so it goes inside the rethrow wrapper
      analyzeOrFail(f, e) {
        acc = acc.withField(f, expr(e))
        empty.withColumn(structCol, acc).schema
      }
    }
    val docFields = frameSchema(structCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSet ++ sets.map(_._1)
    drops.foreach { d =>
      require(docFields(d),
        s"transform drop '$d': no such field on the outgoing document " +
          s"(have ${docFields.toSeq.sorted.mkString(", ")})")
    }
  }

  /** [[validateStruct]] for the flat form (ViewPipeline's enriched
    * serving row).
    */
  def validateFlat(spark: org.apache.spark.sql.SparkSession,
      frameSchema: org.apache.spark.sql.types.StructType): Unit = {
    var empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), frameSchema)
    sets.foreach { case (f, e) =>
      analyzeOrFail(f, e) {
        empty = empty.withColumn(f, expr(e))
        empty.schema
      }
    }
    val cols = frameSchema.fieldNames.toSet ++ sets.map(_._1)
    drops.foreach { d =>
      require(cols(d),
        s"transform drop '$d': no such column on the serving row " +
          s"(have ${cols.toSeq.sorted.mkString(", ")})")
    }
  }

  private def analyzeOrFail(field: String, e: String)(body: => Any): Unit =
    try { body; () }
    catch {
      case ex: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"transform set '$field' ($e) does not resolve against the " +
            s"declared schema: ${ex.getMessage}")
    }
}

object ExprTransform {
  import org.apache.spark.sql.types._

  /** The frame shape [[CdcPipeline.changeRows]] hands the struct-form
    * transform: the typed envelope columns plus the outgoing `row`
    * struct and the extracted `key`. Must track what parseTyped +
    * changeRows expose — registration-time validation is only as honest
    * as this schema.
    */
  def cdcFrameSchema(rowSchema: StructType, idKey: String): StructType = {
    val keyType =
      rowSchema.fields.find(_.name == idKey).map(_.dataType).getOrElse(StringType)
    StructType(Seq(
      StructField("value", StringType), StructField("offset", LongType),
      StructField("op", StringType), StructField("ts_ms", LongType),
      StructField("ddl", StringType),
      StructField("src_db", StringType), StructField("src_table", StringType),
      StructField("has_payload", BooleanType),
      StructField("has_after", BooleanType),
      StructField("before", rowSchema), StructField("after", rowSchema),
      StructField("row", rowSchema), StructField("key", keyType)))
  }

  /** The flattened enriched serving row [[ViewPipeline]] hands the
    * flat-form transform: serving key + action + fact fields + dim
    * fields.
    */
  def viewFrameSchema(factSchema: StructType, dimSchema: StructType,
      factIdField: String): StructType =
    StructType(
      Seq(StructField(factIdField,
          factSchema.fields.find(_.name == factIdField).map(_.dataType)
            .getOrElse(LongType)),
        StructField("action", StringType)) ++
      factSchema.fields.filterNot(_.name == factIdField) ++ dimSchema.fields)
}
