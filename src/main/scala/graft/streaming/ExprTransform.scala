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
  * contract, S3), not in the first micro-batch. Column resolution
  * against the actual frame happens at query ANALYSIS, which is still
  * pipeline start — never mid-stream.
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
}
