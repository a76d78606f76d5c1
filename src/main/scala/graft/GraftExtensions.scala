package graft

import graft.functions.{DotProductF, JsonPayloadHasKey}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: makes the engine's custom
  * expressions available to plain SQL users via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the supported injection
  * point for third-party Catalyst extensions — no session-internal APIs
  * involved at use sites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      (children: Seq[Expression]) => DotProductF(children(0), children(1))))
    // json_payload_has_key(value, 'after'): the R9 containsKey probe for
    // SQL users; the key must be a string literal (folded at plan time)
    ext.injectFunction((
      new FunctionIdentifier("json_payload_has_key"),
      new ExpressionInfo(classOf[JsonPayloadHasKey].getName, "json_payload_has_key"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(k, org.apache.spark.sql.types.StringType) =>
          JsonPayloadHasKey(children.head, k.toString)
        case other => throw new IllegalArgumentException(
          s"json_payload_has_key: key must be a string literal, got $other")
      }))
  }
}
