package graft

import graft.functions.{DotProductF, JsonPayloadHasKey, RepetitionStatsF}
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
    // repetition_stats(tokens): the fused one-pass n-gram kernel behind
    // the q59 quality signals, as a SQL-callable struct producer
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsF].getName, "repetition_stats"),
      (children: Seq[Expression]) => RepetitionStatsF(children.head)))
    // json_payload_raw(value, 'after'): raw payload.<key> text through
    // the single-pass scanner (the drift monitor's extraction)
    ext.injectFunction((
      new FunctionIdentifier("json_payload_raw"),
      new ExpressionInfo(classOf[graft.functions.JsonPayloadRaw].getName,
        "json_payload_raw"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(k, org.apache.spark.sql.types.StringType) =>
          graft.functions.JsonPayloadRaw(children.head, k.toString)
        case other => throw new IllegalArgumentException(
          s"json_payload_raw: key must be a string literal, got $other")
      }))
  }
}

/** Session-scoped registration of the kernels SparkSessionExtensions
  * cannot carry: the Aggregator-based sketch builders go through
  * `spark.udf.register` (Spark's supported route for typed aggregates),
  * and the scalar kernels through the temp-function registry. One call
  * makes the whole engine surface reachable from `spark.sql`:
  *
  *   simhash_agg(h)   64-bit SimHash of a pre-hashed token column
  *   countmin_agg(h)  count-min sketch (probe via functions.CountMinAgg)
  *   bloom_agg(h)     Bloom filter (probe via functions.BloomAgg)
  *
  * All three take LONG hash inputs — hashing stays in the query, so the
  * aggregate buffers carry fixed-size integer state through the
  * shuffle, never strings. Any 64-bit hash works (`xxhash64(token)`),
  * but a sketch that will be PROBED later (count-min estimate, Bloom
  * membership) must be built with the probe side's hash:
  * `CAST(hash(token) AS BIGINT) + 2147483648` (= CountMinAgg.lift).
  */
object GraftFunctions {
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions.udaf
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product_f",
      exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("repetition_stats",
      exprs => RepetitionStatsF(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("json_payload_has_key",
      exprs => exprs(1) match {
        case Literal(k, org.apache.spark.sql.types.StringType) =>
          JsonPayloadHasKey(exprs.head, k.toString)
        case other => throw new IllegalArgumentException(
          s"json_payload_has_key: key must be a string literal, got $other")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("json_payload_raw",
      exprs => exprs(1) match {
        case Literal(k, org.apache.spark.sql.types.StringType) =>
          graft.functions.JsonPayloadRaw(exprs.head, k.toString)
        case other => throw new IllegalArgumentException(
          s"json_payload_raw: key must be a string literal, got $other")
      }, "scala_udf")
    spark.udf.register("simhash_agg", udaf(graft.functions.SimHashAgg))
    spark.udf.register("countmin_agg", udaf(graft.functions.CountMinAgg))
    spark.udf.register("bloom_agg", udaf(graft.functions.BloomAgg))
  }
}
