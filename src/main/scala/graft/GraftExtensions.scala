package graft

import graft.functions.{DotProductF, JsonPayloadHasKey, JsonPayloadRaw, RepetitionStatsF}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Builders shared by the extensions path and the session-scoped
  * registry — one place for the arity and literal-key validation, so a
  * wrong SQL call fails with the function's name, not a bare
  * IndexOutOfBoundsException out of `children(1)`.
  */
private[graft] object GraftFunctionBuilders {

  def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  /** exprs(1) as the required string-literal key (folded at plan time —
    * the scanner precompiles against it).
    */
  def litKey(name: String, exprs: Seq[Expression]): String = exprs(1) match {
    case Literal(k, org.apache.spark.sql.types.StringType) if k != null =>
      k.toString
    case other => throw new IllegalArgumentException(
      s"$name: key must be a string literal, got $other")
  }

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("dot_product_f", classOf[DotProductF],
      arity("dot_product_f", 2)(e => DotProductF(e(0), e(1)))),
    // repetition_stats(tokens): the fused one-pass n-gram kernel behind
    // the q59 quality signals, as a SQL-callable struct producer
    ("repetition_stats", classOf[RepetitionStatsF],
      arity("repetition_stats", 1)(e => RepetitionStatsF(e.head))),
    // json_payload_has_key(value, 'after'): the R9 containsKey probe
    ("json_payload_has_key", classOf[JsonPayloadHasKey],
      arity("json_payload_has_key", 2)(e =>
        JsonPayloadHasKey(e.head, litKey("json_payload_has_key", e)))),
    // json_payload_raw(value, 'after'): raw payload.<key> text through
    // the single-pass scanner (the drift monitor's extraction)
    ("json_payload_raw", classOf[JsonPayloadRaw],
      arity("json_payload_raw", 2)(e =>
        JsonPayloadRaw(e.head, litKey("json_payload_raw", e)))))
}

/** SparkSessionExtensions entry point: makes the engine's custom
  * expressions available to plain SQL users via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the supported injection
  * point for third-party Catalyst extensions — no session-internal APIs
  * involved at use sites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctionBuilders.all.foreach { case (name, cls, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
        build))
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
    GraftFunctionBuilders.all.foreach { case (name, _, build) =>
      reg.createOrReplaceTempFunction(name, build, "scala_udf")
    }
    spark.udf.register("simhash_agg", udaf(graft.functions.SimHashAgg))
    spark.udf.register("countmin_agg", udaf(graft.functions.CountMinAgg))
    spark.udf.register("bloom_agg", udaf(graft.functions.BloomAgg))
    spark.udf.register("quantile_sketch_agg",
      udaf(new graft.functions.QuantileSketchAgg(400)))
    spark.udf.register("quantile_sketch_probe",
      (packed: Array[Double], p: Double) =>
        graft.functions.QuantileSketchAgg.quantile(packed, p))
  }
}
