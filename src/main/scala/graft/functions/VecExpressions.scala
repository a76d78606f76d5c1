package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftvec.VecBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `Array[Float]` columns, accumulating
  * in doubles sequentially (index order) — numerically identical to the
  * higher-order-function formulation `aggregate(zip_with(a, b, (x,y) ->
  * double(x)*double(y)), 0d, +)` but ~an order of magnitude faster: the
  * HOF path interprets a lambda per element, this is a fused primitive
  * loop inside whole-stage codegen. This is the one hot scalar kernel in
  * the engine (SURVEY §4.2.1): every kNN/ANN/near-dup pair evaluation
  * runs it 1–3 times.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(FloatType); used only through
  // VecFunctions.dotF on embedding columns, so no analyzer-level
  // coercion is registered
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  /** Column API for the codegen'd float dot product. */
  def dotF(a: Column, b: Column): Column =
    VecBridge.column(DotProductF(
      VecBridge.expression(a), VecBridge.expression(b)))

  /** Register `dot_product_f` for SQL use on a session
    * (`SELECT dot_product_f(a.embedding, b.embedding) ...`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_f", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
}
