package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftvec.VecBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/** All banded sign-LSH bucket ids for one embedding in a single pass:
  * `bands` bands × `bandPlanes` hyperplanes each; output[b] packs the
  * sign bits of band b's planes into an int (0 .. 2^bandPlanes-1).
  *
  * One fused loop over a flattened plane matrix replaces `bands ×
  * bandPlanes` separate DotProductF calls — at 80 bands × 4 planes that
  * is 320 projection expressions collapsed into one, keeping the
  * projection inside a single whole-stage-codegen method instead of
  * overflowing Janino's 64KB limit.
  */
case class SignBandsF(child: Expression, planes: Array[Float],
    bands: Int, bandPlanes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_bands_f"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val out = new Array[Int](bands)
    var b = 0
    var off = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < bandPlanes) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * planes(off + i).toDouble
          i += 1
        }
        if (acc > 0) bucket |= (1 << j)
        off += dim
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("signPlanes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int[] $out = new int[$bands];
         |int $off = 0;
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bandPlanes; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $a.getFloat($i)) * ((double) $planesRef[$off + $i]);
         |    }
         |    if ($acc > 0) $bucket |= (1 << $j);
         |    $off += $dim;
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecFunctions {
  /** Column API for the codegen'd float dot product. */
  def dotF(a: Column, b: Column): Column =
    VecBridge.column(DotProductF(
      VecBridge.expression(a), VecBridge.expression(b)))

  /** Column API for the fused banded sign-LSH signature. */
  def signBandsF(emb: Column, planes: Array[Float],
      bands: Int, bandPlanes: Int, dim: Int): Column =
    VecBridge.column(SignBandsF(
      VecBridge.expression(emb), planes, bands, bandPlanes, dim))

  /** Register `dot_product_f` for SQL use on a session
    * (`SELECT dot_product_f(a.embedding, b.embedding) ...`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_f", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
}
