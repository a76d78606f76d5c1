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

/** Codegen'd MinHash signature over an `Array[Long]` of (already
  * reduced, non-negative) shingle hashes: out[p] = min over h of
  * (h·a[p] + b[p]) mod P — the exact arithmetic of the HOF form
  * `transform(coeffs, c -> array_min(transform(hs, h -> ...)))` as one
  * fused primitive loop (the HOF path interprets perms×shingles
  * lambdas per row; measured ~3.5s per 2500 docs at 64 perms vs
  * negligible here). Both factors < 2^31 so products never overflow.
  */
case class MinHashSigF(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_f"

  override def nullSafeEval(v: Any): Any =
    MinHashSigF.compute(v.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MinHashSigF.compute($v, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigF {
  private val Prime = 2147483647L

  def compute(hs: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](as.length)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < as.length) {
        val v = (h * as(p) + bs(p)) % Prime
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The `n` nearest-by-cosine cell ids (ascending by (−dot·invNorm, id))
  * for one embedding against a flattened centroid matrix, in one fused
  * pass. ‖emb‖ is a common positive factor across cells and is omitted —
  * it cannot change the ordering. One expression replaces nCells
  * struct(dot, id) constructions plus an array_sort comparator: the
  * inline-literal formulation took Janino ~2.5 s to compile per plan
  * (measured); this compiles in milliseconds and evaluates the same
  * ordering (selection sort over nCells scores — n and nCells are both
  * small for a coarse quantizer).
  */
case class NearestCellsF(child: Expression, cents: Array[Float],
    invNorms: Array[Double], nCells: Int, dim: Int, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells_f"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = math.min(x.numElements(), dim)
    val scores = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < d) {
        acc += x.getFloat(i).toDouble * cents(off + i).toDouble
        i += 1
      }
      scores(c) = -acc * invNorms(c)
      c += 1
    }
    val k = math.min(n, nCells)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nCells)
    var t = 0
    while (t < k) {
      var best = -1
      var c2 = 0
      while (c2 < nCells) {
        if (!used(c2) && (best < 0 || scores(c2) < scores(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cellCents", cents, "float[]")
    val normsRef = ctx.addReferenceObj("cellInvNorms", invNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val scores = ctx.freshName("scores")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val c2 = ctx.freshName("c2")
      s"""
         |int $d = java.lang.Math.min($a.numElements(), $dim);
         |double[] $scores = new double[$nCells];
         |for (int $c = 0; $c < $nCells; $c++) {
         |  double $acc = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $centsRef[$off + $i]);
         |  }
         |  $scores[$c] = -$acc * $normsRef[$c];
         |}
         |int $k = java.lang.Math.min($n, $nCells);
         |int[] $out = new int[$k];
         |boolean[] $used = new boolean[$nCells];
         |for (int $t = 0; $t < $k; $t++) {
         |  int $best = -1;
         |  for (int $c2 = 0; $c2 < $nCells; $c2++) {
         |    if (!$used[$c2] && ($best < 0 || $scores[$c2] < $scores[$best])) $best = $c2;
         |  }
         |  $used[$best] = true;
         |  $out[$t] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: the float vector is split into `m`
  * subspaces of `dsub` dims; output[j] is the index (0..ks-1) of the
  * codebook centroid with minimum L2 distance to subvector j (ties →
  * lower index, so codes are deterministic). `codebook` is flat
  * row-major (j*ks + k)*dsub. One fused loop — m×ks×dsub mults per
  * row — mirroring SignBandsF/NearestCellsF (separate per-subspace
  * expressions would blow up codegen size and Janino compile time).
  *
  * PQ is the 100 TB memory story for ANN: an encoded vector is m bytes
  * (8 here) instead of dim×4 (256) — the index fits in RAM at corpus
  * sizes where raw vectors cannot (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011).
  */
case class PqEncodeF(child: Expression, codebook: Array[Float],
    m: Int, ks: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_f"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ks) {
        var acc = 0.0
        var i = 0
        val xo = j * dsub
        val co = (j * ks + k) * dsub
        while (i < dsub) {
          val d = x.getFloat(xo + i).toDouble - codebook(co + i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = k }
        k += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $k = 0; $k < $ks; $k++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $dv = ((double) $a.getFloat($j * $dsub + $i))
         |        - ((double) $cbRef[($j * $ks + $k) * $dsub + $i]);
         |      $acc += $dv * $dv;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $k; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC (asymmetric distance computation) table for one query vector:
  * output[j*ks + k] = dot(query subvector j, codebook centroid (j,k)),
  * accumulated in doubles sequentially (deterministic). Computed ONCE
  * per query; each (query, code) pair then scores with `m` table
  * lookups instead of `dim` multiplications — the lookup is the whole
  * point of PQ search (8 adds vs 64 mult-adds here).
  */
case class PqAdcTableF(child: Expression, codebook: Array[Float],
    m: Int, ks: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table_f"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var k = 0
      while (k < ks) {
        var acc = 0.0
        var i = 0
        val xo = j * dsub
        val co = (j * ks + k) * dsub
        while (i < dsub) {
          acc += x.getFloat(xo + i).toDouble * codebook(co + i).toDouble
          i += 1
        }
        out(j * ks + k) = acc
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("adcCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $out = new double[$m * $ks];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $k = 0; $k < $ks; $k++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      $acc += ((double) $a.getFloat($j * $dsub + $i))
         |        * ((double) $cbRef[($j * $ks + $k) * $dsub + $i]);
         |    }
         |    $out[$j * $ks + $k] = $acc;
         |  }
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

  /** Column API for the fused n-nearest-centroids kernel. `cents` is
    * row-major nCells×dim; norms are computed here once.
    */
  def nearestCellsF(emb: Column, cents: Array[Array[Float]], n: Int): Column = {
    val nCells = cents.length
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val flat = new Array[Float](nCells * dim)
    val invNorms = new Array[Double](nCells)
    cents.zipWithIndex.foreach { case (cv, c) =>
      System.arraycopy(cv, 0, flat, c * dim, dim)
      val nrm = math.sqrt(cv.map(x => x.toDouble * x).sum)
      invNorms(c) = if (nrm > 0) 1.0 / nrm else 0.0
    }
    VecBridge.column(NearestCellsF(
      VecBridge.expression(emb), flat, invNorms, nCells, dim, n))
  }

  /** Column API for the PQ encoder (codes j = argmin-L2 subspace
    * centroid). `codebook` is flat (j*ks + k)*dsub row-major.
    */
  def pqEncodeF(emb: Column, codebook: Array[Float],
      m: Int, ks: Int, dsub: Int): Column =
    VecBridge.column(PqEncodeF(
      VecBridge.expression(emb), codebook, m, ks, dsub))

  /** Column API for the per-query ADC lookup table. */
  def pqAdcTableF(emb: Column, codebook: Array[Float],
      m: Int, ks: Int, dsub: Int): Column =
    VecBridge.column(PqAdcTableF(
      VecBridge.expression(emb), codebook, m, ks, dsub))

  /** Register `dot_product_f` for SQL use on a session
    * (`SELECT dot_product_f(a.embedding, b.embedding) ...`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_f", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
}
