package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The `aggregate(zip_with(...))` higher-order-function formulation in
  * [[Vectors]] is oracle-friendly but interpreted: each evaluation allocates
  * a lambda frame per element. These expressions generate a tight primitive
  * `for` loop inside whole-stage codegen instead — the difference is ~10×
  * on pairwise workloads (4M-pair near-dup self-join at sf0.1).
  *
  * Numerical contract: identical results to the HOF formulation — both
  * accumulate left-to-right in double precision, so scores still
  * hash-match the DuckDB oracle after rounding (cross-checked in
  * FunctionsSpec).
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over two array&lt;double&gt; columns (length = min of the two). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Σ (aᵢ−bᵢ)² — squared euclidean distance. */
  case class SquaredDistance(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_sqdist"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $a.getDouble($i) - $b.getDouble($i);
           |  $s += $d * $d;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SquaredDistance =
      copy(left = newLeft, right = newRight)
  }

  /** Packed sign-LSH sketch: bit b of the result = [Σ_d v[d]·planes[b·dim+d] ≥ 0].
    *
    * `planes` is the row-major nBits×dim hyperplane matrix (±1 entries),
    * precomputed on the driver and shipped as a codegen reference object —
    * one expression NODE regardless of nBits·dim. The unrolled
    * `element_at`-sum formulation this replaces built a 2048-term tree whose
    * per-query Catalyst analysis/optimization cost (~10 s) dwarfed the
    * actual scan; the loop below does the same arithmetic (identical
    * left-to-right double accumulation per bit, so the produced bits are
    * bit-identical) inside whole-stage codegen.
    *
    * Dimensions beyond the vector's length contribute 0 (min-length rule,
    * same as [[DotProduct]]). */
  case class SignSketch(child: Expression, planes: Array[Double], nBits: Int, dim: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(nBits >= 1 && nBits <= 62, s"sketch bits $nBits must fit a long")
    require(planes.length == nBits * dim, "planes must be row-major nBits x dim")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sign_sketch"

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = math.min(dim, v.numElements())
      var sk = 0L
      var b = 0
      while (b < nBits) {
        var s = 0.0
        var d = 0
        val off = b * dim
        while (d < n) { s += v.getDouble(d) * planes(off + d); d += 1 }
        if (s >= 0) sk |= 1L << b
        b += 1
      }
      sk
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("signPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n")
        val sk = ctx.freshName("sk")
        val b = ctx.freshName("b")
        val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val off = ctx.freshName("off")
        s"""
           |int $n = java.lang.Math.min($dim, $v.numElements());
           |long $sk = 0L;
           |for (int $b = 0; $b < $nBits; $b++) {
           |  double $s = 0.0;
           |  int $off = $b * $dim;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $s += $v.getDouble($d) * $planesRef[$off + $d];
           |  }
           |  if ($s >= 0) $sk |= 1L << $b;
           |}
           |${ev.value} = $sk;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): SignSketch =
      copy(child = newChild)
  }
}
