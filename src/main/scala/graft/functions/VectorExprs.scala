package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** JIT-hot kernels shared by the interpreted eval path and generated
  * code. Higher-order-function formulations of these loops are
  * CodegenFallback (interpreted per element, boxed) — measured 5-20×
  * slower on the bench hot spots (e01 pair scoring, d07 signatures). */
object VectorKernels {

  /** Left-to-right fold of a[i]*b[i] in double — bit-identical to
    * `aggregate(zip_with(a,b,*), 0.0, +)` and DuckDB's `list_reduce`
    * (same IEEE addition order), which keeps oracle parity. Iterates to
    * the shorter length; library call sites always pass equal-dim
    * vectors. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  /** Left-to-right fold of (a[i]-b[i])² in double — bit-identical to
    * `aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)), 0.0, +)` and DuckDB's
    * `list_reduce` over the same transform (same IEEE order): oracle
    * parity for PQ/ADC distances. */
  def l2sq(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** One-pass SimHash over an array of token hashes: per bit, sum of ±1
    * votes by that bit of each hash; sign -> signature bit. Equals the
    * per-bit `aggregate` formulation exactly (integer arithmetic). */
  def simhash(th: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = th.numElements()
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Native dot product over two array<double> columns. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProductExpr = copy(left = newLeft, right = newRight)
}

/** Native left-fold squared-L2 (see VectorKernels.l2sq for the oracle-
  * parity argument — same shape as DotProductExpr). */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.l2sq($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): L2SqExpr = copy(left = newLeft, right = newRight)
}

/** Native SimHash over an array<long> of token hashes (see
  * Dedup.simhashFromHashes for the semantics and oracle parity note). */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashExpr = copy(child = newChild)
}
