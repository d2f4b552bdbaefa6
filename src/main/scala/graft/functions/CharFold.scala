package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the portable polynomial char hash — called from both
  * the interpreted `eval` path (inside higher-order-function lambdas,
  * which Catalyst interprets) and the generated code path. One JIT-hot
  * loop per string instead of ~6 interpreted Catalyst ops per character:
  * the split+aggregate formulation of this fold was the bench bottleneck
  * of d06/d07/d08 (higher-order functions are CodegenFallback). */
object CharFoldUtil {
  val P: Long = 2147483647L // Mersenne prime 2^31-1

  def fold(s: UTF8String, base: Long): Long = {
    val js = s.toString
    var h = 0L
    var i = 0
    val n = js.length
    while (i < n) {
      val cp = js.codePointAt(i)
      h = (h * base + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Custom Catalyst expression for TextFunctions.charFold: left fold over
  * codepoints, `h = (h*base + cp) mod (2^31-1)`.
  *
  * Identical arithmetic is generated into the DuckDB oracles (SparkEntry
  * `sqlCharFold`), which is the whole point of the portable hash family:
  * MinHash/SimHash/fingerprint values are verifiable across engines. */
case class CharFoldExpr(child: Expression, base: Int)
    extends UnaryExpression {

  // input must be StringType; call sites are library-internal
  // (AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold"

  override def nullSafeEval(input: Any): Any =
    CharFoldUtil.fold(input.asInstanceOf[UTF8String], base.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharFoldUtil.fold($c, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression)
      : CharFoldExpr = copy(child = newChild)
}
