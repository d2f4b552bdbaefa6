package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
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

  /** Distinct word-n-gram shingle hashes in ONE pass over a token array:
    * for each window of `n` tokens, the pair of char folds of the
    * space-joined shingle string, packed as `f131 | (f137 << 31)`
    * (both < 2^31, so the packed value is a non-negative 62-bit long).
    *
    * Bit-identical to folding the materialized `concat_ws(" ", window)`
    * string: per-token folds and `base^len` factors are precomputed in a
    * single codepoint pass, then windows combine by the linearity of the
    * polynomial fold — `fold(A ⊕ " " ⊕ B) = ((fold(A)·base + 32) ·
    * base^|B| + fold(B)) mod P` (32 = codepoint of ' '; |B| in
    * codepoints). Every intermediate stays < 2^63 under ANSI arithmetic.
    *
    * Distinctness matches `array_distinct` over the shingle strings up to
    * fold-pair collisions (~2^-62 per in-doc pair — the same negligible
    * class as the xxhash64 join keys this replaces). Null tokens are
    * treated as empty strings (whitespace `split` never yields nulls).
    *
    * This replaces the interpreted higher-order `transform`+`concat_ws`+
    * `array_distinct` chain that dominated d04/d06/d13: one JIT-hot loop
    * per row instead of per-element Catalyst interpretation, and no
    * intermediate shingle-string array at all. */
  def shinglePack(tk: ArrayData, n: Int): ArrayData = {
    val cnt = tk.numElements()
    val m = cnt - (n - 1)
    if (m <= 0) return new GenericArrayData(new Array[Long](0))
    val f1 = new Array[Long](cnt)
    val f2 = new Array[Long](cnt)
    val p1 = new Array[Long](cnt)
    val p2 = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h1 = 0L; var h2 = 0L; var q1 = 1L; var q2 = 1L
      val s = tk.getUTF8String(i)
      if (s != null) {
        val js = s.toString
        var j = 0
        val len = js.length
        while (j < len) {
          val cp = js.codePointAt(j)
          h1 = (h1 * 131 + cp) % P
          h2 = (h2 * 137 + cp) % P
          q1 = (q1 * 131) % P
          q2 = (q2 * 137) % P
          j += Character.charCount(cp)
        }
      }
      f1(i) = h1; f2(i) = h2; p1(i) = q1; p2(i) = q2
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
    i = 0
    while (i < m) {
      var a1 = f1(i)
      var a2 = f2(i)
      var j = i + 1
      while (j < i + n) {
        a1 = (((a1 * 131 + 32) % P) * p1(j) + f1(j)) % P
        a2 = (((a2 * 137 + 32) % P) * p2(j) + f2(j)) % P
        j += 1
      }
      val packed = a1 | (a2 << 31)
      if (seen.add(packed)) { out(k) = packed; k += 1 }
      i += 1
    }
    new GenericArrayData(
      if (k == m) out else java.util.Arrays.copyOf(out, k))
  }

  /** Positional variant of [[shinglePack]]: ALL m = cnt-(n-1) window
    * hashes in window order, duplicates kept — array index IS the
    * 0-based token position of the window start. The substring-
    * duplication audit (d23) needs positions to merge overlapping
    * window intervals, which the distinct variant deliberately drops.
    * Same per-token precompute + linear window combine. */
  def shinglePackAll(tk: ArrayData, n: Int): ArrayData = {
    val cnt = tk.numElements()
    val m = cnt - (n - 1)
    if (m <= 0) return new GenericArrayData(new Array[Long](0))
    val f1 = new Array[Long](cnt)
    val f2 = new Array[Long](cnt)
    val p1 = new Array[Long](cnt)
    val p2 = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h1 = 0L; var h2 = 0L; var q1 = 1L; var q2 = 1L
      val s = tk.getUTF8String(i)
      if (s != null) {
        val js = s.toString
        var j = 0
        val len = js.length
        while (j < len) {
          val cp = js.codePointAt(j)
          h1 = (h1 * 131 + cp) % P
          h2 = (h2 * 137 + cp) % P
          q1 = (q1 * 131) % P
          q2 = (q2 * 137) % P
          j += Character.charCount(cp)
        }
      }
      f1(i) = h1; f2(i) = h2; p1(i) = q1; p2(i) = q2
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var a1 = f1(i)
      var a2 = f2(i)
      var j = i + 1
      while (j < i + n) {
        a1 = (((a1 * 131 + 32) % P) * p1(j) + f1(j)) % P
        a2 = (((a2 * 137 + 32) % P) * p2(j) + f2(j)) % P
        j += 1
      }
      out(i) = a1 | (a2 << 31)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native distinct-shingle fold hashes over an array<string> token column
  * (see CharFoldUtil.shinglePack). Output: array<long> of packed
  * `f131 | f137<<31` fold pairs, one per distinct word n-gram. */
case class ShinglePackExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_pack"

  override def nullSafeEval(input: Any): Any =
    CharFoldUtil.shinglePack(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharFoldUtil.shinglePack($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShinglePackExpr = copy(child = newChild)
}

/** Positional sibling of ShinglePackExpr: ALL window hashes in order,
  * duplicates kept, index = 0-based window start (CharFoldUtil
  * .shinglePackAll). */
case class ShinglePackAllExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_pack_all"

  override def nullSafeEval(input: Any): Any =
    CharFoldUtil.shinglePackAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharFoldUtil.shinglePackAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShinglePackAllExpr = copy(child = newChild)
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
