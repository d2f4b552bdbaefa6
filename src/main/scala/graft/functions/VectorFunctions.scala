package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built on Spark's
  * higher-order functions (`zip_with`/`aggregate`) so the arithmetic is
  * codegen'd and never leaves the JVM hot loop.
  *
  * Arithmetic is done in double with a left fold — the same sequential
  * order DuckDB's `list_reduce` uses, which makes results bit-identical to
  * the oracle (no rounding slop in correctness checks).
  */
object VectorFunctions {

  /** Cast array<float> -> array<double> once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native left-fold dot product (DotProductExpr): same IEEE addition
    * order as `aggregate(zip_with(...))` and DuckDB `list_reduce`, but a
    * JIT-hot loop instead of an interpreted per-element lambda. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DotProductExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  def cosine(a: Column, b: Column): Column = cosine(a, b, norm(a), norm(b))

  /** Squared L2 — the additive-across-subspaces form PQ/ADC scoring
    * needs (sqrt is monotone, so rankings agree; the native kernel
    * folds left-to-right like [[dot]], bit-identical to DuckDB's
    * list_reduce and to the `aggregate(zip_with(...))` formulation). */
  def l2Sq(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      L2SqExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def l2Distance(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Elementwise a - b (native, codegen'd) — the IVFADC residual. */
  def vecSub(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      VecSubExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Elementwise a + b — the IVFADC reconstruction. */
  def vecAdd(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      VecAddExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Per-vector max-abs amplitude — the scale factor for symmetric
    * scalar quantization. */
  def maxAbs(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) =>
      greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8-style scalar quantization: q_i = floor(x_i * range /
    * scale + 0.5) — round-half-up in DOUBLE, deterministic and identical
    * in every engine (no banker's-rounding divergence). The compression
    * step of a quantized ANN index: 4x smaller vectors, dot products on
    * ints. Pass `scale` as a MATERIALIZED column ([[maxAbs]] computed
    * once via withColumn) — interpreted HOF lambdas re-evaluate captured
    * expressions per element, so inlining the aggregate here would cost
    * O(dim²) per row. All-zero vectors (scale 0) quantize to zeros. */
  def scalarQuantize(v: Column, scale: Column, range: Int = 127): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0L)).otherwise(
        floor(x.cast("double") * range / scale + 0.5).cast("long")))

  /** Deterministic SRP hyperplanes (driver-side, tiny: nBits x dim
    * doubles). Exposed so the e03 oracle SQL can embed the exact same
    * plane values as literals — the Spark plan and the DuckDB oracle then
    * compute identical projections. */
  def srpPlanes(dim: Int, nBits: Int, seed: Long = 42L)
      : Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket (LSH for cosine): `nBits` hyperplanes,
    * deterministic from `seed`; returns a long bucket id. Planes are
    * generated driver-side and inlined as literals — tiny (nBits x dim
    * doubles) and broadcast with the plan. */
  def srpBucket(v: Column, dim: Int, nBits: Int = 16, seed: Long = 42L)
      : Column = {
    val planes = srpPlanes(dim, nBits, seed)
    planes.zipWithIndex
      .map { case (p, i) =>
        val planeLit = array(p.map(lit(_)): _*)
        val proj = aggregate(
          zip_with(v, planeLit, (x, y) => x * y),
          lit(0.0),
          (acc, x) => acc + x
        )
        when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }
}
