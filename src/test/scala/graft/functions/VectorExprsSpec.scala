package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native kernels must be bit-identical to the higher-order-function
  * formulations they replaced (which in turn match DuckDB list_reduce). */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProductExpr == aggregate(zip_with) left fold, bit for bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      (Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("hof")
    ).as[(Double, Double)].collect()
    got.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("SimHashExpr == per-bit aggregate votes") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(30)(Array.fill(20)(rnd.nextLong() & ((1L << 62) - 1)))
    val df = rows.toDF("th")
    val bits = Dedup56
    val perBit = (0 until bits).map { b =>
      val vote = aggregate(col("th"), lit(0),
        (v, h) => v + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val got = df.select(
      graft.operators.Dedup.simhashFromHashes(col("th")).as("native"),
      perBit.as("hof")
    ).as[(Long, Long)].collect()
    got.foreach { case (n, h) => assert(n == h) }
  }

  private val Dedup56 = graft.operators.Dedup.SimhashBits

  test("norm is sqrt of self-dot") {
    val v = Seq(Array(3.0, 4.0)).toDF("v")
    assert(v.select(VectorFunctions.norm(col("v"))).as[Double].head() == 5.0)
  }

  test("scalarQuantize: symmetric round-half-up, extremes hit ±range, " +
      "zero vector safe") {
    val df = Seq(
      Array(1.0, -1.0, 0.5, -0.5, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 0.0)
    ).toDF("v").withColumn("scale", VectorFunctions.maxAbs(col("v")))
    val got = df.select(
      col("scale"),
      VectorFunctions.scalarQuantize(col("v"), col("scale")).as("q"))
      .as[(Double, Seq[Long])].collect().toSeq
    // 0.5*127 = 63.5 -> floor(64.0) = 64 (half-up); -63.5+0.5 -> -63
    assert(got.head == ((1.0, Seq(127L, -127L, 64L, -63L, 0L))))
    assert(got.last == ((0.0, Seq(0L, 0L, 0L, 0L, 0L))))
  }
}
