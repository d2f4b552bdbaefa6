package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue: hand-checked Morton interleave, bit i of col j at " +
      "z-bit i*c+j; nulls and degenerate spans land at the origin") {
    // bits=2 over [0,3]: bucket == value (floor(v * 3 / 3))
    val df = Seq(
      (0L, 0L), (1L, 2L), (3L, 3L), (2L, 1L)
    ).toDF("a", "b")
    val z = df.select(col("a"), col("b"),
        ZOrder.zvalue(Seq(col("a"), col("b")),
          Seq(0.0, 0.0), Seq(3.0, 3.0), bits = 2).as("z"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // a=1 (01), b=2 (10): z = a0<<0 | b0<<1 | a1<<2 | b1<<3 = 1 + 8
    assert(z((1L, 2L)) == 9L)
    assert(z((0L, 0L)) == 0L)
    assert(z((3L, 3L)) == 15L) // all four interleaved bits set
    assert(z((2L, 1L)) == 6L) // a=10, b=01 -> 0b0110
    // null value -> bucket 0; degenerate span (min == max) -> bucket 0
    val nz = Seq((Option.empty[Long], 3L)).toDF("a", "b")
      .select(ZOrder.zvalue(Seq(col("a"), col("b")),
        Seq(0.0, 5.0), Seq(3.0, 5.0), bits = 2).as("z"))
      .as[Long].head()
    assert(nz == 0L)
  }

  test("cluster: content is a multiset no-op and BOTH dimensions' " +
      "per-file spans narrow vs a linear sort") {
    // 64x64 uniform grid, ids encode the cell
    val grid = spark.range(4096)
      .select(col("id"), (col("id") % 64).as("x"), expr("id div 64").as("y"))
    val lin = TestSpark.tempDir("zorder_lin")
    val zo = TestSpark.tempDir("zorder_zo")
    grid.orderBy("x").write.mode("overwrite").parquet(lin)
    ZOrder.cluster(grid, Seq("x", "y"), numFiles = 16)
      .write.mode("overwrite").parquet(zo)

    def spanFrac(dir: String, c: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("__f"))
        .agg((max(col(c)) - min(col(c))).cast("double").as("w"))
        .agg(avg("w")).head().getDouble(0) / 63.0

    // z-order: ~4-way split per dimension with 16 files
    assert(spanFrac(zo, "x") < 0.5, s"x span ${spanFrac(zo, "x")}")
    assert(spanFrac(zo, "y") < 0.5, s"y span ${spanFrac(zo, "y")}")
    // the linear layout's trailing column y spans ~the full range
    assert(spanFrac(lin, "y") > 0.8)
    // multiset no-op
    val a = spark.read.parquet(zo).as[(Long, Long, Long)].collect().sorted
    val b = grid.as[(Long, Long, Long)].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("Compact.run(zorderBy): forces the layout rewrite even when the " +
      "leaf is already right-sized, content preserved") {
    val root = TestSpark.tempDir("zorder_compact") + "/ds"
    val df = spark.range(2000)
      .select(col("id"), (col("id") % 50).as("x"),
        pmod(col("id") * 7919L, lit(50L)).as("y"))
    df.coalesce(1).write.mode("overwrite").parquet(root)
    // huge target -> 1 bin; a plain compact would skip, zorder must not
    val stats = Compact.run(spark, root, targetBytes = 1L << 40,
      zorderBy = Seq("x", "y"))
    assert(stats.rewritten == 1 && stats.filesAfter == 1)
    val back = spark.read.parquet(root)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(back.toSeq == df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq)
    // within the single file, rows follow the z-curve: monotone zval
    val mins = Seq(0.0, 0.0)
    val maxs = Seq(49.0, 49.0)
    val zseq = spark.read.parquet(root)
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), mins, maxs).as("z"))
      .as[Long].collect()
    assert(zseq.sameElements(zseq.sorted), "rows must be z-sorted in-file")
  }
}
