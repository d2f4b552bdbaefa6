package graft.lake

import java.sql.Date

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HiddenPartitionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanned(df: DataFrame): Long =
    df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum

  private def fixture(n: Int): DataFrame =
    (0 until n).map { i =>
      (i.toLong, Date.valueOf(f"202${i % 3}-${i % 12 + 1}%02d-15"),
        s"u${i % 7}")
    }.toDF("id", "day", "user")

  test("predicate extraction: eq / IN / ranges, both orientations") {
    val p = HiddenPartitions.extract(spark,
      "a = 5 AND 7 > b AND b >= 2 AND c IN ('x','y') AND " +
        "d BETWEEN 10 AND 20 AND e + 1 = 9")
    assert(p.eqIn("a") == Seq("5"))
    assert(p.lo("b") == "2" && p.hi("b") == "7")
    assert(p.eqIn("c") == Seq("'x'", "'y'"))
    assert(p.lo("d") == "10" && p.hi("d") == "20")
    assert(!p.eqIn.contains("e"), "non-attribute side must be ignored")
  }

  test("month transform: range predicate prunes the hive listing, " +
      "mid-month bounds stay exact via the residual filter") {
    val dir = TestSpark.tempDir("hp_month")
    HiddenPartitions.init(spark, dir, HiddenPartitions.Month("day"))
    HiddenPartitions.write(spark, dir, fixture(600), mode = "overwrite")
    val pred = "day >= DATE '2021-03-10' AND day <= DATE '2021-05-20'"
    val pruned = HiddenPartitions.read(spark, dir, Some(pred))
    val full = HiddenPartitions.read(spark, dir, None)
    assert(scanned(pruned) < scanned(full), "listing must shrink")
    val expect = full.filter(pred).select("id").as[Long].collect().sorted
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      expect.toSeq)
    assert(pruned.columns.toSeq == Seq("id", "day", "user"),
      "hidden column must never surface")
  }

  test("bucket transform: equality and IN prune; ranges do not") {
    val dir = TestSpark.tempDir("hp_bucket")
    HiddenPartitions.init(spark, dir, HiddenPartitions.Bucket(8, "id"))
    HiddenPartitions.write(spark, dir, fixture(400), mode = "overwrite")
    val eq = HiddenPartitions.read(spark, dir, Some("id = 37"))
    val full = HiddenPartitions.read(spark, dir, None)
    assert(scanned(eq) < scanned(full))
    assert(eq.select("id").as[Long].collect().toSeq == Seq(37L))
    val in = HiddenPartitions.read(spark, dir, Some("id IN (3, 5)"))
    assert(scanned(in) < scanned(full))
    assert(in.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 5L))
    // a range admits no bucket pruning — full scan, still correct
    val rng = HiddenPartitions.read(spark, dir, Some("id >= 390"))
    assert(scanned(rng) == scanned(full))
    assert(rng.count() == 10)
  }

  test("unparseable / OR predicates prune nothing but stay correct") {
    val dir = TestSpark.tempDir("hp_or")
    HiddenPartitions.init(spark, dir, HiddenPartitions.Bucket(4, "id"))
    HiddenPartitions.write(spark, dir, fixture(100), mode = "overwrite")
    val or = HiddenPartitions.read(spark, dir, Some("id = 1 OR id = 99"))
    assert(or.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 99L))
  }

  test("spec evolution: old layout untouched, each subtree prunes by " +
      "its own transform") {
    val dir = TestSpark.tempDir("hp_evolve")
    val df = fixture(500)
    HiddenPartitions.init(spark, dir, HiddenPartitions.Bucket(4, "id"))
    HiddenPartitions.write(spark, dir, df.filter(col("id") < 250))
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes(sub: String): Map[String, Long] = {
      val it = fs.listFiles(new Path(dir, sub), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          b += s.getPath.toString -> s.getModificationTime
      }
      b.result()
    }
    val before = mtimes("spec-0")
    HiddenPartitions.evolve(spark, dir, HiddenPartitions.Month("day"))
    HiddenPartitions.write(spark, dir, df.filter(col("id") >= 250))
    assert(mtimes("spec-0") == before,
      "evolution must not rewrite the old layout")
    val all = HiddenPartitions.read(spark, dir, None)
    assert(all.count() == 500)
    // eq on id prunes spec-0 only; spec-1 has no admissible transform
    val eq = HiddenPartitions.read(spark, dir, Some("id = 7"))
    assert(eq.select("id").as[Long].collect().toSeq == Seq(7L))
    assert(scanned(eq) < scanned(all))
    // range on day prunes spec-1 only
    val rng = HiddenPartitions.read(spark, dir,
      Some("day >= DATE '2021-01-01' AND day <= DATE '2021-12-31'"))
    assert(scanned(rng) < scanned(all))
    val expect = all
      .filter("day >= DATE '2021-01-01' AND day <= DATE '2021-12-31'")
      .count()
    assert(rng.count() == expect)
  }

  test("truncate transform: width buckets admit range pruning") {
    val dir = TestSpark.tempDir("hp_trunc")
    HiddenPartitions.init(spark, dir,
      HiddenPartitions.Truncate(100L, "id"))
    HiddenPartitions.write(spark, dir, fixture(1000), mode = "overwrite")
    val pruned = HiddenPartitions.read(spark, dir,
      Some("id >= 250 AND id < 450"))
    val full = HiddenPartitions.read(spark, dir, None)
    assert(scanned(pruned) < scanned(full))
    assert(pruned.count() == 200)
  }

  test("specs round-trip through _partition_spec.json") {
    val dir = TestSpark.tempDir("hp_spec")
    HiddenPartitions.init(spark, dir, HiddenPartitions.Bucket(16, "k"))
    HiddenPartitions.evolve(spark, dir, HiddenPartitions.Truncate(7L, "v"))
    HiddenPartitions.evolve(spark, dir, HiddenPartitions.Days("ts"))
    assert(HiddenPartitions.readSpecs(spark, dir) == Seq(
      HiddenPartitions.Bucket(16, "k"),
      HiddenPartitions.Truncate(7L, "v"),
      HiddenPartitions.Days("ts")))
  }
}
