package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FileStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readRange == full filter; candidate files shrink on a sorted " +
      "layout; out-of-span ranges read zero files but keep the schema") {
    val dir = TestSpark.tempDir("fstats") + "/ds"
    // 10 files, each a contiguous id band of 100
    spark.range(1000).select(col("id"), (col("id") * 2).as("v"))
      .orderBy("id").repartitionByRange(10, col("id"))
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    val cand = FileStats.candidateFiles(spark, dir, "id", 150.0, 249.0).get
    assert(cand.size <= 3, s"a 100-wide band should hit <=3 files: $cand")
    val got = FileStats.readRange(spark, dir, "id", 150.0, 249.0)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == (150L to 249L))
    // outside every span: zero files, empty result, schema intact
    val none = FileStats.readRange(spark, dir, "id", 5000.0, 6000.0)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
    // unknown column: conservative fallback, same result as plain filter
    assert(FileStats.candidateFiles(spark, dir, "nope", 0, 1).isEmpty)
  }

  test("writes and compaction invalidate the manifest; untrusted reads " +
      "fall back to the full scan and stay correct") {
    val dir = TestSpark.tempDir("fstats_inv") + "/ds"
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("v"))
    LakeWriter(spark, dir, WriteMode.Overwrite).write(df)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    // any write changes the file set -> stale
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")))
      .write(spark.range(100, 120).select(col("id"),
        (col("id") % 7).as("v")))
    assert(!FileStats.trusted(spark, dir),
      "delta write must invalidate the stats manifest")
    // fallback read includes the new rows (no stale pruning)
    val got = FileStats.readRange(spark, dir, "id", 90.0, 119.0).count()
    assert(got == 30)
    // rebuild, then compaction invalidates again
    FileStats.build(spark, dir)
    Compact.run(spark, dir, targetBytes = 1L << 40, zorderBy = Seq("id", "v"))
    assert(!FileStats.trusted(spark, dir),
      "compaction rewrites files -> stats must not survive")
  }
}
