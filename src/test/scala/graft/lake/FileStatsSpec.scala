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

  test("delta writes maintain the manifest incrementally; overwrite and " +
      "compaction invalidate; untrusted reads fall back and stay correct") {
    val dir = TestSpark.tempDir("fstats_inv") + "/ds"
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("v"))
    LakeWriter(spark, dir, WriteMode.Overwrite).write(df)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    // delta only ADDS files -> spans appended, trust kept (the standing
    // continuous-ingest state: no rebuild per batch)
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")))
      .write(spark.range(100, 120).select(col("id"),
        (col("id") % 7).as("v")))
    assert(FileStats.trusted(spark, dir),
      "an additive delta write must keep the stats manifest trusted")
    // pruned read covers the new rows, and the new files are indexed
    // (a band entirely inside the appended batch has candidates)
    assert(FileStats.readRange(spark, dir, "id", 90.0, 119.0).count() == 30)
    assert(FileStats.candidateFiles(spark, dir, "id", 105.0, 115.0)
      .get.nonEmpty)
    // an untrusted start means a prior write crashed mid-update: the
    // next delta must NOT blind-reseal over the gap
    FileStats.distrust(spark, dir)
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")))
      .write(spark.range(120, 130).select(col("id"),
        (col("id") % 7).as("v")))
    assert(!FileStats.trusted(spark, dir),
      "untrusted at write start must invalidate, not reseal")
    assert(FileStats.readRange(spark, dir, "id", 90.0, 129.0).count() == 40)
    // overwrite replaces files -> stale
    FileStats.build(spark, dir)
    LakeWriter(spark, dir, WriteMode.Overwrite).write(df)
    assert(!FileStats.trusted(spark, dir),
      "overwrite must invalidate the stats manifest")
    // rebuild, then compaction invalidates again
    FileStats.build(spark, dir)
    Compact.run(spark, dir, targetBytes = 1L << 40, zorderBy = Seq("id", "v"))
    assert(!FileStats.trusted(spark, dir),
      "compaction rewrites files -> stats must not survive")
  }

  test("readRange on a hive-partitioned dataset resolves partition " +
      "columns from the pruned file list (basePath), identical to the " +
      "full-scan filter") {
    val dir = TestSpark.tempDir("fstats_hive") + "/ds"
    spark.range(400)
      .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
      .repartitionByRange(8, col("id"))
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    val got = FileStats.readRange(spark, dir, "id", 100.0, 199.0)
    // the partition column must come back real, not all-null
    assert(got.filter(col("p").isNull).count() == 0,
      "hive partition column resolved to null in the pruned read")
    val expect = spark.read.parquet(dir)
      .filter(col("id") >= 100 && col("id") <= 199)
    assert(got.select("id", "p", "v").orderBy("id").collect().toSeq ==
      expect.select("id", "p", "v").orderBy("id").collect().toSeq)
    // and pruning actually pruned on the id spans
    val all = SchemaTools.listDataFiles(spark, dir)
      .count(_.endsWith(".parquet"))
    val cand = FileStats.candidateFiles(spark, dir, "id", 100.0, 199.0).get
    assert(cand.size < all, s"expected pruning: ${cand.size} of $all")
  }

  test("hive-partitioned delta gives up incrementally (partition values " +
      "live in dir names, not files) — conservative invalidate, correct " +
      "fallback") {
    val dir = TestSpark.tempDir("fstats_part") + "/ds"
    val df = spark.range(100).select(col("id"), (col("id") % 4).as("p"))
    LakeWriter(spark, dir, WriteMode.Overwrite, partitionBy = Seq("p"))
      .write(df)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")), partitionBy = Seq("p"))
      .write(spark.range(100, 110).select(col("id"), (col("id") % 4).as("p")))
    assert(!FileStats.trusted(spark, dir),
      "new files can't cover the partition column's spans -> invalidate")
    assert(FileStats.readRange(spark, dir, "id", 95.0, 109.0).count() == 15)
  }
}
