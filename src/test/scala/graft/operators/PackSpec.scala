package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = spark.read
    .parquet(s"${TestSpark.sfDir}/documents.parquet")
    .select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
      TextFunctions.charFold(col("text"), 131).as("h"))

  test("packOffsets equals a driver-side prefix sum over the global " +
      "(hash, id) order") {
    val got = Pack.packOffsets(base, "doc_id", "n_tokens", "h")
      .select("doc_id", "n_tokens", "start_off")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val rows = base.as[(Long, Long, Long)].collect().sortBy(r => (r._3, r._1))
    var cum = 0L
    rows.foreach { case (id, w, _) =>
      assert(got(id) == cum, s"doc $id: got ${got(id)}, want $cum")
      cum += w
    }
    assert(got.size == rows.length)
  }

  test("offsets are invariant to input partitioning and strip count") {
    val a = Pack.packOffsets(base, "doc_id", "n_tokens", "h")
      .select("doc_id", "start_off").as[(Long, Long)].collect().toSet
    val b = Pack.packOffsets(base.repartition(7), "doc_id", "n_tokens", "h")
      .select("doc_id", "start_off").as[(Long, Long)].collect().toSet
    val c = Pack.packOffsets(base, "doc_id", "n_tokens", "h",
        stripBits = 0) // degenerate: one strip = the naive global window
      .select("doc_id", "start_off").as[(Long, Long)].collect().toSet
    assert(a == b && a == c)
  }

  test("chunk spans tile the concatenated token stream exactly") {
    val C = 64
    val out = Pack.packChunks(base, "doc_id", "n_tokens", "h", window = C)
      .select("n_tokens", "start_off", "first_chunk", "last_chunk",
        "n_chunks")
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = out.map(_._1).sum
    // spans are disjoint and cover [0, total)
    assert(out.map(r => r._2 + r._1).max == total)
    out.foreach { case (w, off, first, last, n) =>
      assert(first == off / C)
      assert(last == (off + w - 1) / C)
      assert(n == last - first + 1)
    }
    // every context window below the corpus end is touched by some doc
    val touched = out.flatMap(r => r._3 to r._4).toSet
    assert(touched == (0L until (total + C - 1) / C).toSet)
  }

  test("stratified packOffsets == running packOffsets per stratum " +
      "independently") {
    val withLang = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tokens"),
        TextFunctions.charFold(col("text"), 131).as("h"))
    val strat = Pack.packOffsets(withLang, "doc_id", "n_tokens", "h",
        strataCols = Seq("lang"))
      .select("doc_id", "start_off").as[(Long, Long)].collect().toMap
    val langs = withLang.select("lang").distinct().as[String].collect()
    langs.foreach { l =>
      val solo = Pack.packOffsets(withLang.filter($"lang" === l),
          "doc_id", "n_tokens", "h")
        .select("doc_id", "start_off").as[(Long, Long)].collect()
      solo.foreach { case (id, off) =>
        assert(strat(id) == off,
          s"stratified offset for doc $id (lang $l) diverges")
      }
    }
  }

  test("shard-partitioned pack layout prunes to the requested shard " +
      "on read") {
    val dir = graft.TestSpark.tempDir("packshards")
    Pack.packChunks(base, "doc_id", "n_tokens", "h", window = 64)
      .withColumn("shard", expr("first_chunk div 4"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("shard") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("(shard"),
      s"shard predicate must prune partitions:\n$plan")
    assert(one.count() > 0)
  }

  test("the corpus-wide window is strip-partitioned (only the 2^stripBits " +
      "strip totals see a single-partition window)") {
    val plan = Pack.packOffsets(base, "doc_id", "n_tokens", "h")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"expected strip-partitioned window:\n$plan")
  }
}
