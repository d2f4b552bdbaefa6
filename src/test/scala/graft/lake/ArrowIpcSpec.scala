package graft.lake

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArrowIpcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IPC roundtrip preserves rows, schema, and mixed types") {
    val dir = TestSpark.tempDir("ipc")
    val df = Seq(
      (1L, "alpha", 1.5, true, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "beta", -0.25, false, Timestamp.valueOf("2024-06-15 12:30:00")),
      (3L, null.asInstanceOf[String], 0.0, true,
        null.asInstanceOf[Timestamp])
    ).toDF("id", "name", "score", "flag", "ts")
    val n = ArrowIpc.write(df, s"$dir/t.arrow")
    assert(n == 3)
    val back = ArrowIpc.read(spark, s"$dir/t.arrow")
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val a = df.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("IPC roundtrip preserves array columns (embeddings shape)") {
    val dir = TestSpark.tempDir("ipcarr")
    val df = Seq(
      (1L, Array(0.1f, 0.2f, 0.3f)),
      (2L, Array(-1.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    ArrowIpc.write(df, s"$dir/e.feather")
    val back = ArrowIpc.read(spark, s"$dir/e.feather")
    val m = back.as[(Long, Seq[Float])].collect().toMap
    assert(m(1L) == Seq(0.1f, 0.2f, 0.3f))
    assert(m(2L) == Seq(-1.0f, 0.0f, 1.0f))
  }

  test("LakeReader dispatches .arrow / directory of IPC files") {
    val dir = TestSpark.tempDir("ipcdir")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    ArrowIpc.write(df.filter($"id" === 1), s"$dir/part-0.arrow")
    ArrowIpc.write(df.filter($"id" === 2), s"$dir/part-1.arrow")
    assert(SchemaTools.inferFormat(spark, dir) == "ipc")
    val back = LakeReader.fromPath(spark, dir).load()
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("id", "v"))
    // pipeline composes on top of the IPC scan like any other format
    val filtered = LakeReader(spark, dir, "ipc").filter("id = 2").load()
    assert(filtered.select("v").as[String].collect().toSeq == Seq("b"))
  }

  test("zstd-compressed IPC (the reference writer's default) round-trips") {
    val dir = TestSpark.tempDir("ipczstd")
    val df = spark.range(500)
      .selectExpr("id", "repeat('compressible ', 20) AS pad")
    ArrowIpc.write(df, s"$dir/plain.arrow")
    ArrowIpc.write(df, s"$dir/z.arrow", compression = Some("zstd"))
    val plainLen = new java.io.File(s"$dir/plain.arrow").length()
    val zLen = new java.io.File(s"$dir/z.arrow").length()
    assert(zLen < plainLen / 2,
      s"zstd file not smaller: $zLen vs $plainLen")
    val back = ArrowIpc.read(spark, s"$dir/z.arrow")
    assert(back.count() == 500)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == 124750L)
    // lz4 flavor decodes through the same codec factory
    ArrowIpc.write(df.limit(10), s"$dir/l.arrow", compression = Some("lz4"))
    assert(ArrowIpc.read(spark, s"$dir/l.arrow").count() == 10)
  }

  test("many-file IPC dir reads distributed: >1 partition, rows == eager") {
    val dir = TestSpark.tempDir("ipcdist")
    val df = spark.range(60).selectExpr("id", "CAST(id AS STRING) AS s")
    (0 until 4).foreach { i =>
      ArrowIpc.write(df.filter($"id" % 4 === i), s"$dir/part-$i.arrow",
        compression = if (i % 2 == 0) Some("zstd") else None)
    }
    val dist = LakeReader(spark, dir, "ipc").load()
    assert(dist.rdd.getNumPartitions == 4,
      s"expected one task per file, got ${dist.rdd.getNumPartitions}")
    val eager = (0 until 4)
      .map(i => ArrowIpc.read(spark, s"$dir/part-$i.arrow"))
      .reduce(_.unionByName(_))
    assert(dist.orderBy("id").collect().map(_.toSeq).toSeq ==
      eager.orderBy("id").collect().map(_.toSeq).toSeq)
    assert(dist.count() == 60)
  }

  test("IPC dir files with reordered columns align by name; a real " +
      "type mismatch fails loudly") {
    val dir = TestSpark.tempDir("ipcalign")
    ArrowIpc.write(Seq((1L, "a")).toDF("id", "v"), s"$dir/p0.arrow")
    // same fields, swapped order — e.g. different feather writer versions
    ArrowIpc.write(Seq(("b", 2L)).toDF("v", "id"), s"$dir/p1.arrow")
    val back = LakeReader(spark, dir, "ipc").load()
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b")),
      s"columns must align by name, got $back")

    val dir2 = TestSpark.tempDir("ipcmismatch")
    ArrowIpc.write(Seq((1L, "a")).toDF("id", "v"), s"$dir2/p0.arrow")
    ArrowIpc.write(Seq((1.5, "x")).toDF("id", "v"), s"$dir2/p1.arrow")
    val ex = intercept[Exception](
      LakeReader(spark, dir2, "ipc").load().collect())
    assert(ex.getMessage != null)
  }

  test("rewriteToParquet migrates IPC to the scale format") {
    val dir = TestSpark.tempDir("ipc2pq")
    val df = spark.range(100).selectExpr("id", "id * 2 AS dbl")
    ArrowIpc.write(df, s"$dir/x.arrow")
    ArrowIpc.rewriteToParquet(spark, s"$dir/x.arrow", s"$dir/pq")
    val back = spark.read.parquet(s"$dir/pq")
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("dbl"))
      .head().getLong(0) == 9900L)
  }
}
