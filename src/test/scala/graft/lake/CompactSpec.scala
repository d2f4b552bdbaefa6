package graft.lake

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leafFiles(dir: String): Map[String, Seq[Long]] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(p: Path): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.filterNot(s => hidden(s.getPath.getName)).flatMap {
        s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.endsWith(".parquet"))
            Seq((s.getPath.getParent.toString, s.getLen))
          else Nil
      }
    walk(root).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  test("bin-packs each partition leaf to ceil(bytes/target) files, " +
      "content-preserving") {
    val dir = TestSpark.tempDir("compact")
    val df = (0 until 900)
      .map(i => (i.toLong, i % 3, s"value_$i" * 5))
      .toDF("id", "p", "v")
    LakeWriter(spark, dir, WriteMode.Overwrite,
      partitionBy = Seq("p"), maxRecordsPerFile = 50L).write(df)
    val before = leafFiles(dir)
    assert(before.size == 3 && before.forall(_._2.size > 1),
      "fixture must start with many small files per leaf")
    val content0 = spark.read.parquet(dir)
      .orderBy("id").collect().toSeq

    // target = half the biggest leaf -> every leaf packs to >= 1 file,
    // expected count derived from the SAME pre-compact bytes the
    // operator sees
    val target = before.values.map(_.sum).max / 2 + 1
    val expected = before.view
      .mapValues(sz => ((sz.sum + target - 1) / target).toInt).toMap
    val stats = Compact.run(spark, dir, targetBytes = target)
    assert(stats.leaves == 3 && stats.rewritten == 3)
    val after = leafFiles(dir)
    assert(after.view.mapValues(_.size).toMap == expected)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq ==
      content0)
  }

  test("already-right-sized leaves are skipped on a second pass") {
    val dir = TestSpark.tempDir("compact_skip")
    LakeWriter(spark, dir, WriteMode.Overwrite, maxRecordsPerFile = 25L)
      .write((0 until 200).map(i => (i, s"v$i")).toDF("id", "v"))
    val s1 = Compact.run(spark, dir) // default 128 MiB -> 1 file
    assert(s1.rewritten == 1 && s1.filesAfter == 1 && s1.filesBefore > 1)
    val s2 = Compact.run(spark, dir)
    assert(s2.rewritten == 0 && s2.filesAfter == 1)
  }

  test("refuses to strand manifest-only TimeFly snapshots") {
    val root = TestSpark.tempDir("compact_tf")
    val tf = TimeFly(spark, root).init("pinned")
    tf.writer(WriteMode.Overwrite).write(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val snap = tf.addSnapshot(manifestOnly = true)
    assert(TimeFly.pinnedFiles(spark, tf.currentPath).nonEmpty)
    assertThrows[IllegalArgumentException] {
      Compact.run(spark, tf.currentPath)
    }
    // a materialized (copying) snapshot pins nothing; after deleting the
    // manifest-only one, compaction proceeds
    tf.deleteSnapshot(snap)
    assert(TimeFly.pinnedFiles(spark, tf.currentPath).isEmpty)
    val stats = Compact.run(spark, tf.currentPath)
    assert(stats.leaves == 1)
    assert(spark.read.parquet(tf.currentPath).count() == 3)
  }

  test("heals schema drift: post-compact files are homogeneous and the " +
      "marker says so") {
    val dir = TestSpark.tempDir("compact_heal")
    LakeWriter(spark, dir, WriteMode.Overwrite).write(
      Seq((1, "a"), (2, "b")).toDF("id", "v"))
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id"))).write(
      Seq((2L, 0.5), (3L, 1.5)).toDF("id", "x"))
    assert(SchemaTools.readSchemaMarkerInfo(spark, dir)
      .exists(!_.homogeneous))
    val expected = SchemaTools.readUnified(spark, dir)
      .orderBy("id").collect().toSeq

    val stats = Compact.run(spark, dir)
    assert(stats.rewritten == stats.leaves) // drift heal rewrites all
    assert(SchemaTools.readSchemaMarkerInfo(spark, dir)
      .exists(_.homogeneous))
    // every footer now carries the unified schema: the PLAIN multi-file
    // scan agrees with the unified read
    val back = spark.read.parquet(dir).orderBy("id")
    assert(back.schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("id" -> "bigint", "v" -> "string", "x" -> "double"))
    assert(back.collect().toSeq == expected)
  }
}
