package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LakeManagerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("init, add, discover, read-by-name, remove round-trip") {
    val root = TestSpark.tempDir("lake")
    val lm = LakeManager(spark, root).init()
    assert(lm.tables.isEmpty)

    val tf = lm.addDataset("ds_a", "first dataset")
    tf.writer(WriteMode.Overwrite)
      .write(Seq((1, "x"), (2, "y")).toDF("id", "v"))
    lm.addDataset("ds_b").writer(WriteMode.Overwrite)
      .write(Seq((9, "z")).toDF("id", "v"))

    assert(lm.tables.sorted == Seq("ds_a", "ds_b"))
    assert(lm.reader("ds_a").count() == 2)
    assert(lm.reader("ds_b").count() == 1)

    // discovery from a fresh manager over the same root (returns the
    // discovered dataset paths)
    val lm2 = LakeManager(spark, root)
    assert(lm2.discover().map(_.split('/').last).sorted ==
      Seq("ds_a", "ds_b"))

    lm.removeDataset("ds_b", deleteFiles = true)
    assert(lm.tables == Seq("ds_a"))
    assertThrows[Exception](lm.reader("ds_b").count())
  }

  test("dataset() exposes TimeFly: snapshot via the catalog handle") {
    val root = TestSpark.tempDir("lake2")
    val lm = LakeManager(spark, root).init()
    val tf = lm.addDataset("snap_ds")
    tf.writer(WriteMode.Overwrite).write(Seq((1, "v1")).toDF("id", "v"))
    val snap = tf.addSnapshot()
    tf.writer(WriteMode.Overwrite).write(Seq((2, "v2")).toDF("id", "v"))
    lm.dataset("snap_ds").loadSnapshot(snap)
    assert(lm.reader("snap_ds").select("id").as[Int].collect().toSeq
      == Seq(1))
  }
}
