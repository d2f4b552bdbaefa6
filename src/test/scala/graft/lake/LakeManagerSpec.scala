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

  test("datasets are SQL-visible through spark.catalog temp views") {
    val root = TestSpark.tempDir("lakesql")
    val lm = LakeManager(spark, root).init()
    lm.addDataset("sql_ds").writer(WriteMode.Overwrite)
      .write(Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v"))
    // data was written after registration — sync the view
    assert(lm.registerViews().contains("sql_ds"))
    assert(spark.catalog.tableExists("sql_ds"))
    assert(spark.sql("SELECT count(*) AS c FROM sql_ds").head().getLong(0)
      == 3L)
    assert(spark.sql("SELECT v FROM sql_ds WHERE id = 2").head()
      .getString(0) == "y")
    // remove drops the view: SQL name resolution must fail afterwards
    lm.removeDataset("sql_ds", deleteFiles = true)
    assert(!spark.catalog.tableExists("sql_ds"))
    assertThrows[Exception](spark.sql("SELECT * FROM sql_ds").collect())
  }

  test("lake config mirrors _pydala.toml and reads back from it alone") {
    val root = TestSpark.tempDir("laketoml")
    val lm = LakeManager(spark, root).init()
    lm.addDataset("ds_t").writer(WriteMode.Overwrite)
      .write(Seq((1, "x")).toDF("id", "v"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_pydala.toml")))
    // drop the JSON: a pydala-written lake only has the TOML
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_pydala.json"))
    val lm2 = LakeManager(spark, root)
    assert(lm2.tables == Seq("ds_t"))
    assert(lm2.reader("ds_t").count() == 1)
    // discovery also accepts TOML-flavor dataset metadata
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "ds_t", "_dataset.json"))
    assert(lm2.discover().map(_.split('/').last) == Seq("ds_t"))
  }

  test("registerView is a no-op for an empty dataset") {
    val root = TestSpark.tempDir("lakesql2")
    val lm = LakeManager(spark, root).init()
    lm.addDataset("empty_ds")
    assert(!lm.registerView("empty_ds"))
    assert(!spark.catalog.tableExists("empty_ds"))
  }

  test("non-identifier dataset names still add/read/remove (no view)") {
    val root = TestSpark.tempDir("lakesql3")
    val lm = LakeManager(spark, root).init()
    lm.addDataset("my-dashed.ds").writer(WriteMode.Overwrite)
      .write(Seq((1, "x")).toDF("id", "v"))
    assert(!lm.registerView("my-dashed.ds")) // not SQL-addressable
    assert(lm.reader("my-dashed.ds").count() == 1)
    lm.removeDataset("my-dashed.ds", deleteFiles = true)
    assert(lm.tables.isEmpty)
  }

  test("SQL view stays fresh across writes and snapshot restore") {
    val root = TestSpark.tempDir("lakefresh")
    val lm = LakeManager(spark, root).init()
    val tf = lm.addDataset("fresh_ds")
    tf.writer(WriteMode.Overwrite).write(Seq((1, "a")).toDF("id", "v"))
    def sqlCount() =
      spark.sql("SELECT count(*) AS c FROM fresh_ds").head().getLong(0)
    assert(sqlCount() == 1L)
    // write AFTER registration: the view must serve the new listing
    // without a manual registerView call
    tf.writer(WriteMode.Append).write(Seq((2, "b"), (3, "c")).toDF("id", "v"))
    assert(sqlCount() == 3L)
    val snap = tf.addSnapshot()
    tf.writer(WriteMode.Append).write(Seq((4, "d")).toDF("id", "v"))
    assert(sqlCount() == 4L)
    // restore also refreshes: SQL answers from the restored current/
    lm.dataset("fresh_ds").loadSnapshot(snap)
    assert(sqlCount() == 3L)
    lm.removeDataset("fresh_ds", deleteFiles = true)
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
