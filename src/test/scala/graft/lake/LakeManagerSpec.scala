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

  test("sql() DML on a managed commit-log table: INSERT INTO / " +
      "OVERWRITE, MERGE (update-all/insert-all), DELETE WHERE — all " +
      "through the commit protocol, view refreshed per mutation; " +
      "non-DML and unmanaged targets pass through") {
    val root = TestSpark.tempDir("lakesql")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("acct")
    // bootstrap through the API (the view registers on first commit)
    lm.commitLog("acct").append(
      Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "tag", "amt"))
    assert(spark.sql("SELECT count(*) FROM acct").as[Long].head() == 2)
    // INSERT INTO with an inline VALUES query
    lm.sql("INSERT INTO acct VALUES (3, 'c', 30.0), (4, 'd', 40.0)")
    assert(spark.sql("SELECT count(*) FROM acct").as[Long].head() == 4)
    // INSERT INTO from a SELECT over a temp view
    Seq((5, "e", 50.0)).toDF("id", "tag", "amt")
      .createOrReplaceTempView("acct_incoming")
    lm.sql("INSERT INTO acct SELECT * FROM acct_incoming")
    assert(spark.sql("SELECT count(*) FROM acct").as[Long].head() == 5)
    // MERGE: update id=1, insert id=9
    Seq((1, "A!", 11.0), (9, "i", 90.0)).toDF("id", "tag", "amt")
      .createOrReplaceTempView("acct_cdc")
    lm.sql("MERGE INTO acct t USING acct_cdc s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val m = spark.sql("SELECT id, tag FROM acct")
      .as[(Int, String)].collect().toMap
    assert(m(1) == "A!" && m(9) == "i" && m.size == 6)
    // UPDATE with qualified refs: the target qualifier strips, the
    // assignment sees the pre-update row
    lm.sql("UPDATE acct t SET t.amt = t.amt + 5.0, t.tag = 'up' " +
      "WHERE t.id = 2")
    assert(spark.sql("SELECT tag, amt FROM acct WHERE id = 2")
      .as[(String, Double)].head() == (("up", 25.0)))
    // a foreign-qualified or struct-shaped UPDATE target refuses
    // instead of silently rebinding to a same-named top-level column
    intercept[IllegalArgumentException] {
      lm.sql("UPDATE acct SET bogus.amt = 0.0 WHERE id = 2")
    }
    // DELETE WHERE: row-level copy-on-write commit (qualified too)
    lm.sql("DELETE FROM acct WHERE acct.amt >= 40.0")
    assert(spark.sql("SELECT id FROM acct ORDER BY id")
      .as[Int].collect().toSeq == Seq(1, 2, 3))
    // time travel still serves the pre-delete state
    val log = lm.commitLog("acct")
    assert(log.read(Some(log.latestVersion() - 1)).count() == 6)
    // INSERT OVERWRITE replaces the live set
    lm.sql("INSERT OVERWRITE acct VALUES (100, 'z', 1.0)")
    assert(spark.sql("SELECT id FROM acct").as[Int].collect().toSeq
      == Seq(100))
    // WHEN MATCHED THEN DELETE routes through the generalized merge
    // executor (it used to refuse) — no match here, so it's a no-op
    // that burns no commit
    val vPreMerge = lm.commitLog("acct").latestVersion()
    lm.sql("MERGE INTO acct t USING acct_cdc s ON t.id = s.id " +
      "WHEN MATCHED THEN DELETE")
    assert(lm.commitLog("acct").latestVersion() == vPreMerge)
    // non-DML passes through to spark.sql
    assert(lm.sql("SELECT count(*) FROM acct").as[Long].head() == 1)
    // DML on an unmanaged name passes through (and fails in Spark's
    // own way, not ours)
    intercept[Exception] {
      lm.sql("INSERT INTO nosuch_table VALUES (1)")
    }
  }

  test("sql() time travel: VERSION AS OF / TIMESTAMP AS OF rewrite to " +
      "versioned reads; a travel joins the live view in one statement; " +
      "qualified refs resolve; bad versions refuse") {
    val root = TestSpark.tempDir("lakett")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("tt")
    lm.commitLog("tt").append(
      Seq((1, 10.0), (2, 20.0)).toDF("id", "amt")) // v1
    lm.sql("INSERT INTO tt VALUES (3, 30.0)") // v2
    lm.sql("UPDATE tt SET amt = amt * 10 WHERE id = 1") // v3
    assert(lm.sql("SELECT id FROM tt VERSION AS OF 2 ORDER BY id")
      .as[Int].collect().toSeq == Seq(1, 2, 3))
    assert(lm.sql(
      "SELECT tt.amt FROM tt VERSION AS OF 1 WHERE tt.id = 1")
      .as[Double].head() == 10.0)
    // a travel JOINS the live view inside one statement
    val drift = lm.sql(
      """SELECT cur.id, cur.amt - old.amt AS delta
        |FROM tt cur JOIN (SELECT * FROM tt VERSION AS OF 2) old
        |  ON cur.id = old.id
        |WHERE cur.amt <> old.amt""".stripMargin)
      .as[(Int, Double)].collect().toSeq
    assert(drift == Seq((1, 90.0)), s"got $drift")
    // TIMESTAMP AS OF at v2's own recorded instant serves v2
    val t2 = lm.commitLog("tt").commit(2L).ts
    assert(lm.sql("SELECT count(*) FROM tt TIMESTAMP AS OF " +
      s"CAST($t2 / 1000.0 AS TIMESTAMP)").as[Long].head() == 3L)
    intercept[Exception] {
      lm.sql("SELECT * FROM tt VERSION AS OF 99")
    }
  }

  test("the delete.mode table property routes SQL DELETE to positional " +
      "deletion vectors: zero data files rewritten, marks subtract") {
    val root = TestSpark.tempDir("lakedv")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("dvt")
    import org.apache.spark.sql.functions.col
    lm.commitLog("dvt").append(
      spark.range(50).select(col("id"), (col("id") * 3).as("v"))
        .repartition(2, col("id")))
    lm.sql("ALTER TABLE dvt SET TBLPROPERTIES " +
      "('delete.mode'='positional')")
    val filesBefore = SchemaTools
      .listDataFiles(spark, s"$root/dvt/data")
      .filterNot(f => new org.apache.hadoop.fs.Path(f).getName
        .startsWith("dv-")).sorted
    lm.sql("DELETE FROM dvt WHERE id % 5 = 0")
    val filesAfter = SchemaTools
      .listDataFiles(spark, s"$root/dvt/data")
      .filterNot(f => new org.apache.hadoop.fs.Path(f).getName
        .startsWith("dv-")).sorted
    assert(filesAfter == filesBefore,
      "positional SQL DELETE must write no data files")
    assert(spark.sql("SELECT count(*) FROM dvt").as[Long].head() == 40L)
    assert(lm.commitLog("dvt").commit(3L).files.forall(_.startsWith("dv-")))
  }

  test("maintenance SQL verbs dispatch on managed tables") {
    val root = TestSpark.tempDir("lakem")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("mt")
    Seq.range(0, 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("mt_src")
    lm.sql("INSERT INTO mt SELECT /*+ REPARTITION(4) */ * FROM mt_src")
    lm.sql("INSERT INTO mt SELECT id + 100, v FROM mt_src")
    val m = lm.sql("OPTIMIZE mt").head()
    assert(m.getAs[Boolean]("rewrote") &&
      m.getAs[Long]("files_after") == 1L &&
      m.getAs[Long]("files_before") > 1L &&
      m.getAs[Long]("version") == 3L)
    val hist = lm.sql("DESCRIBE HISTORY mt").orderBy("version").collect()
    assert(hist.length == 3 &&
      hist.last.getAs[String]("kind") == "rewrite")
    // OPTIMIZE over the just-packed table is a no-op metrics row
    val m2 = lm.sql("OPTIMIZE mt").head()
    assert(!m2.getAs[Boolean]("rewrote"),
      "a no-op OPTIMIZE must not burn a commit")
    val r = lm.sql("RESTORE mt TO VERSION AS OF 1").head()
    assert(r.getAs[Long]("restored_version") == 1L &&
      r.getAs[Long]("new_version") == 4L)
    assert(spark.sql("SELECT count(*) FROM mt").as[Long].head() == 100L)
    val vac = lm.sql("VACUUM mt RETAIN 1 HOURS").head()
    assert(vac.getAs[Long]("files_deleted") == 0L,
      "every committed file is referenced — nothing to reclaim")
    // DRY RUN reports the would-delete set without touching anything:
    // plant unreferenced debris, see it listed, confirm it survives
    val debris = new java.io.File(s"$root/mt/data/zz-debris.parquet")
    val out = new java.io.FileOutputStream(debris)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    debris.setLastModified(System.currentTimeMillis() - 7200000L)
    val dry = lm.sql("VACUUM mt RETAIN 1 HOURS DRY RUN")
      .as[String].collect()
    assert(dry.exists(_.endsWith("zz-debris.parquet")) &&
      debris.exists(),
      s"DRY RUN must list the debris and delete nothing: " +
        s"${dry.toSeq}")
    assert(lm.sql("VACUUM mt RETAIN 1 HOURS").head()
      .getAs[Long]("files_deleted") == 1L && !debris.exists(),
      "the real sweep must then reclaim exactly the debris")
    // the WHERE arm parses through the shape dispatch too: the
    // restored live set is v1's four round-robin files (every span
    // covers the band), so the banded ZORDER pack rewrites them all
    val m3 = lm.sql(
      "OPTIMIZE mt WHERE id < 10 ZORDER BY (id)").head()
    assert(m3.getAs[Boolean]("rewrote") &&
      m3.getAs[Long]("files_after") == 1L &&
      m3.getAs[Long]("files_before") == 4L,
      s"OPTIMIZE WHERE ... ZORDER BY must dispatch: $m3")
    // DESCRIBE DETAIL: the one-row summary off manifests alone
    val det = lm.sql("DESCRIBE DETAIL mt").head()
    assert(det.getAs[Long]("num_files") == 1L &&
      det.getAs[Long]("num_rows") == 100L &&
      det.getAs[Long]("size_bytes") > 0L &&
      det.getAs[Long]("version") == lm.commitLog("mt").latestVersion(),
      s"DESCRIBE DETAIL must summarize the live state: $det")
    // non-managed target: falls through to the stock parser's refusal
    assertThrows[Exception](lm.sql("OPTIMIZE definitely_not_a_table"))
  }

  test("lake-qualified targets resolve; wrong member refuses loudly") {
    val root = TestSpark.tempDir("lakeq")
    val lm = LakeManager(spark, root).init()
    val lakeName = new java.io.File(root).getName
    lm.addCommitLog("qt")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("qt_src")
    lm.sql(s"INSERT INTO `$lakeName`.qt SELECT * FROM qt_src")
    lm.sql(s"DELETE FROM `$lakeName`.qt WHERE id = 2")
    assert(spark.sql("SELECT count(*) FROM qt").as[Long].head() == 2L)
    assert(lm.sql(s"DESCRIBE HISTORY `$lakeName`.qt").count() == 2L)
    // a lake-qualified name whose member is NOT managed refuses
    // loudly — the user addressed this lake explicitly, so silently
    // running against some unrelated same-named table would be wrong
    assertThrows[IllegalArgumentException](
      lm.sql(s"DELETE FROM `$lakeName`.nope WHERE id = 1"))
    assertThrows[IllegalArgumentException](
      lm.sql(s"DESCRIBE HISTORY `$lakeName`.nope"))
  }

  test("CREATE TABLE ... USING commitlog PARTITIONED BY lands the " +
      "hive flavor; non-commitlog USING passes through") {
    val root = TestSpark.tempDir("lakect")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE pt (k STRING, v BIGINT) USING commitlog " +
      "PARTITIONED BY (k)")
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("k", "v")
      .createOrReplaceTempView("pt_src")
    lm.sql("INSERT INTO pt SELECT * FROM pt_src")
    assert(spark.sql("SELECT sum(v) FROM pt").as[Long].head() == 6L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/pt/data/k=a")),
      "identity partitioning must land the hive layout")
    // SHOW PARTITIONS serves the manifest-carried partition dirs
    assert(lm.sql("SHOW PARTITIONS pt").orderBy("partition")
      .collect().map(_.getString(0)).toSeq == Seq("k=a", "k=b"))
    // ANALYZE TABLE builds the stats sidecar; FOR COLUMNS adds blooms
    val an = lm.sql("ANALYZE TABLE pt COMPUTE STATISTICS " +
      "FOR COLUMNS k").head()
    assert(an.getAs[Long]("num_files") >= 2L,
      s"ANALYZE must return the detail row: $an")
    assert(graft.lake.FileStats.trusted(spark, s"$root/pt"),
      "ANALYZE must land a trusted sidecar")
    // declared NOT NULL gates from the very first INSERT
    lm.sql("CREATE TABLE nn (id BIGINT NOT NULL) USING commitlog")
    assertThrows[Exception](
      lm.sql("INSERT INTO nn VALUES (CAST(NULL AS BIGINT))"))
    lm.sql("INSERT INTO nn VALUES (7)")
    assert(spark.sql("SELECT id FROM nn").as[Long].head() == 7L)
    // a non-commitlog USING is not ours — stock Spark handles (and
    // here refuses: no such catalog path), proving the pass-through
    assertThrows[Exception](
      lm.sql("CREATE TABLE pq (x INT) USING definitely_no_provider"))
    assert(!lm.tables.contains("pq"))
  }

  test("ALTER TABLE column DDL: ADD COLUMNS widens by a zero-row " +
      "append, RENAME/DROP COLUMN map logically with zero rewrite") {
    val root = TestSpark.tempDir("lakecol")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE ct (id BIGINT, v STRING) USING commitlog")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("ct_src")
    lm.sql("INSERT INTO ct SELECT * FROM ct_src")
    val filesBefore = lm.commitLog("ct").liveFiles(None).toSet
    lm.sql("ALTER TABLE ct ADD COLUMNS (score DOUBLE)")
    // widened: old rows read with a null score, and positional INSERT
    // now expects three columns
    val widened = lm.sql("SELECT id, v, score FROM ct ORDER BY id")
    assert(widened.columns.toSeq == Seq("id", "v", "score") &&
      widened.filter(widened("score").isNull).count() == 2L)
    lm.sql("INSERT INTO ct VALUES (3, 'c', 0.5)")
    assert(spark.sql("SELECT count(*) FROM ct").as[Long].head() == 3L)
    // NOT NULL additions refuse (standing rows would violate)
    assertThrows[IllegalArgumentException](
      lm.sql("ALTER TABLE ct ADD COLUMNS (req BIGINT NOT NULL)"))
    // rename + drop: logical, zero data files rewritten
    lm.sql("ALTER TABLE ct RENAME COLUMN v TO label")
    lm.sql("ALTER TABLE ct DROP COLUMN score")
    val mapped = lm.commitLog("ct").read(None)
    assert(mapped.columns.sorted.toSeq == Seq("id", "label"),
      s"mapping must apply: ${mapped.columns.toSeq}")
    assert(filesBefore.subsetOf(
      lm.commitLog("ct").liveFiles(None).toSet),
      "column mapping must rewrite zero data files")
    lm.sql("ALTER TABLE ct DROP COLUMN IF EXISTS absent") // no-op
    // INSERT after the mapping: positional against the LOGICAL shape,
    // batch unapplies the renames so files keep the physical schema
    lm.sql("INSERT INTO ct VALUES (9, 'z')")
    assert(spark.sql("SELECT label FROM ct WHERE id = 9")
      .as[String].head() == "z")
    assert(spark.sql("SELECT id FROM ct ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 9L))
  }

  test("ALTER COLUMN TYPE widens along the promotion ladder by a " +
      "zero-row append; narrowing and incompatible changes refuse") {
    val root = TestSpark.tempDir("lakewiden")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE wt (n INT, x DOUBLE, s STRING) " +
      "USING commitlog")
    lm.sql("INSERT INTO wt VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    val filesBefore = lm.commitLog("wt").liveFiles(None).toSet
    lm.sql("ALTER TABLE wt ALTER COLUMN n TYPE BIGINT")
    val widened = lm.commitLog("wt").read(None)
    assert(widened.schema("n").dataType ==
      org.apache.spark.sql.types.LongType,
      s"n must widen to BIGINT: ${widened.schema("n").dataType}")
    assert(filesBefore.subsetOf(
      lm.commitLog("wt").liveFiles(None).toSet),
      "type widening must rewrite zero data files")
    // a value beyond INT range now inserts
    lm.sql("INSERT INTO wt VALUES (3000000000, 3.5, 'c')")
    assert(spark.sql("SELECT max(n) FROM wt").as[Long].head() ==
      3000000000L)
    // same-type ALTER is a no-op (burns no commit)
    val v = lm.commitLog("wt").latestVersion()
    lm.sql("ALTER TABLE wt ALTER COLUMN n TYPE BIGINT")
    assert(lm.commitLog("wt").latestVersion() == v)
    // narrowing and incompatible changes refuse
    assertThrows[IllegalArgumentException](
      lm.sql("ALTER TABLE wt ALTER COLUMN x TYPE INT"))
    assertThrows[IllegalArgumentException](
      lm.sql("ALTER TABLE wt ALTER COLUMN s TYPE BIGINT"))
    assertThrows[IllegalArgumentException](
      lm.sql("ALTER TABLE wt ALTER COLUMN nosuch TYPE BIGINT"))
  }

  test("TRUNCATE TABLE, SHOW CREATE TABLE, and the table_changes CDC " +
      "TVF dispatch on managed tables") {
    val root = TestSpark.tempDir("lakesql2")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE tc (id BIGINT, v STRING) USING commitlog " +
      "TBLPROPERTIES ('team' = 'graft', " +
      "'delete.mode' = 'positional')")
    lm.sql("ALTER TABLE tc ADD CONSTRAINT pos CHECK (id > 0)")
    lm.sql("INSERT INTO tc VALUES (1, 'a'), (2, 'b')")    // v: +1
    lm.sql("INSERT INTO tc VALUES (3, 'c')")              // v: +1
    lm.sql("DELETE FROM tc WHERE id = 1")                 // v: +1
    // table_changes: INCLUSIVE version bounds, insert + delete ops
    val feed = lm.sql("SELECT _op, id FROM table_changes('tc', 1) " +
      "ORDER BY _op, id")
    val ops = feed.as[(String, Long)].collect().toSeq
    assert(ops.count(_._1 == "insert") == 3 &&
      ops.count(_._1 == "delete") == 1)
    // bounded range excludes the delete
    val hi = lm.commitLog("tc").latestVersion()
    val bounded = lm.sql(
      s"SELECT _op FROM table_changes('tc', 1, ${hi - 1})")
    assert(bounded.as[String].collect().forall(_ == "insert"))
    // SHOW CREATE TABLE reconstructs schema, properties, constraint
    val ddl = lm.sql("SHOW CREATE TABLE tc")
      .select("createtab_stmt").as[String].head()
    assert(ddl.contains("CREATE TABLE tc") &&
      ddl.contains("id BIGINT") && ddl.contains("USING commitlog") &&
      ddl.contains("'team' = 'graft'") &&
      ddl.contains("ADD CONSTRAINT pos CHECK"))
    // TRUNCATE: zero live rows, one replace commit, history intact
    lm.sql("TRUNCATE TABLE tc")
    assert(spark.sql("SELECT count(*) FROM tc").as[Long].head() == 0L)
    val log = lm.commitLog("tc")
    assert(log.read(Some(log.latestVersion() - 1)).count() == 2L)
    // unmanaged targets pass through to Spark's own errors
    intercept[Exception](lm.sql("TRUNCATE TABLE nosuch_t"))
  }

  test("CREATE OR REPLACE TABLE: one replace commit, history " +
      "survives; bare REPLACE refuses a missing table") {
    val root = TestSpark.tempDir("lakerep")
    val lm = LakeManager(spark, root).init()
    // OR CREATE over nothing standing = plain CREATE
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("rep_src1")
    lm.sql("CREATE OR REPLACE TABLE rt USING commitlog AS " +
      "SELECT * FROM rep_src1")
    assert(spark.sql("SELECT count(*) FROM rt").as[Long].head() == 2L)
    val vBefore = lm.commitLog("rt").latestVersion()
    // standing table: the swap is ONE replace commit
    Seq((9L, "z")).toDF("id", "v").createOrReplaceTempView("rep_src2")
    lm.sql("CREATE OR REPLACE TABLE rt USING commitlog AS " +
      "SELECT * FROM rep_src2")
    val log = lm.commitLog("rt")
    assert(spark.sql("SELECT id FROM rt").as[Long].collect().toSeq
      == Seq(9L))
    assert(log.latestVersion() == vBefore + 1 &&
      log.commit(log.latestVersion()).kind == "replace",
      "the swap must be one replace commit")
    // history SURVIVES: time travel before the replace still serves
    assert(log.read(Some(vBefore)).count() == 2L)
    // bare REPLACE on a missing table refuses with the remedy
    intercept[IllegalArgumentException] {
      lm.sql("REPLACE TABLE nosuch_rt USING commitlog AS " +
        "SELECT * FROM rep_src2")
    }
    // bare REPLACE with a declared column list empties the live set
    // under the declared schema
    lm.sql("REPLACE TABLE rt (id BIGINT, v STRING, w DOUBLE) " +
      "USING commitlog")
    assert(spark.sql("SELECT count(*) FROM rt").as[Long].head() == 0L)
    lm.sql("INSERT INTO rt VALUES (5, 'e', 1.5)")
    assert(spark.sql("SELECT w FROM rt").as[Double].head() == 1.5)
  }

  test("generalized MERGE: conditional matched D/U, conditional " +
      "insert, NOT MATCHED BY SOURCE, first-true ordering, refusals") {
    val root = TestSpark.tempDir("lakemerge")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("mt")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("id", "v", "price")
      .createOrReplaceTempView("mg_base")
    lm.sql("INSERT INTO mt SELECT * FROM mg_base")
    // CDC batch: delete 1, update 2 (price from source), insert 9;
    // op 'X' row must fall through every clause and be DISCARDED
    Seq((1L, "A", 0.0, "D"), (2L, "B", 99.0, "U"),
      (9L, "i", 9.0, "I"), (8L, "x", 8.0, "X"))
      .toDF("id", "v", "price", "op")
      .createOrReplaceTempView("mg_cdc")
    lm.sql("MERGE INTO mt t USING mg_cdc s ON t.id = s.id " +
      "WHEN MATCHED AND s.op = 'D' THEN DELETE " +
      "WHEN MATCHED AND s.op = 'U' THEN UPDATE SET price = s.price, " +
      "v = s.v " +
      "WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (id, v, price) " +
      "VALUES (s.id, s.v, s.price)")
    assert(spark.sql("SELECT id, v, price FROM mt ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0),
        (9L, "i", 9.0)))
    // first-true ordering: both conditions true for id=2 — the FIRST
    // clause must win (price doubles, not the -1 of the second)
    Seq(2L).toDF("id").createOrReplaceTempView("mg_two")
    lm.sql("MERGE INTO mt t USING mg_two s ON t.id = s.id " +
      "WHEN MATCHED AND t.price > 0 THEN UPDATE SET " +
      "price = t.price * 2 " +
      "WHEN MATCHED THEN UPDATE SET price = -1.0")
    assert(spark.sql("SELECT price FROM mt WHERE id = 2")
      .as[Double].head() == 198.0)
    // NOT MATCHED BY SOURCE: keep-set sync — unlisted rows face the
    // clauses (conditional delete, unconditional cap)
    Seq(2L, 9L).toDF("id").createOrReplaceTempView("mg_keep")
    lm.sql("MERGE INTO mt t USING mg_keep s ON t.id = s.id " +
      "WHEN NOT MATCHED BY SOURCE AND t.v = 'c' THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET price = 0.0")
    assert(spark.sql("SELECT id, price FROM mt ORDER BY id")
      .as[(Long, Double)].collect().toSeq ==
      Seq((2L, 198.0), (4L, 0.0), (9L, 9.0)))
    val log = lm.commitLog("mt")
    // every mutation above was ONE commit of upsert kind
    assert((2L to 4L).map(log.commit(_).kind).toSet == Set("upsert"))
    // insert-only generalized merge commits as APPEND kind
    Seq((7L, "g", 7.0, "I")).toDF("id", "v", "price", "op")
      .createOrReplaceTempView("mg_ins")
    lm.sql("MERGE INTO mt t USING mg_ins s ON t.id = s.id " +
      "WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (id, v, price) " +
      "VALUES (s.id, s.v, s.price)")
    assert(log.commit(log.latestVersion()).kind == "append")
    // a merge that changes nothing burns NO commit
    val vBefore = log.latestVersion()
    Seq((8L, "x", 8.0, "X")).toDF("id", "v", "price", "op")
      .createOrReplaceTempView("mg_noop")
    lm.sql("MERGE INTO mt t USING mg_noop s ON t.id = s.id " +
      "WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (id, v, price) " +
      "VALUES (s.id, s.v, s.price)")
    assert(log.latestVersion() == vBefore,
      "a no-op merge must not burn a commit")
    // refusal: duplicate source keys matching one target row
    Seq((4L, 1.0), (4L, 2.0)).toDF("id", "price")
      .createOrReplaceTempView("mg_dup")
    intercept[Exception] {
      lm.sql("MERGE INTO mt t USING mg_dup s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET price = s.price")
    }
    // refusal: source reference inside NOT MATCHED BY SOURCE
    intercept[Exception] {
      lm.sql("MERGE INTO mt t USING mg_keep s ON t.id = s.id " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET price = s.id")
    }
    // refusal: SET on a column the table does not carry
    intercept[Exception] {
      lm.sql("MERGE INTO mt t USING mg_two s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET nope = 1")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns append to " +
      "the schema, untouched rows read NULL, history keeps the old " +
      "shape; without the clause the same merge refuses") {
    val root = TestSpark.tempDir("lakemergeevo")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("me")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("me_base")
    lm.sql("INSERT INTO me SELECT * FROM me_base") // v1
    Seq((2L, "B", 0.9), (9L, "i", 0.1)).toDF("id", "v", "score")
      .createOrReplaceTempView("me_cdc")
    // star expansion under evolution: shared columns take the source
    // value, `score` evolves onto the schema
    lm.sql("MERGE WITH SCHEMA EVOLUTION INTO me t USING me_cdc s " +
      "ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *") // v2
    assert(spark.sql("SELECT id, v, score FROM me ORDER BY id")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "B", Some(0.9)), (3L, "c", None),
        (9L, "i", Some(0.1))),
      "untouched rows must read NULL for the evolved column")
    val log = lm.commitLog("me")
    // the pre-evolution version still reads the OLD shape
    assert(log.read(Some(1L)).columns.toSeq == Seq("id", "v"),
      "history must keep the pre-evolution schema")
    // only the files holding an affected row rewrote: id=1/id=3's
    // file conforms at read time, no rewrite
    assert(log.commit(2L).kind == "upsert")
    // explicit-assignment evolution: the new column must exist on the
    // SOURCE (Delta's rule) — a name in neither schema refuses
    intercept[Exception] {
      lm.sql("MERGE WITH SCHEMA EVOLUTION INTO me t USING me_cdc s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET phantom = 1.0")
    }
    // the same star merge WITHOUT the clause refuses (source misses
    // no target column here, so build one that does)
    Seq((3L, "C", 0.5, "x")).toDF("id", "v", "score", "extra2")
      .createOrReplaceTempView("me_cdc2")
    intercept[Exception] {
      lm.sql("MERGE INTO me t USING me_cdc2 s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET extra2x = s.extra2")
    }
    // conditional evolved-column assignment through the general path
    lm.sql("MERGE WITH SCHEMA EVOLUTION INTO me t USING me_cdc2 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND t.v = 'c' THEN UPDATE SET extra2 = s.extra2")
    assert(spark.sql("SELECT extra2 FROM me WHERE id = 3")
      .as[String].head() == "x")
    assert(spark.sql("SELECT count(*) FROM me WHERE extra2 IS NULL")
      .as[Long].head() == 3L)
    // a matched CONDITION may name the evolution-added column on the
    // TARGET side mid-evolution: standing rows read NULL for it
    lm.sql("CREATE TABLE me2 (id BIGINT, v STRING) USING commitlog")
    lm.sql("INSERT INTO me2 VALUES (1, 'a'), (2, 'b')")
    Seq((1L, 7.0)).toDF("id", "w").createOrReplaceTempView("me2_cdc")
    lm.sql("MERGE WITH SCHEMA EVOLUTION INTO me2 t USING me2_cdc s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND t.w IS NULL THEN UPDATE SET w = s.w")
    assert(spark.sql("SELECT w FROM me2 ORDER BY id")
      .as[Option[Double]].collect().toSeq ==
      Seq(Some(7.0), None))
  }

  test("generalized MERGE under active column mapping: every clause " +
      "speaks logical names, the physical files keep the frozen " +
      "schema, zero history rewrites") {
    val root = TestSpark.tempDir("lakemergemap")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("mm")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "v", "amt").createOrReplaceTempView("mm_base")
    lm.sql("INSERT INTO mm SELECT * FROM mm_base") // v1
    lm.sql("ALTER TABLE mm RENAME COLUMN amt TO price") // logical only
    val log = lm.commitLog("mm")
    val filesBefore = log.liveFiles(None).toSet
    // CDC batch addressed ENTIRELY by the new logical name
    Seq((2L, "B", 20.0, "U"), (3L, "x", 0.0, "D"), (9L, "i", 9.0, "I"))
      .toDF("id", "v", "price", "op").createOrReplaceTempView("mm_cdc")
    lm.sql("MERGE INTO mm t USING mm_cdc s ON t.id = s.id " +
      "WHEN MATCHED AND s.op = 'U' THEN UPDATE SET " +
      "price = s.price + t.price " +
      "WHEN MATCHED AND s.op = 'D' THEN DELETE " +
      "WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (id, v, price) " +
      "VALUES (s.id, s.v, s.price)")
    assert(spark.sql("SELECT id, v, price FROM mm ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (2L, "b", 22.0), (9L, "i", 9.0)))
    // NMBS under mapping: conditions on the logical name too
    Seq(2L).toDF("id").createOrReplaceTempView("mm_keep")
    lm.sql("MERGE INTO mm t USING mm_keep s ON t.id = s.id " +
      "WHEN NOT MATCHED BY SOURCE AND t.price > 5 THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET price = 0.0")
    assert(spark.sql("SELECT id, price FROM mm ORDER BY id")
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 0.0), (2L, 22.0)))
    // the physical plane never heard of `price`: rewritten files keep
    // the frozen physical schema (amt)
    val newFiles = log.liveFiles(None).toSet -- filesBefore
    assert(newFiles.nonEmpty)
    // evolution composes with mapping: the source-only column appends
    Seq((2L, 0.5)).toDF("id", "score")
      .createOrReplaceTempView("mm_evo")
    lm.sql("MERGE WITH SCHEMA EVOLUTION INTO mm t USING mm_evo s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET score = s.score")
    assert(spark.sql("SELECT score FROM mm WHERE id = 2")
      .as[Double].head() == 0.5)
    assert(spark.sql("SELECT count(*) FROM mm WHERE score IS NULL")
      .as[Long].head() == 1L)
    // UPDATE and DELETE translate through the same front door
    lm.sql("UPDATE mm SET price = price + 1.0 WHERE price = 0.0")
    assert(spark.sql("SELECT price FROM mm WHERE id = 1")
      .as[Double].head() == 1.0)
    lm.sql("DELETE FROM mm WHERE price > 20.0")
    assert(spark.sql("SELECT id FROM mm ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("COPY INTO: exactly-once by file identity — rerun loads " +
      "nothing and burns no commit, a new file loads alone, force " +
      "duplicates, PATTERN filters, mergeSchema evolves") {
    val root = TestSpark.tempDir("lakecopy")
    val lm = LakeManager(spark, root).init()
    lm.addCommitLog("ct")
    val srcDir = TestSpark.tempDir("lakecopysrc")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(2).write.parquet(s"$srcDir/batch1")
    def copy(extra: String = ""): (Long, Long) = {
      val r = lm.sql("COPY INTO ct FROM '" + srcDir +
        "' FILEFORMAT = PARQUET" + extra).head()
      (r.getLong(1), r.getLong(0)) // (files, rows)
    }
    assert(copy() == ((2L, 2L)))
    val log = lm.commitLog("ct")
    val v1 = log.latestVersion()
    // rerun: nothing to load, NO commit burned
    assert(copy() == ((0L, 0L)) && log.latestVersion() == v1)
    // a new file arrives: only IT loads
    Seq((3L, "c")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$srcDir/batch2")
    assert(copy() == ((1L, 1L)))
    assert(spark.sql("SELECT id FROM ct ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    // PATTERN: only batch2 files are candidates — already loaded
    assert(copy(" PATTERN = 'batch2/*.parquet'") == ((0L, 0L)))
    // force reloads every candidate (duplicates by design)
    val (ff, fr) = copy(" PATTERN = 'batch2/*.parquet' " +
      "COPY_OPTIONS ('force' = 'true')")
    assert((ff, fr) == ((1L, 1L)))
    assert(spark.sql("SELECT count(*) FROM ct WHERE id = 3")
      .as[Long].head() == 2L)
    // schema mismatch refuses; mergeSchema evolves instead
    val srcDir2 = s"${TestSpark.tempDir("lakecopysrc2")}/files"
    Seq((9L, "z", 0.5)).toDF("id", "v", "w")
      .coalesce(1).write.parquet(srcDir2)
    intercept[Exception] {
      lm.sql(s"COPY INTO ct FROM '$srcDir2' FILEFORMAT = PARQUET")
    }
    lm.sql(s"COPY INTO ct FROM '$srcDir2' FILEFORMAT = PARQUET " +
      "COPY_OPTIONS ('mergeSchema' = 'true')")
    assert(spark.sql("SELECT w FROM ct WHERE id = 9")
      .as[Double].head() == 0.5)
    assert(spark.sql("SELECT count(*) FROM ct WHERE w IS NULL")
      .as[Long].head() == 4L)
    // the registry rides SHOW TBLPROPERTIES, namespaced
    assert(lm.sql("SHOW TBLPROPERTIES ct").as[(String, String)]
      .collect().count(_._1.startsWith("graft.copy.run.")) == 4)
    // vacuum sweeps ORPHAN run manifests (a manifest written before a
    // CAS that never landed) and keeps the referenced ones — the
    // registry survives, so a re-copy is still a no-op
    val orphan = new org.apache.hadoop.fs.Path(
      s"$root/ct/_copy/run-orphan")
    val cfs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.mkdirs(orphan)
    log.vacuum(0L)
    assert(!cfs.exists(orphan), "the orphan manifest must sweep")
    assert(cfs.listStatus(new org.apache.hadoop.fs.Path(
        s"$root/ct/_copy")).length == 4,
      "referenced manifests must survive the sweep")
    assert(copy() == ((0L, 0L)),
      "the registry must survive the vacuum")
    // registry compaction: many run keys fold to ONE meta commit +
    // one merged manifest; idempotence survives (re-copy still no-op)
    assert(log.compactCopyRegistry().isDefined)
    assert(log.properties(None).keys
      .count(_.startsWith("graft.copy.run.")) == 1,
      "the fold must leave one registry pointer")
    assert(copy() == ((0L, 0L)),
      "idempotence must survive the registry fold")
    assert(log.compactCopyRegistry().isEmpty, "a second fold is a no-op")
    // the registry travels with clones (tiny metadata — the shallow
    // clone still copies zero DATA): a COPY INTO against the clone
    // skips already-ingested files instead of failing or reloading
    lm.sql("CREATE TABLE ctclone SHALLOW CLONE ct")
    val rc = lm.sql(s"COPY INTO ctclone FROM '$srcDir' " +
      "FILEFORMAT = PARQUET").head()
    assert(rc.getLong(1) == 0L,
      "the cloned registry must skip already-ingested files")
    // CSV with FORMAT_OPTIONS
    val srcCsv = s"${TestSpark.tempDir("lakecopycsv")}/files"
    lm.addCommitLog("ctc")
    Seq((1L, "x")).toDF("id", "v")
      .coalesce(1).write.option("header", "true").csv(srcCsv)
    lm.sql("COPY INTO ctc FROM '" + srcCsv + "' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
    assert(spark.sql("SELECT id, v FROM ctc")
      .as[(Long, String)].head() == ((1L, "x")))
  }

  test("identity + generated columns: CREATE declares, INSERT " +
      "allocates off the high-water mark, BY DEFAULT accepts explicit " +
      "and advances past it, ALWAYS and stale-making writes refuse") {
    val root = TestSpark.tempDir("lakeauto")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE au (id BIGINT GENERATED ALWAYS AS IDENTITY " +
      "(START WITH 10 INCREMENT BY 2), v STRING, " +
      "vlen INT GENERATED ALWAYS AS (length(v))) USING commitlog")
    // non-auto arity: just v — ids allocate 10, 12; vlen computes
    lm.sql("INSERT INTO au VALUES ('aa'), ('b')")
    lm.sql("INSERT INTO au VALUES ('ccc')") // next mark: 14
    assert(spark.sql("SELECT id, v, vlen FROM au ORDER BY id")
      .as[(Long, String, Int)].collect().toSeq ==
      Seq((10L, "aa", 2), (12L, "b", 1), (14L, "ccc", 3)))
    // GENERATED ALWAYS identity refuses explicit values (full arity)
    intercept[Exception] {
      lm.sql("INSERT INTO au VALUES (99, 'x', 1)")
    }
    // UPDATE refuses the identity column and the generated column
    // itself; updating a generation INPUT is supported — the engine
    // RECOMPUTES the generated value over the post-update row
    intercept[Exception] { lm.sql("UPDATE au SET id = 1 WHERE id = 10") }
    intercept[Exception] { lm.sql("UPDATE au SET vlen = 9") }
    lm.sql("UPDATE au SET v = 'zzzz' WHERE id = 10")
    assert(spark.sql("SELECT v, vlen FROM au WHERE id = 10")
      .as[(String, Int)].head() == (("zzzz", 4)),
      "the generated column must recompute over the post-update row")
    // MERGE on a generated table is supported (Delta's current rule):
    // clauses run, generated values recompute; SET of the generated
    // column refuses
    Seq((10L, "q")).toDF("id", "v").createOrReplaceTempView("au_src")
    lm.sql("MERGE INTO au t USING au_src s ON t.id = s.id " +
      "WHEN MATCHED THEN DELETE")
    assert(spark.sql("SELECT count(*) FROM au WHERE id = 10")
      .as[Long].head() == 0L, "the matched row deletes")
    intercept[Exception] {
      lm.sql("MERGE INTO au t USING au_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET vlen = 9")
    }
    // BY DEFAULT: explicit values accepted, the mark advances past
    // their max so later allocations never collide
    lm.sql("CREATE TABLE au2 (id BIGINT GENERATED BY DEFAULT AS " +
      "IDENTITY, v STRING) USING commitlog")
    lm.sql("INSERT INTO au2 VALUES (100, 'xyz')") // full arity, explicit
    lm.sql("INSERT INTO au2 VALUES ('q')") // allocates PAST 100
    assert(spark.sql("SELECT id FROM au2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(100L, 101L))
    // generated validation under full arity: matching passes, a
    // mismatch refuses (au2b has no identity so full arity works)
    lm.sql("CREATE TABLE au2b (v STRING, " +
      "vlen INT GENERATED ALWAYS AS (length(v))) USING commitlog")
    lm.sql("INSERT INTO au2b VALUES ('xyz', 3)")
    intercept[Exception] {
      lm.sql("INSERT INTO au2b VALUES ('xyz', 99)")
    }
    assert(spark.sql("SELECT count(*) FROM au2b").as[Long].head() == 1L)
    // descending identity: START WITH 0 INCREMENT BY -5
    lm.sql("CREATE TABLE au3 (id BIGINT GENERATED ALWAYS AS IDENTITY " +
      "(START WITH 0 INCREMENT BY -5), v STRING) USING commitlog")
    lm.sql("INSERT INTO au3 VALUES ('a'), ('b')")
    assert(spark.sql("SELECT id FROM au3 ORDER BY id DESC")
      .as[Long].collect().toSeq == Seq(0L, -5L))
    // DEFAULT values: fill when omitted, explicit wins, UPDATE free,
    // and a generalized-merge INSERT clause falls back to the default
    lm.sql("CREATE TABLE au4 (id BIGINT, v STRING DEFAULT 'none', " +
      "w DOUBLE DEFAULT 0.5) USING commitlog")
    lm.sql("INSERT INTO au4 VALUES (1)")
    lm.sql("INSERT INTO au4 VALUES (2, 'x', 9.0)")
    assert(spark.sql("SELECT id, v, w FROM au4 ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "none", 0.5), (2L, "x", 9.0)))
    lm.sql("UPDATE au4 SET v = 'up' WHERE id = 1") // defaults not locked
    Seq(5L).toDF("id").createOrReplaceTempView("au4_src")
    lm.sql("MERGE INTO au4 t USING au4_src s ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)")
    assert(spark.sql("SELECT v, w FROM au4 WHERE id = 5")
      .as[(String, Double)].head() == (("none", 0.5)))
    // DEFAULT lifecycle through ALTER: ADD COLUMNS with a DEFAULT
    // (standing rows read NULL, new inserts take it), SET DEFAULT
    // re-points it, DROP DEFAULT reverts to NULL-fill
    lm.sql("ALTER TABLE au4 ADD COLUMNS (tier STRING DEFAULT 'bronze')")
    assert(spark.sql("SELECT tier FROM au4 WHERE id = 1")
      .as[Option[String]].head().isEmpty,
      "standing rows read NULL for an added defaulted column")
    lm.sql("INSERT INTO au4 VALUES (6)")
    assert(spark.sql("SELECT v, tier FROM au4 WHERE id = 6")
      .as[(String, String)].head() == (("none", "bronze")))
    lm.sql("ALTER TABLE au4 ALTER COLUMN tier SET DEFAULT 'silver'")
    lm.sql("INSERT INTO au4 VALUES (7)")
    assert(spark.sql("SELECT tier FROM au4 WHERE id = 7")
      .as[String].head() == "silver")
    lm.sql("ALTER TABLE au4 ALTER COLUMN tier DROP DEFAULT")
    // tier is a plain column again: it joins the positional binding
    lm.sql("INSERT INTO au4 VALUES (8, NULL)")
    assert(spark.sql("SELECT tier FROM au4 WHERE id = 8")
      .as[Option[String]].head().isEmpty,
      "DROP DEFAULT reverts to explicit/NULL")
    // SYNC IDENTITY re-derives the mark from data: deleting the top
    // row and syncing makes the next allocation reuse its value
    lm.sql("DELETE FROM au2 WHERE id = 101")
    lm.sql("ALTER TABLE au2 ALTER COLUMN id SYNC IDENTITY")
    lm.sql("INSERT INTO au2 VALUES ('r')")
    assert(spark.sql("SELECT id FROM au2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(100L, 101L))
    // and on an EMPTY table it resets to the declared start
    lm.sql("DELETE FROM au2 WHERE true")
    lm.sql("ALTER TABLE au2 ALTER COLUMN id SYNC IDENTITY")
    lm.sql("INSERT INTO au2 VALUES ('s')")
    assert(spark.sql("SELECT id FROM au2").as[Long].head() == 1L)
    intercept[Exception] {
      lm.sql("ALTER TABLE au2 ALTER COLUMN v SYNC IDENTITY")
    }
    // declared-order binding with a DEFAULT column on a PARTITIONED
    // table: the empty frame reads partition-first, but the binding
    // must be the DECLARED order (a rotated bind would write 1 into
    // the partition column)
    lm.sql("CREATE TABLE au5 (a BIGINT, b STRING DEFAULT 'x', " +
      "p STRING) USING commitlog PARTITIONED BY (p)")
    lm.sql("INSERT INTO au5 VALUES (1, 'east')")
    assert(spark.sql("SELECT a, b, p FROM au5")
      .as[(Long, String, String)].head() == ((1L, "x", "east")))
    // SHOW CREATE TABLE renders the declarations as COLUMN clauses
    // and keeps engine bookkeeping out of TBLPROPERTIES
    val ddl = lm.sql("SHOW CREATE TABLE au").as[String].head()
    assert(ddl.contains("GENERATED ALWAYS AS IDENTITY " +
      "(START WITH 10 INCREMENT BY 2)") &&
      ddl.contains("GENERATED ALWAYS AS (length(v))") &&
      !ddl.contains("graft."), s"declarations must render: $ddl")
    val ddl4 = lm.sql("SHOW CREATE TABLE au4").as[String].head()
    assert(ddl4.contains("DEFAULT 'none'"), ddl4)
  }

  test("DEEP CLONE: an independent physical copy that works where " +
      "shallow refuses (partitioned layout + standing positional " +
      "deletes); the two tables diverge freely afterwards") {
    val root = TestSpark.tempDir("lakedeepclone")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE dc (id BIGINT, region STRING) " +
      "USING commitlog PARTITIONED BY (region) " +
      "TBLPROPERTIES ('delete.mode'='positional')")
    lm.sql("INSERT INTO dc VALUES (1, 'eu'), (2, 'us'), (3, 'eu')")
    lm.sql("DELETE FROM dc WHERE id = 2") // a standing dv mark
    // shallow refuses this shape; bare CLONE (deep) works
    intercept[Exception] {
      lm.sql("CREATE TABLE dc_s SHALLOW CLONE dc")
    }
    lm.sql("CREATE TABLE dc2 CLONE dc")
    assert(spark.sql("SELECT id FROM dc2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L),
      "the clone serves the dv-applied view")
    // properties traveled; the copies are PHYSICAL (no borrow marker)
    assert(lm.commitLog("dc2").properties(None)
      .get("delete.mode").contains("positional"))
    val cfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!cfs.exists(
      new org.apache.hadoop.fs.Path(s"$root/dc2/_base.json")),
      "a deep clone borrows nothing")
    // divergence: writes on either side do not leak to the other
    lm.sql("INSERT INTO dc2 VALUES (9, 'eu')")
    lm.sql("DELETE FROM dc WHERE id = 1")
    assert(spark.sql("SELECT id FROM dc ORDER BY id")
      .as[Long].collect().toSeq == Seq(3L))
    assert(spark.sql("SELECT id FROM dc2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L, 9L))
    // partition pruning works under the clone's own basePath
    assert(spark.sql("SELECT id FROM dc2 WHERE region = 'us'")
      .as[Long].collect().isEmpty)
  }

  test("table_files TVF: one row per live file off manifests alone, " +
      "span bounds rendered, historical versions served") {
    val root = TestSpark.tempDir("lakefiles")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE ft (id BIGINT, v STRING) USING commitlog")
    lm.sql("INSERT INTO ft SELECT id, CAST(id AS STRING) " +
      "FROM range(0, 100)")                       // v2
    lm.sql("INSERT INTO ft VALUES (500, 'x')")    // v3
    val files = lm.sql("SELECT file, size_bytes, num_rows, bounds " +
      "FROM table_files('ft')").collect()
    assert(files.nonEmpty &&
      files.forall(_.getAs[Long]("size_bytes") > 0L),
      "every live file must report its on-disk bytes")
    // the founding zero-row file records an explicit 0 (spansOf
    // emits FileSpans(0) for empty files — exact counts feed the
    // metadata-only aggregate path); data files report manifest rows
    assert(files.map(_.getAs[Long]("num_rows"))
      .filter(_ >= 0L).sum == 101L)
    // span bounds render as [lo, hi] strings per column on every
    // data-carrying file
    val idBounds = files.filter(_.getAs[Long]("num_rows") > 0L)
      .map(_.getAs[Map[String, String]]("bounds").get("id"))
    assert(idBounds.nonEmpty &&
      idBounds.forall(_.exists(_.matches("\\[\\d+, \\d+\\]"))),
      s"id bounds must render: ${idBounds.toSeq}")
    // the versioned form serves the historical file set
    val v2 = lm.sql("SELECT count(*) FROM table_files('ft', 2)")
      .head().getLong(0)
    assert(v2 < files.length,
      "the v2 file set must be smaller than live")
    // an aggregate composes over the TVF like any table
    assert(lm.sql("SELECT sum(num_rows) FROM table_files('ft') " +
      "WHERE num_rows >= 0").head().getLong(0) == 101L)
  }

  test("CREATE TABLE ... SHALLOW CLONE: zero-copy, registered, " +
      "independent afterwards; IF NOT EXISTS no-op; unmanaged " +
      "source passes through") {
    val root = TestSpark.tempDir("lakeclone")
    val lm = LakeManager(spark, root).init()
    lm.sql("CREATE TABLE base (id BIGINT, v STRING) USING commitlog")
    lm.sql("INSERT INTO base VALUES (1, 'a'), (2, 'b')")
    lm.sql("CREATE TABLE copy1 SHALLOW CLONE base")
    assert(lm.tables.contains("copy1"))
    assert(spark.sql("SELECT id FROM copy1 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // zero-copy: the clone's data dir holds no data files yet
    assert(SchemaTools.listDataFiles(spark, s"$root/copy1/data")
      .isEmpty, "a shallow clone must copy no data bytes")
    // independent: writes to either side never touch the other
    lm.sql("INSERT INTO copy1 VALUES (3, 'c')")
    lm.sql("DELETE FROM base WHERE id = 1")
    assert(spark.sql("SELECT count(*) FROM base").as[Long].head()
      == 1L)
    assert(spark.sql("SELECT count(*) FROM copy1").as[Long].head()
      == 3L)
    // IF NOT EXISTS over a standing clone is a no-op
    lm.sql("CREATE TABLE IF NOT EXISTS copy1 SHALLOW CLONE base")
    assert(spark.sql("SELECT count(*) FROM copy1").as[Long].head()
      == 3L)
    assertThrows[IllegalArgumentException](
      lm.sql("CREATE TABLE copy1 SHALLOW CLONE base"))
    // an unmanaged source falls through to Spark's own parse error
    intercept[Exception](
      lm.sql("CREATE TABLE c2 SHALLOW CLONE nosuch_src"))
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
