package graft.lake

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LakeStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // parquet file sink: the recovery-capable sink (memory is not), so
  // restarts against the SAME checkpoint prove exactly-once
  private def drain(df: org.apache.spark.sql.DataFrame,
      out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def readOut(out: String): org.apache.spark.sql.DataFrame = {
    val files = SchemaTools.listDataFiles(spark, out)
      .filter(_.endsWith(".parquet"))
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(out)
  }

  test("readStream over a commit-log table: offsets are commit " +
      "versions, a checkpointed restart resumes exactly-once, " +
      "maxVersionsPerTrigger splits the backlog, rewrites deliver " +
      "nothing") {
    val root = TestSpark.tempDir("lss")
    val out = TestSpark.tempDir("lss_out")
    val ckpt = TestSpark.tempDir("lss_ckpt")
    val log = CommitLog(spark, s"$root/t").init()
    log.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1
    log.append(Seq((3L, "c")).toDF("id", "v"))            // v2
    def src = spark.readStream.format("commitlog")
      .option("maxVersionsPerTrigger", "1")
      .load(s"$root/t")
    drain(src, out, ckpt)
    assert(readOut(out).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // one commit per micro-batch: two batches in the offset log
    val offsets = new java.io.File(s"$ckpt/offsets").list()
      .count(_.forall(_.isDigit))
    assert(offsets >= 2,
      s"maxVersionsPerTrigger=1 over 2 commits must split: $offsets")
    // appends after the drain; the restarted query on the SAME
    // checkpoint delivers exactly the missed increment — ids stay
    // unique through the restart (exactly-once)
    log.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v")) // v3
    drain(src, out, ckpt)
    assert(readOut(out).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      "the restart must deliver v3 once and re-deliver nothing")
    // a rewrite (OPTIMIZE) delivers nothing: same rows after drain
    log.optimize()
    drain(src, out, ckpt)
    assert(readOut(out).count() == 5L,
      "a compaction rewrite must not re-deliver rows")
  }

  test("readStream over a hive-partitioned commit-log table: " +
      "partition columns stream with their path-carried values") {
    val root = TestSpark.tempDir("lssp")
    val log = CommitLog(spark, s"$root/t").init()
      .initPartitioned(Seq("region"))
    log.append(Seq((1L, "eu"), (2L, "us")).toDF("id", "region")) // v1
    log.append(Seq((3L, "eu")).toDF("id", "region"))             // v2
    val out = TestSpark.tempDir("lssp_out")
    val q = spark.readStream.format("commitlog").load(s"$root/t")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", TestSpark.tempDir("lssp_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "eu"), (2L, "us"), (3L, "eu")),
      s"partition values must ride the stream: $got")
  }

  test("startingTimestamp: first commit at or after the instant " +
      "streams; a pre-table instant streams from the start; " +
      "combining with startingVersion refuses") {
    val root = TestSpark.tempDir("lsst")
    val log = CommitLog(spark, s"$root/t").init()
    log.append(Seq((1L, "a")).toDF("id", "v")) // v1
    log.append(Seq((2L, "b")).toDF("id", "v")) // v2
    val t1 = log.commit(1L).ts
    def drainFrom(tsOpt: String, tag: String): Seq[Long] = {
      val out = TestSpark.tempDir(s"lsst_out_$tag")
      val q = spark.readStream.format("commitlog")
        .option("startingTimestamp", tsOpt)
        .load(s"$root/t")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", TestSpark.tempDir(s"lsst_ck_$tag"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    }
    // instant = v1's commit time -> v1 is AT the instant, so it
    // delivers (at-or-after, Delta's contract)
    assert(drainFrom(new java.sql.Timestamp(t1).toString, "mid")
      == Seq(1L, 2L))
    // one millisecond later -> strictly after v1 -> v2 only
    assert(drainFrom(new java.sql.Timestamp(t1 + 1).toString, "mid2")
      == Seq(2L))
    // an instant predating the table -> everything
    assert(drainFrom("1990-01-01 00:00:00", "pre") == Seq(1L, 2L))
    // UTC instants parse as UTC ('Z' suffix), not local wall clock
    assert(drainFrom(java.time.Instant.ofEpochMilli(t1 + 1).toString,
      "utc") == Seq(2L))
    intercept[Exception] {
      spark.readStream.format("commitlog")
        .option("startingTimestamp", "1990-01-01 00:00:00")
        .option("startingVersion", "1")
        .load(s"$root/t")
        .writeStream.format("noop")
        .option("checkpointLocation", TestSpark.tempDir("lsst_ck_x"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
  }

  test("a truncated log refuses a fresh stream below its earliest " +
      "retained version; startingVersion at the boundary streams") {
    val root = TestSpark.tempDir("lsst")
    val log = CommitLog(spark, s"$root/t").init()
    log.append(Seq((1L, "a")).toDF("id", "v")) // v1
    log.append(Seq((2L, "b")).toDF("id", "v")) // v2
    log.append(Seq((3L, "c")).toDF("id", "v")) // v3
    log.expireBefore(3L) // checkpoint at v3, drop v1/v2 manifests
    intercept[Exception] {
      spark.readStream.format("commitlog").load(s"$root/t")
        .writeStream.format("parquet")
        .option("path", TestSpark.tempDir("lsst_o1"))
        .option("checkpointLocation", TestSpark.tempDir("lsst_c1"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val out = TestSpark.tempDir("lsst_o2")
    spark.readStream.format("commitlog")
      .option("startingVersion", "3").load(s"$root/t")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", TestSpark.tempDir("lsst_c2"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(readOut(out).select("id").as[Long].collect().toSeq ==
      Seq(3L), "the boundary stream must deliver the retained tail")
  }

  test("commitlog sink: lake-to-lake streaming replication is " +
      "exactly-once (txn-marked commits skip on replay), Complete " +
      "mode replaces per batch") {
    val root = TestSpark.tempDir("lsk")
    val ckpt = TestSpark.tempDir("lsk_ck")
    val srcLog = CommitLog(spark, s"$root/src").init()
    srcLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1
    srcLog.append(Seq((3L, "c")).toDF("id", "v"))            // v2
    def replicate(): Unit = {
      val q = spark.readStream.format("commitlog")
        .option("maxVersionsPerTrigger", "1")
        .load(s"$root/src")
        .writeStream.format("commitlog")
        .option("path", s"$root/dst")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    replicate()
    val dst = CommitLog(spark, s"$root/dst")
    assert(dst.read(None).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // per-commit micro-batches -> per-batch txn-marked commits
    assert(dst.latestVersion() == 2L &&
      (1L to 2L).forall(v => dst.commit(v).txn.isDefined),
      "each micro-batch must land as one txn-marked commit")
    // restart replicates ONLY the new commit; replayed batches skip
    srcLog.append(Seq((4L, "d")).toDF("id", "v"))            // v3
    replicate()
    assert(dst.read(None).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "replication must be exactly-once across restarts")
    // a replayed batch against the standing high-water mark is a skip
    assert(dst.appendOnce(Seq((9L, "x")).toDF("id", "v"),
      s"commitlog-sink@$root/dst", 0L).isEmpty,
      "an at-or-below-mark batch must skip")
    // Complete mode: each batch replaces the live set
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    mem.addData((10L, "z"))
    val q2 = mem.toDF().toDF("id", "v")
      .groupBy("id").count()
      .writeStream.format("commitlog")
      .option("path", s"$root/agg")
      .option("checkpointLocation", TestSpark.tempDir("lsk_ck2"))
      .outputMode("complete").start()
    try {
      q2.processAllAvailable()
      mem.addData((10L, "y"), (11L, "w"))
      q2.processAllAvailable()
      val agg = CommitLog(spark, s"$root/agg").read(None)
      assert(agg.as[(Long, Long)].collect().toMap ==
        Map(10L -> 2L, 11L -> 1L),
        "Complete mode must serve the full current aggregate")
    } finally q2.stop()
  }

  test("commitlog sink Update mode + mergeKeys: update-mode windowed " +
      "aggs land as keyed txn-marked merges — the streaming " +
      "materialized view equals the complete aggregation") {
    val root = TestSpark.tempDir("lsu")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "x")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("x")
        .as("total"))
      .writeStream.format("commitlog")
      .option("path", s"$root/mv")
      .option("mergeKeys", "k")
      .option("checkpointLocation", TestSpark.tempDir("lsu_ck"))
      .outputMode("update").start()
    try {
      mem.addData((1L, 10L), (2L, 5L))
      q.processAllAvailable()
      mem.addData((1L, 7L), (3L, 1L)) // k=1 updates, k=3 inserts
      q.processAllAvailable()
      val mv = CommitLog(spark, s"$root/mv").read(None)
        .as[(Long, Long)].collect().toMap
      assert(mv == Map(1L -> 17L, 2L -> 5L, 3L -> 1L),
        s"the maintained view must equal the complete agg: $mv")
      // every commit carries its txn mark (replays would skip)
      val log = CommitLog(spark, s"$root/mv")
      assert((1L to log.latestVersion())
        .forall(v => log.commit(v).txn.isDefined))
    } finally q.stop()
    // mergeKeys without update mode (and vice versa) refuse
    intercept[Exception] {
      mem.toDF().toDF("k", "x").writeStream.format("commitlog")
        .option("path", s"$root/bad")
        .option("mergeKeys", "k")
        .option("checkpointLocation", TestSpark.tempDir("lsu_ck2"))
        .outputMode("append").start()
    }
  }

  test("readChangeFeed streams the CDC shape (positional deletes as " +
      "full pre-images); upserts fail the stream unless " +
      "ignoreChanges; startingVersion=latest skips history") {
    val root = TestSpark.tempDir("lss2")
    val log = CommitLog(spark, s"$root/t").init()
    log.append(spark.range(10)
      .select(col("id"), (col("id") * 2).as("v"))) // v1
    log.deleteWhereMor("id % 5 = 0")               // v2: dv marks
    def feed = spark.readStream.format("commitlog")
      .option("readChangeFeed", "true")
      .load(s"$root/t")
    val out1 = TestSpark.tempDir("lss2_out1")
    val ck1 = TestSpark.tempDir("lss2_ck1")
    drain(feed, out1, ck1)
    val got = readOut(out1)
    assert(got.filter(col("_op") === "insert").count() == 10L)
    val dels = got.filter(col("_op") === "delete")
    assert(dels.select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 5L) &&
      dels.filter(col("v").isNull).count() == 0,
      "positional deletes must stream as full pre-images")
    assert(got.select("_commit_version").distinct().count() == 2L)
    // an upsert is non-decomposable: the next drain refuses...
    log.upsert(Seq((1L, 99L)).toDF("id", "v"), Seq("id")) // v3
    intercept[Exception] {
      drain(feed, out1, ck1)
    }
    // ...unless ignoreChanges (skipChangeCommits) opts out
    val tolerant = spark.readStream.format("commitlog")
      .option("readChangeFeed", "true")
      .option("ignoreChanges", "true")
      .load(s"$root/t")
    val out3 = TestSpark.tempDir("lss2_out3")
    drain(tolerant, out3, TestSpark.tempDir("lss2_ck3"))
    assert(readOut(out3)
      .filter(col("_op") === "insert").count() == 10L)
    // startingVersion=latest: nothing until a NEW commit lands
    def fromNow = spark.readStream.format("commitlog")
      .option("startingVersion", "latest").load(s"$root/t")
    val out4 = TestSpark.tempDir("lss2_out4")
    val ck4 = TestSpark.tempDir("lss2_ck4")
    drain(fromNow, out4, ck4)
    assert(readOut(out4).count() == 0L)
    log.append(Seq((100L, 0L)).toDF("id", "v"))
    drain(fromNow, out4, ck4)
    assert(readOut(out4).select("id").as[Long]
      .collect().toSeq == Seq(100L))
  }

  test("readChangeFeed streams ACROSS a merge when the change data " +
      "feed is on: the commit's persisted change rows deliver instead " +
      "of failing the stream") {
    import graft.lake.CommitLog.{MergeClause, MergeInsert, MergeUpdate}
    val root = TestSpark.tempDir("lsscdf")
    val log = CommitLog(spark, s"$root/t").init()
    log.append(spark.range(5)
      .select(col("id"), (col("id") * 2).as("v"))) // v1
    log.setProperties(Map(CommitLog.CdfEnabledKey -> "true")) // v2
    log.merge(Seq((1L, 100L), (9L, 900L)).toDF("id", "sv"), Seq("id"),
      matched = Seq(MergeClause(None, MergeUpdate(Seq("v" -> "__s_sv")))),
      notMatched = Seq(MergeClause(None,
        MergeInsert(Seq("id" -> "__s_id", "v" -> "__s_sv")))),
      notMatchedBySource = Nil) // v3: upsert-kind WITH change files
    val feed = spark.readStream.format("commitlog")
      .option("readChangeFeed", "true")
      .load(s"$root/t")
    val out = TestSpark.tempDir("lsscdf_out")
    drain(feed, out, TestSpark.tempDir("lsscdf_ck"))
    val got = readOut(out)
    assert(got.filter(col("_op") === "insert")
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L, 3L, 4L, 9L))
    assert(got.filter(col("_op") === "update_preimage")
      .select("id", "v").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 2L)))
    assert(got.filter(col("_op") === "update_postimage")
      .select("id", "v").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 100L)))
  }
}
