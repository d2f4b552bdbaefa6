package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(min * 60000L)

  test("sessionize flushes the trailing session via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionize(
      spark, input.toDF(), gapMs = 60000L, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts(1), 100L, "click", 1.0),
        EventStream.Event(2, ts(2), 100L, "click", 2.0))
      q.processAllAvailable()
      // a much-later event from another user advances the watermark far
      // past user 100's (last_ts + gap)
      input.addData(EventStream.Event(3, ts(60), 200L, "click", 1.0))
      q.processAllAvailable()
      // one more batch: timeouts fire against the advanced watermark
      input.addData(EventStream.Event(4, ts(61), 200L, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_test")
        .as[EventStream.SessionSummary].collect()
      // with NoTimeout (r1) user 100's session was never emitted
      assert(out.exists(s =>
        s.user_id == 100L && s.n_events == 2 && s.total_value == 3.0 &&
          s.first_ts == ts(1) && s.last_ts == ts(2)))
    } finally q.stop()
  }

  test("dedupStream drops in-watermark duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.dedupStream(
      input.toDF(), Seq("event_id"), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts(1), 1L, "click", 1.0),
        EventStream.Event(1, ts(2), 1L, "click", 1.0), // dup key
        EventStream.Event(2, ts(3), 2L, "view", 2.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(1, ts(4), 1L, "click", 9.0)) // replay
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("writeLake with delta mode is idempotent streaming ingestion") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val dir = graft.TestSpark.tempDir("streamlake") + "/ds"
    val ckpt = graft.TestSpark.tempDir("streamckpt")
    val q = EventStream.writeLake(
      input.toDF(), dir,
      graft.lake.WriteMode.Delta(subset = Seq("event_id")), ckpt)
    try {
      input.addData(
        EventStream.Event(1, ts(1), 1L, "click", 1.0),
        EventStream.Event(2, ts(2), 1L, "view", 2.0))
      q.processAllAvailable()
      // overlapping replay batch: only event 3 is new
      input.addData(
        EventStream.Event(2, ts(2), 1L, "view", 2.0),
        EventStream.Event(3, ts(3), 2L, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.read.parquet(dir).select("event_id")
        .as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("attributionJoin matches purchases to in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val joined = EventStream.attributionJoin(
      input.toDF(), attributionWindow = "30 minutes",
      watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts(0), 1L, "click", 0.0), // 45 min before: out
        EventStream.Event(2, ts(30), 1L, "click", 0.0), // 15 min before: in
        EventStream.Event(3, ts(40), 2L, "click", 0.0), // other user
        EventStream.Event(4, ts(45), 1L, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.table("attr_test")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((4L, 2L)))
    } finally q.stop()
  }

  test("windowedCounts aggregates per tumbling window and type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val counts = EventStream.windowedCounts(
      input.toDF(), window_ = "1 hour", watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("wc_test")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts(5), 1L, "click", 1.0),
        EventStream.Event(2, ts(10), 2L, "click", 2.0),
        EventStream.Event(3, ts(20), 1L, "view", 5.0))
      q.processAllAvailable()
      // advance watermark beyond hour 0 so its windows close (append mode)
      input.addData(EventStream.Event(4, ts(200), 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(5, ts(201), 1L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc_test")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(0), "view", 1L, 5.0)))
    } finally q.stop()
  }
}
