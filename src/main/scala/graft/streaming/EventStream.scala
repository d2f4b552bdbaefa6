package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming veneer over the `events` fixture shape.
  *
  * The reference has no streaming machinery (SURVEY.md §2.13) — this is a
  * north-star extension: the same lake directories become streaming
  * sources, with watermarked tumbling-window aggregation and custom
  * session state via `flatMapGroupsWithState`.
  */
object EventStream {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double
  )

  final case class SessionSummary(
      user_id: Long,
      n_events: Long,
      total_value: Double,
      first_ts: java.sql.Timestamp,
      last_ts: java.sql.Timestamp
  )

  /** File-source stream over a directory of event parquet. */
  def readEvents(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("total_value")
      )

  /** Watermarked stream-stream interval join: purchases attributed to
    * the same user's clicks within `attributionWindow` before the
    * purchase. Both sides carry watermarks and the join condition bounds
    * the event-time gap, so each side's state is dropped once the
    * watermark passes the window — bounded state, the canonical
    * stream-stream join shape. */
  def attributionJoin(
      events: DataFrame,
      attributionWindow: String = "1 hour",
      watermark: String = "1 hour"
  ): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(
      clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $attributionWindow"),
      "inner")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"), col("value"))
  }

  /** Left-OUTER stream-stream interval join — conversion tracking:
    * every click emits, matched with purchases by the same user within
    * `window` AFTER the click, or null-padded once the watermark proves
    * no match can arrive (the click's interval has wholly passed). The
    * null-emission-on-state-eviction is the semantics that separates a
    * streaming outer join from its batch counterpart: a batch LEFT JOIN
    * knows the full right side, the stream must WAIT OUT each click's
    * window — so clicks whose window the final watermark has not closed
    * are withheld, exactly like q35/q101's open windows (the oracle
    * encodes that rule). */
  def conversionJoin(
      events: DataFrame,
      window: String = "30 minutes",
      watermark: String = "0 seconds"
  ): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(
      purchases,
      col("p_user") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"),
        col("click_ts"), col("purchase_id"), col("purchase_ts"),
        col("value"))
  }

  /** Streaming exact dedup for ingestion pipelines: watermark-bounded
    * `dropDuplicatesWithinWatermark` on the key columns — per-key state
    * is dropped once the watermark passes it, so state stays bounded at
    * any scale (duplicates arriving farther apart than the watermark can
    * re-emit; that is the bounded-state tradeoff, and the lake-side delta
    * write mode catches those). */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "1 hour"
  ): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream -> lake sink: every micro-batch goes through LakeWriter with
    * the configured write mode. With `WriteMode.Delta(subset=...)` this is
    * idempotent streaming ingestion — replayed/overlapping batches only
    * append genuinely-new rows, the streaming analog of the reference's
    * delta batch writes. */
  def writeLake(
      events: DataFrame,
      path: String,
      mode: graft.lake.WriteMode,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.lake.LakeWriter(batch.sparkSession, path, mode).write(batch)
      }
      .start()

  /** Per-user session rollup with explicit state (gap timeout closes the
    * session): the `flatMapGroupsWithState` pattern for custom state at
    * scale — state is partitioned by key, never driver-side.
    *
    * Uses an event-time timeout driven by the watermark: when no event for
    * a user arrives within the gap, the timeout branch emits the open
    * session and clears the state — so the trailing session per user is
    * flushed and per-user state cannot grow without bound (with NoTimeout
    * it would be retained forever and the last session never emitted). */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "30 minutes"
  ): DataFrame = {
    import spark.implicits._
    val typed = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", watermark)
      .as[Event]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(updateSession(gapMs))
      .toDF()
  }

  final case class SessionState(
      nEvents: Long,
      totalValue: Double,
      firstTs: Long,
      lastTs: Long
  )

  private def updateSession(gapMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]
  ): Iterator[SessionSummary] = {
    def summary(s: SessionState) =
      SessionSummary(userId, s.nEvents, s.totalValue,
        new java.sql.Timestamp(s.firstTs), new java.sql.Timestamp(s.lastTs))
    if (state.hasTimedOut) {
      // Gap elapsed (watermark passed lastTs + gap): flush the open
      // session and drop the state.
      val out = state.getOption.map(summary).iterator
      state.remove()
      out
    } else {
      val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
      var cur = state.getOption
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapMs =>
            out += summary(s)
            cur = Some(SessionState(1, e.value, t, t))
          case Some(s) =>
            cur = Some(SessionState(s.nEvents + 1, s.totalValue + e.value,
              s.firstTs, t))
          case None =>
            cur = Some(SessionState(1, e.value, t, t))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // Close the session once the watermark passes the gap boundary
        // (timeout must be set beyond the current watermark).
        val target = s.lastTs + gapMs
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(target, floor))
      }
      out.iterator
    }
  }
}
