package graft.lake

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STRUCTURED STREAMING SOURCE over a commit-log table — the Delta
  * streaming-source analog (`spark.readStream.format("commitlog")
  * .load(root)`): offsets ARE commit versions, so exactly-once
  * delivery falls out of the checkpointed offset log plus the commit
  * protocol's atomic visibility — a batch is exactly the rows
  * committed in `(startOffset, endOffset]`, resolved through
  * [[CommitLog.readSince]] (append rows) or, with
  * `.option("readChangeFeed", "true")`, [[CommitLog.changesSince]]
  * (rows tagged `_op`/`_commit_version` — inserts, keyed-delete keys,
  * positional-delete full pre-images).
  *
  * 100 TB shape: `getOffset` is one O(commits) manifest listing and
  * `getBatch` plans only the range's own files (never the lake), so
  * trigger cost scales with the INCREMENT, not table size. Options:
  *  - `startingVersion` (default 1): first commit delivered —
  *    `latest` starts past the current tip (Delta's own keyword)
  *  - `startingTimestamp`: first commit at or after the instant
  *    (exclusive with startingVersion; an instant predating the
  *    first commit streams from the start — Delta's contract)
  *  - `maxVersionsPerTrigger`: cap commits per micro-batch (the
  *    maxFilesPerTrigger analog; offsets stay monotone, the backlog
  *    drains across triggers)
  *  - `readChangeFeed`: emit the CDC shape instead of append rows
  *  - `ignoreChanges`: deliver past non-decomposable commits instead
  *    of failing the stream (upsert outputs re-deliver, see
  *    [[CommitLog.readSince]]; in feed mode they are skipped —
  *    skipChangeCommits)
  *
  * Batches conform to the schema DECLARED at stream start (drift
  * inside the stream lands as casts/null-fill, never a mid-stream
  * schema change — Spark's own streaming contract). Reference
  * surface: pydatalake has no streaming reader — its closest
  * incremental surfaces are snapshot diffing
  * (`src/pydala/dataset/timefly.py:73-78` timestamp-named snapshots)
  * and the delta write mode's anti-diff
  * (`src/pydala/dataset/writer.py:185-256`); the streaming source is
  * the Spark-native extension SURVEY §2.13 names. */
final class LakeStreamSource(
    sqlContext: SQLContext,
    root: String,
    declared: StructType,
    changeFeed: Boolean,
    startBase: Long,
    maxVersionsPerTrigger: Option[Long],
    ignoreChanges: Boolean)
  extends Source
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => V2Offset, ReadLimit}

  private val spark = sqlContext.sparkSession
  private val log = CommitLog(spark, root)
  // monotone high-water mark of offered offsets; recovery getBatch
  // calls (whose end came from the checkpointed offset log) fold in,
  // so a restarted source never re-offers below the checkpoint
  private var offered: Long = startBase
  // Trigger.AvailableNow fence: versions committed after the trigger
  // started are NOT this run's to drain
  private var fence: Option[Long] = None

  override def schema: StructType = declared

  override def getOffset: Option[Offset] = synchronized {
    val latest = fence.getOrElse(log.latestVersion())
    val next = maxVersionsPerTrigger
      .map(m => math.min(latest, offered + math.max(1L, m)))
      .getOrElse(latest)
    if (next > offered) offered = next
    if (offered <= startBase) None else Some(LongOffset(offered))
  }

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    fence = Some(log.latestVersion())
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: V2Offset, limit: ReadLimit)
      : V2Offset = {
    // admission control rides the same monotone mark getOffset keeps
    // (the per-trigger version cap is this source's own read limit)
    getOffset.orNull
  }

  private def versionOf(o: org.apache.spark.sql.connector.read
      .streaming.Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset)
      : DataFrame = {
    val endV = versionOf(end)
    val sinceV = start.map(versionOf).getOrElse(startBase)
    synchronized { if (endV > offered) offered = endV }
    val batch =
      if (endV <= sinceV) log.read(None).limit(0)
      else if (changeFeed)
        log.changesSince(sinceV, Some(endV), skipBreaking = ignoreChanges)
      else log.readSince(sinceV, Some(endV), skipBreaking = ignoreChanges)
    // the physical plan resolves NOW (file pruning against the range's
    // manifests); rows evaluate lazily when the micro-batch executes
    org.apache.spark.sql.GraftSqlBridge.streamingFrame(
      spark, SchemaTools.conformTo(batch, declared))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** STREAMING SINK half of the pair — `writeStream.format(
  * "commitlog")`: each micro-batch lands as ONE commit through
  * [[CommitLog.appendOnce]] with `(appId, batchId)` recorded in the
  * manifest, so a replayed batch (restart, retry, at-least-once
  * upstream) SKIPS instead of landing twice — the Delta
  * txnAppId/txnVersion contract, end-to-end exactly-once when the
  * source replays deterministically. OutputMode:
  *  - Append: `appendOnce` per batch
  *  - Complete: `replace` per batch (each batch carries the full
  *    result — rewriting the live set IS the idempotence)
  *  - Update + `.option("mergeKeys", "k1,k2")`: keyed `upsertOnce`
  *    per batch — the streaming MATERIALIZED-VIEW maintenance shape
  *    (update-mode windowed aggs land as row-level merges), with the
  *    same txn mark so a replayed batch burns no version
  * `txnAppId` option scopes the high-water mark when several queries
  * write one table (defaults to the sink path — single-writer). */
final class LakeStreamSink(
    sqlContext: SQLContext,
    root: String,
    appId: String,
    mode: org.apache.spark.sql.streaming.OutputMode,
    mergeKeys: Seq[String])
  extends org.apache.spark.sql.execution.streaming.Sink {

  import org.apache.spark.sql.streaming.OutputMode

  private val log = CommitLog(sqlContext.sparkSession, root).init()

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : Unit = {
    val batch = org.apache.spark.sql.GraftSqlBridge
      .sinkBatchFrame(data.toDF())
    mode match {
      case m if m == OutputMode.Complete() =>
        log.replace(batch, log.latestVersion())
      case m if m == OutputMode.Update() =>
        if (log.latestVersion() == 0L)
          log.appendOnce(batch, appId, batchId)
        else log.upsertOnce(batch, mergeKeys, appId, batchId)
      case _ => log.appendOnce(batch, appId, batchId)
    }
  }
}

/** `format("commitlog")` provider (also addressable by class name) —
  * source AND sink. The path option names the table ROOT (the
  * directory holding `_commits/`); source schema comes from the live
  * table unless the caller declares one (required for an empty
  * log). */
final class LakeStreamProvider
  extends StreamSourceProvider
  with org.apache.spark.sql.sources.StreamSinkProvider
  with DataSourceRegister {

  override def shortName(): String = "commitlog"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "the commitlog sink wants .option(\"path\", <table root>)"))
    require(partitionColumns.isEmpty,
      "partition the TABLE (initPartitioned), not the sink")
    import org.apache.spark.sql.streaming.OutputMode
    val mergeKeys = parameters.get("mergeKeys")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
    require(Seq(OutputMode.Append(), OutputMode.Complete(),
        OutputMode.Update()).contains(outputMode),
      s"the commitlog sink supports Append/Complete/Update, " +
        s"got $outputMode")
    require((outputMode == OutputMode.Update()) == mergeKeys.nonEmpty,
      "Update mode needs .option(\"mergeKeys\", \"k1,k2\") — and " +
        "mergeKeys only makes sense in Update mode")
    new LakeStreamSink(sqlContext, root,
      parameters.getOrElse("txnAppId", s"commitlog-sink@$root"),
      outputMode, mergeKeys)
  }

  private def feedCols = Seq(
    StructField("_op", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false))

  private def resolveSchema(
      sqlContext: SQLContext,
      userSchema: Option[StructType],
      parameters: Map[String, String]): StructType = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "the commitlog source wants .load(<table root>)"))
    val changeFeed =
      parameters.get("readChangeFeed").exists(_.toBoolean)
    val base = userSchema.getOrElse {
      val log = CommitLog(sqlContext.sparkSession, root)
      require(log.latestVersion() > 0L,
        s"$root has no commits yet — declare a schema to stream an " +
          "empty table")
      log.read(None).schema
    }
    if (changeFeed) StructType(base.fields.toSeq ++ feedCols) else base
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), resolveSchema(sqlContext, schema, parameters))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val root = parameters("path")
    val changeFeed =
      parameters.get("readChangeFeed").exists(_.toBoolean)
    val log = CommitLog(sqlContext.sparkSession, root)
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are exclusive")
    val startBase = parameters.get("startingVersion") match {
      case Some("latest") =>
        // resolve ONCE per stream, not per restart: the base persists
        // in the query's own checkpoint (metadataPath) so a restarted
        // query keeps the tip observed when the stream FIRST started
        // (the Kafka/Delta initial-offset contract)
        val fs = new org.apache.hadoop.fs.Path(metadataPath)
          .getFileSystem(sqlContext.sparkSession.sparkContext
            .hadoopConfiguration)
        val baseFile = new org.apache.hadoop.fs.Path(
          metadataPath, "graft-start-base")
        if (fs.exists(baseFile))
          TimeFly.readText(fs, baseFile).trim.toLong
        else {
          val base = log.latestVersion()
          val tmp = new org.apache.hadoop.fs.Path(
            metadataPath, s"graft-start-base.tmp")
          val out = fs.create(tmp, true)
          try out.write(base.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          // rename-as-CAS: a concurrent creator's base wins, re-read
          if (!fs.rename(tmp, baseFile)) fs.delete(tmp, false)
          TimeFly.readText(fs, baseFile).trim.toLong
        }
      case Some(v) =>
        require(v.forall(_.isDigit) && v.toLong >= 1,
          s"startingVersion wants a commit number >= 1 or 'latest', " +
            s"got $v")
        v.toLong - 1 // inclusive start -> exclusive base
      case None =>
        // startingTimestamp (Delta's option): first commit AT OR
        // AFTER the instant — versionAt gives latest-at-or-before,
        // so the exclusive base is exactly that
        parameters.get("startingTimestamp") match {
          case Some(ts) =>
            // 'Z'-suffixed instants are UTC (Instant.parse); naive
            // strings are JVM-local wall clock (Delta's convention)
            val millis =
              if (ts.endsWith("Z"))
                java.time.Instant.parse(
                  if (ts.contains("T")) ts else ts.replace(" ", "T"))
                  .toEpochMilli
              else java.sql.Timestamp.valueOf(ts.replace("T", " "))
                .getTime
            // first commit AT OR AFTER the instant delivers: the
            // exclusive base is the latest commit STRICTLY BEFORE it.
            // An instant at or before the earliest retained commit
            // streams from the start — everything else propagates
            // (a malformed timestamp or broken manifest must not
            // silently replay the whole table)
            val lo = log.earliestVersion()
            if (log.latestVersion() == 0L ||
                log.commit(math.max(lo, 1L)).ts >= millis)
              math.max(lo - 1L, 0L)
            else log.versionAt(millis - 1L)
          case None => 0L
        }
    }
    // a truncated log (expireBefore) has no manifests below its
    // earliest retained version — increments there are gone (folded
    // into the checkpoint), so refuse LOUDLY instead of crashing on
    // the first missing manifest mid-stream
    val earliest = log.earliestVersion()
    require(earliest <= 1L || startBase >= earliest - 1,
      s"history before v$earliest is truncated — stream with " +
        s"startingVersion >= $earliest (or 'latest'), or re-baseline " +
        "from a full read")
    new LakeStreamSource(
      sqlContext, root,
      resolveSchema(sqlContext, schema, parameters),
      changeFeed, startBase,
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      parameters.get("ignoreChanges").exists(_.toBoolean))
  }
}
