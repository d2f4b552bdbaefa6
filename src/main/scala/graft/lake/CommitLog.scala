package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Multi-writer dataset with OPTIMISTIC CONCURRENCY — the Delta-log /
  * Iceberg commit protocol, reduced to its load-bearing parts. The
  * reference is single-writer (every pydala write assumes it owns the
  * directory); at 100 TB a lake has many concurrent producers, and
  * "last directory listing wins" silently loses data. This flavor
  * makes the COMMIT the unit of truth:
  *
  * {{{
  * <root>/data/<uuid>.parquet        // immutable data files
  * <root>/_staged/<uuid>/            // writer scratch, invisible
  * <root>/_commits/v%020d.json       // the log: one file per version
  * }}}
  *
  *  - A write stages its files under `_staged/<uuid>/`, moves them into
  *    `data/` (names are UUID-unique — no collision, still invisible),
  *    and then attempts the commit: the FULL manifest payload is
  *    written to a temp file first and made visible under the version
  *    slot in one atomic step (hard-link on `file://`, no-overwrite
  *    rename on HDFS, conditional PUT with the full body on S3) — the
  *    Delta/Iceberg visibility contract: a version either does not
  *    exist or carries its complete manifest; no reader can observe a
  *    claimed-but-empty or partially-written commit. Success means
  *    this writer owns version N; failure means another writer took N,
  *    so re-read the log and try N+1.
  *  - APPEND commits commute: the retry loop always succeeds, no
  *    validation needed (Iceberg's fast-append).
  *  - REPLACE commits (overwrite, compaction) carry the base version
  *    the writer planned against. At commit time the winner-check is
  *    the CAS itself; if versions advanced past the base, the replace
  *    CONFLICTS (someone appended what this rewrite never saw) and the
  *    writer must re-plan on fresh state — a
  *    ConcurrentModificationException, Iceberg's validation failure.
  *  - A read resolves the log, not the directory: the newest REPLACE
  *    resets the live set, later APPENDs add to it. Uncommitted moves
  *    and crashed stagings are invisible by construction (debris for a
  *    vacuum sweep, never data).
  *
  * Read cost is O(commits) metadata + the manifest's files — no
  * recursive listing; compaction collapses the file count and the
  * checkpoint trick (fold old commits into one) bounds log length when
  * needed.
  */
final class CommitLog(spark: SparkSession, root: String) {

  private val rootPath = new Path(root)
  private def fs =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val mapper = new ObjectMapper()
  private def commitsDir = new Path(root, "_commits")
  private def dataDir = new Path(root, "data")

  def init(): CommitLog = {
    fs.mkdirs(commitsDir)
    fs.mkdirs(dataDir)
    this
  }

  // Fired after every commit this handle wins (LakeManager wires SQL
  // view refresh here, the CommitLog analog of TimeFly.onDataChange).
  private var commitHooks: List[() => Unit] = Nil
  def onCommit(f: () => Unit): CommitLog = {
    commitHooks ::= f
    this
  }
  private def notifyCommit(): Unit = commitHooks.foreach(_())

  private def versionFile(v: Long) =
    new Path(commitsDir, f"v$v%020d.json")

  /** Versions whose commit files exist (ascending) — after retention
    * expiry the low prefix is gone, by contract. */
  private def existingVersions(): Seq[Long] =
    if (!fs.exists(commitsDir)) Nil
    else fs.listStatus(commitsDir).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json") &&
        !n.endsWith(".checkpoint.json"))
      .map(n => n.substring(1, n.length - 5).toLong)
      .toSeq.sorted

  /** Highest committed version, 0 if none. O(commits) listing. */
  def latestVersion(): Long = existingVersions().foldLeft(0L)(math.max)

  final case class Commit(version: Long, kind: String,
      files: Seq[String])

  def commit(v: Long): Commit = {
    val txt = TimeFly.readText(fs, versionFile(v))
    if (txt.trim.isEmpty)
      // cannot happen under the atomic temp-then-link protocol (a
      // visible version carries its full payload); tolerated for logs
      // written by the pre-atomic protocol, where a crash between
      // claim and fill burned the version as a no-op append
      Commit(v, "append", Nil)
    else {
      val node = mapper.readTree(txt).asInstanceOf[ObjectNode]
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      node.withArray("files").forEach(n => buf += n.asText())
      Commit(v, node.path("kind").asText(), buf.toSeq)
    }
  }

  /** The live file set at `asOf` (default: latest): start from the
    * newest checkpoint at or below it (if one exists) and replay only
    * the commits after — the newest replace in that suffix resets,
    * later appends accumulate. Without a checkpoint the whole log
    * replays; the result is identical either way. */
  def liveFiles(asOf: Option[Long] = None): Seq[String] = {
    val hi = asOf.getOrElse(latestVersion())
    val (base, from) = newestCheckpoint(hi) match {
      case Some(cv) =>
        val node = mapper
          .readTree(TimeFly.readText(fs, checkpointFile(cv)))
          .asInstanceOf[ObjectNode]
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        node.withArray("files").forEach(n => buf += n.asText())
        (buf.toSeq, cv + 1)
      case None => (Seq.empty[String], 1L)
    }
    val commits = (from to hi).map(commit)
    val lastReplace = commits.lastIndexWhere(_.kind == "replace")
    if (lastReplace >= 0) commits.drop(lastReplace).flatMap(_.files)
    else base ++ commits.flatMap(_.files)
  }

  /** Read the committed state (optionally as of an old version — the
    * log IS a time-travel index). Uncommitted staged files are
    * invisible by construction. */
  def read(asOf: Option[Long] = None): DataFrame = {
    val files = liveFiles(asOf)
    if (files.isEmpty)
      spark.emptyDataFrame
    else spark.read.parquet(files.map(f => new Path(dataDir, f).toString): _*)
  }

  /** Incremental consumption between versions — the commit log's CDC
    * surface (the multi-writer sibling of TimeFly.readSince): exactly
    * the rows committed in (sinceVersion, asOf]. Valid while every
    * commit in the range is an APPEND — a replace re-homes existing
    * rows into new files and breaks increment semantics, so consumers
    * must re-baseline past one (the same rule every file-diff CDC
    * documents); this refuses loudly instead of double-counting. */
  def readSince(sinceVersion: Long, asOf: Option[Long] = None)
      : DataFrame = {
    val hi = asOf.getOrElse(latestVersion())
    require(sinceVersion >= 0 && sinceVersion <= hi,
      s"bad version range ($sinceVersion, $hi]")
    val cs = (sinceVersion + 1 to hi).map(commit)
    val replaces = cs.filter(_.kind == "replace")
    require(replaces.isEmpty,
      s"replace commit(s) ${replaces.map(_.version).mkString(", ")} " +
        "inside the increment — re-baseline on the replaced state")
    val files = cs.flatMap(_.files)
    if (files.isEmpty) read(None).limit(0)
    else spark.read.parquet(
      files.map(f => new Path(dataDir, f).toString): _*)
  }

  /** ADOPT an existing plain dataset into the commit-log flavor: its
    * data files MOVE into `data/` (renames, zero copy — adopting
    * 100 TB must not duplicate it) and land as commit v1, after which
    * every writer goes through the protocol. Refuses a log that
    * already has commits (adoption is a bootstrap, not a merge) and a
    * hive-partitioned source (partition values live in paths the move
    * would erase). */
  def adopt(sourcePath: String): Long = {
    require(latestVersion() == 0L,
      "adopt bootstraps an empty log; this one has commits")
    require(SchemaTools.inferPartitioning(spark, sourcePath) == "none",
      "adopt supports unpartitioned sources")
    init()
    val files = SchemaTools.listDataFiles(spark, sourcePath)
    require(files.nonEmpty, s"nothing to adopt at $sourcePath")
    val names = files.map { f =>
      val p = new Path(f)
      fs.rename(p, new Path(dataDir, p.getName))
      p.getName
    }
    if (!tryCas(1L, "append", names))
      throw new java.util.ConcurrentModificationException(
        "another writer claimed v1 during adoption")
    notifyCommit()
    1L
  }

  /** Stage `df`'s files into `data/` (invisible until committed) and
    * return their names. */
  private def stage(df: DataFrame): Seq[String] = {
    val staging = new Path(root,
      s"_staged/${java.util.UUID.randomUUID().toString.take(12)}")
    df.write.parquet(staging.toString)
    val files = SchemaTools.listDataFiles(spark, staging.toString)
    val names = files.map { f =>
      val p = new Path(f)
      fs.rename(p, new Path(dataDir, p.getName))
      p.getName
    }
    fs.delete(staging, true)
    names
  }

  private def tryCas(v: Long, kind: String, names: Seq[String])
      : Boolean = {
    val node = mapper.createObjectNode()
    node.put("kind", kind)
    val arr = node.putArray("files")
    names.foreach(arr.add)
    val vf = versionFile(v)
    // Commit visibility is ATOMIC: the full payload lands in a temp
    // file first, then links/renames into the version slot in one
    // operation that doubles as the CAS. A reader can never see an
    // empty or partial manifest, and a crash before the link leaves
    // only temp debris (vacuum sweeps it) — never a burned version.
    //  - file://: link(2) via Files.createLink — kernel-atomic,
    //    fails if the slot exists (claim + visibility in one syscall;
    //    rename(2) would silently overwrite, so it cannot be the CAS)
    //  - HDFS and rename-consistent stores: rename(tmp, vf) refuses an
    //    existing destination — the same no-overwrite CAS
    //  - S3: maps to a conditional PUT (If-None-Match: *) carrying the
    //    full body, atomic natively
    val tmp = new Path(commitsDir,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}.json")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node))
    finally out.close()
    val claimed =
      if (fs.getUri.getScheme == "file") {
        val target = java.nio.file.Paths.get(vf.toUri.getPath)
        val source = java.nio.file.Paths.get(tmp.toUri.getPath)
        try { java.nio.file.Files.createLink(target, source); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      } else {
        try fs.rename(tmp, vf)
        catch { case _: java.io.IOException => false }
      }
    // link leaves the temp in place; a failed rename does too — either
    // way the slot's visibility is already decided, so sweep quietly
    if (fs.exists(tmp)) fs.delete(tmp, false)
    claimed
  }

  /** Append `df` under the commit protocol. Appends commute, so the
    * CAS-retry loop always terminates with this writer owning some
    * version; returns it. */
  def append(df: DataFrame): Long = {
    val names = stage(df)
    var v = latestVersion() + 1
    while (!tryCas(v, "append", names)) v = latestVersion() + 1
    notifyCommit()
    v
  }

  /** Replace the live set with `df` (overwrite/compaction), valid only
    * against `baseVersion` — the state this rewrite was planned on. If
    * any commit landed past the base, the replace has not seen those
    * rows: CONFLICT, throw for the caller to re-plan on fresh state
    * (retrying at a new version would silently drop the interleaved
    * appends). Old data files stay for time travel; vacuum reclaims. */
  def replace(df: DataFrame, baseVersion: Long): Long = {
    val names = stage(df)
    val v = baseVersion + 1
    if (latestVersion() != baseVersion || !tryCas(v, "replace", names))
      throw new java.util.ConcurrentModificationException(
        s"replace planned on v$baseVersion but the log advanced " +
          s"to v${latestVersion()} — re-plan on fresh state")
    notifyCommit()
    v
  }

  /** Fold the log prefix up to `v` into a CHECKPOINT (the Delta
    * `_checkpoint` pattern): one file carrying the fully-resolved live
    * set at `v`, so readers replay `O(commits since checkpoint)`
    * instead of the whole log. Written as `v%020d.checkpoint.json`
    * NEXT TO the commit it summarizes — writing it races nothing (the
    * version is already immutable) and a missing/extra checkpoint is
    * only ever a performance fact, never a correctness one. */
  def checkpoint(v: Long): Unit = {
    require(v >= 1 && v <= latestVersion(), s"no committed version $v")
    val node = mapper.createObjectNode()
    val arr = node.putArray("files")
    liveFiles(Some(v)).foreach(arr.add)
    // same temp-then-rename visibility as commits: a reader sees the
    // whole checkpoint or none (none only costs a full log replay)
    val tmp = new Path(commitsDir,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}.json")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    val cf = checkpointFile(v)
    if (fs.exists(cf)) fs.delete(cf, false)
    fs.rename(tmp, cf)
  }

  private def checkpointFile(v: Long) =
    new Path(commitsDir, f"v$v%020d.checkpoint.json")

  /** Newest checkpoint at or below `v`, if any. */
  private def newestCheckpoint(v: Long): Option[Long] =
    if (!fs.exists(commitsDir)) None
    else fs.listStatus(commitsDir).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".checkpoint.json"))
      .map(n => n.substring(1, n.length - 16).toLong)
      .filter(_ <= v)
      .foldLeft(Option.empty[Long]) {
        case (acc, x) => Some(math.max(acc.getOrElse(x), x))
      }

  /** RETENTION: expire every version before `keepFrom`. A checkpoint
    * lands at `keepFrom` first (so resolution at or after it never
    * degrades, whatever happens next), then data files referenced ONLY
    * by the dropped prefix are reclaimed (files a pre-`keepFrom`
    * replace stranded — the live set never references them again),
    * then the prefix's commit files and stale checkpoints drop. Reads
    * before `keepFrom` become unavailable — the retention contract
    * every lake format documents; reads at or after it are untouched.
    * Crash-safe by that order: each step only removes what the
    * previous step made unreachable. Returns the reclaimed data-file
    * count. */
  def expireBefore(keepFrom: Long): Long = {
    require(keepFrom >= 1 && keepFrom <= latestVersion(),
      s"no committed version $keepFrom")
    checkpoint(keepFrom)
    val (drop, keep) = existingVersions().partition(_ < keepFrom)
    val reachable = (liveFiles(Some(keepFrom)) ++
      keep.filter(_ > keepFrom).flatMap(commit(_).files)).toSet
    val stranded = drop.flatMap(commit(_).files).distinct
      .filterNot(reachable)
    stranded.foreach(f => fs.delete(new Path(dataDir, f), false))
    drop.foreach { v =>
      fs.delete(versionFile(v), false)
      fs.delete(checkpointFile(v), false)
    }
    stranded.size
  }

  /** Debris sweep: data files no commit references (crashed writers'
    * moved-but-uncommitted files), leftover staging dirs, and orphaned
    * commit temp files. Keeps files referenced by ANY commit — old
    * versions stay readable.
    *
    * Unreferenced does NOT mean dead: a live writer moves its files
    * into `data/` (and works under `_staged/`) BEFORE its CAS lands,
    * so an unconditional sweep racing that window deletes files the
    * imminent commit references — silent data loss. The guard is the
    * one Delta VACUUM documents: only reclaim debris older than a
    * retention window (mtime-based, default [[CommitLog.RetentionMs]]
    * — far longer than any stage-to-commit gap). Pass `0` only when
    * no writer can be in flight (tests, decommission). */
  def vacuum(retentionMs: Long = CommitLog.RetentionMs): Long = {
    val cutoff = System.currentTimeMillis() - retentionMs
    def expired(s: org.apache.hadoop.fs.FileStatus): Boolean =
      s.getModificationTime <= cutoff
    // after retention expiry, files appended before the kept boundary
    // are reachable ONLY through a checkpoint — the referenced set
    // must include checkpoint contents or vacuum eats live data
    val ckFiles: Seq[String] =
      if (!fs.exists(commitsDir)) Nil
      else fs.listStatus(commitsDir).iterator
        .map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".checkpoint.json"))
        .map(n => n.substring(1, n.length - 16).toLong)
        .flatMap { cv =>
          val node = mapper
            .readTree(TimeFly.readText(fs, checkpointFile(cv)))
            .asInstanceOf[ObjectNode]
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          node.withArray("files").forEach(n => buf += n.asText())
          buf
        }.toSeq
    val referenced = (existingVersions()
      .flatMap(v => commit(v).files) ++ ckFiles).toSet
    var removed = 0L
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { s =>
        if (s.isFile && !referenced.contains(s.getPath.getName) &&
            expired(s)) {
          fs.delete(s.getPath, false)
          removed += 1
        }
      }
    val staged = new Path(root, "_staged")
    if (fs.exists(staged))
      fs.listStatus(staged).foreach { s =>
        if (expired(s)) {
          fs.delete(s.getPath, true)
          removed += 1
        }
      }
    // commit temp files a crashed writer left behind (never visible as
    // versions — the atomic link/rename was never reached)
    if (fs.exists(commitsDir))
      fs.listStatus(commitsDir).foreach { s =>
        if (s.isFile && s.getPath.getName.startsWith(".tmp-") &&
            expired(s)) {
          fs.delete(s.getPath, false)
          removed += 1
        }
      }
    removed
  }
}

object CommitLog {
  /** Default vacuum retention: debris younger than this survives the
    * sweep, so a writer mid-flight (staged or moved-but-uncommitted
    * files) is never raced. Delta's default is 7 days; one hour is
    * generous against any stage-to-commit gap while keeping crashed
    * writers' debris from accumulating for a week. */
  val RetentionMs: Long = 60L * 60 * 1000

  def apply(spark: SparkSession, root: String): CommitLog =
    new CommitLog(spark, root)
}
