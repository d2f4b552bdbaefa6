package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType}

/** File-level min/max statistics manifest — the reader-side payoff of
  * clustered layouts: a `_stats/` sidecar mapping every data file to
  * the [min, max] span of each numeric column, so a range predicate
  * reads ONLY the files whose span intersects it. Parquet row-group
  * stats already prune inside a file Spark has opened; this prunes at
  * the layer above — the FILE LISTING — which is what Delta/Iceberg
  * keep in their transaction logs and what makes a Z-ordered layout
  * (Compact `zorderBy`, q79) pay off: after clustering, every listed
  * column's per-file spans are narrow, so most files drop out of the
  * listing for selective predicates on ANY of them.
  *
  * The index is built EXPLICITLY ([[build]]) like the persisted ANN
  * indexes (e10/e11) — one distributed pass over the dataset, grouped
  * by file. Any write through [[LakeWriter]] invalidates it (the same
  * staleness discipline as `_keys`/`_shingles`: a missing/untrusted
  * manifest degrades to reading every file, never to a wrong answer);
  * rebuild after ingest, typically right after compaction/z-ordering.
  *
  * Pruning is CONSERVATIVE by construction: a file is skipped only
  * when its span provably cannot intersect `[lo, hi]`. Files with an
  * all-null column (null span) are never skipped, and the residual
  * filter is always re-applied — the stats only shrink the listing.
  */
object FileStats {

  private def dir(datasetPath: String) = new Path(datasetPath, "_stats")
  private def manifest(datasetPath: String) =
    new Path(dir(datasetPath), "_manifest.json")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def spanAggs(cols: Seq[String]) = cols.flatMap(c =>
    Seq(min(col(c).cast("double")).as(s"${c}_min"),
      max(col(c).cast("double")).as(s"${c}_max")))

  /** One distributed pass: (file, <col>_min, <col>_max ...) for every
    * numeric column (spans as doubles — pruning needs comparability,
    * not exactness; conservative either way since parquet stores the
    * exact values and the residual filter re-checks). */
  def collect(spark: SparkSession, path: String): DataFrame = {
    val df = SchemaTools.safeRead(spark, path)
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    require(numeric.nonEmpty, s"no numeric columns to index at $path")
    val aggs = spanAggs(numeric)
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize the stats sidecar (overwrites any previous one). */
  def build(spark: SparkSession, path: String): Unit = {
    val d = dir(path)
    val fs = fsOf(spark, d)
    val tmp = new Path(path, "_stats_tmp")
    collect(spark, path).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(d)) fs.delete(d, true)
    fs.rename(tmp, d)
    seal(spark, path)
  }

  def trusted(spark: SparkSession, path: String): Boolean =
    fsOf(spark, dir(path)).exists(manifest(path))

  /** Remove the sidecar (writes make it stale). */
  def invalidate(spark: SparkSession, path: String): Unit = {
    val d = dir(path)
    val fs = fsOf(spark, d)
    if (fs.exists(d)) fs.delete(d, true)
  }

  /** Drop ONLY the trust marker, keeping the stats rows — the dirty
    * state an additive write enters before its data lands: a crash
    * leaves the manifest untrusted (full-scan fallback), never
    * trusted-but-incomplete. [[appendFiles]] or [[build]] restores. */
  def distrust(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, dir(path))
    if (fs.exists(manifest(path))) fs.delete(manifest(path), false)
  }

  /** Restore the trust marker. */
  private def seal(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, dir(path))
    val out = fs.create(manifest(path), true)
    try out.write("{\"ok\":true}".getBytes("UTF-8"))
    finally out.close()
  }

  /** Incremental maintenance for additive writes (delta/append only
    * ADD files, so every existing span stays valid): compute spans for
    * just the new files and re-seal — the same update discipline as
    * the `_keys`/`_shingles` sidecars, so a standing manifest survives
    * continuous ingest without rebuild-per-batch. Gives up (full
    * invalidate) when the new files don't carry every indexed column
    * with a numeric type — e.g. a hive-partitioned target, where the
    * partition columns live in the directory names, not the files.
    * Files with zero rows produce no stats row; skipping them loses
    * nothing. */
  def appendFiles(
      spark: SparkSession,
      path: String,
      files: Seq[String]
  ): Unit = {
    val d = dir(path)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) return // nothing standing to maintain
    if (files.isEmpty) { seal(spark, path); return }
    val statsSchema = spark.read.parquet(d.toString).schema
    val indexed = statsSchema.fieldNames
      .filter(_.endsWith("_min")).map(_.stripSuffix("_min")).toSeq
    val df = spark.read.parquet(files: _*)
    val covered = indexed.forall(c =>
      df.schema.fieldNames.contains(c) &&
        df.schema(c).dataType.isInstanceOf[NumericType])
    if (!covered) { invalidate(spark, path); return }
    val aggs = spanAggs(indexed)
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .select(statsSchema.fieldNames.map(col).toSeq: _*)
      .coalesce(1)
      .write.mode("append").parquet(d.toString)
    seal(spark, path)
  }

  /** The data files whose `[min, max]` span of `colName` intersects
    * `[lo, hi]`, per the stats sidecar — None when no trusted sidecar
    * exists or it doesn't cover the column. Null-span files survive. */
  def candidateFiles(
      spark: SparkSession,
      path: String,
      colName: String,
      lo: Double,
      hi: Double
  ): Option[Seq[String]] = {
    if (!trusted(spark, path)) return None
    val stats = spark.read.parquet(dir(path).toString)
    val mn = s"${colName}_min"
    val mx = s"${colName}_max"
    if (!stats.columns.contains(mn)) return None
    Some(stats
      .filter(col(mn).isNull || col(mx).isNull ||
        (col(mx) >= lo && col(mn) <= hi))
      .select("file")
      .collect().map(_.getString(0)).toSeq)
  }

  /** Range read with file skipping: scan only the candidate files and
    * re-apply the exact predicate (the stats only shrink the listing).
    * Falls back to the full dataset when no trusted sidecar serves the
    * column. The driver-side file list is bounded by the dataset's
    * file count — the same scale class as any file listing Spark does
    * to plan the scan it replaces. */
  def readRange(
      spark: SparkSession,
      path: String,
      colName: String,
      lo: Double,
      hi: Double
  ): DataFrame = {
    // keep the residual predicate in the column's own type: a double
    // literal against an integral column inserts a cast that blocks
    // parquet pushdown. For integral columns [lo, hi] ∩ ℤ =
    // [ceil(lo), floor(hi)] exactly, so tightening the literals
    // preserves semantics and the filter reaches the scan.
    val dt = SchemaTools.safeRead(spark, path).schema(colName).dataType
    val pred = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(colName) >= math.ceil(lo).toLong &&
          col(colName) <= math.floor(hi).toLong
      case _ => col(colName) >= lo && col(colName) <= hi
    }
    candidateFiles(spark, path, colName, lo, hi) match {
      case Some(files) if files.isEmpty =>
        SchemaTools.safeRead(spark, path).filter(pred).limit(0)
      case Some(files) =>
        // basePath keeps hive partition-column resolution alive when
        // scanning an explicit file list: without it the partition
        // columns in the explicit schema would read back all-null
        spark.read
          .schema(SchemaTools.safeRead(spark, path).schema)
          .option("basePath", path)
          .parquet(files: _*)
          .filter(pred)
      case None =>
        SchemaTools.safeRead(spark, path).filter(pred)
    }
  }
}
