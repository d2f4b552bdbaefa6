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

  /** One distributed pass: (file, <col>_min, <col>_max ..., n_rows)
    * for every numeric column (spans as doubles — pruning needs
    * comparability, not exactness; conservative either way since
    * parquet stores the exact values and the residual filter
    * re-checks). `n_rows` rides along for free (the group is already
    * per-file) and lets metadata tables ([[SchemaTools.partitionsTable]])
    * serve row counts from the manifest instead of driver-side footer
    * opens. */
  def collect(spark: SparkSession, path: String): DataFrame =
    collectFrom(spark, SchemaTools.safeRead(spark, path), path)

  private def collectFrom(
      spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    require(numeric.nonEmpty, s"no numeric columns to index at $path")
    val aggs = spanAggs(numeric) :+ count(lit(1)).as("n_rows")
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize the stats sidecar (overwrites any previous one). */
  def build(spark: SparkSession, path: String): Unit =
    buildFrom(spark, SchemaTools.safeRead(spark, path), path)

  /** Build the sidecar for `path` over an EXPLICIT file list — the
    * commit-log flavor, where the live set is manifest-resolved rather
    * than a directory listing ([[CommitLog]] data files live under
    * `data/` next to non-data debris the listing must not see). */
  def buildForFiles(
      spark: SparkSession, path: String, files: Seq[String]): Unit = {
    require(files.nonEmpty, s"no files to index at $path")
    buildFrom(spark, spark.read.parquet(files: _*), path)
  }

  /** Build over a caller-assembled frame — the schema-evolved
    * commit-log flavor, where a plain multi-file read would resolve
    * against one sampled footer (missing drifted columns, or throwing
    * outright on a type-widened one). The frame must preserve
    * `input_file_name()` per row (grouped per-schema scans do); files
    * missing a column land null spans for it — kept conservatively by
    * [[candidatesForBounds]]'s isNull arm. */
  def buildForDataFrame(
      spark: SparkSession, path: String, df: DataFrame): Unit =
    buildFrom(spark, df, path)

  private def buildFrom(
      spark: SparkSession, df: DataFrame, path: String): Unit = {
    val d = dir(path)
    val fs = fsOf(spark, d)
    val tmp = new Path(path, "_stats_tmp")
    collectFrom(spark, df, path).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(d)) fs.delete(d, true)
    fs.rename(tmp, d)
    seal(spark, path)
  }

  /** Every file the sidecar has a row for (by full path as recorded at
    * build time) — None without a trusted manifest. Data files are
    * immutable (UUID/task-unique names, never overwritten in place),
    * so a file's stats row stays valid for as long as the file exists;
    * membership here is what lets a manifest-resolved reader prune
    * "indexed files by span, unindexed files kept" conservatively. */
  def indexedFiles(spark: SparkSession, path: String)
      : Option[Seq[String]] = {
    if (!trusted(spark, path)) return None
    Some(spark.read.parquet(dir(path).toString)
      .select("file").collect().map(_.getString(0)).toSeq)
  }

  /** Per-file row counts from the manifest: (file, n_rows), None when
    * no trusted sidecar exists or it predates the `n_rows` column. */
  def rowCounts(spark: SparkSession, path: String): Option[DataFrame] = {
    if (!trusted(spark, path)) return None
    val stats = spark.read.parquet(dir(path).toString)
    if (!stats.columns.contains("n_rows")) None
    else Some(stats.select(col("file"), col("n_rows")))
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
    // n_rows computed unconditionally; the schema-conforming select
    // drops it for sidecars built before it existed
    val aggs = spanAggs(indexed) :+ count(lit(1)).as("n_rows")
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
  ): Option[Seq[String]] =
    candidatesForBounds(spark, path, Map(colName -> ((lo, hi))))

  /** Multi-column candidate resolution in ONE stats read: files whose
    * span intersects EVERY given `[lo, hi]` — the conjunction prunes on
    * each covered column independently, which is exactly what a
    * z-ordered layout (narrow per-file spans on every clustered column)
    * is built to serve. Columns the manifest doesn't cover are ignored
    * (their conjuncts stay residual-only); None when no trusted
    * manifest exists or it covers none of the columns. */
  def candidatesForBounds(
      spark: SparkSession,
      path: String,
      bounds: Map[String, (Double, Double)]
  ): Option[Seq[String]] = {
    if (!trusted(spark, path)) return None
    val stats = spark.read.parquet(dir(path).toString)
    // resolve requested names against the manifest case-insensitively,
    // matching Spark's default resolution
    val byLower = stats.columns.filter(_.endsWith("_min"))
      .map(c => c.stripSuffix("_min"))
      .map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    val covered = bounds.flatMap { case (c, b) =>
      byLower.get(c.toLowerCase(java.util.Locale.ROOT)).map(_ -> b)
    }
    if (covered.isEmpty) return None
    val cond = covered.map { case (c, (lo, hi)) =>
      col(s"${c}_min").isNull || col(s"${c}_max").isNull ||
        (col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
    }.reduce(_ && _)
    Some(stats.filter(cond).select("file")
      .collect().map(_.getString(0)).toSeq)
  }

  /** Per-column `[lo, hi]` bounds extractable from the TOP-LEVEL `AND`
    * conjuncts of a SQL predicate string. Only necessary conditions are
    * taken — every conjunct of a conjunction must hold, so pruning the
    * file listing with ANY subset of them is conservative; `OR`s,
    * function calls, and non-numeric comparisons simply contribute
    * nothing and stay residual-only. Strict inequalities widen to their
    * closed forms (again conservative: candidate supersets only). */
  def rangeBounds(
      spark: SparkSession,
      predicate: String
  ): Map[String, (Double, Double)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, Between, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(predicate)
      catch { case scala.util.control.NonFatal(_) => return Map.empty }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.name)
      case _ => None
    }
    def num(e: Expression): Option[Double] = e match {
      case Literal(v, _: NumericType) =>
        scala.util.Try(v.toString.toDouble).toOption
      case _ => None
    }
    val neg = Double.NegativeInfinity
    val pos = Double.PositiveInfinity
    val acc = scala.collection.mutable.Map[String, (Double, Double)]()
    def add(n: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = acc.getOrElse(n, (neg, pos))
      acc(n) = (math.max(l0, lo), math.min(h0, hi))
    }
    // (name, value, colOnLeft) for `col OP lit` / `lit OP col`
    def sides(a: Expression, b: Expression): Option[(String, Double, Boolean)] =
      (nameOf(a), num(b)) match {
        case (Some(n), Some(v)) => Some((n, v, true))
        case _ => (nameOf(b), num(a)) match {
          case (Some(n), Some(v)) => Some((n, v, false))
          case _ => None
        }
      }
    conjuncts(parsed).foreach {
      case GreaterThanOrEqual(a, b) => sides(a, b).foreach {
        case (n, v, true) => add(n, v, pos)
        case (n, v, false) => add(n, neg, v)
      }
      case GreaterThan(a, b) => sides(a, b).foreach {
        case (n, v, true) => add(n, v, pos)
        case (n, v, false) => add(n, neg, v)
      }
      case LessThanOrEqual(a, b) => sides(a, b).foreach {
        case (n, v, true) => add(n, neg, v)
        case (n, v, false) => add(n, v, pos)
      }
      case LessThan(a, b) => sides(a, b).foreach {
        case (n, v, true) => add(n, neg, v)
        case (n, v, false) => add(n, v, pos)
      }
      case EqualTo(a, b) => sides(a, b).foreach {
        case (n, v, _) => add(n, v, v)
      }
      case Between(c, lo, hi, _) =>
        for (n <- nameOf(c); l <- num(lo); h <- num(hi)) add(n, l, h)
      // the parser leaves `x BETWEEN a AND b` as an unresolved
      // "between" call; resolution would rewrite it to the conjunction
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq("between") && f.arguments.size == 3 =>
        for (n <- nameOf(f.arguments(0)); l <- num(f.arguments(1));
             h <- num(f.arguments(2))) add(n, l, h)
      case In(c, vs) if vs.nonEmpty =>
        nameOf(c).foreach { n =>
          val ds = vs.flatMap(num)
          if (ds.size == vs.size) add(n, ds.min, ds.max)
        }
      case _ => ()
    }
    acc.toMap
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
