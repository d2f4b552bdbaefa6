package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct}

import com.fasterxml.jackson.databind.node.ObjectNode

/** Standing FEATURE index for [[WriteMode.DeltaNearDup]]: a
  * `_shingles/` parquet sidecar holding the per-row distinct shingle
  * hashes — `(__sid, sh)`, where `__sid` is the mode's scoring identity
  * (the raw key column, or a struct of the key columns) — of every row
  * in the dataset. The near-dup scorer's existing side reads it instead
  * of the data files, so a continuous ingest loop never re-reads the
  * corpus TEXT and never re-computes its shingles: together with the
  * `_keys/` sidecar the whole gate runs off standing indexes, and the
  * per-batch cost is O(batch) + O(index rows touched), independent of
  * the lake's text bytes.
  *
  * Same crash-safe trust protocol as [[KeySidecar]] (dirty-before-data,
  * trusted-after-update; untrusted = from-text fallback, never wrong).
  * The stored multiset must equal `shingleHashRows(dataset)` exactly —
  * that is the maintenance invariant that makes sidecar-served scoring
  * bit-identical — so unlike `_keys`, part files are NEVER distinct'd
  * across writes: each append is the shingle rows of exactly the files
  * the write produced, and compaction repartitions without dedup.
  * `_meta.json` records the config (key cols, text col, shingle n) plus
  * the dataset's cumulative ROW count, which feeds the scorer's auto
  * DF cap without a corpus job.
  *
  * Scope: serves only configs without an `onColumn` window bound (the
  * continuous-ingest shape) — bounded configs already prune the corpus
  * scan by partition, and serving them would require storing the bound
  * column per shingle row. An out-of-scope config simply falls back.
  */
final case class ShingleSidecar(spark: SparkSession, datasetPath: String) {

  private[lake] val dir = new Path(datasetPath, "_shingles")
  private val manifestPath = new Path(dir, "_manifest.json")
  private val metaPath = new Path(dir, "_meta.json")

  private def fs =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private case class Meta(subset: Seq[String], textCol: String, n: Int,
      rows: Long)

  private def readMeta(): Option[Meta] =
    if (!fs.exists(metaPath)) None
    else {
      val in = fs.open(metaPath)
      try {
        val node = TimeFly.mapper.readTree(in)
        val cols = node.get("subset")
        if (cols == null || !cols.isArray) None
        else Some(Meta(
          (0 until cols.size()).map(cols.get(_).asText()),
          node.get("textCol").asText(),
          node.get("n").asInt(),
          node.get("rows").asLong()))
      } catch { case _: Exception => None }
      finally in.close()
    }

  private def writeMeta(p: Path, m: Meta): Unit = {
    val node: ObjectNode = TimeFly.mapper.createObjectNode()
    val arr = node.putArray("subset")
    m.subset.foreach(arr.add)
    node.put("textCol", m.textCol)
    node.put("n", m.n)
    node.put("rows", m.rows)
    val out = fs.create(p, true)
    try out.write(TimeFly.mapper.writeValueAsBytes(node))
    finally out.close()
  }

  private def matches(m: Meta, d: WriteMode.DeltaNearDup): Boolean =
    m.subset == d.subset && m.textCol == d.textCol && m.n == d.shingleN

  /** The scoring identity column: raw key for a single-column subset,
    * struct of the keys otherwise — must mirror the keyed() shape of
    * LakeWriter's scored gates exactly. */
  private def sid(subset: Seq[String]) =
    if (subset.size == 1) col(subset.head) else struct(subset.map(col): _*)

  /** The trusted existing-side shingle frame (columns `doc`, `sh`) plus
    * the dataset's row count, or None when the sidecar is missing,
    * dirty, config-mismatched, or the mode carries a window bound. */
  def readFor(d: WriteMode.DeltaNearDup): Option[(DataFrame, Long)] = {
    if (d.onColumn.isDefined) return None
    if (!fs.exists(manifestPath) || !hasParquet) return None
    readMeta().filter(matches(_, d)).flatMap { m =>
      scala.util.Try(
        spark.read.parquet(dir.toString)
          .select(col("__sid").as("doc"), col("sh"))
      ).toOption.map(_ -> m.rows)
    }
  }

  /** Trusted and non-empty (spec hook). */
  def trusted: Boolean = fs.exists(manifestPath) && hasParquet

  /** Drop trust before a write touches data. */
  def markDirty(): Unit =
    if (fs.exists(manifestPath)) fs.delete(manifestPath, false)

  /** Remove the sidecar entirely (any non-DeltaNearDup write makes the
    * stored shingles stale). */
  def invalidate(): Unit =
    if (fs.exists(dir)) fs.delete(dir, true)

  /** Bring the sidecar up to date after a completed DeltaNearDup data
    * write, then restore trust. Appendable when the stored config
    * matches: only the new files' rows are read (their text shingled
    * once — work the NEXT write then never repeats); otherwise a
    * one-time bootstrap shingles the full dataset, no more than the
    * from-text scorer pays per batch today. */
  def update(d: WriteMode.DeltaNearDup, newFiles: Seq[String],
      wasTrusted: Boolean = true,
      compactAfter: Int = 64): Unit = {
    val stored = readMeta()
    def shingled(df: DataFrame): DataFrame =
      graft.operators.Dedup.shingleHashRows(
        df.withColumn("__sid", sid(d.subset)), "__sid", d.textCol,
        d.shingleN)
        .select(col("doc").as("__sid"), col("sh"))
    // untrusted at write start = a prior crashed write's shingles may be
    // missing — rebuild, never blind-append (see KeySidecar.update)
    if (wasTrusted && stored.exists(matches(_, d)) && hasParquet) {
      var newRows = 0L
      if (newFiles.nonEmpty) {
        val batch = spark.read.option("basePath", datasetPath)
          .parquet(newFiles: _*)
        newRows = batch.count()
        shingled(batch)
          .repartition(1)
          .write.mode("append").parquet(dir.toString)
      }
      val m = stored.get.copy(rows = stored.get.rows + newRows)
      writeMeta(metaPath, m)
      writeMeta(manifestPath, m)
    } else {
      val all = SchemaTools.safeRead(spark, datasetPath)
      val rows = all.count()
      val tmp = new Path(datasetPath, "_shingles_tmp")
      shingled(all).write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(dir)) fs.delete(dir, true)
      fs.rename(tmp, dir)
      val m = Meta(d.subset, d.textCol, d.shingleN, rows)
      writeMeta(metaPath, m)
      writeMeta(manifestPath, m)
    }
    compact(compactAfter)
  }

  /** Fold per-batch part files back to right-sized ones. NO distinct —
    * the stored multiset is the invariant. */
  private def compact(compactAfter: Int): Unit = {
    if (partCount <= compactAfter) return
    readMeta().foreach { m =>
      val tmp = new Path(datasetPath, "_shingles_tmp")
      val bytes = fs.listStatus(dir).filter(_.isFile).map(_.getLen).sum
      val nOut = math.max(1L, bytes / (64L << 20)).toInt
      markDirty()
      spark.read.parquet(dir.toString)
        .repartition(nOut)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(dir, true)
      fs.rename(tmp, dir)
      writeMeta(metaPath, m)
      writeMeta(manifestPath, m)
    }
  }

  private def partCount: Int =
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))

  private def hasParquet: Boolean = partCount > 0
}
