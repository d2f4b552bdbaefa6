package graft.lake

import java.nio.channels.Channels

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftArrowBridge, SparkSession}

/** Arrow IPC file (= Feather v2) read/write — the reference's feather
  * source/sink (`/root/reference/src/pydala/dataset/reader.py:118-138`,
  * `writer.py:399-409`), zstd/lz4 record-batch compression included
  * (the reference writer's default).
  *
  * Scale contract: single-file [[read]]/[[write]] are DRIVER-SIDE,
  * matching the reference exactly — pydala reads feather with
  * `pyarrow.feather.read_table` into one in-memory table. A DIRECTORY
  * of IPC files goes through [[readDistributed]] instead: one task per
  * file, record batches decoded executor-side (no driver bottleneck).
  * Datasets at scale still belong in parquet (`LakeWriter`);
  * `rewriteToParquet` is the one-call migration. Reads/writes go
  * through the path's own Hadoop FileSystem (`Path.getFileSystem`), so
  * any registered scheme works.
  */
object ArrowIpc {

  /** Read one Arrow IPC file into a DataFrame (single partition; caller
    * bounds the file size, as with the reference's eager feather read). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < Int.MaxValue.toLong, s"IPC file too large for eager read: $len bytes")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    GraftArrowBridge.readIpc(spark, bytes)
  }

  /** Write a DataFrame as one Arrow IPC file. Collects to the driver —
    * bounded by contract (the reference's feather write materializes a
    * pyarrow table the same way). `compression = Some("zstd")` matches
    * the reference's feather default (`writer.py:399-409`); the reader
    * side decompresses transparently. Returns the row count. */
  def write(
      df: DataFrame,
      path: String,
      batchSize: Int = 4096,
      compression: Option[String] = None
  ): Long = {
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try GraftArrowBridge.writeIpc(df, Channels.newChannel(out), batchSize,
      compression)
    finally out.close()
  }

  /** Distributed read of an IPC directory (or explicit file list): one
    * task per file, batches decoded executor-side — removes the driver
    * bottleneck of the eager per-file [[read]] when a directory holds
    * many IPC files. Files must share the first file's schema. */
  def readDistributed(spark: SparkSession, files: Seq[String]): DataFrame =
    GraftArrowBridge.readIpcDistributed(spark, files)

  /** Migrate IPC files to parquet — the scale path: feather is the
    * reference's exchange format, parquet its dataset format
    * (`writer.py:399-409` converts the same way). */
  def rewriteToParquet(spark: SparkSession, ipcPath: String, parquetPath: String): Unit =
    read(spark, ipcPath).write.mode("overwrite").parquet(parquetPath)
}
