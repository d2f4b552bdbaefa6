package org.apache.spark.sql

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

/** Package-placed bridge for Arrow IPC: Spark's Arrow interop helpers
  * (`ArrowUtils`, `ArrowWriter`, `internalCreateDataFrame`) are all
  * `private[sql]`, so the IPC file codec lives here and
  * `graft.lake.ArrowIpc` adds the Hadoop-FS plumbing on top.
  *
  * Driver-side by design: the reference's feather read/write
  * (`dataset/reader.py:118-138`, `writer.py:399-409`) is a single-file
  * dataset-tool path, not a distributed scan — see ArrowIpc's scaladoc
  * for the scale contract.
  */
object GraftArrowBridge {

  private def timeZone(spark: SparkSession): String =
    spark.conf.get("spark.sql.session.timeZone")

  /** Serialize a DataFrame to Arrow IPC *file* format (= Feather v2) on
    * the given channel. Collects via `executeCollect` — bounded,
    * driver-side, same contract as the reference's pyarrow table write.
    * `compression` ∈ {zstd, lz4} compresses record batches (zstd is the
    * reference writer's feather default, writer.py:399-409). Returns the
    * row count. */
  def writeIpc(
      df: DataFrame,
      out: java.nio.channels.WritableByteChannel,
      batchSize: Int = 4096,
      compression: Option[String] = None
  ): Long = {
    val spark = df.sparkSession
    val schema = df.schema
    val arrowSchema =
      ArrowUtils.toArrowSchema(schema, timeZone(spark),
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-ipc-write", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val fileWriter = compression match {
      case None => new ArrowFileWriter(root, null, out)
      case Some(name) =>
        val codec = name.toLowerCase match {
          case "zstd" =>
            org.apache.arrow.vector.compression.CompressionUtil.CodecType.ZSTD
          case "lz4" =>
            org.apache.arrow.vector.compression.CompressionUtil.CodecType
              .LZ4_FRAME
          case other => throw new IllegalArgumentException(
            s"unsupported IPC compression: $other (zstd|lz4)")
        }
        new ArrowFileWriter(root, null, out, null,
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE,
          codec)
    }
    try {
      val rows = df.queryExecution.executedPlan.executeCollect()
      val writer = ArrowWriter.create(root)
      fileWriter.start()
      var i = 0
      while (i < rows.length) {
        val end = math.min(i + batchSize, rows.length)
        writer.reset()
        var j = i
        while (j < end) { writer.write(rows(j)); j += 1 }
        writer.finish()
        fileWriter.writeBatch()
        i = end
      }
      fileWriter.end()
      rows.length.toLong
    } finally {
      fileWriter.close()
      root.close()
      allocator.close()
    }
  }

  /** Deserialize Arrow IPC file bytes into a DataFrame (single driver
    * partition — the caller bounds the size). Schema comes from the IPC
    * footer via Spark's own Arrow type mapping. */
  def readIpc(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-ipc-read", 0, Long.MaxValue)
    // CommonsCompressionFactory decompresses lz4/zstd record batches —
    // the reference's feather writer defaults to zstd compression
    // (writer.py:399-409 via polars write_ipc), so a plain reader would
    // throw NoCompressionCodec on any real reference-produced file.
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(bytes), allocator,
      org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    try {
      val root = reader.getVectorSchemaRoot
      val schema: StructType =
        ArrowUtils.fromArrowSchema(root.getSchema)
      val rows = ArrayBuffer[InternalRow]()
      while (reader.loadNextBatch()) {
        val cols = root.getFieldVectors.asScala
          .map(v => new ArrowColumnVector(v): ColumnVector).toArray
        val batch = new ColumnarBatch(cols, root.getRowCount)
        val it = batch.rowIterator()
        while (it.hasNext) rows += it.next().copy()
      }
      val classic =
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.internalCreateDataFrame(
        classic.sparkContext.parallelize(rows.toSeq, 1), schema)
    } finally {
      reader.close()
      allocator.close()
    }
  }

  private def readAllBytes(
      pathStr: String,
      conf: org.apache.hadoop.conf.Configuration
  ): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len < Int.MaxValue.toLong,
      s"IPC file too large for a single task: $len bytes ($pathStr)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    bytes
  }

  /** Decode one IPC file's batches. With `expected` set, each file's
    * columns are ALIGNED BY NAME to the expected schema (the eager
    * path's unionByName semantics — feather files from different writer
    * versions may order fields differently), and a genuine name/type
    * mismatch fails loudly instead of silently mislabeling bytes. */
  private def decodeBatches(
      bytes: Array[Byte],
      expected: StructType = null
  ): ArrayBuffer[InternalRow] = {
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-ipc-task-read", 0, Long.MaxValue)
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(bytes), allocator,
      org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    val rows = ArrayBuffer[InternalRow]()
    try {
      val root = reader.getVectorSchemaRoot
      val fileSchema = ArrowUtils.fromArrowSchema(root.getSchema)
      val order: Array[Int] =
        if (expected == null) fileSchema.fields.indices.toArray
        else {
          def sig(s: StructType) =
            s.fields.map(f => (f.name, f.dataType)).toSet
          require(sig(fileSchema) == sig(expected),
            s"IPC file schema ${fileSchema.simpleString} does not match " +
              s"the directory's first file ${expected.simpleString}")
          expected.fieldNames.map(fileSchema.fieldIndex)
        }
      while (reader.loadNextBatch()) {
        val vectors = root.getFieldVectors
        val cols = order
          .map(i => new ArrowColumnVector(vectors.get(i)): ColumnVector)
        val batch = new ColumnarBatch(cols, root.getRowCount)
        val it = batch.rowIterator()
        while (it.hasNext) rows += it.next().copy()
      }
      rows
    } finally {
      reader.close()
      allocator.close()
    }
  }

  /** Distributed read of many Arrow IPC files: one task per file, each
    * decoding its own batches EXECUTOR-side (per-task ArrowFileReader
    * over the file's bytes) — no driver bottleneck, unlike the eager
    * single-file path above. Files must carry the first file's fields
    * (names and types; ORDER may differ — columns are aligned by name
    * per file, the eager path's unionByName semantics); a real mismatch
    * fails the task loudly. The schema is resolved from one footer on
    * the driver. Scale shape: parallelism = file count, per-task memory
    * bounded by the largest file. */
  def readIpcDistributed(
      spark: SparkSession,
      files: Seq[String]
  ): DataFrame = {
    require(files.nonEmpty, "readIpcDistributed needs at least one file")
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // schema from the first file's footer (cheap driver-side read)
    val schema: StructType = {
      val allocator = ArrowUtils.rootAllocator
        .newChildAllocator("graft-ipc-schema", 0, Long.MaxValue)
      val reader = new ArrowFileReader(
        new ByteArrayReadableSeekableByteChannel(
          readAllBytes(files.head, hadoopConf.value)), allocator,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
      try ArrowUtils.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); allocator.close() }
    }
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = classic.sparkContext
      .parallelize(files, files.size)
      .mapPartitions { it =>
        it.flatMap(f =>
          decodeBatches(readAllBytes(f, hadoopConf.value), schema))
      }
    classic.internalCreateDataFrame(rdd, schema)
  }
}
