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
    * Returns the row count. */
  def writeIpc(
      df: DataFrame,
      out: java.nio.channels.WritableByteChannel,
      batchSize: Int = 4096
  ): Long = {
    val spark = df.sparkSession
    val schema = df.schema
    val arrowSchema =
      ArrowUtils.toArrowSchema(schema, timeZone(spark),
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-ipc-write", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val fileWriter = new ArrowFileWriter(root, null, out)
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
}
