package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Rewrite a dataset with new partitioning / sort / distinct / drop /
  * compression (`/root/reference/src/pydala/dataset/repartition.py:7-195`).
  *
  * The reference rewrites in place via cache-then-delete
  * (`repartition.py:72-84`) — racy if the job dies mid-way. We write to a
  * temp sibling directory and atomically swap, so the dataset is never in a
  * half-rewritten state.
  */
object Repartition {

  def run(
      spark: SparkSession,
      src: String,
      dest: Option[String] = None,
      pipeline: Pipeline = Pipeline(),
      partitionBy: Seq[String] = Nil,
      compression: String = "zstd",
      maxRecordsPerFile: Long = 0L,
      numFiles: Int = 0
  ): Unit = {
    val inPlace = dest.isEmpty || dest.contains(src)
    val target = if (inPlace) s"$src.__repart_tmp" else dest.get

    var df = LakeReader(spark, src).load()
    df = pipeline(df)
    if (numFiles > 0)
      df =
        if (partitionBy.nonEmpty)
          df.repartition(numFiles,
            partitionBy.map(org.apache.spark.sql.functions.col): _*)
        else df.repartition(numFiles)

    LakeWriter(
      spark,
      target,
      WriteMode.Overwrite,
      partitionBy,
      compression,
      maxRecordsPerFile
    ).write(df)

    if (inPlace) {
      val fs = new Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bak = new Path(s"$src.__repart_old")
      fs.rename(new Path(src), bak)
      fs.rename(new Path(target), new Path(src))
      fs.delete(bak, true)
    }
  }
}
