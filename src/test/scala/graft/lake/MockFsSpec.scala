package graft.lake

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A non-`file://` Hadoop scheme backed by the local filesystem. S3 is not
  * reachable in this sandbox, so this locks the `Path.getFileSystem`
  * discipline instead: every lake path must resolve its FileSystem from
  * the path's own scheme (as the reference's fs layer does via fsspec,
  * `filesystem/fs.py:7-139`) — hardcoding `FileSystem.getLocal` or
  * `java.io.File` anywhere in the read/write path breaks this suite. */
class MockFs extends RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  import org.apache.hadoop.fs.permission.FsPermission

  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")

  /** RawLocalFileSystem's lazy permission load does `new java.io.File(
    * status.getPath.toUri)`, which rejects any non-`file` scheme — so
    * materialize statuses with a fixed permission up front. */
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getAccessTime,
      FsPermission.getDefault, null, null, s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

class MockFsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withMockFs[T](body: => T): T = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    body
  }

  test("writer + reader + schema tools all work through a foreign scheme") {
    withMockFs {
      val local = TestSpark.tempDir("mockfs")
      val path = s"mockfs://$local/ds"
      val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")

      // write path: targetHasData / raise-mode checks go through the FS
      LakeWriter(spark, path, WriteMode.Raise).write(df)
      assertThrows[IllegalStateException] {
        LakeWriter(spark, path, WriteMode.Raise).write(df)
      }

      // delta write: existing-side read + anti-join through the scheme
      LakeWriter(spark, path, WriteMode.Delta(subset = Seq("id")))
        .write(Seq((3, "dup"), (4, "d")).toDF("id", "v"))

      // read path
      val back = LakeReader(spark, path).load()
      assert(back.count() == 4)

      // driver-side file enumeration + inference through the scheme
      val files = SchemaTools.listDataFiles(spark, path)
      assert(files.nonEmpty && files.forall(_.startsWith("mockfs:")))
      assert(SchemaTools.inferFormat(spark, path) == "parquet")
      assert(SchemaTools.inferCompression(spark, path) == "zstd")
    }
  }
}
