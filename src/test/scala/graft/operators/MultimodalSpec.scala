package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mediaFixture = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)),
    (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)),
    (3L, Array[Byte]('G', 'I', 'F', '8', '9', 'a')),
    (4L, Array[Byte]('R', 'I', 'F', 'F', 0, 0)),
    (5L, "plain text".getBytes("UTF-8"))
  ).toDF("media_id", "payload")

  test("sniffFormat recognizes magic bytes") {
    val mimes = mediaFixture
      .select(col("media_id"), Multimodal.sniffFormat(col("payload")))
      .as[(Long, String)].collect().toMap
    assert(mimes(1L) == "image/jpeg")
    assert(mimes(2L) == "image/png")
    assert(mimes(3L) == "image/gif")
    assert(mimes(4L) == "audio/wav")
    assert(mimes(5L) == "application/octet-stream")
  }

  test("attachMeta adds byte length, mime, and payload hash") {
    val meta = Multimodal.attachMeta(mediaFixture, "payload")
    assert(meta.columns.toSet.contains("n_bytes"))
    val n = meta.filter($"media_id" === 5L).select("n_bytes")
      .as[Int].head()
    assert(n == "plain text".getBytes("UTF-8").length)
  }

  test("decodeBatched: mapPartitions plumbing with fixed-width features") {
    val out = Multimodal.decodeBatched(mediaFixture, "payload", dim = 8)
    assert(out.schema.fieldNames.last == "features")
    val feats = out.select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(feats.size == 5)
    feats.values.foreach { f =>
      assert(f.length == 8)
      f.foreach(v => assert(v >= -1.0f && v <= 1.0f))
    }
    // deterministic: second run yields identical vectors
    val again = Multimodal.decodeBatched(mediaFixture, "payload", dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(again == feats)
  }

  test("sampleFrames emits nFrames indexed rows per media row") {
    val frames = Multimodal.sampleFrames(mediaFixture, "payload", nFrames = 4)
    assert(frames.count() == 5 * 4)
    val idxs = frames.filter($"media_id" === 1L).select("frame_idx")
      .as[Int].collect().sorted.toSeq
    assert(idxs == Seq(0, 1, 2, 3))
  }
}
