package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    // 1 and 2 normalize to the same text (exact-dup group, keep 1)
    (1L, "The cat sat on the mat today and then it slept all day long"),
    (2L, "the cat sat on the mat today and then it slept all day long!"),
    // 3 is a near-dup of 1 (one token changed)
    (3L, "the cat sat on the mat today and then it slept all night long"),
    // 4 is unrelated
    (4L, "completely different words about spark shuffles and parquet io"),
    // 5 fails the token gate
    (5L, "too short")
  ).toDF("doc_id", "text")

  test("stage frames are consistent and the last one IS run()") {
    val frames = CorpusPipeline.stageFrames(corpus,
      minTokens = 5, jaccardThreshold = 0.5)
    assert(frames.map(_._1) == Seq("normalize_gate", "survivors",
      "jaccard_pairs", "cc_clusters", "anti_join_split"))
    val byName = frames.toMap
    // gate drops doc 5; exact dedup collapses 1/2; near-dup CC drops 3
    assert(byName("normalize_gate")().select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    assert(byName("survivors")().select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 4L))
    assert(byName("jaccard_pairs")().select("id1", "id2")
      .as[(Long, Long)].collect().toSet == Set((1L, 3L)))
    val fin = byName("anti_join_split")()
    assert(fin.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    val run = CorpusPipeline.run(corpus,
      minTokens = 5, jaccardThreshold = 0.5)
    assert(run.collect().toSet == fin.collect().toSet)
  }

  test("armed decontamination stage drops leaking survivors before " +
      "near-dup; unarmed pipeline is byte-identical to before") {
    // doc 4 leaks a 5-gram of the benchmark (after normalization —
    // note the punctuation the normalizer strips)
    val heldOut = Seq(
      (100L, "Benchmark prompt: different words about spark shuffles, ok?")
    ).toDF("doc_id", "text")
    val armed = CorpusPipeline.stageFrames(corpus,
      minTokens = 5, jaccardThreshold = 0.5, heldOut = Some(heldOut))
    assert(armed.map(_._1) == Seq("normalize_gate", "survivors",
      "decontaminate", "jaccard_pairs", "cc_clusters", "anti_join_split"))
    val out = CorpusPipeline.run(corpus, minTokens = 5,
      jaccardThreshold = 0.5, heldOut = Some(heldOut))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L), s"doc 4 must be decontaminated away: $out")
    // unarmed: same frames, same output as always
    val plain = CorpusPipeline.run(corpus, minTokens = 5,
      jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L, 4L))
  }

  test("stageFrames is lazy: construction runs nothing (the survivors " +
      "checkpoint is eager once forced)") {
    // a corpus that THROWS on any evaluation: if stageFrames eagerly
    // materialized the survivors checkpoint at construction time, this
    // call itself would fail
    val poisoned = spark.range(3).select(
      col("id").as("doc_id"),
      expr("CASE WHEN id >= 0 THEN raise_error('boom') " +
        "ELSE 'x' END").as("text"))
    val frames = CorpusPipeline.stageFrames(poisoned, minTokens = 1)
    // ...and forcing a frame does evaluate (and therefore throws)
    val e = intercept[Exception] { frames.head._2().count() }
    assert(e.getMessage != null)
  }
}
