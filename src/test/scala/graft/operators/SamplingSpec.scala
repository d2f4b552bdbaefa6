package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 strata: 100 / 25 / 4 rows
  def corpus = (0L until 129L).map { i =>
    val s = if (i < 100) "big" else if (i < 125) "mid" else "tiny"
    (i, s)
  }.toDF("doc_id", "stratum")

  test("mixtureSample: smallest stratum keeps every row at rate 1.0; " +
      "larger strata thin toward sqrt(n_min/n)") {
    val out = Sampling.mixtureSample(corpus, "doc_id", "stratum")
      .as[(Long, String, Double)].collect()
    val byStratum = out.groupBy(_._2)
    assert(byStratum("tiny").length == 4) // rate exactly 1.0
    assert(byStratum("tiny").forall(_._3 == 1.0))
    assert(math.abs(byStratum("big").head._3 - math.sqrt(4.0 / 100)) < 1e-15)
    // acceptance tracks the rate (LCG is uniform-ish, generous slack)
    val kept = byStratum("big").length
    assert(kept > 5 && kept < 40, s"big stratum kept $kept of 100")
  }

  test("mixtureSample: string ids are hashed, not null-cast to an " +
      "empty sample; result stays deterministic") {
    val strCorpus = corpus.selectExpr(
      "concat('doc-', doc_id) AS doc_id", "stratum")
    val out = Sampling.mixtureSample(strCorpus, "doc_id", "stratum")
      .as[(String, String, Double)].collect()
    val byStratum = out.groupBy(_._2)
    // rate-1.0 stratum must survive in full — the null-cast bug dropped
    // every row regardless of rate
    assert(byStratum.get("tiny").exists(_.length == 4),
      s"tiny stratum lost rows: ${byStratum.get("tiny").map(_.length)}")
    val again = Sampling.mixtureSample(strCorpus, "doc_id", "stratum")
      .as[(String, String, Double)].collect()
    assert(out.toSet == again.toSet)
  }

  test("mixtureSample: deterministic under repartitioning, and alpha=1 " +
      "keeps the natural mix") {
    val a = Sampling.mixtureSample(corpus, "doc_id", "stratum")
      .as[(Long, String, Double)].collect().toSet
    val b = Sampling.mixtureSample(corpus.repartition(7), "doc_id", "stratum")
      .as[(Long, String, Double)].collect().toSet
    assert(a == b)
    val flat = Sampling.mixtureSample(corpus, "doc_id", "stratum", alpha = 1.0)
    assert(flat.count() == 129) // every rate is (n_min/n)^0 = 1
  }
}
