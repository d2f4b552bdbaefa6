package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "rare rare common common common"),
    (2L, "rare common common common common common common common"),
    (3L, "common common common common"),
    (4L, "other tokens entirely here")
  ).toDF("doc_id", "text")

  test("higher tf on a rare term outranks; non-holders don't appear") {
    val q = Seq((100L, "rare")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, q, k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L),
      "tf=2 in a shorter doc must outrank tf=1; docs without the " +
        s"term must not appear: ${got.mkString(",")}")
    assert(got(0).getLong(2) > got(1).getLong(2),
      "scores must strictly order the two holders")
  }

  test("a query of only corpus-wide terms scores idf 0 everywhere; " +
      "k caps the cut; duplicate query terms count once") {
    val q = Seq((1L, "common"), (2L, "rare rare")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, q, k = 2)
    // 'common' is in 3 of 4 docs: idf_q8 > 0, 3 candidates, k=2 cut
    assert(got.filter($"qid" === 1L).count() == 2)
    // 'rare rare' == 'rare' (dedup): same two holders as the single
    val single = Retrieval.bm25TopK(docs,
      Seq((9L, "rare")).toDF("qid", "qtext"), k = 2)
    assert(got.filter($"qid" === 2L).select("doc_id", "score_q")
        .collect().map(_.toSeq).toSet ==
      single.select("doc_id", "score_q")
        .collect().map(_.toSeq).toSet)
  }

  test("an absent term contributes nothing; all-absent query returns " +
      "no rows") {
    val q = Seq((5L, "zzz absent")).toDF("qid", "qtext")
    assert(Retrieval.bm25TopK(docs, q, k = 3).isEmpty)
  }
}
