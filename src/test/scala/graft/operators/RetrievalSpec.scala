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

  test("RRF fusion: a doc ranked by both arms beats single-arm docs, " +
      "a missing arm contributes exactly zero, the integer fixed " +
      "point matches 2^40 div (60 + rank), and k cuts") {
    // corpus of 4 docs; query 1 holds 'rare' (BM25 ranks docs 1, 2)
    // and its vector points at docs 2, 3 (cosine ranks 2 then 3):
    // doc 2 is the only both-arms doc and must fuse first
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.8f, 0.3f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, "rare")).toDF("qid", "qtext")
    val qv = vecs.filter($"vec_id" === 1L)
    val got = Retrieval.hybridRrfTopK(docs, vecs, q, qv,
      k = 3, poolK = 3).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 1L, 3L),
      s"both-arms doc 2 must fuse first: ${got.mkString(",")}")
    val c = 1L << 40
    val byDoc = got.map(r => r.getLong(1) ->
      (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4))).toMap
    // doc 2: bm25 rank 2 (tf 1, longer doc), dense rank 1
    assert(byDoc(2L) == ((Some(2L), Some(1L),
      c / 62 + c / 61)))
    // doc 1: bm25 rank 1 only (it IS the query vector — excluded
    // from the dense arm); dense contributes zero
    assert(byDoc(1L) == ((Some(1L), None, c / 61)))
    // doc 3: dense rank 2 only (no 'rare' term)
    assert(byDoc(3L) == ((None, Some(2L), c / 62)))
    // k cut: doc 4 (dense rank 3) exists but k=3 keeps higher rrf
    val all = Retrieval.hybridRrfTopK(docs, vecs, q, qv,
      k = 4, poolK = 4).collect()
    assert(all.length == 4 && all.map(_.getLong(1)).contains(4L))
  }

  test("phraseSearch matches CONSECUTIVE positions only, counts " +
      "every start, and generalizes past bigrams") {
    val pd = Seq(
      (1L, "a b c a b c"),   // 'b c' twice, 'a b c' twice
      (2L, "a c b"),         // terms present, order wrong
      (3L, "b c b c b"),     // 'b c' twice, overlapping b's
      (4L, "x y z")
    ).toDF("doc_id", "text")
    def run(p: String*): Map[Long, Long] =
      Retrieval.phraseSearch(pd, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("b", "c") == Map(1L -> 2L, 3L -> 2L),
      "adjacent-only: doc 2 holds both terms but never consecutively")
    assert(run("a", "b", "c") == Map(1L -> 2L),
      "trigram folds one more positional join")
    assert(run("b") == Map(1L -> 2L, 2L -> 1L, 3L -> 3L),
      "single term degenerates to term frequency")
    assert(run("q", "z").isEmpty, "absent head term matches nothing")
  }
}
