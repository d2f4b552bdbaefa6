package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Retrieval

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) = spark.range(n)
    .select(col("id").as("doc_id"),
      concat_ws(" ",
        lit("alpha"),
        when(col("id") % 2 === 0, "beta").otherwise("gamma"),
        when(col("id") % 3 === 0, "beta delta").otherwise("epsilon"),
        concat(lit("tok"), col("id") % 7)).as("text"))

  private def served(root: String, docs: org.apache.spark.sql.DataFrame)
      : Seq[Seq[Any]] = {
    val q = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext"))
    TextIndex.serveBm25(spark, root, q, k = 3).get
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
  }

  test("index-served BM25 and phrase equal the direct operators; " +
      "appendOnce folds only unseen docs and a replay folds zero") {
    val root = TestSpark.tempDir("txti") + "/idx"
    val docs = corpus(60)
    TextIndex.build(spark, root, docs.filter(col("doc_id") < 40),
      nBuckets = 8)
    assert(TextIndex.appendOnce(spark, root,
      docs.filter(col("doc_id") >= 30)) == 20,
      "only the 20 unseen docs fold (10 overlap with the build)")
    assert(TextIndex.appendOnce(spark, root, docs) == 0,
      "a full replay folds nothing")
    // served == direct, bit for bit
    val q = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext"))
    val direct = Retrieval.bm25TopK(docs, q, k = 3)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(served(root, docs) == direct,
      "index-served BM25 must equal the direct operator exactly")
    val dPhrase = Retrieval.phraseSearch(docs, Seq("beta", "delta"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val iPhrase = TextIndex
      .servePhrase(spark, root, Seq("beta", "delta")).get
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(iPhrase == dPhrase && dPhrase.nonEmpty,
      "index-served phrase search must equal the direct operator")
  }

  test("trust discipline: a crashed append leaves the index " +
      "UNTRUSTED (serve returns None — callers fall back to the " +
      "direct operator); rebuild reseals") {
    val root = TestSpark.tempDir("txtj") + "/idx"
    val docs = corpus(30)
    TextIndex.build(spark, root, docs)
    assert(TextIndex.trusted(spark, root))
    assert(TextIndex.serveBm25(spark, root,
      docs.limit(1).select(col("doc_id").as("qid"),
        col("text").as("qtext")), 3).isDefined)
    // simulate the crash window: marker dropped, reseal never ran
    TextIndex.distrust(spark, root)
    assert(TextIndex.serveBm25(spark, root,
      docs.limit(1).select(col("doc_id").as("qid"),
        col("text").as("qtext")), 3).isEmpty,
      "an untrusted index must never serve")
    assert(TextIndex.servePhrase(spark, root, Seq("alpha")).isEmpty)
    intercept[IllegalStateException] {
      TextIndex.appendOnce(spark, root, docs)
    }
    TextIndex.build(spark, root, docs) // rebuild reseals
    assert(TextIndex.trusted(spark, root))
  }
}
