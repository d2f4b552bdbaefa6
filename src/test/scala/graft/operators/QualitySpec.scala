package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flog2 is exact floor-log2 at and around every power boundary") {
    val xs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L, 1023L, 1024L, 1025L,
      (1L << 40) - 1, 1L << 40)
    val got = xs.toDF("x")
      .select(col("x"), Quality.flog2(col("x")).as("f"))
      .as[(Long, Long)].collect().toMap
    xs.foreach { x =>
      val expect = 63 - java.lang.Long.numberOfLeadingZeros(x)
      assert(got(x) == expect, s"flog2($x)")
    }
  }

  test("ngramsFromTokens keeps multiplicity (the LM needs counts, " +
    "not the distinct set)") {
    val out = Seq("a b a b a").toDF("text")
      .select(Quality.ngramsFromTokens(split(col("text"), " "), 2).as("g"))
      .as[Seq[String]].head()
    assert(out == Seq("a b", "b a", "a b", "b a"))
  }

  test("ngramLmScore separates in-domain from out-of-domain text, and " +
    "the bit-quantized score stays within 1 bit of exact cross-entropy") {
    // reference: a tiny repetitive "language"; doc 10 speaks it,
    // doc 11 does not
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat lay on the rug")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the cat sat on the rug"),
      (11L, "zq xw vv uu tt ss")
    ).toDF("doc_id", "text")
    val out = Quality.ngramLmScore(corpus, ref, "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"), col("bits_per_token"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L)._1 == 5L)
    assert(out(11L)._1 == 5L)
    assert(out(10L)._2 < out(11L)._2,
      "in-domain text must score fewer bits/token than out-of-domain")
    // quantization bound: each term's floor error is in (-1, 0], so the
    // per-doc mean must sit within 1 bit of the exact libm value
    val refBg = Seq("the cat", "cat sat", "sat on", "on the", "the mat",
      "the dog", "dog sat", "on the", "the rug",
      "the cat", "cat lay", "lay on", "on the", "the rug")
    val c2 = refBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1.split(" ")(0))
      .map { case (k, v) => k -> v.values.sum }
    // every ref token appears in some bigram (all docs >= 2 tokens), so
    // the bigram word set IS the vocabulary the operator counts
    val vActual = refBg.flatMap(_.split(" ")).distinct.size.toLong
    def exactBits(bgs: Seq[String]): Double = bgs.map { bg =>
      val w1 = bg.split(" ")(0)
      val num = c1.getOrElse(w1, 0L) + vActual
      val den = c2.getOrElse(bg, 0L) + 1L
      (math.log(num.toDouble) - math.log(den.toDouble)) / math.log(2.0)
    }.sum / bgs.size
    val doc10 = Seq("the cat", "cat sat", "sat on", "on the", "the rug")
    val doc11 = Seq("zq xw", "xw vv", "vv uu", "uu tt", "tt ss")
    assert(math.abs(out(10L)._2 - exactBits(doc10)) < 1.0)
    assert(math.abs(out(11L)._2 - exactBits(doc11)) < 1.0)
  }

  test("domainCap enforces the cap deterministically and plans a " +
    "WindowGroupLimit (map-side pre-prune before the exchange)") {
    val df = (1L to 60L)
      .map(i => (i, s"dom${i % 3}", s"text body number $i"))
      .toDF("doc_id", "source", "text")
    val out = Quality.domainCap(df, "doc_id", "source", "text", cap = 4)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=cap must plan as WindowGroupLimit, got:\n$p")
    val rows = out.select("source", "doc_id", "rk")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 12) // 3 domains x cap
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length == 4)
      assert(g.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    }
    // repartitioning the input must not change the selection
    val again = Quality
      .domainCap(df.repartition(7), "doc_id", "source", "text", cap = 4)
      .select("source", "doc_id", "rk")
      .as[(String, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._3)).toSeq ==
      rows.sortBy(r => (r._1, r._3)).toSeq)
  }
}
