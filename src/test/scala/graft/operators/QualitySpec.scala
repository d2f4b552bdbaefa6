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

  test("fineLog2 is exact fixed-point log2: monotone, within 0.09 bit, " +
    "and equal to the whole-bit floor at powers of two") {
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 8L, 100L, 1023L, 1024L, 1025L,
      (1L << 40) - 1, 1L << 40)
    val out = xs.toDF("x")
      .select(Quality.fineLog2(col("x")).as("q")).as[Long].collect()
    xs.zip(out).foreach { case (x, q) =>
      val exact = math.log(x.toDouble) / math.log(2.0)
      assert(math.abs(q / 256.0 - exact) < 0.09,
        s"fineLog2($x)=$q (${q / 256.0} bits) vs exact $exact")
      if ((x & (x - 1)) == 0) // power of two: no mantissa, exact
        assert(q == 256L * (63 - java.lang.Long.numberOfLeadingZeros(x)))
    }
    assert(out.sorted.toSeq == out.toSeq, "fineLog2 must be monotone")
  }

  test("importanceWeights favors docs made of target-heavy tokens") {
    // target rows use tokens {aa bb cc}; off-target rows use {xx yy zz};
    // a probe doc of pure target tokens must outscore a pure off-target
    // probe under the target=first-half predicate
    val rows = (1L to 20L).map { i =>
      if (i <= 10) (i, "aa bb cc aa bb cc")
      else (i, "xx yy zz xx yy zz")
    }
    val df = rows.toDF("doc_id", "text")
    val w = Quality
      .importanceWeights(df, col("doc_id") <= 10, "doc_id", "text")
      .select("doc_id", "weight_q8").as[(Long, Long)].collect().toMap
    assert(w(1L) > w(11L),
      s"target-token doc must outscore off-target: ${w(1L)} vs ${w(11L)}")
    // weights are identical within each group (same token multiset)
    assert((2L to 10L).forall(i => w(i) == w(1L)))
    assert((12L to 20L).forall(i => w(i) == w(11L)))
  }

  test("gopherRules: each rule fires on the doc built to violate it") {
    def mk(id: Long, text: String) =
      (id, text, text.length.toLong)
    val good = "the quick brown fox and a dog runs over it to win the " +
      "prize that they all want now here is more text padding words " +
      "going on a while longer still" // ~30 tokens, stopwords, varied
    val rows = Seq(
      mk(1L, good),
      mk(2L, "too short text"), // tokens_ok fails
      mk(3L, ("spam " * 40).trim), // rep_ok fails (one token dominates)
      mk(4L, Seq.fill(30)("12345").mkString(" ")) // alpha_ok fails
    )
    val out = Quality
      .gopherRules(rows.toDF("doc_id", "text", "n_chars"),
        "doc_id", "text", "n_chars")
      .select("doc_id", "tokens_ok", "rep_ok", "alpha_ok", "stop_ok",
        "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._6, "the good doc must pass all rules")
    assert(!out(2L)._2 && !out(2L)._6)
    assert(!out(3L)._3 && !out(3L)._6)
    assert(!out(4L)._4 && !out(4L)._6)
  }

  test("bestPerCluster keeps the highest-scoring member, min id on ties") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster_id")
    val scored = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (7L, 0.5),
      (8L, 0.5)).toDF("doc_id", "quality")
    val out = graft.operators.Dedup
      .bestPerCluster(clusters, scored, "doc_id", "quality")
      .select("cluster_id", "kept_doc", "kept_score", "n_members")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 0.9, 3L), (7L, 7L, 0.5, 2L)))
  }

  test("bpeTrain: chain merges are greedy-exact and boundary-aligned") {
    // "aaaa" dominates round 1, so the merge is (a, a): greedy BPE
    // re-segments it as [aa, aa] — a single-separator encoding would
    // eat the shared boundary and produce [aa, a, a]
    val df1 = Seq.fill(5)("aaaa b").toDF("text")
    val (m1, v1) = Quality.bpeTrain(df1, rounds = 1)
    assert(m1.map(m => (m.s1, m.s2)) == Seq(("a", "a")))
    val segs1 = v1.select("word", "seg").as[(String, String)]
      .collect().toMap
    assert(segs1("aaaa") == "|aa||aa|")

    // round 2 must then treat "aa" as ONE symbol: the next pair is
    // (aa, aa), and a parser that matched raw substrings instead of
    // whole symbols would have found phantom (a, a) pairs inside it
    val (m2, v2) = Quality.bpeTrain(df1, rounds = 2)
    assert(m2.map(m => (m.s1, m.s2)) == Seq(("a", "a"), ("aa", "aa")))
    assert(v2.filter(col("word") === "aaaa")
      .select("seg").as[String].head() == "|aaaa|")

    // boundary alignment: after (x, y) merges into "xy", the pair
    // (y, z) must NOT fire inside "xyz"'s tail — "xy" is one symbol
    // and only (xy, z) may combine them
    val df3 = Seq.fill(11)("xy") ++ Seq.fill(6)("xyz") ++
      Seq.fill(5)("ayz") ++ Seq.fill(5)("byz")
    val (m3, v3) = Quality.bpeTrain(df3.toDF("text"), rounds = 2)
    // round 1: (x,y) = 17 beats (y,z) = 16; round 2: the surviving
    // free-standing (y,z) = 10 beats (xy,z) = 6 — so round 2 CHOOSES
    // (y,z) while "xyz" holds an xy|z boundary it must not cross
    assert(m3.map(m => (m.s1, m.s2)) == Seq(("x", "y"), ("y", "z")))
    val segs3 = v3.select("word", "seg").as[(String, String)]
      .collect().toMap
    // (y,z) merged in "ayz" (free-standing y) but not inside "xyz",
    // where y was already consumed by the round-1 (x,y) merge
    assert(segs3("xyz") == "|xy||z|")
    assert(segs3("ayz") == "|a||yz|")

    // exhausted vocabulary stops early instead of looping
    val (m4, _) = Quality.bpeTrain(Seq("q w e").toDF("text"), rounds = 5)
    assert(m4.isEmpty)
  }

  test("heavyHitters equals the exact > total/k set on every " +
      "partitioning, with MG evictions actually firing") {
    // 60 distinct fillers force evictions through a k=4 summary; the
    // planted hot keys are the only ones above total/4
    val rows = Seq.fill(500)("hot1") ++ Seq.fill(240)("hot2") ++
      (0 until 60).flatMap(i => Seq.fill(4)(s"f$i"))
    val total = rows.size.toLong // 980
    val exact = rows.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .filter { case (_, n) => n * 4 > total }
    assert(exact.keySet == Set("hot1")) // 2000 > 980; 960 is not
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("token").repartition(parts)
      val got = Quality.heavyHitters(df, k = 4)
        .as[(String, Long)].collect().toMap
      assert(got == exact, s"parts=$parts: $got != $exact")
    }
  }
}
