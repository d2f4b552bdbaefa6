package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = TextFunctions.HashP

  /** reference implementation of the portable fold */
  private def foldRef(s: String, base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  test("charFold matches the reference fold, including edge cases") {
    val inputs = Seq("", "a", "abc", "the quick brown fox", "ü ö 語")
    val got = inputs.toDF("s")
      .select(TextFunctions.charFold(col("s"), 131).as("h"))
      .as[Long].collect().toSeq
    assert(got == inputs.map(foldRef(_, 131L)))
    // single ASCII char is its codepoint
    assert(foldRef("a", 131) == 'a'.toLong)
  }

  test("charFold null propagates") {
    val got = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(TextFunctions.charFold(col("s"), 131).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.head.isEmpty && got.last.contains(foldRef("x", 131)))
  }

  test("tokenHash62 packs two folds without overflow") {
    val h = Seq("token").toDF("s")
      .select(TextFunctions.tokenHash62(col("s")).as("h"))
      .as[Long].head()
    assert(h == foldRef("token", 131) + (foldRef("token", 137) << 31))
    assert(h >= 0L)
  }

  test("shingles: short texts yield empty, distinct preserved") {
    val rows = Seq("a b", "a b c", "a b c d", "x y x y x y x y")
      .toDF("text")
      .select(size(TextFunctions.shingles(col("text"), 3)).as("n"))
      .as[Int].collect().toSeq
    // "a b" -> 0; "a b c" -> 1; "a b c d" -> 2; repeated pattern dedups
    assert(rows == Seq(0, 1, 2, 2))
  }

  test("shingleFolds == packed charFolds of the materialized shingles") {
    // random-ish word bags incl. unicode, repeats, empties-by-collapse,
    // and docs shorter than n — the native one-pass kernel must agree
    // with the HOF string formulation hash-for-hash, order included
    val docs = Seq(
      "",
      "one two",
      "one two three",
      "a b c d e f g h",
      "dup dup dup dup dup",
      "ü ö 語 ü ö 語 ü ö",
      "the quick brown fox jumps over the lazy dog the quick brown fox"
    )
    for (n <- Seq(2, 3, 5)) {
      val viaStrings = docs.toDF("text")
        .select(TextFunctions.tokens(col("text")).as("tk"))
        .select(transform(
          TextFunctions.shinglesFromTokens(col("tk"), n),
          s => TextFunctions.charFold(s, 131) +
            shiftleft(TextFunctions.charFold(s, 137), 31)).as("hs"))
        .as[Seq[Long]].collect().toSeq
      val viaKernel = docs.toDF("text")
        .select(TextFunctions.tokens(col("text")).as("tk"))
        .select(TextFunctions.shingleFolds(col("tk"), n).as("hs"))
        .as[Seq[Long]].collect().toSeq
      assert(viaKernel == viaStrings, s"n=$n")
      assert(viaKernel.flatten.forall(_ >= 0L))
    }
  }

  test("subwordCount: words, digit runs, punctuation count separately") {
    val got = Seq("hello, world 42!", "abc", "a-b").toDF("t")
      .select(TextFunctions.subwordCount(col("t")).as("n"))
      .as[Int].collect().toSeq
    // "hello" "," "world" "42" "!" -> 5 ; "abc" -> 1 ; "a" "-" "b" -> 3
    assert(got == Seq(5, 1, 3))
  }

  test("normalizeText lowers, strips punctuation, collapses whitespace") {
    val got = Seq("  Hello,   WORLD!! 42 ").toDF("t")
      .select(TextFunctions.normalizeText(col("t"))).as[String].head()
    assert(got == "hello world 42")
  }

  test("fingerprint is order-sensitive, bagFingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(
      TextFunctions.fingerprint(col("t1")).as("f1"),
      TextFunctions.fingerprint(col("t2")).as("f2"),
      TextFunctions.bagFingerprint(col("t1")).as("b1"),
      TextFunctions.bagFingerprint(col("t2")).as("b2")
    ).head()
    assert(r.getLong(0) != r.getLong(1))
    assert(r.getLong(2) == r.getLong(3))
  }

  test("redactPii masks emails and phone shapes, counts match") {
    val cases = Seq(
      // email + phone
      ("write bob.smith+x@sub.example.co.uk or +1 (415) 555-0042 now",
        "write <EMAIL> or <PHONE> now", 2L),
      // two emails, digits in local part redacted by the email pass
      ("a1@b.cc then a2@b.cc", "<EMAIL> then <EMAIL>", 2L),
      // bare 10-digit phone, no email
      ("dial 4155550042 ok", "dial <PHONE> ok", 1L),
      // too-short digit run is NOT a phone; @ without TLD is NOT an email
      ("room 12345 and user@host", "room 12345 and user@host", 0L),
      // clean text untouched
      ("the quick brown fox", "the quick brown fox", 0L))
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == cases.map(c => (c._2, c._3)))
  }

  test("quality ratios are exact IEEE divisions") {
    val r = Seq("the cat sat on the mat").toDF("text")
      .withColumn("n_chars", length(col("text")))
    val cols = TextFunctions.qualityColumns(col("text"), col("n_chars"))
    val out = cols.foldLeft(r) { case (df, (n, c)) => df.withColumn(n, c) }
      .select("n_tokens", "avg_token_len", "stopword_ratio").head()
    assert(out.getInt(0) == 6)
    // 22 chars - 5 separators = 17 letters over 6 tokens
    assert(out.getDouble(1) == 17.0 / 6.0)
    assert(out.getDouble(2) == 2.0 / 6.0)
  }
}
