package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-quality scoring and admission-control operators for
  * training-data pipelines (extensions per the north star — the
  * reference exposes no quality ops of its own).
  */
object Quality {

  /** Non-distinct word n-grams over a materialized token array — the
    * multiset sibling of [[TextFunctions.shinglesFromTokens]] (LM counts
    * need multiplicity; dedup wants the distinct set). Same
    * slice-not-when empty guard, same 1-based element_at arithmetic. */
  def ngramsFromTokens(tk: Column, n: Int): Column = {
    val m = greatest(size(tk) - (n - 1), lit(0))
    transform(
      slice(tk, lit(1), m),
      (_, i) =>
        concat_ws(" ", (0 until n).map(o => element_at(tk, i + lit(o + 1))): _*))
  }

  /** Floor-log2 of a positive integer column, in exact integer
    * arithmetic: `length(bin(x)) - 1`. `bin` prints the minimal binary
    * representation in Spark and DuckDB alike, so the value is
    * bit-identical cross-engine where `log2()` (libm) would drift. */
  def flog2(x: Column): Column = (length(bin(x)) - 1).cast("long")

  /** CCNet-style n-gram LM quality scoring (Wenzek et al. 2020 score
    * CommonCrawl against a Wikipedia LM; here the LM is a token-bigram
    * model with add-one smoothing trained on a reference slice of the
    * corpus itself). Each document is scored by its BIT-QUANTIZED
    * cross-entropy under the model:
    *
    *   cost(w1 w2) = floor(log2(c1(w1) + V)) - floor(log2(c2(w1 w2) + 1))
    *
    * — the whole-bit version of -log2 p(w2|w1), within one bit per term
    * of the exact value and MONOTONE in the count ratio, but computed
    * entirely in integer arithmetic (`length(bin(x)) - 1`), so the score
    * is hash-verifiable across engines where a libm `ln()` would drift
    * in the last ulp. c1 = reference count of the bigram PREFIX (sums of
    * c2 — self-consistent with the bigram table), V = reference vocab
    * size (the add-one mass). Low bits_per_token = fluent-under-the-
    * reference text; high = out-of-domain / garbled — the CCNet
    * head/middle/tail signal.
    *
    * Returns one row per doc with >= 1 bigram: (idCol, n_bigrams,
    * total_bits, bits_per_token); bits_per_token is the one final IEEE
    * division (exact integers in, correctly rounded on every engine).
    *
    * 100 TB shape: the model is two keyed aggs over the REFERENCE slice
    * only. Scoring groups the corpus to (doc, bigram) pair width FIRST
    * (occurrence fan-out on Zipf-head bigrams never reaches the joins —
    * the d22 discipline), then two keyed joins against the count tables
    * (AQE broadcasts them while they fit; keyed shuffle beyond), one
    * keyed agg per doc. Nothing all-pairs, nothing driver-side except
    * the one-row vocab-size agg (same class as the Bloom build). */
  def ngramLmScore(
      corpus: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val refTk = reference
      .select(TextFunctions.tokens(col(textCol)).as("__tk"))
    val refBg = refTk
      .select(explode(ngramsFromTokens(col("__tk"), 2)).as("bg"))
    val c2 = refBg.groupBy("bg").agg(count(lit(1)).as("__c2"))
    val c1 = c2
      .groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("__c2")).as("__c1"))
    // one-row scalar: the reference vocabulary size (add-one mass)
    val vocab = refTk
      .select(explode(col("__tk")).as("t"))
      .agg(countDistinct(col("t")))
      .head().getLong(0)
    val occ = corpus
      .select(col(idCol).as("__id"),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col("__id"), explode(ngramsFromTokens(col("__tk"), 2)).as("bg"))
      .groupBy("__id", "bg")
      .agg(count(lit(1)).as("__occ"))
    occ
      .join(c2, Seq("bg"), "left")
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(c1, Seq("w1"), "left")
      .withColumn("__bits",
        flog2(coalesce(col("__c1"), lit(0L)) + lit(vocab)) -
          flog2(coalesce(col("__c2"), lit(0L)) + lit(1L)))
      .groupBy(col("__id").as(idCol))
      .agg(
        sum(col("__occ")).as("n_bigrams"),
        sum(col("__occ") * col("__bits")).as("total_bits"))
      .withColumn("bits_per_token",
        col("total_bits").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Per-domain document cap (the CommonCrawl-pipeline admission rule:
    * no domain may contribute more than `cap` documents, keeping one
    * mega-site from dominating the corpus). Keeps the `cap`
    * deterministically-first docs per domain, ordered by (content
    * fingerprint, id) — the same engine-neutral order the stratified
    * sampler uses.
    *
    * 100 TB shape: ONE row_number window partitioned by domain — and
    * because the predicate is `rk <= cap`, Spark plans it as
    * WindowGroupLimit: every map task pre-prunes its partition to the
    * per-domain top-`cap` BEFORE the exchange, so a 1B-doc hot domain
    * ships at most cap × (input partitions) rows into the sort, not 1B.
    * The filter, not a bespoke two-phase split, is the scale story
    * (PlanSpec asserts the WindowGroupLimit node). */
  def domainCap(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      textCol: String,
      cap: Int
  ): DataFrame = {
    val hashed = df.select(
      col(idCol), col(domainCol),
      TextFunctions.charFold(col(textCol), 131).as("content_hash"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("content_hash"), col(idCol))
    hashed
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }
}
