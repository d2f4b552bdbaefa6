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

  /** DSIR-style importance weighting (Xie et al. 2023 select pretraining
    * data by importance resampling between a target and a base
    * distribution over hashed n-gram features). Features here are hashed
    * unigrams: bucket = tokenHash62(token) mod `buckets` (prime, so both 31-bit folds reach the bucket); the target
    * distribution is the corpus rows matching `targetPred` (e.g.
    * `col("lang") === "en"`), the base distribution is the whole corpus.
    *
    * The importance weight log2(p_target(doc)/p_base(doc)) is FIXED-
    * POINT QUANTIZED (1/256-bit units): every log2 is [[fineLog2]] —
    * exact integer arithmetic like d32's whole-bit trick, but with a
    * mantissa interpolation so sub-2x probability ratios still
    * register — making per-doc weights integer sums: order-independent
    * and hash-verifiable cross-engine, where a libm `ln()` sum would
    * drift in the last ulp:
    *
    *   weight_q8 = sum_tokens [fineLog2(tc(b)+1) - fineLog2(bc(b)+1)]
    *             + n_tokens * [fineLog2(Tb + B) - fineLog2(Tt + B)]
    *
    * with tc/bc the bucket counts under target/base, Tt/Tb the token
    * totals (+`buckets` = add-one smoothing mass). Resampling = rank by
    * (weight_q8 desc, id) and keep the top slice — a
    * TakeOrderedAndProject, never a global sort.
    *
    * 100 TB shape: bucket-count tables are ONE keyed agg each, bounded
    * by `buckets` rows (broadcast on the scoring join); scoring groups
    * the corpus to (doc, bucket) width first (occurrence counts — the
    * d22/d32 discipline, Zipf-head buckets never fan out into the
    * join), then one keyed agg per doc. The two totals are one-row aggs
    * (same class as the d32 vocab scalar). */
  def importanceWeights(
      corpus: DataFrame,
      targetPred: Column,
      idCol: String,
      textCol: String,
      buckets: Int = 2039
  ): DataFrame = {
    val tok = corpus
      .select(col(idCol).as("__id"), targetPred.as("__t"),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col("__id"), col("__t"), size(col("__tk")).as("__ntok"),
        explode(col("__tk")).as("tkn"))
      .withColumn("b", pmod(TextFunctions.tokenHash62(col("tkn")),
        lit(buckets.toLong)))
    val baseCnt = tok.groupBy("b").agg(count(lit(1)).as("bc"))
    val tgtCnt = tok.filter(col("__t"))
      .groupBy("b").agg(count(lit(1)).as("tc"))
    // one-row scalars: token totals under each distribution
    val (tt, tb) = {
      val r = tok.agg(
        sum(when(col("__t"), 1L).otherwise(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val normQ = fineLog2Long(tb + buckets) - fineLog2Long(tt + buckets)
    val occ = tok
      .groupBy(col("__id"), col("__ntok"), col("b"))
      .agg(count(lit(1)).as("occ"))
    occ
      .join(tgtCnt, Seq("b"), "left")
      .join(baseCnt, Seq("b"), "left")
      .withColumn("__q",
        fineLog2(coalesce(col("tc"), lit(0L)) + lit(1L)) -
          fineLog2(coalesce(col("bc"), lit(0L)) + lit(1L)))
      .groupBy(col("__id").as(idCol))
      .agg(
        max(col("__ntok")).cast("long").as("n_tokens"),
        (sum(col("occ") * col("__q")) +
          max(col("__ntok")) * lit(normQ)).as("weight_q8"))
  }

  /** Fixed-point log2 in 1/256-bit units, exact integer arithmetic:
    *
    *   fineLog2(x) = 256·flog2(x) + floor(x·256 / 2^flog2(x)) − 256
    *
    * — [[flog2]] plus a linear interpolation on the mantissa (max error
    * ~0.086 bit, monotone). The division is by a power of two with both
    * operands < 2^52, so the double intermediate is EXACT and the
    * result is bit-identical on any IEEE engine — the resolution
    * upgrade over whole-bit [[flog2]] that lets sub-2× probability
    * ratios (where floor-log2 collapses to 0) still register. */
  def fineLog2(x: Column): Column = {
    val f = flog2(x)
    lit(256L) * f +
      floor((x * lit(256L)).cast("double") /
        pow(lit(2.0), f.cast("double"))).cast("long") - lit(256L)
  }

  /** Driver-side twin of [[fineLog2]] for one-row scalar terms. */
  private def fineLog2Long(x: Long): Long = {
    val f = 63 - java.lang.Long.numberOfLeadingZeros(x)
    256L * f + ((x * 256L) >> f) - 256L
  }

  /** Gopher-style rule-based quality gates (Rae et al. 2021 §A1.1 apply
    * a battery of hard document filters before any model-based scoring).
    * Five rules over the whitespace-token model, thresholds scaled to
    * short synthetic docs; each is a per-row projection — integer
    * counts and single divisions only, no shuffle anywhere:
    *
    *  - `tokens_ok`:   token count within [minTokens, maxTokens]
    *  - `word_len_ok`: mean token length within [3.5, 4.8]
    *  - `stop_ok`:     >= 2 DISTINCT stopwords present
    *  - `rep_ok`:      most-frequent-token share <= `maxTopTokenFrac`
    *                   (the repetition rule: word-salad and boilerplate
    *                   both concentrate mass on one token)
    *  - `alpha_ok`:    >= 90% of tokens contain an alphabetic char
    *
    * `pass` = all five. Per-row work is bounded by doc length (the
    * rep rule is distinct × n over one row's array) — at 100 TB this
    * is embarrassingly parallel scan work, zero exchanges. */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nCharsCol: String,
      minTokens: Int = 20,
      maxTokens: Int = 80,
      maxTopTokenFrac: Double = 0.15
  ): DataFrame = {
    val base = df.select(col(idCol), col(nCharsCol).as("__nc"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    val ntok = size(col("__tk"))
    val avgLen = (col("__nc") - (ntok - lit(1))).cast("double") /
      ntok.cast("double")
    val stopDistinct = size(array_intersect(col("__tk"),
      typedLit(TextFunctions.EnglishStopwords)))
    val topCnt = array_max(transform(array_distinct(col("__tk")),
      t => size(filter(col("__tk"), x => x === t))))
    val alphaCnt = size(filter(col("__tk"), t => t.rlike("[a-zA-Z]")))
    base
      .withColumn("n_tokens", ntok.cast("long"))
      .withColumn("avg_token_len", avgLen)
      .withColumn("n_stop_distinct", stopDistinct.cast("long"))
      .withColumn("top_token_frac",
        topCnt.cast("double") / ntok.cast("double"))
      .withColumn("alpha_frac",
        alphaCnt.cast("double") / ntok.cast("double"))
      .withColumn("tokens_ok",
        col("n_tokens").between(minTokens, maxTokens))
      .withColumn("word_len_ok",
        col("avg_token_len") >= 3.5 && col("avg_token_len") <= 4.8)
      .withColumn("stop_ok", col("n_stop_distinct") >= 2)
      .withColumn("rep_ok", col("top_token_frac") <= maxTopTokenFrac)
      .withColumn("alpha_ok", col("alpha_frac") >= 0.9)
      .withColumn("pass",
        col("tokens_ok") && col("word_len_ok") && col("stop_ok") &&
          col("rep_ok") && col("alpha_ok"))
      .drop("__nc", "__tk")
  }

  /** Per-document top-k keywords by TF-IDF, in the fixed-point
    * [[fineLog2]] arithmetic (idf_q8 = fineLog2(N) − fineLog2(df) —
    * integer, order-identical to log(N/df), hash-verifiable across
    * engines where libm logs drift).
    *
    * Shape at scale: one (doc, token) count agg (map-side combining),
    * one token-keyed df agg whose result is corpus-VOCABULARY sized and
    * joins back on the token key, the N scalar resolved as ONE
    * column-pruned count job on the driver (a 1-row broadcast frame
    * would plan a BroadcastNestedLoopJoin — same result, but it puts a
    * nested-loop operator in every downstream audit for what is really
    * a literal), and the final top-k as a per-doc window — partitioned
    * by doc_id, so no global sort and no skew beyond a single
    * document's vocabulary. Nothing is ever all-pairs. */
  /** Hashed linear classifier INFERENCE (the model-based quality
    * filter every modern corpus pipeline runs after the hard rules —
    * fastText-style: feature-hashed bag of words, one integer weight
    * per (bucket, class), argmax over class scores). A trained model's
    * weights are an INPUT artifact; no model ships in this container,
    * so the weight table is derived deterministically from the
    * portable hash family — `w(b,k) = ((b·1103515245 + k·12345 + 7)
    * mod (2^31−1)) mod 255 − 127` — which keeps every score an exact
    * integer the oracle replays. The operator SHAPE is the real
    * thing, and it is the point:
    *
    *  - bucket = charFold(token) mod `buckets` — feature hashing, the
    *    trick that makes the weight matrix O(buckets·classes) instead
    *    of O(vocab·classes);
    *  - w(bucket, k) is a PURE FUNCTION here, so scoring needs no
    *    weight-table join at all — with a real model it becomes one
    *    broadcast of a buckets×classes int table (a few MB at fastText
    *    sizes), never a corpus-scale join;
    *  - per-doc class scores are ONE map-side-combining agg over the
    *    exploded tokens; label = argmax (ties to the lowest class, the
    *    deterministic rule both engines share), margin = top minus
    *    runner-up — the confidence the downstream threshold cuts on.
    *
    * 100 TB shape: embarrassingly parallel scan work + one keyed agg;
    * nothing driver-side, nothing all-pairs. */
  def classifierScore(docs: DataFrame, buckets: Int = 4096,
      classes: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(classes >= 2 && classes <= 8, "2..8 classes")
    val tok = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0)
      .withColumn("__b",
        pmod(TextFunctions.charFold(col("__t"), 131),
          lit(buckets.toLong)))
    def w(k: Int) =
      pmod(col("__b") * lit(1103515245L) + lit(k * 12345L + 7L),
        lit(2147483647L)) % lit(255L) - lit(127L)
    val aggs = (0 until classes).map(k => sum(w(k)).as(s"s$k"))
    val perDoc = tok.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val sCols = (0 until classes).map(k => col(s"s$k"))
    val top = greatest(sCols: _*)
    val label = (1 until classes)
      .foldLeft(when(col("s0") === top, 0L)) { (acc, k) =>
        acc.when(col(s"s$k") === top, k.toLong)
      }
    // second-largest via a sorted literal-width array (correct at any
    // `classes`, duplicates included)
    val runnerUp = array_sort(array(sCols: _*)).getItem(classes - 2)
    perDoc
      .withColumn("label", label)
      .withColumn("margin", top - runnerUp)
      .orderBy(idCol)
  }

  def tfidfTopTerms(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("token")
      .agg(countDistinct(col(idCol)).as("df"))
    val nDocs: Long =
      docs.agg(countDistinct(col(idCol))).head.getLong(0)
    val scored = tf.join(df, "token")
      .withColumn("score_q8",
        col("tf") * (fineLog2(lit(nDocs)) - fineLog2(col("df"))))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy(idCol)
          .orderBy(col("score_q8").desc, col("token").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("score_q8"), col("rank"))
  }

  /** N-gram novelty / saturation curve — the corpus-curation
    * diminishing-returns diagnostic: for each doc (in id order), how
    * many corpus-unique n-grams appear there FIRST, and the running
    * total. One keyed min-agg over exploded n-grams (first owner per
    * gram), one count per owner, and the cumulative sum via
    * [[Pack.packOffsets]]'s strip-partitioned distributed prefix sum
    * with the doc id as its own order hash — no single-partition global
    * window at any corpus size. Docs contributing nothing still emit a
    * zero row, so the curve is dense. */
  def ngramNovelty(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(tk) - $n), i -> " +
          (0 until n).map(j => s"tk[i + $j]")
            .mkString("concat_ws(' ', ", ", ", ")") + ")")).as("gram"))
    val novel = grams
      .groupBy("gram").agg(min(col(idCol)).as(idCol))
      .groupBy(idCol).agg(count(lit(1)).as("novel"))
    val base = docs.select(col(idCol))
      .join(novel, Seq(idCol), "left")
      .withColumn("novel", coalesce(col("novel"), lit(0L)))
    val maxId: Long = docs.agg(max(col(idCol))).head.getLong(0)
    require(maxId >= 0, s"$idCol must be non-negative for strip hashing")
    val hashBits =
      math.max(2, 64 - java.lang.Long.numberOfLeadingZeros(maxId))
    Pack.packOffsets(base, idCol, "novel", idCol,
        hashBits = hashBits, stripBits = math.min(5, hashBits - 1))
      .withColumn("cum_novel", col("start_off") + col("novel"))
      .select(col(idCol), col("novel"), col("cum_novel"))
      .orderBy(idCol)
  }

  /** Per-doc unigram Shannon entropy in the exact [[fineLog2]] fixed
    * point — the information-density quality signal (low entropy =
    * repetitive text; the complement of d49's duplicate fraction):
    * H·N·256 = N·flog2(N) − Σ cᵢ·flog2(cᵢ), ALL integer, so the
    * signal itself hash-verifies where a libm log2 would drift; the
    * one double is the final bits-per-token division. One (doc, token)
    * agg + one per-doc agg, both map-side combining. */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val c = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(idCol, "token").agg(count(lit(1)).as("c"))
    c.groupBy(idCol)
      .agg(sum("c").as("n_tokens"),
        sum(col("c") * fineLog2(col("c"))).as("__clog"))
      .withColumn("ent_q8n",
        col("n_tokens") * fineLog2(col("n_tokens")) - col("__clog"))
      .withColumn("bits_per_token",
        col("ent_q8n").cast("double") /
          (col("n_tokens") * 256L).cast("double"))
      .select(col(idCol), col("n_tokens"), col("ent_q8n"),
        col("bits_per_token"))
  }

  /** Heavy hitters by per-partition Misra-Gries + exact rescore — the
    * frequent-items shape that never shuffles the full vocabulary.
    * Pass 1 streams each partition through a k-counter Misra-Gries
    * summary (bounded memory, zero shuffle; genuinely per-partition
    * imperative state, the documented mapPartitions niche) and unions
    * the surviving keys: any token with global freq > total/k has
    * partition freq > n_p/k somewhere (pigeonhole), and k counters
    * retain every key with partition freq > n_p/(k+1) — so the
    * candidate union PROVABLY contains every true heavy hitter, at most
    * k·partitions candidates. Pass 2 broadcast-semi-joins the
    * candidates back and counts them EXACTLY, so the output is the
    * precise `freq · k > total` set — sketch-pruned but not
    * sketch-valued, which is what lets a DuckDB oracle replay it. */
  def heavyHitters(tokens: DataFrame, k: Int,
      tokenCol: String = "token"): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val toks = tokens.select(col(tokenCol).as("token"))
    val total = toks.count()
    val candidates = toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None =>
            m.keys.toArray.foreach { kk =>
              val c = m(kk) - 1
              if (c == 0) m.remove(kk) else m.update(kk, c)
            }
        }
      }
      m.keysIterator
    }.toDF("token").distinct()
    toks.join(broadcast(candidates), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") * k > total)
      .orderBy(col("n").desc, col("token"))
  }

  /** One learned BPE merge: in `round`, symbols `s1`+`s2` fused with a
    * corpus-weighted pair count of `weight`. */
  final case class BpeMerge(round: Int, s1: String, s2: String,
      weight: Long)

  /** Distributed BPE merge induction (Sennrich et al. 2016) —
    * tokenizer TRAINING as a lake job. The corpus is read ONCE, by the
    * vocabulary aggregation (distinct words + counts: all pair
    * statistics are word-count-weighted, the standard reduction); each
    * round is then one map-side-combining pair-count aggregation over
    * the vocabulary, an O(1) top-1 (the only driver-side scalar — the
    * argmax pair, same class as tfidf's N), and a row-local
    * re-segmentation. `rounds` rounds = `rounds` tiny vocabulary jobs;
    * production trainers batch many non-interacting merges per round,
    * but the per-round dataflow is exactly this.
    *
    * Segmentations are strings of `|`-wrapped symbols ("agg" ->
    * "|a||g||g|") and a merge (x, y) is the builtin
    * `replace(seg, "|x||y|", "|xy|")`: left-to-right non-overlapping
    * scanning, which IS greedy BPE order, and the doubled boundary
    * keeps consecutive merges independent — in "aaaa" (seg
    * "|a||a||a||a|") the first (a,a) match does not consume the next
    * match's leading bar, so one pass yields "|aa||aa|" exactly like
    * the reference greedy. Wrong-boundary matches cannot happen:
    * symbols are `|`-free, so in any occurrence of "|x||y|" the middle
    * "||" is a true symbol boundary and both x and y are WHOLE symbols
    * (a longer neighbor symbol would put a letter, not a bar, against
    * the pattern's edge). All weights are exact integers and ties
    * break (count desc, pair asc), so the learned merges replay
    * bit-identically in the DuckDB oracle. */
  def bpeTrain(docs: DataFrame, rounds: Int, textCol: String = "text")
      : (Seq[BpeMerge], DataFrame) = {
    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("seg",
        expr("substring('|' || regexp_replace(word, '(.)', '$1||'), " +
          "1, 3 * length(word))"))
      .cache()
    val merges = Seq.newBuilder[BpeMerge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = vocab
        .select(col("n"),
          expr("split(btrim(seg, '|'), '\\\\|\\\\|')").as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(sy) - 2), " +
            "i -> struct(sy[i] AS s1, sy[i + 1] AS s2))")).as("p"))
        .groupBy("p.s1", "p.s2").agg(sum("n").as("w"))
        .orderBy(col("w").desc, col("s1"), col("s2"))
        .head(1)
      if (top.isEmpty) done = true
      else {
        val (s1, s2, w) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(r, s1, s2, w)
        vocab = vocab.withColumn("seg",
          expr(s"replace(seg, '|$s1||$s2|', '|$s1$s2|')"))
        r += 1
      }
    }
    (merges.result(), vocab)
  }
}
