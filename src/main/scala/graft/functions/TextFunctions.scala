package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All built from codegen'd `org.apache.spark.sql.functions` (split /
  * higher-order transform / filter / aggregate) — no UDFs, so every
  * expression stays inside whole-stage codegen and scales linearly with
  * executors. (The reference exposes no text ops of its own — these extend
  * it per the north star.)
  */
object TextFunctions {

  /** Whitespace tokenization (single-space; the fixtures are space-joined
    * word bags). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words + digit runs + punctuation as separate
    * tokens, approximated by a regex split. Whitespace runs are split
    * boundaries, not tokens (r2 fix: they used to be counted). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      t => length(trim(t)) > 0))

  /** Word n-gram shingles (distinct) over a *materialized* token-array
    * column. Callers must pass an attribute (a column produced by a prior
    * projection), NOT an inline `split(...)` expression: higher-order
    * functions are interpreted, and every reference to an inline `tk`
    * inside the lambda would re-evaluate the split per element (measured
    * ~6× slower on the documents fixture).
    *
    * The empty guard is `slice(tk, 1, max(size-n+1, 0))`, not
    * `when(size >= n, ...)`: a conditional with array branches measured
    * ~7× slower per pass, and `sequence(1, m)` with m <= 0 would produce
    * a *descending* sequence rather than an empty one. */
  def shinglesFromTokens(tk: Column, n: Int = 3): Column = {
    val m = greatest(size(tk) - (n - 1), lit(0))
    array_distinct(
      transform(
        slice(tk, lit(1), m),
        (_, i) => // i is the 0-based position; element_at is 1-based
          concat_ws(
            " ",
            (0 until n).map(o => element_at(tk, i + lit(o + 1))): _*
          )
      )
    )
  }

  /** Shingles straight from a text column — convenience for tests/small
    * inputs; hot paths should pre-project the token array and use
    * [[shinglesFromTokens]]. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Distinct shingle FOLD HASHES (packed `f131 | f137<<31` char-fold
    * pairs) straight from a materialized token array — the hot-path form
    * for dedup candidate generation: one native codegen'd pass per row
    * (ShinglePackExpr), no shingle-string array materialization, no
    * interpreted per-element lambdas. Values are bit-identical to
    * `charFold(shingle, 131) | charFold(shingle, 137) << 31` over
    * [[shinglesFromTokens]] output (TextFunctionsSpec proves equality),
    * so MinHash built on the unpacked folds matches the DuckDB oracle
    * exactly. */
  def shingleFolds(tk: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShinglePackExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(tk), n))

  /** Positional window hashes: ALL n-gram fold hashes in window order
    * (duplicates kept; index = 0-based window start). The substring-
    * duplication audit's input — interval merging needs positions. */
  def shingleFoldsAll(tk: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShinglePackAllExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(tk), n))

  /** Training-data text cleaning: lowercase, strip non-alphanumerics
    * (keeping spaces), collapse whitespace runs, trim. Pure codegen'd
    * string expressions — no UDFs. */
  def normalizeText(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(lower(text), "[^a-z0-9 ]", ""),
        " +", " "))

  /** PII redaction patterns — the RE2-compatible subset (no backrefs, no
    * lookaround) so the SAME pattern strings run verbatim in Java regex
    * (Spark) and RE2 (DuckDB oracle, Go/Rust tooling). Phone shapes:
    * leading digit (optional +), >= 6 digit/separator chars, trailing
    * digit — greedy and leftmost-longest agree on these alternation-free
    * patterns, so both engines pick identical spans. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\+?[0-9][0-9() .-]{6,}[0-9]"

  /** Training-corpus PII scrub: mask emails first (their digit runs
    * would otherwise feed the phone pattern), then phone shapes, with
    * typed placeholders. A pure codegen'd regexp_replace chain — per-row,
    * zero shuffle, scale-free. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** How many PII spans [[redactPii]] would mask (emails + phones,
    * phones counted after email masking, mirroring the redaction order). */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        lit(PhoneRe), lit(0)))).cast("long")

  /** Remove stopwords from a materialized token array, back to a string. */
  def removeStopwords(
      tk: Column,
      stopwords: Seq[String] = EnglishStopwords
  ): Column =
    concat_ws(" ", filter(tk, t => !t.isin(stopwords.map(lit(_)): _*)))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  def stopwordCount(text: Column, stopwords: Seq[String] = EnglishStopwords)
      : Column = stopwordCountFromTokens(tokens(text), stopwords)

  /** Stopword count over a materialized token-array column — pass an
    * attribute in hot paths (interpreted lambdas re-evaluate inline
    * expressions per element, see shinglesFromTokens). */
  def stopwordCountFromTokens(
      tk: Column,
      stopwords: Seq[String] = EnglishStopwords
  ): Column =
    size(filter(tk, t => t.isin(stopwords.map(lit(_)): _*)))

  /** Heuristic quality signals: token count, average token length,
    * stopword ratio, and a fixed-weight composite. Every ratio is a single
    * IEEE division over exact integers — deterministic across engines. */
  def qualityColumns(text: Column, nChars: Column): Seq[(String, Column)] =
    qualityColumnsFromTokens(tokens(text), nChars)

  /** Quality signals over a materialized token array (hot-path form). */
  def qualityColumnsFromTokens(tk: Column, nChars: Column)
      : Seq[(String, Column)] = {
    val ntok = size(tk)
    val stop = stopwordCountFromTokens(tk)
    val avgTokLen =
      (nChars - (ntok - lit(1))).cast("double") / ntok.cast("double")
    val stopRatio = stop.cast("double") / ntok.cast("double")
    Seq(
      "n_tokens" -> ntok,
      "avg_token_len" -> avgTokLen,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> (stopRatio * lit(0.5) + (lit(1.0) / avgTokLen) * lit(0.5))
    )
  }

  /** Stopword-profile language scoring: hit counts per language's stopword
    * list; predicted label = argmax with a fixed precedence order on ties.
    * (A real system swaps in fastText-style char n-gram profiles; the
    * Spark plumbing — per-doc scoring without shuffles — is identical.) */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des")
  )

  def langHits(text: Column): Seq[(String, Column)] =
    langHitsFromTokens(tokens(text))

  def langHitsFromTokens(tk: Column): Seq[(String, Column)] =
    LangStopwords.map { case (lang, words) =>
      s"${lang}_hits" -> stopwordCountFromTokens(tk, words)
    }

  def langPredict(text: Column): Column =
    langPredictFromTokens(tokens(text))

  def langPredictFromTokens(tk: Column): Column = {
    val hits = LangStopwords.map { case (l, ws) =>
      l -> stopwordCountFromTokens(tk, ws)
    }
    // argmax with first-listed language winning ties
    hits.tail.foldLeft((hits.head._2, lit(hits.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (
          when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(lang)).otherwise(bestLang)
        )
    }._2
  }

  /** Modulus for the portable polynomial hashes: Mersenne prime 2^31-1. */
  val HashP: Long = 2147483647L

  /** Portable polynomial character hash — identical arithmetic is
    * expressible in any ANSI-ish SQL engine (the DuckDB oracles compute
    * the same fold): left fold over codepoints,
    * `h = (h*base + codepoint(i)) mod (2^31-1)`.
    *
    * Every intermediate stays < 2^39, safe under ANSI long arithmetic.
    * Used instead of engine-specific hashes (xxhash64) wherever the result
    * value itself must be oracle-verifiable across engines; for
    * join-key-only hashing (where values never surface) prefer the faster
    * codegen'd `xxhash64`. */
  def charFold(s: Column, base: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CharFoldExpr(org.apache.spark.sql.GraftSqlBridge.expression(s), base))

  /** 62-bit portable token hash: two independent char folds packed as
    * `f_131 + (f_137 << 31)`. */
  def tokenHash62(t: Column): Column =
    charFold(t, 131) + shiftleft(charFold(t, 137), 31)

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * the full character stream, `h = (h*131 + code) mod (2^31-1)` —
    * portable, so the d08 DuckDB oracle verifies the exact values. */
  def fingerprint(text: Column): Column = charFold(text, 131)

  /** Bag-of-words fingerprint: order-insensitive sum of per-token char
    * folds (base 137) over the distinct token set, mod 2^31-1 —
    * near-dup-stable under token shuffling, portable across engines. */
  def bagFingerprint(text: Column): Column =
    pmod(
      aggregate(
        array_distinct(tokens(text)),
        lit(0L),
        (h, t) => h + charFold(t, 137)
      ),
      lit(HashP)
    )
}
