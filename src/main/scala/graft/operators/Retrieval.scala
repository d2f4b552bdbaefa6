package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sparse lexical retrieval over a document corpus: distributed BM25
  * with exact fixed-point scoring.
  *
  * 100 TB shape — every stage is a keyed shuffle or a map-side
  * combine, nothing all-pairs:
  *  - postings (doc, term, tf) and per-doc lengths are one tokenize +
  *    two combined groupBys over the corpus;
  *  - document frequencies aggregate the postings, keyed on term;
  *  - the query side joins postings ON TERM — the probe set is the
  *    handful of query terms, so the join touches only their postings
  *    lists (at scale: partition/bucket the postings by term and this
  *    is an index lookup, the inverted-index access path);
  *  - per-(query, doc) scores are one more keyed agg; top-k is a
  *    rank-limited window (Spark's WindowGroupLimit pushes the limit
  *    below the shuffle).
  * The only driver-side scalars are the corpus totals (N, L).
  *
  * Scoring is BM25 (k1 = 1.2, b = 0.75) in EXACT INTEGER fixed point,
  * the [[Quality.fineLog2]] discipline: libm `ln` and cross-row double
  * summation both drift across engines, so the idf is fineLog2
  * (1/256-bit units) and the tf normalization — a rational function of
  * (tf, dl) once avgdl = L/N is cleared of its division —
  *
  *   tf_norm = tf·(k1+1) / (tf + k1·(1−b+b·dl·N/L))
  *           = 22·tf·L / (10·tf·L + 3·L + 9·dl·N)      (×10L, k1/b exact)
  *
  * quantizes as one INTEGER division scaled by 2^20. Contributions and
  * their per-(query, doc) sums are integers: order-free, bit-identical
  * on any engine. Bounds: 22·tf·L·2^20 must stay under 2^63 — corpora
  * past ~8e9 total tokens should shard the build or drop to double
  * scoring (ranking quality needs no bit-exactness; the fixed point is
  * what makes the result HASH-VERIFIABLE). */
object Retrieval {

  /** Top-k BM25 results per query: (qid, doc id, score_q, rank).
    * `queries` rows are (qidCol, qtextCol); query terms deduplicate
    * (classic BM25 ignores query-side tf). Ties rank by ascending doc
    * id, so the cut is total and deterministic. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "qid", qtextCol: String = "qtext"): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(idCol).agg(count(lit(1)).as("dl"))
    bm25FromPostings(tf, dl, queries, k, idCol, qidCol, qtextCol)
  }

  /** BM25 from PRE-MATERIALIZED postings — the serve path of the
    * persisted inverted index ([[graft.lake.TextIndex]]): `tf` rows
    * are (idCol, term, tf), `dl` rows (idCol, dl), exactly what one
    * tokenize pass produces (and what the index stores), so direct
    * and index-served scoring share every instruction after the scan.
    * `tf` may arrive already RESTRICTED to the query terms (the index
    * probe) — document frequency is counted per term AFTER the
    * query-term join either way, and a term's postings list is always
    * complete, so the df a restricted tf yields is the global df. */
  def bm25FromPostings(tf: DataFrame, dl: DataFrame,
      queries: DataFrame, k: Int, idCol: String = "doc_id",
      qidCol: String = "qid", qtextCol: String = "qtext"): DataFrame = {
    require(k > 0, "k must be positive")
    // tf rows are unique per (doc, term): df is a count, not a distinct
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = dl.agg(sum(col("dl")).as("l"), count(lit(1)).as("n"))
      .head()
    // empty corpus (or all-empty texts): no postings, no scores — the
    // retrieval contract is an empty result, not an NPE on null sum
    if (totals.isNullAt(0))
      return tf.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          queries.schema(qidCol),
          tf.schema(idCol),
          org.apache.spark.sql.types.StructField("score_q",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.LongType))))
    val l = totals.getLong(0)
    val n = totals.getLong(1)
    val qterms = queries.select(col(qidCol),
      explode(TextFunctions.tokens(col(qtextCol))).as("term")).distinct()
    // restrict postings to query terms FIRST: the term join is the
    // index access path, everything after it is per-candidate work
    val postings = qterms
      .join(tf, "term")
      .join(dl, idCol)
      .join(dfT, "term")
    val scored = postings
      .withColumn("idf_q8",
        Quality.fineLog2(lit(n)) - Quality.fineLog2(col("df")))
      .withColumn("tf_num", col("tf") * lit(22L * 1048576L * l))
      .withColumn("tf_den",
        col("tf") * lit(10L * l) + lit(3L * l) + col("dl") * lit(9L * n))
      .withColumn("c", col("idf_q8") * expr("tf_num div tf_den"))
    scored.groupBy(qidCol, idCol)
      .agg(sum(col("c")).as("score_q"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(qidCol)
          .orderBy(col("score_q").desc, col(idCol).asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score_q"), col("rank"))
  }

  /** Positional postings: one row per (doc, position, term) — the
    * building block of a POSITIONAL inverted index. At scale the
    * postings persist as a lake table partitioned/bucketed by term;
    * here the term filter in [[phraseSearch]] stands in for that
    * index probe. */
  def positionalPostings(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "term")))

  /** Exact PHRASE SEARCH over positional postings — the classic IR
    * operator sparse term-match can't express: a document matches
    * where the phrase's terms occur at CONSECUTIVE positions. Plan
    * shape: each phrase term SELECTS its postings list first (the
    * inverted-index access path — at 100 TB a term-bucketed postings
    * table makes this an index lookup, never a corpus scan), then the
    * lists fold together by equi-joins on (doc, start-offset
    * position) — keyed shuffles sized by the RAREST terms' postings,
    * no cross product at any phrase length. Returns one row per
    * matching doc: (idCol, n_matches = distinct start positions). */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    phraseSearchFromPostings(
      positionalPostings(docs, idCol, textCol), phrase, idCol)

  /** [[phraseSearch]] over PRE-MATERIALIZED positional postings
    * (idCol, pos, term) — the serve path of the persisted inverted
    * index. The caller may pass postings already pruned to the
    * phrase's terms (the index probe); each per-term filter below
    * selects its own list either way, so pruned and full inputs fold
    * identically. */
  def phraseSearchFromPostings(post: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val p0 = post.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos").as("__p0"))
    val matched = phrase.zipWithIndex.drop(1)
      .foldLeft(p0) { case (acc, (t, i)) =>
        val pi = post.filter(col("term") === t)
          .select(col(idCol).as(s"__id_$i"), col("pos").as(s"__p_$i"))
        acc.join(pi, acc(idCol) === pi(s"__id_$i") &&
            pi(s"__p_$i") === acc("__p0") + i)
          .drop(s"__id_$i", s"__p_$i")
      }
    matched.groupBy(idCol).agg(count(lit(1)).as("n_matches"))
  }

  /** Hybrid retrieval: a sparse (BM25) and a dense (exact cosine)
    * candidate list per query, fused by Reciprocal Rank Fusion —
    * the standard two-tower + lexical serving recipe. Each arm
    * produces its top-`poolK` list independently (the arms touch
    * disjoint data: postings for BM25, the vector corpus for cosine),
    * then one (query, doc)-keyed FULL OUTER join fuses them:
    *
    *   rrf_q = Σ_arms  2^40 div (kRrf + rank_arm)     (0 if unranked)
    *
    * — RRF's 1/(K+rank) in exact integer fixed point, so the fused
    * ordering is order-free and hash-verifiable like [[bm25TopK]]'s.
    * 100 TB shape: both arms are already keyed/top-k-limited, and the
    * fusion join carries at most 2·poolK rows per query — fusion cost
    * scales with the query batch, never the corpus. Ties rank by
    * ascending doc id. Docs and vectors join by shared id (`idCol`
    * values = `vecIdCol` values), the usual doc-keyed embedding
    * store. */
  def hybridRrfTopK(docs: DataFrame, corpus: DataFrame,
      queries: DataFrame, qvecs: DataFrame, k: Int, poolK: Int = 20,
      kRrf: Int = 60, idCol: String = "doc_id",
      textCol: String = "text", qidCol: String = "qid",
      qtextCol: String = "qtext", vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && poolK >= k, "need poolK >= k > 0")
    // ids fuse through a LONG-keyed join: a non-numeric id would cast
    // to NULL and silently match nothing — refuse instead
    Seq(docs.schema(idCol), queries.schema(qidCol),
      corpus.schema(vecIdCol)).foreach(f => require(
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"hybrid fusion needs numeric ids; ${f.name} is ${f.dataType}"))
    val c = 1L << 40
    val bm = bm25TopK(docs, queries, poolK, idCol, textCol,
        qidCol, qtextCol)
      .select(col(qidCol).cast("long").as("__qid"),
        col(idCol).cast("long").as("__did"),
        col("rank").as("r_bm25"))
    val dn = Similarity.bruteForceTopK(corpus, qvecs, vecIdCol,
        vecCol, poolK)
      .select(col("id1").cast("long").as("__qid"),
        col("id2").cast("long").as("__did"),
        col("rank").cast("long").as("r_dense"))
    bm.join(dn, Seq("__qid", "__did"), "full_outer")
      .withColumn("rrf_q",
        coalesce(expr(s"$c div ($kRrf + r_bm25)"), lit(0L)) +
          coalesce(expr(s"$c div ($kRrf + r_dense)"), lit(0L)))
      .withColumn("rank",
        row_number().over(Window.partitionBy("__qid")
          .orderBy(col("rrf_q").desc, col("__did").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__qid").as(qidCol), col("__did").as(idCol),
        col("r_bm25"), col("r_dense"), col("rrf_q"), col("rank"))
  }
}
