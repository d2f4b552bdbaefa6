package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Retrieval

/** Persisted POSITIONAL INVERTED INDEX for the sparse-retrieval
  * operators — what turns d57/d59's per-call corpus tokenization into
  * an index probe. One table serves both operators:
  *
  *  - `index/` — one row per corpus TOKEN: (term, doc id, position),
  *    partitioned by `tb = pmod(hash(term), nBuckets)` so a query
  *    term's postings list reads only its bucket (partition pruning
  *    on the literal probe; at 1000 executors this is the
  *    inverted-index access path on disk — a term lookup touches
  *    1/nBuckets of the index, never the corpus).
  *  - `lengths/` — (doc id, dl): per-document token counts, the BM25
  *    normalizer. Corpus totals (N, L) re-aggregate from it at serve
  *    time — one scan of a 1-row-per-doc table, never a stored scalar
  *    that could drift from the rows under concurrent appends.
  *  - `_text.json` — the trust marker AND parameter record (bucket
  *    count), the [[AnnIndex]] `_ann.json` discipline: serving uses
  *    the STORED bucket count, an append drops the marker first and
  *    restores it after, and a crash between the two leaves the index
  *    UNTRUSTED — [[serveBm25]]/[[servePhrase]] return None and the
  *    caller falls back to the direct operators (degraded cost, never
  *    a wrong answer from a half-appended index).
  *
  * Serving is EXACT: BM25's tf re-aggregates as `count(1)` over the
  * probed positional rows (a term's list is always complete, so the
  * restricted count equals the full-corpus tf), document frequency
  * counts the restricted (term, doc) pairs, and scoring is the shared
  * [[Retrieval.bm25FromPostings]] integer fixed point — index-served
  * results are hash-identical to the direct operators', which d60/d61
  * gate under the oracle.
  *
  * Maintenance is IDEMPOTENT ([[appendOnce]]): the batch narrows to
  * doc ids the index does not already hold (one keyed left_anti
  * against `lengths` — the index's own id set is the idempotence
  * mark), so at-least-once commit-log delivery folds exactly once.
  * Tokenization is per-document, so an appended batch's rows are
  * definitionally identical to a from-scratch rebuild's.
  */
object TextIndex {

  private val mapper = new ObjectMapper()

  private def markerPath(root: String) = new Path(root, "_text.json")
  private def indexPath(root: String) = s"$root/index"
  private def lengthsPath(root: String) = s"$root/lengths"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def trusted(spark: SparkSession, root: String): Boolean =
    fsOf(spark, root).exists(markerPath(root))

  /** Drop only the trust marker (the dirty state an append enters). */
  def distrust(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    if (fs.exists(markerPath(root))) fs.delete(markerPath(root), false)
  }

  private def seal(spark: SparkSession, root: String,
      json: String): Unit = {
    val out = fsOf(spark, root).create(markerPath(root), true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, root: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val fs = fsOf(spark, root)
    if (!fs.exists(markerPath(root))) return None
    val in = fs.open(markerPath(root))
    val node =
      try mapper.readTree(in)
      finally in.close()
    if (node.path("kind").asText() == "text") Some(node) else None
  }

  /** Positional postings of `docs` with their bucket column — the
    * at-rest shape. Lengths derive from the SAME rows (one row per
    * token), so a zero-token document is absent from both tables,
    * exactly as it is absent from the direct operators' aggregates. */
  private def postingsOf(docs: DataFrame, nBuckets: Int,
      idCol: String, textCol: String): DataFrame =
    Retrieval.positionalPostings(docs, idCol, textCol)
      .withColumn("tb", pmod(hash(col("term")), lit(nBuckets)))

  def build(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "need at least one term bucket")
    distrust(spark, root)
    val post = postingsOf(docs, nBuckets, idCol, textCol)
      .localCheckpoint(true) // ONE tokenize pass feeds both tables
    post.select(col("tb"), col("term"), col(idCol), col("pos"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(indexPath(root))
    post.groupBy(idCol).agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(lengthsPath(root))
    seal(spark, root, s"""{"kind":"text","nBuckets":$nBuckets}""")
  }

  /** IDEMPOTENT delta fold: narrow the batch to unseen doc ids (the
    * lengths table is the membership set), tokenize ONLY the survivors
    * with the STORED bucket count, append to both tables. Returns the
    * count of newly-folded docs (0 on a full replay). */
  def appendOnce(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    val m = readMeta(spark, root).getOrElse(throw
      new IllegalStateException(
        s"no trusted text index at $root — rebuild with build"))
    val existing = spark.read.parquet(lengthsPath(root)).select(idCol)
    val fresh = batch.join(existing, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val n = fresh.count()
    if (n > 0) {
      distrust(spark, root)
      val post = postingsOf(fresh, m.get("nBuckets").asInt(),
        idCol, textCol).localCheckpoint(true)
      post.select(col("tb"), col("term"), col(idCol), col("pos"))
        .write.mode("append").partitionBy("tb")
        .parquet(indexPath(root))
      post.groupBy(idCol).agg(count(lit(1)).as("dl"))
        .write.mode("append").parquet(lengthsPath(root))
      seal(spark, root, mapper.writeValueAsString(m))
    }
    n
  }

  /** Buckets of a literal term set, computed with the SAME expression
    * the build used (a one-row-per-term local job — driver-bounded by
    * the term count), so planning-time partition filters land on
    * exactly the written buckets. */
  private def bucketsOf(spark: SparkSession, terms: Seq[String],
      nBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("term")
      .select(pmod(hash(col("term")), lit(nBuckets)).as("tb"))
      .distinct().as[Int].collect().toSeq
  }

  /** Serve BM25 top-k from the persisted index — None when untrusted
    * (caller falls back to [[Retrieval.bm25TopK]]). The probe joins
    * postings ON (bucket, term): only the query terms' buckets read
    * (dynamic partition pruning at scale), tf re-aggregates from the
    * probed positional rows, and scoring is the shared exact-integer
    * path, so the result is hash-identical to the direct operator's. */
  def serveBm25(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, idCol: String = "doc_id", qidCol: String = "qid",
      qtextCol: String = "qtext"): Option[DataFrame] =
    readMeta(spark, root).map { m =>
      val nB = m.get("nBuckets").asInt()
      val post = spark.read.parquet(indexPath(root))
      val lengths = spark.read.parquet(lengthsPath(root))
      val qt = queries
        .select(explode(TextFunctions.tokens(col(qtextCol)))
          .as("term"))
        .distinct()
        .withColumn("tb", pmod(hash(col("term")), lit(nB)))
      val tf = post.join(qt, Seq("tb", "term"))
        .groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("tf"))
      Retrieval.bm25FromPostings(tf, lengths, queries, k,
        idCol, qidCol, qtextCol)
    }

  /** Serve exact phrase search from the persisted index — None when
    * untrusted (caller falls back to [[Retrieval.phraseSearch]]).
    * Phrase terms are literals, so the bucket filter prunes the
    * partition listing at PLANNING time; the consecutive-position
    * fold is the shared [[Retrieval.phraseSearchFromPostings]]. */
  def servePhrase(spark: SparkSession, root: String,
      phrase: Seq[String], idCol: String = "doc_id")
      : Option[DataFrame] =
    readMeta(spark, root).map { m =>
      require(phrase.nonEmpty, "phrase needs at least one term")
      val nB = m.get("nBuckets").asInt()
      val tbs = bucketsOf(spark, phrase.distinct, nB)
      val post = spark.read.parquet(indexPath(root))
        .filter(col("tb").isin(tbs: _*) &&
          col("term").isin(phrase.distinct: _*))
        .select(col(idCol), col("pos"), col("term"))
      Retrieval.phraseSearchFromPostings(post, phrase, idCol)
    }
}
