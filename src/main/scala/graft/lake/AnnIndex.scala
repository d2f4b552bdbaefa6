package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Lifecycle manager for the persisted ANN indexes (e10's SRP buckets,
  * e11's IVF cells) under delta ingest — the missing maintenance story
  * the build-once indexes had: a delta append used to leave them
  * silently stale. Same dirty/trust discipline as the `_keys`/
  * `_shingles`/`_stats` sidecars:
  *
  *  - `_ann.json` is the trust marker AND the parameter record (plane
  *    seed/bits/tables for SRP, cell count for IVF) — serving always
  *    uses the STORED parameters, so a caller cannot probe with
  *    mismatched planes.
  *  - an append drops the marker, lands ONLY the new batch's index rows
  *    (SRP: the batch re-buckets from the seeded planes — vectors are
  *    bucketed independently, so append-maintained == from-scratch
  *    rebuilt, row for row; IVF: the batch is assigned to the STORED
  *    pivots — the FAISS `add` contract: centroids stay fixed between
  *    retrains, so cell boundaries never shift under ingest), then
  *    restores the marker.
  *  - a crash between the two leaves the index UNTRUSTED: [[serveSrp]]/
  *    [[serveIvf]] return None and the caller falls back to the direct
  *    operators (`srpTopK`/`ivfTopK`) — degraded cost, never a wrong
  *    answer from a half-appended index.
  *
  * e13 gates the SRP contract under the oracle (two appends == the e03
  * full-corpus answer); e14 gates IVF (bootstrap chosen by the pivot
  * rank so the stored pivots equal the union corpus's, making the
  * from-scratch e04 oracle exact). Layout: `root/index` partitioned by
  * `table` (SRP) or `cell` (IVF) so probes prune; `root/pivots` for
  * IVF's coarse quantizer.
  */
object AnnIndex {

  private val mapper = new ObjectMapper()

  private def markerPath(root: String) = new Path(root, "_ann.json")
  private def indexPath(root: String) = s"$root/index"
  private def pivotsPath(root: String) = s"$root/pivots"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def trusted(spark: SparkSession, root: String): Boolean =
    fsOf(spark, root).exists(markerPath(root))

  /** Drop only the trust marker (the dirty state an append enters). */
  def distrust(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    if (fs.exists(markerPath(root))) fs.delete(markerPath(root), false)
  }

  private def seal(spark: SparkSession, root: String, json: String): Unit = {
    val out = fsOf(spark, root).create(markerPath(root), true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(
      spark: SparkSession,
      root: String,
      kind: String
  ): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val fs = fsOf(spark, root)
    if (!fs.exists(markerPath(root))) return None
    val in = fs.open(markerPath(root))
    val node =
      try mapper.readTree(in)
      finally in.close()
    if (node.path("kind").asText() == kind) Some(node) else None
  }

  // ------------------------------------------------------------ SRP --

  def buildSrp(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nBits: Int = 8,
      nTables: Int = 3,
      seed: Long = 42L
  ): Unit = {
    distrust(spark, root)
    Similarity.buildSrpIndex(corpus, dim, idCol, vecCol, nBits, nTables,
        seed)
      .write.mode("overwrite").partitionBy("table")
      .parquet(indexPath(root))
    seal(spark, root,
      s"""{"kind":"srp","dim":$dim,"nBits":$nBits,""" +
        s""""nTables":$nTables,"seed":$seed}""")
  }

  /** Fold a delta batch in: bucket ONLY the batch's vectors (the seeded
    * planes are corpus-independent) and append. Requires a trusted
    * index — an untrusted start means a prior append crashed mid-way,
    * and blind-appending over an unknown gap could double rows; the
    * caller rebuilds instead. */
  def appendSrp(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Unit = {
    val m = readMeta(spark, root, "srp").getOrElse(throw
      new IllegalStateException(
        s"no trusted SRP index at $root — rebuild with buildSrp"))
    distrust(spark, root)
    Similarity.buildSrpIndex(batch, m.get("dim").asInt(), idCol, vecCol,
        m.get("nBits").asInt(), m.get("nTables").asInt(),
        m.get("seed").asLong())
      .write.mode("append").partitionBy("table")
      .parquet(indexPath(root))
    seal(spark, root, mapper.writeValueAsString(m))
  }

  /** IDEMPOTENT delta fold for at-least-once delivery (commit-log
    * streams replay whole commits on checkpoint loss; a crashed
    * append leaves an unknown gap): the batch is first narrowed to
    * ids the index does NOT already hold — one keyed left_anti
    * against table 0's id set (each vector appears once per table, so
    * table 0 is the membership set) — then folded with [[appendSrp]].
    * The index's own id set IS the idempotence: no watermark file, no
    * consumed-version mark, nothing to crash out of sync. Returns the
    * count of newly-folded ids (0 on a full replay). */
  def appendSrpOnce(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Long = {
    val existing = spark.read.parquet(indexPath(root))
      .filter(col("table") === 0)
      .select(col("vec_id").as(idCol))
    val fresh = batch
      .join(existing, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val n = fresh.count()
    if (n > 0) appendSrp(spark, root, fresh, idCol, vecCol)
    n
  }

  /** Serve top-k from the maintained index with its STORED parameters —
    * None when untrusted (caller falls back to the direct operator). */
  def serveSrp(
      spark: SparkSession,
      root: String,
      queries: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Option[DataFrame] =
    readMeta(spark, root, "srp").map { m =>
      Similarity.srpTopKFromIndex(
        spark.read.parquet(indexPath(root)), queries,
        m.get("dim").asInt(), idCol, vecCol, k,
        m.get("nBits").asInt(), m.get("nTables").asInt(),
        m.get("seed").asLong())
    }

  // ------------------------------------------------------------ IVF --

  def buildIvf(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16
  ): Unit = {
    distrust(spark, root)
    val (pivots, assigned) =
      Similarity.buildIvfIndex(corpus, idCol, vecCol, nCells)
    pivots.write.mode("overwrite").parquet(pivotsPath(root))
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(indexPath(root))
    seal(spark, root, s"""{"kind":"ivf","nCells":$nCells}""")
  }

  /** Fold a delta batch in: assign ONLY the batch's vectors to the
    * STORED pivots (cell boundaries never shift under ingest) and
    * append to the assignment. */
  def appendIvf(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Unit = {
    val m = readMeta(spark, root, "ivf").getOrElse(throw
      new IllegalStateException(
        s"no trusted IVF index at $root — rebuild with buildIvf"))
    distrust(spark, root)
    val parr = spark.read.parquet(pivotsPath(root))
      .select("cell", "emb", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    Similarity.assignCells(
        Similarity.prep(batch, idCol, vecCol), parr, 1)
      .select("cell", "vec_id", "emb", "nrm")
      .write.mode("append").partitionBy("cell")
      .parquet(indexPath(root))
    seal(spark, root, mapper.writeValueAsString(m))
  }

  def serveIvf(
      spark: SparkSession,
      root: String,
      queries: DataFrame,
      k: Int = 5,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Option[DataFrame] =
    readMeta(spark, root, "ivf").map { _ =>
      Similarity.ivfTopKFromIndex(
        spark.read.parquet(pivotsPath(root)),
        spark.read.parquet(indexPath(root)),
        queries, idCol, vecCol, k, nProbe)
    }

  // ------------------------------------------------------------- PQ --

  private def readPivots(spark: SparkSession, root: String)
      : Array[(Long, Seq[Double], Double)] =
    spark.read.parquet(pivotsPath(root))
      .select("cell", "emb", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)

  /** Persist the product-quantization serving index: subspace codebooks
    * (the hash-stratified pivots e16 trains from) to `pivots/`, and the
    * corpus as CODES ONLY — `m` longs a vector, the `dim·8/m`-fold
    * compressed at-rest form — to `index/`. Reconstruction is
    * serve-time decode against the stored codebooks, so the index never
    * materializes full-precision vectors. */
  def buildPq(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 32,
      nCents: Int = 32
  ): Unit = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    distrust(spark, root)
    val v = Similarity.prep(corpus, idCol, vecCol)
    val pivots = Similarity.pivotSet(v, nCents)
    import spark.implicits._
    pivots.toSeq.toDF("cell", "emb", "nrm")
      .write.mode("overwrite").parquet(pivotsPath(root))
    Similarity.pqEncode(v, pivots, dim, m)
      .select("id2", "codes2")
      .write.mode("overwrite").parquet(indexPath(root))
    seal(spark, root,
      s"""{"kind":"pq","dim":$dim,"m":$m,"nCents":$nCents}""")
  }

  /** Fold a delta batch in: encode ONLY the batch against the STORED
    * codebooks (the FAISS `add` contract again — codebooks stay fixed
    * between retrains, so codes never shift under ingest) and append
    * the codes. */
  def appendPq(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Unit = {
    val meta = readMeta(spark, root, "pq").getOrElse(throw
      new IllegalStateException(
        s"no trusted PQ index at $root — rebuild with buildPq"))
    distrust(spark, root)
    Similarity.pqEncode(
        Similarity.prep(batch, idCol, vecCol),
        readPivots(spark, root),
        meta.get("dim").asInt(), meta.get("m").asInt())
      .select("id2", "codes2")
      .write.mode("append").parquet(indexPath(root))
    seal(spark, root, mapper.writeValueAsString(meta))
  }

  /** Serve ADC top-k from the codes-only index with its STORED
    * codebooks — None when untrusted (caller falls back to the direct
    * [[Similarity.pqTopK]]). */
  def servePq(
      spark: SparkSession,
      root: String,
      queries: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Option[DataFrame] =
    readMeta(spark, root, "pq").map { meta =>
      Similarity.pqTopKFromIndex(
        spark.read.parquet(indexPath(root)),
        readPivots(spark, root), queries,
        meta.get("dim").asInt(), meta.get("m").asInt(),
        idCol, vecCol, k)
    }

  // --------------------------------------------- residual IVF-PQ ----

  private def coarsePath(root: String) = s"$root/coarse"

  /** Persist the RESIDUAL IVF-PQ serving index (true IVFADC at rest):
    * the coarse quantizer to `coarse/`, the pq pivot table to
    * `pivots/` (the residual codebook re-derives from the two tables
    * bit-for-bit — [[Similarity.residualCodebook]] is exact driver
    * arithmetic, so nothing derived needs separate storage), and
    * `(cell, id2, codes2)` rows — m bytes of codes plus a cell id per
    * vector, the compressed at-rest form — cell-partitioned so probed
    * cells prune at the file level. */
  def buildPqResidual(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 32,
      nCents: Int = 32,
      nCells: Int = 16
  ): Unit = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    distrust(spark, root)
    val v = Similarity.prep(corpus, idCol, vecCol)
    val coarse = Similarity.pivotSet(v, nCells)
    val pqPivots = Similarity.pivotSet(v, nCents)
    import spark.implicits._
    coarse.toSeq.toDF("cell", "emb", "nrm")
      .write.mode("overwrite").parquet(coarsePath(root))
    pqPivots.toSeq.toDF("cell", "emb", "nrm")
      .write.mode("overwrite").parquet(pivotsPath(root))
    Similarity.ivfPqResidualEncode(v, coarse, pqPivots, dim, m)
      .select("cell", "id2", "codes2")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(indexPath(root))
    seal(spark, root,
      s"""{"kind":"pqres","dim":$dim,"m":$m,"nCents":$nCents,""" +
        s""""nCells":$nCells}""")
  }

  /** Fold a delta batch in: cells assigned from the STORED coarse
    * quantizer, residuals encoded against the STORED codebook (FAISS
    * `add` — nothing retrains under ingest, so existing codes never
    * shift), only the batch's rows land. */
  def appendPqResidual(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Unit = {
    val meta = readMeta(spark, root, "pqres").getOrElse(throw
      new IllegalStateException(
        s"no trusted residual-PQ index at $root — rebuild first"))
    distrust(spark, root)
    Similarity.ivfPqResidualEncode(
        Similarity.prep(batch, idCol, vecCol),
        readCoarse(spark, root), readPivots(spark, root),
        meta.get("dim").asInt(), meta.get("m").asInt())
      .select("cell", "id2", "codes2")
      .write.mode("append").partitionBy("cell")
      .parquet(indexPath(root))
    seal(spark, root, mapper.writeValueAsString(meta))
  }

  /** Serve IVFADC top-k from the codes-only residual index — None when
    * untrusted (caller falls back to the direct
    * [[Similarity.ivfPqResidualTopK]]). */
  def servePqResidual(
      spark: SparkSession,
      root: String,
      queries: DataFrame,
      k: Int = 5,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Option[DataFrame] =
    readMeta(spark, root, "pqres").map { meta =>
      Similarity.ivfPqResidualTopKFromIndex(
        spark.read.parquet(indexPath(root)),
        readCoarse(spark, root), readPivots(spark, root), queries,
        meta.get("dim").asInt(), meta.get("m").asInt(),
        idCol, vecCol, k, nProbe)
    }

  private def readCoarse(spark: SparkSession, root: String)
      : Array[(Long, Seq[Double], Double)] =
    spark.read.parquet(coarsePath(root))
      .select("cell", "emb", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)

  // -------------------------------------------------------- Hamming --

  /** Persist the sign-binarized Hamming serving index: ONE 64-bit
    * signature per vector (`id2`, `sig2`) — 8 bytes a vector, the
    * index e17 describes, materialized. No trained parameters beyond
    * `dim`, so append-maintained rows are definitionally identical to
    * a from-scratch rebuild's. */
  def buildHamming(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Unit = {
    require(dim <= 64, "Hamming signatures pack into one 64-bit word")
    distrust(spark, root)
    Similarity.hammingSig(corpus, idCol, vecCol, dim, "id2", "sig2")
      .write.mode("overwrite").parquet(indexPath(root))
    seal(spark, root, s"""{"kind":"hamming","dim":$dim}""")
  }

  def appendHamming(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Unit = {
    val meta = readMeta(spark, root, "hamming").getOrElse(throw
      new IllegalStateException(
        s"no trusted Hamming index at $root — rebuild with buildHamming"))
    distrust(spark, root)
    Similarity.hammingSig(batch, idCol, vecCol,
        meta.get("dim").asInt(), "id2", "sig2")
      .write.mode("append").parquet(indexPath(root))
    seal(spark, root, mapper.writeValueAsString(meta))
  }

  // ------------------------------------- idempotent delta folds -----

  /** The e30 idempotence pattern, shared by every maintained resident:
    * narrow the batch to ids the index does NOT already hold (one
    * keyed left_anti against the index's own id set — no watermark
    * file, no consumed-version mark, nothing to crash out of sync),
    * then fold. What [[CommitLog.readStreamCommits]] consumers call so
    * at-least-once commit delivery (checkpoint loss, replays) becomes
    * exactly-once index maintenance. Returns newly-folded ids (0 on a
    * full replay). */
  private def foldOnce(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String,
      indexIdCol: String,
      fold: DataFrame => Unit
  ): Long = {
    val existing = spark.read.parquet(indexPath(root))
      .select(col(indexIdCol).as(idCol)).distinct()
    val fresh = batch
      .join(existing, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val n = fresh.count()
    if (n > 0) fold(fresh)
    n
  }

  /** Idempotent [[appendPq]] (commit-log stream maintenance). */
  def appendPqOnce(
      spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    foldOnce(spark, root, batch, idCol, "id2",
      f => appendPq(spark, root, f, idCol, vecCol))

  /** Idempotent [[appendIvf]]. */
  def appendIvfOnce(
      spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    foldOnce(spark, root, batch, idCol, "vec_id",
      f => appendIvf(spark, root, f, idCol, vecCol))

  /** Idempotent [[appendPqResidual]]. */
  def appendPqResidualOnce(
      spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    foldOnce(spark, root, batch, idCol, "id2",
      f => appendPqResidual(spark, root, f, idCol, vecCol))

  /** Idempotent [[appendHamming]]. */
  def appendHammingOnce(
      spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    foldOnce(spark, root, batch, idCol, "id2",
      f => appendHamming(spark, root, f, idCol, vecCol))

  def serveHamming(
      spark: SparkSession,
      root: String,
      queries: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Option[DataFrame] =
    readMeta(spark, root, "hamming").map { meta =>
      Similarity.hammingTopKFromIndex(
        spark.read.parquet(indexPath(root)), queries,
        meta.get("dim").asInt(), idCol, vecCol, k)
    }
}
