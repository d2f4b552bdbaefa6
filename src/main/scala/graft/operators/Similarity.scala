package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact baseline — broadcast the (small) query set
  *   against the corpus; one pass, no corpus shuffle. Per-vector norms are
  *   precomputed once, not per pair.
  * - `srpTopK`: the scale path — sign-random-projection LSH buckets the
  *   corpus (one shuffle on bucket id); candidates are only same-bucket
  *   (or near-bucket via multi-probe) pairs.
  * - `ivfTopK`: IVF-style variant — k centroid "pivots" chosen
  *   deterministically, vectors assigned to nearest pivot, queries probe
  *   the `nProbe` nearest cells.
  */
object Similarity {

  /** Normalize: vec_id, emb (double), nrm. */
  private[graft] def prep(emb: DataFrame, idCol: String, vecCol: String) =
    emb.select(
      col(idCol).as("vec_id"),
      asDouble(col(vecCol)).as("emb")
    ).withColumn("nrm", norm(col("emb")))

  /** Exact cosine top-k for each query vector. The query side is expected
    * to be small (it is broadcast); the corpus is scanned once. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5
  ): DataFrame = {
    val c = prep(corpus, idCol, vecCol)
      .select(col("vec_id").as("id2"), col("emb").as("emb2"),
        col("nrm").as("n2"))
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"))
    val w = Window.partitionBy("id1")
      .orderBy(col("sim").desc, col("id2").asc)
    broadcast(q)
      .join(c, col("id1") =!= col("id2"))
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "sim", "rank")
  }

  /** Left/right sides of the block-grid pair space, each carrying the
    * composite join key (`bx`, `by`). A vector in block g lands on the
    * left as keys (g, 0..nBlocks-1) and on the right as keys
    * (0..nBlocks-1, g), so the pair (x, y) meets at EXACTLY one key:
    * (block(x), block(y)). Package-private so SimilaritySpec can assert
    * the key spread directly. */
  private[graft] def blockGridSides(
      v: DataFrame,
      leftIdBound: Long,
      nBlocks: Int
  ): (DataFrame, DataFrame) = {
    val rep = explode(sequence(lit(0L), lit(nBlocks - 1L)))
    val a = v.select(col("vec_id").as("id1"), col("emb").as("emb1"),
      col("nrm").as("n1")).filter(col("id1") < leftIdBound)
      .withColumn("bx", pmod(xxhash64(col("id1")), lit(nBlocks.toLong)))
      .withColumn("by", rep)
    val b = v.select(col("vec_id").as("id2"), col("emb").as("emb2"),
      col("nrm").as("n2"))
      .withColumn("bx", rep)
      .withColumn("by", pmod(xxhash64(col("id2")), lit(nBlocks.toLong)))
    (a, b)
  }

  /** Triangular block-grid sides: pairs are UNORDERED, so only keys with
    * bx <= by need to exist — a vector in block g covers keys (g, g..B-1)
    * on the left and (0..g, g) on the right. A pair with blocks gx < gy
    * meets at exactly one key, (gx, gy), in exactly one orientation
    * (block-smaller vector on the left — which may be the LARGER id;
    * callers normalize output ids). Same-block pairs meet at the diagonal
    * key (g, g) in both orientations (callers keep id1 < id2 there).
    * Combined replication is nVecs·(B+1) — HALF the full grid's 2·nVecs·B
    * shuffle volume — over B(B+1)/2 reducer keys, the same per-key work
    * quantum (two blocks' vectors). Package-private for SimilaritySpec. */
  private[graft] def triangularGridSides(
      v: DataFrame,
      nBlocks: Int
  ): (DataFrame, DataFrame) = {
    val g = pmod(xxhash64(col("vec_id")), lit(nBlocks.toLong))
    val a = v.withColumn("bx", g)
      .withColumn("by", explode(sequence(col("bx"), lit(nBlocks - 1L))))
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"), col("bx"), col("by"))
    val b = v.withColumn("by", g)
      .withColumn("bx", explode(sequence(lit(0L), col("by"))))
      .select(col("vec_id").as("id2"), col("emb").as("emb2"),
        col("nrm").as("n2"), col("bx"), col("by"))
    (a, b)
  }

  /** All near pairs above a cosine threshold — exact, but never planned as
    * a cartesian/nested-loop join. Each vector is hashed into one of
    * `nBlocks` blocks and the pair space is keyed on the COMPOSITE block
    * id (bx, by). Exact all-pairs is inherently |A|·|B| comparisons; this
    * spreads that work evenly over keyed shuffle partitions — no
    * driver-side or single-task nested loop, no broadcast of the corpus.
    * Raise `nBlocks` with the cluster.
    *
    * Two grid shapes, picked by `leftIdBound`:
    *  - unbounded (the full self-pairs case — embedding dedup at corpus
    *    scale): TRIANGULAR grid ([[triangularGridSides]]) — pairs are
    *    unordered, so only the bx <= by half of the key space carries
    *    work; combined shuffle volume is nVecs·(nBlocks+1), half the full
    *    grid's, at the same per-key work quantum.
    *  - bounded (sampled audits): asymmetric FULL grid
    *    ([[blockGridSides]]) — the id1 < leftIdBound prune happens
    *    BEFORE the shuffle, which beats halved replication whenever the
    *    sample is small (the triangular orientation is block-driven, so
    *    it cannot pre-prune an id-defined side). */
  def cosinePairs(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.4,
      leftIdBound: Long = Long.MaxValue,
      nBlocks: Int = 16
  ): DataFrame = {
    val v = prep(emb, idCol, vecCol)
    if (leftIdBound == Long.MaxValue) {
      val (a, b) = triangularGridSides(v, nBlocks)
      a.join(b, Seq("bx", "by"))
        // off-diagonal keys carry exactly one orientation of each pair
        // (and no self-pairs) — keep it regardless of id order; diagonal
        // keys carry both orientations plus self-pairs — keep id1 < id2
        .filter(col("bx") =!= col("by") || col("id1") < col("id2"))
        .withColumn("sim",
          cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
        .filter(col("sim") >= threshold)
        .select(least(col("id1"), col("id2")).as("id1"),
          greatest(col("id1"), col("id2")).as("id2"), col("sim"))
    } else {
      // The left filter is asymmetric (id1 < leftIdBound), so a qualifying
      // pair {x,y} is generated exactly once, as the tuple (x in a, y in b)
      // — the id1 < id2 filter then dedupes the diagonal.
      val (a, b) = blockGridSides(v, leftIdBound, nBlocks)
      a.join(b, Seq("bx", "by"))
        .filter(col("id1") < col("id2"))
        .withColumn("sim",
          cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
        .filter(col("sim") >= threshold)
        .select("id1", "id2", "sim")
    }
  }

  /** Auto bucket-count knob: enough sign bits that expected bucket
    * occupancy stays ~`targetPerBucket` as the corpus grows. A FIXED
    * bucket count is a hidden quadratic — same-bucket pair work grows as
    * (n / 2^nBits)² per bucket, so the bucket count must scale with n
    * (measured: fixed 16 buckets gave 8.5× time at 4× data; auto-bits
    * restores ~linear). The floor of 4 keeps small corpora meaningfully
    * bucketed. Raising nBits lowers per-pair recall (p^nBits); at scale
    * compensate with nTables — the standard LSH time/recall dial. */
  def autoSrpBits(nVecs: Long, targetPerBucket: Int = 32): Int = {
    val buckets = math.max(1.0, nVecs.toDouble / targetPerBucket)
    math.max(4, math.ceil(math.log(buckets) / math.log(2.0)).toInt)
  }

  /** All candidate pairs above a cosine threshold via SRP-LSH
    * self-bucketing — the scale path for embedding near-dup detection
    * (the exact variant is [[cosinePairs]], inherently |A|² work):
    * candidates are same-(table, bucket) pairs only — ONE shuffle keyed
    * on (table, bucket), never all-pairs — then exactly scored and
    * thresholded. Deterministic (fixed planes from `seed`), so the whole
    * operator is oracle-verifiable cross-engine.
    *
    * `nBits = -1` (default) derives the bucket count from the corpus
    * size ([[autoSrpBits]] — one count() action up front) so occupancy
    * stays bounded as data grows; pass an explicit value to pin the
    * plane set (the e05 oracle pins 4, which auto reproduces at the
    * fixture size).
    *
    * Recall is the standard LSH bound `1 - (1 - p^nBits)^nTables` with
    * `p = 1 - θ/π`: for true near-dups (sim >= 0.9) a few tables reach
    * ~0.9+; at looser thresholds raise nTables / lower nBits
    * (SimilaritySpec measures recall vs the exact pair set). */
  def srpNearPairs(
      emb: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      nBits: Int = -1,
      nTables: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val bits = if (nBits > 0) nBits else autoSrpBits(emb.count())
    val v = prep(emb, idCol, vecCol)
    def withBuckets(idAs: String, embAs: String, nAs: String) =
      v.select(
        col("vec_id").as(idAs), col("emb").as(embAs), col("nrm").as(nAs),
        posexplode(array((0 until nTables).map(t =>
          srpBucket(col("emb"), dim, bits, seed + t)): _*))
          .as(Seq("table", "bucket")))
    withBuckets("id1", "emb1", "n1")
      .join(withBuckets("id2", "emb2", "n2"), Seq("table", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "emb1", "n1", "id2", "emb2", "n2")
      .dropDuplicates("id1", "id2") // score each candidate pair once
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }

  /** Incremental ingest-vs-corpus embedding near-dup scoring — the
    * e-series analog of `Dedup.incrementalJaccardPairs` (d15), and the
    * scorer behind `WriteMode.DeltaSemantic`: candidates are
    * same-(table, bucket) NEW × EXISTING pairs only (never within either
    * side) — one shuffle keyed on (table, bucket), then exactly scored
    * and thresholded. Cost scales with the batch, not |corpus|²;
    * `nBits = -1` derives the bucket count from the COMBINED corpus size
    * ([[autoSrpBits]]) so occupancy stays bounded as the lake grows.
    * Returns (id_new, id_existing, sim) with sim >= threshold. */
  def incrementalSrpNearPairs(
      newDf: DataFrame,
      existingDf: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      nBits: Int = -1,
      nTables: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val bits =
      if (nBits > 0) nBits
      else autoSrpBits(newDf.count() + existingDf.count())
    def withBuckets(
        df: DataFrame, idAs: String, embAs: String, nAs: String) =
      prep(df, idCol, vecCol).select(
        col("vec_id").as(idAs), col("emb").as(embAs), col("nrm").as(nAs),
        posexplode(array((0 until nTables).map(t =>
          srpBucket(col("emb"), dim, bits, seed + t)): _*))
          .as(Seq("table", "bucket")))
    withBuckets(newDf, "id_new", "emb1", "n1")
      .join(withBuckets(existingDf, "id_existing", "emb2", "n2"),
        Seq("table", "bucket"))
      .select("id_new", "emb1", "n1", "id_existing", "emb2", "n2")
      .dropDuplicates("id_new", "id_existing") // score each pair once
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .filter(col("sim") >= threshold)
      .select("id_new", "id_existing", "sim")
  }

  /** LSH-bucketed ANN: corpus and queries hashed into `nTables`
    * independent SRP hash tables (seed + t); candidates are same-bucket
    * pairs in ANY table, deduped, then exactly scored and ranked. The
    * join is keyed on (table, bucket) — one shuffle, never all-pairs.
    * Recall grows as 1-(1-p^nBits)^nTables; tune nBits (bucket
    * selectivity) against nTables (probes) for the corpus. */
  /** int8 image of a vector frame in [[prep]]'s shape: emb = the
    * quantized components AS DOUBLES (exact small integers — dots,
    * norms, and SRP bucket signs over them are integer-exact and
    * engine-reproducible), nrm = their norm. The ANN memory/shuffle
    * diet: 4× smaller vectors end to end, scores are cosines of the
    * quantized vectors (scale cancels — cosine is scale-invariant per
    * vector). */
  private def prepQuantized(
      emb: DataFrame, idCol: String, vecCol: String) =
    emb.select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("__raw"))
      .withColumn("__scale", maxAbs(col("__raw")))
      .withColumn("emb",
        transform(scalarQuantize(col("__raw"), col("__scale")),
          _.cast("double")))
      .withColumn("nrm", norm(col("emb")))
      .select("vec_id", "emb", "nrm")

  private def srpWithBuckets(
      df: DataFrame, idAs: String, embAs: String, nAs: String,
      dim: Int, nBits: Int, nTables: Int, seed: Long) =
    df.select(
      col("vec_id").as(idAs), col("emb").as(embAs), col("nrm").as(nAs),
      posexplode(array((0 until nTables).map(t =>
        srpBucket(col("emb"), dim, nBits, seed + t)): _*))
        .as(Seq("table", "bucket")))

  /** The shared tail of every SRP top-k: candidate equi-join on
    * (table, bucket), dedup candidate pairs, exact cosine rerank,
    * WindowGroupLimit-able per-query rank<=k. */
  private def srpScoreTail(q: DataFrame, c: DataFrame, k: Int)
      : DataFrame = {
    val w = Window.partitionBy("id1")
      .orderBy(col("sim").desc, col("id2").asc)
    q.join(c, Seq("table", "bucket"))
      .filter(col("id1") =!= col("id2"))
      .select("id1", "emb1", "n1", "id2", "emb2", "n2")
      .dropDuplicates("id1", "id2") // score each candidate pair once
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "sim", "rank")
  }

  def srpTopK(
      corpus: DataFrame,
      queries: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nBits: Int = 8,
      nTables: Int = 3,
      seed: Long = 42L,
      quantized: Boolean = false
  ): DataFrame = {
    def prepped(df: DataFrame) =
      if (quantized) prepQuantized(df, idCol, vecCol)
      else prep(df, idCol, vecCol)
    val c = srpWithBuckets(prepped(corpus), "id2", "emb2", "n2",
      dim, nBits, nTables, seed)
    val q = srpWithBuckets(prepped(queries), "id1", "emb1", "n1",
      dim, nBits, nTables, seed)
    srpScoreTail(q, c, k)
  }

  /** Two-stage serving ANN (the quantize-then-rerank production
    * pattern): stage 1 shortlists `shortlist` candidates per query over
    * the int8-QUANTIZED vectors (SRP buckets + integer-exact coarse
    * cosine — 4× less vector bytes through the candidate join), stage 2
    * re-scores ONLY the shortlist against the full-precision vectors
    * and emits the exact-cosine top `k`. Cheap index, exact final
    * scores — quantization error can reorder the shortlist's tail but
    * never the reported similarity values.
    *
    * 100 TB shape: the shortlist frame is |queries| × shortlist rows —
    * it broadcasts into the full-precision corpus scan, so stage 2 is a
    * broadcast semi-join-shaped probe (no corpus shuffle) followed by
    * the tiny per-query window. The corpus never materializes both
    * precisions at once. */
  def srpTopKReranked(
      corpus: DataFrame,
      queries: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      shortlist: Int = 20,
      nBits: Int = 8,
      nTables: Int = 3,
      seed: Long = 42L
  ): DataFrame = {
    val short = srpTopK(corpus, queries, dim, idCol, vecCol,
        k = shortlist, nBits = nBits, nTables = nTables, seed = seed,
        quantized = true)
      .select("id1", "id2")
    val c = prep(corpus, idCol, vecCol)
      .select(col("vec_id").as("id2"), col("emb").as("emb2"),
        col("nrm").as("n2"))
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"))
    val w = Window.partitionBy("id1")
      .orderBy(col("sim").desc, col("id2").asc)
    c.join(broadcast(short), "id2")
      .join(broadcast(q), "id1")
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "sim", "rank")
  }

  /** Materialize the SRP index as a plain DataFrame — one row per
    * (table, bucket, vec_id, emb, nrm) — ready to persist to the lake
    * (partition or bucket it by `table`/`bucket` so query-time probes
    * prune). Building once and re-reading replaces the corpus-side
    * bucket computation of every later query: at 100 TB the index is
    * written once per corpus version and each query batch touches only
    * its buckets' files. */
  def buildSrpIndex(
      corpus: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nBits: Int = 8,
      nTables: Int = 3,
      seed: Long = 42L
  ): DataFrame =
    srpWithBuckets(prep(corpus, idCol, vecCol), "vec_id", "emb", "nrm",
      dim, nBits, nTables, seed)
      .select("table", "bucket", "vec_id", "emb", "nrm")

  /** Serve top-k from a persisted [[buildSrpIndex]] table: queries
    * compute their buckets with the SAME planes (dim/nBits/nTables/seed
    * must match the build) and probe the index — the corpus is never
    * re-bucketed, and bucket-partitioned storage turns the probe into a
    * pruned scan. Results are identical to [[srpTopK]] by construction
    * (e10 proves it under the oracle). */
  def srpTopKFromIndex(
      index: DataFrame,
      queries: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nBits: Int = 8,
      nTables: Int = 3,
      seed: Long = 42L
  ): DataFrame = {
    val c = index.select(col("table"), col("bucket"),
      col("vec_id").as("id2"), col("emb").as("emb2"), col("nrm").as("n2"))
    val q = srpWithBuckets(prep(queries, idCol, vecCol),
      "id1", "emb1", "n1", dim, nBits, nTables, seed)
    srpScoreTail(q, c, k)
  }

  /** Hash rank for stratified pivot sampling: offset then TWO MINSTD
    * (Lehmer, ×48271 mod 2^31-1) rounds. One round is order-preserving
    * on small consecutive ids (no wrap until id ≈ 44k — "lowest k ranks"
    * would be the lowest k ids again); after the second round the
    * effective stride is 48271² mod p ≈ 1.83e8, which wraps within any
    * ~dozen consecutive ids, so clustered id ranges land on scattered
    * ranks. Still a bijection (composition of a shift and two coprime
    * multiplications), arithmetic stays below 2^62 (ANSI-overflow-safe)
    * and is expressible verbatim in any SQL engine, so the e04 oracle
    * reproduces the exact pivot set (xxhash64 would not be portable). */
  /** Per-label centroid outliers (CleanLab/SemDeDup-style curation):
    * rank each vector by cosine against its label's centroid and keep
    * the `k` LEAST aligned per label — the mislabeled/noise candidates a
    * training-data pipeline reviews or drops.
    *
    * Cross-engine exactness: float means are order-sensitive (a
    * distributed sum re-associates, so no hash-reproducible oracle), so
    * the centroid is computed over int8-quantized components
    * (`scalarQuantize`, fixed unit scale — embeddings are unit-normed so
    * components are within [-1, 1]). Integer sums are exact and
    * order-independent, and cosine is scale-invariant, so scoring
    * against the raw per-(label, pos) SUM vector equals scoring against
    * the mean — no division, no float accumulation anywhere across rows.
    * Per-row dot products stay sequential left-folds (DotProductExpr =
    * DuckDB `list_reduce` order), the proven e01 convention.
    *
    * 100 TB shape: one posexplode + keyed partial agg at (label, pos)
    * width for the centroids (map-side combine does the heavy lifting;
    * nLabels × dim reducer keys), centroids re-assembled driver-free and
    * broadcast (nLabels rows), then one corpus scan scores every vector
    * — the rank<=k filter triggers WindowGroupLimit, so each task
    * forwards at most k rows per label to the per-label window. */
  def centroidOutliers(
      emb: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      labelCol: String = "label",
      vecCol: String = "embedding",
      quantRange: Int = 127
  ): DataFrame = {
    val q = emb.select(
      col(idCol).as("vec_id"),
      col(labelCol).as("label"),
      scalarQuantize(asDouble(col(vecCol)), lit(1.0), quantRange).as("qv"))
    val cent = q
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum("v").as("s"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("label"),
        transform(col("ps"), p => p.getField("s").cast("double")).as("cv"))
    val scored = q
      .join(broadcast(cent), "label")
      .withColumn("qd", transform(col("qv"), _.cast("double")))
      .withColumn("cos_centroid", cosine(col("qd"), col("cv")))
    val w = Window.partitionBy("label")
      .orderBy(col("cos_centroid").asc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "label", "cos_centroid", "rank")
  }

  private[graft] def pivotRank(id: Column): Column = {
    val p = lit(2147483647L)
    val r1 = pmod((pmod(id, p) + lit(1000003L)) * lit(48271L), p)
    pmod(r1 * lit(48271L), p)
  }

  /** The `nCells` pivots, hash-stratified: rank every vector by
    * [[pivotRank]] and take the lowest `nCells` ranks (id tie-break).
    * Deterministic and oracle-reproducible, but corpus-representative —
    * lowest-ID pivots are arbitrary: ingestion orders cluster ids
    * (crawl batches, shard order), so id-prefix pivots land in one
    * region of the space and produce unbalanced probe lists at scale.
    * One TakeOrderedAndProject over the corpus (top-k, no full sort). */
  private[graft] def pivotSet(
      v: DataFrame,
      nCells: Int,
      stratified: Boolean = true
  ): Array[(Long, Seq[Double], Double)] = {
    val ordered =
      if (stratified)
        v.orderBy(pivotRank(col("vec_id")).asc, col("vec_id").asc)
      else v.orderBy("vec_id")
    ordered.limit(nCells)
      .select(col("vec_id"), col("emb"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
  }

  /** Nearest-pivot cell assignment (`keep` cells per vector): argmax over
    * literal pivot vectors — a pure projection, whole-stage codegen'd, no
    * join and no shuffle over the corpus (a windowed-rank assignment
    * would shuffle all of it). */
  private[graft] def assignCells(
      df: DataFrame,
      pivots: Array[(Long, Seq[Double], Double)],
      keep: Int
  ): DataFrame = {
    val scored = array(pivots.map { case (cell, pv, pn) =>
      struct(
        cosine(col("emb"), typedLit(pv), col("nrm"), lit(pn)).as("psim"),
        lit(cell).as("cell"))
    }: _*)
    // psim desc, cell asc — same tie-break as a row_number window
    val ranked = array_sort(scored, (l, r) =>
      when(l("psim") > r("psim"), -1)
        .when(l("psim") < r("psim"), 1)
        .when(l("cell") < r("cell"), -1)
        .when(l("cell") > r("cell"), 1)
        .otherwise(0))
    df.withColumn("cellrec", explode(slice(ranked, 1, keep)))
      .withColumn("cell", col("cellrec")("cell"))
      .drop("cellrec")
  }

  /** IVF-style ANN: `nCells` pivot vectors sampled deterministically from
    * the corpus (hash-stratified — [[pivotSet]]); every vector is
    * assigned to its nearest pivot; queries probe `nProbe` nearest cells.
    * At scale the pivot set is a broadcast (cells << corpus). */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val v = prep(corpus, idCol, vecCol)
    // The pivot set is bounded by nCells (cells << corpus), so it lives on
    // the driver and cell assignment is a pure projection.
    val pivots = pivotSet(v, nCells)
    def assign(df: DataFrame, keep: Int): DataFrame =
      assignCells(df, pivots, keep)

    val cAssigned = assign(v, 1)
      .select(col("vec_id").as("id2"), col("emb").as("emb2"),
        col("nrm").as("n2"), col("cell"))
    val qAssigned = assign(prep(queries, idCol, vecCol), nProbe)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"), col("cell"))
    ivfScoreTail(qAssigned, cAssigned, k)
  }

  /** Metadata-FILTERED ANN serving (the FAISS IDSelector / filtered
    * vector-search shape): top-k among ONLY the corpus vectors matching
    * `candidateFilter`, probed through the UNFILTERED corpus' coarse
    * quantizer — one shared index serves every predicate instead of a
    * per-predicate rebuild. PRE-filter semantics: the filter lands on
    * the candidate side before ranking (a plain pushed-down scan
    * predicate when serving from a persisted cell assignment), so k
    * survivors come back whenever the probed cells hold k matches —
    * post-filtering a vanilla top-k would silently undershoot.
    * Per-row cell assignment is independent of the filter, so results
    * equal filtering an e04-style full probe — the oracle proves it. */
  def ivfTopKFiltered(
      corpus: DataFrame,
      queries: DataFrame,
      candidateFilter: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val v = prep(corpus, idCol, vecCol)
    val pivots = pivotSet(v, nCells)
    val cAssigned =
      assignCells(prep(corpus.filter(candidateFilter), idCol, vecCol),
          pivots, 1)
        .select(col("vec_id").as("id2"), col("emb").as("emb2"),
          col("nrm").as("n2"), col("cell"))
    val qAssigned = assignCells(prep(queries, idCol, vecCol), pivots, nProbe)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"), col("cell"))
    ivfScoreTail(qAssigned, cAssigned, k)
  }

  /** ColBERT-style MaxSim late interaction (Khattab & Zaharia 2020):
    * query and document are each a GROUP of vectors; the score is
    *   score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} cos(q, d)
    * — each query vector picks its best-matching document vector, and
    * the per-query-vector maxima sum. Returns the top-k document groups
    * per query group.
    *
    * Scale shape: the (small) query-vector side broadcasts against one
    * corpus scan — the same bounded-broadcast contract as
    * [[bruteForceTopK]] (self-pairs excluded); the max is a
    * (qgroup, qvec, docgroup) agg with map-side partials, the sum folds
    * a SORTED per-group array so double addition order is fixed
    * (hash-verifiable cross-engine — a bare sum() would be
    * partition-order-dependent), and the final top-k is a per-qgroup
    * window. Nothing shuffles the corpus beyond the group agg. */
  def maxSimTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusGroupCol: String,
      queryGroupCol: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 2
  ): DataFrame = {
    val c = corpus.select(col(corpusGroupCol).as("docgroup"),
        col(idCol).as("id2"), asDouble(col(vecCol)).as("emb2"))
      .withColumn("n2", norm(col("emb2")))
    val q = queries.select(col(queryGroupCol).as("qgroup"),
        col(idCol).as("id1"), asDouble(col(vecCol)).as("emb1"))
      .withColumn("n1", norm(col("emb1")))
    val best = broadcast(q)
      .join(c, col("id1") =!= col("id2"))
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .groupBy("qgroup", "id1", "docgroup")
      .agg(max(col("sim")).as("m"))
    val scored = best
      .groupBy("qgroup", "docgroup")
      .agg(sort_array(collect_list(struct(col("id1"), col("m"))))
        .as("__ms"))
      .withColumn("score",
        aggregate(col("__ms"), lit(0.0), (acc, x) => acc + x("m")))
      .drop("__ms")
    val w = Window.partitionBy("qgroup")
      .orderBy(col("score").desc, col("docgroup").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qgroup", "docgroup", "score", "rank")
  }

  /** Mean-pooled GROUP centroids + exact-cosine centroid similarity —
    * the "document embedding from chunk embeddings" pooling step (one
    * vector per group from its members' vectors) followed by
    * group-level nearest neighbors. Pooling is a per-(group, dim)
    * integer aggregation on the e19 lattice (`floor(u·64)` per
    * component, centroid component = `floor(sum/count)` — exact
    * integer arithmetic, so the pooled vectors replay bit-identically
    * in the oracle); similarity is integer dot products with one
    * correctly-rounded sqrt per norm. Scale shape: pooling is a keyed
    * map-side-combining agg over the corpus; the pairwise stage is
    * |groups|² keyed on the dimension index — bounded by GROUP
    * cardinality, never corpus size. */
  def pooledCentroidTopK(
      emb: DataFrame,
      groupCol: String = "label",
      vecCol: String = "embedding",
      k: Int = 3
  ): DataFrame = {
    val l = emb
      .select(col(groupCol).cast("long").as("g"),
        posexplode(col(vecCol)).as(Seq("i", "u")))
      .select(col("g"), col("i"),
        floor(col("u").cast("double") * 64.0).cast("long").as("q"))
    val pooled = l.groupBy("g", "i").agg(
      floor(sum("q").cast("double") / count(lit(1))).cast("long")
        .as("v"))
    val norms = pooled.groupBy("g")
      .agg(sum(col("v") * col("v")).as("nn"))
    val dots = pooled
      .select(col("g").as("g1"), col("i"), col("v").as("v1"))
      .join(pooled.select(col("g").as("g2"), col("i"),
        col("v").as("v2")), Seq("i"))
      .filter(col("g1") =!= col("g2"))
      .groupBy("g1", "g2").agg(sum(col("v1") * col("v2")).as("dot"))
    val sim = dots
      .join(norms.select(col("g").as("g1"), col("nn").as("n1")),
        Seq("g1"))
      .join(norms.select(col("g").as("g2"), col("nn").as("n2")),
        Seq("g2"))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy("g1")
      .orderBy(col("sim").desc, col("g2").asc)
    sim.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("g1").as("label1"), col("g2").as("label2"),
        col("sim"), col("rank"))
  }

  /** The cell-keyed probe + exact rerank shared by [[ivfTopK]] and
    * [[ivfTopKFromIndex]]. No pair dedup needed: each corpus vector
    * lives in exactly one cell (`assign(v, 1)`), so (id1, id2) cannot
    * repeat across a query's probe cells. */
  private def ivfScoreTail(
      qAssigned: DataFrame,
      cAssigned: DataFrame,
      k: Int
  ): DataFrame = {
    val w = Window.partitionBy("id1")
      .orderBy(col("sim").desc, col("id2").asc)
    qAssigned.join(cAssigned, Seq("cell"))
      .filter(col("id1") =!= col("id2"))
      .withColumn("sim",
        cosine(col("emb1"), col("emb2"), col("n1"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "sim", "rank")
  }

  /** Materialize the IVF index for the lake: the pivot table
    * `(cell, emb, nrm)` — `nCells` rows, the coarse quantizer — and the
    * cell-assigned corpus `(cell, vec_id, emb, nrm)`. Persist the
    * assignment partitioned by `cell` so query-time probes prune to
    * `nProbe` cell directories; the corpus is assigned ONCE per version
    * instead of per query batch — the IVF sibling of [[buildSrpIndex]].
    * Unlike SRP (whose planes re-derive from the seed), IVF's quantizer
    * is corpus-dependent state, so the pivot table must persist
    * alongside the assignment: serving MUST use the stored pivots, or a
    * corpus append would silently shift cell boundaries. */
  def buildIvfIndex(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16
  ): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = prep(corpus, idCol, vecCol)
    val pivots = pivotSet(v, nCells)
    val pivotDf = pivots.toSeq.toDF("cell", "emb", "nrm")
    val assigned = assignCells(v, pivots, 1)
      .select("cell", "vec_id", "emb", "nrm")
    (pivotDf, assigned)
  }

  /** Serve IVF top-k from a persisted [[buildIvfIndex]] pair without
    * touching the raw corpus: queries are assigned to their `nProbe`
    * nearest stored pivots (a literal projection — the pivot table is
    * `nCells` rows, collected driver-side like the build) and probe the
    * assignment by cell. With the index partitioned by `cell`, the
    * broadcast query side triggers dynamic partition pruning: only the
    * probed cells' files are read. Results are identical to [[ivfTopK]]
    * on the same corpus by construction (e11 proves it under the
    * oracle). */
  def ivfTopKFromIndex(
      pivots: DataFrame,
      index: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nProbe: Int = 4
  ): DataFrame = {
    val parr = pivots.select("cell", "emb", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1) // assignment tie-breaks on cell id, order-free
    val qAssigned = assignCells(prep(queries, idCol, vecCol), parr, nProbe)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"), col("cell"))
    val cAssigned = index.select(col("cell"), col("vec_id").as("id2"),
      col("emb").as("emb2"), col("nrm").as("n2"))
    // queries << index: broadcasting the assigned-query side both avoids
    // shuffling the index and arms DPP on its cell partitions
    ivfScoreTail(broadcast(qAssigned), cAssigned, k)
  }

  /** Sign-binarized Hamming top-k: every embedding compresses to ONE
    * 64-bit word (bit i = sign of dimension i — the classic binary-
    * hashing baseline; ITQ/LSH papers refine the projection, the
    * serving shape is identical) and neighbor distance is
    * `bit_count(xor)` — 8 bytes a vector, a two-instruction distance.
    * The packing is a bitwise-OR fold over per-dimension single-bit
    * words (exact integer arithmetic, no additive overflow; bit 63
    * lands as Long.MinValue, which OR and XOR handle exactly), and
    * ranking ties break on id — the whole operator hash-verifies
    * against DuckDB. Queries broadcast over the packed-corpus scan
    * (the e02 shape); at 100 TB the packed column is the index you
    * keep hot — a billion vectors in 8 GB. Like e16 the reported
    * metric is the compressed space's own; callers wanting exact
    * scores rerank the shortlist like e12. */
  def hammingTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      k: Int = 5
  ): DataFrame = {
    require(dim <= 64, "hammingTopK packs into one 64-bit word")
    val cSig = hammingSig(corpus, idCol, vecCol, dim, "id2", "sig2")
    val qSig = hammingSig(queries, idCol, vecCol, dim, "id1", "sig1")
    hammingScoreTail(qSig, cSig, k)
  }

  /** The sign-binarized signature projection [[hammingTopK]] builds on —
    * also the BUILD/APPEND step of the persisted Hamming index (e27):
    * signatures depend only on the vector itself, so an appended batch's
    * rows equal what a from-scratch rebuild would produce, row for row. */
  private[graft] def hammingSig(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      idAs: String,
      sigAs: String
  ): DataFrame =
    df.select(col(idCol).as(idAs),
      aggregate(
        zip_with(
          asDouble(col(vecCol)),
          sequence(lit(0L), lit(dim - 1L)),
          (x, i) => when(x > 0.0,
            call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc.bitwiseOR(b)).as(sigAs))

  private def hammingScoreTail(
      qSig: DataFrame,
      cSig: DataFrame,
      k: Int
  ): DataFrame = {
    val w = Window.partitionBy("id1")
      .orderBy(col("hamming").asc, col("id2").asc)
    broadcast(qSig)
      .join(cSig, col("id1") =!= col("id2"))
      .withColumn("hamming",
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "hamming", "rank")
  }

  /** Serve Hamming top-k from a PERSISTED signature table (`id2`,
    * `sig2`) — the 8-bytes-a-vector at-rest index [[hammingTopK]]
    * describes, actually materialized: queries binarize on the fly and
    * broadcast over the signature scan; the corpus' full-precision
    * vectors are never read. */
  def hammingTopKFromIndex(
      sigs: DataFrame,
      queries: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5
  ): DataFrame =
    hammingScoreTail(
      hammingSig(queries, idCol, vecCol, dim, "id1", "sig1"), sigs, k)

  /** Product-quantization ANN with asymmetric-distance scoring (Jégou
    * et al. 2011): the vector space is split into `m` subspaces, each
    * corpus subvector is snapped to its nearest codebook centroid, and
    * queries score against the RECONSTRUCTION (the concatenation of
    * chosen centroids) in full precision — exactly ADC, since squared
    * L2 adds across subspaces. Codebooks are the hash-stratified pivot
    * rows' subvectors ([[pivotSet]] — the same deterministic,
    * oracle-reproducible selection IVF trains from; a production system
    * would k-means each subspace, the pipeline shape is identical).
    *
    * Encoding is a pure per-row projection against LITERAL codebooks
    * (no join, no shuffle — `m`·`nCents` argmin comparisons per vector,
    * the [[assignCells]] discipline per subspace); at rest a vector is
    * `m` small codes (here also materialized as `recon` for scoring).
    * Scoring broadcasts the (small) query side over the encoded corpus
    * scan — the e02 brute-force shape, but against vectors compressed
    * `dim·4/m`-fold; with an IVF front end the scan narrows to probed
    * cells. Ties (equal distance) break on centroid/corpus id, so
    * results are deterministic and hash-verifiable. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      m: Int = 32,
      k: Int = 5,
      nCents: Int = 32
  ): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val v = prep(corpus, idCol, vecCol)
    val encoded = pqEncode(v, pivotSet(v, nCents), dim, m)
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"))
    val w = Window.partitionBy("id1")
      .orderBy(col("adist").asc, col("id2").asc)
    import graft.functions.VectorFunctions.l2Sq
    broadcast(q)
      .join(encoded, col("id1") =!= col("id2"))
      .withColumn("adist", l2Sq(col("emb1"), col("recon2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "adist", "rank")
  }

  /** PQ encoding against literal codebooks: (id2, codes2, recon2). Per
    * subspace: argmin_{centroid} L2²(subvec, centroid), tie-break on
    * the lower cell id — `array_min` on (d, cell, cv) structs, whose
    * natural ordering IS that tie-break (codegen'd, vs an interpreted
    * array_sort comparator). The per-centroid distance is FLAT
    * element_at arithmetic against scalar literals (left-to-right sum —
    * the oracle's fold order exactly): a zip_with/aggregate formulation
    * embedded m·nCents interpreted lambdas and serialized to ~28 MB
    * task binaries. Centroid VALUES ride in the struct so the
    * reconstruction needs no second lookup. */
  private[graft] def pqEncode(
      v: DataFrame,
      pivots: Array[(Long, Seq[Double], Double)],
      dim: Int,
      m: Int
  ): DataFrame = {
    // One native kernel call per row (PqEncodeExpr). The previous
    // declarative form — array_min over m·nCents (d, cell, cv) structs
    // — was semantically identical but generated ~6000 lines of Java
    // that FAILED Janino compilation, so every encode ran interpreted
    // (~1 ms/row: the r7 e18 superlinear-scaling finding). The kernel
    // keeps the exact argmin semantics: left-to-right (e-c)² folds,
    // ties to the lower cell id.
    val cells = pivots.map(_._1)
    val cents = pivots.flatMap(_._2).toArray
    import org.apache.spark.sql.GraftSqlBridge
    val enc = GraftSqlBridge.column(graft.functions.PqEncodeExpr(
      GraftSqlBridge.expression(col("emb")), cents, cells, dim, m))
    v.withColumn("__enc", enc)
      .select(col("vec_id").as("id2"), col("emb").as("__emb2"),
        col("__enc")("codes").as("codes2"),
        col("__enc")("recon").as("recon2"))
  }

  /** ADC serving from a CODES-ONLY persisted PQ index (`id2`,
    * `codes2`) — the compressed at-rest form ([[pqEncode]]'s codes
    * without the reconstruction: `m` longs a vector, the thing a 100 TB
    * deployment actually keeps hot). Reconstruction happens inside the
    * scan via the native decode kernel against the STORED codebooks
    * (the same flattened-array reference objects the encoder rides), so
    * the serve-time plan is broadcast-queries over a codes scan — the
    * [[pqTopK]] tail exactly, and distance-identical to it because
    * decode(encode(v)) IS the reconstruction pqTopK scored against. */
  def pqTopKFromIndex(
      encoded: DataFrame,
      pivots: Array[(Long, Seq[Double], Double)],
      queries: DataFrame,
      dim: Int,
      m: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5
  ): DataFrame = {
    val cells = pivots.map(_._1)
    val cents = pivots.flatMap(_._2).toArray
    import org.apache.spark.sql.GraftSqlBridge
    val recon = GraftSqlBridge.column(graft.functions.PqDecodeExpr(
      GraftSqlBridge.expression(col("codes2")), cents, cells, dim, m))
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"))
    val w = Window.partitionBy("id1")
      .orderBy(col("adist").asc, col("id2").asc)
    import graft.functions.VectorFunctions.l2Sq
    broadcast(q)
      .join(encoded.select(col("id2"), recon.as("recon2")),
        col("id1") =!= col("id2"))
      .withColumn("adist", l2Sq(col("emb1"), col("recon2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "adist", "rank")
  }

  /** IVF-narrowed PQ serving — the production ANN composition: a
    * coarse quantizer ([[pivotSet]] with `nCells` pivots, [[assignCells]])
    * partitions the corpus into cells, queries probe their `nProbe`
    * nearest cells, and ONLY the probed cells' PQ-encoded vectors are
    * scored by ADC (full-precision query against the reconstruction).
    * Candidate generation is a keyed equi-join on the cell id — the
    * scan shrinks by ~nProbe/nCells vs [[pqTopK]]'s linear pass, and
    * the join key is exactly what a cell-partitioned persisted index
    * serves with partition pruning (the e11/e14 layout). Coarse and
    * product codebooks are independent pivot sets (16 cells / 32
    * centroids here), both deterministic and oracle-reproducible. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      m: Int = 32,
      k: Int = 5,
      nCents: Int = 32,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val v = prep(corpus, idCol, vecCol)
    val coarse = pivotSet(v, nCells)
    val encoded = assignCells(pqEncode(v, pivotSet(v, nCents), dim, m)
        .withColumnRenamed("__emb2", "emb")
        .withColumn("nrm", norm(col("emb"))), coarse, keep = 1)
      .select(col("cell"), col("id2"), col("recon2"))
    val q = assignCells(prep(queries, idCol, vecCol), coarse,
        keep = nProbe)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("cell"))
    val w = Window.partitionBy("id1")
      .orderBy(col("adist").asc, col("id2").asc)
    import graft.functions.VectorFunctions.l2Sq
    // no dropDuplicates: the corpus side carries each id2 in EXACTLY
    // one cell (keep = 1) and a query probes nProbe DISTINCT cells, so
    // the cell equi-join emits every (id1, id2) at most once — the
    // dedup was a full shuffle of the candidate set for nothing
    broadcast(q)
      .join(encoded, Seq("cell"))
      .filter(col("id1") =!= col("id2"))
      .select("id1", "emb1", "id2", "recon2")
      .withColumn("adist", l2Sq(col("emb1"), col("recon2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "adist", "rank")
  }

  /** RESIDUAL IVF-PQ — the true IVFADC composition (the FAISS IVFPQ
    * default, vs [[ivfPqTopK]]'s PQ-on-raw-vectors): each vector is
    * quantized as `coarse_centroid(cell) + PQ(residual)`, where the
    * residual is the vector MINUS its cell's centroid. Residuals are
    * centered near zero regardless of which cell a vector landed in,
    * so one shared residual codebook spends its 32 centroids on the
    * fine structure instead of re-encoding the coarse position —
    * the quantization-error win that makes IVFADC the production
    * default.
    *
    * Scale shape: the coarse table is nCells rows (driver-bounded,
    * the pivotSet class); the residual codebook is built driver-side
    * from the PQ pivots' OWN residuals (nCents·dim doubles — model
    * state, not data); the corpus path is one scan with per-row
    * kernels (cell argmax projection → native vecSub → native PQ
    * encode → native vecAdd), candidate generation is the same keyed
    * cell equi-join as [[ivfPqTopK]], and ADC scores only probed
    * cells' reconstructions. No new shuffle classes.
    *
    * Determinism: the pq pivots' cell assignment replicates
    * [[assignCells]]'s cosine + tie rule in exact driver-side double
    * arithmetic (same left-to-right folds as the kernels), so the
    * whole composition — residuals included — is oracle-replayable. */
  def ivfPqResidualTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      m: Int = 32,
      k: Int = 5,
      nCents: Int = 32,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val v = prep(corpus, idCol, vecCol)
    val coarse = pivotSet(v, nCells)
    val encoded = ivfPqResidualEncode(v, coarse, pivotSet(v, nCents),
        dim, m)
      .select(col("cell"), col("id2"), col("recon2"))
    import graft.functions.VectorFunctions.l2Sq
    val q = assignCells(prep(queries, idCol, vecCol), coarse,
        keep = nProbe)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("cell"))
    val w = Window.partitionBy("id1")
      .orderBy(col("adist").asc, col("id2").asc)
    broadcast(q)
      .join(encoded, Seq("cell"))
      .filter(col("id1") =!= col("id2"))
      .select("id1", "emb1", "id2", "recon2")
      .withColumn("adist", l2Sq(col("emb1"), col("recon2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "adist", "rank")
  }

  /** The residual encode pass shared by [[ivfPqResidualTopK]] and the
    * quantization-error spec: `(cell, id2, emb, recon2)` where
    * `recon2 = coarse_centroid(cell) + PQ(emb - coarse_centroid)`.
    * The residual codebook is built driver-side from the PQ pivots'
    * own residuals, replicating [[assignCells]]'s cosine + tie rule
    * in exact double arithmetic (same left-to-right folds). */
  /** The shared residual codebook: each pq pivot's residual w.r.t. its
    * coarse cell, flattened — [[assignCells]]'s cosine + tie rule
    * replicated in exact driver-side double arithmetic (same
    * left-to-right folds as the kernels), so a codebook derived from
    * STORED pivot tables equals the build-time one bit-for-bit. */
  private[graft] def residualCodebook(
      coarse: Array[(Long, Seq[Double], Double)],
      pqPivots: Array[(Long, Seq[Double], Double)]
  ): Array[Double] = {
    def dotD(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    pqPivots.flatMap { case (_, pe, pn) =>
      var bestSim = Double.NegativeInfinity
      var bestCell = Long.MaxValue
      var bestIdx = -1
      var ci = 0
      while (ci < coarse.length) {
        val (cell, ce, cn) = coarse(ci)
        val sim = dotD(pe, ce) / (pn * cn)
        if (sim > bestSim || (sim == bestSim && cell < bestCell)) {
          bestSim = sim; bestCell = cell; bestIdx = ci
        }
        ci += 1
      }
      val ce = coarse(bestIdx)._2
      pe.indices.map(i => pe(i) - ce(i))
    }.toArray
  }

  /** The coarse centroid as a literal lookup keyed on the `cell`
    * column (nCells-branch coalesce — bounded by the pivot count). */
  private def centForCol(coarse: Array[(Long, Seq[Double], Double)]) =
    coalesce(coarse.map { case (cell, ce, _) =>
      when(col("cell") === lit(cell), typedLit(ce))
    }: _*)

  private[graft] def ivfPqResidualEncode(
      v: DataFrame,
      coarse: Array[(Long, Seq[Double], Double)],
      pqPivots: Array[(Long, Seq[Double], Double)],
      dim: Int,
      m: Int
  ): DataFrame = {
    val residCents = residualCodebook(coarse, pqPivots)
    val cells = pqPivots.map(_._1)
    // cell argmax is a projection, the centroid a literal lookup;
    // residual-encode, reconstruct = centroid + decoded residual
    import graft.functions.VectorFunctions.{vecAdd, vecSub}
    import org.apache.spark.sql.GraftSqlBridge
    val enc = GraftSqlBridge.column(graft.functions.PqEncodeExpr(
      GraftSqlBridge.expression(col("__res")), residCents, cells, dim, m))
    assignCells(v, coarse, keep = 1)
      .withColumn("__pcent", centForCol(coarse))
      .withColumn("__res", vecSub(col("emb"), col("__pcent")))
      .withColumn("__enc", enc)
      .select(col("cell"), col("vec_id").as("id2"), col("emb"),
        col("__enc")("codes").as("codes2"),
        vecAdd(col("__pcent"), col("__enc")("recon")).as("recon2"))
  }

  /** ADC serving from a persisted RESIDUAL index (`cell`, `id2`,
    * `codes2`) with its stored pivot tables: reconstruction =
    * centroid(cell) + decode(codes) inside the scan, candidates from
    * the same cell-keyed equi-join as [[ivfPqResidualTopK]] — and
    * distance-identical to it, because the codebook re-derivation is
    * exact and decode(encode(res)) IS the residual reconstruction. */
  def ivfPqResidualTopKFromIndex(
      encoded: DataFrame,
      coarse: Array[(Long, Seq[Double], Double)],
      pqPivots: Array[(Long, Seq[Double], Double)],
      queries: DataFrame,
      dim: Int,
      m: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nProbe: Int = 4
  ): DataFrame = {
    val residCents = residualCodebook(coarse, pqPivots)
    val cells = pqPivots.map(_._1)
    import graft.functions.VectorFunctions.{l2Sq, vecAdd}
    import org.apache.spark.sql.GraftSqlBridge
    val recon = GraftSqlBridge.column(graft.functions.PqDecodeExpr(
      GraftSqlBridge.expression(col("codes2")), residCents, cells,
      dim, m))
    val served = encoded
      .withColumn("recon2",
        vecAdd(centForCol(coarse), recon))
      .select(col("cell"), col("id2"), col("recon2"))
    val q = assignCells(prep(queries, idCol, vecCol), coarse,
        keep = nProbe)
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("cell"))
    val w = Window.partitionBy("id1")
      .orderBy(col("adist").asc, col("id2").asc)
    broadcast(q)
      .join(served, Seq("cell"))
      .filter(col("id1") =!= col("id2"))
      .select("id1", "emb1", "id2", "recon2")
      .withColumn("adist", l2Sq(col("emb1"), col("recon2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id1", "id2", "adist", "rank")
  }

  /** Distributed Lloyd k-means over integer-quantized embeddings — the
    * pivot TRAINER the IVF/PQ family composes with ([[pivotSet]] is the
    * deterministic stand-in; this is the real thing, still
    * deterministic and oracle-reproducible because every step is exact
    * integer arithmetic):
    *
    *  - quantize: q_i = floor(x_i · scale) as LONG (floor, not round —
    *    no tie semantics to match across engines; float→double→·2^6 is
    *    exact IEEE).
    *  - init: the k lowest-id vectors (deterministic, like FAISS's
    *    "train on the first n" default shape).
    *  - assign: argmin over centroids of the integer squared-L2, ties
    *    to the lower centroid id — FLAT per-centroid element_at
    *    arithmetic + one `array_min` over (d, cid) structs, the
    *    codegen'd pqEncode discipline (no join: centroids are
    *    literals, so assignment is a pure per-row projection over one
    *    corpus scan — the broadcast-centroids Lloyd step).
    *  - update: centroid_j = floor(sum_i q_i / n_j) element-wise — one
    *    map-side-combining groupBy(cid, dim) per iteration, k·dim rows
    *    collected (bounded by the model size, the same class as
    *    [[pivotSet]]); empty clusters keep their previous centroid.
    *
    * Per iteration: ONE corpus scan + a k·dim-row agg. At 100 TB that
    * is the canonical distributed k-means — the model broadcasts, the
    * data never shuffles (the agg's exchange carries k·dim partial
    * sums per task, not rows). Returns the final assignment
    * (vec_id, cluster) after `iters` assignment passes with
    * `iters - 1` interleaved updates. */
  /** floor(x · scale) integer quantization of an embedding column. */
  private def quantize(vec: org.apache.spark.sql.Column, scale: Double) =
    transform(vec, e => floor(e.cast("double") * lit(scale)).cast("long"))

  /** Per-centroid (distance, cid) struct array over a quantized vector
    * — FLAT element_at arithmetic against literal centroids (the
    * pqEncode discipline); `array_min` of this IS the argmin with the
    * tie-to-lower-cid rule, `array_sort` + slice IS the n-probe. */
  private def centScores(
      centroids: Array[Array[Long]],
      qv: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column =
    array(centroids.zipWithIndex.map { case (c, j) =>
      val d = c.indices.map { i =>
        val e = element_at(qv, i + 1) - lit(c(i))
        e * e
      }.reduceLeft(_ + _)
      struct(d.as("d"), lit(j).as("cid"))
    }: _*)

  /** The Lloyd training loop shared by [[kmeansAssign]] and
    * [[kmeansIvfTopK]]: returns the quantized corpus view and the
    * centroids after `iters - 1` update passes (so one final
    * assignment against them completes the `iters`-th pass). */
  private def kmeansTrain(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Double
  ): (DataFrame, Array[Array[Long]]) = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val q = df.select(
      col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol), scale).as("qv"))

    val seedIds = q.select("vec_id").orderBy("vec_id")
      .limit(k).collect().map(_.getLong(0))
    var centroids: Array[Array[Long]] = q
      .filter(col("vec_id").isin(seedIds: _*))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Long](1).toArray)
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "ragged embedding column")

    for (_ <- 1 until iters) {
      val sums = q
        .withColumn("cid",
          array_min(centScores(centroids, col("qv")))("cid"))
        .select(col("cid"), posexplode(col("qv")).as(Seq("i", "v")))
        .groupBy("cid", "i")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("i"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      centroids = next
    }
    (q, centroids)
  }

  def kmeansAssign(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 8,
      iters: Int = 3,
      scale: Double = 64.0
  ): DataFrame = {
    val (q, centroids) = kmeansTrain(df, idCol, vecCol, k, iters, scale)
    q.withColumn("cid", array_min(centScores(centroids, col("qv")))("cid"))
      .select(col("vec_id"), col("cid").cast("long").as("cluster"))
  }

  /** Simplified silhouette over the trained assignment — the O(n·k)
    * cluster-quality metric (distance-to-centroid in place of mean
    * pairwise distance: the variant that survives scale — the exact
    * silhouette is O(n²) and can never run on a corpus). Per vector:
    * a = squared distance to its centroid, b = squared distance to the
    * nearest OTHER centroid, s = (b − a) / max(a, b) (0 when both are
    * 0). Every distance is exact integer arithmetic on the e19
    * lattice; the one division is a single IEEE op over integers, so
    * per-vector scores hash-replay cross-engine. Pure per-row
    * projections against literal centroids — zero shuffles. */
  def kmeansSilhouette(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 8,
      iters: Int = 3,
      scale: Double = 64.0
  ): DataFrame = {
    val (q, centroids) = kmeansTrain(df, idCol, vecCol, k, iters, scale)
    q.withColumn("__sc", array_sort(centScores(centroids, col("qv"))))
      .withColumn("cluster",
        element_at(col("__sc"), 1)("cid").cast("long"))
      .withColumn("a_sq", element_at(col("__sc"), 1)("d"))
      .withColumn("b_sq", element_at(col("__sc"), 2)("d"))
      .withColumn("silhouette",
        when(greatest(col("a_sq"), col("b_sq")) === 0L, lit(0.0))
          .otherwise((col("b_sq") - col("a_sq")).cast("double") /
            greatest(col("a_sq"), col("b_sq")).cast("double")))
      .select(col("vec_id"), col("cluster"), col("a_sq"), col("b_sq"),
        col("silhouette"))
  }

  /** IVF serving on TRAINED cells — [[ivfTopK]] with the coarse
    * quantizer learned by [[kmeansTrain]] instead of the
    * hash-stratified [[pivotSet]] stand-in (the FAISS
    * `train`-then-`search` shape). The corpus lands in its argmin
    * cluster, queries probe their `nProbe` nearest centroids under the
    * SAME integer metric the trainer used (ties to the lower cid —
    * `array_sort` over the (d, cid) structs), and the final scores are
    * exact cosine over the full-precision vectors, reranked per query.
    * Trained cells are balanced where stratified pivots are arbitrary,
    * so probe recall per scanned vector is higher — e15's sweep
    * measures that; this operator is the composition itself. The cell
    * table is k rows of driver state like every pivot set; assignment
    * and probing are pure literal projections (no join, no shuffle
    * beyond the cell-keyed probe). */
  def kmeansIvfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nClusters: Int = 8,
      iters: Int = 3,
      nProbe: Int = 2,
      scale: Double = 64.0
  ): DataFrame = {
    val (_, cents) =
      kmeansTrain(corpus, idCol, vecCol, nClusters, iters, scale)
    val v = prep(corpus, idCol, vecCol)
    val cAssigned = v
      .withColumn("cell",
        array_min(centScores(cents, quantize(col("emb"), scale)))("cid"))
      .select(col("vec_id").as("id2"), col("emb").as("emb2"),
        col("nrm").as("n2"), col("cell"))
    val qAssigned = prep(queries, idCol, vecCol)
      .withColumn("cell",
        explode(transform(
          slice(array_sort(centScores(cents, quantize(col("emb"), scale))),
            1, nProbe),
          s => s("cid"))))
      .select(col("vec_id").as("id1"), col("emb").as("emb1"),
        col("nrm").as("n1"), col("cell"))
    ivfScoreTail(qAssigned, cAssigned, k)
  }
}
