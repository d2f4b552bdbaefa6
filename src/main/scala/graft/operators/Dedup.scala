package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Shuffle discipline at 100 TB:
  *  - exact: one shuffle on the key hash (groupBy).
  *  - Jaccard/MinHash/SimHash candidate generation: shuffles are keyed on
  *    shingle / band-bucket / simhash-chunk — never an unbucketed cross
  *    join. Candidate verification touches only bucket-collision pairs.
  */
object Dedup {

  /** Truncate a frame's lineage, materializing it once: RELIABLE
    * `checkpoint` when the session has a checkpoint dir configured (the
    * cluster path — executor-local blocks don't survive executor loss,
    * which on a 1000-executor job is routine), else `localCheckpoint`
    * (single-JVM runs, this sandbox). Iterative operators (connected
    * components) and multiply-consumed expensive frames use this so
    * plans stay O(1) per round.
    *
    * Reliable checkpoint files accumulate for the session's lifetime by
    * default (one per CC round); long-lived sessions running these
    * pipelines repeatedly should set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so GC'd
    * rounds have their files removed, or point the checkpoint dir at
    * job-scoped storage cleaned after the run. */
  private[graft] def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(true)
    else df.localCheckpoint(true)

  private[graft] implicit class TruncateOps(private val df: DataFrame) {
    def truncated: DataFrame = truncate(df)
  }

  /** Exact dedup: group on the key columns, keep the minimum id, count the
    * duplicates. One hash-shuffle; map-side partial aggregation applies. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Approximate distinct-count of the key columns (HyperLogLog++): the
    * scale path when exact expand-based distinct counting (q43) is too
    * expensive. No cross-engine oracle (HLL implementations differ);
    * DedupSpec bounds the relative error instead. */
  def approxDistinct(
      df: DataFrame,
      keyCols: Seq[String],
      rsd: Double = 0.05
  ): DataFrame =
    df.agg(approx_count_distinct(struct(keyCols.map(col): _*), rsd)
      .as("approx_distinct"))

  /** Exact dedup keeping one full row per key (first by `orderBy`). */
  def exactKeepFirst(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-doc distinct shingle fold hashes (packed `f131 | f137<<31`, see
    * TextFunctions.shingleFolds), exploded to one row per (doc, hash).
    * One native codegen'd pass per doc — no shingle-string
    * materialization, no interpreted higher-order lambdas. */
  private[graft] def shingleHashRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame =
    df.select(
      col(idCol).as("doc"),
      TextFunctions.tokens(col(textCol)).as("__tk")
    ).select(
      col("doc"),
      explode(TextFunctions.shingleFolds(col("__tk"), n)).as("sh")
    )

  /** Auto document-frequency cap for the shingle self-join: a shingle
    * shared by k docs contributes k² join rows, so one boilerplate
    * shingle (header/footer text) in 1% of a web corpus is a 10^10-row
    * hot key. Capping DF at max(64, 5% of corpus) removes only
    * boilerplate — true near-dup pairs share mostly *rare* shingles, so
    * the above-threshold pair set is stable under the cap (DedupSpec
    * proves this on the fixture at a far more aggressive cap). */
  def autoShingleDfCap(nDocs: Long): Int = {
    // Clamp BEFORE narrowing: for corpora where 5% of nDocs exceeds
    // Int.MaxValue a bare .toInt wraps negative and silently disables
    // the guard at exactly the web-scale regime it exists for.
    val cap = math.max(64L, math.ceil(nDocs * 0.05).toLong)
    math.min(cap, Int.MaxValue.toLong).toInt
  }

  /** Exact n-gram Jaccard near-dup pairs: explode distinct shingles,
    * self-join on shingle (shuffle keyed on shingle, not a cross join),
    * count intersections, Jaccard = |A∩B| / (|A|+|B|-|A∩B|).
    *
    * The division is one IEEE op over exact integers — deterministic and
    * oracle-matchable.
    *
    * Skew guard ON by default: `maxShingleDf = -1` derives a
    * document-frequency cap from the corpus size (`autoShingleDfCap`) and
    * drops shingles above it before the self-join, bounding any single
    * join key to cap² rows. Pass an explicit cap, or 0 to disable (exact
    * unguarded semantics, only sane for bounded audits).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.2,
      maxShingleDf: Int = -1,
      pruneSingletons: Boolean = false
  ): DataFrame = {
    // Shingles are 62-bit packed fold hashes from the start: the
    // self-join shuffles and compares fixed-width longs instead of full
    // n-gram strings (≈4× less shuffle IO, codegen'd long equality).
    // Distinct shingles collide with probability ~ |shingles|²/2^62 —
    // negligible even at 100 TB corpus scale.
    // The shingle table feeds several downstream passes; recomputing the
    // explode keeps each consumer inside one fused codegen stage, which
    // measured FASTER end-to-end than persisting it (caching the 500k-row
    // fixture table cost ~40% on d09/d13: block-manager churn + broken
    // stage fusion). At cluster scale the same holds — shuffle exchanges
    // below the self-join are reused by Spark where identical anyway.
    val sh = shingleHashRows(df, idCol, textCol, n)
    // Auto cap needs the corpus size: one count() action up front. On a
    // raw table scan that is metadata-cheap; callers chaining this after
    // derived frames (d13) measured < 5% overhead for it at bench scale.
    val dfCap =
      if (maxShingleDf < 0) autoShingleDfCap(df.count()) else maxShingleDf
    val shPruned =
      if (dfCap > 0) {
        val hot = sh
          .groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap)
          .select("sh")
        sh.join(broadcast(hot), Seq("sh"), "left_anti")
      } else sh
    // Sizes come from the SAME (pruned) universe as the intersections, so
    // Jaccard is exactly |A∩B|/|A∪B| over the pruned shingle sets. (When
    // maxShingleDf > 0 this redefines each doc's shingle set as the pruned
    // one — unpruned denominators would systematically deflate Jaccard.)
    val sizes = shPruned.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    // Optional: shingles appearing in exactly one doc can never intersect
    // — dropping them from the join input (NOT from `sizes`) is
    // exact-semantics preserving. In real web corpora singletons dominate
    // the shingle universe and this shrinks the quadratic stage
    // several-fold; on the dense synthetic fixture (0.8% singletons) the
    // extra pass costs more than it saves, so it is opt-in.
    val joinable =
      if (pruneSingletons) {
        val sharedKeys = shPruned
          .groupBy("sh")
          .agg(count(lit(1)).as("sh_df"))
          .filter(col("sh_df") >= 2)
          .select("sh")
        shPruned.join(sharedKeys, Seq("sh"), "left_semi")
      } else shPruned
    val inter = joinable
      .as("a")
      .join(joinable.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(sizes.withColumnRenamed("doc", "id1")
        .withColumnRenamed("n_sh", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc", "id2")
        .withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn(
        "jaccard",
        col("n_both").cast("double") /
          (col("n1") + col("n2") - col("n_both")).cast("double")
      )
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Directed n-gram CONTAINMENT pairs: `C(a→b) = |sh(a) ∩ sh(b)| /
    * |sh(a)|` — the asymmetric score Jaccard hides. A short doc quoted
    * wholesale inside a long one scores containment ≈ 1 while its
    * Jaccard stays tiny (the union is dominated by the container), so
    * this is the quote/subset detector of the dedup family. Returns
    * (idCol, container_id, containment) for every ORDERED pair ≥
    * `threshold`, id ≠ container.
    *
    * Same keyed shingle-hash self-join discipline (and default DF skew
    * cap) as [[ngramJaccardPairs]]; sizes come from the pruned universe
    * so numerator and denominator share one shingle set. Directed
    * output doubles the pair rows of the undirected join — same scale
    * class. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.7,
      maxShingleDf: Int = -1
  ): DataFrame = {
    val sh = shingleHashRows(df, idCol, textCol, n)
    val dfCap =
      if (maxShingleDf < 0) autoShingleDfCap(df.count()) else maxShingleDf
    val shPruned =
      if (dfCap > 0) {
        val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap)
          .select("sh")
        sh.join(broadcast(hot), Seq("sh"), "left_anti")
      } else sh
    val sizes = shPruned.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    // the self-join runs over UNORDERED pairs (half the matched rows of
    // the naive directed join); both directions are emitted from the
    // already-reduced pair frame, which is orders of magnitude smaller
    val inter = shPruned.as("a")
      .join(shPruned.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_lo"), col("b.doc").as("id_hi"))
      .agg(count(lit(1)).as("n_both"))
    inter.select(col("id_lo").as(idCol),
        col("id_hi").as("container_id"), col("n_both"))
      .union(inter.select(col("id_hi").as(idCol),
        col("id_lo").as("container_id"), col("n_both")))
      .join(sizes.withColumnRenamed("doc", idCol), idCol)
      .withColumn("containment",
        col("n_both").cast("double") / col("n_sh").cast("double"))
      .filter(col("containment") >= threshold)
      .select(idCol, "container_id", "containment")
  }

  /** Incremental near-dup detection: Jaccard pairs BETWEEN an incoming
    * batch and an existing corpus (never within either side) — the
    * production ingest decision "is this new doc a near-dup of anything
    * already in the lake". Same shingle-hash keyed join discipline as
    * [[ngramJaccardPairs]] (no cross join; skew guard on by default,
    * document frequency measured over the COMBINED corpus — boilerplate
    * is boilerplate regardless of which side it lands in), but the join
    * is new×existing only: cost scales with |batch|, not |corpus|²,
    * and the existing side's shingles shuffle once keyed on the hash.
    * Returns (id_new, id_existing, jaccard) above `threshold`. */
  def incrementalJaccardPairs(
      newDf: DataFrame,
      existingDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.2,
      maxShingleDf: Int = -1
  ): DataFrame =
    incrementalJaccardPairsFromShingles(
      newDf,
      shingleHashRows(existingDf, idCol, textCol, n),
      // one job, not two separate eager counts over the hot ingest path
      combinedRows = () =>
        newDf.select(col(idCol)).union(existingDf.select(col(idCol)))
          .count(),
      idCol, textCol, n, threshold, maxShingleDf)

  /** [[incrementalJaccardPairs]] with the existing side's shingles
    * PRECOMPUTED — the serving shape for a standing feature index
    * (LakeWriter's `_shingles/` sidecar): per micro-batch the corpus
    * text is never re-read and never re-shingled; the existing side is
    * the (doc, sh) frame as stored. `combinedRows` feeds the auto DF
    * cap (batch rows + corpus rows — a thunk so callers holding the
    * corpus row count from index metadata pay no job at all). Multiset
    * equality of `shOld` with `shingleHashRows(corpus)` is the caller's
    * index-maintenance invariant; given it, results are bit-identical
    * to the from-text path. */
  def incrementalJaccardPairsFromShingles(
      newDf: DataFrame,
      shOld: DataFrame,
      combinedRows: () => Long,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.2,
      maxShingleDf: Int = -1
  ): DataFrame = {
    val shNew = shingleHashRows(newDf, idCol, textCol, n)
    val dfCap =
      if (maxShingleDf < 0) autoShingleDfCap(combinedRows())
      else maxShingleDf
    def prune(sh: DataFrame, hot: DataFrame): DataFrame =
      sh.join(broadcast(hot), Seq("sh"), "left_anti")
    val (pNew, pOld) =
      if (dfCap > 0) {
        val hot = shNew.union(shOld)
          .groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap)
          .select("sh")
        (prune(shNew, hot), prune(shOld, hot))
      } else (shNew, shOld)
    val sizesNew = pNew.groupBy("doc").agg(count(lit(1)).as("n_new"))
    val sizesOld = pOld.groupBy("doc").agg(count(lit(1)).as("n_old"))
    pNew.as("a")
      .join(pOld.as("b"), col("a.sh") === col("b.sh"))
      .groupBy(col("a.doc").as("id_new"), col("b.doc").as("id_existing"))
      .agg(count(lit(1)).as("n_both"))
      .join(sizesNew.withColumnRenamed("doc", "id_new"), "id_new")
      .join(sizesOld.withColumnRenamed("doc", "id_existing"), "id_existing")
      .withColumn("jaccard",
        col("n_both").cast("double") /
          (col("n_new") + col("n_old") - col("n_both")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_new", "id_existing", "jaccard")
  }

  /** Benchmark decontamination report: training docs sharing ANY word
    * n-gram with a held-out evaluation set (the GPT-3 appendix-C /
    * Llama-style leakage gate run before training). Returns one row per
    * contaminated doc: (idCol, n_shared = distinct overlapping n-grams,
    * n_eval = distinct eval docs hit).
    *
    * Exact by design — no document-frequency cap: decontamination asks
    * "does this doc leak ANY eval n-gram", so pruning hot shingles would
    * mask exactly the boilerplate-heavy leaks it exists to catch.
    *
    * 100 TB shape: the held-out side is a benchmark suite (thousands of
    * docs, not billions), so its distinct shingle hashes BROADCAST. The
    * corpus side is one codegen'd scan (ShinglePackExpr) probing the
    * broadcast table — no corpus shuffle at all; only the matched
    * (doc, shingle, eval_id) rows (vanishingly few by construction)
    * reach the per-doc aggregation. Reference semantics: this is the
    * subset-membership filter family (pydala `dataset/reader.py` `in`
    * predicates) lifted to n-gram space. */
  def contaminationReport(
      train: DataFrame,
      heldOut: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    val shTr = shingleHashRows(train, idCol, textCol, n)
    val shEv = shingleHashRows(heldOut, idCol, textCol, n)
      .select(col("doc").as("eval_id"), col("sh"))
    shTr
      .join(broadcast(shEv), "sh")
      .groupBy(col("doc").as(idCol))
      .agg(
        countDistinct(col("sh")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval"))
  }

  /** Multi-benchmark contamination MATRIX: which eval suite(s) each
    * training doc leaks k-gram windows into — the audit layer of a
    * decontamination gate run against the whole benchmark battery at
    * once (the per-benchmark attribution a release report needs, not
    * just a drop decision). One probe serves every suite: the tagged
    * benchmark shingle sets union into a single broadcast, the train
    * side joins it once, and per-doc suite names fold via a SORTED
    * collect_set so the report column is hash-stable. Scale shape =
    * [[contaminationReport]]'s: benchmark shingles are eval-suite
    * sized (broadcastable; the Bloom variant is the fallback), the
    * probe is one keyed join, nothing all-pairs. */
  def contaminationMatrix(
      train: DataFrame,
      benchmarks: Seq[(String, DataFrame)],
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    val evs = benchmarks.map { case (name, df) =>
      shingleHashRows(df, idCol, textCol, n)
        .select(lit(name).as("bench"), col("sh"))
    }.reduce(_.unionByName(_)).distinct()
    shingleHashRows(train, idCol, textCol, n)
      .join(broadcast(evs), "sh")
      .groupBy(col("doc").as(idCol))
      .agg(
        array_join(array_sort(collect_set(col("bench"))), ",")
          .as("benchmarks"),
        countDistinct(col("sh")).as("n_shared"))
  }

  /** Bloom-filter variant of the decontamination probe — the scale path
    * when the held-out shingle set outgrows an exact broadcast (a full
    * eval-suite union at 100 TB can reach billions of distinct n-grams:
    * exact hashes are 8 bytes/key, a 1% Bloom filter ~1.2 bytes/key).
    * Returns the flagged train ids.
    *
    * One-sided error, the safe direction for leakage gates: Bloom
    * filters have NO false negatives, so the flagged set is a SUPERSET
    * of [[contaminationReport]]'s — a real leak can never slip through;
    * `fpp` only over-drops clean docs (DedupSpec bounds the measured
    * over-flag rate on the fixture).
    *
    * `fpp` is PER SHINGLE and compounds per document — a doc with s
    * distinct shingles is falsely flagged with probability
    * ~`1-(1-fpp)^s`, so calibrate `fpp ≈ targetDocRate / E[s]` (e.g.
    * 1e-4 for a ~0.5% doc-level rate at s≈50). Even at 1e-4 the filter
    * is ~2.4 bytes/key vs 8 for exact hashes.
    *
    * Plan shape: the build is Spark's own `bloom_filter_agg`
    * (`BloomFilterAggregate` — the aggregate behind runtime row-group
    * filtering) in ONE eval-side job that also returns the shingle
    * count, replacing the old count + `stat.bloomFilter` pair of
    * driver actions; the corpus probe is `BloomFilterMightContain`
    * over the serialized filter as a literal, so the hot path stays
    * inside whole-stage codegen — no Scala closure UDF anywhere. */
  def bloomContaminatedIds(
      train: DataFrame,
      heldOut: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      fpp: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column => exprCol, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.util.sketch.BloomFilter

    val spark = train.sparkSession
    val shEv = shingleHashRows(heldOut, idCol, textCol, n).select("sh")

    // One aggregate job: shingle-row count (to audit capacity) + the
    // filter itself. Capacity must be fixed before the pass, so build
    // at `cap` and escalate — rebuild at the observed count — only if
    // the guess was low (the FPR bound `fpp` is a guarantee, not a
    // hope). First pass guesses from the eval side's doc count: one
    // cheap count-only job over a 1-column scan, never over text.
    def buildAt(cap: Long): (Long, Array[Byte]) = {
      val bits = BloomFilter.optimalNumOfBits(cap, fpp)
      // BloomFilterAggregate validates capacity/bits against the
      // runtime-filter conf ceilings (4M items / 67M bits default) —
      // scope-lift them; an eval suite at 1e-4 needs ~19 bits/key.
      graft.lake.SchemaTools.withSessionConf(spark,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        math.max(4000000L, cap).toString) {
        graft.lake.SchemaTools.withSessionConf(spark,
          "spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
          math.max(67108864L, bits).toString) {
          val agg = exprCol(new BloomFilterAggregate(
              expression(col("sh")),
              Literal(cap), Literal(bits)).toAggregateExpression())
          val row = shEv.agg(count(col("sh")).as("n"), agg.as("bf")).head()
          (row.getLong(0), row.getAs[Array[Byte]](1))
        }
      }
    }
    // ~E[shingles/doc] is corpus-dependent; 256 is generous for n=5 on
    // web-scale docs, and an undershoot only costs one rebuild.
    val guess = math.max(64L, heldOut.select(col(idCol)).count() * 256L)
    val (actual, first) = buildAt(guess)
    val bfBytes =
      if (actual <= guess) first
      else buildAt(math.max(64L, actual))._2

    val probe = exprCol(new BloomFilterMightContain(
      Literal(bfBytes), expression(col("sh"))))
    shingleHashRows(train, idCol, textCol, n)
      .filter(probe)
      .select(col("doc").as(idCol))
      .distinct()
  }

  /** Decontaminated survivors: `train` minus every doc
    * [[contaminationReport]] flags. The flagged-id frame is tiny (its
    * size is bounded by actual leakage), so the final anti-join
    * broadcasts — the corpus stays un-shuffled end to end. */
  def decontaminate(
      train: DataFrame,
      heldOut: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    val bad = contaminationReport(train, heldOut, idCol, textCol, n)
      .select(idCol)
    train.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** Exact substring-duplication audit (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" exact
    * flavor): for every doc containing a k-token window that appears
    * MORE THAN ONCE in the corpus (cross-doc or self-repetition), report
    * how much of the doc those repeated windows cover. Returns one row
    * per affected doc: (idCol, n_tokens, n_dup_windows, dup_tokens,
    * dup_ratio) where dup_tokens is the merged-interval token coverage —
    * overlapping windows [p, p+k) union'd via the gaps-and-islands
    * identity `Σ min(next_pos - pos, k)` (+ k for the last window), one
    * window function, no interval materialization.
    *
    * 100 TB shape: positional window hashes are one codegen'd pass per
    * row (ShinglePackAllExpr); the repeated-window set is one keyed agg
    * on the 62-bit hash with map-side partials; the probe join is keyed
    * on the same hash; coverage is a per-doc window over matched
    * positions only. Nothing is all-pairs and nothing returns to the
    * driver. */
  def substringDupReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    val win = df
      .select(col(idCol).as("doc"),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col("doc"), size(col("__tk")).cast("long").as("n_tokens"),
        posexplode(TextFunctions.shingleFoldsAll(col("__tk"), k))
          .as(Seq("pos", "h")))
    val hot = win.groupBy("h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select("h")
    val w = Window.partitionBy("doc").orderBy("pos")
    win.join(hot, "h")
      .withColumn("__nxt", lead(col("pos"), 1).over(w))
      .withColumn("__contrib",
        when(col("__nxt").isNull, lit(k.toLong))
          .otherwise(least(col("__nxt") - col("pos"), lit(k))
            .cast("long")))
      .groupBy(col("doc").as(idCol))
      .agg(max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_dup_windows"),
        sum(col("__contrib")).as("dup_tokens"))
      .withColumn("dup_ratio",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Exact duplicated-span REMOVAL (the transformation half of the Lee
    * et al. 2022 recipe — [[substringDupReport]] audits, this rewrites):
    * every k-token window appearing more than once in the corpus keeps
    * exactly its corpus-wide FIRST occurrence (min (doc, pos)); token
    * positions covered by any NON-first occurrence are dropped and each
    * affected doc is reassembled from its surviving tokens in order.
    * Returns one row per input doc: (idCol, n_tokens, n_removed,
    * clean_text) — untouched docs pass through with n_removed = 0 and
    * their text intact.
    *
    * 100 TB shape: windows/hot-set/probe are the d23 plan (one codegen'd
    * positional-hash pass, keyed agg, keyed join). The first-occurrence
    * winner per window is `min(struct(doc, pos))` — a keyed agg with
    * map-side partials, NOT a row_number window (a hot boilerplate
    * window would sort every replica in one partition). Token-level
    * reassembly — the only per-token shuffle — runs ONLY for docs that
    * actually lose a span (semi-join on the removal set); the untouched
    * bulk of the corpus never explodes its tokens. */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    val base = df.select(col(idCol).as("doc"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    val win = base
      .select(col("doc"), size(col("__tk")).cast("long").as("n_tokens"),
        posexplode(TextFunctions.shingleFoldsAll(col("__tk"), k))
          .as(Seq("pos", "h")))
    val hot = win.groupBy("h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select("h")
    val occ = win.join(hot, "h")
    val first = occ
      .groupBy("h")
      .agg(min(struct(col("doc"), col("pos"))).as("__f"))
      .select(col("h"), col("__f.doc").as("__fdoc"),
        col("__f.pos").as("__fpos"))
    // removed token positions = the union of [pos, pos+k) over non-first
    // occurrences, deduplicated per doc (overlapping spans)
    val removed = occ
      .join(first, "h")
      .filter(!(col("doc") === col("__fdoc") && col("pos") === col("__fpos")))
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
    val affectedIds = removed.select("doc").distinct()
    val affected = base.join(affectedIds, Seq("doc"), "left_semi")
      .select(col("doc"), size(col("__tk")).cast("long").as("n_tokens"),
        posexplode(col("__tk")).as(Seq("p", "tok")))
      .join(removed.withColumn("__rm", lit(1)), Seq("doc", "p"), "left")
      .groupBy("doc")
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        sum(when(col("__rm").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__rm").isNull, struct(col("p"), col("tok"))))),
            x => x.getField("tok")),
          " ").as("clean_text"))
    val untouched = base.join(affectedIds, Seq("doc"), "left_anti")
      .select(col("doc"), size(col("__tk")).cast("long").as("n_tokens"),
        lit(0L).as("n_removed"),
        concat_ws(" ", col("__tk")).as("clean_text"))
    affected.unionByName(untouched)
      .withColumnRenamed("doc", idCol)
  }

  /** SURGICAL decontamination: remove every `k`-token span a training
    * doc shares with the held-out set, keeping the rest of the doc —
    * the transformation alternative to d20/d74's drop-the-whole-doc
    * screen (dropping wastes the 99% of a long doc that ISN'T the
    * leaked benchmark quote; Lee et al. 2022 apply the same span
    * surgery corpus-internally, [[removeDuplicateSpans]]). Unlike the
    * intra-corpus variant there is no first-occurrence keeper: leaked
    * spans are removed from EVERY occurrence.
    *
    * 100 TB shape: the held-out window-hash set is one distinct
    * projection of the (small) eval corpus — broadcast into the
    * window-hash semi-join; the corpus explodes to token level ONLY
    * for docs that actually lose a span (semi-join prune, the d33
    * discipline); everything else passes through reassembly-free. */
  def removeContaminatedSpans(
      corpus: DataFrame,
      heldOut: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    val base = corpus.select(col(idCol).as("doc"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    val hoHashes = heldOut
      .select(explode(TextFunctions.shingleFoldsAll(
        TextFunctions.tokens(col(textCol)), k)).as("h"))
      .distinct()
    val win = base
      .select(col("doc"),
        posexplode(TextFunctions.shingleFoldsAll(col("__tk"), k))
          .as(Seq("pos", "h")))
    val removed = win.join(hoHashes, Seq("h"), "left_semi")
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
    val affectedIds = removed.select("doc").distinct()
    val affected = base.join(affectedIds, Seq("doc"), "left_semi")
      .select(col("doc"), size(col("__tk")).cast("long").as("n_tokens"),
        posexplode(col("__tk")).as(Seq("p", "tok")))
      .join(removed.withColumn("__rm", lit(1)), Seq("doc", "p"), "left")
      .groupBy("doc")
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        sum(when(col("__rm").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__rm").isNull, struct(col("p"), col("tok"))))),
            x => x.getField("tok")),
          " ").as("clean_text"))
    val untouched = base.join(affectedIds, Seq("doc"), "left_anti")
      .select(col("doc"), size(col("__tk")).cast("long").as("n_tokens"),
        lit(0L).as("n_removed"),
        concat_ws(" ", col("__tk")).as("clean_text"))
    affected.unionByName(untouched)
      .withColumnRenamed("doc", idCol)
  }

  /** CCNet-style cross-corpus SEGMENT dedup (Wenzek et al. 2020 dedup
    * by paragraph hash, mapped to fixed `k`-token segments for
    * single-line corpora): split each doc into non-overlapping k-token
    * segments, keep only the corpus-wide FIRST occurrence of every
    * distinct segment (first = smallest (doc, seg_idx)), and reassemble
    * each doc from its surviving segments in order. Returns one row per
    * input doc: (idCol, n_segments, n_kept, clean_text) — n_kept = 0 and
    * clean_text = "" when every segment was claimed earlier.
    *
    * 100 TB shape: segmentation is per-row arithmetic (no shuffle); the
    * keep-first winner per segment is ONE keyed agg on the segment
    * string — `min(struct(doc, seg_idx))` gets map-side partials, unlike
    * a row_number window which would sort every replica of a hot
    * segment. The winner set IS the kept set (no join back), so
    * reassembly is one groupBy(doc) over the already-shrunk winners,
    * with the per-doc segment order restored by `array_sort` on
    * (seg_idx, seg) structs — no global sort, nothing driver-side. */
  def segmentDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    val segs = base
      .select(col("__id"), col("__tk"),
        explode(expr(s"sequence(0, (size(__tk) - 1) div $k)"))
          .as("__gi"))
      .select(col("__id"), col("__gi").cast("long").as("seg_idx"),
        concat_ws(" ", slice(col("__tk"), col("__gi") * k + 1, lit(k)))
          .as("seg"))
    val winners = segs
      .groupBy("seg")
      .agg(min(struct(col("__id"), col("seg_idx"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.seg_idx").as("seg_idx"),
        col("seg"))
    val rebuilt = winners
      .groupBy("__id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg"))).as("clean_text"))
    base
      .select(col("__id"),
        (expr(s"(size(__tk) - 1) div $k") + 1).cast("long")
          .as("n_segments"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** MinHash signatures: `numHashes` min-hashes over the shingle set,
    * computed as one groupBy with `numHashes` min-aggregates (single
    * shuffle on doc id).
    *
    * The hash family is the standard 2-universal combine (Broder):
    * `h_i(s) = (f131(s) + i * f137(s)) mod (2^31-1)` over two portable
    * char-fold base hashes — each shingle is hashed twice, not
    * `numHashes` times, and the values are reproducible in the DuckDB
    * oracle (d06). The mod-prime reduction is essential: without it the
    * h_i orderings for large i all degenerate to the f137 ordering and
    * the per-band decisions stop being independent. Intermediates stay
    * < 2^38: ANSI-safe. */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      shingleN: Int = 3
  ): DataFrame = {
    // f1/f2 unpack from the 62-bit shingle fold hash (f1 | f2<<31) with
    // two codegen'd bit ops — values bit-identical to charFold over the
    // materialized shingle string, so the d06 oracle reproduces them.
    val sh = shingleHashRows(df, idCol, textCol, shingleN)
      .select(
        col("doc"),
        col("sh").bitwiseAND(lit(0x7FFFFFFFL)).as("f1"),
        shiftright(col("sh"), 31).as("f2")
      )
    // One custom TypedImperativeAggregate with a single Array[Long]
    // buffer, instead of numHashes separate min-aggregates (leaner agg
    // hash map, incremental mod-P hashing) — values bit-identical.
    val sigAgg = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.MinHashAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(col("f1")),
        org.apache.spark.sql.GraftSqlBridge.expression(col("f2")),
        numHashes
      ).toAggregateExpression())
    sh.groupBy("doc").agg(sigAgg.as("sig"))
  }

  /** MinHash + LSH near-dup candidates, verified.
    *
    * Signature -> `bands` band-hashes; docs colliding in any band become
    * candidates (shuffle keyed on (band, bandHash)); candidates are then
    * verified with the estimated Jaccard = matching-minhash fraction, and
    * optionally exact Jaccard.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 32,
      shingleN: Int = 3,
      threshold: Double = 0.2
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleN)
    // Portable band hash: polynomial fold of the band's minhash values
    // mod 2^31-1 (values < 2^38, fold intermediates < 2^40 — ANSI-safe).
    val bandHashes = (0 until bands).map(b =>
      aggregate(
        slice(col("sig"), b * rows + 1, rows),
        lit(0L),
        (a, m) => pmod(a * lit(131L) + m, lit(TextFunctions.HashP))
      ))
    val banded = sigs.select(
      col("doc"),
      col("sig"),
      posexplode(array(bandHashes: _*)).as(Seq("band", "band_hash"))
    )
    val cand = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc") < col("b.doc")
      )
      .select(
        col("a.doc").as("id1"),
        col("b.doc").as("id2"),
        col("a.sig").as("sig1"),
        col("b.sig").as("sig2")
      )
      .dropDuplicates("id1", "id2")
    cand
      .withColumn(
        "est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) =>
          when(x === y, 1).otherwise(0)), _ === 1)).cast("double") /
          lit(numHashes.toDouble)
      )
      .filter(col("est_jaccard") >= threshold)
      .select("id1", "id2", "est_jaccard")
  }

  /** Connected components over near-dup pairs -> (doc_id, cluster_id =
    * min doc id in the component). This is what turns pairwise candidates
    * (Jaccard/MinHash/SimHash/cosine) into actual dedup decisions: keep
    * one doc per cluster.
    *
    * Min-label propagation: each round every node takes the min label in
    * its neighborhood; rounds = graph diameter (near-dup components are
    * shallow in practice). Each round is one shuffle-join; lineage is
    * truncated per round ([[truncate]]: reliable `checkpoint` when the
    * session has a checkpoint dir — the cluster path — else
    * `localCheckpoint`) so plans stay O(1). Only ids that appear in
    * some pair are returned (singletons need no dedup). */
  /** Exact edit-distance verification of shingle candidates — the
    * standard two-stage fuzzy-dedup pipeline (LSH recall, DP
    * precision): candidate pairs come from the KEYED, DF-capped
    * [[ngramJaccardPairs]] stage (never all-pairs), and the quadratic
    * Levenshtein DP runs ONLY on candidates. The Spark side uses the
    * thresholded builtin (`levenshtein(l, r, k)` — the BANDED DP,
    * O(len·k) instead of O(len²), returning -1 past the band), so the
    * expensive kernel is also the cheap one; kept rows carry the true
    * distance, which equals the oracle's plain `levenshtein() <= k`
    * filter exactly. */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      candThreshold: Double = 0.2,
      maxDist: Int = 6
  ): DataFrame = {
    val cand = ngramJaccardPairs(df, idCol, textCol, n, candThreshold)
      .select("id1", "id2")
    val t = df.select(col(idCol), col(textCol))
    cand
      .join(t.select(col(idCol).as("id1"), col(textCol).as("__t1")),
        Seq("id1"))
      .join(t.select(col(idCol).as("id2"), col(textCol).as("__t2")),
        Seq("id2"))
      .withColumn("dist",
        levenshtein(col("__t1"), col("__t2"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select("id1", "id2", "dist")
  }

  def duplicateClusters(pairs: DataFrame): DataFrame = {
    // Symmetrize with ONE explode pass, not a union of two selects: the
    // union form executes the (expensive — Jaccard / SRP join) pairs
    // subplan twice; explode reads it once. Checkpoint truncates the
    // lineage so the CC rounds never re-run candidate generation.
    val spark = pairs.sparkSession
    val edges = pairs
      .select(explode(array(
        struct(col("id1").as("a"), col("id2").as("b")),
        struct(col("id2").as("a"), col("id1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .truncated
    // Size the CC shuffle to the ACTUAL edge count (free: edges is
    // already materialized): near-dup graphs are typically a small
    // fraction of the corpus, and running every round's joins at the
    // session's corpus-sized shuffle width schedules mostly-empty tasks
    // — pure per-round overhead. ~50k edges per partition, clamped to
    // the session setting so a genuinely huge graph keeps full width.
    val sessionParts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    val ccParts = math.max(1L, math.min(sessionParts.toLong,
      edges.count() / 50000L + 1L)).toString
    graft.lake.SchemaTools.withSessionConf(
      spark, "spark.sql.shuffle.partitions", ccParts) {
      duplicateClustersLoop(edges)
    }
  }

  private def duplicateClustersLoop(edges: DataFrame): DataFrame = {
    // Seed with the first propagation round fused into init: from
    // identity labels, round 1 is exactly min({self} ∪ neighbors) —
    // one groupBy (which also plays the distinct) instead of a
    // distinct shuffle plus a full join round.
    var labels = edges.groupBy("a")
      .agg(min(col("b")).as("mb"))
      .select(col("a").as("id"), least(col("a"), col("mb")).as("lbl"))
      .truncated
    // Convergence via the label-sum invariant: every round takes a
    // per-id MIN, so labels are monotonically non-increasing and the
    // (exact, decimal) sum is unchanged iff every label is unchanged —
    // one cheap aggregate on the just-checkpointed frame instead of a
    // join against the previous round's labels.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 50) {
      val prop = edges
        .join(labels.withColumnRenamed("id", "b2"),
          col("b") === col("b2"))
        .select(col("a").as("id"), col("lbl"))
      val next = labels
        .union(prop)
        .groupBy("id")
        .agg(min("lbl").as("lbl"))
        .truncated
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      rounds += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Incremental connected components for streaming near-dup state: fold
    * a batch of near-dup pairs into a lake-resident label table at
    * `labelsPath` (doc_id, cluster_id), so cluster decisions stay
    * current as pair batches arrive (the CC analog of the q73 pattern:
    * state lives in the LAKE, zero streaming state). The final table
    * after any sequence of batches equals [[duplicateClusters]] on the
    * union of all batches — labels store each component's MIN id, so an
    * (id → label) edge set reconstructs old components exactly and new
    * edges union-find through them; the merged min is the global min.
    *
    * Per-batch COMPUTE is bounded by the TOUCHED components, not the
    * graph: ids in the batch resolve to their clusters, only those
    * clusters' members enter the merge CC (as star edges to their
    * label), and every untouched row passes through without joining the
    * iteration. Per-batch WRITE I/O is bounded the same way: the label
    * table is stored hive-partitioned by `bucket = pmod(doc_id,
    * numBuckets)`, and a merge rewrites ONLY the buckets holding rows
    * of touched clusters (plus new ids) via dynamic partition
    * overwrite — untouched partitions' files are never opened for
    * write, so at a 10B-doc corpus a micro-batch costs O(touched), not
    * a full label-table rewrite. Cross-bucket clusters stay correct by
    * construction: every member of a touched cluster appears in the
    * merge output, so every bucket holding one is rewritten. The one
    * residual full-table cost is the member-resolution READ
    * (cluster_id is not the partition key); it is column-pruned, and
    * for micro-batch-sized touch sets the touched cluster ids are
    * pushed as an IN filter so parquet row-group stats skip unaffected
    * files (partitions are written sorted by cluster_id to keep those
    * stats tight). The swap itself rides Spark's dynamic-partition
    * commit protocol — staged then committed, old files intact until
    * commit — replacing the previous delete-then-rename window. */
  def mergeClusterBatch(
      labelsPath: String,
      pairs: DataFrame,
      numBuckets: Int = 64
  ): Unit = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(labelsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val edges = pairs.select(col("id1"), col("id2"))
    // The merge subgraph (touched clusters' members + the batch's
    // edges) is bounded by the TOUCH SET by construction — micro-batch
    // scale. Below this cap the CC is a driver hashmap fold instead of
    // the distributed loop's ~10 scheduled jobs per round (measured:
    // d28 8.2 s -> the loop was pure per-round latency at this size);
    // above it the checkpointed loop takes over, so a pathological
    // batch cannot pull an unbounded subgraph onto the driver.
    val SmallCap = 200000
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("bucket",
        pmod(col("doc_id"), lit(numBuckets.toLong)).cast("int"))
    def bucketOf(id: Long): Int =
      (((id % numBuckets) + numBuckets) % numBuckets).toInt
    val bootstrap = !fs.exists(root) ||
      graft.lake.SchemaTools.listDataFiles(spark, labelsPath).isEmpty
    val next: DataFrame =
      if (bootstrap) {
        val local = edges.limit(SmallCap + 1).collect()
        if (local.length <= SmallCap)
          withBucket(unionFind(local.iterator
              .map(r => (r.getLong(0), r.getLong(1)))).toSeq
            .toDF("doc_id", "cluster_id"))
        else withBucket(duplicateClusters(edges))
      } else {
        val labels = spark.read.parquet(labelsPath)
          .select("doc_id", "cluster_id", "bucket")
        val localEdges = edges.limit(SmallCap + 1).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        // resolving batch ids -> clusters only needs the batch ids' own
        // buckets: a partition-pruned lookup, O(batch), never the table.
        // Member resolution pushes the touched cluster ids as an IN
        // filter (parquet row-group skipping over cluster_id-sorted
        // partitions does the pruning). Only meaningful when the edge
        // sample is complete (within the cap).
        lazy val touchedIds = localEdges.iterator
          .flatMap(e => Iterator(e._1, e._2)).toArray.distinct
        lazy val batchBuckets = touchedIds.map(bucketOf).distinct.toSeq
        lazy val touchedArr = boundedIdFilter(
          labels.filter(col("bucket").isin(batchBuckets: _*)),
          "doc_id", touchedIds.toSeq)
          .select("cluster_id").distinct()
          .collect().map(_.getLong(0))
        lazy val members = boundedIdFilter(labels, "cluster_id",
          touchedArr.toSeq)
          .select("doc_id", "cluster_id")
        lazy val localMembers = members.limit(SmallCap + 1).collect()
        if (localEdges.length <= SmallCap &&
            localMembers.length <= SmallCap) {
          val merged = unionFind(
            localMembers.iterator.map(r => (r.getLong(0), r.getLong(1)))
              ++ localEdges.iterator).toSeq
          // rewrite set = buckets holding any merged row; carry over the
          // untouched-cluster rows sharing those buckets (their
          // partitions are replaced wholesale)
          val touchedBuckets = merged.map(m => bucketOf(m._1)).distinct
          val touchedSet = touchedArr.toSeq
          val keep = boundedIdFilter(
            labels.filter(col("bucket").isin(touchedBuckets: _*)),
            "cluster_id", touchedSet, negate = true)
          keep.unionByName(
            withBucket(merged.toDF("doc_id", "cluster_id")))
        } else {
          // oversized touch set: the fully distributed formulation
          // (NOT via `lookup` — its bucket pruning came from the
          // truncated edge sample above)
          val touchedClusters = labels
            .join(edges
              .select(explode(array(col("id1"), col("id2"))).as("doc_id"))
              .distinct(), Seq("doc_id"))
            .select("cluster_id").distinct()
          val bigMembers =
            labels.join(touchedClusters, Seq("cluster_id"), "left_semi")
          val merged = withBucket(duplicateClusters(
            bigMembers
              .select(col("doc_id").as("id1"), col("cluster_id").as("id2"))
              .unionByName(edges)))
          val touchedBuckets = merged.select("bucket").distinct()
            .collect().map(_.getInt(0)).toSeq // <= numBuckets
          val keep = labels
            .filter(col("bucket").isin(touchedBuckets: _*))
            .join(touchedClusters, Seq("cluster_id"), "left_anti")
            .select("doc_id", "cluster_id", "bucket")
          keep.unionByName(merged.select("doc_id", "cluster_id", "bucket"))
        }
      }
    // one task per touched bucket -> one file per rewritten partition,
    // sorted by cluster_id so the member-resolution IN filter above
    // prunes on row-group stats next batch; width bounded by the bucket
    // count, not the session shuffle width (a merge rewrites at most
    // numBuckets partitions — scheduling more tasks is pure overhead)
    next
      .repartition(math.min(numBuckets, 64), col("bucket"))
      .sortWithinPartitions("cluster_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(labelsPath)
  }

  /** Membership filter on a long id set that stays PLAN-BOUNDED: below
    * [[IsinLiteralCap]] the ids inline as an `isin` IN-list (what buys
    * parquet row-group skipping over the cluster_id-sorted label
    * partitions), above it they become a BROADCAST semi/anti join — a
    * 400k-literal IN-list is a multi-megabyte plan serialized to every
    * task, while the broadcast ships once as data. The SmallCap bounds
    * how large the set can get (≤ 2×cap ids); this bounds what any
    * size under that cap does to the PLAN. */
  private[graft] def boundedIdFilter(
      df: DataFrame,
      colName: String,
      ids: Seq[Long],
      negate: Boolean = false
  ): DataFrame =
    if (ids.length <= IsinLiteralCap) {
      if (negate) df.filter(!col(colName).isin(ids: _*))
      else df.filter(col(colName).isin(ids: _*))
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val idsDf = broadcast(ids.toDF("__graft_id"))
      df.join(idsDf, col(colName) === col("__graft_id"),
        if (negate) "left_anti" else "left_semi")
    }

  private[graft] val IsinLiteralCap = 4096

  /** Min-label union-find (path compression + union-by-min-root) for
    * micro-batch-scale merge subgraphs — returns id -> component min
    * id, the same labeling invariant as [[duplicateClusters]]. */
  private def unionFind(
      edges: Iterator[(Long, Long)]
  ): scala.collection.mutable.Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) {
        val n = parent(c); parent(c) = r; c = n
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val out = scala.collection.mutable.Map[Long, Long]()
    parent.keysIterator.foreach(k => out(k) = find(k))
    out
  }

  /** Embedding-cosine near-dup dedup decisions (SemDeDup-style semantic
    * dedup): SRP-bucketed candidate pairs above `threshold`
    * (Similarity.srpNearPairs — keyed join, never all-pairs) -> connected
    * components -> keep the min-id representative per cluster.
    *
    * Returns (vec_id, cluster_id, keep) for every id appearing in some
    * near-pair; ids absent from the result are singletons (implicitly
    * kept). Deterministic planes make the whole decision oracle-
    * verifiable cross-engine (e05). For an exact-pair audit at bounded
    * scale, feed Similarity.cosinePairs output to [[duplicateClusters]]
    * directly. `nBits = -1` auto-derives the bucket count from corpus
    * size (Similarity.autoSrpBits) so same-bucket pair work stays
    * bounded as data grows. */
  def embeddingDedup(
      emb: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      nBits: Int = -1,
      nTables: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val pairs = Similarity.srpNearPairs(
      emb, dim, idCol, vecCol, threshold, nBits, nTables, seed)
    duplicateClusters(pairs.select("id1", "id2"))
      .select(
        col("doc_id").as("vec_id"),
        col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"))
  }

  /** SimHash signature width: 56 bits of the 62-bit portable token hash —
    * divisible by the pigeonhole chunk counts for maxDist ∈ {1,3,6,7,13}
    * and verifiable bit-for-bit by the DuckDB oracle (d07). */
  val SimhashBits: Int = 56

  /** SimHash over a precomputed array of token hashes: per bit, sum +1/-1
    * by that bit of each token hash; sign -> bit. One native pass over
    * the hash array (SimHashExpr) — no shuffle at all for signatures, and
    * no interpreted per-bit lambda scans (the 56-aggregate formulation
    * was the d07 bench bottleneck). The DuckDB oracle (d07Oracle)
    * reproduces the same votes with list_reduce. */
  def simhashFromHashes(hashes: Column, bits: Int = SimhashBits): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.SimHashExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(hashes), bits))

  /** SimHash of a text column (portable token hashes). */
  def simhash(text: Column): Column =
    simhashFromHashes(
      transform(TextFunctions.tokens(text), t => TextFunctions.tokenHash62(t)))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by the
    * pigeonhole band trick: split the signature into `maxDist + 1` chunks
    * — any pair within distance shares at least one exact chunk, so the
    * join is keyed on (chunk index, chunk value), never all-pairs. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3
  ): DataFrame = {
    val chunks = maxDist + 1
    require(SimhashBits % chunks == 0,
      s"maxDist+1 must divide $SimhashBits")
    val bitsPer = SimhashBits / chunks
    val sigs = df
      .select(
        col(idCol).as("doc"),
        transform(TextFunctions.tokens(col(textCol)),
          t => TextFunctions.tokenHash62(t)).as("__th"))
      .select(col("doc"), simhashFromHashes(col("__th")).as("sig"))
    val chunkCols = (0 until chunks).map(c =>
      shiftright(col("sig"), c * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1)))
    val chunked = sigs.select(
      col("doc"),
      col("sig"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "chunk_val"))
    )
    chunked
      .as("a")
      .join(
        chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc") < col("b.doc")
      )
      .select(
        col("a.doc").as("id1"),
        col("b.doc").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long")
          .as("hamming")
      )
      .dropDuplicates("id1", "id2")
      .filter(col("hamming") <= maxDist)
  }

  /** C4-style BOILERPLATE removal — the frequency rule, not the dedup
    * rule: a `k`-token segment that appears in at least `minDf`
    * DISTINCT documents is boilerplate (headers, footers, license
    * blurbs, navigation chrome) and is removed from EVERY document —
    * including the first (contrast [[segmentDedup]], which keeps one
    * occurrence: dedup preserves content, boilerplate removal deletes
    * it everywhere; C4 discards lines repeating >= 3 times, CCNet's
    * per-shard hashes drop repeated paragraphs the same way). Returns
    * one row per doc: (idCol, n_segments, n_boiler, clean_text).
    *
    * 100 TB shape: segmentation is the [[segmentDedup]] projection
    * (one explode, no joins); the DF table is one keyed
    * countDistinct agg (map-side partial over (seg, doc) pairs); the
    * removal is a keyed LEFT ANTI join on the segment text — never a
    * broadcast of the corpus, and the reassembly agg is keyed by doc.
    * A hot segment concentrates its DF count, not its reassembly:
    * docs rebuild from their OWN surviving segments only. */
  def boilerplateRemove(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minDf: Int = 3
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    val segs = base
      .select(col("__id"), col("__tk"),
        explode(expr(s"sequence(0, (size(__tk) - 1) div $k)"))
          .as("__gi"))
      .select(col("__id"), col("__gi").cast("long").as("seg_idx"),
        concat_ws(" ", slice(col("__tk"), col("__gi") * k + 1, lit(k)))
          .as("seg"))
    val boiler = segs
      .groupBy("seg")
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select("seg")
    val rebuilt = segs.join(boiler, Seq("seg"), "left_anti")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg"))).as("clean_text"))
    base
      .select(col("__id"),
        (expr(s"(size(__tk) - 1) div $k") + 1).cast("long")
          .as("n_segments"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L)))
          .as("n_boiler"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** NEAR-dup segment dedup — the fuzzy sibling of [[segmentDedup]]:
    * docs split into `k`-token segments, a segment is DROPPED iff some
    * segment with n-gram Jaccard >= `threshold` precedes it in (doc,
    * position) order (the arrival-order rule the incremental gates
    * use — deterministic without a clustering pass), and docs are
    * reassembled from survivors. Exact duplicates score 1.0, so this
    * subsumes [[segmentDedup]]'s rule at the same k; boilerplate that
    * mutates a token or two (the case exact matching misses) now dies
    * too.
    *
    * 100 TB shape: candidates come from [[ngramJaccardPairs]] on the
    * SEGMENT table — keyed shingle join under the DF cap, never
    * all-pairs; the drop set is one distinct projection of it; the
    * reassembly is d29's collect_list-per-doc (bounded by doc length).
    * Segment ids pack as `doc_id * 1024 + seg_idx` (doc length caps
    * seg_idx far below 1024 at our k), so pair order = (doc, position)
    * order. */
  def segmentNearDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 12,
      n: Int = 3,
      threshold: Double = 0.6
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    val segs = base
      .select(col("__id"), col("__tk"),
        explode(expr(s"sequence(0, (size(__tk) - 1) div $k)"))
          .as("__gi"))
      .select(col("__id"), col("__gi").cast("long").as("seg_idx"),
        concat_ws(" ", slice(col("__tk"), col("__gi") * k + 1, lit(k)))
          .as("seg"))
      .withColumn("sid", col("__id") * 1024L + col("seg_idx"))
    val pairs = ngramJaccardPairs(segs, "sid", "seg", n, threshold)
    val dropped = pairs.select(col("id2").as("sid")).distinct()
    val winners = segs.join(dropped, Seq("sid"), "left_anti")
    val rebuilt = winners
      .groupBy("__id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg"))).as("clean_text"))
    base
      .select(col("__id"),
        (expr(s"(size(__tk) - 1) div $k") + 1).cast("long")
          .as("n_segments"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Cluster-representative selection: given near-dup CC labels
    * (`clusters`: idCol, cluster_id — [[duplicateClusters]] output) and a
    * per-doc score (`scored`: idCol, scoreCol), keep the BEST-scoring
    * member of every cluster instead of the arbitrary min-id one —
    * "when near-dups collide, keep the highest-quality copy", the
    * refinement most production dedup recipes apply on top of keep-any.
    * Tie-break on lowest id so the choice is deterministic.
    *
    * 100 TB shape: one keyed equi-join (labels × scores, both keyed by
    * doc id) and ONE `min(struct)` aggregate per cluster — the same
    * map-side-combining agg d29 uses, so hot clusters partial-aggregate
    * before the exchange; no window over the full corpus, nothing
    * driver-side. Returns (cluster_id, kept_doc, kept_score,
    * n_members). */
  def bestPerCluster(
      clusters: DataFrame,
      scored: DataFrame,
      idCol: String,
      scoreCol: String
  ): DataFrame = {
    clusters
      .join(scored.select(col(idCol), col(scoreCol)), Seq(idCol))
      // min(struct(-score, id)): max score, then min id — one aggregate
      // with partial (map-side) combine, unlike a row_number window
      .groupBy(col("cluster_id"))
      .agg(
        min(struct((-col(scoreCol)).as("ns"), col(idCol).as("kid")))
          .as("best"),
        count(lit(1)).as("n_members"))
      .select(
        col("cluster_id"),
        col("best.kid").as("kept_doc"),
        (-col("best.ns")).as("kept_score"),
        col("n_members"))
  }
}
