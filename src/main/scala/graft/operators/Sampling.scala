package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Data-mixture sampling for training-corpus assembly: rebalance a
  * corpus across strata (language, source domain) by temperature-scaled
  * deterministic downsampling — the "multilingual mixing" step of
  * large-scale pretraining data prep (alpha-smoothed sampling of
  * Conneau & Lample 2019).
  */
object Sampling {

  /** Temperature-scaled stratum rebalancing: stratum `l` with `n_l` rows
    * gets target weight `n_l^alpha` (alpha < 1 flattens the skew), so
    * the per-row acceptance rate is `n_l^(alpha-1)` normalized to 1.0 at
    * the smallest stratum — the rarest stratum keeps everything, the
    * head is thinned toward the flattened mix. Acceptance is a
    * DETERMINISTIC pure function of the row id (a 31-bit LCG step,
    * pmod-bounded so ANSI mode cannot overflow for any long id), never
    * `rand()`: re-runs, retries, and replays pick the same rows, so the
    * sample is reproducible lake-wide.
    *
    * Returns the accepted rows as (idCol, stratumCol, rate).
    *
    * 100 TB shape: stratum counts are one map-side-partial agg producing
    * a FRAME OF |strata| ROWS; the rate computation is a window over
    * that tiny frame (single partition of a handful of rows — NOT a
    * window over the data), and the rates join back BROADCAST. The scan
    * side is one filter of pure row-local arithmetic: no shuffle of the
    * corpus at all.
    *
    * Dyadic alphas stay engine-portable: alpha = 0.5 computes the rate
    * via one `sqrt`, alpha = 0.75 via `sqrt(sqrt(...))` — each sqrt is
    * IEEE-correctly-rounded, so ANY engine composing the same sqrts
    * gets bit-identical rates (both are oracle-gated: d30, d31). Other
    * alphas go through `pow`, whose libm implementations may differ in
    * the last ulp across engines (spec-level determinism only). */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      alpha: Double = 0.5,
      modulus: Long = 1000000L
  ): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
    // per-stratum rate normalized to the smallest stratum; the window's
    // single flat partition holds |strata| rows, not data rows
    val minN = min(col("__n")).over(Window.partitionBy())
    val ratio = col("__minn").cast("double") / col("__n").cast("double")
    val rates = counts
      .withColumn("__minn", minN)
      .withColumn("rate",
        if (alpha == 0.5) sqrt(ratio)
        else if (alpha == 0.75) sqrt(sqrt(ratio))
        else pow(ratio, 1.0 - alpha))
      .select(col(stratumCol), col("rate"))
    val p = 2147483647L // 2^31 - 1
    // integral ids feed the LCG directly (portable, oracle-gradeable);
    // any other id type would cast to null under non-ANSI and silently
    // filter EVERYTHING out, so hash it to a long first (xxhash64 —
    // deterministic within Spark, spec-gated rather than oracle-gated)
    val idAsLong = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(idCol)
      case _ => xxhash64(col(idCol))
    }
    val hash = pmod(
      pmod(idAsLong, lit(p)) * 1103515245L + 12345L, lit(p))
    df.join(broadcast(rates), stratumCol)
      .filter(pmod(hash, lit(modulus)) <
        floor(col("rate") * modulus.toDouble).cast("long"))
      .select(col(idCol), col(stratumCol), col("rate"))
  }

  /** Leakage-safe train/test split: the split is a deterministic
    * function of the CLUSTER id (the near-dup component label, e.g.
    * [[Dedup.duplicateClusters]] output), not the document id — so two
    * near-duplicate documents can NEVER straddle the boundary and leak
    * training text into the eval set (Lee et al. 2022 document exactly
    * this contamination mode for C4/Wiki40B eval splits).
    *
    * Same 31-bit LCG as [[mixtureSample]] (pmod-bounded, ANSI-safe,
    * engine-portable): `trainOf10`/10 of clusters go to train. A pure
    * row-local projection — zero shuffle beyond whatever produced the
    * labels. */
  def clusterSplit(
      labels: DataFrame,
      clusterCol: String = "cluster_id",
      trainOf10: Int = 8
  ): DataFrame = {
    require(trainOf10 >= 1 && trainOf10 <= 9, "trainOf10 in [1,9]")
    val p = 2147483647L
    val hash = pmod(
      pmod(col(clusterCol), lit(p)) * 1103515245L + 12345L, lit(p))
    labels.withColumn("split",
      when(pmod(hash, lit(10L)) < trainOf10, lit("train"))
        .otherwise(lit("test")))
  }

  /** Deterministic EPOCH SHUFFLE + shard assignment — the training
    * export step: every epoch needs a different but REPRODUCIBLE
    * permutation of the corpus, materialized as `nShards` balanced
    * shards whose within-shard order is part of the contract (the
    * WebDataset/loader convention: shards are the unit of parallel
    * reading, order within a shard is the read order).
    *
    * Scale shape: there is NO global sort and NO global rank — a
    * global row_number would funnel the corpus through one partition.
    * The shard id is a row-local hash (epoch-salted LCG, the d11/d12
    * portable family), so assignment is a projection; the only
    * shuffle is the per-shard hash partition any sharded write pays,
    * and the within-shard position is a window per shard (the
    * parallel unit, ~corpus/nShards rows each). Balance is hash
    * balance: ±O(sqrt) per shard, asserted in the oracle query.
    *
    * Epoch-distinctness comes from salting the hash, not re-seeding a
    * PRNG stream: h(id, e) = ((id mod P)·1103515245 + e·1000003 +
    * 12345) mod P — cross-engine exact (all operands < 2^62). */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      epoch: Long,
      nShards: Int
  ): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val p = 2147483647L
    val h = pmod(
      pmod(col(idCol), lit(p)) * lit(1103515245L) +
        lit(epoch) * lit(1000003L) + lit(12345L), lit(p))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
