package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: place every document at a deterministic global
  * token offset (concat-and-chunk, the standard LLM pre-training layout
  * — documents concatenated in a canonical order, then cut into
  * fixed-size context windows).
  *
  * The global running sum is computed as a DISTRIBUTED prefix sum, not a
  * single-partition window:
  *
  *  1. strip id = high bits of the row's content hash — a deterministic
  *     range partitioning of the hash space. No sampled RangePartitioner
  *     boundaries, so two passes over the input agree without a
  *     checkpoint (sampling would make strip membership run-dependent),
  *     and a uniform hash gives balanced strips by construction.
  *  2. within-strip running sums: a window PARTITIONED by strip — every
  *     strip sorts and scans in parallel.
  *  3. strip totals (one row per strip) get a tiny global prefix window
  *     (nStrips rows on one partition — the only serial step, O(2^stripBits))
  *     and broadcast back as per-strip base offsets.
  *
  * Strips are hash RANGES, so strip s's rows all precede strip s+1's in
  * the global (hash, id) order — step 3's base offsets make the
  * composition exactly equal to one global ordered prefix sum, which is
  * how the DuckDB oracle states it (d21). At 100 TB: two scans of the
  * weight column (strip totals + window), one keyed exchange at
  * `2^stripBits` width, one broadcast of nStrips rows; set `stripBits`
  * so `2^stripBits` ≈ cluster cores.
  */
object Pack {

  /** Adds `start_off`: the row's global token offset under the canonical
    * (hashCol, idCol) order. `hashCol` must be a non-negative hash
    * strictly below `2^hashBits` (the portable char-fold family is
    * < 2^31); idCol breaks hash ties, so the order is total. */
  def packOffsets(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      hashCol: String,
      hashBits: Int = 31,
      stripBits: Int = 5,
      strataCols: Seq[String] = Nil
  ): DataFrame = {
    require(stripBits >= 0 && stripBits < hashBits,
      s"stripBits $stripBits must be in [0, hashBits=$hashBits)")
    val pid = shiftright(col(hashCol), hashBits - stripBits)
    // strip totals from a plain rescan (map-side partial agg, tiny
    // shuffle) — cheaper than reusing the windowed frame, and both
    // passes assign strips by pure arithmetic so they always agree
    val strata = strataCols.map(col)
    val totals = df
      .groupBy((strata :+ pid.as("__pid")): _*)
      .agg(sum(col(weightCol)).as("__tot"))
    // With strata: one independent offset space per stratum (the
    // multi-tenant layout — e.g. one packed stream per language), so
    // the serial prefix runs per stratum over its 2^stripBits strip
    // totals. Without: one global space, single tiny partition.
    val wStrip = (if (strataCols.nonEmpty)
        Window.partitionBy(strataCols.map(col): _*)
      else Window.partitionBy())
      .orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = totals
      .withColumn("__before", sum(col("__tot")).over(wStrip) - col("__tot"))
      .select((strata :+ col("__pid")) :+ col("__before"): _*)
    val wIn = Window
      .partitionBy((strata :+ col("__pid")): _*)
      .orderBy(col(hashCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pid", pid)
      .withColumn("__cum_in", sum(col(weightCol)).over(wIn))
      .join(broadcast(prefixes), strataCols :+ "__pid")
      .withColumn("start_off",
        col("__before") + col("__cum_in") - col(weightCol))
      .drop("__pid", "__cum_in", "__before")
  }

  /** [[packOffsets]] plus the context-window placement: which fixed
    * `window`-token chunks the row's span [start_off, start_off+weight)
    * touches. All chunk arithmetic is integral (`div`), so the values
    * hash-match any engine. Weights must be >= 1 (an empty span has no
    * chunks; tokenizers never emit 0 — `split` of the empty string is
    * `[""]` — but a synthetic 0-weight row would get last < first). */
  def packChunks(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      hashCol: String,
      window: Int,
      hashBits: Int = 31,
      stripBits: Int = 5,
      strataCols: Seq[String] = Nil
  ): DataFrame =
    packOffsets(df, idCol, weightCol, hashCol, hashBits, stripBits,
      strataCols)
      .withColumn("first_chunk", expr(s"start_off div $window"))
      .withColumn("last_chunk",
        expr(s"(start_off + $weightCol - 1) div $window"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1L)
}
