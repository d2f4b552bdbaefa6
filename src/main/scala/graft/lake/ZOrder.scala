package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of several
  * range-normalized columns so rows close in EVERY dimension land close
  * in the one-dimensional file order — the multi-column data-skipping
  * layout (Delta `OPTIMIZE ... ZORDER BY`; Iceberg z-sort). A linear
  * sort gives perfect skipping on its leading column and none on the
  * rest; the z-curve gives each of `c` columns ~`files^(1/c)`-way
  * skipping, which is what parquet row-group min/max stats prune on.
  *
  * Everything is plain `functions._` bit arithmetic (shift/and/or) —
  * fully codegen'd, no UDF — and the only non-row-local work in
  * [[cluster]] is one tiny min/max agg plus the range repartition that
  * any layout rewrite needs anyway.
  */
object ZOrder {

  /** Morton z-value of `cols`: each column is range-normalized to
    * `bits` bits via its [min, max] span (proportional bucketing — O(1)
    * per row after one agg, the documented trade vs. rank-normalized
    * ntile which would cost a global sort per column), then bit `i` of
    * column `j` lands at z-bit `i * c + j`. Degenerate spans (min ==
    * max, or a null bound from an all-null column) normalize to bucket
    * 0 rather than dividing by zero. Nulls in a row normalize to bucket
    * 0 — they cluster together at the curve's origin. */
  def zvalue(
      cols: Seq[Column],
      mins: Seq[Double],
      maxs: Seq[Double],
      bits: Int = 16
  ): Column = {
    require(cols.nonEmpty && cols.size == mins.size &&
      cols.size == maxs.size, "cols/mins/maxs must align")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * cols must fit a long, got $bits * ${cols.size}")
    val c = cols.size
    val maxB = (1L << bits) - 1
    val buckets = cols.lazyZip(mins).lazyZip(maxs).map { (cl, mn, mx) =>
      val dv = cl.cast("double")
      val b =
        if (mx > mn)
          floor((dv - lit(mn)) * lit(maxB.toDouble) / lit(mx - mn))
            .cast("long")
        else lit(0L)
      coalesce(b, lit(0L))
    }
    (0 until bits)
      .flatMap { i =>
        buckets.zipWithIndex.map { case (b, j) =>
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * c + j)
        }
      }
      .reduce(_ bitwiseOR _)
  }

  /** Re-cluster `df` along the z-curve of `zCols` into `numFiles`
    * range partitions, rows sorted by z-value within each. Content is a
    * multiset no-op; only the row→file layout changes. The min/max agg
    * is one job returning 2·c doubles to the driver (bounded); the
    * repartition is the one shuffle any layout rewrite pays. */
  def cluster(
      df: DataFrame,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16
  ): DataFrame = {
    require(numFiles >= 1, "numFiles must be positive")
    val aggs = zCols.flatMap(n =>
      Seq(min(col(n).cast("double")).as(s"__mn_$n"),
        max(col(n).cast("double")).as(s"__mx_$n")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def dOrNaN(i: Int) = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    val mins = zCols.indices.map(i => dOrNaN(2 * i))
    val maxs = zCols.indices.map(i => dOrNaN(2 * i + 1))
    val z = zvalue(zCols.map(col), mins, maxs, bits)
    df.withColumn("__zval", z)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
  }
}
