package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deliberate hot-key control for joins whose key distribution is too
  * skewed for one task: AQE's runtime skew-join split covers sort-merge
  * cases after the fact, but when a handful of keys hold a large share of
  * a 100 TB table it is cheaper to salt up front.
  *
  * The build (right) side is exploded `factor`× across all salt values and
  * the probe (left) side gets one salt per row, so each hot key's rows
  * spread over `factor` tasks. Result is exactly the unsalted join; cost
  * is a factor-× blowup of the smaller side only.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      factor: Int = 8
  ): DataFrame = {
    require(factor > 0, "factor must be positive")
    // Salt assignment only needs uniformity, not cross-run stability:
    // monotonically_increasing_id is per-partition-sequential, so its
    // pmod spreads each key's rows evenly.
    val salted = left.withColumn(
      "__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val exploded = right.withColumn(
      "__salt",
      explode(array((0 until factor).map(lit(_)): _*)))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
