package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-time data-quality expectations — the Delta-constraints /
  * DLT-expectations analog the reference has no equivalent of: each rule
  * is a named SQL predicate, rows proving ALL of them are accepted, and
  * every other row is QUARANTINED carrying the names of the rules it
  * violated (in rule order), so bad batches are preserved for triage
  * instead of silently dropped or fatally rejected.
  *
  * Semantics: a NULL predicate result is a violation — constraint logic,
  * the row failed to PROVE the expectation (`coalesce(pred, false)`),
  * matching SQL `CHECK` behavior rather than `WHERE` behavior.
  *
  * 100 TB shape: the violation vector is ONE row-local projection (an
  * array of `when` flags filtered non-null — no shuffle, no per-rule
  * pass); the split is two filters over the same scan, and each side
  * then takes whatever write path the caller composes (the accepted
  * side usually a [[LakeWriter]] delta mode — gates stack). */
object Expectations {

  final case class Rule(name: String, predicate: String)

  /** Split into (accepted — original schema, quarantined — plus a
    * `violated` array<string> of failed rule names). */
  def screen(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "expectations need at least one rule")
    val flags = array(rules.map(r =>
      when(!coalesce(expr(r.predicate), lit(false)), lit(r.name))
        .otherwise(lit(null).cast("string"))): _*)
    val withV = df.withColumn("violated", filter(flags, _.isNotNull))
    val accepted =
      withV.filter(size(col("violated")) === 0).drop("violated")
    val quarantined = withV.filter(size(col("violated")) > 0)
    (accepted, quarantined)
  }

  /** Gate a write: accepted rows go to `path` through `writer`
    * (composing with its mode — delta gates stack on top), quarantined
    * rows append to `quarantinePath` with `violated` flattened to a
    * comma-joined string (stable parquet schema). */
  def writeWith(
      writer: LakeWriter,
      df: DataFrame,
      rules: Seq[Rule],
      quarantinePath: String
  ): Unit = {
    val (accepted, quarantined) = screen(df, rules)
    writer.write(accepted)
    val q = quarantined
      .withColumn("violated", concat_ws(",", col("violated")))
    if (!q.isEmpty)
      q.write.mode("append").option("compression", "zstd")
        .parquet(quarantinePath)
  }
}
