package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-column sort with per-column direction
  * (`/root/reference/src/pydala/utils/table.py:95-132`). */
final case class SortSpec(cols: Seq[String], ascending: Seq[Boolean]) {
  require(
    ascending.isEmpty || ascending.length == cols.length,
    "ascending must be empty (all-asc) or match cols"
  )
  def directions: Seq[(String, Boolean)] = {
    val asc = if (ascending.isEmpty) Seq.fill(cols.length)(true) else ascending
    cols.zip(asc)
  }
  def sortCols: Seq[Column] = directions.map { case (c, a) =>
    if (a) col(c).asc_nulls_first else col(c).desc_nulls_last
  }
  def reversed: SortSpec =
    SortSpec(cols, directions.map(d => !d._2))
}

object SortSpec {
  def asc(cols: String*): SortSpec = SortSpec(cols, Seq.fill(cols.length)(true))
}

/** Keyed deduplication: keep first/last row per key subset after an
  * optional presort (`/root/reference/src/pydala/utils/table.py:230-288`).
  *
  * The reference's polars `groupby.agg(first)` after sort is
  * order-dependent; the deterministic Spark formulation is a window
  * `row_number` over `partitionBy(subset).orderBy(presort)`. At 100 TB this
  * is one shuffle on the key subset — the same cost as any keyed aggregate.
  */
final case class DistinctSpec(
    subset: Seq[String],
    keepLast: Boolean = false,
    presort: Option[SortSpec] = None
)

/** The reference's declarative drop -> distinct -> sort pipeline applied on
  * read and write (`/root/reference/src/pydala/dataset/base.py:77-142` —
  * note the fixed order at `base.py:118-142`). */
final case class Pipeline(
    dropCols: Seq[String] = Nil,
    distinct: Option[Either[Unit, DistinctSpec]] = None,
    sort: Option[SortSpec] = None
) {

  def drop(cols: String*): Pipeline = copy(dropCols = dropCols ++ cols)

  /** Full-row distinct (`utils/table.py:247-249`). */
  def distinctAll(): Pipeline = copy(distinct = Some(Left(())))

  /** Subset-keyed keep-first/last (`utils/table.py:252-288`). */
  def distinctOn(
      subset: Seq[String],
      keepLast: Boolean = false,
      presort: Option[SortSpec] = None
  ): Pipeline =
    copy(distinct = Some(Right(DistinctSpec(subset, keepLast, presort))))

  def sortBy(cols: Seq[String], ascending: Seq[Boolean] = Nil): Pipeline =
    copy(sort = Some(SortSpec(cols, ascending)))

  def apply(df: DataFrame): DataFrame = {
    // 1. drop (tolerant of absent names, `utils/table.py:291-333`)
    val present = df.columns.toSet
    val d1 = df.drop(dropCols.filter(present.contains): _*)
    // 2. distinct
    val d2 = distinct match {
      case None => d1
      case Some(Left(_)) => d1.dropDuplicates()
      case Some(Right(spec)) =>
        // "keep last after sort" == "keep first after reversed sort":
        // one window pass either way. With no presort the reference keeps
        // an arbitrary row (polars groupby order); we instead order by all
        // non-key columns so keep-first/last is well-defined and stable
        // across runs and partitionings. If every column is a key, the
        // rows within a partition are identical and any pick is exact.
        val base = spec.presort.getOrElse {
          val rest = d1.columns.filterNot(spec.subset.contains).toSeq
          SortSpec.asc((if (rest.nonEmpty) rest else spec.subset): _*)
        }
        val order = if (spec.keepLast) base.reversed else base
        val w = Window
          .partitionBy(spec.subset.map(col): _*)
          .orderBy(order.sortCols: _*)
        d1.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
    }
    // 3. sort
    sort match {
      case Some(ss) => d2.sort(ss.sortCols: _*)
      case None => d2
    }
  }
}
