package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.ObjectMapper

/** Hidden (transform) partitioning with partition-spec evolution.
  *
  * The reference partitions only on verbatim column values
  * (`/root/reference/src/pydala/dataset/writer.py:295-324` passes
  * `partition_by` columns straight to pyarrow) — so a query on the SOURCE
  * column of a derived layout (orders laid out by month, filtered by
  * date) prunes nothing unless the user manually adds and predicates the
  * derived column. This module closes that gap the way table formats at
  * 100 TB do (Iceberg's transform specs): the layout column is DERIVED
  * from a data column by a declared transform, persisted in
  * `_partition_spec.json`, and the reader converts predicates on the
  * source column into partition predicates automatically. Users never see
  * or mention the hidden column.
  *
  * Spec evolution: each transform gets its own `spec-<id>/` subtree; old
  * data stays in its layout, new writes land in the latest spec, and the
  * reader prunes EACH subtree with whatever transforms its own spec
  * admits — exactly the Iceberg contract (rewriting 100 TB to change a
  * partition scheme is not an option).
  *
  * Scale shape: pruning happens at file-listing time (Catalyst partition
  * pruning on the hidden hive column — the derived comparisons
  * constant-fold to literals), the residual predicate is always
  * re-applied, and an unprunable spec merely scans that spec's subtree.
  */
object HiddenPartitions {

  /** A derived partition transform over one source column. `expr` must be
    * deterministic and, for range pruning, `monotonic` over the source
    * ordering. */
  sealed trait Transform {
    def source: String
    def kind: String
    /** hidden hive column name — underscore prefix keeps it out of
      * SchemaTools' data-file listings and makes collisions impossible
      * (testdata columns never start with `_`). */
    def field: String = s"_p_${kind}_$source"
    def expr(c: Column): Column
    /** order-preserving transforms admit range pruning */
    def monotonic: Boolean
    def params: Map[String, Long] = Map.empty
  }

  /** Hash bucket — equality/IN pruning only. xxhash64 is Spark-native,
    * stable across sessions, and constant-folds on literals. The input is
    * canonicalized through a string cast first: hash functions are
    * TYPE-sensitive (xxhash64(42: int) != xxhash64(42L)), and a parsed
    * predicate literal usually carries a narrower type than the column —
    * the string image is width-agnostic, so both sides bucket alike. */
  final case class Bucket(n: Int, source: String) extends Transform {
    val kind = "bucket"
    def expr(c: Column): Column =
      pmod(xxhash64(c.cast("string")), lit(n.toLong))
    val monotonic = false
    override def params: Map[String, Long] = Map("n" -> n.toLong)
  }

  /** Months since epoch — range + equality pruning. */
  final case class Month(source: String) extends Transform {
    val kind = "month"
    def expr(c: Column): Column =
      (year(c) * 12 + month(c) - 1).cast("long")
    val monotonic = true
  }

  /** Days since epoch — range + equality pruning. */
  final case class Days(source: String) extends Transform {
    val kind = "days"
    def expr(c: Column): Column = datediff(c, to_date(lit("1970-01-01")))
      .cast("long")
    val monotonic = true
  }

  /** Integer width-truncate — range + equality pruning. */
  final case class Truncate(w: Long, source: String) extends Transform {
    val kind = "trunc"
    def expr(c: Column): Column = floor(c.cast("long") / w) * w
    val monotonic = true
    override def params: Map[String, Long] = Map("w" -> w)
  }

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def specPath(path: String) = new Path(path, "_partition_spec.json")

  /** Declare the first partition spec for a fresh dataset root. */
  def init(spark: SparkSession, path: String, t: Transform): Unit =
    writeSpecs(spark, path, Seq(t))

  /** Evolve to a new spec: old subtrees keep their layout, subsequent
    * writes use `t`. */
  def evolve(spark: SparkSession, path: String, t: Transform): Unit =
    writeSpecs(spark, path, readSpecs(spark, path) :+ t)

  def readSpecs(spark: SparkSession, path: String): Seq[Transform] = {
    val f = fs(spark, path)
    val p = specPath(path)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = mapper.readTree(txt)
    val out = scala.collection.mutable.ArrayBuffer[Transform]()
    node.get("specs").forEach { s =>
      val src = s.get("source").asText()
      s.get("kind").asText() match {
        case "bucket" => out += Bucket(s.get("n").asInt(), src)
        case "month" => out += Month(src)
        case "days" => out += Days(src)
        case "trunc" => out += Truncate(s.get("w").asLong(), src)
        case other =>
          throw new IllegalArgumentException(s"unknown transform: $other")
      }
    }
    out.toSeq
  }

  private def writeSpecs(
      spark: SparkSession,
      path: String,
      specs: Seq[Transform]
  ): Unit = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("specs")
    specs.foreach { t =>
      val n = arr.addObject()
      n.put("kind", t.kind)
      n.put("source", t.source)
      t.params.foreach { case (k, v) => n.put(k, v) }
    }
    val f = fs(spark, path)
    f.mkdirs(new Path(path))
    val out = f.create(specPath(path), true)
    try out.write(
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
  }

  private def specDir(path: String, id: Int) = s"$path/spec-$id"

  /** Write `df` under the LATEST spec's layout: derive the hidden column,
    * hive-partition by it, drop it from user sight. One distributed write,
    * no extra shuffle beyond the layout the user asked for. */
  def write(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      mode: String = "append"
  ): Unit = {
    val specs = readSpecs(spark, path)
    require(specs.nonEmpty, s"no partition spec at $path — call init() first")
    val t = specs.last
    df.withColumn(t.field, t.expr(col(t.source)))
      .write
      .partitionBy(t.field)
      .mode(mode)
      .parquet(specDir(path, specs.size - 1))
  }

  /** Read the whole dataset (all specs), pruning each spec's subtree with
    * whatever partition predicates its transform derives from `predicate`.
    * The residual predicate is ALWAYS re-applied on the result, so pruning
    * is a pure file-listing optimization — never a correctness input. */
  def read(
      spark: SparkSession,
      path: String,
      predicate: Option[String] = None
  ): DataFrame = {
    val specs = readSpecs(spark, path)
    require(specs.nonEmpty, s"no partition spec at $path — call init() first")
    val preds = predicate.map(extract(spark, _)).getOrElse(ColPreds.empty)
    val frames = specs.zipWithIndex.flatMap { case (t, id) =>
      val dir = specDir(path, id)
      if (!fs(spark, path).exists(new Path(dir))) None
      else {
        val base = spark.read.option("basePath", dir).parquet(dir)
        val pruned = partitionFilter(t, preds) match {
          case Some(f) => base.filter(f)
          case None => base
        }
        Some(pruned.drop(t.field))
      }
    }
    require(frames.nonEmpty, s"no data under any spec at $path")
    val all = frames.reduce(_ unionByName _)
    predicate.map(all.filter).getOrElse(all)
  }

  /** Extracted per-column predicate facts: equality/IN literal sets and
    * closed range bounds, as SQL literal strings (re-parsed via expr() so
    * the derived comparisons constant-fold inside Catalyst). */
  private[lake] final case class ColPreds(
      eqIn: Map[String, Seq[String]],
      lo: Map[String, String],
      hi: Map[String, String]
  )
  private[lake] object ColPreds { val empty = ColPreds(Map.empty, Map.empty, Map.empty) }

  /** Walk the predicate's top-level conjuncts for `col OP literal` facts.
    * Anything unrecognized is simply ignored (no pruning from it) — the
    * residual filter keeps correctness. */
  private[lake] def extract(spark: SparkSession, predicate: String): ColPreds = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Cast}
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(predicate)
      catch { case scala.util.control.NonFatal(_) => return ColPreds.empty }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.name)
      case Cast(c, _, _, _) => nameOf(c)
      case _ => None
    }
    def litSql(e: Expression): Option[String] = e match {
      case l: Literal => Some(l.sql)
      case Cast(l: Literal, _, _, _) => Some(l.sql)
      case _ => None
    }
    var eqIn = Map[String, Seq[String]]()
    var lo = Map[String, String]()
    var hi = Map[String, String]()
    def bound(
        ln: Option[String], rv: Option[String],
        rn: Option[String], lv: Option[String],
        greater: Boolean): Unit = {
      // col > lit  -> lower bound;  lit > col -> upper bound (mirrored)
      (ln, rv) match {
        case (Some(n), Some(v)) => if (greater) lo += n -> v else hi += n -> v
        case _ => (rn, lv) match {
          case (Some(n), Some(v)) => if (greater) hi += n -> v else lo += n -> v
          case _ =>
        }
      }
    }
    conjuncts(parsed).foreach {
      case EqualTo(a, b) =>
        (nameOf(a), litSql(b), nameOf(b), litSql(a)) match {
          case (Some(n), Some(v), _, _) => eqIn += n -> (eqIn.getOrElse(n, Nil) :+ v)
          case (_, _, Some(n), Some(v)) => eqIn += n -> (eqIn.getOrElse(n, Nil) :+ v)
          case _ =>
        }
      case In(a, vs) =>
        for (n <- nameOf(a); ss <- traverseOpt(vs.map(litSql)))
          eqIn += n -> (eqIn.getOrElse(n, Nil) ++ ss)
      // the parser emits BETWEEN as an unresolved 'between' call (the
      // Between expression is built later, at resolution)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") =>
        f.arguments match {
          case Seq(a, l, h) =>
            for (n <- nameOf(a)) {
              litSql(l).foreach(v => lo += n -> v)
              litSql(h).foreach(v => hi += n -> v)
            }
          case _ =>
        }
      case GreaterThan(a, b) => bound(nameOf(a), litSql(b), nameOf(b), litSql(a), true)
      case GreaterThanOrEqual(a, b) => bound(nameOf(a), litSql(b), nameOf(b), litSql(a), true)
      case LessThan(a, b) => bound(nameOf(a), litSql(b), nameOf(b), litSql(a), false)
      case LessThanOrEqual(a, b) => bound(nameOf(a), litSql(b), nameOf(b), litSql(a), false)
      case _ =>
    }
    ColPreds(eqIn, lo, hi)
  }

  private def traverseOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Partition-column predicate for one spec, or None when the transform
    * admits nothing from the extracted facts. Comparisons are built from
    * `t.expr(literal)` — foldable, so Catalyst turns them into plain
    * literals and the hive partition index prunes at listing time. */
  private[lake] def partitionFilter(t: Transform, p: ColPreds): Option[Column] = {
    val f = col(t.field).cast("long")
    val eqs = p.eqIn.getOrElse(t.source, Nil).map { v =>
      f === t.expr(expr(v)).cast("long")
    }
    val eqFilter = eqs.reduceOption(_ || _)
    if (!t.monotonic) eqFilter
    else {
      val loF = p.lo.get(t.source).map(v => f >= t.expr(expr(v)).cast("long"))
      val hiF = p.hi.get(t.source).map(v => f <= t.expr(expr(v)).cast("long"))
      val range = (loF, hiF) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b)
      }
      (eqFilter, range) match {
        case (Some(e), Some(r)) => Some(e && r)
        case (e, r) => e.orElse(r)
      }
    }
  }
}
