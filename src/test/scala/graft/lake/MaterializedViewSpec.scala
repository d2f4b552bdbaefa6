package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MaterializedViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lake(prefix: String): LakeManager =
    LakeManager(spark, TestSpark.tempDir(prefix) + "/lake").init()

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq
      .sortBy(_.mkString(""))

  // recompute through spark.sql over the registered temp view — NOT
  // lm.sql, which would transparently answer a fresh-MV-matching
  // aggregate FROM the view (tryMvRewrite) and make this circular
  private def fullRecompute(lm: LakeManager): Seq[Seq[Any]] =
    sorted(spark.sql("SELECT k, count(*) AS n, " +
      "CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total " +
      "FROM base GROUP BY k"))

  private def setup(prefix: String): LakeManager = {
    val lm = lake(prefix)
    lm.sql("CREATE TABLE base (k BIGINT, v DOUBLE) USING commitlog " +
      s"TBLPROPERTIES ('${CommitLog.CdfEnabledKey}'='true')")
    spark.range(100)
      .select((col("id") % 10).as("k"), (col("id") * 1.5).as("v"))
      .createOrReplaceTempView("mv_src")
    lm.sql("INSERT INTO base SELECT * FROM mv_src")
    lm.sql("CREATE MATERIALIZED VIEW agg AS " +
      "SELECT k, count(*) AS n, " +
      "CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total " +
      "FROM base GROUP BY k")
    lm
  }

  test("create materializes the aggregate; refresh with nothing to " +
      "fold is a no-op burning no commit") {
    val lm = setup("mv_create")
    assert(sorted(lm.commitLog("agg").read(None)) == fullRecompute(lm))
    val before = lm.commitLog("agg").latestVersion()
    val m = lm.sql("REFRESH MATERIALIZED VIEW agg").head()
    assert(!m.getBoolean(3), "nothing to fold => refreshed=false")
    assert(lm.commitLog("agg").latestVersion() == before,
      "a no-op refresh must burn no commit")
  }

  test("incremental refresh converges updates, deletes, inserts, and " +
      "retires vanished groups; only changed keys recompute") {
    val lm = setup("mv_refresh")
    lm.sql("UPDATE base SET v = v + 100 WHERE k = 3")
    lm.sql("DELETE FROM base WHERE k = 7") // group 7 vanishes
    spark.range(100, 110)
      .select(lit(55L).as("k"), (col("id") * 2.0).as("v"))
      .createOrReplaceTempView("mv_new")
    lm.sql("INSERT INTO base SELECT * FROM mv_new") // new group 55
    lm.sql("MERGE INTO base USING " +
      "(SELECT 0 AS k, 999.0 AS v) s ON base.k = s.k " +
      "WHEN MATCHED AND base.v < 10 THEN UPDATE SET v = s.v")
    val m = lm.sql("REFRESH MATERIALIZED VIEW agg").head()
    assert(m.getBoolean(3))
    // k in {0,3,7,55} moved; 10 standing groups + the new one
    assert(m.getLong(2) == 4,
      s"exactly the 4 moved groups recompute: ${m.getLong(2)}")
    assert(sorted(lm.commitLog("agg").read(None)) == fullRecompute(lm))
    assert(lm.commitLog("agg").read(None)
      .filter(col("k") === 7).isEmpty, "a vanished group retires")
    assert(lm.commitLog("agg").read(None)
      .filter(col("k") === 55).count() == 1, "a new group inserts")
  }

  test("a non-decomposable window refuses; REFRESH FULL re-baselines") {
    val lm = setup("mv_full")
    // replace re-homes every row: the feed cannot decompose it
    lm.commitLog("base").replace(
      spark.range(50).select((col("id") % 5).as("k"),
        (col("id") * 3.0).as("v")),
      lm.commitLog("base").latestVersion())
    val refused =
      try { lm.sql("REFRESH MATERIALIZED VIEW agg"); false }
      catch { case e: Exception =>
        e.getMessage.contains("re-baseline") }
    assert(refused, "a replace inside the window must refuse")
    val m = lm.sql("REFRESH MATERIALIZED VIEW agg FULL").head()
    assert(m.getBoolean(3))
    assert(sorted(lm.commitLog("agg").read(None)) == fullRecompute(lm))
    // and the incremental path works again past the re-baseline
    lm.sql("DELETE FROM base WHERE k = 2")
    val m2 = lm.sql("REFRESH MATERIALIZED VIEW agg").head()
    assert(m2.getBoolean(3) && m2.getLong(2) == 1)
    assert(sorted(lm.commitLog("agg").read(None)) == fullRecompute(lm))
  }

  test("shape refusals: unaliased aggregates, expression keys, " +
      "non-aggregate bodies, refresh of a non-view") {
    val lm = setup("mv_refuse")
    def refuses(stmt: String): Unit = {
      val r = try { lm.sql(stmt); false } catch { case _: Exception => true }
      assert(r, s"must refuse: $stmt")
    }
    refuses("CREATE MATERIALIZED VIEW bad1 AS " +
      "SELECT k, count(*) FROM base GROUP BY k")
    refuses("CREATE MATERIALIZED VIEW bad2 AS " +
      "SELECT k % 2 AS kk, count(*) AS n FROM base GROUP BY k % 2")
    refuses("CREATE MATERIALIZED VIEW bad3 AS SELECT k, v FROM base")
    refuses("REFRESH MATERIALIZED VIEW base")
    // IF NOT EXISTS on an existing view is a read, not an error
    assert(lm.sql("CREATE MATERIALIZED VIEW IF NOT EXISTS agg AS " +
      "SELECT k, count(*) AS n FROM base GROUP BY k").count() == 10)
  }

  // ---- transparent query rewrite onto a fresh view ----

  private def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten

  private val rwQuery = "SELECT k, count(*) AS c2, " +
    "CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS t2 " +
    "FROM base GROUP BY k"

  test("a matching aggregate over a FRESH view answers from the " +
      "view's files (renamed aliases, reordered and subset select)") {
    val lm = setup("mv_rw")
    val r = lm.sql(rwQuery)
    val f = scanned(r)
    assert(f.nonEmpty && f.forall(_.contains("/agg/")),
      s"the rewritten plan must read only the view: $f")
    assert(sorted(r.select("k", "c2", "t2")) ==
      sorted(spark.sql(rwQuery).select("k", "c2", "t2")),
      "the rewritten answer must equal the direct aggregate")
    // a SUBSET of the stored aggregates, keys omitted from the select
    val sub = lm.sql("SELECT CAST(sum(CAST(v AS DECIMAL(12,2))) AS " +
      "DOUBLE) AS only_total FROM base GROUP BY k")
    assert(scanned(sub).forall(_.contains("/agg/")) &&
      sub.count() == 10)
  }

  test("stale view, HAVING, non-matching aggregate, and conf-off " +
      "all keep the direct source plan — and refresh resumes it") {
    val lm = setup("mv_rw_guard")
    assert(scanned(lm.sql(rwQuery)).forall(_.contains("/agg/")))
    // stale: one more source commit stops the rewrite immediately
    lm.sql("DELETE FROM base WHERE k = 4")
    val stale = lm.sql(rwQuery)
    assert(scanned(stale).forall(_.contains("/base/")),
      "a stale view must never serve")
    assert(stale.filter(col("k") === 4).isEmpty,
      "the direct plan sees the delete the view has not folded")
    lm.sql("REFRESH MATERIALIZED VIEW agg")
    assert(scanned(lm.sql(rwQuery)).forall(_.contains("/agg/")),
      "refresh resumes the rewrite")
    // HAVING re-resolves aggregates above — conservative fall-through
    assert(scanned(lm.sql(rwQuery + " HAVING count(*) > 0"))
      .forall(_.contains("/base/")))
    // an aggregate the view does not store
    assert(scanned(lm.sql("SELECT k, CAST(avg(v) AS DOUBLE) AS a " +
      "FROM base GROUP BY k")).forall(_.contains("/base/")))
    // a WHERE below the aggregate
    assert(scanned(lm.sql("SELECT k, count(*) AS c2 FROM base " +
      "WHERE v > 1 GROUP BY k")).forall(_.contains("/base/")))
    // session kill switch
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(scanned(lm.sql(rwQuery)).forall(_.contains("/base/")))
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
  }

  test("rollup rewrite: a key-subset aggregate re-aggregates the " +
      "view (sum/count/min/max), keys-only goes distinct, avg falls " +
      "through, and a GROUP-KEY WHERE pushes onto the view") {
    val lm = lake("mv_rollup")
    lm.sql("CREATE TABLE base2 (k1 BIGINT, k2 BIGINT, v BIGINT, " +
      "w DOUBLE) USING commitlog " +
      s"TBLPROPERTIES ('${CommitLog.CdfEnabledKey}'='true')")
    spark.range(200)
      .select((col("id") % 8).as("k1"), (col("id") % 5).as("k2"),
        col("id").as("v"), (col("id") * 0.5).as("w"))
      .createOrReplaceTempView("mv_src2")
    lm.sql("INSERT INTO base2 SELECT * FROM mv_src2")
    lm.sql("CREATE MATERIALIZED VIEW agg2 AS " +
      "SELECT k1, k2, count(*) AS n, sum(v) AS sv, " +
      "min(w) AS mnw, max(w) AS mxw FROM base2 GROUP BY k1, k2")
    def direct(q: String): Seq[Seq[Any]] =
      sorted(spark.sql(q.replace("base2", "mv_src2")))
    // subset keys: every stored fold re-aggregates
    val q1 = "SELECT k1, count(*) AS n2, sum(v) AS sv2, " +
      "min(w) AS mn2, max(w) AS mx2 FROM base2 GROUP BY k1"
    val r1 = lm.sql(q1)
    assert(scanned(r1).nonEmpty &&
      scanned(r1).forall(_.contains("/agg2/")),
      s"rollup must serve from the view: ${scanned(r1)}")
    assert(sorted(r1) == direct(q1),
      "sum-of-sums/min-of-mins must equal the direct rollup")
    // keys-only rollup = the view's distinct key projection
    val q2 = "SELECT k1 FROM base2 GROUP BY k1"
    val r2 = lm.sql(q2)
    assert(scanned(r2).forall(_.contains("/agg2/")) &&
      sorted(r2) == direct(q2))
    // avg is not decomposable from the stored value: source plan
    assert(scanned(lm.sql("SELECT k1, CAST(avg(w) AS DOUBLE) AS a " +
      "FROM base2 GROUP BY k1")).forall(_.contains("/base2/")))
    // exact keys + key WHERE: filter the view, project
    val q3 = "SELECT k1, k2, sum(v) AS sv2 FROM base2 " +
      "WHERE k1 < 4 GROUP BY k1, k2"
    val r3 = lm.sql(q3)
    assert(scanned(r3).forall(_.contains("/agg2/")) &&
      sorted(r3) == direct(q3))
    // subset keys + arithmetic key WHERE: filter, re-aggregate
    val q4 = "SELECT k2, count(*) AS n2, sum(v) AS sv2 FROM base2 " +
      "WHERE k1 % 2 = 1 GROUP BY k2"
    val r4 = lm.sql(q4)
    assert(scanned(r4).forall(_.contains("/agg2/")) &&
      sorted(r4) == direct(q4))
    // a non-key WHERE filters rows INSIDE groups: source plan
    assert(scanned(lm.sql("SELECT k2, count(*) AS n2 FROM base2 " +
      "WHERE v % 3 = 0 GROUP BY k2")).forall(_.contains("/base2/")))
    // a function call in the WHERE (could be nondeterministic): source
    assert(scanned(lm.sql("SELECT k2, count(*) AS n2 FROM base2 " +
      "WHERE abs(k1) < 4 GROUP BY k2")).forall(_.contains("/base2/")))
    // freshness still gates the rollup path
    lm.sql("DELETE FROM base2 WHERE k1 = 0 AND k2 = 0 AND v = 40")
    assert(scanned(lm.sql(q1)).forall(_.contains("/base2/")),
      "a stale view must not serve the rollup either")
    lm.sql("REFRESH MATERIALIZED VIEW agg2")
    assert(scanned(lm.sql(q1)).forall(_.contains("/agg2/")))
  }
}
