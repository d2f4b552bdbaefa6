package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only global aggregates: `SELECT count(*)/min/max FROM t`
  * answered from the commit manifests' per-file stats — a one-row
  * plan with ZERO scan relations — and every exactness guard that
  * declines back to the direct plan. */
class MetadataAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lake(prefix: String): LakeManager =
    LakeManager(spark, TestSpark.tempDir(prefix) + "/lake").init()

  private def scans(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources
          .LogicalRelation => l
    }.size

  private val q = "SELECT count(*) AS n, min(id) AS mn, " +
    "max(id) AS mx, min(v) AS mnv, max(v) AS mxv FROM t"

  private def setup(prefix: String): LakeManager = {
    val lm = lake(prefix)
    lm.sql("CREATE TABLE t (id BIGINT, v DOUBLE, s STRING) " +
      "USING commitlog")
    spark.range(1000)
      .select(col("id"), (col("id") * 0.5).as("v"),
        concat(lit("s"), col("id")).as("s"))
      .createOrReplaceTempView("meta_src")
    lm.sql("INSERT INTO t SELECT * FROM meta_src")
    lm
  }

  test("count/min/max answer from manifests: one-row plan, no scan " +
      "relation, exact values — and stay exact across append, " +
      "copy-on-write DELETE, and OPTIMIZE") {
    val lm = setup("meta_serve")
    val r = lm.sql(q)
    assert(scans(r) == 0, "the metadata plan must contain no scan")
    assert(r.head().toSeq == Seq(1000L, 0L, 999L, 0.0, 499.5))
    lm.sql("INSERT INTO t VALUES (5000, -3.5, 'z')")
    assert(lm.sql(q).head().toSeq == Seq(1001L, 0L, 5000L, -3.5, 499.5))
    lm.sql("DELETE FROM t WHERE id >= 900") // copy-on-write rewrite
    val afterDelete = lm.sql(q)
    assert(scans(afterDelete) == 0,
      "rewritten files carry fresh spans — still metadata-served")
    assert(afterDelete.head().toSeq ==
      Seq(900L, 0L, 899L, 0.0, 449.5))
    lm.commitLog("t").optimize()
    assert(lm.sql(q).head().toSeq == Seq(900L, 0L, 899L, 0.0, 449.5))
  }

  test("declines, never wrong: MoR marks, string extremes, distinct, " +
      "WHERE, avg, GROUP BY, unaliased items, conf off — the direct " +
      "plan runs and agrees") {
    val lm = setup("meta_decline")
    def declinesTo(sql: String): org.apache.spark.sql.Row = {
      val df = lm.sql(sql)
      assert(scans(df) > 0, s"must keep the direct plan: $sql")
      df.head()
    }
    // string spans are truncated prefixes — never exact extremes
    declinesTo("SELECT min(s) AS mns FROM t")
    // modifiers and shapes outside the contract
    declinesTo("SELECT count(DISTINCT id) AS n FROM t")
    declinesTo("SELECT CAST(avg(v) AS DOUBLE) AS a FROM t")
    declinesTo("SELECT count(*) AS n FROM t WHERE id > 5")
    assert(lm.sql("SELECT id, count(*) AS n FROM t GROUP BY id")
      .count() == 1000)
    // conf kill switch
    spark.conf.set("spark.graft.metadata.agg", "false")
    try assert(scans(lm.sql("SELECT count(*) AS n FROM t")) > 0)
    finally spark.conf.set("spark.graft.metadata.agg", "true")
    // merge-on-read marks make manifest counts unpriceable: decline,
    // and the direct plan sees the deletion
    lm.sql("ALTER TABLE t SET TBLPROPERTIES " +
      "('delete.mode'='positional')")
    lm.sql("DELETE FROM t WHERE id < 10")
    val r = lm.sql(q)
    assert(scans(r) > 0, "standing dv marks must decline")
    assert(r.head().toSeq == Seq(990L, 10L, 999L, 5.0, 499.5))
  }
}
