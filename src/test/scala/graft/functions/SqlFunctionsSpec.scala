package graft.functions

import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered SQL functions build the SAME catalyst kernels as " +
      "the Column API — equal results, no UDF in the plan") {
    SqlFunctions.register(spark)
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog",
        Array(1.0f, 2.0f, 3.0f), Array(0.5f, 0.25f, 2.0f)),
      (2L, "pack my box with five dozen liquor jugs",
        Array(0.0f, -1.0f, 4.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("id", "text", "va", "vb")
      .createOrReplaceTempView("sqlfn_t")

    // text path: split -> shingles -> simhash, SQL text vs Column
    // pipeline
    val sqlText = spark.sql(
      "SELECT id, graft_simhash(" +
        "graft_shingles(split(text, ' '), 3), 64) AS h " +
        "FROM sqlfn_t ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    val bridge = org.apache.spark.sql.GraftSqlBridge
    val colText = spark.table("sqlfn_t")
      .select(col("id"), bridge.column(
        SimHashExpr(bridge.expression(bridge.column(
          ShinglePackAllExpr(bridge.expression(
            org.apache.spark.sql.functions.split(col("text"), " ")),
            3))), 64)).as("h"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(sqlText == colText,
      s"SQL and Column kernels must agree: $sqlText vs $colText")

    // vector path vs the relational formulation
    val sqlVec = spark.sql(
      "SELECT id, graft_dot(va, vb) AS d, graft_l2sq(va, vb) AS l " +
        "FROM sqlfn_t ORDER BY id")
      .as[(Long, Double, Double)].collect().toSeq
    val relVec = spark.table("sqlfn_t")
      .select(col("id"), VectorFunctions.dot(col("va"), col("vb"))
        .as("d"), VectorFunctions.l2Sq(col("va"), col("vb")).as("l"))
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(sqlVec.zip(relVec).forall { case (a, b) =>
      a._1 == b._1 && math.abs(a._2 - b._2) < 1e-9 &&
        math.abs(a._3 - b._3) < 1e-9 },
      s"vector kernels must agree: $sqlVec vs $relVec")

    // charfold: h = fold(h*base + cp) mod (2^31-1) — same value as
    // the Column-level kernel
    val folds = spark.sql(
      "SELECT graft_charfold(text, 131) AS f FROM sqlfn_t " +
        "ORDER BY id").as[Long].collect().toSeq
    val colFolds = spark.table("sqlfn_t")
      .select(bridge.column(CharFoldExpr(
        bridge.expression(col("text")), 131)).as("f"))
      .orderBy("f").as[Long].collect().toSeq
    assert(folds.sorted == colFolds &&
      folds.forall(f => f >= 0 && f < 2147483647L))

    // the SQL plan carries the native expressions, never a UDF
    val plan = spark.sql(
      "SELECT graft_simhash(graft_shingles(split(text, ' '), 3), " +
        "64) FROM sqlfn_t").queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"registered kernels must not wrap as UDFs:\n$plan")

    // non-literal integer parameters refuse (they parameterize
    // generated code)
    intercept[Exception] {
      spark.sql("SELECT graft_shingles(split(text, ' '), id) " +
        "FROM sqlfn_t").collect()
    }
  }
}
