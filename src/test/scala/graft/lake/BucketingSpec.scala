package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-bucketed tables must join and aggregate WITHOUT a shuffle — the
  * pre-partitioned-storage contract that matters at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("WriteMode.Delta into a bucketed table: anti-diff appends only " +
      "new keys and bucketing survives the append") {
    val dir = TestSpark.tempDir("bktdelta")
    spark.sql("DROP TABLE IF EXISTS bkt_delta")
    try {
      LakeWriter(spark, "", WriteMode.Overwrite).writeBucketed(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
        "bkt_delta", Seq("k"), 4, location = Some(s"$dir/t"))
      // k=2 already present (subset key) -> only k=3 appends
      LakeWriter(spark, "", WriteMode.Delta(subset = Seq("k")))
        .writeBucketed(
          Seq((2L, "b-dup"), (3L, "c")).toDF("k", "v"),
          "bkt_delta", Seq("k"), 4, location = Some(s"$dir/t"))
      val rows = spark.table("bkt_delta")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // idempotence: replaying the same delta appends nothing
      LakeWriter(spark, "", WriteMode.Delta(subset = Seq("k")))
        .writeBucketed(
          Seq((2L, "b-dup"), (3L, "c")).toDF("k", "v"),
          "bkt_delta", Seq("k"), 4, location = Some(s"$dir/t"))
      assert(spark.table("bkt_delta").count() == 3)
      // bucket metadata survived the appends: keyed agg still
      // zero-exchange
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val agg = spark.table("bkt_delta").groupBy("k").count()
        assert(exchanges(agg) == 0,
          "groupBy on the bucket key must not shuffle after delta append")
      } finally spark.conf
        .set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_delta")
  }

  test("co-bucketed join and keyed agg plan with zero exchanges") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    LakeWriter(spark, "", WriteMode.Overwrite)
      .writeBucketed(left, "bkt_left", Seq("k"), 8, sortCols = Seq("k"))
    LakeWriter(spark, "", WriteMode.Overwrite)
      .writeBucketed(right, "bkt_right", Seq("k"), 8, sortCols = Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), Seq("k"))
      assert(exchanges(joined) == 0,
        s"co-bucketed join must not shuffle:\n${joined.queryExecution}")
      assert(joined.count() == 1000)

      val agg = spark.table("bkt_left").groupBy("k").count()
      assert(exchanges(agg) == 0,
        "groupBy on the bucket key must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
