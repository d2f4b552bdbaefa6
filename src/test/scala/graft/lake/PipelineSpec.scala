package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sample = Seq(
    (1, "a", 10, "2024-01-01"),
    (2, "a", 20, "2024-01-02"),
    (3, "b", 30, "2024-01-03"),
    (3, "b", 30, "2024-01-03"), // exact dup of previous
    (4, "b", 5, "2024-01-04")
  ).toDF("id", "k", "v", "d")

  test("drop is tolerant of absent columns") {
    val out = Pipeline().drop("v", "nope")(sample)
    assert(out.columns.toSeq == Seq("id", "k", "d"))
  }

  test("distinctAll removes exact duplicate rows") {
    val out = Pipeline().distinctAll()(sample)
    assert(out.count() == 4)
  }

  test("distinctOn keep-first after presort") {
    // keep the row with smallest v per k
    val out = Pipeline()
      .distinctOn(Seq("k"), keepLast = false,
        presort = Some(SortSpec(Seq("v"), Seq(true))))(sample)
      .select("k", "v").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 10, "b" -> 5))
  }

  test("distinctOn keep-last equals keep-first of reversed sort") {
    val first = Pipeline()
      .distinctOn(Seq("k"), keepLast = true,
        presort = Some(SortSpec(Seq("v"), Seq(true))))(sample)
      .select("k", "v").as[(String, Int)].collect().toMap
    assert(first == Map("a" -> 20, "b" -> 30))
  }

  test("fixed order drop -> distinct -> sort") {
    // dropping v first makes rows (2,a) and (1,a) distinct-on-k candidates;
    // then sorting by id desc must apply AFTER dedup.
    val out = Pipeline()
      .drop("d")
      .distinctOn(Seq("k"), presort = Some(SortSpec.asc("id")))
      .sortBy(Seq("id"), Seq(false))(sample)
      .select("id").as[Int].collect().toSeq
    assert(out == Seq(3, 1)) // keep-first per k: (1,a),(3,b); sorted desc
  }

  test("sort honors per-column direction") {
    val out = Pipeline()
      .sortBy(Seq("k", "v"), Seq(true, false))(sample.dropDuplicates())
      .select("id").as[Int].collect().toSeq
    assert(out == Seq(2, 1, 3, 4))
  }

  test("distinctOn without presort is deterministic (orders by non-key cols)") {
    // r1 ADVICE: with no presort the window used to order by the constant
    // partition keys, so the kept row was arbitrary. Now it orders by all
    // non-key columns ascending (in column order: id, v, d) — so the
    // smallest id per key wins regardless of partitioning.
    val expected = Map("a" -> 1, "b" -> 3)
    for (_ <- 1 to 3) {
      val out = Pipeline()
        .distinctOn(Seq("k"))(sample.repartition(7))
        .select("k", "id").as[(String, Int)].collect().toMap
      assert(out == expected)
    }
  }

  test("subset row count never exceeds input (property)") {
    for (keys <- Seq(Seq("k"), Seq("k", "v"), Seq("id"))) {
      val n = Pipeline().distinctOn(keys)(sample).count()
      assert(n <= sample.count())
      assert(n == sample.select(keys.map(org.apache.spark.sql.functions.col): _*)
        .distinct().count())
    }
  }
}
