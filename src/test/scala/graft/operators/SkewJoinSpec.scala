package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the unsalted join on a skewed fixture") {
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(_ => ("hot", 1)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("k1", 11), ("k2", 12)).toDF("k", "rv")
    for (joinType <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), joinType)
        .select("k", "lv", "rv").collect()
        .map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      val salted = SkewJoin.saltedJoin(left, right, Seq("k"), joinType,
          factor = 7)
        .select("k", "lv", "rv").collect()
        .map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      assert(salted == plain, s"mismatch for $joinType")
    }
  }
}
