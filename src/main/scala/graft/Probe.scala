package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local experiments (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session so JIT/session init doesn't pollute timings
    spark.range(1000).selectExpr("sum(id)").collect()
    for (q <- Seq("d04_ngram_jaccard", "d06_minhash_lsh", "d07_simhash");
         sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      println(f"$q%-20s $sf%-28s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
