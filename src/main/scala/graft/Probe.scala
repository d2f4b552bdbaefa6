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
    spark.range(1000).selectExpr("sum(id)").collect()

    for (rep <- 1 to 2;
         q <- Seq("d04_ngram_jaccard", "d06_minhash_lsh", "d07_simhash",
                  "d08_fingerprint", "e01_cosine_pairs", "e03_ann_srp")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"[probe] rep$rep $q%-20s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
