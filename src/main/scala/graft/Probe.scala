package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local experiments (not part of the driver contract).
  * Edit the query list / body freely; `sbt "runMain graft.Probe" [names]`. */
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

    val qs = if (args.nonEmpty) args.toSeq
             else Seq("q01_pricing_summary", "d09_dup_clusters", "e04_ann_ivf")
    // two reps: rep1 carries JIT/codegen warmup, rep2 is steady state
    for (rep <- 1 to 2; q <- qs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"[probe] rep$rep $q%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
