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
    val e = SparkEntry.entry(spark)
    println(s"entry rows: ${e.count()}")
    e.show(5, truncate = false)
    spark.stop()
  }
}
