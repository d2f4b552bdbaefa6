package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver test tables (`TESTDATA.md`).
  *
  * `events.parquet` carries a nanosecond-precision timestamp column; Spark's
  * TimestampType is microseconds. The DuckDB oracle truncates ns -> us on
  * read, so we do the same (see `events`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")

  /** events with `ts` truncated to microseconds, matching DuckDB's read of
    * the same nanosecond-precision parquet column. Spark has no TIMESTAMP
    * (NANOS) support ([PARQUET_TYPE_ILLEGAL]), so read it as long and
    * truncate-divide to micros. The nanos conf is scoped to scan
    * resolution (set/restore), not left on the shared session. */
  def events(s: SparkSession, d: String): DataFrame =
    graft.lake.SchemaTools.withSessionConf(
      s, "spark.sql.legacy.parquet.nanosAsLong", "true") {
      load(s, d, "events")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    }
}
