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

  /** events with `ts` normalized to Spark's microsecond TimestampType,
    * whatever physical type the parquet column carries. Two source shapes
    * exist across testdata generations: TIMESTAMP(NANOS) (Spark has no
    * native support — [PARQUET_TYPE_ILLEGAL] — so read as long under the
    * nanos conf and truncate-divide to micros, matching DuckDB's own
    * ns -> us truncation on read) and native micro/NTZ timestamps (cast is
    * enough). The nanos conf is scoped to scan resolution (set/restore),
    * not left on the shared session. */
  def events(s: SparkSession, d: String): DataFrame =
    graft.lake.SchemaTools.withSessionConf(
      s, "spark.sql.legacy.parquet.nanosAsLong", "true") {
      normalizeTs(load(s, d, "events"))
    }

  /** ts-column normalization shared by the batch and streaming event
    * readers: long nanos -> truncate to micros; any timestamp flavor
    * (NTZ included) -> plain TimestampType. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
