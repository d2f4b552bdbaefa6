package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total",...}.
  *
  * Each query is executed through the `noop` sink, not `count()`: count()
  * lets Catalyst prune final projections and eliminate global sorts, which
  * would under-measure exactly the operators we claim to bench. The noop
  * sink executes the full physical plan (scan → shuffle → sort → project)
  * and discards rows executor-side — no driver collect.
  *
  * A short untimed warmup (tiny agg + join + window) runs first so JIT /
  * codegen / parquet-footer costs don't land on whichever query happens to
  * run first (r1: q01 carried ~5s of session warmup).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: exercise agg, join, and window codepaths once, untimed.
    try {
      runNoop("q10_min_max")
      runNoop("q05_topk")
      runNoop("q14_semi_join")
    } catch {
      case t: Throwable =>
        // A failed warmup re-introduces first-query JIT skew; say so
        // instead of silently absorbing it (the timed loop still surfaces
        // per-query errors on its own).
        System.err.println(s"[bench] batch warmup failed: $t")
    }
    // Streaming machinery (MicroBatchExecution, state stores, sinks) JITs
    // lazily and is untouched by the batch warmup; a 3-row memory-stream
    // windowed agg loads+compiles those classes untimed so q35/q44 don't
    // carry the one-time cost (measured ~2.5s of q35's r3 bench time).
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, count, window}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[java.sql.Timestamp]
      in.addData(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:30:00"),
        java.sql.Timestamp.valueOf("2024-01-01 02:00:00"))
      val q = in.toDF().toDF("ts")
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(org.apache.spark.sql.functions.lit(1)))
        .writeStream.format("memory").queryName("graft_bench_warmup")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // ...and the file-stream flavor (FileStreamSource, streaming
      // parquet scan, file-source log) that q35 actually exercises.
      val wdir = java.nio.file.Files
        .createTempDirectory("graft_bench_warm").toString
      spark.range(3)
        .selectExpr(
          "timestamp_micros(1704067200000000 + id*1800000000) AS ts")
        .write.mode("overwrite").parquet(s"$wdir/w.parquet")
      val sch = spark.read.parquet(s"$wdir/w.parquet").schema
      val fq = spark.readStream.schema(sch).parquet(s"$wdir/{w.parquet}")
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(org.apache.spark.sql.functions.lit(1)))
        .writeStream.format("memory").queryName("graft_bench_warmup_fs")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      fq.awaitTermination()
      // ...and the stream-stream (symmetric hash) join machinery q65
      // exercises — a 2-row self-join warms its state-store/join classes.
      val a = spark.readStream.schema(sch).parquet(s"$wdir/{w.parquet}")
        .select(col("ts").as("a_ts"),
          col("ts").cast("long").mod(2).as("ak"))
        .withWatermark("a_ts", "1 hour")
      val b = spark.readStream.schema(sch).parquet(s"$wdir/{w.parquet}")
        .select(col("ts").as("b_ts"),
          col("ts").cast("long").mod(2).as("bk"))
        .withWatermark("b_ts", "1 hour")
      val jq = a.join(b,
          col("ak") === col("bk") && col("b_ts") >= col("a_ts") &&
            col("b_ts") <= col("a_ts") +
              org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"),
          "inner")
        .writeStream.format("memory").queryName("graft_bench_warmup_ss")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      jq.awaitTermination()
    } catch { case e: Throwable =>
      System.err.println(s"[bench-warmup] streaming warmup failed: $e") }

    // Interleaved min-of-N (default 2 passes): single-sample driver noise
    // produced phantom regressions in BENCH_r02/r03 (q24-q26 driver times
    // 2-3x the judge rerun); the min over interleaved passes is the
    // stable statistic. Failures are RECORDED per query, never swallowed
    // — a broken query must not masquerade as a fast one.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // Optional comma-separated subset for single-query iteration (the
    // same contract as Verify's third arg); full run when unset.
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(qs) if qs.trim.nonEmpty =>
        val asked = qs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = asked.filterNot(SparkEntry.queries.contains)
        // A typo'd name must not masquerade as a clean (partial) run —
        // same fail-fast contract as Verify's third arg.
        if (unknown.nonEmpty)
          sys.error(s"SPARK_GRAFT_BENCH_ONLY names not in " +
            s"SparkEntry.queries: ${unknown.mkString(", ")}")
        asked
      case _ => SparkEntry.queries.keys.toSeq
    }
    val (times, errors) = timeQueries(names, reps, runNoop)
    val json = renderJson(times, errors, sfDir)
    println(json)
    // Stdout log capture truncated the r2 bench line; persist the full
    // JSON to a file too so the per-query map and total always survive.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench_out.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(out))
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }

  /** Run each query `reps` times in interleaved passes; per query, keep
    * the MINIMUM successful wall time and the last error (if any rep
    * threw). Separated from main so BenchSpec can drive it with a
    * deliberately-failing runner. */
  def timeQueries(
      names: Seq[String],
      reps: Int,
      run: String => Unit
  ): (Map[String, Double], Map[String, String]) = {
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for (_ <- 1 to math.max(1, reps); name <- names) {
      val t0 = System.nanoTime()
      try {
        run(name)
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), dt)
      } catch {
        case e: Throwable => errors(name) = e.toString.take(300)
      }
    }
    (times.toMap, errors.toMap)
  }

  private def jsonStr(s: String): String = JsonUtil.quote(s)

  /** One-line bench JSON: min-of-N per query, total = sum of mins,
    * `errors` = count of queries that threw in any rep (with per-query
    * messages in `error_detail`). */
  def renderJson(
      times: Map[String, Double],
      errors: Map[String, String],
      sfDir: String
  ): String = {
    val qs = times.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = if (times.nonEmpty) times.values.sum else 0.0
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":${errors.size},"error_detail":$errs,"sf":"$sfDir"}"""
  }
}
