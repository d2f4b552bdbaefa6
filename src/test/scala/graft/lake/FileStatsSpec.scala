package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FileStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readRange == full filter; candidate files shrink on a sorted " +
      "layout; out-of-span ranges read zero files but keep the schema") {
    val dir = TestSpark.tempDir("fstats") + "/ds"
    // 10 files, each a contiguous id band of 100
    spark.range(1000).select(col("id"), (col("id") * 2).as("v"))
      .orderBy("id").repartitionByRange(10, col("id"))
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    val cand = FileStats.candidateFiles(spark, dir, "id", 150.0, 249.0).get
    assert(cand.size <= 3, s"a 100-wide band should hit <=3 files: $cand")
    val got = FileStats.readRange(spark, dir, "id", 150.0, 249.0)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == (150L to 249L))
    // outside every span: zero files, empty result, schema intact
    val none = FileStats.readRange(spark, dir, "id", 5000.0, 6000.0)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
    // unknown column: conservative fallback, same result as plain filter
    assert(FileStats.candidateFiles(spark, dir, "nope", 0, 1).isEmpty)
  }

  test("delta writes maintain the manifest incrementally; overwrite and " +
      "compaction invalidate; untrusted reads fall back and stay correct") {
    val dir = TestSpark.tempDir("fstats_inv") + "/ds"
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("v"))
    LakeWriter(spark, dir, WriteMode.Overwrite).write(df)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    // delta only ADDS files -> spans appended, trust kept (the standing
    // continuous-ingest state: no rebuild per batch)
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")))
      .write(spark.range(100, 120).select(col("id"),
        (col("id") % 7).as("v")))
    assert(FileStats.trusted(spark, dir),
      "an additive delta write must keep the stats manifest trusted")
    // pruned read covers the new rows, and the new files are indexed
    // (a band entirely inside the appended batch has candidates)
    assert(FileStats.readRange(spark, dir, "id", 90.0, 119.0).count() == 30)
    assert(FileStats.candidateFiles(spark, dir, "id", 105.0, 115.0)
      .get.nonEmpty)
    // an untrusted start means a prior write crashed mid-update: the
    // next delta must NOT blind-reseal over the gap
    FileStats.distrust(spark, dir)
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")))
      .write(spark.range(120, 130).select(col("id"),
        (col("id") % 7).as("v")))
    assert(!FileStats.trusted(spark, dir),
      "untrusted at write start must invalidate, not reseal")
    assert(FileStats.readRange(spark, dir, "id", 90.0, 129.0).count() == 40)
    // overwrite replaces files -> stale
    FileStats.build(spark, dir)
    LakeWriter(spark, dir, WriteMode.Overwrite).write(df)
    assert(!FileStats.trusted(spark, dir),
      "overwrite must invalidate the stats manifest")
    // rebuild, then compaction invalidates again
    FileStats.build(spark, dir)
    Compact.run(spark, dir, targetBytes = 1L << 40, zorderBy = Seq("id", "v"))
    assert(!FileStats.trusted(spark, dir),
      "compaction rewrites files -> stats must not survive")
  }

  test("readRange on a hive-partitioned dataset resolves partition " +
      "columns from the pruned file list (basePath), identical to the " +
      "full-scan filter") {
    val dir = TestSpark.tempDir("fstats_hive") + "/ds"
    spark.range(400)
      .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
      .repartitionByRange(8, col("id"))
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    val got = FileStats.readRange(spark, dir, "id", 100.0, 199.0)
    // the partition column must come back real, not all-null
    assert(got.filter(col("p").isNull).count() == 0,
      "hive partition column resolved to null in the pruned read")
    val expect = spark.read.parquet(dir)
      .filter(col("id") >= 100 && col("id") <= 199)
    assert(got.select("id", "p", "v").orderBy("id").collect().toSeq ==
      expect.select("id", "p", "v").orderBy("id").collect().toSeq)
    // and pruning actually pruned on the id spans
    val all = SchemaTools.listDataFiles(spark, dir)
      .count(_.endsWith(".parquet"))
    val cand = FileStats.candidateFiles(spark, dir, "id", 100.0, 199.0).get
    assert(cand.size < all, s"expected pruning: ${cand.size} of $all")
  }

  test("hive-partitioned delta gives up incrementally (partition values " +
      "live in dir names, not files) — conservative invalidate, correct " +
      "fallback") {
    val dir = TestSpark.tempDir("fstats_part") + "/ds"
    val df = spark.range(100).select(col("id"), (col("id") % 4).as("p"))
    LakeWriter(spark, dir, WriteMode.Overwrite, partitionBy = Seq("p"))
      .write(df)
    FileStats.build(spark, dir)
    assert(FileStats.trusted(spark, dir))
    LakeWriter(spark, dir, WriteMode.Delta(Seq("id")), partitionBy = Seq("p"))
      .write(spark.range(100, 110).select(col("id"), (col("id") % 4).as("p")))
    assert(!FileStats.trusted(spark, dir),
      "new files can't cover the partition column's spans -> invalidate")
    assert(FileStats.readRange(spark, dir, "id", 95.0, 109.0).count() == 15)
  }

  test("timestamp spans prune a time band — typed literals, bare string " +
      "literals, and readBand with java.sql.Timestamp endpoints") {
    val dir = TestSpark.tempDir("fstats_ts") + "/ds"
    // 10 files, each a contiguous one-day band
    spark.range(1000)
      .select(col("id"),
        (lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
          + expr("make_interval(0,0,0,0,0,0, id * 864)")).as("ts"))
      .orderBy("id").repartitionByRange(10, col("id"))
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir)
    val all = SchemaTools.listDataFiles(spark, dir).size
    // typed TIMESTAMP literals
    val predTyped = "ts >= timestamp'2024-03-03 00:00:00' and " +
      "ts < timestamp'2024-03-05 00:00:00'"
    val bTyped = FileStats.typedBounds(spark, predTyped)
    assert(bTyped.contains("ts") && bTyped("ts").loNum.isDefined &&
      bTyped("ts").hiNum.isDefined, s"typed ts bounds: $bTyped")
    val candTyped =
      FileStats.candidatesForColBounds(spark, dir, bTyped).get
    assert(candTyped.nonEmpty && candTyped.size * 2 <= all,
      s"a 2-day band over 10 day-files must prune: ${candTyped.size}/$all")
    // bare string literals (the way every ad-hoc probe is written)
    val predStr = "ts >= '2024-03-03 00:00:00' and ts < '2024-03-05'"
    val candStr = FileStats.candidatesForColBounds(spark, dir,
      FileStats.typedBounds(spark, predStr)).get
    assert(candStr.nonEmpty && candStr.size * 2 <= all,
      s"string-literal ts band must prune: ${candStr.size}/$all")
    // CAST('...' AS TIMESTAMP) sees through to the string rule
    val candCast = FileStats.candidatesForColBounds(spark, dir,
      FileStats.typedBounds(spark,
        "ts >= cast('2024-03-03' as timestamp)")).get
    assert(candCast.nonEmpty && candCast.size < all)
    // band read == full filter
    val lo = java.sql.Timestamp.valueOf("2024-03-03 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-03-04 23:59:59")
    val got = FileStats.readBand(spark, dir, "ts", lo, hi)
    assert(got.inputFiles.length < all, "readBand must scan pruned files")
    val expect = spark.read.parquet(dir)
      .filter(col("ts") >= lo && col("ts") <= hi)
    assert(got.count() == expect.count() && got.count() > 0)
  }

  test("date spans land as session-zone midnight seconds; date and " +
      "string literals prune conservatively and identically to the " +
      "residual filter") {
    val dir = TestSpark.tempDir("fstats_dt") + "/ds"
    spark.range(300)
      .select(col("id"),
        expr("date_add(date'2024-01-01', cast(id / 10 as int))").as("d"))
      .orderBy("id").repartitionByRange(6, col("id"))
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir)
    val all = SchemaTools.listDataFiles(spark, dir).size
    for (pred <- Seq(
        "d >= date'2024-01-06' and d <= date'2024-01-10'",
        "d >= '2024-01-06' and d <= '2024-01-10'",
        // a datetime-valued string against a DATE column: the day
        // floor keeps the lower bound conservative
        "d >= '2024-01-06 13:00:00' and d <= '2024-01-10 02:00:00'")) {
      val cand = FileStats.candidatesForColBounds(spark, dir,
        FileStats.typedBounds(spark, pred)).get
      assert(cand.nonEmpty && cand.size < all,
        s"$pred must prune: ${cand.size}/$all")
      val got = spark.read.parquet(cand: _*).filter(pred).count()
      val expect = spark.read.parquet(dir).filter(pred).count()
      assert(got == expect && got > 0,
        s"$pred pruned read diverges: $got vs $expect")
    }
  }

  test("string spans prune on prefix bounds; truncation stays " +
      "conservative (never prunes a file whose tail could match)") {
    val dir = TestSpark.tempDir("fstats_str") + "/ds"
    // 4 files in distinct prefix bands, values LONGER than the stored
    // prefix (so every span is truncated)
    val rows = (0 until 400).map { i =>
      val band = ('a' + i / 100).toChar
      (i.toLong, band.toString * 80 + f"$i%03d")
    }
    rows.toDF("id", "s").orderBy("s").repartitionByRange(4, col("s"))
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir)
    val all = SchemaTools.listDataFiles(spark, dir).size
    // a band entirely inside one prefix family
    val pred = "s >= 'b' and s < 'c'"
    val cand = FileStats.candidatesForColBounds(spark, dir,
      FileStats.typedBounds(spark, pred)).get
    assert(cand.nonEmpty && cand.size < all,
      s"string band must prune: ${cand.size}/$all")
    val got = spark.read.parquet(cand: _*).filter(pred).count()
    assert(got == 100, s"string band pruned read lost rows: $got")
    // conservatism at the truncation boundary: a probe sharing the
    // full 64-char stored prefix must KEEP the file (the span cannot
    // prove disjointness beyond the prefix)
    val boundary = "s >= '" + "b" * 70 + "'"
    val candB = FileStats.candidatesForColBounds(spark, dir,
      FileStats.typedBounds(spark, boundary)).get
    val expectB = spark.read.parquet(dir).filter(boundary).count()
    val gotB =
      if (candB.isEmpty) 0L
      else spark.read.parquet(candB: _*).filter(boundary).count()
    assert(gotB == expectB,
      s"truncation must stay conservative: $gotB vs $expectB")
    // and a probe strictly above every prefix prunes everything
    assert(FileStats.candidatesForColBounds(spark, dir,
      FileStats.typedBounds(spark, "s >= 'z'")).get.isEmpty)
  }

  test("mixed-domain conjunction prunes on every covered axis at once " +
      "(numeric + timestamp + string in one predicate)") {
    val dir = TestSpark.tempDir("fstats_mix") + "/ds"
    spark.range(1000)
      .select(col("id"),
        (lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
          + expr("make_interval(0,0,0,0,0,0, id * 864)")).as("ts"),
        concat(lit("user_"), format_string("%04d", col("id"))).as("u"))
      .orderBy("id").repartitionByRange(10, col("id"))
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir)
    val all = SchemaTools.listDataFiles(spark, dir).size
    val pred = "id >= 100 and id < 300 and ts >= '2024-03-02' and " +
      "u < 'user_0250'"
    val b = FileStats.typedBounds(spark, pred)
    assert(b.keySet == Set("id", "ts", "u"), s"bounds: $b")
    val cand = FileStats.candidatesForColBounds(spark, dir, b).get
    // id allows files 1-2, ts floors at file 1, u caps at file 2:
    // the conjunction must intersect to at most 2 of 10
    assert(cand.nonEmpty && cand.size <= 2,
      s"conjunction must intersect the axes: ${cand.size}/$all")
    val got = spark.read.parquet(cand: _*).filter(pred).count()
    assert(got == spark.read.parquet(dir).filter(pred).count() && got > 0)
  }

  test("bloom probes never falsely skip across SQL coercions: a " +
      "numeric literal against a string column ('042' = 42 is TRUE in " +
      "SQL) keeps, an exact-integer string literal probes an integral " +
      "column, fractional literals never probe") {
    val dir = TestSpark.tempDir("fstats_bloom") + "/ds"
    Seq(("042", 42L), ("7", 7L), ("xyz", 9L))
      .toDF("s", "n").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir, bloomCols = Seq("s", "n"))
    def cand(pred: String): Seq[String] =
      FileStats.candidatesForPredicate(spark, dir, pred)
        .getOrElse(SchemaTools.listDataFiles(spark, dir))
    // SQL: '042' = 42 via numeric coercion — the int literal must NOT
    // probe the string bloom (which only holds verbatim "042")
    assert(cand("s = 42").nonEmpty,
      "an int literal must not prove absence on a string column")
    assert(spark.sql("SELECT '042' = 42").head().getBoolean(0),
      "the coercion premise itself")
    // a string literal that is an exact integer probes the INT column
    // canonically ('07' -> 7)
    assert(cand("n = '07'").nonEmpty && cand("n = '8'").isEmpty,
      "string literals probe integral columns through exact parse")
    // fractional literals never probe the bloom (42.0 DOES match the
    // long row 42 in SQL — a "42.0"-keyed bloom probe would skip it)
    assert(cand("n = 42.0").nonEmpty,
      "fractional literals must not prove absence")
    // verbatim string probes work both ways
    assert(cand("s = '042'").nonEmpty && cand("s = 'absent'").isEmpty)
  }

  test("bloom-carrying manifests shard by file-name hash (no " +
      "single-task funnel); probes read only span-candidate rows and " +
      "answers are unchanged; bad widths refuse at build") {
    val dir = TestSpark.tempDir("fstats_shard") + "/ds"
    // 24 files × interleaved keys — each file 's span covers the full
    // id range, so only blooms isolate a key
    spark.range(2400).select(col("id"),
        concat(lit("u"), pmod(col("id") * 7919L, lit(100000L))).as("u"))
      .repartition(24, pmod(col("id"), lit(24)))
      .write.mode("overwrite").parquet(dir)
    // width chosen so 24 rows × blobBytes crosses ZERO shard
    // boundaries locally (tiny) — force sharding via the math by
    // checking the layout only when bloomCols present is multi-part
    // safe: build and assert readers work over whatever part count
    FileStats.build(spark, dir, bloomCols = Seq("u"),
      bloomBits = 1 << 12)
    val hit = FileStats.candidatesForPredicate(
      spark, dir, s"u = 'u${(17L * 7919L) % 100000L}'").get
    assert(hit.nonEmpty && hit.size < 24,
      s"bloom must isolate well under 24 files: ${hit.size}")
    // within-pruning: the span conjunct narrows id, the bloom probes
    // ONLY those survivors, and the intersection is what comes back
    val both = FileStats.candidatesForPredicate(
      spark, dir, s"id >= 0 AND u = 'u${(17L * 7919L) % 100000L}'").get
    assert(both.toSet.subsetOf(hit.toSet),
      "span∩bloom must be a subset of bloom alone")
    // an explicit empty within short-circuits without reading blobs
    assert(FileStats.bloomCandidates(spark, dir,
      FileStats.eqProbes(spark, "u = 'u1'"),
      within = Some(Nil)).contains(Seq.empty[String]))
    // a large within (over the isin threshold) goes through the
    // semi-join path and still intersects correctly
    val allFiles = FileStats.indexedFiles(spark, dir).get
    val bigWithin = allFiles ++ (1 to 1200).map(i => s"/nope/$i")
    val viaJoin = FileStats.bloomCandidates(spark, dir,
      FileStats.eqProbes(spark, s"u = 'u${(17L * 7919L) % 100000L}'"),
      within = Some(bigWithin)).get
    assert(viaJoin.toSet == hit.toSet,
      "the semi-join path must agree with the unrestricted probe")
    // non-multiple-of-8 width: loud refusal, not a corrupt sidecar
    intercept[IllegalArgumentException](
      FileStats.build(spark, dir, bloomCols = Seq("u"), bloomBits = 12))
    intercept[IllegalArgumentException](
      FileStats.build(spark, dir, bloomCols = Seq("u"), bloomBits = 0))
  }

  test("appendFiles maintains standing blooms at the same width and " +
      "domain; a column that can no longer maintain invalidates " +
      "rather than mis-prunes") {
    val dir = TestSpark.tempDir("fstats_bmnt") + "/ds"
    spark.range(100).select(col("id"),
        concat(lit("k"), col("id")).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    FileStats.build(spark, dir, bloomCols = Seq("k"),
      bloomBits = 1 << 12)
    // additive batch: new file's bloom lands at the standing width
    val extra = TestSpark.tempDir("fstats_bx")
    spark.range(100, 200).select(col("id"),
        concat(lit("k"), col("id")).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(extra)
    val newFiles = SchemaTools.listDataFiles(spark, extra)
    newFiles.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val dest = new org.apache.hadoop.fs.Path(dir, p.getName)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .rename(p, dest)
    }
    FileStats.distrust(spark, dir)
    FileStats.appendFiles(spark, dir,
      newFiles.map(f => s"$dir/${new org.apache.hadoop.fs.Path(f).getName}"))
    assert(FileStats.trusted(spark, dir))
    // a key in the NEW batch resolves to exactly one candidate file
    val c = FileStats.candidatesForPredicate(spark, dir, "k = 'k150'").get
    assert(c.size == 1, s"maintained bloom must cover the new file: $c")
    assert(FileStats.candidatesForPredicate(spark, dir,
      "k = 'k9999'").get.isEmpty)
    // the maintained blob kept the standing width+domain
    val blobs = spark.read.parquet(s"$dir/_stats")
      .select("k_bloom").collect().map(_.getAs[Array[Byte]](0))
    assert(blobs.length == 2 &&
      blobs.forall(b => b.length == 1 + (1 << 12) / 8 && b(0) == 0))
  }
}
