package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different text about spark and scala engines here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical keys, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("keep_id", "dup_cnt").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out.head == ((1L, 2L))) // docs 1+2 collapse, keep id 1
  }

  test("exactKeepFirst keeps one full row per key") {
    val out = Dedup.exactKeepFirst(docs, Seq("text"), Seq(col("doc_id").asc))
    assert(out.count() == 3)
    assert(out.filter($"doc_id" === 2L).isEmpty)
  }

  test("ngram Jaccard: identical docs score 1.0, near-dups high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.2)
      .as[(Long, Long, Double)].collect().map(p => ((p._1, p._2), p._3)).toMap
    assert(pairs(((1L, 2L))) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.3)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH recovers the planted dup pairs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 32, shingleN = 3, threshold = 0.2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash signature of identical text is identical") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
      .select("doc", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("approxDistinct lands within the HLL error bound") {
    val df = (1 to 20000).map(i => (i % 7000).toLong).toDF("k")
    val approx = Dedup.approxDistinct(df, Seq("k"), rsd = 0.05)
      .as[Long].head()
    assert(math.abs(approx - 7000.0) / 7000.0 < 0.15,
      s"approx=$approx too far from 7000")
  }

  test("duplicateClusters uses RELIABLE checkpoints when the session " +
      "has a checkpoint dir (the cluster path)") {
    val ckDir = graft.TestSpark.tempDir("ccck")
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
        .toDF("id1", "id2")
      val out = Dedup.duplicateClusters(pairs)
        .as[(Long, Long)].collect().toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
        11L -> 10L))
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "expected RDD checkpoint files under the dir")
    } finally {
      // unset: other tests must keep exercising the local path
      org.apache.spark.sql.GraftSqlBridge.clearCheckpointDir(
        spark.sparkContext)
    }
  }

  test("duplicateClusters: min-label connected components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L), (20L, 21L))
      .toDF("id1", "id2")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("shingle DF cap: above-threshold pairs unchanged under an active cap") {
    import graft.functions.TextFunctions
    val fixture = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    // the cap must actually prune on the fixture for this test to mean
    // anything: assert some shingle's document frequency exceeds it
    val cap = 4
    val maxDf = fixture
      .select(explode(TextFunctions.shinglesFromTokens(
        TextFunctions.tokens(col("text")), 3)).as("s"),
        col("doc_id"))
      .distinct()
      .groupBy("s").count()
      .agg(max("count")).as[Long].head()
    assert(maxDf > cap, s"fixture max shingle DF $maxDf must exceed cap $cap")
    def pairSet(capVal: Int) =
      Dedup.ngramJaccardPairs(fixture, "doc_id", "text", n = 3,
          threshold = 0.2, maxShingleDf = capVal)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    val unguarded = pairSet(0)
    val guarded = pairSet(cap)
    assert(guarded == unguarded,
      "aggressive DF cap must not change the above-threshold pair set")
  }

  test("incrementalJaccardPairs = cross-side slice of the self-join " +
      "operator, never within-side") {
    val fixture = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val inc = Dedup.incrementalJaccardPairs(
        fixture.filter($"doc_id" % 2 === 0),
        fixture.filter($"doc_id" % 2 === 1),
        "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(inc.nonEmpty)
    // strictly cross-side
    inc.foreach { case (n, e, _) =>
      assert(n % 2 == 0 && e % 2 == 1, s"within-side pair ($n, $e)")
    }
    // same corpus-wide DF cap and full-corpus pruned sizes as the
    // self-join operator -> the cross-parity slice must agree exactly
    val self = Dedup.ngramJaccardPairs(fixture, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, j) =>
        if (a % 2 == 0) (a, b, j) else (b, a, j) }
      .toSet
    assert(inc.toSet == self)
  }

  test("contaminationReport flags exactly the docs sharing an n-gram " +
      "with the held-out set; decontaminate removes them") {
    val heldOut = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val train = Seq(
      // leaks the eval 5-gram "beta gamma delta epsilon zeta"
      (1L, "prefix words beta gamma delta epsilon zeta suffix words"),
      // shares single tokens but no 5-gram
      (2L, "alpha words beta words gamma words delta words epsilon"),
      (3L, "completely unrelated training document with other tokens here")
    ).toDF("doc_id", "text")
    val report = Dedup.contaminationReport(train, heldOut,
        "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect()
    assert(report.map(_._1).toSet == Set(1L))
    assert(report.head._2 >= 1L && report.head._3 == 1L)
    val clean = Dedup.decontaminate(train, heldOut, "doc_id", "text", n = 5)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    // survivors are untouched rows, and the gate is idempotent
    assert(Dedup.decontaminate(clean, heldOut, "doc_id", "text", n = 5)
      .count() == 2)
  }

  test("contaminationReport broadcasts the held-out side: no corpus " +
      "shuffle before the probe join") {
    val fixture = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val plan = Dedup.contaminationReport(
        fixture.filter($"doc_id" % 20 =!= 7),
        fixture.filter($"doc_id" % 20 === 7),
        "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"held-out shingles must broadcast:\n$plan")
  }

  test("bloomContaminatedIds: superset of the exact report (no false " +
      "negatives), bounded over-flagging") {
    val fixture = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val train = fixture.filter($"doc_id" % 20 =!= 7)
    val heldOut = fixture.filter($"doc_id" % 20 === 7)
    val exact = Dedup.contaminationReport(train, heldOut,
        "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    // per-shingle FPR compounds per doc (~50 shingles/doc), so a
    // doc-level ~0.5% rate needs fpp ~ 1e-4 — the calibration the
    // operator's scaladoc prescribes
    val bloom = Dedup.bloomContaminatedIds(train, heldOut,
        "doc_id", "text", n = 5, fpp = 1e-4)
      .as[Long].collect().toSet
    assert(exact.subsetOf(bloom),
      s"bloom gate missed real leaks: ${exact -- bloom}")
    // expected extra flags ~0.5% of train docs; 5% ceiling pins the
    // order of magnitude without racing the hash family's RNG
    val nTrain = train.count()
    assert(bloom.size - exact.size <= nTrain * 0.05,
      s"over-flagging beyond FPR expectation: ${bloom.size} vs ${exact.size}")
  }

  test("bloomContaminatedIds probe is codegen'd might_contain, not a UDF") {
    val fixture = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val plan = Dedup.bloomContaminatedIds(
        fixture.filter($"doc_id" % 20 =!= 7),
        fixture.filter($"doc_id" % 20 === 7),
        "doc_id", "text", n = 5, fpp = 1e-4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"probe should be BloomFilterMightContain:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"),
      s"no closure UDF in the probe plan:\n$plan")
  }

  test("containmentPairs: a quoted doc scores ~1 into its container, " +
      "not the reverse — the asymmetry Jaccard hides") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, quote),
      (2L, s"long container starts here $quote and then continues with " +
        "many additional other words making the union large"),
      (3L, "entirely unrelated document about other things completely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.7, maxShingleDf = 0)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1.0,
      s"quote must be fully contained: $pairs")
    assert(!pairs.contains((2L, 1L)),
      "the container must NOT score as contained")
    // and Jaccard indeed hides it at the same bar
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.7, maxShingleDf = 0)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => Set(p._1, p._2) == Set(1L, 2L)))
  }

  test("substringDupReport: merged-interval coverage for cross-doc and " +
      "self-repeated 8-token windows; clean docs absent") {
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val corpus = Seq(
      (1L, s"p1 p2 p3 p4 $span"), // shares the span with doc 2
      (2L, s"q1 q2 q3 q4 $span"),
      // self-repetition: the 8-token run appears at pos 0 and 8 —
      // islands merge to full coverage
      (3L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12") // all unique
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupReport(corpus, "doc_id", "text", k = 8)
      .select("doc_id", "n_tokens", "n_dup_windows", "dup_tokens",
        "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((1L, 12L, 1L, 8L, 8.0 / 12.0)))
    assert(out(2L) == ((2L, 12L, 1L, 8L, 8.0 / 12.0)))
    // two windows 8 apart: min(8, k) + trailing k = the whole 16 tokens
    assert(out(3L) == ((3L, 16L, 2L, 16L, 1.0)))
  }

  test("segmentDedup: corpus-wide keep-first by (doc, idx), in-doc " +
      "repeats collapse, fully-claimed docs survive as empty rows") {
    val seg = "a b c d e f g h"
    val corpus = Seq(
      (1L, s"$seg $seg"), // self-repeat: segment 1 is a dup of segment 0
      (2L, s"$seg x1 x2"), // seg 0 claimed by doc 1; short tail survives
      (3L, seg), // every segment claimed earlier -> empty doc
      (4L, "y1 y2 y3 y4 y5 y6 y7 y8 y9") // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(corpus, "doc_id", "text", k = 8)
      .select("doc_id", "n_segments", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((1L, 2L, 1L, seg)))
    assert(out(2L) == ((2L, 2L, 1L, "x1 x2")))
    assert(out(3L) == ((3L, 1L, 0L, "")))
    assert(out(4L) == ((4L, 2L, 2L, "y1 y2 y3 y4 y5 y6 y7 y8 y9")))
  }

  test("boilerplateRemove: df >= minDf segments vanish from EVERY doc " +
      "(no survivor), below-threshold repeats stay everywhere") {
    val boiler = "a b c d e f g h" // in 3 docs -> removed from all 3
    val pair = "p q r s t u v w" // in 2 docs -> df below 3, kept
    val corpus = Seq(
      (1L, s"$boiler x1 x2"),
      (2L, s"$boiler $pair"),
      (3L, boiler),
      (4L, pair)
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateRemove(corpus, "doc_id", "text",
        k = 8, minDf = 3)
      .select("doc_id", "n_segments", "n_boiler", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, "x1 x2")))
    assert(out(2L) == ((2L, 2L, 1L, pair)),
      "the df=2 segment must survive in doc 2")
    assert(out(3L) == ((3L, 1L, 1L, "")),
      "boilerplate keeps NO occurrence — not even the first")
    assert(out(4L) == ((4L, 1L, 0L, pair)))
  }

  test("auto DF cap derives from corpus size and is on by default") {
    assert(Dedup.autoShingleDfCap(500) == 64) // floor dominates small corpora
    assert(Dedup.autoShingleDfCap(100000) == 5000) // 5% of corpus
    // web-scale corpora where 5% exceeds Int range must CLAMP, not wrap
    // negative (a negative cap silently disables the skew guard)
    assert(Dedup.autoShingleDfCap(60_000_000_000L) == Int.MaxValue)
    assert(Dedup.autoShingleDfCap(Long.MaxValue / 2) == Int.MaxValue)
    // default call (guard on, auto cap) == explicit guard-off on the
    // fixture, where no shingle reaches 5% document frequency
    val fixture = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val auto = rows(Dedup.ngramJaccardPairs(fixture, "doc_id", "text"))
    val off = rows(Dedup.ngramJaccardPairs(fixture, "doc_id", "text",
      maxShingleDf = 0))
    assert(auto == off)
  }

  test("simhash: identical text -> distance 0; near-dup within small distance") {
    // maxDist+1 must divide the 56-bit signature: 13 -> 14 chunks of 4
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 13)
      .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    assert(pairs(((1L, 2L))) == 0)
    assert(pairs.get((1L, 3L)).forall(_ <= 13))
  }

  test("mergeClusterBatch: incremental merges equal the batch-global CC, " +
      "including a cross-batch cluster union") {
    val lbl = graft.TestSpark.tempDir("inc_cc") + "/labels"
    def labels() = spark.read.parquet(lbl)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // batch 1: two separate clusters {1,2} and {10,11}
    Dedup.mergeClusterBatch(lbl,
      Seq((1L, 2L), (10L, 11L)).toDF("id1", "id2"))
    assert(labels() == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // batch 2: new cluster {20,21} + an edge that UNIONS the two old
    // clusters through their members -> everything relabels to min 1
    Dedup.mergeClusterBatch(lbl,
      Seq((2L, 11L), (20L, 21L)).toDF("id1", "id2"))
    assert(labels() == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L))
    // batch 3 replay (idempotence) + a singleton-extending edge
    Dedup.mergeClusterBatch(lbl,
      Seq((2L, 11L), (21L, 22L)).toDF("id1", "id2"))
    val fin = labels()
    assert(fin == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    // equals the batch-global run on the union of all edges
    val global = Dedup.duplicateClusters(
      Seq((1L, 2L), (10L, 11L), (2L, 11L), (20L, 21L), (2L, 11L),
        (21L, 22L)).toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(fin == global)
  }

  test("mergeClusterBatch: a merge batch rewrites ONLY the buckets " +
      "holding touched rows — untouched partitions stay byte-identical") {
    import org.apache.hadoop.fs.Path
    val lbl = graft.TestSpark.tempDir("inc_cc_part") + "/labels"
    val fs = new Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def md5(p: Path): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { d.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      d.digest().map("%02x".format(_)).mkString
    }
    def partitionFiles(): Map[String, Map[String, String]] =
      fs.listStatus(new Path(lbl)).filter(_.isDirectory)
        .map { dir =>
          dir.getPath.getName -> fs.listStatus(dir.getPath)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(s => s.getPath.getName -> md5(s.getPath)).toMap
        }.toMap

    // bootstrap: clusters across many buckets (numBuckets = 8)
    Dedup.mergeClusterBatch(lbl,
      (0L until 32L by 2L).map(i => (i, i + 1L)).toDF("id1", "id2"),
      numBuckets = 8)
    val before = partitionFiles()
    assert(before.size == 8, s"bootstrap should fill 8 buckets: $before")

    // batch touching ONLY cluster {8,9} (buckets 0 and 1) via a new
    // edge 9-8 plus new id 40 (bucket 0)
    Dedup.mergeClusterBatch(lbl,
      Seq((9L, 40L)).toDF("id1", "id2"), numBuckets = 8)
    val after = partitionFiles()
    val touched = Set("bucket=0", "bucket=1")
    for ((part, files) <- before if !touched(part))
      assert(after(part) == files,
        s"untouched partition $part was rewritten")
    for (part <- touched)
      assert(after(part) != before(part), s"$part should have changed")
    // and the merge is still globally correct
    val fin = spark.read.parquet(lbl)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val global = Dedup.duplicateClusters(
      ((0L until 32L by 2L).map(i => (i, i + 1L)) :+ ((9L, 40L)))
        .toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(fin == global)
  }

  test("removeDuplicateSpans keeps the corpus-wide first occurrence, " +
      "cuts every other replica, and leaves untouched docs intact") {
    // "a b c" (k=3) appears in docs 1 (pos 0), 2 (pos 1) and twice in
    // doc 3; doc 4 shares no window with anyone
    val df = Seq(
      (1L, "a b c x y"),
      (2L, "q a b c z"),
      (3L, "a b c w a b c"),
      (4L, "p q r s t")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // first occurrence is (doc 1, pos 0): doc 1 keeps everything
    assert(out(1L) == ((5L, 0L, "a b c x y")))
    // doc 2 loses positions 1..3
    assert(out(2L) == ((5L, 3L, "q z")))
    // doc 3: "a b c w a b" windows at 0 and 4 are replicas; "b c w"
    // and "c w a" are unique. Positions 0-2 and 4-6 are cut -> "w"
    assert(out(3L) == ((7L, 6L, "w")))
    // untouched doc passes through with n_removed = 0
    assert(out(4L) == ((5L, 0L, "p q r s t")))
    // input partitioning must not change the winner
    val again = Dedup
      .removeDuplicateSpans(df.repartition(5), "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == out)
  }

  test("mergeClusterBatch id filters stay plan-bounded: IN-list below " +
      "the literal cap, broadcast semi-join above it — same answer") {
    val labels = (0L until 10000L).map(i => (i, i / 10))
      .toDF("doc_id", "cluster_id")
    val smallPlan = Dedup.boundedIdFilter(labels, "doc_id",
      Seq(1L, 2L, 3L)).queryExecution.executedPlan.toString
    assert(!smallPlan.contains("Join"),
      s"a 3-id filter must stay an IN push, not a join:\n$smallPlan")
    val bigIds = (0L to Dedup.IsinLiteralCap.toLong).toSeq // cap + 1
    val big = Dedup.boundedIdFilter(labels, "doc_id", bigIds)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("BroadcastHashJoin"),
      s"an above-cap id set must ship as a broadcast, not literals:\n" +
        bigPlan.take(800))
    assert(big.count() == bigIds.length,
      "the join formulation must keep exactly the listed ids")
    val neg = Dedup.boundedIdFilter(labels, "doc_id", bigIds,
      negate = true)
    assert(neg.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(neg.count() == 10000L - bigIds.length)
    // end-to-end: a merge whose touch set exceeds the cap goes through
    // the broadcast path and still equals the expected labeling
    val lbl = graft.TestSpark.tempDir("inc_cc_cap") + "/labels"
    val n = Dedup.IsinLiteralCap / 2 + 100 // 2·n touched ids > cap
    Dedup.mergeClusterBatch(lbl,
      (0L until n.toLong).map(i => (i, i + 100000L)).toDF("id1", "id2"))
    Dedup.mergeClusterBatch(lbl,
      (0L until n.toLong).map(i => (i + 100000L, i + 200000L))
        .toDF("id1", "id2"))
    val fin = spark.read.parquet(lbl)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(fin.size == 3 * n)
    (0L until n.toLong).foreach { i =>
      assert(fin(i) == i && fin(i + 100000L) == i &&
        fin(i + 200000L) == i)
    }
  }

  test("removeDuplicateSpans winner is a keyed min-struct agg, not a " +
      "row_number window over the replica set") {
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val plan = Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number"),
      s"first-occurrence pick must not be a window sort:\n$plan")
  }
}
