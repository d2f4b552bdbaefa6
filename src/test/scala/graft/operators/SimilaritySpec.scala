package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, TestSpark.sfDir)

  test("bruteForceTopK: ranks are 1..k per query, self excluded") {
    val out = Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 5), k = 3)
      .select("id1", "id2", "rank").as[(Long, Long, Int)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1, 2, 3))
      rows.foreach { case (id1, id2, _) => assert(id1 != id2) }
    }
  }

  test("srpTopK recall vs exact top-k is nontrivial") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val approx = Similarity.srpTopK(emb, queries, dim = 64, k = 5,
      nBits = 4, nTables = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.2, s"srp recall $recall too low")
    // every approx hit must still be a real neighbor pair (id1 < 20)
    assert(approx.forall(_._1 < 20))
  }

  test("ivfTopK returns valid ranked neighbors") {
    val out = Similarity
      .ivfTopK(emb, emb.filter($"vec_id" < 5), k = 3, nCells = 8, nProbe = 3)
      .select("id1", "id2", "rank", "sim")
      .as[(Long, Long, Int, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id1, id2, rank, sim) =>
      assert(id1 != id2 && rank >= 1 && rank <= 3 && sim <= 1.0001)
    }
  }

  test("cosinePairs block grid: nBlocks² reducer keys, n× replication, " +
      "each pair met exactly once") {
    import graft.functions.VectorFunctions
    val n = 4
    val v = emb.select(col("vec_id"),
        VectorFunctions.asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", VectorFunctions.norm(col("emb")))
    val (a, b) = Similarity.blockGridSides(v, Long.MaxValue, n)
    val nVecs = v.count()
    // the claimed parallelism: the composite key space really is nBlocks²
    assert(a.select("bx", "by").distinct().count() == n.toLong * n)
    assert(b.select("bx", "by").distinct().count() == n.toLong * n)
    // √-replication: each side is replicated exactly nBlocks×
    assert(a.count() == nVecs * n)
    assert(b.count() == nVecs * n)
    // soundness: every ordered pair (x ≠ y) meets at EXACTLY one key —
    // no lost pairs, no double-counted sims
    val meets = a.join(b, Seq("bx", "by"))
      .filter(col("id1") =!= col("id2"))
      .groupBy("id1", "id2").count()
    assert(meets.filter(col("count") =!= 1).count() == 0)
    assert(meets.count() == nVecs * (nVecs - 1))
    // and with broadcast off (the 100 TB regime — corpus side too big to
    // broadcast) the physical join SHUFFLES on the composite (bx, by):
    // nBlocks² reducer keys, not the r2 single-key nBlocks spread
    val plan = graft.lake.SchemaTools.withSessionConf(
      spark, "spark.sql.autoBroadcastJoinThreshold", "-1") {
      Similarity.cosinePairs(emb, threshold = 0.3, nBlocks = n)
        .queryExecution.executedPlan.toString
    }
    assert(plan.contains("hashpartitioning(bx"),
      s"expected composite-key shuffle in plan:\n$plan")
    assert("hashpartitioning\\(bx#\\d+L?, by#\\d+L?".r
      .findFirstIn(plan).isDefined,
      s"expected BOTH block-id columns in the shuffle key:\n$plan")
  }

  test("stratified IVF pivots: spread survives a clustered id prefix, " +
      "recall vs exact top-k holds") {
    import graft.functions.VectorFunctions
    // Synthetic corpus with ingestion-ordered ids (the realistic failure
    // mode for lowest-id pivots): ids 0..15 are one tight cluster, ids
    // 16..115 a second tight cluster elsewhere. Lowest-id pivots all fall
    // in the first cluster, so every second-cluster vector lands on a
    // single argmax pivot — occupancy collapses. Stratified pivots sample
    // the whole id range and keep cells balanced.
    val rows = (0 until 16).map(i =>
        (i.toLong, Seq(1.0, i * 1e-3, 0.0, 0.0))) ++
      (16 until 116).map(j =>
        (j.toLong, Seq(0.0, 1.0, (j - 16) * 1e-3, 0.0)))
    val v = rows.toDF("vec_id", "emb")
      .withColumn("nrm", VectorFunctions.norm(col("emb")))
    def maxOccupancy(stratified: Boolean): Long = {
      val pivots = Similarity.pivotSet(v, nCells = 16, stratified)
      Similarity.assignCells(v, pivots, keep = 1)
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
    }
    val lowestId = maxOccupancy(stratified = false)
    val strat = maxOccupancy(stratified = true)
    assert(lowestId >= 100L, s"fixture should collapse lowest-id: $lowestId")
    assert(strat < lowestId / 2,
      s"stratified max occupancy $strat not tighter than lowest-id $lowestId")
    // pivotRank is a permutation (full-period MINSTD): no rank collisions
    // to bias the take-lowest-k sample
    val ranks = spark.range(1, 1000)
      .select(Similarity.pivotRank(col("id")).as("r"))
    assert(ranks.distinct().count() == 999)
    // and on the real fixture, recall vs the exact top-k stays useful
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nCells = 16,
        nProbe = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.25, s"ivf recall $recall below floor")
  }

  test("cosinePairs triangular grid: B(B+1)/2 keys, half replication, " +
      "each unordered pair met exactly once, result equals full grid") {
    import graft.functions.VectorFunctions
    val n = 4
    val v = emb.select(col("vec_id"),
        VectorFunctions.asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", VectorFunctions.norm(col("emb")))
    val (a, b) = Similarity.triangularGridSides(v, n)
    val nVecs = v.count()
    // half the full grid's shuffle volume: combined replication is
    // exactly nVecs·(B+1) vs the full grid's 2·nVecs·B
    assert(a.count() + b.count() == nVecs * (n + 1))
    // the key space is the bx <= by triangle: B(B+1)/2 reducer keys
    val joinKeys = a.select("bx", "by").distinct()
      .intersect(b.select("bx", "by").distinct())
    assert(joinKeys.count() == n.toLong * (n + 1) / 2)
    joinKeys.collect().foreach(r => assert(r.getLong(0) <= r.getLong(1)))
    // soundness: after the orientation filter every UNORDERED pair
    // {x, y} is generated exactly once — no lost pairs (the block-smaller
    // vector may carry the larger id), no double-counted sims
    val met = a.join(b, Seq("bx", "by"))
      .filter(col("bx") =!= col("by") || col("id1") < col("id2"))
      .select(least(col("id1"), col("id2")).as("lo"),
        greatest(col("id1"), col("id2")).as("hi"))
      .groupBy("lo", "hi").count()
    assert(met.filter(col("count") =!= 1).count() == 0)
    assert(met.count() == nVecs * (nVecs - 1) / 2)
    // and the operator's output is IDENTICAL to the asymmetric full-grid
    // formulation (leftIdBound set but non-binding forces that path)
    val tri = Similarity.cosinePairs(emb, threshold = 0.3, nBlocks = n)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val full = Similarity.cosinePairs(emb, threshold = 0.3, nBlocks = n,
        leftIdBound = Long.MaxValue - 1)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(tri == full)
  }

  test("persisted SRP index round-trips: served top-k == in-memory " +
      "top-k, probe prunes table partitions") {
    val e = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val dir = graft.TestSpark.tempDir("srpidx")
    Similarity.buildSrpIndex(e, dim = 64, nBits = 4, nTables = 4)
      .write.mode("overwrite").partitionBy("table").parquet(dir)
    val queries = e.filter($"vec_id" < 10)
    val fromIdx = Similarity.srpTopKFromIndex(spark.read.parquet(dir),
        queries, dim = 64, k = 5, nBits = 4, nTables = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val inMem = Similarity.srpTopK(e, queries, dim = 64, k = 5,
        nBits = 4, nTables = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromIdx == inMem)
    // a single-table probe prunes to that table's partition directories
    val one = spark.read.parquet(dir).filter($"table" === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("(table"),
      s"table predicate must prune the index scan:\n$plan")
  }

  test("quantized SRP ANN keeps nontrivial recall vs the exact " +
      "full-precision top-k") {
    val e = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val queries = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, queries, k = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val quant = Similarity.srpTopK(e, queries, dim = 64, k = 5,
        nBits = 4, nTables = 4, quantized = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.4, s"quantized ANN recall too low: $recall")
  }

  test("srpTopKReranked: reported sims are the EXACT full-precision " +
      "cosines, and reranked recall >= the pure-quantized path's") {
    val e = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val queries = e.filter($"vec_id" < 10)
    // k > corpus size = every pair's exact cosine, not a top-k subset
    val exactPairs = Similarity.bruteForceTopK(e, queries, k = 100000)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val rer = Similarity.srpTopKReranked(e, queries, dim = 64, k = 5,
        shortlist = 20, nBits = 4, nTables = 4)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect()
    // stage 2 rescored in full precision: every reported sim must be
    // bit-identical to the brute-force cosine of that pair
    rer.foreach { case (a, b, s) =>
      assert(exactPairs.get((a, b)).contains(s),
        s"($a,$b) sim $s != exact ${exactPairs.get((a, b))}")
    }
    val exactTop = Similarity.bruteForceTopK(e, queries, k = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val quant = Similarity.srpTopK(e, queries, dim = 64, k = 5,
        nBits = 4, nTables = 4, quantized = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val rerSet = rer.map(r => (r._1, r._2)).toSet
    def recall(s: Set[(Long, Long)]) =
      (exactTop & s).size.toDouble / exactTop.size
    assert(recall(rerSet) >= recall(quant),
      s"rerank recall ${recall(rerSet)} < quantized ${recall(quant)}")
  }

  test("centroidOutliers: a planted inverted vector ranks as its " +
      "label's worst outlier; plan broadcasts centroids and group-limits") {
    // label 0: 9 vectors near +e1, one exactly inverted; label 1: all
    // near +e2 (no outlier below the others)
    def vec(main: Int, sign: Double, jitter: Double): Array[Float] = {
      val a = Array.fill(8)(0.01f)
      a(main) = (sign * (0.9 + jitter)).toFloat
      a
    }
    val rows =
      (0L until 9L).map(i => (i, 0, vec(0, 1.0, 0.01 * i))) ++
        Seq((9L, 0, vec(0, -1.0, 0.0))) ++
        (10L until 20L).map(i => (i, 1, vec(1, 1.0, 0.005 * i)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(df, k = 3)
    val worst0 = out.filter($"label" === 0 && $"rank" === 1L)
      .select("vec_id").as[Long].head()
    assert(worst0 == 9L, "the inverted vector must rank as worst outlier")
    // scores of the aligned label-1 vectors are all high
    val l1 = out.filter($"label" === 1).select("cos_centroid")
      .as[Double].collect()
    assert(l1.forall(_ > 0.9))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"centroids must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k must push a group limit below the per-label window:\n$p")
  }

  test("cosinePairs is symmetric-free (id1 < id2) and thresholded") {
    val out = Similarity.cosinePairs(emb, threshold = 0.3, leftIdBound = 50)
      .as[(Long, Long, Double)].collect()
    out.foreach { case (a, b, s) =>
      assert(a < b)
      assert(s >= 0.3)
    }
  }

  test("autoSrpBits scales bucket count with the corpus") {
    assert(Similarity.autoSrpBits(0) == 4)
    assert(Similarity.autoSrpBits(500) == 4) // oracle fixture -> pinned 4
    assert(Similarity.autoSrpBits(2000) == 6)
    assert(Similarity.autoSrpBits(8000) == 8)
    // occupancy stays ~bounded: buckets within 2x of n/target
    for (n <- Seq(10000L, 1000000L, 1000000000L)) {
      val b = 1L << Similarity.autoSrpBits(n)
      assert(b >= n / 32 && b <= 4 * (n / 32 + 1), s"n=$n buckets=$b")
    }
  }

  test("srpNearPairs: subset of exact pairs, measurable recall") {
    val exact = Similarity.cosinePairs(emb, threshold = 0.3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val srp = Similarity.srpNearPairs(emb, dim = 64, threshold = 0.3,
      nBits = 4, nTables = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // every SRP pair is exactly scored, so it must also be an exact pair
    assert(srp.subsetOf(exact), "srpNearPairs produced a non-exact pair")
    val recall = srp.size.toDouble / exact.size
    assert(recall > 0.2, s"srpNearPairs recall $recall too low")
  }

  test("pqTopK: full ranks per query, deterministic under " +
      "repartitioning, nontrivial recall vs exact top-k") {
    val queries = emb.filter($"vec_id" < 10)
    val out = Similarity.pqTopK(emb, queries, k = 5)
      .select("id1", "id2", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // approximate distance non-decreasing along the rank order
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      rows.foreach { case (id1, id2, d, _) =>
        assert(id1 != id2 && d >= 0.0)
      }
    }
    // deterministic: input partitioning must not change the result
    val again = Similarity.pqTopK(emb.repartition(7), queries, k = 5)
      .select("id1", "id2", "rank").as[(Long, Long, Int)].collect().toSet
    assert(again == out.map(r => (r._1, r._2, r._4)).toSet)
    // recall against the exact SAME-METRIC ground truth (L2 top-k; the
    // cosine ground truth would conflate quantization loss with the
    // metric change)
    val all = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val qs = all.filter(_._1 < 10)
    def l2sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }
    val exactL2 = qs.flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, l2sq(qv, cv)) }
        .sortBy { case (cid, d) => (d, cid) }.take(5)
        .map { case (cid, _) => (qid, cid) }
    }.toSet
    val hits = out.map(r => (r._1, r._2)).toSet.intersect(exactL2).size
    assert(hits.toDouble / exactL2.size > 0.4,
      s"PQ recall ${hits.toDouble / exactL2.size} vs exact L2 too low")
  }

  test("hammingTopK equals a driver-side reference computation exactly " +
      "(sign pack, bit 63 included, id tie-breaks)") {
    val out = Similarity.hammingTopK(emb, emb.filter($"vec_id" < 8), k = 4)
      .select("id1", "id2", "hamming", "rank")
      .as[(Long, Long, Long, Int)].collect()
      .sortBy(r => (r._1, r._4))
    val all = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    def sig(v: Array[Float]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0f) acc | (1L << i) else acc
      }
    val sigs = all.map { case (id, v) => id -> sig(v) }.toMap
    val expected = all.filter(_._1 < 8).flatMap { case (qid, _) =>
      all.filter(_._1 != qid)
        .map { case (cid, _) =>
          (cid, java.lang.Long.bitCount(sigs(qid) ^ sigs(cid)).toLong) }
        .sortBy { case (cid, h) => (h, cid) }.take(4).zipWithIndex
        .map { case ((cid, h), i) => (qid, cid, h, i + 1) }
    }.sortBy(r => (r._1, r._4))
    assert(out.toSeq == expected.toSeq)
    // some dimension must exercise the sign bit of the top half so the
    // bit-63 path isn't vacuous
    assert(sigs.values.exists(_ < 0L),
      "fixture should set bit 63 for at least one vector")
  }

  test("ivfPqTopK: cell-keyed candidates (no nested loop), ADC " +
      "distances identical to the linear-scan PQ for shared pairs") {
    val q = emb.filter($"vec_id" < 10)
    val narrowed = Similarity.ivfPqTopK(emb, q, k = 5)
    val p = narrowed.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"IVF front end must key the candidate join:\n$p")
    val out = narrowed.select("id1", "id2", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._1).distinct.length == 10)
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // the encoding is shared machinery: every narrowed pair's distance
    // must equal the full linear-scan PQ's for the same pair
    val full = Similarity.pqTopK(emb, q, k = 600)
      .select("id1", "id2", "adist")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    out.foreach { case (a, b, d, _) =>
      assert(full((a, b)) == d,
        s"pair ($a,$b): narrowed adist $d != full ${full((a, b))}")
    }
  }

  test("kmeansAssign: hand-checked clusters, tie to the lower cid, " +
      "update moves the centroid") {
    // two planted clusters; ids 0 and 1 are the lowest-id seeds
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(100f, 100f)),
      (2L, Seq(1f, 1f)), (3L, Seq(99f, 101f)),
      (4L, Seq(2f, 0f)), (5L, Seq(101f, 99f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(vecs, k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 2L -> 0L, 4L -> 0L,
      1L -> 1L, 3L -> 1L, 5L -> 1L))

    // a vector exactly equidistant from both seeds lands on the LOWER
    // cid (iters = 1: no update pass, centroids are the seeds)
    val tied = vecs.unionByName(Seq((6L, Seq(50f, 50f)))
      .toDF("vec_id", "embedding"))
    val one = Similarity.kmeansAssign(tied, k = 2, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(6L) == 0L, "tie must break to the lower centroid id")

    // after one update the centroid of cluster 0 moves to the member
    // mean: (0,0),(1,1),(2,0) -> floor-quantized mean (64, ~21) — a
    // point near (1, 0.33) now beats seed-distance assignments
    val moved = Similarity.kmeansAssign(tied, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(moved(6L) == 0L)
    assert(moved.filterKeys(_ < 6L).toMap == out.map(identity))
  }

  test("kmeansIvfTopK: with every cell probed, results equal brute " +
      "force; ranks are 1..k") {
    val q = emb.filter($"vec_id" < 5)
    // nProbe = nClusters -> candidate set = whole corpus -> the probe
    // narrows nothing and the exact-cosine rerank must reproduce the
    // brute-force baseline bit for bit
    val ivf = Similarity.kmeansIvfTopK(emb, q, k = 3, nClusters = 4,
        iters = 2, nProbe = 4)
      .select("id1", "id2", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, q, k = 3)
      .select("id1", "id2", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivf == brute)
    // narrowed probes still rank 1..k per query over a candidate SUBSET
    val narrow = Similarity.kmeansIvfTopK(emb, q, k = 3, nClusters = 8,
        iters = 3, nProbe = 2)
      .select("id1", "id2", "rank").as[(Long, Long, Int)].collect()
    narrow.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("pqEncode kernel equals the declarative array_min formulation " +
      "and stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val dim = 4; val m = 2; val subDim = dim / m
    // parquet-backed (a local relation would constant-fold the whole
    // encode at plan time and prove nothing about codegen)
    val dir = graft.TestSpark.tempDir("pqenc")
    Seq(
      (1L, Seq(0.1, 0.2, 0.9, 0.8)),
      (2L, Seq(0.5, 0.5, 0.5, 0.5)),
      (3L, Seq(0.9, 0.1, 0.2, 0.7)),
      (4L, Seq(0.0, 1.0, 1.0, 0.0)),
      (5L, Seq(0.3, 0.3, 0.6, 0.6))
    ).toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    val v = Similarity.prep(vecs, "vec_id", "embedding")
    val pivots = Similarity.pivotSet(v, 3)
    val enc = Similarity.pqEncode(v, pivots, dim, m)
    // declarative reference: array_min over (d, cell, cv) structs —
    // exactly what the kernel replaced (small enough to compile here)
    val ref = {
      val bestPerSub = (0 until m).map { j =>
        val subEls = (0 until subDim)
          .map(t => element_at(col("emb"), j * subDim + t + 1))
        val scored = array(pivots.map { case (cell, pv, _) =>
          val cs = pv.slice(j * subDim, (j + 1) * subDim)
          val d = subEls.zip(cs)
            .map { case (e, c) => (e - lit(c)) * (e - lit(c)) }
            .reduceLeft(_ + _)
          struct(d.as("d"), lit(cell).as("cell"), typedLit(cs).as("cv"))
        }: _*)
        array_min(scored)
      }
      v.withColumn("__best", array(bestPerSub: _*))
        .select(col("vec_id").as("id2"),
          transform(col("__best"), b => b("cell")).as("codes2"),
          flatten(transform(col("__best"), b => b("cv"))).as("recon2"))
    }
    val a = enc.select("id2", "codes2", "recon2")
      .as[(Long, Seq[Long], Seq[Double])].collect().sortBy(_._1)
    val b = ref.as[(Long, Seq[Long], Seq[Double])].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq,
      "the kernel must replicate the argmin/tie/reconstruction exactly")
    // the regression the kernel fixes: the encode projection must be
    // INSIDE WholeStageCodegen (the declarative form at m=32 generated
    // Java that failed to compile and ran interpreted)
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode"), s"kernel missing from plan:\n$plan")
    val full = Similarity.ivfPqTopK(vecs,
      vecs.filter(col("vec_id") < 2), dim = dim, m = m, k = 2,
      nCents = 3, nCells = 2, nProbe = 2)
    val fullPlan = full.queryExecution.executedPlan.toString
    assert(fullPlan.contains("pq_encode"))
    assert(fullPlan.contains("WindowGroupLimit"),
      "the top-k must keep its partial group-limit pushdown")
    // the cell equi-join emits unique (id1,id2) pairs by construction
    // (keep=1 corpus cells, distinct probe cells) — the former
    // dropDuplicates shuffle must stay gone
    assert(!fullPlan.toLowerCase.contains("dropduplicates") &&
      !fullPlan.contains("hashpartitioning(id1, id2"))
    assert(full.count() > 0)
  }

  test("embeddingDedup: representative = min id, keep iff own cluster") {
    val out = Dedup.embeddingDedup(emb, dim = 64, threshold = 0.3,
      nBits = 4, nTables = 4)
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      // the representative is a member and is the minimum id
      assert(members.map(_._1).min == cid)
      // exactly one keeper per cluster, and it is the representative
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid)
    }
  }

  test("residual IVF-PQ quantizes tighter than raw PQ on CLUSTERED " +
      "data (the IVFADC rationale); pq pivots self-reconstruct " +
      "exactly; every row covered, cells from the coarse set") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.l2Sq
    import spark.implicits._
    // The IVFADC win is a DATA property: residuals center near zero
    // when the corpus is clustered (coarse cells absorb the cluster
    // offsets, the shared codebook spends its entries on fine
    // structure). On an unclustered corpus subtracting an arbitrary
    // centroid INFLATES spread and raw PQ wins — measured on the
    // uniform sf fixture (raw 54, residual 138), which is why this
    // pin runs on a deliberately clustered deterministic fixture:
    // 16 well-separated centers, jitter two orders smaller.
    val rows = (0 until 256).map { i =>
      val g = i % 16
      val vec = (0 until 64).map { d =>
        val center = ((g * 73 + d * 37) % 19 - 9).toDouble
        val jitter = ((i * 31 + d * 17) % 5 - 2) * 0.05
        (center + jitter).toFloat
      }
      (i.toLong, vec)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val v = Similarity.prep(clustered, "vec_id", "embedding")
    val coarse = Similarity.pivotSet(v, 16)
    val pq = Similarity.pivotSet(v, 32)
    val rawErr = Similarity.pqEncode(v, pq, dim = 64, m = 32)
      .select(sum(l2Sq(col("__emb2"), col("recon2"))))
      .head().getDouble(0)
    val resEnc = Similarity.ivfPqResidualEncode(v, coarse, pq,
      dim = 64, m = 32)
    val resErr = resEnc
      .select(sum(l2Sq(col("emb"), col("recon2"))))
      .head().getDouble(0)
    // deterministic fixture: the margin is pinned (measured 0.61)
    assert(resErr < rawErr * 0.75,
      s"residual PQ must quantize materially tighter on clustered " +
        s"data: residual=$resErr raw=$rawErr")
    assert(resEnc.count() == 256L, "every corpus row must encode")
    val cellsUsed = resEnc.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cellsUsed.subsetOf(coarse.map(_._1).toSet),
      "every assigned cell must come from the coarse pivot set")
    // on the REAL fixture: a pq pivot's residual is IN the codebook,
    // so its reconstruction round-trips exactly ((p-c)+c lands back
    // on p bit-for-bit here — measured 0.0, pinned)
    val v2 = Similarity.prep(emb, "vec_id", "embedding")
    val c2 = Similarity.pivotSet(v2, 16)
    val p2 = Similarity.pivotSet(v2, 32)
    val selfErr = Similarity.ivfPqResidualEncode(v2, c2, p2, 64, 32)
      .filter(col("id2").isin(p2.map(_._1).toSeq: _*))
      .select(sum(l2Sq(col("emb"), col("recon2"))))
      .head().getDouble(0)
    assert(selfErr == 0.0,
      s"pq pivots must self-reconstruct exactly, got $selfErr")
  }
}
