package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the properties that make these operators
  * survive a 100 TB scale-up, checked against the actual Catalyst output
  * so a regression in plan shape fails CI, not just a benchmark.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.01"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: predicate pushdown + column pruning reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"), "no pushed filters in scan")
    assert(p.contains("l_shipdate"), "shipdate predicate not pushed")
    // pruned read schema: none of the unused lineitem columns
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"),
      "scan reads columns the query never uses")
  }

  test("q03: small dimension side is broadcast, not shuffled") {
    val p = plan("q03_join_revenue_topn")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast join for the customer dim side:\n$p")
  }

  test("q05: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q05_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "orderBy+limit should not be a full sort")
  }

  test("d19: per-stratum rank<=k plans a WindowGroupLimit (partial " +
      "top-k before the shuffle, not a full per-language sort)") {
    val p = plan("d19_stratified_sample")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter was not pushed into a group limit:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      "expected the two-phase (map-local then post-shuffle) group limit")
  }

  test("q01: aggregation is partial (map-side combine before shuffle)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      "no map-side partial aggregation")
  }

  test("d01: exact dedup is a single shuffle") {
    val df = SparkEntry.queries("d01_dedup_exact")(spark, sf)
    val exchanges = "Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    // one hash-partition exchange for the groupBy + one range exchange
    // for the final orderBy — no more
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges")
  }

  test("q14: semi join broadcasts the filtered key side") {
    val p = plan("q14_semi_join")
    assert(p.contains("LeftSemi"), "not planned as a semi join")
  }

  test("q22: range join keeps the equi key (no cartesian)") {
    val p = plan("q22_range_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "range join degenerated to a cross product — equi key not used")
  }

  test("q51: all five dimension joins broadcast (no dim-side shuffle)") {
    val p = plan("q51_region_revenue")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 4, s"expected >=4 broadcast joins in the 6-table plan, got $n")
    assert(!p.contains("CartesianProduct"))
  }

  test("null-safe anti-join (delta core) stays a hash/merge join") {
    import spark.implicits._
    val a = Seq((Some(1), "x"), (None, "y")).toDF("k", "v")
    val b = Seq(Tuple1(Option.empty[Int])).toDF("k")
    val p = a.as("l")
      .join(b.as("r"),
        org.apache.spark.sql.functions.col("l.k") <=>
          org.apache.spark.sql.functions.col("r.k"),
        "left_anti")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"<=> keys must still plan as equi-join:\n$p")
  }

  test("d06: LSH candidate join is keyed, not all-pairs") {
    val p = plan("d06_minhash_lsh")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "band join must shuffle on (band, band_hash), never cross join")
  }

  test("e11: persisted-IVF probe dynamically prunes the cell partitions") {
    val p = plan("e11_persisted_ivf")
    // the index side is partitioned by cell and the assigned-query side
    // broadcasts, so the scan must carry a dynamic pruning predicate —
    // at scale only the probed cells' directories are read
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"index scan should be dynamically pruned on cell:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"assigned queries must broadcast into the index probe:\n$p")
  }

  test("d35: cluster-representative argmax is a partial-combining agg, " +
      "not a window over the corpus") {
    val p = plan("d35_cluster_best")
    assert(p.contains("partial_min"),
      s"min(struct) must partial-aggregate before the exchange:\n$p")
    // the argmax stage itself plans no Window node (d35 composes d09's
    // CC, which is window-free; a row_number formulation would show up)
    assert(!p.contains("WindowExec"),
      s"cluster-best must not window the corpus:\n$p")
  }

  test("d36: DSIR bucket-count tables broadcast into the scoring join") {
    val p = plan("d36_dsir_weights")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bounded count tables must broadcast, not shuffle the corpus:\n$p")
  }

  test("d38: fuzzy segment candidates are a keyed shingle join") {
    val p = plan("d38_segment_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"segment near-dup must stay keyed:\n$p")
  }

  test("d47: the whole benchmark battery probes as ONE broadcast — " +
      "the corpus side never shuffles toward the suites") {
    val p = plan("d47_contam_matrix")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingles must broadcast into the probe:\n$p")
  }

  test("d48: the vocabulary segmentation joins broadcast — the " +
      "exploded corpus never shuffles for the encode") {
    val p = plan("d48_bpe_encode")
    assert(p.contains("BroadcastHashJoin"),
      s"word->segmentation must be a broadcast join:\n$p")
  }

  test("merge-on-read view: the tombstone subtraction is one " +
      "broadcast anti-join over the plain scan") {
    import spark.implicits._
    val dir = TestSpark.tempDir("morplan")
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.mode("overwrite").parquet(dir)
    graft.lake.RowOps.deleteKeysMor(spark, dir,
      Seq(3L).toDF("id"), Seq("id"))
    val p = graft.lake.RowOps.readMor(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"MOR must subtract via a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a tombstone batch must never sort-merge against the data:\n$p")
  }

  test("q170 core: dim-driven dynamic file pruning lists a strict " +
      "minority of fact files and never changes the join answer") {
    // run the driver query itself (its in-query asserts re-check the
    // answer), then assert the RETURNED plan's fact scan reads the
    // pruned listing — the file set, not just a count
    val df = SparkEntry.queries("q170_dynamic_file_pruning")(spark, sf)
    val factFiles = df.inputFiles.filter(_.contains("graft_q170_"))
    assert(factFiles.nonEmpty, "expected a pruned fact scan")
    val root = new org.apache.hadoop.fs.Path(factFiles.head)
      .getParent.toString
    val all = graft.lake.SchemaTools.listDataFiles(spark, root).size
    assert(factFiles.length * 2 < all,
      s"the joined plan must scan the PRUNED listing: " +
        s"${factFiles.length}/$all")
  }

  test("q172: the MV-rewritten aggregate reads ONLY view files — " +
      "zero source files in the scan") {
    val df = SparkEntry.queries("q172_mv_query_rewrite")(spark, sf)
    val files = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources
          .LogicalRelation => l.relation match {
        case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => h.location.inputFiles.toSeq
        case _ => Nil
      }
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("/t172mv/")) &&
      !files.exists(_.contains("/t172s/")),
      s"rewritten plan must scan the view only: $files")
  }

  test("d60: index-served BM25 probes the persisted postings on " +
      "(bucket, term) — keyed joins, corpus tf/df/lengths all from " +
      "the index tables") {
    val df = SparkEntry.queries("d60_bm25_indexed")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"index probe must stay keyed:\n$p")
    // the corpus-statistics side comes from the persisted index; the
    // only documents.parquet read left is the QUERY batch itself
    val idx = df.inputFiles.filter(_.contains("graft_d60_"))
    assert(idx.exists(_.contains("/index/")) &&
      idx.exists(_.contains("/lengths/")),
      s"serve must read postings + lengths from the index: $idx")
  }

  test("no query in the library plans a cartesian or nested-loop join") {
    // The only queries whose SEMANTICS are a bounded cross product:
    //  - q55: the cross-join operator itself (5x25 by contract)
    //  - e02: brute-force baseline — broadcasts the bounded query set
    //    against the corpus; linear in corpus size, cross only in |Q|
    //  - e15: recall@k measurement, which by definition contains e02's
    //    brute-force baseline as its ground-truth side (same bounded
    //    broadcast; the recall join itself is (id1, id2)-keyed)
    //  - e16/e17: compressed-corpus scans of the same class — the
    //    bounded query set broadcasts against ONE pass over the
    //    PQ-reconstructed / sign-packed corpus (linear in corpus size,
    //    cross only in |Q|; with an IVF front end the scan narrows to
    //    probed cells, which e11/e14 already assert as keyed+DPP)
    //  - e22: MaxSim late interaction — by definition every query
    //    vector scores against every vector of each candidate document
    //    group, so the exact baseline is e02's bounded-broadcast class
    //    (|Q| query vectors broadcast against one corpus scan)
    //  - e25: e02's brute force run over the merge-on-read survivor
    //    view — same bounded-broadcast contract, different corpus
    //  - e26/e27: the PERSISTED serving flavors of e16/e17 — the same
    //    bounded query set broadcast against one linear pass, just over
    //    the stored codes/signature table instead of a re-encode
    //  - e31: ends in the SAME servePq read as e26 (the stream-
    //    maintained index serves identically by construction)
    //  - e32: e25's brute force over the POSITIONAL-DV survivor view —
    //    the same bounded-broadcast contract (≤10 queries against one
    //    corpus pass); the dv subtraction itself is a keyed anti-join
    //    (asserted by the merge-on-read plan test above)
    //  - d58: hybrid retrieval's DENSE arm IS e02's brute-force
    //    baseline (the bounded query set broadcast against one corpus
    //    pass); the sparse arm's joins are term-keyed and the RRF
    //    fusion join is (qid, doc)-keyed
    // Everything else — including e01's exact all-pairs, which is now
    // block-keyed — must plan as equi joins.
    val allowed = Set("q55_cross_join_small", "e02_knn_topk",
      "e15_ann_recall", "e16_pq_adc", "e17_hamming_topk", "e22_maxsim",
      "e25_ann_mor", "e26_pq_serve", "e27_hamming_serve",
      "e31_commitlog_pq_stream", "e32_ann_dv_survivors",
      "d58_hybrid_rrf")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowed)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct") ||
          p.contains("BroadcastNestedLoopJoin")) Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"queries planning all-pairs joins: ${offenders.mkString(", ")}")
  }
}
