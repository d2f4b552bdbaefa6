package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  // deterministic synthetic vectors (hash-derived, no RNG state)
  private def vecs(ids: Range) = ids.map { i =>
    val emb = Array.tabulate(dim)(j =>
      (((i * 31 + j * 17) % 19) - 9).toFloat / 9f)
    (i.toLong, emb)
  }.toDF("vec_id", "embedding")

  test("SRP: append-maintained index == built-once index; untrusted " +
      "index refuses to serve (fallback, never wrong)") {
    val corpus = vecs(0 until 90)
    val queries = vecs(0 until 5)
    val maintained = TestSpark.tempDir("annm") + "/srp"
    AnnIndex.buildSrp(spark, maintained,
      corpus.filter(col("vec_id") < 30), dim, nBits = 3, nTables = 2)
    AnnIndex.appendSrp(spark, maintained,
      corpus.filter(col("vec_id") >= 30 && col("vec_id") < 60))
    AnnIndex.appendSrp(spark, maintained,
      corpus.filter(col("vec_id") >= 60))
    val once = TestSpark.tempDir("anno") + "/srp"
    AnnIndex.buildSrp(spark, once, corpus, dim, nBits = 3, nTables = 2)
    def rows(root: String) =
      AnnIndex.serveSrp(spark, root, queries, k = 3).get
        .select("id1", "id2", "rank").as[(Long, Long, Int)]
        .collect().toSet
    assert(rows(maintained) == rows(once))
    // staleness: a crashed append leaves no marker -> serve declines
    AnnIndex.distrust(spark, maintained)
    assert(AnnIndex.serveSrp(spark, maintained, queries).isEmpty)
    // and the documented fallback is the direct operator — same answer
    val direct = Similarity.srpTopK(corpus, queries, dim, k = 3,
        nBits = 3, nTables = 2)
      .select("id1", "id2", "rank").as[(Long, Long, Int)].collect().toSet
    assert(direct == rows(once))
    // appending over an untrusted index must refuse, not blind-append
    assertThrows[IllegalStateException] {
      AnnIndex.appendSrp(spark, maintained, corpus.limit(1))
    }
  }

  test("IVF: appends assign only the batch to the STORED pivots; " +
      "marker discipline matches the sidecars") {
    val corpus = vecs(0 until 60)
    val root = TestSpark.tempDir("anniv") + "/ivf"
    AnnIndex.buildIvf(spark, root,
      corpus.filter(col("vec_id") < 40), nCells = 4)
    val pivotsBefore = spark.read.parquet(s"$root/pivots")
      .orderBy("cell").collect().toSeq
    val idxBefore = spark.read.parquet(s"$root/index").count()
    AnnIndex.appendIvf(spark, root, corpus.filter(col("vec_id") >= 40))
    // pivots untouched (cell boundaries fixed), index grew by the batch
    assert(spark.read.parquet(s"$root/pivots")
      .orderBy("cell").collect().toSeq == pivotsBefore)
    assert(spark.read.parquet(s"$root/index").count() == idxBefore + 20)
    assert(AnnIndex.trusted(spark, root))
    // served results == serving an index whose assignment was computed
    // against the same stored pivots in one shot
    val served = AnnIndex.serveIvf(spark, root, vecs(0 until 3), k = 3,
        nProbe = 2).get
      .select("id1", "id2", "rank").as[(Long, Long, Int)].collect().toSet
    val parr = pivotsBefore
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toArray
    val oneShot = Similarity.ivfTopKFromIndex(
        spark.read.parquet(s"$root/pivots"),
        Similarity.assignCells(
            Similarity.prep(corpus, "vec_id", "embedding"), parr, 1)
          .select("cell", "vec_id", "emb", "nrm"),
        vecs(0 until 3), k = 3, nProbe = 2)
      .select("id1", "id2", "rank").as[(Long, Long, Int)].collect().toSet
    assert(served == oneShot)
    // kind mismatch: an IVF root cannot serve SRP
    assert(AnnIndex.serveSrp(spark, root, vecs(0 until 3)).isEmpty)
    AnnIndex.distrust(spark, root)
    assert(AnnIndex.serveIvf(spark, root, vecs(0 until 3)).isEmpty)
    assertThrows[IllegalStateException] {
      AnnIndex.appendIvf(spark, root, corpus.limit(1))
    }
  }

  test("PQ: codes-only at-rest index; appends encode only the batch " +
      "against the STORED codebooks; untrusted refuses to serve") {
    val corpus = vecs(0 until 60)
    val root = TestSpark.tempDir("annpq") + "/pq"
    AnnIndex.buildPq(spark, root, corpus.filter(col("vec_id") < 40),
      dim, m = 4, nCents = 4)
    val pivotsBefore = spark.read.parquet(s"$root/pivots")
      .orderBy("cell").collect().toSeq
    assert(spark.read.parquet(s"$root/index").columns.sorted.toSeq ==
      Seq("codes2", "id2"),
      "the at-rest index must hold codes only, no reconstructions")
    AnnIndex.appendPq(spark, root, corpus.filter(col("vec_id") >= 40))
    // codebooks untouched (fixed between retrains), index grew by batch
    assert(spark.read.parquet(s"$root/pivots")
      .orderBy("cell").collect().toSeq == pivotsBefore)
    assert(spark.read.parquet(s"$root/index").count() == 60)
    assert(AnnIndex.trusted(spark, root))
    // served == one-shot encode of the union against the same stored
    // codebooks (the append==rebuild contract, codebooks held fixed)
    val queries = vecs(0 until 3)
    val served = AnnIndex.servePq(spark, root, queries, k = 3).get
      .select("id1", "id2", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val parr = pivotsBefore
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toArray
    val oneShot = Similarity.pqTopKFromIndex(
        Similarity.pqEncode(
          Similarity.prep(corpus, "vec_id", "embedding"), parr, dim, 4)
          .select("id2", "codes2"),
        parr, queries, dim, 4, k = 3)
      .select("id1", "id2", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == oneShot)
    // decode(encode(v)) == the reconstruction the encoder materializes:
    // serving from codes loses nothing vs carrying recon at rest
    val enc = Similarity.pqEncode(
      Similarity.prep(corpus, "vec_id", "embedding"), parr, dim, 4)
    import org.apache.spark.sql.GraftSqlBridge
    val decoded = enc.withColumn("dec",
        GraftSqlBridge.column(graft.functions.PqDecodeExpr(
          GraftSqlBridge.expression(col("codes2")),
          parr.flatMap(_._2).toArray, parr.map(_._1), dim, 4)))
      .filter(col("dec") =!= col("recon2")).count()
    assert(decoded == 0L)
    AnnIndex.distrust(spark, root)
    assert(AnnIndex.servePq(spark, root, queries).isEmpty)
    assertThrows[IllegalStateException] {
      AnnIndex.appendPq(spark, root, corpus.limit(1))
    }
  }

  test("Hamming: persisted signature table serves exactly the direct " +
      "operator's answer (no trained parameters); trust discipline") {
    val corpus = vecs(0 until 60)
    val root = TestSpark.tempDir("annhm") + "/ham"
    AnnIndex.buildHamming(spark, root,
      corpus.filter(col("vec_id") < 20), dim)
    AnnIndex.appendHamming(spark, root,
      corpus.filter(col("vec_id") >= 20 && col("vec_id") < 40))
    AnnIndex.appendHamming(spark, root,
      corpus.filter(col("vec_id") >= 40))
    assert(spark.read.parquet(s"$root/index").columns.sorted.toSeq ==
      Seq("id2", "sig2"), "8 bytes a vector: id + one packed word")
    val queries = vecs(0 until 3)
    val served = AnnIndex.serveHamming(spark, root, queries, k = 3).get
      .select("id1", "id2", "hamming", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val direct = Similarity.hammingTopK(corpus, queries, dim = dim, k = 3)
      .select("id1", "id2", "hamming", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(served == direct)
    // kind mismatch: a Hamming root cannot serve PQ
    assert(AnnIndex.servePq(spark, root, queries).isEmpty)
    AnnIndex.distrust(spark, root)
    assert(AnnIndex.serveHamming(spark, root, queries).isEmpty)
    assertThrows[IllegalStateException] {
      AnnIndex.appendHamming(spark, root, corpus.limit(1))
    }
  }

  test("residual PQ: cell-partitioned codes-only index; appends use " +
      "the STORED quantizers; served == one-shot; untrusted refuses") {
    val corpus = vecs(0 until 60)
    val root = TestSpark.tempDir("annpqr") + "/pqr"
    // bootstrap = the union's own pivot-rank rows (the e26/e29
    // discipline: the coarse set is a prefix of the pq set under the
    // same ordering, so both stored selections equal the full
    // corpus's own and served == direct is exact)
    val pivotIds = Similarity.pivotSet(
        Similarity.prep(corpus, "vec_id", "embedding"), 4)
      .map(_._1).toSeq
    AnnIndex.buildPqResidual(spark, root,
      corpus.filter(col("vec_id").isin(pivotIds: _*)),
      dim, m = 4, nCents = 4, nCells = 2)
    val coarseBefore = spark.read.parquet(s"$root/coarse")
      .orderBy("cell").collect().toSeq
    val pivotsBefore = spark.read.parquet(s"$root/pivots")
      .orderBy("cell").collect().toSeq
    assert(spark.read.parquet(s"$root/index").columns.sorted.toSeq ==
      Seq("cell", "codes2", "id2"),
      "the at-rest index must hold cell + codes only")
    val rest = corpus.filter(!col("vec_id").isin(pivotIds: _*))
    AnnIndex.appendPqResidual(spark, root,
      rest.filter(col("vec_id") % 2 === 0))
    AnnIndex.appendPqResidual(spark, root,
      rest.filter(col("vec_id") % 2 === 1))
    // neither quantizer retrains under ingest; index grew by the batch
    assert(spark.read.parquet(s"$root/coarse")
      .orderBy("cell").collect().toSeq == coarseBefore)
    assert(spark.read.parquet(s"$root/pivots")
      .orderBy("cell").collect().toSeq == pivotsBefore)
    assert(spark.read.parquet(s"$root/index").count() == 60)
    assert(AnnIndex.trusted(spark, root))
    // served == the direct from-scratch composition over the union
    // (codebook re-derivation is exact, decode(encode) is identity)
    val queries = vecs(0 until 3)
    val served = AnnIndex.servePqResidual(spark, root, queries,
        k = 3, nProbe = 2).get
      .select("id1", "id2", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val direct = Similarity.ivfPqResidualTopK(corpus, queries,
        dim = dim, m = 4, k = 3, nCents = 4, nCells = 2, nProbe = 2)
      .select("id1", "id2", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == direct,
      "the persisted index must serve the from-scratch answer")
    AnnIndex.distrust(spark, root)
    assert(AnnIndex.servePqResidual(spark, root, queries).isEmpty)
    assertThrows[IllegalStateException] {
      AnnIndex.appendPqResidual(spark, root, corpus.limit(1))
    }
  }

  test("idempotent fold family (the e30/e31 pattern on every " +
      "resident): a redelivered batch folds zero, a partial overlap " +
      "folds only fresh ids, served == built-once — Hamming and " +
      "residual PQ") {
    val corpus = vecs(0 until 60)
    // Hamming resident
    val h = TestSpark.tempDir("annoh") + "/ham"
    AnnIndex.buildHamming(spark, h, corpus.filter(col("vec_id") < 20),
      dim)
    val b1 = corpus.filter(col("vec_id") >= 20 && col("vec_id") < 40)
    assert(AnnIndex.appendHammingOnce(spark, h, b1) == 20L)
    assert(AnnIndex.appendHammingOnce(spark, h, b1) == 0L,
      "a redelivered batch must fold nothing")
    // overlap: 30..59 where 30..39 are already held
    assert(AnnIndex.appendHammingOnce(spark, h,
      corpus.filter(col("vec_id") >= 30)) == 20L)
    val once = TestSpark.tempDir("annoh2") + "/ham"
    AnnIndex.buildHamming(spark, once, corpus, dim)
    val queries = vecs(0 until 3)
    def rows(root: String) =
      AnnIndex.serveHamming(spark, root, queries, k = 3).get
        .select("id1", "id2", "rank").as[(Long, Long, Int)]
        .collect().toSet
    assert(rows(h) == rows(once),
      "stream-maintained == built-once, through replays and overlaps")
    // residual PQ resident: same contract
    val r = TestSpark.tempDir("annor") + "/res"
    AnnIndex.buildPqResidual(spark, r,
      corpus.filter(col("vec_id") < 30), dim = dim, m = 4,
      nCents = 4, nCells = 2)
    val b2 = corpus.filter(col("vec_id") >= 30)
    assert(AnnIndex.appendPqResidualOnce(spark, r, b2) == 30L)
    assert(AnnIndex.appendPqResidualOnce(spark, r, b2) == 0L)
    assert(AnnIndex.appendPqResidualOnce(spark, r, corpus) == 0L,
      "a TOTAL replay must fold nothing")
  }
}
