package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus quality scoring.
  *
  * The reference has no graph surface; this is a training-data
  * pipeline addition: web-crawl curation weighs documents by link
  * centrality (Common Crawl publishes exactly such per-host rank
  * lists), and the iteration itself is the canonical "iterative keyed
  * aggregation at scale" workload — the corpus-scale state (ranks,
  * edges, out-degrees) must never leave the cluster.
  */
object Graph {

  /** PageRank in EXACT integer fixed point, hash-verifiable
    * cross-engine (no libm anywhere): total mass starts at `scale`
    * (2^40), every rank is an integer numerator, and one iteration is
    *
    *   r'(v) = floor((scale - floor(dampNum*scale/dampDen)) / n)
    *         + floor(dampNum * (contrib(v) + floor(D/n)) / dampDen)
    *
    * with contrib(v) = Σ over in-edges u→v of floor(r(u)/out(u)), D =
    * the total rank held by DANGLING nodes (no out-edges — their mass
    * redistributes uniformly, the standard correction), and
    * dampNum/dampDen the damping ratio. Floor division everywhere, so
    * both engines replay the identical integer sequence; headroom is
    * dampNum·scale < 2^47, far inside Long under ANSI mode.
    *
    * 100 TB shape: each iteration is one keyed equi-join of ranks
    * with the (edge, out-degree) table on src, one map-side-combining
    * sum on dst, and one left join back to the node set — all keyed
    * shuffles, no broadcast of corpus-scale state. Driver state per
    * iteration is ONE scalar (the dangling mass) plus the node count
    * — the bounded-collect class. `iters` is an explicit small count
    * (centrality lists converge in tens of rounds); each round's plan
    * is materialized via localCheckpoint so lineage stays flat.
    *
    * Returns (node, rank, share) ordered by node — rank the exact
    * fixed-point numerator, share the one final IEEE division by
    * `scale`. */
  def pageRank(edges: DataFrame, src: String, dst: String,
      iters: Int, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1L << 40): DataFrame = {
    require(iters >= 1, "at least one iteration")
    require(dampNum > 0 && dampDen > dampNum, "damping in (0, 1)")
    val e = edges
      .select(col(src).cast("long").as("src"),
        col(dst).cast("long").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out"))
    // edges annotated with their source's out-degree, resolved once
    val eo = e.join(outDeg, "src").localCheckpoint(true)
    val base = (scale - dampNum * scale / dampDen) / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      // dangling mass: rank held by nodes with no out-edges (one
      // scalar to the driver — the bounded-collect class)
      val dangling = ranks
        .join(outDeg, ranks("node") === outDeg("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0L))).head().getLong(0)
      val contrib = ranks
        .join(eo, ranks("node") === eo("src"))
        .select(col("dst"), expr("rank div out").as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          (lit(base) +
            expr(s"($dampNum * (coalesce(contrib, 0L) + " +
              s"${dangling / n}L)) div $dampDen")).as("rank"))
        .localCheckpoint(true)
    }
    ranks.withColumn("share",
      col("rank").cast("double") / lit(scale.toDouble))
      .orderBy("node")
  }
}
