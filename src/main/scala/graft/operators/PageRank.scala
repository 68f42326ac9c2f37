package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank (Brin & Page, WWW 1998) over an edge list, in
  * INTEGER arithmetic so the fixed-point is exactly replayable by any
  * engine: double-precision PageRank sums incoming contributions in
  * partition order, which no cross-engine oracle can reproduce
  * bit-for-bit, while the e12-scaled integer form (the rag_rerank
  * score_e7 discipline) makes every iteration a pure function of the
  * edges — floor divisions and an order-independent integer sum.
  * The mass the floors shave is bounded by one unit per edge per
  * iteration (≤ |E|·iters × 1e-12 of total), a price worth paying
  * for a decidable contract.
  *
  * Shape per iteration: ranks ⋈ edges on src (the edge table is the
  * big side — partitioned by src, ranks are |V| rows and broadcast
  * when small), one integer-sum groupBy on dst. No driver-side loop
  * over data — the `iterations` unrolling composes ONE declarative
  * plan of 3·iters narrow stages + iters shuffles, which is exactly
  * how a 1000-executor run wants it (each iteration's shuffle keys on
  * dst, so AQE can coalesce/skew-split each round independently).
  * Dangling nodes (no out-edges) keep their teleport share only —
  * callers wanting the classical redistribution add reverse edges
  * (the bipartite driver row does), which also guarantees every node
  * has an in-edge and so survives the contribution join.
  */
object PageRank {

  /** edges: (src: long, dst: long, w: long positive). Returns
    * (node, rank) at the given integer scale after `iterations`
    * damped rounds from a uniform start. Sort-free by the operator
    * convention — consumers order at the edge.
    */
  def run(
      edges: DataFrame,
      iterations: Int = 3,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // |V| is a plan parameter (teleport share), not data — one
    // bounded count, the fitPqCodebooks/dim-probe discipline
    val n = nodes.count()
    require(n > 0, "pagerank: empty graph")
    val outW = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val teleport = scale * (100 - dampingPct) / 100 / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    (1 to iterations).foreach { _ =>
      ranks = e.join(ranks, e("src") === ranks("node"))
        .join(outW, "src")
        .select(col("dst").as("node"),
          expr(s"rank * $dampingPct * w div (100 * wout)").as("c"))
        .groupBy("node")
        .agg((sum(col("c")) + lit(teleport)).as("rank"))
    }
    ranks
  }
}
