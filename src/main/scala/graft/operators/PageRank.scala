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
  * The edge frame is localCheckpoint'ed first: an unrolled iteration
  * references it iterations+2 times, and measured without the
  * checkpoint each reference re-derived the caller's whole edge
  * lineage (44 base-table scans, zero AQE stage reuse, ~1.6× the
  * row's wall). Local checkpoint is the right materialization point
  * for a bounded derived edge list — blocks are freed by the
  * ContextCleaner when the frame goes unreferenced; a 100 TB run
  * whose edges don't fit executor storage promotes this to a
  * reliable checkpoint / persisted edge table, same plan otherwise.
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
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // |V| parameterizes the teleport share, but it is NOT a driver
    // count: a broadcast 1-row aggregate keeps run() fully lazy (zero
    // jobs until the caller acts) and the integer algebra a plan
    // expression — n_nodes sits in every division exactly where the
    // driver-side constant would. An empty graph yields an empty
    // frame (the crossJoin's left side empties before any division
    // runs).
    val par = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    // out-weight folded into the edge frame ONCE (and checkpointed with
    // it): the unrolled loop otherwise pays an (edges ⋈ outW) join —
    // a full extra stage over |E| — per iteration for a per-src value
    // that never changes between rounds (guide §2.4: remove shuffles
    // outright). Same integer algebra per edge, so the fixed point is
    // bit-identical.
    val outW = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val ew = e.join(outW, "src").localCheckpoint(false)
    var ranks = nodes.crossJoin(par)
      .select(col("node"), expr(s"$scale div n_nodes").as("rank"))
    (1 to iterations).foreach { _ =>
      ranks = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"rank * $dampingPct * w div (100 * wout)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cs"))
        .crossJoin(par)
        .select(col("node"),
          expr(s"cs + (${scale * (100 - dampingPct)} div 100 div n_nodes)")
            .as("rank"))
    }
    ranks
  }

  /** Personalized PageRank (Haveliwala, WWW 2002): the damped walk's
    * teleport mass returns to a SEED set instead of all nodes, so the
    * fixed point ranks proximity to the seeds — the recommendation /
    * related-items form of the walk. Same integer algebra, same lazy
    * shape as run(); the seed set rides as one broadcast frame, and
    * the start/teleport share is scale div |S| at seed nodes, zero
    * elsewhere. A node unreachable from the seeds carries rank 0 —
    * kept, not dropped, so the output is still one row per node with
    * an in-edge.
    */
  def runPersonalized(
      edges: DataFrame,
      seeds: DataFrame, // one `node` column
      iterations: Int = 3,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
    val mark = broadcast(sd.withColumn("is_seed", lit(true)))
    val par = broadcast(sd.agg(count(lit(1)).as("n_seeds")))
    val teleport = expr(s"${scale * (100 - dampingPct)} div 100 div n_seeds")
    // same once-folded out-weight as run() — see the rationale there
    val outW = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val ew = e.join(outW, "src").localCheckpoint(false)
    var ranks = nodes.join(mark, Seq("node"), "left").crossJoin(par)
      .select(col("node"),
        when(coalesce(col("is_seed"), lit(false)),
          expr(s"$scale div n_seeds")).otherwise(lit(0L)).as("rank"))
    (1 to iterations).foreach { _ =>
      ranks = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"rank * $dampingPct * w div (100 * wout)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cs"))
        .join(mark, Seq("node"), "left").crossJoin(par)
        .select(col("node"),
          (col("cs") + when(coalesce(col("is_seed"), lit(false)), teleport)
            .otherwise(lit(0L))).as("rank"))
    }
    ranks
  }
}
