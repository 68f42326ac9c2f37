package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous weighted label propagation (Raghavan, Albert & Kumara,
  * Phys. Rev. E 2007) — community detection as iterated neighborhood
  * majority vote: every node starts as its own label, and each round
  * adopts the label with the highest incoming edge-weight sum, ties
  * to the LOWER label. Synchronous + deterministic tie-break makes a
  * fixed iteration count a pure function of the edges (the async,
  * random-order variant of the paper converges faster but is
  * unreplayable), so the driver row's oracle replays every round as a
  * chained CTE — the PageRank integer discipline applied to the other
  * classic graph pass.
  *
  * Shape per round: one edges ⋈ labels join on src, one integer-sum
  * groupBy on (dst, label), one per-node row_number window — the
  * window partitions by node, so it is data-partitioned, never a
  * global sort. Labels-frame size is |V| throughout; candidate rows
  * per round are bounded by |E| (each edge contributes one (dst,
  * label) vote). The edge frame is localCheckpoint'ed for the same
  * reason PageRank's is: the unrolled rounds reference it once each.
  */
object LabelProp {

  /** edges: (src, dst, w) with both directions present for an
    * undirected graph (the caller's contract, as in PageRank).
    * Returns (node, label) after `iterations` synchronous rounds.
    * Sort-free; consumers order at the edge.
    */
  def run(edges: DataFrame, iterations: Int = 2): DataFrame = {
    require(iterations >= 1)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var labels = nodes.withColumn("label", col("node"))
    val byVote = Window.partitionBy("node")
      .orderBy(col("wt").desc, col("label").asc)
    (1 to iterations).foreach { _ =>
      labels = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(sum(col("w")).as("wt"))
        .withColumnRenamed("dst", "node")
        .withColumn("rn", row_number().over(byVote))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
    }
    labels
  }
}
