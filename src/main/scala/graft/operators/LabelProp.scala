package graft.operators

import org.apache.spark.sql.DataFrame
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
  * groupBy on (dst, label), one per-node max_by hash aggregate for
  * the argmax vote (r16: replaced the row_number window, which paid
  * a per-round sort of every candidate row after its exchange — the
  * argmax needs no order, only the max of the (wt, label-ascending)
  * vote pair). Labels-frame size is |V| throughout; candidate rows
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
    (1 to iterations).foreach { _ =>
      // argmax by (wt desc, label asc): labels are distinct within a
      // node group, so the (wt, -label) vote pair is unique and the
      // max_by is deterministic — "highest weight, ties to the LOWER
      // label" without ordering anything
      labels = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(sum(col("w")).as("wt"))
        .groupBy(col("dst"))
        .agg(max_by(col("label"), struct(col("wt"), -col("label"))).as("label"))
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }
}
