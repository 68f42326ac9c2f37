package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances in the fixed-iteration discipline
  * shared by PageRank and LabelProp (no driver-side convergence loop
  * at 100 TB — a bounded horizon is the production contract, and it
  * is what lets the DuckDB oracle replay each round as a CTE):
  * `iterations` synchronous relaxation rounds yield EXACT shortest
  * hop-distances ≤ iterations from the seed set; nodes farther out
  * (or disconnected) are ABSENT from the result, which is the
  * caller's "beyond horizon" signal. Reachability audits,
  * contamination-spread tracing, and link-distance features all read
  * off this.
  *
  * Scale shape per round: ONE shuffled equi-join of the current
  * distance frame against edges on src plus one grouped min keyed on
  * node — both map-side combinable; distances are integers and min is
  * order-independent, so the result is a pure function of
  * (edges, sources, iterations) at any partitioning. The edge frame
  * is localCheckpoint'ed (lazy) like PageRank's, so the unrolled
  * rounds stage-skip one materialization instead of re-deriving the
  * caller's edge lineage every round.
  */
object Paths {

  /** edges: (src, dst) directed — pass both directions for an
    * undirected graph; sources: (node). Returns (node, dist) for
    * every node within `iterations` hops of any source. */
  def bfsDistances(
      edges: DataFrame, sources: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, "bfsDistances needs a non-negative horizon")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
    for (_ <- 1 to iterations) {
      val next = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.unionByName(next)
        .groupBy("node").agg(min("dist").as("dist"))
    }
    dist
  }
}
