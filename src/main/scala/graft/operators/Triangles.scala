package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting with degree-ordered orientation (Suri &
  * Vassilvitskii, WWW'11, "Counting triangles and the curse of the
  * last reducer") — the graph-family census op the PageRank/label-
  * propagation pair lacked, and the canonical example of why naive
  * wedge enumeration dies at scale: a hub of degree d spawns d²
  * wedges, and real graphs have hubs. The fix is structural, not a
  * cap: orient every undirected edge from its LOWER-(degree, id)
  * endpoint to the higher, so every node's ORIENTED out-degree is
  * O(√m) on any graph, total wedge work is O(m^1.5), and each
  * triangle is generated exactly once (at its unique minimum-degree
  * corner) — no post-hoc dedup, no /3, no hub task.
  *
  * Input: (src, dst) rows in any direction, duplicates and self-loops
  * tolerated — normalized to the canonical undirected simple edge set
  * first. Output: ONE row (n_edges, n_wedges, n_triangles) over that
  * simple graph. Sort-free; plain equi-joins only (orientation =
  * two degree joins; closure = one semi join of wedges against the
  * canonical edge set).
  */
object Triangles {

  /** Canonical undirected simple edges: (a=min, b=max), loops dropped.
    * localCheckpoint'ed (lazy), the PageRank discipline: the census
    * references the canonical set from FIVE subtrees (degrees, the
    * orientation join, the edge census, and the closure through both
    * adjacency sides) and without the materialization each reference
    * re-derived the caller's whole edge lineage — the r16 plan dump
    * measured 84 parquet scans / 134 Exchanges for one triangle_count
    * (the driver row's edges are themselves a lineitem self-join).
    * Blocks are freed by the ContextCleaner when the frame goes
    * unreferenced; a 100 TB run whose edge set outgrows executor
    * storage promotes this to a persisted edge table, same plan
    * otherwise (guide §5 localCheckpoint note). */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)

  def count(edges: DataFrame): DataFrame = census(canonical(edges))

  /** DOULION-style approximate triangle count (Tsourakakis, Drineas &
    * Faloutsos, KDD'09 — "DOULION: counting triangles in massive
    * graphs with a coin"): SPARSIFY the canonical edge set — keep each
    * edge with probability p — run the exact degree-ordered closure on
    * the kept graph, scale the count by 1/p³ (each triangle survives
    * with probability p³, so the estimator is unbiased). This is the
    * scale path exact closure lacks: triangle work is triangle/wedge-
    * scaled (the 30× probe measured 12× wall on the exact op), and a
    * quote-spam / celebrity-node graph at 100 TB needs the p³ discount
    * BEFORE the closure, not after. The coin is the repo's md5 gate
    * (Sampling.drawHex's rule, over the canonical edge pair), so the
    * sample — and therefore the whole estimate — is DETERMINISTIC and
    * the DuckDB oracle replays it to the digit; p is fixed at 1/4
    * (first hex nibble < '4'), making 1/p³ = 64 exact integer
    * arithmetic with no float divergence across engines. Relative
    * error concentrates as ~√(1/p³ / T): measured on the driver's
    * even-orders lineitem graph, err_e6 ≤ ~8·10⁴ (8%) at sf0.01 and
    * tighter at sf0.1 (T grows; the approx_triangle_check row pins the
    * measured floor with margin).
    * Output: ONE row (n_kept_edges, n_sampled_triangles,
    * est_triangles = 64·sampled). */
  def approxCount(edges: DataFrame): DataFrame = {
    val kept = canonical(edges).where(
      substring(md5(concat(col("a").cast("string"), lit(":"),
        col("b").cast("string")).cast("binary")), 1, 1) < lit("4"))
    census(kept).select(
      col("n_edges").as("n_kept_edges"),
      col("n_triangles").as("n_sampled_triangles"),
      (col("n_triangles") * 64L).as("est_triangles"))
  }

  private def census(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    // orient (a,b) from the lower-(degree, id) endpoint: ties on
    // degree break by id, so the orientation is total and acyclic
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val fromA = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented and adj are each referenced twice more below (the
    // closure probes adj on BOTH endpoints of every oriented edge):
    // same lazy-checkpoint rationale as canonical() — both frames are
    // edge-/node-scaled, and without the cut each reference re-ran the
    // orientation join and the adjacency aggregation.
    val oriented = withDeg.select(
      when(fromA, col("a")).otherwise(col("b")).as("u"),
      when(fromA, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(false)
    // wedges at each oriented source (v1 < v2 by id — one canonical
    // enumeration per out-neighbor pair); the closing edge is probed
    // against the canonical undirected set, which since v1 < v2 is
    // exactly (a=v1, b=v2)
    // Edge-iterator closure on ADJACENCY LISTS — the formulation that
    // never materializes the m^1.5 wedge stream (the probe measured a
    // 1.2B-row wedge intermediate OOMing every join strategy at 30×
    // under the capped driver: sort-merge mid-spill, shuffled-hash
    // build, even aggregate-first). Each node's ORIENTED out-list is
    // ≤ O(√m) elements by the orientation theorem, so collect_list
    // state per group is bounded; each oriented edge (u,v) then
    // carries its two bounded lists once and counts
    // |N⁺(u) ∩ N⁺(v)| per row — every triangle scored exactly once,
    // at the edge whose head is the directed 2-path's midpoint. All
    // shuffles are EDGE-scaled (m rows); the wedge census is
    // Σ C(outdeg, 2) off the same adjacency table, no wedge row ever
    // exists.
    val adj = oriented.groupBy("u")
      .agg(collect_list(col("v")).as("nbrs"))
      .localCheckpoint(false)
    val e = und.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
    val w = adj.agg(coalesce(
      sum(size(col("nbrs")).cast("long") * (size(col("nbrs")) - 1) / 2),
      lit(0L)).cast("long").as("n_wedges"))
    val closing = oriented
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
    val t = closing.agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    e.crossJoin(w).crossJoin(t) // three 1-row aggregates
  }

  /** Per-node local clustering coefficient (Watts & Strogatz 1998:
    * of the C(d,2) possible links among a node's neighbors, how many
    * exist — the neighborhood-density signal behind community/spam
    * structure detection). Same orientation + adjacency machinery as
    * count(), but the closure EXPLODES its intersection into concrete
    * (u, v, w) triangle rows — one row per triangle, never
    * wedge-scaled — and each triangle credits all three corners.
    * Output (only nodes on ≥1 triangle): (node, degree, n_tri,
    * coeff_e6) with coeff_e6 = 2·n_tri·10⁶ div (d·(d−1)) — exact
    * integer arithmetic, replayable to the digit by a SQL engine.
    * Sort-free; callers order/limit at the edge.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    // same lazy-checkpoint discipline as census(): und feeds degrees,
    // orientation AND the final per-node join; oriented/adj feed the
    // two-sided closure probe — r16 plan dump measured 188 parquet
    // scans for the un-checkpointed form of this one query
    val und = edges.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val fromA = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(fromA, col("a")).otherwise(col("b")).as("u"),
      when(fromA, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(false)
    val adj = oriented.groupBy("u")
      .agg(collect_list(col("v")).as("nbrs"))
      .localCheckpoint(false)
    val triCorners = oriented
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u"), col("v"),
        explode(array_intersect(col("nu"), col("nv"))).as("w"))
      // one row per triangle, referenced once per corner below —
      // triangle-scaled, so the checkpoint is bounded by the answer
      .localCheckpoint(false)
    val perNode = triCorners.select(col("u").as("n"))
      .unionAll(triCorners.select(col("v").as("n")))
      .unionAll(triCorners.select(col("w").as("n")))
      .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("n_tri"))
    perNode.join(deg, "n")
      .select(col("n").as("node"), col("d").as("degree"), col("n_tri"),
        expr("(2 * n_tri * 1000000) div (d * (d - 1))").as("coeff_e6"))
  }

  /** k-core peeling, `rounds` synchronous rounds (Seidman 1983's
    * coreness, in the fixed-iteration discipline of PageRank/
    * LabelProp — a bounded unrolled plan whose result is a pure
    * function of the edges, so a SQL oracle replays every round):
    * each round drops every node whose CURRENT degree is below k,
    * then the edges touching it; surviving degrees shrink
    * monotonically, so the fixpoint is approached from above and a
    * converged round is a no-op (idempotent past convergence). The
    * classic density screen — spam/boilerplate link farms live in
    * high cores, long-tail content in low ones. Returns the
    * post-peel (node, degree) table; sort-free. Each round is one
    * degree aggregation + two semi joins — all equi-shuffles on node
    * ids, nothing driver-side.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // each round references the previous round's edge set THREE times
    // (the degree census + both semi-join sides), so the un-cut
    // lineage grows 3^rounds — the r16 plan dump measured 200 parquet
    // scans / 300 Exchanges for the two-round driver row. A lazy
    // localCheckpoint per round keeps the plan linear in `rounds`,
    // the same materialization point PageRank/LabelProp use; edge
    // sets only shrink while peeling, so every checkpoint is bounded
    // by the input edge count.
    var und = edges.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))
    for (_ <- 1 to rounds) {
      val keep = degrees(und).where(col("d") >= k)
      und = und
        .join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(false)
    }
    degrees(und).select(col("n").as("node"), col("d").as("degree"))
  }
}
