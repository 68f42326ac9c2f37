package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space clustering for training-data curation — the
  * diversity half of the selection toolbox (cluster then balance, the
  * D4-style recipe: Tirumala et al. 2023, "D4: Improving LLM
  * Pretraining via Document De-Duplication and Diversification";
  * Lloyd 1982 for the iteration itself). The reference stops at
  * per-table reporting aggregation (sql_templates/Update Calabrio
  * Tables from Staging Tables (D_POST_INSTALL).sql); this is
  * extension-family machinery for the 100 TB curation
  * pipeline, built on the same exact-integer discipline as PageRank:
  * every distance, sum, and centroid mean is int64 arithmetic over
  * e3-quantized coordinates, so the whole fixpoint is bit-identical
  * in any engine and the driver oracle replays it in SQL.
  *
  * Why not spark.ml KMeans here: the IVF family already uses it where
  * approximate cells suffice (recall floors absorb numeric drift).
  * Curation SELECTION decides which documents survive — an
  * assignment that flips with partitioning or float-sum order would
  * make the pipeline non-reproducible run-to-run, which is exactly
  * what the integer fixpoint rules out.
  *
  * Scale shape per iteration: one map-only assignment pass (the k·dim
  * centroid table rides as a plan literal into whole-stage codegen —
  * the assignCells discipline) plus one partial-aggregated
  * (cluster, pos) shuffle of at most k·dim rows after map-side
  * combine. The only collects are the k-row init and the k·dim
  * centroid refresh — bounded whatever the corpus size.
  */
object Clustering {

  /** e3-quantized copy of an embedding: code_i = round(1000·x_i) as
    * int64 — HALF-AWAY-FROM-ZERO over identical IEEE doubles on both
    * engines (the embedding_quantize convention). */
  private def quant(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact squared euclidean distance between two int64 code arrays. */
  private def d2i(q: Column, c: Column): Column =
    aggregate(zip_with(q, c, (x, y) => (x - y) * (x - y)),
      lit(0L), (a, x) => a + x)

  /** `iters` Lloyd assignment passes over e3-quantized vectors,
    * returning (vec_id, cluster). Init = the codes of the k smallest
    * vec_ids (deterministic, engine-neutral); each refresh is the
    * element-wise truncating-division integer mean of the members
    * (`sum div n` — trunc toward zero on both engines), an empty
    * cluster keeps its previous centroid; distance ties break on the
    * smaller cluster id. iters assignments = iters−1 refreshes: the
    * returned assignment is against the final centroids.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 1 && iters >= 1, "kmeansAssign needs k >= 1 and iters >= 1")
    val q = emb.select(col("vec_id"), quant(col("embedding")).as("q"))
    var cents: Seq[(Int, Seq[Long])] = q.orderBy("vec_id").limit(k)
      .collect() // bounded: k rows
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toList: Seq[Long]) }
      .toSeq
    require(cents.size == k, s"need at least $k vectors to seed $k clusters")
    def assign(): DataFrame = {
      val scored = transform(typedLit(cents), c =>
        struct(d2i(col("q"), c.getField("_2")).as("d2"),
          c.getField("_1").as("cl")))
      q.withColumn("cluster", array_sort(scored).getItem(0).getField("cl"))
    }
    var assigned = assign()
    for (_ <- 2 to iters) {
      // refresh: k·dim rows survive the partial agg; collect is k·dim
      val sums = assigned
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"), expr("s div n").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cl, rows) =>
          (cl, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toList: Seq[Long])
        }
      cents = cents.map { case (cl, old) => (cl, sums.getOrElse(cl, old)) }
      assigned = assign()
    }
    assigned.select(col("vec_id"), col("cluster").cast("int").as("cluster"))
  }

  /** Cluster-balanced selection: the `perCluster` smallest vec_ids of
    * each cluster — the diversification step run AFTER clustering
    * (big topics stop dominating the mix). Selection goes through the
    * TopK bounded aggregator, not a row_number window: every
    * map-side partial reduces to ≤ perCluster rows before the
    * shuffle, so a skewed giant cluster costs k·perCluster shuffled
    * rows, never a full-cluster sort partition.
    */
  def clusterBalancedSample(assigned: DataFrame, perCluster: Int): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val agg = TopK.Agg(perCluster).toColumn
    assigned
      .select(col("cluster"),
        // smallest ids = best: TopK keeps (sim desc, id asc)
        (-col("vec_id")).as("sim_e6"), col("vec_id").as("neighbor_id"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => TopK.Scored(t._2, t._3))
      .agg(agg.name("topk"))
      .flatMap { case (cl, buf) => buf.items.map(s => (cl, s.neighbor_id)) }
      .toDF("cluster", "vec_id")
      .select(col("vec_id"), col("cluster"))
  }
}
