package graft.tools

import graft.{Sessions, Tables}
import graft.operators.Similarity

/** Parameter-sweep probe for the ANN recall/candidate-volume trade:
  * prints recall@10 per (sigBits, numTables) so floors in SparkEntry
  * are pinned from measurement, not guesses. Not part of the driver
  * contract — a tuning tool.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, sfDir).cache()
    val exact = Similarity.cosineTopK(e).cache()
    val n = e.count()
    for ((b, l) <- Seq((6, 8), (5, 12), (4, 12), (5, 16))) {
      val ann = Similarity.annTopKLsh(e, sigBits = b, numTables = l)
      val hits = exact.join(ann, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy("q_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val perQ = (0L until 5L).map(q => hits.getOrElse(q, 0L))
      println(s"PROBE b=$b L=$l n=$n recall@10 per query: ${perQ.mkString(",")} " +
        s"total=${perQ.sum}/50")
    }
    // IVF: does a cheaper KMeans fit hold the recall floor? (centroid
    // quality only moves recall at nprobe<nlist — measure, don't guess)
    for (iters <- Seq(10, 5, 3, 2)) {
      val t0 = System.nanoTime()
      val ivf = Similarity.ivfTopK(e, maxIter = iters)
      val hits = exact.join(ivf, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy("q_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      val perQ = (0L until 5L).map(q => hits.getOrElse(q, 0L))
      println(f"PROBE ivf maxIter=$iters recall@10 per query: ${perQ.mkString(",")} " +
        f"total=${perQ.sum}/50 (${secs}%.2f s)")
    }
    // PQ: measured recall of the code-compressed ADC ranking per
    // (numSub, ncodes) — pins the pq_recall floor
    for ((m, c, it) <- Seq((16, 16, 5), (16, 16, 20), (16, 32, 20))) {
      val t0 = System.nanoTime()
      val pq = Similarity.pqTopK(e, numSub = m, ncodes = c, maxIter = it)
      val hits = exact.join(pq, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy("q_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      val perQ = (0L until 5L).map(q => hits.getOrElse(q, 0L))
      println(f"PROBE pq m=$m ncodes=$c it=$it recall@10 per query: ${perQ.mkString(",")} " +
        f"total=${perQ.sum}/50 (${secs}%.2f s)")
    }
    // IVF-PQ: cell pruning stacked on residual codes — recall vs nprobe
    val ivfpqDir = java.nio.file.Files.createTempDirectory("ivfpq_probe").toString
    Similarity.buildIvfPqIndex(e, ivfpqDir)
    val qs = e.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .selectExpr("vec_id as q_id", "embedding as q_emb")
    for (np <- Seq(4, 8, 16)) {
      val t0 = System.nanoTime()
      val a = Similarity.ivfPqTopKFromIndex(spark, ivfpqDir, qs, k = 10, nprobe = np)
      val hits = exact.join(a, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy("q_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      val perQ = (0L until 5L).map(q => hits.getOrElse(q, 0L))
      println(f"PROBE ivfpq nprobe=$np recall@10 per query: ${perQ.mkString(",")} " +
        f"total=${perQ.sum}/50 (${secs}%.2f s)")
    }
    spark.stop()
  }
}
