package graft.tools

import graft.{Sessions, Tables}
import graft.operators.Similarity

/** Measurement probe for the near-dup floor rows (like RecallProbe for
  * ANN): prints (a) what fraction of the exact Jaccard-≥½ near-dup
  * pairs (minhashNearDup — oracle-equal) fall within each simhash
  * Hamming radius, and (b) the embeddingNearDup pair counts vs the
  * LSH parameters at the driver threshold. Floors in SparkEntry are
  * pinned from these numbers, not guesses. Not part of the driver
  * contract — a tuning tool.
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).cache()
    val exact = Similarity.minhashNearDup(docs).select("doc_a", "doc_b").cache()
    val total = exact.count()
    for (h <- Seq(4, 8, 12, 16)) {
      val near = Similarity.simhashNearDup(docs, maxHamming = h)
      val hits = exact.join(near, Seq("doc_a", "doc_b"), "left_semi").count()
      println(s"PROBE simhash maxHamming=$h: $hits/$total exact near-dup pairs within radius")
    }
    val emb = Tables.embeddings(spark, sfDir).cache()
    for ((b, l) <- Seq((8, 8), (4, 16), (2, 32))) {
      val pairs = Similarity.embeddingNearDup(
        emb, simE6Threshold = 440000L, sigBits = b, numTables = l).count()
      println(s"PROBE embeddingNearDup b=$b L=$l threshold=440000: $pairs pairs")
    }
    spark.stop()
  }
}
