package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Diagnostic: candidate-pair volume of simhashNearDup's pigeonhole
  * buckets at a given sf dir — how much pre-verify join output the
  * block decomposition generates, and which buckets are hot. Run:
  * `runMain graft.tools.BucketProbe /root/testdata/sf0.1`.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(spark, dir)
    val sigs = d
      .select(col("doc_id"), call_function("word_shingles", col("text"), lit(3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), call_function("simhash_bits", col("sh"), lit(64)).as("sig"))
    val blocks = 9
    val base = 64 / blocks
    val rem = 64 % blocks
    val blockCols = (0 until blocks).map { i =>
      val start = i * base + math.min(i, rem) + 1
      val len = base + (if (i < rem) 1 else 0)
      struct(lit(i).as("blk"), col("sig").substr(lit(start), lit(len)).as("bkey"))
    }
    val sizes = sigs
      .select(explode(array(blockCols: _*)).as("b"))
      .groupBy("b.blk", "b.bkey").count()
    println(s"[probe] docs: ${d.count()}")
    println("[probe] top buckets:")
    sizes.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"[probe]   $r"))
    val pairs = sizes.selectExpr("CAST(sum(count * (count - 1) / 2) AS LONG)")
      .collect()(0).getLong(0)
    println(s"[probe] total candidate pairs (pre-cap, pre-verify): $pairs")
    spark.stop()
  }
}
