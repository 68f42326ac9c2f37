package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.sources.SnapshotTable

/** Decode-path A/B for the streaming source (r13 judge item #6):
  * isolates the per-row PARQUET DECODE cost that the fleet-level
  * ScaleProbe drains hide behind micro-batch machinery and 32-way
  * parallelism. One fat single-file slab (events × factor), drained
  * through `readStream.format("graft-snapshot")` into the noop sink
  * — the only work per row is the source's decode — once with the
  * vectorized reader and once with the Group reader forced
  * (`graft.noVectorized`), three alternating reps each, best wall
  * reported.
  *
  *   sbt "runMain graft.tools.DecodeProbe /root/testdata/sf0.1 100"
  */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, factorS) = args.take(2)
    val factor = factorS.toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.decodeProbeDebug", "1")
    val base = java.nio.file.Files.createTempDirectory("decode_probe").toString
    val tbl = s"$base/tbl"
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type", "ts")
    val big = spark.range(factor).crossJoin(ev)
      .select((col("event_id") + col("id") * 10000000L).as("event_id"),
        col("event_type"), col("ts"))
      .repartition(1)
    SnapshotTable.commitAppend(big, tbl)
    val n = SnapshotTable.read(spark, tbl).count()

    def drain(tag: String): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graft-snapshot").load(tbl)
        .writeStream.format("noop")
        .option("checkpointLocation",
          s"$base/ck-$tag-${System.nanoTime()}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val (vec, grp) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to 3).foreach { i =>
      vec += drain(s"vec$i")
      System.setProperty("graft.noVectorized", "1")
      try grp += drain(s"grp$i")
      finally System.clearProperty("graft.noVectorized")
    }
    val v = vec.result().min
    val g = grp.result().min
    println(f"DECODE rows=$n file=1 vectorized=$v%.2f group=$g%.2f " +
      f"speedup=${g / v}%.2fx")
    spark.stop()
  }
}
