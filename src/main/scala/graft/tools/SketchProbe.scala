package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Measures actual sketch error — HLL++ distinct-count relative error
  * per event_type and GK quantile rank error over documents.n_chars —
  * so the floors pinned in Sketches.hllDistinctCheck/quantileCheck
  * come from measurement, not guesses. Both sketches are
  * deterministic on fixed data, so a measured floor is a stable
  * contract for the driver's sf. Not part of the driver contract — a
  * tuning tool.
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    val hll = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .select(col("event_type"), col("approx"), col("exact"),
        (abs(col("approx") - col("exact")) * 1000 / col("exact")).as("err_pm"))
      .collect()
    hll.foreach(r => println(s"PROBE hll ${r.mkString(" ")}"))
    println(s"PROBE hll max err_pm = ${hll.map(_.getDouble(3)).max}")

    val docs = Tables.documents(spark, sfDir).select(col("n_chars")).cache()
    val n = docs.count()
    for (qPm <- Seq(500, 900, 990); acc <- Seq(100, 1000)) {
      val v = docs.agg(
        percentile_approx(col("n_chars"), lit(qPm / 1000.0), lit(acc))).head().getLong(0)
      val rank = docs.filter(col("n_chars") <= v).count()
      val errPm = math.abs(rank * 1000.0 / n - qPm)
      println(f"PROBE quantile q=$qPm acc=$acc v=$v rank=$rank/$n errPm=$errPm%.2f")
    }
    spark.stop()
  }
}
