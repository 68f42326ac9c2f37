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

    // Count–Min overestimate on the word-term frame the driver row
    // uses, at the row's depth/width: per exact-top-k term, the
    // estimate's overshoot as per-mille of the stream length N —
    // the measured basis for countMinCheck's maxOverPerMille floor.
    {
      val terms = Tables.documents(spark, sfDir)
        .select(explode(expr(
          "filter(split(lower(text), '[^a-z]+'), t -> length(t) >= 2)")).as("term"))
      val (depth, width) = (5, 1024)
      val cm = graft.operators.Sketches.countMinCheck(terms, depth, width, k = 10)
      cm.collect().foreach(r => println(s"PROBE cm ${r.mkString(" ")}"))
      import spark.implicits._
      val agg = new graft.operators.Sketches.CountMin(depth, width)
      val sk = terms.as[String].select(agg.toColumn).toDF("_sk")
      val nTotal = terms.count()
      val over = terms.groupBy("term").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(sk))
        .select(col("term"), col("n"),
          (call_function("cm_estimate", col("_sk"), col("term"),
            lit(depth), lit(width)) - col("n")).as("over"))
        .agg(max(col("over")).as("max_over")).head().getLong(0)
      println(f"PROBE cm max over = $over of N=$nTotal (${over * 1000.0 / nTotal}%.3f pm)")
    }

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
