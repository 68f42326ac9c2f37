package graft.tools

import graft.{Sessions, SparkEntry}

/** Dump `.explain("formatted")` for named queries to text files — the
  * round-16 optimization evidence trail (plans/r16/<query>_before.txt /
  * _after.txt). Args are query names; SPARK_GRAFT_PLAN_OUT sets the
  * output dir (default plans/r16), SPARK_GRAFT_PLAN_SUFFIX the suffix
  * (default "before"). Building a row's DataFrame executes any eager
  * in-row asserts, so streaming rows (which run to completion at build
  * time and return a cold read) dump the cold-read plan — their
  * micro-batch plans are not capturable this way and are documented in
  * OPTIMIZATION_r16.md from code instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r16")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBoundedWindowWarning()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    args.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, s"${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"PLANDUMP ok $n")
      } catch {
        case e: Throwable => println(s"PLANDUMP FAILED $n: $e")
      }
    }
    spark.stop()
  }
}
