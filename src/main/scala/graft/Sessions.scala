package graft

import org.apache.spark.sql.SparkSession

/** One session factory for every main/test entry point.
  *
  * Session-wide conf lives here, at build time — notably the
  * nanos-as-long legacy flag the events table needs (TESTDATA.md:
  * events.ts is INT64 TIMESTAMP(NANOS)). Setting it per-loader was a
  * trap: a table loader that silently flips session conf can surprise
  * any concurrently-planned query (VERDICT r2 "What's wrong" #4).
  */
object Sessions {
  def local(cores: String): SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master(s"local[$cores]")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
