package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; Catalyst handles column pruning and
  * predicate pushdown into the scan, so loaders stay dumb on purpose —
  * callers `select`/`filter` and the optimizer does the rest.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet's `ts` physical type has varied across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) (read as a nanos
    * long via the legacy flag Sessions.local sets) and plain
    * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ when the
    * file isn't UTC-adjusted. Normalize every variant to a
    * microsecond TimestampType column so downstream `unix_micros`
    * arithmetic is uniform. The session runs in UTC
    * (Sessions.scala:31), so the NTZ cast is value-identical. Integer
    * `DIV` keeps the full 63-bit nanos value — a double division
    * would lose precision past 2^53.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(load(spark, sfDir, "events"))

  /** Type-adaptive `ts` normalization — shared by the batch loader and
    * the file-stream readers, which hit the same parquet with their
    * own schema plumbing.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case _: LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampType => df
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other — expected nanos long or timestamp")
    }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
