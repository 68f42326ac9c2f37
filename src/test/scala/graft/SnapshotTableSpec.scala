package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** The snapshot-manifest table format: versioned commits, time
  * travel, optimistic-concurrency retry, and vacuum's liveness rule.
  */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("snap_spec").toString + "/tbl"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("append commits new versions; every old version stays readable") {
    val dir = freshDir()
    assert(SnapshotTable.versions(spark, dir).isEmpty)
    val v1 = SnapshotTable.commitAppend(Seq(1L, 2L).toDF("id"), dir)
    val v2 = SnapshotTable.commitAppend(Seq(3L).toDF("id"), dir)
    assert((v1, v2) == (1L, 2L))
    assert(ids(SnapshotTable.read(spark, dir)) == Seq(1L, 2L, 3L))
    assert(ids(SnapshotTable.read(spark, dir, Some(1L))) == Seq(1L, 2L),
      "time travel to v1 must not see the append")
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, dir, Some(9L))
    }
  }

  test("overwrite replaces the head but not history; vacuum drops only dead files") {
    val dir = freshDir()
    SnapshotTable.commitAppend(Seq(1L, 2L).toDF("id"), dir)
    SnapshotTable.commitAppend(Seq(3L).toDF("id"), dir)
    SnapshotTable.commitOverwrite(Seq(10L, 11L).toDF("id"), dir)
    assert(ids(SnapshotTable.read(spark, dir)) == Seq(10L, 11L))
    assert(ids(SnapshotTable.read(spark, dir, Some(2L))) == Seq(1L, 2L, 3L),
      "pre-overwrite snapshot must remain intact")
    val deleted = SnapshotTable.vacuum(spark, dir, keepVersions = 1)
    assert(deleted > 0, "the overwritten batches are dead and must be removed")
    assert(ids(SnapshotTable.read(spark, dir)) == Seq(10L, 11L),
      "vacuum must never touch files the head references")
    assert(SnapshotTable.versions(spark, dir) == Seq(3L))
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, dir, Some(2L))
    }
  }

  test("a racing committer forces a retry on top of the new head") {
    val dir = freshDir()
    SnapshotTable.commitAppend(Seq(1L).toDF("id"), dir)
    // simulate a racer that lands v2 first: copy v1's manifest into
    // the v2 slot directly — our commit's rename to v2 must fail and
    // retry as v3, appending on top of the racer's head
    val m = java.nio.file.Paths.get(dir, "_manifests")
    java.nio.file.Files.copy(m.resolve("v1.json"), m.resolve("v2.json"))
    val v = SnapshotTable.commitAppend(Seq(2L).toDF("id"), dir)
    assert(v == 3L, "the lost race must surface as a later version")
    assert(ids(SnapshotTable.read(spark, dir)) == Seq(1L, 2L))
  }

  test("commitStreamBatch: a replayed batch id no-ops; distinct ids append") {
    val dir = freshDir()
    assert(SnapshotTable.commitStreamBatch(Seq(1L).toDF("id"), dir, batchId = 0L)
      .contains(1L))
    assert(SnapshotTable.commitStreamBatch(Seq(2L).toDF("id"), dir, batchId = 1L)
      .contains(2L))
    assert(SnapshotTable.commitStreamBatch(Seq(99L).toDF("id"), dir, batchId = 0L)
      .isEmpty, "batch 0 is already in the ledger — replay must no-op")
    assert(ids(SnapshotTable.read(spark, dir)) == Seq(1L, 2L))
    // a plain (non-stream) append carries no batch id and never blocks one
    SnapshotTable.commitAppend(Seq(3L).toDF("id"), dir)
    assert(SnapshotTable.committedBatchIds(spark, dir) == Set(0L, 1L))
  }

  test("commitMerge upserts by key as a new version; compactHead rewrites content-neutral") {
    val dir = freshDir()
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(3), dir)
    val v2 = SnapshotTable.commitMerge(
      Seq((2L, "B"), (9L, "z")).toDF("id", "v"), dir, Seq("id"))
    assert(v2 == 2L)
    def snap(ver: Option[Long]) = SnapshotTable.read(spark, dir, ver)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(snap(None) == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "z")))
    assert(snap(Some(1L)) == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "the pre-merge snapshot must stay intact")
    val before = SnapshotTable.files(spark, dir, 2L).size
    val v3 = SnapshotTable.compactHead(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(v3 == 3L && SnapshotTable.files(spark, dir, 3L).size == 1)
    assert(before >= 1)
    assert(snap(None) == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "z")),
      "OPTIMIZE must not change a row")
    // DELETE by key: survivors only at the head, pre-delete snapshot intact
    val v4 = SnapshotTable.commitDelete(
      Seq(2L, 9L, 777L).toDF("id"), dir, Seq("id"))
    assert(v4 == 4L)
    assert(snap(None) == Seq((1L, "a"), (3L, "c")),
      "deleted keys must be gone (absent keys are a no-op)")
    assert(snap(Some(3L)) == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "z")),
      "the pre-delete snapshot must remain time-travelable")
  }

  test("additive schema evolution: a widened batch unions in, old rows read null") {
    val dir = freshDir()
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("id", "v"), dir)
    SnapshotTable.commitAppend(
      Seq((2L, "b", 7L)).toDF("id", "v", "extra"), dir)
    val head = SnapshotTable.read(spark, dir)
    assert(head.columns.toSeq == Seq("id", "v", "extra"))
    assert(head.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.get(2)))).sortBy(_._1).toSeq ==
      Seq((1L, "a", None), (2L, "b", Some(7L))))
    // time travel predates the widening: v1 has the narrow schema
    assert(SnapshotTable.read(spark, dir, Some(1L)).columns.toSeq == Seq("id", "v"))
  }

  test("changesBetween: appends diff at the file level; rewrites fall back to content diff") {
    val dir = freshDir()
    SnapshotTable.commitAppend(Seq(1L, 2L).toDF("id"), dir)
    SnapshotTable.commitAppend(Seq(3L, 4L).toDF("id"), dir)
    def ch(a: Long, b: Long) = SnapshotTable.changesBetween(spark, dir, a, b)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // append-only: the change set is exactly the added batch
    assert(ch(1L, 2L) == Seq((3L, "insert"), (4L, "insert")))
    // a rewriting commit (merge) forces the content diff
    val d2 = freshDir()
    SnapshotTable.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d2)
    SnapshotTable.commitMerge(Seq((2L, "B"), (9L, "z")).toDF("id", "v"), d2, Seq("id"))
    val got = SnapshotTable.changesBetween(spark, d2, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((2L, "B", "insert"), (9L, "z", "insert"), (2L, "b", "delete")))
    intercept[IllegalArgumentException] {
      SnapshotTable.changesBetween(spark, d2, 2L, 2L)
    }
  }

  test("readers compose as plain parquet scans: filters push down") {
    val dir = freshDir()
    SnapshotTable.commitAppend(
      (1L to 100L).toDF("id").withColumn("grp", col("id") % 4), dir)
    val q = SnapshotTable.read(spark, dir).filter(col("id") > 90)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)"),
      s"manifest reads must keep parquet pushdown:\n$plan")
    assert(q.count() == 10)
  }
}
