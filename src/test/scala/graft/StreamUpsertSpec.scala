package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Streaming merge-on-read UPSERT (`commitStreamUpsertMoR` /
  * `IncrementalSync.upsertSync`): each epoch's rows append and an
  * equality delete of exactly its keys lands in the SAME manifest —
  * one atomic version, zero pre-existing files touched, sequence
  * scoping supersedes prior images while the epoch's own rows
  * survive, and the stream ledger makes replays no-op. */
class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("upsert_spec").toString + "/tbl"

  private def rows(dir: String): Map[Long, String] =
    SnapshotTable.read(spark, dir).select("id", "v").as[(Long, String)]
      .collect().toMap

  test("epoch algebra: supersede, insert, survive own epoch, chain across epochs") {
    val dir = freshDir()
    // epoch 0 CREATES the table
    val v1 = SnapshotTable.commitStreamUpsertMoR(
      Seq(1L -> "a", 2L -> "b").toDF("id", "v"), dir, Seq("id"), 0L)
    assert(v1.contains(1L))
    assert(SnapshotTable.pendingDeletes(spark, dir).isEmpty,
      "the creating epoch needs no delete — there are no prior files")
    // epoch 1: update key 2, insert key 3 — zero files touched
    val before = SnapshotTable.files(spark, dir, 1L).toSet
    val v2 = SnapshotTable.commitStreamUpsertMoR(
      Seq(2L -> "b2", 3L -> "c").toDF("id", "v"), dir, Seq("id"), 1L)
    assert(v2.contains(2L))
    assert(before.subsetOf(SnapshotTable.files(spark, dir, 2L).toSet))
    assert(rows(dir) == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // epoch 2 re-updates the same key: the chain's LAST image wins
    SnapshotTable.commitStreamUpsertMoR(
      Seq(2L -> "b3").toDF("id", "v"), dir, Seq("id"), 2L)
    assert(rows(dir) == Map(1L -> "a", 2L -> "b3", 3L -> "c"))
    // replayed epochs no-op (at-least-once → exactly-once)
    assert(SnapshotTable.commitStreamUpsertMoR(
      Seq(2L -> "stale").toDF("id", "v"), dir, Seq("id"), 1L).isEmpty)
    assert(rows(dir) == Map(1L -> "a", 2L -> "b3", 3L -> "c"))
    // fold is answer-preserving and restores the metadata fast paths
    SnapshotTable.applyDeletes(spark, dir)
    assert(rows(dir) == Map(1L -> "a", 2L -> "b3", 3L -> "c"))
    assert(SnapshotTable.countRows(spark, dir) == 3L)
  }

  test("a batch with duplicate keys is refused; empty batches no-op") {
    val dir = freshDir()
    SnapshotTable.commitStreamUpsertMoR(
      Seq(1L -> "a").toDF("id", "v"), dir, Seq("id"), 0L)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitStreamUpsertMoR(
        Seq(2L -> "x", 2L -> "y").toDF("id", "v"), dir, Seq("id"), 1L)
    }
    assert(e.getMessage.contains("ONE image per key"))
    assert(SnapshotTable.commitStreamUpsertMoR(
      Seq.empty[(Long, String)].toDF("id", "v"), dir, Seq("id"), 2L).isEmpty)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L))
  }

  test("upserts interleave with DV deletes: each applies to its own horizon") {
    val dir = freshDir()
    SnapshotTable.commitStreamUpsertMoR(
      (1L to 10L).map(i => i -> s"v$i").toDF("id", "v"), dir, Seq("id"), 0L)
    // a DV delete dooms ids 1-3 positionally
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") <= 3L)
    // a later upsert RE-INSERTS id 2 — the vector named the OLD file,
    // so the new image survives (file-identity scoping)
    SnapshotTable.commitStreamUpsertMoR(
      Seq(2L -> "back", 5L -> "v5b").toDF("id", "v"), dir, Seq("id"), 1L)
    assert(rows(dir) == (Map(4L -> "v4", 6L -> "v6", 7L -> "v7",
      8L -> "v8", 9L -> "v9", 10L -> "v10", 2L -> "back", 5L -> "v5b")))
    SnapshotTable.applyDeletes(spark, dir)
    assert(SnapshotTable.countRows(spark, dir) == 8L)
  }
}
