package graft

import graft.sources.SnapshotTable
import graft.sources.dsv2.GraftTableProps
import org.apache.spark.sql.functions._

/** Partition-spec EVOLUTION (`CALL system.evolve_partitioning`): the
  * spec is a metadata declaration over the clustering lattice, so
  * replacing it is a props write — zero data I/O, zero versions.
  * Existing files keep their layout and stay exactly readable
  * (pruning is per-file-stats based, never directory based); future
  * writes cluster by the new spec; the census and dynamic overwrite
  * follow the new spec, with old files reported as straddlers /
  * classified as boundary until rewritten. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"pe_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    (tag, root)
  }

  test("evolution is metadata-only; old reads unchanged; new writes follow the new spec") {
    val (cat, root) = freshCat("pe1")
    spark.sql(s"CREATE TABLE $cat.ns.ev " +
      "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val dir = s"$root/ns/ev"
    spark.sql(s"INSERT INTO $cat.ns.ev SELECT id, concat('t', id % 3), " +
      "timestampadd(HOUR, CAST(id % 96 AS INT), TIMESTAMP '2026-01-01 00:00:00') " +
      "FROM range(0, 3000)")
    val vBefore = SnapshotTable.versions(spark, dir)
    val filesBefore = SnapshotTable.files(spark, dir, vBefore.last)
    val res = spark.sql(
      s"CALL $cat.system.evolve_partitioning('ns.ev', 'event_type')")
      .collect()
    assert(res.head.getString(0) == "days(ts)" &&
      res.head.getString(1) == "event_type")
    // metadata-only: no new version, no file touched
    assert(SnapshotTable.versions(spark, dir) == vBefore)
    assert(SnapshotTable.files(spark, dir, vBefore.last) == filesBefore)
    val props = GraftTableProps.read(spark, dir)
    assert(props("partitioned_by") == "event_type")
    // the old spec's derived ts leader leaves with it
    assert(GraftTableProps.cols(props, "sort_cols") == Seq("event_type"))
    assert(props("partition_spec_history").matches("v\\d+: days\\(ts\\)"),
      s"history must record the superseded spec, got " +
        props("partition_spec_history"))
    // old files stay exactly readable under the evolved spec
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ev")
      .head().getLong(0) == 3000L)
    // a new write clusters by the evolved spec: its files carry
    // single-value event_type stats, so the census ASSIGNS them while
    // the pre-evolution files (no event_type stats) report as the
    // honest straddler row
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql(s"INSERT INTO $cat.ns.ev " +
      "SELECT id + 10000, concat('t', id % 3), " +
      "timestampadd(HOUR, CAST(id % 96 AS INT), TIMESTAMP '2026-02-01 00:00:00') " +
      "FROM range(0, 3000)")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val census = SnapshotTable.partitionCensus(spark, dir)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(census.contains(None),
      s"pre-evolution files must report as straddlers, got $census")
    assert(census.keys.flatten.exists(_.contains("event_type=")),
      s"post-evolution files must assign under the new spec, got $census")
  }

  test("dynamic overwrite after evolution replaces the tuple exactly, including old-spec rows") {
    val (cat, root) = freshCat("pe2")
    spark.sql(s"CREATE TABLE $cat.ns.ev2 " +
      "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val dir = s"$root/ns/ev2"
    // pre-evolution history: 4 days × 3 types, clustered on ts ONLY
    spark.sql(s"INSERT INTO $cat.ns.ev2 SELECT id, concat('t', id % 3), " +
      "timestampadd(HOUR, CAST(id % 96 AS INT), TIMESTAMP '2026-01-01 00:00:00') " +
      "FROM range(0, 3000)")
    spark.sql(
      s"CALL $cat.system.evolve_partitioning('ns.ev2', 'days(ts), event_type')")
    val vBefore = SnapshotTable.versions(spark, dir).last
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $cat.ns.ev2 " +
      "SELECT id + 50000, 't1', TIMESTAMP '2026-01-02 12:00:00' " +
      "FROM range(0, 7)")
    finally prev.fold(
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    assert(SnapshotTable.versions(spark, dir).last == vBefore + 1,
      "the overwrite must be ONE commit")
    // exactly the (2026-01-02, t1) tuple replaced — rows of that tuple
    // living in OLD-spec files (no event_type stats → boundary) must
    // be gone, every other (day, type) combination intact
    val got = spark.sql(s"SELECT event_id FROM $cat.ns.ev2 WHERE " +
      "CAST(ts AS DATE) = DATE '2026-01-02' AND event_type = 't1' " +
      "ORDER BY event_id").as[Long].collect().toSeq
    assert(got == (50000L to 50006L),
      s"the tuple must hold exactly the batch, got ${got.take(10)}")
    val expectOthers = (0L until 3000L).count { id =>
      val day = (id % 96) / 24
      !(day == 1 && id % 3 == 1)
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ev2 WHERE event_id < 50000")
      .head().getLong(0) == expectOthers.toLong,
      "every other (day, type) combination must survive")
  }

  test("un-partitioning drops the derived declarations; bucket leaves with its spec") {
    val (cat, root) = freshCat("pe3")
    spark.sql(s"CREATE TABLE $cat.ns.ev3 " +
      "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts), bucket(4, event_id)) " +
      "TBLPROPERTIES ('sort_cols' = 'event_type')")
    val dir = s"$root/ns/ev3"
    val p0 = GraftTableProps.read(spark, dir)
    assert(GraftTableProps.bucketSpec(p0).contains(("event_id", 4)))
    assert(GraftTableProps.cols(p0, "sort_cols") == Seq("ts", "event_type"))
    spark.sql(s"CALL $cat.system.evolve_partitioning('ns.ev3', '')")
    val p1 = GraftTableProps.read(spark, dir)
    assert(!p1.contains("partitioned_by"))
    assert(GraftTableProps.bucketSpec(p1).isEmpty,
      "the spec's bucket must leave with the spec")
    // the USER's refining sort order survives un-partitioning
    assert(GraftTableProps.cols(p1, "sort_cols") == Seq("event_type"))
    // a formerly-referenced column is now free to rename
    spark.sql(s"ALTER TABLE $cat.ns.ev3 RENAME COLUMN ts TO at")
    assert(spark.table(s"$cat.ns.ev3").columns.contains("at"))
  }

  test("validation: unknown column, wrong types, bad transforms, guarded ALTER") {
    val (cat, root) = freshCat("pe4")
    spark.sql(s"CREATE TABLE $cat.ns.ev4 " +
      "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    def fails(spec: String, frag: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.evolve_partitioning('ns.ev4', '$spec')")
      }
      assert(e.getMessage.contains(frag), s"'$spec': ${e.getMessage}")
    }
    fails("days(nope)", "not a column")
    fails("days(event_type)", "TIMESTAMP or DATE")
    fails("bucket(8, event_type)", "integral")
    fails("bucket(4, event_id), bucket(8, event_id)", "at most one bucket")
    fails("hilbert(ts)", "unsupported transform")
    // the standing spec still guards renames of its columns — with the
    // evolution escape hatch named in the refusal
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.ev4 RENAME COLUMN ts TO at")
    }
    assert(e.getMessage.contains("evolve_partitioning"))
    // the recorded history props are not hand-editable
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.ev4 SET TBLPROPERTIES " +
        "('partitioned_by' = 'days(ts)')")
    }
    assert(e2.getMessage.contains("evolve_partitioning"))
  }

  test("bucket evolution re-arms SPJ only through a fresh layout") {
    val (cat, root) = freshCat("pe5")
    spark.sql(s"CREATE TABLE $cat.ns.ev5 (event_id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, event_id))")
    val dir = s"$root/ns/ev5"
    spark.sql(s"INSERT INTO $cat.ns.ev5 SELECT id, id % 97 FROM range(0, 2000)")
    spark.sql(
      s"CALL $cat.system.evolve_partitioning('ns.ev5', 'bucket(8, event_id)')")
    val props = GraftTableProps.read(spark, dir)
    assert(GraftTableProps.bucketSpec(props).contains(("event_id", 8)),
      "the evolved bucket pair must record")
    // old files carry (event_id, 4)-keyed placements — they can never
    // serve the (event_id, 8) spec (stats are keyed by (col, n)), and
    // the table still answers exactly
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ev5")
      .head().getLong(0) == 2000L)
    // a rebucket under the new spec restores one-file-per-bucket layout
    spark.sql(s"CALL $cat.system.rebucket('ns.ev5')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ev5")
      .head().getLong(0) == 2000L)
  }
}
