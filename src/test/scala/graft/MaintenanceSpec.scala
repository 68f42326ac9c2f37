package graft

import graft.operators.{CalabrioSync, Maintenance, Shred}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-semantics properties (SURVEY §5 item 2): the reference's
  * whole design bet is that re-extracting an overlapping window and
  * re-applying the batch is a no-op — idempotency under replay.
  */
class MaintenanceSpec extends SparkSpec {

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("insertOnlyMerge: replaying the same batch is a no-op") {
    val t = Shred.contacts(Fixtures.qaContacts(spark))
    val s = Shred.contacts(Fixtures.qaContactsRestated(spark))
    val once = Maintenance.insertOnlyMerge(t, s, Seq("contact_id")).cache()
    val twice = Maintenance.insertOnlyMerge(once, s, Seq("contact_id"))
    assertSameRows(once, twice)
  }

  test("insertOnlyMerge: matched rows keep the target's values") {
    val t = Shred.contacts(Fixtures.qaContacts(spark)).cache()
    val s = Shred.contacts(Fixtures.qaContactsRestated(spark)).cache()
    val overlap = s.join(t, Seq("contact_id"), "left_semi").cache()
    assert(overlap.count() > 0, "fixtures must overlap for this test")
    val out = Maintenance.insertOnlyMerge(t, s, Seq("contact_id"))
    // target rows unchanged
    assertSameRows(out.join(t.select("contact_id"), Seq("contact_id"), "left_semi"), t)
    // row count = |target| + |source \ target|
    assert(out.count() === t.count() + (s.count() - overlap.count()))
  }

  test("upsertKeepCols: keeps evaluated_date and contact_id from target on match") {
    val target = Shred.evaluations(Fixtures.evaluations(spark)).cache()
    val source = Shred.evaluations(Fixtures.evaluationsRestated(spark)).cache()
    val out = Maintenance.upsertKeepCols(
      target, source, Seq("evaluation_id"), Set("contact_id", "evaluated_date")).cache()
    val matched = target.select("evaluation_id", "evaluated_date")
      .join(source.select("evaluation_id"), Seq("evaluation_id"), "left_semi")
    // matched rows retain the ORIGINAL evaluated_date
    val kept = out.select("evaluation_id", "evaluated_date")
      .join(matched.withColumnRenamed("evaluated_date", "orig"), Seq("evaluation_id"))
    assert(kept.filter(col("evaluated_date") =!= col("orig")).count() === 0)
    // non-matched source rows are inserted whole
    val inserted = source.join(target.select("evaluation_id"), Seq("evaluation_id"), "left_anti")
    assertSameRows(
      out.join(inserted.select("evaluation_id"), Seq("evaluation_id"), "left_semi"),
      inserted)
    // keys unique after merge
    assert(out.select("evaluation_id").distinct().count() === out.count())
  }

  test("upsertKeepCols: replay idempotency") {
    val target = Shred.evaluations(Fixtures.evaluations(spark))
    val source = Shred.evaluations(Fixtures.evaluationsRestated(spark)).cache()
    val keep = Set("contact_id", "evaluated_date")
    val once = Maintenance.upsertKeepCols(target, source, Seq("evaluation_id"), keep).cache()
    val twice = Maintenance.upsertKeepCols(once, source, Seq("evaluation_id"), keep)
    assertSameRows(once, twice)
  }

  test("deleteVanished: removes only restated-contact rows whose eval vanished") {
    val target = Shred.evaluations(Fixtures.evaluations(spark)).cache()
    val rc = Fixtures.qaContactsRestated(spark).select(col("id").as("contact_id")).cache()
    val se = Fixtures.evaluationsRestated(spark).select(col("id").as("evaluation_id")).cache()
    val out = Maintenance.deleteVanished(target, rc, se).cache()
    // non-restated contacts fully untouched
    val untouched = target.join(rc, Seq("contact_id"), "left_anti")
    assertSameRows(out.join(rc, Seq("contact_id"), "left_anti"), untouched)
    // no surviving row is (restated AND vanished)
    val bad = out
      .join(rc, Seq("contact_id"), "left_semi")
      .join(se, Seq("evaluation_id"), "left_anti")
    assert(bad.count() === 0)
  }

  test("rebuildForContacts: replay idempotency") {
    val rc = Fixtures.qaContactsRestated(spark).select(col("id").as("contact_id")).cache()
    val fresh = Shred.scores(Fixtures.evaluationsRestated(spark)).cache()
    val once = CalabrioSync.rebuiltScores(spark).cache()
    val twice = Maintenance.rebuildForContacts(once, rc, fresh)
    assertSameRows(once, twice)
  }

  private def scd2Fixture = {
    import spark.implicits._
    val dim = Seq(
      // key 1: history + current, update arrives CHANGED
      (1L, "gold", Some(10), "2023-01-01", Some("2024-01-01"), false),
      (1L, "silver", Some(10), "2024-01-01", None, true),
      // key 2: current only, update arrives IDENTICAL (incl. null col)
      (2L, "bronze", None, "2024-01-01", None, true),
      // key 3: current only, no update
      (3L, "gold", Some(30), "2024-01-01", None, true))
      .toDF("k", "seg", "tier", "valid_from", "valid_to", "is_current")
      .select(col("k"), col("seg"), col("tier"),
        to_date(col("valid_from")).as("valid_from"),
        to_date(col("valid_to")).as("valid_to"), col("is_current"))
    val upd = Seq(
      (1L, "platinum", Some(10), "2024-06-01"),
      (2L, "bronze", None: Option[Int], "2024-06-01"),
      (9L, "new", Some(90), "2024-06-01"))
      .toDF("k", "seg", "tier", "eff")
      .select(col("k"), col("seg"), col("tier"), to_date(col("eff")).as("eff"))
    (dim, upd)
  }

  test("scd2Merge: change closes + versions, identical no-ops, new inserts, history passes") {
    val (dim, upd) = scd2Fixture
    val out = Maintenance.scd2Merge(dim, upd, "k", Seq("seg", "tier"), "eff")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), String.valueOf(r.getDate(3)),
        Option(r.getDate(4)).map(String.valueOf(_)), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "gold", Some(10), "2023-01-01", Some("2024-01-01"), false),
      (1L, "silver", Some(10), "2024-01-01", Some("2024-06-01"), false),
      (1L, "platinum", Some(10), "2024-06-01", None, true),
      (2L, "bronze", None, "2024-01-01", None, true),
      (3L, "gold", Some(30), "2024-01-01", None, true),
      (9L, "new", Some(90), "2024-06-01", None, true)))
  }

  test("scd2Merge: replaying the same batch is a no-op") {
    val (dim, upd) = scd2Fixture
    val once = Maintenance.scd2Merge(dim, upd, "k", Seq("seg", "tier"), "eff").cache()
    val twice = Maintenance.scd2Merge(once, upd, "k", Seq("seg", "tier"), "eff")
    assertSameRows(once, twice)
  }
}
