package graft

import graft.plans.MvRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** The materialized-view routing rule: matching aggregates read the
  * summary, non-matching or stale ones fall back to the base — and
  * either way the ANSWER is the base answer.
  */
class MvRewriteSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = MvRewrite.clear()

  private def freshBase(): String = {
    val dir = java.nio.file.Files.createTempDirectory("mv_spec").toString
    (1 to 100).map(i => (i.toLong, s"g${i % 4}", i * 1.5))
      .toDF("id", "grp", "v")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/base")
    dir
  }

  private def scansMv(df: DataFrame, mvDir: String): Boolean =
    df.queryExecution.executedPlan.toString.contains(mvDir)

  private def setup(dir: String): String = {
    val mvDir = s"$dir/mv"
    val base = spark.read.parquet(s"$dir/base")
    MvRewrite.materialize(base, Seq("grp"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"), mvDir = mvDir)
    MvRewrite.register(spark, s"$dir/base", mvDir, Seq("grp"),
      sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    mvDir
  }

  test("matching aggregate routes to the view and answers exactly") {
    val dir = freshBase()
    val mvDir = setup(dir)
    val q = spark.read.parquet(s"$dir/base").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), avg("v").as("av"),
        min("v").as("mn"), max("v").as("mx"))
    assert(scansMv(q, mvDir), "rewrite must fire for the covered shape")
    MvRewrite.clear()
    val baseAns = spark.read.parquet(s"$dir/base").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), avg("v").as("av"),
        min("v").as("mn"), max("v").as("mx"))
    assert(q.collect().sortBy(_.getString(0)).toSeq ==
      baseAns.collect().sortBy(_.getString(0)).toSeq)
  }

  test("filter on a grouping column re-applies to the view; global rollup routes too") {
    val dir = freshBase()
    val mvDir = setup(dir)
    val filtered = spark.read.parquet(s"$dir/base")
      .filter(col("grp") =!= "g0").groupBy("grp").agg(count(lit(1)).as("n"))
    assert(scansMv(filtered, mvDir))
    assert(filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("g1", 25L), ("g2", 25L), ("g3", 25L)))
    // grouping subset: global count over the grouped view
    val global = spark.read.parquet(s"$dir/base").agg(count(lit(1)).as("n"))
    assert(scansMv(global, mvDir))
    assert(global.head().getLong(0) == 100L)
  }

  test("non-derivable shapes stay on the base: unmeasured avg, distinct, non-group filter, finer grouping") {
    val dir = freshBase()
    val mvDir = setup(dir)
    val base = spark.read.parquet(s"$dir/base")
    Seq(
      base.groupBy("grp").agg(avg("id").as("a")), // no sum_id measure
      base.groupBy("grp").agg(countDistinct("v").as("a")),
      base.filter(col("v") > 10).groupBy("grp").agg(count(lit(1)).as("a")),
      base.groupBy("grp", "id").agg(count(lit(1)).as("a"))
    ).foreach(q => assert(!scansMv(q, mvDir), q.queryExecution.toString))
  }

  test("view selection: with fine and coarse views registered, the coarsest covering one wins") {
    val dir = freshBase()
    val fineDir = s"$dir/mv_fine"
    val coarseDir = s"$dir/mv_coarse"
    val base = spark.read.parquet(s"$dir/base")
    // fine = (grp, id) — as many rows as the base; coarse = (grp) — 4 rows
    MvRewrite.materialize(base, Seq("grp", "id"), sumCols = Seq("v"), mvDir = fineDir)
    MvRewrite.register(spark, s"$dir/base", fineDir, Seq("grp", "id"), sumCols = Seq("v"))
    MvRewrite.materialize(base, Seq("grp"), sumCols = Seq("v"), mvDir = coarseDir)
    MvRewrite.register(spark, s"$dir/base", coarseDir, Seq("grp"), sumCols = Seq("v"))
    val byGrp = base.groupBy("grp").agg(sum("v").as("sv"))
    assert(scansMv(byGrp, coarseDir) && !scansMv(byGrp, fineDir),
      "a grp-grain query must read the 4-row view, not the id-grain one")
    val byId = base.groupBy("grp", "id").agg(sum("v").as("sv"))
    assert(scansMv(byId, fineDir),
      "an id-grain query can only be answered by the fine view")
    assert(byGrp.collect().map(r => (r.getString(0), r.getDouble(1))).toMap ==
      byId.collect().groupBy(_.getString(0))
        .map { case (g, rs) => g -> rs.map(_.getDouble(2)).sum })
  }

  test("non-deterministic and reference-free predicates refuse the rewrite") {
    val dir = freshBase()
    val mvDir = setup(dir)
    val base = spark.read.parquet(s"$dir/base")
    // rand() < 0.5 references nothing and is non-deterministic:
    // routing it would re-sample at GROUP granularity (a ~50% GROUP
    // sample with FULL counts) — must stay on the base. (A provably
    // true rand() < 2.0 is eliminated by Spark before our rule runs,
    // which is equally sound.)
    val sampled = base.filter(rand() < 0.5).groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!scansMv(sampled, mvDir),
      "a non-deterministic predicate must never route")
    // sanity: a ROW sample sums to at most the base rows
    assert(sampled.collect().map(_.getLong(1)).sum <= 100L)
  }

  test("a persisted catalog restores routing in a fresh session with NO register call") {
    val dir = freshBase()
    val mvDir = setup(dir) // register() persisted _mv_catalog.json
    MvRewrite.clear()      // simulate a JVM restart: in-memory registry gone
    val q0 = spark.read.parquet(s"$dir/base").groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!scansMv(q0, mvDir), "cleared registry must not route")
    // explicit restore from the catalog file alone
    MvRewrite.loadCatalog(spark, mvDir)
    val q1 = spark.read.parquet(s"$dir/base").groupBy("grp").agg(count(lit(1)).as("n"))
    assert(scansMv(q1, mvDir), "loadCatalog must restore routing")
    assert(q1.collect().map(_.getLong(1)).toSeq.sorted == Seq(25L, 25L, 25L, 25L))
    // autoload: a FRESH session (new rule instance, cleared registry)
    // with only the conf set routes with no in-JVM call at all
    MvRewrite.clear()
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.mv.autoload", mvDir)
    val q2 = s2.read.parquet(s"$dir/base").groupBy("grp").agg(count(lit(1)).as("n"))
    assert(scansMv(q2, mvDir), "the autoload conf must restore routing unaided")
    // the stored fingerprint still guards freshness after restore
    Seq((1000L, "g9", 2.0)).toDF("id", "grp", "v")
      .write.mode("append").parquet(s"$dir/base")
    val q3 = s2.read.parquet(s"$dir/base").groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!scansMv(q3, mvDir), "a restored registration must still detect staleness")
  }

  test("autoload is fail-open: a missing catalog dir is skipped, good entries still load") {
    val dir = freshBase()
    val mvDir = setup(dir)
    MvRewrite.clear()
    val s2 = spark.newSession()
    // one bogus dir, one real one — the bad entry must not poison the good
    s2.conf.set("spark.graft.mv.autoload", s"/nonexistent/nope,$mvDir")
    val q = s2.read.parquet(s"$dir/base").groupBy("grp").agg(count(lit(1)).as("n"))
    assert(scansMv(q, mvDir),
      "a broken autoload entry must be skipped, not abort the query or the list")
    assert(q.collect().map(_.getLong(1)).sum == 100L)
  }

  test("a base write after register flips the fingerprint and disables routing") {
    val dir = freshBase()
    val mvDir = setup(dir)
    Seq((1000L, "g9", 2.0)).toDF("id", "grp", "v")
      .write.mode("append").parquet(s"$dir/base")
    val q = spark.read.parquet(s"$dir/base").groupBy("grp")
      .agg(count(lit(1)).as("n"))
    assert(!scansMv(q, mvDir), "stale view must not answer")
    assert(q.filter(col("grp") === "g9").head().getLong(1) == 1L)
  }

  test("snapshot-table base: O(1) version fingerprint, ZERO listing fingerprints (VERDICT r11 #5)") {
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files.createTempDirectory("mv_snap").toString
    val tbl = s"$dir/tbl"
    SnapshotTable.commitAppend(
      (1 to 100).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp"), tbl)
    val mvDir = s"$dir/mv"
    MvRewrite.materialize(SnapshotTable.read(spark, tbl), Seq("grp"), mvDir = mvDir)
    MvRewrite.register(spark, tbl, mvDir, Seq("grp"))
    val before = MvRewrite.listingFingerprints.get()
    val q = SnapshotTable.read(spark, tbl)
      .groupBy("grp").agg(count(lit(1)).as("n"))
    assert(scansMv(q, mvDir), "a snapshot-backed base must route")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("g0", 25L), ("g1", 25L), ("g2", 25L), ("g3", 25L)))
    assert(MvRewrite.listingFingerprints.get() == before,
      "the snapshot path must never run the O(files) listing fingerprint")
    // a commit moves the head version: the view is stale, falls back
    SnapshotTable.commitAppend(Seq((101L, "g9")).toDF("id", "grp"), tbl)
    val q2 = SnapshotTable.read(spark, tbl)
      .groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!scansMv(q2, mvDir), "a stale snapshot view must not answer")
    assert(q2.filter(col("grp") === "g9").head().getLong(1) == 1L)
    // a TIME-TRAVEL read of the registered version... is guarded by
    // the root-path hash half of the token: register against head v2,
    // then read v1 — same dir key, same head version, different file
    // set, so it must NOT route to v2's summary
    MvRewrite.materialize(SnapshotTable.read(spark, tbl), Seq("grp"), mvDir = mvDir)
    MvRewrite.register(spark, tbl, mvDir, Seq("grp"))
    val qOld = SnapshotTable.read(spark, tbl, Some(1L))
      .groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!scansMv(qOld, mvDir),
      "a time-travel read must never route to the head's summary")
    assert(MvRewrite.listingFingerprints.get() == before,
      "snapshot-path planning stays listing-free end to end")
  }
}
