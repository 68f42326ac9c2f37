package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Positional DELETE VECTORS — the merge-on-read delete's other half
  * (the real formats' position deletes / deletion vectors, vs the
  * equality deletes `commitDeleteMoR` covers): an arbitrary-predicate
  * DELETE lands as a delta-sized (file, row-ordinal) vector, zero data
  * files rewritten, applied file-locally at read via the reader's own
  * `_metadata.row_index`, with EXACT cardinality (countRows stays
  * metadata-only while pending — the fast path equality deletes must
  * refuse). Fold is file-granular by construction: only named files
  * rewrite. */
class DvDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("dv_spec").toString + "/tbl"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  /** 1..200 range-clustered on id into 4 files with id stats. */
  private def rangeTable(dir: String): Unit = {
    val df = (1L to 200L).toDF("id")
      .withColumn("tag", concat(lit("t"), col("id") % 10))
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions("id")
    SnapshotTable.commitAppend(df, dir, statsCols = Seq("id"))
  }

  test("DV delete: zero data files touched, exact count, logical read") {
    val dir = freshDir()
    rangeTable(dir)
    val v1Files = SnapshotTable.files(spark, dir, 1L)
    val v2 = SnapshotTable.commitDeleteVectorsWhere(
      spark, dir, col("id") % 10 === 3)
    assert(v2 == 2L)
    assert(SnapshotTable.files(spark, dir, 2L) == v1Files,
      "a DV commit must touch zero data files")
    val dvs = SnapshotTable.pendingDeleteVectors(spark, dir)
    assert(dvs.map(_._1) == Seq(2L) && dvs.head._2 == 20L,
      s"the vector must carry its exact cardinality, got $dvs")
    assert(ids(SnapshotTable.read(spark, dir)) ==
      (1L to 200L).filterNot(_ % 10 == 3))
    // the differentiator: COUNT stays metadata-only under a pending DV
    assert(SnapshotTable.countRows(spark, dir) == 180L)
    // time travel to the pre-DV version still sees every row
    assert(ids(SnapshotTable.read(spark, dir, Some(1L))) == (1L to 200L))
  }

  test("overlapping DVs mark disjoint positions; counts stay exact") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") % 10 === 3)
    // id % 5 == 3 ⇔ id % 10 ∈ {3, 8}: half its matches are already
    // DV-deleted and must NOT be re-marked
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") % 5 === 3)
    val dvs = SnapshotTable.pendingDeleteVectors(spark, dir)
    assert(dvs.map(_._2) == Seq(20L, 20L),
      s"the second vector must mark only the NEW matches, got $dvs")
    val expect = (1L to 200L).filterNot(i => i % 10 == 3 || i % 5 == 3)
    assert(ids(SnapshotTable.read(spark, dir)) == expect)
    assert(SnapshotTable.countRows(spark, dir) == expect.size.toLong)
  }

  test("stats prune bounds the vector to the candidate files") {
    val dir = freshDir()
    rangeTable(dir)
    // range-clustered: ids 1..50 live in the first file — the band
    // predicate's positions must come from a strict file subset
    SnapshotTable.commitDeleteVectorsWhere(
      spark, dir, col("id") >= 10L && col("id") <= 40L && col("tag") === "t3")
    val dvs = SnapshotTable.pendingDeleteVectors(spark, dir)
    val total = SnapshotTable.files(spark, dir, 1L).size
    assert(dvs.head._3.size < total,
      s"a band predicate must affect fewer than all $total files")
    assert(ids(SnapshotTable.read(spark, dir)) ==
      (1L to 200L).filterNot(i => i >= 10 && i <= 40 && i % 10 == 3))
  }

  test("fold is file-granular: only named files rewrite") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(
      spark, dir, col("id") >= 10L && col("id") <= 40L)
    val before = SnapshotTable.files(spark, dir, 2L)
    val named = SnapshotTable.pendingDeleteVectors(spark, dir)
      .flatMap(_._3.map(_._1)).toSet
    val v3 = SnapshotTable.applyDeletes(spark, dir)
    assert(SnapshotTable.pendingDeleteVectors(spark, dir).isEmpty)
    val after = SnapshotTable.files(spark, dir, v3).toSet
    before.filterNot(named.contains).foreach(p =>
      assert(after.contains(p), s"unnamed file $p must carry by reference"))
    named.foreach(p => assert(!after.contains(p),
      s"named file $p must have been rewritten"))
    assert(ids(SnapshotTable.read(spark, dir)) ==
      (1L to 200L).filterNot(i => i >= 10 && i <= 40))
    assert(SnapshotTable.countRows(spark, dir) == 169L)
  }

  test("file-identity scoping: a re-inserted row is never retro-deleted") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") === 5L)
    assert(!ids(SnapshotTable.read(spark, dir)).contains(5L))
    SnapshotTable.commitAppend(
      Seq(5L).toDF("id").withColumn("tag", lit("t5")), dir)
    assert(ids(SnapshotTable.read(spark, dir)).count(_ == 5L) == 1,
      "the re-inserted row lands in a file the vector never names")
  }

  test("DVs are schema-op immune: rename/drop after the vector, rows stay deleted") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("tag") === "t3")
    SnapshotTable.commitRenameColumn(spark, dir, "tag", "label")
    val head = SnapshotTable.read(spark, dir)
    assert(head.columns.toSeq.contains("label"))
    assert(ids(head) == (1L to 200L).filterNot(_ % 10 == 3),
      "a rename has no column to un-map in a positional vector")
  }

  test("compaction folds its files' positions and TRIMS the carried vector") {
    val dir = freshDir()
    // many tiny files so compactSmallFiles has something to merge
    (1L to 6L).foreach(i => SnapshotTable.commitAppend(
      Seq(i * 10L, i * 10L + 1L).toDF("id").coalesce(1), dir,
      statsCols = Seq("id")))
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") % 10 === 1)
    assert(SnapshotTable.pendingDeleteVectors(spark, dir).map(_._2) == Seq(6L))
    val v = SnapshotTable.compactSmallFiles(spark, dir, 1L << 20, 1L << 20)
    assert(v > 7L, "compaction must have committed")
    // every small file was compacted, so the whole vector trims away
    assert(SnapshotTable.pendingDeleteVectors(spark, dir).isEmpty,
      "a vector whose files all folded must leave the manifest")
    assert(ids(SnapshotTable.read(spark, dir)) ==
      (1L to 6L).map(_ * 10L).sorted)
    assert(SnapshotTable.countRows(spark, dir) == 6L,
      "a trimmed vector must never double-subtract")
  }

  test("no-match predicate commits nothing") {
    val dir = freshDir()
    rangeTable(dir)
    assert(SnapshotTable.commitDeleteVectorsWhere(
      spark, dir, col("id") > 10000L) == 1L)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L))
  }

  test("countRows still refuses under a pending EQUALITY delete") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") === 7L)
    SnapshotTable.commitDeleteMoR(Seq(9L).toDF("id"), dir, Seq("id"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.countRows(spark, dir)
    }
    assert(e.getMessage.contains("merge-on-read"))
    // both kinds apply together at read time, and fold together
    assert(ids(SnapshotTable.read(spark, dir)) ==
      (1L to 200L).filterNot(i => i == 7L || i == 9L))
    SnapshotTable.applyDeletes(spark, dir)
    assert(SnapshotTable.countRows(spark, dir) == 198L)
  }

  test("CDC across a DV commit: mor-delete path, exactly the marked rows") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") % 10 === 3)
    assert(SnapshotTable.changesPath(spark, dir, 1L, 2L) == "mor-delete")
    val ch = SnapshotTable.changesBetween(spark, dir, 1L, 2L)
    assert(ch.select("_change").distinct().as[String].collect().toSeq ==
      Seq("delete"))
    assert(ids(ch) == (1L to 200L).filter(_ % 10 == 3))
  }

  test("SQL face: delete_mode='dv' turns DELETE into a vector commit") {
    val root = java.nio.file.Files.createTempDirectory("dv_sql").toString
    spark.conf.set("spark.sql.catalog.gdv",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdv.root", root)
    try {
      spark.sql("CREATE TABLE gdv.ns.ev (id BIGINT, tag STRING) " +
        "TBLPROPERTIES ('stats_cols' = 'id', 'delete_mode' = 'dv')")
      spark.sql("INSERT INTO gdv.ns.ev " +
        "SELECT id, concat('t', id % 10) FROM range(1, 201)")
      val dir = s"$root/ns/ev"
      val before = SnapshotTable.files(spark, dir,
        SnapshotTable.versions(spark, dir).last)
      // scattered predicate: NOT metadata-answerable, and under COW it
      // would rewrite files — under 'dv' it must rewrite none
      spark.sql("DELETE FROM gdv.ns.ev WHERE tag = 't3'")
      val headV = SnapshotTable.versions(spark, dir).last
      assert(SnapshotTable.files(spark, dir, headV) == before,
        "delete_mode='dv' must land the DELETE as a vector, not a rewrite")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).map(_._2) ==
        Seq(20L))
      assert(spark.sql("SELECT count(*) AS n FROM gdv.ns.ev")
        .as[Long].head() == 180L)
      assert(spark.sql(
        "SELECT count(*) AS n FROM gdv.ns.ev WHERE tag = 't3'")
        .as[Long].head() == 0L)
      // the procedure face folds it
      spark.sql("CALL gdv.system.fold_deletes('ns.ev')")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).isEmpty)
      assert(spark.sql("SELECT count(*) AS n FROM gdv.ns.ev")
        .as[Long].head() == 180L)
      // dv_delete procedure: predicate-string surface + exact count
      val r = spark.sql(
        "CALL gdv.system.dv_delete('ns.ev', 'id % 10 = 4')").collect()
      assert(r.head.getLong(1) == 20L, s"rows_deleted must be exact: ${r.toSeq}")
      assert(spark.sql("SELECT count(*) AS n FROM gdv.ns.ev")
        .as[Long].head() == 160L)
      // the GDPR-trickle shape: a SECOND DELETE while a vector is
      // pending must stack another vector, never eager-fold the
      // standing one (the rewrite the vectors exist to avoid)
      val filesBefore = SnapshotTable.files(spark, dir,
        SnapshotTable.versions(spark, dir).last)
      spark.sql("DELETE FROM gdv.ns.ev WHERE tag = 't5'")
      assert(SnapshotTable.files(spark, dir,
        SnapshotTable.versions(spark, dir).last) == filesBefore,
        "a stacked dv-mode DELETE must not rewrite (no eager fold)")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).map(_._2) ==
        Seq(20L, 20L))
      assert(spark.sql("SELECT count(*) AS n FROM gdv.ns.ev")
        .as[Long].head() == 140L)
      // an all-matching prunable DELETE still takes the strictly
      // cheaper metadata-only drop (no vector, no rewrite)
      spark.sql("DELETE FROM gdv.ns.ev WHERE id >= 1000")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).map(_._2) ==
        Seq(20L, 20L), "an all-or-none DELETE must not mint a vector")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gdv.ns.ev")
      spark.conf.unset("spark.sql.catalog.gdv")
      spark.conf.unset("spark.sql.catalog.gdv.root")
    }
  }

  test("countRowsWhere/sumWhere stay metadata-fast outside the vector's files") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(
      spark, dir, col("id") >= 180L && col("id") <= 190L)
    val touched = SnapshotTable.pendingDeleteVectors(spark, dir)
      .flatMap(_._3.map(_._1)).toSet
    assert(touched.nonEmpty)
    // full-range filtered COUNT: every file is range-contained, so
    // exactly the vector-touched files demote to the scan and the
    // untouched bulk answers from the manifest — exact either way
    val (n, cov, scan, tot) = SnapshotTable.countRowsWhere(
      spark, dir, SnapshotTable.StatFilter("id", Some(1L), Some(200L)))
    assert(n == 189L)
    assert(scan == touched.size && cov == tot - touched.size,
      s"only vector-touched files may scan: cov=$cov scan=$scan tot=$tot " +
        s"touched=${touched.size}")
    // filtered SUM rides the same demotion (deleted VALUES are
    // unknowable from metadata, so touched files must scan)
    val (s, _, _, _) = SnapshotTable.sumWhere(
      spark, dir, SnapshotTable.StatFilter("id", Some(1L), Some(200L)))
    val expect = (1L to 200L).sum - (180L to 190L).sum
    assert(s.compareTo(java.math.BigDecimal.valueOf(expect)) == 0)
  }

  test("groupCounts/groupSums demote only the vector's files") {
    val dir = freshDir()
    val df = (1L to 200L).toDF("id")
      .withColumn("tag", concat(lit("t"), col("id") % 4))
      .repartitionByRange(4, col("tag")).sortWithinPartitions("tag", "id")
    SnapshotTable.commitAppend(df, dir, statsCols = Seq("tag", "id"))
    SnapshotTable.commitDeleteVectorsWhere(
      spark, dir, col("tag") === "t1" && col("id") <= 100L)
    val touched = SnapshotTable.pendingDeleteVectors(spark, dir)
      .flatMap(_._3.map(_._1)).toSet
    assert(touched.nonEmpty)
    val (gdf, covN, scanN, totN) = SnapshotTable.groupCounts(spark, dir, "tag")
    val got = gdf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("t0" -> 50L, "t1" -> 25L, "t2" -> 50L, "t3" -> 50L),
      s"grouped counts must fold the vector, got $got")
    assert(scanN == touched.size && covN == totN - touched.size,
      s"only vector-touched files may scan: cov=$covN scan=$scanN " +
        s"tot=$totN touched=${touched.size}")
    val (sdf, _, scanS, _) = SnapshotTable.groupSums(spark, dir, "tag", "id")
    val gotS = sdf.collect()
      .map(r => r.getString(0) -> r.getDecimal(1).longValueExact()).toMap
    def sumTag(t: Long) = (1L to 200L)
      .filter(i => i % 4 == t && !(t == 1 && i <= 100)).sum
    assert(gotS == Map("t0" -> sumTag(0), "t1" -> sumTag(1),
      "t2" -> sumTag(2), "t3" -> sumTag(3)),
      s"grouped sums must fold the vector, got $gotS")
    assert(scanS == touched.size)
  }

  test("DV update: one commit, old files carried, count conserved, fold keeps the images") {
    val dir = freshDir()
    rangeTable(dir)
    val before = SnapshotTable.files(spark, dir, 1L).toSet
    val v2 = SnapshotTable.commitUpdateVectorsWhere(spark, dir,
      col("id") % 10 === 3, Map("tag" -> lit("patched")))
    assert(v2 == 2L)
    val after = SnapshotTable.files(spark, dir, 2L).toSet
    assert(before.subsetOf(after),
      "a DV update must carry every pre-existing file by reference")
    assert(SnapshotTable.pendingDeleteVectors(spark, dir).map(_._2) == Seq(20L))
    // +batch −vector: count conserved, still metadata-only
    assert(SnapshotTable.countRows(spark, dir) == 200L)
    val head = SnapshotTable.read(spark, dir)
    assert(head.filter(col("tag") === "patched").count() == 20L)
    assert(ids(head) == (1L to 200L), "an update never changes the id set")
    assert(ids(head.filter(col("tag") === "patched")) ==
      (1L to 200L).filter(_ % 10 == 3))
    // fold materializes: vector cleared, images survive
    SnapshotTable.applyDeletes(spark, dir)
    val folded = SnapshotTable.read(spark, dir)
    assert(ids(folded.filter(col("tag") === "patched")) ==
      (1L to 200L).filter(_ % 10 == 3))
    assert(SnapshotTable.countRows(spark, dir) == 200L)
  }

  test("DV update refuses unknown SET columns; zero matches commit nothing") {
    val dir = freshDir()
    rangeTable(dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitUpdateVectorsWhere(spark, dir,
        col("id") === 1L, Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("not a column"))
    assert(SnapshotTable.commitUpdateVectorsWhere(spark, dir,
      col("id") > 10000L, Map("tag" -> lit("x"))) == 1L)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L))
  }

  test("DV update over a pending DV delete marks only live rows") {
    val dir = freshDir()
    rangeTable(dir)
    SnapshotTable.commitDeleteVectorsWhere(spark, dir, col("id") <= 100L)
    // the update predicate overlaps the deleted half: only live
    // matches are marked and re-imaged
    SnapshotTable.commitUpdateVectorsWhere(spark, dir,
      col("id") % 10 === 3, Map("tag" -> lit("patched")))
    val dvs = SnapshotTable.pendingDeleteVectors(spark, dir)
    assert(dvs.map(_._2) == Seq(100L, 10L), s"got $dvs")
    assert(SnapshotTable.countRows(spark, dir) == 100L)
    val head = SnapshotTable.read(spark, dir)
    assert(ids(head.filter(col("tag") === "patched")) ==
      (101L to 200L).filter(_ % 10 == 3))
  }

  test("multi-column SETs evaluate against the OLD row (SQL UPDATE semantics)") {
    val dir = freshDir()
    SnapshotTable.commitAppend(
      (1L to 10L).toDF("id")
        .withColumn("a", col("id") * 2).withColumn("b", col("id") * 3),
      dir, statsCols = Seq("id"))
    // the classic swap: a sequential withColumn fold would yield
    // a = old_b AND b = old_b; SQL UPDATE (and this) swaps
    SnapshotTable.commitUpdateVectorsWhere(spark, dir, col("id") <= 5L,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = SnapshotTable.read(spark, dir)
      .select("id", "a", "b").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    (1L to 5L).foreach(i => assert(got(i) == (i * 3, i * 2),
      s"id $i must SWAP, got ${got(i)}"))
    (6L to 10L).foreach(i => assert(got(i) == (i * 2, i * 3)))
  }

  test("dv_update assignments parse through quoted commas and parens") {
    val root = java.nio.file.Files.createTempDirectory("dv_parse").toString
    spark.conf.set("spark.sql.catalog.gdvp",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdvp.root", root)
    try {
      SnapshotTable.commitAppend(
        (1L to 10L).toDF("id").withColumn("tag", lit("x")),
        s"$root/ns/t", statsCols = Seq("id"))
      // a comma INSIDE a string literal must not split the
      // assignment list; a function call's parens must group
      spark.sql("CALL gdvp.system.dv_update('ns.t', 'id <= 3', " +
        "\"tag = 'a,b', id = greatest(id, 100)\")")
      val got = spark.sql(
        "SELECT id, tag FROM gdvp.ns.t WHERE tag = 'a,b' ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq(100L -> "a,b", 100L -> "a,b", 100L -> "a,b"),
        s"got $got")
    } finally {
      spark.conf.unset("spark.sql.catalog.gdvp")
      spark.conf.unset("spark.sql.catalog.gdvp.root")
    }
  }

  test("reserved prefix refused as an equality key") {
    val dir = freshDir()
    rangeTable(dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitDeleteMoR(
        Seq(1L).toDF("__graft_dv_pos"), dir, Seq("__graft_dv_pos"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("SQL face: update_mode='dv' turns UPDATE into a vector + patch commit") {
    val root = java.nio.file.Files.createTempDirectory("dv_upd").toString
    spark.conf.set("spark.sql.catalog.gdvu",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdvu.root", root)
    try {
      spark.sql("CREATE TABLE gdvu.ns.ev (id BIGINT, tag STRING, " +
        "score BIGINT) TBLPROPERTIES " +
        "('stats_cols' = 'id', 'update_mode' = 'dv')")
      spark.sql("INSERT INTO gdvu.ns.ev " +
        "SELECT id, concat('t', id % 10), id * 2 FROM range(1, 201)")
      val dir = s"$root/ns/ev"
      val before = SnapshotTable.files(spark, dir,
        SnapshotTable.versions(spark, dir).last).toSet
      // scattered predicate, SETs referencing the OLD row — under COW
      // every touched file would rewrite; under 'dv' all prior files
      // survive and only the patched images append
      spark.sql("UPDATE gdvu.ns.ev SET score = score + 1000, " +
        "tag = concat(tag, '!') WHERE id % 10 = 3")
      val after = SnapshotTable.files(spark, dir,
        SnapshotTable.versions(spark, dir).last).toSet
      assert(before.subsetOf(after) && (after -- before).nonEmpty,
        "update_mode='dv' must keep every prior file and append images")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).map(_._2) ==
        Seq(20L))
      assert(spark.sql("SELECT count(*) AS n FROM gdvu.ns.ev")
        .as[Long].head() == 200L, "an UPDATE conserves cardinality")
      val patched = spark.sql("SELECT id, tag, score FROM gdvu.ns.ev " +
        "WHERE id % 10 = 3 ORDER BY id").as[(Long, String, Long)]
        .collect().toSeq
      assert(patched.size == 20 && patched.forall { case (id, tag, sc) =>
        tag == "t3!" && sc == id * 2 + 1000 },
        s"SETs must evaluate against the OLD row: $patched")
      assert(spark.sql("SELECT count(*) AS n FROM gdvu.ns.ev " +
        "WHERE id % 10 <> 3 AND (tag LIKE '%!' OR score >= 1000)")
        .as[Long].head() == 0L, "unmatched rows must stay untouched")
      // SET names resolve case-insensitively (the COW path's posture)
      spark.sql("UPDATE gdvu.ns.ev SET SCORE = 0 WHERE id = 1")
      assert(spark.sql("SELECT score FROM gdvu.ns.ev WHERE id = 1")
        .as[Long].head() == 0L)
      // declared expectations gate this face like every other write
      spark.sql("ALTER TABLE gdvu.ns.ev " +
        "SET TBLPROPERTIES ('expect.nonneg' = 'score >= 0')")
      val viol = intercept[Exception] {
        spark.sql("UPDATE gdvu.ns.ev SET score = -5 WHERE id = 2")
      }
      assert(viol.getMessage.contains("nonneg"), viol.getMessage)
      spark.sql("ALTER TABLE gdvu.ns.ev UNSET TBLPROPERTIES ('expect.nonneg')")
      // a QUALIFIED reference falls through to COW (re-resolution
      // against the bare frame has no qualifier): no new vector lands
      val vecsBefore = SnapshotTable.pendingDeleteVectors(spark, dir).size
      spark.sql("UPDATE gdvu.ns.ev SET score = 77 WHERE ev.id = 2")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).size < vecsBefore,
        "the qualified-WHERE UPDATE must take COW (which folds), not a vector")
      assert(spark.sql("SELECT score FROM gdvu.ns.ev WHERE id = 2")
        .as[Long].head() == 77L)
      // a subquery condition falls through to the standard COW
      // rewrite (vectors folded first — COW DML refuses over pending
      // merge-on-read state)
      spark.sql("CALL gdvu.system.fold_deletes('ns.ev')")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).isEmpty)
      spark.sql("UPDATE gdvu.ns.ev SET score = -1 WHERE id IN " +
        "(SELECT id FROM gdvu.ns.ev WHERE tag = 't7')")
      assert(SnapshotTable.pendingDeleteVectors(spark, dir).isEmpty,
        "the subquery UPDATE must take the COW route, not a vector")
      assert(spark.sql("SELECT count(*) AS n FROM gdvu.ns.ev " +
        "WHERE score = -1").as[Long].head() == 20L)
      // declared-value validation at DDL time
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE gdvu.ns.bad (id BIGINT) " +
          "TBLPROPERTIES ('update_mode' = 'bogus')")
      }
      assert(e.getMessage.contains("update_mode"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gdvu")
      spark.conf.unset("spark.sql.catalog.gdvu.root")
    }
  }

  test("SQL face: merge_mode='mor' turns the star-upsert MERGE into one MoR commit") {
    val root = java.nio.file.Files.createTempDirectory("mor_mrg").toString
    spark.conf.set("spark.sql.catalog.gmor",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmor.root", root)
    try {
      spark.sql("CREATE TABLE gmor.ns.ev (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('stats_cols' = 'id', 'merge_mode' = 'mor')")
      spark.sql("INSERT INTO gmor.ns.ev " +
        "SELECT id, concat('t', id % 10) FROM range(1, 201)")
      val dir = s"$root/ns/ev"
      val headBefore = SnapshotTable.versions(spark, dir).last
      val before = SnapshotTable.files(spark, dir, headBefore).toSet
      // the canonical upsert: 20 restatements + 10 fresh rows — on a
      // hash-scattered key set COW would rewrite every touched file;
      // MoR touches none and commits ONE version
      spark.sql("MERGE INTO gmor.ns.ev t USING (" +
        "SELECT id, 'restated' AS v FROM range(1, 21) " +
        "UNION ALL SELECT id + 1000, 'fresh' FROM range(1, 11)) s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      val headV = SnapshotTable.versions(spark, dir).last
      assert(headV == headBefore + 1L, "the MERGE must be ONE commit")
      assert(before.subsetOf(SnapshotTable.files(spark, dir, headV).toSet),
        "merge_mode='mor' must touch ZERO pre-existing files")
      assert(SnapshotTable.pendingDeletes(spark, dir) ==
        Seq((Seq("id"), headV, 30L)),
        "the commit carries an equality delete of exactly its keys")
      assert(spark.sql("SELECT count(*) AS n FROM gmor.ns.ev")
        .as[Long].head() == 210L)
      assert(spark.sql(
        "SELECT count(*) AS n FROM gmor.ns.ev WHERE v = 'restated'")
        .as[Long].head() == 20L)
      assert(spark.sql(
        "SELECT count(*) AS n FROM gmor.ns.ev WHERE v = 'fresh'")
        .as[Long].head() == 10L)
      assert(spark.sql("SELECT v FROM gmor.ns.ev WHERE id = 5")
        .as[String].head() == "restated")
      assert(spark.sql("SELECT v FROM gmor.ns.ev WHERE id = 25")
        .as[String].head() == "t5", "unmatched rows stay untouched")
      // a COLUMN-WISE action falls through to the COW rewrite, which
      // auto-folds the pending MoR delete first
      spark.sql("MERGE INTO gmor.ns.ev t USING (" +
        "SELECT id FROM range(1, 6)) s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = 'cow'")
      assert(SnapshotTable.pendingDeletes(spark, dir).isEmpty,
        "the COW MERGE must have folded the pending delete")
      assert(spark.sql(
        "SELECT count(*) AS n FROM gmor.ns.ev WHERE v = 'cow'")
        .as[Long].head() == 5L)
      assert(spark.sql("SELECT count(*) AS n FROM gmor.ns.ev")
        .as[Long].head() == 210L)
      // an INT-typed source column CASTS to the BIGINT target type —
      // the image and key files must not land INT32 parquet that
      // poisons the merged read schema
      spark.sql("MERGE INTO gmor.ns.ev t USING (" +
        "SELECT CAST(7777 AS INT) AS id, 'intcast' AS v) s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      assert(spark.sql("SELECT count(*) AS n FROM gmor.ns.ev")
        .as[Long].head() == 211L, "the INT-cast source row must insert")
      assert(spark.sql("SELECT v FROM gmor.ns.ev WHERE id = 7777")
        .as[String].head() == "intcast")
      // a duplicate-key source refuses loudly (SQL MERGE would error
      // on the matched side and silently double-insert on the other)
      val dup = intercept[Exception] {
        spark.sql("MERGE INTO gmor.ns.ev t USING (" +
          "SELECT CAST(1 AS BIGINT) AS id, 'x' AS v " +
          "UNION ALL SELECT CAST(1 AS BIGINT), 'y') s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(dup.getMessage.contains("ONE image per key"), dup.getMessage)
      // a source with the wrong column set refuses with the COW pointer
      val bad = intercept[Exception] {
        spark.sql("MERGE INTO gmor.ns.ev t USING (" +
          "SELECT CAST(9999 AS BIGINT) AS id) s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(bad.getMessage.contains("exactly the target's columns"),
        bad.getMessage)
      // declared-value validation at DDL time
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE gmor.ns.bad (id BIGINT) " +
          "TBLPROPERTIES ('merge_mode' = 'bogus')")
      }
      assert(e.getMessage.contains("merge_mode"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gmor")
      spark.conf.unset("spark.sql.catalog.gmor.root")
    }
  }
}
