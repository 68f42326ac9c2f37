package graft

import java.time.{LocalDate, ZoneOffset}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.sources.Ingest.DateWindow
import graft.sources.dsv2.WindowedRestSource
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** F5 full credit: the windowed REST scan as a DSv2 table — evalState
  * equality consumed server-side (never a Spark post-filter),
  * startTime bounds pruning whole fetch windows, and column pruning
  * narrowing the parsed schema. The fixture fetcher RECORDS its calls,
  * so the specs assert what was actually fetched, not just plan text.
  */
object Dsv2SourceSpec {
  val calls = new ConcurrentLinkedQueue[(DateWindow, Map[String, String])]()

  class EvalFetcher extends WindowedRestSource.ParamWindowFetcher {
    def fetch(w: DateWindow, params: Map[String, String]): Iterator[String] = {
      calls.add((w, params))
      val ms = LocalDate.parse(w.start).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
      val id = w.start.replace("-", "").toLong
      Iterator(
        s"""[{"id": $id, "qualityRef": "https://calabriocloud.example/recordings/123",
           |  "evalForm": {"evalFormId": 7}, "agent": {"id": 5}, "evaluator": {"id": 6},
           |  "isScoreCounted": true, "evaluated": $ms, "state": {"text": "SCORED"},
           |  "responseState": {"text": "DONE"}, "additiveScore": 10, "totalScore": 95.5,
           |  "comments": "c",
           |  "sections": [{"id": 1, "questions": [{"id": 2, "selectedOption": 3},
           |                                       {"id": 4, "selectedOption": null}]}]}]""".stripMargin)
    }
  }

  /** RecordingFetcher plus the vendor count endpoint: COUNT(*) rows
    * are answerable without shipping bodies. Records count calls under
    * a `_mode -> count` marker, like the SparkEntry fixture.
    */
  class CountingFetcher extends RecordingFetcher {
    override def count(w: DateWindow, params: Map[String, String]): Option[Long] = {
      calls.add((w, params + ("_mode" -> "count")))
      Some(2L)
    }
  }

  class RecordingFetcher extends WindowedRestSource.ParamWindowFetcher {
    def fetch(w: DateWindow, params: Map[String, String]): Iterator[String] = {
      calls.add((w, params))
      // two contacts per window, startTime = window start 00:00Z (+1h)
      val ms = LocalDate.parse(w.start).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
      val id = w.start.replace("-", "").toLong
      Iterator(
        s"""[{"id": $id, "startTime": $ms, "assocCallId": "C-${w.start}",
           |  "agent": {"$$ref": "https://calabriocloud.example/person/1", "displayId": "a1"}},
           | {"id": ${id + 1}, "startTime": ${ms + 3600000}, "assocCallId": null,
           |  "agent": {"$$ref": "https://calabriocloud.example/person/2", "displayId": "a2"}}]""".stripMargin)
    }
  }
}

class Dsv2SourceSpec extends SparkSpec {
  WindowedRestSource.registerFetcher("spec-fixture", new Dsv2SourceSpec.RecordingFetcher)

  private def read() = spark.read.format("graft-window")
    .option("begin", "2024-01-01")
    .option("end", "2024-01-17")
    .option("breakDays", "2")
    .option("limit", "50000")
    .option("fetcher", "spec-fixture")
    .load()

  test("unfiltered scan fetches every planned window") {
    Dsv2SourceSpec.calls.clear()
    val rows = read().select("id", "assocCallId").collect()
    assert(rows.length === 16) // 8 windows x 2 docs
    assert(Dsv2SourceSpec.calls.size === 8)
    // limit always travels as a request param (qa_api_handler.py:103)
    assert(Dsv2SourceSpec.calls.iterator().next()._2("limit") === "50000")
  }

  test("evalState is consumed by the source; startTime bounds prune windows") {
    Dsv2SourceSpec.calls.clear()
    val cutoffMs = LocalDate.parse("2024-01-09")
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    val df = read()
      .filter(col("evalState") === "scored" && col("startTime") >= cutoffMs)
      .select("id", "startTime")
    val rows = df.collect()

    // only the 4 windows at/after the cutoff were fetched, each with
    // the server-side evalState param (F5: source-side pushed filter)
    val fetched = recordedCalls()
    assert(fetched.map(_._1.start).sorted ===
      Seq("2024-01-09", "2024-01-11", "2024-01-13", "2024-01-15"))
    assert(fetched.forall(_._2("evalState") === "scored"))
    assert(rows.length === 8)
    assert(rows.forall(_.getLong(1) >= cutoffMs))

    // evalState never appears in a Spark post-filter; startTime stays
    // residual (windows are date-grained, the predicate is ms-grained)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
      l.contains(" Filter (") && l.contains("evalState")),
      s"evalState must not be re-filtered post-scan:\n$plan")

    // column pruning reached the scan: only id + startTime are parsed
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get.scan
    assert(scan.readSchema() === new StructType()
      .add("id", LongType).add("startTime", LongType))
  }

  test("conflicting evalState equalities yield empty, not the fetched state's rows") {
    Dsv2SourceSpec.calls.clear()
    // Catalyst itself normally folds the contradiction to an empty
    // relation (ConstantPropagation / constraint propagation — also
    // correct, source never consulted); disable both so BOTH
    // equalities reach pushFilters and the source's
    // only-consume-the-fetched-state rule is what saves us
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val exKey = "spark.sql.optimizer.excludedRules"
    val prevCp = spark.conf.getOption(cpKey)
    val prevEx = spark.conf.getOption(exKey)
    spark.conf.set(cpKey, "false")
    spark.conf.set(exKey,
      "org.apache.spark.sql.catalyst.optimizer.ConstantPropagation")
    def restore(): Unit = {
      prevCp.fold(spark.conf.unset(cpKey))(spark.conf.set(cpKey, _))
      prevEx.fold(spark.conf.unset(exKey))(spark.conf.set(exKey, _))
    }
    try {
      val df = read()
        .filter(col("evalState") === "scored" && col("evalState") === "draft")
        .select("id", "evalState")
      assert(df.collect().isEmpty)
      // the source fetched under exactly one state; the conflicting
      // equality stayed residual and filtered the tagged rows to empty
      val fetched = recordedCalls()
      assert(fetched.nonEmpty)
      assert(fetched.forall(f => Set("scored", "draft").contains(f._2("evalState"))))
    } finally restore()
  }

  test("LIMIT pushes into the request param; Spark still applies the global cap") {
    Dsv2SourceSpec.calls.clear()
    val rows = read().limit(3).collect()
    assert(rows.length === 3)
    // the per-window request cap tightened from 50000 to 3; the spec
    // fetcher IGNORES it (returns 2 docs anyway), proving the limit is
    // partial — Spark's global cap still applies on top
    val fetched = recordedCalls()
    assert(fetched.nonEmpty)
    assert(fetched.forall(_._2("limit") === "3"))
  }

  test("COUNT(*) pushes to the source's count endpoint — no body fetches") {
    Dsv2SourceSpec.calls.clear()
    WindowedRestSource.registerFetcher("spec-counting", new Dsv2SourceSpec.CountingFetcher)
    val df = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-17")
      .option("breakDays", "2")
      .option("fetcher", "spec-counting")
      .load()
      .agg(count(lit(1)).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(16L))
    // every recorded call is a count request; a single body fetch
    // (no _mode marker) would fail this
    val fetched = recordedCalls()
    assert(fetched.size === 8)
    assert(fetched.forall(_._2.get("_mode").contains("count")))
    // and the plan carries the counting scan's marker (cluster-valid)
    assert(df.queryExecution.executedPlan.toString.contains("agg=count"))
  }

  test("COUNT(*) over a fetcher without a count endpoint falls back to fetch-and-count") {
    Dsv2SourceSpec.calls.clear()
    // spec-fixture's RecordingFetcher leaves count = None: the count
    // reader fetches documents and counts array elements without
    // converting any field
    val df = read().agg(count(lit(1)).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(16L))
    val fetched = recordedCalls()
    assert(fetched.size === 8)
    assert(fetched.forall(f => !f._2.contains("_mode")))
  }

  test("MIN/MAX(startTime) push to the sort-order endpoint; no endpoint falls back, same answer") {
    // with the facility (SparkEntry's fixture fetcher): extremes come
    // from sort-ordered limit-1 requests, zero body fetches
    graft.sources.dsv2.FixtureWindowFetcher.register()
    graft.sources.dsv2.FixtureWindowFetcher.calls.clear()
    def extremes(fetcher: String) = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-05")
      .option("breakDays", "2")
      .option("fetcher", fetcher)
      .load()
      .agg(min(col("startTime")).as("mn"), max(col("startTime")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val jan1 = LocalDate.parse("2024-01-01")
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    val jan3 = LocalDate.parse("2024-01-03")
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    val expect = Seq((jan1, jan3 + 3600000L))
    assert(extremes(graft.sources.dsv2.FixtureWindowFetcher.Name) === expect)
    val served = {
      val it = graft.sources.dsv2.FixtureWindowFetcher.calls.iterator()
      val b = Seq.newBuilder[(DateWindow, Map[String, String])]
      while (it.hasNext) b += it.next()
      b.result().filterNot(_._2.contains("_planning"))
    }
    assert(served.nonEmpty && served.forall(_._2.get("_mode").contains("extreme")),
      s"extreme-capable fetcher must never ship bodies: $served")
    // without the facility (spec RecordingFetcher): one fallback body
    // fetch per window serves both extremes — identical answer
    Dsv2SourceSpec.calls.clear()
    assert(extremes("spec-fixture") === expect)
    val fell = recordedCalls()
    assert(fell.size === 2 && fell.forall(f => !f._2.contains("_mode")),
      s"facility-less fetcher must fall back to one body fetch per window: $fell")
  }

  test("MIN over a non-sortable column is refused and computed from fetched rows") {
    Dsv2SourceSpec.calls.clear()
    val df = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-05")
      .option("breakDays", "2")
      .option("fetcher", "spec-fixture")
      .load()
      .agg(min(col("id")).as("mn"))
    assert(df.collect().head.getLong(0) === 20240101L)
    assert(recordedCalls().forall(f => !f._2.contains("_mode")))
  }

  test("COUNT(*) with a residual filter takes the row-fetch path (stays correct)") {
    Dsv2SourceSpec.calls.clear()
    WindowedRestSource.registerFetcher("spec-counting", new Dsv2SourceSpec.CountingFetcher)
    val cutoffMs = LocalDate.parse("2024-01-09")
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    // the startTime bound stays residual by design, so Spark must NOT
    // attempt aggregate pushdown — rows are fetched and counted
    // post-filter (4 surviving windows x 2 docs)
    val df = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-17")
      .option("breakDays", "2")
      .option("fetcher", "spec-counting")
      .load()
      .filter(col("startTime") >= cutoffMs)
      .agg(count(lit(1)).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(8L))
    val fetched = recordedCalls()
    assert(fetched.nonEmpty)
    assert(fetched.forall(f => !f._2.contains("_mode")),
      s"residual-filter count must fetch rows, not push the aggregate: $fetched")
  }

  test("grouped or non-star aggregates are refused and computed from fetched rows") {
    Dsv2SourceSpec.calls.clear()
    WindowedRestSource.registerFetcher("spec-counting", new Dsv2SourceSpec.CountingFetcher)
    val df = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-05")
      .option("breakDays", "2")
      .option("fetcher", "spec-counting")
      .load()
      .groupBy(col("assocCallId").isNotNull.as("has_call"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    assert(df.collect().length === 2)
    val fetched = recordedCalls()
    assert(fetched.nonEmpty)
    assert(fetched.forall(f => !f._2.contains("_mode")))
  }

  test("GROUP BY evalState pushes with COUNT(*): per-state counts, zero body fetches") {
    Dsv2SourceSpec.calls.clear()
    WindowedRestSource.registerFetcher("spec-counting", new Dsv2SourceSpec.CountingFetcher)
    def counting = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-05")
      .option("breakDays", "2")
      .option("fetcher", "spec-counting")
      .load()
    // filtered: the group value is the pushed request param
    val scored = counting
      .filter(col("evalState") === "scored")
      .groupBy(col("evalState")).agg(count(lit(1)).as("n"))
      .collect()
    assert(scored.toSeq.map(r => (r.getString(0), r.getLong(1))) ===
      Seq(("scored", 4L))) // 2 windows × count-endpoint 2
    assert(recordedCalls().filterNot(_._2.contains("_planning"))
      .forall(_._2.get("_mode").contains("count")),
      "a grouped pushed count must never fetch a body")
    // unfiltered: every fetched row is tagged null, so the single
    // group IS the null group — still answered by the count endpoint
    Dsv2SourceSpec.calls.clear()
    val nullGroup = counting
      .groupBy(col("evalState")).agg(count(lit(1)).as("n"))
      .collect()
    assert(nullGroup.length === 1 && nullGroup(0).isNullAt(0) &&
      nullGroup(0).getLong(1) === 4L)
    assert(recordedCalls().filterNot(_._2.contains("_planning"))
      .forall(_._2.get("_mode").contains("count")))
  }

  test("count-endpoint statistics let Catalyst broadcast the windowed source") {
    // big side deliberately ABOVE autoBroadcastJoinThreshold (10 MB):
    // 2M range rows ≈ 16 MB, so the only broadcastable side is the
    // source — and only if it reports its true (tiny) size
    val big = spark.range(2000000).select(col("id").as("big_id"))
    def planFor(fetcherName: String): String = {
      val src = spark.read.format("graft-window")
        .option("begin", "2024-01-01")
        .option("end", "2024-01-17")
        .option("breakDays", "2")
        .option("fetcher", fetcherName)
        .load()
        .select("id")
      // static plan, not executed: AQE would eventually fix the
      // no-stats case at runtime from materialized sizes — the point
      // here is the PLANNING decision the reported stats enable
      src.join(big, col("id") === col("big_id"))
        .queryExecution.executedPlan.toString
    }
    WindowedRestSource.registerFetcher("spec-counting", new Dsv2SourceSpec.CountingFetcher)
    val withStats = planFor("spec-counting")
    assert(withStats.contains("BroadcastHashJoin"),
      s"16 reported rows must win a static broadcast:\n$withStats")
    // negative control: no count endpoint → no stats → the source is
    // presumed huge and the static plan cannot broadcast either side
    val withoutStats = planFor("spec-fixture")
    assert(!withoutStats.contains("BroadcastHashJoin"),
      s"a stats-less source must not be presumed broadcastable:\n$withoutStats")
  }

  test("nested schema pruning resolves fields by name, not position") {
    // selecting ONLY agent.displayId hands the reader an agent struct
    // with one field; the schema-driven converter must emit exactly
    // that field — the old fixed 2-element row read back the $ref URL
    val df = read().select(col("agent.displayId").as("d"))
    val got = df.collect().map(_.getString(0)).toSet
    assert(got === Set("a1", "a2"))
    // and the scan really was nested-pruned (the regression is live)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get.scan
    val agentField = scan.readSchema()("agent").dataType.asInstanceOf[StructType]
    assert(agentField.fieldNames.toSeq === Seq("displayId"))
  }

  test("other payload schemas ride the same source (schema-driven parse)") {
    WindowedRestSource.registerFetcher("spec-evals", new Dsv2SourceSpec.EvalFetcher)
    val df = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-03")
      .option("breakDays", "2")
      .option("payload", "evaluations")
      .option("fetcher", "spec-evals")
      .load()
    val row = df
      .select(col("id"), col("state.text").as("state"), col("isScoreCounted"),
        col("totalScore"), col("evalForm.evalFormId").as("form_id"))
      .collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === 20240101L)
    assert(row(0).getString(1) === "SCORED")
    assert(row(0).getBoolean(2) === true)
    assert(row(0).getDouble(3) === 95.5)
    assert(row(0).getLong(4) === 7L)
    // nested arrays of structs convert too (sections → questions)
    val q = df.select(explode(col("sections")).as("sec"))
      .select(explode(col("sec.questions")).as("q"))
      .select(col("q.id"), col("q.selectedOption"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(q.toSet === Set((2L, 3L), (4L, null)))
  }

  test("pushdown works on the second payload too, not just contacts") {
    Dsv2SourceSpec.calls.clear()
    WindowedRestSource.registerFetcher("spec-evals", new Dsv2SourceSpec.EvalFetcher)
    val df = spark.read.format("graft-window")
      .option("begin", "2024-01-01")
      .option("end", "2024-01-05")
      .option("breakDays", "2")
      .option("payload", "evaluations")
      .option("fetcher", "spec-evals")
      .load()
      .filter(col("evalState") === "scored")
      .select(col("id"), col("totalScore"))
    assert(df.collect().length === 2)
    // the server-side evalState param traveled on every evaluations
    // fetch, and column pruning narrowed the parsed schema to exactly
    // the selected columns — same contract as the contacts payload
    val fetched = recordedCalls()
    assert(fetched.size === 2)
    assert(fetched.forall(_._2("evalState") === "scored"))
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get.scan
    assert(scan.readSchema().fieldNames.toSeq === Seq("id", "totalScore"))
  }

  /** Recorded calls minus planning-time stats requests (the
    * SupportsReportStatistics path tags itself `_planning`) — specs
    * assert the EXECUTION path unless they opt in to planning calls.
    */
  private def recordedCalls(): Seq[(graft.sources.Ingest.DateWindow, Map[String, String])] =
    Dsv2SourceSpec.calls.iterator().asScala.toSeq
      .filterNot(_._2.contains("_planning"))

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  test("graft-snapshot source: manifest-pruned read, time travel, MoR deletes applied") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import graft.sources.dsv2.GraftSnapshotSource
    val dir = java.nio.file.Files.createTempDirectory("snap_src").toString + "/tbl"
    // four range-disjoint files with id stats, then a MoR delete
    Seq(0L until 25L, 25L until 50L, 50L until 75L, 75L until 100L).foreach { r =>
      SnapshotTable.commitAppend(
        r.map(i => (i, s"g${i % 3}")).toDF("id", "grp").coalesce(1),
        dir, statsCols = Seq("id"))
    }
    SnapshotTable.commitDeleteMoR(Seq(7L, 80L).toDF("id"), dir, Seq("id"))
    // head read parity with the API read (deletes applied)
    val sql = spark.read.format("graft-snapshot").load(dir)
    assert(sql.count() == 98L)
    assert(sql.filter(col("id").isin(7L, 80L)).isEmpty,
      "merge-on-read deletes must apply through the source")
    // the range conjunct prunes whole files through the manifest
    val pruned = spark.read.format("graft-snapshot").load(dir)
      .filter(col("id") < 20L)
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      ((0L until 20L).filterNot(_ == 7L)))
    val (kept, total) = GraftSnapshotSource.lastPrune.get(dir)
    assert(total == 4 && kept == 1,
      s"the id<20 read must open 1 of 4 files from the manifest: $kept/$total")
    // PushedFilters surface in the executed plan
    assert(pruned.queryExecution.executedPlan.toString.contains("LessThan"),
      "the pruning conjunct must surface in the plan")
    // time travel: version 1 predates everything but the first file
    val v1 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "1").load(dir)
    assert(v1.count() == 25L)
    // tag resolution rides the same option surface
    SnapshotTable.createTag(spark, dir, "first", 1L)
    assert(spark.read.format("graft-snapshot")
      .option("tag", "first").load(dir).count() == 25L)
    // column pruning: a grp-only projection still answers
    assert(spark.read.format("graft-snapshot").load(dir)
      .groupBy("grp").count().collect().map(_.getLong(1)).sum == 98L)
  }

  test("graft-snapshot write path: append/overwrite land as versioned commits, first write creates") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val dir = java.nio.file.Files.createTempDirectory("snap_w").toString + "/tbl"
    // the FIRST write creates the table (supportsExternalMetadata:
    // the df's schema rides in, nothing to infer from an empty dir)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft-snapshot").option("statsCols", "id")
      .mode("append").save(dir)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graft-snapshot").mode("append").save(dir)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L))
    assert(SnapshotTable.read(spark, dir).count() == 3L)
    // the statsCols declaration is live: the manifest prunes on id
    val (kept, total) = SnapshotTable.pruneFiles(spark, dir,
      Seq(SnapshotTable.StatFilter("id", upper = Some(1L))))
    assert(kept.size < total, s"declared stats must prune: $kept of $total")
    // unconditional overwrite truncates as a NEW version; history stays
    Seq((9L, "z")).toDF("id", "v")
      .write.format("graft-snapshot").mode("overwrite").save(dir)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L, 3L))
    assert(SnapshotTable.read(spark, dir).select("id").as[Long].collect().toSeq
      == Seq(9L))
    assert(SnapshotTable.read(spark, dir, Some(2L)).count() == 3L,
      "pre-overwrite versions stay readable")
  }

  test("graft-snapshot catalog: SQL DDL/DML lifecycle — create, insert, time travel, rename, drop") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_cat").toString
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", root)
    new java.io.File(s"$root/ns1").mkdirs()
    spark.sql("CREATE TABLE gcat.ns1.t (id BIGINT, v STRING)")
    assert(SnapshotTable.versions(spark, s"$root/ns1/t") == Seq(1L),
      "CREATE TABLE must commit an empty v1")
    assert(spark.sql("SELECT * FROM gcat.ns1.t").count() == 0L)
    spark.sql("INSERT INTO gcat.ns1.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT sum(id) FROM gcat.ns1.t").head().getLong(0) == 6L)
    // INSERT appended a version; SQL time travel sees the empty v1
    assert(SnapshotTable.versions(spark, s"$root/ns1/t") == Seq(1L, 2L))
    assert(spark.sql("SELECT * FROM gcat.ns1.t VERSION AS OF 1").count() == 0L)
    // INSERT OVERWRITE = truncate-as-new-version, history intact
    spark.sql("INSERT OVERWRITE gcat.ns1.t VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM gcat.ns1.t").head().getLong(0) == 9L)
    assert(spark.sql("SELECT count(*) FROM gcat.ns1.t VERSION AS OF 2")
      .head().getLong(0) == 3L)
    // WHERE conjuncts still prune through the manifest on catalog reads
    assert(spark.sql("SELECT * FROM gcat.ns1.t WHERE id < 5").count() == 0L)
    // lifecycle: SHOW TABLES works through SupportsNamespaces, pure SQL
    assert(spark.sql("SHOW TABLES IN gcat.ns1").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    // SQL namespace DDL: create, list, drop-refuses-nonempty
    spark.sql("CREATE NAMESPACE gcat.ns2")
    assert(spark.sql("SHOW TABLES IN gcat.ns2").collect().isEmpty)
    intercept[Exception] { spark.sql("DROP NAMESPACE gcat.ns1") }
    spark.sql("DROP NAMESPACE gcat.ns2")
    // SQL TIMESTAMP AS OF resolves through versionAt (micros in, the
    // head commit instant is >= every earlier one)
    val headMs = SnapshotTable.readManifest(spark, s"$root/ns1/t",
      SnapshotTable.versions(spark, s"$root/ns1/t").last).committedAtMs
    assert(spark.sql(
      s"SELECT count(*) FROM gcat.ns1.t TIMESTAMP AS OF ${headMs * 1000L}")
      .head().getLong(0) == 1L)
    // STREAMING read of a catalog table: readStream.table drains the
    // same version-offset source; v3 was an INSERT OVERWRITE (a full
    // replacement), so the stream seeds from it via startingVersion
    val sout = java.nio.file.Files.createTempDirectory("snap_cat_stream").toString
    val sq = spark.readStream.option("startingVersion", "3")
      .table("gcat.ns1.t")
      .writeStream.format("parquet")
      .option("path", s"$sout/out").option("checkpointLocation", s"$sout/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    sq.awaitTermination()
    assert(spark.read.parquet(s"$sout/out").count() ==
      spark.sql("SELECT count(*) FROM gcat.ns1.t").head().getLong(0),
      "the streamed catalog table must drain to the batch census")
    // the rename TARGET resolves inside the table's own catalog
    spark.sql("ALTER TABLE gcat.ns1.t RENAME TO ns1.t2")
    assert(SnapshotTable.versions(spark, s"$root/ns1/t2").nonEmpty)
    spark.sql("DROP TABLE gcat.ns1.t2")
    // DROP is GC-deferred: the identifier is gone immediately, the
    // data tree survives until gcDroppedTables' vacuum horizon
    assert(!spark.catalog.tableExists("gcat.ns1.t2"))
    assert(new java.io.File(s"$root/ns1/t2").exists(),
      "the dropped table's tree stays for in-flight pinned readers")
    intercept[Exception] { spark.sql("SELECT * FROM gcat.ns1.t2").collect() }
    assert(SnapshotTable.gcDroppedTables(spark, root, graceMs = 0L) == 1)
    assert(!new java.io.File(s"$root/ns1/t2").exists())
  }

  test("graft-snapshot STREAMING source: version offsets, exactly-once resume, append-only admission") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_stream").toString
    val tbl = s"$base/tbl"
    SnapshotTable.commitAppend(
      (0L until 10L).map(i => (i, s"g${i % 2}")).toDF("id", "v"), tbl)
    SnapshotTable.commitAppend(
      (10L until 20L).map(i => (i, s"g${i % 2}")).toDF("id", "v"), tbl)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(tbl)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(s"$base/out").count() == 20L)
    // resume after a THIRD append: only the delta lands, no re-reads
    SnapshotTable.commitAppend(
      (20L until 25L).map(i => (i, s"g${i % 2}")).toDF("id", "v"), tbl)
    drain()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 25L, "resume must read exactly the delta")
    assert(out.select("id").as[Long].collect().sorted.toSeq == (0L until 25L),
      "every row exactly once across the restart")
    // a rewriting commit POISONS the stream: admission fails loudly
    SnapshotTable.commitMerge(
      Seq((3L, "rewritten")).toDF("id", "v"), tbl, Seq("id"))
    SnapshotTable.commitAppend(
      Seq((99L, "new")).toDF("id", "v"), tbl)
    val boom = intercept[Exception] { drain() }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(boom).contains("not an append"), msgs(boom))
    // ARRAY columns stream (the embedding ingest shape) — values
    // decode through the 3-level list walk, order preserved
    val tbl2 = s"$base/tbl2"
    SnapshotTable.commitAppend(
      Seq((1L, Array(1.0f, -2.5f)), (2L, Array(3.0f))).toDF("id", "emb"), tbl2)
    val q2 = spark.readStream.format("graft-snapshot").load(tbl2)
      .writeStream.format("parquet")
      .option("path", s"$base/out2")
      .option("checkpointLocation", s"$base/ck2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$base/out2").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toSet ==
      Set((1L, List(1.0f, -2.5f)), (2L, List(3.0f))))
    // genuinely unsupported types still refuse at PLAN time
    val tbl3 = s"$base/tbl3"
    SnapshotTable.commitAppend(
      Seq((1L, ("a", 2L))).toDF("id", "nested"), tbl3)
    val boom2 = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot").load(tbl3)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ck3")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(msgs(boom2).contains("flat"), msgs(boom2))
  }

  test("manifest byte statistics auto-broadcast a small snapshot side; legacy manifests never guess small") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("snap_stats").toString
    val dim = s"$base/dim"
    SnapshotTable.commitAppend(
      Seq((0L, "g0"), (1L, "g1")).toDF("k", "label"), dim)
    // facts big enough that Catalyst prices them ABOVE the broadcast
    // threshold — only the priced dim side can be the broadcast build
    val facts = spark.range(0, 2000000L)
      .select((col("id") % 2).as("k"), col("id").as("v"))
    val joined = facts.join(
      spark.read.format("graft-snapshot").load(dim), "k")
    // STATIC planner decision (pre-execution): the manifest prices the
    // dim side in bytes, so the join broadcasts without AQE's help
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"manifest byte statistics must broadcast the small side:\n$plan")
    assert(joined.count() == 2000000L)
    // a LEGACY manifest (entries without bytes) reports the
    // no-broadcast default — never guess a side small
    val legacy = s"$base/legacy"
    Seq((0L, "g0"), (1L, "g1")).toDF("k", "label")
      .repartition(1).write.parquet(s"$legacy/batch-1")
    val part = new java.io.File(s"$legacy/batch-1").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    new java.io.File(s"$legacy/_manifests").mkdirs()
    val mjson =
      s"""{"version":1,"committedAtMs":1,"statsCols":[],
         |"entries":[{"path":"batch-1/$part"}]}""".stripMargin
    val out = new java.io.FileOutputStream(s"$legacy/_manifests/v1.json")
    try out.write(mjson.getBytes("UTF-8")) finally out.close()
    val joinedLegacy = facts.join(
      spark.read.format("graft-snapshot").load(legacy), "k")
    val planLegacy = joinedLegacy.queryExecution.executedPlan.toString
    assert(!planLegacy.contains("BroadcastHashJoin"),
      s"a byte-less manifest must not claim the side is small:\n$planLegacy")
    assert(joinedLegacy.count() == 2000000L,
      "the legacy read itself must stay correct")
  }

  test("readChangeFeed streams appends as inserts and MoR deletes as delta-sized retraction keys") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_cdf").toString
    val tbl = s"$base/tbl"
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), tbl)
    SnapshotTable.commitAppend(Seq((4L, "d")).toDF("id", "v"), tbl)
    // v3 = a merge-on-read DELETE: zero data files touched, one key file
    SnapshotTable.commitDeleteMoR(Seq(2L).toDF("id"), tbl, Seq("id"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(tbl)
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val out = spark.read.parquet(s"$base/out")
    val rows = out.collect().map(r => (r.getAs[Long]("id"),
      Option(r.getAs[String]("v")), r.getAs[String]("_change"),
      r.getAs[Long]("_commit_version"))).toSet
    assert(rows == Set(
      (1L, Some("a"), "insert", 1L), (2L, Some("b"), "insert", 1L),
      (3L, Some("c"), "insert", 1L), (4L, Some("d"), "insert", 2L),
      (2L, None, "delete_key", 3L)),
      s"change feed must carry inserts + the retraction key: $rows")
    // resume drains only new commits: another MoR delete
    SnapshotTable.commitDeleteMoR(Seq(4L).toDF("id"), tbl, Seq("id"))
    drain()
    assert(spark.read.parquet(s"$base/out").count() == 6L,
      "resume must emit exactly the new retraction key")
    // a COW rewrite still poisons the feed loudly
    SnapshotTable.commitMerge(Seq((1L, "rewritten")).toDF("id", "v"), tbl, Seq("id"))
    val boom = intercept[Exception] { drain() }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(boom).contains("not an append"), msgs(boom))
    // and the WITHOUT-cdf stream refuses the MoR delete range too
    val boom2 = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot").load(tbl)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ck2")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(msgs(boom2).contains("mor-delete"), msgs(boom2))
    // batch reads refuse the streaming option with a pointer
    val boom3 = intercept[Exception] {
      spark.read.format("graft-snapshot").option("readChangeFeed", "true")
        .load(tbl).collect()
    }
    assert(msgs(boom3).contains("graft_table_changes"), msgs(boom3))
  }

  test("streaming reader honors schema evolution: a pre-widening file reads null, session conf reaches executors (ADVICE r12)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_widen").toString
    val tbl = s"$base/tbl"
    // file 1 carries (id, v); the second append widens with `extra` —
    // the old Group reader threw on getFieldIndex("extra") for file 1
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl)
    SnapshotTable.commitAppend(
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "extra"), tbl)
    val q = spark.readStream.format("graft-snapshot").load(tbl)
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 4L)
    assert(out.filter(col("extra").isNull).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L),
      "pre-widening rows must read null for the added column")
    assert(out.filter(col("id") === 3L).select("extra").as[Long].head() == 30L)
  }

  test("SQL DML: DELETE/UPDATE/MERGE are file-granular COW via runtime group filtering; full-file DELETE is metadata-only") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_dml").toString
    spark.conf.set("spark.sql.catalog.gdml",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.root", root)
    spark.conf.set(
      "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled", "true")
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    // three range-disjoint files (one per append) with id stats
    def slab(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"v$i")).toDF("id", "v").repartition(1)
    SnapshotTable.commitAppend(slab(0L, 100L), dir, statsCols = Seq("id"))
    SnapshotTable.commitAppend(slab(100L, 200L), dir, statsCols = Seq("id"))
    SnapshotTable.commitAppend(slab(200L, 300L), dir, statsCols = Seq("id"))
    val orig = SnapshotTable.files(spark, dir, 3L)
    assert(orig.size == 3, s"expected 3 files, got $orig")

    // DELETE on a column with NO stats: static pruning can't help, so
    // a carried file proves the RUNTIME group filter found the one
    // affected file through the _file metadata column
    spark.sql("DELETE FROM gdml.ns.t WHERE v = 'v150'")
    val afterDelete = SnapshotTable.files(spark, dir, 4L).toSet
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t").head().getLong(0) == 299L)
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t WHERE id = 150")
      .head().getLong(0) == 0L)
    val carried = orig.toSet.intersect(afterDelete)
    assert(carried.size == 2,
      s"runtime group filtering must carry the 2 unaffected files: " +
        s"orig=$orig after=$afterDelete")
    assert((afterDelete -- orig).forall(_.startsWith("dml-")),
      s"the rewritten group must land as a dml batch: $afterDelete")

    // UPDATE prunes statically through the id stats: only the 0-99
    // file is rewritten
    spark.sql("UPDATE gdml.ns.t SET v = 'patched' WHERE id = 50")
    val afterUpdate = SnapshotTable.files(spark, dir, 5L).toSet
    assert(afterDelete.intersect(afterUpdate).size == 2,
      s"UPDATE must rewrite only the affected group: $afterDelete -> $afterUpdate")
    assert(spark.sql("SELECT v FROM gdml.ns.t WHERE id = 50")
      .head().getString(0) == "patched")
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t WHERE v = 'patched'")
      .head().getLong(0) == 1L)

    // MERGE: one matched update (file 200-299) + one insert
    Seq((250L, "merged"), (1000L, "inserted")).toDF("id", "v")
      .createOrReplaceTempView("dml_src")
    spark.sql(
      """MERGE INTO gdml.ns.t t USING dml_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t").head().getLong(0) == 300L)
    assert(spark.sql("SELECT v FROM gdml.ns.t WHERE id = 250")
      .head().getString(0) == "merged")
    assert(spark.sql("SELECT v FROM gdml.ns.t WHERE id = 1000")
      .head().getString(0) == "inserted")
    val afterMerge = SnapshotTable.files(spark, dir,
      SnapshotTable.versions(spark, dir).last).toSet

    // full-file DELETE: every live file is provably all- or
    // none-matching from stats, so the commit is METADATA-ONLY —
    // the file census shrinks with ZERO new data files
    spark.sql("DELETE FROM gdml.ns.t WHERE id >= 0 AND id <= 99")
    val afterMeta = SnapshotTable.files(spark, dir,
      SnapshotTable.versions(spark, dir).last).toSet
    assert(afterMeta.subsetOf(afterMerge),
      s"metadata-only delete must write no data file: $afterMerge -> $afterMeta")
    assert(afterMerge.diff(afterMeta).size == 1,
      "exactly the provably-all-matching file drops from the manifest")
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t").head().getLong(0) == 200L)
    assert(spark.sql("SELECT min(id) FROM gdml.ns.t").head().getLong(0) == 100L)

    // the _file metadata column is user-visible lineage
    assert(spark.sql("SELECT DISTINCT _file FROM gdml.ns.t").count() ==
      afterMeta.size.toLong)

    // time travel still reads every pre-DML version
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t VERSION AS OF 3")
      .head().getLong(0) == 300L)
    assert(spark.sql("SELECT v FROM gdml.ns.t VERSION AS OF 3 WHERE id = 50")
      .head().getString(0) == "v50")
  }

  test("ALTER TABLE RENAME/DROP COLUMN land as seq-scoped evolution commits") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_alter").toString
    spark.conf.set("spark.sql.catalog.galter",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.galter.root", root)
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    SnapshotTable.commitAppend(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "extra"), dir)
    spark.sql("ALTER TABLE galter.ns.t RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM galter.ns.t WHERE id = 1")
      .head().getString(0) == "a", "old files read through the rename map")
    spark.sql("ALTER TABLE galter.ns.t DROP COLUMN extra")
    assert(!spark.sql("SELECT * FROM galter.ns.t").columns.contains("extra"))
    // both ops are VERSIONS: time travel shows the pre-evolution schema
    assert(spark.sql("SELECT v FROM galter.ns.t VERSION AS OF 1 WHERE id = 1")
      .head().getString(0) == "a")
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L, 3L))
    // unsupported evolution refuses loudly
    val boom = intercept[Exception] {
      spark.sql("ALTER TABLE galter.ns.t ALTER COLUMN id TYPE INT")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(boom).toLowerCase.contains("not supported") ||
      msgs(boom).toLowerCase.contains("unsupported"), msgs(boom))
  }

  test("streaming SINK: expectations gate every epoch — a violating micro-batch fails loudly, publishes nothing") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("snap_sink_exp").toString
    spark.conf.set("spark.sql.catalog.gsexp",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsexp.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val sink = s"$root/ns/t"
    spark.sql("CREATE TABLE gsexp.ns.t (id BIGINT, v STRING) TBLPROPERTIES " +
      "('expect.v_present' = 'v IS NOT NULL')")
    val src = s"$root/src"
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"))
        .toDF("id", "v"), src)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(src)
        .writeStream.format("graft-snapshot")
        .option("path", sink).option("appId", "expsink")
        .option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val e = intercept[Exception] { drain() }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(rootMsg(e).contains("v_present"), rootMsg(e))
    assert(spark.sql("SELECT count(*) FROM gsexp.ns.t").head().getLong(0) == 0L,
      "a refused epoch must publish nothing")
    // a compliant source drains fine through the same gate
    val src2 = s"$root/src2"
    SnapshotTable.commitAppend(Seq((1L, "a"), (3L, "c")).toDF("id", "v"), src2)
    val q2 = spark.readStream.format("graft-snapshot").load(src2)
      .writeStream.format("graft-snapshot")
      .option("path", sink).option("appId", "expsink2")
      .option("checkpointLocation", s"$root/ck2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM gsexp.ns.t").head().getLong(0) == 2L)
  }

  test("streaming SINK upsert mode: each epoch lands rows + an equality delete of its keys") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_sink_ups").toString
    val src = s"$base/src"
    val sink = s"$base/sink"
    // epoch 1 creates; epoch 2 restates ids 0-9 and adds 50-59
    SnapshotTable.commitAppend(
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v"), src)
    SnapshotTable.commitAppend(
      ((0L until 10L) ++ (50L until 60L)).map(i => (i, s"r$i"))
        .toDF("id", "v"), src)
    def drain(ck: String): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream.format("graft-snapshot")
        .option("path", sink).option("appId", "upsink")
        .option("upsertKeys", "id").option("statsCols", "id")
        .option("checkpointLocation", s"$base/$ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("ck1")
    // upsert semantics: restated images win, fresh keys append
    val out = SnapshotTable.read(spark, sink)
    assert(out.count() == 60L)
    assert(out.filter(col("id") === 3L).select("v").head().getString(0) == "r3")
    assert(out.filter(col("id") === 23L).select("v").head().getString(0) == "v23")
    assert(out.filter(col("id") === 55L).select("v").head().getString(0) == "r55")
    // epoch 1 created (no prior files to doom), epoch 2 carried an
    // equality delete of exactly its 20 keys and touched NO epoch-1
    // file
    val vs = SnapshotTable.versions(spark, sink)
    assert(vs == Seq(1L, 2L), s"two ledgered versions, got $vs")
    assert(SnapshotTable.pendingDeletes(spark, sink) ==
      Seq((Seq("id"), 2L, 20L)))
    assert(SnapshotTable.files(spark, sink, 1L).toSet
      .subsetOf(SnapshotTable.files(spark, sink, 2L).toSet),
      "the upsert epoch must touch zero pre-existing files")
    // fresh checkpoint, same appId: full redelivery no-ops the ledger
    drain("ck2")
    assert(SnapshotTable.versions(spark, sink) == Seq(1L, 2L),
      "replayed epochs must publish nothing")
    assert(SnapshotTable.read(spark, sink).count() == 60L)
    // fold keeps the answer
    SnapshotTable.applyDeletes(spark, sink)
    assert(SnapshotTable.read(spark, sink).count() == 60L)
    assert(SnapshotTable.read(spark, sink)
      .filter(col("id") === 3L).select("v").head().getString(0) == "r3")
    // a duplicate-key epoch refuses loudly
    val src2 = s"$base/src2"
    SnapshotTable.commitAppend(
      Seq((1L, "x"), (1L, "y")).toDF("id", "v"), src2)
    val boom = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot").load(src2)
        .writeStream.format("graft-snapshot")
        .option("path", sink).option("appId", "upsink2")
        .option("upsertKeys", "id")
        .option("checkpointLocation", s"$base/ck3")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(boom).contains("ONE image per key"), msgs(boom))
  }

  test("streaming SINK: table-to-table pipeline, exactly-once across fresh-checkpoint redelivery") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_sink").toString
    val src = s"$base/src"
    val sink = s"$base/sink"
    SnapshotTable.commitAppend(
      (0L until 50L).map(i => (i, s"v$i", Array(i.toFloat, -i.toFloat)))
        .toDF("id", "v", "emb"), src)
    SnapshotTable.commitAppend(
      (50L until 80L).map(i => (i, s"v$i", Array(i.toFloat)))
        .toDF("id", "v", "emb"), src)
    def drain(ck: String): Unit = {
      val q = spark.readStream.format("graft-snapshot").load(src)
        .writeStream.format("graft-snapshot")
        .option("path", sink)
        .option("appId", "sinkspec")
        .option("statsCols", "id")
        .option("checkpointLocation", s"$base/$ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("ck1")
    val out = SnapshotTable.read(spark, sink)
    assert(out.count() == 80L)
    assert(out.filter(col("id") === 7L).select("v").head().getString(0) == "v7")
    assert(out.filter(col("id") === 7L).select("emb").head()
      .getSeq[Float](0).toList == List(7.0f, -7.0f),
      "arrays must round-trip through the sink")
    // sticky stats declaration: the streamed files prune
    val (kept, total) = SnapshotTable.pruneFiles(spark, sink,
      Seq(SnapshotTable.StatFilter("id", upper = Some(5L))))
    assert(kept.size < total, s"streamed files must carry id stats: $kept/$total")
    // FRESH checkpoint, same appId: every epoch re-delivers, the
    // ledger no-ops them all — exactly-once across redelivery
    val versionsBefore = SnapshotTable.versions(spark, sink)
    drain("ck2")
    assert(SnapshotTable.read(spark, sink).count() == 80L,
      "redelivered epochs must not duplicate rows")
    assert(SnapshotTable.versions(spark, sink) == versionsBefore,
      "a recognized replay must not even commit a version")
    // the replayed epochs' orphan files were swept on no-op
    val live = SnapshotTable.files(spark, sink,
      SnapshotTable.versions(spark, sink).last).map(_.split('/').head).toSet
    val onDisk = new java.io.File(sink).listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_ == "_manifests")
      .filterNot(_.startsWith("_")).toSet
    assert(onDisk == live, s"replay must sweep its orphans: disk=$onDisk live=$live")
    // a NEW append drains incrementally into the standing sink
    SnapshotTable.commitAppend(
      Seq((99L, "new", Array(9.0f))).toDF("id", "v", "emb"), src)
    drain("ck1")
    assert(SnapshotTable.read(spark, sink).count() == 81L)
  }

  test("timestamps stream through source and sink: INT96 and annotated-INT64 files decode to identical event times") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_ts").toString
    val src = s"$base/src"
    val sink = s"$base/sink"
    val k = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(k)
    try {
      // file 1: Spark's default INT96 timestamps (+ NTZ as INT64)
      spark.conf.set(k, "INT96")
      SnapshotTable.commitAppend(Seq(
        (1L, java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456"),
          java.time.LocalDateTime.parse("2024-03-01T01:02:03.000004")))
        .toDF("id", "ts", "nt"), src)
      // file 2: standard INT64 MILLIS annotation (milli-grain values)
      spark.conf.set(k, "TIMESTAMP_MILLIS")
      SnapshotTable.commitAppend(Seq(
        (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.987"),
          java.time.LocalDateTime.parse("1999-12-31T23:00:00.001")))
        .toDF("id", "ts", "nt"), src)
      // file 3: INT64 MICROS
      spark.conf.set(k, "TIMESTAMP_MICROS")
      SnapshotTable.commitAppend(Seq(
        (3L, java.sql.Timestamp.valueOf("2031-06-15 00:00:00.000001"),
          java.time.LocalDateTime.parse("2031-06-15T12:00:00.999999")))
        .toDF("id", "ts", "nt"), src)
    } finally spark.conf.set(k, prev)
    val q = spark.readStream.format("graft-snapshot").load(src)
      .writeStream.format("graft-snapshot")
      .option("path", sink).option("appId", "tsspec")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def census(dir: String) = SnapshotTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getAs[java.time.LocalDateTime](2).toString)).toSet
    assert(census(sink) == census(src),
      s"event times must survive the pipeline exactly:\n" +
        s"src=${census(src)}\nsink=${census(sink)}")
    assert(census(sink).size == 3)
  }

  test("SQL DML reads old files through the rename map and re-added columns as null") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_dml_ren").toString
    spark.conf.set("spark.sql.catalog.gren",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gren.root", root)
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    // file 1 physically carries (id, v); the table then renames v→label
    SnapshotTable.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    SnapshotTable.commitRenameColumn(spark, dir, "v", "label")
    // file 2 carries the CURRENT name
    SnapshotTable.commitAppend(Seq((3L, "c")).toDF("id", "label"), dir)
    // UPDATE through SQL: the row-level scan must decode file 1's
    // physical 'v' as logical 'label' (writeTimeName), or the rewrite
    // would null every pre-rename row it carries
    spark.sql("UPDATE gren.ns.t SET label = 'patched' WHERE id = 2")
    val rows = spark.sql("SELECT id, label FROM gren.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "patched"), (3L, "c")),
      s"pre-rename values must survive the COW rewrite: $rows")
    // drop then re-add the name: the OLD file's 'label' bytes are a
    // dead generation — DML must read them as null, not resurrect
    SnapshotTable.commitDropColumn(spark, dir, "label")
    SnapshotTable.commitAppend(Seq((4L, "fresh")).toDF("id", "label"), dir)
    spark.sql("DELETE FROM gren.ns.t WHERE id = 1")
    val after = spark.sql("SELECT id, label FROM gren.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(after == Seq((2L, None), (3L, None), (4L, Some("fresh"))),
      s"a re-added column must read null on pre-drop files: $after")
  }

  test("CTAS and REPLACE TABLE AS SELECT land as versioned commits") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_ctas").toString
    spark.conf.set("spark.sql.catalog.gctas",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctas.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gctas.ns.t AS " +
      "SELECT id, concat('v', id) AS v FROM range(100)")
    assert(spark.sql("SELECT count(*) FROM gctas.ns.t").head().getLong(0) == 100L)
    assert(spark.sql("SELECT v FROM gctas.ns.t WHERE id = 7")
      .head().getString(0) == "v7")
    // CTAS = CREATE (empty v1) + the insert (v2); history intact
    assert(SnapshotTable.versions(spark, s"$root/ns/t") == Seq(1L, 2L))
    intercept[Exception] {
      spark.sql("CREATE TABLE gctas.ns.t AS SELECT 1 AS id")
    }
    // REPLACE TABLE AS SELECT: drop + recreate through the catalog
    spark.sql("CREATE OR REPLACE TABLE gctas.ns.t AS " +
      "SELECT id, concat('w', id) AS v FROM range(10)")
    assert(spark.sql("SELECT count(*) FROM gctas.ns.t").head().getLong(0) == 10L)
    assert(spark.sql("SELECT v FROM gctas.ns.t WHERE id = 3")
      .head().getString(0) == "w3")
  }

  test("SQL DML conflict rule: a commit between scan and publish aborts loudly") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val dir = s"${java.nio.file.Files.createTempDirectory("snap_conflict")}/t"
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("id", "v"), dir)
    SnapshotTable.commitAppend(Seq((2L, "b")).toDF("id", "v"), dir)
    val v2files = SnapshotTable.files(spark, dir, 2L)
    // simulate the row-level write committing against a STALE scan:
    // head moved to v3 after the scan planned at v2
    SnapshotTable.commitAppend(Seq((3L, "c")).toDF("id", "v"), dir)
    val boom = intercept[IllegalArgumentException] {
      SnapshotTable.commitReplaceFiles(spark, dir, basedOn = 2L,
        replaced = v2files.toSet, newFiles = Nil)
    }
    assert(boom.getMessage.contains("concurrent commit"), boom.getMessage)
    // and replacing a file the head no longer names refuses too
    val boom2 = intercept[IllegalArgumentException] {
      SnapshotTable.commitReplaceFiles(spark, dir, basedOn = 3L,
        replaced = Set("batch-gone/nope.parquet"), newFiles = Nil)
    }
    assert(boom2.getMessage.contains("no longer live"), boom2.getMessage)
  }

  test("CREATE TABLE recovers from a crashed predecessor's orphan _schema.json (ADVICE r12)") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_crash").toString
    spark.conf.set("spark.sql.catalog.gcrash",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcrash.root", root)
    // simulate a CREATE that crashed between the schema write and the
    // empty v1 commit: _schema.json exists, no committed version
    new java.io.File(s"$root/ns/t/_manifests").mkdirs()
    val stale = new java.io.FileOutputStream(s"$root/ns/t/_manifests/_schema.json")
    try stale.write("{\"stale\":true}".getBytes("UTF-8")) finally stale.close()
    assert(!spark.catalog.tableExists("gcrash.ns.t"))
    // the identifier must not be wedged: CREATE overwrites the debris
    spark.sql("CREATE TABLE gcrash.ns.t (id BIGINT, v STRING)")
    assert(SnapshotTable.versions(spark, s"$root/ns/t") == Seq(1L))
    spark.sql("INSERT INTO gcrash.ns.t VALUES (1, 'a')")
    assert(spark.sql("SELECT v FROM gcrash.ns.t").head().getString(0) == "a")
    // and a table that EXISTS still refuses a second CREATE
    intercept[Exception] {
      spark.sql("CREATE TABLE gcrash.ns.t (id BIGINT)")
    }
  }

  test("ALTER TABLE ADD COLUMN widens as a seq-scoped evolution commit") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_add").toString
    spark.conf.set("spark.sql.catalog.gadd",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gadd.root", root)
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    SnapshotTable.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    spark.sql("ALTER TABLE gadd.ns.t ADD COLUMN score BIGINT")
    // pre-widening rows read NULL under the added column
    assert(spark.sql("SELECT score FROM gadd.ns.t WHERE id = 1").head().isNullAt(0))
    assert(spark.table("gadd.ns.t").columns.toSeq == Seq("id", "v", "score"))
    // post-add inserts carry it physically
    spark.sql("INSERT INTO gadd.ns.t VALUES (3, 'c', 30)")
    assert(spark.sql("SELECT score FROM gadd.ns.t WHERE id = 3").head().getLong(0) == 30L)
    assert(spark.sql("SELECT sum(score) FROM gadd.ns.t").head().getLong(0) == 30L)
    // the add is a VERSION: time travel shows the pre-widening schema
    assert(!spark.sql("SELECT * FROM gadd.ns.t VERSION AS OF 1")
      .columns.contains("score"))
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L, 3L))
    // a later RENAME follows the added column; a DROP kills it
    spark.sql("ALTER TABLE gadd.ns.t RENAME COLUMN score TO points")
    assert(spark.sql("SELECT points FROM gadd.ns.t WHERE id = 3").head().getLong(0) == 30L)
    spark.sql("ALTER TABLE gadd.ns.t DROP COLUMN points")
    assert(!spark.table("gadd.ns.t").columns.contains("points"))
    // duplicate add refuses; NOT NULL add refuses (old rows read null)
    intercept[Exception] { spark.sql("ALTER TABLE gadd.ns.t ADD COLUMN v STRING") }
    intercept[Exception] {
      spark.sql("ALTER TABLE gadd.ns.t ADD COLUMN nn BIGINT NOT NULL")
    }
    // ADD on an EMPTY table (CREATE then ALTER before first insert)
    spark.sql("CREATE TABLE gadd.ns.e (id BIGINT)")
    spark.sql("ALTER TABLE gadd.ns.e ADD COLUMN tag STRING")
    assert(spark.table("gadd.ns.e").columns.toSeq == Seq("id", "tag"))
    spark.sql("INSERT INTO gadd.ns.e VALUES (7, 'x')")
    assert(spark.sql("SELECT tag FROM gadd.ns.e WHERE id = 7").head().getString(0) == "x")
  }

  test("a multi-change ALTER validates every change before committing any (ADVICE r13)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val root = java.nio.file.Files.createTempDirectory("snap_atomic").toString
    spark.conf.set("spark.sql.catalog.gatomic",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gatomic.root", root)
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    SnapshotTable.commitAppend(Seq((1L, "a", 2L)).toDF("id", "v", "w"), dir)
    val cat = spark.sessionState.catalogManager.catalog("gatomic")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("ns"), "t")
    // second change invalid (renames the just-dropped column): the
    // FIRST change must not land either — all-or-nothing
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.deleteColumn(Array("w"), false),
        TableChange.renameColumn(Array("w"), "w2"))
    }
    assert(SnapshotTable.versions(spark, dir) == Seq(1L),
      "a rejected multi-change ALTER must leave the table untouched")
    assert(spark.table("gatomic.ns.t").columns.toSeq == Seq("id", "v", "w"))
    // and a VALID multi-change lands every change
    cat.alterTable(ident,
      TableChange.renameColumn(Array("v"), "label"),
      TableChange.deleteColumn(Array("w"), false))
    assert(spark.table("gatomic.ns.t").columns.toSeq == Seq("id", "label"))
  }

  test("a data column named _change streams its DATA through a non-CDF read (ADVICE r13)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_chg").toString
    val tbl = s"$base/tbl"
    SnapshotTable.commitAppend(
      Seq((1L, "real1"), (2L, "real2")).toDF("id", "_change"), tbl)
    val q = spark.readStream.format("graft-snapshot").load(tbl)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$base/out").select("_change")
      .as[String].collect().sorted.toSeq == Seq("real1", "real2"),
      "the column's data must stream, not the CDF constant 'insert'")
  }

  test("DROP TABLE is GC-deferred: a pinned-version reader survives, the vacuum horizon sweeps the carcass") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_drop").toString
    spark.conf.set("spark.sql.catalog.gdrop",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdrop.root", root)
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    SnapshotTable.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    // a reader pins version 1 BEFORE the drop
    val pinned = SnapshotTable.read(spark, dir, Some(1L))
    spark.sql("DROP TABLE gdrop.ns.t")
    // the identifier is gone immediately...
    assert(!spark.catalog.tableExists("gdrop.ns.t"))
    assert(spark.sql("SHOW TABLES IN gdrop.ns").count() == 0L)
    // ...but the pinned reader finishes its scan (reader isolation)
    assert(pinned.count() == 2L,
      "a concurrent pinned-version read must survive DROP TABLE")
    // inside the grace window the sweep leaves the carcass alone
    assert(SnapshotTable.gcDroppedTables(spark, root) == 0)
    assert(new java.io.File(dir).exists())
    // past the horizon the maintenance pass deletes the tree
    assert(SnapshotTable.gcDroppedTables(spark, root, graceMs = 0L) == 1)
    assert(!new java.io.File(dir).exists(),
      "the vacuum horizon must sweep the dropped table's tree")
    // re-CREATE on a dropped-but-unswept identifier starts fresh at v1
    SnapshotTable.commitAppend(Seq((9L, "z")).toDF("id", "v"), s"$root/ns/t2")
    spark.sql("DROP TABLE gdrop.ns.t2")
    spark.sql("CREATE TABLE gdrop.ns.t2 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdrop.ns.t2 VALUES (10, 'fresh')")
    assert(SnapshotTable.versions(spark, s"$root/ns/t2") == Seq(1L, 2L),
      "re-created identifier must not inherit the dead lineage's versions")
    assert(spark.sql("SELECT v FROM gdrop.ns.t2").head().getString(0) == "fresh")
  }

  test("TVFs resolve catalog identifiers: graft_table_history('cat.ns.t') needs no physical path") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_tvf").toString
    spark.conf.set("spark.sql.catalog.gtvf",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtvf.root", root)
    val dir = s"$root/ns/t"
    new java.io.File(s"$root/ns").mkdirs()
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("id", "v"), dir)
    SnapshotTable.commitAppend(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(spark.sql("SELECT * FROM graft_table_history('gtvf.ns.t')")
      .count() == 2L)
    assert(spark.sql("SELECT * FROM graft_table_detail('gtvf.ns.t')")
      .head().getAs[Long]("version") == 2L)
    assert(spark.sql(
      "SELECT * FROM graft_table_changes('gtvf.ns.t', 1, 2)")
      .filter(col("_change") === "insert").count() == 1L)
    // dir-literal addressing still works
    assert(spark.sql(s"SELECT * FROM graft_table_history('$dir')").count() == 2L)
    // a missing identifier and a non-snapshot catalog refuse loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_history('gtvf.ns.absent')")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_history('spark_catalog.ns.t')")
    }
  }

  test("CALL procedures: the maintenance lifecycle is pure SQL — compact, fold, tag, restore, expire, clone, gc") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_proc").toString
    spark.conf.set("spark.sql.catalog.gproc",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/t"
    spark.sql("CREATE TABLE gproc.ns.t (id BIGINT, v STRING)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO gproc.ns.t VALUES ($i, 'v$i'), (${i + 10}, 'w$i')"))
    assert(SnapshotTable.files(spark, dir,
      SnapshotTable.versions(spark, dir).last).size > 1)

    // compact: named args, returned version row, one output file
    val cv = spark.sql(
      "CALL gproc.system.compact(table => 'ns.t', target_bytes => 134217728)")
    assert(cv.columns.toSeq == Seq("version"))
    val compactedV = cv.head().getLong(0)
    assert(compactedV == SnapshotTable.versions(spark, dir).last)
    assert(SnapshotTable.files(spark, dir, compactedV).size == 1)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) == 6L)

    // fold_deletes: MoR-pending keys fold into the data via CALL
    SnapshotTable.commitDeleteMoR(Seq(1L).toDF("id"), dir, Seq("id"))
    assert(SnapshotTable.pendingDeletes(spark, dir).nonEmpty)
    spark.sql("CALL gproc.system.fold_deletes('ns.t')").collect()
    assert(SnapshotTable.pendingDeletes(spark, dir).isEmpty)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) == 5L)

    // create_tag defaults to the head; delete_tag removes the pointer only
    val tagV = spark.sql("CALL gproc.system.create_tag('ns.t', 'audit')")
      .head().getLong(0)
    assert(tagV == SnapshotTable.versions(spark, dir).last)
    assert(SnapshotTable.tagVersion(spark, dir, "audit") == tagV)
    // SQL time travel BY TAG: a non-numeric VERSION AS OF is a tag name
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t VERSION AS OF 'audit'")
      .head().getLong(0) == 5L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gproc.ns.t VERSION AS OF 'no_such_tag'")
        .collect()
    }
    spark.sql("CALL gproc.system.delete_tag('ns.t', 'audit')").collect()
    intercept[Exception] { SnapshotTable.tagVersion(spark, dir, "audit") }

    // restore: roll back to the compacted version as a NEW commit
    val beforeRestore = spark.sql("SELECT * FROM gproc.ns.t").collect()
    val rv = spark.sql(s"CALL gproc.system.restore('ns.t', $compactedV)")
      .head().getLong(0)
    assert(rv > compactedV)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) == 6L)
    spark.sql(s"CALL gproc.system.restore('ns.t', ${rv - 1})").collect()
    assert(spark.sql("SELECT * FROM gproc.ns.t").collect().toSet ==
      beforeRestore.toSet)

    // clone: zero-copy staging table under a NEW identifier, then
    // the clone diverges without touching the source
    spark.sql("CALL gproc.system.clone('ns.t', 'ns.t_stage')").collect()
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t_stage")
      .head().getLong(0) == 5L)
    spark.sql("INSERT INTO gproc.ns.t_stage VALUES (99, 'staged')")
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t_stage")
      .head().getLong(0) == 6L)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) == 5L)
    intercept[Exception] { // an existing identifier refuses
      spark.sql("CALL gproc.system.clone('ns.t', 'ns.t_stage')").collect()
    }

    // optimize: the composed pass reports what fired
    val rep = spark.sql(
      "CALL gproc.system.optimize(table => 'ns.t', keep_versions => 3)").head()
    assert(rep.schema.fieldNames.toSeq == Seq("deletes_folded", "fold_version",
      "compact_version", "orphans_swept", "versions_expired"))
    assert(rep.getInt(0) == 0) // nothing pending after fold_deletes above
    assert(SnapshotTable.versions(spark, dir).size <= 3)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) == 5L)

    // expire_versions: vacuum by count down to the head
    spark.sql("CALL gproc.system.expire_versions('ns.t', keep_versions => 1)")
      .collect()
    assert(SnapshotTable.versions(spark, dir).size == 1)

    // zorder: two-column Morton rewrite via CALL, content preserved
    spark.sql(
      "CALL gproc.system.zorder('ns.t', 'id', 'id', 134217728, 8)").collect()
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) == 5L)

    // gc_dropped sweeps a dropped table's carcass across the root
    spark.sql("DROP TABLE gproc.ns.t_stage")
    assert(new java.io.File(s"$root/ns/t_stage").exists())
    assert(spark.sql("CALL gproc.system.gc_dropped(grace_ms => 0)")
      .head().getInt(0) == 1)
    assert(!new java.io.File(s"$root/ns/t_stage").exists())

    // unknown procedures and wrong namespaces refuse loudly
    intercept[Exception] { spark.sql("CALL gproc.system.nope('ns.t')") }
    intercept[Exception] { spark.sql("CALL gproc.other.compact('ns.t')") }
  }

  test("storage-partitioned join: co-bucketed snapshot tables join with NO shuffle on either side") {
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // AQE hides final subtrees behind plan boundaries — recurse through
    def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++ p.collect {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
        case q: QueryStageExec => collectAll(q.plan)(pf)
      }.flatten
    val root = java.nio.file.Files.createTempDirectory("snap_spj").toString
    spark.conf.set("spark.sql.catalog.gspj",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gspj.ns.a (id BIGINT, va STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '4')")
    spark.sql("CREATE TABLE gspj.ns.b (id BIGINT, vb STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '4')")
    spark.sql("INSERT INTO gspj.ns.a SELECT id, concat('a', id) FROM range(0, 400)")
    spark.sql("INSERT INTO gspj.ns.b SELECT id * 2, concat('b', id * 2) " +
      "FROM range(0, 300)")
    // the write landed single-bucket files, one per bucket
    val ma = SnapshotTable.readManifest(spark, s"$root/ns/a",
      SnapshotTable.versions(spark, s"$root/ns/a").last)
    assert(ma.entries.filter(_.rows > 0)
      .forall(_.stats.contains("__bucket:id:4")))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        "SELECT a.id, a.va, b.vb FROM gspj.ns.a a JOIN gspj.ns.b b ON a.id = b.id")
      val rows = joined.collect()
      assert(rows.length == 200) // even ids 0,2,...,398 -> 200 matches
      assert(rows.forall(r => r.getString(1) == s"a${r.getLong(0)}" &&
        r.getString(2) == s"b${r.getLong(0)}"))
      // the join's subtree carries NO shuffle: KeyGroupedPartitioning
      // satisfied the join's distribution on both sides
      val plan = joined.queryExecution.executedPlan
      val joins = collectAll(plan) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, s"expected a shuffle-family join in:\n$plan")
      val shuffles = collectAll(joins.head) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"co-bucketed SPJ must plan no exchange, found ${shuffles.size}:\n$plan")
      // answers equal the ordinary (shuffling) join
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val plain = spark.sql(
        "SELECT a.id, a.va, b.vb FROM gspj.ns.a a JOIN gspj.ns.b b ON a.id = b.id")
      assert(plain.collect().toSet == rows.toSet)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

      // filters still prune files inside the bucket layout, answers exact
      assert(spark.sql("SELECT count(*) FROM gspj.ns.a WHERE id < 100")
        .head().getLong(0) == 100L)
      // a bucket-ineligible table (direct API append without the
      // bucket spec) falls back to the V1 scan - correct, just shuffling
      SnapshotTable.commitAppend(
        spark.range(400, 410).selectExpr("id", "concat('a', id) AS va"),
        s"$root/ns/a")
      assert(spark.sql("SELECT count(*) FROM gspj.ns.a").head().getLong(0) == 410L)
      val downgraded = spark.sql(
        "SELECT a.id FROM gspj.ns.a a JOIN gspj.ns.b b ON a.id = b.id")
      assert(downgraded.count() == 205L) // +5: even ids in 400..409
      val dShuffles = collectAll(downgraded.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      assert(dShuffles.nonEmpty,
        "a bucket-ineligible side must fall back to the shuffling plan")
      // CALL rebucket: one overwrite rewrite restores the SPJ layout
      spark.sql("CALL gspj.system.rebucket('ns.a')").collect()
      val restored = spark.sql(
        "SELECT a.id, a.va, b.vb FROM gspj.ns.a a JOIN gspj.ns.b b ON a.id = b.id")
      assert(restored.collect().length == 205)
      val rJoins = collectAll(restored.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(rJoins.nonEmpty &&
        collectAll(rJoins.head) { case e: ShuffleExchangeExec => e }.isEmpty,
        "rebucket must restore the exchange-free join")
      // GROUP BY on the bucket column skips ITS exchange too: the
      // KeyGroupedPartitioning already clusters the grouping key
      val agg = spark.sql("SELECT id, count(*) AS n FROM gspj.ns.b GROUP BY id")
      assert(agg.count() == 300L)
      assert(collectAll(agg.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }.isEmpty, "bucketed GROUP BY must plan no exchange")
      // a CHANGED bucket spec must never ride stale per-file stats (a
      // false co-location claim = silent wrong joins): bucket stats
      // are keyed by (col, n), so the scan falls back until rebucket
      spark.sql("ALTER TABLE gspj.ns.b SET TBLPROPERTIES ('bucket_n' = '8')")
      val stale = spark.sql("SELECT id, count(*) AS n FROM gspj.ns.b GROUP BY id")
      assert(stale.count() == 300L)
      assert(collectAll(stale.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }.nonEmpty, "a changed bucket_n with stale stats must fall back")
      spark.sql("CALL gspj.system.rebucket('ns.b')").collect()
      val renew = spark.sql("SELECT id, count(*) AS n FROM gspj.ns.b GROUP BY id")
      assert(renew.count() == 300L)
      assert(collectAll(renew.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }.isEmpty, "rebucket must re-arm the layout under the new n")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("CALL clone + publish: write-audit-publish in pure SQL") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_wap").toString
    spark.conf.set("spark.sql.catalog.gwap",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwap.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gwap.ns.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gwap.ns.t SELECT id, concat('v', id) " +
      "FROM range(1, 101)")
    // stage: clone, then write + audit on the staging table only
    spark.sql("CALL gwap.system.clone('ns.t', 'ns.t_wap')").collect()
    spark.sql("INSERT INTO gwap.ns.t_wap VALUES (201, 'staged')")
    spark.sql("DELETE FROM gwap.ns.t_wap WHERE id % 10 = 0")
    assert(spark.sql("SELECT count(*) FROM gwap.ns.t").head().getLong(0) == 100L,
      "staging writes must not leak into the source pre-publish")
    val audited = spark.sql("SELECT * FROM gwap.ns.t_wap").collect().toSet
    // publish: the source flips atomically to the audited state and
    // the staging identifier is consumed
    val pv = spark.sql("CALL gwap.system.publish('ns.t_wap')").head().getLong(0)
    assert(spark.sql(s"SELECT * FROM gwap.ns.t VERSION AS OF $pv").collect()
      .toSet == audited)
    assert(spark.sql("SELECT * FROM gwap.ns.t").collect().toSet == audited)
    assert(!spark.catalog.tableExists("gwap.ns.t_wap"))
    // sweeping the consumed staging carcass never breaks the source
    assert(spark.sql("CALL gwap.system.gc_dropped(grace_ms => 0)")
      .head().getInt(0) == 1)
    assert(spark.sql("SELECT count(*) FROM gwap.ns.t").head().getLong(0) == 91L)
    // pre-publish history survives (time travel to the pre-WAP census)
    assert(spark.sql(s"SELECT count(*) FROM gwap.ns.t VERSION AS OF ${pv - 1}")
      .head().getLong(0) == 100L)
    // a publish against a moved source refuses loudly
    spark.sql("CALL gwap.system.clone('ns.t', 'ns.t_wap2')").collect()
    spark.sql("INSERT INTO gwap.ns.t VALUES (999, 'concurrent')")
    intercept[Exception] {
      spark.sql("CALL gwap.system.publish('ns.t_wap2')").collect()
    }
    assert(graft.sources.SnapshotTable.versions(spark, s"$root/ns/t_wap2")
      .nonEmpty, "a refused publish leaves staging intact")
  }

  test("ALTER COLUMN TYPE: widening lands as a rewriting commit; narrowing refuses before anything commits") {
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val root = java.nio.file.Files.createTempDirectory("snap_retype").toString
    spark.conf.set("spark.sql.catalog.grt",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.grt.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE grt.ns.t (id INT, score FLOAT, v STRING) " +
      "TBLPROPERTIES ('stats_cols' = 'id')")
    spark.sql("INSERT INTO grt.ns.t SELECT CAST(id AS INT), " +
      "CAST(id AS FLOAT) / 4, concat('v', id) FROM range(0, 100)")
    val dir = s"$root/ns/t"
    val preHead = SnapshotTable.versions(spark, dir).last
    // widening: one rewriting commit, values preserved exactly
    spark.sql("ALTER TABLE grt.ns.t ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE grt.ns.t ALTER COLUMN score TYPE DOUBLE")
    val sch = spark.table("grt.ns.t").schema
    assert(sch("id").dataType == LongType && sch("score").dataType == DoubleType)
    assert(spark.sql("SELECT sum(id) FROM grt.ns.t").head().getLong(0) == 4950L)
    assert(spark.sql("SELECT score FROM grt.ns.t WHERE id = 2")
      .head().getDouble(0) == 0.5d)
    // each retype was a VERSION: time travel reads the old type
    assert(spark.sql(s"SELECT * FROM grt.ns.t VERSION AS OF $preHead")
      .schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    // stats survived the rewrite (stats_cols re-applied)
    val (kept, total) = SnapshotTable.pruneFiles(spark, dir,
      Seq(SnapshotTable.StatFilter("id", lower = Some(1000L))))
    assert(total > 0 && kept.isEmpty,
      "the retyped table must still prune on the recorded stats")
    // narrowing / cross-family refuse LOUDLY, nothing committed
    val headBefore = SnapshotTable.versions(spark, dir).last
    intercept[Exception] {
      spark.sql("ALTER TABLE grt.ns.t ALTER COLUMN id TYPE INT")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE grt.ns.t ALTER COLUMN v TYPE BIGINT")
    }
    assert(SnapshotTable.versions(spark, dir).last == headBefore)
    // a multi-change ALTER with a bad retype commits NOTHING
    intercept[Exception] {
      spark.sql("ALTER TABLE grt.ns.t ADD COLUMN extra BIGINT, " +
        "ALTER COLUMN v TYPE BIGINT")
    }
    assert(!spark.table("grt.ns.t").columns.contains("extra"),
      "all-or-nothing: the ADD must not land when the retype refuses")
    // empty table: the declared schema is the only carrier — no rewrite
    spark.sql("CREATE TABLE grt.ns.empty (id INT)")
    spark.sql("ALTER TABLE grt.ns.empty ALTER COLUMN id TYPE BIGINT")
    assert(spark.table("grt.ns.empty").schema("id").dataType == LongType)
    spark.sql("INSERT INTO grt.ns.empty VALUES (9000000000000)")
    assert(spark.sql("SELECT id FROM grt.ns.empty").head().getLong(0) ==
      9000000000000L)
  }

  test("expect.* TBLPROPERTIES gate every SQL INSERT: violations refuse the whole commit with named counts") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_expect").toString
    spark.conf.set("spark.sql.catalog.gexp",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gexp.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gexp.ns.t (id BIGINT, v STRING) TBLPROPERTIES " +
      "('expect.positive_id' = 'id >= 0', 'expect.v_present' = 'v IS NOT NULL')")
    spark.sql("INSERT INTO gexp.ns.t SELECT id, concat('v', id) FROM range(0, 50)")
    assert(spark.sql("SELECT count(*) FROM gexp.ns.t").head().getLong(0) == 50L)
    val dir = s"$root/ns/t"
    val headBefore = SnapshotTable.versions(spark, dir).last
    // a violating batch refuses the WHOLE commit, named counts in the error
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gexp.ns.t VALUES (-1, 'x'), (7, NULL), (8, 'ok')")
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(rootMsg(e).contains("positive_id=1") &&
      rootMsg(e).contains("v_present=1"), s"got: ${rootMsg(e)}")
    assert(SnapshotTable.versions(spark, dir).last == headBefore,
      "a refused commit must publish nothing")
    assert(spark.sql("SELECT count(*) FROM gexp.ns.t").head().getLong(0) == 50L)
    // ALTER SET arms a new expectation; UNSET disarms it
    spark.sql("ALTER TABLE gexp.ns.t SET TBLPROPERTIES " +
      "('expect.small_id' = 'id < 1000')")
    intercept[Exception] { spark.sql("INSERT INTO gexp.ns.t VALUES (5000, 'big')") }
    spark.sql("ALTER TABLE gexp.ns.t UNSET TBLPROPERTIES ('expect.small_id')")
    spark.sql("INSERT INTO gexp.ns.t VALUES (5000, 'big')")
    assert(spark.sql("SELECT count(*) FROM gexp.ns.t").head().getLong(0) == 51L)
    // a predicate that does not parse refuses at DDL time, not insert time
    intercept[Exception] {
      spark.sql("CREATE TABLE gexp.ns.bad (id BIGINT) TBLPROPERTIES " +
        "('expect.oops' = 'id >=')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gexp.ns.t SET TBLPROPERTIES ('expect.oops' = '((')")
    }
    // an expectation naming an unknown column refuses at DDL time too
    intercept[Exception] {
      spark.sql("CREATE TABLE gexp.ns.bad2 (id BIGINT) TBLPROPERTIES " +
        "('expect.ghost' = 'no_such_col > 0')")
    }
    // renaming/dropping a column an expectation references refuses —
    // the predicate would otherwise fail every future INSERT
    val er = intercept[Exception] {
      spark.sql("ALTER TABLE gexp.ns.t RENAME COLUMN v TO w")
    }
    assert(er.getMessage.contains("v_present"))
    intercept[Exception] { spark.sql("ALTER TABLE gexp.ns.t DROP COLUMN v") }
    // UNSET first, then the rename goes through
    spark.sql("ALTER TABLE gexp.ns.t UNSET TBLPROPERTIES ('expect.v_present')")
    spark.sql("ALTER TABLE gexp.ns.t RENAME COLUMN v TO w")
    assert(spark.table("gexp.ns.t").columns.contains("w"))
  }

  test("expectations gate EVERY write path: DML rewrites and declare-time validation") {
    import graft.sources.SnapshotTable
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap_expect_all").toString
    spark.conf.set("spark.sql.catalog.gexa",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gexa.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/t"
    spark.sql("CREATE TABLE gexa.ns.t (id BIGINT, v STRING) TBLPROPERTIES " +
      "('expect.v_present' = 'v IS NOT NULL')")
    spark.sql("INSERT INTO gexa.ns.t SELECT id, concat('v', id) FROM range(0, 50)")
    val headBefore = SnapshotTable.versions(spark, dir).last
    // an UPDATE must not be the write path that lets a violating
    // value in: the rewrite refuses, nothing publishes
    intercept[Exception] {
      spark.sql("UPDATE gexa.ns.t SET v = NULL WHERE id = 7")
    }
    assert(SnapshotTable.versions(spark, dir).last == headBefore,
      "a refused DML rewrite must publish nothing")
    assert(spark.sql("SELECT count(*) FROM gexa.ns.t WHERE v IS NULL")
      .head().getLong(0) == 0L)
    // ... same for MERGE output
    Seq((5L, null.asInstanceOf[String])).toDF("id", "v")
      .createOrReplaceTempView("exa_src")
    intercept[Exception] {
      spark.sql("""MERGE INTO gexa.ns.t t USING exa_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(spark.sql("SELECT count(*) FROM gexa.ns.t WHERE v IS NULL")
      .head().getLong(0) == 0L)
    // a compliant UPDATE passes the same gate
    spark.sql("UPDATE gexa.ns.t SET v = 'patched' WHERE id = 7")
    assert(spark.sql("SELECT v FROM gexa.ns.t WHERE id = 7")
      .head().getString(0) == "patched")
    // declare-time validation (the ADD CONSTRAINT posture): setting
    // an expectation standing rows already violate refuses at ALTER
    spark.sql("INSERT INTO gexa.ns.t VALUES (-3, 'neg')")
    val eDecl = intercept[Exception] {
      spark.sql("ALTER TABLE gexa.ns.t SET TBLPROPERTIES " +
        "('expect.positive_id' = 'id >= 0')")
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(rootMsg(eDecl).contains("standing rows") ||
      eDecl.getMessage.contains("standing rows"), rootMsg(eDecl))
    // the refused declaration is not armed: compliant inserts proceed
    spark.sql("INSERT INTO gexa.ns.t VALUES (100, 'ok')")
    // clean the violator, then the declaration goes through and gates
    spark.sql("DELETE FROM gexa.ns.t WHERE id < 0")
    spark.sql("ALTER TABLE gexa.ns.t SET TBLPROPERTIES " +
      "('expect.positive_id' = 'id >= 0')")
    intercept[Exception] {
      spark.sql("INSERT INTO gexa.ns.t VALUES (-1, 'x')")
    }
  }

  test("advanced SQL DML forms: IN-subquery DELETE, multi-WHEN MERGE with conditions and DELETE, NOT MATCHED BY SOURCE") {
    val root = java.nio.file.Files.createTempDirectory("snap_dml_adv").toString
    spark.conf.set("spark.sql.catalog.gadv",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gadv.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gadv.ns.t (id BIGINT, v STRING, amt BIGINT)")
    spark.sql("INSERT INTO gadv.ns.t SELECT id, concat('v', id), id * 10 " +
      "FROM range(0, 100)")
    import spark.implicits._
    Seq(3L, 5L, 7L).toDF("bad_id").createOrReplaceTempView("bad_ids")
    // DELETE with an IN-subquery predicate rides the runtime group filter
    spark.sql("DELETE FROM gadv.ns.t WHERE id IN (SELECT bad_id FROM bad_ids)")
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t").head().getLong(0) == 97L)
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t WHERE id IN (3, 5, 7)")
      .head().getLong(0) == 0L)
    // UPDATE with a correlated EXISTS
    spark.sql("UPDATE gadv.ns.t SET v = 'flagged' WHERE EXISTS " +
      "(SELECT 1 FROM bad_ids WHERE bad_id = id - 1)")
    assert(spark.sql("SELECT id FROM gadv.ns.t WHERE v = 'flagged'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 6L, 8L))
    // multi-WHEN MERGE: conditional UPDATE, conditional DELETE,
    // conditional INSERT — every clause armed at once
    Seq((10L, 5L), (20L, 2000L), (200L, 7L), (201L, 9999L))
      .toDF("id", "m_amt").createOrReplaceTempView("merge_src")
    spark.sql("""MERGE INTO gadv.ns.t t USING merge_src s ON t.id = s.id
      WHEN MATCHED AND s.m_amt > 1000 THEN DELETE
      WHEN MATCHED THEN UPDATE SET amt = s.m_amt
      WHEN NOT MATCHED AND s.m_amt < 100 THEN
        INSERT (id, v, amt) VALUES (s.id, 'merged', s.m_amt)""")
    assert(spark.sql("SELECT amt FROM gadv.ns.t WHERE id = 10")
      .head().getLong(0) == 5L)      // conditional UPDATE fired
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t WHERE id = 20")
      .head().getLong(0) == 0L)      // conditional DELETE fired
    assert(spark.sql("SELECT v FROM gadv.ns.t WHERE id = 200")
      .head().getString(0) == "merged") // gated INSERT fired
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t WHERE id = 201")
      .head().getLong(0) == 0L)      // gated-out INSERT did not
    // NOT MATCHED BY SOURCE: rows the source no longer names age out
    Seq(0L, 1L, 2L).toDF("id").createOrReplaceTempView("keep_src")
    spark.sql("""MERGE INTO gadv.ns.t t USING keep_src s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id < 10 THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t WHERE id < 10")
      .head().getLong(0) == 3L) // only 0,1,2 survive below 10
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t WHERE id >= 10")
      .head().getLong(0) > 0L) // the guard kept the rest
    // the lifecycle stayed versioned: time travel sees the pre-DML table
    assert(spark.sql("SELECT count(*) FROM gadv.ns.t VERSION AS OF 2")
      .head().getLong(0) == 100L)
  }

  test("TBLPROPERTIES shape the SQL write path: sort_cols cluster inserts into pruneable files") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_props").toString
    spark.conf.set("spark.sql.catalog.gprops",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprops.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/t"
    spark.sql("CREATE TABLE gprops.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('sort_cols' = 'id', 'bloom_cols' = 'v')")
    // SHOW TBLPROPERTIES surfaces the stored config
    val shown = spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("sort_cols").contains("id"))
    assert(shown.get("bloom_cols").contains("v"))
    // adversarial insert: input hash-clustered on v, every input
    // partition spans the full id domain
    import spark.implicits._
    (0L until 400L).map(i => (i, s"v${i % 4}")).toDF("id", "v")
      .repartition(4, col("v")).createOrReplaceTempView("props_src")
    // at KB scale AQE coalesces the range shuffle into one partition
    // (at real scale its advisory sizing is exactly what you want —
    // ~target-sized clustered files); pin it off to see the ranges
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO gprops.ns.t SELECT id, v FROM props_src")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val head = SnapshotTable.versions(spark, dir).last
    val total = SnapshotTable.files(spark, dir, head).size
    assert(total > 1, "the range-clustered insert must land multiple files")
    val (kept, n) = SnapshotTable.pruneFiles(spark, dir,
      Seq(SnapshotTable.StatFilter("id", upper = Some(49L))))
    assert(n == total && kept.size < total,
      s"sort_cols must record stats narrow enough to prune: ${kept.size}/$n")
    // bloom sidecars landed for the bloom_cols column
    val m = SnapshotTable.readManifest(spark, dir, head)
    assert(m.bloomCols == Seq("v"))
    // reads are answer-identical to the unclustered content
    assert(spark.sql("SELECT count(*) FROM gprops.ns.t WHERE id <= 49")
      .head().getLong(0) == 50L)
    // a typo'd column refuses loudly at CREATE
    intercept[Exception] {
      spark.sql("CREATE TABLE gprops.ns.bad (id BIGINT) " +
        "TBLPROPERTIES ('sort_cols' = 'nope')")
    }
    // ALTER TABLE SET TBLPROPERTIES revises the write-path config;
    // UNSET removes it — and neither touches data
    spark.sql("ALTER TABLE gprops.ns.t SET TBLPROPERTIES ('stats_cols' = 'v')")
    assert(spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .exists(r => r.getString(0) == "stats_cols" && r.getString(1) == "v"))
    spark.sql("ALTER TABLE gprops.ns.t UNSET TBLPROPERTIES ('stats_cols')")
    assert(!spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .exists(_.getString(0) == "stats_cols"))
    intercept[Exception] { // validation holds on ALTER too
      spark.sql("ALTER TABLE gprops.ns.t SET TBLPROPERTIES ('sort_cols' = 'zz')")
    }
    // a column rename follows through into the col-list config
    spark.sql("ALTER TABLE gprops.ns.t RENAME COLUMN id TO id2")
    assert(spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .exists(r => r.getString(0) == "sort_cols" && r.getString(1) == "id2"))
    assert(spark.sql("SELECT count(*) FROM gprops.ns.t WHERE id2 <= 49")
      .head().getLong(0) == 50L)
  }

  test("auto-rebucket through DML: SPJ stays armed after DELETE/UPDATE/MERGE without CALL rebucket") {
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++ p.collect {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
        case q: QueryStageExec => collectAll(q.plan)(pf)
      }.flatten
    val root = java.nio.file.Files.createTempDirectory("snap_dml_spj").toString
    spark.conf.set("spark.sql.catalog.gdspj",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdspj.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gdspj.ns.a (id BIGINT, va STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '4')")
    spark.sql("CREATE TABLE gdspj.ns.b (id BIGINT, vb STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '4')")
    spark.sql("INSERT INTO gdspj.ns.a SELECT id, concat('a', id) FROM range(0, 400)")
    spark.sql("INSERT INTO gdspj.ns.b SELECT id, concat('b', id) FROM range(0, 400)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def assertSpj(expect: Long): Unit = {
      val joined = spark.sql(
        "SELECT a.id, a.va, b.vb FROM gdspj.ns.a a JOIN gdspj.ns.b b ON a.id = b.id")
      assert(joined.count() == expect)
      val joins = collectAll(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "expected a shuffle-family join")
      assert(collectAll(joins.head) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"join must stay exchange-free, got:\n${joined.queryExecution.executedPlan}")
    }
    try {
      assertSpj(400L)
      // DELETE: the rewrite's replacement files land bucket-clustered
      spark.sql("DELETE FROM gdspj.ns.a WHERE id % 10 = 3")
      val ma = SnapshotTable.readManifest(spark, s"$root/ns/a",
        SnapshotTable.versions(spark, s"$root/ns/a").last)
      assert(ma.entries.filter(_.rows > 0)
        .forall(_.stats.contains("__bucket:id:4")),
        "every replacement file must carry a __bucket stat")
      assertSpj(360L)
      // UPDATE keeps the layout too
      spark.sql("UPDATE gdspj.ns.a SET va = 'upd' WHERE id = 8")
      assertSpj(360L)
      assert(spark.sql("SELECT va FROM gdspj.ns.a WHERE id = 8")
        .head().getString(0) == "upd")
      // MERGE as well (update + insert arm)
      spark.range(0, 2).selectExpr("id * 1000 + 3 AS id", "'m' AS va")
        .createOrReplaceTempView("dml_spj_src")
      spark.sql("""MERGE INTO gdspj.ns.a t USING dml_spj_src s ON t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET va = s.va
                  |WHEN NOT MATCHED THEN INSERT (id, va) VALUES (s.id, s.va)""".stripMargin)
      // id=3 was deleted (3 % 10 == 3): both source rows insert
      // (id 3 and 1003); 1003 has no match in b
      assertSpj(361L)
      val ma2 = SnapshotTable.readManifest(spark, s"$root/ns/a",
        SnapshotTable.versions(spark, s"$root/ns/a").last)
      assert(ma2.entries.filter(_.rows > 0)
        .forall(_.stats.contains("__bucket:id:4")))
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("CREATE TABLE PARTITIONED BY maps onto the clustering lattice") {
    import graft.sources.SnapshotTable
    import graft.sources.dsv2.GraftTableProps
    val root = java.nio.file.Files.createTempDirectory("snap_part").toString
    spark.conf.set("spark.sql.catalog.gpart",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpart.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    // days(ts) -> leading sort_col + recorded spec
    spark.sql("CREATE TABLE gpart.ns.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val props = GraftTableProps.read(spark, s"$root/ns/ev")
    assert(props.get("partitioned_by").contains("days(ts)"))
    assert(GraftTableProps.cols(props, "sort_cols") == Seq("ts"))
    // DESCRIBE-truth: partitioning() parses the spec back
    assert(spark.sql("DESCRIBE TABLE EXTENDED gpart.ns.ev").collect()
      .exists(r => Option(r.getString(1)).exists(_.contains("days(ts)"))))
    // adversarial insert: input spans the full time range per partition
    spark.range(0, 2000)
      .selectExpr("id",
        "timestamp_micros(cast(1700000000000000 + id * 3600000000 as bigint)) AS ts")
      .repartition(4)
      .createOrReplaceTempView("part_src")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO gpart.ns.ev SELECT id, ts FROM part_src")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    // timestamp stats prune a day range from the manifest alone
    val cutoff = java.time.Instant.ofEpochSecond(1700000000L + 3L * 86400L)
    val (kept, total) = SnapshotTable.pruneFiles(spark, s"$root/ns/ev",
      Seq(SnapshotTable.StatFilter("ts", upper = Some(cutoff))))
    assert(total > 1, s"insert must land multiple files, got $total")
    assert(kept.size < total, s"day-range prune must drop files: $kept of $total")
    // the pruned read still answers exactly
    assert(spark.sql("SELECT count(*) FROM gpart.ns.ev " +
      "WHERE ts < TIMESTAMP '2023-11-17 22:13:20'").head().getLong(0) == 72L)
    // bucket(n, col) -> the bucket_cols/bucket_n pair
    spark.sql("CREATE TABLE gpart.ns.bk (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    val bprops = GraftTableProps.read(spark, s"$root/ns/bk")
    assert(GraftTableProps.bucketSpec(bprops).contains(("id", 4)))
    assert(bprops.get("partitioned_by").contains("bucket(4,id)"))
    spark.sql("INSERT INTO gpart.ns.bk SELECT id, concat('v', id) FROM range(0, 100)")
    val mb = SnapshotTable.readManifest(spark, s"$root/ns/bk",
      SnapshotTable.versions(spark, s"$root/ns/bk").last)
    assert(mb.entries.filter(_.rows > 0).forall(_.stats.contains("__bucket:id:4")))
    // identity transform -> plain leading sort_col
    spark.sql("CREATE TABLE gpart.ns.idt (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    assert(GraftTableProps.cols(
      GraftTableProps.read(spark, s"$root/ns/idt"), "sort_cols") == Seq("region"))
    // truncate(w, col) -> prefix clustering via the same sort_col path
    spark.sql("CREATE TABLE gpart.ns.tr (id BIGINT, v STRING) " +
      "PARTITIONED BY (truncate(4, v))")
    val tprops = GraftTableProps.read(spark, s"$root/ns/tr")
    assert(GraftTableProps.cols(tprops, "sort_cols") == Seq("v"))
    assert(tprops.get("partitioned_by").contains("truncate(4,v)"))
    // guards: unsupported transform, spec edits, column renames
    intercept[Exception] {
      spark.sql("CREATE TABLE gpart.ns.bad (id BIGINT, v STRING) " +
        "PARTITIONED BY (foo(v))")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gpart.ns.ev SET TBLPROPERTIES " +
        "('partitioned_by' = 'days(id)')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gpart.ns.ev RENAME COLUMN ts TO ts2")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gpart.ns.ev DROP COLUMN ts")
    }
    // type mistakes surface at DDL, not as a confusing NULL-partition
    // error at overwrite time: temporal transforms need TIMESTAMP/DATE
    val eTemp = intercept[Exception] {
      spark.sql("CREATE TABLE gpart.ns.badt (id BIGINT, v STRING) " +
        "PARTITIONED BY (days(v))")
    }
    assert(eTemp.getMessage.contains("TIMESTAMP") ||
      Option(eTemp.getCause).exists(_.getMessage.contains("TIMESTAMP")))
    // ... and bucket needs an integral column
    val eBk = intercept[Exception] {
      spark.sql("CREATE TABLE gpart.ns.badb (id BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, v))")
    }
    assert(eBk.getMessage.contains("integral") ||
      Option(eBk.getCause).exists(_.getMessage.contains("integral")))
    // a partition column name carrying the rendered-spec separators
    // would corrupt the record: refuse at DDL
    intercept[Exception] {
      spark.sql("CREATE TABLE gpart.ns.badn (`a, b` BIGINT, v STRING) " +
        "PARTITIONED BY (`a, b`)")
    }
  }

  test("bucketed scan parallelism: layout-blind plans uncap, layout-spending plans stay SPJ") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++ p.collect {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
        case q: QueryStageExec => collectAll(q.plan)(pf)
      }.flatten
    val root = java.nio.file.Files.createTempDirectory("snap_subsplit").toString
    spark.conf.set("spark.sql.catalog.gsub",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsub.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gsub.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '2')")
    // two inserts -> two files per bucket -> 4 live files
    spark.sql("INSERT INTO gsub.ns.t SELECT id, concat('v', id) FROM range(0, 100)")
    spark.sql("INSERT INTO gsub.ns.t SELECT id, concat('v', id) FROM range(100, 200)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // a plan with NO use for the bucket layout (plain scan) converts
      // to the V1 path: file-size-packed read parallelism, never
      // capped at bucket_n key-grouped tasks
      val plain = spark.sql("SELECT * FROM gsub.ns.t")
      assert(!plain.queryExecution.executedPlan.toString
        .contains("graft-snapshot-bucketed"),
        "a layout-blind scan must not ride the key-grouped bucketed scan")
      assert(plain.rdd.getNumPartitions > 2,
        s"plain scan must exceed bucket_n tasks, got ${plain.rdd.getNumPartitions}")
      assert(plain.count() == 200L)
      // a join ON the bucket column stays on the SPJ path, and Spark
      // groups the per-file sub-splits back to one partition per
      // bucket — exchange-free even with multi-file buckets
      val joined = spark.sql(
        "SELECT a.id FROM gsub.ns.t a JOIN gsub.ns.t b ON a.id = b.id")
      assert(joined.count() == 200L) // ids 0..199, once per side
      val joins = collectAll(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty)
      assert(collectAll(joins.head) { case e: ShuffleExchangeExec => e }.isEmpty,
        "multi-file buckets must still join exchange-free")
      assert(joined.queryExecution.executedPlan.toString
        .contains("graft-snapshot-bucketed"))
      // GROUP BY on the bucket column spends the layout too: stays SPJ,
      // no aggregation exchange
      val agg = spark.sql("SELECT id, count(*) AS n FROM gsub.ns.t GROUP BY id")
      assert(agg.count() == 200L)
      assert(collectAll(agg.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }.isEmpty, "bucketed GROUP BY must stay exchange-free")
      // a join through a projection that RENAMES the bucket column
      // must still pin the SPJ path: the layout match resolves
      // through alias lineage, not output names
      val renamed = spark.sql(
        "SELECT x.k FROM (SELECT id AS k FROM gsub.ns.t) x " +
          "JOIN (SELECT id AS k FROM gsub.ns.t) y ON x.k = y.k")
      assert(renamed.count() == 200L)
      val rJoins = collectAll(renamed.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(rJoins.nonEmpty)
      assert(collectAll(rJoins.head) { case e: ShuffleExchangeExec => e }.isEmpty,
        "a renamed bucket column must still join exchange-free (lineage match)")
      // GROUP BY on a NON-bucket column has no use for the layout:
      // converts to V1 (full parallelism under the shuffle)
      val aggV = spark.sql("SELECT v, count(*) AS n FROM gsub.ns.t GROUP BY v")
      assert(aggV.count() == 200L)
      assert(!aggV.queryExecution.executedPlan.toString
        .contains("graft-snapshot-bucketed"))
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
  test("bucket_write_fanout lifts the bucket_n write-parallelism ceiling; files stay single-bucket, SPJ intact") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.sources.SnapshotTable
    def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++ p.collect {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
        case q: QueryStageExec => collectAll(q.plan)(pf)
      }.flatten
    val root = java.nio.file.Files.createTempDirectory("snap_fanout").toString
    spark.conf.set("spark.sql.catalog.gfo",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfo.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/t"
    // a 2-bucket table that asks for 4-way write fanout: inserts land
    // on 8 tasks, not 2 — the ceiling an 8-bucket table would impose
    // on a 1000-core cluster, shrunk to spec scale
    spark.sql("CREATE TABLE gfo.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '2', " +
      "'bucket_write_fanout' = '4')")
    spark.sql("INSERT INTO gfo.ns.t SELECT id, concat('v', id) FROM range(0, 1000)")
    val m = SnapshotTable.readManifest(spark, dir,
      SnapshotTable.versions(spark, dir).last)
    val live = m.entries.filter(_.rows > 0)
    assert(live.size > 2,
      s"fanout must land more files than bucket_n, got ${live.size}")
    // every file still provably single-bucket (the k·n murmur3
    // placement invariant) — the SPJ merge depends on it
    assert(live.forall(_.stats.contains("__bucket:id:2")),
      s"every fanout file must carry a single-valued __bucket stat")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        "SELECT a.id FROM gfo.ns.t a JOIN gfo.ns.t b ON a.id = b.id")
      assert(joined.count() == 1000L)
      assert(collectAll(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e }.isEmpty,
        "fanout files must still join exchange-free")
      // DML rides the same fanout and keeps the layout
      spark.sql("DELETE FROM gfo.ns.t WHERE id % 10 = 3")
      val joined2 = spark.sql(
        "SELECT a.id FROM gfo.ns.t a JOIN gfo.ns.t b ON a.id = b.id")
      assert(joined2.count() == 900L)
      assert(collectAll(joined2.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e }.isEmpty,
        "post-DML fanout files must still join exchange-free")
      // bucket-aware compaction sweeps the fanout's file tail WITHIN
      // buckets: census shrinks, layout stays armed
      val beforeCompact = SnapshotTable.readManifest(spark, dir,
        SnapshotTable.versions(spark, dir).last).entries.count(_.rows > 0)
      spark.sql("CALL gfo.system.compact('ns.t')").collect()
      val mC = SnapshotTable.readManifest(spark, dir,
        SnapshotTable.versions(spark, dir).last)
      val liveC = mC.entries.filter(_.rows > 0)
      assert(liveC.size < beforeCompact,
        s"compaction must shrink the fanout census: $beforeCompact -> ${liveC.size}")
      assert(liveC.forall(_.stats.contains("__bucket:id:2")),
        "compacted files must keep single-valued __bucket stats")
      val joined3 = spark.sql(
        "SELECT a.id FROM gfo.ns.t a JOIN gfo.ns.t b ON a.id = b.id")
      assert(joined3.count() == 900L)
      assert(collectAll(joined3.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e }.isEmpty,
        "post-compaction files must still join exchange-free")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // 'auto' sizes k to the cluster; a fanout-less table keeps today's
    // exactly-n placement; fanout without a bucket layout refuses
    spark.sql("CREATE TABLE gfo.ns.auto (id BIGINT) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '2', " +
      "'bucket_write_fanout' = 'auto')")
    spark.sql("INSERT INTO gfo.ns.auto SELECT id FROM range(0, 1000)")
    assert(spark.sql("SELECT count(*) FROM gfo.ns.auto").head().getLong(0) == 1000L)
    intercept[Exception] {
      spark.sql("CREATE TABLE gfo.ns.bad (id BIGINT) " +
        "TBLPROPERTIES ('bucket_write_fanout' = '4')")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gfo.ns.bad2 (id BIGINT) " +
        "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '2', " +
        "'bucket_write_fanout' = '0')")
    }
  }

  test("REPLACE WHERE: filter-scoped atomic overwrite — file-granular, one commit, time-travelable") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_rw").toString
    spark.conf.set("spark.sql.catalog.grw",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.grw.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/t"
    spark.sql("CREATE TABLE grw.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('sort_cols' = 'id')")
    // range-clustered insert -> per-file id ranges are narrow
    spark.range(0, 100).selectExpr("id", "concat('v', id) AS v")
      .repartition(4).createOrReplaceTempView("rw_src")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO grw.ns.t SELECT id, v FROM rw_src")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val vBefore = SnapshotTable.versions(spark, dir).last
    val entriesBefore = SnapshotTable.readManifest(spark, dir, vBefore)
      .entries.map(_.path).toSet
    // replace the first quarter with only its even ids, renamed
    spark.sql("INSERT INTO grw.ns.t REPLACE WHERE id < 25 " +
      "SELECT id, 'replaced' AS v FROM range(0, 25) WHERE id % 2 = 0")
    // ONE commit: the version advanced exactly once
    val vAfter = SnapshotTable.versions(spark, dir).last
    assert(vAfter == vBefore + 1, s"expected one commit, $vBefore -> $vAfter")
    // exact contents: 75 untouched + 13 replacements
    assert(spark.sql("SELECT count(*) FROM grw.ns.t").head().getLong(0) == 88L)
    assert(spark.sql(
      "SELECT count(*) FROM grw.ns.t WHERE v = 'replaced'").head().getLong(0) == 13L)
    assert(spark.sql(
      "SELECT count(*) FROM grw.ns.t WHERE id < 25 AND v != 'replaced'")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT v FROM grw.ns.t WHERE id = 30")
      .head().getString(0) == "v30")
    // file-granular: provably-none-matching files carried BY REFERENCE
    val entriesAfter = SnapshotTable.readManifest(spark, dir, vAfter)
      .entries.map(_.path).toSet
    assert(entriesBefore.intersect(entriesAfter).nonEmpty,
      "none-matching files must carry by reference, not rewrite")
    // time travel still reads the pre-replace census
    assert(spark.sql(s"SELECT count(*) FROM grw.ns.t VERSION AS OF $vBefore")
      .head().getLong(0) == 100L)
    // a NULL predicate row survives (null never matches)
    spark.sql("INSERT INTO grw.ns.t SELECT NULL, 'nullrow'")
    spark.sql("INSERT INTO grw.ns.t REPLACE WHERE id >= 90 " +
      "SELECT CAST(200 AS BIGINT), 'tail'")
    assert(spark.sql("SELECT count(*) FROM grw.ns.t WHERE v = 'nullrow'")
      .head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM grw.ns.t WHERE id >= 90 AND id < 200")
      .head().getLong(0) == 0L)
    // expectations gate the NEW batch: a violating replacement refuses
    // the WHOLE commit and the table is untouched (null-tolerant
    // predicate — declare-time validation (r16) refuses a declaration
    // the standing nullrow would violate, which is its own contract)
    intercept[Exception] {
      spark.sql("ALTER TABLE grw.ns.t SET TBLPROPERTIES ('expect.pos' = 'id >= 0')")
    }
    spark.sql("ALTER TABLE grw.ns.t SET TBLPROPERTIES " +
      "('expect.pos' = 'id >= 0 OR id IS NULL')")
    val before = spark.sql("SELECT count(*) FROM grw.ns.t").head().getLong(0)
    intercept[Exception] {
      spark.sql("INSERT INTO grw.ns.t REPLACE WHERE id < 10 " +
        "SELECT CAST(-1 AS BIGINT), 'bad'")
    }
    assert(spark.sql("SELECT count(*) FROM grw.ns.t").head().getLong(0) == before)
  }

  test("dynamic partition overwrite: INSERT OVERWRITE replaces exactly the batch's partitions") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_dyn").toString
    spark.conf.set("spark.sql.catalog.gdyn",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdyn.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/ev"
    spark.sql("CREATE TABLE gdyn.ns.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    // four UTC-aligned days of hourly rows
    val day0 = 1700006400L // 2023-11-15 00:00:00 UTC
    spark.range(0, 96)
      .selectExpr("id",
        s"timestamp_seconds($day0 + id * 3600) AS ts")
      .repartition(4).createOrReplaceTempView("dyn_src")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO gdyn.ns.ev SELECT id, ts FROM dyn_src")
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val vBefore = SnapshotTable.versions(spark, dir).last
    val entriesBefore = SnapshotTable.readManifest(spark, dir, vBefore)
      .entries.map(_.path).toSet
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the batch touches ONLY day 1 -> days 0/2/3 stay intact
      spark.sql("INSERT OVERWRITE gdyn.ns.ev " +
        s"SELECT id + 1000, timestamp_seconds($day0 + 86400 + (id + 1) * 3600) " +
        "FROM range(0, 3)")
      assert(spark.sql("SELECT count(*) FROM gdyn.ns.ev").head().getLong(0) == 75L)
      assert(spark.sql("SELECT count(*) FROM gdyn.ns.ev WHERE id >= 1000")
        .head().getLong(0) == 3L)
      // untouched days intact, replaced day gone
      assert(spark.sql(
        s"SELECT count(*) FROM gdyn.ns.ev WHERE ts < timestamp_seconds($day0 + 86400)")
        .head().getLong(0) == 24L)
      assert(spark.sql(
        s"SELECT count(*) FROM gdyn.ns.ev WHERE id < 1000 AND " +
          s"ts >= timestamp_seconds($day0 + 86400) AND " +
          s"ts < timestamp_seconds($day0 + 2 * 86400)")
        .head().getLong(0) == 0L)
      // ONE commit; untouched files carried by reference
      val vAfter = SnapshotTable.versions(spark, dir).last
      assert(vAfter == vBefore + 1)
      val entriesAfter = SnapshotTable.readManifest(spark, dir, vAfter)
        .entries.map(_.path).toSet
      assert(entriesBefore.intersect(entriesAfter).nonEmpty,
        "untouched-day files must carry by reference")
      // a NULL partition value names no partition: refuse
      intercept[Exception] {
        spark.sql("INSERT OVERWRITE gdyn.ns.ev " +
          "SELECT CAST(1 AS BIGINT), CAST(NULL AS TIMESTAMP)")
      }
      // identity partitions: only the batch's region replaces
      spark.sql("CREATE TABLE gdyn.ns.reg (id BIGINT, region STRING) " +
        "PARTITIONED BY (region)")
      spark.sql("INSERT INTO gdyn.ns.reg VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("INSERT OVERWRITE gdyn.ns.reg VALUES (20, 'b'), (21, 'b')")
      assert(spark.sql("SELECT id FROM gdyn.ns.reg ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L, 20L, 21L))
      // hours() granularity rides the same arithmetic: replace one hour
      spark.sql("CREATE TABLE gdyn.ns.hr (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (hours(ts))")
      spark.sql("INSERT INTO gdyn.ns.hr " +
        s"SELECT id, timestamp_seconds($day0 + id * 600) FROM range(0, 12)")
      // ids 0..5 in hour 0, 6..11 in hour 1; replace hour 1 only
      spark.sql("INSERT OVERWRITE gdyn.ns.hr " +
        s"SELECT CAST(100 AS BIGINT), timestamp_seconds($day0 + 3600)")
      assert(spark.sql("SELECT count(*) FROM gdyn.ns.hr").head().getLong(0) == 7L)
      assert(spark.sql("SELECT count(*) FROM gdyn.ns.hr WHERE id < 6")
        .head().getLong(0) == 6L)
      // multi-transform layouts: the batch's (day, region) TUPLES
      // replace; the same day's OTHER regions and other days carry
      spark.sql("CREATE TABLE gdyn.ns.multi (id BIGINT, ts TIMESTAMP, region STRING) " +
        "PARTITIONED BY (days(ts), region)")
      spark.sql("INSERT INTO gdyn.ns.multi VALUES " +
        s"(1, timestamp_seconds($day0), 'a'), " +
        s"(2, timestamp_seconds($day0 + 60), 'b'), " +
        s"(3, timestamp_seconds($day0 + 86400), 'a'), " +
        s"(4, timestamp_seconds($day0 + 86400 + 60), 'b')")
      val mDir = s"$root/ns/multi"
      val mBefore = SnapshotTable.versions(spark, mDir).last
      // backfill exactly the (day0, 'a') tuple
      spark.sql("INSERT OVERWRITE gdyn.ns.multi " +
        s"SELECT 10, timestamp_seconds($day0 + 120), 'a'")
      assert(spark.sql("SELECT id FROM gdyn.ns.multi ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 10L),
        "only the batch's (day, region) tuple may be replaced")
      // ONE commit = atomic replacement
      assert(SnapshotTable.versions(spark, mDir).last == mBefore + 1)
      // expectations gate the dynamic batch like every other write:
      // a violating backfill refuses the WHOLE commit, table untouched
      spark.sql("ALTER TABLE gdyn.ns.reg SET TBLPROPERTIES " +
        "('expect.pos' = 'id >= 0')")
      val regBefore = spark.sql("SELECT count(*) FROM gdyn.ns.reg")
        .head().getLong(0)
      val eExp = intercept[Exception] {
        spark.sql("INSERT OVERWRITE gdyn.ns.reg VALUES (CAST(-5 AS BIGINT), 'b')")
      }
      assert(eExp.getMessage.contains("expectation") ||
        Option(eExp.getCause).exists(_.getMessage.contains("expectation")))
      assert(spark.sql("SELECT count(*) FROM gdyn.ns.reg")
        .head().getLong(0) == regBefore,
        "a refused dynamic overwrite must publish nothing")
      // truncate/bucket transforms still refuse with a pointer
      spark.sql("CREATE TABLE gdyn.ns.trunc (id BIGINT, name STRING) " +
        "PARTITIONED BY (truncate(2, name))")
      spark.sql("INSERT INTO gdyn.ns.trunc VALUES (1, 'aaa')")
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE gdyn.ns.trunc VALUES (2, 'bbb')")
      }
      assert(e.getMessage.contains("REPLACE WHERE") ||
        Option(e.getCause).exists(_.getMessage.contains("REPLACE WHERE")))
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // static mode (the default) keeps truncate semantics
    spark.sql("INSERT OVERWRITE gdyn.ns.ev SELECT CAST(7 AS BIGINT), " +
      s"timestamp_seconds($day0)")
    assert(spark.sql("SELECT count(*) FROM gdyn.ns.ev").head().getLong(0) == 1L)
  }

  test("dynamic partition overwrite: boundaries follow the SESSION timezone (offset months, DST days)") {
    val root = java.nio.file.Files.createTempDirectory("snap_dyn_tz").toString
    spark.conf.set("spark.sql.catalog.gdtz",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdtz.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // Asia/Kolkata months(ts): local March runs 2026-02-28T18:30Z →
      // 2026-03-31T18:30Z. A UTC-pinned plusMonths(1) of the start
      // would end the range at Mar 29 04:00 LOCAL — files holding
      // Mar 29–31 rows would classify none-match and carry by
      // reference, DUPLICATING the batch's month.
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      spark.sql("CREATE TABLE gdtz.ns.m (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (months(ts))")
      // local-calendar rows: Feb 10, Mar 05, Mar 30 (the drift
      // victim), Apr 02 — each its own file so classification is
      // per-row observable
      Seq(1L -> 1770705000L, 2L -> 1772692200L,
          3L -> 1774852200L, 4L -> 1775111400L).foreach { case (id, ep) =>
        spark.sql(s"INSERT INTO gdtz.ns.m SELECT CAST($id AS BIGINT), " +
          s"timestamp_seconds($ep)")
      }
      // the batch touches only local March (Mar 10)
      spark.sql("INSERT OVERWRITE gdtz.ns.m SELECT CAST(100 AS BIGINT), " +
        "timestamp_seconds(1773124200)")
      assert(spark.sql("SELECT id FROM gdtz.ns.m ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 4L, 100L),
        "local-March rows (incl. Mar 30) must be replaced; Feb/Apr carry")

      // America/Denver days(ts) across spring-forward (2026-03-08 is
      // a 23-hour local day): a UTC-pinned plusDays(1) would extend
      // the range one hour into Mar 9 LOCAL — a file wholly inside
      // Mar 9 00:00–01:00 local would classify all-match and be
      // dropped with no replacement (silent data loss).
      spark.conf.set("spark.sql.session.timeZone", "America/Denver")
      spark.sql("CREATE TABLE gdtz.ns.d (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
      Seq(1L -> 1772910000L,  // Mar 7 local
          2L -> 1772992800L,  // Mar 8 local (the replaced day)
          3L -> 1773037800L   // Mar 9 00:30 local — the DST victim
      ).foreach { case (id, ep) =>
        spark.sql(s"INSERT INTO gdtz.ns.d SELECT CAST($id AS BIGINT), " +
          s"timestamp_seconds($ep)")
      }
      spark.sql("INSERT OVERWRITE gdtz.ns.d SELECT CAST(200 AS BIGINT), " +
        "timestamp_seconds(1772971200)") // Mar 8 06:00 local
      assert(spark.sql("SELECT id FROM gdtz.ns.d ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L, 200L),
        "only local Mar 8 replaces; the Mar 9 00:30 row must survive DST")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", tzBefore)
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table like the API merge — behind the table-property opt-in") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_mse").toString
    spark.conf.set("spark.sql.catalog.gmse",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmse.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val dir = s"$root/ns/t"
    spark.sql("CREATE TABLE gmse.ns.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gmse.ns.t SELECT id, concat('v', id) FROM range(0, 10)")
    val vBefore = SnapshotTable.versions(spark, dir).last
    Seq((5L, "upd", 50L), (100L, "new", 77L)).toDF("id", "v", "score")
      .createOrReplaceTempView("mse_src")
    // explicitly assigning the new column refuses at analysis — the
    // target has no such column and nothing opted into creating it
    intercept[Exception] {
      spark.sql(
        """MERGE INTO gmse.ns.t t USING mse_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET score = s.score""".stripMargin)
    }
    // the clause WITHOUT the table property must not reshape the
    // table: star expansion sticks to the target schema (Spark drops
    // the source extra) and the schema stays (id, v)
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gmse.ns.t t USING mse_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("gmse.ns.t").schema.fieldNames.toSeq == Seq("id", "v"),
      "the clause alone must not widen — the table has not opted in")
    // ... and the property WITHOUT the clause must not either (the
    // statement carries the user's intent; Delta/Iceberg gate the same
    // way)
    spark.sql("ALTER TABLE gmse.ns.t SET TBLPROPERTIES " +
      "('merge_schema_evolution' = 'true')")
    spark.sql(
      """MERGE INTO gmse.ns.t t USING mse_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("gmse.ns.t").schema.fieldNames.toSeq == Seq("id", "v"),
      "the property alone must not widen — the statement did not ask")
    // both opt-ins present: the widening commits first, then the MERGE
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gmse.ns.t t USING mse_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(
      "SELECT id, v, score FROM gmse.ns.t ORDER BY id").collect()
    assert(out.length == 11)
    assert(out.map(_.getLong(0)).toSeq == (0L to 9L) :+ 100L)
    // matched row updated with the new column; unmentioned rows carry
    // NULL in it; the not-matched row inserts it
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toMap
    assert(byId(5L) == (("upd", Long.box(50L))))
    assert(byId(100L) == (("new", Long.box(77L))))
    assert(byId(3L) == (("v3", null)))
    // time travel still reads the PRE-widening schema
    val old = spark.sql(s"SELECT * FROM gmse.ns.t VERSION AS OF $vBefore")
    assert(old.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(old.count() == 10L)
    // the widened column participates in stats-fed pruning like any
    // declared column: a post-evolution filter answers exactly
    assert(spark.sql("SELECT count(*) FROM gmse.ns.t WHERE score > 60")
      .head().getLong(0) == 1L)
    assert(spark.table("gmse.ns.t").filter(col("score").isNull).count() == 9L)
    // TYPE WIDENING through the same path: a source whose existing
    // column is wider (INT -> BIGINT) widens the table before merging
    spark.sql("CREATE TABLE gmse.ns.w (id BIGINT, n INT) " +
      "TBLPROPERTIES ('merge_schema_evolution' = 'true')")
    spark.sql("INSERT INTO gmse.ns.w SELECT id, CAST(id AS INT) FROM range(0, 5)")
    Seq((3L, 5000000000L)).toDF("id", "n").createOrReplaceTempView("mse_wide")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gmse.ns.w t USING mse_wide s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table("gmse.ns.w").schema("n").dataType ==
      org.apache.spark.sql.types.LongType,
      "the merge must widen INT n to BIGINT")
    assert(spark.sql("SELECT n FROM gmse.ns.w WHERE id = 3").head().getLong(0)
      == 5000000000L)
    assert(spark.sql("SELECT CAST(sum(n) AS BIGINT) FROM gmse.ns.w")
      .head().getLong(0) == 5000000007L)
  }

  test("graft_table_partitions answers SHOW PARTITIONS from the manifest alone — zero data I/O") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val root = java.nio.file.Files.createTempDirectory("snap_showpart").toString
    spark.conf.set("spark.sql.catalog.gsp",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsp.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    val day0 = 1700006400L // 2023-11-15 00:00:00 UTC
    spark.sql("CREATE TABLE gsp.ns.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    // day-batched ingestion: one INSERT per day -> day-aligned files
    (0 until 3).foreach { d =>
      spark.sql(s"INSERT INTO gsp.ns.ev SELECT id, " +
        s"timestamp_seconds($day0 + $d * 86400 + id * 60) FROM range(0, ${10 + d})")
    }
    val census = spark.sql(
      "SELECT * FROM graft_table_partitions('gsp.ns.ev') ORDER BY partition")
    // zero data I/O: the census is a LOCAL relation built from the
    // manifest — no file scan anywhere in the plan
    assert(census.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => true }.isDefined &&
      !census.queryExecution.executedPlan.toString.contains("FileScan") &&
      !census.queryExecution.executedPlan.toString.contains("BatchScan"),
      s"census must not scan data:\n${census.queryExecution.executedPlan}")
    val rows = census.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq == Seq(
      ("days(ts)=2023-11-15", 10L), ("days(ts)=2023-11-16", 11L),
      ("days(ts)=2023-11-17", 12L)), rows.mkString(", "))
    assert(rows.forall(_.getLong(1) >= 1L)) // n_files
    // a batch straddling two days is reported honestly, never guessed
    spark.sql("INSERT INTO gsp.ns.ev SELECT id, " +
      s"timestamp_seconds($day0 + 3 * 86400 - 60 + id * 120) FROM range(0, 4)")
    val withStraddle = spark.sql(
      "SELECT * FROM graft_table_partitions('gsp.ns.ev')").collect()
    assert(withStraddle.exists(r => r.isNullAt(0) && r.getLong(2) == 4L),
      s"straddling file must land under the NULL partition: " +
        withStraddle.mkString(", "))
    // multi-transform tuples render as a path; identity census exact
    spark.sql("CREATE TABLE gsp.ns.multi (id BIGINT, ts TIMESTAMP, region STRING) " +
      "PARTITIONED BY (days(ts), region)")
    Seq("a", "b").foreach { r =>
      spark.sql(s"INSERT INTO gsp.ns.multi SELECT id, " +
        s"timestamp_seconds($day0 + id * 60), '$r' FROM range(0, 5)")
    }
    val multi = spark.sql(
      "SELECT partition, n_rows FROM graft_table_partitions('gsp.ns.multi') " +
        "ORDER BY partition").collect()
    assert(multi.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("days(ts)=2023-11-15/region=a", 5L),
      ("days(ts)=2023-11-15/region=b", 5L)), multi.mkString(", "))
    // DATE partition columns census from their ISO-string stats
    spark.sql("CREATE TABLE gsp.ns.dt (id BIGINT, d DATE) " +
      "PARTITIONED BY (days(d))")
    Seq("2023-11-15", "2023-11-16").foreach { day =>
      spark.sql(s"INSERT INTO gsp.ns.dt SELECT id, DATE '$day' FROM range(0, 4)")
    }
    val dt = spark.sql(
      "SELECT partition, n_rows FROM graft_table_partitions('gsp.ns.dt') " +
        "ORDER BY partition").collect()
    assert(dt.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("days(d)=2023-11-15", 4L), ("days(d)=2023-11-16", 4L)),
      dt.mkString(", "))
    // months over DATE rides the same string-stat truncation
    spark.sql("CREATE TABLE gsp.ns.dm (id BIGINT, d DATE) " +
      "PARTITIONED BY (months(d))")
    spark.sql("INSERT INTO gsp.ns.dm SELECT id, DATE '2023-11-15' FROM range(0, 3)")
    val dm = spark.sql(
      "SELECT partition FROM graft_table_partitions('gsp.ns.dm')").collect()
    assert(dm.map(_.getString(0)).toSeq == Seq("months(d)=2023-11"), dm.mkString(", "))
    // bucket transforms census from the per-file __bucket stats
    spark.sql("CREATE TABLE gsp.ns.bk (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(2, id))")
    spark.sql("INSERT INTO gsp.ns.bk SELECT id, concat('v', id) FROM range(0, 100)")
    val bk = spark.sql(
      "SELECT partition, n_rows FROM graft_table_partitions('gsp.ns.bk') " +
        "ORDER BY partition").collect()
    assert(bk.map(_.getString(0)).toSeq == Seq("bucket(2,id)=0", "bucket(2,id)=1"),
      bk.mkString(", "))
    assert(bk.map(_.getLong(1)).sum == 100L)
    // an unpartitioned table refuses loudly
    spark.sql("CREATE TABLE gsp.ns.flat (id BIGINT)")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_partitions('gsp.ns.flat')").collect()
    }
  }

  test("SQL face odds and ends: SHOW CREATE TABLE tells the truth; TRUNCATE TABLE is metadata-only") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_odds").toString
    spark.conf.set("spark.sql.catalog.godds",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.godds.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE godds.ns.t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) " +
      "TBLPROPERTIES ('bloom_cols' = 'id')")
    // SHOW CREATE TABLE reproduces schema, partitioning, and props
    val ddl = spark.sql("SHOW CREATE TABLE godds.ns.t")
      .head().getString(0)
    assert(ddl.contains("days(ts)"), s"missing partitioning in:\n$ddl")
    assert(ddl.contains("bloom_cols"), s"missing props in:\n$ddl")
    assert(ddl.contains("id BIGINT") || ddl.contains("`id` BIGINT"),
      s"missing schema in:\n$ddl")
    // TRUNCATE TABLE: metadata-only sweep (SupportsDelete's contract),
    // one commit, time travel still reads the old census
    spark.sql("INSERT INTO godds.ns.t SELECT id, " +
      "timestamp_seconds(1700006400 + id * 3600) FROM range(0, 48)")
    val vBefore = SnapshotTable.versions(spark, s"$root/ns/t").last
    spark.sql("TRUNCATE TABLE godds.ns.t")
    assert(spark.sql("SELECT count(*) FROM godds.ns.t").head().getLong(0) == 0L)
    val vAfter = SnapshotTable.versions(spark, s"$root/ns/t").last
    assert(vAfter == vBefore + 1, s"one commit expected: $vBefore -> $vAfter")
    assert(spark.sql(s"SELECT count(*) FROM godds.ns.t VERSION AS OF $vBefore")
      .head().getLong(0) == 48L)
    // the table keeps working after the truncate
    spark.sql("INSERT INTO godds.ns.t SELECT CAST(7 AS BIGINT), " +
      "timestamp_seconds(1700006400)")
    assert(spark.sql("SELECT count(*) FROM godds.ns.t").head().getLong(0) == 1L)
  }

  test("layout guards: compact on bucketed tables is bucket-aware; bucket column rename/drop refuses") {
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("snap_guard").toString
    spark.conf.set("spark.sql.catalog.gguard",
      classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gguard.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    spark.sql("CREATE TABLE gguard.ns.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('bucket_cols' = 'id', 'bucket_n' = '4')")
    spark.sql("INSERT INTO gguard.ns.t SELECT id, concat('v', id) FROM range(0, 100)")
    // compact no longer refuses (r16): it merges WITHIN buckets and
    // keeps every file single-bucket — three inserts' 12 files shrink
    // to 4 without destroying the layout
    spark.sql("INSERT INTO gguard.ns.t SELECT id, concat('v', id) FROM range(100, 200)")
    spark.sql("INSERT INTO gguard.ns.t SELECT id, concat('v', id) FROM range(200, 300)")
    val gDir = s"$root/ns/t"
    val before = SnapshotTable.readManifest(spark, gDir,
      SnapshotTable.versions(spark, gDir).last).entries.count(_.rows > 0)
    spark.sql("CALL gguard.system.compact('ns.t')").collect()
    val mAfter = SnapshotTable.readManifest(spark, gDir,
      SnapshotTable.versions(spark, gDir).last)
    val liveAfter = mAfter.entries.filter(_.rows > 0)
    assert(liveAfter.size < before,
      s"bucket-aware compact must shrink the census: $before -> ${liveAfter.size}")
    assert(liveAfter.forall(_.stats.contains("__bucket:id:4")),
      "compacted files must keep single-valued __bucket stats")
    assert(spark.sql("SELECT count(*) FROM gguard.ns.t").head().getLong(0) == 300L)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gguard.ns.t RENAME COLUMN id TO id2")
    }
    assert(e2.getMessage.contains("bucket"))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gguard.ns.t DROP COLUMN id")
    }
    assert(e3.getMessage.contains("bucket"))
    // the guards left the table untouched and queryable
    assert(spark.sql("SELECT count(*) FROM gguard.ns.t").head().getLong(0) == 300L)
    // zorder keeps refusing too (unchanged posture)
    intercept[Exception] {
      spark.sql("CALL gguard.system.zorder('ns.t', 'id', 'v')").collect()
    }
  }

  test("readChangeFeed streams delete-vector commits as full before-image deletes") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_cdf_dv").toString
    val tbl = s"$base/tbl"
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), tbl)
    SnapshotTable.commitAppend(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), tbl)
    val filesBefore = SnapshotTable.files(spark, tbl, 2L).toSet
    // v3 = a positional DV delete: zero data files touched
    SnapshotTable.commitDeleteVectorsWhere(spark, tbl, col("id") % 2 === 0)
    assert(SnapshotTable.files(spark, tbl, 3L).toSet == filesBefore,
      "the DV delete must touch ZERO data files")
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(tbl)
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    def rows() = spark.read.parquet(s"$base/out").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[String]("_change"), r.getAs[Long]("_commit_version"))).toSet
    // unlike delete_key rows, DV deletes carry the full BEFORE-IMAGE
    assert(rows() == Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 1L), (4L, "d", "insert", 2L),
      (5L, "e", "insert", 2L),
      (2L, "b", "delete", 3L), (4L, "d", "delete", 3L)),
      s"DV commits must stream full before-image delete rows: ${rows()}")
    // resume drains only the new commits: an append + another vector
    SnapshotTable.commitAppend(Seq((6L, "f")).toDF("id", "v"), tbl)
    SnapshotTable.commitDeleteVectorsWhere(spark, tbl, col("id") === 5L)
    drain()
    val resumed = rows()
    assert(resumed.size == 9 &&
      Set((6L, "f", "insert", 4L), (5L, "e", "delete", 5L))
        .subsetOf(resumed),
      s"resume must emit exactly the new insert + before-image: $resumed")
    // the head read agrees with the accumulated feed: inserts minus deletes
    val live = SnapshotTable.read(spark, tbl).select("id")
      .as[Long].collect().toSet
    assert(live == Set(1L, 3L, 6L))
    // a plain (non-cdf) stream still refuses the vector commit range
    val boom = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot").load(tbl)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ck2")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(boom).contains("mor-delete"), msgs(boom))
  }

  test("ignoreDeletes and skipChangeCommits ride out maintenance commits") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_skip").toString
    val tbl = s"$base/tbl"
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), tbl)
    // v2 = equality MoR delete, v3 = DV delete, v4 = append — a plain
    // stream refuses the range; ignoreDeletes skips the delete-only
    // versions and still streams the append
    SnapshotTable.commitDeleteMoR(Seq(2L).toDF("id"), tbl, Seq("id"))
    SnapshotTable.commitDeleteVectorsWhere(spark, tbl, col("id") === 3L)
    SnapshotTable.commitAppend(Seq((4L, "d")).toDF("id", "v"), tbl)
    def drain(opts: Map[String, String], out: String, ck: String): Unit = {
      val r0 = spark.readStream.format("graft-snapshot")
      val r = opts.foldLeft(r0) { case (rd, (k, vv)) => rd.option(k, vv) }
      val q = r.load(tbl).writeStream.format("parquet")
        .option("path", s"$base/$out")
        .option("checkpointLocation", s"$base/$ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(Map("ignoreDeletes" -> "true"), "out1", "ck1")
    val got1 = spark.read.parquet(s"$base/out1").select("id")
      .as[Long].collect().toSet
    assert(got1 == Set(1L, 2L, 3L, 4L),
      s"ignoreDeletes streams every append, skips the deletes: $got1")
    // v5 = compaction (a rewriting commit): ignoreDeletes is NOT
    // enough (files were added) — skipChangeCommits rides over it
    // without re-sending the rewritten rows
    SnapshotTable.compactHead(spark, tbl, 1L << 20)
    SnapshotTable.commitAppend(Seq((5L, "e")).toDF("id", "v"), tbl)
    val boom = intercept[Exception] {
      drain(Map("ignoreDeletes" -> "true"), "out1", "ck1")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(boom).contains("skipChangeCommits"), msgs(boom))
    drain(Map("ignoreDeletes" -> "true", "skipChangeCommits" -> "true"),
      "out1", "ck1")
    val got2 = spark.read.parquet(s"$base/out1").select("id")
      .as[Long].collect().toSeq.sorted
    assert(got2 == Seq(1L, 2L, 3L, 4L, 5L),
      s"skipChangeCommits must skip the rewrite, stream the append: $got2")
    // cdf + skipChangeCommits: the compaction skips, the MoR deletes
    // still stream as change rows
    drain(Map("readChangeFeed" -> "true", "skipChangeCommits" -> "true"),
      "out2", "ck2")
    val ch = spark.read.parquet(s"$base/out2")
      .select("id", "_change").as[(Long, String)].collect().toSeq
    assert(ch.count(_._2 == "insert") == 5 &&
      ch.contains((2L, "delete_key")) && ch.contains((3L, "delete")) &&
      ch.size == 7,
      s"cdf + skipChangeCommits must keep the delete rows: $ch")
    // cdf + ignoreDeletes contradict — loud refusal
    val boom2 = intercept[Exception] {
      drain(Map("readChangeFeed" -> "true", "ignoreDeletes" -> "true"),
        "out3", "ck3")
    }
    assert(msgs(boom2).contains("contradict"), msgs(boom2))
  }

  test("startingTimestamp resolves to the first version committed at or after it") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_ts").toString
    val tbl = s"$base/tbl"
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("id", "v"), tbl)
    // commit stamps are millisecond-grained: space the commits so the
    // at-or-after resolution has distinct instants to bite on
    Thread.sleep(5)
    SnapshotTable.commitAppend(Seq((2L, "b")).toDF("id", "v"), tbl)
    val v2At = SnapshotTable.readManifest(spark, tbl, 2L).committedAtMs
    Thread.sleep(5)
    SnapshotTable.commitAppend(Seq((3L, "c")).toDF("id", "v"), tbl)
    def drain(opts: Map[String, String], tag: String): Set[Long] = {
      val r0 = spark.readStream.format("graft-snapshot")
      val r = opts.foldLeft(r0) { case (rd, (k, vv)) => rd.option(k, vv) }
      val q = r.load(tbl).writeStream.format("parquet")
        .option("path", s"$base/out_$tag")
        .option("checkpointLocation", s"$base/ck_$tag")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$base/out_$tag").select("id")
        .as[Long].collect().toSet
    }
    // at-or-after v2's stamp → v2 and v3 stream, v1 does not
    assert(drain(Map("startingTimestamp" -> v2At.toString), "ms") ==
      Set(2L, 3L))
    // ISO-8601 form of the same instant
    val iso = java.time.Instant.ofEpochMilli(v2At).toString
    assert(drain(Map("startingTimestamp" -> iso), "iso") == Set(2L, 3L))
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // a timestamp past the head refuses loudly
    val boom = intercept[Exception] {
      drain(Map("startingTimestamp" ->
        (System.currentTimeMillis() + 3600000L).toString), "future")
    }
    assert(msgs(boom).contains("at or after"), msgs(boom))
    // declaring the start twice refuses
    val boom2 = intercept[Exception] {
      drain(Map("startingTimestamp" -> v2At.toString,
        "startingVersion" -> "2"), "both")
    }
    assert(msgs(boom2).contains("mutually exclusive"), msgs(boom2))
  }

  test("maxVersionsPerTrigger/maxFilesPerTrigger bound backlog micro-batches") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("snap_rate").toString
    val tbl = s"$base/tbl"
    (1L to 4L).foreach(i =>
      SnapshotTable.commitAppend(Seq((i, s"v$i")).toDF("id", "v"), tbl))
    def drain(opts: Map[String, String], tag: String): Seq[Long] = {
      val r0 = spark.readStream.format("graft-snapshot")
      val r = opts.foldLeft(r0) { case (rd, (k, vv)) => rd.option(k, vv) }
      val q = r.load(tbl).writeStream.format("parquet")
        .option("path", s"$base/out_$tag")
        .option("checkpointLocation", s"$base/ck_$tag")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val batches = q.recentProgress.toSeq.map(_.numInputRows)
        .filter(_ > 0L)
      assert(spark.read.parquet(s"$base/out_$tag").count() == 4L,
        "every backlog row must drain regardless of the cap")
      batches
    }
    // uncapped: the whole 4-version backlog is ONE micro-batch
    assert(drain(Map.empty, "all") == Seq(4L))
    // one version per trigger: four micro-batches of one row each
    assert(drain(Map("maxVersionsPerTrigger" -> "1"), "v1") ==
      Seq(1L, 1L, 1L, 1L))
    // two files per trigger (each version wrote one file): two+two
    assert(drain(Map("maxFilesPerTrigger" -> "2"), "f2") == Seq(2L, 2L))
    // one byte per trigger: every version exceeds it alone, so each
    // batch carries exactly one version (progress guaranteed)
    assert(drain(Map("maxBytesPerTrigger" -> "1"), "b1") ==
      Seq(1L, 1L, 1L, 1L))
    // an invalid cap refuses loudly
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val boom = intercept[Exception] {
      drain(Map("maxVersionsPerTrigger" -> "0"), "bad")
    }
    assert(msgs(boom).contains(">= 1"), msgs(boom))
  }
}
