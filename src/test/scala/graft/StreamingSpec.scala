package graft

import java.nio.file.{Files, Paths}

import graft.sources.Sinks
import graft.streaming.IncrementalSync
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental mode: watermarked streaming aggregates agree with the
  * batch plan; the streaming contacts sync applies the same insert-only
  * merge as the batch path and is replay-idempotent (SURVEY §2.11).
  */
class StreamingSpec extends SparkSpec {

  test("windowedEventCounts matches the batch daily aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_id")).as[(java.sql.Timestamp, Long)]
      .collect().toSeq
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    stream.addData(events)
    val streamed = IncrementalSync.windowedEventCounts(
      stream.toDF().toDF("ts", "event_id"), "1 day", "1 day")
    val q = streamed.writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    q.processAllAvailable()
    // append mode only emits closed windows; advance the watermark past
    // everything with a late max-ts probe batch, then re-drain
    stream.addData(Seq((java.sql.Timestamp.from(
      events.map(_._1.toInstant).max(Ordering[java.time.Instant])
        .plus(java.time.Duration.ofDays(3))), -1L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wincounts")
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("dt"), col("tally"))
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("ts").isNotNull)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("dt"))
      .agg(count(col("event_id")).as("tally"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("staticEnrich: broadcast left-outer dim join, no stream-side shuffle") {
    import spark.implicits._
    val events = Seq((1L, 10L), (2L, 11L), (3L, 99L))
      .toDF("event_id", "user_id")
    val dim = Seq((10L, "BUILDING"), (11L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val out = IncrementalSync.staticEnrich(events, dim)
    assert(out.orderBy("event_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 10L, "BUILDING"), (2L, 11L, "MACHINERY"), (3L, 99L, "none")))
    // the dim join must be a broadcast hash join (the stream side
    // never shuffles) — the property that makes the op stateless and
    // append-safe on a real stream
    // string asserts: AQE's wrapper hides the join from node collect
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin, got:\n$plan")
    assert(!plan.contains("ShuffleExchange"),
      s"stream side must not shuffle:\n$plan")
  }

  test("dedupFirstArrival: one row per key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMin: Int) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = IncrementalSync.dedupFirstArrival(
      stream.toDF().toDF("id", "ts", "payload"),
      keyCols = Seq("id"), eventTimeCol = "ts", watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    // batch 1: id=1 twice (intra-batch dup) + id=2
    stream.addData(Seq((1L, ts(0), "first"), (1L, ts(1), "dup"), (2L, ts(0), "b")))
    q.processAllAvailable()
    // batch 2: id=1 again within the watermark -> still suppressed
    stream.addData(Seq((1L, ts(2), "late-dup"), (3L, ts(3), "c")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_stream").select("id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === "first", "the FIRST arrival survives, duplicates drop")
  }

  test("touchAttribution: interval join matches in-window touches, nulls after close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMin: Int) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    val touches = MemoryStream[(Long, java.sql.Timestamp, String)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = IncrementalSync.touchAttribution(
      purchases.toDF().toDF("user_id", "p_ts", "amount"),
      touches.toDF().toDF("t_user", "t_ts", "touch_type"),
      lookback = "30 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // user 1: touch at t+0 and t+5, purchase at t+20 (both in window);
    // user 2: purchase at t+20, no touch; user 3: touch at t+0 only
    touches.addData(Seq((1L, ts(0), "click"), (1L, ts(5), "view"), (3L, ts(0), "click")))
    purchases.addData(Seq((1L, ts(20), 9.99), (2L, ts(20), 5.0)))
    q.processAllAvailable()
    // push both watermarks far past every join window so the
    // unmatched left (user 2) is provably final and emits with nulls
    touches.addData(Seq((99L, ts(600), "probe")))
    purchases.addData(Seq((99L, ts(600), 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "touch_type")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set(
      (1L, Some("click")), (1L, Some("view")), // both in-window touches emit
      (2L, None)))                             // unmatched purchase, nulls
  }

  test("documentIngest: quality screens + content-hash dedup on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMin: Int) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    val good = "the quick brown fox is one of the good documents in this corpus"
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ingested = IncrementalSync.documentIngest(
      stream.toDF().toDF("doc_id", "text", "ingest_ts"),
      eventTimeCol = "ingest_ts", watermark = "10 minutes")
    val q = ingested.writeStream.format("memory").queryName("doc_ingest")
      .outputMode("append").start()
    // gibberish fails the gate; the exact dup of `good` dedups away
    stream.addData(Seq(
      (1L, good, ts(0)),
      (2L, "!!!! #### $$$$ %%%%", ts(0)), // punct screen
      (3L, good, ts(1)))) // exact dup, later arrival
    q.processAllAvailable()
    // cross-batch dup within the watermark also suppressed
    stream.addData(Seq((4L, good, ts(2)),
      (5L, "an entirely different and perfectly fine document about the sea", ts(3))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("doc_ingest").select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 5L),
      "first arrival survives; dups and gibberish drop")
  }

  test("segmentIngest: segment-granular dedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMin: Int) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ingested = IncrementalSync.segmentIngest(
      stream.toDF().toDF("doc_id", "text", "ingest_ts"),
      segTokens = 3, eventTimeCol = "ingest_ts", watermark = "10 minutes")
    val q = ingested.writeStream.format("memory").queryName("seg_ingest")
      .outputMode("append").start()
    stream.addData(Seq((1L, "a b c d e f", ts(0))))
    q.processAllAvailable()
    // doc 2 repeats doc 1's FIRST segment (cross-batch state hit) but
    // brings a novel second segment — only the novel span survives
    stream.addData(Seq((2L, "a b c x y z", ts(1))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("seg_ingest")
      .select("doc_id", "seg_idx", "seg_text")
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((1L, 0, "a b c"), (1L, 1, "d e f"), (2L, 1, "x y z")),
      "per-segment first arrival wins across micro-batches")
  }

  test("contactsSync: streaming merge is idempotent across replays") {
    val base = Files.createTempDirectory("graft_stream").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/target"
    def run(n: Int): Unit = {
      val q = IncrementalSync.contactsSync(
        spark, src, Schemas.contacts, target, s"$base/chk$n")
      q.awaitTermination()
    }
    // batch 1: the base contacts file
    Files.copy(Paths.get(s"${Fixtures.Dir}/qa_contacts.json"), Paths.get(s"$src/b1.json"))
    run(1)
    val after1 = spark.read.parquet(target).count()
    assert(after1 === 40)
    // batch 2: overlapping restated window (10 overlaps, 10 new ids)
    Files.copy(Paths.get(s"${Fixtures.Dir}/qa_contacts_restated.json"), Paths.get(s"$src/b2.json"))
    run(2)
    val after2 = spark.read.parquet(target)
    // insert-only: overlapped ids keep their original rows
    val expect = graft.operators.Maintenance.insertOnlyMerge(
      graft.operators.Shred.contacts(Fixtures.qaContacts(spark)),
      graft.operators.Shred.contacts(Fixtures.qaContactsRestated(spark)),
      Seq("contact_id"))
    assert(after2.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(after2).count() === 0)
    // replay the whole source from a fresh checkpoint: no changes
    run(3)
    val after3 = spark.read.parquet(target)
    assert(after3.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(after3).count() === 0)
  }

  test("same-checkpoint restart resumes exactly-once: earlier batches never re-read") {
    // contactsSync's replay test proves the MERGE is idempotent under
    // a FRESH checkpoint (re-reading is harmless there); this one
    // proves the checkpoint itself: a second query on the SAME
    // checkpoint must pick up only the new file — the plain append
    // sink would double batch 1's rows if the source re-read it.
    val base = Files.createTempDirectory("graft_ckpt").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val out = s"$base/out"; val ckpt = s"$base/chk"
    import spark.implicits._
    def start() = spark.readStream.schema("id LONG").json(src)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    Files.write(Paths.get(s"$src/b1.json"), "{\"id\":1}\n{\"id\":2}".getBytes)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    Files.write(Paths.get(s"$src/b2.json"), "{\"id\":3}".getBytes)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L),
      s"exactly-once resume must yield 1,2,3 — got ${got.toSeq}")
  }

  test("skewJoinSync: persisted Count-Min heat salts the FIRST post-restart batch") {
    val base = Files.createTempDirectory("graft_cm_restart").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    import spark.implicits._
    val dim = (1L to 10L).map(k => (k, s"seg$k")).toDF("user_id", "segment")
    def rows(n: Int, uid: Long, from: Int): String =
      (from until from + n).map(i => s"""{"event_id":$i,"user_id":$uid}""").mkString("\n")
    def start(ckpt: String, source: String) = {
      val stream = spark.readStream.schema("event_id LONG, user_id LONG").json(source)
      IncrementalSync.skewJoinSync(stream, dim, "user_id",
        s"$base/target-${ckpt.hashCode}", s"$base/$ckpt", hotMinRows = 40L)
    }
    // run 1: user 1 is hot (50 ≥ 40), user 2 cold (2)
    Files.write(Paths.get(s"$src/b1.json"),
      (rows(50, 1L, 0) + "\n" + rows(2, 2L, 100)).getBytes)
    val (q1, br1) = start("ckpt", src)
    q1.awaitTermination()
    assert(br1() == (50L, 2L), s"run 1 split must be (50 hot, 2 cold), got ${br1()}")
    // run 2, SAME checkpoint: user 1 sends only 5 events — far below
    // the threshold on their own; only the RESTORED sketch can know
    // they are hot, so hot=5 proves the persistence
    Files.write(Paths.get(s"$src/b2.json"),
      (rows(5, 1L, 200) + "\n" + rows(3, 2L, 300)).getBytes)
    val (q2, br2) = start("ckpt", src)
    q2.awaitTermination()
    assert(br2() == (5L, 3L),
      s"pre-restart heat must salt the first post-restart batch, got ${br2()}")
    // control: the SAME small batch under a fresh checkpoint (no
    // persisted sketch) routes everything cold — the restore above,
    // not batch-local counting, made user 1 hot
    val src2 = s"$base/src2"; Files.createDirectories(Paths.get(src2))
    Files.copy(Paths.get(s"$src/b2.json"), Paths.get(s"$src2/b2.json"))
    val (q3, br3) = start("ckpt-fresh", src2)
    q3.awaitTermination()
    assert(br3() == (0L, 8L), s"fresh sketch must route all cold, got ${br3()}")
    // and the answer stays the plain join regardless of routing
    val got = spark.read.parquet(s"$base/target-${"ckpt".hashCode}")
    assert(got.count() == 60L && got.filter(col("segment").isNull).isEmpty)
  }

  test("snapshotIngestWithSummary: a crash between commit and summary write reconciles on the next batch") {
    val base = Files.createTempDirectory("graft_snapsum").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    import spark.implicits._
    def run() = {
      val stream = spark.readStream.schema("id LONG, grp STRING").json(src)
      IncrementalSync.snapshotIngestWithSummary(
        stream, s"$base/tbl", s"$base/sum", "grp", s"$base/ckpt")
        .awaitTermination()
    }
    def summary(): Map[String, Long] = spark.read.parquet(s"$base/sum")
      .select("grp", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def asof(): Long = spark.read.parquet(s"$base/sum")
      .agg(max(col("_asof"))).head().getLong(0)
    Files.write(Paths.get(s"$src/b1.json"),
      """{"id":1,"grp":"a"}
        |{"id":2,"grp":"b"}""".stripMargin.getBytes)
    run()
    assert(summary() == Map("a" -> 1L, "b" -> 1L) && asof() == 1L)
    // simulate a crashed run that COMMITTED a version but died before
    // the summary write: the table advances out-of-band, summary lags
    graft.sources.SnapshotTable.commitStreamBatch(
      Seq((3L, "a")).toDF("id", "grp"), s"$base/tbl", batchId = 99L)
    assert(asof() == 1L, "summary must lag the out-of-band commit")
    // the next streamed batch reconciles BOTH its own rows and the lag
    Files.write(Paths.get(s"$src/b2.json"), """{"id":4,"grp":"b"}""".getBytes)
    run()
    assert(summary() == Map("a" -> 2L, "b" -> 2L),
      s"reconcile must fold the lagged version AND the new batch: ${summary()}")
    assert(asof() == graft.sources.SnapshotTable.versions(spark, s"$base/tbl").last)
  }

  test("sessionize: data-driven sessions close on gap, state per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, ms: Long) = IncrementalSync.UserEvent(u, new java.sql.Timestamp(ms))
    val stream = MemoryStream[IncrementalSync.UserEvent]
    // user 1: two sessions split by a 10s gap; user 2: one session
    stream.addData(Seq(
      ev(1, 1000), ev(1, 2000), ev(1, 3000),
      ev(1, 20000), ev(1, 21000),
      ev(2, 5000)))
    val q = IncrementalSync.sessionize(stream.toDS(), gapMs = 5000)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q.processAllAvailable()
    // next batch: another gap for user 1 closes the 20000-21000 session
    stream.addData(Seq(ev(1, 50000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .as[IncrementalSync.UserSession].collect().sortBy(s => (s.user_id, s.started_ms))
    assert(got.toSeq === Seq(
      IncrementalSync.UserSession(1, 3, 1000, 3000),
      IncrementalSync.UserSession(1, 2, 20000, 21000)))
  }

  test("sessionize: a cross-batch late event extends the interval, never corrupts it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, ms: Long) = IncrementalSync.UserEvent(u, new java.sql.Timestamp(ms))
    val stream = MemoryStream[IncrementalSync.UserEvent]
    stream.addData(Seq(ev(1, 1000)))
    val q = IncrementalSync.sessionize(stream.toDS(), gapMs = 2000)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // late 500 is within the gap of started_ms=1000 -> merges backwards;
    // 2800 is within the gap of last_ms=1000 -> extends forwards. The
    // old signed check dragged last_ms to 500 and then WRONGLY split at
    // 2800 (2800-500 > gap), emitting a session with last < started.
    stream.addData(Seq(ev(1, 500), ev(1, 2800)))
    q.processAllAvailable()
    // close it out
    stream.addData(Seq(ev(1, 50000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_sessions")
      .as[IncrementalSync.UserSession].collect().toSeq
    assert(got === Seq(IncrementalSync.UserSession(1, 3, 500, 2800)))
  }

  test("sessionize: a burst of stray late events rolls up to ONE session, not singletons") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, ms: Long) = IncrementalSync.UserEvent(u, new java.sql.Timestamp(ms))
    val stream = MemoryStream[IncrementalSync.UserEvent]
    // open session far in the future so the whole second batch is stray
    stream.addData(Seq(ev(1, 100000)))
    val q = IncrementalSync.sessionize(stream.toDS(), gapMs = 2000)
      .writeStream.format("memory").queryName("stray_sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // 1000/1500/2900 chain within gapMs of each other -> one 3-event
    // stray session; 9000 is > gap past 2900 -> its own stray session
    stream.addData(Seq(ev(1, 1000), ev(1, 1500), ev(1, 2900), ev(1, 9000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stray_sessions")
      .as[IncrementalSync.UserSession].collect().toSeq.sortBy(_.started_ms)
    assert(got === Seq(
      IncrementalSync.UserSession(1, 3, 1000, 2900),
      IncrementalSync.UserSession(1, 1, 9000, 9000)))
  }

  test("sessionizeFlush: trailing session flushes once the watermark passes last+gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, ms: Long) = IncrementalSync.UserEvent(u, new java.sql.Timestamp(ms))
    val stream = MemoryStream[IncrementalSync.UserEvent]
    stream.addData(Seq(ev(1, 1000), ev(1, 2000)))
    val q = IncrementalSync.sessionizeFlush(
      stream.toDS(), gapMs = 2000, watermark = "0 seconds")
      .writeStream.format("memory").queryName("flush_sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // user 1's session is still open: watermark (2000) has not passed
    // last_ms + gap, so nothing may emit yet
    assert(spark.table("flush_sessions").count() === 0)
    // another user's far-future event advances the watermark past user
    // 1's gap deadline; the engine's no-data batch fires the
    // EventTimeTimeout and the TRAILING session flushes — the NoTimeout
    // sessionizer would hold it in state forever
    stream.addData(Seq(ev(2, 100000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("flush_sessions")
      .as[IncrementalSync.UserSession].collect().toSeq
    assert(got === Seq(IncrementalSync.UserSession(1, 2, 1000, 2000)),
      "quiet user's trailing session emits; user 2's open session stays in state")
  }

  // the two in-box state store providers: the heap-backed default and
  // the RocksDB provider the driver rows run on (streamRow pins it) —
  // the eviction CONTRACT must hold identically on both
  private val stateProviders = Seq(
    "hdfs" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private def withStateProvider[T](providerClass: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key, "")
    spark.conf.set(key, providerClass)
    try body
    finally if (prev.isEmpty) spark.conf.unset(key) else spark.conf.set(key, prev)
  }

  for ((label, providerClass) <- stateProviders)
    test(s"dedup state EVICTS at the watermark ($label provider): beyond-bound dup re-emits") {
      withStateProvider(providerClass) {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        def ts(ms: Long) = new java.sql.Timestamp(ms)
        val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
        val deduped = IncrementalSync.dedupFirstArrival(
          stream.toDF().toDF("id", "ts", "payload"),
          keyCols = Seq("id"), eventTimeCol = "ts", watermark = "10 seconds")
        val q = deduped.writeStream.format("memory")
          .queryName(s"dedup_evict_$label")
          .outputMode("append").start()
        // batch 1: key 1's first arrival emits and registers state
        stream.addData(Seq((1L, ts(1000), "first")))
        q.processAllAvailable()
        // batch 2: the in-watermark duplicate still drops (state present),
        // and the far-future probe advances the watermark to 90 000 —
        // beyond key 1's state expiry (first_ts + delay = 11 000), so the
        // maintenance pass EVICTS it
        stream.addData(Seq((1L, ts(2000), "in-watermark-dup"), (2L, ts(100000), "probe")))
        q.processAllAvailable()
        // batch 3: key 1 arrives again, beyond the watermark bound: its
        // state is gone, so it RE-EMITS — this is the state-bound contract
        // (VERDICT r7 "What's missing" #2): dedup is exact only within the
        // watermark, and state does not grow with stream length. If state
        // were unbounded this row would be suppressed and the test fails.
        stream.addData(Seq((1L, ts(95000), "beyond-watermark-dup")))
        q.processAllAvailable()
        q.stop()
        val got = spark.table(s"dedup_evict_$label").select("payload").as[String]
          .collect().toSeq.sorted
        assert(got === Seq("beyond-watermark-dup", "first", "probe"),
          "in-watermark dup drops; beyond-watermark dup re-emits after eviction")
      }
    }

  test("RocksDB provider actually holds the state: rocksdb metrics report it") {
    withStateProvider(stateProviders.toMap.apply("rocksdb")) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
      val deduped = IncrementalSync.dedupFirstArrival(
        stream.toDF().toDF("id", "ts", "payload"),
        keyCols = Seq("id"), eventTimeCol = "ts", watermark = "1 hour")
      val q = deduped.writeStream.format("memory").queryName("dedup_rocks_metrics")
        .outputMode("append").start()
      stream.addData((1L to 200L).map(i => (i, ts(1000 + i), s"p$i")))
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      val op = progress.stateOperators.head
      assert(op.numRowsTotal === 200L, "all 200 keys must be in state")
      // the provider's own metrics prove WHERE the state lives: the
      // RocksDB provider reports its native-memory/SST footprint —
      // absent entirely on the heap-backed default
      val custom = op.customMetrics
      val rocksKeys = custom.keySet().toArray.map(_.toString).filter(_.startsWith("rocksdb"))
      assert(rocksKeys.nonEmpty, s"expected rocksdb* metrics, got ${custom.keySet()}")
      assert(custom.get("rocksdbPutCount").longValue() === 200L,
        "every state row must have been written through RocksDB")
      assert(custom.get("rocksdbTotalBytesWritten").longValue() > 0L,
        "state bytes must flow through RocksDB, not the JVM heap")
    }
  }

  test("stage sink: batch-numbered gzip JSON write then purge (S7/S9/S12)") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft_stage").toString + "/stage"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.writeJsonBatch(df, stage, "all_contacts", 1)
    Sinks.writeJsonBatch(df, stage, "all_contacts", 2)
    val files = new java.io.File(stage).listFiles().map(_.getName).sorted
    assert(files.toSeq === Seq("all_contacts_1.json", "all_contacts_2.json"))
    // gzip'd part files, readable back
    val back = spark.read.json(s"$stage/all_contacts_1.json")
    assert(back.count() === 2)
    assert(new java.io.File(s"$stage/all_contacts_1.json").listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    Sinks.purgeStage(spark, stage)
    assert(!new java.io.File(stage).exists())
  }

  test("overwriteAtomic survives read-from-target self-overwrite") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_swap").toString
    val dir = base + "/t"
    Sinks.overwriteAtomic(Seq(1L, 2L, 3L).toDF("v"), dir)
    // derive from the target and overwrite the same path
    val derived = spark.read.parquet(dir).withColumn("v", col("v") * 10)
    Sinks.overwriteAtomic(derived, dir)
    assert(spark.read.parquet(dir).select("v").collect().map(_.getLong(0)).sorted
      === Array(10L, 20L, 30L))
    // swap hygiene: the rename-aside dance leaves no .tmp-/.old- debris
    val siblings = new java.io.File(base).list().toSeq
    assert(siblings === Seq("t"),
      s"no tmp/old dirs may remain after a successful swap: $siblings")
  }

  test("streamRow: a checkpoint root reused across bench rows fails loudly (VERDICT r11 #3)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_ckpt_guard").toString
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String): Unit = SparkEntry.streamRow(spark) {
      val q = spark.readStream.schema(schema).parquet(s"$base/in")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run(s"$base/ckpt") // first use: legal
    // same root in a LATER row = the warm-checkpoint no-op min-of-2
    // must never time — the guard turns it into a loud failure
    val boom = intercept[IllegalStateException] { run(s"$base/ckpt") }
    assert(boom.getMessage.contains("warm-checkpoint"), boom.getMessage)
    // a fresh root in the next row stays legal (the violation list
    // was drained — one offense never poisons later rows)
    run(s"$base/ckpt2")
    // restart WITHIN one row invocation stays legal (the
    // restart-survival rows recover from their own checkpoint on
    // purpose)
    SparkEntry.streamRow(spark) {
      (1 to 2).foreach { _ =>
        val q = spark.readStream.schema(schema).parquet(s"$base/in")
          .writeStream.format("noop")
          .option("checkpointLocation", s"$base/ckpt3")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
    }
  }
}
