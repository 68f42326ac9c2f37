package graft.streaming

import graft.operators.Maintenance
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental mode for the pipeline (SURVEY §2.11): the reference
  * simulates late data by re-extracting a 16/30-day lookback window
  * and idempotently merging (D1-D3). In Spark that becomes Structured
  * Streaming: a file source watches the staging directory, watermarked
  * dedup bounds state, and foreachBatch applies the SAME batch merge
  * operators (Maintenance) the batch path uses — one merge
  * implementation, two drivers.
  *
  * Scale posture: state is bounded by the watermark (the streaming
  * analog of the reference's 30-day lookback); each micro-batch merge
  * shuffles on the merge key only. maxFilesPerTrigger bounds batch
  * size the way break_size bounded extraction windows.
  */
object IncrementalSync {

  /** Watermarked tumbling-window event counts: the streaming version
    * of the flagship daily-tally aggregate. Late events beyond the
    * watermark are dropped instead of reopening windows — the
    * watermark IS the lookback policy.
    */
  def windowedEventCounts(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("win"))
      .agg(count(col("event_id")).as("tally"))
      .select(col("win.start").as("window_start"), col("tally"))

  /** Streaming W1/W2: keep the first arrival per key, with state
    * bounded by the watermark (dropDuplicatesWithinWatermark) — the
    * streaming analog of the batch shred's dedup-to-1 window. An
    * unbounded dropDuplicates would grow state forever; bounding it by
    * event time IS the reference's lookback policy applied to state:
    * a duplicate arriving beyond the watermark is older than any
    * re-extraction window would reach.
    */
  def dedupFirstArrival(
      rows: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      watermark: String): DataFrame =
    rows
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gated streaming ingest — TextOps.corpusDriftCheck standing at
    * the door: each arriving micro-batch is measured against the
    * REFERENCE corpus (language + token-length-bucket TV distance);
    * a quiet batch appends to `targetDir`, a drifted one is diverted
    * WHOLE to `quarantineDir` with its batch id, per-metric TV values
    * and flags (the audit record an operator needs to triage — was it
    * the lang mixture or the lengths?). Nothing is dropped: quarantine
    * is a holding pen, not a deletion, and a false-positive batch can
    * be re-landed from it verbatim. The reference corpus is fixed by
    * the caller (the curated standing corpus), so the gate's verdicts
    * are deterministic per batch content — drifted data never poisons
    * the yardstick it is judged against — and its bounded histograms
    * are computed ONCE at stream start: per micro-batch the gate
    * costs two delta-sized aggregates, never a reference rescan.
    *
    * BOTH routes are EXACTLY-ONCE: target and quarantine are snapshot
    * tables and every landing goes through the `gate:batchId` stream
    * ledger, so a replayed micro-batch (foreachBatch is at-least-once
    * on restart) no-ops instead of landing twice — the sibling
    * snapshotIngest/retractionSync contract, closing the one
    * duplicate-on-replay hole this path had (ADVICE r11). Read the
    * routed rows back with SnapshotTable.read, not a bare parquet
    * scan. The quarantine verdict is re-derived deterministically on a
    * replay (fixed reference + same batch content ⇒ same route), so
    * one ledger per dir suffices.
    */
  def gatedDocumentIngest(
      docs: DataFrame,
      reference: DataFrame,
      targetDir: String,
      quarantineDir: String,
      checkpointDir: String,
      maxTvE6: Long = 300000L): StreamingQuery = {
    val refHists = graft.operators.TextOps.corpusHistograms(reference)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val verdict = graft.operators.TextOps
            .driftAgainst(batch.sparkSession, refHists, batch, maxTvE6)
            .collect() // 2 bounded metric rows
          if (verdict.exists(_.getBoolean(3))) {
            val tags = verdict.map(r =>
              s"${r.getString(0)}=${r.getLong(2)}${if (r.getBoolean(3)) "!" else ""}")
              .mkString(",")
            graft.sources.SnapshotTable.commitStreamBatch(
              batch.withColumn("_batch_id", lit(id))
                .withColumn("_drift", lit(tags)),
              quarantineDir, batchId = id, appId = "gate")
          } else {
            graft.sources.SnapshotTable.commitStreamBatch(
              batch, targetDir, batchId = id, appId = "gate")
          }
        }
        ()
      }
      .start()
  }

  /** Streaming training-data ingest: the batch text screens run
    * unchanged on a document stream (TextOps.qualityGate is a
    * stateless, codegen'd narrow map) and exact dedup becomes
    * first-arrival-wins on the 16-byte content hash with
    * watermark-bounded state — one screen + one dedup implementation,
    * batch and streaming drivers (same reuse story as contactsSync
    * reusing Maintenance). State holds hashes, never documents.
    */
  def documentIngest(
      docs: DataFrame,
      eventTimeCol: String,
      watermark: String): DataFrame =
    dedupFirstArrival(
      graft.operators.TextOps.qualityGate(docs)
        .withColumn("text_md5", md5(col("text").cast("binary"))),
      Seq("text_md5"), eventTimeCol, watermark)

  /** Streaming SEGMENT-level dedup — the span-granular ingest screen
    * (batch twin: TextOps.segmentDedup, same fixed-token-window
    * segmentation): each document explodes into k-token segments and
    * each segment's first arrival wins corpus-wide via
    * watermark-bounded state on the segment's 16-byte content hash.
    * Emits one row per SURVIVING segment (doc_id, seg_idx, seg_text);
    * consumers reassemble documents from surviving segments exactly
    * like the batch operator's co-located slice — reassembly is a
    * grouped sort over (doc_id, seg_idx), not streaming state. State
    * holds hashes, never segment text; which duplicate-segment OWNER
    * survives within one micro-batch is engine-arbitrary (same
    * contract as documentIngest), while cross-batch the earlier batch
    * always wins.
    */
  def segmentIngest(
      docs: DataFrame,
      segTokens: Int,
      eventTimeCol: String,
      watermark: String): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    val k = segTokens
    val seg = docs
      .withColumn("_toks", graft.operators.TextOps.tokens(col("text")))
      .where(size(col("_toks")) > 0)
      .select(col("doc_id"), col(eventTimeCol),
        posexplode(expr(
          s"transform(sequence(0, size(_toks) - 1, $k), " +
            s"j -> array_join(slice(_toks, j + 1, $k), ' '))")))
      .toDF("doc_id", eventTimeCol, "seg_idx", "seg_text")
      .withColumn("seg_md5", md5(col("seg_text").cast("binary")))
    dedupFirstArrival(seg, Seq("seg_md5"), eventTimeCol, watermark)
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class UserSession(user_id: Long, n_events: Long, started_ms: Long, last_ms: Long)

  /** Custom keyed state (flatMapGroupsWithState): per-user session
    * roll-up — the stateful primitive the built-in windowed aggregates
    * can't express (session length is data-driven, not clock-aligned).
    * A session closes when a LATER event for the same user arrives
    * more than gapMs after it (purely data-driven → deterministic and
    * replayable; a wall-clock ProcessingTimeTimeout would keep the
    * micro-batch engine spinning empty batches and make results
    * timing-dependent — production deployments that need trailing
    * sessions flushed add an EventTimeTimeout against the watermark).
    * State per key is one small struct: at 100 TB of events the store
    * holds |active users| entries, not |events|.
    */
  def sessionize(
      events: Dataset[UserEvent],
      gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserSession]) =>
          mergeUserEvents(user, rows, state, gapMs)
      }
  }

  /** The sessionizer's per-batch merge step, shared by the NoTimeout
    * and EventTimeTimeout drivers: fold this batch's events for one
    * user into the open-session state, emitting every session a LATER
    * event closes. Leaves the still-open session in `state`; the
    * caller decides how (or whether) it eventually flushes.
    */
  private def mergeUserEvents(
      user: Long,
      rows: Iterator[UserEvent],
      state: GroupState[UserSession],
      gapMs: Long): Iterator[UserSession] = {
    val sorted = rows.map(_.ts.getTime).toSeq.sorted
    var cur = state.getOption
    // batch-local roll-up of stray LATE events (older than the
    // open session's gap-extended window): their true session
    // already closed in an earlier batch (append mode can't
    // reopen emitted output), but a burst of strays within gapMs
    // of EACH OTHER is one session, not n_events singletons
    var stray: Option[UserSession] = None
    val closed = Seq.newBuilder[UserSession]
    sorted.foreach { t =>
      cur match {
        // within the session's gap-extended interval — including
        // a CROSS-BATCH late arrival (t < started_ms): extend the
        // interval on whichever side t falls. The old signed
        // check (t - last_ms <= gap) silently "merged" any late t
        // by dragging last_ms BACKWARDS, corrupting the interval
        // and splitting chronologically-contiguous sessions.
        case Some(s) if t >= s.started_ms - gapMs && t <= s.last_ms + gapMs =>
          cur = Some(s.copy(n_events = s.n_events + 1,
            started_ms = math.min(s.started_ms, t),
            last_ms = math.max(s.last_ms, t)))
        case Some(s) if t > s.last_ms + gapMs => // gap: close, start fresh
          closed += s
          cur = Some(UserSession(user, 1L, t, t))
        case Some(_) => // stray late event: accumulate (events
          // arrive sorted, so extending only moves last_ms
          // forward; strays never reach the open session's window
          // — every stray t < started_ms - gapMs, so even the
          // gap-extended stray session ends before started_ms)
          stray match {
            case Some(p) if t <= p.last_ms + gapMs =>
              stray = Some(p.copy(n_events = p.n_events + 1, last_ms = t))
            case other =>
              other.foreach(closed += _)
              stray = Some(UserSession(user, 1L, t, t))
          }
        case None =>
          cur = Some(UserSession(user, 1L, t, t))
      }
    }
    stray.foreach(closed += _)
    cur.foreach(state.update)
    closed.result().iterator
  }

  /** Sessionization with trailing-session flush (VERDICT r7 "Next
    * round" #4): same merge semantics as [[sessionize]], plus an
    * EventTimeTimeout against the watermark — once the watermark
    * passes an open session's `last_ms + gapMs`, no event that could
    * still extend it can arrive (it would be late), so the session is
    * provably closed and emits. A quiet user's final session therefore
    * flushes instead of sitting in state forever, and state is bounded
    * by |users active within one gap of the watermark|, not |users
    * ever seen| — the production posture at 100 TB of events.
    *
    * The timeout is re-armed on every state update at
    * `max(last_ms + gapMs + 1, watermark + 1)` — the engine rejects
    * timestamps at or below the current watermark, and a session whose
    * gap deadline is already behind the watermark should fire on the
    * very next batch.
    */
  def sessionizeFlush(
      events: Dataset[UserEvent],
      gapMs: Long,
      watermark: String): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val closed = mergeUserEvents(user, rows, state, gapMs)
            state.getOption.foreach { s =>
              state.setTimeoutTimestamp(
                math.max(s.last_ms + gapMs + 1, state.getCurrentWatermarkMs() + 1))
            }
            closed
          }
      }
  }

  /** Watermarked stream-stream interval join: the streaming twin of
    * the batch TemporalJoins work — every purchase joins the touches
    * (clicks/views) by the same user within `lookback` BEFORE it,
    * unmatched purchases emitting with nulls once their match window
    * provably closes. The event-time range condition is what makes
    * unbounded stream-stream state legal: each side's buffered rows
    * age out when the other side's watermark passes their join window,
    * so state is bounded by watermark + lookback, not by stream
    * length. A strict as-of (only the LATEST touch) needs a post-join
    * aggregate; this emits the full in-window candidate set and leaves
    * last-touch selection to the (batch) asofJoin over the sink, which
    * is the standard split of streaming collect vs. batch resolve.
    *
    * Column contract: purchases(user_id, p_ts, …), touches(t_user,
    * t_ts, …) — names disjoint, both sides event-timed.
    */
  def touchAttribution(
      purchases: DataFrame,
      touches: DataFrame,
      lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermark)
    val t = touches.withWatermark("t_ts", watermark)
    p.join(t,
      expr(s"user_id = t_user AND t_ts >= p_ts - INTERVAL $lookback AND t_ts <= p_ts"),
      "leftOuter")
  }

  /** Stream–static dimension enrichment — the stateless join shape of
    * a streaming ingest tagging each event with slowly-changing
    * reference data (the streaming face of J1's LEFT reconcile): a
    * BROADCAST left-outer join against the dim per micro-batch, so
    * the stream side never shuffles and no join state accrues — no
    * watermark needed, append-safe by construction. At scale the dim
    * is the small side by definition (reference tables), and Spark
    * re-broadcasts it per batch, picking up dim updates between
    * batches for free.
    */
  def staticEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"), "left_outer")
      .select(col("event_id"), col("user_id"),
        coalesce(col("c_mktsegment"), lit("none")).as("segment"))

  /** Streaming skew-aware enrichment join — the skew story the
    * stream–static family was missing: staticEnrich broadcasts the
    * dim (fine when it fits), but a dim too large to broadcast forces
    * a shuffled join where one hot stream key degenerates a task.
    * hybridSkewJoin's exact census can't help a stream (it re-counts
    * from zero; a key's heat accrues ACROSS micro-batches), so this
    * maintains the mergeable Count–Min sketch instead: each batch's
    * key counts fold into the cumulative sketch (merge = elementwise
    * add — the sketch is a linear projection), then the batch routes
    * through Skew.cmSkewJoin against the up-to-date estimates. The
    * ≥-true polarity means a key that has EVER crossed hotMinRows
    * salts from that batch on — no hot key is ever missed; a cold key
    * occasionally over-estimated just pays the salting tax. The
    * sketch is depth×width longs of driver state, CHECKPOINTED: each
    * batch's post-fold sketch is persisted as a 1-row parquet beside
    * the checkpoint (rename-aside overwrite — constant ~40 KB, the
    * per-day-HLL pattern), and a restarted query reloads it, so a key
    * that got hot before the restart salts from the FIRST post-restart
    * batch instead of re-accruing from zero. A replayed batch
    * (foreachBatch is at-least-once) whose fold was already persisted
    * is detected by batch id and NOT re-folded — the sketch sees every
    * batch exactly once; it may be a few batches AHEAD of a replayed
    * batch's original routing decision, which is ≥-true-safe (at most
    * extra salting, never a missed hot key, and the split stays
    * consistent across both join sides within the batch).
    * Returns the query plus a branch-row observer so callers (the
    * driver row, ops dashboards) can see both paths carrying rows.
    */
  def skewJoinSync(
      events: DataFrame,
      dim: DataFrame,
      key: String,
      targetDir: String,
      checkpointDir: String,
      hotMinRows: Long,
      saltFactor: Int = 4,
      depth: Int = 5,
      width: Int = 1024): (StreamingQuery, () => (Long, Long)) = {
    val sketchDir = s"$checkpointDir/_cm_sketch"
    // restore the persisted sketch (if any): the pre-restart heat
    val restored: Option[(Long, Array[Long])] = {
      val p = new org.apache.hadoop.fs.Path(sketchDir)
      val f = p.getFileSystem(events.sparkSession.sparkContext.hadoopConfiguration)
      if (!f.exists(p)) None
      else {
        val r = events.sparkSession.read.parquet(sketchDir)
          .select("batch_id", "sketch").head()
        Some((r.getLong(0), r.getSeq[Long](1).toArray))
      }
    }
    val sketch = new java.util.concurrent.atomic.AtomicReference(
      restored.map(_._2).getOrElse(new Array[Long](depth * width)))
    val lastFolded = new java.util.concurrent.atomic.AtomicLong(
      restored.map(_._1).getOrElse(-1L))
    val hotRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val coldRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        if (batchId > lastFolded.get()) {
          val cm = new graft.operators.Sketches.CountMin(depth, width)
          val delta = batch.select(col(key).cast("string"))
            .where(col(key).isNotNull)
            .as[String].select(cm.toColumn).head()
          // fold the WHOLE batch in before splitting, so a key crossing
          // the threshold inside this batch already salts this batch
          val next = sketch.get().clone()
          var i = 0
          while (i < next.length) { next(i) += delta(i); i += 1 }
          sketch.set(next)
          // persist post-fold: a restart resumes at this heat, and a
          // replay of THIS batch (id ≤ the persisted one) skips the fold
          graft.sources.Sinks.overwriteAtomic(
            Seq((batchId, next.toSeq)).toDF("batch_id", "sketch"), sketchDir)
          lastFolded.set(batchId)
        } // else: replayed batch — its counts are already in the sketch
        val merged = sketch.get()
        val out = graft.operators.Skew.cmSkewJoin(
          batch, dim, key, merged, depth, width, hotMinRows, saltFactor, "left")
        out.write.mode("append").parquet(targetDir)
        // branch observability (scoreboard + ops): ONE bounded agg job
        // per batch (r16: was two separate counts, each re-reading the
        // micro-batch); drop it where batch latency is precious
        val est = call_function("cm_estimate",
          lit(merged), col(key).cast("string"), lit(depth), lit(width))
        val nh = batch.agg(count(lit(1)).as("n"),
          count(when(col(key).isNotNull && est >= hotMinRows, 1)).as("h")).head()
        val (n, h) = (nh.getLong(0), nh.getLong(1))
        hotRows.addAndGet(h)
        coldRows.addAndGet(n - h)
        ()
      }
      .start()
    (q, () => (hotRows.get(), coldRows.get()))
  }

  /** Streaming incremental corpus dedup off the persisted MinHash
    * band index — the lifecycle the batch `minhash_index_delta` row
    * exercises once, run CONTINUOUSLY: each arriving document batch
    * (a) dedups against everything ingested before it via the
    * standing index (Similarity.minhashNearDupFromIndex — the corpus
    * is never re-shingled), (b) dedups within itself (batch-local
    * banded pairs, smaller doc_id wins), and (c) appends itself to
    * the index so every later batch sees it. Ingested docs are
    * appended EVEN IF flagged duplicate: the index is a discovery
    * structure, and indexing dups keeps the drop rule non-recursive —
    * "d is a duplicate iff some earlier-ingested document is near-dup
    * with d" — which is exactly replayable by a batch oracle (no
    * greedy survivor chain to simulate). Output: one (doc_id, is_dup)
    * row per ingested doc.
    *
    * Caveat, stated: the index append inside foreachBatch is
    * append-mode parquet — exactly-once only under AvailableNow on a
    * reliable source; a production retry-safe variant versions the
    * append by batchId (the writeJsonBatch pattern) and skips
    * already-committed ids.
    */
  def corpusDedupSync(
      docs: DataFrame,
      indexDir: String,
      targetDir: String,
      checkpointDir: String): StreamingQuery = {
    // the signature params are the index's frozen identity (meta is
    // written once at build, never rewritten) — read them once and
    // carry them across micro-batches in the sink's own state
    var params: (Int, Int) = null
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.operators.Similarity
        val b = batch.persist() // two consumers: id list + shingling
        // shingling + signing is the CPU-dominant per-doc work, and the
        // batch has THREE shingle consumers (index probe, within-batch
        // dedup, index append) — compute the shingle frame ONCE and the
        // banded-signature frame ONCE (guide §1.2: don't compute things
        // twice; signing is 64 hash passes over every shingle and all
        // three consumers re-ran it); both caches are batch-sized and
        // freed before the next micro-batch
        val bsh = Similarity.shingleFrame(b).persist()
        val s = b.sparkSession
        val indexed = graft.sources.Sinks.exists(s"$indexDir/meta")
        // sign at the index's OWN params (both probe and append must);
        // a fresh index is built at the defaults the within-dedup uses
        val (nh, nb) =
          if (indexed) {
            if (params == null) {
              val m = s.read.parquet(s"$indexDir/meta").head()
              params = (m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"))
            }
            params
          } else (64, 16)
        val keys = Similarity.bandKeyFrame(bsh, nh, nb).persist()
        try {
          val vsIndex =
            if (indexed)
              Similarity.minhashNearDupFromIndexKeyed(bsh, keys, indexDir)
                .select(col("doc_b").as("doc_id"))
            else s.emptyDataFrame
              .withColumn("doc_id", lit(0L)).limit(0)
          // the within-batch dedup is CONTRACTUALLY at (64, 16); reuse
          // the shared signed frame only when the index params agree
          // (always true for an index this loop itself built)
          val within =
            (if ((nh, nb) == (64, 16))
               Similarity.minhashNearDupKeyed(bsh, keys)
             else Similarity.minhashNearDupShingled(bsh))
              .select(col("doc_b").as("doc_id"))
          val dups = vsIndex.unionByName(within).distinct()
            .withColumn("_d", lit(1))
          b.select("doc_id")
            .join(dups, Seq("doc_id"), "left")
            .select(col("doc_id"), col("_d").isNotNull.as("is_dup"))
            .write.mode("append").parquet(targetDir)
          if (indexed)
            Similarity.appendToMinhashIndexKeyed(bsh, keys, indexDir)
          else {
            // the build's front half (shingling) is already cached —
            // write it and derive bands from the SAME frames instead of
            // re-shingling the whole batch through buildMinhashIndex
            bsh.write.mode("overwrite").parquet(s"$indexDir/shingles")
            Similarity.buildMinhashIndexFromShingles(bsh, indexDir, nh, nb)
          }
        } finally { keys.unpersist(); bsh.unpersist(); b.unpersist(); () }
      }
      .start()
  }

  /** Streaming maintenance of the quantized-frequency quantile
    * sketches (Sketches.quantileMaintenance's per-day table): each
    * micro-batch's (dt, bucket) counts merge into the persisted
    * sketch by ADDING counts. The sketch merges EXACTLY (counts are
    * additive; all error is the build-time 1/scale quantization), so
    * a streaming-maintained table is BIT-IDENTICAL to a batch rebuild
    * over the same rows — the driver row's oracle states batch truth
    * and the stream must hash-match it. No state store at all: the
    * "state" is the KB-sized sketch table itself, reread and
    * atomically rewritten per micro-batch (the additive-aggregate
    * twin of contactsSync's merge posture), so arbitrarily many days
    * of history cost O(sketch), not O(events).
    */
  def quantileSync(
      events: DataFrame,
      sketchDir: String,
      checkpointDir: String,
      scale: Int = 100): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val add = graft.operators.Sketches.quantileBuckets(batch, scale)
        val cur = graft.sources.Sinks.readOr(s, sketchDir, add.limit(0))
        val merged = cur.unionByName(add)
          .groupBy("dt", "bucket").agg(sum(col("n")).as("n"))
        graft.sources.Sinks.overwriteAtomic(merged, sketchDir)
        ()
      }
      .start()

  /** Streaming ANN ingest: the corpusDedupSync posture applied to the
    * vector side. The FIRST embedding batch builds the PQ index (fits
    * the codebooks — from then on they are the index's frozen
    * identity); every subsequent batch encodes at those persisted
    * codebooks and appends its code rows (appendToPqIndex). Encoding
    * is a pure function of (vector, codebooks), so the streamed index
    * is row-identical to a one-pass encode of the full corpus at the
    * first batch's codebooks — the stream_pq_ingest row states that
    * parity through the cold query path. Per-batch cost is one narrow
    * encode map over the batch plus kilobytes of codebook IO; the
    * standing corpus is never re-read.
    */
  def pqIngestSync(
      vecs: DataFrame,
      indexDir: String,
      checkpointDir: String,
      numSub: Int = 16,
      ncodes: Int = 32): StreamingQuery = {
    // the codebooks are the index's frozen identity — load them once
    // and carry them across micro-batches in the sink's own state
    // instead of re-reading + collecting kilobytes per batch (pure
    // driver/job overhead at micro-batch sizes; a replay re-reads the
    // same immutable values, so the carry cannot go stale)
    var cbs: Seq[Seq[Seq[Double]]] = null
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (graft.sources.Sinks.exists(s"$indexDir/codebooks")) {
          // append derives the geometry from the persisted codebooks
          if (cbs == null)
            cbs = graft.operators.Similarity.loadCodebooks(
              batch.sparkSession, indexDir)
          graft.operators.Similarity.appendToPqIndexAt(batch, indexDir, cbs)
        } else
          graft.operators.Similarity.buildPqIndex(batch, indexDir,
            numSub = numSub, ncodes = ncodes)
        ()
      }
      .start()
  }

  /** Streaming staged-contacts sync: watch `srcDir` for new JSON
    * batches, shred each micro-batch, and insert-only-merge it into
    * the parquet target (J2 semantics — replays and overlapping
    * re-extractions are no-ops on matched keys). The target read
    * happens inside foreachBatch so each batch merges against the
    * CURRENT target state; the write lands via tmp-dir swap in
    * Sinks.overwriteAtomic.
    */
  def contactsSync(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      targetDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 4): StreamingQuery = {
    val raw = spark.readStream
      .option("multiLine", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .json(srcDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val shredded = graft.operators.Shred.contacts(batch)
        val target = graft.sources.Sinks.readOr(s, targetDir, shredded.limit(0))
        val merged = Maintenance.insertOnlyMerge(target, shredded, Seq("contact_id"))
        graft.sources.Sinks.overwriteAtomic(merged, targetDir)
        ()
      }
      .start()
  }

  /** Stream → snapshot table: every micro-batch lands as ONE atomic
    * versioned commit keyed by its batch id
    * (SnapshotTable.commitStreamBatch), so the at-least-once
    * foreachBatch contract becomes exactly-once appends — a replayed
    * batch finds its id in the version ledger and no-ops. Contrast
    * with contactsSync above, which gets idempotency from the MERGE
    * algebra; here the TABLE provides it, and downstream readers get
    * time travel over the ingest history for free.
    */
  def snapshotIngest(
      stream: DataFrame,
      tableDir: String,
      checkpointDir: String,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      appId: String = ""): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.SnapshotTable.commitStreamBatch(batch, tableDir, id,
          statsCols = statsCols, bloomCols = bloomCols, appId = appId)
        ()
      }
      .start()

  /** Stream of RETRACTIONS → snapshot table: each micro-batch of
    * doomed keys commits as one zero-data-file merge-on-read delete
    * through the multi-writer stream ledger (exactly-once: replays
    * no-op before writing anything), so a forget-me/takedown feed
    * retracts from a 100 TB table at delta cost while ingest streams
    * keep writing — sequence scoping guarantees a key RE-INSERTED
    * after its retraction batch survives. Empty batches skip (nothing
    * to retract; skipping is idempotent). `applyDeletes` folds the
    * accumulated deletes on the maintenance schedule. */
  def retractionSync(
      keyStream: DataFrame,
      tableDir: String,
      keyCols: Seq[String],
      checkpointDir: String,
      appId: String = "retract"): StreamingQuery =
    keyStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          graft.sources.SnapshotTable.commitStreamDeleteMoR(
            batch, tableDir, keyCols, id, appId)
        ()
      }
      .start()

  /** Stream of UPSERTS → snapshot table, merge-on-read: each
    * micro-batch commits its rows PLUS an equality delete of exactly
    * its keys as ONE atomic version
    * (SnapshotTable.commitStreamUpsertMoR) — the CDC-upsert shape at
    * scale: zero pre-existing data files touched per epoch (a
    * per-epoch COW merge rewrites every file the batch's scattered
    * keys hit; contactsSync above even rewrites the whole target —
    * fine for its small parity table, wrong at 100 TB), sequence
    * scoping supersedes prior images of the keys while the batch's
    * own rows survive, and the stream ledger makes replays no-op.
    * Reads pay one delta-sized anti join per unfolded epoch;
    * `applyDeletes` folds on the maintenance schedule. Batches must
    * be unique per key (latest-wins dedup is the caller's call). */
  def upsertSync(
      stream: DataFrame,
      tableDir: String,
      keyCols: Seq[String],
      checkpointDir: String,
      appId: String = "upsert",
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.SnapshotTable.commitStreamUpsertMoR(
          batch, tableDir, keyCols, id, appId,
          statsCols = statsCols, bloomCols = bloomCols)
        ()
      }
      .start()

  /** Streaming ingest into the snapshot table WITH an exactly-once
    * incrementally-maintained summary — the snapshot_ivm CDC loop run
    * CONTINUOUSLY: each micro-batch (a) commits itself as a version
    * through the batch-id ledger (replays no-op) and (b) reconciles
    * the summary to the table's HEAD via CDC. The summary carries the
    * version it answers for (`_asof`, a constant column riding every
    * row, rewritten rename-aside-atomically WITH the content), and
    * maintenance applies changesBetween(_asof, head) — the
    * zero-compute file diff for this append-only history — through
    * one signed mergeAdditive. Cursor-reconcile, not per-batch
    * bookkeeping, is what makes the pair exactly-once under
    * at-least-once foreachBatch: a crash between commit and summary
    * write leaves the summary one version behind and the NEXT batch's
    * reconcile catches it up (any out-of-band batch commit is picked
    * up the same way); a replayed batch finds ledger and cursor
    * already advanced and no-ops both. Reads are delta-sized only —
    * the change files plus the old kilobyte summary, never a table
    * rescan.
    */
  def snapshotIngestWithSummary(
      stream: DataFrame,
      tableDir: String,
      summaryDir: String,
      groupCol: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        import graft.sources.SnapshotTable
        SnapshotTable.commitStreamBatch(batch, tableDir, id)
        val head = SnapshotTable.versions(s, tableDir).last
        val sumPath = new org.apache.hadoop.fs.Path(summaryDir)
        val fsys = sumPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val cur: Option[Long] =
          if (!fsys.exists(sumPath)) None
          else Some(s.read.parquet(summaryDir)
            .agg(max(col("_asof"))).head().getLong(0))
        if (cur.forall(_ < head)) {
          val next = cur match {
            case None =>
              SnapshotTable.read(s, tableDir, Some(head))
                .groupBy(groupCol).agg(count(lit(1)).as("cnt"))
            case Some(c) =>
              val delta = SnapshotTable.changesBetween(s, tableDir, c, head)
                .groupBy(groupCol)
                .agg(sum(when(col("_change") === "insert", 1L)
                  .otherwise(-1L)).as("cnt"))
              graft.operators.Incremental.mergeAdditive(
                s.read.parquet(summaryDir).drop("_asof"), delta,
                Seq(groupCol), Seq("cnt")).filter(col("cnt") =!= 0)
          }
          graft.sources.Sinks.overwriteAtomic(
            next.withColumn("_asof", lit(head)), summaryDir)
        }
        ()
      }
      .start()

  /** Streaming ingest into R WITH an exactly-once incrementally
    * maintained materialized JOIN M = R ⋈ₖ S —
    * `Incremental.snapshotJoinDelta`'s rules run CONTINUOUSLY: each
    * micro-batch (a) commits itself to R through the batch-id ledger
    * (replays no-op) and (b) reconciles M to BOTH tables' heads,
    * reading only the two deltas plus key-bounded base slices
    * (`readMatching`). M is itself a snapshot table and — the bases
    * being append-only — APPEND-ONLY too: a refresh commits ΔM, an
    * O(Δ) write at any |M|, never a rewrite of the materialization.
    *
    * The cursor lives in M's OWN multi-writer stream ledger: each ΔM
    * commits under appId "ivm" with the TARGET (rHead, sHead) encoded
    * as its batch id, so cursor recovery is one head-manifest read
    * (the max committed key), a replayed reconcile no-ops through the
    * ordinary ledger check, and — because the ledger entry and the ΔM
    * rows land in the SAME manifest publish — there is no crash
    * window between "delta written" and "cursor advanced" at all. S
    * advancing out-of-band between batches is caught up the same way
    * (the cursor compares against S's head, not this stream's
    * history). */
  def snapshotIngestWithJoin(
      stream: DataFrame,
      rDir: String,
      sDir: String,
      key: String,
      joinDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        import graft.sources.SnapshotTable
        SnapshotTable.commitStreamBatch(batch, rDir, id)
        val rHead = SnapshotTable.versions(s, rDir).last
        val sHead = SnapshotTable.versions(s, sDir).last
        require(sHead < 1000000L && rHead < 9000000000000L,
          "cursor encoding caps: sHead < 1e6, rHead < 9e12")
        // O(1) cursor: the writer's HIGHEST committed id decodes to
        // the (rHead, sHead) the join table has caught up to —
        // materializing the key set would be O(commits)
        val cur: Option[(Long, Long)] = SnapshotTable
          .maxCommittedStreamId(s, joinDir, "ivm")
          .map(b => (b / 1000000L, b % 1000000L))
        val enc = rHead * 1000000L + sHead
        cur match {
          case None =>
            SnapshotTable.commitStreamBatch(
              SnapshotTable.read(s, rDir, Some(rHead))
                .join(SnapshotTable.read(s, sDir, Some(sHead)), key),
              joinDir, batchId = enc, appId = "ivm")
          case Some((r0, s0)) if r0 < rHead || s0 < sHead =>
            graft.operators.Incremental.snapshotJoinDelta(
              s, rDir, sDir, key, r0, s0, rHead, sHead).foreach { dM =>
              SnapshotTable.commitStreamBatch(
                dM, joinDir, batchId = enc, appId = "ivm")
            }
          case _ => () // cursor already at both heads
        }
        ()
      }
      .start()
}
