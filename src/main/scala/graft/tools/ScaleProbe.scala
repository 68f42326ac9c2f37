package graft.tools

import graft.{Sessions, Tables}
import graft.operators.{BloomJoin, Linkage, Queries, Similarity, Skew}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume stress for the heavy candidate-generating families
  * (VERDICT r8 #1): every 100 TB claim in the codebase was
  * plan-audited — bucketed candidates, bounded state, pruned
  * listings — but never RUN above sf0.1. This probe executes the
  * heaviest operators (the r8 dedup/similarity/sessionize six, plus
  * the r9 join/index trio: hybrid skew join with an N×-growing hot
  * key, bloom-index cold semi join, IVF-index cold top-k) on a
  * factor-N corpus synthesized from a real sf
  * dir and records, per run: wall seconds, peak per-task shuffle
  * read/write bytes, peak per-task input bytes, and peak per-task
  * shuffle records. A hot bucket (shingle-prefix skew, KMeans cell
  * imbalance, session-user blowup) lands in ONE task, so the per-task
  * peaks are exactly the degeneration signal plan asserts can't see.
  * Each op also runs at factor 1 in the same JVM so super-linearity
  * is a measured ratio, not a guess.
  *
  * Scaling preserves the planted phenomena instead of manufacturing
  * new ones:
  * - documents: replica k suffixes every TOKEN with "_k" — a token
  *   bijection maps shingle sets bijectively, so every within-replica
  *   Jaccard/containment relation (including the corpus' real
  *   near-dup pairs) is preserved EXACTLY, while cross-replica
  *   similarity drops to ~0. N× docs, same phenomenon density —
  *   not N² trivial self-pairs.
  * - embeddings: replica k circularly shifts the vector by k
  *   coordinates — within-replica cosines are preserved exactly
  *   (both sides shifted), cross-replica pairs decorrelate.
  * - events: replica k is a fresh user population (salted user_id),
  *   same per-user session structure.
  * - customer keys: salted ids + per-replica names (distinct md5
  *   keys), typo twins replanted at the row's own density.
  *
  * Not part of the driver contract — run with
  *   sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 10"
  * under the default capped driver (build.sbt SPARK_DRIVER_MEM, 8g).
  */
object ScaleProbe {

  private final class PeakListener extends SparkListener {
    @volatile var peakShufRead = 0L
    @volatile var peakShufWrite = 0L
    @volatile var peakInput = 0L
    @volatile var peakShufRecords = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        peakShufRead = math.max(peakShufRead, m.shuffleReadMetrics.totalBytesRead)
        peakShufWrite = math.max(peakShufWrite, m.shuffleWriteMetrics.bytesWritten)
        peakInput = math.max(peakInput, m.inputMetrics.bytesRead)
        peakShufRecords = math.max(peakShufRecords, m.shuffleReadMetrics.recordsRead)
      }
    }
    def reset(): Unit = { peakShufRead = 0; peakShufWrite = 0; peakInput = 0; peakShufRecords = 0 }
  }

  /** Replica index column 0..factor-1, map-only (explode, no join). */
  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("k", explode(sequence(lit(0), lit(factor - 1))))

  private def scaleDocs(docs: DataFrame, factor: Int): DataFrame =
    replicate(docs.select("doc_id", "text"), factor)
      .select(
        (col("doc_id") + col("k") * 10000000L).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(concat_ws(" ",
            transform(split(col("text"), "\\s+"),
              t => concat(t, lit("_"), col("k"))))).as("text"))

  private def scaleEmb(emb: DataFrame, factor: Int): DataFrame =
    replicate(emb.select("vec_id", "embedding"), factor)
      .select(
        (col("vec_id") + col("k") * 10000000L).as("vec_id"),
        expr("concat(slice(embedding, k + 1, size(embedding) - k), " +
          "slice(embedding, 1, k))").as("embedding"))

  private def scaleEvents(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit =
    replicate(spark.read.parquet(s"$sfDir/events.parquet"), factor)
      .select(
        (col("event_id") + col("k") * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

  /** The record_linkage row's planted corpus at N×: md5-derived keys
    * over salted names, typo twins at the same ~1/97 density. */
  private def linkageRecords(cust: DataFrame, factor: Int): DataFrame = {
    val base = replicate(cust.select("c_custkey", "c_name"), factor)
      .select(
        (col("c_custkey").cast("long") + col("k") * 10000000L).as("rec_id"),
        md5(concat(col("c_name"), lit("_"), col("k"))).as("rec_key"))
    val twins = base.filter(col("rec_id") % 97 === 0).select(
      (col("rec_id") + 1000000000L).as("rec_id"),
      concat(substring(col("rec_key"), 1, 4), lit("z"),
        substring(col("rec_key"), 6, 15), lit("z"),
        substring(col("rec_key"), 22, 11)).as("rec_key"))
    base.unionByName(twins)
  }

  /** The edit_distance_join row's corpus at N×: each replica carries
    * an 8-char md5 tag PREFIX — a shared prefix preserves every
    * within-replica edit distance exactly (the name-digit edits are
    * untouched), while cross-replica pairs differ in ≥7 of the 8 tag
    * chars, so no cross-replica pair can enter ed ≤ 1 and output
    * scales N×, not N². Char-deleted twins replanted per replica at
    * the row's own 1/89 density (the deleted char sits in the NAME
    * digits, after the tag).
    */
  private def edNames(cust: DataFrame, f: Int): DataFrame = {
    val base = replicate(cust.select("c_custkey", "c_name"), f)
      .select(
        (col("c_custkey").cast("long") + col("k") * 10000000L).as("rec_id"),
        concat(substring(md5(col("k").cast("string")), 1, 8), lit("_"),
          col("c_name")).as("rec_name"))
    val twins = base.filter(col("rec_id") % 89 === 0).select(
      (col("rec_id") + 1000000000L).as("rec_id"),
      concat(substring(col("rec_name"), 1, 18),
        substring(col("rec_name"), 20, 9)).as("rec_name"))
    base.unionByName(twins)
  }

  /** The skew_hybrid_join row's corpus at N×: replica k is a fresh
    * user population (same salt as scaleEvents), and the `user_id %
    * 10 < 3` → key 1 mapping survives salting (the salt is a multiple
    * of 10), so the SINGLE hot key absorbs ~30% of ALL replicas —
    * the hot key's row count grows N× while the tail stays per-replica
    * uniform. That is the adversarial direction for a skew join:
    * scaling makes the skew worse, not just the volume bigger.
    */
  private def skewBig(spark: SparkSession, scaledBase: String, f: Int): DataFrame =
    spark.read.parquet(s"$scaledBase/f$f/events.parquet")
      .select(col("event_id"),
        when(col("user_id") % 10 < 3, lit(1L))
          .otherwise(col("user_id")).as("k"),
        col("user_id"))

  /** Dim side replicated with the SAME user salt, so every cold key
    * finds its within-replica match and output volume scales N×. */
  private def skewDim(cust: DataFrame, f: Int): DataFrame =
    replicate(cust.select("c_custkey", "c_mktsegment"), f)
      .select((col("c_custkey").cast("long") + col("k") * 10000000L).as("k"),
        col("c_mktsegment"))

  /** Orders/lineitem at N×: salted order keys keep the per-replica
    * match structure (urgent keys stay ~20% of orders, each lineitem
    * row resolves within its replica), so both the key side and the
    * probe side grow N× with constant selectivity — the bloom's
    * reduction ratio is scale-invariant by construction and the probe
    * measures whether the QUERY path (fingerprint + prefilter + exact
    * semi join) stays shuffle-bounded.
    */
  private def scaleUrgentKeys(orders: DataFrame, f: Int): DataFrame =
    replicate(
      orders.where(col("o_orderpriority") === "1-URGENT").select("o_orderkey"), f)
      .select((col("o_orderkey") + col("k") * 1000000000L).as("o_orderkey"))

  private def scaleLineitem(li: DataFrame, f: Int): DataFrame =
    replicate(li.select("l_orderkey", "l_quantity", "l_returnflag"), f)
      .select((col("l_orderkey") + col("k") * 1000000000L).as("l_orderkey"),
        col("l_quantity"), col("l_returnflag"))

  /** The pagerank row's bipartite graph at N×: replica k is a fresh
    * customer/supplier population joined through salted order keys,
    * so the graph is N disjoint copies of the base topology — the
    * damped walk never crosses replicas, preserving per-replica rank
    * structure, while |V|, |E|, and every iteration's contribution
    * shuffle grow N×. The edge build (orders⋈lineitem⋈groupBy) runs
    * inside the timer: it is part of what the row pays.
    */
  private def prEdges(spark: SparkSession, sfDir: String, f: Int): DataFrame = {
    // repartition BEFORE the replica explode — the sf0.1 scans are one
    // split, so without it the join's whole 30× shuffle write funnels
    // through those few tasks (first 30× probe run: 194 MB in one
    // task; the duplicate_spans/edit_distance spread story again)
    val par = spark.sparkContext.defaultParallelism
    val o = replicate(Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").repartition(par), f)
      .select((col("o_orderkey") + col("k") * 1000000000L).as("ok"),
        (col("o_custkey") + col("k") * 10000000L).as("c"))
    val l = replicate(Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey").repartition(par), f)
      .select((col("l_orderkey") + col("k") * 1000000000L).as("lk"),
        (col("l_suppkey") + col("k") * 10000000L).as("sup"))
    val pairs = o.join(l, col("ok") === col("lk"))
      .groupBy("c", "sup").agg(count(lit(1)).as("w"))
    pairs.select((col("c") * 2).as("src"), (col("sup") * 2 + 1).as("dst"), col("w"))
      .union(pairs.select((col("sup") * 2 + 1).as("src"),
        (col("c") * 2).as("dst"), col("w")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.quietBoundedWindowWarning()
    val listener = new PeakListener
    spark.sparkContext.addSparkListener(listener)

    val scaledBase = java.nio.file.Files.createTempDirectory("graft_scale").toString

    // SPARK_GRAFT_PROBE_ONLY=op1,op2 narrows the sweep — same contract
    // as Bench's BENCH_ONLY, for probing a new op without re-paying
    // the whole family. Shared fixture builds below are skipped when
    // no selected op reads them.
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def wanted(n: String): Boolean = only.forall(_.contains(n))

    if (Seq("sessionize", "skew_hybrid_join", "funnel_counts",
      "cohort_retention").exists(wanted)) {
      scaleEvents(spark, sfDir, s"$scaledBase/f1", 1)
      scaleEvents(spark, sfDir, s"$scaledBase/f$factor", factor)
    }

    // Index builds happen OUTSIDE the timers: the persisted-index ops'
    // volume question is the cold QUERY path (build-once/query-many is
    // the whole posture), so the probe times exactly what a production
    // query session pays — index reload + probe + exact verify.
    for (f <- Seq(1, factor)
         if Seq("bloom_index_semi", "ivf_index_topk", "minhash_index_delta")
           .exists(wanted)) {
      BloomJoin.buildIndex(
        scaleUrgentKeys(Tables.orders(spark, sfDir), f), "o_orderkey",
        expectedKeys = 200000L * f, dir = s"$scaledBase/f$f/bloom_idx")
      val emb = scaleEmb(Tables.embeddings(spark, sfDir), f)
      Similarity.buildIvfIndex(emb, s"$scaledBase/f$f/ivf_idx",
        Similarity.fitIvfModel(emb))
      // standing corpus = 2/3 of the scaled docs; the timed op below
      // is the DELTA query against this N×-bigger persisted index
      Similarity.buildMinhashIndex(
        scaleDocs(Tables.documents(spark, sfDir), f)
          .filter(col("doc_id") % 3 =!= 1),
        s"$scaledBase/f$f/mh_idx")
    }

    // Snapshot-table volume fixtures (r10 VERDICT #8): v1 = the scaled
    // events keyed+range-partitioned with event_id stats (8f files,
    // replica ranges disjoint); v2 = a SETUP merge restating ~1% of
    // replica 0's keys — a rewriting commit, so the timed
    // changesBetween(1,2) below takes the content-diff path (two
    // exceptAll shuffles over the N× table). The timed snapshot_merge
    // then commits v3: its delta lives entirely in replica 0's key
    // range, so manifest-stats pruning + the touched-file join bound
    // the copy-on-write to a CONSTANT file set — the merge wall should
    // stay ~flat as f grows, which is exactly the file-granular claim.
    def snapDelta(salt: Int) = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), lit(s"restated_$salt").as("event_type"))
      .filter(col("event_id") % 100 === salt)
    if (Seq("snapshot_merge", "snapshot_changes_diff").exists(wanted))
      for (f <- Seq(1, factor)) {
        val dir = s"$scaledBase/f$f/snap_tbl"
        val ev = replicate(
          spark.read.parquet(s"$sfDir/events.parquet")
            .select("event_id", "event_type"), f)
          .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
            col("event_type"))
          .repartitionByRange(8 * f, col("event_id"))
        graft.sources.SnapshotTable.commitAppend(ev, dir, statsCols = Seq("event_id"))
        graft.sources.SnapshotTable.commitMerge(snapDelta(7), dir, Seq("event_id"))
      }

    // r12 segmented-manifest fixtures: one standing table of 8f
    // range-disjoint files (ONE segment). snapshot_commit_bytes then
    // times a CONSTANT-size append and measures the metadata bytes
    // that commit wrote — under segmentation that is one small
    // manifest + one delta segment whatever f is (the r11
    // manifest-monolith claim, measured); snapshot_sql_read times the
    // DSv2 read whose range conjunct keeps ~1 file at any f.
    // pq_refit's index fixture is built OUTSIDE the timer; the refit
    // itself is corpus-linear BY DESIGN (it re-fits and re-encodes
    // the whole index — the honest baseline is a rebuild).
    if (Seq("snapshot_commit_bytes", "snapshot_sql_read",
      "snapshot_stream_drain", "stream_sink_drain",
      "stream_complete_sink").exists(wanted))
      for (f <- Seq(1, factor)) {
        val dir = s"$scaledBase/f$f/snap_seg_tbl"
        val ev = replicate(
          spark.read.parquet(s"$sfDir/events.parquet")
            .select("event_id", "event_type"), f)
          .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
            col("event_type"))
          .repartitionByRange(8 * f, col("event_id"))
        graft.sources.SnapshotTable.commitAppend(ev, dir, statsCols = Seq("event_id"))
      }
    if (wanted("pq_refit"))
      for (f <- Seq(1, factor))
        Similarity.buildPqIndex(scaleEmb(Tables.embeddings(spark, sfDir), f),
          s"$scaledBase/f$f/pq_refit_idx")
    if (wanted("stream_emb_drain"))
      for (f <- Seq(1, factor))
        graft.sources.SnapshotTable.commitAppend(
          scaleEmb(Tables.embeddings(spark, sfDir), f)
            .repartition(8 * f),
          s"$scaledBase/f$f/snap_emb_tbl")

    // r13 SQL-DML fixtures: 8f range-disjoint files with id stats plus
    // a stats-free `tag` column; the catalog root is the scaled base so
    // `gprobe.f<f>.snap_dml_tbl` resolves to the fixture dir. The CDF
    // fixture carries one CONSTANT-size MoR delete on top (1000 keys
    // whatever f is) — the retraction feed must drain at key cost.
    if (Seq("sql_dml_pruned", "sql_dml_unpruned", "sql_dml_merge",
      "stream_cdf_drain", "sql_dml_mor", "sorted_write", "wap_publish",
      "spj_join", "spj_join_plain", "partitioned_write",
      "dml_rebucket", "replace_where", "dynamic_overwrite",
      "dynamic_overwrite_multi", "fanout_write", "dv_delete", "dv_update",
      "stream_upsert_drain", "stream_cdf_dv_drain").exists(wanted)) {
      spark.conf.set("spark.sql.catalog.gprobe",
        classOf[graft.sources.dsv2.GraftSnapshotCatalog].getName)
      spark.conf.set("spark.sql.catalog.gprobe.root", scaledBase)
      for (f <- Seq(1, factor)) {
        val ev = replicate(
          spark.read.parquet(s"$sfDir/events.parquet")
            .select("event_id", "event_type"), f)
          .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
            col("event_type"))
          .withColumn("tag", concat(lit("t"), col("event_id").cast("string")))
          .repartitionByRange(8 * f, col("event_id"))
        if (Seq("sql_dml_pruned", "sql_dml_unpruned", "sql_dml_merge")
          .exists(wanted))
          graft.sources.SnapshotTable.commitAppend(
            ev, s"$scaledBase/f$f/snap_dml_tbl", statsCols = Seq("event_id"))
        if (wanted("stream_cdf_drain")) {
          val dir = s"$scaledBase/f$f/snap_cdf_tbl"
          graft.sources.SnapshotTable.commitAppend(
            ev, dir, statsCols = Seq("event_id"))
          graft.sources.SnapshotTable.commitDeleteMoR(
            spark.range(0, 1000).select(col("id").as("event_id")),
            dir, Seq("event_id"))
        }
        // second-wave r16 CDF-over-DV fixture: the scaled table plus
        // a CONSTANT-band DV delete (the 'click' rows of ids
        // [0, 20000) — scattered WITHIN the band's files, so no
        // equality key and COW would rewrite them; the band lives in
        // replica 0 whatever f is). The timed drain streams ONLY the
        // vector version's before-images.
        if (wanted("stream_cdf_dv_drain")) {
          val dir = s"$scaledBase/f$f/snap_cdv_tbl"
          graft.sources.SnapshotTable.commitAppend(
            ev.select("event_id", "event_type"), dir,
            statsCols = Seq("event_id"))
          graft.sources.SnapshotTable.commitDeleteVectorsWhere(spark, dir,
            col("event_id") < 20000L && col("event_type") === "click")
        }
        // r14 MoR-DML fixture: same 8f table, plus a CONSTANT-size
        // pending MoR delete (1000 keys, all in replica 0's range) —
        // the timed SQL DELETE must fold it first (operation-build
        // auto-fold), and both the fold and the ranged rewrite are
        // stat-bounded to ~1 of the 8f files
        if (wanted("sql_dml_mor")) {
          val dir = s"$scaledBase/f$f/snap_mor_tbl"
          graft.sources.SnapshotTable.commitAppend(
            ev, dir, statsCols = Seq("event_id"))
          graft.sources.SnapshotTable.commitDeleteMoR(
            spark.range(0, 1000).select(col("id").as("event_id")),
            dir, Seq("event_id"))
        }
        // r16 delete-vector fixture: the same 8f range-disjoint layout
        // under delete_mode='dv' — the timed DELETE dooms a CONSTANT
        // id band's 'click' rows, which scatter WITHIN the band's
        // files (event_type carries no stats): COW would rewrite
        // those files and an equality delete has no key, the vector
        // marks positions bounded by the band whatever f is
        if (wanted("dv_delete")) {
          val dir = s"$scaledBase/f$f/snap_dv_tbl"
          graft.sources.SnapshotTable.commitAppend(
            ev.select("event_id", "event_type"), dir,
            statsCols = Seq("event_id"))
          spark.sql(s"ALTER TABLE gprobe.f$f.snap_dv_tbl " +
            "SET TBLPROPERTIES ('delete_mode' = 'dv')")
        }
        // r16 streaming-upsert fixture: the scaled table plus a
        // CONSTANT-size upsert feed (1000 restatements + 1000 fresh
        // keys, 3 chunks); the timed drain must be O(batch) per epoch
        // whatever f is — zero pre-existing files touched
        if (wanted("stream_upsert_drain")) {
          val dir = s"$scaledBase/f$f/snap_ups_tbl"
          graft.sources.SnapshotTable.commitAppend(
            ev.select("event_id", "event_type"), dir,
            statsCols = Seq("event_id"))
          spark.range(0, 1000)
            .select(col("id").as("event_id"),
              lit("restated").as("event_type"))
            .unionByName(spark.range(0, 1000)
              .select((col("id") + 7000000000000L).as("event_id"),
                lit("fresh").as("event_type")))
            .repartition(3, col("event_id"))
            .write.parquet(s"$scaledBase/f$f/ups_src")
        }
        // r16 DV-update fixture: same layout; the timed CALL dv_update
        // patches a constant band's 'click' rows — vector + delta-sized
        // image batch, every pre-existing file carried by reference
        if (wanted("dv_update"))
          graft.sources.SnapshotTable.commitAppend(
            ev.select("event_id", "event_type"),
            s"$scaledBase/f$f/snap_dvu_tbl", statsCols = Seq("event_id"))
        // r14 sorted-write fixture: a TBLPROPERTIES sort_cols table
        // plus an adversarial hash-clustered input view (every input
        // partition spans the full id domain); the timed INSERT pays
        // scan + range shuffle + write — LINEAR by design, and the
        // in-op require documents the prune the clustering buys
        if (wanted("sorted_write")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.snap_sw_tbl " +
            "(event_id BIGINT, event_type STRING) " +
            "TBLPROPERTIES ('sort_cols' = 'event_id')")
          ev.select("event_id", "event_type")
            .repartition(8, col("event_type"))
            .createOrReplaceTempView(s"probe_sw_src_f$f")
        }
        // r14 SPJ fixture: two CO-BUCKETED tables (8 buckets whatever
        // f is — files GROW with volume, count stays fixed, the
        // production bucket posture); the timed ops contrast the
        // storage-partitioned join (zero shuffle) with the plain one
        if (Seq("spj_join", "spj_join_plain").exists(wanted)) {
          spark.sql(s"CREATE TABLE gprobe.f$f.spj_a " +
            "(event_id BIGINT, event_type STRING) " +
            "TBLPROPERTIES ('bucket_cols' = 'event_id', 'bucket_n' = '8')")
          spark.sql(s"CREATE TABLE gprobe.f$f.spj_b " +
            "(event_id BIGINT, score BIGINT) " +
            "TBLPROPERTIES ('bucket_cols' = 'event_id', 'bucket_n' = '8')")
          ev.select("event_id", "event_type")
            .createOrReplaceTempView(s"probe_spj_a_f$f")
          ev.select(col("event_id"), (col("event_id") % 97).as("score"))
            .createOrReplaceTempView(s"probe_spj_b_f$f")
          spark.sql(s"INSERT INTO gprobe.f$f.spj_a " +
            s"SELECT event_id, event_type FROM probe_spj_a_f$f")
          spark.sql(s"INSERT INTO gprobe.f$f.spj_b " +
            s"SELECT event_id, score FROM probe_spj_b_f$f")
        }
        // r14 WAP fixture: source table (8f range files) + a staged
        // clone carrying a constant-size insert and a stat-bounded
        // DELETE; the timed op is the PUBLISH — manifest + staged-file
        // renames, never data-volume work, so near-FLAT is the claim
        if (wanted("wap_publish")) {
          val dir = s"$scaledBase/f$f/snap_wap_tbl"
          graft.sources.SnapshotTable.commitAppend(
            ev.select("event_id", "event_type"), dir,
            statsCols = Seq("event_id"))
          spark.sql(s"CALL gprobe.system.clone(" +
            s"'f$f.snap_wap_tbl', 'f$f.snap_wap_stage')").collect()
          spark.range(0, 1000)
            .select((col("id") + 5000000000000L).as("event_id"),
              lit("staged").as("event_type"))
            .createOrReplaceTempView(s"probe_wap_src_f$f")
          spark.sql(s"INSERT INTO gprobe.f$f.snap_wap_stage " +
            s"SELECT event_id, event_type FROM probe_wap_src_f$f")
          spark.sql(s"DELETE FROM gprobe.f$f.snap_wap_stage " +
            "WHERE event_id >= 2000 AND event_id <= 2999")
        }
        // r15 REPLACE WHERE fixture: a sort_cols table (range-
        // clustered files, narrow id stats) — the timed replace of a
        // quarter range is the 100 TB "replace one day" shape:
        // all-matching files DROP by proof, none-matching carry by
        // reference, only the boundary file rewrites
        if (wanted("replace_where")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.snap_rw " +
            "(event_id BIGINT, event_type STRING) " +
            "TBLPROPERTIES ('sort_cols' = 'event_id')")
          ev.select("event_id", "event_type")
            .createOrReplaceTempView(s"probe_rw_src_f$f")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          try spark.sql(s"INSERT INTO gprobe.f$f.snap_rw " +
            s"SELECT event_id, event_type FROM probe_rw_src_f$f")
          finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
        }
        // r15 dynamic-overwrite fixture: a days(ts) table carrying the
        // full scaled history; the timed op backfills ONE day — the
        // classic nightly-restatement shape
        if (wanted("dynamic_overwrite")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.snap_dyn " +
            "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
            "PARTITIONED BY (days(ts))")
          replicate(
            graft.Tables.events(spark, sfDir)
              .select("event_id", "event_type", "ts"), f)
            .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
              col("event_type"), col("ts"))
            .createOrReplaceTempView(s"probe_dyn_src_f$f")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          try spark.sql(s"INSERT INTO gprobe.f$f.snap_dyn " +
            s"SELECT event_id, event_type, ts FROM probe_dyn_src_f$f")
          finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
        }
        // r15 PARTITIONED BY fixture: days(ts) DDL + an adversarial
        // hash-clustered input keeping the real ts spread; the timed
        // INSERT range-clusters on ts and the in-op require pins the
        // manifest-only day prune at volume
        if (wanted("partitioned_write")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.snap_part_tbl " +
            "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
            "PARTITIONED BY (days(ts))")
          replicate(
            graft.Tables.events(spark, sfDir)
              .select("event_id", "event_type", "ts"), f)
            .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
              col("event_type"), col("ts"))
            .repartition(8, col("event_type"))
            .createOrReplaceTempView(s"probe_part_src_f$f")
        }
        // r16 multi-transform dynamic-overwrite fixture: a
        // (days(ts) × event_type) table with the full scaled history;
        // the timed op backfills ONE (day, type) tuple
        if (wanted("dynamic_overwrite_multi")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.snap_dynm " +
            "(event_id BIGINT, event_type STRING, ts TIMESTAMP) " +
            "PARTITIONED BY (days(ts), event_type)")
          replicate(
            graft.Tables.events(spark, sfDir)
              .select("event_id", "event_type", "ts"), f)
            .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
              col("event_type"), col("ts"))
            .createOrReplaceTempView(s"probe_dynm_src_f$f")
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          try spark.sql(s"INSERT INTO gprobe.f$f.snap_dynm " +
            s"SELECT event_id, event_type, ts FROM probe_dynm_src_f$f")
          finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
        }
        // r16 fanout-write fixture: two co-bucketed 8-bucket tables,
        // one with write fanout, one with the bucket_n ceiling; the
        // timed op inserts the SAME scaled batch into both and pins
        // that fanout files stay single-bucket and SPJ-compatible
        if (wanted("fanout_write")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.fan_a " +
            "(event_id BIGINT, event_type STRING, payload STRING) " +
            "TBLPROPERTIES ('bucket_cols' = 'event_id', 'bucket_n' = '8', " +
            "'bucket_write_fanout' = 'auto')")
          spark.sql(s"CREATE TABLE gprobe.f$f.fan_b " +
            "(event_id BIGINT, event_type STRING, payload STRING) " +
            "TBLPROPERTIES ('bucket_cols' = 'event_id', 'bucket_n' = '8')")
          // a ~1 KB INCOMPRESSIBLE payload (32 distinct md5 blocks —
          // a repeated block would compress away and the probe would
          // measure task overhead) makes the REDUCE side (shuffle
          // read + parquet encode) dominate: the regime the fanout
          // exists for (per-bucket gigabytes on a real cluster)
          ev.select(col("event_id"), col("event_type"),
            expr("concat_ws('', transform(sequence(1, 32), " +
              "i -> md5(concat(cast(event_id as string), '_', i))))")
              .as("payload"))
            .createOrReplaceTempView(s"probe_fan_src_f$f")
        }
        // r15 auto-rebucket fixture: two co-bucketed tables; the timed
        // op is a scattered DELETE (hash layout = every file holds
        // matches, the honest full-rewrite cost) whose replacement
        // files must land bucketed so the join stays exchange-free
        // WITHOUT a manual CALL rebucket
        if (wanted("dml_rebucket")) {
          spark.sql(s"CREATE TABLE gprobe.f$f.rbk_a " +
            "(event_id BIGINT, event_type STRING) " +
            "TBLPROPERTIES ('bucket_cols' = 'event_id', 'bucket_n' = '8')")
          spark.sql(s"CREATE TABLE gprobe.f$f.rbk_b " +
            "(event_id BIGINT, score BIGINT) " +
            "TBLPROPERTIES ('bucket_cols' = 'event_id', 'bucket_n' = '8')")
          ev.select("event_id", "event_type")
            .createOrReplaceTempView(s"probe_rbk_a_f$f")
          ev.select(col("event_id"), (col("event_id") % 97).as("score"))
            .createOrReplaceTempView(s"probe_rbk_b_f$f")
          spark.sql(s"INSERT INTO gprobe.f$f.rbk_a " +
            s"SELECT event_id, event_type FROM probe_rbk_a_f$f")
          spark.sql(s"INSERT INTO gprobe.f$f.rbk_b " +
            s"SELECT event_id, score FROM probe_rbk_b_f$f")
        }
      }
    }

    // r11 bloom-manifest fixture: the scaled events HASH-clustered on
    // event_id into a CONSTANT 8 files with stats AND blooms declared
    // — the layout where every file spans the full key range, so
    // range stats keep everything and only the blooms prune. Files
    // grow with f (not file count), so per-file keys cross the 64 KB
    // inline cap and the blooms take the SIDECAR path at 10×/30× —
    // the probe runs the format at exactly the scale the sidecar
    // design exists for. The fixture serves the timed prune; the
    // timed commit writes its own fresh dir.
    def scaledHashClustered(f: Int) = replicate(
      spark.read.parquet(s"$sfDir/events.parquet")
        .select("event_id", "event_type"), f)
      .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
        col("event_type"))
      .repartition(8, col("event_id"))
    if (Seq("snapshot_bloom_commit", "snapshot_bloom_prune").exists(wanted))
      for (f <- Seq(1, factor))
        graft.sources.SnapshotTable.commitAppend(scaledHashClustered(f),
          s"$scaledBase/f$f/snap_bloom_tbl",
          statsCols = Seq("event_id"), bloomCols = Seq("event_id"))

    // r11 join-IVM fixture: S = the scaled orders (grows N×), R = the
    // scaled customers MINUS replica 0's [400,500) key band (v1), the
    // band appended as v2 — a CONSTANT-size ΔR whatever f is. The
    // timed op computes ΔM = ΔR⋈S₀ via the delta-key-bounded base
    // read; if readMatching really bounds the S-side scan, the
    // refresh wall stays ~flat while S grows N×.
    if (wanted("snapshot_join_delta"))
      for (f <- Seq(1, factor)) {
        val rDir = s"$scaledBase/f$f/jivm_cust"
        val sDir = s"$scaledBase/f$f/jivm_ord"
        val cust = replicate(
          Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment"), f)
          .select((col("c_custkey") + col("k") * 1000000000L).as("c_custkey"),
            col("c_mktsegment"))
        val ord = replicate(
          Tables.orders(spark, sfDir)
            .select(col("o_custkey").as("c_custkey"), col("o_orderkey")), f)
          .select((col("c_custkey") + col("k") * 1000000000L).as("c_custkey"),
            col("o_orderkey"))
        val band = col("c_custkey") >= 400L && col("c_custkey") < 500L
        graft.sources.SnapshotTable.commitAppend(
          cust.filter(!band).repartitionByRange(4 * f, col("c_custkey")), rDir,
          statsCols = Seq("c_custkey"), bloomCols = Seq("c_custkey"))
        graft.sources.SnapshotTable.commitAppend(
          ord.repartitionByRange(8 * f, col("c_custkey")), sDir,
          statsCols = Seq("c_custkey"), bloomCols = Seq("c_custkey"))
        graft.sources.SnapshotTable.commitAppend(
          cust.filter(band).coalesce(1), rDir)
      }

    // r11 merge-on-read fixtures. snap_mor_hash: the hash-clustered
    // layout MoR deletes exist for — every file spans the key domain,
    // so a COW delete of scattered keys would rewrite the whole N×
    // table; the timed commitDeleteMoR writes one delta-sized key
    // file and ZERO data files, so its wall should stay ~FLAT.
    // snap_mor_range: range-clustered with a pending delete whose
    // keys live entirely in replica 0's key range — applyDeletes'
    // stats+bloom touched-file join should bound the fold to a
    // CONSTANT file set while the table grows N×.
    if (wanted("snapshot_mor_delete"))
      for (f <- Seq(1, factor))
        graft.sources.SnapshotTable.commitAppend(scaledHashClustered(f),
          s"$scaledBase/f$f/snap_mor_hash",
          statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
    if (wanted("snapshot_mor_fold"))
      for (f <- Seq(1, factor)) {
        val dir = s"$scaledBase/f$f/snap_mor_range"
        val ev = replicate(
          spark.read.parquet(s"$sfDir/events.parquet")
            .select("event_id", "event_type"), f)
          .select((col("event_id") + col("k") * 1000000000L).as("event_id"),
            col("event_type"))
          .repartitionByRange(8 * f, col("event_id"))
        graft.sources.SnapshotTable.commitAppend(ev, dir,
          statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
        graft.sources.SnapshotTable.commitDeleteMoR(
          spark.read.parquet(s"$sfDir/events.parquet")
            .select("event_id").filter(col("event_id") % 100 === 23),
          dir, Seq("event_id"))
      }
    // snap_group: range-clustered by (event_type, event_id) into a
    // CONSTANT 8 files, so most files are single-type — groupCounts
    // answers those from the manifest and scans only the group
    // boundaries; scanned bytes are a strict subset of the table.
    if (wanted("snapshot_group_count"))
      for (f <- Seq(1, factor))
        graft.sources.SnapshotTable.commitAppend(
          replicate(spark.read.parquet(s"$sfDir/events.parquet")
            .select("event_id", "event_type"), f)
            .select(col("event_id"), col("event_type"))
            .repartitionByRange(8, col("event_type"), col("event_id")),
          s"$scaledBase/f$f/snap_group", statsCols = Seq("event_type"))

    def ops(f: Int): Seq[(String, () => DataFrame)] = {
      val docs = scaleDocs(Tables.documents(spark, sfDir), f)
      val emb = scaleEmb(Tables.embeddings(spark, sfDir), f)
      Seq(
        "minhash_neardup" -> (() => Similarity.minhashNearDup(docs)),
        "jaccard_neardup" -> (() => Similarity.jaccardNearDup(docs)),
        "containment_neardup" -> (() => Similarity.containmentNearDup(docs)),
        // the token bijection maps k-token spans bijectively too, so
        // within-replica shared spans carry over exactly — same
        // preservation argument as the shingle families
        "duplicate_spans" -> (() => graft.operators.TextOps.duplicateSpans(docs)),
        "semantic_dedup" -> (() => Similarity.semanticDedup(emb)),
        "record_linkage" -> (() => Linkage.hammingLinkage(
          linkageRecords(Tables.customer(spark, sfDir), f),
          "rec_id", "rec_key", width = 32, maxDist = 2)),
        "sessionize" -> (() => Queries.sessionize(spark, s"$scaledBase/f$f")),
        // funnel/cohort over the fresh-user-population replicas: the
        // per-user join keys and first-event cohorts scale N×, the
        // step list and week span stay constant
        "funnel_counts" -> (() => Queries.funnelCounts(
          Tables.events(spark, s"$scaledBase/f$f"),
          Seq("view", "click", "purchase"), windowMs = 7L * 86400000L)),
        "cohort_retention" -> (() => Queries.cohortRetention(
          Tables.events(spark, s"$scaledBase/f$f"), maxWeeks = 3)),
        // r9 VERDICT #4: the join/index families, previously the only
        // heavy ops with no volume evidence. skew_hybrid_join's hot
        // key grows N× (see skewBig); the index ops time the cold
        // query against an N× index built outside the timer.
        "skew_hybrid_join" -> (() => Skew.hybridSkewJoin(
          skewBig(spark, scaledBase, f),
          skewDim(Tables.customer(spark, sfDir), f),
          "k", saltFactor = 8, hotMinRows = 1000L)),
        "bloom_index_semi" -> (() => {
          val keys = scaleUrgentKeys(Tables.orders(spark, sfDir), f)
          BloomJoin.semiJoinFromIndex(
            scaleLineitem(Tables.lineitem(spark, sfDir), f), keys,
            "l_orderkey", "o_orderkey", s"$scaledBase/f$f/bloom_idx")
        }),
        "ivf_index_topk" -> (() =>
          Similarity.ivfTopKFromIndex(spark, s"$scaledBase/f$f/ivf_idx")),
        // token bijection ⇒ per-replica term spaces are disjoint, so
        // the df table and the dfCap-bounded self-join scale exactly N×
        "tfidf_cosine" -> (() =>
          graft.operators.TextOps.tfidfCosinePairs(docs)),
        "minhash_index_delta" -> (() =>
          Similarity.minhashNearDupFromIndex(
            docs.filter(col("doc_id") % 3 === 1), s"$scaledBase/f$f/mh_idx")),
        // r10 additions. edit_distance_join: FastSS variant-hash
        // blocking under an N×-growing typo-twin population (the md5
        // tag prefix kills cross-replica candidates — see edNames)
        "edit_distance_join" -> (() => Linkage.editDistanceJoin(
          edNames(Tables.customer(spark, sfDir), f),
          "rec_id", "rec_name", maxDist = 1)),
        // cross_corpus_dedup: the token bijection preserves
        // cross-split within-replica Jaccard exactly, so contamination
        // density is constant and the survivor count scales N×
        "cross_corpus_dedup" -> (() => Similarity.crossCorpusDedup(
          docs.filter(col("doc_id") % 37 =!= 0),
          docs.filter(col("doc_id") % 37 === 0))),
        // boilerplate_strip: per-replica token spaces are disjoint, so
        // each replica's segment census reproduces the base corpus's
        // ≥3-doc template segments at N× total volume
        "boilerplate_strip" -> (() =>
          graft.operators.TextOps.stripBoilerplate(docs)),
        // pq_topk: the bounded-sample fit is constant-size by
        // construction; what grows is the code/reconstruction scan
        "pq_topk" -> (() => Similarity.pqTopK(emb)),
        // pagerank: 3 damped iterations over N disjoint copies of the
        // bipartite order graph (see prEdges) — iteration shuffles
        // grow N×, the unrolled plan depth stays constant
        "pagerank" -> (() =>
          graft.operators.PageRank.run(prEdges(spark, sfDir, f), iterations = 3)),
        // subword_encode: the token bijection suffixes every word, so
        // replica k's words are disjoint strings — the vocab build's
        // n-gram census grows N× while the encode stays one map pass
        "subword_encode" -> (() => {
          val v = graft.operators.TextOps.buildSubwordVocab(docs)
          graft.operators.TextOps.subwordEncode(docs, v)
        }),
        // r11 retrieval/selection/tokenizer additions. NOTE the
        // alphabetic tokenization STRIPS scaleDocs' "_k" suffixes
        // (underscore+digit are separators), so replicas share one
        // term space: posting lists and token counts grow N× while
        // the vocabulary stays constant — which is exactly the shape
        // each claim needs measuring against.
        "bm25_topk" -> (() => graft.operators.TextOps.bm25TopK(
          docs, Seq("vector", "query", "join"), k = 10)),
        // pool/target split by id parity inside the scaled corpus;
        // the weight table stays vocabulary-sized while both token
        // streams grow N×
        "importance_select" -> (() => graft.operators.TextOps.importanceSelect(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), n = 20)),
        // vocabulary-bounded training: the initial word count is the
        // only corpus-sized pass; all 8 rounds run on the (constant
        // here) vocabulary, so wall should stay near-FLAT at N×
        "bpe_train" -> (() => graft.operators.TextOps.bpeTrain(docs, nMerges = 8)),
        // r11 additions (VERDICT r10 #8): the timed merge's delta is
        // bounded to replica 0's key range, so the COW write should be
        // ~constant in f; the CDC content diff is the table-sized op
        "snapshot_merge" -> (() => {
          val v = graft.sources.SnapshotTable.commitMerge(
            snapDelta(13), s"$scaledBase/f$f/snap_tbl", Seq("event_id"))
          spark.range(v).toDF()
        }),
        "snapshot_changes_diff" -> (() =>
          graft.sources.SnapshotTable.changesBetween(
            spark, s"$scaledBase/f$f/snap_tbl", 1L, 2L)),
        // the constant-size ΔR refresh against the N×-growing S: the
        // delta-key-bounded base read is the whole claim
        "snapshot_join_delta" -> (() =>
          graft.operators.Incremental.snapshotJoinDelta(
            spark, s"$scaledBase/f$f/jivm_cust", s"$scaledBase/f$f/jivm_ord",
            "c_custkey", rFrom = 1L, sFrom = 1L, rTo = 2L, sTo = 1L)
            .getOrElse(spark.range(0).toDF())),
        // commit-time bloom overhead: one extra delta-sized grouped
        // aggregate + sidecar writes riding the ordinary commit — the
        // wall should track the batch (it IS the delta), never worse
        "snapshot_bloom_commit" -> (() => {
          val v = graft.sources.SnapshotTable.commitAppend(
            scaledHashClustered(f), s"$scaledBase/f$f/snap_bloom_commit",
            statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
          spark.range(v).toDF()
        }),
        // planning-time point-lookup at volume: a 3-key probe against
        // the 8f-file manifest keeps O(keys) files whatever f is, so
        // the pruned read should stay ~FLAT while the table grows N×
        // (manifest parse + per-candidate sidecar reads are the only
        // f-scaled costs)
        "snapshot_bloom_prune" -> (() => {
          val dir = s"$scaledBase/f$f/snap_bloom_tbl"
          val keys = Seq(11L, 222L, 333L)
          val (kept, total) = graft.sources.SnapshotTable
            .pruneFilesByKeys(spark, dir, "event_id", keys)
          require(kept.size < total,
            s"blooms must prune the hash-clustered lookup: ${kept.size} of $total")
          graft.sources.SnapshotTable
            .readKeysFiltered(spark, dir, "event_id", keys)
            .filter(col("event_id").isin(keys: _*))
        }),
        // MoR delete commit at volume: the key frame is constant-size
        // (replica 0's %997 ids), the table N× — zero data files
        // touched, so the wall is the delta write + manifest swap
        "snapshot_mor_delete" -> (() => {
          val v = graft.sources.SnapshotTable.commitDeleteMoR(
            spark.read.parquet(s"$sfDir/events.parquet")
              .select("event_id").filter(col("event_id") % 997 === 0),
            s"$scaledBase/f$f/snap_mor_hash", Seq("event_id"))
          spark.range(v).toDF()
        }),
        // the fold half: pending keys bounded to replica 0's range,
        // so the touched-file join rewrites a constant file set
        "snapshot_mor_fold" -> (() => {
          val v = graft.sources.SnapshotTable.applyDeletes(
            spark, s"$scaledBase/f$f/snap_mor_range")
          spark.range(v).toDF()
        }),
        // grouped count from metadata: single-type files answer from
        // the manifest, only group-boundary files scan
        "snapshot_group_count" -> (() => {
          val (out, meta, scanned, total) = graft.sources.SnapshotTable
            .groupCounts(spark, s"$scaledBase/f$f/snap_group", "event_type")
          require(meta > 0 && scanned < total,
            s"groupCounts must answer mostly from metadata: meta=$meta scan=$scanned of $total")
          out
        }),
        // the composed crawl chain (strip → normalize → gate → dedup,
        // ONE plan) over the token-bijection replicas, wrapped in the
        // driver row's synthetic markup — the claim under measure is
        // that composition stays map-only until the 16-byte-hash
        // dedup shuffle at any volume
        "web_pipeline" -> (() => {
          val wrapped = docs.select(col("doc_id"),
            concat(lit("<html><body><!-- chrome --><p>"), col("text"),
              lit("</p><script>if (1 < 2) { x(); }</script>&amp;amp;</body></html>"))
              .as("text"))
          graft.operators.TextOps.corpusPipeline(
            graft.operators.TextOps.stripMarkup(wrapped)
              .select(col("doc_id"), col("clean_text").as("text")))
        }),
        // integer k-means: the assignment passes are map-only N×
        // (the centroid table rides as a codegen literal), the
        // refresh shuffle is k·dim rows whatever the corpus — wall
        // should track the scan, never the fixpoint bookkeeping
        "kmeans_assign" -> (() =>
          graft.operators.Clustering.kmeansAssign(emb, k = 8, iters = 2)),
        // interval overlap join over N TIME-SHIFTED replicas (each
        // replica's axis moves by k·60 days, past any interval reach,
        // so per-bucket density — and the pair count — scales exactly
        // N×, never N² from a densifying shared timeline)
        "interval_join" -> (() => {
          val ev = Tables.events(spark, sfDir)
            .select(col("event_id"), col("user_id"),
              expr("unix_micros(ts) DIV 1000").as("ms"))
            .repartition(spark.sparkContext.defaultParallelism)
          val shifted = replicate(ev, f)
            .select(
              (col("event_id") + col("k") * 1000000000L).as("event_id"),
              col("user_id"),
              (col("ms") + col("k") * 5184000000L).as("ms"))
          val l = shifted.filter(col("user_id") % 2 === 0)
            .select(col("event_id").as("l_id"), col("ms").as("l_start"),
              (col("ms") + (col("event_id") % 50) * 1000L).as("l_end"))
          val r = shifted.filter(col("user_id") % 2 === 1)
            .select(col("event_id").as("r_id"), col("ms").as("r_start"),
              (col("ms") + (col("event_id") % 97) * 500L).as("r_end"))
          graft.operators.TemporalJoins.intervalJoin(
            l, r, "l_start", "l_end", "r_start", "r_end", bucketMs = 60000L)
        }),
        // triangle census over N disjoint replicas of the part
        // co-order graph (both ids salted per replica): triangles
        // scale exactly N×, per-replica wedge structure — and the
        // degree-orientation's hub cap — are preserved verbatim
        "triangle_count" -> (() => {
          val li = replicate(
            Tables.lineitem(spark, sfDir)
              .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")), f)
            .select((col("ok") + col("k") * 1000000000L).as("ok"),
              (col("pk") + col("k") * 100000000L).as("pk"))
          val li2 = li.withColumnRenamed("pk", "pk2")
          graft.operators.Triangles.count(
            li.join(li2, "ok").where(col("pk") < col("pk2"))
              .select(col("pk").as("src"), col("pk2").as("dst")))
        }),
        // r12 additions. The DOULION coin on the same scaled graph:
        // the p=1/4 sparsifier discounts triangle work by p³ BEFORE
        // the closure — the scale path beside the exact census whose
        // 30× wall measured 12×
        "approx_triangle" -> (() => {
          val li = replicate(
            Tables.lineitem(spark, sfDir)
              .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")), f)
            .select((col("ok") + col("k") * 1000000000L).as("ok"),
              (col("pk") + col("k") * 100000000L).as("pk"))
          val li2 = li.withColumnRenamed("pk", "pk2")
          graft.operators.Triangles.approxCount(
            li.join(li2, "ok").where(col("pk") < col("pk2"))
              .select(col("pk").as("src"), col("pk2").as("dst")))
        }),
        // segmented-manifest commit at volume: a constant-size append
        // against the 8f-file table — the metadata this ONE commit
        // writes must be O(delta), not O(table); the in-op require
        // pins it below 16 KB whatever f is, and rows= carries the
        // measured byte count into the probe record
        "snapshot_commit_bytes" -> (() => {
          val dir = s"$scaledBase/f$f/snap_seg_tbl"
          val md = new java.io.File(s"$dir/_manifests")
          val before = md.listFiles().map(_.getName).toSet
          graft.sources.SnapshotTable.commitAppend(
            spark.read.parquet(s"$sfDir/events.parquet")
              .select("event_id", "event_type")
              .filter(col("event_id") % 1000 === 1).coalesce(1), dir)
          val wrote = md.listFiles().filterNot(s => before.contains(s.getName))
          val bytes = wrote.map(_.length).sum
          require(bytes < 16384,
            s"commit metadata must be O(delta): $bytes B against ${8 * f} standing files")
          spark.range(bytes).toDF()
        }),
        // the format's SQL face at volume: the pushed range conjunct
        // keeps ~1 of 8f files from the manifest, so the read wall
        // should stay ~FLAT while the table grows N×
        "snapshot_sql_read" -> (() => {
          val dir = s"$scaledBase/f$f/snap_seg_tbl"
          val df = spark.read.format("graft-snapshot").load(dir)
            .filter(col("event_id") <= 1000L)
            .groupBy("event_type").agg(count(lit(1)).as("n"))
          df
        }),
        // the drift-triggered refit at volume: re-fit + full re-encode
        // + swap — corpus-LINEAR BY DESIGN (a refit IS a rebuild; the
        // probe documents the baseline the monitors gate against)
        "pq_refit" -> (() => {
          Similarity.refitPqIndex(
            scaleEmb(Tables.embeddings(spark, sfDir), f),
            s"$scaledBase/f$f/pq_refit_idx")
          spark.range(1).toDF()
        }),
        // SQL DELETE with a stat-prunable predicate at volume: the
        // WHERE bounds both the group-filter pre-scan AND the rewrite
        // to ~1 of 8f files from the manifest — wall should stay
        // ~FLAT while the table grows N×
        "sql_dml_pruned" -> (() => {
          spark.sql(s"DELETE FROM gprobe.f$f.snap_dml_tbl " +
            "WHERE event_id >= 100 AND event_id <= 199")
          val after = graft.sources.SnapshotTable.files(spark,
            s"$scaledBase/f$f/snap_dml_tbl",
            graft.sources.SnapshotTable.versions(spark,
              s"$scaledBase/f$f/snap_dml_tbl").last)
          require(after.size >= 8 * f,
            s"the pruned DELETE must rewrite ~1 group, census: ${after.size}")
          spark.range(1).toDF()
        }),
        // SQL MERGE at volume: a constant-size source whose matched
        // keys live in ~1 of 8f slabs — join-driven group filtering
        // bounds the rewrite like the ranged DELETE, inserts ride the
        // same batch; near-FLAT is the claim
        "sql_dml_merge" -> (() => {
          spark.range(0, 500)
            .select(col("id").as("event_id"),
              lit("merged").as("event_type"),
              concat(lit("m"), col("id").cast("string")).as("tag"))
            .unionByName(spark.range(0, 100)
              .select((col("id") + 900000000000L).as("event_id"),
                lit("inserted").as("event_type"),
                concat(lit("i"), col("id").cast("string")).as("tag")))
            .createOrReplaceTempView("probe_merge_src")
          spark.sql(s"MERGE INTO gprobe.f$f.snap_dml_tbl t " +
            "USING probe_merge_src s ON t.event_id = s.event_id " +
            "WHEN MATCHED THEN UPDATE SET event_type = s.event_type " +
            "WHEN NOT MATCHED THEN INSERT (event_id, event_type, tag) " +
            "VALUES (s.event_id, s.event_type, s.tag)")
          spark.range(1).toDF()
        }),
        // SQL DELETE on the stats-free tag column: group DISCOVERY is
        // an honest full pre-scan (linear in the table — no stat can
        // bound it), but the REWRITE is still one file; the probe
        // documents the discovery-vs-rewrite split
        "sql_dml_unpruned" -> (() => {
          spark.sql(s"DELETE FROM gprobe.f$f.snap_dml_tbl " +
            "WHERE tag = 't501'")
          spark.range(1).toDF()
        }),
        // SQL DELETE against a MoR-PENDING table at volume (r14): the
        // operation folds the pending deletes first (applyDeletes —
        // the 1000 doomed keys live in ~1 of the 8f range files, so
        // the fold rewrites a constant file set), then the ranged
        // rewrite is stat-bounded to ~1 group — near-FLAT end to end
        "sql_dml_mor" -> (() => {
          spark.sql(s"DELETE FROM gprobe.f$f.snap_mor_tbl " +
            "WHERE event_id >= 2000 AND event_id <= 2999")
          spark.range(1).toDF()
        }),
        // COMPLETE-mode aggregate into the NATIVE sink at volume
        // (r14): scan-linear drain, CONSTANT-size epoch overwrite (the
        // aggregate census replaces the table each epoch; commit
        // metadata is O(result), not O(table))
        "stream_complete_sink" -> (() => {
          val t = System.nanoTime()
          val sink = s"$scaledBase/f$f/csink_$t"
          val q = spark.readStream.format("graft-snapshot")
            .load(s"$scaledBase/f$f/snap_seg_tbl")
            .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
            .writeStream.format("graft-snapshot")
            .option("path", sink).option("appId", "cprobe")
            .option("checkpointLocation", s"$scaledBase/f$f/csink_ck_$t")
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          require(graft.sources.SnapshotTable.read(spark, sink).count() > 0,
            "the complete-mode sink must hold the aggregate")
          spark.range(1).toDF()
        }),
        // the retraction change feed at volume: startingVersion pins
        // the drain to the MoR-delete commit alone, so the batch reads
        // the CONSTANT-size key file whatever f is — key cost, never
        // table cost
        "stream_cdf_drain" -> (() => {
          val ck = s"$scaledBase/f$f/cdf_ck_${System.nanoTime()}"
          val out = s"$scaledBase/f$f/cdf_out_${System.nanoTime()}"
          val q = spark.readStream.format("graft-snapshot")
            .option("readChangeFeed", "true")
            .option("startingVersion", "2")
            .load(s"$scaledBase/f$f/snap_cdf_tbl")
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val drained = spark.read.parquet(out)
          require(drained.count() == 1000L &&
            drained.filter(col("_change") === "delete_key").count() == 1000L,
            "the CDF drain from the MoR version must be exactly the keys")
          spark.range(1).toDF()
        }),
        // CDF over a DELETE VECTOR at volume: the drain's partitions
        // are the files the vector NAMES (~1 of the 8f — the band is
        // range-local), each re-reading its own file plus the
        // name-filtered vector — before-image cost is file-bounded,
        // never table-bounded, so the wall must stay FLAT as f grows
        "stream_cdf_dv_drain" -> (() => {
          val t = System.nanoTime()
          val out = s"$scaledBase/f$f/cdv_out_$t"
          val q = spark.readStream.format("graft-snapshot")
            .option("readChangeFeed", "true")
            .option("startingVersion", "2")
            .load(s"$scaledBase/f$f/snap_cdv_tbl")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", s"$scaledBase/f$f/cdv_ck_$t")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val drained = spark.read.parquet(out)
          val expect = spark.read.parquet(s"$sfDir/events.parquet")
            .filter(col("event_id") < 20000L &&
              col("event_type") === "click").count()
          require(drained.count() == expect && expect > 0L &&
            drained.filter(col("_change") === "delete").count() == expect,
            "the DV drain must be exactly the band's before-images")
          spark.range(1).toDF()
        }),
        // the table-to-table streaming pipeline at volume: source
        // drain + Group-writer encode + ledgered sink commits — both
        // halves scan/write-linear by design, absorbed by the 8f-way
        // parallelism; the commit metadata stays O(delta) per epoch
        "stream_sink_drain" -> (() => {
          val t = System.nanoTime()
          val sink = s"$scaledBase/f$f/sink_$t"
          val q = spark.readStream.format("graft-snapshot")
            .load(s"$scaledBase/f$f/snap_seg_tbl")
            .writeStream.format("graft-snapshot")
            .option("path", sink).option("appId", "probe")
            .option("checkpointLocation", s"$scaledBase/f$f/sink_ck_$t")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val n = graft.sources.SnapshotTable.read(spark, sink).count()
          require(n > 0, "the sink must hold the drained rows")
          spark.range(n).toDF()
        }),
        // embedding (array<float>) drain at volume: the 3-level list
        // decode is the per-row kernel — scan-LINEAR by design, wall
        // bounded by the 8f-way parallel decode; documents the vector-
        // ingest hop's honest cost
        "stream_emb_drain" -> (() => {
          val ck = s"$scaledBase/f$f/emb_ck_${System.nanoTime()}"
          val q = spark.readStream.format("graft-snapshot")
            .load(s"$scaledBase/f$f/snap_emb_tbl")
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          spark.range(1).toDF()
        }),
        // the streaming source's full drain at volume: offsets plan
        // from the manifest (zero data I/O), the decode is one Group-
        // API pass per file partition — scan-LINEAR by design, wall
        // bounded by the 8f-way parallel decode
        "snapshot_stream_drain" -> (() => {
          val ck = s"$scaledBase/f$f/stream_ck_" +
            s"${System.nanoTime()}" // fresh per timed iteration
          val q = spark.readStream.format("graft-snapshot")
            .load(s"$scaledBase/f$f/snap_seg_tbl")
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          spark.range(1).toDF()
        }),
        // TBLPROPERTIES-clustered SQL INSERT at volume: scan + range
        // shuffle + write, LINEAR by design (the price of landing
        // pruneable files once instead of zordering later); AQE
        // coalescing pinned off so the range files are visible at
        // probe scale (at real scale its advisory sizing is the
        // desired behavior)
        "sorted_write" -> (() => {
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          try spark.sql(s"INSERT INTO gprobe.f$f.snap_sw_tbl " +
            s"SELECT event_id, event_type FROM probe_sw_src_f$f")
          finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
          val (kept, total) = graft.sources.SnapshotTable.pruneFiles(
            spark, s"$scaledBase/f$f/snap_sw_tbl",
            Seq(graft.sources.SnapshotTable.StatFilter(
              "event_id", upper = Some(1000L))))
          require(total > 1 && kept.size < total,
            s"sorted write must land pruneable files: ${kept.size}/$total")
          spark.range(1).toDF()
        }),
        // the STORAGE-PARTITIONED join at volume: co-bucketed tables
        // equi-join with ZERO exchanges (in-op plan require; the
        // listener's peakTaskShufWrite is the measured proof) — wall
        // is scan + in-partition sort, linear, while the plain twin
        // below pays the full two-sided shuffle
        "spj_join" -> (() => {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          val j = spark.sql(s"SELECT a.event_type, b.score " +
            s"FROM gprobe.f$f.spj_a a JOIN gprobe.f$f.spj_b b " +
            "ON a.event_id = b.event_id")
          val plan = j.queryExecution.executedPlan.toString
          require(!plan.contains("Exchange"),
            s"SPJ must plan no exchange:\n$plan")
          j.groupBy("event_type").agg(sum("score").as("s"))
        }),
        // the same join WITHOUT the bucket claim — the two-sided
        // shuffle baseline SPJ deletes
        "spj_join_plain" -> (() => {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.sql(s"SELECT a.event_type, b.score " +
            s"FROM gprobe.f$f.spj_a a JOIN gprobe.f$f.spj_b b " +
            "ON a.event_id = b.event_id")
            .groupBy("event_type").agg(sum("score").as("s"))
        }),
        // write-audit-publish's PUBLISH at volume: one manifest commit
        // + renames of the constant-size staged files — never
        // data-volume work; near-FLAT is the claim
        "wap_publish" -> (() => {
          spark.sql(s"CALL gprobe.system.publish('f$f.snap_wap_stage')")
            .collect()
          require(graft.sources.SnapshotTable.read(
            spark, s"$scaledBase/f$f/snap_wap_tbl")
            .filter(col("event_type") === "staged").count() == 1000L,
            "the publish must land the staged census")
          spark.range(1).toDF()
        }),
        // PARTITIONED BY (days(ts)) INSERT at volume: scan + range
        // shuffle + write, LINEAR by design (sorted_write's shape on a
        // timestamp); the in-op require pins the manifest-only
        // day-range prune the declaration exists for
        "partitioned_write" -> (() => {
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          try spark.sql(s"INSERT INTO gprobe.f$f.snap_part_tbl " +
            s"SELECT event_id, event_type, ts FROM probe_part_src_f$f")
          finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
          val minDay = spark.sql(
            s"SELECT CAST(min(ts) AS DATE) FROM gprobe.f$f.snap_part_tbl")
            .head().getDate(0).toLocalDate
          val cutoff = minDay.plusDays(3)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
          val (kept, total) = graft.sources.SnapshotTable.pruneFiles(
            spark, s"$scaledBase/f$f/snap_part_tbl",
            Seq(graft.sources.SnapshotTable.StatFilter(
              "ts", upper = Some(cutoff))))
          require(total > 1 && kept.size < total,
            s"days(ts) must land day-pruneable files: ${kept.size}/$total")
          spark.range(1).toDF()
        }),
        // REPLACE WHERE at volume: quarter-range replace over the
        // range-clustered table — all-match files drop with ZERO data
        // I/O, kept files carry by reference, only boundary files
        // rewrite; wall is bounded by the boundary + the constant-size
        // batch, NOT the table (in-op requires: one commit, some
        // files carried by reference)
        // r16 DELETE VECTOR at volume: doom one constant band's
        // 'click' rows as a positional vector — ZERO data files
        // rewritten at any f, the position scan stat-bounded to the
        // band's files, metadata COUNT exact under the pending vector
        // (all required in-op); the wall is the band, never the table
        "dv_delete" -> (() => {
          import graft.sources.SnapshotTable
          val dir = s"$scaledBase/f$f/snap_dv_tbl"
          val vBefore = SnapshotTable.versions(spark, dir).last
          val before = SnapshotTable.files(spark, dir, vBefore)
          val nBefore = SnapshotTable.countRows(spark, dir, Some(vBefore))
          val q = (spark.read.parquet(s"$sfDir/events.parquet")
            .agg(max(col("event_id"))).head().getLong(0) + 1L) / 4L
          spark.sql(s"DELETE FROM gprobe.f$f.snap_dv_tbl " +
            s"WHERE event_id >= 0 AND event_id < $q AND event_type = 'click'")
          val vAfter = SnapshotTable.versions(spark, dir).last
          require(vAfter == vBefore + 1, "the DV delete must be ONE commit")
          require(SnapshotTable.files(spark, dir, vAfter) == before,
            "a DV delete must rewrite zero data files")
          val dvs = SnapshotTable.pendingDeleteVectors(spark, dir)
          require(dvs.size == 1 && dvs.head._2 > 0L,
            s"one exact-cardinality vector expected, got $dvs")
          require(dvs.head._3.size < before.size,
            "the vector must be bounded to the band's files, not the table")
          require(SnapshotTable.countRows(spark, dir) == nBefore - dvs.head._2,
            "metadata COUNT must stay exact under the pending vector")
          spark.range(1).toDF()
        }),
        // r16 STREAMING UPSERT at volume: drain 3 constant-size upsert
        // epochs into the N×-bigger table — each epoch is ONE atomic
        // version (batch + equality delete of its keys), zero
        // pre-existing files touched (in-op requires), so the drain
        // wall is the feed, never the table
        "stream_upsert_drain" -> (() => {
          import graft.sources.SnapshotTable
          val dir = s"$scaledBase/f$f/snap_ups_tbl"
          val vBefore = SnapshotTable.versions(spark, dir).last
          val before = SnapshotTable.files(spark, dir, vBefore).toSet
          val src = s"$scaledBase/f$f/ups_src"
          val schema = spark.read.parquet(src).schema
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
          graft.streaming.IncrementalSync.upsertSync(
            stream, dir, Seq("event_id"), s"$scaledBase/f$f/ups_ckpt")
            .awaitTermination()
          val vs = SnapshotTable.versions(spark, dir)
          require(vs.size == vBefore.toInt + 3,
            s"three epochs must land as three versions: $vs")
          require(vs.drop(vBefore.toInt).forall(v =>
            before.subsetOf(SnapshotTable.files(spark, dir, v).toSet)),
            "a streaming upsert must never touch a pre-existing file")
          require(SnapshotTable.pendingDeletes(spark, dir).size == 3,
            "each epoch carries its own equality delete")
          spark.range(1).toDF()
        }),
        // r16 DV UPDATE at volume: patch one constant band's 'click'
        // rows — the vector + a match-sized image batch commit as ONE
        // version, every pre-existing file carries by reference, and
        // the metadata COUNT is conserved (all required in-op); the
        // wall is the matched rows, never the table
        "dv_update" -> (() => {
          import graft.sources.SnapshotTable
          val dir = s"$scaledBase/f$f/snap_dvu_tbl"
          val vBefore = SnapshotTable.versions(spark, dir).last
          val before = SnapshotTable.files(spark, dir, vBefore).toSet
          val nBefore = SnapshotTable.countRows(spark, dir, Some(vBefore))
          val q = (spark.read.parquet(s"$sfDir/events.parquet")
            .agg(max(col("event_id"))).head().getLong(0) + 1L) / 4L
          val res = spark.sql(s"CALL gprobe.system.dv_update(" +
            s"'f$f.snap_dvu_tbl', " +
            s"'event_id >= 0 AND event_id < $q AND event_type = ''click''', " +
            "'event_type = ''patched''')").collect()
          require(res.head.getLong(1) > 0L, "the update must match rows")
          val vAfter = SnapshotTable.versions(spark, dir).last
          require(vAfter == vBefore + 1, "the DV update must be ONE commit")
          require(before.subsetOf(
            SnapshotTable.files(spark, dir, vAfter).toSet),
            "every pre-existing file must carry by reference")
          require(SnapshotTable.countRows(spark, dir) == nBefore,
            "the update conserves the metadata-exact count")
          spark.range(1).toDF()
        }),
        "replace_where" -> (() => {
          val dir = s"$scaledBase/f$f/snap_rw"
          val vBefore = graft.sources.SnapshotTable.versions(spark, dir).last
          val before = graft.sources.SnapshotTable
            .readManifest(spark, dir, vBefore).entries.map(_.path).toSet
          // replica 0's first quarter (base ids < 250k at sf0.1 scale)
          val q = (spark.read.parquet(s"$sfDir/events.parquet")
            .agg(max(col("event_id"))).head().getLong(0) + 1L) / 4L
          spark.range(0, 1000)
            .select(col("id").as("event_id"),
              lit("replaced").as("event_type"))
            .createOrReplaceTempView(s"probe_rw_batch_f$f")
          spark.sql(s"INSERT INTO gprobe.f$f.snap_rw " +
            s"REPLACE WHERE event_id < $q " +
            s"SELECT event_id, event_type FROM probe_rw_batch_f$f")
          val vAfter = graft.sources.SnapshotTable.versions(spark, dir).last
          require(vAfter == vBefore + 1, "REPLACE WHERE must be ONE commit")
          val after = graft.sources.SnapshotTable
            .readManifest(spark, dir, vAfter).entries.map(_.path).toSet
          require(before.intersect(after).nonEmpty,
            "none-matching files must carry by reference")
          spark.range(1).toDF()
        }),
        // DYNAMIC OVERWRITE at volume: backfill ONE day of the scaled
        // history — the touched day's files drop/rewrite, every other
        // day carries by reference (in-op requires: one commit, files
        // carried), so the wall is bounded by the day, never the table
        "dynamic_overwrite" -> (() => {
          val dir = s"$scaledBase/f$f/snap_dyn"
          val vBefore = graft.sources.SnapshotTable.versions(spark, dir).last
          val before = graft.sources.SnapshotTable
            .readManifest(spark, dir, vBefore).entries.map(_.path).toSet
          val d0 = spark.sql(
            s"SELECT CAST(min(ts) AS DATE) FROM gprobe.f$f.snap_dyn")
            .head().getDate(0)
          val prevMode =
            spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try spark.sql(s"INSERT OVERWRITE gprobe.f$f.snap_dyn " +
            s"SELECT event_id, 'backfilled', ts FROM probe_dyn_src_f$f " +
            s"WHERE CAST(ts AS DATE) = DATE '$d0' AND event_id % 2 = 0")
          finally prevMode.fold(
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
          val vAfter = graft.sources.SnapshotTable.versions(spark, dir).last
          require(vAfter == vBefore + 1, "dynamic overwrite must be ONE commit")
          val after = graft.sources.SnapshotTable
            .readManifest(spark, dir, vAfter).entries.map(_.path).toSet
          require(before.intersect(after).nonEmpty,
            "untouched-day files must carry by reference")
          spark.range(1).toDF()
        }),
        // MULTI-transform dynamic overwrite at volume: backfill ONE
        // (day, type) tuple of the (days(ts) × event_type) history —
        // the same day's OTHER types and every other day carry by
        // reference, so the wall is bounded by the tuple, never the
        // table (in-op requires: one commit, files carried, same-day
        // other-type rows intact)
        "dynamic_overwrite_multi" -> (() => {
          val dir = s"$scaledBase/f$f/snap_dynm"
          val vBefore = graft.sources.SnapshotTable.versions(spark, dir).last
          val before = graft.sources.SnapshotTable
            .readManifest(spark, dir, vBefore).entries.map(_.path).toSet
          val r0 = spark.sql(
            s"SELECT CAST(min(ts) AS DATE), min(event_type) " +
              s"FROM gprobe.f$f.snap_dynm").head()
          val d0 = r0.getDate(0); val t0 = r0.getString(1)
          val othersBefore = spark.sql(
            s"SELECT count(*) FROM gprobe.f$f.snap_dynm " +
              s"WHERE CAST(ts AS DATE) = DATE '$d0' AND event_type <> '$t0'")
            .head().getLong(0)
          val prevMode =
            spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try spark.sql(s"INSERT OVERWRITE gprobe.f$f.snap_dynm " +
            s"SELECT event_id, event_type, ts FROM probe_dynm_src_f$f " +
            s"WHERE CAST(ts AS DATE) = DATE '$d0' AND event_type = '$t0' " +
            "AND event_id % 2 = 0")
          finally prevMode.fold(
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
          val vAfter = graft.sources.SnapshotTable.versions(spark, dir).last
          require(vAfter == vBefore + 1,
            "multi-transform dynamic overwrite must be ONE commit")
          val after = graft.sources.SnapshotTable
            .readManifest(spark, dir, vAfter).entries.map(_.path).toSet
          require(before.intersect(after).nonEmpty,
            "untouched-tuple files must carry by reference")
          require(spark.sql(
            s"SELECT count(*) FROM gprobe.f$f.snap_dynm " +
              s"WHERE CAST(ts AS DATE) = DATE '$d0' AND event_type <> '$t0'")
            .head().getLong(0) == othersBefore,
            "the touched day's OTHER types must survive")
          spark.range(1).toDF()
        }),
        // bucketed-write FANOUT at volume: the same N× batch lands in
        // an 8-bucket table once with fanout (k·8 tasks) and once at
        // the bucket_n ceiling (8 tasks); the printed walls are the
        // cores-scaling evidence, the requires pin that fanout files
        // stay single-bucket and the two layouts join exchange-free
        "fanout_write" -> (() => {
          spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          val (wallFan, wallCeil) = try {
            def timed(tbl: String, limit: String = ""): Double = {
              val t0 = System.nanoTime()
              spark.sql(s"INSERT INTO gprobe.f$f.$tbl " +
                s"SELECT event_id, event_type, payload " +
                s"FROM probe_fan_src_f$f $limit")
              (System.nanoTime() - t0) / 1e9
            }
            // tiny warm-up first: the first timed SQL in a JVM pays
            // whole-stage codegen for both modes
            timed("fan_b", "LIMIT 1000")
            (timed("fan_a"), timed("fan_b"))
          } finally spark.conf.unset(
            "spark.sql.adaptive.coalescePartitions.enabled")
          println(f"SCALE-FANOUT factor=$f fanout_wall=$wallFan%.2f " +
            f"ceiling_wall=$wallCeil%.2f")
          val dirA = s"$scaledBase/f$f/fan_a"
          val m = graft.sources.SnapshotTable.readManifest(spark, dirA,
            graft.sources.SnapshotTable.versions(spark, dirA).last)
          val live = m.entries.filter(_.rows > 0)
          require(live.size > 8,
            s"fanout must land more files than bucket_n, got ${live.size}")
          require(live.forall(_.stats.contains("__bucket:event_id:8")),
            "every fanout file must stay single-bucket")
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          // exchange-free requirement scopes to the JOIN subtree (the
          // event_type aggregate above it legitimately shuffles)
          val j = spark.sql(s"SELECT a.event_id " +
            s"FROM gprobe.f$f.fan_a a JOIN gprobe.f$f.fan_b b " +
            "ON a.event_id = b.event_id")
          require(!j.queryExecution.executedPlan.toString.contains("Exchange"),
            "fanout and ceiling layouts must join exchange-free:\n" +
              j.queryExecution.executedPlan.toString)
          j.groupBy().count()
        }),
        // auto-rebucket THROUGH DML at volume: a scattered DELETE on a
        // bucket-declared table (hash layout: every file holds
        // matches — the honest full-rewrite cost), then the join must
        // plan ZERO exchanges with no manual rebucket: the rewrite
        // landed its replacement files bucket-clustered and the
        // commit recorded their __bucket stats
        "dml_rebucket" -> (() => {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.sql(s"DELETE FROM gprobe.f$f.rbk_a WHERE event_id % 1000 = 3")
          val j = spark.sql(s"SELECT a.event_type, b.score " +
            s"FROM gprobe.f$f.rbk_a a JOIN gprobe.f$f.rbk_b b " +
            "ON a.event_id = b.event_id")
          val plan = j.queryExecution.executedPlan.toString
          require(!plan.contains("Exchange"),
            s"post-DML SPJ must stay exchange-free without rebucket:\n$plan")
          j.groupBy("event_type").agg(sum("score").as("s"))
        }))
    }

    def selected(f: Int) = ops(f).filter { case (n, _) => wanted(n) }
    val walls = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (f <- Seq(1, factor); (name, build) <- selected(f)) {
      listener.reset()
      val t0 = System.nanoTime()
      val rows = build().count()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events post async and the bus drain API is
      // private[spark]; a short settle sleep is enough for a tool
      Thread.sleep(1000)
      // release between ops: localCheckpoint block cleanup rides the
      // ContextCleaner, which only fires after the owning RDD is
      // GC'd — a 35-op sweep otherwise accumulates dead checkpoint
      // blocks until a 30× op's execution memory starves (measured:
      // the full sweep OOM'd on an op that passes solo under the
      // same 8 GiB cap). Probe-tool concern only.
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      Thread.sleep(500)
      walls((name, f)) = secs
      println(f"SCALE op=$name factor=$f rows=$rows wall=$secs%.2f " +
        s"peakTaskShufReadB=${listener.peakShufRead} " +
        s"peakTaskShufWriteB=${listener.peakShufWrite} " +
        s"peakTaskInputB=${listener.peakInput} " +
        s"peakTaskShufRecords=${listener.peakShufRecords}")
    }
    for ((name, _) <- selected(1)) {
      val r = walls((name, factor)) / math.max(walls((name, 1)), 1e-9)
      println(f"SCALE ratio op=$name wall_x=$r%.2f vs data_x=$factor " +
        f"(sublinear-ok=${r <= factor * 1.2}%s)")
    }
    spark.stop()
  }
}
