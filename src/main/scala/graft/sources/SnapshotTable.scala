package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

/** A minimal snapshot-manifest table format — the commit-semantics
  * half the plain-directory sinks deliberately lack (Sinks scaladoc:
  * "a production deployment points this at a format with commit
  * semantics instead"; the in-box transactional formats aren't on the
  * classpath, so this builds the essential mechanism from the same
  * Hadoop FS primitives). The design is the Iceberg/Delta core
  * reduced to its load-bearing minimum:
  *
  *  - Data files are immutable: every commit writes its rows under a
  *    fresh `batch-<uuid>/` subdir — never into a live one.
  *  - A version is a MANIFEST, `_manifests/v<n>.json`: the explicit
  *    file list that IS the table at that version. Readers list one
  *    small JSON and scan exactly those files — no directory listing
  *    of the data tree, which at 100 TB is the difference between a
  *    metadata read and a million-file LIST.
  *  - Commits are optimistic concurrency via rename-if-absent: the
  *    manifest is staged as a tmp file and renamed to the next
  *    version slot; Hadoop rename fails if the destination exists, so
  *    two racing committers serialize — the loser re-reads the new
  *    head and retries on top of it (snapshot isolation: readers of
  *    version n are never affected).
  *  - Append = head manifest's files + the new batch; overwrite = the
  *    new batch alone. Old versions stay readable (time travel) until
  *    `vacuum` drops the files only unreferenced manifests name.
  *
  * Readers get plain parquet scans (pushdown, pruning, codegen — the
  * manifest only chooses the file set), so every downstream operator
  * composes unchanged.
  */
object SnapshotTable {

  private val ManifestDir = "_manifests"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long): Path =
    new Path(s"$dir/$ManifestDir/v$v.json")

  /** All committed versions, ascending. Empty for a fresh/absent dir. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val md = new Path(s"$dir/$ManifestDir")
    val f = fs(spark, dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  /** The file list a version names (paths relative to `dir`). */
  private def manifestFiles(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    if (!f.exists(p))
      throw new IllegalArgumentException(s"snapshot table $dir has no version $v")
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // the manifest is our own write (one "files" array of quoted
    // relative paths) — a full JSON parser would be dead weight
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  /** The file list version `v` names (paths relative to `dir`) — the
    * public face of the manifest, for compaction accounting and
    * layout asserts. */
  def files(spark: SparkSession, dir: String, v: Long): Seq[String] =
    manifestFiles(spark, dir, v)

  /** Read the table at `version` (default: the head). The scan is a
    * plain multi-file parquet read over exactly the manifest's files.
    */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"snapshot table $dir has no committed version")
    val v = version.getOrElse(vs.last)
    val files = manifestFiles(spark, dir, v)
    require(files.nonEmpty, s"version $v of $dir is empty")
    // mergeSchema: additive evolution for free — a version whose
    // batches carry different (compatible) schemas reads as their
    // union, old rows null in the new columns. The footer pass is
    // per-manifest-file, bounded by the version's file list.
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Append `df` as a new version; returns the committed version. */
  def commitAppend(df: DataFrame, dir: String): Long = commit(df, dir, append = true)

  /** Replace the table contents with `df` as a new version (old
    * versions stay readable until vacuum). */
  def commitOverwrite(df: DataFrame, dir: String): Long = commit(df, dir, append = false)

  /** Stream-batch ids already committed to the table's manifests. */
  def committedBatchIds(spark: SparkSession, dir: String): Set[Long] = {
    val f = fs(spark, dir)
    versions(spark, dir).flatMap { v =>
      val in = f.open(manifestPath(dir, v))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      "\"batchId\": (\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong)
    }.toSet
  }

  /** Idempotent streaming append: the committed manifest carries the
    * micro-batch id, so a REPLAYED batch (foreachBatch is
    * at-least-once on failure/restart) finds its id in the ledger and
    * no-ops — the version ledger turns the sink's at-least-once
    * contract into exactly-once appends, the same ledger trick the
    * transactional formats use. Returns the committed version, or
    * None for a recognized replay.
    */
  def commitStreamBatch(df: DataFrame, dir: String, batchId: Long): Option[Long] =
    if (committedBatchIds(df.sparkSession, dir).contains(batchId)) None
    else Some(commit(df, dir, append = true, batchId = Some(batchId)))

  private def commit(
      df: DataFrame, dir: String, append: Boolean,
      batchId: Option[Long] = None): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val batch = s"batch-${UUID.randomUUID().toString}"
    df.write.parquet(s"$dir/$batch")
    val batchFiles = f.listStatus(new Path(s"$dir/$batch")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(n => s"$batch/$n")
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 20, s"commit to $dir lost 20 straight races; giving up")
      val head = versions(spark, dir).lastOption
      val files =
        (if (append) head.map(manifestFiles(spark, dir, _)).getOrElse(Nil) else Nil) ++
          batchFiles
      val next = head.getOrElse(0L) + 1
      val bid = batchId.map(b => s""", "batchId": $b""").getOrElse("")
      val body = files.map(p => "\"" + p + "\"").mkString(
        s"""{"version": $next$bid, "files": [""", ", ", "]}")
      val tmp = new Path(s"$dir/$ManifestDir/.tmp-${UUID.randomUUID()}.json")
      f.mkdirs(new Path(s"$dir/$ManifestDir"))
      val out = f.create(tmp, false)
      try out.write(body.getBytes(UTF_8)) finally out.close()
      // rename-if-absent IS the commit: a racing writer that landed
      // v(next) first makes this rename fail, and we retry on top of
      // the new head — its files join ours on the append path
      if (f.rename(tmp, manifestPath(dir, next))) return next
      f.delete(tmp, false)
    }
    -1L // unreachable
  }

  /** OPTIMIZE: rewrite the head's file set into ceil(bytes / target)
    * compacted files and commit the result as a NEW version — the
    * Sinks.compact operation lifted into the format, where it belongs
    * at scale: readers of in-flight older versions are untouched (they
    * hold their manifest's files, which vacuum respects), and the
    * swap is the same manifest rename every commit uses — no
    * rename-aside dance over live directories. Returns the committed
    * version.
    */
  def compactHead(spark: SparkSession, dir: String, targetBytes: Long): Long = {
    require(targetBytes > 0)
    val f = fs(spark, dir)
    val head = versions(spark, dir).lastOption.getOrElse(
      throw new IllegalArgumentException(s"snapshot table $dir has no committed version"))
    val files = manifestFiles(spark, dir, head)
    val bytes = files.map(p => f.getFileStatus(new Path(s"$dir/$p")).getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    commitOverwrite(read(spark, dir).coalesce(n), dir)
  }

  /** MERGE: upsert `delta` into the head by key (update matched rows,
    * insert new ones — Maintenance.upsertKeepCols' algebra) and
    * commit the merged state as a new version. One full-outer join +
    * one batch write; history stays time-travelable.
    */
  def commitMerge(delta: DataFrame, dir: String, keys: Seq[String]): Long =
    commitOverwrite(
      graft.operators.Maintenance.upsertKeepCols(
        read(delta.sparkSession, dir), delta, keys, keepCols = Set.empty),
      dir)

  /** DELETE by key: drop the head rows whose key appears in `keys`
    * (one anti join) and commit the survivors as a new version — the
    * GDPR-erasure / retraction shape, with the deleted rows still
    * time-travelable until vacuum ages their versions out (the
    * retention caveat of every versioned format: erasure completes at
    * vacuum, not at commit).
    */
  def commitDelete(keys: DataFrame, dir: String, keyCols: Seq[String]): Long =
    commitOverwrite(
      read(keys.sparkSession, dir)
        .join(keys.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
          .distinct(), keyCols, "left_anti"),
      dir)

  /** CDC between two versions: every row added or removed from
    * `fromV` to `toV`, tagged `_change` ∈ insert|delete. Two paths,
    * picked by the MANIFESTS alone: if the from-version's file set is
    * a subset of the to-version's (pure appends — the common history
    * shape), the change set IS the added files, read directly — a
    * zero-compute file-level diff no matter how large the table; any
    * rewriting commit between them (merge, delete, optimize) falls
    * back to a content diff (exceptAll both ways — multiset-exact,
    * one shuffle each). Downstream incremental consumers (a
    * mergeAdditive refresh, a sync) read the changes instead of
    * rescanning the corpus.
    */
  def changesBetween(
      spark: SparkSession, dir: String, fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"changesBetween: need fromV < toV, got $fromV >= $toV")
    val ff = manifestFiles(spark, dir, fromV).toSet
    val tf = manifestFiles(spark, dir, toV).toSet
    import org.apache.spark.sql.functions.lit
    if (ff.subsetOf(tf)) {
      val added = (tf -- ff).toSeq.sorted
      if (added.isEmpty)
        read(spark, dir, Some(toV)).limit(0).withColumn("_change", lit("insert"))
      else spark.read.option("mergeSchema", "true")
        .parquet(added.map(f => s"$dir/$f"): _*)
        .withColumn("_change", lit("insert"))
    } else {
      val from = read(spark, dir, Some(fromV))
      val to = read(spark, dir, Some(toV))
      to.exceptAll(from).withColumn("_change", lit("insert"))
        .unionByName(from.exceptAll(to).withColumn("_change", lit("delete")))
    }
  }

  /** Drop data files referenced by NO retained manifest, keeping the
    * newest `keepVersions` manifests (and every version's
    * readability within them). Returns the number of files deleted.
    *
    * Interaction with the streaming ledger: dropped manifests take
    * their batch ids with them, so a batch REPLAYED from before the
    * retained window would re-commit. Keep `keepVersions` beyond the
    * longest plausible replay horizon (a restarted AvailableNow run
    * replays only uncommitted offsets, so in practice this means:
    * don't vacuum between a crash and its restart).
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int): Int = {
    require(keepVersions >= 1, "vacuum must keep at least the head version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live = keep.flatMap(manifestFiles(spark, dir, _)).toSet
    val dead = drop.flatMap(manifestFiles(spark, dir, _)).toSet -- live
    dead.foreach(p => f.delete(new Path(s"$dir/$p"), false))
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    // empty batch dirs left behind are litter, not state — sweep them
    f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-"))
      .filter(s => f.listStatus(s.getPath).isEmpty)
      .foreach(s => f.delete(s.getPath, false))
    dead.size
  }
}
