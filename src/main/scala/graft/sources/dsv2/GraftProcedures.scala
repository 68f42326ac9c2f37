package graft.sources.dsv2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotTable

/** SQL STORED PROCEDURES for snapshot-table maintenance — the
  * `CALL` face of the operations a table needs on a schedule but SQL
  * DML cannot express (Spark 4's `ProcedureCatalog` tier, the shape
  * Iceberg's `CALL catalog.system.…` popularized):
  *
  * {{{
  *   CALL graft_cat.system.optimize(table => 'ns.events')
  *   CALL graft_cat.system.compact('ns.events', 134217728)
  *   CALL graft_cat.system.zorder('ns.events', 'user_id', 'ts', 134217728)
  *   CALL graft_cat.system.fold_deletes('ns.events')
  *   CALL graft_cat.system.expire_versions('ns.events', 10)
  *   CALL graft_cat.system.restore('ns.events', 3)
  *   CALL graft_cat.system.create_tag('ns.events', 'audit-2026')
  *   CALL graft_cat.system.clone('ns.events', 'ns.events_stage')
  * }}}
  *
  * Each procedure is a thin, loud binding over the already-proven
  * `SnapshotTable` maintenance primitive it names — the procedure tier
  * adds NO new table semantics, only SQL addressability: a pure-SQL
  * client (the 100 TB operations posture: scheduled jobs are SQL
  * strings in an orchestrator, not JVM closures) can now run the full
  * OPTIMIZE/expire/restore/tag lifecycle without a Scala import.
  * Tables are addressed by catalog identifier (`'ns.t'`, resolved
  * through the owning catalog like the TVF tier — physical paths
  * never leak into SQL). Every procedure returns its effect as a
  * result row (committed version / swept count), so orchestrators can
  * assert on outcomes instead of re-scanning state.
  *
  * Reference anchor: QAAPI runs its maintenance (truncate-reload,
  * stage purge) as explicitly invoked routines, not queries
  * (reference `Start.py main()` / `table_update_only()`); the CALL
  * tier is that surface re-expressed on Spark's procedure API.
  */
object GraftProcedures {

  // -- parameter shorthands -----------------------------------------
  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inD(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  // -- result plumbing ----------------------------------------------
  /** Procedure results ride a LocalScan — rows are computed ON THE
    * DRIVER inside `call()` (maintenance effects are driver-side
    * manifest commits; the heavy lifting inside them is ordinary
    * distributed Spark jobs), so the scan just hands them back. */
  private final case class ResultScan(
      out: StructType, rs: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = rs
    override def readSchema(): StructType = out
  }

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.map {
      case s: String => UTF8String.fromString(s)
      case o => o.asInstanceOf[Any]
    }.toArray)

  /** `'ns.t'` (or `'cat.ns.t'` for this catalog's own name) → Identifier. */
  private def identOf(cat: GraftSnapshotCatalog, s: String): Identifier = {
    val parts = s.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"malformed table identifier '$s'")
    val ps = if (parts.length > 1 && parts.head == cat.name()) parts.tail else parts
    Identifier.of(ps.init, ps.last)
  }

  private def dirOf(cat: GraftSnapshotCatalog, r: InternalRow, i: Int): String =
    cat.tableDir(identOf(cat, r.getUTF8String(i).toString))

  // -- the procedure shape ------------------------------------------
  private final class Proc(
      cat: GraftSnapshotCatalog,
      procName: String,
      doc: String,
      params: Array[ProcedureParameter],
      out: StructType,
      body: (SparkSession, InternalRow) => Seq[InternalRow])
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = doc
    // binding is trivial: the parameter list is fixed; Spark's
    // BindProcedures coerces arguments to the declared types and
    // fills defaults before call()
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val rs = body(SparkSession.active, input).toArray
      util.Collections.singletonList[Scan](ResultScan(out, rs)).iterator()
    }
  }

  private val DayMs = 24L * 3600 * 1000

  /** Split a SQL fragment list on TOP-LEVEL commas: paren depth
    * tracked, single-quoted SQL strings opaque (with '' escapes) — a
    * naive regex split breaks on commas inside string literals and on
    * quoted parens (an expression like `tag = 'a,b'` must stay one
    * assignment). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) {
        cur.append(ch)
        if (ch == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inStr = false
        }
      } else ch match {
        case '\'' => inStr = true; cur.append(ch)
        case '(' => depth += 1; cur.append(ch)
        case ')' => depth -= 1; cur.append(ch)
        case ',' if depth == 0 => out += cur.toString; cur.clear(): Unit
        case other => cur.append(other): Unit
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** The registry, keyed by procedure name under the `system` namespace. */
  private def procs(cat: GraftSnapshotCatalog): Map[String, UnboundProcedure] = Map(
    "optimize" -> new Proc(cat, "optimize",
      "one scheduled maintenance pass: fold MoR deletes, compact small " +
        "files, sweep orphans, expire manifest history",
      Array(in("table", StringType),
        inD("small_bytes", LongType, "8388608"),
        inD("target_bytes", LongType, "134217728"),
        inD("orphan_grace_ms", LongType, (DayMs: Long).toString),
        inD("keep_versions", IntegerType, "10")),
      StructType(Seq(
        StructField("deletes_folded", IntegerType, nullable = false),
        StructField("fold_version", LongType, nullable = true),
        StructField("compact_version", LongType, nullable = true),
        StructField("orphans_swept", IntegerType, nullable = false),
        StructField("versions_expired", IntegerType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        val optProps = GraftTableProps.read(s, dir)
        if (GraftTableProps.bucketSpec(optProps).isEmpty) {
          val rep = SnapshotTable.maintainTable(s, dir,
            smallBytes = r.getLong(1), targetBytes = r.getLong(2),
            orphanGraceMs = r.getLong(3), keepVersions = r.getInt(4))
          Seq(row(rep.deletesFolded, rep.foldVersion.map(Long.box).orNull,
            rep.compactVersion.map(Long.box).orNull,
            rep.orphansSwept, rep.versionsDropped))
        } else {
          // a BUCKET-declared table compacts WITHIN buckets (r16):
          // fold, bucket-aware compact, sweep, expire — same pass,
          // layout preserved (files merge only inside their bucket)
          val bucket = GraftTableProps.bucketSpec(optProps).get
          val pending = SnapshotTable.pendingDeletes(s, dir).size
          val headBefore = SnapshotTable.versions(s, dir).last
          val folded =
            if (pending > 0) Some(SnapshotTable.applyDeletes(s, dir)) else None
          val compactBefore = SnapshotTable.versions(s, dir).last
          val compacted = SnapshotTable.compactBucketsSmallFiles(s, dir,
            smallBytes = r.getLong(1), targetBytes = r.getLong(2),
            bucket = bucket)
          val orphans = SnapshotTable.gcOrphans(s, dir, r.getLong(3))
          val dropped = SnapshotTable.vacuum(s, dir, r.getInt(4))
          Seq(row(pending,
            folded.filter(_ > headBefore).map(Long.box).orNull,
            Some(compacted).filter(_ > compactBefore).map(Long.box).orNull,
            orphans, dropped))
        }
      }),

    "compact" -> new Proc(cat, "compact",
      "rewrite the head's files into ceil(bytes/target_bytes) compacted " +
        "files as a new version (OPTIMIZE)",
      Array(in("table", StringType),
        inD("target_bytes", LongType, "134217728")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        // a bucket-declared table compacts WITHIN buckets (r16): a
        // plain compaction would merge files across buckets, dropping
        // the __bucket stats and silently downgrading every
        // storage-partitioned join to a shuffle until a manual
        // rebucket (ADVICE r14) — the bucket-aware path merges each
        // bucket's sub-target files and keeps the layout armed
        GraftTableProps.bucketSpec(GraftTableProps.read(s, dir)) match {
          case Some(bucket) =>
            Seq(row(SnapshotTable.compactBucketsSmallFiles(s, dir,
              smallBytes = r.getLong(1), targetBytes = r.getLong(1),
              bucket = bucket)))
          case None =>
            Seq(row(SnapshotTable.compactHead(s, dir, r.getLong(1))))
        }
      }),

    "zorder" -> new Proc(cat, "zorder",
      "OPTIMIZE ZORDER: rewrite the head Morton-interleaved on two " +
        "columns so manifest stats prune on either",
      Array(in("table", StringType),
        in("col_a", StringType), in("col_b", StringType),
        inD("target_bytes", LongType, "134217728"),
        inD("bits", IntegerType, "16")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        // z-order and hash-bucketing are COMPETING layouts: a z-sorted
        // overwrite would silently drop every file's bucket stat and
        // downgrade the table's storage-partitioned joins — refuse
        // loudly instead of quietly trading one layout for the other
        require(GraftTableProps.bucketSpec(GraftTableProps.read(s, dir)).isEmpty,
          s"zorder: '${r.getUTF8String(0)}' declares bucket_cols — " +
            "z-ordering would destroy the bucket layout every " +
            "storage-partitioned join depends on; UNSET the bucket " +
            "TBLPROPERTIES first (or keep the buckets and CALL rebucket)")
        Seq(row(SnapshotTable.compactHeadZOrdered(
          s, dir, r.getUTF8String(1).toString,
          r.getUTF8String(2).toString, r.getLong(3), r.getInt(4))))
      }),

    "compact_where" -> new Proc(cat, "compact_where",
      "scoped OPTIMIZE: merge small files WITHIN the file set the " +
        "predicate provably covers (all-match by manifest stats) — " +
        "boundary and non-matching files untouched, so the rewrite is " +
        "bounded by the scope, never the table",
      Array(in("table", StringType), in("predicate", StringType),
        inD("small_bytes", LongType, "8388608"),
        inD("target_bytes", LongType, "134217728")),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("files_compacted", IntegerType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        // same posture as plain compact: a bucket layout must not be
        // merged across buckets — scoped compaction composes with
        // buckets only through the bucket-aware pass
        require(GraftTableProps.bucketSpec(GraftTableProps.read(s, dir)).isEmpty,
          s"compact_where: '${r.getUTF8String(0)}' declares bucket_cols — " +
            "merging scoped files would destroy the bucket layout; use " +
            "CALL compact (bucket-aware) or UNSET the bucket properties")
        val (v, n) = SnapshotTable.compactWhere(s, dir,
          org.apache.spark.sql.functions.expr(r.getUTF8String(1).toString),
          r.getLong(2), r.getLong(3))
        Seq(row(v, n))
      }),

    "fold_deletes" -> new Proc(cat, "fold_deletes",
      "fold pending merge-on-read deletes into the data (returns the " +
        "committed version; the head when none were pending)",
      Array(in("table", StringType)),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => Seq(row(SnapshotTable.applyDeletes(s, dirOf(cat, r, 0))))),

    "dv_delete" -> new Proc(cat, "dv_delete",
      "DELETE by arbitrary predicate as a positional delete vector: " +
        "zero data files rewritten, exact cardinality (countRows stays " +
        "metadata-only while pending); fold_deletes materializes it",
      Array(in("table", StringType), in("predicate", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("rows_deleted", LongType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        val before = SnapshotTable.versions(s, dir).last
        val v = SnapshotTable.commitDeleteVectorsWhere(
          s, dir, org.apache.spark.sql.functions.expr(
            r.getUTF8String(1).toString))
        val n =
          if (v == before) 0L
          else SnapshotTable.pendingDeleteVectors(s, dir, Some(v))
            .filter(_._1 == v).map(_._2).sum
        Seq(row(v, n))
      }),

    "dv_update" -> new Proc(cat, "dv_update",
      "UPDATE by arbitrary predicate as delete vector + append in ONE " +
        "commit: rewrite cost = matched ROWS, never touched files; " +
        "row count conserved, so metadata COUNT stays exact throughout",
      Array(in("table", StringType), in("predicate", StringType),
        in("assignments", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("rows_updated", LongType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        // assignments: 'col = expr, col2 = expr2' — split on
        // TOP-LEVEL commas (parens tracked, quoted SQL strings
        // opaque), then take the identifier before the FIRST '='
        val Assign = "(?s)\\s*([A-Za-z_][\\w]*)\\s*=\\s*(.+)".r
        val sets = splitTopLevel(r.getUTF8String(2).toString).map {
            case Assign(c, e) =>
              c -> org.apache.spark.sql.functions.expr(e.trim)
            case other => throw new IllegalArgumentException(
              s"dv_update: cannot parse assignment '$other' — " +
                "expected 'column = <sql expression>'")
          }.toMap
        val expect = GraftTableProps.expectations(GraftTableProps.read(s, dir))
        val before = SnapshotTable.versions(s, dir).last
        val v = SnapshotTable.commitUpdateVectorsWhere(s, dir,
          org.apache.spark.sql.functions.expr(r.getUTF8String(1).toString),
          sets, expect)
        val n =
          if (v == before) 0L
          else SnapshotTable.pendingDeleteVectors(s, dir, Some(v))
            .filter(_._1 == v).map(_._2).sum
        Seq(row(v, n))
      }),

    "evolve_partitioning" -> new Proc(cat, "evolve_partitioning",
      "replace the table's PARTITIONED BY spec (partition evolution): " +
        "metadata-only — existing files keep their layout and stay " +
        "exactly readable, future writes cluster by the new spec; the " +
        "census and dynamic overwrite follow the new spec (old files " +
        "report as straddlers / classify as boundary until rewritten)",
      Array(in("table", StringType), in("spec", StringType)),
      StructType(Seq(
        StructField("old_spec", StringType, nullable = true),
        StructField("new_spec", StringType, nullable = true))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        val ident = r.getUTF8String(0).toString
        val schema = new SnapshotCatalogTable(dir, ident, None).schema()
        val (o, n) = GraftTableProps.evolvePartitioning(
          s, dir, ident, r.getUTF8String(1).toString, schema)
        Seq(row(o.orNull, n.orNull))
      }),

    "expire_versions" -> new Proc(cat, "expire_versions",
      "vacuum manifest history by count, deleting data files only the " +
        "expired versions referenced",
      Array(in("table", StringType), inD("keep_versions", IntegerType, "10")),
      StructType(Seq(StructField("files_deleted", IntegerType, nullable = false))),
      (s, r) => Seq(row(
        SnapshotTable.vacuum(s, dirOf(cat, r, 0), r.getInt(1))))),

    "expire_older_than" -> new Proc(cat, "expire_older_than",
      "vacuum manifest history by commit timestamp (epoch ms), keeping " +
        "the head regardless",
      Array(in("table", StringType), in("older_than_ms", LongType)),
      StructType(Seq(StructField("files_deleted", IntegerType, nullable = false))),
      (s, r) => Seq(row(
        SnapshotTable.vacuumOlderThan(s, dirOf(cat, r, 0), r.getLong(1))))),

    "gc_orphans" -> new Proc(cat, "gc_orphans",
      "delete data files no manifest references (crashed writers, lost " +
        "races) older than the grace",
      Array(in("table", StringType), inD("grace_ms", LongType, (DayMs: Long).toString)),
      StructType(Seq(StructField("files_deleted", IntegerType, nullable = false))),
      (s, r) => Seq(row(
        SnapshotTable.gcOrphans(s, dirOf(cat, r, 0), r.getLong(1))))),

    "gc_dropped" -> new Proc(cat, "gc_dropped",
      "physically sweep DROP TABLE tombstones older than the grace " +
        "across the whole catalog root",
      Array(inD("grace_ms", LongType, (DayMs: Long).toString)),
      StructType(Seq(StructField("tables_swept", IntegerType, nullable = false))),
      (s, r) => Seq(row(
        SnapshotTable.gcDroppedTables(s, cat.rootDir, r.getLong(0))))),

    "restore" -> new Proc(cat, "restore",
      "roll the table back to a prior version as a NEW commit (history " +
        "is preserved; nothing is deleted)",
      Array(in("table", StringType), in("version", LongType)),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => Seq(row(
        SnapshotTable.restore(s, dirOf(cat, r, 0), r.getLong(1))))),

    "create_tag" -> new Proc(cat, "create_tag",
      "name a version (default: the head) — a human-meaningful pointer " +
        "into the history; re-tagging a taken name fails loudly",
      Array(in("table", StringType), in("tag", StringType),
        inD("version", LongType, "CAST(NULL AS BIGINT)")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        val v = if (r.isNullAt(2)) SnapshotTable.versions(s, dir).last
        else r.getLong(2)
        SnapshotTable.createTag(s, dir, r.getUTF8String(1).toString, v)
        Seq(row(v))
      }),

    "delete_tag" -> new Proc(cat, "delete_tag",
      "delete a tag (the reference only; data and history are untouched)",
      Array(in("table", StringType), in("tag", StringType)),
      StructType(Seq(StructField("deleted", BooleanType, nullable = false))),
      (s, r) => {
        SnapshotTable.deleteTag(s, dirOf(cat, r, 0), r.getUTF8String(1).toString)
        Seq(row(true))
      }),

    "clone" -> new Proc(cat, "clone",
      "zero-copy shallow clone of a version (default: the head) into a " +
        "NEW table identifier — the staging half of write-audit-publish",
      Array(in("source", StringType), in("target", StringType),
        inD("version", LongType, "CAST(NULL AS BIGINT)")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => {
        val srcDir = dirOf(cat, r, 0)
        val dstDir = cat.newTableDir(identOf(cat, r.getUTF8String(1).toString))
        val v = if (r.isNullAt(2)) None else Some(r.getLong(2))
        val cv = SnapshotTable.cloneTable(s, srcDir, dstDir, v)
        // the clone inherits the source's write-path config
        // (TBLPROPERTIES) — its future inserts should cluster the same
        val props = GraftTableProps.read(s, srcDir)
        if (props.nonEmpty) GraftTableProps.write(s, dstDir, props)
        Seq(row(cv))
      }),

    "rebucket" -> new Proc(cat, "rebucket",
      "restore a bucket-declared table's SPJ-eligible layout after " +
        "row-level DML or compaction downgraded it: one overwrite " +
        "commit that re-places every row (repartition(n, col)) — both " +
        "the compaction and the re-bucketing in one rewrite",
      Array(in("table", StringType)),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => {
        val dir = dirOf(cat, r, 0)
        val bucket = GraftTableProps.bucketSpec(GraftTableProps.read(s, dir))
          .getOrElse(throw new IllegalArgumentException(
            s"rebucket: '${r.getUTF8String(0)}' declares no " +
              "bucket_cols/bucket_n TBLPROPERTIES"))
        val props = GraftTableProps.read(s, dir)
        val statsCols = (GraftTableProps.cols(props, "stats_cols") ++
          GraftTableProps.cols(props, "sort_cols")).distinct
        val df = SnapshotTable.read(s, dir)
          .repartition(
            bucket._2 * GraftTableProps.bucketFanout(props, bucket._2),
            org.apache.spark.sql.functions.col(bucket._1))
        Seq(row(SnapshotTable.commitOverwrite(df, dir,
          statsCols = statsCols,
          bloomCols = GraftTableProps.cols(props, "bloom_cols"),
          bucket = Some(bucket))))
      }),

    "publish" -> new Proc(cat, "publish",
      "write-audit-publish's publish half: atomically fast-forward the " +
        "clone's source table to the audited staging state (aborts " +
        "loudly if the source moved since the clone; consumes the " +
        "staging table)",
      Array(in("staging", StringType)),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (s, r) => {
        val stagingDir = dirOf(cat, r, 0)
        val (provSrc, _) = SnapshotTable.clonedFrom(s, stagingDir).getOrElse(
          throw new IllegalArgumentException(
            s"publish: '${r.getUTF8String(0)}' records no clone provenance — " +
              "stage with CALL system.clone first"))
        Seq(row(SnapshotTable.publishClone(s, stagingDir, provSrc)))
      }))

  private[dsv2] val Namespace: Array[String] = Array("system")

  def load(cat: GraftSnapshotCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"catalog ${cat.name()} keeps its procedures under the 'system' " +
        s"namespace — CALL ${cat.name()}.system.${ident.name()}(…)")
    procs(cat).getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new UnsupportedOperationException(
        s"no procedure ${cat.name()}.system.${ident.name()} — available: " +
          procs(cat).keys.toSeq.sorted.mkString(", ")))
  }

  def list(cat: GraftSnapshotCatalog, namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(Namespace) && namespace.nonEmpty) Array.empty
    else procs(cat).keys.toSeq.sorted
      .map(Identifier.of(Namespace, _)).toArray
}
