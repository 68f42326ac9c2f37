package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Materialized-view routing: a registered summary table answers
  * matching aggregates over its base table, so a full corpus scan
  * becomes a kilobyte summary read. This is the optimizer-extension
  * tier of the engine (SparkSessionExtensions.injectOptimizerRule —
  * the one extension point the expression family doesn't exercise):
  * the rewrite happens INSIDE Catalyst's fixed-point batch, so plain
  * `spark.read.parquet(base).groupBy(...).agg(...)` — or the SQL
  * equivalent — is routed with no query-side opt-in, and later
  * rules (column pruning, partition pruning) then optimize the
  * summary scan they were handed. Mirrors the reference's summary
  * tables over QA contact aggregates (`qa_api_handler.py:146-152`
  * reports grouped counts the handler recomputes per call — the shape
  * this rule memoizes).
  *
  * The classic rollup-compatibility contract (Gupta & Mumick,
  * "Maintenance of Materialized Views", IEEE DE Bull. 1995; same
  * re-aggregation algebra as Incremental.mergeAdditive): a query
  * Aggregate routes iff its grouping columns are a SUBSET of the
  * view's, every aggregate is derivable (count(*) → sum(cnt),
  * sum(x) → sum(sum_x), min(x) → min(min_x), max(x) → max(max_x),
  * avg(x) → sum(sum_x)/sum(cnt) — no distinct, no filter clauses), and any WHERE conjuncts
  * reference grouping columns only (they re-apply to the view rows
  * unchanged). Anything else leaves the plan untouched — the rule is
  * fail-open by construction: not rewriting is always correct.
  *
  * Staleness is the footgun of every summary-routing design (the
  * BloomJoin index carries the same scar — its key fingerprint was an
  * ADVICE r9 fix): a view built yesterday silently answers for rows
  * appended today. register() therefore captures the base table's
  * file-listing fingerprint (names + total bytes — metadata-only),
  * and the rule re-checks it against the query's own already-listed
  * FileIndex at rewrite time: zero extra IO, and any file added,
  * dropped, or replaced under the base path flips the fingerprint and
  * the rule falls back to the base scan. The VIEW side is a snapshot
  * by contract — rebuild + re-register after maintenance.
  */
object MvRewrite {

  /** One registered view: the analyzed scan of its parquet (snapshot),
    * its grouping columns, the measure map ((fn, baseCol) → view
    * column), and the base fingerprint guarding freshness. */
  private[plans] case class MvDef(
      mvAnalyzed: LogicalPlan,
      groupCols: Seq[String],
      measures: Map[(String, String), String],
      baseFingerprint: Long)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, List[MvDef]]()

  private[plans] def lookup(rootPath: String): List[MvDef] =
    Option(registry.get(rootPath)).getOrElse(Nil)
  private[plans] def isEmpty: Boolean = registry.isEmpty

  /** Build the summary parquet for (groupCols, count(*) + per-column
    * sum/min/max) — the only write shape register() accepts, so the
    * measure-name convention (cnt, sum_c, min_c, max_c) can't drift
    * between build and rewrite. One shuffle on the grouping key;
    * output is |distinct groups| rows, the 100 TB → kilobytes step.
    *
    * Answer-preservation caveat (applies to register() too): every
    * derivation is exact EXCEPT avg over fractional doubles when the
    * view grouping is strictly finer than the query's — there
    * sum(sum_x)/sum(cnt) re-associates double additions and can
    * differ from the unrouted avg in the last ULPs. Integral values
    * (even when held in doubles) re-associate exactly. Callers
    * comparing routed vs unrouted answers BITWISE should register
    * fractional sum columns only at the grain they query.
    */
  def materialize(
      base: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      mvDir: String): Unit = {
    require(groupCols.nonEmpty, "materialize: need at least one grouping column")
    val aggs = count(lit(1)).as("cnt") +:
      (sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c")))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvDir)
  }

  /** Register mvDir (written by materialize with the same column
    * lists) as A summary of basePath — several views may coexist per
    * base (the rule picks the coarsest fresh one that answers);
    * re-registering the same grouping replaces that view. Captures
    * the base fingerprint NOW — queries rewrite only while the base
    * listing still matches it — and PERSISTS the registration as
    * `_mv_catalog.json` beside the summary (underscore-prefixed, so
    * parquet readers of mvDir never see it): a registration is not
    * JVM-lifetime state, `loadCatalog` — or the
    * `spark.graft.mv.autoload` session conf — restores routing in a
    * fresh session with no re-register call. See materialize() for
    * the avg-over-fractional-doubles ULP caveat.
    */
  def register(
      spark: SparkSession,
      basePath: String,
      mvDir: String,
      groupCols: Seq[String],
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): Unit = {
    val fp = registerWith(spark, basePath, mvDir, groupCols, sumCols, minCols, maxCols, None)
    // persist the registration beside the summary it describes
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("basePath", basePath)
    root.put("baseFingerprint", fp)
    def arr(k: String, vs: Seq[String]): Unit = {
      val a = root.putArray(k); vs.foreach(a.add)
    }
    arr("groupCols", groupCols); arr("sumCols", sumCols)
    arr("minCols", minCols); arr("maxCols", maxCols)
    val p = new org.apache.hadoop.fs.Path(s"$mvDir/_mv_catalog.json")
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fsys.create(p, true)
    try out.write(mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Restore a persisted registration from `mvDir/_mv_catalog.json`
    * (written by register) into THIS session's registry — the
    * catalog, not the JVM, is the durable home of a registration.
    * The STORED base fingerprint is restored, not recaptured: a base
    * that changed since materialization must stay unroutable, exactly
    * as it would mid-session. */
  def loadCatalog(spark: SparkSession, mvDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$mvDir/_mv_catalog.json")
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fsys.exists(p), s"loadCatalog: no _mv_catalog.json under $mvDir")
    val in = fsys.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    def arr(k: String): Seq[String] = {
      val a = root.get(k); (0 until a.size).map(a.get(_).asText)
    }
    registerWith(spark, root.get("basePath").asText, mvDir,
      arr("groupCols"), arr("sumCols"), arr("minCols"), arr("maxCols"),
      Some(root.get("baseFingerprint").asLong))
  }

  /** The base's analyzed scan: a SNAPSHOT-TABLE dir reads through its
    * manifest (head version), a plain dir through spark.read.parquet. */
  private def baseRelation(
      spark: SparkSession, basePath: String): Option[LogicalRelation] = {
    val df =
      if (graft.sources.SnapshotTable.versions(spark, basePath).nonEmpty)
        graft.sources.SnapshotTable.read(spark, basePath)
      else spark.read.parquet(basePath)
    relationOf(df.queryExecution.analyzed)
  }

  private def registerWith(
      spark: SparkSession,
      basePath: String,
      mvDir: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String],
      maxCols: Seq[String],
      storedFp: Option[Long]): Long = {
    val baseScan = baseRelation(spark, basePath)
      .getOrElse(throw new IllegalArgumentException(
        s"register: $basePath did not analyze to a file relation"))
    val measures = Map(("count", "*") -> "cnt") ++
      sumCols.map(c => ("sum", c) -> s"sum_$c") ++
      minCols.map(c => ("min", c) -> s"min_$c") ++
      maxCols.map(c => ("max", c) -> s"max_$c")
    val fp = storedFp.getOrElse(fingerprint(baseScan))
    val d = MvDef(
      spark.read.parquet(mvDir).queryExecution.analyzed,
      groupCols, measures, fp)
    // several views per base (daily + monthly + ...); re-registering
    // the same grouping replaces that view's snapshot
    registry.compute(rootOf(baseScan), (_, old) =>
      Option(old).getOrElse(Nil).filterNot(_.groupCols == groupCols) :+ d)
    fp
  }

  /** Drops EVERY registered view of basePath (the whole-base reset;
    * re-register the survivors to keep a subset). */
  def deregister(spark: SparkSession, basePath: String): Unit =
    baseRelation(spark, basePath)
      .foreach(lr => registry.remove(rootOf(lr)))

  def clear(): Unit = registry.clear()

  private[plans] def relationOf(plan: LogicalPlan): Option[LogicalRelation] =
    plan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] => lr
    }

  /** Registry key. A snapshot-table read keys on the TABLE DIR — its
    * root paths are per-version data files, so keying on them would
    * unmatch the registration after every commit; the version guard is
    * the fingerprint's job, not the key's. */
  private[plans] def rootOf(lr: LogicalRelation): String =
    snapshotDirOf(lr).map(_.toString).getOrElse(
      lr.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.map(_.toString).sorted.mkString(","))

  /** Test hook: how many times the LISTING fingerprint ran (the
    * O(files) fallback). MvRewriteSpec asserts it stays ZERO on the
    * snapshot-table path — the r11 "O(files) listing per planning
    * pass" finding, closed. */
  private[graft] val listingFingerprints =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** The snapshot-table dir behind a relation, when the relation IS a
    * snapshot read: every root path is a data file under a
    * `<dir>/batch-…` subdir, and `<dir>/_manifests` exists (ONE
    * existence probe, gated behind the cheap name test so plain
    * parquet scans never pay it). A clone's mixed absolute externals
    * fail the same-dir check and fall back — conservative. */
  private def snapshotDirOf(lr: LogicalRelation): Option[org.apache.hadoop.fs.Path] = {
    val rel = lr.relation.asInstanceOf[HadoopFsRelation]
    val roots = rel.location.rootPaths
    val parent0 = if (roots.isEmpty) null else roots.head.getParent
    if (parent0 == null || !parent0.getName.startsWith("batch-")) None
    else {
      val dir = parent0.getParent
      if (dir == null) None
      else if (!roots.forall { p =>
        val par = p.getParent
        par != null && par.getName.startsWith("batch-") && par.getParent == dir
      }) None
      else {
        val mPath = new org.apache.hadoop.fs.Path(dir, "_manifests")
        val fs = dir.getFileSystem(
          rel.sparkSession.sparkContext.hadoopConfiguration)
        if (fs.exists(mPath)) Some(dir) else None
      }
    }
  }

  /** Metadata-only freshness token. SNAPSHOT-TABLE bases (the relation
    * scans `<dir>/batch-*` files and `<dir>/_manifests` exists) pay
    * O(1): the head manifest VERSION — one tiny directory listing of
    * version names, no data-file listing at any table size — combined
    * with an order-independent hash of the relation's own root paths
    * (already in memory; guards a time-travel read of an OLD version
    * from routing to a head-registered view). Plain dirs fall back to
    * the murmur over the sorted file list plus total size; parquet
    * writers use unique part names, so append/overwrite/compact all
    * move it.
    */
  private[plans] def fingerprint(lr: LogicalRelation): Long =
    snapshotDirOf(lr) match {
      case Some(dir) =>
        val rel = lr.relation.asInstanceOf[HadoopFsRelation]
        val head = graft.sources.SnapshotTable
          .versions(rel.sparkSession, dir.toString).lastOption.getOrElse(-1L)
        // commutative fold: root order varies, the set does not
        var h = 0L
        rel.location.rootPaths.foreach(p => h += p.toString.hashCode.toLong)
        head * 1000003L + h
      case None =>
        listingFingerprints.incrementAndGet()
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        val names = fs.location.inputFiles.sorted
        var h = 1125899906842597L
        names.foreach { n => h = h * 31 + n.hashCode }
        h * 31 + fs.sizeInBytes
    }
}

/** The rule itself — injected per session by GraftExtensions. Runs in
  * the operator-optimization fixed point, so it must be (and is)
  * idempotent: a rewritten Aggregate's child is the VIEW's relation,
  * whose root path is not a registry key.
  */
case class MvRewriteRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** Once per session: restore persisted registrations named by the
    * `spark.graft.mv.autoload` conf (comma-separated summary dirs) —
    * a restarted session routes again without any re-register call.
    * Best-effort: a missing/unreadable catalog is logged and skipped,
    * never a query failure (fail-open, like the rewrite itself). */
  private lazy val autoloaded: Unit =
    spark.conf.getOption("spark.graft.mv.autoload").foreach {
      _.split(",").map(_.trim).filter(_.nonEmpty).foreach { d =>
        try MvRewrite.loadCatalog(spark, d)
        catch { case e: Exception =>
          logWarning(s"mv autoload skipped $d: ${e.getMessage}") }
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    autoloaded
    if (MvRewrite.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }
  }

  /** Aggregate → (base relation, accumulated WHERE conjuncts), seeing
    * through the pruning Projects and pushed Filters the earlier
    * optimizer rounds leave between them. Attribute-only Projects:
    * anything computed would need its own derivability proof.
    */
  private def unwrap(
      p: LogicalPlan,
      conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some((lr, conds))
      case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(ch, conds)
      case Filter(c, ch) => unwrap(ch, conds ++ splitConjunctivePredicates(c))
      case _ => None
    }

  /** Among every registered-and-fresh view of the base, the COARSEST
    * one that can answer wins (fewest grouping columns ⊇ the query's
    * = fewest summary rows re-aggregated) — the view-selection half
    * of summary routing: a daily AND a monthly rollup can both be
    * registered, and a month-grain query reads the monthly one.
    */
  private def rewrite(agg: Aggregate): Option[Aggregate] =
    unwrap(agg.child, Nil).flatMap { case (lr, conds) =>
      // registry lookup FIRST: unregistered bases (including the
      // view's own relation after a rewrite) must never pay a
      // fingerprint — the listing form is O(files)
      val views = MvRewrite.lookup(MvRewrite.rootOf(lr))
      if (views.isEmpty) None
      else {
        val fp = MvRewrite.fingerprint(lr)
        views
          .filter(_.baseFingerprint == fp)
          .flatMap(d => attempt(agg, conds, d).map(d -> _))
          .sortBy(_._1.groupCols.size)
          .headOption.map(_._2)
      }
    }

  private def attempt(
      agg: Aggregate,
      conds: Seq[Expression],
      d: MvRewrite.MvDef): Option[Aggregate] = for {
    groupAttrs <- attrsOnly(agg.groupingExpressions)
    if groupAttrs.forall(g => d.groupCols.contains(g.name))
    // every WHERE conjunct must (a) be deterministic — re-applying
    // rand() < 0.5 to SUMMARY rows would turn a row sample into a
    // group sample with full counts, a wrong answer — and (b)
    // actually reference a grouping column: a reference-free
    // predicate proves nothing about per-group invariance, so it is
    // refused conservatively rather than vacuously admitted
    if conds.forall(c => c.deterministic && c.references.nonEmpty &&
      c.references.forall(r => d.groupCols.contains(r.name)))
    mv = d.mvAnalyzed.transformUp {
      case m: LogicalPlan with MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
    }
    mvAttr = mv.output.map(a => a.name -> a).toMap
    newAggs <- traverseOpt(agg.aggregateExpressions)(mapAggExpr(_, d, mvAttr))
  } yield {
    val newConds = conds.map(_.transform {
      case a: AttributeReference => mvAttr(a.name)
    })
    val child = if (newConds.isEmpty) mv else Filter(newConds.reduce(And), mv)
    agg.copy(
      groupingExpressions = groupAttrs.map(g => mvAttr(g.name)),
      aggregateExpressions = newAggs,
      child = child)
  }

  private def attrsOnly(es: Seq[Expression]): Option[Seq[AttributeReference]] =
    traverseOpt(es) {
      case a: AttributeReference => Some(a)
      case _ => None
    }

  /** Map one output expression onto the view, preserving the original
    * name AND exprId so parent operators' references survive the
    * swap. None anywhere → the whole Aggregate stays on the base.
    */
  private def mapAggExpr(
      ne: NamedExpression,
      d: MvRewrite.MvDef,
      mvAttr: Map[String, Attribute]): Option[NamedExpression] = {
    def reAlias(e: Expression, old: NamedExpression): NamedExpression =
      Alias(e, old.name)(old.exprId, old.qualifier)
    def viewCol(fn: String, baseCol: String): Option[Attribute] =
      d.measures.get((fn, baseCol)).flatMap(mvAttr.get)
    ne match {
      case g: AttributeReference if d.groupCols.contains(g.name) =>
        Some(reAlias(mvAttr(g.name), g))
      case al @ Alias(g: AttributeReference, _) if d.groupCols.contains(g.name) =>
        Some(reAlias(mvAttr(g.name), al))
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val derived: Option[Expression] = ae.aggregateFunction match {
          // count over any non-null literal (count(*) analyzes to
          // count(1)) → re-sum of partial counts; Coalesce pins the
          // empty-view global-aggregate edge to count's 0, and keeps
          // count's non-null output type
          case Count(Seq(Literal(v, _))) if v != null =>
            viewCol("count", "*").map(c => Coalesce(Seq(
              Sum(c).toAggregateExpression(), Literal(0L, LongType))))
          case s: Sum => s.child match {
            case a: AttributeReference =>
              viewCol("sum", a.name).map(c => s.copy(child = c).toAggregateExpression())
            case _ => None
          }
          case m: Min => m.child match {
            case a: AttributeReference =>
              viewCol("min", a.name).map(c => Min(c).toAggregateExpression())
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference =>
              viewCol("max", a.name).map(c => Max(c).toAggregateExpression())
            case _ => None
          }
          // avg(x) = sum(sum_x) / sum(cnt) — needs BOTH measures.
          // Exact when the sums are (integral values held in doubles,
          // the SUM caveat); double division of equal operands is
          // IEEE-identical.
          case a: Average => a.child match {
            case attr: AttributeReference =>
              for {
                sumC <- viewCol("sum", attr.name)
                cntC <- viewCol("count", "*")
              } yield Divide(
                Cast(Sum(sumC).toAggregateExpression(), DoubleType),
                Cast(Sum(cntC).toAggregateExpression(), DoubleType))
            case _ => None
          }
          case _ => None
        }
        derived.map(reAlias(_, al))
      case _ => None
    }
  }

  private def traverseOpt[A, B](as: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val bs = as.map(f)
    if (bs.forall(_.isDefined)) Some(bs.map(_.get)) else None
  }
}
