package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr

import graft.sources.SnapshotTable
import graft.sources.dsv2.{GraftSnapshotCatalog, GraftTableProps}

/** Shared resolution for the pre-analysis DML routing rules: the
  * table directory of a fully-qualified (≥3-part) identifier whose
  * head names a graft-snapshot catalog — None when it is no such
  * catalog or the table does not exist (normal resolution then
  * surfaces the normal error). A ≥3-part name is a shape no temp
  * view or CTE can shadow, which is what makes pre-resolution
  * interception safe. */
private[plans] object SnapshotDmlResolve {
  def tableDir(spark: SparkSession, parts: Seq[String]): Option[String] = {
    if (parts.length < 3) return None
    try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: GraftSnapshotCatalog =>
          Some(g.tableDir(Identifier.of(parts.tail.init.toArray, parts.last)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def modeIs(spark: SparkSession, dir: String,
      prop: String, value: String): Boolean =
    GraftTableProps.read(spark, dir).get(prop)
      .exists(_.equalsIgnoreCase(value))
}

/** Routes `UPDATE cat.ns.t SET … WHERE …` through POSITIONAL DELETE
  * VECTORS when the table declares `update_mode = 'dv'` — the
  * statement face of `commitUpdateVectorsWhere`, matching how
  * `delete_mode = 'dv'` already routes SQL DELETE (and how the real
  * formats split write.delete.mode / write.update.mode). Without it,
  * an UPDATE on a dv-mode table still copy-on-writes every file a
  * matched row lives in; with it, the rewrite is the matched ROWS
  * (vector + patched-image batch, one atomic commit).
  *
  * Interception happens PRE-RESOLUTION (the hint-resolution hook —
  * the earliest injectable logical seam): Spark's own
  * `RewriteUpdateTable` fires inside the main resolution batch, before
  * any injected resolution rule can see the resolved node. Routing
  * from the unresolved plan is safe because the rule matches ONLY a
  * fully-qualified (≥3-part) name whose head names a graft-snapshot
  * catalog — a shape no temp view or CTE can shadow — and falls
  * through to the standard copy-on-write rewrite for everything else:
  * subquery conditions, nested-field or duplicate SETs, unknown
  * tables. Condition and SET expressions travel as their parsed SQL
  * text (`Expression.sql`) and re-resolve against the table's own
  * frame inside the commit — the same route `CALL system.dv_update`
  * takes, so the two faces share one semantics (every SET evaluates
  * against the OLD row). */
case class DvUpdateRoute(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // UPDATE is always the plan root — a root-only match keeps the
    // rule O(1) for every other statement
    case UpdateTable(r: UnresolvedRelation, assignments, cond) =>
      val dir = SnapshotDmlResolve.tableDir(spark, r.multipartIdentifier)
        .orNull
      if (dir == null) return plan
      if (!SnapshotDmlResolve.modeIs(spark, dir, "update_mode", "dv"))
        return plan
      // COW handles what the vector route shouldn't: subqueries
      // cannot re-resolve against the table's own frame, nested-field
      // SETs patch structs the vector images don't model, and
      // QUALIFIED references (`ev.score` — valid under COW, where the
      // relation carries its qualifier) would fail re-resolution
      // against the bare table frame
      val exprs = cond.toSeq ++ assignments.flatMap(a => Seq(a.key, a.value))
      val simpleKeys = assignments.forall(_.key match {
        // nameParts is whatever Seq the parser built — match on
        // length, not on List-only cons patterns
        case a: UnresolvedAttribute => a.nameParts.length == 1
        case _ => false
      })
      val noSubquery = !exprs.exists(_.exists(_.isInstanceOf[SubqueryExpression]))
      val noQualifiedRefs = !(cond.toSeq ++ assignments.map(_.value))
        .exists(_.exists {
          case a: UnresolvedAttribute => a.nameParts.length > 1
          case _ => false
        })
      if (assignments.isEmpty || !simpleKeys || !noSubquery ||
        !noQualifiedRefs) return plan
      val sets = assignments.map(a =>
        (a.key.asInstanceOf[UnresolvedAttribute].name, a.value.sql))
      require(sets.map(_._1.toLowerCase).distinct.size == sets.size,
        s"UPDATE on ${r.multipartIdentifier.mkString(".")}: duplicate SET " +
          "column — each column may be assigned once")
      DvUpdateCommand(dir, cond.map(_.sql).getOrElse("true"), sets)
    case _ => plan
  }
}

/** Routes the canonical SQL upsert —
  * `MERGE INTO cat.ns.t USING src ON t.k = s.k
  *  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` —
  * through a MERGE-ON-READ commit when the table declares
  * `merge_mode = 'mor'` (Iceberg's write.merge.mode split): the
  * source's rows plus an equality delete of exactly its keys land as
  * ONE atomic version touching ZERO pre-existing files, where the
  * copy-on-write rewrite pays one file rewrite per scattered key.
  * Interception is pre-resolution for the same reason as
  * [[DvUpdateRoute]] (RewriteMergeIntoTable fires inside the
  * Resolution batch), with the same safe-shape restriction: a
  * fully-qualified target on a graft catalog, unconditional star
  * actions only, an ON condition that is a conjunction of same-name
  * column equalities. Everything else — conditional or column-wise
  * actions, NOT MATCHED BY SOURCE, schema evolution, expression
  * keys — falls through to the standard copy-on-write rewrite. */
case class MorMergeRoute(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case MergeIntoTable(t, source, cond,
        Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)),
        Seq(), false) =>
      val rel = unwrapAlias(t)
      rel match {
        case r: UnresolvedRelation =>
          SnapshotDmlResolve.tableDir(spark, r.multipartIdentifier) match {
            case Some(dir)
              if SnapshotDmlResolve.modeIs(spark, dir, "merge_mode", "mor") =>
              keyColumns(cond) match {
                case Some(keys) =>
                  org.apache.spark.sql.execution.command
                    .GraftMorMergeCommand(dir, keys, source)
                case None => plan
              }
            case _ => plan
          }
        case _ => plan
      }
    case _ => plan
  }

  private def unwrapAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrapAlias(child)
    case other => other
  }

  /** The ON condition as upsert keys: a conjunction of
    * `EqualTo(q1.k, q2.k)` where each side is a singly-QUALIFIED
    * TOP-LEVEL column (exactly two name parts), the two qualifiers
    * DIFFER (one names the target, one the source — `ON t.id = t.id`
    * must keep the COW path's multi-match error, not route as a
    * keyed upsert), and both sides name the same column — None for
    * any other shape: unqualified or nested-field references
    * (`t.payload.id` is a STRUCT field, not the top-level column its
    * last part spells), cross-name equalities, non-equi terms,
    * literals, subqueries. Falling through keeps COW's exact
    * semantics for everything this face cannot prove it preserves. */
  private def keyColumns(cond: Expression): Option[Seq[String]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.length == 2 && b.nameParts.length == 2 &&
          !a.nameParts.head.equalsIgnoreCase(b.nameParts.head) &&
          a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        Some(a.nameParts.last)
      case _ => None
    }
    if (keys.forall(_.isDefined)) Some(keys.flatten.distinct) else None
  }
}

/** The routed statement: one `commitUpdateVectorsWhere` against the
  * resolved table directory. Expression text re-resolves against the
  * table's own columns; SET names resolve case-insensitively against
  * the live schema (the COW path's resolution posture), unknown names
  * refuse loudly inside the commit. */
case class DvUpdateCommand(
    dir: String, condSql: String, sets: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cols = SnapshotTable.read(spark, dir).columns
    val resolved = sets.map { case (k, v) =>
      cols.find(_.equalsIgnoreCase(k)).getOrElse(k) -> expr(v)
    }
    // the table's declared expectations gate this face like every
    // other write path (the procedure and COW faces both pass them)
    val expect = GraftTableProps.expectations(GraftTableProps.read(spark, dir))
    SnapshotTable.commitUpdateVectorsWhere(
      spark, dir, expr(condSql), resolved.toMap, expect)
    Seq.empty
  }
}
