package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr

import graft.sources.SnapshotTable
import graft.sources.dsv2.{GraftSnapshotCatalog, GraftTableProps}

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
      val parts = r.multipartIdentifier
      if (parts.length < 3) return plan
      val dir = tableDirOf(parts)
      if (dir == null) return plan
      if (!GraftTableProps.read(spark, dir).get("update_mode")
        .exists(_.equalsIgnoreCase("dv"))) return plan
      // COW handles what the vector route shouldn't: subqueries
      // cannot re-resolve against the table's own frame, nested-field
      // SETs patch structs the vector images don't model
      val exprs = cond.toSeq ++ assignments.flatMap(a => Seq(a.key, a.value))
      val simpleKeys = assignments.forall(_.key match {
        // nameParts is whatever Seq the parser built — match on
        // length, not on List-only cons patterns
        case a: UnresolvedAttribute => a.nameParts.length == 1
        case _ => false
      })
      val noSubquery = !exprs.exists(_.exists(_.isInstanceOf[SubqueryExpression]))
      if (assignments.isEmpty || !simpleKeys || !noSubquery) return plan
      val sets = assignments.map(a =>
        (a.key.asInstanceOf[UnresolvedAttribute].name, a.value.sql))
      require(sets.map(_._1.toLowerCase).distinct.size == sets.size,
        s"UPDATE on ${parts.mkString(".")}: duplicate SET column — each " +
          "column may be assigned once")
      DvUpdateCommand(dir, cond.map(_.sql).getOrElse("true"), sets)
    case _ => plan
  }

  /** The table directory of a ≥3-part identifier whose head names a
    * graft-snapshot catalog — null when the head is no such catalog
    * or the table does not exist (normal resolution then surfaces the
    * normal error). */
  private def tableDirOf(parts: Seq[String]): String =
    try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: GraftSnapshotCatalog =>
          g.tableDir(Identifier.of(parts.tail.init.toArray, parts.last))
        case _ => null
      }
    } catch { case scala.util.control.NonFatal(_) => null }
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
    SnapshotTable.commitUpdateVectorsWhere(
      spark, dir, expr(condSql), resolved.toMap)
    Seq.empty
  }
}
