package org.apache.spark.sql.execution.command

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.functions.col

import graft.sources.SnapshotTable
import graft.sources.dsv2.GraftTableProps

/** The routed `MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT
  * MATCHED THEN INSERT *` under `merge_mode='mor'` (see
  * [[graft.plans.MorMergeRoute]]): the canonical upsert lands as ONE
  * merge-on-read commit — the source's rows plus an equality delete
  * of exactly its keys — touching ZERO pre-existing files, where the
  * copy-on-write rewrite pays one file rewrite per scattered key.
  *
  * The source plan rides unresolved (`innerChildren`, outside the
  * analyzer's reach) and analyzes freshly at run — the same session,
  * the same resolution a COW MERGE's source gets. The star actions
  * mean full-image replacement, so the source must carry exactly the
  * target's columns (by name, case-insensitive — the star-expansion
  * contract); anything else refused loudly with the COW pointer.
  * Duplicate source keys refuse too (SQL MERGE errors on multiple
  * matches; for the not-matched side the COW face would insert both —
  * a divergence this face surfaces loudly rather than silently
  * picking a winner).
  *
  * CONTRACT — key-unique target: `merge_mode='mor'` implements UPSERT
  * semantics. The equality delete dooms every target row carrying a
  * matched key, so a target holding DUPLICATE key values collapses
  * them to the single new image — where the COW MERGE would update
  * each duplicate in place. A table maintained by upserts is
  * key-unique by construction (every commit replaces whole images),
  * which is exactly the population this mode exists for; a table that
  * legitimately carries duplicate keys must keep the COW face.
  * Detecting duplicates would cost the full-table scan the zero-read
  * commit exists to avoid — the contract is documented, not probed.
  *
  * Lives in Spark's own package for `private[sql]` access to
  * `Dataset.ofRows` — the documented extension pattern this repo
  * already uses for planner statistics (`GraftV1Stats`). */
case class GraftMorMergeCommand(
    dir: String, keys: Seq[String], source: LogicalPlan)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val src = Dataset.ofRows(spark, source)
    val schema = SnapshotTable.read(spark, dir).schema
    val cols = schema.fieldNames
    require(src.columns.length == cols.length &&
      cols.forall(c => src.columns.count(_.equalsIgnoreCase(c)) == 1),
      s"MERGE (merge_mode='mor') into $dir: UPDATE SET * / INSERT * " +
        s"replace full row images, so the source must carry exactly the " +
        s"target's columns ${cols.mkString("(", ", ", ")")} — got " +
        s"${src.columns.mkString("(", ", ", ")")}; project the source, " +
        "or UNSET merge_mode for the copy-on-write MERGE (which also " +
        "handles schema evolution)")
    val keyNames = keys.map(k => cols.find(_.equalsIgnoreCase(k)).getOrElse(
      throw new IllegalArgumentException(
        s"MERGE (merge_mode='mor') into $dir: ON references '$k', which " +
          "is not a column of the target")))
    // each image column CASTS to the target's standing type — an
    // INT-literal source column on a BIGINT target must not land an
    // INT32 image/key file that poisons the merged read schema (the
    // same defect class the dv UPDATE face fixed)
    val projected = src.select(schema.fields.map(f =>
      col(src.columns.find(_.equalsIgnoreCase(f.name)).get)
        .cast(f.dataType).as(f.name)).toSeq: _*)
    val expect = GraftTableProps.expectations(GraftTableProps.read(spark, dir))
    SnapshotTable.commitUpsertMoR(projected, dir, keyNames,
      expectations = expect)
    Seq.empty
  }
}
