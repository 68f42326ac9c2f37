package org.apache.spark.sql.execution.datasources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

import graft.sources.dsv2.{GraftTableProps, SnapshotBaseRelation, SnapshotTableMeta}

/** Planner statistics for snapshot-table reads.
  *
  * Join selection runs on the optimized LOGICAL plan, where a
  * V1-bridged DSv2 source is a `DataSourceV2ScanRelation` holding a
  * [[V1ScanWrapper]] — a wrapper that implements only `Scan`, so the
  * inner scan's `SupportsReportStatistics` is invisible to
  * `computeStats` and the relation reports the no-broadcast default.
  * There is no injectable logical hook AFTER the Early Scan Push-Down
  * batch creates that wrapper (operator-optimization and pre-CBO rules
  * both run before it), so the statistics cannot be forwarded in
  * place. AQE's runtime SMJ→BHJ rescue still pays the big side's full
  * shuffle WRITE before stage statistics exist — at 100 TB exactly
  * the cost table statistics are for.
  *
  * The fix converts at the other end: a PURE-READ snapshot relation
  * becomes a V1 `LogicalRelation` over [[SnapshotBaseRelation]]
  * (PrunedFilteredScan — same manifest listing, same stat/bloom file
  * pruning from the pushed conjuncts, same MoR/schema-op read path,
  * same superset-residual contract), whose `sizeInBytes` IS the
  * manifest byte census. `LogicalRelation.computeStats` reads it
  * natively and a small snapshot side statically broadcasts.
  *
  * Guards — the rule only fires where it provably changes nothing but
  * statistics:
  *  - never under a Command root (DML/MERGE/INSERT plans keep their
  *    DSv2 relations — the row-level machinery resolves against them);
  *  - never when the plan references metadata columns (`_file` reads
  *    stay on the DSv2 path that serves them);
  *  - never for change-feed reads (streaming-only anyway).
  *
  * Lives in Spark's own package for `private[sql]` access to
  * `LogicalRelation` — the extension pattern the public Iceberg/Delta
  * Spark integrations use for the same planner gaps. */
case class SnapshotV1ConversionRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.isInstanceOf[Command]) return plan
    plan.transform {
      case r: DataSourceV2Relation if convertible(r) =>
        val meta = r.table.asInstanceOf[SnapshotTableMeta]
        val schema = StructType(r.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
        LogicalRelation(
          new SnapshotBaseRelation(spark, meta.snapshotDir,
            meta.snapshotVersion, schema),
          r.output, None, isStreaming = false, stream = None)
    }
  }

  private def convertible(r: DataSourceV2Relation): Boolean =
    r.table.isInstanceOf[SnapshotTableMeta] &&
      !r.table.asInstanceOf[SnapshotTableMeta].snapshotCdf &&
      // output restricted to DATA columns: a `_file` lineage read
      // resolves through metadataOutput and must stay DSv2
      r.output.forall(a => r.table.schema().fieldNames.contains(a.name)) &&
      // a BUCKET-declared table under V2 bucketing stays DSv2: the
      // storage-partitioned-join scan both reports its statistics
      // natively (a real V2 scan, not a V1ScanWrapper — nothing is
      // lost) and surfaces KeyGroupedPartitioning, which this
      // conversion would erase along with every co-located join
      !(spark.conf.get("spark.sql.sources.v2.bucketing.enabled",
        "false").toBoolean &&
        GraftTableProps.bucketSpec(GraftTableProps.read(spark,
          r.table.asInstanceOf[SnapshotTableMeta].snapshotDir)).isDefined)
}
