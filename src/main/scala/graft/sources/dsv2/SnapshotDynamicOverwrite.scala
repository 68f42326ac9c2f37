package graft.sources.dsv2

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.functions.{coalesce, col, date_trunc, lit}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.util.SerializableConfiguration

import graft.sources.SnapshotTable

/** DYNAMIC PARTITION OVERWRITE for `PARTITIONED BY` snapshot tables —
  * `INSERT OVERWRITE t SELECT …` under
  * `spark.sql.sources.partitionOverwriteMode=dynamic` replaces exactly
  * the partitions PRESENT in the incoming batch (the Hive/Iceberg
  * dynamic contract; static mode keeps its truncate semantics), as ONE
  * manifest commit:
  *
  *  - the v2 executors land the batch as ordinary parquet under a
  *    fresh batch dir (the shared InternalRow-native writer), under
  *    the table's declared clustering (bucket distribution / sort
  *    ordering via RequiresDistributionAndOrdering);
  *  - the COMMIT reads the delta-sized batch once to learn the
  *    touched partition values (distinct days/hours/months/years of
  *    the transform column, or distinct identity values), builds the
  *    equivalent predicate, and rides the REPLACE WHERE machinery:
  *    all-match files DROP by proof, none-match carry by REFERENCE,
  *    boundary files rewrite their survivors
  *    (`SnapshotTable.commitReplacePartitions`);
  *  - exactly ONE declared partition transform is supported (the
  *    common layout); multi-transform tables and truncate/bucket
  *    transforms refuse loudly with a REPLACE WHERE pointer — a
  *    cross-product replacement would silently delete rows in
  *    untouched partition tuples;
  *  - a batch carrying NULL partition values refuses (a null names no
  *    partition); an EMPTY batch replaces nothing (no-op, no commit).
  */
private[dsv2] class SnapshotDynamicOverwriteWrite(
    dir: String, info: LogicalWriteInfo)
    extends Write with RequiresDistributionAndOrdering {

  private def spark: SparkSession = SparkSession.active

  private def props = GraftTableProps.read(spark, dir)

  private def bucketOf: Option[(String, Int)] =
    GraftTableProps.bucketSpec(props).filter { case (c, _) =>
      info.schema().fields.exists(f => f.name == c &&
        (f.dataType == LongType || f.dataType == IntegerType))
    }

  private def sortColsOf: Seq[String] =
    GraftTableProps.cols(props, "sort_cols")
      .filter(info.schema().fieldNames.contains)

  override def requiredDistribution(): Distribution = bucketOf match {
    case Some((c, _)) => Distributions.clustered(Array(Expressions.column(c)))
    case None => Distributions.unspecified()
  }
  override def requiredNumPartitions(): Int = bucketOf.map(_._2).getOrElse(0)
  override def requiredOrdering(): Array[SortOrder] =
    sortColsOf.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray

  override def description(): String =
    s"graft-snapshot-dynamic-overwrite dir=$dir"

  override def toBatch: BatchWrite = new BatchWrite {
    private val batchDir = s"dyn-${UUID.randomUUID()}"

    override def createBatchWriterFactory(
        pi: PhysicalWriteInfo): DataWriterFactory =
      new SnapshotDmlWriterFactory(dir, batchDir, info.schema(),
        info.schema().fields.indices.toArray,
        new SerializableConfiguration(
          SparkSession.active.sessionState.newHadoopConf()))

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val s = spark
      val newFiles = messages.flatMap {
        case SnapshotDmlCommit(ps) => ps
        case other => throw new IllegalStateException(s"alien commit $other")
      }.toSeq
      // an empty batch names no partitions: dynamic overwrite is a no-op
      if (newFiles.isEmpty) return
      val p = props
      val spec = GraftTableProps.partitionSpec(p)
      require(spec.nonEmpty,
        s"dynamic overwrite on $dir: the table declares no PARTITIONED BY " +
          "spec — static INSERT OVERWRITE (truncate) is the defined behavior")
      require(spec.size == 1,
        s"dynamic overwrite on $dir supports exactly ONE partition " +
          s"transform (got ${spec.map(t => s"${t._1}(${t._2})").mkString(", ")}) " +
          "— a cross-product replacement would delete rows in untouched " +
          "partition tuples; use INSERT INTO … REPLACE WHERE instead")
      val (fn, c) = spec.head
      val delta = s.read.parquet(
        newFiles.map(f => s"$dir/$f"): _*)
      import SnapshotTable.{DmlPred, PredIn, PredOr, PredRange}
      val (pred, rowPred): (Option[DmlPred], Column) = fn match {
        case "identity" =>
          val vals = delta.select(col(c)).distinct().collect().map(_.get(0)).toSeq
          require(!vals.contains(null),
            s"dynamic overwrite on $dir: the batch carries NULL '$c' values — " +
              "a null names no partition; filter them or use REPLACE WHERE")
          require(vals.size <= 10000,
            s"dynamic overwrite on $dir touches ${vals.size} '$c' partitions " +
              "— bound the batch or use REPLACE WHERE")
          (Some(PredIn(c, vals)), col(c).isin(vals: _*))
        case "days" | "hours" | "months" | "years" =>
          val unit = fn match {
            case "days" => "DAY"; case "hours" => "HOUR"
            case "months" => "MONTH"; case "years" => "YEAR"
          }
          val starts = delta.select(date_trunc(unit, col(c)).as("p"))
            .distinct().collect().map(r =>
              Option(r.getTimestamp(0)).getOrElse(throw
                new IllegalArgumentException(
                  s"dynamic overwrite on $dir: the batch carries NULL '$c' " +
                    "values — a null names no partition"))).toSeq
          require(starts.size <= 10000,
            s"dynamic overwrite on $dir touches ${starts.size} $fn($c) " +
              "partitions — bound the batch or use REPLACE WHERE")
          def next(t: java.sql.Timestamp): java.sql.Timestamp = {
            val z = java.time.ZonedDateTime.ofInstant(
              t.toInstant, java.time.ZoneOffset.UTC)
            java.sql.Timestamp.from((fn match {
              case "days" => z.plusDays(1); case "hours" => z.plusHours(1)
              case "months" => z.plusMonths(1); case "years" => z.plusYears(1)
            }).toInstant)
          }
          val ranges = starts.map(st => PredRange(c,
            Some((st, true)), Some((next(st), false))): DmlPred)
          (Some(ranges.reduce(PredOr(_, _))),
            date_trunc(unit, col(c)).isin(starts: _*))
        case other => throw new UnsupportedOperationException(
          s"dynamic overwrite on $dir: $other($c) partitions have no " +
            "dynamic-replacement semantics here — use INSERT INTO … " +
            "REPLACE WHERE with an explicit predicate")
      }
      // survivors of boundary files re-land under the declared
      // clustering, same as every other write
      val sortCols = sortColsOf
      val bucket = bucketOf
      def shape(df: DataFrame): DataFrame = bucket match {
        case Some((bc, n)) =>
          val part = df.repartition(n, col(bc))
          if (sortCols.isEmpty) part
          else part.sortWithinPartitions(sortCols.map(col): _*)
        case None =>
          if (sortCols.isEmpty) df
          else df.repartitionByRange(sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.map(col): _*)
      }
      val statsCols = (GraftTableProps.cols(p, "stats_cols") ++ sortCols).distinct
        .filter(info.schema().fieldNames.contains)
      SnapshotTable.commitReplacePartitions(s, dir, newFiles,
        pred = pred, rowPred = coalesce(rowPred, lit(false)),
        statsCols = statsCols,
        bloomCols = GraftTableProps.cols(p, "bloom_cols")
          .filter(info.schema().fieldNames.contains),
        bucket = bucket, shape = shape): Unit
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      SnapshotTable.dropOrphanBatch(spark, dir, Seq(s"$batchDir/_"))
  }
}
