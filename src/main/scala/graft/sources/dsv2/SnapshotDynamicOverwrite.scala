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
  *    touched partition TUPLES (distinct combinations of the spec's
  *    identity values / temporal truncations), builds the equivalent
  *    predicate — OR over tuples of AND over transforms, so a
  *    (day × region) table replaces exactly the batch's (day, region)
  *    pairs and the same day's OTHER regions carry untouched — and
  *    rides the REPLACE WHERE machinery: all-match files DROP by
  *    proof, none-match carry by REFERENCE, boundary files rewrite
  *    their survivors (`SnapshotTable.commitReplacePartitions`);
  *  - identity and temporal (years/months/days/hours) transforms are
  *    supported, in any combination; truncate/bucket transforms
  *    refuse loudly with a REPLACE WHERE pointer — a hash/prefix
  *    "partition" names no contiguous replacement range;
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
  override def requiredNumPartitions(): Int =
    // k·n murmur3 placement keeps every task single-bucket — see
    // GraftTableProps.bucketFanout
    bucketOf.map { case (_, n) =>
      n * GraftTableProps.bucketFanout(props, n) }.getOrElse(0)
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
      spec.foreach { case (fn, c) =>
        require(fn == "identity" ||
          Set("days", "hours", "months", "years").contains(fn),
          s"dynamic overwrite on $dir: $fn($c) partitions have no " +
            "dynamic-replacement semantics here — use INSERT INTO … " +
            "REPLACE WHERE with an explicit predicate")
      }
      val delta = s.read.parquet(
        newFiles.map(f => s"$dir/$f"): _*)
      import SnapshotTable.{DmlPred, PredAnd, PredEq, PredIn, PredOr, PredRange}
      def unitOf(fn: String): String = fn match {
        case "days" => "DAY"; case "hours" => "HOUR"
        case "months" => "MONTH"; case "years" => "YEAR"
      }
      // one key expression per transform: the partition value a row
      // belongs to (identity = the column; temporal = its date_trunc)
      val keyCols: Seq[Column] = spec.map {
        case ("identity", c) => col(c)
        case (fn, c) => date_trunc(unitOf(fn), col(c))
      }
      // ONE delta-sized pass learns the touched partition TUPLES.
      // The collect itself is LIMIT-bounded: the 10k refusal must not
      // first materialize a pathological batch's millions of tuples
      // on the driver.
      val tupleRows =
        delta.select(keyCols: _*).distinct().limit(10001).collect()
      if (tupleRows.isEmpty) {
        // files but zero rows: the batch names no partitions — no-op
        SnapshotTable.dropOrphanBatch(s, dir, newFiles)
        return
      }
      require(tupleRows.length <= 10000,
        s"dynamic overwrite on $dir touches over 10000 partition " +
          "tuples — bound the batch or use REPLACE WHERE")
      tupleRows.foreach { r =>
        spec.indices.foreach(i => require(!r.isNullAt(i),
          s"dynamic overwrite on $dir: the batch carries NULL " +
            s"'${spec(i)._2}' values — a null names no partition; " +
            "filter them or use REPLACE WHERE"))
      }
      // the increment MUST use the session timezone date_trunc
      // truncated in: a UTC-pinned plusMonths/plusDays drifts off the
      // local partition boundary (non-UTC offsets, DST), so the
      // PredRange file classification would misalign with the exact
      // rowPred — carrying files that duplicate the batch's rows, or
      // dropping files the batch never replaces.
      val zone = java.time.ZoneId.of(
        s.sessionState.conf.sessionLocalTimeZone)
      def next(fn: String, t: java.sql.Timestamp): java.sql.Timestamp = {
        val z = java.time.ZonedDateTime.ofInstant(t.toInstant, zone)
        java.sql.Timestamp.from((fn match {
          case "days" => z.plusDays(1); case "hours" => z.plusHours(1)
          case "months" => z.plusMonths(1); case "years" => z.plusYears(1)
        }).toInstant)
      }
      // classifyEntry recurses per node — a left-deep 10k-way reduce
      // would stack-overflow the manifest pass, so balance the tree
      def balanced(ps: Seq[DmlPred], f: (DmlPred, DmlPred) => DmlPred)
          : DmlPred =
        if (ps.size == 1) ps.head
        else {
          val (l, r) = ps.splitAt(ps.size / 2)
          f(balanced(l, f), balanced(r, f))
        }
      // the replacement predicate: OR over touched tuples of AND over
      // the spec's transforms — identity pins equality, temporal pins
      // the [start, next-boundary) range. Replaces exactly the
      // batch's (e.g. day × region) tuples; the same day's OTHER
      // regions classify none-match and carry by reference.
      val pred: Option[DmlPred] = Some {
        spec match {
          case Seq(("identity", c)) =>
            // flat IN beats a 10k-node OR tree for the common layout
            PredIn(c, tupleRows.map(_.get(0)).toSeq)
          case _ =>
            balanced(tupleRows.toSeq.map { r =>
              spec.zipWithIndex.map {
                case (("identity", c), i) => PredEq(c, r.get(i)): DmlPred
                case ((fn, c), i) =>
                  val st = r.getTimestamp(i)
                  PredRange(c, Some((st, true)),
                    Some((next(fn, st), false))): DmlPred
              }.reduce(PredAnd(_, _))
            }, PredOr(_, _))
        }
      }
      // the exact row predicate for boundary-file survivor rewrites:
      // a single IN over the tuple struct, not a 10k-way OR of ANDs
      import org.apache.spark.sql.functions.struct
      val rowPred: Column = struct(keyCols: _*).isin(
        tupleRows.toSeq.map(r =>
          struct(spec.indices.map(i => lit(r.get(i))): _*)): _*)
      // survivors of boundary files re-land under the declared
      // clustering, same as every other write
      val sortCols = sortColsOf
      val bucket = bucketOf
      def shape(df: DataFrame): DataFrame = bucket match {
        case Some((bc, n)) =>
          val part = df.repartition(
            n * GraftTableProps.bucketFanout(p, n), col(bc))
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
        bucket = bucket, shape = shape,
        expectations = GraftTableProps.expectations(p)): Unit
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      SnapshotTable.dropOrphanBatch(spark, dir, Seq(s"$batchDir/_"))
  }
}
