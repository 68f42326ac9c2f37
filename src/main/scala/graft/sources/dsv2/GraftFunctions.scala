package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The catalog's V2 `bucket` function — the OTHER half of
  * storage-partitioned joins: the bucketed scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, and Spark resolves the
  * `bucket` transform through the table's owning catalog
  * (`FunctionCatalog.loadFunction`) to decide whether two scans'
  * partitionings are compatible. Two graft tables bucketed with the
  * same (n, column-type) bind to the same `canonicalName`, so an
  * equi-join on the bucket column plans WITHOUT a shuffle on either
  * side (Spark's SPJ machinery, `spark.sql.sources.v2.bucketing
  * .enabled`).
  *
  * The hash MUST be bit-identical to what the write path partitioned
  * on: `repartition(n, col)` is Spark's `HashPartitioning` =
  * `pmod(murmur3(col, seed 42), n)` — reproduced here via the same
  * `Murmur3_x86_32` kernels `org.apache.spark.sql.catalyst
  * .expressions.Murmur3Hash` uses for integral types. Integral
  * columns only (Long/Int): wider type support would have to track
  * Spark's per-type hash normalization exactly, and a silent mismatch
  * would be a wrong-result co-location claim.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col), n) — matches the bucketed " +
      "write path's repartition(n, col) placement exactly"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, col) takes two arguments, got ${inputType.length}")
    inputType.fields(1).dataType match {
      case LongType => BucketLong
      case IntegerType => BucketInt
      case other => throw new UnsupportedOperationException(
        s"bucket(n, col) supports integral columns only, got $other")
    }
  }

  private abstract class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket($dt)"
    override def isResultNullable: Boolean = false
    protected def hash(input: InternalRow): Int
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val h = hash(input)
      Integer.valueOf(((h % n) + n) % n)
    }
  }
  private object BucketLong extends BucketBound(LongType) {
    override protected def hash(r: InternalRow): Int =
      Murmur3_x86_32.hashLong(r.getLong(1), 42)
  }
  private object BucketInt extends BucketBound(IntegerType) {
    override protected def hash(r: InternalRow): Int =
      Murmur3_x86_32.hashInt(r.getInt(1), 42)
  }
}
