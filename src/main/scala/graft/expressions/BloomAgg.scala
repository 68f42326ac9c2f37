package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter aggregate over bigint keys — the BUILD half of the
  * bloom pipeline whose PROBE half is [[BloomMightContain]]. One
  * grouped aggregation yields a serialized sketch bloom per group
  * (graft's use: per data FILE at snapshot-commit time, grouped on
  * `input_file_name`), probed later via `mightContainLong` with the
  * same key hashing on both sides, so negatives are proven absences.
  *
  * Spark's own BloomFilterAggregate exists but is internal-only (the
  * runtime-filter rule injects it; it is not in the function
  * registry), so this is the same shape built on the public
  * TypedImperativeAggregate extension point and the public
  * `spark.util.sketch` bloom. Partial aggregation works as usual:
  * partials serialize via the bloom's own compact wire format and
  * OR-merge (`mergeInPlace`) — the union of set bits IS the bloom of
  * the union key set when sizes match, which `expectedKeys`/`fpp`
  * being plan constants guarantees.
  *
  * NULL keys are skipped (a bloom answers membership of values; the
  * caller's hash canonicalization decides how nulls map, and graft's
  * xxhash64 canonicalization never yields null). An EMPTY group still
  * returns a valid (all-zero) bloom, never null.
  */
case class BloomAgg(
    child: Expression,
    expectedKeys: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedKeys > 0, s"bloom_agg expectedKeys must be positive, got $expectedKeys")
  require(fpp > 0.0 && fpp < 1.0, s"bloom_agg fpp must be in (0,1), got $fpp")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key (canonicalize + xxhash64 first), " +
        s"got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedKeys, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}
