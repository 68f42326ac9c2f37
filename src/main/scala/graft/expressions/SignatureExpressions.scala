package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the signature hot loops (builder
  * brief preference (b): a native Expression with doGenCode beats a
  * UDF beats interpreted HOF chains). Both generate a single static
  * call into HashOps, so whole-stage codegen keeps the row pipeline
  * fused around them; interpreted eval (nullSafeEval) stays available
  * for non-codegen paths. Input typing is enforced via
  * checkInputDataTypes — ExpectsInputTypes' AbstractDataType is
  * private[sql] in Spark 4.
  */
private[graft] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<string>, got ${other.catalogString}")
  }
}

case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.minhashBandKeys(input.asInstanceOf[ArrayData], numHashes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashOps.minhashBandKeys($c, $numHashes, $bands)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.wordShingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

case class HyperplaneSig(child: Expression, sigBits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_sig"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.hyperplaneSig(input.asInstanceOf[ArrayData], sigBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.hyperplaneSig($c, $sigBits)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

case class CountTokensIn(child: Expression, csvSet: String, lower: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_tokens_in"
  @transient private lazy val set = HashOps.toSet(csvSet)
  protected override def nullSafeEval(input: Any): Any =
    HashOps.countTokensIn(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], set, lower)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashOps.countTokensIn($c, $setRef, $lower)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountTokensIn =
    copy(child = newChild)
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.nfcNormalize(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class HammingBits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_bits"
  protected override def nullSafeEval(l: Any, r: Any): Any =
    HashOps.hammingBits(
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.HashOps.hammingBits($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBits =
    copy(left = newLeft, right = newRight)
}

case class CountTokensInMulti(child: Expression, setsSpec: String, lower: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "count_tokens_multi"
  // '|'-separated list of comma-separated sets, e.g. "the,a|der,die"
  @transient private lazy val sets =
    setsSpec.split("\\|", -1).map(HashOps.toSet)
  protected override def nullSafeEval(input: Any): Any =
    HashOps.countTokensInMulti(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], sets, lower)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // no className arg: getName on an array class is the JVM binary
    // form ("[Ljava.util.HashSet;"), which is not valid Java source in
    // the generated cast — the default (CodeGenerator.typeName)
    // renders array types correctly
    val setsRef = ctx.addReferenceObj("tokenSets", sets)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashOps.countTokensInMulti($c, $setsRef, $lower)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountTokensInMulti =
    copy(child = newChild)
}

case class CharGrams(child: Expression, maxN: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.charGrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.charGrams($c, $maxN)")
  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

case class TokenProfile(child: Expression, stopCsv: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq_tokens", IntegerType, nullable = false),
    StructField("n_stop_tokens", IntegerType, nullable = false),
    StructField("n_punct_chars", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))
  override def prettyName: String = "token_profile"
  @transient private lazy val set = HashOps.toSet(stopCsv)
  protected override def nullSafeEval(input: Any): Any =
    HashOps.tokenProfile(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.tokenProfile($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)
}

case class TokenFingerprint(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))
  override def prettyName: String = "token_fingerprint"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.tokenFingerprint(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.tokenFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

case class FloatDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  protected override def nullSafeEval(l: Any, r: Any): Any =
    HashOps.floatDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.HashOps.floatDot($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

case class FloatNorm2(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_norm2"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.floatNorm2(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.floatNorm2($c)")
  override protected def withNewChildInternal(newChild: Expression): FloatNorm2 =
    copy(child = newChild)
}

case class PiiScrub(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false)))
  override def prettyName: String = "pii_scrub"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.piiScrub(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.piiScrub($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

/** Product-quantization assign: codes + reconstruction in one call
  * into HashOps.pqAssign (rationale there — the unrolled 512-term
  * column tree this replaces compiled for seconds per plan). The
  * codebooks travel as a constructor argument like count_tokens_in's
  * marker csv; the float view and the exact double half-norms are
  * precomputed once per executor via the transient lazies, so
  * per-row work is the arithmetic alone.
  */
case class PqAssign(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
    codebooks.forall(cb => cb.size == codebooks.head.size &&
      cb.forall(_.size == codebooks.head.head.size)),
    "pq_assign: codebooks must be a non-empty rectangular [numSub][ncodes][sub]")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon", ArrayType(FloatType, containsNull = false), nullable = false)))
  override def prettyName: String = "pq_assign"
  @transient private lazy val cbFloat: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.map(_.toFloat).toArray).toArray).toArray
  @transient private lazy val halfNorm: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum / 2.0).toArray).toArray
  protected override def nullSafeEval(input: Any): Any =
    HashOps.pqAssign(input.asInstanceOf[ArrayData], cbFloat, halfNorm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCbFloat", cbFloat, "float[][][]")
    val hnRef = ctx.addReferenceObj("pqHalfNorm", halfNorm, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.pqAssign($c, $cbRef, $hnRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

/** Greedy longest-match subword encode over a fixed vocabulary
  * (HashOps.wordpieceEncode has the algorithm contract). The vocab
  * rides as parallel constructor seqs (bounded — buildSubwordVocab
  * caps it) and compiles to one executor-local HashMap via the
  * transient lazy, so per-row work is hash probes alone.
  */
case class WordpieceEncode(child: Expression, units: Seq[String], ids: Seq[Int])
    extends UnaryExpression {
  require(units.nonEmpty && units.size == ids.size,
    "wordpiece_encode: units and ids must be parallel and non-empty")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("n_unk", IntegerType, nullable = false),
    StructField("id_sum", LongType, nullable = false)))
  override def prettyName: String = "wordpiece_encode"
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](units.size * 2)
    units.iterator.zip(ids.iterator).foreach { case (u, i) => m.put(u, i) }
    m
  }
  // CODE-POINT length — the kernel's walk unit (a supplementary-plane
  // vocab entry like "𠀀" is length 1, not its 2 UTF-16 units)
  @transient private lazy val maxLen: Int =
    units.map(u => u.codePointCount(0, u.length)).max
  protected override def nullSafeEval(input: Any): Any =
    HashOps.wordpieceEncode(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("wpUnits", table,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashOps.wordpieceEncode($c, $tRef, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordpieceEncode =
    copy(child = newChild)
}

case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.simhashBits(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.simhashBits($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** Bloom-filter membership probe over a long key — the map-only
  * pre-filter behind [[graft.operators.BloomJoin]]'s semi/anti join
  * reduction. The serialized filter travels as a constructor argument
  * (a binary literal at the SQL face, like count_tokens_in's marker
  * csv) and deserializes ONCE per executor via the transient lazy —
  * evaluation is two Murmur3 probes per row, no allocation, inside
  * whole-stage codegen. `false` is authoritative (no false negatives);
  * `true` means "must consult the exact join" — callers rely on
  * exactly this split.
  */
/** Count–Min point estimate over a sketch array (Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min
  * sketch and its applications", J. Algorithms 2005): min over the
  * depth rows of the hashed counter. The kernel (HashOps.cmEstimate)
  * is the SAME static method the CountMin Aggregator's update path
  * hashes with, so the two sides cannot drift.
  */
case class CmEstimate(sketch: Expression, term: Expression, depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = sketch
  override def right: Expression = term
  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, term.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, string), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_estimate"
  protected override def nullSafeEval(s: Any, t: Any): Any =
    HashOps.cmEstimate(s.asInstanceOf[ArrayData],
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, t) =>
      s"graft.expressions.HashOps.cmEstimate($s, $t, $depth, $width)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(sketch = newLeft, term = newRight)
}

case class HashProjEmbed(child: Expression, dim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_proj_embed"
  protected override def nullSafeEval(input: Any): Any =
    HashOps.hashProjEmbed(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.hashProjEmbed($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): HashProjEmbed =
    copy(child = newChild)
}

case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
  protected override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
