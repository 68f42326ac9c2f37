package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) over fixed-width identity keys —
  * the dedup problem one table over: the same real-world entity
  * appears under several records whose keys differ by a few character
  * errors (re-keyed IDs, OCR/typo noise), and the pipeline must find
  * the pairs without an all-pairs product.
  *
  * Same pigeonhole family as Similarity.simhashNearDup, applied to
  * record keys instead of content signatures: split the width-W key
  * into maxDist+1 contiguous slices — a pair within Hamming distance
  * maxDist differs in at most maxDist slices, so it AGREES on at least
  * one — and equi-join on (slice_idx, slice_value). Candidate-complete
  * by construction; the codegen'd hamming_bits verify inside the join
  * stage removes everything else, and only true pairs reach the
  * pair-dedup shuffle.
  *
  * Scale posture: each record contributes maxDist+1 short
  * (slice_idx, slice_value, key) rows to the block shuffle — never
  * whole records. Bucket sizes are set by slice-value cardinality:
  * for hash-derived keys (the row's md5 fixture) slices are uniform
  * and buckets are O(n / alphabet^sliceWidth); sequential or
  * low-entropy keys need a hashed re-key first (the same hot-key
  * discipline as Skew.saltedJoin).
  */
object Linkage {

  /** Pairs (id_a, id_b, dist) with dist = Hamming(key_a, key_b) <=
    * maxDist, id_a < id_b. Every key is width-validated UP FRONT
    * (raise_error in the projection, before any join): a ragged key
    * that only hit hamming_bits' length check inside the join stage
    * could silently link nothing when it happens to share no slice
    * bucket — corrupt keys must fail loudly, not drop out.
    */
  def hammingLinkage(
      records: DataFrame,
      idCol: String,
      keyCol: String,
      width: Int,
      maxDist: Int): DataFrame = {
    val blocks = maxDist + 1
    require(width >= blocks, "need at least one key character per slice")
    val validated = when(length(col(keyCol)) === width, col(keyCol))
      .otherwise(raise_error(concat(
        lit(s"hammingLinkage: key width != $width: "), col(keyCol))))
    val keyed = records
      .select(col(idCol).as("_id"), validated.as("_k"))
      .select(col("_id"), col("_k"),
        explode(Similarity.sliceBlocks(col("_k"), width, blocks)).as("b"))
      .select(col("_id"), col("_k"), col("b.blk").as("blk"), col("b.bkey").as("bkey"))
    keyed.as("x")
      .join(keyed.as("y"), Seq("blk", "bkey"))
      .filter(col("x._id") < col("y._id"))
      .select(
        col("x._id").as("id_a"), col("y._id").as("id_b"),
        call_function("hamming_bits", col("x._k"), col("y._k")).as("dist"))
      .filter(col("dist") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }
}
