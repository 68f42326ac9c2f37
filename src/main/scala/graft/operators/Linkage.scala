package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** All strings reachable from `s` by deleting at most `maxDel`
    * characters (the FastSS deletion neighborhood, Bocek et al.,
    * U. Zurich TR ifi-2007.02 "Fast Similarity Search in Large
    * Dictionaries"). Built by composing the single-deletion transform
    * `maxDel` times and keeping every intermediate level, distinct.
    * Sizes are small for identity-shaped strings: |s|+1 variants at
    * maxDel=1, O(|s|²) at 2 — and each variant travels as an 8-byte
    * hash, never as the string (see editDistanceJoin).
    */
  private def deletionNeighborhood(s: Column, maxDel: Int): Column = {
    // one deletion applied to every member of an ARRAY of strings;
    // sequence() is guarded because sequence(1, 0) would DESCEND
    def delLevel(arr: Column): Column = array_distinct(flatten(transform(
      arr,
      v => when(length(v) === 0, array(v)).otherwise(
        transform(
          sequence(lit(1), length(v)),
          i => concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v))))))))
    (1 to maxDel).foldLeft(array(s)) { (acc, _) =>
      array_distinct(concat(acc, delLevel(acc)))
    }
  }

  /** Variable-length cousin of hammingLinkage: pairs (id_a, id_b,
    * dist) with dist = Levenshtein(s_a, s_b) ≤ maxDist, id_a < id_b —
    * the classic fuzzy identity join (typo'd names, re-keyed IDs whose
    * edits include insertions/deletions, which Hamming slices cannot
    * see).
    *
    * Candidate generation is the FastSS deletion-neighborhood scheme:
    * if ed(a, b) ≤ k, deleting the ≤k positions a's edit script
    * touches from a and the ≤k positions it touches from b yields the
    * SAME string, so the ≤k-deletion neighborhoods of a and b
    * intersect — an equi-join on neighborhood members is
    * candidate-complete. Each record therefore contributes
    * O(|s|^maxDist) short rows keyed by an 8-byte xxhash64 of the
    * variant (a hash collision only ever ADDS a candidate; the exact
    * verify removes it), and the codegen'd built-in
    * `levenshtein(a, b, threshold)` verifies with early exit inside
    * the join stage — no all-pairs product, no UDF.
    *
    * Scale posture: the variant-hash shuffle carries (hash, id,
    * string); bucket size is the number of records within edit
    * distance ~2·maxDist of each other, i.e. proportional to the true
    * answer's neighborhood structure, not to n². Low-entropy string
    * populations (every value sharing one long template) concentrate
    * buckets exactly as their true pair count does.
    */
  def editDistanceJoin(
      records: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    // narrow inputs would explode the whole variant fan-out in one
    // task (ScaleProbe measured a 64 MB single-task shuffle write on
    // a one-split scan); wide scans pass through untouched
    val base = Similarity.spread(records)
      .select(col(idCol).as("_id"), col(strCol).as("_s"))
    // the candidate stream — the term that grows quadratically with
    // neighborhood density — carries (hash, id, length), never the
    // string: the variant join and the pair dedup shuffle 20 bytes/row
    // where they used to carry both candidate strings, and the strings
    // are attached exactly once, to the DEDUPED pairs, for the verify
    // (decide with small rows, move payloads once)
    val keyed = base
      .select(col("_id"), length(col("_s")).as("_ln"),
        explode(deletionNeighborhood(col("_s"), maxDist)).as("v"))
      .select(col("_id"), col("_ln"), xxhash64(col("v")).as("vh"))
      .distinct()
    val pairs = keyed.as("x")
      .join(keyed.as("y"), Seq("vh"))
      .filter(col("x._id") < col("y._id"))
      // cheap length filter ahead of the pair dedup (lengths ride the
      // candidate rows as 4 bytes; ed(a,b) <= k bounds ||a|-|b|| <= k)
      .filter(abs(col("x._ln") - col("y._ln")) <= maxDist)
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
      .distinct()
    pairs
      .join(base.select(col("_id").as("id_a"), col("_s").as("_sa")), Seq("id_a"))
      .join(base.select(col("_id").as("id_b"), col("_s").as("_sb")), Seq("id_b"))
      // 3-arg levenshtein early-exits past the threshold (returns -1)
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
