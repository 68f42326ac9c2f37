package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast-bloom join reduction — the 100 TB shuffle-volume story
  * for the reference's IN-subquery / NOT-IN delete shapes (SURVEY §2.3
  * F3/F4, §2.4 J5; `sql_templates/Update Calabrio Tables from Staging
  * Tables (D_POST_INSTALL).sql:88-92` is the `IN (...) AND NOT IN
  * (...)` archetype these rewrite). Spark plans those as shuffled
  * left-semi / left-anti hash joins: at 100 TB the BIG side shuffles
  * in full, even though most rows can be decided by key membership
  * alone. A bloom filter over the key side (≈1.2 bytes/key at 1 % fpp
  * — fits comfortably where the raw key set no longer broadcasts)
  * decides the bulk of rows map-side:
  *
  *  - semi join: bloom-NEGATIVE rows are PROVEN non-members (no false
  *    negatives) and drop before the exchange; only the bloom-positive
  *    sliver shuffles into the exact semi join, which removes the
  *    false positives. Result is exactly the plain semi join.
  *  - anti join: the mirror split — bloom-negative rows are proven
  *    non-members and pass through on a map-only branch that never
  *    shuffles; only bloom-positive rows consult the exact anti join.
  *    Result is exactly the plain anti join (NOT-EXISTS semantics,
  *    the same null-safe shape Maintenance's merges use).
  *
  * This is the library-level form of Spark's runtime bloom-filter
  * injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
  * which only fires on CBO selectivity heuristics; pipeline authors
  * get the reduction deterministically. The filter itself is built
  * distributed (one aggregation over the key side) and rides to
  * executors as a plan constant, deserialized once per executor
  * (BloomMightContain's transient lazy); probes are two Murmur3
  * hashes per row inside whole-stage codegen.
  */
object BloomJoin {

  private def bloomBytes(
      keys: DataFrame, keyCol: String, expectedKeys: Long, fpp: Double): Array[Byte] = {
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Exact left-semi join of `big` to `keys`, bloom-prefiltered so
    * provably-unmatched big rows never reach the shuffle. `bigKey` and
    * `keyCol` must be bigint columns.
    */
  def semiJoin(
      big: DataFrame,
      keys: DataFrame,
      bigKey: String,
      keyCol: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(keys, keyCol, expectedKeys, fpp)
    val pre = big
      .where(call_function("bloom_might_contain", col(bigKey), lit(bytes)))
    pre.join(keys, pre(bigKey) === keys(keyCol), "leftsemi")
  }

  /** Distinct-key fingerprint (count + xor) — the staleness guard the
    * persisted index carries. Computed over the DISTINCT key values so
    * duplicated key rows (a semi join doesn't care) can't skew it; one
    * small aggregation over the key side, far cheaper than the bloom
    * build it stands in for.
    */
  private def keyFingerprint(keys: DataFrame, keyCol: String): (Long, Long) = {
    val r = keys.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
      .agg(count(lit(1)), coalesce(expr(s"bit_xor($keyCol)"), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Persist the bloom as a 1-row parquet index (bytes + build
    * params): the build-once / query-many posture of the IVF index
    * (Similarity.buildIvfIndex precedent) applied to the join family.
    * Building the bloom is a full aggregation pass over the key table
    * — per-query that pass can dominate when the keys are large and
    * slow-changing (the reference's staging keys change per load, not
    * per query). The index moves the build to write time; a later,
    * COLD session reloads kilobytes of bytes instead of re-scanning
    * the key table. The exact join side still consults `keys` (the
    * bloom is approximate — false positives need the exact pass), so
    * the index is a shuffle/scan reducer — but a STALE index (keys
    * gained members after the build) would produce false NEGATIVES,
    * so the row also carries a distinct-key fingerprint (n_keys +
    * key_xor) that query time validates against the live key frame.
    */
  def buildIndex(
      keys: DataFrame,
      keyCol: String,
      expectedKeys: Long,
      dir: String,
      fpp: Double = 0.01): Unit = {
    val bytes = bloomBytes(keys, keyCol, expectedKeys, fpp)
    val (nKeys, keyXor) = keyFingerprint(keys, keyCol)
    val spark = keys.sparkSession
    import spark.implicits._
    Seq((keyCol, expectedKeys, fpp, bytes, nKeys, keyXor))
      .toDF("key_col", "expected_keys", "fpp", "bloom", "n_keys", "key_xor")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Incremental maintenance: OR-merge a DELTA key batch into the
    * persisted index — the daily-append posture (new staging keys
    * arrive, the old 99.9% is unchanged) without re-scanning the full
    * key table. Blooms are mergeable by construction: the delta bloom
    * is sized from the STORED (expected_keys, fpp) so the bit arrays
    * are compatible, and the union of set bits is exactly the bloom
    * of the union key set. The fingerprint merges additively
    * (count + , xor ⊕), which is exact when the delta is DISJOINT
    * from the already-indexed keys — the append-only load semantics
    * this maintains. An overlapping delta never yields silent false
    * negatives: the bloom stays a superset either way, and the
    * fingerprint drift surfaces as a loud staleness error at query
    * time (fail-loud, not wrong-answer).
    */
  def mergeIntoIndex(
      deltaKeys: DataFrame,
      keyCol: String,
      indexDir: String): Unit = {
    val spark = deltaKeys.sparkSession
    val row = spark.read.parquet(indexDir).head()
    val builtFor = row.getAs[String]("key_col")
    require(builtFor == keyCol,
      s"bloom index at $indexDir was built over '$builtFor', not '$keyCol'")
    val expectedKeys = row.getAs[Long]("expected_keys")
    val fpp = row.getAs[Double]("fpp")
    val base = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bloom")))
    val delta = deltaKeys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    base.mergeInPlace(delta) // same (expectedKeys, fpp) ⇒ compatible
    val bos = new java.io.ByteArrayOutputStream()
    base.writeTo(bos)
    val (dN, dXor) = keyFingerprint(deltaKeys, keyCol)
    import spark.implicits._
    Seq((keyCol, expectedKeys, fpp, bos.toByteArray,
        row.getAs[Long]("n_keys") + dN, row.getAs[Long]("key_xor") ^ dXor))
      .toDF("key_col", "expected_keys", "fpp", "bloom", "n_keys", "key_xor")
      .coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** semiJoin against a PERSISTED bloom index: identical result,
    * zero bloom-build work — the 1-row index read is the only
    * addition (a bounded driver-side head, like the IVF index's
    * centroid load). Fails loudly if the index was built over a
    * different key column than the join asks for, or if the live key
    * frame's distinct-key fingerprint no longer matches the one the
    * index was built/merged with — a stale bloom yields false
    * NEGATIVES (silently dropped matching rows), so staleness is a
    * hard error directing the caller to mergeIntoIndex/buildIndex,
    * never a silent result change.
    */
  def semiJoinFromIndex(
      big: DataFrame,
      keys: DataFrame,
      bigKey: String,
      keyCol: String,
      indexDir: String): DataFrame = {
    val row = big.sparkSession.read.parquet(indexDir).head() // 1-row index
    val builtFor = row.getAs[String]("key_col")
    require(builtFor == keyCol,
      s"bloom index at $indexDir was built over '$builtFor', not '$keyCol'")
    val (nKeys, keyXor) = keyFingerprint(keys, keyCol)
    require(nKeys == row.getAs[Long]("n_keys") && keyXor == row.getAs[Long]("key_xor"),
      s"bloom index at $indexDir is STALE for this key set " +
        s"(indexed ${row.getAs[Long]("n_keys")} distinct keys, live frame has $nKeys" +
        s"${if (nKeys == row.getAs[Long]("n_keys")) " with a different membership" else ""});" +
        " a stale bloom would silently drop matching big-side rows —" +
        " mergeIntoIndex the delta or rebuild with buildIndex")
    val bytes = row.getAs[Array[Byte]]("bloom")
    val pre = big
      .where(call_function("bloom_might_contain", col(bigKey), lit(bytes)))
    pre.join(keys, pre(bigKey) === keys(keyCol), "leftsemi")
  }

  /** Exact left-anti join of `big` against `keys`: the bloom-negative
    * majority bypasses the join on a map-only branch (a proven
    * non-member IS the anti-join answer), and only bloom-positive rows
    * pay the exchange. The two branches partition `big` by a
    * deterministic predicate, so their union is exactly the plain
    * anti join.
    */
  def antiJoin(
      big: DataFrame,
      keys: DataFrame,
      bigKey: String,
      keyCol: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(keys, keyCol, expectedKeys, fpp)
    val maybe = call_function("bloom_might_contain", col(bigKey), lit(bytes))
    // NULL keys route to the pass-through branch: under NOT-EXISTS
    // semantics a null key never matches, so the plain leftanti KEEPS
    // such rows — two bare where(maybe)/where(!maybe) branches would
    // both filter the null-probe row and silently drop it.
    val provenOut = big.where(col(bigKey).isNull || !maybe)
    val pre = big.where(col(bigKey).isNotNull && maybe)
    val needExact = pre.join(keys, pre(bigKey) === keys(keyCol), "leftanti")
    provenOut.unionByName(needExact)
  }
}
