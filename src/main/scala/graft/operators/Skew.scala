package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handling
  * (enabled in Sessions.local) is the first line of defense — it
  * splits oversized sort-merge partitions at runtime. Manual salting
  * remains the tool when the skew is known ahead of time, the join
  * isn't sort-merge, or a deterministic plan is required; this is the
  * "salting for skew" posture from the builder brief made concrete.
  */
object Skew {

  /** Equi-join `big` ⋈ `small` on `key`, spreading each hot key over
    * `saltFactor` reducers: the big side gets a per-row salt in
    * [0, saltFactor), the small side is replicated once per salt
    * value, and the join key becomes (key, salt). Multiplicity is
    * unchanged — every big row still meets each matching small row
    * exactly once — so the result equals the unsalted join (checked
    * property-style in PropertySpec).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // right/full would emit each UNMATCHED small-side row once per
    // salt replica — silently wrong multiplicity, so refuse
    require(Set("inner", "left", "leftouter", "leftsemi")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi joins, got $joinType")
    // content-hash salt, not monotonically_increasing_id: the salt a
    // row gets survives task retries and repartitioning (same posture
    // as the hash-gated sampling ops), and any within-key spread works
    // for correctness — identical full rows sharing a salt only
    // matters if the corpus is itself one giant duplicated row
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Hybrid skew join: salt ONLY the measured-hot keys, join the rest
    * plain — the production shape when the key histogram is heavy-
    * tailed (a handful of hot keys over a long uniform tail). Full
    * salting replicates the ENTIRE small side saltFactor×, taxing the
    * well-behaved 99% of keys for the 1% that skew; here:
    *
    *  1. hot-key census: one partial-aggregating groupBy on the big
    *     side's key — map-side combine collapses each partition to
    *     |keys| counter rows, and the hot SET is bounded by
    *     construction (≤ N/hotMinRows keys can exceed hotMinRows), so
    *     it broadcasts;
    *  2. both sides split by a broadcast semi/anti probe (map-only,
    *     no shuffle);
    *  3. hot slice → saltedJoin (small-side replicas only for hot
    *     keys' matches), cold slice → plain equi-join (AQE handles
    *     residual imbalance), unionByName.
    *
    * Result equals the plain join exactly (multiplicity unchanged on
    * both paths; the key split is a partition of the key space) —
    * ScalaCheck-verified, and the driver row's oracle IS the plain
    * join. Null keys ride the cold path: the anti probe keeps them,
    * and plain-join semantics (drop for inner, preserve-unmatched for
    * left) are exactly the contract. The census is exact counts, not
    * a sketch, so the plan is deterministic run-to-run; a streaming
    * ingest swaps stage 1 for the Count–Min sketch's ≥-true estimates
    * at the same split semantics — cmSkewJoin below, driven
    * per-micro-batch by IncrementalSync.skewJoinSync.
    *
    * Deliberate trade, stated plainly: the big side is SCANNED three
    * times (census + hot branch + cold branch — Catalyst reuses
    * exchanges, not scan subtrees) in exchange for shuffling the
    * small side's replicas only for hot keys. Scans are the cheap
    * currency (columnar, pruned, often cached); shuffle volume is
    * the expensive one — full salting replicates |small|·saltFactor
    * rows through the exchange for EVERY key. A caller re-joining
    * the same big frame repeatedly should cache it or persist the
    * census.
    */
  def hybridSkewJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hotMinRows: Long,
      joinType: String = "inner"): DataFrame = {
    require(hotMinRows > 0, "hotMinRows must be positive")
    val hot = big.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotMinRows)
      .select(key)
    val bigHot = big.join(broadcast(hot), Seq(key), "left_semi")
    val bigCold = big.join(broadcast(hot), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hot), Seq(key), "left_semi")
    val smallCold = small.join(broadcast(hot), Seq(key), "left_anti")
    saltedJoin(bigHot, smallHot, key, saltFactor, joinType)
      .unionByName(bigCold.join(smallCold, Seq(key), joinType))
  }

  /** The Count–Min-driven variant of hybridSkewJoin — the census
    * replacement a STREAMING ingest needs (hybridSkewJoin's exact
    * groupBy census re-counts from zero each call; a stream must
    * accumulate key frequencies ACROSS micro-batches, which is
    * exactly what the mergeable Sketches.CountMin does). The hot/cold
    * split is a deterministic map-only predicate on
    * `cm_estimate(sketch, key) >= hotMinRows`, applied to BOTH sides,
    * so the key space is partitioned consistently without ever
    * materializing a hot-key set. Polarity does the safety work: CM
    * estimates never undercount, so a truly-hot key can NEVER be
    * missed — misclassification only ever salts a cold key (a spread
    * tax, not a correctness risk). Result equals the plain join
    * exactly, same argument as hybridSkewJoin (both paths preserve
    * multiplicity; the predicate partitions the key space; null keys
    * ride the cold path with plain-join semantics).
    */
  def cmSkewJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      sketch: Array[Long],
      depth: Int,
      width: Int,
      hotMinRows: Long,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(hotMinRows > 0, "hotMinRows must be positive")
    require(sketch.length == depth * width,
      s"sketch has ${sketch.length} counters, expected ${depth * width}")
    // unresolved column expressions — they re-resolve against each
    // frame they filter, so one definition splits both sides
    val est = call_function("cm_estimate",
      lit(sketch), col(key).cast("string"), lit(depth), lit(width))
    val hotPred = col(key).isNotNull && est >= hotMinRows
    val coldPred = col(key).isNull || est < hotMinRows
    val bigHot = big.where(hotPred)
    val bigCold = big.where(coldPred)
    val smallHot = small.where(hotPred)
    val smallCold = small.where(coldPred)
    saltedJoin(bigHot, smallHot, key, saltFactor, joinType)
      .unionByName(bigCold.join(smallCold, Seq(key), joinType))
  }
}
