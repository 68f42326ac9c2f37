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
}
