package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-axis joins Spark's built-in operators don't express directly:
  * as-of (latest right row at-or-before each left row per key) and
  * band/range (pairs within a bounded distance on an orderable axis).
  *
  * Both are built from shuffle-on-key primitives — no nested-loop or
  * cartesian physical join ever appears in the plan (PlanSpec-style
  * asserts in TemporalJoinsSpec), which is the whole point: Spark's
  * own answer to `a.ts BETWEEN b.ts - x AND b.ts + x` with no equi-key
  * is BroadcastNestedLoopJoin, which is O(|L|·|R|) work and a
  * single-executor broadcast wall at 100 TB.
  */
object TemporalJoins {

  /** As-of LEFT join: for every left row, the single right row with
    * the greatest `rightTime` ≤ `leftTime` among rows sharing the join
    * key — SQL engines with native support call this `ASOF JOIN`
    * (DuckDB's is the oracle for the driver row). Lefts with no
    * qualifying right get nulls, like a left join.
    *
    * Shape: tag rights 0 / lefts 1, union, one hash shuffle on the
    * key, then a running `last(payload, ignoreNulls)` over
    * (time, tag) rows-between(unboundedPreceding, currentRow). The
    * running frame is computed incrementally by WindowExec (one
    * aggregate update per row, no per-row frame rescans), so the cost
    * is sort + one pass — the same work a dedicated as-of merge would
    * do, and it partitions by key, so 1000 executors each sweep their
    * own keys.
    *
    * Contract: `rightVals` must not collide with left column names.
    * Duplicate rights per (key, time) are ALLOWED and resolve
    * deterministically: the payload tuple rides the window sort, so at
    * equal (key, time) the greatest `rightVals` tuple (struct order =
    * field-by-field, left to right) is the representative — the same
    * row `max_by(payload, payload)` would keep, chosen with zero extra
    * shuffle. This requires every rightVals type to be orderable
    * (maps are not). Right rows with a null time never match (they
    * are dropped — mirrors `t >= NULL` being false in SQL). Rights at
    * exactly `leftTime` DO match (≤, not <).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val collisions = rightVals.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rightVals collide with left columns: $collisions")

    val payload = struct(rightVals.map(col): _*)
    val payloadType = right.select(payload.as("_p")).schema("_p").dataType
    val leftRow = struct(left.columns.map(col): _*)
    val leftRowType = left.select(leftRow.as("_p")).schema("_p").dataType

    val l = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      lit(null).cast(payloadType).as("_rv"), leftRow.as("_lv"))
    // null-keyed/null-timed rights can never match under SQL equality
    // (NULL = NULL is not true) — but Window.partitionBy GROUPS nulls
    // together, so without this filter a null-keyed left would receive
    // a null-keyed right's payload, diverging from the ASOF JOIN
    // semantics the oracle implements. Null-keyed LEFTS stay: their
    // partition then holds no rights and they emit with nulls, exactly
    // like a left join.
    val r = right
      .where(col(rightTime).isNotNull && col(rightKey).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
        payload.as("_rv"), lit(null).cast(leftRowType).as("_lv"))

    // rights sort before lefts at equal time so `t_right == t_left`
    // matches; _rv makes the order TOTAL over rights, so duplicate
    // (key, time) rights deterministically resolve to the greatest
    // payload tuple (the running last sees it last). The frame is a
    // running one, so WindowExec maintains the carried value
    // incrementally instead of rescanning frames.
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(c => col(s"_lv.$c").as(c)) ++
        rightVals.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** As-of FORWARD left join: for every left row, the single right
    * row with the SMALLEST `rightTime` ≥ `leftTime` among rows sharing
    * the key — "next event at-or-after" (next action after a
    * conversion, next deploy after an alert), the mirror of asofJoin's
    * "latest at-or-before". Implemented BY that mirror: negate the
    * time axis and delegate — min(rt ≥ lt) on the real axis IS
    * max(−rt ≤ −lt) on the negated one, so the whole
    * union/shuffle/running-window machinery (and its null-key,
    * equal-time, and scale behavior) is inherited rather than
    * re-proven. Times must therefore be NUMERIC (epoch ms/us longs —
    * the convention every driver row already uses; a timestamp has no
    * unary minus). Duplicate rights at the matched (key, time) resolve
    * to the greatest `rightVals` tuple, same rule as asofJoin.
    */
  def asofForwardJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    require(!left.columns.contains("_negt") && !right.columns.contains("_negt_r"),
      "asofForwardJoin reserves the column names _negt/_negt_r")
    asofJoin(
      left.withColumn("_negt", -col(leftTime)),
      right.withColumn("_negt_r", -col(rightTime)),
      leftKey, rightKey, "_negt", "_negt_r", rightVals)
      .drop("_negt")
  }

  /** Band (bounded-range) INNER join: all (left, right) pairs with
    * |leftTime − rightTime| ≤ band. No equi-key required — the
    * equi-key is MANUFACTURED: rows bucket to floor(t/band); a right
    * row within `band` of a left row is always in the left's bucket
    * ±1, so exploding each left to its 3 candidate buckets and
    * equi-joining on the bucket finds every qualifying pair exactly
    * once (the right's bucket is unique), with the exact predicate
    * re-checked on the survivors. Work is Σ|bucket_L|·|bucket_R| over
    * co-bucketed rows — data-proximity bound, not |L|·|R| — and the
    * join is a plain shuffled equi-join, so it scales out and AQE can
    * split skewed buckets.
    *
    * Times must be non-negative integral (epoch ms/us); bucketing uses
    * floor-division via pmod so a future negative epoch still buckets
    * correctly. Column names must be disjoint (self-joins: alias
    * first).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      band: Long): DataFrame = {
    require(band > 0, "band must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"band join requires disjoint column names, both sides have: $overlap")
    // _bucket is the manufactured join key; a same-named data column
    // would be silently overwritten and then dropped from the output
    require(!(left.columns ++ right.columns).contains("_bucket"),
      "band join reserves the column name _bucket")

    // Column arithmetic, not an expr() SQL string: interpolating a raw
    // column name would mis-parse names needing backticks (spaces,
    // dots, hyphens). `div` keeps the division integral (exact at any
    // epoch magnitude, where a double `/` would round past 2^53).
    def bucketOf(t: String): Column =
      call_function("div", col(t) - pmod(col(t), lit(band)), lit(band))

    val l = left.withColumn("_bucket",
      explode(array(bucketOf(leftTime) - 1, bucketOf(leftTime), bucketOf(leftTime) + 1)))
    val r = right.withColumn("_bucket", bucketOf(rightTime))
    l.join(r, Seq("_bucket"))
      .where(abs(col(leftTime) - col(rightTime)) <= band)
      .drop("_bucket")
  }

  /** Interval OVERLAP join: every (l, r) pair with [lStart,lEnd] ∩
    * [rStart,rEnd] ≠ ∅ (closed intervals — touching endpoints match),
    * WITHOUT the broadcast-nested-loop plan Spark gives the raw
    * inequality predicate. Both sides explode their intervals into
    * fixed-width time buckets, the join is a plain shuffled equi-join
    * on bucket, and the CANONICAL-BUCKET rule — keep a pair only in
    * the bucket holding max(lStart, rStart), which any overlapping
    * pair provably co-occupies — makes every match survive EXACTLY
    * once: no distinct, no post-dedup shuffle. Work is Σ per-bucket
    * |L|·|R| (data-proximity bound; AQE splits a skewed bucket), and
    * the explode fan-out is interval_length/bucketMs + 1 per row, so
    * pick bucketMs near the typical interval length. Times must be
    * integral epoch ms; an end before its start is a loud per-row
    * error (a silently-descending `sequence` would bucket wrong, and
    * dropping the row would silently under-join). Column names must
    * be disjoint; self-joins alias first.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"interval join requires disjoint column names, both sides have: $overlap")
    require(!(left.columns ++ right.columns).contains("_bucket"),
      "interval join reserves the column name _bucket")
    def bucketOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(bucketMs)), lit(bucketMs))
    def buckets(s: String, e: String): Column =
      explode(sequence(bucketOf(col(s)),
        bucketOf(when(col(e) >= col(s), col(e)).otherwise(raise_error(
          concat(lit(s"interval join: $e < $s on row with $s="), col(s).cast("string")))))))
    val l = left.withColumn("_bucket", buckets(lStart, lEnd))
    val r = right.withColumn("_bucket", buckets(rStart, rEnd))
    l.join(r, Seq("_bucket"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("_bucket") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("_bucket")
  }
}
