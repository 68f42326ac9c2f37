package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of standing aggregates — the batch
  * counterpart of the reference's windowed incremental loads (the
  * lookback-window extract + MERGE cycle, `Start.py:19,39` +
  * `Update_QA_Tables.sql`): instead of recomputing a corpus-wide
  * aggregate every cycle, fold the new batch's partial aggregate into
  * the standing result.
  *
  * Scale posture: the whole point at 100 TB. A full daily-rollup
  * recompute rescans the corpus; the incremental merge touches only
  * the delta (map-side partial agg over the batch) plus one join
  * against the standing aggregate, whose cardinality is the number of
  * groups, not the number of rows. With AQE the delta side (one
  * batch's worth of groups) broadcasts. Correctness rests on the
  * measures being ADDITIVE (count/sum — merge = add); non-additive
  * measures need a mergeable sketch instead (HLL++/GK/Misra–Gries,
  * `operators/Sketches.scala`).
  */
object Incremental {

  /** Merge a delta's partial aggregate into a standing aggregate:
    * full outer join on the group keys, measures added with null → 0
    * (a group may exist in either side only). The join is NULL-SAFE
    * (<=>): groupBy puts all null keys in ONE group, so the merge
    * must match them too — a plain equi-join would emit a null-keyed
    * group twice, once per side (the antiJoin null-key bug class).
    * For any additive measure set,
    * `mergeAdditive(agg(a), agg(b)) == agg(a union b)` — the property
    * the driver row proves against the full-recompute oracle and
    * PropertySpec proves for random splits including null keys.
    *
    * Measure contract: measures must be NON-NULL additive values —
    * counts, or sums over non-null columns. The absent-side zero is
    * cast to each measure's own type, but a group whose measure is
    * legitimately NULL (sum over an all-null column) diverges from a
    * full recompute: SQL's sum returns NULL there, the merge returns
    * 0. Pre-aggregate with count/sum-over-non-null (or carry a
    * companion non-null count and post-derive the NULL) if that
    * distinction matters.
    */
  def mergeAdditive(
      state: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val s = state.select(
      keys.map(k => col(k).as(s"_sk_$k")) ++
        measures.map(m => col(m).as(s"_s_$m")): _*)
    val d = delta.select(
      keys.map(k => col(k).as(s"_dk_$k")) ++
        measures.map(m => col(m).as(s"_d_$m")): _*)
    val cond = keys.map(k => col(s"_sk_$k") <=> col(s"_dk_$k")).reduce(_ && _)
    val merged = s.join(d, cond, "full_outer")
    val withKeys = keys.foldLeft(merged) { (df, k) =>
      // either side may be absent; on a match both carry the same key
      // (null included — the join matched it null-safely)
      df.withColumn(k, coalesce(col(s"_sk_$k"), col(s"_dk_$k")))
    }
    measures.foldLeft(withKeys) { (df, m) =>
      val zero = lit(0L).cast(merged.schema(s"_s_$m").dataType)
      df.withColumn(m,
        coalesce(col(s"_s_$m"), zero) + coalesce(col(s"_d_$m"), zero))
    }.select((keys ++ measures).map(col): _*)
  }
}
