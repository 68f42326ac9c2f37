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
    * (a group may exist in either side only). For any additive
    * measure set, `mergeAdditive(agg(a), agg(b)) == agg(a union b)` —
    * the property the driver row proves against the full-recompute
    * oracle and IncrementalSpec proves for random splits.
    */
  def mergeAdditive(
      state: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val merged = state
      .select(keys.map(col) ++ measures.map(m => col(m).as(s"_s_$m")): _*)
      .join(
        delta.select(keys.map(col) ++ measures.map(m => col(m).as(s"_d_$m")): _*),
        keys, "full_outer")
    measures.foldLeft(merged) { (df, m) =>
      df.withColumn(m,
        coalesce(col(s"_s_$m"), lit(0L)) + coalesce(col(s"_d_$m"), lit(0L)))
    }.select((keys ++ measures).map(col): _*)
  }
}
