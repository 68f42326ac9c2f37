package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The write-path merge semantics of the reference transform,
  * re-expressed as DataFrame algebra (SURVEY §2.4 J2-J6, §2.9 D1-D2).
  * Snowflake MERGE/DELETE mutate a table in place; the Spark-native
  * equivalent computes the post-merge relation and overwrites
  * atomically (write tmp, swap) — these functions return that
  * post-merge relation, so they compose, unit-test, and
  * oracle-compare without any filesystem side effects.
  *
  * Scale posture: every helper is one equi-join/anti-join on the merge
  * key — shuffle on the key, no row amplification (keys are unique on
  * the source side by construction: the shredding layer dedups W1
  * upstream). With AQE on, small staging sides broadcast.
  */
object Maintenance {

  /** MERGE … WHEN NOT MATCHED INSERT (J2): rows of `source` whose key
    * is absent from `target` are appended; matched rows are untouched.
    * Reference: Update…sql:36-53 (qa contacts), :62-79 (all contacts).
    */
  def insertOnlyMerge(target: DataFrame, source: DataFrame, key: Seq[String]): DataFrame =
    target.unionByName(
      source.join(target.select(key.map(col): _*).distinct(), key, "left_anti"))

  /** MERGE update+insert keeping selected target columns (J3): matched
    * rows take the source's values except `keepCols`, which retain the
    * target's (the reference keeps `evaluated_date`, and never updates
    * the key or `contact_id` — Update…sql:128-130). Non-matches insert.
    * Both sides must share target's schema and have unique keys.
    */
  def upsertKeepCols(
      target: DataFrame,
      source: DataFrame,
      key: Seq[String],
      keepCols: Set[String]): DataFrame = {
    val cols = target.columns.toSeq
    val t = target.withColumn("_t", lit(1)).as("t")
    val s = source.withColumn("_s", lit(1)).as("s")
    t.join(s, key, "full_outer")
      .select(cols.map { c =>
        val pick =
          if (key.contains(c)) col(c)
          else if (keepCols(c)) when(col("_t") === 1, col(s"t.$c")).otherwise(col(s"s.$c"))
          else when(col("_s") === 1, col(s"s.$c")).otherwise(col(s"t.$c"))
        pick.as(c)
      }: _*)
  }

  /** The evaluations DELETE (D1/J5): drop target rows whose contact
    * was restated in this batch AND whose evaluation id no longer
    * appears in staging — i.e. the evaluation was deleted upstream.
    * Reference: Update…sql:88-92 (IN contacts-staging AND NOT IN
    * evaluations-staging). Ids come from the RAW staging frames —
    * the reference does not filter them by SCORED state.
    */
  def deleteVanished(
      target: DataFrame,
      restatedContactIds: DataFrame, // single col: contact_id
      stagedEvalIds: DataFrame // single col: evaluation_id
  ): DataFrame = {
    val c = restatedContactIds.distinct().withColumn("_in_c", lit(1))
    val e = stagedEvalIds.distinct().withColumn("_in_e", lit(1))
    // Null-safe <=>: for non-restated contacts _in_c is NULL, and a
    // plain === would make the whole predicate NULL → row wrongly
    // dropped (SQL three-valued logic).
    target
      .join(c, Seq("contact_id"), "left")
      .join(e, Seq("evaluation_id"), "left")
      .filter(!(col("_in_c") <=> 1 && col("_in_e").isNull))
      .drop("_in_c", "_in_e")
  }

  /** SCD Type-2 merge — the history-keeping upsert the J2/J3 family
    * deliberately lacks: where upsertKeepCols REPLACES a matched row,
    * this closes it out and versions it, so the dimension answers
    * "what was this customer's segment on date X" forever after. The
    * contract the warehouse literature calls slowly-changing
    * dimensions type 2 (Kimball), and the lineage-tracking shape a
    * training-data pipeline needs for dataset cards ("which quality
    * tier was this source in when we sampled it").
    *
    * `dim` must carry exactly (key, tracked…, valid_from, valid_to,
    * is_current); `updates` carries (key, tracked…, effCol) with AT
    * MOST ONE row per key (pre-aggregate a multi-day backlog to
    * latest-per-key first — the W2 dedup shape). Per update key:
    *  - no current row → insert (valid_from=eff, open, current);
    *  - current row differs on ANY tracked column (null-safe <=>) →
    *    close it (valid_to=eff, not current) AND insert the new
    *    version;
    *  - identical tracked values → no-op (idempotent replay).
    * History rows (is_current=false) pass through untouched.
    *
    * Scale shape: ONE full-outer equi-join of the CURRENT slice
    * against the delta, then a map-only conditional explode emits
    * 1-or-2 output rows per joined row — the three outcome branches
    * are NOT three filters over the join (that would re-execute the
    * join subtree per branch); history never joins anything. Presence
    * markers (_c/_u), not key-null checks, decide matching — a null
    * dimension key row stays inert instead of cross-matching.
    */
  def scd2Merge(
      dim: DataFrame,
      updates: DataFrame,
      key: String,
      tracked: Seq[String],
      effCol: String): DataFrame = {
    val vtType = dim.schema("valid_to").dataType
    val vfType = dim.schema("valid_from").dataType
    val cur = dim.filter(col("is_current")).withColumn("_c", lit(1)).as("c")
    val hist = dim.filter(!col("is_current"))
    val u = updates
      .select((col(key) +: (tracked.map(col) :+ col(effCol))): _*)
      .withColumn("_u", lit(1)).as("u")
    val j = cur.join(u, Seq(key), "full_outer")
    val changed = tracked.map(t => !(col(s"c.$t") <=> col(s"u.$t")))
      .reduce(_ || _)
    val names = tracked ++ Seq("valid_from", "valid_to", "is_current")
    def mk(vals: Seq[org.apache.spark.sql.Column]) =
      struct(vals.zip(names).map { case (c, n) => c.as(n) }: _*)
    val curRow = mk(tracked.map(t => col(s"c.$t")) ++ Seq(
      col("c.valid_from"), col("c.valid_to"), col("c.is_current")))
    val closedRow = mk(tracked.map(t => col(s"c.$t")) ++ Seq(
      col("c.valid_from"), col(s"u.$effCol").cast(vtType), lit(false)))
    val newRow = mk(tracked.map(t => col(s"u.$t")) ++ Seq(
      col(s"u.$effCol").cast(vfType), lit(null).cast(vtType), lit(true)))
    val out = when(col("_u").isNull, array(curRow))
      .when(col("_c").isNull, array(newRow))
      .when(changed, array(closedRow, newRow))
      .otherwise(array(curRow))
    hist.select((col(key) +: names.map(col)): _*)
      .unionByName(
        j.select(col(key), explode(out).as("_r")).select(col(key), col("_r.*")))
  }

  /** DELETE-then-INSERT partition rebuild keyed on contact_id (D2/J6):
    * wipe every target row belonging to a restated contact, then
    * append the freshly shredded rows. Reference: Update…sql:140-170
    * (scores), :174-215 (comments) — Spark's dynamic-partition-
    * overwrite analog expressed relationally.
    */
  def rebuildForContacts(
      target: DataFrame,
      restatedContactIds: DataFrame, // single col: contact_id
      fresh: DataFrame): DataFrame =
    target
      .join(restatedContactIds.distinct(), Seq("contact_id"), "left_anti")
      .unionByName(fresh)
}
