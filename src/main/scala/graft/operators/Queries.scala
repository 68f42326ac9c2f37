package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics queries from the reference's `queries/` + `sql_templates/`
  * ad-hoc surface, re-expressed over the testdata tables (role mapping in
  * FIXTURES.md §B).
  *
  * Determinism rules (driver hash-compares vs a DuckDB oracle):
  *  - dates/timestamps leave as formatted strings;
  *  - any SUM over a computed double goes through a per-row scaled-long
  *    cast first (order-independent exact integer sums);
  *  - every ORDER BY carries a unique tie-break key.
  */
object Queries {

  /** Flagship: 5-day running call tally, busiest first.
    * Reference: /root/reference/queries/pagenation.sql:1-25
    * (`cjp.t_calls` → events; `call_start` → ts; `call_session_id` → event_id).
    * Covers SURVEY §2 A1 (group-count), W3 (ROWS BETWEEN 4 PRECEDING),
    * P11 (TO_DATE), F2 (IS NOT NULL), O1 (multi-key sort).
    *
    * Scale: groupBy(dt) is a map-side-combinable agg over a date key
    * (few thousand distinct values even at 100 TB); the single
    * un-partitioned window runs over the *aggregated* (tiny) frame,
    * never the raw events.
    */
  def runningTally(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(count(col("event_id")).as("tally"))
    // The window intentionally has no partition: it orders the daily
    // aggregate (|dates|, not |events|, rows) — cheap at any scale.
    val w = Window.orderBy(col("dt")).rowsBetween(-4, 0)
    daily
      .withColumn("running_tally", sum(col("tally")).over(w))
      .orderBy(col("running_tally").desc, col("dt"))
      .select(
        date_format(col("dt"), "yyyy-MM-dd").as("dt"),
        col("tally"),
        col("running_tally"))
  }

  /** CSLB↔contacts reconciliation: which calls matched a contact.
    * Reference: /root/reference/sql_templates/cslb contacts.sql:1-17
    * (CSLB call data → customer, Calabrio contacts → orders so the LEFT
    * join can actually miss). Covers J1 (left equi-join), A2 (DISTINCT),
    * F2 (IS NOT NULL), O1 (ORDER BY ordinal).
    *
    * Scale: the SQL's LEFT-join + IS NOT NULL + DISTINCT is
    * semantically "distinct join keys present on both sides". The
    * naive plan amplifies rows 1:N through the join and distincts
    * afterwards (superlinear on a skewed key at 100×); instead,
    * aggregate the fact side to distinct keys FIRST, then left-semi
    * probe the dimension — one shuffle on the already-reduced key set,
    * zero amplification (VERDICT r2 "What's wrong" #5).
    */
  def cslbReconcile(spark: SparkSession, sfDir: String): DataFrame = {
    val cslb = Tables.customer(spark, sfDir)
    val clb = Tables.orders(spark, sfDir)
    clb
      .select(col("o_custkey").as("contact_id"))
      .distinct()
      .join(cslb.select(col("c_custkey")),
        col("contact_id") === col("c_custkey"), "left_semi")
      .orderBy(col("contact_id"))
  }

  /** Pricing summary (TPC-H Q1 shape) — the bench workhorse: full
    * lineitem scan, map-side-combinable aggregate on a 6-value key.
    * Money sums go through scaled longs (see object scaladoc).
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    // price*(1-disc) and *(1+tax) have <=4 and <=6 decimals: scale to
    // exact integers per row, then sum longs (order-independent).
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_price_e2"),
        sum(round(disc * 10000).cast("long")).as("sum_disc_price_e4"),
        sum(round(charge * 1000000).cast("long")).as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Top revenue orders (join + agg + limit). Covers join strategy at
    * scale: orders⋈lineitem on the natural key, AQE handles skew; the
    * limit is pushed through the sort (TakeOrderedAndProject).
    */
  def topRevenueOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val revE4 = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")
    li.select(col("l_orderkey"), revE4.as("rev_e4"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("rev_e4")).as("revenue_e4"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        col("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey"))
      .limit(100)
  }

  /** JSON path extraction at table scale (P1 over the events stream
    * table — FIXTURES.md §B: events.props plays the VARIANT src
    * column): extract+cast a path out of 600k JSON strings, filter on
    * the extracted value, aggregate per type. The filter on the
    * extracted path can't push to parquet (it's inside the JSON
    * string), but column pruning keeps the scan to 3 columns and the
    * aggregate is map-side combinable on a 5-value key.
    */
  def eventPropsSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        round(col("value") * 100).cast("long").as("value_e2"))
      .filter(col("k").isNotNull && col("k") >= 10)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        sum("value_e2").as("sum_value_e2"))
      .orderBy("event_type")

  /** Batch sessionization: split each user's event stream into
    * sessions at inactivity gaps > `gapMs`, one output row per
    * session. The batch twin of the streaming
    * flatMapGroupsWithState sessionizer (IncrementalSync) — same
    * semantics, expressed as two running windows (lag → gap flag →
    * running sum = session ordinal) plus a group-by, all partitioned
    * by user_id: each executor sweeps its own users, no single-
    * partition window anywhere, so the shape holds at any user count.
    * Times ride as epoch ms (see asof_attribution's precision note);
    * (ms, event_id) ordering makes simultaneous events deterministic.
    */
  def sessionize(spark: SparkSession, sfDir: String, gapMs: Long = 1800000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) DIV 1000").as("ms"))
      .withColumn("prev", lag(col("ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("sess_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_seq")
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"))
      .orderBy("user_id", "sess_seq")
  }

  /** Null probe: evaluations missing an evaluator.
    * Reference: /root/reference/sql_templates/trouble_children.sql:1-8.
    * Runs over the Calabrio fixture evaluations (see Fixtures).
    * Covers F2 (IS NULL), P12 (column pruning: one col out of ten).
    */
  /** Rolling z-score anomaly flags over each user's trailing week —
    * the metric-drift detector of the OLAP family: an event is
    * anomalous when its value sits more than 3 standard deviations
    * from the mean of that user's PRIOR 7 days. INTEGER arithmetic
    * throughout: values quantize to cents (exact — the fixture
    * carries two decimals) and the flag is the cross-multiplied
    * z² > 9 test, (x·n − S₁)² > 9·(n·S₂ − S₁²) over trailing window
    * sums — no division, no sqrt, so the DuckDB oracle hash-matches
    * bit for bit. The frame EXCLUDES the current row (RANGE … 1
    * PRECEDING): self-inclusion dilutes the very deviation under
    * test. Fewer than minN prior points → not flaggable (cold-start
    * guard). Zero prior variance makes ANY deviation anomalous —
    * the z→∞ limit, stated rather than special-cased.
    *
    * Long-arithmetic bound: exact while n·C² < 2⁶³ for C = max
    * cents — n ≤ 10⁹ at C ≤ 10³, far beyond any 7-day user window.
    * Scale: ONE shuffle on user_id (the window partition), map-only
    * flag math; per-user state is the frame Spark already maintains
    * for RANGE windows (a bounded buffer of one week per user).
    */
  def rollingZScore(events: DataFrame, minN: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ms"))
      .rangeBetween(-7L * 86400 * 1000, -1L)
    val dev = col("c") * col("n") - col("s1")
    events
      .withColumn("ms", expr("unix_millis(ts)"))
      .withColumn("c", round(col("value") * 100).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("c") * col("c")).over(w), lit(0L)))
      .select(
        col("event_id"), col("n").as("n_window"),
        (col("n") >= minN &&
          dev * dev > lit(9L) * (col("n") * col("s2") - col("s1") * col("s1")))
          .as("is_anomaly"))
  }

  /** Ordered funnel conversion — the product-analytics census over
    * event streams: a user completes step i when the step's event
    * type occurs STRICTLY AFTER their step-(i−1) completion and
    * within `windowMs` of entering the funnel (step 0's completion —
    * the classic "converted within 7 days of first view" anchor).
    * Completion time per step is the EARLIEST eligible event
    * (greedy-earliest, the standard and the SQL-replayable choice).
    * Returns one row per step: (step_idx, step, n_users), a cumulative
    * funnel by construction (level i requires level i−1). ONE
    * declarative plan — the per-step frames chain through user-keyed
    * equi-joins (each level only shrinks) and the counts union
    * lazily; no driver-side actions, no window over the full stream.
    */
  def funnelCounts(
      events: DataFrame, steps: Seq[String], windowMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnelCounts needs at least one step")
    require(windowMs > 0, "windowMs must be positive")
    val ev = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts) DIV 1000").as("ms"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ms").as("t"))
      .withColumn("t0", col("t"))
    val levels = steps.tail.scanLeft(first) { (cur, s) =>
      ev.filter(col("event_type") === s).select(col("user_id"), col("ms"))
        .join(cur.select("user_id", "t", "t0"), "user_id")
        .where(col("ms") > col("t") && col("ms") <= col("t0") + windowMs)
        .groupBy("user_id").agg(min("ms").as("t"), min("t0").as("t0"))
    }
    levels.zip(steps).zipWithIndex.map { case ((df, s), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(s).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention: cohort = the epoch-week of each user's
    * FIRST event, and cell (cohort_wk, k) counts distinct users from
    * that cohort active k weeks later — the standard retention
    * triangle. Integer epoch-week arithmetic (ms div week) keeps the
    * bucketing engine-neutral. Two shuffles: the per-user min and the
    * (cohort, k) distinct count.
    */
  def cohortRetention(events: DataFrame, maxWeeks: Int = 3): DataFrame = {
    require(maxWeeks >= 0, "maxWeeks must be non-negative")
    val ev = events.select(col("user_id"),
      expr("(unix_micros(ts) DIV 1000) DIV 604800000").as("wk"))
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    ev.join(cohort, "user_id")
      .withColumn("k", col("wk") - col("cohort_wk"))
      .filter(col("k") <= maxWeeks)
      .groupBy("cohort_wk", "k")
      .agg(countDistinct("user_id").as("n_users"))
  }

  def troubleChildren(evaluations: DataFrame): DataFrame =
    evaluations
      .filter(col("evaluator_id").isNull)
      .select(col("contact_id"))
      .orderBy(col("contact_id"))
}
