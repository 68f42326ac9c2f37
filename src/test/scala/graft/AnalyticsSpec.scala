package graft

import graft.operators.Queries
import java.sql.Timestamp

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.map { case (u, t, ms) => (u, t, new Timestamp(ms)) }
      .toDF("user_id", "event_type", "ts")

  test("funnelCounts: ordering, window anchor at step 0, greedy-earliest completion") {
    val events = ev(
      // user 1 completes all three in order, inside the window
      // anchored at the view (1000): click 1400 ≤ 2000, purchase
      // 1800 ≤ 2000
      (1L, "view", 1000L), (1L, "click", 1400L), (1L, "purchase", 1800L),
      // user 2: click BEFORE the first view — step 2 never completes
      (2L, "click", 500L), (2L, "view", 1000L), (2L, "purchase", 2000L),
      // user 3: click inside the window, purchase outside it
      (3L, "view", 0L), (3L, "click", 50L), (3L, "purchase", 99999L),
      // user 4: greedy-earliest — the SECOND click is late, but the
      // first one anchors the purchase check, which passes
      (4L, "view", 0L), (4L, "click", 10L), (4L, "click", 90000L),
      (4L, "purchase", 20L),
      // user 5: never enters the funnel
      (5L, "purchase", 100L))
    val got = Queries.funnelCounts(events, Seq("view", "click", "purchase"),
      windowMs = 1000L)
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((0, "view", 4L), (1, "click", 3L), (2, "purchase", 2L)))
  }

  test("cohortRetention: first-event week is the cohort, k caps, distinct users") {
    val wk = 604800000L
    val events = ev(
      (1L, "view", 0L), (1L, "view", wk + 1), (1L, "view", wk + 2), // wk0, active wk1 (twice — distinct)
      (2L, "view", 10L), (2L, "view", 3 * wk),                      // wk0, active wk3
      (3L, "view", wk),                                             // cohort wk1, only k=0
      (4L, "view", 0L), (4L, "view", 5 * wk))                       // k=5 beyond the cap
    val got = Queries.cohortRetention(events, maxWeeks = 3)
      .orderBy("cohort_wk", "k").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 3L), // users 1, 2, 4 in week 0
      (0L, 1L, 1L), // user 1 back in week 1 — counted once
      (0L, 3L, 1L), // user 2 back in week 3
      (1L, 0L, 1L))) // user 3's own cohort
  }
}
