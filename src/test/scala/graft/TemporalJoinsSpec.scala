package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** asofJoin / bandJoin vs in-memory brute force, plus physical-plan
  * asserts that neither ever degrades to a nested-loop or cartesian
  * join (the scale rationale in TemporalJoins' scaladoc).
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  // (key, time, id) rights; (key, time) lefts — includes equal-time
  // match, no-match key, and a left earlier than every right
  private val rights = Seq(
    (1L, 100L, "r-a"), (1L, 200L, "r-b"), (1L, 300L, "r-c"),
    (2L, 150L, "r-d"),
    (4L, 50L, "r-e"))
  private val lefts = Seq(
    (1L, 250L), (1L, 200L), (1L, 50L),
    (2L, 1000L),
    (3L, 500L))

  test("asofJoin picks the latest right at-or-before each left, nulls otherwise") {
    val l = lefts.toDF("k", "t")
    val r = rights.toDF("rk", "rt", "tag")
    val got = TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", Seq("rt", "tag"))
      .select("k", "t", "rt", "tag").as[(Long, Long, Option[Long], Option[String])]
      .collect().toSet
    val want = lefts.map { case (k, t) =>
      val m = rights.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
      (k, t, m.map(_._2), m.map(_._3))
    }.toSet
    assert(got === want)
    // spot the semantics: equal time matches, 50 < min(right) does not
    assert(want.contains((1L, 200L, Some(200L), Some("r-b"))))
    assert(want.contains((1L, 50L, None, None)))
  }

  test("asofForwardJoin picks the earliest right at-or-after each left, nulls otherwise") {
    val l = lefts.toDF("k", "t")
    val r = rights.toDF("rk", "rt", "tag")
    val got = TemporalJoins.asofForwardJoin(l, r, "k", "rk", "t", "rt", Seq("rt", "tag"))
      .select("k", "t", "rt", "tag").as[(Long, Long, Option[Long], Option[String])]
      .collect().toSet
    val want = lefts.map { case (k, t) =>
      val m = rights.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
      (k, t, m.map(_._2), m.map(_._3))
    }.toSet
    assert(got === want)
    // spot the semantics: equal time matches forward; a left past every
    // right gets nulls; an early left reaches the first future right
    assert(want.contains((1L, 200L, Some(200L), Some("r-b"))))
    assert(want.contains((2L, 1000L, None, None)))
    assert(want.contains((1L, 50L, Some(100L), Some("r-a"))))
  }

  test("asofForwardJoin preserves left columns and drops the internal axis") {
    val l = lefts.toDF("k", "t").withColumn("extra", col("t") * 2)
    val r = rights.toDF("rk", "rt", "tag")
    val out = TemporalJoins.asofForwardJoin(l, r, "k", "rk", "t", "rt", Seq("tag"))
    assert(out.count() === lefts.size)
    assert(out.columns.toSeq === Seq("k", "t", "extra", "tag"))
  }

  test("asofJoin preserves every left row and all left columns") {
    val l = lefts.toDF("k", "t").withColumn("extra", col("t") * 2)
    val r = rights.toDF("rk", "rt", "tag")
    val out = TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", Seq("tag"))
    assert(out.count() === lefts.size)
    assert(out.columns.toSeq === Seq("k", "t", "extra", "tag"))
    assert(out.where(col("extra") =!= col("t") * 2).count() === 0)
  }

  test("asofJoin: null keys never match each other (SQL join semantics)") {
    val l = Seq((Some(1L), 100L), (None, 100L))
      .toDF("k", "t")
    val r = Seq((Option.empty[Long], 50L, "null-key"), (Some(1L), 50L, "real"))
      .toDF("rk", "rt", "tag")
    val got = TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", Seq("tag"))
      .select("k", "tag").as[(Option[Long], Option[String])].collect().toSet
    // the null-keyed left emits (left-join fidelity) but NEVER picks up
    // the null-keyed right — NULL = NULL is not a match in SQL
    assert(got === Set((Some(1L), Some("real")), (None, None)))
  }

  test("asofJoin resolves duplicate (key, time) rights to the greatest payload, deterministically") {
    // three rights tie at (1, 100): representative must be the greatest
    // (tag, n) tuple — "z" — regardless of input order or partitioning
    val dupRights = Seq(
      (1L, 100L, "m", 7L), (1L, 100L, "z", 1L), (1L, 100L, "a", 9L),
      (1L, 300L, "later", 0L),
      (2L, 100L, "b", 1L), (2L, 100L, "c", 2L))
    val l = Seq((1L, 150L), (1L, 400L), (2L, 500L)).toDF("k", "t")
    val expected = Set(
      (1L, 150L, Some("z"), Some(1L)),   // max tag among the tie
      (1L, 400L, Some("later"), Some(0L)),
      (2L, 500L, Some("c"), Some(2L)))
    // every permutation/partitioning must agree — the sort is total
    for (perm <- Seq(dupRights, dupRights.reverse, scala.util.Random.shuffle(dupRights));
         parts <- Seq(1, 7)) {
      val r = perm.toDF("rk", "rt", "tag", "n").repartition(parts)
      val got = TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", Seq("tag", "n"))
        .select("k", "t", "tag", "n").as[(Long, Long, Option[String], Option[Long])]
        .collect().toSet
      assert(got === expected, s"parts=$parts perm=$perm")
    }
  }

  test("asofJoin rejects colliding output names") {
    val l = lefts.toDF("k", "t")
    val r = rights.toDF("rk", "t", "tag")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, "k", "rk", "t", "t", Seq("t", "tag"))
    }
  }

  test("asofJoin plan is shuffle+window — no join operator at all") {
    val l = lefts.toDF("k", "t")
    val r = rights.toDF("rk", "rt", "tag")
    val p = plan(TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", Seq("tag")))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("bandJoin equals the brute-force band filter, each pair once") {
    val a = (1L to 60L).map(i => (i, i * 7 % 97)).toDF("id_a", "t_a")
    val b = (1L to 50L).map(i => (i, i * 11 % 89)).toDF("id_b", "t_b")
    val got = TemporalJoins.bandJoin(a, b, "t_a", "t_b", 3L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toList
    val want = for {
      (ia, ta) <- (1L to 60L).map(i => (i, i * 7 % 97))
      (ib, tb) <- (1L to 50L).map(i => (i, i * 11 % 89))
      if math.abs(ta - tb) <= 3
    } yield (ia, ib)
    assert(got.sorted === want.toList.sorted) // sorted list compare ⇒ no dup pairs
  }

  test("bandJoin buckets negative times correctly (floor, not truncate)") {
    val a = Seq((1L, -1L)).toDF("id_a", "t_a")
    val b = Seq((2L, 1L), (3L, -9L), (4L, 9L)).toDF("id_b", "t_b")
    val got = TemporalJoins.bandJoin(a, b, "t_a", "t_b", 8L)
      .select("id_b").as[Long].collect().toSet
    assert(got === Set(2L, 3L)) // |−1−9| = 10 > 8 excluded
  }

  test("bandJoin plan is an equi-join on the bucket — never nested-loop") {
    val a = (1L to 20L).map(i => (i, i * 3)).toDF("id_a", "t_a")
    val b = (1L to 20L).map(i => (i, i * 5)).toDF("id_b", "t_b")
    val p = plan(TemporalJoins.bandJoin(a, b, "t_a", "t_b", 4L))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("bandJoin rejects overlapping column names") {
    val a = Seq((1L, 1L)).toDF("id", "t_a")
    val b = Seq((1L, 1L)).toDF("id", "t_b")
    intercept[IllegalArgumentException] {
      TemporalJoins.bandJoin(a, b, "t_a", "t_b", 1L)
    }
  }

  test("intervalJoin: overlap semantics, exactly-once across shared buckets") {
    val l = Seq(
      (1L, 0L, 100L),    // overlaps r1 (touching), r2 (contained)
      (2L, 500L, 2500L), // spans 3 buckets; overlaps r3 twice-bucketed
      (3L, 9000L, 9100L) // overlaps nothing
    ).toDF("l_id", "l_start", "l_end")
    val r = Seq(
      (10L, 100L, 200L),  // touches l1 at 100 exactly — closed intervals match
      (20L, 40L, 60L),    // contained in l1
      (30L, 400L, 2600L), // shares buckets 0,1,2 with l2 — must pair ONCE
      (40L, 3000L, 3100L) // disjoint from everything
    ).toDF("r_id", "r_start", "r_end")
    val got = TemporalJoins.intervalJoin(
      l, r, "l_start", "l_end", "r_start", "r_end", bucketMs = 1000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 20L), (2L, 30L)))
  }

  test("intervalJoin equals the brute-force inequality join on random-ish data") {
    val l = (1L to 60L).map(i => (i, i * 37 % 500, i * 37 % 500 + i % 90))
      .toDF("l_id", "l_start", "l_end")
    val r = (1L to 60L).map(i => (i, i * 53 % 500, i * 53 % 500 + i % 70))
      .toDF("r_id", "r_start", "r_end")
    val got = TemporalJoins.intervalJoin(
      l, r, "l_start", "l_end", "r_start", "r_end", bucketMs = 64L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = l.join(r,
        col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == brute && got.distinct == got)
  }

  test("intervalJoin plans an equi-join and rejects malformed intervals loudly") {
    val l = (1L to 20L).map(i => (i, i * 10, i * 10 + 5)).toDF("l_id", "l_start", "l_end")
    val r = (1L to 20L).map(i => (i, i * 7, i * 7 + 3)).toDF("r_id", "r_start", "r_end")
    val p = plan(TemporalJoins.intervalJoin(
      l, r, "l_start", "l_end", "r_start", "r_end", 16L))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val bad = Seq((1L, 100L, 50L)).toDF("l_id", "l_start", "l_end")
    val e = intercept[Exception] {
      TemporalJoins.intervalJoin(
        bad, r, "l_start", "l_end", "r_start", "r_end", 16L).count()
    }
    assert(e.getMessage != null)
  }
}
