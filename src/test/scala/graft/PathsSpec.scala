package graft

import graft.operators.Paths
import org.apache.spark.sql.functions._

class PathsSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("bfsDistances: chain distances exact within horizon, absent beyond") {
    // 1-2-3-4-5 chain, source {1}, horizon 3 → 4 reached at 3, 5 absent
    val e = undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val got = Paths.bfsDistances(e, Seq(1L).toDF("node"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsDistances: multi-source takes the minimum; cycles do not inflate") {
    // triangle 1-2-3 plus pendant 4 off 3; sources {1, 4}
    val e = undirected(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    val got = Paths.bfsDistances(e, Seq(1L, 4L).toDF("node"), iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsDistances: horizon 0 is the seed set; isolated seeds survive") {
    val e = undirected(1L -> 2L)
    val got = Paths.bfsDistances(e, Seq(9L).toDF("node"), iterations = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(9L -> 0L))
  }

  test("bfsDistances is partitioning-invariant") {
    val e = undirected((1L to 40L).map(i => (i, i % 7 + 100L)): _*)
    val s = Seq(1L, 2L, 3L).toDF("node")
    val a = Paths.bfsDistances(e.repartition(1), s, 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val b = Paths.bfsDistances(e.repartition(17), s, 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
