package graft

import graft.operators.Linkage
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Linkage.hammingLinkage vs brute force: the pigeonhole slice
  * blocking must be candidate-COMPLETE (every pair within maxDist
  * found — the property the blocking's pigeonhole argument proves)
  * and the verify must be exact (nothing beyond maxDist survives).
  * Keys are drawn from a 3-letter alphabet so near pairs are dense.
  */
class LinkageSpec extends SparkSpec {

  private def brute(recs: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ka) <- recs; (ib, kb) <- recs
      if ia < ib
      d = ka.zip(kb).count { case (x, y) => x != y }
      if d <= maxDist
    } yield (ia, ib, d)).toSet

  test("hammingLinkage == all-pairs brute force over random dense keys") {
    import spark.implicits._
    val key = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val gen = Gen.listOfN(40, key).map(_.zipWithIndex.map { case (k, i) => (i.toLong, k) })
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(gen) { recs =>
        val got = Linkage.hammingLinkage(recs.toDF("id", "k"), "id", "k", width = 8, maxDist = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        got == brute(recs, 2)
      })
    assert(res.passed, res.status.toString)
  }

  test("identical keys link at distance zero; ragged keys fail loudly") {
    import spark.implicits._
    val recs = Seq((1L, "aaaa"), (2L, "aaaa"), (3L, "bbbb")).toDF("id", "k")
    val got = Linkage.hammingLinkage(recs, "id", "k", width = 4, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
    val ragged = Seq((1L, "aaaa"), (2L, "aaaaa")).toDF("id", "k")
    intercept[Exception] {
      Linkage.hammingLinkage(ragged, "id", "k", width = 5, maxDist = 1).collect()
    }
    // the sneaky ragged case: keys sharing NO slice bucket must STILL
    // fail loudly (pre-join width validation), not silently link nothing
    val disjoint = Seq((1L, "aaaa"), (2L, "bbbbb")).toDF("id", "k")
    intercept[Exception] {
      Linkage.hammingLinkage(disjoint, "id", "k", width = 5, maxDist = 1).collect()
    }
  }

  // --- editDistanceJoin: FastSS deletion-neighborhood blocking ---

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0
    })
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteEd(recs: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- recs; (ib, sb) <- recs
      if ia < ib
      d = lev(sa, sb)
      if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet

  test("editDistanceJoin == all-pairs brute force incl. ins/del edits, k=1 and k=2") {
    import spark.implicits._
    // variable-length strings over a tiny alphabet: substitutions,
    // insertions, and deletions are all dense
    val str = for {
      n <- Gen.choose(3, 7)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val gen = Gen.listOfN(30, str).map(_.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    for (k <- Seq(1, 2)) {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6),
        Prop.forAll(gen) { recs =>
          val got = Linkage.editDistanceJoin(recs.toDF("id", "s"), "id", "s", maxDist = k)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          got == bruteEd(recs, k)
        })
      assert(res.passed, s"k=$k: ${res.status}")
    }
  }

  test("editDistanceJoin handles empty strings and exact duplicates") {
    import spark.implicits._
    val recs = Seq((1L, ""), (2L, "a"), (3L, "a"), (4L, "ab"), (5L, "xyz")).toDF("id", "s")
    val got = Linkage.editDistanceJoin(recs, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 0L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
  }
}
