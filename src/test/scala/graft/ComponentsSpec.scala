package graft

import graft.operators.Components
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Connected components / dedup survivors: the alternating star
  * algorithm must agree with a brute-force union-find on arbitrary
  * graphs, converge fast on the adversarial long-path shape, and
  * survive the degenerate inputs (empty, self-loops, duplicates).
  */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components
      .connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  /** Reference union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    // roots are already component minima because union always points
    // the larger root at the smaller
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("matches union-find on random graphs (ScalaCheck)") {
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L)
    } yield (a, b)
    val prop = Prop.forAll(Gen.listOf(edgeGen)) { edges =>
      val real = edges.filter { case (a, b) => a != b }
      labelsOf(edges) == unionFind(real)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("long path collapses to one component (log-round convergence)") {
    val n = 64L
    val path = (0L until n - 1).map(i => (i, i + 1))
    val labels = labelsOf(path)
    assert(labels.keySet == (0L until n).toSet)
    assert(labels.values.toSet == Set(0L))
  }

  test("two clusters + degenerate edges: self-loops, dups, reversals") {
    val edges = Seq(
      (5L, 3L), (3L, 5L), (5L, 5L), (3L, 9L), (9L, 3L), // cluster {3,5,9}
      (20L, 21L), (21L, 20L), (20L, 21L)) // cluster {20,21}
    assert(labelsOf(edges) ==
      Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("empty edge set yields empty labels") {
    val labels = Components.connectedComponents(
      spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(labels.collect().isEmpty)
    assert(labels.columns.toSeq == Seq("id", "component"))
  }

  test("dedupSurvivors keeps cluster minima and all unpaired docs") {
    val docs = (0L to 9L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters {1,2,3} (transitive chain) and {7,9}; 0,4,5,6,8 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L)).toDF("doc_a", "doc_b")
    val kept = Components.dedupSurvivors(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L, 4L, 5L, 6L, 8L, 7L).sorted)
  }

  test("leakageSafeSplit: clusters move whole; singletons draw on their own id; gate exact") {
    val docs = (0L to 99L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // two chains and one pair; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L), (40L, 41L), (41L, 42L))
      .toDF("doc_a", "doc_b")
    val got = Components.leakageSafeSplit(docs, pairs, valPerMille = 200)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.size == 100)
    // cluster members share their component's verdict — no straddling
    for (cluster <- Seq(Seq(1L, 2L, 3L), Seq(7L, 9L), Seq(40L, 41L, 42L))) {
      assert(cluster.map(got(_)._2).distinct.size == 1,
        s"cluster $cluster straddles the split")
      assert(cluster.map(got(_)._1).distinct == Seq(cluster.min),
        s"cluster $cluster must label as its minimum")
    }
    // the gate replayed in plain Scala: md5 of the component id
    def draw(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
    val thr = f"${200 * 65536L / 1000L}%04x"
    got.foreach { case (_, (comp, split)) =>
      assert(split == (if (draw(comp) < thr) "val" else "train"))
    }
    // at 200‰ over 100 docs both sides must be non-empty (md5 spreads)
    assert(got.values.map(_._2).toSet == Set("train", "val"))
    intercept[IllegalArgumentException] {
      Components.leakageSafeSplit(docs, pairs, valPerMille = 1000)
    }
  }

  test("non-convergent budget throws instead of returning partial labels") {
    val path = (0L until 64L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalStateException] {
      Components.connectedComponents(path.toDF("doc_a", "doc_b"), maxIter = 1)
        .collect()
    }
  }

  test("PageRank: hub of a star out-ranks the leaves; symmetric pairs tie; deterministic") {
    import spark.implicits._
    import graft.operators.PageRank
    // star 0↔{1,2,3,4} plus a detached symmetric pair 10↔11
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (10L, 11L))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a, b, 1L) }
      .toDF("src", "dst", "w")
    val ranks = PageRank.run(edges, iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 7)
    assert((1L to 4L).forall(l => ranks(0L) > ranks(l)),
      s"hub must out-rank leaves: $ranks")
    assert(ranks(1L) == ranks(2L) && ranks(10L) == ranks(11L),
      s"symmetric nodes must tie exactly: $ranks")
    val again = PageRank.run(edges, iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == ranks, "integer arithmetic must be run-stable")
  }

  test("PageRank personalized: mass concentrates at the seed; symmetric non-seeds tie; unreachable stays 0") {
    import spark.implicits._
    import graft.operators.PageRank
    // star 0↔{1,2,3}, detached pair 10↔11; teleport pinned to node 0
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (10L, 11L))
    val edges = (und ++ und.map(_.swap)).map { case (a, b) => (a, b, 1L) }
      .toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    val ranks = PageRank.runPersonalized(edges, seeds, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 6)
    assert((1L to 3L).forall(l => ranks(0L) > ranks(l)), s"seed must dominate: $ranks")
    assert(ranks(1L) == ranks(2L) && ranks(2L) == ranks(3L))
    assert(ranks(10L) == 0L && ranks(11L) == 0L,
      s"nodes unreachable from the seed carry zero rank: $ranks")
  }

  test("LabelProp: synchronous votes are deterministic; the heavier edge wins") {
    import spark.implicits._
    import graft.operators.LabelProp
    // star 0↔{1,2,3,4}: round 1 gives leaves the hub's 0 and the hub
    // the lowest leaf label; round 2 swaps them back through the votes
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val star = (und ++ und.map(_.swap)).map { case (a, b) => (a, b, 1L) }
      .toDF("src", "dst", "w")
    val l2 = LabelProp.run(star, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"two sync rounds on the star: $l2")
    // weight beats count of equal labels: node 1 hears 2 (w=5) and 3 (w=1)
    val w = Seq((2L, 1L, 5L), (3L, 1L, 1L), (1L, 2L, 5L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val l1 = LabelProp.run(w, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(1L) == 2L, s"the w=5 neighbor's label must win: $l1")
  }

  test("triangle count: hand graphs land exactly; direction/dup/loop noise normalizes away") {
    import graft.operators.Triangles
    def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = Triangles.count(edges.toDF("src", "dst")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K3: 3 edges, 1 wedge at the orientation source, 1 triangle
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == (3L, 1L, 1L))
    // K4: 6 edges, C(4,3)=4 triangles
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))._3 == 4L)
    // a path and a star are triangle-free (wedges exist, closures don't)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))._3 == 0L)
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))._3 == 0L)
    // hub + one rim edge: exactly the one triangle through the hub
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L)))._3 == 1L)
    // duplicates, reversed direction, and self-loops normalize away
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 1L), (2L, 2L))) == (3L, 1L, 1L))
    // two disjoint triangles count independently
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)))._3 == 2L)
  }

  test("clustering coefficient: triangle+pendant and K4 land on the hand-computed integers") {
    import graft.operators.Triangles
    def cc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
      Triangles.clusteringCoefficient(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // triangle 1-2-3 with pendant 3-4: nodes 1,2 are fully clustered
    // (d=2, 1 triangle -> 1e6); node 3 has d=3 -> 2*1e6/6; node 4
    // touches no triangle and is absent
    val m = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(m == Map(
      1L -> (2L, 1L, 1000000L),
      2L -> (2L, 1L, 1000000L),
      3L -> (3L, 1L, 333333L)), s"got $m")
    // K4: every node d=3, on 3 triangles -> coefficient exactly 1e6
    val k4 = cc(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(k4.values.forall(_ == (3L, 3L, 1000000L)), s"got $k4")
  }

  test("kCore: a pendant chain peels off the triangle round by round; converged rounds no-op") {
    import graft.operators.Triangles
    // triangle 1-2-3 with chain 3-4-5; k=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    def core(rounds: Int): Map[Long, Long] =
      Triangles.kCore(edges, k = 2, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 drops only node 5 (degree 1); node 4 still holds its 3-edge
    assert(core(1) == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // round 2 drops node 4 (its degree FELL below k after the peel)
    assert(core(2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // converged: a third round changes nothing (idempotent fixpoint)
    assert(core(3) == core(2))
  }

  test("leaves no persisted RDDs behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    labelsOf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty)
  }
}
