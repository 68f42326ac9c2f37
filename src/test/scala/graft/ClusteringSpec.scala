package graft

import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("kmeansAssign: hand-computed 1-D fixpoint (init, refresh, ties)") {
    // quantized codes: 0, 10, 1000, 1010, 2000 (e3 of the floats)
    val e = emb(
      0L -> Seq(0.000f), 1L -> Seq(0.010f),
      2L -> Seq(1.000f), 3L -> Seq(1.010f), 4L -> Seq(2.000f))
    // k=2: init c0=[0], c1=[10]. Pass 1: 0→c0; 10→c1; 1000,1010,2000→c1
    // (closer to 10 than 0). Refresh: c0=[0], c1=(10+1000+1010+2000) div 4
    // = 1005. Pass 2: 0,10→c0 (d2 to 0 is 0,100 vs 1005²-ish); 1000,
    // 1010, 2000 → c1.
    val got = Clustering.kmeansAssign(e, k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1))
  }

  test("kmeansAssign: distance tie breaks to the smaller cluster id") {
    // both centroids stay where they start; the midpoint 5 is
    // equidistant (d2=25 each) → cluster 0
    val e = emb(
      0L -> Seq(0.000f), 1L -> Seq(0.010f), 2L -> Seq(0.005f))
    val got = Clustering.kmeansAssign(e, k = 2, iters = 1)
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("kmeansAssign: an emptied cluster keeps its previous centroid") {
    // init c0=[0], c1=[1] (codes of ids 0,1). Pass 1: id 2 (code 800)
    // and id 3 (code 900) both join c1; refresh moves c1 to
    // (1+800+900) div 3 = 567 and c0 stays [0]. Pass 2: id 1 (code 1)
    // now sits nearer c0 — c1's seed defects, and ids 2,3 keep c1.
    // Pass 3's refresh then averages only {800,900}→850; nobody
    // changes side. The total assignment stays well-defined
    // throughout, and a k exceeding the distinct points still returns
    // every row (the surplus cluster simply keeps its seed centroid).
    val e = emb(
      0L -> Seq(0.000f), 1L -> Seq(0.001f),
      2L -> Seq(0.800f), 3L -> Seq(0.900f))
    val got = Clustering.kmeansAssign(e, k = 2, iters = 3)
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
    val surplus = Clustering.kmeansAssign(
      emb(0L -> Seq(0.0f), 1L -> Seq(0.0f), 2L -> Seq(0.0f)),
      k = 3, iters = 2)
    assert(surplus.count() == 3)
  }

  test("kmeansAssign is partitioning-invariant (integer fixpoint)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val a = Clustering.kmeansAssign(e.repartition(1), k = 4, iters = 2)
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    val b = Clustering.kmeansAssign(e.repartition(13), k = 4, iters = 2)
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(a == b)
  }

  test("clusterBalancedSample: per-cluster cap, smallest ids, skew-proof shape") {
    val assigned = Seq.tabulate(100)(i => (i.toLong, if (i < 90) 0 else 1))
      .toDF("vec_id", "cluster")
    val got = Clustering.clusterBalancedSample(assigned, perCluster = 3)
      .orderBy("cluster", "vec_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq(0L -> 0, 1L -> 0, 2L -> 0, 90L -> 1, 91L -> 1, 92L -> 1))
    // a cluster smaller than the cap survives whole
    val tiny = Seq((1L, 0), (2L, 1)).toDF("vec_id", "cluster")
    assert(Clustering.clusterBalancedSample(tiny, 5).count() == 2)
  }

  test("ivfDriftStats: in-distribution batch ~1x, shifted batch trips the refit flag") {
    val dir = java.nio.file.Files.createTempDirectory("drift_spec").toString
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = e.filter(col("vec_id") % 3 =!= 2)
    Similarity.buildIvfIndex(base, s"$dir/idx",
      Similarity.fitIvfModel(base, nlist = 4))
    val held = e.filter(col("vec_id") % 3 === 2)
    val (b1, d1, r1, f1) = Similarity.ivfDriftStats(spark, s"$dir/idx", held)
    assert(b1 > 0 && d1 > 0)
    assert(r1 < 2.0 && !f1, s"same-distribution batch must not trip: ratio=$r1")
    val shifted = held.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(1.0f)).as("embedding"))
    val (b2, d2, r2, f2) = Similarity.ivfDriftStats(spark, s"$dir/idx", shifted)
    assert(b2 == b1, "the baseline is a property of the index, not the batch")
    assert(r2 > 10.0 && f2, s"shifted batch must trip the refit flag: ratio=$r2")
  }
}
