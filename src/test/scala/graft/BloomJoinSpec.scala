package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi/anti joins: exact results (the bloom only
  * moves work, never answers), and the prefilter genuinely reduces —
  * disjoint keys are dropped map-side before any exchange.
  */
class BloomJoinSpec extends SparkSpec {

  test("bloom semi/anti joins equal the plain joins, at any fpp") {
    import spark.implicits._
    val big = spark.range(0, 10000).toDF("k")
      .withColumn("v", col("k") % 7)
    // every third key, so ~2/3 of big is bloom-droppable
    val keys = spark.range(0, 10000, 3).toDF("j")
    for (fpp <- Seq(0.01, 0.3)) {
      val semi = BloomJoin.semiJoin(big, keys, "k", "j", expectedKeys = 4000, fpp = fpp)
      val plainSemi = big.join(keys, big("k") === keys("j"), "leftsemi")
      assert(semi.exceptAll(plainSemi).count() === 0)
      assert(plainSemi.exceptAll(semi).count() === 0)
      val anti = BloomJoin.antiJoin(big, keys, "k", "j", expectedKeys = 4000, fpp = fpp)
      val plainAnti = big.join(keys, big("k") === keys("j"), "leftanti")
      assert(anti.exceptAll(plainAnti).count() === 0)
      assert(plainAnti.exceptAll(anti).count() === 0)
      // the split is a partition of big: semi ∪ anti = big exactly
      assert(semi.count() + anti.count() === 10000)
    }
  }

  test("null big-side keys: semi drops them, anti keeps them — like the plain joins") {
    import spark.implicits._
    val big = Seq(Some(1L), Some(2L), None, None).toDF("k")
    val keys = Seq(1L).toDF("j")
    val semi = BloomJoin.semiJoin(big, keys, "k", "j", expectedKeys = 10)
    assert(semi.as[Option[Long]].collect().toSeq === Seq(Some(1L)),
      "null keys never match: the plain leftsemi drops them and so must we")
    val anti = BloomJoin.antiJoin(big, keys, "k", "j", expectedKeys = 10)
    assert(anti.as[Option[Long]].collect().toSeq.sortBy(_.getOrElse(-1L)) ===
      Seq(None, None, Some(2L)),
      "NOT-EXISTS keeps null keys: the plain leftanti keeps them and so must we")
  }

  test("persisted index round-trips: cold reload equals the in-JVM semi join") {
    import spark.implicits._
    val big = spark.range(0, 5000).toDF("k").withColumn("v", col("k") % 5)
    val keys = spark.range(0, 5000, 4).toDF("j")
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_idx_spec").toString
    BloomJoin.buildIndex(keys, "j", expectedKeys = 2000, s"$dir/idx")
    val fromIdx = BloomJoin.semiJoinFromIndex(big, keys, "k", "j", s"$dir/idx")
    val direct = BloomJoin.semiJoin(big, keys, "k", "j", expectedKeys = 2000)
    assert(fromIdx.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fromIdx).count() === 0)
    // built-for column is validated before any probe
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoinFromIndex(big, keys, "k", "wrong_col", s"$dir/idx")
    }
    assert(e.getMessage.contains("built over 'j'"))
  }

  test("mergeIntoIndex: delta ORs in; a stale index fails loudly, never silently") {
    import spark.implicits._
    val big = spark.range(0, 5000).toDF("k")
    val base = spark.range(0, 2000, 2).toDF("j")
    val delta = spark.range(2001, 4000, 2).toDF("j") // disjoint from base
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_merge_spec")
      .toString + "/idx"
    BloomJoin.buildIndex(base, "j", expectedKeys = 2000, dir)
    val grown = base.unionByName(delta)
    // querying a grown key set against the un-merged index is the
    // false-NEGATIVE footgun — it must be a hard error, not a silent
    // row drop
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoinFromIndex(big, grown, "k", "j", dir)
    }
    assert(e.getMessage.contains("STALE"))
    BloomJoin.mergeIntoIndex(delta, "j", dir)
    val fromIdx = BloomJoin.semiJoinFromIndex(big, grown, "k", "j", dir)
    val plain = big.join(grown, big("k") === grown("j"), "leftsemi")
    assert(fromIdx.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(fromIdx).count() === 0)
    // after the merge the ORIGINAL key set no longer matches either —
    // the fingerprint pins the exact indexed membership
    val e2 = intercept[IllegalArgumentException] {
      BloomJoin.semiJoinFromIndex(big, base, "k", "j", dir)
    }
    assert(e2.getMessage.contains("STALE"))
  }

  test("the prefilter actually reduces: disjoint keys drop before the join") {
    import spark.implicits._
    val big = spark.range(1000, 10000).toDF("k")
    val keys = spark.range(0, 100).toDF("j") // fully disjoint from big
    val bf = keys.stat.bloomFilter("j", 100, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val survivors = big.where(
      call_function("bloom_might_contain", col("k"), lit(bos.toByteArray))).count()
    // expected false positives ≈ 0.01 × 9000 = 90; a 10× margin keeps
    // the assert deterministic-in-practice while still proving the
    // map-side drop (an always-true probe would leave all 9000)
    assert(survivors < 900,
      s"bloom should drop the disjoint majority map-side, kept $survivors of 9000")
    assert(BloomJoin.semiJoin(big, keys, "k", "j", 100).count() === 0)
    assert(BloomJoin.antiJoin(big, keys, "k", "j", 100).count() === 9000)
  }
}
