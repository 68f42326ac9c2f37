package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducibility under re-evaluation and
  * repartitioning (the property RNG sampling lacks), per-stratum caps,
  * rate-gate semantics, and plausible selectivity of the hash gate.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = (0L until 1000L)
    .map(i => (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else if (i % 4 == 2) "es" else "zh"))
    .toDF("doc_id", "lang")

  test("shardAssign: near-equal shards, pure function of id, layout-invariant") {
    val n = 8
    val a = Sampling.shardAssign(docs, "doc_id", n)
    val sizes = a.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until n).toSet)
    // uniform md5 draws: each shard within a loose band of 1000/8
    assert(sizes.values.forall(c => c > 60 && c < 190), sizes.toString)
    val b = Sampling.shardAssign(docs.repartition(13), "doc_id", n)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == b)
  }

  test("tokenBudgetSlice: two-phase prefix equals the naive global-order prefix") {
    val withTok = docs.withColumn("n_tok", (col("doc_id") % 17 + 1).cast("long"))
    val budget = 3000L
    val got = Sampling.tokenBudgetSlice(withTok, "doc_id", col("n_tok"), budget)
      .select("doc_id").as[Long].collect().toSet
    // naive reference: global order by (md5 draw, id), running total
    val naive = withTok
      .withColumn("_d", md5(col("doc_id").cast("string").cast("binary")))
      .orderBy("_d", "doc_id")
      .select("doc_id", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val want = naive.takeWhile { case (_, t) => { cum += t; cum <= budget } }
      .map(_._1).toSet
    assert(got == want && got.nonEmpty && got.size < 1000)
  }

  test("stratifiedTopN: exactly n per stratum, identical across runs and layouts") {
    val a = Sampling.stratifiedTopN(docs, "lang", "doc_id", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedTopN(docs.repartition(13), "lang", "doc_id", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val perLang = Sampling.stratifiedTopN(docs, "lang", "doc_id", 10)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang == Map("en" -> 10L, "de" -> 10L, "es" -> 10L, "zh" -> 10L))
  }

  test("stratifiedTopN with n beyond stratum size keeps the whole stratum") {
    val kept = Sampling.stratifiedTopN(docs, "lang", "doc_id", 5000).count()
    assert(kept == 1000L)
  }

  test("mixByRate: unlisted strata drop, rate>=1000 keeps all, rate<=0 drops all") {
    val mixed = Sampling.mixByRate(docs, "lang", "doc_id",
      Map("en" -> 1000, "de" -> 0, "es" -> 500))
    val byLang = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.getOrElse("zh", 0L) == 0L, "unlisted stratum must drop")
    assert(byLang.getOrElse("de", 0L) == 0L, "rate 0 must drop")
    assert(byLang("en") == 250L, "rate 1000 keeps the whole stratum")
    // 250 es docs at 50%: binomial(250, .5) — allow a wide band
    assert(byLang("es") > 75L && byLang("es") < 175L,
      s"rate 500 selectivity implausible: ${byLang("es")}")
  }

  test("mixByRate is a pure function of the id: stable under union-with-self") {
    val once = Sampling.mixByRate(docs, "lang", "doc_id", Map("en" -> 300))
      .select("doc_id").as[Long].collect().toSet
    val doubled = Sampling.mixByRate(docs.union(docs), "lang", "doc_id", Map("en" -> 300))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(once == doubled)
  }

  test("the hash gate matches an independently computed md5 prefix rule") {
    val kept = Sampling.mixByRate(docs, "lang", "doc_id", Map("en" -> 250))
      .select("doc_id").as[Long].collect().toSet
    val thr = 250 * 65536L / 1000L
    val expected = (0L until 1000L).filter(_ % 4 == 0).filter { id =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val prefix = f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x"
      java.lang.Long.parseLong(prefix, 16) < thr
    }.toSet
    assert(kept == expected)
  }

  test("sqrtTemperatureMix: tail strata keep a HIGHER rate than head strata") {
    // 800 en vs 40 zh: α=1/2 flattening must sample zh at a higher
    // per-row rate than en, while the total lands near the target
    val skewed = ((0L until 800L).map((_, "en")) ++ (800L until 840L).map((_, "zh")))
      .toDF("doc_id", "lang")
    val kept = Sampling.sqrtTemperatureMix(skewed, "lang", "doc_id", targetRows = 200L)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / 800
    val zhRate = kept.getOrElse("zh", 0L).toDouble / 40
    assert(zhRate > enRate,
      s"temperature flattening must boost the tail: en=$enRate zh=$zhRate")
    val total = kept.values.sum
    assert(total > 100 && total < 320, s"total $total should land near the 200 target")
  }

  test("sqrtTemperatureMix is deterministic across runs and layouts") {
    val a = Sampling.sqrtTemperatureMix(docs, "lang", "doc_id", 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.sqrtTemperatureMix(docs.repartition(13), "lang", "doc_id", 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
