package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: corpus mixing
  * and stratified subsetting that is REPRODUCIBLE — rerunning the
  * pipeline (or re-running one failed task) selects exactly the same
  * rows, because selection is a pure function of the row's id, not of
  * an RNG, partition layout, or visit order. `df.sample()` guarantees
  * none of that across retries/re-plans; hash-gating does.
  *
  * 100 TB posture: both operators are map-only scans except the
  * top-N's per-stratum window, which Spark 4 executes as
  * WindowGroupLimit (partial per input partition, then final) — each
  * map task forwards at most n rows per stratum, so the shuffle is
  * bounded by n·|strata| per task regardless of corpus size, even with
  * a handful of giant strata.
  */
object Sampling {

  /** The per-row uniform draw: the first 4 hex chars of md5(id-as-
    * string). Lowercase fixed-width hex compares lexicographically ==
    * numerically, and both Spark and DuckDB emit the identical digest
    * for the identical string, so the same rule is expressible on the
    * oracle side verbatim.
    */
  private def drawHex(idCol: Column): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, 4)

  /** Deterministic top-n per stratum: order each stratum by
    * (md5(id), id) — a uniform, input-independent shuffle — and keep
    * the first n. The id tie-break matters only for md5-prefix
    * collisions but keeps the cut total-ordered and exactly
    * reproducible.
    */
  def stratifiedTopN(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int): DataFrame =
    df.withColumn("_rn", row_number().over(
      Window.partitionBy(strataCol).orderBy(drawHex(col(idCol)), col(idCol))))
      .filter(col("_rn") <= n)
      .drop("_rn")

  /** Deterministic Bernoulli-style mixing: keep a row iff its hash
    * draw clears the stratum's rate. Rates are per-mille, quantized to
    * the draw's 16-bit range (⌊rate·65536/1000⌋ — at most 1/65536 off
    * the nominal rate, identically on both engines); strata not in the
    * map are DROPPED (mixing semantics: unlisted sources don't flow).
    * rate ≥ 1000 keeps the whole stratum.
    */
  def mixByRate(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      ratesPerMille: Map[String, Int]): DataFrame = {
    val cond = ratesPerMille.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      val keep =
        if (rate >= 1000) lit(true)
        else if (rate <= 0) lit(false)
        else drawHex(col(idCol)) < lit(f"${rate * 65536L / 1000L}%04x")
      acc || (col(strataCol) === stratum && keep)
    }
    df.filter(cond)
  }

  /** Square-root temperature mixing — the α-sampling of the
    * multilingual pre-training literature (mT5, Xue et al. 2021:
    * sample stratum l with probability ∝ n_l^α) at the common
    * α = 1/2, which flattens head strata and boosts the tail without
    * drowning it. Rates are DERIVED from the corpus itself: one
    * bounded groupBy (|strata| rows collect to the driver — the same
    * bounded-collect class as the 1-row sketch reads), weights
    * w_l = √n_l, target share = w_l / Σw, per-stratum keep-rate =
    * min(1, share·target/n_l), quantized to per-mille and gated
    * through the SAME md5 rule as mixByRate — so the selection stays
    * a pure function of row id. α is pinned to 1/2 BY DESIGN: √ is
    * IEEE-correctly-rounded on every engine, general pow() is not,
    * and the oracle must reproduce the rate table bit-for-bit. The
    * Σw fold runs over strata sorted by name (left fold, matching the
    * oracle's ordered list_sum) — double addition is not commutative
    * across orders and the floor sits on the quantization boundary.
    */
  def sqrtTemperatureMix(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      targetRows: Long): DataFrame = {
    // null strata can't be rate-keyed (and mixByRate drops unlisted
    // strata anyway) — exclude them from the census so the name-sort
    // below can't NPE and null rows don't distort the budget
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1) // deterministic Σw fold order, mirrored by the oracle
    val tw = counts.foldLeft(0.0) { case (a, (_, n)) => a + math.sqrt(n.toDouble) }
    val rates = counts.map { case (s, n) =>
      val w = math.sqrt(n.toDouble)
      s -> math.min(1000L,
        math.floor(1000.0 * (w / tw) * targetRows / n).toLong).toInt
    }.toMap
    mixByRate(df, strataCol, idCol, rates)
  }

  /** Deterministic shard assignment — the last step before training:
    * spread the final corpus across nShards near-equal shards as a
    * pure function of the row's id (drawHex thresholds, so the same
    * doc lands in the same shard on every rerun, partial re-write, or
    * engine). shard = number of thresholds ⌊i·65536/n⌋ (4-hex) at or
    * below the draw — string comparisons only, replayable verbatim by
    * the oracle; widths are exact when n divides 65536, off by at
    * most one draw-value otherwise. Map-only.
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 2 && nShards <= 65536, "nShards in [2, 65536]")
    val shard = (1 until nShards)
      .map(i => (drawHex(col(idCol)) >= lit(f"${i * 65536L / nShards}%04x")).cast("int"))
      .reduce(_ + _)
    df.withColumn("shard", shard)
  }

  /** Deterministic token-budget slice: the first `budget` tokens of
    * the corpus in md5 order — "give me a 20M-token training slice,
    * the same slice every time". A doc is kept iff the running token
    * total over the (draw, id) order — INCLUDING the doc itself —
    * stays within budget.
    *
    * Scale shape: the naive formulation is one global-order window
    * (single partition over the corpus — the classic silent
    * degeneration). This runs the exact TWO-PHASE version instead:
    * per-bucket token sums over the draw's first 3 hex chars (4096
    * buckets, map-side combinable), a cumulative walk over the
    * 4096-row bucket table (sanctioned sketch-sized window) giving
    * each bucket its tokens-before offset, then a within-bucket
    * running sum (window PARTITIONED by bucket — distributed, each
    * partition ~1/4096 of the corpus). Identical result to the global
    * order because the bucket is a prefix of the draw.
    */
  def tokenBudgetSlice(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long): DataFrame = {
    val d = df
      .withColumn("_draw", md5(col(idCol).cast("string").cast("binary")))
      .withColumn("_tok", tokenCount.cast("long"))
      .withColumn("_b", substring(col("_draw"), 1, 3))
    val bcum = d.groupBy("_b").agg(sum(col("_tok")).as("_bs"))
      .withColumn("_before", coalesce(
        sum(col("_bs")).over(
          Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val w = Window.partitionBy("_b").orderBy(col("_draw"), col(idCol))
    d.join(broadcast(bcum), Seq("_b"))
      .withColumn("_cum", col("_before") + sum(col("_tok")).over(w))
      .filter(col("_cum") <= budget)
      .drop("_draw", "_tok", "_b", "_bs", "_before", "_cum")
  }
}
