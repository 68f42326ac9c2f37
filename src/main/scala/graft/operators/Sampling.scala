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
}
