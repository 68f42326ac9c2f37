package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents
  * to fixed-capacity context windows ("bins") so downstream tokenized
  * batches are dense. The assignment is DETERMINISTIC and
  * layout-independent — a retry, a different input split, or a
  * different cluster produces the identical packing — because both the
  * bucket (md5 of the id, like Sampling's draws) and the within-bucket
  * order (id) are pure functions of the row.
  *
  * Packing is inherently sequential, which fights distribution; the
  * standard resolution (used here) is two-level: hash documents into
  * independent buckets, pack each bucket with next-fit in id order.
  * Each bucket's scan is a single pass over its own rows, buckets run
  * in parallel, and nothing about one bucket's packing depends on
  * another's. At 100 TB you raise `hexChars` (16^h buckets) so each
  * bucket's (id, weight) pairs — ~16 bytes/row, never the text —
  * stay executor-sized; the shuffle moves only those pairs.
  */
object Packing {

  /** Next-fit packing of `weightCol` into bins of `capacity` within
    * md5-derived buckets. Output: one row per input doc with its
    * (bucket, bin, fill-after-placement). Next-fit (not first-fit
    * decreasing) is the deliberate choice: it needs no bin state
    * beyond the current fill, so the scan is O(1)-memory and exactly
    * reproducible by the DuckDB recursive-CTE oracle; an over-capacity
    * document still opens its own bin (never truncated, never
    * dropped — truncation is a tokenizer-side policy, not the
    * packer's).
    */
  def packBins(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      capacity: Long,
      hexChars: Int = 1): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(hexChars >= 1 && hexChars <= 8, "hexChars must be in [1, 8]")
    // ids must be integral: a lossy cast("long") on a string id would
    // produce nulls that only explode later, inside the primitive
    // Dataset decode — and the md5 bucket (computed from the ORIGINAL
    // value) would silently disagree with the cast id
    require(
      {
        import org.apache.spark.sql.types._
        Set[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(docs.schema(idCol).dataType)
      },
      s"$idCol must be an integral column, got ${docs.schema(idCol).dataType.catalogString}")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("_id"),
        substring(md5(col(idCol).cast("string").cast("binary")), 1, hexChars)
          .as("_bucket"),
        coalesce(weightCol.cast("long"), lit(0L)).as("_w"))
      // hash-partition by bucket (every bucket lands whole in one
      // partition), then secondary-sort so the scan sees each bucket
      // as one contiguous id-ordered run — the mapPartitions resets
      // state at bucket boundaries, so co-resident buckets don't bleed
      .repartition(col("_bucket"))
      .sortWithinPartitions(col("_bucket"), col("_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        var bucket: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (id, b, w) =>
          if (b != bucket) { bucket = b; bin = 0L; fill = w }
          else if (fill + w > capacity) { bin += 1L; fill = w }
          else fill += w
          (id, b, bin, fill)
        }
      }
      .toDF(idCol, "bucket", "bin", "fill")
  }

  /** Materialize the packed bins into actual training sequences —
    * the second half of the packing story: packBins assigns, this
    * joins the text back and emits one row per (bucket, bin) with the
    * documents concatenated in id order around a separator token
    * (the `<|doc|>` convention stands in for a tokenizer's document
    * boundary). The concatenated text surfaces as its md5 plus the
    * bin's token total (max running fill = the last placement's
    * fill), so the driver compare stays row-sized while still pinning
    * every byte of every sequence. collect_list is order-nondeterministic
    * by contract — sort_array over (id, text) structs erases that
    * (ids are unique, so the order is total). At 100 TB the only
    * text movement is the one groupBy shuffle that assembles each
    * bin; bins are capacity-bounded, so no group exceeds ~capacity
    * tokens of payload.
    */
  def materializeBins(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weightCol: Column,
      capacity: Long,
      hexChars: Int = 1,
      sep: String = "<|doc|>"): DataFrame = {
    val asg = packBins(docs, idCol, weightCol, capacity, hexChars)
    asg.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("bucket"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("fill")).as("bin_tokens"),
        sort_array(collect_list(struct(col(idCol), col(textCol)))).as("_ds"))
      .select(col("bucket"), col("bin"), col("n_docs"), col("bin_tokens"),
        md5(concat_ws(sep,
          transform(col("_ds"), d => d.getField(textCol))).cast("binary"))
          .as("seq_md5"))
  }
}
