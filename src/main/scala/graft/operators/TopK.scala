package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (sim, id) pairs by
  * (sim desc, id asc) in each partial buffer, merging map-side — the
  * scale-correct alternative to a row_number window partitioned by
  * query id (k queries → k window partitions, each holding the FULL
  * candidate set at 100 TB; here every partition reduces to ≤ k rows
  * before any shuffle, and the shuffle carries k·|queries| rows
  * total).
  *
  * Determinism: the selection is a total order over (sim_e6 desc,
  * neighbor_id asc), so the result is independent of partitioning and
  * merge order — required for oracle parity.
  */
object TopK {

  final case class Scored(sim_e6: Long, neighbor_id: Long)
  final case class Buf(items: Seq[Scored])

  private def better(a: Scored, b: Scored): Boolean =
    a.sim_e6 > b.sim_e6 || (a.sim_e6 == b.sim_e6 && a.neighbor_id < b.neighbor_id)

  final case class Agg(k: Int) extends Aggregator[Scored, Buf, Buf] {
    def zero: Buf = Buf(Vector.empty)
    def reduce(buf: Buf, in: Scored): Buf = insert(buf, in)
    def merge(a: Buf, b: Buf): Buf = b.items.foldLeft(a)(insert)
    def finish(buf: Buf): Buf = buf
    // keep sorted best-first, truncate at k — k is small, linear
    // insertion beats heap constant factors
    private def insert(buf: Buf, in: Scored): Buf = {
      val (pre, post) = buf.items.span(better(_, in))
      if (pre.size >= k) buf else Buf((pre :+ in) ++ post.take(k - pre.size - 1))
    }
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
