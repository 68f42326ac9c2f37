package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def bruteNextFit(
      rows: Seq[(Long, String, Long)], capacity: Long): Map[Long, (String, Long, Long)] = {
    rows.groupBy(_._2).flatMap { case (bucket, group) =>
      var bin = 0L; var fill = 0L; var first = true
      group.sortBy(_._1).map { case (id, _, w) =>
        if (first) { first = false; fill = w }
        else if (fill + w > capacity) { bin += 1; fill = w }
        else fill += w
        id -> ((bucket, bin, fill))
      }
    }
  }

  test("packBins equals per-bucket next-fit in id order") {
    val docs = (1L to 200L).map(i => (i, "x " * (i % 37 + 1).toInt)).toDF("doc_id", "text")
    val w = size(filter(split(col("text"), "\\s+"), t => t =!= lit("")))
    val got = Packing.packBins(docs, "doc_id", w, capacity = 50L)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, b, bin, fill) => id -> ((b, bin, fill)) }.toMap
    val inputs = (1L to 200L).map { i =>
      val bucket = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 1)
      (i, bucket, (i % 37 + 1))
    }
    assert(got === bruteNextFit(inputs, 50L))
  }

  test("bins never exceed capacity except for a single oversize doc") {
    val docs = Seq(
      (1L, 30L), (2L, 30L), (3L, 90L), (4L, 10L), (5L, 10L)
    ).toDF("doc_id", "w")
    val out = Packing.packBins(docs, "doc_id", col("w"), capacity = 64L)
      .as[(Long, String, Long, Long)].collect()
    val byBin = out.groupBy(r => (r._2, r._3))
    byBin.foreach { case (_, members) =>
      val total = members.map(_._4).max // fill after last placement = bin total
      assert(total <= 64L || members.size == 1,
        s"overfull multi-doc bin: ${members.toSeq}")
    }
    // the 90-weight doc is alone in its bin, untruncated
    val big = out.find(_._1 == 3L).get
    assert(big._4 === 90L)
    assert(byBin((big._2, big._3)).map(_._1).toSeq === Seq(3L))
  }

  test("packing is layout-independent (same result from 1 or 13 input partitions)") {
    val docs = (1L to 150L).map(i => (i, i % 23 + 1)).toDF("doc_id", "w")
    def run(parts: Int) = Packing.packBins(
      docs.repartition(parts), "doc_id", col("w"), capacity = 40L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(13))
  }

  test("hexChars widens the bucket space") {
    val docs = (1L to 64L).map(i => (i, 1L)).toDF("doc_id", "w")
    val b1 = Packing.packBins(docs, "doc_id", col("w"), 10L, hexChars = 1)
      .select("bucket").distinct().count()
    val b2 = Packing.packBins(docs, "doc_id", col("w"), 10L, hexChars = 2)
      .select("bucket").distinct().count()
    assert(b1 <= 16L)
    assert(b2 > b1)
  }
}
