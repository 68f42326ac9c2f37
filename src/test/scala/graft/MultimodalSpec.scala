package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch-shaped decode, frame sampling,
  * metadata-only pruning (builder brief: stub the codec, make the
  * Spark side real).
  */
class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def media = Multimodal.synthesizeMedia(Tables.documents(spark, dir))

  test("synthesizeMedia: schema and byte accounting") {
    val m = media
    // compare names+types; nullability differs by construction path
    assert(m.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // utf-8 payload of ascii text: n_bytes == n_chars
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val joined = m.join(docs, "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() === 0)
  }

  test("extractFeatures: one normalized histogram per payload") {
    val f = Multimodal.extractFeatures(media, Multimodal.ByteHistogramDecoder)
    val rows = f.collect()
    assert(rows.length === media.count())
    rows.foreach { r =>
      val v = r.getSeq[Double](2)
      assert(v.length === Multimodal.ByteHistogramDecoder.featureDim)
      assert(math.abs(v.sum - 1.0) < 1e-9, "histogram must be L1-normalized")
    }
    // determinism: rerun equals first run (task-retry safety)
    val again = Multimodal.extractFeatures(media, Multimodal.ByteHistogramDecoder)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2))).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getSeq[Double](2)))
  }

  test("frameSample: stride slicing with frame index") {
    val frames = Multimodal.frameSample(media, stride = 100, frameBytes = 10)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(media.select(col("doc_id"), col("n_bytes")), "doc_id")
    // n frames = max(1, floor(bytes/stride)) by construction
    assert(perDoc.filter(col("n") =!= greatest(floor(col("n_bytes") / 100), lit(1))).count() === 0)
    // full frames carry exactly frameBytes bytes
    assert(frames.filter(col("frame_bytes") > 10).count() === 0)
  }

  test("frameSample and the decode seam skip degenerate rows, never phantom them") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", Array[Byte](1, 2, 3), 3L),
      (2L, "image", Array.empty[Byte], 0L), // empty: no frames
      (3L, "image", null, 0L)               // null blob: nothing to decode
    ).toDF("doc_id", "media_type", "media", "n_bytes")
    val frames = Multimodal.frameSample(rows, stride = 100, frameBytes = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(frames === Set(1L), "short payload samples its head frame; empty/null do not")
    val feats = Multimodal.extractFeatures(rows, Multimodal.ByteHistogramDecoder)
      .select("doc_id").as[Long].collect().toSet
    assert(feats === Set(1L, 2L), "null blob skipped, empty blob still decodes")
    val resized = Multimodal.resize(rows, factor = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(resized === Set(1L, 2L))
  }

  test("resize decimates payloads; downstream stages run unchanged") {
    val small = Multimodal.resize(media, factor = 4)
    // byte accounting: ceil(n/4), and n_bytes matches the new payload
    val joined = small.select(col("doc_id"), col("n_bytes").as("small_bytes"))
      .join(media.select(col("doc_id"), col("n_bytes")), "doc_id")
    assert(joined.filter(
      col("small_bytes") =!= ceil(col("n_bytes") / 4).cast("long")).count() === 0)
    // the resized column feeds feature extraction unchanged
    val f = Multimodal.extractFeatures(small, Multimodal.ByteHistogramDecoder)
    assert(f.count() === media.count())
    // factor=1 is the identity
    val same = Multimodal.resize(media, factor = 1)
      .select(col("doc_id"), col("n_bytes").as("nb"))
      .join(media.select(col("doc_id"), col("n_bytes")), "doc_id")
    assert(same.filter(col("nb") =!= col("n_bytes")).count() === 0)
  }

  test("featureSummary: known payload bins land where the bytes say") {
    import spark.implicits._
    // "aaaa" = 4 bytes of 0x61 → everything in nibble-bin 6, f = 1.0;
    // "a!!!" = one 0x61 (bin 6, f=.25) + three 0x21 (bin 2, f=.75)
    val m = Multimodal.synthesizeMedia(
      Seq((3L, "aaaa"), (6L, "a!!!")).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text"))))
    val got = Multimodal.featureSummary(m, Multimodal.ByteHistogramDecoder)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // both doc_ids are % 3 == 0 → media_type 'image'; 16 bins emitted
    assert(got.size === 16)
    assert(got(("image", 6)) === 1000000L + 250000L)
    assert(got(("image", 2)) === 750000L)
    assert(got(("image", 0)) === 0L)
  }

  test("ImageIoDecoder round-trips the synthesized PNG pixel grid exactly") {
    import spark.implicits._
    val docs = Seq((0L, "a"), (7L, "b"), (123L, "c")).toDF("doc_id", "text")
    val got = Multimodal.extractFeatures(
      Multimodal.synthesizeImages(docs), Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    Seq(0L, 7L, 123L).foreach { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val sum = (for { y <- 0 until h; x <- 0 until w }
        yield Multimodal.pixelGray(id, x, y)).sum
      // PNG is lossless and 8-bit gray decodes to one band — the
      // decoded dims and the sample sum must match the generator bit
      // for bit
      assert(got(id) == Seq(w.toDouble, h.toDouble, 1.0, sum.toDouble),
        s"doc $id decoded ${got(id)}")
    }
  }

  test("ImageIoDecoder never touches ImageIO's disk cache, even with the JVM-global flag ON") {
    // the production posture is a decode-ONLY executor over stored
    // media: it never runs the encode helper that clears the global
    // useCache flag, so the decoder itself must bypass the
    // FileCacheImageInputStream temp-file-per-image path. Point the
    // cache at a counted directory, force the global flag ON, decode,
    // and require the directory stays empty.
    val cacheDir = java.nio.file.Files.createTempDirectory("iio_cache").toFile
    val flagBefore = javax.imageio.ImageIO.getUseCache
    val dirBefore = javax.imageio.ImageIO.getCacheDirectory
    // a PNG payload built WITHOUT the encode helper (which would
    // clear the flag): raw bytes via an explicit in-memory stream
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 2).foreach(y => (0 until 3).foreach(x =>
      img.getRaster.setSample(x, y, 0, 10 * y + x)))
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    javax.imageio.ImageIO.write(img, "png", ios)
    ios.close()
    try {
      javax.imageio.ImageIO.setUseCache(true)
      javax.imageio.ImageIO.setCacheDirectory(cacheDir)
      val feats = Multimodal.ImageIoDecoder.features(baos.toByteArray)
      assert(feats.toSeq == Seq(3.0, 2.0, 1.0, (0 until 2).flatMap(y =>
        (0 until 3).map(x => 10 * y + x)).sum.toDouble))
      assert(cacheDir.listFiles().isEmpty,
        "decode created ImageIO disk-cache temp files")
    } finally {
      javax.imageio.ImageIO.setUseCache(flagBefore)
      javax.imageio.ImageIO.setCacheDirectory(dirBefore)
    }
  }

  test("WavDecoder round-trips the synthesized PCM samples exactly") {
    import spark.implicits._
    val docs = Seq((0L, "a"), (7L, "b"), (123L, "c")).toDF("doc_id", "text")
    val got = Multimodal.extractFeatures(
      Multimodal.synthesizeAudio(docs), Multimodal.WavDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    Seq(0L, 7L, 123L).foreach { id =>
      val n = (20 + id % 13).toInt
      val sum = (0 until n).map(Multimodal.sampleAt(id, _)).sum
      // PCM is lossless: decoded sample count, mono channel, rate, and
      // the signed-sample sum must match the generator bit for bit
      assert(got(id) == Seq(n.toDouble, 1.0, 8000.0, sum.toDouble),
        s"doc $id decoded ${got(id)}")
    }
  }

  test("mediaStats prunes the blob column from the scan") {
    val stats = Multimodal.mediaStats(media)
    assert(stats.count() === 3) // image / audio / video
    // the aggregate only references metadata; the binary col must not
    // appear in the optimized plan's project list
    val plan = stats.queryExecution.optimizedPlan.toString
    assert(!plan.contains("media#") || !plan.split("Aggregate").head.contains("media#"),
      s"blob column should be pruned:\n$plan")
  }
}
