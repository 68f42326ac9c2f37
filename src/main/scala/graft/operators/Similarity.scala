package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity / near-duplicate operators for the training-data
  * pipeline: brute-force cosine top-k (the exact baseline), a
  * hyperplane-LSH bucketed ANN variant (the 100 TB path), MinHash-LSH
  * near-dup detection with banded candidate generation, and SimHash
  * signatures.
  *
  * Scale rules encoded here (VERDICT r2 LLM-pipeline table):
  *  - never an all-pairs crossJoin: the only N×M product is against a
  *    BROADCAST side of fixed tiny size (the query vectors), which is
  *    a map-side nested loop — linear in N;
  *  - MinHash candidates come from banded signature buckets
  *    (equi-join on (band, key)), then exact Jaccard verifies — the
  *    canonical shingle→minhash→band→bucket-join shape;
  *  - all arithmetic that crosses the oracle boundary is sequential
  *    left-fold double math (both engines fold lists left-to-right, so
  *    the IEEE results are bit-identical) surfaced as scaled longs.
  */
object Similarity {

  /** Pigeonhole slice tiling shared by simhashNearDup and
    * Linkage.hammingLinkage: array of (blk, bkey) structs where slice
    * i spans [i·base + min(i, rem), …) — the first `rem` slices take
    * one extra position so all `width` positions are covered, and a
    * pair within Hamming distance blocks−1 agrees on ≥1 slice.
    */
  private[operators] def sliceBlocks(c: Column, width: Int, blocks: Int): Column = {
    val base = width / blocks
    val rem = width % blocks
    array((0 until blocks).map { i =>
      val start = i * base + math.min(i, rem) + 1 // substr is 1-based
      val len = base + (if (i < rem) 1 else 0)
      struct(lit(i).as("blk"), c.substr(lit(start), lit(len)).as("bkey"))
    }: _*)
  }

  /** Squared euclidean distance to a centroid, shared by ivfTopK
    * probing and semanticDedup cell assignment — ONE numeric kernel so
    * the two assignment paths cannot drift.
    */
  private def centroidD2(emb: Column, centroid: Column): Column =
    aggregate(
      zip_with(emb, centroid, (x, c) => {
        val diff = x.cast("double") - c
        diff * diff
      }), lit(0.0), (a, x) => a + x)

  /** Word 3-gram shingles, deduplicated (set semantics for Jaccard).
    * Native WordShingles expression — the equivalent split/transform/
    * array_distinct HOF chain was ~2 ms/doc interpreted and gets
    * duplicated by CollapseProject wherever it feeds another lambda.
    */
  def shingles(text: Column): Column =
    call_function("word_shingles", text, lit(3))

  // Native codegen'd left folds (FloatDot/FloatNorm2): Catalyst HOFs
  // (aggregate/zip_with) interpret per element with boxing — fine for
  // the top-k's broadcast pairs, dominant at near-dup candidate volume
  // (~2M pairs × 64 dims was ~7 s of the sf0.1 bench). The native
  // loops accumulate in the SAME order, so results — and the DuckDB
  // oracle hashes — are bit-identical.
  /** Spread narrow inputs across the executors WITHOUT taxing wide
    * ones: repartition only when the planned scan is narrower than the
    * session's parallelism. The local test corpora arrive as one fat
    * parquet split — the signature/shingle math would run serially
    * without the spread — but a 100 TB scan is already thousands of
    * partitions wide, and an unconditional repartition there would
    * full-shuffle the corpus text for nothing. Width comes from the
    * LOGICAL plan (file bytes ÷ maxPartitionBytes — the same ratio
    * Spark's split planner bin-packs by), never from .rdd: under AQE,
    * .rdd on a frame containing an exchange finalizes and EXECUTES the
    * upstream stages, so the old probe double-executed work if any
    * call site ever passed a joined/aggregated frame. A frame that
    * isn't a single bare file scan (local test data, joined inputs)
    * estimates as narrow — repartitioning those is at worst one extra
    * shuffle of an already-shuffled frame, never a double execution.
    */
  private[operators] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // ALL file-scan leaves, not just a single bare scan (ADVICE r6):
    // a joined/unioned frame over wide scans estimates by the summed
    // file bytes instead of unconditionally repartitioning — plans
    // with no file leaf at all (local test relations) still estimate
    // as narrow, which at worst re-shuffles an already-shuffled frame.
    val fileBytes = df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.sizeInBytes
        case _ => 0L
      }
    }.filter(_ > 0L)
    val scanWidth: Option[Int] =
      if (fileBytes.isEmpty) None
      else {
        val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
        Some(math.max(1L, fileBytes.sum / math.max(1L, maxSplit))
          .min(Int.MaxValue).toInt)
      }
    if (scanWidth.forall(_ < p)) df.repartition(p) else df
  }

  /** Join each candidate (doc_a, doc_b) pair back to both shingle
    * sets — the shared front half of every exact-verify stage. */
  private def withShingleSets(cand: DataFrame, sh: DataFrame): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))

  /** Keep each bucket's `cap` lowest doc_ids — CAP hot buckets, never
    * drop them whole: identical-document spam clusters are hot in
    * every band/block, so dropping would silently yield zero pairs for
    * exactly the most-duplicated content (the recall rationale in the
    * minhash scaladoc).
    */
  private def capBuckets(df: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy("doc_id")))
      .filter(col("_rn") <= cap)
      .drop("_rn")

  /** Bounded per-query top-k presentation shared by the top-k family:
    * partition-local TopK.Agg (each map task forwards ≤ k rows — a
    * window partitioned by q_id would shuffle the FULL scored set into
    * |queries| partitions), then explode + deterministic order.
    * Expects (q_id, neighbor_id, sim_e6).
    */
  private def boundedTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(TopK.Agg(k))
    scored
      .groupBy("q_id")
      .agg(topk(col("sim_e6"), col("neighbor_id")).as("top"))
      .select(col("q_id"), explode(col("top.items")).as("s"))
      .select(col("q_id"), col("s.neighbor_id").as("neighbor_id"), col("s.sim_e6").as("sim_e6"))
  }

  /** The top-k family's presentation order, applied by CONSUMERS (the
    * scoreboard rows, ivfTopKFromIndex's cold query) — never inside
    * the operators themselves, so composing them (recall floors,
    * index-parity joins) inherits no range exchange.
    */
  def topKOrder(df: DataFrame): DataFrame =
    df.orderBy(col("q_id"), col("sim_e6").desc, col("neighbor_id"))

  private def sumSq(v: Column): Column = call_function("float_norm2", v)

  private def dot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  /** Exact cosine top-k: every vector scored against a tiny broadcast
    * query set (vec_id < nQueries). The plan is a BroadcastNestedLoop
    * against k rows — a map-side pass over the big table, then a
    * per-query top-k window on the (already small) scored set.
    * Similarity surfaces as round(1e6·cos) so the cross-engine compare
    * is integer-exact; ties rank by neighbor id.
    */
  def cosineTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    // Norms are per-vector, not per-pair: compute once before the
    // nested-loop pairing (numerically identical fold, k× less work).
    val e = spread(emb)
      .select(col("vec_id"), col("embedding"), sumSq(col("embedding")).as("n2"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("qn2"))
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("embedding"))
      / (sqrt(col("n2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** Symmetric per-vector int8 scalar quantization — the embedding
    * family's storage/IO story at 100 TB: a float32 corpus drops to
    * ~1/4 the bytes (plus one float scale per vector) before it ever
    * reaches an index build or a scan, which is the difference
    * between an ANN candidate scan that is IO-bound and one that
    * isn't. The scheme is the standard SQ8 of the ANN literature
    * (FAISS's ScalarQuantizer; Jégou, Douze & Schmid, TPAMI'11
    * frames the rate/recall trade): q_i = round(x_i / s) with
    * s = max|x|/127, so codes live in [−127, 127] and the max
    * coordinate is exactly ±127. Per-vector scales (not global)
    * make the quantizer norm-invariant — COSINE over codes needs no
    * dequantization at all, because the scale cancels in
    * dot/(‖a‖·‖b‖); quantizedTopK exploits exactly that. A zero
    * vector has scale 0 and quantizes to all-zero codes (guarded —
    * no 0/0). Map-only, codegen'd arithmetic; every number that
    * crosses the oracle boundary is an integer code or a
    * deterministically-rounded double, so the DuckDB replay is
    * bit-exact.
    */
  def quantizeEmbeddings(emb: DataFrame): DataFrame =
    spread(emb)
      .withColumn("scale",
        array_max(transform(col("embedding"), x => abs(x))).cast("double") / lit(127.0))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0.0,
          transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => round(x.cast("double") / col("scale")).cast("int"))).as("q"))

  /** Exact cosine top-k over the QUANTIZED codes — cosineTopK's shape
    * with int8 codes in place of floats. The per-vector scale cancels
    * out of cosine (q ≈ x/s elementwise, and dot(q_a,q_b) /
    * (‖q_a‖‖q_b‖) is scale-free), so ranking needs no dequantize
    * pass; the residual vs float cosine is only the rounding error,
    * and the quant_recall row pins how much ranking that costs as a
    * measured floor against the exact float top-k. Codes ride as
    * floats through the SAME native float_dot/float_norm2 kernels as
    * the float path (|q| ≤ 127 ⇒ every product ≤ 16129 and every
    * 64-term sum ≤ ~10⁶ — exactly representable, the folds stay
    * integer-exact), so the DuckDB oracle reproduces sim_e6
    * bit-identically from the integer codes. Zero vectors (all-zero
    * codes) carry no direction and leave the similarity universe on
    * both engines.
    */
  def quantizedTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = quantizeEmbeddings(emb)
      .select(col("vec_id"), col("q").cast("array<float>").as("qf"))
      .select(col("vec_id"), col("qf"), sumSq(col("qf")).as("n2"))
      .filter(col("n2") > 0)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qf").as("q_emb"), col("n2").as("qn2"))
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("qf"))
      / (sqrt(col("n2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** Prefix-truncated ("Matryoshka") cosine top-k — Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS 2022: with
    * importance-ordered embeddings, ranking on the first `dims`
    * coordinates is the cheap first-stage retrieval (dims/64 of the
    * dot-product flops AND of the bytes a candidate scan moves — the
    * rate knob between SQ8's 4× and PQ's 26×). Exact math over the
    * prefix, so unlike the trained quantizers this one is fully
    * oracle-replayable — including its recall row: both rankings are
    * deterministic, so matryoshka_recall's per-query overlap vs the
    * full-dim top-k is value-checked by the oracle, not floor-asserted.
    * Zero prefixes (possible even for nonzero vectors) leave the
    * similarity universe, the quantizedTopK rule.
    */
  def matryoshkaTopK(
      emb: DataFrame, nQueries: Int = 5, k: Int = 10, dims: Int = 16): DataFrame =
    cosineTopK(
      spread(emb)
        .select(col("vec_id"), slice(col("embedding"), 1, dims).as("embedding"))
        .filter(sumSq(col("embedding")) > 0),
      nQueries, k)

  /** Per-subspace codebooks for product quantization: ONE seeded
    * bounded sample collected once (fitKMeans's sampling discipline —
    * maxTrainRows × dim floats, sub-MB at the defaults), then numSub
    * independent Lloyd's runs over the d/numSub-dim subvectors on the
    * driver. Driver-side deliberately: numSub MLlib fits cost numSub
    * job launches (~8 s of pure scheduling at 16 subspaces, measured)
    * to cluster vectors of dimension FOUR — the sample is bounded by
    * construction, so local Lloyd's is the scale-correct shape, not a
    * shortcut. Deterministic end to end: seeded sample, vec_id-sorted,
    * farthest-point (maxmin) init with index tie-breaks, empty
    * clusters keep their centroid — task-retry and relaunch safe, and
    * the exact-recovery regime (ncodes ≥ distinct subvectors) picks
    * every distinct point as a centroid by construction (a duplicate
    * is only ever chosen once all positive distances are exhausted).
    */
  private def fitPqCodebooks(
      e: DataFrame, // needs vec_id + embedding
      dim: Int,
      numSub: Int,
      ncodes: Int,
      trainFraction: Double,
      maxTrainRows: Int,
      maxIter: Int): Seq[Seq[Seq[Double]]] = {
    val sub = dim / numSub
    // hash-gated sample, NOT df.sample(): Bernoulli sampling seeds per
    // PARTITION, so the drawn set — and therefore the codebooks and
    // the measured recall — would change with the session's
    // parallelism (caught when Verify at 4 cpus trained on a worse
    // draw than the 8-cpu probe that pinned the floor). The md5 gate
    // (Sampling.mixByRate's discipline) + global orderBy-limit is a
    // pure function of the DATA.
    val gate = (trainFraction * 1000).toInt.max(1)
    val sampled = e.select(col("vec_id"), col("embedding"))
      .filter(pmod(xxhash64(col("vec_id"), lit(42)), lit(1000)) < gate)
      .orderBy("vec_id").limit(maxTrainRows)
    val base =
      if (sampled.take(ncodes).length < ncodes)
        e.select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(maxTrainRows)
      else sampled
    val train = base.collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    (0 until numSub).map { j =>
      val pts = train.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      // deterministic farthest-point (maxmin) init: first point, then
      // repeatedly the point farthest from its nearest chosen centroid
      // (ties → lower index) — no RNG, and it spreads the codebook
      // across the subspace the way kmeans++ does in expectation
      val init = scala.collection.mutable.ArrayBuffer(pts.head)
      val minD2 = pts.map { p =>
        var d = 0.0; var i = 0
        while (i < sub) { val t = p(i) - pts.head(i); d += t * t; i += 1 }
        d
      }
      while (init.length < math.min(ncodes, pts.length)) {
        var best = 0; var bestD = -1.0
        var x = 0
        while (x < pts.length) {
          if (minD2(x) > bestD) { bestD = minD2(x); best = x }
          x += 1
        }
        if (bestD <= 0.0) { init += pts(best); minD2(best) = -1.0 }
        else {
          val c = pts(best)
          init += c
          var y = 0
          while (y < pts.length) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = pts(y)(i) - c(i); d += t * t; i += 1 }
            if (d < minD2(y)) minD2(y) = d
            y += 1
          }
        }
      }
      var cents = init.toArray
      var iter = 0
      while (iter < maxIter) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0L) old
          else sums(c).map(_ / counts(c))
        }
        iter += 1
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** The PQ encode + reconstruct pass shared by pqEncode and pqTopK:
    * per subspace, the nearest codebook centroid (‖c‖²/2 − x·c
    * argmin, ties to the lower code — same discipline as assignCells)
    * becomes the vector's code, and the reconstruction concatenates
    * the chosen centroids. Map-only: the codebooks ride as a plan
    * constant into the native pq_assign kernel, no shuffle, no
    * broadcast join. One expression, not an unrolled per-centroid
    * column tree — the unrolled form generated ~numSub×ncodes struct
    * terms whose one-time janino compile cost 5.5 s at the defaults
    * (and again per stream micro-batch); the kernel call compiles in
    * milliseconds and computes bit-identical codes
    * (HashOps.pqAssign's scaladoc pins the arithmetic contract).
    */
  private def pqColumns(codebooks: Seq[Seq[Seq[Double]]]): (Column, Column) = {
    val a = call_function("pq_assign", col("embedding"), typedLit(codebooks))
    (a.getField("codes"), a.getField("recon"))
  }

  /** Product-quantization codes (Jégou, Douze & Schmid, TPAMI 2011,
    * "Product Quantization for Nearest Neighbor Search"): each vector
    * stored as numSub small codes — at the defaults (16 subspaces ×
    * 32 codes) that is 16 five-bit codes = 10 bytes against 256 float
    * bytes, a ~26× candidate-store compression, the step past
    * quantizeEmbeddings' int8 (4×) on the same rate/recall curve
    * (RecallProbe-measured: recall@10 per-query minimum 40%/30% at
    * sf0.01/sf0.1 vs 80% for SQ8 — rate buys bytes, not rank; the
    * sample gate is partitioning-invariant, so these numbers are a
    * property of the DATA, not the session's parallelism).
    * At 100 TB this is the difference between an ANN candidate scan
    * that fits in page cache and one that doesn't.
    */
  def pqEncode(
      emb: DataFrame,
      numSub: Int = 16,
      ncodes: Int = 32,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      maxIter: Int = 20): DataFrame = {
    val e = spread(emb)
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % numSub == 0, s"dim $dim must split into $numSub subspaces")
    val cbs = fitPqCodebooks(e, dim, numSub, ncodes,
      trainFraction, maxTrainRows, maxIter)
    val (codes, _) = pqColumns(cbs)
    e.select(col("vec_id"), codes.as("codes"))
  }

  /** PQ top-k via asymmetric distance computation: the query stays
    * float, candidates are scored against their codebook
    * reconstruction (dot distributes over the subspace concatenation,
    * so dot(q, recon) = Σ_j dot(q_j, codebook_j[code_j]) — the ADC
    * estimator of the PQ paper, §IV.A). The reconstruction is
    * materialized once per CANDIDATE ROW in the same narrow pass that
    * decodes it (never per pair), then ranking reuses cosineTopK's
    * exact shape: broadcast queries, native float_dot, bounded
    * per-partition top-k. Like ivf/ann, engine-specific (seeded
    * k-means) — covered by the measured pq_recall floor, not a SQL
    * oracle.
    */
  def pqTopK(
      emb: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      numSub: Int = 16,
      ncodes: Int = 32,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      maxIter: Int = 20,
      // pinned codebooks [numSub][ncodes][sub] — the oracle-replayable
      // face, same rationale as ivfTopK's pinned centroids: the ADC
      // estimator (assign → reconstruct → rank) is the machinery under
      // test, and at codebooks the oracle can re-derive (e.g. the first
      // ncodes vectors' subvectors) every code, reconstruction, and
      // similarity replays exactly; codebook FIT quality is pq_recall's
      // business. None = the deterministic farthest-point + Lloyd fit.
      codebooks: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    val e = spread(emb)
      .select(col("vec_id"), col("embedding"), sumSq(col("embedding")).as("n2"))
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % numSub == 0, s"dim $dim must split into $numSub subspaces")
    val cbs = codebooks.getOrElse(fitPqCodebooks(e, dim, numSub, ncodes,
      trainFraction, maxTrainRows, maxIter))
    val (_, recon) = pqColumns(cbs)
    val enc = e.select(col("vec_id"), recon.as("recon"))
      .withColumn("rn2", sumSq(col("recon")))
      .filter(col("rn2") > 0)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("qn2"))
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("recon"))
      / (sqrt(col("rn2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      enc.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** Persist the PQ index: codebooks as one small parquet table
    * ((subspace, code, centroid) — kilobytes) and the corpus as its
    * code rows ((vec_id, codes) — the ~26× compression REALIZED on
    * disk: ~10 bytes of codes per 256-byte vector). Build-once/
    * query-many, the same discipline as buildIvfIndex/buildMinhashIndex;
    * the float corpus is read once at build and never again by the
    * query path. (IVF-PQ — cells over codes — is the natural
    * composition of this table with buildIvfIndex's partitioning;
    * not built here.)
    */
  def buildPqIndex(
      emb: DataFrame,
      indexDir: String,
      numSub: Int = 16,
      ncodes: Int = 32,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      maxIter: Int = 20,
      // fit the codebooks on a DIFFERENT frame than the one encoded —
      // the append-parity construction (encode base∪delta at the
      // quantizer that existed before the delta arrived); None = fit
      // on `emb` itself
      fitOn: Option[DataFrame] = None): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = spread(emb)
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % numSub == 0, s"dim $dim must split into $numSub subspaces")
    val cbs = fitPqCodebooks(fitOn.map(spread).getOrElse(e), dim, numSub, ncodes,
      trainFraction, maxTrainRows, maxIter)
    cbs.zipWithIndex
      .flatMap { case (cb, j) => cb.zipWithIndex.map { case (c, i) => (j, i, c) } }
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    val (codes, _) = pqColumns(cbs)
    e.select(col("vec_id"), codes.as("codes"))
      .write.mode("overwrite").parquet(s"$indexDir/codes")
  }

  /** The persisted codebooks, reloaded: (subspace → code → centroid).
    * Bounded — numSub·ncodes rows, kilobytes. */
  private[graft] def loadCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[Seq[Seq[Double]]] =
    spark.read.parquet(s"$indexDir/codebooks")
      .orderBy("subspace", "code").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
      }

  /** Incremental PQ maintenance: encode a NEW batch at the EXISTING
    * persisted codebooks — frozen quantizer, no refit (the
    * appendToIvfIndex rationale: the codebooks are the index's
    * identity, and encode quality of a modest delta barely moves
    * under a refit) — and append its code rows. Appending a 0.1%
    * delta costs one narrow encode map over the delta plus kilobytes
    * of codebook IO, never a corpus re-encode; and because encoding
    * is a pure function of (vector, codebooks), build(base)+append(delta)
    * is row-identical to a one-pass encode of base∪delta at the same
    * codebooks — the pq_index_append driver row states that parity
    * through the cold query path.
    */
  def appendToPqIndex(newVecs: DataFrame, indexDir: String): Unit =
    appendToPqIndexAt(newVecs, indexDir,
      loadCodebooks(newVecs.sparkSession, indexDir))

  /** appendToPqIndex with the codebook load hoisted out: `cbs` MUST be
    * loadCodebooks(indexDir) — the codebooks are the index's frozen
    * identity, so a caller appending MANY batches (the streaming
    * ingest loop) loads them once instead of once per batch. */
  private[graft] def appendToPqIndexAt(
      newVecs: DataFrame, indexDir: String,
      cbs: Seq[Seq[Seq[Double]]]): Unit = {
    val sub = cbs.head.head.size
    val dim = cbs.size * sub
    val e = spread(newVecs)
    require(newVecs.select(size(col("embedding")).as("d")).head().getInt(0) == dim,
      s"appendToPqIndex: batch dimension must match the index's $dim")
    val (codes, _) = pqColumns(cbs)
    e.select(col("vec_id"), codes.as("codes"))
      .write.mode("append").parquet(s"$indexDir/codes")
  }

  /** Retraction (the GDPR-erasure shape the snapshot table's
    * commitDelete gives rows, now for index entries): drop `keys`
    * (single col `vec_id`) from the PQ code table. The code table is
    * flat (not cell-partitioned), so the rewrite is a staged
    * anti-join over the CODES — ~10-byte rows, 26× smaller than the
    * float corpus — swapped in with the rename-aside discipline of
    * Sinks.overwriteAtomic; the codebooks (the index's identity) are
    * untouched, so a query after remove(delta) is row-identical to a
    * rebuild that never saw delta at the same codebooks — the
    * pq_index_delete driver row states that parity through the cold
    * query path. */
  def removeFromPqIndex(keys: DataFrame, indexDir: String): Unit = {
    val spark = keys.sparkSession
    val survivors = spark.read.parquet(s"$indexDir/codes")
      .join(keys.select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
    graft.sources.Sinks.overwriteAtomic(survivors, s"$indexDir/codes")
  }

  /** Distribution-drift monitor for the persisted PQ index — the
    * refit trigger the frozen-quantizer appends deliberately lack
    * (appendToPqIndex's scaladoc: encode quality of a modest delta
    * barely moves; this is the op that CHECKS that, so the "until a
    * scheduled refit" trade is measured instead of assumed). Signal:
    * encode `recent` at the standing codebooks and compare its CODE
    * USAGE HISTOGRAMS — per subspace, TV distance (half the L1 gap
    * between the two empirical distributions, in thousandths) against
    * the histograms of the codes the index already stores, averaged
    * over subspaces. Histogram shift is the right drift statistic for
    * a quantizer in high dimension: distortion ratios saturate (every
    * isotropic vector is ~equally far from every centroid — the
    * concentration of distances), while a distribution the codebooks
    * don't cover collapses code usage onto a few codes and moves TV
    * toward 1000 immediately. The baseline comes from the index's own
    * code table (no extra build artifact; appends move the baseline
    * with the corpus), counts are exact integers, the TV fold is
    * driver-side BigDecimal over numSub·ncodes histogram rows — fully
    * deterministic. A flagged batch means: schedule a refit+rebuild;
    * meanwhile appends stay correct (PQ never loses rows, only
    * ranking quality). Sampling note: TV of an n-row batch against a
    * large baseline has E[TV] ≈ Σ√(p(1−p)/n)/2 noise — at the 32-code
    * default, n=100 gives ~270e3 — so the default threshold 500 keeps
    * small in-distribution batches quiet while a genuine collapse
    * (one hot code per subspace → TV ≥ ~750) still trips.
    */
  def pqDriftCheck(
      recent: DataFrame, indexDir: String, maxTvE3: Long = 500L): DataFrame = {
    val spark = recent.sparkSession
    import spark.implicits._
    val cbs = loadCodebooks(spark, indexDir)
    val dim = cbs.size * cbs.head.head.size
    require(recent.select(size(col("embedding")).as("d")).head().getInt(0) == dim,
      s"pqDriftCheck: batch dimension must match the index's $dim")
    val (codes, _) = pqColumns(cbs)
    def hist(df: DataFrame): Map[(Int, Int), Long] =
      df.select(posexplode(col("codes")).as(Seq("subspace", "code")))
        .groupBy("subspace", "code").agg(count(lit(1)).as("n"))
        .collect() // bounded: ≤ numSub·ncodes rows
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val base = hist(spark.read.parquet(s"$indexDir/codes"))
    val rec = hist(spread(recent).select(codes.as("codes")))
    val nRecent = rec.valuesIterator.sum / math.max(1, cbs.size)
    val tvE3 = meanTvE3(base, rec, cbs.size)
    Seq((nRecent, tvE3, tvE3 > maxTvE3))
      .toDF("n_recent", "drift_tv_e3", "drift")
  }

  /** Cosine top-k against CALLER-SUPPLIED query vectors ((q_id,
    * q_emb)) — cosineTopK's exact kernel with the query set decoupled
    * from the corpus's first ids; the refit row's yardstick (exact
    * neighbors of the drifted queries over the refreshed corpus). */
  def cosineTopKFor(emb: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val e = spread(emb)
      .select(col("vec_id"), col("embedding"), sumSq(col("embedding")).as("n2"))
    val q = queries.select(col("q_id"), col("q_emb"),
      sumSq(col("q_emb")).as("qn2"))
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("embedding"))
      / (sqrt(col("n2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** Swap a staged index directory over the live one — rename-aside:
    * the LIVE index stays readable until one directory rename, then
    * the stage becomes the index and the old tree is dropped. A crash
    * between the two renames leaves `live.old-*` recoverable by hand;
    * readers mid-swap can catch a brief absence (the
    * removeFromCellTable caveat, at whole-index granularity). */
  private def swapIndexDirs(
      spark: org.apache.spark.sql.SparkSession,
      staged: String, live: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(live)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(
      live + ".old-" + java.util.UUID.randomUUID().toString)
    require(f.rename(p, old), s"swapIndexDirs: could not set aside $live")
    require(f.rename(new org.apache.hadoop.fs.Path(staged), p),
      s"swapIndexDirs: could not promote $staged")
    f.delete(old, true): Unit
  }

  /** REFIT — the ACTION the drift monitors trigger (closing the r11
    * detect-but-never-repair gap): retrain the PQ codebooks on the
    * CURRENT corpus (which includes whatever drifted mass the monitor
    * flagged), re-encode it, and atomically swap the staged index over
    * the live one. The old index serves queries until the swap's
    * single directory rename; a monitor re-run on the flagged batch
    * goes quiet afterwards (the codebooks now cover it), and recall on
    * drifted queries recovers to the build-distribution floor — the
    * pq_drift_refit driver row measures both. Note the contract
    * CHANGE vs append/remove: a refit deliberately replaces the
    * index's identity (new codebooks ⇒ new codes), so append-parity
    * guarantees restart from the refitted state. */
  def refitPqIndex(
      emb: DataFrame, indexDir: String, numSub: Int = 16, ncodes: Int = 32,
      trainFraction: Double = 0.1, maxTrainRows: Int = 20000,
      maxIter: Int = 20): Unit = {
    val staged = indexDir + ".refit-" + java.util.UUID.randomUUID().toString
    buildPqIndex(emb, staged, numSub, ncodes, trainFraction, maxTrainRows, maxIter)
    swapIndexDirs(emb.sparkSession, staged, indexDir)
  }

  /** The IVF refit: retrain the coarse quantizer on the index's OWN
    * stored vectors (the assignments table carries the embeddings, so
    * no external corpus handle is needed), rebuild the cell layout,
    * swap. Same identity-replacement contract as refitPqIndex. */
  def refitIvfIndex(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      nlist: Int = 16, trainFraction: Double = 0.5,
      maxTrainRows: Int = 20000, maxIter: Int = 20): Unit = {
    val cur = spark.read.parquet(s"$indexDir/assignments")
      .select(col("vec_id"), col("embedding"))
    val model = fitKMeans(prepIvf(cur), nlist, trainFraction, maxTrainRows, maxIter)
    val staged = indexDir + ".refit-" + java.util.UUID.randomUUID().toString
    buildIvfIndex(cur, staged, model)
    swapIndexDirs(spark, staged, indexDir)
  }

  /** The IVF twin of pqDriftCheck: TV distance between the recent
    * batch's CELL-ASSIGNMENT histogram and the stored assignments'
    * (one histogram, nlist bins). A shifted distribution crowds into
    * cells the standing corpus barely uses — exactly what degrades
    * probe recall, since nprobe cells are chosen by query geometry
    * while the data sits elsewhere. Baseline from the index itself
    * (tracks appends); the per-cell counts ride the cell-partitioned
    * layout's metadata-cheap groupBy. */
  def ivfDriftCheck(
      recent: DataFrame, indexDir: String, maxTvE3: Long = 500L): DataFrame = {
    val spark = recent.sparkSession
    import spark.implicits._
    val centSeq = spark.read.parquet(s"$indexDir/centroids")
      .collect() // bounded: nlist rows
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList: Seq[Double]))
      .sortBy(_._1).toSeq
    def hist(df: DataFrame): Map[(Int, Int), Long] =
      df.groupBy("cell").agg(count(lit(1)).as("n"))
        .collect() // bounded: nlist rows
        .map(r => (0, r.getInt(0)) -> r.getLong(1)).toMap
    val base = hist(spark.read.parquet(s"$indexDir/assignments"))
    val recAssigned = assignCells(prepIvf(recent), centSeq)
    val rec = hist(recAssigned)
    val nRecent = rec.valuesIterator.sum
    val tvE3 = meanTvE3(base, rec, 1)
    Seq((nRecent, tvE3, tvE3 > maxTvE3))
      .toDF("n_recent", "drift_tv_e3", "drift")
  }

  /** Mean (over `groups` histogram groups) total-variation distance
    * between two count histograms keyed (group, bin), in thousandths:
    * TV = ½·Σ|p̂ − q̂| per group. Exact BigDecimal arithmetic over
    * integer counts — deterministic under any partitioning. */
  private def meanTvE3(
      a: Map[(Int, Int), Long], b: Map[(Int, Int), Long], groups: Int): Long = {
    require(a.nonEmpty, "driftCheck: empty baseline histogram")
    require(b.nonEmpty, "driftCheck: empty recent histogram")
    val tv = (0 until groups).map { g =>
      val ag = a.collect { case ((`g`, bin), n) => bin -> n }
      val bg = b.collect { case ((`g`, bin), n) => bin -> n }
      val an = BigDecimal(ag.valuesIterator.sum.max(1L))
      val bn = BigDecimal(bg.valuesIterator.sum.max(1L))
      (ag.keySet ++ bg.keySet).toSeq.map { bin =>
        (BigDecimal(ag.getOrElse(bin, 0L)) / an -
          BigDecimal(bg.getOrElse(bin, 0L)) / bn).abs
      }.sum / 2
    }.sum / groups
    (tv * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  /** Cold PQ query: reload the codebooks (kilobytes), reconstruct
    * candidates from their STORED codes in one narrow scan of the
    * code table (the float corpus is never touched), and rank the
    * caller's query vectors by ADC cosine — parameter-driven queries
    * by design (the production shape: queries arrive from outside,
    * they are not row N of the corpus). Deterministic end to end, so
    * the driver row pins full per-query parity against the in-JVM
    * pqTopK at the same fit parameters.
    */
  def pqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame, // (q_id, q_emb)
      k: Int = 10): DataFrame = {
    val cbs = loadCodebooks(spark, indexDir)
    val recon = flatten(array(cbs.indices.map { j =>
      element_at(typedLit(cbs(j)), element_at(col("codes"), j + 1) + 1)
    }: _*)).cast("array<float>")
    val enc = spark.read.parquet(s"$indexDir/codes")
      .select(col("vec_id"), recon.as("recon"))
      .withColumn("rn2", sumSq(col("recon")))
      .filter(col("rn2") > 0)
    val q = queries.select(col("q_id"), col("q_emb"),
      sumSq(col("q_emb")).as("qn2"))
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("recon"))
      / (sqrt(col("rn2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      enc.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** IVF-PQ composed index (the IVFADC recipe of Jégou, Douze &
    * Schmid, TPAMI'11 §V — the standard billion-scale layout): the
    * coarse quantizer's cells PRUNE the candidate scan (buildIvfIndex's
    * cell-partitioned layout) while product-quantized RESIDUALS
    * (x − cell centroid) COMPRESS the stored candidates to ~10-byte
    * code rows. Residual coding is what makes the composition better
    * than either half alone: within a cell the residuals are small,
    * so the code rate is spent on local structure instead of global
    * position, and reconstruction (centroid + decoded residual) sits
    * materially closer to x than raw-vector PQ at the same rate.
    * Layout: `centroids` (cell, centroid), `codebooks`
    * (subspace, code, centroid) — both kilobytes — and `codes`
    * (vec_id, codes) PARTITIONED BY cell, so a query opens nprobe
    * code directories of ~10-byte rows and never touches a float of
    * the corpus.
    */
  def buildIvfPqIndex(
      emb: DataFrame,
      indexDir: String,
      nlist: Int = 16,
      numSub: Int = 16,
      ncodes: Int = 32,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      maxIter: Int = 20,
      // fit BOTH quantizers (cells and residual codebooks) on a
      // different frame than the one encoded — buildPqIndex's
      // append-parity construction, two fits deep
      fitOn: Option[DataFrame] = None): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % numSub == 0, s"dim $dim must split into $numSub subspaces")
    val fitFrame = fitOn.getOrElse(emb)
    val model = fitIvfModel(fitFrame, nlist)
    val centSeq = centroidSeq(model)
    val centArrF = typedLit(centSeq.sortBy(_._1).map(_._2.map(_.toFloat)))
    val residual = zip_with(
      col("embedding"), element_at(centArrF, col("cell") + 1),
      (x, c) => x - c).cast("array<float>")
    // fitPqCodebooks + pqColumns read `embedding` — hand them the
    // residual under that name so the SAME kernels serve both PQ forms
    def residOf(df: DataFrame) = assignCells(prepIvf(df), centSeq).select(
      col("vec_id"), col("cell"), residual.as("embedding"))
    val residFrame = residOf(emb)
    val cbs = fitPqCodebooks(residOf(fitFrame), dim, numSub, ncodes,
      trainFraction, maxTrainRows, maxIter)
    val (codes, _) = pqColumns(cbs)
    spark.createDataset(centSeq).toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    cbs.zipWithIndex
      .flatMap { case (cb, j) => cb.zipWithIndex.map { case (c, i) => (j, i, c) } }
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    graft.sources.Sinks.writePartitioned(
      residFrame.select(col("vec_id"), col("cell"), codes.as("codes")),
      s"$indexDir/codes", "cell")
  }

  /** Cold IVF-PQ query: probe nprobe cells (static partition filter —
    * only the probed code directories are opened), reconstruct each
    * candidate as centroid + decoded residual in the same narrow scan
    * that reads its codes, and rank by ADC cosine through the shared
    * rankTopK stage. Caller-supplied queries (the production shape).
    * Approximation stacks cell pruning ON TOP of code rounding, so
    * recall sits at-or-below plain IVF at equal nprobe — the
    * ivfpq_recall row pins the measured floor.
    */
  def ivfPqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame, // (q_id, q_emb)
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val centSeq = cents.collect() // bounded: nlist rows
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val cbs = loadCodebooks(spark, indexDir)
    val q = queries.select(col("q_id"), col("q_emb"),
      sumSq(col("q_emb")).as("qn2"))
    val qDist = probeSet(q, cents, nprobe)
    val probeCells = qDist.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    val centArrF = typedLit(centSeq.map(_._2.map(_.toFloat)))
    val reconRes = flatten(array(cbs.indices.map { j =>
      element_at(typedLit(cbs(j)), element_at(col("codes"), j + 1) + 1)
    }: _*)).cast("array<float>")
    val recon = zip_with(
      element_at(centArrF, col("cell") + 1), reconRes,
      (c, r) => c + r).cast("array<float>")
    val cand = spark.read.parquet(s"$indexDir/codes")
      .filter(col("cell").isin(probeCells.map(Int.box): _*))
      .select(col("vec_id"), col("cell"), recon.as("embedding"))
      .withColumn("n2", sumSq(col("embedding")))
      .filter(col("n2") > 0)
    rankTopK(cand, qDist, k)
  }

  /** Incremental IVF-PQ maintenance — the composed index's append
    * half, completing the family (appendToIvfIndex's cells,
    * appendToPqIndex's codes, in one pass): assign the new batch to
    * the EXISTING persisted centroids, residual-encode at the
    * EXISTING codebooks (both quantizers frozen — they are the
    * index's identity), and dynamic-partition-append the code rows
    * into the cell dirs. Encoding is a pure function of
    * (vector, centroids, codebooks), so build(base)+append(delta) is
    * row-identical to a one-pass build of base∪delta at the base-fit
    * quantizers — the ivfpq_index_append row states that parity
    * through the cold query path.
    */
  def appendToIvfPqIndex(newVecs: DataFrame, indexDir: String): Unit = {
    val spark = newVecs.sparkSession
    val centSeq = spark.read.parquet(s"$indexDir/centroids")
      .collect() // bounded: nlist rows
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList: Seq[Double]))
      .sortBy(_._1).toSeq
    val cbs = loadCodebooks(spark, indexDir)
    val dim = cbs.size * cbs.head.head.size
    require(newVecs.select(size(col("embedding")).as("d")).head().getInt(0) == dim,
      s"appendToIvfPqIndex: batch dimension must match the index's $dim")
    val centArrF = typedLit(centSeq.map(_._2.map(_.toFloat)))
    val residual = zip_with(
      col("embedding"), element_at(centArrF, col("cell") + 1),
      (x, c) => x - c).cast("array<float>")
    val residFrame = assignCells(prepIvf(newVecs), centSeq).select(
      col("vec_id"), col("cell"), residual.as("embedding"))
    val (codes, _) = pqColumns(cbs)
    residFrame.select(col("vec_id"), col("cell"), codes.as("codes"))
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/codes")
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein,
    * SIGIR'98) — the diversification stage between retrieval and the
    * context window: greedily re-pick from a query's top-k so each
    * pick balances relevance against redundancy with what's already
    * picked, score = λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s).
    * Near-duplicate passages waste context tokens; retrieval alone
    * happily returns five copies of the same paragraph.
    *
    * Arithmetic is INTEGER by design: λ is tenths (λ=0.7 →
    * score_e7 = 7·sim_e6 − 3·maxPair_e6), inputs are the family's
    * sim_e6 longs, so the greedy argmax compares exact integers and
    * the DuckDB recursive-CTE oracle replays every pick bit-for-bit
    * (ties break on neighbor id; an empty picked set carries no
    * penalty). Scale shape: candidates are the RETRIEVAL OUTPUT —
    * nQueries·k rows, bounded — so the pairwise stage is |C|² per
    * query against a k² ceiling, and the greedy loop runs inside
    * cogroup-per-query (distributed across queries, O(k²) work and
    * O(k²) state per group; never a driver-side loop).
    */
  def mmrRerank(
      topk: DataFrame,
      emb: DataFrame,
      k: Int,
      lambdaTenths: Int = 7): DataFrame = {
    require(lambdaTenths >= 0 && lambdaTenths <= 10, "lambdaTenths in [0,10]")
    val spark = topk.sparkSession
    import spark.implicits._
    val ce = topk.select(col("q_id"), col("neighbor_id"), col("sim_e6"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"), col("sim_e6"), col("embedding"),
        sumSq(col("embedding")).as("n2"))
    val pairSim = round(lit(1e6) * dot(col("a.embedding"), col("b.embedding"))
      / (sqrt(col("a.n2")) * sqrt(col("b.n2")))).cast("long")
    val pairs = ce.as("a").join(ce.as("b"),
        col("a.q_id") === col("b.q_id") &&
          col("a.neighbor_id") < col("b.neighbor_id"))
      .select(col("a.q_id").as("q_id"), col("a.neighbor_id").as("na"),
        col("b.neighbor_id").as("nb"), pairSim.as("ps"))
    val candDs = ce.select("q_id", "neighbor_id", "sim_e6").as[(Long, Long, Long)]
    val pairDs = pairs.as[(Long, Long, Long, Long)]
    candDs.groupByKey(_._1).cogroup(pairDs.groupByKey(_._1)) { (q, cs, psIt) =>
      val cands = cs.map(t => (t._2, t._3)).toArray.sortBy(_._1)
      val ps = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      psIt.foreach { case (_, a, b, s) => ps((a, b)) = s; ps((b, a)) = s }
      val simq = cands.toMap
      val remaining = scala.collection.mutable.LinkedHashSet(cands.map(_._1): _*)
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
      var r = 1
      while (r <= k && remaining.nonEmpty) {
        var bestN = -1L
        var bestScore = Long.MinValue
        for (n <- remaining) {
          val pen =
            if (picked.isEmpty) 0L
            else picked.map(p => ps.getOrElse((n, p), 0L)).max
          val score = lambdaTenths * simq(n) - (10 - lambdaTenths) * pen
          if (score > bestScore) { bestScore = score; bestN = n }
        }
        out += ((q, r, bestN, bestScore))
        picked += bestN
        remaining -= bestN
        r += 1
      }
      out.iterator
    }.toDF("q_id", "rank", "neighbor_id", "score_e7")
  }

  /** MinHash-LSH near-duplicate pairs: shingle → numHashes minhashes →
    * bands of (numHashes/bands) rows → equi-join on (band, band-key)
    * for candidates → exact Jaccard verification (≥ 1/2 via the
    * integer cross-multiplication, no doubles).
    *
    * With 64 hashes in 16 bands of 4, a pair at Jaccard 0.9 is missed
    * with probability (1−0.9⁴)¹⁶ ≈ 3·10⁻⁸ — the candidate stage is
    * effectively exhaustive above the threshold, and the verify stage
    * removes false positives, so output = the all-pairs oracle.
    * At 100 TB: the bucket join shuffles (band, key) pairs — 16 rows
    * of 8 bytes per doc, not documents; a pathological hot bucket
    * (all-identical spam) keeps only its bucketCap lowest-id docs,
    * bounding the join at bucketCap² per bucket. The recall trade: a
    * doc beyond the cap loses only the pairs that surface in NO other
    * band — kept docs still pair among themselves, and near-dup
    * clusters collide in ~all 16 bands, so the candidate set stays
    * effectively exhaustive outside degenerate spam clusters.
    */
  def minhashNearDup(
      docs: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      bucketCap: Int = 1000): DataFrame =
    minhashNearDupShingled(shingleFrame(docs), numHashes, bands, bucketCap)

  /** The (doc_id, sh) shingle frame every minhash face starts from —
    * exposed so a caller with SEVERAL consumers of one batch (the
    * streaming index-dedup loop probes, self-dedups AND appends the
    * same micro-batch) can compute/persist the CPU-dominant shingling
    * once instead of once per consumer. */
  private[graft] def shingleFrame(docs: DataFrame): DataFrame =
    spread(docs)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  /** The (doc_id, band, bkey) banded-signature frame of a shingle
    * frame — the signing pass every minhash face runs. Exposed (like
    * shingleFrame) so a caller with several consumers of ONE batch
    * (the streaming dedup loop probes, self-dedups AND appends the
    * same micro-batch) can sign once instead of once per consumer:
    * signing is 64 hash passes over every shingle, the CPU-dominant
    * half after shingling itself. */
  private[graft] def bandKeyFrame(
      sh: DataFrame, numHashes: Int, bands: Int): DataFrame =
    // The signature uses the universal family hᵢ(s) = (aᵢ·h₀(s)+bᵢ)
    // mod p over 31-bit values: the modular wraparound re-scrambles
    // the ORDER of hashes for every i, so the 64 argmins are
    // near-independent — a wrap-free affine family (h1 + i·h2) is
    // NOT: it preserves ordering structure, collapses the 64
    // experiments to ~2, and measurably missed a 0.986-Jaccard pair.
    // Signature AND banding are fused in one codegen'd expression
    // (MinHashBandKeys): split across two projections, CollapseProject
    // inlines the signature into the per-band lambda and recomputes it
    // 16× per row; interpreted HOFs made that 90 s/query at sf0.1.
    sh.select(col("doc_id"), posexplode(
        call_function("minhash_band_keys", col("sh"), lit(numHashes), lit(bands)))
        .as(Seq("band", "bkey")))

  private[graft] def minhashNearDupShingled(
      sh: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      bucketCap: Int = 1000): DataFrame =
    minhashNearDupKeyed(sh, bandKeyFrame(sh, numHashes, bands), bucketCap)

  /** minhashNearDupShingled with the signing pass hoisted out: `keys`
    * MUST be bandKeyFrame(sh, ...) — same frame, same params (the
    * caller shares one signed frame across consumers). */
  private[graft] def minhashNearDupKeyed(
      sh: DataFrame,
      keys: DataFrame,
      bucketCap: Int = 1000): DataFrame = {
    val capped = capBuckets(keys, Seq("band", "bkey"), bucketCap)
    val cand = capped.as("x")
      .join(capped.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // long-cast threshold arithmetic: size() is 32-bit, and 2·inter on
    // an int would wrap for a ~1B-shingle document (same guard class
    // as dfOrderedPrefixes' prefLen)
    withShingleSets(cand, sh)
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter_size"),
        size(array_union(col("sh_a"), col("sh_b"))).as("union_size"))
      .filter(col("inter_size").cast("long") * 2 >= col("union_size").cast("long"))
  }

  /** Persist the MinHash-LSH band index — the near-dup family's
    * build-once/query-many posture (the IVF/bloom index precedent
    * applied to text dedup). The production shape this serves is
    * INCREMENTAL corpus dedup: a standing 100 TB corpus, a daily
    * delta batch, and the question "which delta docs duplicate
    * something already ingested" — answered WITHOUT re-shingling or
    * re-signing the standing corpus (the CPU-dominant work: shingling
    * + 64 minhashes per doc), and without any corpus-vs-corpus pair
    * generation. Layout under `indexDir`:
    *
    *  - `bands`    (band, bkey, doc_id) — the banded-signature
    *    inverted index, UNCAPPED by design: a bucket cap is a QUERY
    *    policy (capping at build time would silently make late-
    *    appended docs undiscoverable in their hot buckets, the same
    *    false-negative class the bloom index's staleness guard
    *    exists for);
    *  - `shingles` (doc_id, sh) — the corpus shingle sets the exact
    *    verify stage consumes. This is the index's dominant storage
    *    term (≈ corpus token volume) and the price of EXACT Jaccard
    *    answers off the index alone; it is read only for docs that
    *    band-collide with the delta, and only the (doc_id, sh)
    *    columns exist to read;
    *  - `meta`     1 row (num_hashes, bands) — the signature params
    *    queries and appends must reuse: band keys from different
    *    (numHashes, bands) never collide meaningfully, so both
    *    query and append read their params from here rather than
    *    trusting the caller to re-supply them consistently.
    */
  def buildMinhashIndex(
      docs: DataFrame,
      indexDir: String,
      numHashes: Int = 64,
      bands: Int = 16): Unit = {
    val spark = docs.sparkSession
    val sh = shingleFrame(docs)
    sh.write.mode("overwrite").parquet(s"$indexDir/shingles")
    // re-read the persisted shingles rather than recomputing them for
    // the band table — shingling is the expensive half of the build
    buildMinhashIndexFromShingles(
      spark.read.parquet(s"$indexDir/shingles"), indexDir, numHashes, bands)
  }

  /** The build's back half — band table + meta from an ALREADY
    * materialized shingle frame (the persisted parquet above, or the
    * streaming dedup loop's per-batch cached frame, which would
    * otherwise re-shingle the whole batch just to sign it). */
  private[graft] def buildMinhashIndexFromShingles(
      sh: DataFrame,
      indexDir: String,
      numHashes: Int = 64,
      bands: Int = 16): Unit = {
    val spark = sh.sparkSession
    import spark.implicits._
    bandKeyFrame(sh, numHashes, bands)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
    Seq((numHashes, bands)).toDF("num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** Incremental maintenance: shingle + sign a NEW document batch at
    * the index's OWN stored params and append to both tables — the
    * daily-append posture. Appending is narrow (map-only signature
    * work over the delta plus two file appends); nothing standing is
    * rewritten, and a doc appended today is discoverable by tomorrow's
    * delta query exactly as if it had been in the original build —
    * build(A)+append(B) and build(A∪B) produce identical tables up to
    * file layout, because signature params come from `meta` and the
    * band table carries no build-time ordering or cap.
    */
  def appendToMinhashIndex(newDocs: DataFrame, indexDir: String): Unit =
    appendToMinhashIndexShingled(shingleFrame(newDocs), indexDir)

  private[graft] def appendToMinhashIndexShingled(
      sh: DataFrame, indexDir: String): Unit = {
    val spark = sh.sparkSession
    val meta = spark.read.parquet(s"$indexDir/meta").head()
    val numHashes = meta.getAs[Int]("num_hashes")
    val nBands = meta.getAs[Int]("bands")
    appendToMinhashIndexKeyed(sh, bandKeyFrame(sh, numHashes, nBands), indexDir)
  }

  /** appendToMinhashIndexShingled with the signing pass hoisted out:
    * `keys` MUST be bandKeyFrame(sh, ...) at the INDEX's own meta
    * params — the caller (the streaming dedup loop) read them to sign
    * once for probe + append. */
  private[graft] def appendToMinhashIndexKeyed(
      sh: DataFrame, keys: DataFrame, indexDir: String): Unit = {
    sh.write.mode("append").parquet(s"$indexDir/shingles")
    keys.write.mode("append").parquet(s"$indexDir/bands")
  }

  /** Near-dup pairs between a DELTA batch and the PERSISTED index:
    * (doc_a = indexed doc, doc_b = delta doc, inter_size, union_size)
    * at Jaccard ≥ 1/2 — minhashNearDup's contract restricted to
    * delta-vs-corpus pairs. Only the delta is shingled and signed
    * (the driver row asserts both index tables appear as scans in the
    * executed plan — the corpus text is never re-shingled); the corpus side
    * contributes its band rows to one equi-join and the shingle sets
    * of colliding docs to the exact verify. Delta-vs-delta pairs are
    * OUT of contract by sequencing: dedup today's batch against the
    * standing index first, then appendToMinhashIndex it — tomorrow's
    * batch sees it. A delta doc whose id already exists in the index
    * (re-ingestion) self-pairs at Jaccard 1 and is excluded by the
    * doc_a ≠ doc_b guard. The bucket cap applies at query time to
    * BOTH sides (lowest doc_ids kept, the minhashNearDup recall
    * argument unchanged); the candidate equi-join shuffles only
    * (band, bkey) rows restricted to the delta's buckets.
    */
  def minhashNearDupFromIndex(
      delta: DataFrame,
      indexDir: String,
      bucketCap: Int = 1000): DataFrame =
    minhashNearDupFromIndexShingled(shingleFrame(delta), indexDir, bucketCap)

  private[graft] def minhashNearDupFromIndexShingled(
      dsh: DataFrame,
      indexDir: String,
      bucketCap: Int = 1000): DataFrame = {
    val spark = dsh.sparkSession
    val meta = spark.read.parquet(s"$indexDir/meta").head()
    val numHashes = meta.getAs[Int]("num_hashes")
    val nBands = meta.getAs[Int]("bands")
    minhashNearDupFromIndexKeyed(
      dsh, bandKeyFrame(dsh, numHashes, nBands), indexDir, bucketCap)
  }

  /** minhashNearDupFromIndexShingled with the signing pass hoisted
    * out: `dKeys` MUST be bandKeyFrame(dsh, ...) at the index's own
    * meta params. */
  private[graft] def minhashNearDupFromIndexKeyed(
      dsh: DataFrame,
      dKeys: DataFrame,
      indexDir: String,
      bucketCap: Int = 1000): DataFrame = {
    val spark = dsh.sparkSession
    // restrict the index to the delta's probed buckets BEFORE the cap
    // window: restriction takes whole buckets, so cap-after-restrict
    // keeps exactly the docs cap-before-restrict would — but the
    // window only shuffles the probed sliver, not the corpus-sized
    // band table (AQE turns the semi probe into a broadcast when the
    // delta is small, the daily-batch case)
    val probed = spark.read.parquet(s"$indexDir/bands")
      .join(dKeys.select("band", "bkey").distinct(), Seq("band", "bkey"), "left_semi")
    val cand = capBuckets(probed, Seq("band", "bkey"), bucketCap).as("x")
      .join(capBuckets(dKeys, Seq("band", "bkey"), bucketCap).as("y"),
        Seq("band", "bkey"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(spark.read.parquet(s"$indexDir/shingles")
        .select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(dsh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter_size"),
        size(array_union(col("sh_a"), col("sh_b"))).as("union_size"))
      .filter(col("inter_size").cast("long") * 2 >= col("union_size").cast("long"))
  }

  /** EXACT n-gram Jaccard near-duplicate pairs (threshold tNum/tDen)
    * via prefix filtering — the AllPairs candidate generation of
    * Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search"
    * (WWW'07). Where minhashNearDup trades a ~3e-8 per-pair miss for
    * constant-size signatures, this operator is candidate-COMPLETE:
    *
    *  - order every document's shingle set by GLOBAL document
    *    frequency ascending (rarest first; ties broken by the shingle
    *    itself, so the order is total and deterministic);
    *  - index only each document's PREFIX — its first
    *    |X| − ceil(t·|X|) + 1 shingles under that order. Any pair with
    *    |A∩B| ≥ ceil(t·max(|A|,|B|)) must agree on at least one prefix
    *    element (pigeonhole on the common order), and Jaccard ≥ t
    *    implies exactly that, so the inverted-index equi-join on
    *    prefix shingles misses NO qualifying pair;
    *  - a size filter (t·|A| ≤ |B| ≤ |A|/t, integer-crossed) prunes
    *    candidates before the dedup, and the PPJoin positional filter
    *    (Xiao, Wang, Lin & Yu, WWW'08) prunes matches whose DF-order
    *    positions can't reach the required overlap
    *    ⌈t(|A|+|B|)/(1+t)⌉ — measured −25% wall at 30× volume
    *    (ScaleProbe, SURVEY §8); exact intersection/union arithmetic
    *    then verifies — no doubles cross the oracle boundary.
    *
    * At 100 TB: every stage is an equi-shuffle on shingle strings or
    * doc ids — never an all-pairs product. DF-ascending ordering is
    * what bounds the index: frequent shingles (the hot buckets of the
    * hash-based variants) sort to the END of each document and at
    * t=0.8 the top ~80% of each doc's shingles by frequency are never
    * indexed at all. No bucketCap here BY DESIGN: unlike the
    * approximate ops (where a cap trades recall), this operator's
    * output is exact — a corpus of N identical documents has N(N−1)/2
    * TRUE pairs, so the quadratic blowup is in the answer itself, and
    * the cap belongs in the consumer's threshold, not the algorithm.
    */
  def jaccardNearDup(
      docs: DataFrame,
      tNum: Int = 4,
      tDen: Int = 5): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val (sh, _, prefixes) = dfOrderedPrefixes(docs, tNum, tDen)
    val cand = prefixes.as("x")
      .join(prefixes.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      // Jaccard ≥ t forces t·|A| ≤ |B| ≤ |A|/t — integer-crossed in
      // LONG (n is 32-bit; n·tDen would wrap at ~429M shingles)
      .filter(
        col("x.n").cast("long") * tDen >= col("y.n").cast("long") * tNum &&
          col("y.n").cast("long") * tDen >= col("x.n").cast("long") * tNum)
      // positional filter: J ≥ t needs |A∩B| ≥ ⌈t(nA+nB)/(1+t)⌉ =
      // ⌈tNum(nA+nB)/(tNum+tDen)⌉; integer bound ≥ ceil(q) ⇔
      // bound·(tNum+tDen) ≥ tNum·(nA+nB)
      .filter(
        positionalBound(col("x.pos"), col("y.pos"), col("x.n"), col("y.n")) *
          (tNum + tDen) >=
          (col("x.n").cast("long") + col("y.n").cast("long")) * tNum)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    withShingleSets(cand, sh)
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter_size"),
        size(array_union(col("sh_a"), col("sh_b"))).as("union_size"))
      .filter(col("inter_size").cast("long") * tDen >= col("union_size").cast("long") * tNum)
  }

  /** Cross-corpus near-dup DECONTAMINATION: remove from `corpus`
    * every document whose shingle Jaccard against ANY `heldOut`
    * document reaches tNum/tDen — the near-dup generalization of
    * TextOps.decontaminate's exact n-gram containment. A lightly
    * edited eval document shares most shingles without necessarily
    * sharing a verbatim n-gram run, so exact decontamination misses
    * it; this is the train/test-overlap scrub an LLM data pipeline
    * runs before training (Lee et al., arXiv:2107.06499 §6 measure
    * exactly this leakage class).
    *
    * Same DF-ordered prefix filtering as jaccardNearDup — but the
    * document-frequency order is computed over the UNION of both
    * corpora, because prefix completeness needs both sides' prefixes
    * drawn under ONE shared total order. Candidates come from
    * corpus-prefix × heldOut-prefix on the shingle (never corpus ×
    * corpus — within-side duplicates are jaccardNearDup's job), with
    * the symmetric length-ratio and PPJoin positional filters, then
    * exact array_intersect verify; survivors anti-join out. The
    * default threshold is the minhash family's 1/2 (paraphrase-loose),
    * not jaccardNearDup's 4/5 (near-exact) — contamination hunts
    * rewordings, so looser is safer; prefixes are correspondingly
    * longer (≈ n/2), priced in because the heldOut side is the small
    * one (an eval benchmark, not a second corpus).
    *
    * Contract: doc_id is unique ACROSS both frames (the verify joins
    * shingle sets back by bare doc_id).
    *
    * Scale posture: the shuffled unit is (shingle, doc_id, n, pos) —
    * text never crosses the wire after shingling; candidate volume is
    * bounded by prefix collisions against the SMALL held side, and a
    * corpus doc matching many held docs dedups to one drop decision
    * before the anti-join.
    */
  def crossCorpusDedup(
      corpus: DataFrame,
      heldOut: DataFrame,
      tNum: Int = 1,
      tDen: Int = 2): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val union = corpus.select(col("doc_id"), col("text"), lit(false).as("_held"))
      .unionByName(heldOut.select(col("doc_id"), col("text"), lit(true).as("_held")))
    // un-checkpointed like dfOrderedPrefixes' sh — see the rationale
    // there (persisting the fat shingle arrays measured slower than
    // the exchange-reused recompute)
    val sh = spread(union)
      .select(col("doc_id"), col("_held"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = sh.select(col("doc_id"), col("_held"),
      size(col("sh")).as("n"), explode(col("sh")).as("shingle"))
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefLen =
      (col("n") - expr(s"(CAST(n AS BIGINT) * $tNum + ${tDen - 1}) div $tDen") + 1)
        .cast("int")
    val ordered = ex.join(dfreq, Seq("shingle"))
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(struct(col("df"), col("shingle")))).as("ord"),
        max(col("n")).as("n"), max(col("_held")).as("_held"))
      .select(col("doc_id"), col("n"), col("_held"),
        transform(col("ord"), s => s.getField("shingle")).as("ord"))
    val prefixes = ordered.select(
      col("doc_id"), col("n"), col("_held"),
      posexplode(slice(col("ord"), lit(1), prefLen)).as(Seq("pos", "shingle")))
    val cand = prefixes.filter(!col("_held")).as("x")
      .join(prefixes.filter(col("_held")).as("y"), Seq("shingle"))
      .filter(
        col("x.n").cast("long") * tDen >= col("y.n").cast("long") * tNum &&
          col("y.n").cast("long") * tDen >= col("x.n").cast("long") * tNum)
      .filter(
        positionalBound(col("x.pos"), col("y.pos"), col("x.n"), col("y.n")) *
          (tNum + tDen) >=
          (col("x.n").cast("long") + col("y.n").cast("long")) * tNum)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val contaminated = withShingleSets(cand, sh.select("doc_id", "sh"))
      .filter(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long") * tDen >=
          size(array_union(col("sh_a"), col("sh_b"))).cast("long") * tNum)
      .select(col("doc_a").as("doc_id"))
      .distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Shared prefix-filter scaffolding for the EXACT near-dup ops
    * (jaccardNearDup, containmentNearDup): distinct shingle sets, the
    * exploded (doc, n, shingle) inverted index, and each doc's
    * DF-ascending prefix — its first |X| − ⌈t·|X|⌉ + 1 shingles
    * ordered by global document frequency ascending (rarest first,
    * ties broken by the shingle itself so the order is total).
    * Shingles are distinct within a doc, so collect_list's
    * nondeterministic order is erased by the sort; n·tNum runs in long
    * arithmetic so a pathological ~500M-shingle document can't wrap
    * before the div.
    */
  private def dfOrderedPrefixes(
      docs: DataFrame,
      tNum: Int,
      tDen: Int): (DataFrame, DataFrame, DataFrame) = {
    // Deliberately NOT localCheckpoint'ed (r16 measured): the fat
    // shingle-array frames (sh, ordered, prefixes) cost more to
    // persist than their references cost to recompute — the self-join
    // sides are exchange-identical (one runtime stage, reused by AQE
    // stage reuse), and cutting sh/ordered measured 1.5–2.5× SLOWER
    // on the jaccard/containment driver rows. The 100 TB posture for
    // reuse across runs is the persisted band/shingle index family
    // (minhashNearDupFromIndex), not executor-storage checkpoints.
    val sh = spread(docs)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = sh.select(
      col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("shingle"))
    // global document frequency per shingle — the one extra linear
    // pass that buys rare-first prefixes
    val df = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefLen =
      (col("n") - expr(s"(CAST(n AS BIGINT) * $tNum + ${tDen - 1}) div $tDen") + 1)
        .cast("int")
    val ordered = ex.join(df, Seq("shingle"))
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(struct(col("df"), col("shingle")))).as("ord"),
        max(col("n")).as("n"))
      .select(col("doc_id"), col("n"),
        transform(col("ord"), s => s.getField("shingle")).as("ord"))
    // positions ride along (posexplode, 0-based in the DF-order) so
    // consumers can apply the PPJoin positional filter (Xiao, Wang,
    // Lin & Yu, WWW'08 §3.2): for a common token at positions (i, j),
    // overlap ≤ min(i,j) + 1 + min(nA−i−1, nB−j−1) — common tokens
    // ranked before it sit before BOTH positions, ones ranked after
    // sit after both, because the order is global and total. The
    // prefix is the head of the full ordered list, so prefix positions
    // ARE full-list positions.
    val prefixes = ordered.select(
      col("doc_id"), col("n"),
      posexplode(slice(col("ord"), lit(1), prefLen)).as(Seq("pos", "shingle")))
    val fullIdx = ordered.select(
      col("doc_id"), col("n"),
      posexplode(col("ord")).as(Seq("pos", "shingle")))
    (sh, fullIdx, prefixes)
  }

  /** The PPJoin positional-filter upper bound on |A∩B| for a matched
    * token at 0-based DF-order positions (i, j) of docs sized
    * (nA, nB): min(i,j) + 1 + min(nA−i−1, nB−j−1). Candidates where
    * EVERY match's bound undercuts the required overlap are pruned
    * before the exact verify; completeness holds because the bound
    * overestimates the true overlap at every match, so a qualifying
    * pair's guaranteed prefix match always survives.
    */
  private def positionalBound(
      i: Column, j: Column, nA: Column, nB: Column): Column =
    (least(i, j) + 1 + least(nA - i - 1, nB - j - 1)).cast("long")

  /** EXACT containment near-dup: directed pairs where at least
    * tNum/tDen of doc_a's shingles also appear in doc_b —
    * C(A,B) = |A∩B|/|A|, the ASYMMETRIC cousin of Jaccard. Catches
    * what symmetric dedup structurally cannot: a short document quoted
    * whole inside a much longer one has high containment but low
    * Jaccard (the long doc's extra shingles swamp the union), so
    * quote/subset spam survives jaccardNearDup by construction.
    *
    * Same DF-ordered prefix filtering as jaccardNearDup, adapted to
    * the asymmetric bound: if |A∩B| ≥ t·|A| then A's
    * |A| − ⌈t·|A|⌉ + 1 RAREST shingles (global document frequency
    * ascending) must hit B somewhere, so A-prefix × B-full-index on
    * the shingle is candidate-complete. Rarest-first is what keeps the
    * B side tractable — prefix shingles have low df, so each join key
    * fans out to few docs, not to every document containing "of the
    * and". No length-ratio filter applies (containment has no upper
    * bound on |B|). The PPJoin positional filter additionally drops
    * matches landing too late in B's DF-order to reach ⌈t·|A|⌉ —
    * the full-index side is where late positions concentrate (wall
    * measured flat at 30×: the pruning pays for the ordered index
    * build; kept because it bounds the VERIFY fan-out, the term that
    * degenerates on quote-spam corpora). Exact verify via
    * array_intersect on the candidate pairs, integer cross-multiplied
    * threshold.
    */
  def containmentNearDup(
      docs: DataFrame,
      tNum: Int = 4,
      tDen: Int = 5): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val (sh, fullIdx, prefixes) = dfOrderedPrefixes(docs, tNum, tDen)
    val cand = prefixes.as("x")
      .join(fullIdx.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      // positional filter: C(A,B) ≥ t needs |A∩B| ≥ ⌈tNum·nA/tDen⌉;
      // late matches in B's DF-order (j large) can't reach it — the
      // full-index side is where this bites, pruning the frequent-
      // shingle fan-out the prefix side structurally can't avoid
      .filter(
        positionalBound(col("x.pos"), col("y.pos"), col("x.n"), col("y.n")) *
          tDen >= col("x.n").cast("long") * tNum)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    withShingleSets(cand, sh)
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter_size"),
        size(col("sh_a")).as("n_a"))
      .filter(col("inter_size").cast("long") * tDen >= col("n_a").cast("long") * tNum)
  }

  /** SimHash signature per document over word 3-gram shingles:
    * per-shingle 64-bit hash, ±1 vote per bit, sign of the vote sum is
    * the signature bit. Shingles (not unigrams) are the feature set —
    * same-topic documents share most of their vocabulary, which would
    * collapse unigram SimHash distances; 3-gram phrases keep unrelated
    * docs far apart while near-dups still agree on ~all features.
    * Emitted as a 64-char '0'/'1' string (bit 0 first) — cheap to
    * Hamming-compare with a zip. One aggregate pass per bit stays in
    * whole-stage codegen; a custom Expression could fuse the 64 passes
    * into one if this ever dominates a profile. See SimilaritySpec.
    */
  def simhash(docs: DataFrame, bits: Int = 64): DataFrame =
    // One native pass per doc (custom SimHashBits expression): hash
    // each shingle once, accumulate all 64 bit votes in that pass.
    // The interpreted formulation (64 aggregate passes re-hashing
    // strings) was 73 s/query at sf0.1.
    spread(docs)
      .select(
        col("doc_id"),
        call_function("simhash_bits", shingles(col("text")), lit(bits)).as("simhash_bits"))

  /** SimHash near-duplicate pairs: all (doc_a, doc_b) whose simhash
    * signatures differ in at most maxHamming of `bits` positions, with
    * the verified Hamming distance. Candidates come from the PIGEONHOLE
    * block decomposition, not all pairs: the signature is cut into
    * (maxHamming+1) contiguous blocks, and any pair within Hamming
    * maxHamming must agree EXACTLY on at least one block — so an
    * equi-join on (block, block-bits) is candidate-complete, unlike the
    * probabilistic LSH tables. Native hamming_bits then verifies, so
    * the only recall trade is the hot-bucket cap (same cap-don't-drop
    * policy and rationale as minhashNearDup — identical-doc spam
    * clusters stay represented by their bucketCap lowest ids).
    * At 100 TB the join shuffles (block, ≤bits-char key) pairs —
    * 9 short rows per doc at the defaults, never documents.
    */
  def simhashNearDup(
      docs: DataFrame,
      bits: Int = 64,
      maxHamming: Int = 8,
      bucketCap: Int = 1000): DataFrame = {
    val blocks = maxHamming + 1
    require(bits >= blocks, "need at least one signature bit per block")
    // guard empty shingle sets like minhashNearDup: every <n-token doc
    // gets the identical all-'1' empty-input signature, so without the
    // filter N unrelated short docs all "collide" at Hamming 0 AND form
    // a guaranteed hot bucket in every block
    val sigs = spread(docs)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(
        col("doc_id"),
        call_function("simhash_bits", col("sh"), lit(bits)).as("sig"))
    val keyed = sigs
      .select(col("doc_id"), col("sig"),
        explode(sliceBlocks(col("sig"), bits, blocks)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.blk").as("blk"), col("b.bkey").as("bkey"))
    val capped = capBuckets(keyed, Seq("blk", "bkey"), bucketCap)
    // verify INSIDE the join stage, dedup only survivors: natural-text
    // simhash bits are biased (blocks of all-1s dominate), so the 9
    // block joins emit ~35 candidates/doc at sf0.1 (871k pairs from 5k
    // docs, measured by tools.BucketProbe) — deduping THAT, with two
    // 64-char signatures per row, was the query's dominant shuffle.
    // hamming_bits is ~64 cheap ops in the same codegen stage as the
    // join output, the filter kills >99% of candidates where they are
    // born, and dropDuplicates then shuffles only true near-dup pairs.
    // Same result set: a pair's hamming is the same in every duplicate
    // copy, so filter-then-dedup ≡ dedup-then-filter.
    capped.as("x")
      .join(capped.as("y"), Seq("blk", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        call_function("hamming_bits", col("x.sig"), col("y.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Embedding-cosine near-duplicate pairs: vectors sharing ANY of the
    * numTables hyperplane-LSH buckets whose exact cosine clears the
    * threshold (scaled e6). Multi-table bucket keys like annTopKLsh;
    * candidates stay bucket-local, no all-pairs product.
    * A pair at angle θ is missed with probability
    * (1−(1−θ/π)^sigBits)^numTables — for the true near-dups this
    * targets (θ≈0) that is effectively zero even with one table, and
    * the extra tables extend useful recall into the moderate-θ band
    * (the same measured curve as annTopKLsh).
    */
  def embeddingNearDup(
      emb: DataFrame,
      simE6Threshold: Long,
      sigBits: Int = 8,
      numTables: Int = 8): DataFrame = {
    // Candidates travel as ID PAIRS: the bucket join shuffles short
    // (tbl, key, vec_id) rows — NOT numTables copies of the embedding —
    // and the vectors join back by id only after the pair set is
    // deduplicated (the minhashNearDup shape; r4 shipped the embedding
    // through every table row, L× the necessary shuffle bytes).
    // self-joined below — one evaluation of the hyperplane signature
    // projection instead of two (lazy checkpoint, PageRank discipline)
    val keys = withTableKeys(emb, sigBits, numTables)
      .select(col("tbl"), col("key"), col("vec_id"))
      .localCheckpoint(false)
    val cand = keys.select(col("tbl"), col("key"), col("vec_id").as("vec_a"))
      .join(keys.select(col("tbl"), col("key"), col("vec_id").as("vec_b")),
        Seq("tbl", "key"))
      .filter(col("vec_a") < col("vec_b"))
      // a pair colliding in several tables is one candidate, not L
      .dropDuplicates("vec_a", "vec_b")
    val v = emb
      .select(col("vec_id"), col("embedding"), sumSq(col("embedding")).as("n2"))
    val sim6 = round(lit(1e6) * dot(col("a_emb"), col("b_emb"))
      / (sqrt(col("a_n2")) * sqrt(col("b_n2")))).cast("long")
    cand
      .join(v.select(col("vec_id").as("vec_a"), col("embedding").as("a_emb"),
        col("n2").as("a_n2")), Seq("vec_a"))
      .join(v.select(col("vec_id").as("vec_b"), col("embedding").as("b_emb"),
        col("n2").as("b_n2")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), sim6.as("sim_e6"))
      .filter(col("sim_e6") >= simE6Threshold)
  }

  /** Shared hyperplane-signature projection: vec_id, embedding, sig,
    * norm². Signature bit j = sign(Σᵢ ±vᵢ) with deterministic ±1 per
    * (j,i) — computed by the native HyperplaneSig expression (the
    * interpreted zip_with fold was sigBits × dim boxed ops per row).
    */
  private def withSignature(emb: DataFrame, sigBits: Int): DataFrame =
    spread(emb)
      .select(col("vec_id"), col("embedding"),
        call_function("hyperplane_sig", col("embedding"), lit(sigBits)).as("sig"),
        sumSq(col("embedding")).as("n2"))

  /** Multi-table LSH keying: one (numTables·sigBits)-bit native
    * signature sliced into numTables independent sigBits-bit table
    * keys (signature bits are independent across index, so slicing =
    * independent tables). One row per (vector, table).
    */
  private def withTableKeys(emb: DataFrame, sigBits: Int, numTables: Int): DataFrame = {
    val e = withSignature(emb, sigBits * numTables)
    val tableKeys = transform(
      sequence(lit(0), lit(numTables - 1)),
      t => col("sig").substr(t * lit(sigBits) + lit(1), lit(sigBits)))
    e.select(col("vec_id"), col("embedding"), col("n2"),
      posexplode(tableKeys).as(Seq("tbl", "key")))
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to one of nlist cells; a query probes only its nprobe
    * nearest cells and ranks candidates by exact cosine. The classic
    * recall/latency dial: nprobe=nlist degenerates to exact search,
    * nprobe=1 scans ~1/nlist of the data. Centroids are trained with a
    * fixed seed (deterministic, task-retry safe) on a bounded sample —
    * NOT the full table: 10 MLlib iterations over every vector were
    * 1/3 of the whole r3 bench, and at 100 TB they are 10 full passes
    * plus a driver-side centroid reduction. Centroid quality only
    * moves recall at nprobe<nlist (the quantizer partitions space
    * either way; nprobe=nlist stays exact regardless), so a 20k-row
    * sample is as good as the table. The broadcast model then assigns
    * cells in one narrow map — the probe join shuffles only
    * (cell, query) pairs.
    */
  /** Sample-fit KMeans shared by ivfTopK and semanticDedup: seeded
    * (deterministic, task-retry safe), bounded sample — NOT the full
    * table (see ivfTopK scaladoc for the measured rationale). Input
    * must carry a `features` vector column.
    */
  private def fitKMeans(
      e: DataFrame,
      nlist: Int,
      trainFraction: Double,
      maxTrainRows: Int,
      maxIter: Int): org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    val sampled = e.select("features")
      .sample(withReplacement = false, trainFraction, seed = 42)
      .limit(maxTrainRows)
    // tiny inputs (tests, sf0.001) can sample below nlist points —
    // fall back to the full table there; the sample path is the one
    // that runs at scale
    val train =
      if (sampled.take(nlist).length < nlist) e.select("features") else sampled
    new KMeans().setK(nlist).setSeed(42).setMaxIter(maxIter).fit(train)
  }

  /** The IVF family's prepared frame: parallelism spread, MLlib
    * vector view for the quantizer, precomputed squared norm. */
  private def prepIvf(emb: DataFrame): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    spread(emb)
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features"),
        sumSq(col("embedding")).as("n2"))
  }

  /** ONE cell-assignment kernel for the whole IVF family — in-memory
    * query (ivfTopK), index build (buildIvfIndex) and index append
    * (appendToIvfIndex) all assign through this, so parity between a
    * freshly-built and an incrementally-appended index is structural,
    * not a numerics accident: the centroids are plain doubles
    * (parquet round-trips them losslessly), the distance is the same
    * centroidD2 expression, and ties break on the explicit cell id.
    * Map-only: the centroid table rides as a typedLit array into
    * whole-stage codegen — no shuffle, no broadcast join, exactly the
    * narrow-scan shape a 100 TB corpus assignment needs.
    */
  private def assignCells(e: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val scored = transform(typedLit(cents), c =>
      struct(
        centroidD2(col("embedding"), c.getField("_2")).as("d2"),
        c.getField("_1").as("cell")))
    e.withColumn("cell", array_sort(scored).getItem(0).getField("cell"))
  }

  private def centroidSeq(
      model: org.apache.spark.ml.clustering.KMeansModel): Seq[(Int, Seq[Double])] =
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq

  /** The IVF coarse quantizer fit, exposed for build-once callers:
    * a persisted index (buildIvfIndex) and any in-memory query that
    * must share ITS model (index-parity checks) fit here once instead
    * of refitting per call. Deterministic (seeded sample, seeded
    * init) — task-retry safe.
    */
  def fitIvfModel(
      emb: DataFrame,
      nlist: Int = 16,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      maxIter: Int = 5): org.apache.spark.ml.clustering.KMeansModel =
    fitKMeans(prepIvf(emb), nlist, trainFraction, maxTrainRows, maxIter)

  def ivfTopK(
      emb: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      // 5, not MLlib's customary 10-20: RecallProbe measured recall@10
      // IDENTICAL at maxIter ∈ {2,3,5,10} on sf0.01 AND sf0.1 (seeded
      // init; probing only needs the assignment structure, not
      // converged centroids) while the fit cost halves — another
      // "centroid quality barely moves nprobe recall" dividend.
      maxIter: Int = 5,
      model: Option[org.apache.spark.ml.clustering.KMeansModel] = None,
      // pinned coarse quantizer (cell, centroid) — the oracle-replayable
      // face: the inverted-file STRUCTURE (assignment, probing, ranking)
      // is identical whatever the quantizer, so a caller pinning
      // centroids the oracle can re-derive (e.g. the first nlist
      // vectors) gets a hash-checkable approximate search; quantizer
      // FIT quality is a recall matter (ivf_recall), not a structure
      // matter. None = fit the seeded sample KMeans.
      centroids: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    // no explicit cache: spark.ml KMeans persists its (sampled)
    // training input internally when the input is unpersisted and
    // releases it after fit, and everything downstream is one narrow
    // pass — a cache here leaked a copy per invocation (bench re-runs,
    // ivf_recall) and pinned the whole table in a long-lived session
    val e = prepIvf(emb)
    val centSeq = centroids.getOrElse(centroidSeq(model.getOrElse(
      fitKMeans(e, nlist, trainFraction, maxTrainRows, maxIter))))
    val assigned = assignCells(e, centSeq)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cell"))
    // queries probe their nprobe nearest cells (tiny: nQueries×nlist)
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = spark.createDataset(centSeq).toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("qn2"))
    rankTopK(assigned, probeSet(q, cents, nprobe), k)
  }

  /** Each query's nprobe nearest cells: queries × the (tiny,
    * broadcast, constant-size) centroid table — shared by the
    * in-memory path (ivfTopK) and the persisted-index path
    * (ivfTopKFromIndex) so parity between them is a statement about
    * the index round-trip, not about two probe implementations.
    * `queries` must carry (q_id, q_emb, qn2).
    */
  private def probeSet(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame =
    queries.crossJoin(broadcast(cents)) // nQueries × nlist rows — constant-size
      .withColumn("d2", centroidD2(col("q_emb"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("cell"))))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("qn2"), col("cell"))

  /** The shared IVF ranking stage: candidates come from ONE equi-join
    * on cell against the broadcast probe set, exact cosine ranks
    * inside the join, boundedTopK caps the shuffle at k·|queries|
    * rows.
    */
  private def rankTopK(candidates: DataFrame, qDist: DataFrame, k: Int): DataFrame = {
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("embedding"))
      / (sqrt(col("n2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      candidates.join(broadcast(qDist), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** Persist the IVF index — the production ANN posture is
    * build-once, query-many-later: the expensive parts (quantizer
    * fit, corpus assignment) are written as plain parquet tables an
    * INDEPENDENT session can reload without refitting. Layout:
    * `indexDir/centroids` (cell, centroid) and `indexDir/assignments`
    * (vec_id, embedding, n2) PARTITIONED BY cell — the partitioning
    * is the index structure: a query that probes nprobe cells opens
    * nprobe directories and never lists the rest.
    */
  def buildIvfIndex(
      emb: DataFrame,
      indexDir: String,
      model: org.apache.spark.ml.clustering.KMeansModel): Unit = {
    val centSeq = centroidSeq(model)
    val assigned = assignCells(prepIvf(emb), centSeq)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cell"))
    graft.sources.Sinks.writePartitioned(
      assigned, s"$indexDir/assignments", "cell")
    val spark = emb.sparkSession
    import spark.implicits._
    spark.createDataset(centSeq)
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Incremental maintenance: assign a NEW vector batch against the
    * EXISTING persisted centroids — no refit, no rewrite of the
    * standing assignments — and append it into the cell-partitioned
    * assignments table (cell is the partition key, so the append is a
    * dynamic-partition file add into the touched cell directories).
    * This is the daily-append posture the build-once index was
    * missing: at 100 TB adding 0.1% of new vectors costs one narrow
    * map over the delta plus bounded centroid IO, not a corpus-wide
    * rebuild. Assignment goes through the SAME assignCells kernel as
    * buildIvfIndex over the SAME (losslessly round-tripped) centroid
    * doubles, so build(base)+append(delta) and build(base∪delta)
    * produce identical assignment tables — the ivf_index_append
    * driver row states that parity through the cold query path.
    * Centroids are intentionally left as-fit: the quantizer is the
    * index's identity (queries probe by it), and ivfTopK's measured
    * "centroid quality barely moves nprobe recall" result is what
    * makes frozen centroids the right trade until a scheduled refit.
    */
  def appendToIvfIndex(newVecs: DataFrame, indexDir: String): Unit = {
    val spark = newVecs.sparkSession
    val centSeq = spark.read.parquet(s"$indexDir/centroids")
      .collect() // bounded: nlist rows
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList: Seq[Double]))
      .sortBy(_._1).toSeq
    assignCells(prepIvf(newVecs), centSeq)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/assignments")
  }

  /** Quantization-DISTORTION drift monitor — the radial complement to
    * `ivfDriftCheck`'s cell-histogram TV statistic. The two see
    * disjoint failure modes: a batch whose mass MOVES BETWEEN cells
    * trips the histogram while its distortion can stay flat, and a
    * batch that widens RADIALLY (same means, higher variance — a
    * noisier encoder, a precision regression) keeps the cell
    * histogram quiet while every vector lands farther from its
    * nearest centroid and recall@nprobe decays; run both on the
    * maintenance schedule. Statistic: mean squared d2 to the assigned
    * (nearest) centroid of a candidate batch vs the standing corpus's
    * own, against the SAME persisted centroids through the same
    * centroidD2 kernel. Concentration-of-distances does compress this
    * ratio as dimension grows (why the histogram monitor is the
    * primary), but a variance widening moves mean distortion
    * PROPORTIONALLY at any dimension — the regime this monitor owns.
    * The baseline needs no stored build-time figure: the assignments
    * table IS the build distribution, and its stored cell makes the
    * baseline pass join-free (the cell IS the argmin), so the monitor
    * retrofits onto every existing index. Map-only on both sides: the
    * centroid table rides as a plan literal (nlist×dim doubles), no
    * shuffle, no collect beyond the two 1-row averages. Returns
    * (baseMeanD2, batchMeanD2, ratio, refit = ratio > threshold). The
    * `ivf_distortion_drift` driver row pins both polarities.
    */
  def ivfDriftStats(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      batch: DataFrame,
      threshold: Double = 2.0): (Double, Double, Double, Boolean) = {
    val centSeq = spark.read.parquet(s"$indexDir/centroids")
      .collect() // bounded: nlist rows
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList: Seq[Double]))
      .sortBy(_._1).toSeq
    val centArr = typedLit(centSeq)
    // base: one narrow pass over (embedding, cell) — the stored cell
    // is the argmin, so distortion is a single centroidD2 per row
    val baseMean = spark.read.parquet(s"$indexDir/assignments")
      .select(col("embedding"), col("cell"))
      .withColumn("__c", filter(centArr, c => c.getField("_1") === col("cell")))
      .select(avg(centroidD2(col("embedding"), col("__c").getItem(0).getField("_2")))
        .as("d2"))
      .head().getDouble(0)
    // batch: argmin distortion (min d2 over the centroid literal)
    val batchMean = spread(batch)
      .select(avg(array_min(transform(centArr,
        c => centroidD2(col("embedding"), c.getField("_2"))))).as("d2"))
      .head().getDouble(0)
    val ratio = batchMean / math.max(baseMean, 1e-12)
    (baseMean, batchMean, ratio, ratio > threshold)
  }

  /** Cell-granular retraction core shared by removeFromIvfIndex and
    * removeFromIvfPqIndex: both index layouts partition their row
    * table BY CELL, so erasing keys rewrites exactly the cell
    * directories that hold a doomed row and never touches the rest —
    * the file-granular commitDelete discipline, with the cell dirs
    * playing the manifest's role. Steps: (1) one narrow (vec_id,
    * cell) scan semi-joined to the keys names the touched cells
    * (collect bounded by nlist); (2) the touched cells' survivors are
    * staged to a sibling tmp dir partitioned by cell; (3) each
    * touched live cell dir is dropped and the staged one renamed in —
    * a cell whose rows ALL died simply has no staged dir and
    * disappears. The swap is per-cell rename, not a transactional
    * commit: a crash mid-swap can leave some cells erased and others
    * not (re-run the same remove to converge — it is idempotent);
    * readers of an in-flight swap may see a cell vanish briefly.
    */
  private def removeFromCellTable(keys: DataFrame, tableDir: String): Unit = {
    val spark = keys.sparkSession
    val k = keys.select(col("vec_id")).distinct()
    val tbl = spark.read.parquet(tableDir)
    val touched = tbl.select(col("vec_id"), col("cell"))
      .join(k, Seq("vec_id"), "left_semi")
      .select("cell").distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val survivors = tbl
      .filter(col("cell").isin(touched.map(Int.box): _*))
      .join(k, Seq("vec_id"), "left_anti")
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      tableDir + ".del-" + java.util.UUID.randomUUID().toString)
    survivors.write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    touched.foreach(c =>
      f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/cell=$c"), true))
    f.listStatus(tmp).filter(_.getPath.getName.startsWith("cell="))
      .foreach(s => f.rename(s.getPath,
        new org.apache.hadoop.fs.Path(s"$tableDir/${s.getPath.getName}")))
    f.delete(tmp, true)
  }

  /** Small-file compaction for the cell-partitioned index tables —
    * the OPTIMIZE half of the append lifecycle: every
    * appendToIvfIndex/appendToIvfPqIndex adds one file per touched
    * cell, so a daily-append index accretes splinter files and the
    * cold query's nprobe directory opens degrade into
    * splinters-per-cell footer reads. Only cells holding MORE than
    * one parquet file rewrite (each coalesced through the staged
    * rename-aside swap removeFromCellTable uses); single-file cells
    * are untouched, and the quantizer — the index's identity — is
    * never touched, so the compacted index is row-identical to the
    * uncompacted one (the driver row states that through cold-query
    * parity). Same non-transactional per-cell swap caveat as the
    * retraction path: re-run to converge after a crash. Returns the
    * number of cells rewritten. */
  private def compactCellTable(
      spark: org.apache.spark.sql.SparkSession, tableDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val multi = f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .filter(d => f.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > 1)
      .map(_.getPath.getName.stripPrefix("cell=").toInt).sorted
    if (multi.isEmpty) return 0
    val rows = spark.read.parquet(tableDir)
      .filter(col("cell").isin(multi.map(Int.box): _*))
      // one partition per touched cell, then partitionBy splits by
      // cell — at most one file per cell lands in the staging dir
      .repartition(multi.size, col("cell"))
    val tmp = new org.apache.hadoop.fs.Path(
      tableDir + ".compact-" + java.util.UUID.randomUUID().toString)
    rows.write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    multi.foreach(c =>
      f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/cell=$c"), true))
    f.listStatus(tmp).filter(_.getPath.getName.startsWith("cell="))
      .foreach(s => f.rename(s.getPath,
        new org.apache.hadoop.fs.Path(s"$tableDir/${s.getPath.getName}")))
    f.delete(tmp, true)
    multi.size
  }

  /** Compact the IVF assignments table (see compactCellTable). */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Int =
    compactCellTable(spark, s"$indexDir/assignments")

  /** Compact the IVF-PQ residual-code table (see compactCellTable). */
  def compactIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Int =
    compactCellTable(spark, s"$indexDir/codes")

  /** Retraction from the persisted IVF index: erase `keys` (single
    * col `vec_id`) from the cell-partitioned assignments — only the
    * cell directories holding a doomed vector are rewritten, the
    * centroids (the index's identity) are untouched, so a cold query
    * after remove(delta) is row-identical to a rebuild at the same
    * model that never saw delta (the ivf_index_delete driver row
    * states that parity). */
  def removeFromIvfIndex(keys: DataFrame, indexDir: String): Unit =
    removeFromCellTable(keys, s"$indexDir/assignments")

  /** Retraction from the composed IVF-PQ index: same cell-granular
    * erase over the residual-code table; centroids and codebooks
    * stay frozen. */
  def removeFromIvfPqIndex(keys: DataFrame, indexDir: String): Unit =
    removeFromCellTable(keys, s"$indexDir/codes")

  /** Query a persisted IVF index COLD: everything the query needs —
    * centroids, assignments, precomputed norms — comes off the index
    * tables; no model object, no refit. The production shape passes
    * `queries` (q_id, q_emb) directly — query vectors arrive FROM THE
    * CALLER (a request batch, a chunk of new documents), and the
    * assignments table is never scanned to find them. When `queries`
    * is None the fixture shape kicks in: the first nQueries corpus
    * vectors are looked up from the assignments table (a bounded
    * pushed-filter scan — fixture convenience, not the posture).
    * Either way the probe list (≤ |queries|·nprobe cells) is pushed
    * as a STATIC partition filter so the candidate scan opens only
    * the probed cell directories (PartitionFilters — the driver rows
    * assert it).
    */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      nQueries: Int = 5,
      k: Int = 10,
      nprobe: Int = 4,
      queries: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val assigned = spark.read.parquet(s"$indexDir/assignments")
    val q = queries match {
      case Some(qs) =>
        qs.select(col("q_id"), col("q_emb"), sumSq(col("q_emb")).as("qn2"))
      case None =>
        val qRows = assigned.filter(col("vec_id") < nQueries)
          .select(col("vec_id"), col("embedding"), col("n2"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        spark.createDataset(qRows.toSeq).toDF("q_id", "q_emb", "qn2")
    }
    val qDist = probeSet(q, cents, nprobe)
    val probeCells = qDist.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    rankTopK(
      assigned.filter(col("cell").isin(probeCells.map(Int.box): _*)),
      qDist, k)
  }

  /** Deterministic hash-projection text embedding — the zero-egress
    * stand-in for a learned embedding model at the chunk→embed seam
    * (chunkDocs' scaladoc points here): dimension j of a chunk is the
    * sum over its whitespace tokens of a ±1 sign drawn from
    * md5(token ":" j) (first hex digit < '8' ⇒ +1). Signs are i.i.d.
    * uniform per (token, j), so this IS a random projection of the
    * token-count vector — near-duplicate chunks land at high cosine —
    * while staying exactly replayable by the DuckDB oracle (md5 and
    * integer sums, no engine-specific hashing; the values are small
    * integers, exact in float). Map-only, no shuffle; a real model
    * would slot in via the Multimodal mapInPandas batch seam with the
    * same (id, vector) contract.
    */
  def hashEmbedding(chunkText: Column, dim: Int): Column =
    // native HashProjEmbed, bit-identical to the HOF formulation
    //   transform(sequence(0, dim-1), j => aggregate(split(text, " "),
    //     0, (acc, t) => acc ± 1 by md5(t ":" j) first-hex-digit))
    // which evaluated dim×|tokens| md5s through interpreted
    // per-element expression trees — 8.9 s of the sf0.1 chunk_embed
    // row collapsed to the one fused pass (equality spec-pinned, and
    // the DuckDB oracle still replays the md5 formula verbatim)
    call_function("hash_proj_embed", chunkText, lit(dim))

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, look for
    * near-duplicate pairs only WITHIN a cluster, and drop every vector
    * that has a sufficiently-similar neighbor of smaller id. The
    * cluster step is what makes it a 100 TB operator — candidates are
    * bucket-local (cell equi-join), never all-pairs.
    *
    * Differences from the paper worth naming: assignment is
    * multi-probe (each vector joins its `nprobe` nearest cells, which
    * REDUCES — does not eliminate — boundary misses: a pair whose
    * nprobe probe sets are disjoint, both vectors near different cell
    * boundaries, is silently missed, the approximation SemDeDup itself
    * accepts; recall rises with nprobe at nprobe× candidate cost, and
    * the driver row's all-pairs oracle proves completeness for the
    * planted fixture geometry, not in general), and the drop rule is
    * "has a similar smaller-id
    * neighbor" rather than "far from centroid" — deterministic,
    * order-free, and exactly replayable by the all-pairs oracle.
    * Centroid fit is the shared seeded sample fit (fitKMeans);
    * nprobe-cell assignment is MAP-ONLY: centroids ride into the plan
    * as a literal (nlist×dim doubles — tiny), each vector scores all
    * cells and explodes its nprobe best, no shuffle until the cell
    * join. Exact cosine verifies inside the join stage (same
    * filter-where-born rationale as simhashNearDup).
    */
  def semanticDedup(
      emb: DataFrame,
      simE6Threshold: Long = 850000L,
      nlist: Int = 16,
      nprobe: Int = 2,
      trainFraction: Double = 0.1,
      maxTrainRows: Int = 20000,
      maxIter: Int = 5): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    // lazy checkpoint: e feeds the KMeans fit (an eager ML job), the
    // probe keying AND the final anti-join — three re-derivations of
    // the caller's embedding lineage without the cut (r16 plan dump:
    // 20 parquet scans for the driver row)
    val e = spread(emb)
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features"),
        sumSq(col("embedding")).as("n2"))
      .localCheckpoint(false)
    val model = fitKMeans(e, nlist, trainFraction, maxTrainRows, maxIter)
    val cents: Seq[Seq[Double]] = model.clusterCenters.map(_.toArray.toSeq).toSeq
    val d2s = transform(typedLit(cents), c => centroidD2(col("embedding"), c))
    val cells = slice(array_sort(transform(d2s, (d, i) =>
      struct(d.as("d2"), i.as("cell")))), 1, nprobe)
    val keyed = e
      .select(col("vec_id"), col("embedding"), col("n2"),
        explode(cells).as("c"))
      .select(col("vec_id"), col("embedding"), col("n2"),
        col("c.cell").as("cell"))
      // self-joined below: one materialization of the nprobe-way
      // keying instead of two
      .localCheckpoint(false)
    val sim6 = round(lit(1e6) * dot(col("x.embedding"), col("y.embedding"))
      / (sqrt(col("x.n2")) * sqrt(col("y.n2")))).cast("long")
    val dropped = keyed.as("x").join(keyed.as("y"), Seq("cell"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("y.vec_id").as("vec_id"), sim6.as("sim_e6"))
      .filter(col("sim_e6") >= simE6Threshold)
      .select("vec_id").distinct()
    e.select(col("vec_id"))
      .join(dropped, Seq("vec_id"), "left_anti")
  }

  /** The ANN scale path: MULTI-TABLE random-hyperplane LSH over the
    * embedding — signature bit j = sign(Σᵢ hᵢⱼ·vᵢ) with hᵢⱼ ∈ {−1,+1}
    * derived deterministically from xxhash64(j·4096+i). One
    * (numTables·sigBits)-bit signature is computed natively per vector
    * and sliced into numTables independent sigBits-bit table keys
    * (bits are independent across j, so slicing = independent tables).
    * Vectors sharing ANY table's bucket are candidates; exact cosine
    * then ranks the deduplicated candidate set.
    *
    * Single-table LSH at these dimensions is useless: the chance a
    * true top-k neighbor lands in the query's one bucket is
    * (1−θ/π)^b, which for the θ≈60-75° typical of real top-k at
    * d=64 is ~1% at b=8 — measured recall@10 was literally 0. With
    * L tables of b bits the miss probability compounds to
    * (1−(1−θ/π)^b)^L, and the candidate set stays ~L·N/2^b per query.
    * The recall/candidate-volume dial is (b, L): the defaults (5, 16)
    * measured 68-80% recall@10 (per-query min 50%) on the synthetic
    * corpus at sf0.01/sf0.1 (graft.tools.RecallProbe) at ~L/2^b = half
    * the table as candidates — on real clustered embeddings the same
    * settings prune far harder because true neighbors sit at much
    * smaller angles. The exact cosineTopK above is the correctness
    * baseline and `recallAtK` floor-asserts the trade in the
    * ann_recall driver row.
    * At 100 TB the bucket join replaces the broadcast pass: shuffle on
    * short (table, key) pairs, candidates stay bucket-local.
    */
  def annTopKLsh(
      emb: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      sigBits: Int = 5,
      numTables: Int = 16): DataFrame = {
    val tables = withTableKeys(emb, sigBits, numTables)
    val q = tables.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("tbl"), col("key"), col("n2").as("qn2"))
    val sim6 = round(lit(1e6) * dot(col("q_emb"), col("embedding"))
      / (sqrt(col("n2")) * sqrt(col("qn2")))).cast("long")
    boundedTopK(
      tables.join(q, Seq("tbl", "key"))
        .filter(col("vec_id") =!= col("q_id"))
        // a pair colliding in several tables is one candidate, not L
        .dropDuplicates("q_id", "vec_id")
        .select(col("q_id"), col("vec_id").as("neighbor_id"), sim6.as("sim_e6")),
      k)
  }

  /** Recall@k scoreboard: which queries' approximate top-k contains at
    * least floorPct% of the exact top-k. Emitted as one boolean per
    * query so the driver's DuckDB oracle can assert the floor without
    * reproducing the engine-specific hashing: the oracle just states
    * `true` for every query id — a recall regression flips rows false
    * and the row goes red.
    */
  /** Pair-coverage floor scoreboard (the near-dup analog of recallAtK):
    * one (metric, floor_met) row stating whether `approx` contains at
    * least floorPct% of `exact`'s (doc_a, doc_b) pairs. The driver's
    * oracle just states `true` for the metric — a coverage regression
    * flips the Spark side false and the row goes red. An empty exact
    * set trivially meets the floor (0 ≥ 0).
    */
  def nearDupFloor(
      exact: DataFrame, approx: DataFrame, metric: String, floorPct: Int): DataFrame =
    // hits and total from ONE pass over `exact` (a semi-join + separate
    // total count would run the full exact near-dup pipeline — the most
    // expensive constituent — twice per evaluation); approx pair sets
    // are distinct by construction, the distinct() is a cheap guard so
    // a duplicated approx pair can never double-count a hit
    exact
      .join(
        approx.select(col("doc_a"), col("doc_b")).distinct()
          .withColumn("_hit", lit(1)),
        Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("total"), count(col("_hit")).as("hits"))
      .select(
        lit(metric).as("metric"),
        (col("hits") * 100 >= col("total") * floorPct).as("floor_met"))

  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int, floorPct: Int): DataFrame = {
    val qs = exact.select("q_id").distinct()
    val hits = exact
      .join(approx, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    qs.join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        (coalesce(col("hits"), lit(0L)) * 100 >= lit(floorPct.toLong * k)).as("floor_met"))
      .orderBy("q_id")
  }
}
