package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Quality checks for the approximate similarity ops (the exact ones
  * are oracle-checked by the driver): LSH recall on the planted
  * near-dup pairs, SimHash Hamming separation, ANN subset-of-exact.
  */
class SimilaritySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("semanticDedup: exact twins drop to min id, distinct vectors all survive") {
    import spark.implicits._
    // three well-separated directions + exact copies of two of them;
    // nlist=2 keeps the fit sane at 5 vectors
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (11L, Array(1f, 0f, 0f, 0f)),
      (12L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    // sorted here: the operator is sort-free by convention (ORDER BY
    // lives at the SparkEntry edge)
    val got = Similarity.semanticDedup(vecs, nlist = 2)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 2L, 3L))
  }

  test("persisted IVF index reproduces the in-memory path exactly") {
    val emb = Tables.embeddings(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val model = Similarity.fitIvfModel(emb, nlist = 8)
    Similarity.buildIvfIndex(emb, s"$base/idx", model)
    val inMem = Similarity.ivfTopK(emb, nlist = 8, model = Some(model))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromIdx = Similarity.ivfTopKFromIndex(spark, s"$base/idx")
    // the candidate scan must open only the probed cell directories
    fromIdx.collect()
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe list must land in PartitionFilters:\n$plan")
    val got = fromIdx.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == inMem)
  }

  test("minhash candidates reproduce the exact all-pairs near-dups") {
    val docs = Tables.documents(spark, dir).cache()
    val got = Similarity.minhashNearDup(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs reference (crossJoin is fine at test scale)
    val sh = docs.select(col("doc_id"), Similarity.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val want = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("i"),
        size(array_union(col("a.sh"), col("b.sh"))).as("u"))
      .filter(col("i") * 2 >= col("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty, "testdata should contain planted near-dups")
  }

  test("minhash index: build+append+delta-query equals brute-force cross pairs") {
    val docs = Tables.documents(spark, dir).cache()
    val idx = s"${java.nio.file.Files.createTempDirectory("mh_idx_spec")}/idx"
    Similarity.buildMinhashIndex(docs.filter(col("doc_id") % 3 === 0), idx)
    Similarity.appendToMinhashIndex(docs.filter(col("doc_id") % 3 === 2), idx)
    val delta = docs.filter(col("doc_id") % 3 === 1)
    val got = Similarity.minhashNearDupFromIndex(delta, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val sh = docs.select(col("doc_id"), Similarity.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val want = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") % 3 =!= 1 && col("b.doc_id") % 3 === 1)
      .select(
        col("a.doc_id"), col("b.doc_id"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("i"),
        size(array_union(col("a.sh"), col("b.sh"))).as("u"))
      .filter(col("i") * 2 >= col("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got === want)
  }

  test("minhash index: APPENDED docs are exactly as discoverable as built ones") {
    import spark.implicits._
    val baseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val baseB = "red orange yellow green blue indigo violet cyan magenta " +
      "teal maroon olive navy coral amber jade ruby pearl onyx slate"
    // slice A (built): doc 3 + unrelated doc 6; slice B (appended):
    // doc 8 — a twin of delta doc 10; delta: doc 10 (pairs with the
    // APPENDED 8), doc 7 (pairs with the BUILT 3), doc 1 (unique)
    val corpusA = Seq((3L, baseA), (6L, "one two three four five six seven eight nine ten"))
    val corpusB = Seq((8L, baseB))
    val delta = Seq((10L, baseB.replace("slate", "quartz")),
      (7L, baseA.replace("upsilon", "psi")),
      (1L, "unrelated words only here nothing shared at all"))
    val idx = s"${java.nio.file.Files.createTempDirectory("mh_idx_app")}/idx"
    Similarity.buildMinhashIndex(corpusA.toDF("doc_id", "text"), idx)
    Similarity.appendToMinhashIndex(corpusB.toDF("doc_id", "text"), idx)
    val got = Similarity.minhashNearDupFromIndex(delta.toDF("doc_id", "text"), idx)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 7L), (8L, 10L)),
      "one pair against the built slice, one against the appended slice")
  }

  test("pqEncode: codes bounded by ncodes, deterministic across runs") {
    val e = Tables.embeddings(spark, dir)
    val codes = Similarity.pqEncode(e, numSub = 16, ncodes = 16)
    assert(codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16).count() == 0)
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1).toList
    assert(snap(codes) == snap(Similarity.pqEncode(e, numSub = 16, ncodes = 16)))
  }

  test("pq_assign kernel: argmin codes with ties to the lower code, recon = chosen centroids") {
    import spark.implicits._
    // codebook [2 subspaces][3 codes][2 dims]; vector (1,0, 3,4):
    // subspace 0 ties codes 0 and 2 exactly (same centroid) → 0 wins;
    // subspace 1's nearest is code 1
    val cbs = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0)),
      Seq(Seq(0.0, 0.0), Seq(3.0, 4.0), Seq(-3.0, -4.0)))
    val row = Seq((1L, Array(1f, 0f, 3f, 4f))).toDF("vec_id", "embedding")
      .select(call_function("pq_assign", col("embedding"), typedLit(cbs)).as("a"))
      .select(col("a.codes"), col("a.recon")).head()
    assert(row.getSeq[Int](0) == Seq(0, 1))
    assert(row.getSeq[Float](1) == Seq(1f, 0f, 3f, 4f))
  }

  test("pqTopK: exact-recovery regime (one code per distinct subvector) equals exact top-k") {
    import spark.implicits._
    // 8 well-separated vectors; with ncodes = n the per-subspace
    // k-means can place a centroid on every subvector, so the
    // reconstruction is exact and ADC ranking == float cosine ranking
    val vecs = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(4)(d =>
        (if (d == i % 4) 10f + i else 1f + 0.1f * i * d)))
    }.toDF("vec_id", "embedding")
    val exact = Similarity.topKOrder(Similarity.cosineTopK(vecs, nQueries = 2, k = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pq = Similarity.topKOrder(Similarity.pqTopK(vecs, nQueries = 2, k = 3,
      numSub = 2, ncodes = 8, maxIter = 20))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pq == exact)
  }

  test("persisted PQ index reproduces the in-JVM ADC ranking exactly") {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("pq_idx_spec").toString
    Similarity.buildPqIndex(e, idx)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cold = Similarity.topKOrder(
      Similarity.pqTopKFromIndex(spark, idx, q, k = 5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val warm = Similarity.topKOrder(Similarity.pqTopK(e, nQueries = 3, k = 5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(cold == warm)
    // the code table IS the compression: only ids + small int codes
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.columns.toSet == Set("vec_id", "codes"))
    assert(codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 32).count() == 0)
  }

  test("IVF-PQ: full probe at exact-recovery rate equals exact cosine ranking") {
    import spark.implicits._
    val vecs = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(4)(d =>
        (if (d == i % 4) 10f + i else 1f + 0.1f * i * d)))
    }.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_spec").toString
    // nlist 2 cells, one code per distinct residual: probing BOTH
    // cells removes the pruning, exact residual recovery removes the
    // rounding — the composed index must reproduce exact ranking
    Similarity.buildIvfPqIndex(vecs, idx, nlist = 2, numSub = 2, ncodes = 8)
    val q = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val got = Similarity.topKOrder(
      Similarity.ivfPqTopKFromIndex(spark, idx, q, k = 3, nprobe = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Similarity.topKOrder(Similarity.cosineTopK(vecs, nQueries = 2, k = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("mmrRerank: a near-duplicate of the first pick is deferred behind diverse results") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),      // the query
      (1L, Seq(0.99f, 0.1f, 0f, 0f)), // closest to q
      (2L, Seq(0.99f, 0.1f, 0f, 0f)), // exact duplicate of 1
      (3L, Seq(0.7f, 0.7f, 0f, 0f)),  // diverse
      (4L, Seq(0.6f, 0f, 0.8f, 0f)))  // diverse
      .toDF("vec_id", "embedding")
    val topk = Similarity.cosineTopK(emb, nQueries = 1, k = 4)
    val picks = Similarity.mmrRerank(topk, emb, k = 3, lambdaTenths = 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(Set(1L, 2L).contains(picks.head), s"rank 1 must be the most relevant: $picks")
    assert(!Set(1L, 2L).contains(picks(1)),
      s"the duplicate of the first pick must rank behind the diverse candidates: $picks")
    // plain relevance order WOULD put the duplicate second — that's
    // exactly what MMR exists to prevent
  }

  test("hash_proj_embed equals the interpreted md5 HOF formula bit for bit") {
    import spark.implicits._
    // edge shapes the split(-1) contract pins: empty string (one ""
    // token), interior double space, trailing space
    val texts = Seq("alpha beta gamma", "", "a  b ", "single",
      "x y z w v u t s r q").toDF("t")
    val hof = transform(sequence(lit(0), lit(7)), j =>
      aggregate(split(col("t"), " "), lit(0), (acc, tk) => acc + when(
        ascii(substring(md5(concat(tk, lit(":"), j.cast("string"))), 1, 1)) < 56,
        1).otherwise(-1)).cast("float"))
    val rows = texts.select(col("t"),
      call_function("hash_proj_embed", col("t"), lit(8)).as("native"),
      hof.as("hofv")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](1) === r.getSeq[Float](2), s"text='${r.getString(0)}'")
    }
  }

  test("jaccardNearDup: prefix filtering is candidate-complete (equals all-pairs)") {
    val docs = Tables.documents(spark, dir).cache()
    val sh = docs.select(col("doc_id"), Similarity.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    def bruteForce(tNum: Int, tDen: Int): Set[(Long, Long, Int, Int)] =
      sh.as("a").crossJoin(sh.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id"), col("b.doc_id"),
          size(array_intersect(col("a.sh"), col("b.sh"))).as("i"),
          size(array_union(col("a.sh"), col("b.sh"))).as("u"))
        .filter(col("i") * tDen >= col("u") * tNum)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    // the driver threshold AND a looser one: completeness must not
    // depend on the prefix length that happens to fall out of t=4/5
    for ((tn, td) <- Seq((4, 5), (1, 2))) {
      val got = Similarity.jaccardNearDup(docs, tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      assert(got === bruteForce(tn, td), s"threshold $tn/$td")
      assert(got.nonEmpty, "testdata should contain planted near-dups")
    }
  }

  test("crossCorpusDedup: survivors equal brute-force cross-Jaccard anti-join") {
    import spark.implicits._
    val d = Tables.documents(spark, dir).cache()
    val held = d.filter(col("doc_id") % 37 === 0)
    val corpus = d.filter(col("doc_id") % 37 =!= 0)
    val sh = d.select(col("doc_id"), Similarity.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val bad = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") % 37 =!= 0 && col("b.doc_id") % 37 === 0)
      .filter(
        size(array_intersect(col("a.sh"), col("b.sh"))) * 2 >=
          size(array_union(col("a.sh"), col("b.sh"))))
      .select(col("a.doc_id")).as[Long].collect().toSet
    assert(bad.nonEmpty, "testdata should contaminate across the split")
    val want = corpus.select("doc_id").as[Long].collect().toSet -- bad
    val got = Similarity.crossCorpusDedup(corpus, held)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("crossCorpusDedup: copies and light edits drop, unrelated and shingle-less survive") {
    import spark.implicits._
    val held = Seq((1000L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // exact copy → drop
      (2L, "alpha beta gamma delta epsilon eta"), // light edit, J=3/5 → drop
      (3L, "completely different words entirely here now"), // survive
      (4L, "hi there")) // < 3 tokens, no shingles → survive
      .toDF("doc_id", "text")
    val got = Similarity.crossCorpusDedup(corpus, held)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L, 4L))
  }

  test("containmentNearDup: candidate-complete (equals all directed pairs)") {
    val docs = Tables.documents(spark, dir).cache()
    val sh = docs.select(col("doc_id"), Similarity.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    def bruteForce(tNum: Int, tDen: Int): Set[(Long, Long, Int, Int)] =
      sh.as("a").crossJoin(sh.as("b"))
        .filter(col("a.doc_id") =!= col("b.doc_id"))
        .select(
          col("a.doc_id"), col("b.doc_id"),
          size(array_intersect(col("a.sh"), col("b.sh"))).as("i"),
          size(col("a.sh")).as("na"))
        .filter(col("i") * tDen >= col("na") * tNum)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    for ((tn, td) <- Seq((4, 5), (1, 2))) {
      val got = Similarity.containmentNearDup(docs, tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      assert(got === bruteForce(tn, td), s"threshold $tn/$td")
      assert(got.nonEmpty, "testdata should contain planted near-dups")
    }
  }

  test("containmentNearDup: a quote inside a long doc is caught one-way") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val long = s"unrelated opening words flow here $quote and then much " +
      "more trailing content continues onward with entirely different material"
    val docs = Seq((1L, quote), (2L, long), (3L, "nothing shared at all here"))
      .toDF("doc_id", "text")
    val got = Similarity.containmentNearDup(docs, 4, 5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all of doc 1's shingles appear in doc 2; doc 2 is NOT contained in 1
    assert(got === Set((1L, 2L)))
  }

  test("jaccardNearDup: t=1 finds exactly the identical shingle sets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // = doc 1
      (3L, "alpha beta gamma epsilon"), // 2 of 2+2 shingles shared with 1: J=1/3
      (4L, "zeta eta theta iota")).toDF("doc_id", "text")
    val got = Similarity.jaccardNearDup(docs, 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("minhash hot buckets are CAPPED, not dropped: spam clusters still pair") {
    import spark.implicits._
    // 30 identical docs: hot in ALL bands — the old whole-bucket drop
    // yielded zero pairs for exactly the most-duplicated content
    val spam = (1L to 30L).map(i => (i, "the same spam text repeated verbatim here"))
    val docs = spam.toDF("doc_id", "text")
    val capped = Similarity.minhashNearDup(docs, bucketCap = 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every band keeps the same 10 lowest ids, so exactly C(10,2) pairs
    val expected = (for {
      a <- 1L to 10L; b <- (a + 1) to 10L
    } yield (a, b)).toSet
    assert(capped === expected,
      "pairs among the kept lowest-id docs must survive the cap")
    // a cap above the cluster size is exhaustive
    val full = Similarity.minhashNearDup(docs, bucketCap = 1000)
      .count()
    assert(full === 30L * 29L / 2)
  }

  test("simhash: near-dup pairs are Hamming-close, random pairs are not") {
    val docs = Tables.documents(spark, dir).cache()
    val sig = Similarity.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val nearDups = Similarity.minhashNearDup(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val dupDist = nearDups.map { case (a, b) => hamming(sig(a), sig(b)) }
    val ids = sig.keys.toArray.sorted
    val randomDist = ids.take(20).flatMap(a => ids.takeRight(20).map(b => (a, b)))
      .filter { case (a, b) => a < b && !nearDups.contains((a, b)) }
      .map { case (a, b) => hamming(sig(a), sig(b)) }
    // near-dups: almost identical signatures; random word-salad pairs
    // share vocabulary so the gap is modest but must be strict
    assert(dupDist.max < randomDist.min,
      s"dup max ${dupDist.max} should be < random min ${randomDist.min}")
  }

  test("simhashNearDup: pigeonhole candidates are COMPLETE for the Hamming radius") {
    val docs = Tables.documents(spark, dir).cache()
    val got = Similarity.simhashNearDup(docs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference over the same signatures: EVERY pair within
    // the radius must surface — the block decomposition is exhaustive
    // by pigeonhole, not probabilistic like the LSH tables. Shingle-less
    // docs are out of scope (the operator guards them; their empty-input
    // signatures are all identical, not similar).
    val sig = Similarity.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val eligible = docs
      .select(col("doc_id"), Similarity.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .collect().map(_.getLong(0)).toSet
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val ids = sig.keys.toArray.filter(eligible).sorted
    val want = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      h = hamming(sig(ids(i)), sig(ids(j))) if h <= 8
    } yield (ids(i), ids(j), h)).toSet
    assert(got === want)
    assert(want.nonEmpty, "testdata should contain Hamming-close pairs")
  }

  test("simhashNearDup: hot buckets capped, not dropped — spam still pairs") {
    import spark.implicits._
    val spam = (1L to 30L).map(i => (i, "the same spam text repeated verbatim here"))
    val docs = spam.toDF("doc_id", "text")
    val capped = Similarity.simhashNearDup(docs, bucketCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for { a <- 1L to 10L; b <- (a + 1) to 10L } yield (a, b)).toSet
    assert(capped === expected)
  }

  test("simhashNearDup: shingle-less short docs never pair") {
    import spark.implicits._
    // <3-token docs have EMPTY shingle sets; their all-'1' empty-input
    // signatures are identical, and without the guard they'd all pair
    // at Hamming 0 and form a maximal hot bucket in every block
    val shorties = Seq((1L, "hi"), (2L, "yo"), (3L, "ok then")).toDF("doc_id", "text")
    assert(Similarity.simhashNearDup(shorties).count() === 0)
  }

  test("ivfTopKFromIndex: caller-supplied queries equal the fixture lookup") {
    val emb = Tables.embeddings(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_q_spec").toString
    val model = Similarity.fitIvfModel(emb, nlist = 8)
    Similarity.buildIvfIndex(emb, s"$root/idx", model)
    val legacy = Similarity.ivfTopKFromIndex(spark, s"$root/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val param = Similarity.ivfTopKFromIndex(spark, s"$root/idx", queries = Some(qs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(param == legacy,
      "the parameterized production path must reproduce the fixture lookup")
  }

  test("appendToIvfIndex equals the full rebuild at the same quantizer") {
    val emb = Tables.embeddings(spark, dir).cache()
    val base = emb.filter(col("vec_id") % 5 =!= 3)
    val delta = emb.filter(col("vec_id") % 5 === 3)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_append_spec").toString
    val model = Similarity.fitIvfModel(base, nlist = 8)
    Similarity.buildIvfIndex(base, s"$root/app", model)
    Similarity.appendToIvfIndex(delta, s"$root/app")
    Similarity.buildIvfIndex(emb, s"$root/full", model)
    // assignment tables identical row-for-row (the structural claim:
    // one assignCells kernel over round-tripped centroid doubles)
    def asg(p: String) = spark.read.parquet(s"$p/assignments")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val a = asg(s"$root/app"); val b = asg(s"$root/full")
    assert(a == b, s"appended vs rebuilt assignments differ: ${a.diff(b)} / ${b.diff(a)}")
    assert(a.map(_._1) == emb.select("vec_id").collect().map(_.getLong(0)).toSet,
      "append must cover every vector exactly once")
    // and the cold queries agree
    def cold(p: String) = Similarity.ivfTopKFromIndex(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cold(s"$root/app") == cold(s"$root/full"))
  }

  test("removeFromIvfIndex: cell-granular erase equals the never-saw-them rebuild") {
    val emb = Tables.embeddings(spark, dir).cache()
    val doomed = Seq(10L, 11L, 12L)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_del_spec").toString
    val model = Similarity.fitIvfModel(emb, nlist = 8)
    Similarity.buildIvfIndex(emb, s"$root/del", model)
    // which cells hold a doomed vector (they get rewritten; the rest must not)
    import spark.implicits._
    val doomedCells = spark.read.parquet(s"$root/del/assignments")
      .filter(col("vec_id").isin(doomed.map(Long.box): _*))
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    def listing(): Map[String, Seq[(String, Long)]] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/del/assignments")
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(p).filter(_.getPath.getName.startsWith("cell="))
        .map(d => d.getPath.getName ->
          f.listStatus(d.getPath).map(x => (x.getPath.getName, x.getLen))
            .sortBy(_._1).toSeq).toMap
    }
    val before = listing()
    Similarity.removeFromIvfIndex(doomed.toDF("vec_id"), s"$root/del")
    val after = listing()
    val untouched = before.keySet -- doomedCells.map(c => s"cell=$c")
    assert(untouched.nonEmpty, "fixture must leave some cells untouched")
    untouched.foreach(c => assert(after.get(c).contains(before(c)),
      s"untouched cell $c must keep its files verbatim"))
    Similarity.buildIvfIndex(
      emb.filter(!col("vec_id").isin(doomed.map(Long.box): _*)), s"$root/full", model)
    def asg(p: String) = spark.read.parquet(s"$p/assignments")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(asg(s"$root/del") == asg(s"$root/full"),
      "post-delete assignments must equal the rebuild's")
    // idempotent: removing the same keys again is a no-op
    Similarity.removeFromIvfIndex(doomed.toDF("vec_id"), s"$root/del")
    assert(asg(s"$root/del") == asg(s"$root/full"))
  }

  test("removeFromCellTable: a fully-emptied cell DISAPPEARS (no stale rows, no litter)") {
    import spark.implicits._
    // two tight clusters; nlist=2 puts each in its own cell
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0.1f, 0.9f, 0f))
    ).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_empty_spec").toString
    val model = Similarity.fitIvfModel(vecs, nlist = 2)
    Similarity.buildIvfIndex(vecs, s"$root/idx", model)
    val cellOf1 = spark.read.parquet(s"$root/idx/assignments")
      .filter(col("vec_id") === 1L).select("cell").head().getInt(0)
    val doomed = spark.read.parquet(s"$root/idx/assignments")
      .filter(col("cell") === cellOf1).select("vec_id")
    Similarity.removeFromIvfIndex(doomed, s"$root/idx")
    val left = spark.read.parquet(s"$root/idx/assignments")
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(left.forall(_._2 != cellOf1), s"emptied cell must hold no rows: ${left.toSeq}")
    assert(left.nonEmpty, "the other cell must survive")
    val f = new org.apache.hadoop.fs.Path(s"$root/idx/assignments")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      s"$root/idx/assignments/cell=$cellOf1")),
      "the emptied cell directory itself must be gone")
    // no staging litter
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(s"$root/idx")).exists(
      _.getPath.getName.contains(".del-")), "staged tmp dirs must be cleaned")
  }

  test("removeFromPqIndex and removeFromIvfPqIndex equal rebuilds at frozen quantizers") {
    val emb = Tables.embeddings(spark, dir).cache()
    val root = java.nio.file.Files.createTempDirectory("graft_pq_del_spec").toString
    // PQ: flat code table, staged anti-join rewrite
    Similarity.buildPqIndex(emb, s"$root/pq")
    Similarity.removeFromPqIndex(
      emb.filter(col("vec_id") % 7 === 0).select("vec_id"), s"$root/pq")
    Similarity.buildPqIndex(
      emb.filter(col("vec_id") % 7 =!= 0), s"$root/pq_full", fitOn = Some(emb))
    def codes(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toSet
    assert(codes(s"$root/pq") == codes(s"$root/pq_full"),
      "post-delete PQ codes must equal the never-saw-them rebuild's")
    // IVF-PQ: cell-partitioned residual codes, cell-granular rewrite
    Similarity.buildIvfPqIndex(emb, s"$root/ivfpq", nlist = 8)
    Similarity.removeFromIvfPqIndex(
      emb.filter(col("vec_id") % 7 === 0).select("vec_id"), s"$root/ivfpq")
    val doomedLeft = spark.read.parquet(s"$root/ivfpq/codes")
      .filter(col("vec_id") % 7 === 0).count()
    assert(doomedLeft == 0, "no erased vector may remain in the code table")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val neigh = Similarity.ivfPqTopKFromIndex(spark, s"$root/ivfpq", q, k = 5)
      .filter(col("neighbor_id") % 7 === 0).count()
    assert(neigh == 0, "an erased vector must never surface as a neighbor")
  }

  test("drift checks: the index's own mixture is quiet, a collapsed mixture trips") {
    import spark.implicits._
    // 100 vectors in 4 tight one-hot clusters, 25 each — the balanced
    // mixture the quantizers are fit on
    val vecs = (0 until 100).map { i =>
      val d = i % 4
      (i.toLong, Array.tabulate(4)(j => if (j == d) 1f else 0.01f * (i % 3)))
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_drift_spec").toString
    val model = Similarity.fitIvfModel(vecs, nlist = 4, trainFraction = 1.0)
    Similarity.buildIvfIndex(vecs, s"$root/ivf", model)
    // a recent batch with the SAME mixture: TV 0, quiet
    val sameMix = vecs.filter(col("vec_id") < 40)
    val q = Similarity.ivfDriftCheck(sameMix, s"$root/ivf").head()
    assert(!q.getBoolean(2) && q.getLong(1) == 0L,
      s"the index's own mixture must measure TV 0: $q")
    // a batch collapsed onto ONE cluster: TV = ½(¾ + 3·¼) = 750e3
    val collapsed = vecs.filter(col("vec_id") % 4 === 0).limit(20)
    val d = Similarity.ivfDriftCheck(collapsed, s"$root/ivf").head()
    assert(d.getBoolean(2) && d.getLong(1) == 750L,
      s"a single-cluster batch must trip at exactly 750e3: $d")
    // PQ twin: code-usage histograms move the same way
    Similarity.buildPqIndex(vecs, s"$root/pq", numSub = 2, ncodes = 4,
      trainFraction = 1.0, maxTrainRows = 200)
    val qp = Similarity.pqDriftCheck(sameMix, s"$root/pq").head()
    val dp = Similarity.pqDriftCheck(collapsed, s"$root/pq").head()
    assert(qp.getLong(1) <= 100L, s"same-mixture PQ TV must stay near 0: $qp")
    assert(dp.getLong(1) > qp.getLong(1),
      s"the collapsed batch must measure worse: $dp vs $qp")
  }

  test("ivf top-k: candidates carry exact similarities; full-probe = exact search") {
    val emb = Tables.embeddings(spark, dir).cache()
    val exactAll = Similarity.cosineTopK(emb, nQueries = 3, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 3, k = 5, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, n, s) => assert(exactAll.contains((q, n, s))) }
    // probing every cell recovers the exact top-k
    val full = Similarity.ivfTopK(emb, nQueries = 3, k = 5, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exactTop = Similarity.cosineTopK(emb, nQueries = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === exactTop)
  }

  test("recallAtK: exact-vs-exact is all true, empty approx all false") {
    val emb = Tables.embeddings(spark, dir).cache()
    val exact = Similarity.cosineTopK(emb, nQueries = 3, k = 5)
    val self = Similarity.recallAtK(exact, exact, k = 5, floorPct = 100)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(self.length === 3)
    assert(self.forall(_._2), "exact against itself is 100% recall")
    val none = Similarity.recallAtK(exact, exact.limit(0), k = 5, floorPct = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(none.length === 3)
    assert(none.forall(!_._2), "empty approx meets no floor")
  }

  test("ann lsh top-k is a subset of exact cosine ranking per query") {
    val emb = Tables.embeddings(spark, dir).cache()
    val exact = Similarity.cosineTopK(emb, nQueries = 5, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ann = Similarity.annTopKLsh(emb, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every ANN hit carries the same similarity the exact scorer found
    ann.foreach { case (q, n, s) => assert(exact.contains((q, n, s))) }
    // bucketing actually prunes: ANN candidate sets are smaller than N
    assert(ann.nonEmpty)
  }

  test("refitIvfIndex: retrains on the index's own rows, swaps atomically, keeps every vector queryable") {
    val emb = Tables.embeddings(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_refit").toString
    val model = Similarity.fitIvfModel(emb, nlist = 4)
    Similarity.buildIvfIndex(emb, s"$base/idx", model)
    // plant drift: a shifted batch appended at the stale centroids
    val drift = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(1.0f)).as("embedding"))
    Similarity.appendToIvfIndex(drift, s"$base/idx")
    val before = spark.read.parquet(s"$base/idx/assignments").count()
    Similarity.refitIvfIndex(spark, s"$base/idx", nlist = 4)
    // every vector survives the refit (identity replaced, rows kept)
    val after = spark.read.parquet(s"$base/idx/assignments")
    assert(after.count() == before, "the refit must re-encode every stored vector")
    // fresh centroids actually cover the drifted mass: the drifted
    // ids' assigned cells are non-empty and the cold query still
    // answers with full k
    val cold = Similarity.ivfTopKFromIndex(spark, s"$base/idx", nQueries = 3, k = 5)
    assert(cold.groupBy("q_id").count().collect().forall(_.getLong(1) == 5L))
    // no refit debris: neither the staged dir nor the set-aside old
    // index survives the swap
    val siblings = new java.io.File(base).list().toSeq
    assert(siblings == Seq("idx"),
      s"rename-aside must leave no .refit-/.old- debris: $siblings")
  }
}
