package graft

import graft.operators.{Queries, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: the scale posture the operators claim must
  * actually appear in the executed plan — pushdown to the parquet
  * scan, broadcast of tiny sides, and the absence of cartesian
  * products anywhere in the similarity family (builder brief: iterate
  * on .explain until it's the plan you'd want).
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Tiny symmetric edge list for the graph-operator plan checks. */
  private lazy val toyEdges: DataFrame = {
    import spark.implicits._
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L))
    (und ++ und.map(_.swap)).map { case (a, b) => (a, b, 1L) }
      .toDF("src", "dst", "w")
  }

  private def executedPlan(df: DataFrame): String = {
    df.collect() // force execution so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("filters and projections push into the parquet scan") {
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter must reach the scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must read only the projected columns:\n$scan")
  }

  test("cosine_topk: query side broadcasts, big side never shuffles") {
    val plan = executedPlan(Similarity.cosineTopK(Tables.embeddings(spark, dir)))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"tiny query set must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }

  test("similarity family plans contain no cartesian product") {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    Seq(
      "minhash_neardup" -> Similarity.minhashNearDup(docs),
      "ann_topk_lsh" -> Similarity.annTopKLsh(emb),
      "embedding_neardup" -> Similarity.embeddingNearDup(emb, 450000L),
      "simhash_neardup" -> Similarity.simhashNearDup(docs),
      "jaccard_neardup" -> Similarity.jaccardNearDup(docs),
      // cell/slice-bucketed candidates, same equi-join discipline
      "semantic_dedup" -> Similarity.semanticDedup(
        emb.select("vec_id", "embedding"), nlist = 4),
      "hamming_linkage" -> graft.operators.Linkage.hammingLinkage(
        Tables.customer(spark, dir).select(col("c_custkey").as("id"),
          org.apache.spark.sql.functions.md5(col("c_name")).as("k")),
        "id", "k", width = 32, maxDist = 2)
    ).foreach { case (name, df) =>
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"), s"$name: no cartesian product:\n$plan")
      // every one of these generates candidates via a bucketed
      // EQUI-join — a nested-loop anywhere means the bucketing failed
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name: bucketed candidates must equi-join:\n$plan")
    }
  }

  test("round-10 operators keep the equi-join discipline (no cartesian, no nested-loop)") {
    val docs = Tables.documents(spark, dir)
    val idx = s"${java.nio.file.Files.createTempDirectory("plan_mh_idx")}/idx"
    Similarity.buildMinhashIndex(docs.filter(col("doc_id") % 2 === 0), idx)
    Seq(
      "tfidf_cosine" -> graft.operators.TextOps.tfidfCosinePairs(docs),
      "minhash_index_delta" -> Similarity.minhashNearDupFromIndex(
        docs.filter(col("doc_id") % 2 === 1), idx),
      "scd2_merge" -> graft.operators.Maintenance.scd2Merge(
        Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"),
          to_date(lit("2024-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"), lit(true).as("is_current")),
        Tables.customer(spark, dir).select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("x")).as("c_mktsegment"),
          to_date(lit("2024-06-01")).as("eff")),
        "c_custkey", Seq("c_mktsegment"), "eff")
    ).foreach { case (name, df) =>
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"), s"$name: no cartesian:\n$plan")
      // tfidf_cosine's one sanctioned nested loop is the 1-row
      // broadcast(corpus-size) — the constant-size-side allowance every
      // sketch/calendar broadcast already uses; everything data-sized
      // must equi-join
      if (name != "tfidf_cosine")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name: equi-joins only:\n$plan")
    }
  }

  test("scd2Merge is ONE join + a conditional explode — never three filters over the join") {
    val dim = Tables.customer(spark, dir).select(col("c_custkey"),
      col("c_mktsegment"), to_date(lit("2024-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val upd = Tables.customer(spark, dir).select(col("c_custkey"),
      concat(col("c_mktsegment"), lit("x")).as("c_mktsegment"),
      to_date(lit("2024-06-01")).as("eff"))
    val plan = executedPlan(graft.operators.Maintenance.scd2Merge(
      dim, upd, "c_custkey", Seq("c_mktsegment"), "eff"))
      // AQE prints Final + Initial plan sections; count joins once
      .split("== Initial Plan ==").head
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size
    assert(joins === 1, s"expected exactly one join, got $joins:\n$plan")
    assert(plan.contains("Generate explode"), s"outcome branches must ride ONE explode:\n$plan")
  }

  test("operators are sort-free: ORDER BY lives at the SparkEntry edge") {
    // A presentation orderBy inside an operator saddles every
    // downstream composition with a range exchange; the convention is
    // sort-free operators, deterministic ORDER BY only at the row
    // edge. Logical-plan check on purpose: SortMergeJoin adds
    // physical SortExec nodes that are legitimate.
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val emb = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir)
    Seq(
      "semantic_dedup" -> Similarity.semanticDedup(
        emb.select("vec_id", "embedding"), nlist = 4),
      "hamming_linkage" -> graft.operators.Linkage.hammingLinkage(
        Tables.customer(spark, dir).select(col("c_custkey").as("id"),
          org.apache.spark.sql.functions.md5(col("c_name")).as("k")),
        "id", "k", width = 32, maxDist = 2),
      // r9 sweep: the whole near-dup/top-k/text family is sort-free
      "cosine_topk" -> Similarity.cosineTopK(emb),
      "minhash_neardup" -> Similarity.minhashNearDup(docs),
      "jaccard_neardup" -> Similarity.jaccardNearDup(docs),
      "containment_neardup" -> Similarity.containmentNearDup(docs),
      "simhash" -> Similarity.simhash(docs),
      "simhash_neardup" -> Similarity.simhashNearDup(docs),
      "embedding_neardup" -> Similarity.embeddingNearDup(emb, 450000L),
      "segment_dedup" -> graft.operators.TextOps.segmentDedup(docs),
      "normalize_text" -> graft.operators.TextOps.normalizeText(docs),
      "approx_distinct" -> graft.operators.Sketches.approxDistinct(
        Tables.events(spark, dir), "event_type", "user_id"),
      // r10 additions to the convention
      "edit_distance_join" -> graft.operators.Linkage.editDistanceJoin(
        Tables.customer(spark, dir).select(col("c_custkey").cast("long").as("id"),
          col("c_name").as("s")), "id", "s", maxDist = 1),
      "cross_corpus_dedup" -> Similarity.crossCorpusDedup(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1)),
      "boilerplate_strip" -> graft.operators.TextOps.stripBoilerplate(docs),
      "rolling_zscore" -> graft.operators.Queries.rollingZScore(
        Tables.events(spark, dir)),
      // graph family: iterations shuffle on dst / vote keys, never sort
      "pagerank" -> graft.operators.PageRank.run(
        toyEdges, iterations = 2),
      "pagerank_personalized" -> graft.operators.PageRank.runPersonalized(
        toyEdges, toyEdges.select(col("src").as("node")).limit(1), iterations = 2),
      "label_prop" -> graft.operators.LabelProp.run(toyEdges, iterations = 2),
      "matryoshka_topk" -> Similarity.matryoshkaTopK(emb),
      // r11: the sweep closes — the whole map-only text family
      "doc_tokens" -> graft.operators.TextOps.docTokens(docs),
      "quality_filter_op" -> graft.operators.TextOps.qualityFilter(docs),
      "token_counts" -> graft.operators.TextOps.tokenCounts(docs),
      "quality_filter_multilang" ->
        graft.operators.TextOps.qualityFilterMultilang(docs),
      "redact_pii" -> graft.operators.TextOps.redactPii(docs),
      "tfidf_topk" -> graft.operators.TextOps.tfidfTopK(docs, k = 3),
      "decontaminate" -> graft.operators.TextOps.decontaminate(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1)),
      "repetition_score" -> graft.operators.TextOps.repetitionScore(docs),
      "lm_score" -> graft.operators.TextOps.lmScore(docs),
      "doc_fingerprint" -> graft.operators.TextOps.fingerprint(docs),
      // r11 graph family: census + density ops shuffle on node ids only
      "triangle_count" -> graft.operators.Triangles.count(toyEdges),
      "clustering_coeff" -> graft.operators.Triangles.clusteringCoefficient(toyEdges),
      "kcore" -> graft.operators.Triangles.kCore(toyEdges, k = 2, rounds = 2)
    ).foreach { case (name, df) =>
      val sorts = df.queryExecution.optimizedPlan.collect { case s: Sort => s }
      assert(sorts.isEmpty, s"$name: operator must not sort (found: $sorts)")
    }
    // tokenBudgetSlice DOES sort (within-bucket windows — that is its
    // algorithm), but never globally: no single-partition global-order
    // window may appear (the two-phase claim is exactly this)
    val tb = graft.operators.Sampling.tokenBudgetSlice(
      docs, "doc_id", org.apache.spark.sql.functions.size(
        graft.operators.TextOps.tokens(col("text"))), 20000L)
    val wins = tb.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty)
    // exactly ONE unpartitioned window — the walk over the 4096-row
    // bucket table; the corpus-sized running sum must be partitioned
    assert(wins.count(_.partitionSpec.isEmpty) == 1 &&
      wins.exists(_.partitionSpec.nonEmpty),
      s"tokenBudgetSlice must window per bucket, not globally: $wins")
  }

  test("retrieval/selection top-k plans as TakeOrderedAndProject — no global corpus sort") {
    // orderBy+limit is the scalable global top-k (per-partition k then
    // merge); a full range-exchange Sort over the corpus would be the
    // degeneration. The trailing rank window runs on ≤k rows only.
    val docs = Tables.documents(spark, dir)
    for ((name, df) <- Seq(
      "bm25_topk" -> graft.operators.TextOps.bm25TopK(
        docs, Seq("vector", "query"), k = 10),
      "hybrid_rrf" -> graft.operators.TextOps.hybridRrfTopK(
        docs, Seq("vector", "query"), k = 5),
      "importance_select" -> graft.operators.TextOps.importanceSelect(
        docs.filter(col("lang") =!= "en"), docs.filter(col("lang") === "en")))) {
      val phys = executedPlan(df)
      assert(phys.contains("TakeOrderedAndProject"),
        s"$name: the global top-k must plan as TakeOrderedAndProject\n$phys")
    }
    // the BATCH variant's per-query top-k is a rank-pushdown window:
    // ≤k rows per query survive per task BEFORE the shuffle
    import spark.implicits._
    val batch = graft.operators.TextOps.bm25BatchTopK(docs,
      Seq((1L, "vector"), (2L, "query")).toDF("query_id", "term"), k = 5)
    assert(executedPlan(batch).contains("WindowGroupLimit"),
      "bm25BatchTopK must plan the per-query rank as WindowGroupLimit")
  }

  test("temporal join queries prune the events scan (props never read)") {
    // `props` is the widest events column; neither temporal query
    // touches it, so it must not survive into ReadSchema
    Seq("asof_attribution", "event_bursts", "sessionize").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("props"), s"$name must prune props:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name: no cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name: no nested-loop:\n$plan")
    }
  }

  test("cslb_reconcile aggregates before the join (no amplification)") {
    val df = Queries.cslbReconcile(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    // the aggregate (distinct) must sit BELOW the join in the plan tree
    val joinIdx = plan.indexOf("Join")
    val aggIdx = plan.indexOf("Aggregate")
    assert(joinIdx >= 0 && aggIdx >= 0 && aggIdx < joinIdx,
      s"distinct-then-semi-join expected:\n$plan")
    assert(plan.contains("LeftSemi"), s"semi join expected:\n$plan")
  }

  test("bucketed tables join with zero exchanges") {
    val base = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    graft.sources.Sinks.writeBucketed(
      Tables.orders(spark, dir), "orders_b", s"$base/orders_b", "o_orderkey", 8)
    graft.sources.Sinks.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "lineitem_b", s"$base/lineitem_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val plan = executedPlan(j)
      // look only at AQE's final plan (the printed string repeats the
      // initial plan below it)
      val finalSection = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i => plan.substring(0, i)
      }
      assert(finalSection.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(finalSection.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      // the plan prints top-down, so everything after the SMJ line is
      // its input subtree: no exchange may feed the join
      val joinSubtree = finalSection.substring(finalSection.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned layout prunes partitions at the scan") {
    val base = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    val events = Tables.events(spark, dir)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    graft.sources.Sinks.writePartitioned(events, base, "dt")
    val days = spark.read.parquet(base).select("dt").distinct().count()
    assert(days > 1, "need multiple partitions for a pruning test")
    val q = spark.read.parquet(base).filter(col("dt") === "2024-01-05")
    val plan = q.queryExecution.executedPlan.toString
    // the dt predicate must land in PartitionFilters (pruned listing),
    // NOT in PushedFilters/DataFilters (row-level evaluation)
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"partition filter expected:\n$plan")
    assert(q.count() > 0)
  }

  test("compact rewrites splinter files to the computed count, content intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/frag"
    val out = s"$base/out"
    val ev = Tables.events(spark, dir)
    ev.repartition(16).write.parquet(frag)
    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 16)
    // a target far above any splinter -> everything folds into 1 file
    val nOut = graft.sources.Sinks.compact(spark, frag, out, targetBytes = 1L << 30)
    assert(nOut == 1)
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == 1)
    assert(spark.read.parquet(out).count() == ev.count())
    // and a small target computes the byte-proportional count
    val bytes = new java.io.File(frag).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = math.max(1L, bytes / 4)
    val n4 = graft.sources.Sinks.compact(spark, s"$base/frag", s"$base/out4", target)
    assert(n4 == math.ceil(bytes.toDouble / target).toInt)
  }

  test("compact on a partitioned tree recurses per partition, keeping the layout") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_part").toString
    val ev = Tables.events(spark, dir)
      .withColumn("dt", to_date(col("ts")))
    graft.sources.Sinks.writePartitioned(
      ev.repartition(8), s"$base/tree", "dt")
    val nOut = graft.sources.Sinks.compact(
      spark, s"$base/tree", s"$base/out", targetBytes = 1L << 30)
    val dtDirs = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("dt="))
    // one output file per partition dir, dt= layout intact
    assert(dtDirs.nonEmpty)
    assert(nOut == dtDirs.length)
    dtDirs.foreach { d =>
      assert(new java.io.File(s"$base/out/$d").listFiles()
        .count(_.getName.endsWith(".parquet")) == 1)
    }
    // content survives, including the partition column from the path
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() == ev.count())
    assert(back.columns.contains("dt"))
  }

  test("compact fails loudly on empty and non-partition-subdir inputs") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_bad").toString
    new java.io.File(s"$base/empty").mkdirs()
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.Sinks.compact(spark, s"$base/empty", s"$base/o1", 1L << 20)
    }
    assert(e1.getMessage.contains("no parquet files"))
    new java.io.File(s"$base/weird/not_a_partition").mkdirs()
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.Sinks.compact(spark, s"$base/weird", s"$base/o2", 1L << 20)
    }
    assert(e2.getMessage.contains("non-partition subdirectories"))
  }

  test("corpusPipeline: one corpus scan, one hash shuffle, no join") {
    val df = graft.operators.TextOps.corpusPipeline(
      Tables.documents(spark, "/root/testdata/sf0.01"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"metrics must ride the aggregate as group invariants, not a join-back:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1,
      s"the normalize+gate+dedup chain must cost ONE corpus scan, found $scans:\n$plan")
  }

  test("retentionPurge drops exactly the pre-cutoff partitions, fails loudly off-layout") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_retention_spec").toString
    val df = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
      .toDF("dt", "v")
    graft.sources.Sinks.writePartitioned(df, s"$base/t", "dt")
    val purged = graft.sources.Sinks.retentionPurge(spark, s"$base/t", "dt", "2024-01-03")
    assert(purged == Seq("dt=2024-01-01", "dt=2024-01-02"))
    // survivors intact and still partition-discoverable
    // partition discovery infers dt= values as DateType — cast back
    assert(spark.read.parquet(s"$base/t")
      .select(col("dt").cast("string"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("2024-01-03", 3L)))
    // not a partitioned layout → loud failure, nothing deleted
    new java.io.File(s"$base/flat").mkdirs()
    val e = intercept[IllegalArgumentException] {
      graft.sources.Sinks.retentionPurge(spark, s"$base/flat", "dt", "2024-01-03")
    }
    assert(e.getMessage.contains("no dt= partitions"))
  }

  test("quality_filter reads only the columns it needs") {
    // sf0.01, not `dir`: other suites cache documents(sf0.001) in the
    // shared session and the cached relation would replace the scan
    val df = graft.operators.TextOps.qualityFilter(
      Tables.documents(spark, "/root/testdata/sf0.01"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must read only doc_id+text (not lang/n_chars/embedding-side columns):\n$plan")
  }

  test("media feature pipeline reads only doc_id+text at the scan") {
    // the decode path (synthesize → extractFeatures mapPartitions →
    // rollup) must not drag lang/n_chars/other columns through the scan
    val df = graft.operators.Multimodal.featureSummary(
      graft.operators.Multimodal.synthesizeMedia(
        Tables.documents(spark, "/root/testdata/sf0.01")),
      graft.operators.Multimodal.ByteHistogramDecoder)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must read only doc_id+text:\n$plan")
  }

  test("injected expressions are reachable from plain SQL — through CODEGEN, not folding") {
    // GraftExtensions.injectFunction is the sanctioned extension point;
    // prove a SQL-only user gets the native expressions. Inputs come
    // from COLUMNS of a one-row view, not literals: literal args are
    // constant-folded via the interpreted eval path and never exercise
    // doGenCode (a compile-broken codegen shipped green that way once).
    // CODEGEN_ONLY + fallback off turn any codegen failure into a test
    // failure instead of a silent interpreted downgrade.
    import spark.implicits._
    // parquet round-trip, not a local relation: ConvertToLocalRelation
    // evaluates a Project over LocalRelation eagerly (interpreted) at
    // optimization time, which would bypass codegen just like literal
    // folding does
    val fxDir = java.nio.file.Files.createTempDirectory("graft-fx").toString
    Seq(("a b c d", "the cat and the hat", "0101", "0011",
        "the cat, the hat!", "", "ab cd", "The cat und der Hund",
        1.0f, 2.0f, 3.0f, 4.0f))
      .toDF("abcd", "cats", "h1", "h2", "punct", "emp", "abcd2", "langs",
        "f1", "f2", "f3", "f4")
      .write.mode("overwrite").parquet(fxDir)
    spark.read.parquet(fxDir).createOrReplaceTempView("fx_exprs")
    val factoryKey = "spark.sql.codegen.factoryMode"
    val fallbackKey = "spark.sql.codegen.fallback"
    val prevFactory = spark.conf.getOption(factoryKey)
    val prevFallback = spark.conf.getOption(fallbackKey)
    spark.conf.set(factoryKey, "CODEGEN_ONLY")
    spark.conf.set(fallbackKey, "false")
    try {
      val row = spark.sql(
        """SELECT word_shingles(abcd, 3) AS sh,
          |       simhash_bits(word_shingles(abcd, 3), 8) AS sim,
          |       hyperplane_sig(array(CAST(f1 AS FLOAT), CAST(-f2 AS FLOAT)), 4) AS hp,
          |       count_tokens_in(cats, 'the,and', true) AS hits,
          |       size(minhash_band_keys(word_shingles(abcd, 3), 64, 16)) AS bands,
          |       hamming_bits(h1, h2) AS hd,
          |       token_profile(punct, 'the,a').n_tokens AS tp_n,
          |       token_profile(punct, 'the,a').n_stop_tokens AS tp_stop,
          |       token_profile(punct, 'the,a').n_punct_chars AS tp_punct,
          |       token_profile(emp, 'the').n_tokens AS tp_empty,
          |       token_fingerprint(abcd2).fingerprint AS fp,
          |       count_tokens_multi(langs, 'the,cat|der,und', true) AS multi,
          |       float_dot(array(f1, f2), array(f3, f4)) AS fd,
          |       float_norm2(array(f3, f4)) AS fn
          |FROM fx_exprs""".stripMargin).collect().head
      assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
      assert(row.getString(1).length === 8)
      assert(row.getString(2).length === 4)
      assert(row.getInt(3) === 3)
      assert(row.getInt(4) === 16)
      assert(row.getInt(5) === 2)
      assert(row.getInt(6) === 4) // the cat, the hat!
      assert(row.getInt(7) === 2) // 'the' twice; 'cat,'/'hat!' carry punct
      assert(row.getInt(8) === 2) // ',' and '!'
      assert(row.getInt(9) === 0)
      // (1)*(2*131+'a') + (2)*(2*131+'c') = 262+97 + 2*(262+99)
      assert(row.getLong(10) === (262L + 97L) + 2L * (262L + 99L))
      assert(row.getSeq[Int](11) === Seq(2, 2)) // lowercased: the,cat | der,und
      assert(row.getDouble(12) === 11.0)
      assert(row.getDouble(13) === 25.0)
    } finally {
      prevFactory.fold(spark.conf.unset(factoryKey))(spark.conf.set(factoryKey, _))
      prevFallback.fold(spark.conf.unset(fallbackKey))(spark.conf.set(fallbackKey, _))
    }
  }

  test("stratifiedTopN plans as WindowGroupLimit (bounded pre-shuffle rows)") {
    // the claimed 100 TB posture: each map task forwards at most n rows
    // per stratum BEFORE the window shuffle — that is Spark 4's
    // WindowGroupLimit (partial+final) rewrite of a row_number cap, and
    // it must actually fire for the md5-ordered sampling window
    val df = graft.operators.Sampling.stratifiedTopN(
      Tables.documents(spark, "/root/testdata/sf0.01"), "lang", "doc_id", 20)
    val plan = executedPlan(df)
    assert(plan.contains("WindowGroupLimit"),
      s"row_number cap must rewrite to WindowGroupLimit:\n$plan")
  }

  test("mixByRate is map-only: no exchange in the plan") {
    val df = graft.operators.Sampling.mixByRate(
      Tables.documents(spark, "/root/testdata/sf0.01"), "lang", "doc_id",
      Map("en" -> 500, "de" -> 250))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash gate must not shuffle:\n$plan")
  }

  test("embeddingNearDup returns only pairs above threshold, a<b") {
    val out = Similarity.embeddingNearDup(Tables.embeddings(spark, dir), 400000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, s) =>
      assert(a < b)
      assert(s >= 400000L)
    }
  }

  test("zValue: bit interleave matches the reference Morton encoding") {
    import spark.implicits._
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L),
      (1499L, 29L), (4095L, 4095L), (4096L, 1L)) // last wraps mod 2^12
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.sources.Sinks.zValue(col("a"), col("b"), bits = 12).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === morton(r.getLong(0) % 4096, r.getLong(1) % 4096, 12),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("writeZOrdered: z-sorted layout skips more than a one-dim sort on a 2-d query") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("dt"))
      .withColumn("day", datediff(col("dt"), to_date(lit("2024-01-01"))))
    val base = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    graft.sources.Sinks.writeZOrdered(ev, s"$base/z", "user_id", "day",
      numFiles = 16, bits = 12)
    ev.repartitionByRange(16, col("day")).sortWithinPartitions("day")
      .write.option("parquet.block.size", 64L * 1024).parquet(s"$base/t")
    def scanRows(p: String): Long = {
      val q = spark.read.parquet(p)
        .filter(col("user_id").between(2, 5) &&
          col("day").between(4, 21))
        .select("event_id")
      q.collect()
      q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val (z, t) = (scanRows(s"$base/z"), scanRows(s"$base/t"))
    assert(z < t, s"z=$z should skip more than t=$t")
  }
}
