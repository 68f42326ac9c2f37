package graft

import graft.operators.{Similarity, Sketches, TextOps}
import org.apache.spark.sql.functions._

/** Behavior specs for the round-5 additions: PII redaction, corpus
  * top-terms, and the sketch accuracy checks.
  */
class TextSketchSpec extends SparkSpec {
  import spark.implicits._

  test("wordpiece encode: longest match wins, UNK advances one char, multi-word sums") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, typedLit}
    // vocab: ab=1, abc=2, c=3, d=4 (no 'z', no lone 'a'/'b')
    val units = Seq("ab", "abc", "c", "d")
    val ids = Seq(1, 2, 3, 4)
    def enc(text: String) =
      Seq(text).toDF("text")
        .select(call_function("wordpiece_encode", col("text"),
          typedLit(units), typedLit(ids)).as("e"))
        .select(col("e.n_pieces"), col("e.n_unk"), col("e.id_sum"))
        .head() match { case r => (r.getInt(0), r.getInt(1), r.getLong(2)) }
    // "abcd": greedy takes abc (2) then d (4) — never ab+c+d
    assert(enc("abcd") == (2, 0, 6L))
    // "abd": abc fails, ab (1) matches, then d (4)
    assert(enc("abd") == (2, 0, 5L))
    // "azc": no 'a', UNK; no 'z', UNK; then c (3)
    assert(enc("azc") == (3, 2, 3L))
    // two words sum; leading/trailing whitespace tokenizes away
    assert(enc("  abcd abd ") == (4, 0, 11L))
    assert(enc("") == (0, 0, 0L))
    // supplementary-plane text ENCODES (the r11 BMP-only raise is
    // retired — positions are code points now, VERDICT r11 #2): 😀 is
    // ONE unknown position (not two UTF-16 units), so "ab😀cd" is
    // ab(1) + UNK + c(3) + d(4)
    assert(enc("ab😀cd") == (4, 1, 8L))
    // a supplementary char can be a VOCAB UNIT too: 𝄞 (U+1D11E) and
    // the CJK-extension 𠀀 (U+20000) match as single code points
    val units2 = Seq("𝄞", "𠀀", "ab")
    val ids2 = Seq(7, 9, 1)
    val got = Seq("𝄞ab𠀀").toDF("text")
      .select(call_function("wordpiece_encode", col("text"),
        typedLit(units2), typedLit(ids2)).as("e"))
      .select(col("e.n_pieces"), col("e.n_unk"), col("e.id_sum"))
      .head() match { case r => (r.getInt(0), r.getInt(1), r.getLong(2)) }
    assert(got == ((3, 0, 17L)), s"supplementary vocab units must match: $got")
  }

  test("normalizeText composes NFC, folds case, collapses whitespace") {
    // "Cafe"+U+0301 (decomposed) must equal precomposed "café" after
    // the pass; ASCII text round-trips; runs of whitespace collapse
    val docs = Seq(
      (1L, "Café  AND\tNAÏVE"),
      (2L, "plain ascii stays"),
      (3L, "café")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.normalizeText(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, "café and naïve", 17L, 14L)))
    assert(got(1) == ((2L, "plain ascii stays", 17L, 17L)))
    // already-composed input is a fixed point
    assert(got(2) == ((3L, "café", 4L, 4L)))
  }

  test("duplicateSpans is offset-invariant where fixed-stride segmentDedup is blind") {
    // docs share an exact 10-token span, but doc 2's copy starts at
    // token 5 — it straddles every stride-10 boundary, so segment
    // hashes never align; the sliding window must still find it
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span tail1 tail2"),
      (2L, s"p1 p2 p3 p4 p5 $span"),
      (3L, "completely unrelated words here make no span at all x y")
    ).toDF("doc_id", "text")
    // fixed windows: no duplicated segment (hashes don't align)
    val seg = TextOps.segmentDedup(docs, segTokens = 10)
      .select("doc_id", "n_dropped").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seg.values.forall(_ == 0L), s"stride windows must miss the span: $seg")
    // sliding windows: exactly the (1,2) pair, exactly one shared span
    val got = TextOps.duplicateSpans(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L)), s"got $got")
  }

  test("duplicateSpans drops spans above the boilerplate cap before pairing") {
    // the same span in 4 docs with cap 3: every window of that span
    // occurs 4 times -> gated out -> no pairs; cap 10 finds all 6 pairs
    val span = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = (1L to 4L).map(id => (id, s"head$id $span")).toDF("doc_id", "text")
    assert(TextOps.duplicateSpans(docs, k = 10, spanCap = 3).count() == 0)
    assert(TextOps.duplicateSpans(docs, k = 10, spanCap = 10).count() == 6)
  }

  test("chunkDocs: overlapping windows cover the doc; short tail; empty doc keeps a chunk") {
    val doc = (1 to 90).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(docs, chunkTokens = 50, stride = 40)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: starts 0, 40, 80 → lengths 50, 50, 10; 10-token overlap
    assert(got.map(g => (g._1, g._2, g._4)).toSeq ==
      Seq((1L, 0, 50), (1L, 1, 50), (1L, 2, 10), (2L, 0, 0)))
    assert(got(0)._3.startsWith("w1 ") && got(0)._3.endsWith(" w50"))
    assert(got(1)._3.startsWith("w41 ") && got(1)._3.endsWith(" w90"))
    assert(got(2)._3 == (81 to 90).map(i => s"w$i").mkString(" "))
    assert(got(3)._3 == "")
    // consecutive chunks share exactly the overlap tokens
    assert(got(0)._3.split(" ").takeRight(10).toSeq ==
      got(1)._3.split(" ").take(10).toSeq)
    intercept[IllegalArgumentException](
      TextOps.chunkDocs(docs, chunkTokens = 10, stride = 20))
  }

  test("normalizedDedup collapses case/NFC/whitespace twins that raw dedup keeps") {
    // doc 1 composed, doc 2 its decomposed+upper+extra-ws twin, doc 3
    // genuinely distinct; raw md5 sees three texts, canonical sees two
    val docs = Seq(
      (1L, "the Café menu"),
      (2L, "the  CAFÉ MENU"),
      (3L, "something else")
    ).toDF("doc_id", "text")
    val raw = TextOps.exactDedup(docs)
    assert(raw.count() == 3, "raw dedup must NOT collapse the variants")
    val norm = TextOps.normalizedDedup(docs)
      .orderBy("keep_doc_id")
      .collect().map(r => (r.getAs[Long]("keep_doc_id"),
        r.getAs[Long]("dup_count"), r.getAs[Long]("n_raw_variants")))
    assert(norm.toSeq == Seq((1L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("redactPii scrubs all three categories and counts per category") {
    val docs = Seq(
      (1L, "write a@b.co and c.d+x@e.org then ping 10.0.0.1 or call 303-555-0199"),
      (2L, "no pii here at all"),
      (3L, "double mail a@b.co a@b.co")
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs).orderBy("doc_id")
      .select("doc_id", "clean_text", "n_emails", "n_ips", "n_phones")
      .as[(Long, String, Int, Int, Int)].collect()
    assert(out(0) == ((1L,
      "write <EMAIL> and <EMAIL> then ping <IP> or call <PHONE>", 2, 1, 1)))
    assert(out(1) == ((2L, "no pii here at all", 0, 0, 0)))
    assert(out(2) == ((3L, "double mail <EMAIL> <EMAIL>", 2, 0, 0)))
  }

  test("redactPii order: emails scrubbed before the IP pattern can see their domains") {
    val docs = Seq(
      // dotted digit run INSIDE an email domain: email-first consumes
      // it whole; ip-first would have split the address
      (1L, "mail me at u@10.0.0.1.example.com ok"),
      // all-digit domain with no alphabetic TLD is NOT an email — the
      // IP pattern correctly claims the dotted quad
      (2L, "mail me at root@10.0.0.1 ok")
    ).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).orderBy("doc_id")
      .select("clean_text", "n_emails", "n_ips").as[(String, Int, Int)].collect()
    assert(r(0) == (("mail me at <EMAIL> ok", 1, 0)))
    assert(r(1) == (("mail me at root@<IP> ok", 0, 1)))
  }

  test("stripBoilerplate: >=minDocs segments vanish everywhere, pairwise dups survive") {
    def words(prefix: String) = (1 to 10).map(i => s"$prefix$i").mkString(" ")
    val footer = words("foot")
    val pair = words("pair")
    val docs = Seq(
      (1L, words("a") + " " + footer), // footer as segment 1
      (2L, words("b") + " " + footer),
      (3L, footer + " " + words("c")), // footer as segment 0 — alignment-independent
      (4L, words("d") + " " + pair), // pair segment: only 2 docs → kept
      (5L, words("e") + " " + pair))
      .toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, segTokens = 10, minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, words("a"), 2L, 1L),
      (2L, words("b"), 2L, 1L),
      (3L, words("c"), 2L, 1L),
      (4L, words("d") + " " + pair, 2L, 0L),
      (5L, words("e") + " " + pair, 2L, 0L)))
    // segmentDedup contrast on the same corpus: the FIRST footer copy
    // survives there — strip semantics are strictly stronger
    val dedup = TextOps.segmentDedup(docs, segTokens = 10)
      .filter(col("doc_id") === 1L).select("clean_text").as[String].head()
    assert(dedup.contains("foot1"))
  }

  test("segmentDedup: first occurrence wins corpus-wide, docs reassemble in order") {
    // seg size 3; "a b c" appears in doc 1 (twice) and doc 2; doc 3 is
    // entirely made of doc 1's segments; doc 4 has a short tail segment
    val docs = Seq(
      (1L, "a b c x y z a b c"),   // segs: [a b c][x y z][a b c] — third is a within-doc dup
      (2L, "a b c q r s"),         // first seg loses to doc 1
      (3L, "x y z"),               // loses entirely to doc 1's second seg
      (4L, "q r s tail")           // [q r s] loses to doc 2; [tail] survives
    ).toDF("doc_id", "text")
    val got = TextOps.segmentDedup(docs, segTokens = 3).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a b c x y z", 3L, 1L),
      (2L, "q r s", 2L, 1L),
      (3L, "", 1L, 1L),
      (4L, "tail", 2L, 1L)))
  }

  test("segmentDedup: duplicate-free corpus passes through unchanged") {
    val docs = Seq((1L, "one two three four"), (2L, "five six")).toDF("doc_id", "text")
    val got = TextOps.segmentDedup(docs, segTokens = 3).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "one two three four", 2L, 0L),
      (2L, "five six", 1L, 0L)))
  }

  test("topTerms: collection and document frequency, deterministic ties, stopwords dropped") {
    val docs = Seq(
      (1L, "Spark spark SHUFFLE the a of"),
      (2L, "spark shuffle shuffle zz"),
      (3L, "zz zz")
    ).toDF("doc_id", "text")
    val out = TextOps.topTerms(docs, k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // spark: tf 3 (2 in doc1 via lowercasing, 1 in doc2), df 2
    // shuffle: tf 3, df 2; zz: tf 3, df 2 — ties break on term asc
    assert(out == Seq(("shuffle", 3L, 2L), ("spark", 3L, 2L), ("zz", 3L, 2L)))
  }

  test("tfidfTopK: rare terms outrank frequent ones; integer scores match hand math") {
    // 4 docs; "rare" appears in 1 doc, "mid" in 2, "common" in all 4
    val docs = Seq(
      (1L, "common rare rare mid"),
      (2L, "common mid"),
      (3L, "common common"),
      (4L, "common")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopK(docs, k = 2).orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    // doc 1: rare tf=2 df=1 -> 2*1e6*4/1 = 8e6; mid tf=1 df=2 -> 2e6; common tf=1 df=4 -> 1e6
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 1L, "rare", 2L, 1L, 8000000L),
      (1L, 2L, "mid", 1L, 2L, 2000000L)))
    // doc 3: common tf=2 df=4 -> 2*1e6*4/4 = 2e6, only term
    assert(got.filter(_._1 == 3L) === Seq((3L, 1L, "common", 2L, 4L, 2000000L)))
  }

  test("importanceSelect: target-like vocabulary outranks pool-only vocabulary, hand math") {
    val pool = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta gamma"),
      (3L, "delta delta delta")).toDF("doc_id", "text")
    val target = Seq((9L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    // cp: alpha 2, beta 2, gamma 1, delta 3; ct: alpha 3, beta 1
    // ratio_e6: alpha (3+1)e6/3=1333333, beta 2e6/3=666666,
    //           gamma 1e6/2=500000, delta 1e6/4=250000
    // doc1 (2*1333333+666666)/3=1111110; doc2 1166666/2=583333;
    // doc3 750000/3=250000
    val got = TextOps.importanceSelect(pool, target, n = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 3L, 1111110L),
      (2L, 2L, 2L, 583333L),
      (3L, 3L, 3L, 250000L)))
  }

  test("bpeTrain: exact left-to-right merges with deterministic ties (aaa/abab shapes)") {
    val docs = Seq((1L, "aaa abab")).toDF("doc_id", "text")
    // r1: (a,a)=2 ties (a,b)=2, lhs-asc wins → aa; "aaa"→"aa a"
    //     (the fold merges ONE leftmost pair of the run — never "aa"
    //     twice from three a's)
    // r2: (a,b)=2 → ab; "abab"→"ab ab" (both alternating pairs — the
    //     second merges even though the first consumed its left space)
    // r3: (aa,a)=1 ties (ab,ab)=1, lhs asc → aaa
    // r4: (ab,ab)=1 → abab
    val got = TextOps.bpeTrain(docs, nMerges = 4)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, "a", "a", "aa", 2L),
      (2L, "a", "b", "ab", 2L),
      (3L, "aa", "a", "aaa", 1L),
      (4L, "ab", "ab", "abab", 1L)))
    // a fifth merge has no pairs left — loud error, not a short table
    intercept[IllegalArgumentException] { TextOps.bpeTrain(docs, nMerges = 5) }
  }

  test("importanceSample: proportional md5 gate — max-score doc always kept, gate replayed") {
    val pool = (1L to 60L).map { i =>
      // thirds: target-like, mixed, pool-only vocabulary
      val t = if (i % 3 == 0) "alpha alpha beta"
      else if (i % 3 == 1) "alpha delta" else "delta gamma"
      (i, t)
    }.toDF("doc_id", "text")
    val target = Seq((99L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val scores = TextOps.importanceSelect(pool, target, n = 60)
      .select("doc_id", "score_e6").as[(Long, Long)].collect().toMap
    val mx = scores.values.max
    def u16(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(2).map("%02x".format(_)).mkString, 16)
    }
    val expect = scores.keys.filter(d => u16(d) * mx < scores(d) * 65536L).toSeq.sorted
    val got = TextOps.importanceSample(pool, target)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === expect)
    // every max-score doc clears the gate by construction (u16 < 65536)
    val maxDocs = scores.filter(_._2 == mx).keys.toSet
    assert(maxDocs.subsetOf(got.toSet))
    // the gate is a real filter on this fixture, not a pass-through
    assert(got.size < scores.size)
  }

  test("bm25TopK: saturation and length normalization match hand math") {
    val docs = Seq(
      (1L, "cat cat dog bird"),
      (2L, "cat bird bird"),
      (3L, "dog worm"),
      (4L, "bird worm worm")).toDF("doc_id", "text")
    // N=4, tot=12, avgdl_e3=3000; df(cat)=df(dog)=2 so idf_i=2
    // doc1: cat tf=2 dl=4 -> norm 1250, denom 3500 -> 2514285;
    //       dog tf=1 -> denom 2500 -> 1760000; sum 4274285
    // doc3: dog tf=1 dl=2 -> norm 750, denom 1900 -> 2315789
    // doc2: cat tf=1 dl=3 -> norm 1000, denom 2200 -> 2000000
    val got = TextOps.bm25TopK(docs, Seq("cat", "dog"), k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, 4274285L),
      (2L, 3L, 1L, 2315789L),
      (3L, 2L, 1L, 2000000L)))
  }

  test("bm25BatchTopK: each query's slice equals the single-query ranking") {
    val docs = Seq(
      (1L, "cat cat dog bird"), (2L, "cat bird bird"), (3L, "dog worm"),
      (4L, "bird worm worm"), (5L, "fish fish cat"), (6L, "dog dog dog"))
      .toDF("doc_id", "text")
    val queries = Seq((10L, "cat"), (10L, "dog"), (20L, "bird"))
      .toDF("query_id", "term")
    val batch = TextOps.bm25BatchTopK(docs, queries, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    for ((qid, terms) <- Seq(10L -> Seq("cat", "dog"), 20L -> Seq("bird"))) {
      val single = TextOps.bm25TopK(docs, terms, k = 10)
        .as[(Long, Long, Long, Long)].collect().toSeq
        .map { case (r, d, h, sc) => (qid, r, d, h, sc) }
      assert(batch.filter(_._1 == qid).sortBy(_._2) === single.sortBy(_._2),
        s"query $qid must rank identically to the single-query path")
    }
  }

  test("hybridRrfBatchTopK: each query's fusion equals its single-query hybrid") {
    val docs = Seq(
      (1L, "cat cat dog bird"), (2L, "cat bird bird"), (3L, "dog worm"),
      (4L, "bird worm worm"), (5L, "fish fish cat"), (6L, "dog dog dog"),
      (7L, "worm bird cat dog"), (8L, "moss fern")).toDF("doc_id", "text")
    val queries = Seq((10L, "cat dog"), (20L, "bird")).toDF("query_id", "qtext")
    val batch = TextOps.hybridRrfBatchTopK(docs, queries, k = 5, poolK = 20)
      .select("query_id", "rank", "doc_id", "rrf_e6")
      .as[(Long, Long, Long, Long)].collect().toSeq
    for ((qid, terms) <- Seq(10L -> Seq("cat", "dog"), 20L -> Seq("bird"))) {
      val single = TextOps.hybridRrfTopK(docs, terms, k = 5, poolK = 20)
        .select("rank", "doc_id", "rrf_e6")
        .as[(Long, Long, Long)].collect().toSeq
        .map { case (r, d, v) => (qid, r, d, v) }
      assert(batch.filter(_._1 == qid).sortBy(_._2) === single.sortBy(_._2),
        s"query $qid must fuse identically to the single-query path")
    }
  }

  test("hybridRrfTopK equals a Scala-side fusion of the two public rankings") {
    val docs = Seq(
      (1L, "cat cat dog bird"), (2L, "cat bird bird"), (3L, "dog worm"),
      (4L, "bird worm worm"), (5L, "fish fish cat"), (6L, "dog dog dog"),
      (7L, "worm bird cat dog"), (8L, "moss fern")).toDF("doc_id", "text")
    val qs = Seq("cat", "dog")
    val sparse = TextOps.bm25TopK(docs, qs, k = 20)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    val dense = docs
      .select(col("doc_id"), Similarity.hashEmbedding(col("text"), 8).as("emb"))
      .withColumn("q", Similarity.hashEmbedding(lit("cat dog"), 8))
      .withColumn("dot", expr("cast(aggregate(zip_with(emb, q, (x, y) -> x * y), " +
        "cast(0 as double), (acc, v) -> acc + v) as long)"))
      .orderBy(col("dot").desc, col("doc_id")).limit(20)
      .select("doc_id").as[Long].collect().toSeq
      .zipWithIndex.map { case (d, i) => d -> (i + 1).toLong }.toMap
    val expect = (sparse.keySet ++ dense.keySet).toSeq.map { d =>
      val s = sparse.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L)
      val dn = dense.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L)
      (d, s + dn)
    }.sortBy { case (d, v) => (-v, d) }.take(5)
    val got = TextOps.hybridRrfTopK(docs, qs, k = 5, poolK = 20)
      .select("doc_id", "rrf_e6").as[(Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("MisraGries: PODS'12 bound holds in the lossy regime (capacity << vocab)") {
    // skewed stream: term t_i has i occurrences, vocab 40 >> capacity 8
    val stream = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i"))
    val n = stream.size.toLong
    val cap = 8
    val terms = scala.util.Random.shuffle(stream).toDF("term").repartition(7)
    val row = graft.operators.Sketches.frequentTermsCheck(terms, capacity = cap, k = 10)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(row.size === 10)
    // exact top-10 are t40..t31 with counts 40..31; every row's bound
    // must hold: the heaviest terms all exceed N/(cap+1) = 820/9 ≈ 91?
    // no — max count is 40 < 91, so presence is NOT guaranteed by
    // theory here; floor_met may legitimately be false. Assert instead
    // the INVARIANT the sketch itself must satisfy: for every term the
    // estimate never exceeds truth and undershoots by at most N/(cap+1)
    val mg = new graft.operators.Sketches.MisraGries(cap)
    val est: Map[String, Long] =
      terms.as[String].select(mg.toColumn).collect().head
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    est.foreach { case (t, e) =>
      val truth = exact(t)
      assert(e <= truth, s"$t overestimated: $e > $truth")
      assert((truth - e) * (cap + 1) <= n, s"$t bound broken: $truth - $e")
    }
    assert(est.size <= cap)
    // and terms absent from the sketch are all light: truth <= N/(cap+1)
    exact.foreach { case (t, truth) =>
      if (!est.contains(t))
        assert(truth * (cap + 1) <= n, s"heavy $t ($truth) missing from sketch")
    }
  }

  test("frequentTermsCheck floor holds when capacity covers the vocabulary") {
    val terms = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ Seq.fill(20)("z")
    val got = graft.operators.Sketches
      .frequentTermsCheck(terms.toDF("term"), capacity = 8, k = 3)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got === Seq(("x", 50L, true), ("y", 30L, true), ("z", 20L, true)))
  }

  test("frequentTermsCheck: theory-heavy term forces a positive estimate (lossy, binding)") {
    // hot·(cap+1) = 500 > N = 120, so PODS'12 forces est ≥ hot − N/(cap+1)
    // = 76 > 0: the bound is load-bearing, not vacuously true. The 20
    // singletons overflow the 4 counters, so the sketch runs lossy.
    val terms = (Seq.fill(100)("hot") ++ (1 to 20).map(i => s"u$i")).toDF("term")
      .repartition(5)
    val cap = 4
    val got = Sketches.frequentTermsCheck(terms, capacity = cap, k = 1)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got === Seq(("hot", 100L, true)))
    val mg = new Sketches.MisraGries(cap)
    val est = terms.as[String].select(mg.toColumn).collect().head
    assert(est.getOrElse("hot", 0L) >= 76L && est("hot") <= 100L)
    // lossy regime really is lossy: some mass was decremented away
    assert(est.values.sum < 120L)
  }

  test("CountMin: estimates exact on a small vocabulary, floor row green") {
    // 4 distinct terms under a 5x1024 grid: an overcount would need
    // some OTHER term colliding in EVERY row — with this corpus and
    // the deterministic hash, estimates are exact
    val terms = (Seq.fill(7)("alpha") ++ Seq.fill(4)("beta") ++
      Seq.fill(2)("gamma") ++ Seq("delta")).toDF("term")
    val rows = Sketches.countMinCheck(terms, depth = 5, width = 1024, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSeq == Seq(("alpha", 7L, true), ("beta", 4L, true),
      ("gamma", 2L, true), ("delta", 1L, true)))
  }

  test("CountMin: never undercounts, even with forced collisions (width 2)") {
    // width 2, depth 1: heavy collisions by construction — the
    // deterministic half of the CM guarantee (est >= true) must
    // survive any amount of collision
    import org.apache.spark.sql.Row
    val data = (1 to 50).map(i => s"t${i % 7}")
    val terms = data.toDF("term")
    val cm = new Sketches.CountMin(1, 2)
    val sk = terms.as[String].select(cm.toColumn).toDF("_sk")
    val got = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .select(col("term"), col("n"),
        call_function("cm_estimate", col("_sk"), col("term"), lit(1), lit(2)).as("est"))
      .collect()
    got.foreach { case Row(t: String, n: Long, est: Long) =>
      assert(est >= n, s"cm_estimate($t) = $est undercounts true $n")
    }
    // and the two counters sum to every update made (depth 1)
    assert(got.map(_.getLong(1)).sum == 50L)
  }

  test("CountMin: merge-tree invariant — any partitioning yields the same sketch") {
    val terms = (1 to 200).map(i => s"w${i % 13}").toDF("term")
    def sketchOf(parts: Int): Seq[Long] = {
      val cm = new Sketches.CountMin(3, 64)
      terms.repartition(parts).as[String]
        .select(cm.toColumn).head().toSeq
    }
    assert(sketchOf(1) == sketchOf(7))
  }

  test("hllDistinctCheck holds its floor on the test events table") {
    val out = Sketches.hllDistinctCheck(Tables.events(spark, "/root/testdata/sf0.001"))
      .as[(String, Boolean)].collect()
    assert(out.nonEmpty && out.forall(_._2))
  }

  test("hllDistinctCheck flips floor_met when the floor is unreachable") {
    // maxErrPerMille = -1 makes the inequality unsatisfiable wherever
    // approx != 0 — proves the boolean actually measures, not asserts
    val out = Sketches.hllDistinctCheck(
      Tables.events(spark, "/root/testdata/sf0.001"), maxErrPerMille = -1)
      .as[(String, Boolean)].collect()
    assert(out.forall(!_._2))
  }

  test("quantileCheck: rank error within floor on documents, exact on a tiny frame") {
    val out = Sketches.quantileCheck(
      Tables.documents(spark, "/root/testdata/sf0.001"), "n_chars")
      .as[(Int, Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(500, 900, 990))
    assert(out.forall(_._2))
    // tiny frame, accuracy >> n: the sketch must be exact, any q
    val tiny = (1 to 100).map(i => i.toLong).toDF("v")
    val t = Sketches.quantileCheck(tiny, "v", qsPerMille = Seq(250, 750),
      maxRankErrPerMille = 0)
    assert(t.as[(Int, Boolean)].collect().forall(_._2))
  }

  test("quantileMaintenance: merged per-day sketches answer within bucket width; merge is exact") {
    import java.sql.Timestamp
    val rows = (0 until 1000).map { i =>
      // two "days", deterministic skewed values in [0, ~10)
      val day = if (i % 2 == 0) "2024-01-01" else "2024-01-02"
      val v = (i % 97) * 0.1 + (i % 7) * 0.01
      (Timestamp.valueOf(s"$day 12:00:00"), v)
    }
    val df = rows.toDF("ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("quant_spec").toString
    val out = Sketches.quantileMaintenance(df, s"$dir/sk",
      Seq((1, "2024-01-01", "2024-01-01"), (2, "2024-01-01", "2024-01-02")),
      qsPerMille = Seq(500, 900), scale = 100)
      .as[(Int, Int, Double, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq((1, 500), (1, 900), (2, 500), (2, 900)))
    // the range-2 answer must be within one bucket width (1/scale) of
    // the exact quantile over BOTH days — the merge adds counts
    // exactly, so the only error source is quantization
    val all = rows.map(_._2).sorted
    for ((rid, qpm, qv, n) <- out) {
      val vals = if (rid == 1) rows.filter(_._1.toString.startsWith("2024-01-01")).map(_._2).sorted else all
      assert(n == vals.size)
      val target = math.ceil(qpm * vals.size / 1000.0).toInt
      val exact = vals(target - 1)
      assert(math.abs(qv - exact) <= 0.01 + 1e-9,
        s"range $rid q$qpm: got $qv, exact $exact")
    }
    // exact-merge invariant: querying [d1,d2] through the sketch union
    // equals building ONE sketch over the whole frame directly
    val whole = Sketches.quantileMaintenance(
      df.withColumn("ts", lit(Timestamp.valueOf("2024-01-01 00:00:00"))),
      s"$dir/sk2", Seq((2, "2024-01-01", "2024-01-02")),
      qsPerMille = Seq(500, 900), scale = 100)
      .as[(Int, Int, Double, Long)].collect().toSeq
    assert(out.filter(_._1 == 2) == whole)
  }

  test("decontaminate flags exactly the docs sharing a 3-gram with the probe") {
    val probe = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "I saw the quick brown fox yesterday"), // shares 2 probe shingles
      (2L, "a quick brown dog sat still here"),    // bigram overlap only — clean
      (3L, "entirely unrelated words in this one"),
      (4L, "brown fox jumps highest of all")       // shares 1
    ).toDF("doc_id", "text")
    val got = TextOps.decontaminate(corpus, probe).orderBy("doc_id")
      .as[(Long, Long)].collect().toList
    assert(got === List((1L, 2L), (4L, 1L)))
  }

  test("decontaminate never shuffles the corpus text (broadcast probe)") {
    val probe = Seq((1L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((2L, "a b c d")).toDF("doc_id", "text")
    val plan = TextOps.decontaminate(corpus, probe)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("lmScore: corpus-frequent phrasing outscores token salad") {
    val docs = Seq(
      (1L, "the cat sat here"), (2L, "the cat sat there"),
      (3L, "the cat sat quietly"), // "the cat","cat sat" are corpus-frequent
      (4L, "zebra quartz vexes jumbo"), // every bigram unique
      (5L, "x")                         // <2 tokens: no row
    ).toDF("doc_id", "text")
    val got = TextOps.lmScore(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(5L))
    assert(got(4L)._3 < got(1L)._3, s"unique bigrams must score lower: $got")
    // V = 6 heads (the, cat, sat, zebra, quartz, vexes). doc 1 bigrams:
    // (the cat: 3/(3+6)), (cat sat: 3/9), (sat here: 1/9) ->
    // mean(333333333, 333333333, 111111111) = 259259259
    assert(got(1L) === ((1L, 3L, 259259259L)))
    // doc 4: singleton heads earn the smoothed floor 1/(1+6), NOT a
    // perfect 1.0 (the unsmoothed-c2/c1 trap this test pins)
    assert(got(4L) === ((4L, 3L, 142857143L)))
  }

  test("corpusDriftCheck: identical mixture is TV 0, disjoint languages are TV 1e6") {
    val corpus = Seq(
      (1L, "en", "one two three"), (2L, "en", "four five six"),
      (3L, "de", "ein zwei drei"), (4L, "de", "vier funf sechs")
    ).toDF("doc_id", "lang", "text")
    // the corpus against itself: both histograms identical
    val same = TextOps.corpusDriftCheck(corpus, corpus)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(same("lang") == (0L, false) && same("tok_bucket") == (0L, false))
    // a batch in a language the corpus has never seen: lang TV = 1.0
    val alien = Seq((9L, "zz", "uno dos tres")).toDF("doc_id", "lang", "text")
    val d = TextOps.corpusDriftCheck(corpus, alien)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(d("lang") == (1000000L, true), s"disjoint languages must be TV 1e6: $d")
    // same token-length bucket though: that metric stays quiet
    assert(d("tok_bucket") == (0L, false))
  }

  test("repetitionScore measures duplicate token and bigram fractions") {
    val docs = Seq(
      (1L, "a a a a"),          // 4 toks 1 distinct → 750000; bigrams "a a"×3 → 666667
      (2L, "w x y z"),          // all unique → 0, 0
      (3L, "go go go stop go"), // 5 toks 2 distinct → 600000; bigrams: go-go ×2(dup 1), go-stop, stop-go → 250000
      (4L, "solo"),             // 1 tok: no bigrams — guard path, not negative-index
      (5L, "")                  // empty: n=0 → all zeros
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionScore(docs).orderBy("doc_id")
      .as[(Long, Int, Long, Long)].collect().toList
    assert(got === List(
      (1L, 4, 750000L, 666667L),
      (2L, 4, 0L, 0L),
      (3L, 5, 600000L, 250000L),
      (4L, 1, 0L, 0L),
      (5L, 0, 0L, 0L)))
  }

  test("stripMarkup: script payload dies, entities decode ONE level, malformed degrades") {
    val docs = Seq(
      (1L, "<p>a <b>b</b></p><script>if (1 < 2) x();</script> c"),
      (2L, "<style>p { color: red }</style>keep<!-- gone -->"),
      (3L, "&amp;lt; stays-escaped &lt;real&gt; &quot;q&quot; &#39;s&#39; &amp; done"),
      (4L, "broken <tag attr=\"x\" unclosed text < alone stays"),
      (5L, "  spaced\t\tout\n\nlines  ")
    ).toDF("doc_id", "text")
    val got = TextOps.stripMarkup(docs).orderBy("doc_id")
      .as[(Long, String)].collect().toList
    assert(got === List(
      (1L, "a b c"),
      (2L, "keep"),
      // one-level decode: "&amp;lt;" → "&lt;", NEVER the double-decode to "<"
      (3L, "&lt; stays-escaped <real> \"q\" 's' & done"),
      // "<tag attr=\"x\" unclosed text <" spans to the next '>' it finds —
      // none here, so the '<'-run survives as text (graceful, no throw)
      (4L, "broken <tag attr=\"x\" unclosed text < alone stays"),
      (5L, "spaced out lines")))
  }

  test("char_grams: kernel equals the column formulation, order included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, expr, lit}
    // mixed-plane text: ASCII, accents (2-byte), CJK (3-byte), emoji +
    // U+20000 (4-byte, supplementary), repeats (memo hits), short and
    // 1-char words, leading/trailing/multiple whitespace
    val docs = Seq(
      (1L, "hello world hello a ab"),
      (2L, "  café naïve 的是了 😀x😀 "),
      (3L, "𠀀𠀀abc a"),
      (4L, ""),
      (5L, "hello hello hello")
    ).toDF("doc_id", "text")
    val maxN = 4
    // the pre-r16 buildSubwordVocab formulation, as one deterministic
    // nested-transform column (no explode/collect_list, so the gram
    // ORDER — word order, n ascending, position ascending — is pinned
    // by the expression itself)
    val legacy = docs.select(col("doc_id"), expr(
      s"""flatten(transform(filter(split(text, '\\\\s+'), t -> t <> ''),
         |  w -> flatten(transform(sequence(1, $maxN), n ->
         |    CASE WHEN length(w) >= n
         |    THEN transform(sequence(1, length(w) - n + 1), i -> substr(w, i, n))
         |    ELSE array() END))))""".stripMargin).as("gs"))
    val kernel = docs
      .select(col("doc_id"),
        call_function("char_grams", col("text"), lit(maxN)).as("gs"))
    val l = legacy.orderBy("doc_id").as[(Long, Seq[String])].collect().toMap
    val k = kernel.orderBy("doc_id").as[(Long, Seq[String])].collect().toMap
    assert(k.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(k(4L).isEmpty)
    for (id <- Seq(1L, 2L, 3L, 4L, 5L)) assert(k(id) === l(id), s"doc $id")
    assert(k(1L).take(7) === Seq("h", "e", "l", "l", "o", "he", "el"))
  }
}
