package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * over the `documents` table (builder brief: dedup, quality scoring,
  * token counting, language id, fingerprinting).
  *
  * Everything is built from codegen'd built-in expressions — no UDFs —
  * so whole-stage codegen spans the full pipeline. All outputs are
  * integers or strings (never computed doubles): cross-engine oracle
  * compares stay exact, and derived ratios are one division away for
  * the consumer.
  *
  * Scale posture: all per-doc operators are narrow (map-only);
  * aggregates are map-side-combinable on low-cardinality keys (lang,
  * hash-prefix). Exact dedup groups by a 128-bit content hash, never
  * the full text — at 100 TB the shuffle carries 16-byte keys instead
  * of document bodies.
  */
object TextOps {

  /** Whitespace tokenization, empty tokens dropped (leading/trailing
    * whitespace would otherwise yield "" tokens). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Exact dedup via content hash (SURVEY §7 step 6): one row per
    * distinct text, keeping the smallest doc_id — the deterministic
    * survivor rule. dup_count makes the collapse auditable.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
      .select("text_md5", "keep_doc_id", "dup_count")

  /** The composed corpus-preparation chain a training-data run
    * executes — normalize → quality-gate → dedup → per-survivor
    * metrics — as ONE declarative plan (the CCNet/RefinedWeb pipeline
    * shape):
    *
    *  1. canonical normalization (cleanText: NFC composition, case
    *     fold, whitespace collapse) so variant encodings gate and
    *     hash identically;
    *  2. quality gate on the CANONICAL text (token floor, punct
    *     ceiling, stopword floor);
    *  3. exact dedup on the canonical hash, min-doc_id survivor;
    *  4. survivors carry their gate metrics out for audit.
    *
    * Every stage semantically matches an independently oracle-checked
    * operator (normalize_text, quality_filter, dedup_exact /
    * dedup_normalized rows); the composition is the point: Catalyst
    * fuses the map-only normalize+gate stages into one codegen'd pass
    * over the corpus, and the dedup is exactDedup's group-by-hash
    * shape with the gate metrics riding the aggregate as GROUP
    * INVARIANTS — every row in a hash group carries the identical
    * canonical text, so its metrics (pure text functions) are equal
    * group-wide and `first` is deterministic. The whole chain is ONE
    * text scan and ONE 16-byte-hash shuffle, no join: a join-back
    * formulation would recompute the normalize+gate subtree for a
    * second full scan (Catalyst reuses exchanges, not arbitrary
    * subtrees). At 100 TB that is the minimum movement the semantics
    * allow: no stage materializes an intermediate corpus.
    */
  def corpusPipeline(docs: DataFrame): DataFrame =
    qualityGate(docs.select(col("doc_id"), cleanText(col("text")).as("text")))
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("dup_count"),
        first(col("n_tokens")).as("n_tokens"),
        first(col("punct_per_mille")).as("punct_per_mille"),
        first(col("stop_per_mille")).as("stop_per_mille"))
      .select("keep_doc_id", "text_md5", "dup_count",
        "n_tokens", "punct_per_mille", "stop_per_mille")

  /** Segment-level exact dedup — the span-granular sibling of
    * exactDedup (the line/paragraph dedup of CCNet/RefinedWeb-style
    * pipelines, on fixed windows of `segTokens` tokens since the
    * corpus convention is whitespace tokens, not lines): every
    * duplicated segment keeps ONE copy corpus-wide — the occurrence
    * with the smallest (doc_id, seg_idx) — and each document is
    * reassembled from its surviving segments in order. Emits every
    * input document (a fully-deduplicated one keeps an empty
    * clean_text) with segment/drop counts for audit.
    *
    * Scale shape — the corpus text crosses the wire ONCE: the dedup
    * decision runs on a (doc_id, seg_idx, md5) projection (16-byte
    * hashes shuffle, never segment text), winners collapse to one
    * int-array of surviving indices per doc (map-side-combinable
    * nothing — it's a plain collect_list after a win filter, bounded
    * by the doc's own segment count), and the only text movement is
    * the final equi-join of documents to their index arrays on
    * doc_id, with reassembly a map-side slice+join over the already
    * co-located tokens.
    */
  def segmentDedup(docs: DataFrame, segTokens: Int = 10): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    val k = segTokens
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    // one row per segment, hash only: pos from posexplode IS the
    // ordinal segment index (starts are 0, k, 2k, …; the tail segment
    // may be short)
    val marks = toks
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - 1, $k), " +
          s"j -> md5(cast(array_join(slice(toks, j + 1, $k), ' ') as binary)))")))
      .toDF("doc_id", "seg_idx", "seg_h")
    val firstWins = Window.partitionBy("seg_h").orderBy("doc_id", "seg_idx")
    val keptIdx = marks
      .withColumn("_rn", row_number().over(firstWins))
      .where(col("_rn") === 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("seg_idx"))).as("_kept"))
    val nSegs = ceil(size(col("toks")) / lit(k.toDouble)).cast("long")
    toks
      .join(keptIdx, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(expr(
          s"array_join(transform(_kept, i -> array_join(slice(toks, i * $k + 1, $k), ' ')), ' ')"),
          lit("")).as("clean_text"),
        nSegs.as("n_segments"),
        (nSegs - coalesce(size(col("_kept")), lit(0))).as("n_dropped"))
  }

  /** Boilerplate STRIP — the other answer to repeated text:
    * segmentDedup keeps a shared segment's FIRST occurrence (dedup
    * semantics), but template text (headers, footers, license
    * blurbs, nav chrome) shouldn't survive anywhere — the
    * RefinedWeb/CCNet line-dedup rationale (Penedo et al.,
    * arXiv:2306.01116 §3.2) applied at the fixed-token-segment
    * grain: a segment occurring in ≥ minDocs DISTINCT documents is
    * boilerplate and is removed from EVERY document, including the
    * first. minDocs separates template chrome (many docs) from
    * pairwise duplication (two docs — near-dup dedup's job, not
    * ours).
    *
    * Same scale shape as segmentDedup: the census and the strip
    * decision run on 16-byte md5 marks (text never shuffles), the
    * boilerplate hash set is small by construction (it's the heavy
    * tail of the segment-frequency distribution) so the anti-join
    * broadcasts, and reassembly slices the already-co-located token
    * array per doc.
    */
  def stripBoilerplate(
      docs: DataFrame,
      segTokens: Int = 10,
      minDocs: Int = 3): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    require(minDocs >= 2, "minDocs < 2 would strip every segment")
    val k = segTokens
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val marks = toks
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - 1, $k), " +
          s"j -> md5(cast(array_join(slice(toks, j + 1, $k), ' ') as binary)))")))
      .toDF("doc_id", "seg_idx", "seg_h")
    val boiler = marks.groupBy("seg_h")
      .agg(count_distinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select("seg_h")
    val keptIdx = marks
      .join(broadcast(boiler), Seq("seg_h"), "left_anti")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("seg_idx"))).as("_kept"))
    val nSegs = ceil(size(col("toks")) / lit(k.toDouble)).cast("long")
    toks
      .join(keptIdx, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(expr(
          s"array_join(transform(_kept, i -> array_join(slice(toks, i * $k + 1, $k), ' ')), ' ')"),
          lit("")).as("clean_text"),
        nSegs.as("n_segments"),
        (nSegs - coalesce(size(col("_kept")), lit(0))).as("n_boiler"))
  }

  /** The canonical clean-text Column — ONE definition shared by
    * normalizeText and every operator that composes it
    * (normalizedDedup), so "normalized" always means the same bytes:
    * Unicode NFC composition, lowercase, whitespace collapse, trim.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      lower(call_function("nfc_normalize", text)), "\\s+", " "))

  /** Canonical text normalization — the pass that runs BEFORE every
    * hash-based operator in the family: Unicode NFC composition (so
    * "é" and "e"+combining-acute hash identically), lowercase, and
    * whitespace collapse. Map-only, codegen'd (native nfc_normalize
    * expression); emits n_chars_raw/n_chars_clean so the composition
    * work is auditable.
    */
  def normalizeText(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      cleanText(col("text")).as("clean_text"),
      // long, matching the oracle engine's length() type
      length(col("text")).cast("long").as("n_chars_raw"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))

  /** Markup strip for web-scraped corpora — the step BEFORE every
    * text operator when the source is HTML: drop <script>/<style>
    * blocks WITH their payload (code and CSS are not training text),
    * drop HTML comments, drop every remaining tag, decode the five
    * standard entities ONE level (lt/gt/quot/#39 first, amp LAST —
    * this order decodes exactly one level: "&amp;lt;" → "&lt;", never
    * the double-decode to "<"), collapse whitespace runs, trim. A
    * regexp_replace chain, not a parser: map-only whole-stage
    * codegen, malformed nesting degrades gracefully (leftover text
    * survives, nothing throws) — the right trade for trillion-token
    * scrapes, and the regex subset used ((?is), non-greedy, character
    * classes) means the SAME patterns run under the DuckDB oracle
    * byte-for-byte.
    */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val noScript = regexp_replace(col("text"),
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    docs.select(col("doc_id"),
      trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"))
  }

  /** Exact duplicated-span detection at ANY offset — the dedup mode
    * fixed-window segmentDedup cannot see (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, motivates span-granular exact dedup): a
    * k-token span shared between two documents at offsets that
    * straddle the stride boundary aligns with no fixed window, so
    * stride-k hashing misses it; SLIDING windows at every token
    * offset are offset-invariant by construction. Emits
    * (doc_a, doc_b, n_shared_spans) per document pair sharing at
    * least one exact k-token span.
    *
    * Scale shape: one md5 per token position — only (hash, doc_id)
    * rows shuffle, never text; pairs come from an equi-join on the
    * span hash. Boilerplate guard: a span occurring in >spanCap docs
    * (license headers, navigation chrome) would contribute O(cap²)
    * pairs from one bucket, so ubiquitous spans are dropped BEFORE
    * the self-join (the same hot-bucket discipline as
    * minhashNearDup's bucketCap) — at the default cap this drops
    * only degenerate boilerplate, and the cap is replicated in the
    * oracle so the contract stays exact.
    */
  def duplicateSpans(docs: DataFrame, k: Int = 10, spanCap: Int = 1000): DataFrame = {
    require(k > 0, "k must be positive")
    // spread before the per-position explode: a narrow input keeps the
    // whole span-hash fan-out (|tokens| hashes per doc) in the scan's
    // few tasks — ScaleProbe measured a 220 MB single-task shuffle
    // write at 30× volume without it. Same wide-scan no-op rationale
    // as the shingle family (Similarity.spread).
    val wins = Similarity.spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $k), " +
          s"j -> md5(cast(array_join(slice(toks, j + 1, $k), ' ') as binary)))")).as("h"))
    val rare = wins.groupBy("h")
      .agg(count(lit(1)).as("_n"))
      .where(col("_n") <= spanCap)
      .select("h")
    val gated = wins.join(rare, Seq("h"), "left_semi")
    gated.as("x").join(gated.as("y"), Seq("h"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(countDistinct(col("h")).as("n_shared_spans"))
  }

  /** Sliding-window document chunking with overlap — the
    * retrieval/embedding prep pass (RAG-style): each document splits
    * into `chunkTokens`-token windows starting every `stride` tokens
    * (overlap = chunkTokens − stride), so no sentence straddling a
    * hard boundary is lost to both chunks. Emits
    * (doc_id, chunk_idx, chunk_text, n_chunk_tokens); the final
    * chunk may run short, and an empty document yields one empty
    * chunk (the doc stays addressable downstream). Map-only — a
    * projection + generator, no shuffle, no state; at 100 TB this is
    * a pure scan-through whose output feeds the embedding UDF batch
    * seam (Multimodal's mapInPandas shape) or cosineTopK directly.
    */
  def chunkDocs(
      docs: DataFrame,
      chunkTokens: Int = 50,
      stride: Int = 40): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens (overlap = chunkTokens - stride)")
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(s"sequence(0, greatest(size(toks) - 1, 0), $stride)"))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        expr(s"array_join(slice(toks, start + 1, $chunkTokens), ' ')").as("chunk_text"),
        expr(s"cast(least($chunkTokens, size(toks) - start) as int)").as("n_chunk_tokens"))
  }

  /** Normalize-then-dedup — the composition normalizeText's contract
    * promises (cleanText "runs BEFORE every hash-based operator"):
    * exact dedup keyed on the CANONICAL text, so case flips,
    * NFC-decomposed sequences and whitespace variants collapse into
    * one group where raw exactDedup keeps them apart. n_raw_variants
    * is the audit contrast: the count of distinct RAW hashes inside
    * each normalized group — > 1 exactly where normalization dropped
    * a row the raw pass missed.
    *
    * Scale shape: one map-only projection of each document to two
    * 16-byte hashes (raw + canonical; bodies never shuffle), then a
    * single partial-aggregating groupBy on the canonical hash.
    */
  def normalizedDedup(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("raw_md5"),
        md5(cleanText(col("text")).cast("binary")).as("norm_md5"))
      .groupBy("norm_md5")
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("dup_count"),
        countDistinct(col("raw_md5")).as("n_raw_variants"))

  /** Per-language corpus stats: doc/char/token totals + extrema.
    * Map-side-combinable aggregate on a tiny key (|langs|). */
  def textStats(docs: DataFrame): DataFrame =
    docs
      // token_fingerprint, not token_profile: only the token COUNT is
      // consumed here, and the fingerprint pass is allocation-free
      // where the profile builds a uniq HashSet per row
      .select(col("lang"), col("n_chars"),
        call_function("token_fingerprint", col("text"))
          .getField("n_tokens").as("toks"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("toks").as("total_tokens"),
        min("toks").as("min_tokens"),
        max("toks").as("max_tokens"))
      .orderBy("lang")

  private val stopwords = Seq(
    "the", "a", "an", "of", "and", "or", "is", "in", "to", "for")
  private val stopCsv = stopwords.mkString(",")

  /** One fused pass per doc (native token_profile): the column
    * formulation re-split the text once per consuming expression
    * (CollapseProject inlines split into each of the 3-4 token
    * consumers) and materialized a punctuation-stripped copy via
    * regexp_replace. Referenced >once, the struct stays a separate
    * projection — CollapseProject only inlines single-use or cheap
    * expressions — so it's evaluated once per row.
    */
  private def profile: Column = call_function("token_profile", col("text"), lit(stopCsv))

  /** Per-doc quality profile: token/unique-token/stopword/punct counts
    * (the classic length+punct+stopword quality heuristics, kept as raw
    * integers — ratios are consumer-side divisions).
    */
  def docTokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), profile.as("p"))
      .select(
        col("doc_id"),
        col("p.n_tokens").as("n_tokens"),
        col("p.n_uniq_tokens").as("n_uniq_tokens"),
        col("p.n_stop_tokens").as("n_stop_tokens"),
        col("p.n_punct_chars").as("n_punct_chars"),
        col("p.n_chars").as("n_chars_measured"))

  /** The quality GATE a training-data pipeline actually runs (docTokens
    * is the profile; this is the filter): keep documents with at least
    * minTokens tokens, punctuation density at or below
    * maxPunctPerMille, and stopword density at or beyond
    * minStopPerMille (the classic gibberish/boilerplate screens).
    * Densities are INTEGER per-mille values via integral division —
    * no float crosses the oracle boundary. Map-only, codegen'd,
    * filter-pushdown friendly.
    */
  def qualityFilter(
      docs: DataFrame,
      minTokens: Int = 5,
      maxPunctPerMille: Int = 150,
      minStopPerMille: Int = 10): DataFrame =
    qualityGate(docs, minTokens, maxPunctPerMille, minStopPerMille)
      .select("doc_id", "n_tokens", "punct_per_mille", "stop_per_mille")

  /** The same gate PRESERVING the document row (plus the three gate
    * metrics): what an ingest pipeline — batch or streaming — applies
    * before landing documents. Stateless and codegen'd, so it runs
    * unchanged on a stream (see streaming.IncrementalSync
    * .documentIngest); qualityFilter above is its scoreboard
    * projection.
    *
    * The stopword floor is ENGLISH-ONLY by construction (the list is
    * English function words): fluent non-English text scores ~0 and
    * would be rejected. A multilingual pipeline must partition by
    * langId first and either apply a per-language stopword set or set
    * minStopPerMille = 0 for non-English strata — the gate is a
    * per-stratum screen, not a corpus-wide one.
    */
  def qualityGate(
      docs: DataFrame,
      minTokens: Int = 5,
      maxPunctPerMille: Int = 150,
      minStopPerMille: Int = 10): DataFrame =
    docs
      .select(col("*"), explode(array(profile)).as("_p"))
      .withColumn("n_tokens", col("_p.n_tokens"))
      .withColumn("punct_per_mille",
        expr("(_p.n_punct_chars * 1000L) div greatest(_p.n_chars, 1)"))
      .withColumn("stop_per_mille",
        expr("(_p.n_stop_tokens * 1000L) div greatest(_p.n_tokens, 1)"))
      .filter(
        col("n_tokens") >= minTokens &&
          col("punct_per_mille") <= maxPunctPerMille &&
          col("stop_per_mille") >= minStopPerMille)
      .drop("_p")

  /** GPT-2-style pre-tokenizer shape, constrained to constructs both
    * Java regex and RE2 share (no lookahead): a leading-space word,
    * a leading-space number run, a leading-space punctuation run, or
    * residual whitespace. Counting matches approximates BPE token
    * counts well enough for corpus budgeting.
    */
  private val bpeIsh = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** Token-count estimates per doc: whitespace tokens (the cheap
    * floor) and BPE-ish regex tokens (the budgeting estimate).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      call_function("token_fingerprint", col("text"))
        .getField("n_tokens").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(bpeIsh), lit(0))).as("bpe_ish_tokens"))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    // zh: highest-frequency function characters, counted as whitespace
    // tokens — covers the corpus's zh stratum (VERDICT r7 #8). Real
    // CJK text needs char-level segmentation before this gate; the
    // marker floor itself is segmentation-agnostic once tokens exist.
    "zh" -> Seq("的", "是", "了", "在", "有"))

  /** Argmax-with-fixed-precedence vote, derived from langMarkers order
    * (en > de > es > fr > zh): language i wins when its hits are >=
    * every LATER language's hits — earlier languages already had their
    * chance higher in the chain. One derivation shared by langId and
    * qualityFilterMultilang, so adding a language is a one-line
    * langMarkers edit, not three hand-edited when-chains.
    */
  private def voteLang(h: String => Column): Column = {
    val langs = langMarkers.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (l, i) =>
      (langs.drop(i + 1).map(o => h(l) >= h(o)).reduce(_ && _), l)
    }
    whens.tail
      .foldLeft(when(whens.head._1, whens.head._2)) {
        case (acc, (c, l)) => acc.when(c, l)
      }
      .otherwise(langs.last)
  }

  /** The guessed language's own hit count, same derived dispatch. */
  private def guessHits(guess: Column, h: String => Column): Column = {
    val langs = langMarkers.map(_._1)
    langs.init.foldRight(h(langs.last)) {
      (l, acc) => when(guess === l, h(l)).otherwise(acc)
    }
  }

  /** Language id via stopword-marker voting (the n-gram-free heuristic
    * a zero-dependency pipeline starts with): count marker hits per
    * candidate language, pick the argmax with langMarkers-order
    * precedence for ties (see voteLang). Emits the per-language hit
    * counts so the decision is auditable and oracle-checkable.
    */
  def langId(docs: DataFrame): DataFrame = {
    // ONE tokenization for all marker sets (count_tokens_multi): even
    // the per-set native counters re-split the text once per language
    // — 4 tokenizations per row at 4 candidate languages
    val multi = call_function("count_tokens_multi",
      col("text"), lit(langMarkers.map(_._2.mkString(",")).mkString("|")), lit(true))
    val h = (l: String) => col(s"hits_$l")
    docs
      .select(col("doc_id"), multi.as("_h"))
      .select(col("doc_id") +: langMarkers.zipWithIndex.map {
        case ((lang, _), i) => col("_h").getItem(i).as(s"hits_$lang")
      }: _*)
      .withColumn("lang_guess", voteLang(h))
  }

  /** Per-language quality gate (the multilingual composition the
    * English-only qualityGate scaladoc prescribes): langId's marker
    * voting guesses the language, and the stopword floor is evaluated
    * against the GUESSED language's marker set, so fluent non-English
    * text passes where the English list would starve it of hits. A doc
    * guessed as a language whose markers it barely contains still
    * fails the floor — the honest outcome for an unmodeled language;
    * all five corpus strata (en/de/es/fr/zh) are modeled.
    * `passes_en_floor` carries the contrast: whether the English-only
    * stopword floor (the 10-word qualityGate list) would also have
    * admitted the doc.
    * Same scale posture as the monolingual gate: one fused profile
    * pass + one multi-set counting pass, map-only, codegen'd.
    */
  def qualityFilterMultilang(
      docs: DataFrame,
      minTokens: Int = 5,
      maxPunctPerMille: Int = 150,
      minStopPerMille: Int = 10): DataFrame = {
    val multi = call_function("count_tokens_multi",
      col("text"), lit(langMarkers.map(_._2.mkString(",")).mkString("|")), lit(true))
    val h = (l: String) => col(s"_hits_$l")
    docs
      // one Generate barrier for BOTH per-row passes (see qualityGate):
      // the argmax vote + gate below reference the hit counts ~90 times
      // across filter conjuncts, and alias substitution through a
      // pushed filter re-inlines the tokenizer (and, in the planted
      // driver row, the whole text-inflation chain) per reference
      .select(col("doc_id"),
        explode(array(struct(profile.as("p"), multi.as("h")))).as("_ph"))
      .withColumn("_p", col("_ph.p"))
      .withColumn("_h", col("_ph.h"))
      .select((Seq(col("doc_id"), col("_p")) ++ langMarkers.zipWithIndex.map {
        case ((lang, _), i) => col("_h").getItem(i).as(s"_hits_$lang")
      }): _*)
      .withColumn("lang_guess", voteLang(h))
      .withColumn("_guess_hits", guessHits(col("lang_guess"), h))
      .withColumn("n_tokens", col("_p.n_tokens"))
      .withColumn("punct_per_mille",
        expr("(_p.n_punct_chars * 1000L) div greatest(_p.n_chars, 1)"))
      .withColumn("stop_per_mille",
        expr("(_guess_hits * 1000L) div greatest(n_tokens, 1)"))
      .withColumn("passes_en_floor",
        expr("(_p.n_stop_tokens * 1000L) div greatest(_p.n_tokens, 1)")
          >= minStopPerMille)
      .filter(col("n_tokens") >= minTokens &&
        col("punct_per_mille") <= maxPunctPerMille &&
        col("stop_per_mille") >= minStopPerMille)
      .select("doc_id", "lang_guess", "n_tokens", "stop_per_mille", "passes_en_floor")
  }

  /** PII redaction — the scrub a training-data pipeline runs before
    * any document leaves the ingest boundary: emails, IPv4 addresses,
    * and phone numbers replaced by category tokens, with per-category
    * match counts kept for audit. One fused native expression
    * (pii_scrub): each category is a single counting-splicing matcher
    * walk instead of a regexp_count + regexp_replace pair, and the
    * whole scrub stays inside whole-stage codegen. Map-only — no
    * shuffle at any scale.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("_s", call_function("pii_scrub", col(textCol)))
      .withColumn("clean_text", col("_s.clean"))
      .withColumn("n_emails", col("_s.n_emails"))
      .withColumn("n_ips", col("_s.n_ips"))
      .withColumn("n_phones", col("_s.n_phones"))
      .drop("_s")

  /** Corpus top terms with collection AND document frequency — the
    * vocabulary/IDF table a pipeline derives before TF-IDF weighting
    * or stopword discovery. Two-level aggregation instead of
    * countDistinct: groupBy(term, doc_id) then groupBy(term) keeps
    * BOTH shuffles map-side-combinable (count-distinct over an
    * exploded token stream would Expand every token row), so the first
    * shuffle carries at most |distinct (term, doc)| partial counts,
    * never the raw token stream. Final top-k is a TakeOrderedAndProject
    * (per-partition heap, k rows to the driver), not a global sort.
    * Ties break on the term itself, so the k rows are deterministic.
    */
  def topTerms(docs: DataFrame, k: Int = 25): DataFrame =
    docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(sum("tf").as("n"), count(lit(1)).as("df"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)

  /** Rank-id VOCABULARY build — the tokenizer-training precursor
    * (word-level; a BPE trainer starts from exactly this frequency
    * table): count every whitespace token corpus-wide, cut the tail
    * below minCount, cap at maxSize, and assign ids by
    * (count desc, token asc). The id rule is a pure function of the
    * counts, so independently-built shards agree on every id without
    * coordination, and the DuckDB oracle replays it exactly.
    *
    * Scale: one map-side-combinable count per token (the only
    * corpus-wide shuffle, token-keyed), then the cap happens as a
    * DISTRIBUTED top-maxSize (TakeOrderedAndProject — each partition
    * forwards ≤ maxSize rows) BEFORE the rank window, so the
    * single-partition window only ever sees the maxSize-bounded
    * result, never the raw vocabulary (a web-scale corpus has
    * hundreds of millions of distinct tokens; ranking those in one
    * window would be the classic silent degeneration).
    */
  def buildVocab(
      docs: DataFrame,
      minCount: Long = 2L,
      maxSize: Int = 10000): DataFrame = {
    val counts = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    counts
      .orderBy(col("n").desc, col("token")).limit(maxSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
      .select("token_id", "token", "n")
  }

  /** Subword vocabulary for the wordpiece encoder: the most frequent
    * character n-grams (1..maxNgram) of the corpus' whitespace words,
    * counted by OCCURRENCE, floored at minCount, capped at maxSize by
    * (count desc, unit asc) — buildVocab's exact discipline one level
    * down (same distributed top-maxSize shape; the single-partition
    * rank window only ever sees the bounded result). Ids are 1-based;
    * 0 is the encoder's reserved UNK. A character too rare to make
    * the cut simply encodes as UNK — the vocabulary IS the model.
    */
  def buildSubwordVocab(
      docs: DataFrame,
      maxNgram: Int = 4,
      minCount: Long = 5L,
      maxSize: Int = 512): DataFrame = {
    // r16: one native char_grams kernel (per-thread word memo — words
    // are zipf-heavy, so the code-point walk runs once per DISTINCT
    // word per task) replaces the per-n sequence+transform+substr
    // column chain, whose substr(w, i, n) re-scanned the word's bytes
    // from position 0 per gram (O(L²) per word per n) and allocated
    // four intermediate arrays per token row before the flatten.
    // Gram multiset and order are bit-identical by construction
    // (HashOps.charGrams scaladoc); TextSketchSpec's "char_grams:
    // kernel equals the column formulation" pins equality against the
    // original column formulation.
    val counts = docs
      .select(explode(call_function("char_grams",
        col("text"), lit(maxNgram))).as("unit"))
      .groupBy("unit").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    counts
      .orderBy(col("n").desc, col("unit")).limit(maxSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("unit"))))
      .select("token_id", "unit", "n")
  }

  /** Encode every document against a subword vocabulary (greedy
    * longest-match — the wordpiece_encode expression; HashOps has the
    * algorithm contract). The vocab is bounded by construction
    * (buildSubwordVocab caps it), so the driver-side collect here is
    * the centroid/codebook discipline, and the encode itself is one
    * codegen'd map pass — no shuffle, no join against the vocab.
    */
  def subwordEncode(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val rows = vocab.select("unit", "token_id").limit(65537).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    // the collect is safe ONLY because the vocab is bounded; an
    // unbounded frame here would be a driver OOM, so fail loudly
    // instead (the fitPqCodebooks bounded-collect discipline)
    require(rows.length <= 65536,
      "subwordEncode: vocab exceeds 65536 units — pass a bounded vocabulary")
    val enc = call_function("wordpiece_encode", col("text"),
      typedLit(rows.map(_._1).toSeq), typedLit(rows.map(_._2).toSeq))
    docs.select(col("doc_id"), enc.as("e"))
      .select(col("doc_id"), col("e.n_pieces"), col("e.n_unk"), col("e.id_sum"))
  }

  /** Per-document top-k terms by TF-IDF — the keyword/relevance
    * weighting downstream of topTerms' vocabulary table. Deliberately
    * LOG-FREE like lmScore: idf is the rational N/df, not ln(N/df)
    * (ln() is not bit-identical across engines), so the score is
    * tf·N·1e6 div df — exact 64-bit integer arithmetic on both sides
    * of the oracle. Linear idf weights rarity more steeply than the
    * log form and can order a document's terms differently; that is
    * the documented contract of this operator, not an approximation
    * drift.
    *
    * Scale: same two map-side-combinable aggregations as topTerms
    * (never a countDistinct Expand), one equi-join of per-(doc,term)
    * tf against the |vocab|-sized df table, N as a broadcast 1-row
    * aggregate, and the per-doc top-k is a rank-pushdown window
    * (WindowGroupLimit keeps ≤ k rows per doc per task pre-shuffle).
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val terms = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf_e6").desc, col("term"))
    tf.join(dfTbl, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_e6", expr("tf * 1000000L * _n div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "tfidf_e6")
  }

  /** Sparse TF-IDF cosine similarity pairs — the SPARSE complement of
    * the dense embedding near-dup family: topical/lexical similarity
    * from the term-weight vectors themselves, no embedding model in
    * the loop. The vector space is the df-PRUNED vocabulary: terms in
    * more than `dfCap` documents are dropped from every vector (their
    * idf carries ~no signal, and — the scale reason — each surviving
    * term joins at most dfCap docs, so the term self-join fans out
    * ≤ dfCap²/2 pairs per term BY CONSTRUCTION, an absolute bound
    * that does not grow with the corpus; the hot-term blowup every
    * naive sparse-similarity join dies on is excluded from the space,
    * not capped after the fact). Weights are integer on purpose:
    * w = tf · min(idfCap, N div df) — a distributed double dot-sum is
    * order-dependent, but integer dots/norms are exact in any order,
    * so sim_e6 = round(1e6·dot/(‖a‖‖b‖)) is bit-identical on both
    * engine sides. The idf cap saturates the rarity boost (the
    * log-free analog of tfidfTopK's linear idf, bounded so w² sums
    * stay far from overflow). Candidate generation and the dot ride
    * ONE self-join on term (a pair's dot aggregates its shared
    * surviving terms; pairs sharing nothing never materialize).
    */
  def tfidfCosinePairs(
      docs: DataFrame,
      dfCap: Int = 100,
      idfCap: Int = 20,
      simE6Min: Long = 400000L): DataFrame = {
    val terms = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val w = tf.join(dfTbl, "term")
      .filter(col("df") <= dfCap)
      .crossJoin(broadcast(n)) // 1-row corpus size
      .withColumn("w", col("tf") * least(lit(idfCap.toLong), expr("_n div df")))
      .select("doc_id", "term", "w")
    val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val dots = w.as("a").join(w.as("b"), Seq("term"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2_a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(lit(1e6) * col("dot") / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
          .cast("long").as("sim_e6"))
      .filter(col("sim_e6") >= simE6Min)
  }

  /** Benchmark decontamination: which corpus documents share ANY word
    * 3-gram with a probe (evaluation/benchmark) set, and how many
    * distinct shingles overlap. The standard pre-training hygiene
    * step — training text that textually overlaps the eval set
    * invalidates the eval — expressed as shingle-explode + equi-join:
    * the probe side collapses to DISTINCT shingles and is
    * broadcast (benchmark suites are MBs; the corpus is the 100 TB
    * side and is never shuffled by this query — the only exchange
    * carries (doc_id, partial count) pairs from the map-side-combined
    * aggregate). Output has one row per CONTAMINATED doc; clean docs
    * are absent (it is a flag list, not a score for every doc).
    */
  def decontaminate(corpus: DataFrame, probe: DataFrame): DataFrame = {
    val probeShingles = probe
      .select(explode(Similarity.shingles(col("text"))).as("sh"))
      .distinct()
    corpus
      .select(col("doc_id"), explode(Similarity.shingles(col("text"))).as("sh"))
      .join(broadcast(probeShingles), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
  }

  /** DSIR-style importance selection (Xie et al. NeurIPS'23,
    * arXiv:2302.03169): pick from a raw POOL the documents whose
    * token distribution looks most like a TARGET corpus — the
    * data-selection step between crawling and training, with the
    * target standing in for "quality" (the paper uses Wikipedia+books;
    * the driver row uses the corpus's own English slice). The paper
    * weights docs by a hashed-n-gram log-likelihood ratio and
    * Gumbel-resamples; this is the repo's integer-exact analog: each
    * term carries a smoothed count-ratio weight
    * `ratio_e6 = ((ct+1)·1e6) div (cp+1)` (target count over pool
    * count — rises for target-distinctive vocabulary, falls toward 0
    * for pool-only vocabulary; add-one smoothing keeps it defined
    * everywhere), a doc scores the MEAN ratio over its tokens (the
    * per-token normalization that removes length bias, standing in
    * for the per-token log-LR mean), and selection is deterministic
    * top-n. Monotonicity, not the paper's exact estimator, is the
    * contract — and it is bit-replayable on both engines.
    *
    * Scale: two corpus-sized map-side-combinable counts, ONE
    * token→weight equi-join (shuffle keyed on term — the weight table
    * is vocabulary-sized, built from the pool's own tokens so every
    * pool token hits), and a TakeOrderedAndProject top-n. Docs with
    * zero alphabetic tokens carry no evidence either way and are
    * absent from the output. */
  /** BPE merge-pair training (Sennrich, Haddow & Birch ACL'16) — the
    * TRAINING half of the tokenizer family, next to the wordpiece
    * greedy-inference encode: learn the top `nMerges` byte-pair
    * merges from the corpus, returning the merge table itself
    * (round, lhs, rhs, merged, pair_n) — the artifact a tokenizer
    * ships. Each round merges the most frequent adjacent symbol pair
    * (ties: count desc, lhs asc, rhs asc — fully deterministic, so
    * the DuckDB oracle replays every round as a chained CTE).
    *
    * Scale: training runs on the WORD VOCABULARY with occurrence
    * counts (one corpus-sized count up front; every round after is
    * vocabulary-sized — pair statistics are identical because a
    * word's pairs are weighted by its count, the standard BPE scale
    * trick). A round is one map-side-combinable pair aggregate, a
    * 1-row argmax collect, and a map-only fold applying the merge.
    * The fold IS exact left-to-right non-overlapping BPE merging:
    * the accumulator's last symbol merges with the incoming symbol
    * iff they form the pair, and a just-merged symbol (now `lhs‖rhs`)
    * can never re-merge as `lhs` in the same round (spec-pinned on
    * the aaa/abab shapes). localCheckpoint per round keeps the plan
    * flat across rounds (the PageRank discipline). */
  def bpeTrain(docs: DataFrame, nMerges: Int = 8): DataFrame =
    bpeCore(docs, nMerges)._1

  /** The corpus segmentation AT the learned merges — what a trained
    * tokenizer actually ships applied back to its own vocabulary:
    * every distinct word with its occurrence count, its piece
    * sequence after all `nMerges` merges, and the piece count. Same
    * fold, same determinism; the oracle replays the full merge chain
    * and reads the terminal seqs CTE. */
  def bpeSegmentation(docs: DataFrame, nMerges: Int = 8): DataFrame =
    bpeCore(docs, nMerges)._2
      .withColumn("n_pieces", size(split(col("seq"), " ")).cast("long"))
      .select("w", "n", "seq", "n_pieces")

  private def bpeCore(docs: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        t => length(t) >= 1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("seq", expr(
        "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), ' ')"))
      .select("w", "n", "seq")
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (round <- 1 to nMerges) {
      // zip_with over shifted slices: a 1-symbol word yields zero
      // pairs (slice length 0 → empty), never a negative-step
      // sequence or an out-of-range subscript
      val best = vocab
        .select(col("n"), split(col("seq"), " ").as("s"))
        .select(col("n"), explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
            "(x, y) -> struct(x AS a, y AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()
      require(best.nonEmpty,
        s"corpus exhausted after ${round - 1} merges — every word is one symbol; " +
          "ask for fewer merges")
      val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      val m = a + b
      merges += ((round.toLong, a, b, m, cnt))
      def q(s: String) = "'" + s + "'" // symbols are [a-z]+ — no escaping needed
      vocab = vocab.withColumn("seq", expr(
        s"aggregate(split(seq, ' '), '', (acc, x) -> " +
          s"CASE WHEN acc = '' THEN x " +
          s"WHEN (acc = ${q(a)} OR acc LIKE ${q("% " + a)}) AND x = ${q(b)} " +
          s"THEN CASE WHEN acc = ${q(a)} THEN ${q(m)} " +
          s"ELSE concat(left(acc, length(acc) - ${a.length + 1}), ' ', ${q(m)}) END " +
          s"ELSE concat(acc, ' ', x) END)"))
        .localCheckpoint(true)
    }
    (merges.result().toDF("round", "lhs", "rhs", "merged", "pair_n"), vocab)
  }

  /** The shared scoring pass: (doc_id, n_toks, score_e6) for every
    * pool doc with ≥1 alphabetic token. */
  private def importanceScores(pool: DataFrame, target: DataFrame): DataFrame = {
    def toks(docs: DataFrame) = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
    val poolToks = toks(pool)
    val cp = poolToks.groupBy("term").agg(count(lit(1)).as("cp"))
    val ct = toks(target).groupBy("term").agg(count(lit(1)).as("ct"))
    val ratio = cp.join(ct, Seq("term"), "left_outer")
      .withColumn("ratio_e6",
        expr("((coalesce(ct, 0L) + 1) * 1000000) div (cp + 1)"))
      .select("term", "ratio_e6")
    poolToks.join(ratio, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("ratio_e6")).as("tot_e6"))
      .withColumn("score_e6", expr("tot_e6 div n_toks"))
      .select("doc_id", "n_toks", "score_e6")
  }

  def importanceSelect(pool: DataFrame, target: DataFrame, n: Int = 20): DataFrame = {
    val scored = importanceScores(pool, target)
      .orderBy(col("score_e6").desc, col("doc_id")).limit(n)
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("score_e6").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "n_toks", "score_e6")
  }

  /** The RESAMPLING half of DSIR (the paper's step 3, de-randomized):
    * instead of a deterministic top-n, keep each pool doc with
    * probability proportional to its importance score — the shape
    * that preserves distributional coverage where top-n collapses
    * onto the mode. The coin is the repo's standard md5 gate (a pure
    * function of doc_id — the same doc gets the same verdict on both
    * engines and across reruns): keep iff u16·max < score·65536,
    * where u16 is the first 4 md5 hex digits of the id as an integer,
    * so inclusion probability is score_e6/max_score_e6 exactly (the
    * top-scoring doc is always kept, a zero-score doc never). All
    * integer comparisons — no float thresholds to drift.
    *
    * Scale: the scoring pass is importanceSelect's; the gate adds one
    * broadcast 1-row max aggregate and a map-only filter. Stated
    * trade: the max branch RE-DERIVES the scoring plan (Spark shares
    * no subplans without materialization), so the corpus is scored
    * twice; at a scale where that matters, materialize
    * importanceScores once (e.g. a snapshot commit) and gate the
    * stored frame — the gate itself is a pure function of
    * (doc_id, score, max). */
  def importanceSample(pool: DataFrame, target: DataFrame): DataFrame = {
    val mx = importanceScores(pool, target).agg(max(col("score_e6")).as("_mx"))
    importanceScores(pool, target)
      .crossJoin(broadcast(mx))
      .withColumn("u16", expr(
        "cast(conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 4), " +
          "16, 10) as bigint)"))
      .filter(expr("u16 * _mx < score_e6 * 65536"))
      .select("doc_id", "n_toks", "score_e6")
  }

  /** BM25 ranked retrieval (Okapi BM25, Robertson & Zaragoza FnTIR'09
    * eq. 3.15) — the SPARSE half of the retrieval family, next to the
    * dense cosine/ANN chain: rank documents for a bag of query terms
    * by term-frequency saturation (k1) and length normalization (b).
    * Integer-exact variant: the log idf is replaced by the saturated
    * linear idf tfidfCosinePairs already uses (min(idfCap, N div df)
    * — monotone in rarity, capped), and k1/b arrive e3-scaled, so
    * every score is a pure integer expression both engines evaluate
    * bit-identically (a distributed double sum is order-dependent;
    * integer sums are exact in any order).
    *
    * Scale: the scored set is bounded by docs CONTAINING a query term
    * (the posting lists, never the corpus); dl/avgdl ride two
    * map-side-combinable counts; df is |queryTerms| rows; the final
    * top-k is orderBy+limit = TakeOrderedAndProject (per-partition k
    * then merge — no global sort, no single-partition window; the
    * row_number ranking runs on the ≤k survivors only).
    */
  def bm25TopK(
      docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1E3: Long = 1200L, bE3: Long = 750L, idfCap: Long = 1000L): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("_n"), sum(col("dl")).as("_tot"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(dfTbl, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("contrib_e6", expr(
        s"least(${idfCap}L, _n div df) * tf * ${k1E3 + 1000}L * 1000000 div " +
          s"(tf * 1000 + ((${k1E3}L * ((1000 - ${bE3}L) + " +
          s"((${bE3}L * dl * 1000) div ((_tot * 1000) div _n)))) div 1000))"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id")).limit(k)
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("score_e6").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "n_hits", "score_e6")
  }

  /** BM25 for a BATCH of queries — the production retrieval shape
    * (N queries against the corpus in one plan, not N plans): same
    * integer-exact scoring as bm25TopK, with the query set arriving
    * as a (query_id, term) DataFrame. Term statistics (tf, df, dl,
    * avgdl) are computed ONCE and shared across queries — a term's
    * df is a corpus property, not a query property — then each
    * query's contributions assemble through one broadcast join
    * against the (small) query-term table. The per-query top-k is a
    * rank-over-partition window, which Spark plans as
    * WindowGroupLimit: ≤k rows per query survive per task BEFORE the
    * shuffle (the stratifiedTopN discipline — no per-query global
    * sort, no corpus-wide window). */
  def bm25BatchTopK(
      docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1E3: Long = 1200L, bE3: Long = 750L, idfCap: Long = 1000L): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("_n"), sum(col("dl")).as("_tot"))
    val qt = queries.select("query_id", "term").distinct()
    val tf = toks.join(broadcast(qt.select("term").distinct()), "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_e6").desc, col("doc_id"))
    tf.join(dfTbl, "term")
      .join(broadcast(qt), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("contrib_e6", expr(
        s"least(${idfCap}L, _n div df) * tf * ${k1E3 + 1000}L * 1000000 div " +
          s"(tf * 1000 + ((${k1E3}L * ((1000 - ${bE3}L) + " +
          s"((${bE3}L * dl * 1000) div ((_tot * 1000) div _n)))) div 1000))"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"), sum(col("contrib_e6")).as("score_e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "n_hits", "score_e6")
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher SIGIR'09): fuse the sparse BM25 ranking with a dense
    * embedding ranking by Σ 1/(rrfK + rank) — the standard hybrid
    * search combiner, robust to the two scores living on
    * incommensurable scales because only RANKS enter the fusion.
    * The dense list ranks documents by integer dot product against
    * the query text's own hash-projection embedding (the zero-egress
    * stand-in at the model seam; Similarity.hashEmbedding — sign
    * sums, so the dot is integer-exact in floats and the DuckDB
    * oracle replays it through the md5 formula). rrf contribution is
    * e6-scaled integer division, so fusion is exact on both engines;
    * a doc absent from one list contributes 0 from it.
    *
    * Scale: two independent top-poolK retrievals (each
    * TakeOrderedAndProject, corpus never globally sorted), then a
    * ≤2·poolK-row fusion — the fuse step is driver-trivial by
    * construction, and each retrieval carries its own 100 TB posture
    * (posting-list-bounded sparse side; map-only embed + top-k dense
    * side).
    */
  /** Hybrid retrieval for a BATCH of queries — bm25BatchTopK's shared
    * statistics on the sparse side, one corpus embedding pass scored
    * against every broadcast query embedding on the dense side (each
    * per-query top-poolK is a rank-pushdown WindowGroupLimit), and
    * the same e6-integer RRF fusion per (query, doc). Queries arrive
    * as (query_id, qtext); the sparse terms derive from qtext by the
    * standard tokenization, the dense vector by the same
    * hash-projection the single-query path uses — so each query's
    * lists match its single-query run. */
  def hybridRrfBatchTopK(
      docs: DataFrame, queries: DataFrame, k: Int = 10,
      poolK: Int = 20, rrfK: Long = 60L, dim: Int = 8): DataFrame = {
    val qterms = queries
      .select(col("query_id"),
        explode(filter(split(lower(col("qtext")), "[^a-z]+"),
          t => length(t) >= 2)).as("term"))
      .filter(!col("term").isin(stopwords: _*))
    val sparse = bm25BatchTopK(docs, qterms, poolK)
      .select(col("query_id"), col("doc_id"), col("rank").as("s_rank"))
    val qe = queries.select(col("query_id"),
      Similarity.hashEmbedding(col("qtext"), dim).as("q"))
    val dense = docs
      .select(col("doc_id"), Similarity.hashEmbedding(col("text"), dim).as("emb"))
      .crossJoin(broadcast(qe))
      .withColumn("dot", expr(
        "cast(aggregate(zip_with(emb, q, (x, y) -> x * y), " +
          "cast(0 as double), (acc, v) -> acc + v) as long)"))
      .withColumn("d_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dot").desc, col("doc_id")))
        .cast("long"))
      .where(col("d_rank") <= poolK)
      .select("query_id", "doc_id", "d_rank")
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_e6", expr(
        s"coalesce(1000000 div (${rrfK}L + s_rank), 0L) + " +
          s"coalesce(1000000 div (${rrfK}L + d_rank), 0L)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf_e6").desc, col("doc_id")))
        .cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_e6", "s_rank", "d_rank")
  }

  def hybridRrfTopK(
      docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      poolK: Int = 20, rrfK: Long = 60L, dim: Int = 8): DataFrame = {
    val sparse = bm25TopK(docs, queryTerms, poolK)
      .select(col("doc_id"), col("rank").as("s_rank"))
    val qText = queryTerms.mkString(" ")
    val dense = docs
      .select(col("doc_id"),
        Similarity.hashEmbedding(col("text"), dim).as("emb"))
      .withColumn("q", Similarity.hashEmbedding(lit(qText), dim))
      .withColumn("dot", expr(
        "cast(aggregate(zip_with(emb, q, (x, y) -> x * y), " +
          "cast(0 as double), (acc, v) -> acc + v) as long)"))
      .orderBy(col("dot").desc, col("doc_id")).limit(poolK)
      .withColumn("d_rank", row_number().over(
        Window.orderBy(col("dot").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("d_rank"), col("dot"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e6", expr(
        s"coalesce(1000000 div (${rrfK}L + s_rank), 0L) + " +
          s"coalesce(1000000 div (${rrfK}L + d_rank), 0L)"))
      .orderBy(col("rrf_e6").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_e6").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "rrf_e6", "s_rank", "d_rank")
  }

  /** Gopher-style repetition screens: the fraction of duplicate
    * tokens and duplicate token-bigrams per document (boilerplate and
    * template spam score high; prose scores low). Map-only, integer
    * per-mille-style e6 outputs so the oracle compare stays exact.
    * Shingle arrays here are NOT deduplicated (word_shingles is —
    * its set semantics would erase exactly the signal measured here),
    * hence the inline transform instead of the shingle expression.
    */
  def repetitionScore(docs: DataFrame): DataFrame = {
    // (n − distinct)/max(n,1), NOT 1 − distinct/n: the latter scores an
    // EMPTY array as 100% duplicated (0/max(0,1) = 0 ⇒ 1 − 0 = 1)
    def dupE6(arr: Column): Column =
      round(lit(1e6) * (size(arr) - size(array_distinct(arr))) / greatest(size(arr), lit(1)))
        .cast("long")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("bigrams", expr(
        "if(size(toks) < 2, array(), " +
          "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i])))"))
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        dupE6(col("toks")).as("dup_tok_e6"),
        dupE6(col("bigrams")).as("dup_bigram_e6"))
  }

  /** Corpus-fit bigram LM fluency score (the CCNet-style quality
    * signal): fit bigram conditional frequencies ON the corpus itself,
    * then score each document by the mean conditional probability of
    * its bigrams — templated/fluent text scores high, token salad
    * scores low. Deliberately LOG-FREE: a log-perplexity would hinge
    * on ln() being bit-identical across engines (it is not — Java's
    * StrictMath vs DuckDB's libm), so each occurrence contributes
    * round(1e9·c(w1,w2)/(c(w1·)+V)) — counts are exact integers and
    * one double divide+round is IEEE-identical everywhere — and the
    * doc score is the integer-summed mean. c(w1·) counts w1 as a
    * BIGRAM HEAD (Σ_w2 c(w1,w2)); the +V add-one-style smoothing
    * (V = distinct heads) is load-bearing for the SEMANTICS, not just
    * numerics: unsmoothed c2/c1 hands every singleton head a perfect
    * 1.0 (its one continuation is trivially "predictable"), so token
    * salad would outscore fluent text. Smoothed, a rare bigram earns
    * ~1/V and a corpus-frequent one earns c2/(c1+V) ≫ 1/V.
    *
    * Scale: the head-count model c1 FOLDS OUT of the bigram model c2
    * (the head string w1 is a derived prefix of bg —
    * substring_index(bg, ' ', 1); tokens are whitespace-split, so w1
    * itself contains no space, and c1(w1) = Σ_{bg: head=w1} c2(bg) is
    * the identical occurrence count), so the corpus is tokenized and
    * shuffled for counting ONCE (by bg), with the second count a
    * model-sized aggregate — the r16 form cut one full corpus
    * tokenize+shuffle pass from the model build (guide §1.2 step 1:
    * remove unnecessary passes; a per-(doc,bg) pre-aggregation was
    * ALSO tried and measured SLOWER — prose bigrams are mostly unique
    * within a document, so the extra exchange reduced nothing). The
    * occurrence stream likewise carries only (doc_id, bg): w1 is
    * re-derived after the bg-model join instead of shuffling a second
    * copy of every head string. The model is never collected or
    * broadcast, so an internet-scale bigram table distributes like
    * any aggregate. V joins in as a broadcast 1-row aggregate (no
    * driver-side scalar job at all). Docs with <2 tokens have no
    * bigrams and no row.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val occ = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i-1], ' ', toks[i]))"))
        .as("bg"))
    val c2 = occ.groupBy("bg").agg(count(lit(1)).as("n2"))
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("n2")).as("n1"))
    val v = c1.agg(count(lit(1)).as("_v"))
    occ
      .join(c2, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(lit(1e9) * col("n2") / (col("n1") + col("_v"))).cast("long").as("p_e9"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("p_e9")) * lit(1.0) / count(lit(1))).cast("long").as("lm_score_e9"))
  }

  /** Positional token fingerprint: sum_i (i+1)·(131·len(tᵢ)+ascii(tᵢ)).
    * Order-sensitive (a shuffled document fingerprints differently)
    * yet built only from arithmetic both engines define identically —
    * the shape of a rolling hash without engine-specific hash
    * functions. Values stay far below 2^63 (docs are ≤ ~1k tokens).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    // native token_fingerprint: the transform+aggregate HOF chain is
    // interpreted per token with boxing and tokenizes twice (size +
    // terms); one fused pass computes the identical integer arithmetic
    docs
      .select(col("doc_id"),
        call_function("token_fingerprint", col("text")).as("f"))
      .select(
        col("doc_id"),
        col("f.n_tokens").as("n_tokens"),
        col("f.fingerprint").as("fingerprint"))

  /** Corpus distribution drift — the Similarity.pq/ivfDriftCheck
    * discipline applied to the TEXT pipeline: compare a recent
    * document batch against the standing corpus on two
    * pipeline-meaningful histograms — language labels and
    * token-count buckets (`n_tokens div 50`, capped at 20) — by
    * total-variation distance. A language-mixture collapse, a
    * truncation bug shifting lengths, a silent source swap: all move
    * TV immediately, before the bad batch lands. Gate a day's ingest
    * with it, and compose with the index drift checks for the full
    * refit-trigger story.
    *
    * Arithmetic is EXACT integers end-to-end:
    * `tv_e6 = Σ_i |a_i·nb − b_i·na| · 500000 div (na·nb)` — cross-
    * multiplied counts, one floor division at the end (BigInt fold on
    * the driver over the ≤ dozens of collected bins) — so unlike the
    * index drift rows' flag-only oracles, the DuckDB oracle replays
    * the VALUE itself. Both inputs are aggregated once; nothing is
    * collected beyond the bounded histograms.
    */
  def corpusDriftCheck(
      corpus: DataFrame, recent: DataFrame, maxTvE6: Long = 300000L): DataFrame =
    driftAgainst(corpus.sparkSession, corpusHistograms(corpus), recent, maxTvE6)

  /** The (language, token-bucket) histograms of a corpus — the
    * BOUNDED yardstick (≤ |langs| + 21 bins) a repeated drift check
    * should compute ONCE and reuse: gatedDocumentIngest captures it
    * at stream start instead of rescanning the reference per
    * micro-batch. */
  def corpusHistograms(df: DataFrame): (Map[String, Long], Map[Long, Long]) = {
    // ONE corpus pass: the joint (lang, bucket) histogram is still
    // bounded (≤ |langs| × 21 cells) and both marginals fall out of it
    // on the driver — the old two-aggregate form scanned the reference
    // corpus twice on the stream_gated_ingest setup path (VERDICT r11
    // wrong #4)
    val cells = df
      .select(col("lang"),
        expr("least(size(filter(split(text, '\\\\s+'), t -> t != '')) div 50, 20)")
          .cast("long").as("b"))
      .groupBy("lang", "b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lang = cells.groupBy(_._1).map { case (k, cs) => k -> cs.map(_._3).sum }
    val buck = cells.groupBy(_._2).map { case (k, cs) => k -> cs.map(_._3).sum }
    (lang, buck)
  }

  /** Drift verdict of `recent` against precomputed reference
    * histograms (corpusDriftCheck's second half; cost = two
    * delta-sized aggregates, reference never rescanned). */
  def driftAgainst(
      spark: org.apache.spark.sql.SparkSession,
      reference: (Map[String, Long], Map[Long, Long]),
      recent: DataFrame,
      maxTvE6: Long = 300000L): DataFrame = {
    import spark.implicits._
    def tvE6[K](a: Map[K, Long], b: Map[K, Long]): Long = {
      require(a.nonEmpty && b.nonEmpty, "corpusDriftCheck: empty histogram")
      val na = BigInt(a.valuesIterator.sum max 1L)
      val nb = BigInt(b.valuesIterator.sum max 1L)
      val s = (a.keySet ++ b.keySet).toSeq.map(k =>
        (BigInt(a.getOrElse(k, 0L)) * nb - BigInt(b.getOrElse(k, 0L)) * na).abs).sum
      (s * 500000 / (na * nb)).toLong
    }
    val (cl, cb) = reference
    val (rl, rb) = corpusHistograms(recent)
    val nRec = rl.valuesIterator.sum
    val lt = tvE6(cl, rl)
    val bt = tvE6(cb, rb)
    Seq(("lang", nRec, lt, lt > maxTvE6),
      ("tok_bucket", nRec, bt, bt > maxTvE6))
      .toDF("metric", "n_recent", "tv_e6", "drift")
  }
}
