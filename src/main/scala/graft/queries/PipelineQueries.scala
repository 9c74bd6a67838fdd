package graft.queries

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QHelpers._

/**
 * Training-data pipeline operators beyond the reference's surface — the
 * curation steps a corpus-scale (100 TB) LLM data system runs between
 * crawling (SURVEY §2.1) and training, each as a graded query over
 * `documents` with a DuckDB oracle:
 *
 *  - q69 deterministic train/val/test split — hash-bucket assignment
 *    (sha256 mod 64), the reproducible alternative to seeded `rand()`:
 *    membership is a pure projection, so re-runs, backfills and late
 *    arrivals land in the same split with zero coordination.
 *  - q70 benchmark decontamination — word-5-gram overlap between the
 *    corpus and a benchmark set, the standard eval-leak check. The
 *    benchmark n-gram side is small by nature → broadcast, so the corpus
 *    is never shuffled; per-document totals are one partial agg.
 *  - q71 PII redaction — regex scrub (emails, phone numbers) with match
 *    counts and a post-scrub content hash; pure codegen'd projection,
 *    embarrassingly parallel at any scale.
 *  - q72 weighted source mixing — exact per-source quotas taken by
 *    deterministic hash rank, the "data mixture" step of corpus assembly.
 *    Exactness costs one shuffle-by-source (window); at extreme scale the
 *    same hash rank admits an approximate threshold cut (quantile of the
 *    hash) with no window at all — documented tradeoff, exact form graded.
 *  - q73 sequence packing — assign documents to fixed-token-budget training
 *    sequences by exclusive running token count in doc order. The naive
 *    spelling is a global-order window = ONE task at any scale; here the
 *    prefix sum is two-level (parallel per-range-bucket windows + a
 *    bucket-offsets window over only #buckets rows), the distributed
 *    scan-algorithm shape that survives 100 TB. The oracle is the naive
 *    global cumsum — both must agree exactly.
 *  - q74 vocabulary induction — exact corpus-wide token frequencies with a
 *    document-frequency floor, the counting pass a tokenizer trainer runs.
 *    Partial aggregation does the heavy lifting; the survivor set is tiny.
 *  - q75 term relevance — TF-IDF-shaped scoring with an exact RATIONAL idf
 *    ((N+1)/(df+1), no logarithm): Math.log and libm log can disagree by an
 *    ulp across engines, so a hash-checked cross-engine score must stay in
 *    IEEE +,*,/ whose results are bit-identical everywhere.
 *  - q76 cross-document segment dedup — the C4 move: drop every repeated
 *    text segment corpus-wide, keeping only its FIRST occurrence
 *    (doc order, then position). One shuffle on the segment key to pick
 *    winners, one shuffle back on doc_id to reassemble — the minimal
 *    exchange count for global segment dedup at any scale. A planted
 *    boilerplate prefix (every 9th doc) guarantees true cross-doc
 *    duplicates at every scale factor; the post-dedup sha256 proves the
 *    surviving text byte-for-byte.
 *  - q77 repetition signals — Gopher-style quality heuristics: the share
 *    of bigram occurrences claimed by the single most frequent bigram, and
 *    the share of trigram occurrences that are duplicates. Both in integer
 *    basis points (floor, the q70 rule). The tokenized corpus is
 *    materialized once and feeds both gram sizes.
 *  - q78 corpus-LM likelihood scoring — the CCNet/KenLM perplexity-filter
 *    slot without an external model: a bigram LM is fitted on the corpus
 *    itself (conditional frequencies c(w1,w2)/c(w1·)) and every document is
 *    scored by its mean conditional likelihood. NO logarithm (the q75
 *    rule): per-bigram likelihoods go to integer basis points first, and
 *    the per-document mean is one IEEE divide of two exact integers —
 *    hash-identical in any engine, unlike a sum of floating log-probs,
 *    which is summation-ORDER-dependent and can never cross-check.
 *  - q87 link-authority quality prior — fixed-iteration integer PageRank
 *    ([[graft.operators.LinkRank]]) over a data-derived bipartite graph;
 *    the host/link-graph weighting pass of crawl curation, exactly
 *    replayable because all 5 rounds stay in integral arithmetic.
 */
object PipelineQueries {

  // ---- q69: deterministic split ------------------------------------------
  // bucket = low 60 bits of sha256(doc_id) mod 64 (the 15-hex-char
  // decomposition DuckDB can mirror without HUGEINT — EngineQueries.tokBucket
  // lesson); 51/6/7 of 64 ≈ 80/9/11 train/val/test.
  private[queries] def bucket64(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 2, 15), 16, 10).cast("long") % 64

  // ---- q70: decontamination ----------------------------------------------
  /** Sentinel passage planted into every 13th corpus doc AND every benchmark
    * doc, so true contamination exists at every scale factor (the q49
    * planted-fixture lesson); natural 5-gram collisions also count. */
  private val sentinel =
    "shared benchmark sentinel passage about distributed gradient descent convergence"

  /** Distinct word-5-grams per document id. Stays in one projection
    * (split → transform/slice/array_join → explode); the HOFs evaluate
    * interpreted, but the fan-out is bounded (one row per token) and the
    * alternative — posexplode + window over token position — buys codegen
    * with an extra shuffle, a loss at corpus scale. */
  private def grams5(df: DataFrame, idCol: String): DataFrame =
    df.filter(length(trim(col("text2"))) > 0)
      .withColumn("toks", split(lower(trim(col("text2"))), "\\s+"))
      .filter(size(col("toks")) >= 5)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("toks")) - 5),
          i => array_join(slice(col("toks"), i + lit(1), lit(5)), " "))).as("gram"))
      .distinct()

  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phonePat = "\\+1-555-[0-9]+"

  // ---- q76: planted boilerplate (exactly 20 tokens = two full 10-token
  // segments when prepended, so every planted doc contributes two
  // guaranteed-duplicate segments regardless of its own text) --------------
  private val boiler =
    "subscribe to our newsletter today for weekly updates and exclusive " +
      "member content delivered straight to your inbox every single week"

  /** Tokenized documents (lowercased, whitespace-split), shared by the gram
    * queries. NOT materialized here — each query decides (the q75 lesson).
    * Width-guarded: the single-file corpus scans as 1 partition, and every
    * downstream explode is CPU-per-row (the q118/q137 lesson). */
  private def tokenized(df: DataFrame, minToks: Int): DataFrame = {
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    val src = if (df.rdd.getNumPartitions < np) df.repartition(np) else df
    src.filter(length(trim(col("text"))) > 0)
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(col("toks")) >= minToks)
      .select(col("doc_id"), col("toks"))
  }

  /** Per-(doc, gram) occurrence counts for word n-grams of size `n`. */
  private def gramCounts(toks: DataFrame, n: Int): DataFrame =
    toks.select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => array_join(slice(col("toks"), i + lit(1), lit(n)), " "))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))

  // ---- q137: planted cross-doc substring (appended to every 6th doc, ~100
  // chars = guaranteed shared 32-char windows at every scale factor) -------
  private val spanBoiler =
    "all rights reserved unauthorized reproduction of this material is " +
      "strictly prohibited without prior written consent"

  /** q262's fixed merge table, in application order (the role of a trained
    * tokenizer's ranked merges; q132 is the training side). Multi-char
    * merges 9-12 consume the outputs of earlier ones — the cascade is the
    * graded property. */
  private val bpeMerges: Seq[(String, String)] = Seq(
    "e" -> "s", "t" -> "h", "i" -> "n", "a" -> "n", "r" -> "e", "o" -> "n",
    "a" -> "t", "e" -> "n", "th" -> "e", "in" -> "g", "at" -> "a", "re" -> "s")

  val queries: Map[String, Q] = Map(

    // Crawl-snapshot diff — the re-crawl triage every scheduled pipeline
    // runs before deciding what to re-process (scheduler.py's daily loop
    // implies exactly this question): snapshot A (docs ≢0 mod 11, original
    // text) vs snapshot B (docs ≢0 mod 13, every 5th doc's text revised) →
    // one full-outer join on doc_id classifying added / removed / changed /
    // unchanged by presence + content-hash compare. Only doc_id and an
    // 8-byte text hash ever shuffle; per-class counts, id-sum checksums and
    // char volume are the graded audit.
    "q194_crawl_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // sha256 (not xxhash64) because the oracle must replay the hash —
      // DuckDB 1.0 has no xxhash64; at warehouse scale swap in xxhash64 and
      // the plan shape is unchanged (8 bytes instead of 64 per id shuffles)
      val snapA = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), sha2(col("text"), 256).as("ha"),
          length(col("text")).cast("long").as("la"))
      val snapB = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev 2]")))
            .otherwise(col("text")).as("tb"))
        .select(col("doc_id"), sha2(col("tb"), 256).as("hb"),
          length(col("tb")).cast("long").as("lb"))
      snapA.join(snapB, Seq("doc_id"), "full_outer")
        .withColumn("class",
          when(col("ha").isNull, "added")
            .when(col("hb").isNull, "removed")
            .when(col("ha") === col("hb"), "unchanged")
            .otherwise("changed"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"),
          coalesce(sum(col("lb")), lit(0L)).as("chars_after"))
        .orderBy(col("class"))
    }),

    // Quality-filter FUNNEL — the attrition report every curation run
    // publishes (N in, N out per stage, which stage costs what): four
    // sequential gates (length ≥ 200 chars → stopword ratio ≥ 500 bp →
    // mean word length ≤ 12 → non-alnum ratio ≤ 1500 bp), evaluated as ONE
    // scan with cumulative conditional aggregates — a doc counts at stage k
    // iff it passed stages 1..k, so the funnel needs no per-stage passes
    // and nothing corpus-sized shuffles (integer-bp signals, the q75/q78
    // no-float discipline).
    "q195_filter_funnel" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("text"),
          length(col("text")).cast("long").as("len"))
        .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("n_stop", size(filter(col("toks"),
          tk => tk.isin("the", "a", "of", "and", "to", "in", "is", "for"))).cast("long"))
        .withColumn("stop_bp", expr("(10000 * n_stop) DIV greatest(n_toks, 1)"))
        .withColumn("mean_wlen_x100", // word chars = len − (n_toks − 1) separators
          expr("(100 * (len - n_toks + 1)) DIV greatest(n_toks, 1)"))
        .withColumn("n_nonalnum", (length(col("text"))
          - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast("long"))
        .withColumn("nonal_bp", expr("(10000 * n_nonalnum) DIV greatest(len, 1)"))
      val g1 = col("len") >= 200
      val g2 = g1 && col("stop_bp") >= 500
      val g3 = g2 && col("mean_wlen_x100") <= 1200
      val g4 = g3 && col("nonal_bp") <= 1500
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_in"),
          sum(when(g1, 1L).otherwise(0L)).as("pass_len"),
          sum(when(g2, 1L).otherwise(0L)).as("pass_stop"),
          sum(when(g3, 1L).otherwise(0L)).as("pass_wlen"),
          sum(when(g4, 1L).otherwise(0L)).as("pass_all"),
          sum(when(g4, col("doc_id")).otherwise(0L)).as("kept_sum_ids"))
        .orderBy(col("source"))
    }),

    // Exact substring-level dedup detection (the "deduplicating training
    // data" move at character granularity): every 32-char window of every
    // document, hashed corpus-wide; windows seen in >=2 DISTINCT docs are
    // duplicated content, and runs of adjacent duplicated positions merge
    // into maximal spans (the island trick: pos - row_number is constant
    // within a run). Scale shape: the window text NEVER shuffles — each
    // position ships only its xxhash64 (8-byte keys, the q118 hashed-
    // shingle lesson; 32-char strings were 5× the shuffle bytes), the
    // cross-doc test is min(doc)≠max(doc) (no countDistinct expansion),
    // the tiny duplicated set broadcasts back, and the span merge is a
    // per-doc window over duplicated positions only. The gram table feeds
    // both branches UNPERSISTED by choice: the stage is a narrow explode
    // at full width, so recomputing it costs less than materializing 5M
    // rows — and the result plan stays visible to PlanSpec's broadcast
    // gate (a localCheckpoint would hide it behind an ExistingRDD scan).
    "q137_substring_spans" -> ((s, dir) => {
      // explicit width: the corpus scans as one file → one partition, and
      // the per-position substring+hash explode is CPU-per-row — without
      // the spread it runs on a single core (the q118 lesson)
      val base = t(s, dir, "documents")
        .repartition(s.sessionState.conf.numShufflePartitions)
        .withColumn("text2",
          when(col("doc_id") % 6 === 0, concat(col("text"), lit(" " + spanBoiler)))
            .otherwise(col("text")))
        .filter(length(col("text2")) >= 32)
      val grams = base
        .select(col("doc_id"), col("text2"),
          explode(sequence(lit(1), length(col("text2")) - 31)).as("p"))
        .select(col("doc_id"), col("p"),
          xxhash64(expr("substring(text2, p, 32)")).as("h"))
      val dupGrams = grams.groupBy(col("h"))
        .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("crossdoc"))
        .filter(col("crossdoc")).select("h")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val islands = grams.join(broadcast(dupGrams), "h")
        .withColumn("island", col("p") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(count(lit(1)).as("npos"), (max(col("p")) - min(col("p")) + 32).as("covered"))
      islands.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("npos")).as("n_dup_pos"),
          sum(col("covered")).as("dup_chars"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization + keep-newest dedup — the crawl-frontier hygiene
    // pass: scheme/host case-folding, default-port strip, query+fragment
    // strip, trailing-slash normalization, then one winner per canonical URL
    // by recency. Pure codegen'd projection into one window; messy aliases
    // are planted on every 4th doc (uppercased host, :443, utm tail) with a
    // LATER fetch date, so the winner must be the alias, proving the dedup
    // keys on the canonical form, not the raw string.
    "q140_url_canonical" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val clean = docs.select(col("doc_id"), lit(0L).as("variant"),
        concat(lit("https://"), col("source"), lit(".example.com/"), col("lang"),
          lit("/"), col("doc_id"), lit("/")).as("url"),
        (col("doc_id") % 365).cast("int").as("off"))
      val messy = docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), lit(1L).as("variant"),
          concat(lit("HTTPS://"), upper(col("source")), lit(".EXAMPLE.COM:443/"),
            col("lang"), lit("/"), col("doc_id"),
            lit("/?utm_source=feed&session="), col("doc_id"), lit("#top")).as("url"),
          (col("doc_id") % 365 + 10).cast("int").as("off"))
      val canoned = clean.unionAll(messy)
        .withColumn("u1", regexp_replace(regexp_replace(col("url"), "#.*$", ""), "\\?.*$", ""))
        .withColumn("hostp",
          regexp_replace(lower(regexp_extract(col("u1"), "^([^:]+://[^/]+)", 1)), ":443$", ""))
        .withColumn("pathp",
          regexp_replace(regexp_extract(col("u1"), "^[^:]+://[^/]+(/.*)?$", 1), "/$", ""))
        .withColumn("canon", concat(col("hostp"), col("pathp")))
        .withColumn("fetched",
          date_format(date_add(to_date(lit("2024-01-01")), col("off")), "yyyy-MM-dd"))
      val w = Window.partitionBy(col("canon"))
        .orderBy(col("fetched").desc, col("variant").asc)
      canoned
        .withColumn("rn", row_number().over(w))
        .groupBy(col("canon"))
        .agg(count(lit(1)).as("n_variants"),
          max(when(col("rn") === 1, col("variant"))).as("win_variant"),
          max(when(col("rn") === 1, col("fetched"))).as("win_fetched"),
          max(when(col("rn") === 1, col("doc_id"))).as("doc_id"))
        .orderBy(col("canon"))
    }),

    // k-anonymity audit — the privacy gate a training-data release runs over
    // quasi-identifiers (nation × market segment × account-balance band):
    // any group smaller than k=5 is re-identifiable and must be suppressed
    // or generalized. One partial-aggregated groupBy at any scale; the
    // at_risk flag is the release decision, row counts are the evidence.
    "q141_k_anonymity" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"))
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", col("n") < 5)
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
    }),

    // Character-statistics quality signals in pure integer arithmetic (the
    // q78 no-float-accumulation rule): per-document char histogram →
    // Simpson diversity 1 - Σc²/n² (the logarithm-free cousin of entropy),
    // whitespace and digit occupancy — each ONE IEEE divide of two exact
    // integers, then integer basis points. Two partial-aggregated shuffles
    // (doc×char, then doc) over an explode that parallelizes per-row.
    "q142_char_quality" -> ((s, dir) => {
      val chars = t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")))).as("p"))
        .select(col("doc_id"), expr("substring(text, p, 1)").as("ch"))
      chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_distinct"),
          sum(col("cnt") * col("cnt")).as("ss"),
          sum(when(col("ch").isin(" ", "\t", "\n"), col("cnt")).otherwise(0L)).as("ws"),
          sum(when(col("ch").between("0", "9"), col("cnt")).otherwise(0L)).as("dg"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          floor(lit(10000.0) * (col("n") * col("n") - col("ss")) / (col("n") * col("n")) + 0.5)
            .cast("long").as("simpson_bp"),
          floor(lit(10000.0) * col("ws") / col("n") + 0.5).cast("long").as("ws_bp"),
          floor(lit(10000.0) * col("dg") / col("n") + 0.5).cast("long").as("digit_bp"))
        .orderBy(col("doc_id"))
    }),

    // l-diversity audit — k-anonymity's companion (q141): a group can be
    // large yet still leak if everyone in it shares the sensitive value.
    // Here the quasi-identifiers are (nation, balance band) and the
    // sensitive attribute is the market segment; groups with fewer than 3
    // distinct segments fail. countDistinct partial-aggregates, so the
    // audit is one shuffle at any scale.
    "q146_l_diversity" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_mktsegment")).as("l"))
        .withColumn("at_risk", col("l") < 3)
        .orderBy(col("c_nationkey"), col("band"))
    }),

    // Collocation mining by LIFT — the tokenizer-adjacent association pass
    // (which adjacent pairs co-occur far above chance). PMI's logarithm is
    // banned cross-engine (the q75 rule), but lift is the same ranking:
    // lift = (c12/B) / ((c1/N)(c2/N)) = c12·N² / (B·c1·c2) — all-integer
    // numerator and denominator, ONE IEEE divide. Unigram and bigram counts
    // partial-aggregate; the survivor set (count floor 5) is tiny.
    "q148_collocations" -> ((s, dir) => {
      val toks = tokenized(t(s, dir, "documents"), minToks = 2).localCheckpoint()
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val bi = gramCounts(toks, 2)
        .groupBy(col("gram")).agg(sum(col("cnt")).as("c12"))
      val n = uni.agg(sum(col("c1"))).collect().head.getLong(0)
      val b = bi.agg(sum(col("c12"))).collect().head.getLong(0)
      bi.filter(col("c12") >= 5)
        .withColumn("w1", split(col("gram"), " ")(0))
        .withColumn("w2", split(col("gram"), " ")(1))
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c1", "cw1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c1", "cw2"), "w2")
        // num and den stay in exact int64 (≤1.3e15 < 2^53, so the casts to
        // double are exact); ONE divide + one multiply, same spelling as
        // the oracle → bit-identical
        .select(col("w1"), col("w2"), col("c12"),
          floor(lit(100.0) * ((col("c12") * lit(n) * lit(n)).cast("double")
            / (lit(b) * col("cw1") * col("cw2")).cast("double")) + 0.5)
            .cast("long").as("lift_x100"))
        .orderBy(col("lift_x100").desc, col("w1"), col("w2"))
        .limit(30)
    }),

    // Per-source percentile quality gate — corpus curation by distributional
    // threshold instead of a global constant: each source's own p25 token
    // count is its admission bar (a low-quality source can't dilute a
    // high-quality one). The per-source thresholds are a tiny aggregate →
    // broadcast back; the gate itself is a projection. Interpolation at
    // p=0.25 is dyadic (exact in IEEE), so the threshold replays exactly.
    "q143_quality_gate" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val thr = toks.groupBy(col("source"))
        .agg(percentile(col("toks"), lit(0.25)).as("thr"))
      toks.join(broadcast(thr), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("toks") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
          floor(max(col("thr")) * 100 + 0.5).cast("long").as("thr_x100"),
          sha2(array_join(transform(array_sort(
              collect_list(when(col("toks") >= col("thr"), col("doc_id")))),
            x => x.cast("string")), ","), 256).as("kept_sha"))
        .orderBy(col("source"))
    }),
    // Hash-bucket split assignment, aggregated per (split, lang): doc counts,
    // char volume and an id-sum membership checksum. The assignment itself is
    // shuffle-free; the only exchange is the final partial-agg rollup. At
    // 100 TB the same projection feeds write.partitionBy("split").
    // stratified hash sampling (operators/Sampling.scala): per-stratum quotas
    // in 64ths, membership a pure projection of sha256(doc_id) — the
    // reproducible sampleBy. Graded via per-stratum achieved counts, exact
    // rate in basis points, and an id-sum membership checksum.
    // Source-diversity audit (the concentration numbers a mixing recipe is
    // tuned against): per source, the language-mix Gini impurity (= 1 − HHI,
    // the "how monolingual is this source" score) and the top language's
    // share — both in INTEGER basis points (10000 − (10000·Σc²) DIV n², no
    // float, no log: entropy's ulp drift is exactly what q75/q78 banned).
    // Two partial-agg rollups; nothing corpus-sized shuffles.
    "q192_source_diversity" -> ((s, dir) => {
      val cl = t(s, dir, "documents").groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      cl.groupBy(col("source"))
        .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_langs"),
          max(col("c")).as("top_docs"), sum(col("c") * col("c")).as("ssq"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          expr("(10000 * top_docs) DIV n_docs").as("top_share_bp"),
          expr("10000 - (10000 * ssq) DIV (n_docs * n_docs)").as("gini_bp"))
        .orderBy(col("source"))
    }),

    // Fractional-epoch source mixing — the data-recipe move every LLM
    // pretraining corpus ships with ("this source gets 2.0 epochs, that one
    // 0.5"): each doc is emitted k times, k = floor(w) + [hash < frac(w)],
    // a deterministic coordination-free Bernoulli on the fractional part —
    // one rule covers up- AND down-sampling (w < 1 keeps a subset), and the
    // per-source achieved rate concentrates on w by hash uniformity.
    // Weights derive from the source name (5000..20000 bp = 0.5..2.0
    // epochs) so the fixture exercises both directions at every scale.
    // Replication is a narrow sequence-explode projection; the only
    // exchanges are the audit rollups.
    "q193_epoch_upsample" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("source"), col("doc_id"))
        .withColumn("w_bp",
          expr("5000 + 2500 * (cast(substring(source, 4, 10) as int) % 7)"))
        // low 60 bits of sha256(doc_id) mod 10000 (the bucket64 decomposition
        // at bp granularity — same function on both sides, that is all
        // determinism needs)
        .withColumn("hb",
          conv(substring(sha2(col("doc_id").cast("string"), 256), 2, 15), 16, 10)
            .cast("long") % 10000)
        .withColumn("k", expr("w_bp DIV 10000").cast("long")
          + when(col("hb") < expr("w_bp % 10000"), 1L).otherwise(0L))
      val emitted = base.filter(col("k") > 0)
        .select(col("source"), col("doc_id"),
          explode(sequence(lit(1L), col("k"))).as("copy"))
      base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), max(col("w_bp")).cast("long").as("epochs_bp"))
        .join(emitted.groupBy(col("source"))
            .agg(count(lit(1)).as("n_emitted"), sum(col("doc_id")).as("emitted_id_sum")),
          Seq("source"), "left")
        .na.fill(0L, Seq("n_emitted", "emitted_id_sum"))
        .withColumn("achieved_bp", expr("(10000 * n_emitted) DIV n_docs"))
        .orderBy(col("source"))
    }),

    "q116_stratified_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sampled = graft.operators.Sampling.stratifiedSampleHash(
        docs, "lang", "doc_id", Map("en" -> 40, "de" -> 24, "fr" -> 16), default64 = 8)
      val tot = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      val sm = sampled.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("sum_ids"))
      tot.join(sm, Seq("lang"), "left")
        .na.fill(0L, Seq("n_sampled", "sum_ids"))
        .withColumn("rate_bp", expr("(10000 * n_sampled) DIV n_total"))
        .select("lang", "n_total", "n_sampled", "rate_bp", "sum_ids")
        .orderBy(col("lang"))
    }),

    // BM25 ranking (Robertson/Sparck Jones; the scoring Lucene/ES run on an
    // inverted index) in pure INTEGER basis points — no Math.log anywhere,
    // the discipline this suite grades floating formulas under (q75/q78
    // lesson: Math.log vs libm log drift by ulps across engines). The idf
    // is a piecewise-linear integer log2 of Lucene's 1 + (N−df+½)/(df+½)
    // = (2N+2)/(2df+1) at 1024× fixed point: the exponent is the bit
    // length (bin()), exact and engine-portable, the fraction interpolates
    // within the octave in bp. With k1 = 6/5, b = 3/4:
    //   s       = (1024·(2N+2)) DIV (2df+1);  e = len(bin(s))−1
    //   idf_bp  = 10000·e + (10000·(s−2^e)) DIV 2^e − 100000
    //   tf_bp   = (10000·22·T·tf) DIV (10·T·tf + 3·T + 9·dl·N)   [T = Σdl]
    //   term_bp = (idf_bp·tf_bp) DIV 10000, summed per doc.
    // Integer-overflow headroom: 10000·22·T·tf < 2^63 up to T ≈ 4e12 total
    // corpus tokens (≈ sf10000). Corpus scalars (N, T) ride one broadcast
    // 1-row aggregate, never an unpartitioned window over the per-doc table;
    // postings for the query terms are filter-pruned before any shuffle (on
    // the q93 inverted-index layout that filter is partition pruning).
    "q121_bm25" -> ((s, dir) => {
      val terms = Seq("spark", "data", "model")
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val corp = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_toks"))
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfT), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corp))
        .withColumn("s_k", expr("(1024 * (2*n_docs + 2)) DIV (2*df + 1)"))
        .withColumn("e_k", expr("length(bin(s_k)) - 1"))
        .withColumn("idf_bp", expr("10000 * e_k" +
          " + (10000 * (s_k - shiftleft(cast(1 as bigint), e_k)))" +
          " DIV shiftleft(cast(1 as bigint), e_k) - 100000"))
        .withColumn("tf_bp",
          expr("(10000 * 22 * t_toks * tf) DIV (10 * t_toks * tf + 3 * t_toks + 9 * dl * n_docs)"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("(idf_bp * tf_bp) DIV 10000")).as("bm25_bp"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("bm25_bp").desc, col("doc_id").asc)
        .limit(20)
    }),

    // Weighted sampling without replacement (Duffield–Lund–Thorup priority
    // sampling): per-source top-5 by priority = (w·2^28) DIV (u28+1) with w
    // = n_chars and u28 a seeded sha slice of the doc id — the
    // quality/length-weighted subsample a training-mix builder draws, exact
    // and reproducible across engines/partitionings (operators/Sampling).
    "q122_weighted_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("prio").desc, col("doc_id").asc)
      docs.select(col("source"), col("doc_id"), col("n_chars"),
          graft.operators.Sampling.priority(col("doc_id"), col("n_chars"), "ws6").as("prio"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy(col("source"), col("rank"))
    }),

    "q69_train_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("bucket", bucket64(col("doc_id")))
        .withColumn("split",
          when(col("bucket") < 51, "train")
            .when(col("bucket") < 57, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("split"), col("lang"))
    }),

    // Corpus×benchmark 5-gram overlap: benchmark = every 97th doc (+sentinel),
    // corpus plants the sentinel into every 13th doc. The benchmark n-gram
    // set is broadcast — the corpus-side n-gram stream is filtered in place,
    // never shuffled; only the per-doc counts aggregate.
    "q70_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.withColumn("text2",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" " + sentinel)))
          .otherwise(col("text")))
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .withColumn("text2", concat(col("text"), lit(" " + sentinel)))
      // cg feeds both the per-doc totals and the overlap join; materialize it
      // or each branch re-runs the corpus scan + n-gram explode (no
      // cross-branch CSE — the q75 lesson, measured here too)
      val cg = grams5(corpus, "doc_id").localCheckpoint()
      val bg = grams5(bench.withColumnRenamed("doc_id", "bid"), "bid")
        .select("gram").distinct()
      val tot = cg.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      val ov = cg.join(broadcast(bg), "gram")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      ov.join(tot, "doc_id")
        // contamination in integer basis points: 10000.0*n/d is the same one
        // IEEE divide in both engines, floor avoids the round() boundary trap
        .withColumn("ratio_bp",
          floor(col("n_overlap") * lit(10000.0) / col("n_grams")).cast("long"))
        .select("doc_id", "n_overlap", "n_grams", "ratio_bp")
        .orderBy(col("doc_id"))
    }),

    // Bigram-LM PERPLEXITY quality gate — the LOG-domain sibling of
    // q78_lm_score (which averages conditional probability LINEARLY; a
    // doc of uniformly-rare-but-nonzero bigrams looks fine there but
    // terrible here — and CCNet/KenLM filter on exactly this log-domain
    // number, which is why both slots exist). Deterministic stand-in for
    // the trained LM: a bigram MLE model over the corpus itself, so every
    // bigram has count ≥ 1 and no smoothing is needed. Per-doc negative
    // log-likelihood in integer basis points via the engine's
    // piecewise-linear log2 (the q121/q212 idf spelling): per occurrence
    // d_bp = l2bp(c(w1·)) − l2bp(c(w1,w2)) ≥ 0, nll_bp = Σd DIV n. At
    // scale this is two count aggregations + one occurrence-keyed join —
    // linear shuffles, no cross product, the token explode repartitioned
    // ahead of the compute (the round-7 width lesson).
    "q257_lm_perplexity" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("tk"))
        .filter(size(col("tk")) >= 2)
      val np = s.sessionState.conf.numShufflePartitions
      val wide = if (toks.rdd.getNumPartitions < np) toks.repartition(np) else toks
      // occurrences feed the two count tables AND the scoring join
      val occ = wide.select(col("doc_id"), explode(expr(
          "transform(sequence(2, size(tk)), i -> struct(tk[i-2] as w1, tk[i-1] as w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .localCheckpoint()
      val bgc = occ.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cbg"))
      val ctx = occ.groupBy(col("w1")).agg(count(lit(1)).as("cug"))
      val l2cug = "10000 * (length(bin(cug)) - 1) + (10000 * (cug - " +
        "shiftleft(cast(1 as bigint), length(bin(cug)) - 1))) DIV " +
        "shiftleft(cast(1 as bigint), length(bin(cug)) - 1)"
      val l2cbg = "10000 * (length(bin(cbg)) - 1) + (10000 * (cbg - " +
        "shiftleft(cast(1 as bigint), length(bin(cbg)) - 1))) DIV " +
        "shiftleft(cast(1 as bigint), length(bin(cbg)) - 1)"
      occ.join(bgc, Seq("w1", "w2"))
        .join(ctx, Seq("w1"))
        .withColumn("d_bp", expr(s"($l2cug) - ($l2cbg)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bi"), sum(col("d_bp")).as("s_bp"))
        .withColumn("nll_bp", expr("s_bp DIV n_bi"))
        .withColumn("keep", (col("nll_bp") < lit(48800L)).cast("long"))
        .select("doc_id", "n_bi", "nll_bp", "keep")
        .orderBy(col("doc_id"))
    }),

    // BPE tokenizer APPLICATION — the missing half of q132 (which learns
    // pair statistics): apply a fixed, ordered merge table to the corpus
    // and measure per-doc compression (tokens per character — the
    // bytes-per-token metric tokenizer work tracks). Correct BPE apply
    // reduces to ONE left-to-right pass per merge (a merge can never
    // create a new occurrence of its own pair: the merged token's spelling
    // differs from both halves), so each merge is a plain string replace
    // over a DELIMITED spelling — every token wrapped "|t|", tokens joined
    // by one space — which makes cross-token false matches impossible
    // ("|h| |e|" cannot match inside "|th| |e|") and lets adjacent merges
    // chain ("|a| |a| |a| |a|" → "|aa| |aa|"). Later merges consume
    // earlier ones' outputs (|t|+|h|→|th|, then |th|+|e|→|the|) — the
    // cascade is the thing BPE application must get right. Both engines
    // run the identical replace chain, so the oracle is byte-exact.
    "q262_bpe_apply" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
      val np = s.sessionState.conf.numShufflePartitions
      val wide = if (words.rdd.getNumPartitions < np) words.repartition(np) else words
      val spelledSql = """rtrim(regexp_replace(w, '(.)', '|$1| '))"""
      val replaceChain = bpeMerges.foldLeft(spelledSql) { case (acc, (x, y)) =>
        s"replace($acc, '|$x| |$y|', '|$x$y|')"
      }
      wide.withColumn("toks", expr(s"size(split($replaceChain, ' '))").cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(length(col("w"))).cast("long").as("n_chars"),
          sum(col("toks")).as("n_tok"))
        .withColumn("ratio_bp", expr("(10000 * n_tok) DIV n_chars"))
        .select("doc_id", "n_chars", "n_tok", "ratio_bp")
        .orderBy(col("doc_id"))
    }),

    // BPE tokenizer TRAINING — the missing third of the q132/q262 family:
    // learn the merge table itself. Classic BPE training is an iterative
    // argmax — count adjacent token pairs, merge the winner, recount —
    // which maps to a DRIVER LOOP over declarative aggregations (the
    // connected-components discipline, q48): each of the 8 rounds shuffles
    // only (l, r, weight) pair counts over the DISTINCT-WORD frame (word
    // frequencies are BPE's sufficient statistic, so the training frame is
    // vocabulary-sized, corpus-size-FREE — the 100 TB shape) and collects
    // exactly ONE winner row. Ties break (count desc, pair asc) so the
    // learned table is deterministic. The oracle unrolls the same 8 rounds
    // as chained CTEs, each round's winner feeding the next round's
    // replace through a scalar cross join — the SQL computes the winners,
    // it is not told them.
    "q268_bpe_train" -> ((s, dir) => {
      val nMerges = 8
      val wf = t(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).cast("long").as("c"))
        .cache()
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 1 to nMerges) {
        val spelled = merges.foldLeft("""rtrim(regexp_replace(w, '(.)', '|$1| '))""") {
          case (acc, (x, y, _)) => s"replace($acc, '|$x| |$y|', '|$x$y|')"
        }
        val win = wf
          .withColumn("toks", expr(s"split($spelled, ' ')"))
          .select(col("c"), explode(expr(
            "if(size(toks) < 2, array(), transform(sequence(0, size(toks)-2), " +
              "i -> named_struct(" +
              "'l', replace(toks[i], '|', ''), " +
              "'r', replace(toks[i+1], '|', ''))))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("c")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()(0)
        // the winner embeds in the next round's replace-chain SQL — reject
        // a token that could break the quoting (never fires on word text)
        require(win.getString(0).matches("[\\w]+") && win.getString(1).matches("[\\w]+"),
          s"BPE winner contains non-word chars: $win")
        merges += ((win.getString(0), win.getString(1), win.getLong(2)))
      }
      wf.unpersist()
      import s.implicits._
      merges.toSeq.zipWithIndex
        .map { case ((l, r, c), i) => (i + 1, l, r, c) }
        .toDF("rank", "lhs", "rhs", "cnt")
    }),

    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every document by
    // the log-likelihood ratio of a TARGET (in-domain) hashed-unigram
    // model over the RAW corpus model, then keep the top-m. The hashed
    // feature space (sha256 → 1024 buckets, the paper's hashed n-gram
    // trick) makes the model frame CONSTANT-sized regardless of corpus
    // vocabulary — the whole model is two 1024-row tables that broadcast,
    // so scoring is one map-side join + partial agg at any scale. Log2 in
    // the integer bp spelling (the q257/q121 discipline) keeps both
    // engines bit-identical. Target = en docs of 300+ chars (balanced
    // add-1 smoothing on both models: +1 per bucket, +buckets on the
    // totals). Selection is a DISTRIBUTED top-k — orderBy + limit(100)
    // (TakeOrderedAndProject: per-partition top-100, driver merge), with
    // rank assigned by a window over only the 100 survivors. Never a
    // global unpartitioned window over the corpus-sized score frame —
    // that would be a single-task sort of every scored document, the
    // silent scale-killer q73's comment names (PlanSpec gates every
    // Window in this plan to sit above the limit).
    "q270_dsir_select" -> ((s, dir) => {
      val scored = graft.operators.Sampling.dsirScores(
        t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en" && col("n_chars") >= 300)
      scored
        .orderBy(col("score_bp").desc, col("doc_id").asc)
        .limit(100)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score_bp").desc, col("doc_id").asc)).cast("int"))
        .select(col("doc_id"), col("n_tok"), col("score_bp"), col("rank"))
        .orderBy(col("rank"))
    }),

    // Contrastive pair mining — the training-data prep step for retrieval
    // embedders (Contriever/ICT-style): POSITIVES are adjacent chunk
    // pairs within a document (spans that share context), NEGATIVES are
    // pseudo-random other-document chunks. The negative assignment is the
    // scale-shaped part: chunks hash into 64 buckets and each bucket
    // sorts into a RING by a salted sha256 rank; an anchor's negative is
    // the next ring member from a different document (lead(1), falling
    // back to lead(2) on a same-doc collision, dropped at the ring tail).
    // Two per-bucket windows + one doc-local equi-join — everything
    // linear, no all-pairs anything, fully deterministic, and the oracle
    // replays the identical ring with DuckDB's lead().
    "q274_contrastive_pairs" -> ((s, dir) => {
      val chunks = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          posexplode(TextFns.chunk(col("text"), 128, 64)).as(Seq("pos", "chunk")))
        .select(col("doc_id"), col("pos"),
          TextFns.chunkId(col("doc_id"), col("pos")).as("cid"))
      val ring = chunks
        .withColumn("b", graft.operators.Sampling.hashBucket(col("cid"), 64))
        .withColumn("hr", sha2(concat(lit("neg:"), col("cid")), 256))
      val w = Window.partitionBy(col("b")).orderBy(col("hr"), col("cid"))
      val neg = ring
        .withColumn("n1_cid", lead(col("cid"), 1).over(w))
        .withColumn("n1_doc", lead(col("doc_id"), 1).over(w))
        .withColumn("n2_cid", lead(col("cid"), 2).over(w))
        .withColumn("n2_doc", lead(col("doc_id"), 2).over(w))
        .withColumn("negative",
          when(col("n1_doc").isNotNull && col("n1_doc") =!= col("doc_id"), col("n1_cid"))
            .when(col("n2_doc").isNotNull && col("n2_doc") =!= col("doc_id"), col("n2_cid")))
        .select(col("cid").as("anchor"), col("negative"))
      val a = chunks.select(col("doc_id"), col("pos"), col("cid").as("anchor"))
      val p = chunks.select(col("doc_id"), (col("pos") - 1).as("pos"),
        col("cid").as("positive"))
      a.join(p, Seq("doc_id", "pos"))
        .join(neg, Seq("anchor"))
        .filter(col("negative").isNotNull)
        .select(col("doc_id"), col("anchor"), col("positive"), col("negative"))
        .orderBy(col("anchor"))
    }),

    // Regex PII scrub over planted fixtures (every 7th doc gains a
    // deterministic email + phone tail): match counts, redacted length and a
    // post-scrub sha256 — so the oracle proves the scrub byte-for-byte, not
    // just "some rows changed". One codegen'd projection, no shuffle at all.
    "q71_pii_scrub" -> ((s, dir) => {
      val pii = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" Contact: user"), col("doc_id").cast("string"),
            lit("@example.com or +1-555-"), (col("doc_id") % 10000).cast("string"), lit(".")))
          .otherwise(col("text")))
      pii
        .withColumn("n_emails", size(regexp_extract_all(col("text2"), lit(emailPat), lit(0))).cast("long"))
        .withColumn("n_phones", size(regexp_extract_all(col("text2"), lit(phonePat), lit(0))).cast("long"))
        .withColumn("clean",
          regexp_replace(regexp_replace(col("text2"), emailPat, "[EMAIL]"), phonePat, "[PHONE]"))
        .filter(col("n_emails") > 0 || col("n_phones") > 0)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("clean")).cast("long").as("clean_len"),
          sha2(col("clean"), 256).as("clean_sha"))
        .orderBy(col("doc_id"))
    }),

    // Weighted mixture with EXACT per-source quotas (even-numbered sources
    // keep 50%, odd 20%): rank docs inside each source by a salted hash and
    // keep the first quota(source). Deterministic — the same corpus always
    // yields the same mixture. Output: per-source kept count, id-sum
    // checksum of the kept set, and the quota it must equal.
    "q72_source_mix" -> ((s, dir) => {
      val frac = when(expr("cast(substring(source, 4) as int)") % 2 === 0, lit(0.5))
        .otherwise(lit(0.2))
      val w = t(s, dir, "documents")
        .withColumn("rk", sha2(concat(lit("mix"), col("doc_id").cast("string")), 256))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("quota", greatest(lit(1L), floor(col("cnt") * frac)))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))))
      w.filter(col("rn") <= col("quota"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"),
          max(col("quota")).as("quota"))
        .orderBy(col("source"))
    }),

    // Pack documents into 2048-token training sequences by exclusive running
    // token count in doc_id order. Two-level prefix sum: a window per range
    // bucket (parallel — each bucket is an independent task), then bucket
    // totals get their own window over only #buckets rows to produce
    // offsets; prev_cum = offset + in-bucket running - own tokens. A naive
    // `Window.orderBy(doc_id)` with no partitioning computes the same number
    // in ONE task — the classic silent scale-killer this query exists to
    // avoid (PlanSpec gates the partitioned shape).
    "q73_pack_sequences" -> ((s, dir) => {
      val budget = 2048L
      // materialized: both the in-bucket windows and the bucket-total
      // offsets read this, and the token-count projection reads the wide
      // text column — without a checkpoint that scan runs twice
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          when(length(trim(col("text"))) > 0, size(split(lower(trim(col("text"))), "\\s+")))
            .otherwise(0).cast("long").as("n_toks"))
        .withColumn("bucket", expr("doc_id DIV 1000"))
        .localCheckpoint()
      val inBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = toks.withColumn("running", sum(col("n_toks")).over(inBucket))
      val offsets = toks.groupBy(col("bucket")).agg(sum(col("n_toks")).as("btot"))
        .withColumn("offset", coalesce(sum(col("btot")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "offset")
      run.join(broadcast(offsets), "bucket")
        .withColumn("prev_cum", col("offset") + col("running") - col("n_toks"))
        .withColumn("bin", floor(col("prev_cum") / lit(budget)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("bin"))
    }),

    // C4-style cross-document segment dedup: 10-token segments, first
    // occurrence (min doc_id, then min position) wins corpus-wide. The
    // winner election is one shuffle on the segment string; reassembly of
    // the surviving text is one shuffle back on doc_id — at 100 TB the
    // segment key would be sha-hashed to bound shuffle width, byte-identical
    // logic otherwise. Output proves the scrub: per-doc segment counts and
    // the sha256 of the kept text.
    "q76_segment_dedup" -> ((s, dir) => {
      val segs = t(s, dir, "documents")
        .withColumn("text2",
          when(col("doc_id") % 9 === 0, concat(lit(boiler + " "), col("text")))
            .otherwise(col("text")))
        .filter(length(trim(col("text2"))) > 0)
        .withColumn("toks", split(lower(trim(col("text2"))), "\\s+"))
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), floor((size(col("toks")) - 1) / lit(10)).cast("int")),
            i => array_join(slice(col("toks"), i * lit(10) + lit(1), lit(10)), " ")))
          .as(Seq("pos", "seg")))
      val w = Window.partitionBy(col("seg")).orderBy(col("doc_id"), col("pos"))
      segs.withColumn("keep", row_number().over(w) === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(col("keep").cast("long")).as("n_kept"),
          sha2(array_join(
            transform(array_sort(collect_list(when(col("keep"), struct(col("pos"), col("seg"))))),
              x => x("seg")), " "), 256).as("kept_sha"))
        .orderBy(col("doc_id"))
    }),

    // Gopher repetition signals: top-bigram occupancy and duplicate-trigram
    // share, integer basis points. The tokenized corpus is materialized once
    // (two gram sizes read it; no cross-branch CSE — the q75 lesson); each
    // gram branch is explode → partial-agg, the only exchange per branch.
    "q77_repetition" -> ((s, dir) => {
      val toks = tokenized(t(s, dir, "documents"), minToks = 3).localCheckpoint()
      val bi = gramCounts(toks, 2).groupBy(col("doc_id"))
        .agg(max(col("cnt")).as("top2"), sum(col("cnt")).as("tot2"))
      val tri = gramCounts(toks, 3).groupBy(col("doc_id"))
        .agg(sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup3"),
          sum(col("cnt")).as("tot3"))
      bi.join(tri, "doc_id")
        .select(col("doc_id"),
          floor(col("top2") * lit(10000.0) / col("tot2")).cast("long").as("top_bigram_bp"),
          floor(col("dup3") * lit(10000.0) / col("tot3")).cast("long").as("dup_trigram_bp"))
        .withColumn("flagged",
          col("top_bigram_bp") > 1000 || col("dup_trigram_bp") > 1500)
        .orderBy(col("doc_id"))
    }),

    // Corpus-trained bigram LM likelihood per document. Conditional
    // likelihood c(w1,w2)/c(w1·) goes to integer basis points PER BIGRAM
    // TYPE (one IEEE multiply+divide, floor), then the per-doc score is
    // floor(Σ cnt·bp / Σ cnt) — integer sums are order-independent, so the
    // whole score replays exactly in any engine. The per-doc bigram counts
    // are materialized once: corpus totals AND doc scoring both read them.
    "q78_lm_score" -> ((s, dir) => {
      val bi = tokenized(t(s, dir, "documents"), minToks = 2)
        .select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => struct(element_at(col("toks"), i + lit(1)).as("w1"),
              element_at(col("toks"), i + lit(2)).as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      // c12 feeds BOTH the unigram rollup and the bp join — materialize it
      // or the corpus-wide bigram aggregation runs twice (no cross-branch
      // CSE, the q75 lesson; c12 is vocab²-bounded, tiny next to bi)
      val c12 = bi.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c12"))
        .localCheckpoint()
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val bp = c12.join(c1, "w1")
        .withColumn("bp", floor(col("c12") * lit(10000.0) / col("c1")).cast("long"))
        .select(col("w1"), col("w2"), col("bp"))
      bi.join(bp, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"),
          sum(col("cnt") * col("bp")).as("sbp"))
        .select(col("doc_id"), col("n_bigrams"),
          floor(col("sbp").cast("double") / col("n_bigrams").cast("double"))
            .cast("long").as("lm_score_bp"))
        .orderBy(col("doc_id"))
    }),

    // Span-level quality outliers — localized gibberish detection (q78
    // scores whole documents; a spam injection in one paragraph of a long
    // good document hides in the doc-level average): every 20-token
    // sliding window scores its 19 bigrams under the corpus LM, and the
    // WORST window per document (score + position, packed into one
    // integer so the argmin hashes exactly) is the flag a span-level
    // cleaner acts on. Positional bigram table built once (feeds LM fit
    // AND scoring); the sliding sum is one ROWS-frame window per doc.
    "q180_span_quality" -> ((s, dir) => {
      val bi = tokenized(t(s, dir, "documents"), minToks = 20)
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => struct(element_at(col("toks"), i + lit(1)).as("w1"),
              element_at(col("toks"), i + lit(2)).as("w2")))).as(Seq("pos", "bg")))
        .select(col("doc_id"), col("pos"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .localCheckpoint() // feeds the LM fit AND the window scoring
      val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .localCheckpoint()
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val bp = c12.join(c1, "w1")
        .withColumn("bp", floor(col("c12") * lit(10000.0) / col("c1")).cast("long"))
        .select(col("w1"), col("w2"), col("bp"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, 18)
      bi.join(bp, Seq("w1", "w2"))
        .withColumn("nb", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .withColumn("wsum", sum(col("bp")).over(w))
        .filter(col("pos") <= col("nb") - 19)
        .withColumn("pack", expr("(wsum DIV 19) * 100000 + pos"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"), min(col("pack")).as("pk"))
        .select(col("doc_id"), col("n_windows"),
          expr("pk DIV 100000").as("worst_bp"),
          expr("pk % 100000").as("worst_pos"))
        .orderBy(col("doc_id"))
    }),

    // Corpus vocabulary with exact counts: tokens appearing in ≥ 20 distinct
    // documents, top 100 by occurrence. The explode fans out to one row per
    // token but map-side partial aggregation collapses it before the single
    // shuffle; the ≥20-df survivor set is tiny at any corpus size.
    "q74_vocab" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 20)
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(100)
    }),

    // Count-min heavy hitters (operators/Sketches.scala): the corpus is
    // scanned ONCE into exact per-token counts (map-side combined — the
    // count table is vocab-sized, not corpus-sized); the 4×1024 sketch MV
    // is built FROM those counts by additivity (weighted inserts), and the
    // top-20 tokens are point-estimated back against it. n_est ≥ n_exact
    // always (CM is an upper bound); for heavy hitters the estimate is
    // tight, and at 100 TB the stored artifact stays 4 KB while batch
    // sketches merge by cell-wise addition. Salted sha-slice hashing makes
    // the whole sketch a pure projection — the oracle replays it exactly.
    "q129_heavy_hitters" -> ((s, dir) => {
      import graft.operators.Sketches
      val depth = 4; val width = 1024
      val counts = t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        .localCheckpoint() // feeds sketch + top-k: one tokenize, two readers
      val sketch = Sketches.cmSketch(counts, col("token"), col("n_exact"), depth, width)
      val top = counts.orderBy(col("n_exact").desc, col("token")).limit(20)
      Sketches.cmEstimate(top, "token", sketch, depth, width)
        .select(col("token"), col("n_exact"), col("n_est"))
        .orderBy(col("n_exact").desc, col("token"))
    }),

    // Calibrated mixture assembly (the DoReMi/Pile "domain weights" step):
    // given target corpus shares per source in basis points, find the
    // LARGEST corpus honoring them exactly — budget B = min over sources of
    // floor(n_s·10000/target_s) (the binding source caps everything), per-
    // source quota = floor(B·target_s/10000), members = quota-first rows by
    // salted-hash rank (reproducible, coordination-free — q72's rank). One
    // window per source partition; all math integer, so the oracle replays
    // the budget, quotas AND membership (sum_ids) bit-for-bit.
    "q130_calibrated_mix" -> ((s, dir) => {
      val targetBp = when(expr("cast(substring(source, 4) as int)") % 3 === 0, lit(5000L))
        .when(expr("cast(substring(source, 4) as int)") % 3 === 1, lit(3000L))
        .otherwise(lit(2000L))
      val docs = t(s, dir, "documents")
        .withColumn("target_bp", targetBp)
        .withColumn("n_avail", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("rk", sha2(concat(lit("cal"), col("doc_id").cast("string")), 256))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))))
      val budget = docs.groupBy(col("source"))
        .agg(max(col("n_avail")).as("n_avail"), max(col("target_bp")).as("target_bp"))
        .agg(min(floor(col("n_avail") * lit(10000L) / col("target_bp"))).cast("long")
          .as("budget"))
      docs.crossJoin(broadcast(budget))
        .withColumn("quota", floor(col("budget") * col("target_bp") / lit(10000L)).cast("long"))
        .filter(col("rn") <= col("quota"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"),
          max(col("n_avail")).as("n_avail"), max(col("target_bp")).as("target_bp"),
          max(col("budget")).as("budget"))
        .orderBy(col("source"))
    }),

    // Temperature-scaled source mixing (the multilingual-sampling formula
    // of mT5/XLM-R and the Pile: p_i ∝ n_i^α, here α = 1/2) — q72/q130
    // mix to EXTERNAL targets; temperature mixing derives the target from
    // the data itself, upweighting rare sources relative to their natural
    // share. w_i = floor(sqrt(n_i)) is bit-identical cross-engine: IEEE
    // sqrt is correctly rounded and the nearest integer boundary is
    // ~1/(2√n) away — astronomically wider than a double ulp for any
    // realistic n (safe to ~2^52 docs per source). Budget = total/3,
    // integer quota arithmetic, membership by the salted-sha256 rank (the
    // q72 discipline: reproducible across re-runs and partitionings).
    "q275_temperature_mix" -> ((s, dir) => {
      // the synthetic sources are equal-sized — plant a ~25:13:9:7 size
      // skew (source_num mod 4 picks a keep stride over the per-source
      // row index doc_id DIV 20) so the α-scaling has real work: without
      // it nat_bp == tmp_bp everywhere
      val docs = t(s, dir, "documents")
        .filter(expr("(doc_id DIV 20) % (1 + cast(substring(source, 4) as int) % 4) = 0"))
        .withColumn("rk", sha2(concat(lit("tmp"), col("doc_id").cast("string")), 256))
        .withColumn("n_avail", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))))
        .withColumn("w", floor(sqrt(col("n_avail").cast("double"))).cast("long"))
      val tots = docs.groupBy(col("source"))
        .agg(max(col("n_avail")).as("na"), max(col("w")).as("ww"))
        .agg(sum(col("na")).cast("long").as("total"),
          sum(col("ww")).cast("long").as("sumw"))
      docs.crossJoin(broadcast(tots))
        .withColumn("quota", least(col("n_avail"),
          greatest(lit(1L), expr("(total DIV 3) * w DIV sumw"))))
        .filter(col("rn") <= col("quota"))
        .groupBy(col("source"))
        .agg(max(col("n_avail")).as("n_avail"),
          max(expr("10000 * n_avail DIV total")).as("nat_bp"),
          max(expr("10000 * w DIV sumw")).as("tmp_bp"),
          max(col("quota")).as("quota"),
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("source"))
    }),

    // BPE pair statistics — the counting pass of a byte-pair-encoding
    // tokenizer trainer's FIRST merge iteration: adjacent symbol-pair
    // frequencies over the word vocabulary, weighted by word frequency.
    // The corpus collapses to the (word, freq) table first (map-side
    // combined, vocab-sized), so the quadratic-ish pair fan-out runs over
    // the vocabulary, never the corpus — the only affordable shape at
    // 100 TB, and exactly how sentencepiece/HF trainers batch it. ASCII
    // words only (multibyte substring semantics differ across engines);
    // pair positions capped at 100 chars, mirrored in the oracle.
    "q132_bpe_pairs" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(col("word").rlike("^[a-z0-9']+$") && length(col("word")) >= 2)
        .groupBy(col("word")).agg(count(lit(1)).as("f"))
      words
        .select(col("f"), explode(expr(
          "transform(sequence(1, least(length(word) - 1, 100)), i -> substring(word, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("f")).as("n_occ"))
        .orderBy(col("n_occ").desc, col("pair"))
        .limit(30)
    }),

    // Top-5 most relevant terms per document, scored tf * (N+1)/(df+1) in
    // integer basis points. The corpus is scanned and tokenized ONCE: tf is
    // localCheckpoint-materialized and df / N both derive from it (df(token)
    // = its row count per token, N = its distinct doc count) — without the
    // materialization each branch re-runs the scan+explode lineage (no
    // cross-branch CSE; measured 3 corpus scans). N rides in as a broadcast
    // 1-row join, never a driver-side collect. ((tf * 10000.0) * (N+1)) /
    // (df+1): products stay < 2^53 so only the division rounds —
    // identically in every IEEE engine.
    "q75_tfidf" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nd = tf.agg(countDistinct(col("doc_id")).as("nd"))
      val scored = tf.join(df, "token").crossJoin(broadcast(nd))
        .withColumn("rel_score_bp",
          floor(col("tf") * lit(10000.0) * (col("nd") + lit(1L)) / (col("df") + lit(1L)))
            .cast("long"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("rel_score_bp").desc, col("token"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("doc_id"), col("rank").cast("long").as("rank"), col("token"),
          col("tf"), col("df"), col("rel_score_bp"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Link-authority quality prior (PageRank, operators/LinkRank.scala): the
    // part↔supplier bipartite graph distilled from lineitem stands in for a
    // crawl's host/link graph (crawler.py:17-50 walks one, never scores it).
    // Undirected construction ⇒ every node has out-edges ⇒ no dangling mass.
    // 5 power-iteration rounds in EXACT integer rank units (integral div +
    // long sums — no float accumulation), so the DuckDB oracle replays all 5
    // rounds as unrolled CTEs and the top-30 hash-matches bit-for-bit.
    // Node encoding is parity-disjoint (2k parts / 2k+1 suppliers), sound at
    // EVERY scale factor — an additive offset would collide once l_partkey
    // outgrows it (sf>=10 has >1M parts) and silently merge graph nodes.
    // Bounded k-core peel (GraphStats.kCore) — the graph-curation prune
    // ahead of link-based quality scoring (q87): 5 rounds of "drop nodes
    // with degree < 3 on the surviving subgraph" over the same
    // parity-encoded part↔supplier bipartite graph. Deterministic fixed
    // rounds ⇒ the oracle unrolls all 5 as CTE levels; graded per node
    // type with node counts, surviving-edge counts and id checksums.
    "q171_kcore" -> ((s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sup"))
        .distinct()
      val sym = pairs.select(col("p").as("src"), col("sup").as("dst"))
        .union(pairs.select(col("sup").as("src"), col("p").as("dst")))
      graft.operators.GraphStats.kCore(sym, "src", "dst", k = 3, rounds = 5)
        .groupBy(when(col("src") % 2 === 0, "part").otherwise("supplier")
          .as("node_type"))
        .agg(countDistinct(col("src")).as("n_nodes"),
          count(lit(1)).as("n_edges"),
          sum_distinct(col("src")).as("sum_node_ids"))
        .orderBy(col("node_type"))
    }),

    "q87_link_authority" -> ((s, dir) => {
      // width discipline (the round-7 CPU-stage lesson): the testdata
      // parquet is single-row-group, so the scan arrives 1-2 partitions
      // wide — round-robin repartition BEFORE the distinct so its partial
      // agg runs at full width; and derive both edge directions from ONE
      // pass over the distinct pairs (explode) instead of a union whose
      // second branch re-runs the scan+distinct
      val np = s.sessionState.conf.numShufflePartitions
      val pairs = t(s, dir, "lineitem")
        .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sup"))
        .repartition(np)
        .distinct()
      val edges = pairs.select(explode(array(
          struct(col("p").as("src"), col("sup").as("dst")),
          struct(col("sup").as("src"), col("p").as("dst")))).as("e"))
        .select(col("e.src"), col("e.dst"))
      graft.operators.LinkRank.pageRank(edges, iters = 5)
        .orderBy(col("rank").desc, col("node").asc)
        .limit(30)
        .select(col("node"), col("rank"))
    }),

    // Seeded global-shuffle sharded export — the layout verb that hands a
    // curated corpus to a trainer: a deterministic pseudo-random order
    // (affine hash mod a prime — the reproducible, coordination-free
    // alternative to seeded rand()) gives every doc a position, shard =
    // order key mod 8 co-locates each shard in ONE writer task
    // (repartition on shard), rows land sorted by order key, and
    // maxRecordsPerFile bounds every output file. Graded per shard:
    // counts, char totals, order-key range, an order checksum
    // (Σ doc_id·rank — equal only if the within-shard order is exactly
    // the seeded one), the file count (== ceil(n/2000): one writer task
    // per shard rolling at the bound) and the per-file row bound.
    "q158_sharded_export" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_shard_export_" +
        Integer.toHexString(dir.hashCode)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("ok",
          pmod(col("doc_id") * lit(2654435761L) + lit(40503L), lit(1000003L)))
        .withColumn("shard", pmod(col("ok"), lit(8L)))
      d.repartition(col("shard"))
        .sortWithinPartitions(col("ok"), col("doc_id"))
        .write.mode("overwrite").option("maxRecordsPerFile", "2000")
        .partitionBy("shard").parquet(path)
      val back = s.read.parquet(path)
        .select(col("shard").cast("long").as("shard"), col("doc_id"), col("ok"),
          col("n_chars"), col("_metadata.file_path").as("fp"))
      val files = back.groupBy(col("shard"), col("fp"))
        .agg(count(lit(1)).as("nf"))
        .groupBy(col("shard"))
        .agg(countDistinct(col("fp")).as("n_files"),
          (max(col("nf")) <= 2000).as("files_bounded"))
      val rn = row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id")))
      back.withColumn("rn", rn)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("ok")).as("min_ok"), max(col("ok")).as("max_ok"),
          sum(col("doc_id") * col("rn")).as("order_checksum"))
        .join(files, "shard")
        .orderBy(col("shard"))
    }),

    // The assembly line END-TO-END — what a user actually runs to turn a
    // raw corpus into training-ready shards, composed from the graded
    // pieces: quality gate (length threshold, the q143 shape) → exact
    // dedup by content hash with planted exact copies that MUST vanish
    // (min-id wins; if the dedup stage were dropped, the copies inflate
    // every count and the hash breaks) → deterministic sha256-bucket
    // split (q69) → seeded shard assignment (q158). One window on the
    // content hash + one final rollup; everything else is projection.
    "q169_curation_assembly" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"), col("n_chars"))
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 7000000000L).as("doc_id"), col("text"), col("n_chars")))
      val gated = corpus.filter(col("n_chars") >= 200)
      val deduped = gated
        .withColumn("rn", row_number().over(
          Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      deduped
        .groupBy(
          when(bucket64(col("doc_id")) < 51, "train")
            .when(bucket64(col("doc_id")) < 57, "val").otherwise("test").as("split"),
          pmod(pmod(col("doc_id") * lit(2654435761L) + lit(40503L), lit(1000003L)),
            lit(4L)).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("split"), col("shard"))
    }),

    // INCREMENTAL shard maintenance — q158's export as an append-only verb:
    // wave 1 lands half the corpus, wave 2 appends the rest under the SAME
    // deterministic order/shard rules (no rewrite of wave-1 files — at
    // 100 TB the daily delta must never touch yesterday's output). Graded:
    // the union read-back is CONTENT-identical to a one-shot export (same
    // per-shard counts and order checksums over the seeded rank), the file
    // count is exactly both waves' ceil sums (appends roll their own files)
    // and every file still respects the row bound — the incremental path
    // costs fragmentation (which q128/q149 compaction repairs), never
    // correctness.
    "q165_incremental_export" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_shard_incr_" +
        Integer.toHexString(dir.hashCode)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("ok",
          pmod(col("doc_id") * lit(2654435761L) + lit(40503L), lit(1000003L)))
        .withColumn("shard", pmod(col("ok"), lit(8L)))
      def export(batch: DataFrame, mode: String): Unit =
        batch.repartition(col("shard"))
          .sortWithinPartitions(col("ok"), col("doc_id"))
          .write.mode(mode).option("maxRecordsPerFile", "2000")
          .partitionBy("shard").parquet(path)
      export(d.filter(col("doc_id") % 2 === 0), "overwrite")
      export(d.filter(col("doc_id") % 2 =!= 0), "append")
      val back = s.read.parquet(path)
        .select(col("shard").cast("long").as("shard"), col("doc_id"), col("ok"),
          col("n_chars"), col("_metadata.file_path").as("fp"))
      val files = back.groupBy(col("shard"), col("fp"))
        .agg(count(lit(1)).as("nf"))
        .groupBy(col("shard"))
        .agg(countDistinct(col("fp")).as("n_files"),
          (max(col("nf")) <= 2000).as("files_bounded"))
      val rn = row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id")))
      back.withColumn("rn", rn)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("doc_id") * col("rn")).as("order_checksum"))
        .join(files, "shard")
        .orderBy(col("shard"))
    }),

    // Encoding-artifact audit — web corpora at 100 TB carry double-encoded
    // UTF-8 mojibake (the U+00C3 U+00A9 / U+00E2 U+0080 x sequences a
    // latin-1 round-trip leaves behind),
    // U+FFFD replacement chars from lossy decodes, and stray control
    // bytes. The fixture plants each disease deterministically (doc_id
    // arithmetic — the corpus itself is clean ASCII) and the audit grades
    // per-source detection counts. Pure codegen'd projection + one partial
    // agg: embarrassingly parallel, no shuffle beyond the 8-group rollup.
    "q159_mojibake" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("text2",
          when(col("doc_id") % 17 === 0, concat(col("text"), lit(" caf\u00c3\u00a9")))
            .when(col("doc_id") % 23 === 0, concat(col("text"), lit(" bad\ufffdbyte")))
            .when(col("doc_id") % 29 === 0, concat(col("text"), lit(" it\u00e2\u0080\u0099s")))
            .when(col("doc_id") % 31 === 0, concat(col("text"), lit(" bell\u0007")))
            .otherwise(col("text")))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("text2").rlike("\u00c3.|\u00e2\u0080"), 1L).otherwise(0L))
            .as("n_mojibake"),
          sum(when(col("text2").contains("\ufffd"), 1L).otherwise(0L))
            .as("n_replacement"),
          sum(when(col("text2").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"), 1L)
            .otherwise(0L)).as("n_ctrl"))
        .orderBy(col("source"))
    }))

  /** DuckDB 5-gram CTEs over a `(id, text2)` relation named `rel`:
    * `<p>tok` tokens, `<p>grams` distinct per-id grams. */
  private def gramsSql(rel: String, id: String, p: String): String =
    s"""${p}tok AS (
       |  SELECT $id, regexp_split_to_array(lower(trim(text2)), '\\s+') AS toks
       |  FROM $rel WHERE length(trim(text2)) > 0),
       |${p}grams AS (
       |  SELECT DISTINCT $id, array_to_string(toks[i:i+4], ' ') AS gram
       |  FROM ${p}tok, unnest(generate_series(1, len(toks)-4)) AS u(i)
       |  WHERE len(toks) >= 5)""".stripMargin

  val oracle: Map[String, String] = Map(
    // 5 peel rounds unrolled as CTE levels over the same bipartite encoding
    "q171_kcore" -> {
      val rounds = (1 to 5).map { i =>
        s"""k$i AS (SELECT src AS node FROM g${i - 1} GROUP BY src HAVING count(*) >= 3),
           |g$i AS (SELECT g.src, g.dst FROM g${i - 1} g
           |  JOIN k$i a ON a.node = g.src JOIN k$i b ON b.node = g.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sup
         |  FROM lineitem),
         |g0 AS (SELECT p AS src, sup AS dst FROM e0
         |       UNION ALL SELECT sup AS src, p AS dst FROM e0),
         |$rounds
         |SELECT CASE WHEN src % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
         |  count(DISTINCT src) AS n_nodes, count(*) AS n_edges,
         |  cast(sum(DISTINCT src) as bigint) AS sum_node_ids
         |FROM g5 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // the seeded order, shard assignment, and within-shard rank replay
    // relationally; the layout facts (file count, per-file bound) are
    // pinned to the values the write contract forces: one writer task per
    // shard rolling a new file every 2000 rows
    "q158_sharded_export" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    (doc_id * 2654435761 + 40503) % 1000003 AS ok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars, ok, ok % 8 AS shard,
        |    row_number() OVER (PARTITION BY ok % 8 ORDER BY ok, doc_id) AS rn
        |  FROM d)
        |SELECT cast(shard as bigint) AS shard, count(*) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS total_chars,
        |  min(ok) AS min_ok, max(ok) AS max_ok,
        |  cast(sum(doc_id * rn) as bigint) AS order_checksum,
        |  cast(ceil(count(*) / 2000.0) as bigint) AS n_files,
        |  true AS files_bounded
        |FROM r GROUP BY shard ORDER BY shard""".stripMargin,

    // the whole assembly replays relationally: gate → group-by-text dedup
    // (equivalent to the sha256 partition — same equivalence classes) →
    // bucket split → shard formula
    "q169_curation_assembly" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 7000000000, text, n_chars FROM documents WHERE doc_id % 50 = 0),
        |gated AS (SELECT * FROM corpus WHERE n_chars >= 200),
        |dedup AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM gated),
        |kept AS (SELECT doc_id, n_chars FROM dedup WHERE rn = 1),
        |lab AS (
        |  SELECT doc_id, n_chars,
        |    cast(('0x' || substr(sha256(cast(doc_id as varchar)), 2, 15)) as bigint) % 64 AS b,
        |    ((doc_id * 2654435761 + 40503) % 1000003) % 4 AS shard
        |  FROM kept)
        |SELECT CASE WHEN b < 51 THEN 'train' WHEN b < 57 THEN 'val' ELSE 'test' END AS split,
        |  cast(shard as bigint) AS shard, count(*) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS total_chars,
        |  cast(sum(doc_id) as bigint) AS sum_ids
        |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // content equals the one-shot export's replay; the file count is the
    // per-wave ceil sum (each append wave rolls its own bounded files)
    "q165_incremental_export" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    (doc_id * 2654435761 + 40503) % 1000003 AS ok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars, ok, ok % 8 AS shard,
        |    row_number() OVER (PARTITION BY ok % 8 ORDER BY ok, doc_id) AS rn
        |  FROM d),
        |waves AS (
        |  SELECT ok % 8 AS shard,
        |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_even,
        |    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_odd
        |  FROM d GROUP BY 1)
        |SELECT cast(r.shard as bigint) AS shard, count(*) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS total_chars,
        |  cast(sum(doc_id * rn) as bigint) AS order_checksum,
        |  cast(ceil(any_value(n_even) / 2000.0)
        |     + ceil(any_value(n_odd) / 2000.0) as bigint) AS n_files,
        |  true AS files_bounded
        |FROM r JOIN waves ON waves.shard = r.shard
        |GROUP BY r.shard ORDER BY shard""".stripMargin,

    // replay of the planted encoding diseases (chr() spells the exact
    // codepoints the Spark side injects) and the three detectors
    "q159_mojibake" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 17 = 0 THEN text || ' caf' || chr(195) || chr(169)
        |         WHEN doc_id % 23 = 0 THEN text || ' bad' || chr(65533) || 'byte'
        |         WHEN doc_id % 29 = 0 THEN text || ' it' || chr(226) || chr(128) || chr(153) || 's'
        |         WHEN doc_id % 31 = 0 THEN text || ' bell' || chr(7)
        |         ELSE text END AS text2
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  cast(sum(CASE WHEN regexp_matches(text2, chr(195) || '.|' || chr(226) || chr(128))
        |           THEN 1 ELSE 0 END) as bigint) AS n_mojibake,
        |  cast(sum(CASE WHEN contains(text2, chr(65533)) THEN 1 ELSE 0 END) as bigint)
        |    AS n_replacement,
        |  cast(sum(CASE WHEN regexp_matches(text2, '[\x00-\x08\x0b\x0c\x0e-\x1f]')
        |           THEN 1 ELSE 0 END) as bigint) AS n_ctrl
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q137_substring_spans" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 6 = 0 THEN text || ' ' || '$spanBoiler'
         |         ELSE text END AS text2
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, i AS p, substr(text2, i, 32) AS gram
         |  FROM base, unnest(generate_series(1, length(text2) - 31)) AS u(i)
         |  WHERE length(text2) >= 32),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (
         |  SELECT g.doc_id, g.p,
         |    g.p - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.p) AS island
         |  FROM g JOIN d USING (gram)),
         |isl AS (
         |  SELECT doc_id, island, count(*) AS npos, max(p) - min(p) + 32 AS covered
         |  FROM dp GROUP BY doc_id, island)
         |SELECT doc_id, cast(count(*) as bigint) AS n_spans,
         |  cast(sum(npos) as bigint) AS n_dup_pos,
         |  cast(sum(covered) as bigint) AS dup_chars
         |FROM isl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q140_url_canonical" ->
      """WITH v AS (
        |  SELECT doc_id, cast(0 as bigint) AS variant,
        |    'https://' || source || '.example.com/' || lang || '/' || doc_id || '/' AS url,
        |    cast(doc_id % 365 as int) AS off
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, cast(1 as bigint) AS variant,
        |    'HTTPS://' || upper(source) || '.EXAMPLE.COM:443/' || lang || '/' || doc_id
        |      || '/?utm_source=feed&session=' || doc_id || '#top' AS url,
        |    cast(doc_id % 365 + 10 as int) AS off
        |  FROM documents WHERE doc_id % 4 = 0),
        |c AS (
        |  SELECT doc_id, variant,
        |    regexp_replace(lower(regexp_extract(u1, '^([^:]+://[^/]+)', 1)), ':443$', '')
        |      || regexp_replace(regexp_extract(u1, '^[^:]+://[^/]+(/.*)?$', 1), '/$', '')
        |      AS canon,
        |    strftime(DATE '2024-01-01' + off, '%Y-%m-%d') AS fetched
        |  FROM (SELECT *, regexp_replace(regexp_replace(url, '#.*$', ''), '\?.*$', '') AS u1
        |        FROM v)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY canon
        |    ORDER BY fetched DESC, variant ASC) AS rn
        |  FROM c)
        |SELECT canon, cast(count(*) as bigint) AS n_variants,
        |  max(CASE WHEN rn = 1 THEN variant END) AS win_variant,
        |  max(CASE WHEN rn = 1 THEN fetched END) AS win_fetched,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS doc_id
        |FROM r GROUP BY canon ORDER BY canon""".stripMargin,

    "q146_l_diversity" ->
      """SELECT c_nationkey,
        |  cast(floor(c_acctbal / 1000) as bigint) AS band,
        |  cast(count(*) as bigint) AS n,
        |  cast(count(DISTINCT c_mktsegment) as bigint) AS l,
        |  count(DISTINCT c_mktsegment) < 3 AS at_risk
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY c_nationkey, band""".stripMargin,

    "q148_collocations" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |t2 AS (SELECT * FROM tok WHERE len(toks) >= 2),
        |uni AS (
        |  SELECT w, cast(count(*) as bigint) AS c1
        |  FROM (SELECT unnest(toks) AS w FROM t2) GROUP BY w),
        |bi AS (
        |  SELECT array_to_string(toks[i:i+1], ' ') AS gram,
        |    cast(count(*) as bigint) AS c12
        |  FROM t2, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT sum(c1) FROM uni) AS n, (SELECT sum(c12) FROM bi) AS b)
        |SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2,
        |  c12,
        |  cast(floor(100.0 * (cast(c12 * n * n as double)
        |    / cast(b * u1.c1 * u2.c1 as double)) + 0.5) as bigint) AS lift_x100
        |FROM bi CROSS JOIN tot
        |JOIN uni u1 ON u1.w = string_split(gram, ' ')[1]
        |JOIN uni u2 ON u2.w = string_split(gram, ' ')[2]
        |WHERE c12 >= 5
        |ORDER BY lift_x100 DESC, w1, w2
        |LIMIT 30""".stripMargin,

    "q141_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  cast(floor(c_acctbal / 1000) as bigint) AS band,
        |  cast(count(*) as bigint) AS n,
        |  count(*) < 5 AS at_risk
        |FROM customer
        |GROUP BY 1, 2, 3
        |ORDER BY c_nationkey, c_mktsegment, band""".stripMargin,

    "q142_char_quality" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, i, 1) AS ch
        |  FROM documents, unnest(generate_series(1, length(text))) AS u(i)
        |  WHERE length(text) > 0),
        |hist AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY doc_id, ch),
        |agg AS (
        |  SELECT doc_id, cast(sum(cnt) as bigint) AS n,
        |    cast(count(*) as bigint) AS n_distinct,
        |    cast(sum(cnt * cnt) as bigint) AS ss,
        |    cast(sum(CASE WHEN ch IN (' ', chr(9), chr(10)) THEN cnt ELSE 0 END) as bigint) AS ws,
        |    cast(sum(CASE WHEN ch BETWEEN '0' AND '9' THEN cnt ELSE 0 END) as bigint) AS dg
        |  FROM hist GROUP BY doc_id)
        |SELECT doc_id, n, n_distinct,
        |  cast(floor(10000.0 * (n * n - ss) / (n * n) + 0.5) as bigint) AS simpson_bp,
        |  cast(floor(10000.0 * ws / n + 0.5) as bigint) AS ws_bp,
        |  cast(floor(10000.0 * dg / n + 0.5) as bigint) AS digit_bp
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q143_quality_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint) AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |thr AS (
        |  SELECT source, percentile_cont(0.25) WITHIN GROUP (ORDER BY toks) AS thr
        |  FROM toks GROUP BY source)
        |SELECT t.source, cast(count(*) as bigint) AS n_total,
        |  cast(sum(CASE WHEN t.toks >= h.thr THEN 1 ELSE 0 END) as bigint) AS n_kept,
        |  cast(floor(max(h.thr) * 100 + 0.5) as bigint) AS thr_x100,
        |  sha256(string_agg(CASE WHEN t.toks >= h.thr THEN cast(t.doc_id as varchar) END,
        |                    ',' ORDER BY t.doc_id)) AS kept_sha
        |FROM toks t JOIN thr h ON t.source = h.source
        |GROUP BY t.source ORDER BY t.source""".stripMargin,
    "q121_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |corp AS (SELECT count(*) AS n_docs, cast(sum(dl) as bigint) AS t_toks FROM dl),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('spark', 'data', 'model') GROUP BY doc_id, tok),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |scored AS (
        |  SELECT doc_id,
        |    10000 * (length(bin(s)) - 1)
        |      + (10000 * (s - (1::BIGINT << (length(bin(s)) - 1))))
        |        // (1::BIGINT << (length(bin(s)) - 1)) - 100000 AS idf_bp,
        |    tf_bp
        |  FROM (
        |    SELECT t.doc_id,
        |      ((1024 * (2*n_docs + 2)) // (2*df + 1)) AS s,
        |      ((10000 * 22 * t_toks * tf) // (10 * t_toks * tf + 3 * t_toks + 9 * dl.dl * n_docs)) AS tf_bp
        |    FROM tf t JOIN dft USING (tok) JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN corp) y)
        |SELECT doc_id, cast(sum((idf_bp * tf_bp) // 10000) as bigint) AS bm25_bp,
        |  count(*) AS n_terms
        |FROM scored GROUP BY doc_id
        |ORDER BY bm25_bp DESC, doc_id LIMIT 20""".stripMargin,

    "q122_weighted_sample" ->
      s"""WITH p AS (
         |  SELECT source, doc_id, n_chars,
         |    ${graft.operators.Sampling.prioritySql("doc_id", "n_chars", "ws6")} AS prio
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, n_chars, prio,
         |    cast(row_number() OVER (PARTITION BY source
         |      ORDER BY prio DESC, doc_id ASC) as int) AS rank
         |  FROM p QUALIFY rank <= 5)
         |SELECT source, doc_id, n_chars, prio, rank FROM r
         |ORDER BY source, rank""".stripMargin,

    // the identical delimited-spelling replace chain, replayed: DuckDB's
    // replace() is the same leftmost non-overlapping all-occurrences scan
    "q262_bpe_apply" -> {
      val spelled = """rtrim(regexp_replace(w, '(.)', '|\1| ', 'g'))"""
      val chain = bpeMerges.foldLeft(spelled) { case (acc, (x, y)) =>
        s"replace($acc, '|$x| |$y|', '|$x$y|')"
      }
      s"""WITH w0 AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
         |  FROM documents),
         |w1 AS (SELECT doc_id, w FROM w0 WHERE length(w) > 0),
         |sp AS (SELECT doc_id, w, $chain AS s FROM w1),
         |g AS (
         |  SELECT doc_id, cast(sum(length(w)) as bigint) AS n_chars,
         |    cast(sum(len(string_split(s, ' '))) as bigint) AS n_tok
         |  FROM sp GROUP BY doc_id)
         |SELECT doc_id, n_chars, n_tok, (10000 * n_tok) // n_chars AS ratio_bp
         |FROM g ORDER BY doc_id""".stripMargin
    },

    // the 8 training rounds unroll as chained CTEs: p<n> is round n's
    // argmax pair (computed, not pinned), s<n> the corpus after applying
    // it; '→' is a safe pair delimiter (the corpus is [a-z ] words)
    "q268_bpe_train" -> {
      val spelled = """rtrim(regexp_replace(w, '(.)', '|\1| ', 'g'))"""
      val rounds = (1 to 8).map { n =>
        val prev = s"s${n - 1}"
        s"""p$n AS (
           |  SELECT string_split(pr, '→')[1] AS l, string_split(pr, '→')[2] AS r,
           |    cast(sum(c) as bigint) AS cnt
           |  FROM (SELECT c, unnest(list_transform(range(1, len(toks)),
           |          i -> trim(toks[i], '|') || '→' || trim(toks[i+1], '|'))) AS pr
           |        FROM (SELECT c, string_split(sp, ' ') AS toks FROM $prev))
           |  GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
           |s$n AS (SELECT c, replace(sp, '|'||l||'| |'||r||'|', '|'||l||r||'|') AS sp
           |        FROM $prev CROSS JOIN p$n)""".stripMargin
      }.mkString(",\n")
      val tail = (1 to 8).map { n =>
        if (n == 1) s"SELECT 1 AS rank, l AS lhs, r AS rhs, cnt FROM p1"
        else s"UNION ALL SELECT $n, l, r, cnt FROM p$n"
      }.mkString("\n")
      s"""WITH w0 AS (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
         |  FROM documents),
         |wf AS (SELECT w, cast(count(*) as bigint) AS c
         |       FROM w0 WHERE length(w) > 0 GROUP BY w),
         |s0 AS (SELECT c, $spelled AS sp FROM wf),
         |$rounds
         |SELECT * FROM (
         |$tail
         |) ORDER BY rank""".stripMargin
    },

    // the planted skew, the exact isqrt weights, the integer quota math
    // and the salted-rank membership all replay
    "q275_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    count(*) OVER (PARTITION BY source) AS n_avail,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sha256('tmp' || cast(doc_id as varchar)), doc_id) AS rn
        |  FROM documents
        |  WHERE (doc_id // 20) % (1 + cast(substring(source, 4) as int) % 4) = 0),
        |w AS (SELECT d.*, cast(floor(sqrt(cast(n_avail as double))) as bigint) AS w FROM d),
        |t AS (SELECT cast(sum(na) as bigint) AS total, cast(sum(ww) as bigint) AS sumw
        |      FROM (SELECT source, max(n_avail) AS na, max(w) AS ww FROM w GROUP BY source)),
        |k AS (
        |  SELECT w.*, t.total, t.sumw,
        |    least(n_avail, greatest(1, ((t.total // 3) * w.w) // t.sumw)) AS quota
        |  FROM w CROSS JOIN t)
        |SELECT source, max(n_avail) AS n_avail,
        |  max(10000 * n_avail // total) AS nat_bp,
        |  max(10000 * w // sumw) AS tmp_bp,
        |  max(quota) AS quota,
        |  cast(count(*) as bigint) AS n_kept,
        |  cast(sum(doc_id) as bigint) AS sum_ids
        |FROM k WHERE rn <= quota
        |GROUP BY source ORDER BY source""".stripMargin,

    // the chunk grid, the 64-bucket sha256 ring and both lead() hops
    // replay; negatives match because the ring ORDER (hr, cid) is pure
    // sha256 on both engines
    "q274_contrastive_pairs" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
        |  FROM documents WHERE length(text) > 0),
        |ch AS (SELECT doc_id, pos, doc_id || '_' || pos AS cid FROM c),
        |ring AS (
        |  SELECT doc_id, cid,
        |    cast(('0x' || substr(sha256(cid), 2, 15)) as bigint) % 64 AS b,
        |    sha256('neg:' || cid) AS hr
        |  FROM ch),
        |wn AS (
        |  SELECT cid AS anchor, doc_id,
        |    lead(cid, 1) OVER w AS n1_cid, lead(doc_id, 1) OVER w AS n1_doc,
        |    lead(cid, 2) OVER w AS n2_cid, lead(doc_id, 2) OVER w AS n2_doc
        |  FROM ring WINDOW w AS (PARTITION BY b ORDER BY hr, cid)),
        |neg AS (
        |  SELECT anchor,
        |    CASE WHEN n1_doc IS NOT NULL AND n1_doc <> doc_id THEN n1_cid
        |         WHEN n2_doc IS NOT NULL AND n2_doc <> doc_id THEN n2_cid END AS negative
        |  FROM wn)
        |SELECT a.doc_id, a.cid AS anchor, p.cid AS positive, n.negative
        |FROM ch a
        |JOIN ch p ON p.doc_id = a.doc_id AND p.pos = a.pos + 1
        |JOIN neg n ON n.anchor = a.cid
        |WHERE n.negative IS NOT NULL
        |ORDER BY anchor""".stripMargin,

    // the hashed-bucket models, the integer log2 and the top-100 window
    // all replay; the bucket is the Sampling.hashBucket 60-bit sha256
    // slice, so both engines agree bucket-for-bucket
    "q270_dsir_select" -> {
      def l2(x: String) = s"(10000 * (length(bin($x)) - 1) + (10000 * (($x) - " +
        s"(cast(1 as bigint) << (length(bin($x)) - 1)))) // " +
        s"(cast(1 as bigint) << (length(bin($x)) - 1)))"
      "WITH tk AS (\n" +
        "  SELECT doc_id, lang, n_chars,\n" +
        "    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok\n" +
        "  FROM documents),\n" +
        "tb AS (\n" +
        "  SELECT doc_id, lang, n_chars,\n" +
        "    cast(('0x' || substr(sha256(tok), 2, 15)) as bigint) % 1024 AS b\n" +
        "  FROM tk WHERE length(tok) > 0),\n" +
        "f AS (\n" +
        "  SELECT b, cast(count(*) as bigint) AS rc,\n" +
        "    cast(count(*) FILTER (WHERE lang = 'en' AND n_chars >= 300) as bigint) AS tc\n" +
        "  FROM tb GROUP BY b),\n" +
        "fl AS (\n" +
        s"  SELECT b, ${l2("tc + 1")} AS lt_bp, ${l2("rc + 1")} AS lr_bp FROM f),\n" +
        "tot AS (\n" +
        "  SELECT cast(count(*) as bigint) AS r_tot,\n" +
        "    cast(count(*) FILTER (WHERE lang = 'en' AND n_chars >= 300) as bigint) AS t_tot\n" +
        "  FROM tb),\n" +
        "d AS (\n" +
        "  SELECT tb.doc_id, cast(count(*) as bigint) AS n_tok,\n" +
        "    cast(sum(fl.lt_bp - fl.lr_bp) as bigint) AS s0\n" +
        "  FROM tb JOIN fl ON fl.b = tb.b GROUP BY tb.doc_id),\n" +
        "sc AS (\n" +
        s"  SELECT doc_id, n_tok, s0 + n_tok * (${l2("r_tot + 1024")} - ${l2("t_tot + 1024")}) AS score_bp\n" +
        "  FROM d CROSS JOIN tot)\n" +
        "SELECT doc_id, n_tok, score_bp,\n" +
        "  cast(row_number() OVER (ORDER BY score_bp DESC, doc_id) as int) AS rank\n" +
        "FROM sc QUALIFY rank <= 100 ORDER BY rank"
    },

    // the bigram counts, the piecewise integer log2 and the truncating
    // division all replay exactly (the bin()/<< spelling — NOTES gotcha)
    "q257_lm_perplexity" ->
      """WITH tk0 AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        |  FROM documents),
        |tk1 AS (SELECT doc_id, tk FROM tk0 WHERE len(tk) >= 2),
        |occ AS (
        |  SELECT doc_id, tk[i-1] AS w1, tk[i] AS w2
        |  FROM (SELECT doc_id, tk, unnest(generate_series(2, len(tk))) AS i
        |        FROM tk1) u),
        |bgc AS (SELECT w1, w2, count(*) AS cbg FROM occ GROUP BY w1, w2),
        |ctx AS (SELECT w1, count(*) AS cug FROM occ GROUP BY w1),
        |sc AS (
        |  SELECT o.doc_id,
        |    (10000 * (length(bin(c.cug)) - 1)
        |      + (10000 * (c.cug - (cast(1 as bigint) << (length(bin(c.cug)) - 1))))
        |        // (cast(1 as bigint) << (length(bin(c.cug)) - 1)))
        |    - (10000 * (length(bin(b.cbg)) - 1)
        |      + (10000 * (b.cbg - (cast(1 as bigint) << (length(bin(b.cbg)) - 1))))
        |        // (cast(1 as bigint) << (length(bin(b.cbg)) - 1))) AS d_bp
        |  FROM occ o
        |  JOIN bgc b ON b.w1 = o.w1 AND b.w2 = o.w2
        |  JOIN ctx c ON c.w1 = o.w1),
        |g AS (
        |  SELECT doc_id, cast(count(*) as bigint) AS n_bi,
        |    cast(sum(d_bp) as bigint) AS s_bp
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bi, s_bp // n_bi AS nll_bp,
        |  cast(CASE WHEN s_bp // n_bi < 48800 THEN 1 ELSE 0 END as bigint) AS keep
        |FROM g ORDER BY doc_id""".stripMargin,

    "q194_crawl_diff" ->
      """WITH a AS (
        |  SELECT doc_id, sha256(text) AS ha, cast(length(text) as bigint) AS la
        |  FROM documents WHERE doc_id % 11 <> 0),
        |b0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev 2]' ELSE text END AS tb
        |  FROM documents WHERE doc_id % 13 <> 0),
        |b AS (SELECT doc_id, sha256(tb) AS hb, cast(length(tb) as bigint) AS lb FROM b0),
        |j AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, ha, hb, lb,
        |    CASE WHEN ha IS NULL THEN 'added'
        |         WHEN hb IS NULL THEN 'removed'
        |         WHEN ha = hb THEN 'unchanged' ELSE 'changed' END AS class
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT class, count(*) AS n_docs, cast(sum(doc_id) as bigint) AS sum_ids,
        |  cast(coalesce(sum(lb), 0) as bigint) AS chars_after
        |FROM j GROUP BY class ORDER BY class""".stripMargin,

    "q195_filter_funnel" ->
      """WITH d AS (
        |  SELECT source, doc_id, text, cast(length(text) as bigint) AS len,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source, doc_id, len,
        |    cast(len(toks) as bigint) AS n_toks,
        |    cast(len(list_filter(toks, t -> t IN
        |      ('the','a','of','and','to','in','is','for'))) as bigint) AS n_stop,
        |    cast(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
        |      as bigint) AS n_nonalnum
        |  FROM d),
        |s AS (
        |  SELECT source, doc_id, len, n_toks,
        |    (10000 * n_stop) // greatest(n_toks, 1) AS stop_bp,
        |    (100 * (len - n_toks + 1)) // greatest(n_toks, 1) AS mean_wlen_x100,
        |    (10000 * n_nonalnum) // greatest(len, 1) AS nonal_bp
        |  FROM m),
        |g AS (
        |  SELECT source, doc_id,
        |    (len >= 200) AS g1,
        |    (len >= 200 AND stop_bp >= 500) AS g2,
        |    (len >= 200 AND stop_bp >= 500 AND mean_wlen_x100 <= 1200) AS g3,
        |    (len >= 200 AND stop_bp >= 500 AND mean_wlen_x100 <= 1200
        |      AND nonal_bp <= 1500) AS g4
        |  FROM s)
        |SELECT source, count(*) AS n_in,
        |  cast(sum(CASE WHEN g1 THEN 1 ELSE 0 END) as bigint) AS pass_len,
        |  cast(sum(CASE WHEN g2 THEN 1 ELSE 0 END) as bigint) AS pass_stop,
        |  cast(sum(CASE WHEN g3 THEN 1 ELSE 0 END) as bigint) AS pass_wlen,
        |  cast(sum(CASE WHEN g4 THEN 1 ELSE 0 END) as bigint) AS pass_all,
        |  cast(sum(CASE WHEN g4 THEN doc_id ELSE 0 END) as bigint) AS kept_sum_ids
        |FROM g GROUP BY source ORDER BY source""".stripMargin,

    "q192_source_diversity" ->
      """WITH cl AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
        |a AS (SELECT source, cast(sum(c) as bigint) AS n_docs,
        |        cast(count(*) as bigint) AS n_langs,
        |        cast(max(c) as bigint) AS top_docs,
        |        cast(sum(c * c) as bigint) AS ssq
        |      FROM cl GROUP BY source)
        |SELECT source, n_docs, n_langs,
        |  cast((10000 * top_docs) // n_docs as bigint) AS top_share_bp,
        |  cast(10000 - (10000 * ssq) // (n_docs * n_docs) as bigint) AS gini_bp
        |FROM a ORDER BY source""".stripMargin,

    "q193_epoch_upsample" ->
      """WITH b AS (
        |  SELECT source, doc_id,
        |    5000 + 2500 * (cast(substring(source, 4) as int) % 7) AS w_bp,
        |    cast(('0x' || substr(sha256(cast(doc_id as varchar)), 2, 15)) as bigint)
        |      % 10000 AS hb
        |  FROM documents),
        |k AS (
        |  SELECT source, doc_id, w_bp,
        |    cast(w_bp // 10000 + CASE WHEN hb < w_bp % 10000 THEN 1 ELSE 0 END
        |      as bigint) AS k
        |  FROM b),
        |e AS (SELECT source, doc_id FROM k, unnest(generate_series(1, k)) WHERE k > 0),
        |a1 AS (SELECT source, count(*) AS n_docs, cast(max(w_bp) as bigint) AS epochs_bp
        |       FROM b GROUP BY source),
        |a2 AS (SELECT source, count(*) AS n_emitted,
        |         cast(sum(doc_id) as bigint) AS emitted_id_sum
        |       FROM e GROUP BY source)
        |SELECT a1.source, a1.n_docs, a1.epochs_bp,
        |  cast(coalesce(a2.n_emitted, 0) as bigint) AS n_emitted,
        |  cast(coalesce(a2.emitted_id_sum, 0) as bigint) AS emitted_id_sum,
        |  cast((10000 * coalesce(a2.n_emitted, 0)) // a1.n_docs as bigint) AS achieved_bp
        |FROM a1 LEFT JOIN a2 USING (source) ORDER BY a1.source""".stripMargin,

    "q116_stratified_sample" ->
      """WITH b AS (
        |  SELECT lang, doc_id,
        |    cast(('0x' || substr(sha256(cast(doc_id as varchar)), 2, 15)) as bigint) % 64 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT lang, doc_id FROM b
        |  WHERE bucket < CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 24
        |                           WHEN 'fr' THEN 16 ELSE 8 END),
        |tot AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang),
        |sm AS (SELECT lang, count(*) AS n_sampled, sum(doc_id) AS sum_ids FROM s GROUP BY lang)
        |SELECT t.lang, t.n_total,
        |  cast(coalesce(sm.n_sampled, 0) as bigint) AS n_sampled,
        |  (10000 * cast(coalesce(sm.n_sampled, 0) as bigint)) // t.n_total AS rate_bp,
        |  cast(coalesce(sm.sum_ids, 0) as bigint) AS sum_ids
        |FROM tot t LEFT JOIN sm ON sm.lang = t.lang
        |ORDER BY t.lang""".stripMargin,

    "q69_train_split" ->
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |    cast(('0x' || substr(sha256(cast(doc_id as varchar)), 2, 15)) as bigint) % 64 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 51 THEN 'train'
        |            WHEN bucket < 57 THEN 'val' ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_chars,
        |  cast(sum(doc_id) as bigint) AS sum_ids
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q70_decontaminate" -> {
      val sq = s"' $sentinel'" // one literal: leading space + sentinel
      s"""WITH corpus AS (
         |  SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || $sq ELSE text END AS text2
         |  FROM documents),
         |bench AS (
         |  SELECT doc_id AS bid, text || $sq AS text2 FROM documents WHERE doc_id % 97 = 0),
         |${gramsSql("corpus", "doc_id", "c")},
         |${gramsSql("bench", "bid", "b")},
         |bg AS (SELECT DISTINCT gram FROM bgrams),
         |tot AS (SELECT doc_id, count(*) AS n_grams FROM cgrams GROUP BY 1),
         |ov AS (SELECT doc_id, count(*) AS n_overlap
         |       FROM cgrams JOIN bg USING (gram) GROUP BY 1)
         |SELECT o.doc_id, o.n_overlap, t.n_grams,
         |  cast(floor(o.n_overlap * 10000.0 / t.n_grams) as bigint) AS ratio_bp
         |FROM ov o JOIN tot t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "q71_pii_scrub" ->
      s"""WITH pii AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |         THEN text || ' Contact: user' || cast(doc_id as varchar)
         |              || '@example.com or +1-555-' || cast(doc_id % 10000 as varchar) || '.'
         |         ELSE text END AS text2
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text2, '$emailPat')) AS n_emails,
         |    len(regexp_extract_all(text2, '$phonePat')) AS n_phones,
         |    regexp_replace(regexp_replace(text2, '$emailPat', '[EMAIL]', 'g'),
         |                   '$phonePat', '[PHONE]', 'g') AS clean
         |  FROM pii)
         |SELECT doc_id, n_emails, n_phones,
         |  cast(length(clean) as bigint) AS clean_len, sha256(clean) AS clean_sha
         |FROM m WHERE n_emails > 0 OR n_phones > 0
         |ORDER BY doc_id""".stripMargin,

    "q72_source_mix" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE WHEN cast(substr(source, 4) as int) % 2 = 0 THEN 0.5 ELSE 0.2 END AS frac,
        |    count(*) OVER (PARTITION BY source) AS cnt,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sha256('mix' || cast(doc_id as varchar)), doc_id) AS rn
        |  FROM documents),
        |k AS (SELECT *, greatest(1, cast(floor(cnt * frac) as bigint)) AS quota FROM w)
        |SELECT source, count(*) AS n_kept, cast(sum(doc_id) as bigint) AS sum_ids,
        |  cast(max(quota) as bigint) AS quota
        |FROM k WHERE rn <= quota
        |GROUP BY source ORDER BY source""".stripMargin,

    // the naive single-pass global cumsum — the two-level Spark plan must
    // reproduce it exactly
    "q73_pack_sequences" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) > 0
        |         THEN cast(len(regexp_split_to_array(lower(trim(text)), '\s+')) as bigint)
        |         ELSE 0 END AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_toks,
        |    coalesce(sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
        |  FROM tk)
        |SELECT cast(floor(prev_cum / 2048) as bigint) AS bin,
        |  count(*) AS n_docs, cast(sum(n_toks) as bigint) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q76_segment_dedup" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 9 = 0 THEN '$boiler ' || text ELSE text END AS text2
         |  FROM documents),
         |tk AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text2)), '\\s+') AS toks
         |  FROM c WHERE length(trim(text2)) > 0),
         |segs AS (
         |  SELECT doc_id, i AS pos,
         |    array_to_string(toks[i*10+1:i*10+10], ' ') AS seg
         |  FROM tk, unnest(generate_series(0, cast(floor((len(toks)-1)/10) as bigint))) AS u(i)),
         |m AS (
         |  SELECT doc_id, pos, seg,
         |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1 AS keep
         |  FROM segs)
         |SELECT doc_id, count(*) AS n_segs,
         |  cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) as bigint) AS n_kept,
         |  sha256(coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE keep), ''))
         |    AS kept_sha
         |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q77_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |tk2 AS (SELECT * FROM tk WHERE len(toks) >= 3),
        |g2 AS (
        |  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
        |  FROM tk2, unnest(generate_series(1, len(toks)-1)) AS u(i)),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |b AS (SELECT doc_id, max(cnt) AS top2, sum(cnt) AS tot2 FROM c2 GROUP BY 1),
        |g3 AS (
        |  SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS gram
        |  FROM tk2, unnest(generate_series(1, len(toks)-2)) AS u(i)),
        |c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2),
        |tr AS (SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup3,
        |              sum(cnt) AS tot3 FROM c3 GROUP BY 1),
        |j AS (
        |  SELECT b.doc_id,
        |    cast(floor(top2 * 10000.0 / tot2) as bigint) AS top_bigram_bp,
        |    cast(floor(dup3 * 10000.0 / tot3) as bigint) AS dup_trigram_bp
        |  FROM b JOIN tr USING (doc_id))
        |SELECT doc_id, top_bigram_bp, dup_trigram_bp,
        |  (top_bigram_bp > 1000 OR dup_trigram_bp > 1500) AS flagged
        |FROM j ORDER BY doc_id""".stripMargin,

    // same LM fit restricted to >=20-token docs; sliding windows replay as
    // a ROWS frame, the packed argmin decodes to (worst_bp, worst_pos)
    "q180_span_quality" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |tk2 AS (SELECT * FROM tk WHERE len(toks) >= 20),
        |bg AS (
        |  SELECT doc_id, i - 1 AS pos, toks[i] AS w1, toks[i+1] AS w2
        |  FROM tk2, unnest(generate_series(1, len(toks)-1)) AS u(i)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |bp AS (
        |  SELECT c12.w1, c12.w2,
        |    cast(floor(c12.c12 * 10000.0 / c1.c1) as bigint) AS bp
        |  FROM c12 JOIN c1 USING (w1)),
        |sc AS (
        |  SELECT g.doc_id, g.pos, bp.bp,
        |    count(*) OVER (PARTITION BY g.doc_id) AS nb,
        |    sum(bp.bp) OVER (PARTITION BY g.doc_id ORDER BY g.pos
        |      ROWS BETWEEN CURRENT ROW AND 18 FOLLOWING) AS wsum
        |  FROM bg g JOIN bp ON bp.w1 = g.w1 AND bp.w2 = g.w2),
        |wins AS (
        |  SELECT doc_id, (wsum // 19) * 100000 + pos AS pack
        |  FROM sc WHERE pos <= nb - 19)
        |SELECT doc_id, count(*) AS n_windows,
        |  cast(min(pack) // 100000 as bigint) AS worst_bp,
        |  cast(min(pack) % 100000 as bigint) AS worst_pos
        |FROM wins GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q78_lm_score" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |tk2 AS (SELECT * FROM tk WHERE len(toks) >= 2),
        |bg AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |  FROM tk2, unnest(generate_series(1, len(toks)-1)) AS u(i)),
        |bi AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, sum(cnt) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |bp AS (
        |  SELECT c12.w1, c12.w2,
        |    cast(floor(c12.c12 * 10000.0 / c1.c1) as bigint) AS bp
        |  FROM c12 JOIN c1 USING (w1)),
        |d AS (
        |  SELECT bi.doc_id, cast(sum(bi.cnt) as bigint) AS n_bigrams,
        |    cast(sum(bi.cnt * bp.bp) as bigint) AS sbp
        |  FROM bi JOIN bp ON bi.w1 = bp.w1 AND bi.w2 = bp.w2
        |  GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |  cast(floor(cast(sbp as double) / cast(n_bigrams as double)) as bigint)
        |    AS lm_score_bp
        |FROM d ORDER BY doc_id""".stripMargin,

    "q74_vocab" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0)
        |SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |FROM tk WHERE token <> ''
        |GROUP BY token HAVING count(DISTINCT doc_id) >= 20
        |ORDER BY n_occurrences DESC, token LIMIT 100""".stripMargin,

    "q129_heavy_hitters" ->
      s"""WITH tk AS (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
         |  FROM documents WHERE length(trim(text)) > 0),
         |tc AS (
         |  SELECT token, count(*) AS n_exact FROM tk WHERE token <> ''
         |  GROUP BY token),
         |salts AS (SELECT unnest(generate_series(0, 3)) AS salt),
         |sk AS (
         |  SELECT salt, ${graft.operators.Sketches.cmBucketSql("salt", "token", 1024)}
         |      AS bucket,
         |    cast(sum(n_exact) as bigint) AS cnt
         |  FROM tc CROSS JOIN salts GROUP BY 1, 2),
         |top AS (
         |  SELECT token, n_exact FROM tc
         |  ORDER BY n_exact DESC, token LIMIT 20)
         |SELECT t.token, t.n_exact, min(k.cnt) AS n_est
         |FROM top t CROSS JOIN salts s
         |JOIN sk k ON k.salt = s.salt
         |  AND k.bucket = ${graft.operators.Sketches.cmBucketSql("s.salt", "t.token", 1024)}
         |GROUP BY t.token, t.n_exact
         |ORDER BY n_exact DESC, token""".stripMargin,

    "q132_bpe_pairs" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |w AS (
        |  SELECT word, count(*) AS f FROM tk
        |  WHERE regexp_matches(word, '^[a-z0-9'']+$') AND length(word) >= 2
        |  GROUP BY word),
        |p AS (
        |  SELECT substr(word, cast(i as int), 2) AS pair, f
        |  FROM w CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS i) g
        |  WHERE i <= length(word) - 1)
        |SELECT pair, cast(sum(f) as bigint) AS n_occ
        |FROM p GROUP BY pair
        |ORDER BY n_occ DESC, pair LIMIT 30""".stripMargin,

    "q130_calibrated_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE cast(substr(source, 4) as int) % 3
        |      WHEN 0 THEN 5000 WHEN 1 THEN 3000 ELSE 2000 END AS target_bp,
        |    count(*) OVER (PARTITION BY source) AS n_avail,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sha256('cal' || cast(doc_id as varchar)), doc_id) AS rn
        |  FROM documents),
        |b AS (SELECT min(cast(floor(n_avail * 10000 / target_bp) as bigint)) AS budget
        |      FROM (SELECT source, max(n_avail) AS n_avail, max(target_bp) AS target_bp
        |            FROM d GROUP BY source)),
        |k AS (SELECT d.*, b.budget,
        |        cast(floor(b.budget * d.target_bp / 10000) as bigint) AS quota
        |      FROM d CROSS JOIN b)
        |SELECT source, count(*) AS n_kept, cast(sum(doc_id) as bigint) AS sum_ids,
        |  cast(max(n_avail) as bigint) AS n_avail,
        |  cast(max(target_bp) as bigint) AS target_bp,
        |  cast(max(budget) as bigint) AS budget
        |FROM k WHERE rn <= quota
        |GROUP BY source ORDER BY source""".stripMargin,

    "q75_tfidf" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0),
        |tok AS (SELECT doc_id, token FROM tk WHERE token <> ''),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM tok),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    cast(floor(tf.tf * 10000.0 * (nd.nd + 1) / (df.df + 1)) as bigint) AS rel_score_bp
        |  FROM tf JOIN df USING (token) CROSS JOIN nd),
        |r AS (
        |  SELECT doc_id, token, tf, df, rel_score_bp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY rel_score_bp DESC, token) AS rank
        |  FROM scored QUALIFY rank <= 5)
        |SELECT doc_id, cast(rank as bigint) AS rank, token, tf, df, rel_score_bp
        |FROM r ORDER BY doc_id, rank""".stripMargin,

    "q87_link_authority" -> {
      // the 5 power-iteration rounds unrolled as chained CTEs (no recursive
      // aggregation — portable to any engine); DuckDB `//` floor-division
      // equals Spark `div` truncation on positive operands, and sums of
      // BIGINT are exact, so every round matches bit-for-bit
      val rounds = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT ed.dst AS node,
           |    cast(150000000000 + sum((r.rank * 85) // (ed.outdeg * 100)) as bigint) AS rank
           |  FROM ed JOIN r${i - 1} r ON r.node = ed.src GROUP BY ed.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sup
         |  FROM lineitem),
         |edges AS (SELECT p AS src, sup AS dst FROM e0
         |          UNION ALL SELECT sup AS src, p AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
         |r0 AS (SELECT src AS node, cast(1000000000000 as bigint) AS rank FROM deg),
         |$rounds
         |SELECT node, rank FROM r5 ORDER BY rank DESC, node LIMIT 30""".stripMargin
    })
}
