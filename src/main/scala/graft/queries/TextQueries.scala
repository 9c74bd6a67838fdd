package graft.queries

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QHelpers._

/**
 * Document/text pipeline (SURVEY §2.7 chunker, §2.8 scalar fns, plus the
 * BASELINE.json text-analysis and dedup mandates) over `documents`.
 */
object TextQueries {

  /** Synthetic-copy id offsets for planted duplicates/near-copies: far above
    * any real doc_id at EVERY scale factor (an sf100 corpus is ~5e7 docs;
    * 1e9 clears it 20x), so planted ids can never alias onto real documents.
    * Shared by the Spark and oracle spellings. */
  private val Off1 = 1000000000L
  private val Off2 = 2000000000L

  /** documents ∪ exact copies (doc_id+Off1 for doc_id%10=0) — simulates the
    * re-crawl corpus the reference dedups by `index` (crawler.py:39-50). */
  private def dupCorpus(df: DataFrame): DataFrame =
    df.select("doc_id", "text").unionAll(
      df.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + Off1).as("doc_id"), col("text")))

  /** documents ∪ truncated near-copies (for the near-dup detectors). */
  private def nearDupCorpus(df: DataFrame): DataFrame =
    df.select("doc_id", "text").unionAll(
      df.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + Off1).as("doc_id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1))).as("text")))

  private val dupCorpusSql =
    s"""SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS doc_id, text FROM documents WHERE doc_id % 10 = 0""".stripMargin

  private val nearDupCorpusSql =
    s"""SELECT doc_id AS id, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS id,
      |       substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** documents ∪ TWO truncation depths per selected doc (−30 and −60 chars)
    * — each selected doc becomes a 3-clique in the near-dup graph, so the
    * triangle census (q115) has real triangles at every scale factor. */
  private def triCorpus(df: DataFrame): DataFrame =
    df.select("doc_id", "text")
      .unionAll(df.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + Off1).as("doc_id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1))).as("text")))
      .unionAll(df.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + Off2).as("doc_id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 60, lit(1))).as("text")))

  private val triCorpusSql =
    s"""SELECT doc_id AS id, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS id,
      |       substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
      |FROM documents WHERE doc_id % 25 = 0
      |UNION ALL
      |SELECT doc_id + $Off2 AS id,
      |       substring(text, 1, cast(greatest(length(text) - 60, 1) as int)) AS text
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** [[nearDupCorpus]] carrying `source` through, for the end-to-end dedup
    * resolution (q79) whose output aggregates per source. */
  private def resolveCorpus(df: DataFrame): DataFrame =
    df.select(col("doc_id").as("id"), col("source"), col("text")).unionAll(
      df.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + Off1).as("id"), col("source"),
          col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1))).as("text")))

  private val resolveCorpusSql =
    s"""SELECT doc_id AS id, source, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS id, source,
      |       substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** q164 fixture: each planted base carries a TRANSITIVE CHAIN — copy1
    * (id+Off1) keeps the first 55% of the text, copy2 (id+Off2) the first
    * 25% (so copy2 is a truncation of copy1 too). Truncation makes shingle
    * sets nested, so exact Jaccard ≈ the length ratio: base↔copy1 ≈ 0.55
    * and copy1↔copy2 ≈ 0.45 pass the 0.3 verify threshold, while
    * base↔copy2 ≈ 0.25 FAILS it — the 3-member cluster exists only through
    * the transitive closure, and a pairwise-only split would strand copy2
    * away from its cluster's representative. */
  private def splitCorpus(df: DataFrame): DataFrame = {
    def copy(off: Long, keep: Double) = df.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + off).as("id"), col("source"),
        col("text").substr(lit(1),
          greatest(floor(length(col("text")) * keep), lit(1)).cast("int")).as("text"))
    df.select(col("doc_id").as("id"), col("source"), col("text"))
      .unionAll(copy(Off1, 0.55)).unionAll(copy(Off2, 0.25))
  }

  private val splitCorpusSql =
    s"""SELECT doc_id AS id, source, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS id, source,
      |       substring(text, 1, cast(greatest(floor(length(text) * 0.55), 1) as int)) AS text
      |FROM documents WHERE doc_id % 25 = 0
      |UNION ALL
      |SELECT doc_id + $Off2 AS id, source,
      |       substring(text, 1, cast(greatest(floor(length(text) * 0.25), 1) as int)) AS text
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** q152 fixture: the planted near-dup is an EXTENDED revision of its base
    * (an appended tail), so the copy is the higher-quality member — a
    * min-id arbitration (q79) would keep the original; the quality
    * arbitration must keep the revision. Jaccard base↔revision stays well
    * above 0.3 (the tail adds ~13 shingles to 20+). */
  private val qualTail =
    "comprehensive revised edition with expanded methodology appendix and corrected tables"

  private def qualityCorpus(df: DataFrame): DataFrame =
    df.select(col("doc_id").as("id"), col("source"), col("text")).unionAll(
      df.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + Off1).as("id"), col("source"),
          concat(col("text"), lit(" " + qualTail)).as("text")))

  private val qualityCorpusSql =
    s"""SELECT doc_id AS id, source, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS id, source, text || ' $qualTail' AS text
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** DuckDB replay of Dedup.nearDupPairs (shingleSize=3, numHashes=16,
    * bands=4) over a `(id, text)` relation named `corpus`: emits CTEs
    * `toks`…`verified`, where `verified` = (id_a, id_b, inter, sz_a, sz_b,
    * jaccard) holding the Jaccard-verified LSH candidate pairs at
    * `threshold`. Shared by q18 (pairs graded directly) and q79 (pairs →
    * connected components → canonical-doc resolution). */
  private[queries] def minhashVerifiedSql(threshold: Double, rel: String = "corpus",
                                          p: String = ""): String =
    s"""${p}toks AS (SELECT id, regexp_split_to_array(trim(text), '\\s+') AS tk
       |         FROM $rel WHERE length(trim(text)) > 0),
       |${p}sh AS (SELECT DISTINCT id,
       |  cast(('0x' || substr(sha256(sh), 1, 15)) as bigint) AS sh FROM (
       |  SELECT id, unnest(list_transform(generate_series(1, cast(greatest(len(tk)-2, 0) as bigint)),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
       |  FROM ${p}toks) u),
       |${p}based AS (
       |  SELECT id, sh % 1000000007 AS h0
       |  FROM ${p}sh),
       |${p}sig AS (
       |  SELECT id, seed,
       |    min((((seed * 1103515245 + 12345) % 1000000007 + 1) * h0
       |         + (seed * 69069 + 1) % 1000000007) % 1000000007) AS mh
       |  FROM ${p}based, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
       |  GROUP BY id, seed),
       |${p}bands AS (
       |  SELECT id, cast(floor(seed/4.0) as int) AS band,
       |    sha256(string_agg(cast(mh as varchar), ',' ORDER BY seed)) AS band_sig
       |  FROM ${p}sig GROUP BY id, cast(floor(seed/4.0) as int)),
       |${p}cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM ${p}bands a JOIN ${p}bands b ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id),
       |${p}inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS inter
       |  FROM ${p}cand c JOIN ${p}sh sa ON sa.id = c.id_a JOIN ${p}sh sb ON sb.id = c.id_b AND sb.sh = sa.sh
       |  GROUP BY c.id_a, c.id_b),
       |${p}sizes AS (SELECT id, count(*) AS sz FROM ${p}sh GROUP BY id),
       |${p}verified AS (
       |  SELECT c.id_a, c.id_b, coalesce(i.inter, 0) AS inter, za.sz AS sz_a, zb.sz AS sz_b,
       |    round(cast(coalesce(i.inter, 0) as double)
       |        / cast(za.sz + zb.sz - coalesce(i.inter, 0) as double), 4) AS jaccard
       |  FROM ${p}cand c
       |  LEFT JOIN ${p}inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
       |  JOIN ${p}sizes za ON za.id = c.id_a
       |  JOIN ${p}sizes zb ON zb.id = c.id_b
       |  WHERE round(cast(coalesce(i.inter, 0) as double)
       |        / cast(za.sz + zb.sz - coalesce(i.inter, 0) as double), 4) >= $threshold)""".stripMargin

  /** documents ∪ prefix-sharing near-copies for the blocked fuzzy match:
    * every doc_id%5==0 doc long enough to carry a 24-char prefix reappears
    * as doc_id+Off1 with character 17 swapped for '~' — same source, same
    * 8-char block key, prefix edit distance exactly 1. Plants tens of
    * true matches across many blocks at every scale factor, so the
    * levenshtein-verify path is exercised by more than the corpus's one
    * natural near-pair. */
  private def fuzzyCorpus(df: DataFrame): DataFrame = {
    val base = df.select(col("doc_id"), col("source"), col("text"))
    base.unionAll(
      base.filter(col("doc_id") % 5 === 0 && length(col("text")) >= 24)
        .select((col("doc_id") + Off1).as("doc_id"), col("source"),
          concat(col("text").substr(lit(1), lit(16)), lit("~"),
            col("text").substr(lit(18), length(col("text")))).as("text")))
  }

  private val fuzzyCorpusSql =
    s"""SELECT doc_id, source, text FROM documents
      |UNION ALL
      |SELECT doc_id + $Off1 AS doc_id, source,
      |       substring(text, 1, 16) || '~' || substring(text, 18) AS text
      |FROM documents WHERE doc_id % 5 = 0 AND length(text) >= 24""".stripMargin

  /** Blocked fuzzy match over text prefixes (exposed for the candidate-bound
    * spec): candidates = same source AND same first-8-char block key; verify
    * = levenshtein over the 24-char prefixes ≤ 8. */
  private[graft] def fuzzyMatchBlocked(docs: DataFrame): DataFrame = {
    // materialize the thin (id, source, pfx, blk) projection once: a lazy
    // self-join re-executes the corpus scan for BOTH sides (measured 4
    // documents scans in q49 with the fixture union) — and the projection
    // is the only part of the corpus the join needs
    val d = docs.select(col("doc_id"), col("source"),
        substring(col("text"), 1, 24).as("pfx"))
      .withColumn("blk", substring(col("pfx"), 1, 8))
      .localCheckpoint()
    val a = d.select(col("doc_id").as("id_a"), col("source"),
      col("pfx").as("pfx_a"), col("blk"))
    val b = d.select(col("doc_id").as("id_b"), col("source"),
      col("pfx").as("pfx_b"), col("blk"))
    a.join(b, Seq("source", "blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("pfx_a"), col("pfx_b")))
      .filter(col("dist") <= 8)
      .select("id_a", "id_b", "dist")
  }

  /** Candidate pairs the block key admits (pre-verify) — what the spec bounds. */
  private[graft] def fuzzyCandidates(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      substring(col("text"), 1, 8).as("blk"))
    val a = d.select(col("doc_id").as("id_a"), col("source"), col("blk"))
    val b = d.select(col("doc_id").as("id_b"), col("source"), col("blk"))
    a.join(b, Seq("source", "blk")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  val queries: Map[String, Q] = Map(
    // A3-style corpus histogram
    "q11_lang_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(sum(col("n_chars")).cast(DoubleType) / count(lit(1)), 2).as("avg_chars"))
        .orderBy(col("lang"))
    }),

    // F3 sha256 identity + F9 preview + F10 path-style concat
    "q12_doc_identity" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          sha2(concat(col("source"), lit("/"), col("doc_id")), 256).as("index"),
          substring(col("text"), 1, 64).as("preview"),
          length(col("text")).as("n"))
        .orderBy(col("doc_id"))
    }),

    // F1 clean_text + token/punct counting
    "q13_clean_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.cleanText(col("text")).as("cleaned"),
          TextFns.tokenCount(col("text")).as("n_tokens"),
          TextFns.punctCount(col("text")).as("n_punct"))
        .orderBy(col("doc_id"))
    }),

    // quality scoring + language-ID heuristic (BASELINE.json text analysis)
    "q14_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.qualityScore(col("text")).as("quality"),
          TextFns.langId(col("text")).as("lang_guess"))
        .orderBy(col("doc_id"))
    }),

    // §2.7 chunker + F5 chunk ids (vdb.py:66-74)
    "q15_chunks" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(TextFns.chunk(col("text"), 128, 64)).as(Seq("pos", "chunk")))
        .select(col("doc_id"), col("pos"),
          TextFns.chunkId(col("doc_id"), col("pos")).as("chunk_id"), col("chunk"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // A2 + J5: chunk hits → parent key → best-score reduce (vdb.py:104-110)
    "q16_chunk_best" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(TextFns.chunk(col("text"), 128, 64)).as(Seq("pos", "chunk")))
        .select(TextFns.chunkId(col("doc_id"), col("pos")).as("chunk_id"), col("chunk"))
        .withColumn("score", TextFns.tokenHash(col("chunk")))
        .groupBy(TextFns.parentId(col("chunk_id")).as("parent"))
        .agg(max(col("score")).as("best_score"), count(lit(1)).as("n_chunks"))
        .orderBy(col("parent"))
    }),

    // exact content dedup (hash-groupBy)
    "q17_exact_dedup" -> ((s, dir) => {
      Dedup.exactGroups(dupCorpus(t(s, dir, "documents")), "text", "doc_id")
        .filter(col("n_dups") > 1)
        .orderBy(col("content_hash"))
    }),

    // Incremental near-dup: a NEW batch (truncated near-copies on shifted
    // ids) deduped against the existing corpus — candidates restricted to
    // batch-touching pairs, so the store is never re-paired against itself.
    // The oracle runs the FULL pipeline over store ∪ batch and filters to
    // batch-touching pairs: the incremental result must equal it exactly,
    // which is the incremental-dedup contract.
    "q105_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = docs.select(col("doc_id").as("id"), col("text"))
      val batch = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + Off2).as("id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1)))
            .as("text"))
      Dedup.incrementalNearDupPairs(store, batch, "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MinHash + LSH near-dup pairs, verified with exact n-gram Jaccard
    "q18_neardup_lsh" -> ((s, dir) => {
      Dedup.nearDupPairs(
          nearDupCorpus(t(s, dir, "documents")).withColumnRenamed("doc_id", "id"),
          "text", "id", shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // cluster-cohesion analytics over the near-dup graph: triangle census +
    // local clustering coefficient (degree-oriented node-iterator — the
    // skew-proof formulation; operators/GraphStats.scala). The corpus plants
    // two truncation depths per selected doc, so clusters are 3-cliques and
    // the census is non-trivial at every scale factor.
    "q115_triangle_census" -> ((s, dir) => {
      val pairs = Dedup.nearDupPairs(
        triCorpus(t(s, dir, "documents")).withColumnRenamed("doc_id", "id"),
        "text", "id", shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
      graft.operators.GraphStats.triangleCensus(pairs, "id_a", "id_b")
        .orderBy(col("node"))
    }),

    // EXACT-recall set-similarity self-join via prefix filtering (PPJoin
    // family) over 3-shingle sets: every pair with Jaccard ≥ 1/2 is found —
    // the guarantee minhash banding (q18) cannot give. All threshold math
    // is integer-rational; no float anywhere in the result.
    "q118_setsim_join" -> ((s, dir) => {
      Dedup.setSimJoin(
          nearDupCorpus(t(s, dir, "documents")).withColumnRenamed("doc_id", "id"),
          "text", "id", tNum = 1, tDen = 2, shingleSize = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Dedup-recall EVALUATION — the q136 recall@k discipline applied to
    // the dedup family: minhash banding (16 hashes / 4 bands, q18) is
    // approximate candidate generation, PPJoin (q118) is the exact ground
    // truth at the same Jaccard bar — so banding recall is measurable, in
    // integer bp, from two pipelines the suite already trusts. The number
    // a pipeline owner needs before trading PPJoin's exact-but-heavier
    // prefix join for banding at 100 TB. (n_common is counted explicitly:
    // near the bar the two pipelines' rounding differs — banding verifies
    // round(J,4) ≥ 0.5, PPJoin tests 2·inter ≥ union exactly — so LSH is
    // not formally a subset of exact.)
    "q264_dedup_recall" -> ((s, dir) => {
      val corpus = nearDupCorpus(t(s, dir, "documents"))
        .withColumnRenamed("doc_id", "id")
      val exact = Dedup.setSimJoin(corpus, "text", "id", tNum = 1, tDen = 2,
        shingleSize = 3).select("id_a", "id_b").localCheckpoint(true)
      val lsh = Dedup.nearDupPairs(corpus, "text", "id",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5)
        .select("id_a", "id_b").localCheckpoint(true)
      val nE = exact.count()
      val nL = lsh.count()
      val nC = exact.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
      require(nE > 0, "fixture: the planted copies must yield exact pairs")
      import s.implicits._
      Seq((nE, nL, nC, 10000L * nC / nE))
        .toDF("n_exact", "n_lsh", "n_common", "recall_bp")
    }),

    // rolling-hash document fingerprint
    "q19_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // SimHash via custom typed aggregate. The per-bit majority vote IS
    // portable SQL (explode token hashes × bit positions, sum ±1, assemble
    // bits) — so the UDAF is hash-checked against a DuckDB replay, not
    // rows-only. Token hashes are 60-bit sha256 prefixes, so bits 60-63 are
    // never set and the oracle only needs positions 0..59.
    "q20_simhash" -> ((s, dir) => {
      Dedup.simhash(t(s, dir, "documents"), "text", "doc_id").orderBy(col("doc_id"))
    }),

    // dedup cluster formation: near-dup pairs → connected components →
    // cluster sizes (min-id label is the canonical doc per cluster);
    // label propagation runs to convergence, whatever the chain diameter
    "q48_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.filter(col("doc_id") % 10 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      Dedup.connectedComponents(edges, "src", "dst")
        .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("label"))
    }),

    // dedup clusters via large-star/small-star — the O(log n)-round scale
    // path — over LONG chains (12 consecutive doc_ids per cluster), the
    // topology where fixed-round propagation silently splits components
    "q61_dedup_clusters_star" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.filter(col("doc_id") % 25 < 11)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      Dedup.connectedComponentsStar(edges, "src", "dst")
        .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("label"))
    }),

    // The full dedup pipeline END-TO-END as one graded query — the thing
    // MinHash exists for: LSH pairs (q18's machinery) → connected components
    // (q48's) → canonical doc per cluster (min id) → the KEPT corpus,
    // aggregated per source with an id-sum membership checksum. Each stage
    // is already individually graded; this row grades their composition,
    // which is what a user actually runs. The DuckDB oracle replays the
    // whole chain: minhash banding, Jaccard verify, recursive-CTE reachability.
    "q79_dedup_resolve" -> ((s, dir) => {
      val corpus = resolveCorpus(t(s, dir, "documents"))
      val pairs = Dedup.nearDupPairs(corpus, "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .select(col("id_a"), col("id_b"))
      // pair graph ≪ corpus (only near-dup docs appear) ⇒ labels broadcast;
      // the corpus is never shuffled for the resolution join
      val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      corpus.join(broadcast(labels.withColumnRenamed("node", "id")), Seq("id"), "left")
        .withColumn("canonical", coalesce(col("label"), col("id")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("id") === col("canonical"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("id") === col("canonical"), 0L).otherwise(1L)).as("n_dropped"),
          sum(when(col("id") === col("canonical"), col("id")).otherwise(0L)).as("kept_sum_ids"))
        .orderBy(col("source"))
    }),

    // Content-defined chunking (TextFns.cdcBoundary — the Rabin-split rule
    // of dedup storage): boundaries fall where a 16-char rolling window's
    // hash lands in the zero residue mod 64, so an edit early in a
    // document shifts NO later boundary — the property that makes
    // chunk-level dedup stable under revisions, unlike §2.7's fixed-size
    // chunker. Pure projection + explode + one rollup; graded per source
    // with boundary counts, position checksums and implied chunk counts.
    "q172_cdc_chunking" -> ((s, dir) => {
      import graft.functions.TextFns
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val bounds = docs
        // Spark sequence(1, 0) yields the DESCENDING [1, 0], not empty —
        // guard short docs explicitly so <=15-char texts contribute no
        // candidate positions (matches DuckDB's empty generate_series(1,0)
        // and cdcBoundary's pos + window - 1 <= length contract).
        .select(col("doc_id"), col("source"), col("text"),
          explode(when(length(col("text")) >= 16,
            sequence(lit(1), length(col("text")) - 15)).otherwise(
            array().cast("array<int>"))).as("i"))
        .filter(TextFns.cdcBoundary(col("text"), col("i"), window = 16, mask = 64))
      val aggB = bounds.groupBy(col("source"))
        .agg(count(lit(1)).as("n_boundaries"),
          countDistinct(col("doc_id")).as("n_cut_docs"),
          sum(col("i")).as("sum_cut_pos"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(aggB, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_cut_docs"), lit(0L)).as("n_cut_docs"),
          coalesce(col("n_boundaries"), lit(0L)).as("n_boundaries"),
          coalesce(col("sum_cut_pos"), lit(0L)).as("sum_cut_pos"),
          (col("n_docs") + coalesce(col("n_boundaries"), lit(0L))).as("n_chunks"))
        .orderBy(col("source"))
    }),

    // Cross-source duplication matrix — WHICH sources mirror which: the
    // provenance question a curation team asks before weighting sources
    // (a mirror site's corpus share is double-counted evidence). Planted
    // truncated copies land under a synthetic 'mirror' source, so
    // cross-source pairs exist by construction; the matrix buckets every
    // verified near-dup pair by its canonicalized source pair. The pair
    // table is tiny next to the corpus — it broadcasts into both
    // source-lookup joins; the corpus is never shuffled.
    "q170_source_overlap" -> ((s, dir) => {
      import graft.operators.Dedup
      val base = t(s, dir, "documents")
      val corpus = base.select(col("doc_id").as("id"), col("source"), col("text"))
        .unionAll(base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 6000000000L).as("id"), lit("mirror").as("source"),
            col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1)))
              .as("text")))
      val pairs = Dedup.nearDupPairs(corpus, "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .select(col("id_a"), col("id_b"))
      val labels = corpus.select(col("id"), col("source"))
      val withA = labels.join(broadcast(pairs), col("id") === col("id_a"))
        .select(col("id_b"), col("source").as("sa"))
      val matrix = labels.join(broadcast(withA), col("id") === col("id_b"))
        .select(least(col("sa"), col("source")).as("source_a"),
          greatest(col("sa"), col("source")).as("source_b"))
      matrix.groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Leakage-safe train/test split — q69's hash split has a blind spot at
    // corpus scale: near-duplicate documents hash independently, so a
    // train copy of a test document leaks evaluation data. The fix keys
    // the split on the near-dup CLUSTER representative (q79's LSH + CC
    // labels), so a whole cluster moves as one unit and no cluster can
    // straddle splits BY CONSTRUCTION. n_rescued counts the members whose
    // naive doc-hash split disagrees with their cluster split — the
    // planted dups guarantee it is non-zero, proving the operator changed
    // real assignments. The fixture plants 3-member TRANSITIVE chains
    // (base → keep 55% → keep 25%, splitCorpus): the far pair's Jaccard
    // ≈ 0.25 FAILS the 0.3 verify threshold while adjacent links pass, so
    // only the connected-components closure — not pairwise matching —
    // assigns all three one representative.
    // Labels broadcast; the corpus never shuffles.
    "q164_leakage_safe_split" -> ((s, dir) => {
      import graft.operators.Dedup
      val corpus = splitCorpus(t(s, dir, "documents"))
      val pairs = Dedup.nearDupPairs(corpus, "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .select(col("id_a"), col("id_b"))
      val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      def splitOf(c: org.apache.spark.sql.Column) =
        when(PipelineQueries.bucket64(c) < 51, "train")
          .when(PipelineQueries.bucket64(c) < 57, "val").otherwise("test")
      corpus.join(broadcast(labels.withColumnRenamed("node", "id")), Seq("id"), "left")
        .withColumn("canonical", coalesce(col("label"), col("id")))
        .groupBy(splitOf(col("canonical")).as("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canonical")).as("n_clusters"),
          sum(when(splitOf(col("id")) =!= splitOf(col("canonical")), 1L)
            .otherwise(0L)).as("n_rescued"),
          sum(col("id")).as("sum_ids"))
        .orderBy(col("split"))
    }),

    // Sorted-neighborhood dedup (SNM — the THIRD classic candidate-
    // generation family beside hash blocking (q49) and LSH banding (q18)):
    // records are sorted under a discriminating key and only each record's
    // w nearest neighbors in sort order are compared — candidate count is
    // O(n·w) BY CONSTRUCTION, independent of block-size skew (the failure
    // mode that makes hash blocking quadratic on a hot block). Key =
    // (12-char prefix block, then length, id) — planted truncated copies
    // share the prefix and sort adjacent; window w = 3; candidates are
    // verified with exact token-set Jaccard in integer bp (inter/union
    // spelled explicitly on both sides — array_union's dedup semantics are
    // not worth cross-engine trust). The pairing JOIN itself is O(n·w):
    // each record explodes its w neighbor offsets (`sequence(rnk+1,
    // rnk+w)`) and the self-join is an EQUI-join on (blk, rnk) — a hot
    // prefix block never goes quadratic, because no plan stage ever
    // materializes block × block (offsets past the block's end simply
    // find no partner). At 100 TB: one range-partitioned sort + a
    // linear-width equi-join, never all-pairs.
    "q200_snm_dedup" -> ((s, dir) => {
      val corpus = resolveCorpus(t(s, dir, "documents"))
        .withColumn("toks", array_distinct(split(lower(trim(col("text"))), "\\s+")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("blk")).orderBy(col("len"), col("id"))
      val ranked = corpus
        .withColumn("blk", substring(col("text"), 1, 12))
        .withColumn("len", length(col("text")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select(col("blk"), col("rnk"), col("id"), col("toks"))
      val a = ranked.select(col("blk"), col("rnk").as("rnk_a"),
        col("id").as("id_a"), col("toks").as("ta"))
        .withColumn("rnk_b", explode(sequence(col("rnk_a") + 1, col("rnk_a") + 3)))
      val b = ranked.select(col("blk"), col("rnk").as("rnk_b"),
        col("id").as("id_b"), col("toks").as("tb"))
      a.join(b, Seq("blk", "rnk_b"))
        .withColumn("inter",
          size(filter(col("ta"), t => array_contains(col("tb"), t))).cast("long"))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .withColumn("j_bp", expr("(10000 * inter) DIV greatest(uni, 1)"))
        .filter(col("j_bp") >= 3000)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a")).as("sum_a"), sum(col("id_b")).as("sum_b"),
          sum(col("j_bp")).as("sum_j_bp"),
          // the copy is SHORTER → sorts first → is usually the a side;
          // check the offset both ways
          sum(when(col("id_a") - col("id_b") === Off1
              || col("id_b") - col("id_a") === Off1, 1L).otherwise(0L))
            .as("n_planted"))
    }),

    // GLOBAL sorted-neighborhood dedup — the classic SNM spelling q200's
    // blocked variant approximates: ONE total order over the whole corpus
    // under (12-char prefix, length, id) and a w=3 sliding window that
    // CROSSES block and partition boundaries (a pair whose members open
    // adjacent-but-different prefixes is visible here and invisible to
    // q200). Spelled scale-first in Dedup.snmGlobalPairs: distributed
    // range-partitioned sort, one metadata-sized head-pool pass, and a
    // mapPartitions slide whose fringe rows are pulled from the broadcast
    // pool — no single-partition window anywhere (the naive global
    // row_number() would serialize the corpus through one task). Verified
    // with the same exact token-set Jaccard as q200; same planted-copy
    // accounting proves the window actually catches them.
    "q201_snm_global" -> ((s, dir) => {
      val corpus = resolveCorpus(t(s, dir, "documents"))
        .withColumn("toks", array_distinct(split(lower(trim(col("text"))), "\\s+")))
        .withColumn("blk", substring(col("text"), 1, 12))
        .withColumn("len", length(col("text")).cast("long"))
      val toks = corpus.select(col("id"), col("toks"))
      val pairs = graft.operators.Dedup.snmGlobalPairs(
        corpus.select(col("id"), col("blk"), col("len")), Seq("blk", "len"), "id", 3)
      pairs
        .join(toks.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
        .join(toks.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
        .withColumn("inter",
          size(filter(col("ta"), tk => array_contains(col("tb"), tk))).cast("long"))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .withColumn("j_bp", expr("(10000 * inter) DIV greatest(uni, 1)"))
        .filter(col("j_bp") >= 3000)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a")).as("sum_a"), sum(col("id_b")).as("sum_b"),
          sum(col("j_bp")).as("sum_j_bp"),
          sum(when(col("id_a") - col("id_b") === Off1
              || col("id_b") - col("id_a") === Off1, 1L).otherwise(0L))
            .as("n_planted"))
    }),

    // MULTI-PASS sorted-neighborhood dedup — the classic SNM discipline
    // (Hernández & Stolfo's merge/purge): ONE sort key misses duplicates
    // whose difference lands in the key, so run several passes under
    // INDEPENDENT keys and union the candidates. Pass A keys on the text
    // PREFIX (catches truncated-tail copies, Off1); pass B keys on the
    // text SUFFIX (catches prefix-edited copies, Off2 — invisible to pass
    // A because the edit moved them to a different prefix block). The
    // planted Off2 family also makes "EDITED VERSI…" a deliberately hot
    // prefix block in pass A — linear by the exploded-rank join. Both
    // passes are the O(n·w) blocked pairing; pairs union + distinct; one
    // exact-Jaccard verify; graded with per-family planted counts proving
    // each pass contributed pairs the other could not see.
    "q206_snm_multipass" -> ((s, dir) => {
      val base = t(s, dir, "documents")
      val corpus = base.select(col("doc_id").as("id"), col("text"))
        .unionAll(base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + Off1).as("id"),
            col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1)))
              .as("text")))
        .unionAll(base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + Off2).as("id"),
            concat(lit("EDITED VERSION "), col("text")).as("text")))
        .withColumn("toks", array_distinct(split(lower(trim(col("text"))), "\\s+")))
        .withColumn("blk_a", substring(col("text"), 1, 12))
        .withColumn("blk_b",
          expr("substring(text, greatest(length(text) - 11, 1), 12)"))
        .withColumn("len", length(col("text")).cast("long"))
      val passA = Dedup.snmCandidates(
        corpus.select(col("id"), col("blk_a"), col("len")), "blk_a", Seq("len"), "id", 3)
      val passB = Dedup.snmCandidates(
        corpus.select(col("id"), col("blk_b"), col("len")), "blk_b", Seq("len"), "id", 3)
      val cand = passA.select("id_a", "id_b")
        .unionAll(passB.select("id_a", "id_b")).distinct()
      val toks = corpus.select(col("id"), col("toks"))
      cand
        .join(toks.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
        .join(toks.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
        .withColumn("inter",
          size(filter(col("ta"), tk => array_contains(col("tb"), tk))).cast("long"))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .withColumn("j_bp", expr("(10000 * inter) DIV greatest(uni, 1)"))
        .filter(col("j_bp") >= 3000)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a")).as("sum_a"), sum(col("id_b")).as("sum_b"),
          sum(col("j_bp")).as("sum_j_bp"),
          sum(when(abs(col("id_a") - col("id_b")) === Off1, 1L).otherwise(0L))
            .as("n_planted_trunc"),
          sum(when(abs(col("id_a") - col("id_b")) === Off2, 1L).otherwise(0L))
            .as("n_planted_prefix"))
    }),

    // Quality-ARBITRATED dedup resolution — q79 keeps the min-id member
    // per near-dup cluster; a curation pipeline keeps the BEST member
    // (dedup-then-arbitrate, the RefinedWeb/FineWeb move). Same LSH pairs
    // + connected components, but the canonical doc is the cluster member
    // with the highest quality score (length here; any scorer drops in),
    // id ascending as the total tie-break. The fixture makes the two
    // rules DISAGREE: each planted dup is an extended revision, so q79's
    // min-id keeps the original while this query must keep the revision —
    // kept_sum_ids (which then contains +Off1 terms) hash-proves the
    // arbitration really keyed on quality. One window over clusters;
    // labels broadcast; the corpus never shuffles for resolution.
    "q152_dedup_quality_resolve" -> ((s, dir) => {
      val corpus = qualityCorpus(t(s, dir, "documents"))
      val pairs = Dedup.nearDupPairs(corpus, "text", "id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.3)
        .select(col("id_a"), col("id_b"))
      val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val labeled = corpus.withColumn("quality", length(col("text")).cast("long"))
        .join(broadcast(labels.withColumnRenamed("node", "id")), Seq("id"), "left")
        .withColumn("cluster", coalesce(col("label"), col("id")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(col("quality").desc, col("id").asc)
      labeled.withColumn("r", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("r") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("r") === 1, col("id")).otherwise(0L)).as("kept_sum_ids"),
          sum(when(col("r") === 1, col("quality")).otherwise(0L)).as("kept_sum_quality"))
        .orderBy(col("source"))
    }),

    // fuzzy match with blocking: edit distance only inside (source,
    // exact-8-char-prefix) blocks — the entity-resolution shape. The block
    // key is CONTENT-derived, so block size is bounded by how many documents
    // genuinely share an opening, not by the number of sources: the
    // levenshtein self-join never degenerates to per-source all-pairs.
    "q49_fuzzy_match" -> ((s, dir) =>
      fuzzyMatchBlocked(fuzzyCorpus(t(s, dir, "documents")))
        .orderBy(col("id_a"), col("id_b"))),

    // F6 HTML→markdown extraction (uci.py:56's trafilatura slot): synthesize
    // an HTML page per document, extract structured markdown back via the
    // mirrored regexp chain — headings, emphasis, list, link, entity,
    // script-drop all exercised
    "q59_html_markdown" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><body><h1>Doc "), col("doc_id"), lit("</h1>"),
          lit("<p>Lang: <b>"), col("lang"), lit("</b> &amp; source <i>"),
          col("source"), lit("</i></p>"),
          lit("<ul><li><a href=\"https://"), col("source"), lit(".example.com/"),
          col("doc_id"), lit("\">visit</a></li><li>chars: "), col("n_chars"),
          lit("</li></ul><p>"), substring(col("text"), 1, 60),
          lit("</p><script>var x = 1;</script></body></html>")))
        .select(col("doc_id"), TextFns.htmlToMarkdown(col("html")).as("md"))
        .orderBy(col("doc_id"))
    }),

    // F7 array_join + F8 date_format + TK3 URL-basename sort (uci.py:46's
    // `substring_index(url,'/',-1)` ordering) in one documents query:
    // synthesize the crawl URL, sort by its basename, render a token slice
    // and a derived crawl date
    "q58_doc_urls" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/"), col("doc_id"), lit(".txt")))
        .select(col("doc_id"), col("url"),
          substring_index(col("url"), "/", -1).as("basename"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 3), " ").as("first_words"),
          date_format(date_add(to_date(lit("2024-01-01")),
            (col("doc_id") % 365).cast("int")), "yyyy-MM-dd E").as("day"))
        .orderBy(col("basename"), col("doc_id"))
    }),

    // token-count mandate: whitespace + BPE-ish regex counters, with exact
    // length quantiles per language (at 100 TB: approx_percentile — the
    // exact spelling here is the oracle-checkable form)
    "q42_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(TextFns.tokenCount(col("text"))).as("n_ws_tokens"),
          sum(TextFns.bpeTokenCount(col("text"))).as("n_bpe_tokens"),
          round(percentile(col("n_chars"), lit(0.5)), 2).as("median_chars"),
          round(percentile(col("n_chars"), lit(0.9)), 2).as("p90_chars"))
        .orderBy(col("lang"))
    }),

    // Inverted text index + conjunctive term search: the corpus is exploded
    // once into a token→doc postings table hive-partitioned by token hash
    // bucket; the query then reads ONLY its terms' bucket directories
    // (PartitionFilters — PlanSpec gates it) and intersects posting lists
    // with one count-distinct aggregate. The oracle replays the semantics
    // (docs containing ALL terms) directly off the raw corpus, so a dropped
    // posting or a wrong bucket loses rows and fails the hash. At 100 TB
    // the build is amortized across queries and the probe cost is
    // O(selected buckets), never a corpus scan.
    "q93_inverted_index" -> ((s, dir) => {
      import graft.operators.InvertedIndex
      val docs = t(s, dir, "documents")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_invidx_" +
        Integer.toHexString(dir.hashCode)
      InvertedIndex.build(docs, "doc_id", "text", path)
      val hits = InvertedIndex.queryAll(s, path, "doc_id",
        Seq("spark", "window", "stream"))
      hits.join(docs, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // sketch vs exact: approx_percentile must land within 5% of the exact
    // interpolated quantile (the 100 TB percentile spelling)
    "q50_approx_quantile" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          round(percentile(col("n_chars"), lit(0.5)), 2).as("median_exact"),
          (abs(percentile_approx(col("n_chars"), lit(0.5), lit(10000))
               - percentile(col("n_chars"), lit(0.5)))
            <= percentile(col("n_chars"), lit(0.5)) * 0.05).as("sketch_ok"))
        .orderBy(col("lang"))
    }),

    // sketch vs exact: approx_count_distinct must land within its 5% rsd —
    // the 100 TB spelling of COUNT(DISTINCT), graded against the exact value
    "q43_approx_distinct" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          countDistinct(col("doc_id")).as("n_exact"),
          // rsd 0.01 ⇒ the 5% gate sits five standard deviations out —
          // stable at every scale factor (default rsd 0.05 failed at sf0.1)
          (abs(approx_count_distinct(col("doc_id"), 0.01) - countDistinct(col("doc_id")))
            <= countDistinct(col("doc_id")).cast(DoubleType) * 0.05).as("sketch_ok"))
        .orderBy(col("source"))
    }),

    // Positional phrase search (InvertedIndex.phraseHits): per-doc counts of
    // the exact token sequence "table hash" — the positional-index
    // counterpart of q93's membership-only conjunctive query. Postings are
    // pruned to the phrase terms before the adjacency equi joins.
    "q123_phrase_search" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextFns.tokens(lower(col("text")))).as(Seq("pos", "tok")))
      graft.operators.InvertedIndex.phraseHits(toks, "doc_id", Seq("table", "hash"))
        .orderBy(col("doc_id"))
    }),

    // Token-frequency drift between corpus epochs — the vocabulary-shift
    // monitor (new slang, spam campaigns, template rot) a continuously
    // crawled corpus needs alongside q154's embedding drift: per-token
    // Haldane-corrected odds ratio between the even-id and odd-id halves
    // in integer basis points (one integral divide — no float, so the
    // top-30 most-drifted tokens hash identically across engines). Token
    // totals ride one broadcast row; one shuffle on tok.
    "q175_token_drift" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
      val counts = toks.groupBy(col("tok")).agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("cb"))
      val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      counts.crossJoin(broadcast(totals))
        .filter(col("ca") + col("cb") >= 5)
        .withColumn("lift_bp",
          expr("(10000 * (ca + 1) * (nb + 2)) DIV ((cb + 1) * (na + 2))"))
        .withColumn("drift_bp", abs(col("lift_bp") - 10000L))
        .select(col("tok"), col("ca"), col("cb"), col("lift_bp"), col("drift_bp"))
        .orderBy(col("drift_bp").desc, col("tok").asc)
        .limit(30)
    }),

    // Proximity search (InvertedIndex.proximityHits — NEAR/5): per-doc
    // pairs of 'data' and 'model' occurrences within 5 tokens, the
    // relevance signal between q93's bag-of-words AND and q123's exact
    // phrase. Postings df-pruned before the keyed join; the distance
    // bound is a residual filter on co-occurring pairs only.
    "q173_proximity_search" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextFns.tokens(lower(col("text")))).as(Seq("pos", "tok")))
      graft.operators.InvertedIndex
        .proximityHits(toks, "doc_id", "data", "model", maxDist = 5)
        .orderBy(col("doc_id"))
    }),

    // Tokenizer-vocabulary coverage (the OOV-rate gate an LLM data pipeline
    // runs before training): vocab = the 30 globally most frequent tokens
    // (count desc, token asc — deterministic), per-doc out-of-vocabulary
    // rate in integer basis points. Vocab is tiny ⇒ broadcast into the
    // per-token left join; corpus never shuffles except the per-doc rollup.
    "q124_oov_rate" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(30)
        .select(col("tok"), lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(coalesce(col("in_v"), lit(0))).as("n_in"))
        .select(col("doc_id"), col("n_tok"),
          (col("n_tok") - col("n_in")).as("n_oov"),
          expr("(10000 * (n_tok - n_in)) DIV n_tok").as("oov_bp"))
        .orderBy(col("doc_id"))
    }),

    // F2 join_content graded end-to-end (crawler/utils.py:21-36): every
    // crawler assembles a document's `info` by join_content-ing scraped
    // fragments (e.g. uci.py:52-57); here each document contributes a
    // 3-fragment list (a mid-word text prefix needing a period, the source,
    // a synthetic lang tail) plus degenerate shapes — a single-fragment
    // list (NO punctuation added, the len>1 guard) and a list with an empty
    // fragment (dropped before joining, never double-spaced)
    "q119_join_content" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          TextFns.joinContent(array(
            substring(col("text"), 1, 80), col("source"),
            concat(lit("lang "), col("lang")))).as("joined"),
          TextFns.joinContent(array(substring(col("text"), 1, 40))).as("single"),
          TextFns.joinContent(array(col("source"), lit("  \n "), col("lang")))
            .as("with_empty"))
        .orderBy(col("doc_id"))
    }))

  private val toksSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val lowToksSql = """regexp_split_to_array(trim(lower(text)), '\s+')"""
  private val enListSql = "['the','a','an','and','of','to','in','is','it','that']"

  /** The PPJoin exact set-similarity chain (q118's oracle body), factored
    * as CTEs over a `corpus(id, text)` relation and ending in the
    * `exacts` pair set — shared by q118 and q264's recall denominator. */
  private val setSimChainSql: String =
    """tk0 AS (SELECT id, regexp_split_to_array(trim(text), '\s+') AS tk
      |        FROM corpus WHERE length(trim(text)) > 0),
      |toks AS (
      |  SELECT DISTINCT id,
      |    cast(('0x' || substr(sha256(sh), 1, 15)) as bigint) AS tok FROM (
      |    SELECT id, unnest(list_transform(generate_series(1, cast(greatest(len(tk)-2, 0) as bigint)),
      |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
      |    FROM tk0) u),
      |sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY id),
      |tdf AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
      |rk AS (
      |  SELECT t.id, t.tok,
      |    row_number() OVER (PARTITION BY t.id ORDER BY d.df ASC, t.tok ASC) AS rn
      |  FROM toks t JOIN tdf d ON d.tok = t.tok),
      |pref AS (
      |  SELECT rk.id, rk.tok, s.sz
      |  FROM rk JOIN sizes s ON s.id = rk.id
      |  WHERE rk.rn <= s.sz - ((s.sz * 1 + 1) // 2) + 1),
      |cand AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM pref a JOIN pref b ON a.tok = b.tok AND a.id < b.id
      |  WHERE greatest(a.sz, b.sz) * 1 <= least(a.sz, b.sz) * 2),
      |inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS inter
      |  FROM cand c
      |  JOIN toks ta ON ta.id = c.id_a
      |  JOIN toks tb ON tb.id = c.id_b AND tb.tok = ta.tok
      |  GROUP BY c.id_a, c.id_b),
      |exacts AS (
      |  SELECT i.id_a, i.id_b, i.inter, za.sz AS sz_a, zb.sz AS sz_b,
      |    (10000 * i.inter) // (za.sz + zb.sz - i.inter) AS jacc_bp
      |  FROM inter i
      |  JOIN sizes za ON za.id = i.id_a
      |  JOIN sizes zb ON zb.id = i.id_b
      |  WHERE i.inter * 2 >= (za.sz + zb.sz - i.inter) * 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q123_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        |  FROM documents WHERE length(trim(text)) > 0)
        |SELECT doc_id, count(*) AS n_hits
        |FROM toks, unnest(generate_series(1, len(a) - 1)) t(i)
        |WHERE a[i] = 'table' AND a[i+1] = 'hash'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the odds-ratio arithmetic replays in integers (DuckDB // ==
    // Spark DIV on positive operands)
    "q175_token_drift" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |c AS (
        |  SELECT tok,
        |    cast(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) as bigint) AS ca,
        |    cast(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) as bigint) AS cb
        |  FROM toks GROUP BY tok),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c)
        |SELECT tok, ca, cb,
        |  cast((10000 * (ca + 1) * (nb + 2)) // ((cb + 1) * (na + 2)) as bigint) AS lift_bp,
        |  cast(abs((10000 * (ca + 1) * (nb + 2)) // ((cb + 1) * (na + 2)) - 10000) as bigint)
        |    AS drift_bp
        |FROM c CROSS JOIN t
        |WHERE ca + cb >= 5
        |ORDER BY drift_bp DESC, tok ASC LIMIT 30""".stripMargin,

    // pair positions replay from the same tokenization; 1-based vs 0-based
    // positions cancel in the distance
    "q173_proximity_search" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        |  FROM documents WHERE length(trim(text)) > 0),
        |pos AS (
        |  SELECT doc_id, i, a[i] AS tok
        |  FROM toks, unnest(generate_series(1, len(a))) t(i)),
        |pa AS (SELECT doc_id, i FROM pos WHERE tok = 'data'),
        |pb AS (SELECT doc_id, i AS j FROM pos WHERE tok = 'model'),
        |p AS (
        |  SELECT pa.doc_id, abs(pa.i - pb.j) AS d
        |  FROM pa JOIN pb USING (doc_id) WHERE abs(pa.i - pb.j) <= 5)
        |SELECT doc_id, count(*) AS n_pairs, min(d) AS min_dist
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q124_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |v AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |    ORDER BY cnt DESC, tok ASC LIMIT 30)),
        |pd AS (
        |  SELECT t.doc_id, count(*) AS n_tok,
        |    cast(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_in
        |  FROM toks t LEFT JOIN v ON t.tok = v.tok GROUP BY t.doc_id)
        |SELECT doc_id, n_tok, n_tok - n_in AS n_oov,
        |  (10000 * (n_tok - n_in)) // n_tok AS oov_bp
        |FROM pd ORDER BY doc_id""".stripMargin,

    "q119_join_content" ->
      s"""SELECT doc_id,
         |  ${TextFns.joinContentSql("[substring(text, 1, 80), source, 'lang ' || lang]")} AS joined,
         |  ${TextFns.joinContentSql("[substring(text, 1, 40)]")} AS single,
         |  ${TextFns.joinContentSql("[source, '  ' || chr(10) || ' ', lang]")} AS with_empty
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q93_inverted_index" ->
      s"""WITH p AS (
         |  SELECT doc_id, unnest(list_distinct($toksSql)) AS tok
         |  FROM documents WHERE length(trim(text)) > 0),
         |h AS (
         |  SELECT doc_id FROM p WHERE tok IN ('spark', 'window', 'stream')
         |  GROUP BY doc_id HAVING count(DISTINCT tok) = 3)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d JOIN h USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q11_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_chars,
        |  round(cast(sum(n_chars) as double) / count(*), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q12_doc_identity" ->
      """SELECT doc_id, sha256(source || '/' || doc_id) AS index,
        |  substring(text, 1, 64) AS preview, length(text) AS n
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q13_clean_tokens" ->
      s"""SELECT doc_id,
         |  ${TextFns.cleanTextSql("text")} AS cleaned,
         |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toksSql) END AS n_tokens,
         |  length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q14_quality" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toksSql) END AS ntok,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE cast(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) as double)
         |              / cast(length(text) as double) END AS pratio,
         |    len(list_filter($lowToksSql, x -> list_contains($enListSql, x))) AS en_hits,
         |    len(list_filter($lowToksSql, x -> list_contains(['der','die','das','und','nicht','ist','ein'], x))) AS de_hits,
         |    len(list_filter($lowToksSql, x -> list_contains(['el','la','los','las','que','y','es','un'], x))) AS es_hits,
         |    len(list_filter($lowToksSql, x -> list_contains(['le','les','et','une','est','dans'], x))) AS fr_hits
         |  FROM documents)
         |SELECT doc_id,
         |  floor((least(cast(ntok as double) / 64.0, 1.0) * 0.4
         |      + greatest(1.0 - pratio * 10.0, 0.0) * 0.3
         |      + least((CASE WHEN ntok = 0 THEN 0.0 ELSE cast(en_hits as double)/cast(ntok as double) END) * 4.0, 1.0) * 0.3)
         |      * 10000.0 + 0.5) / 10000.0 AS quality,
         |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |       WHEN de_hits > en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
         |       WHEN es_hits > en_hits AND es_hits > de_hits AND es_hits >= fr_hits THEN 'es'
         |       WHEN fr_hits > en_hits AND fr_hits > de_hits AND fr_hits > es_hits THEN 'fr'
         |       ELSE 'en' END AS lang_guess
         |FROM base ORDER BY doc_id""".stripMargin,

    "q15_chunks" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, cast(pos as int) AS pos, doc_id || '_' || pos AS chunk_id,
        |  substring(text, cast(pos*64+1 as int), 128) AS chunk
        |FROM c ORDER BY doc_id, pos""".stripMargin,

    "q16_chunk_best" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
        |  FROM documents WHERE length(text) > 0),
        |ch AS (
        |  SELECT doc_id || '_' || pos AS chunk_id,
        |    substring(text, cast(pos*64+1 as int), 128) AS chunk
        |  FROM c)
        |SELECT split_part(chunk_id, '_', 1) AS parent,
        |  max(cast(('0x' || substr(sha256(chunk), 1, 8)) as bigint) % 1000000007) AS best_score,
        |  count(*) AS n_chunks
        |FROM ch GROUP BY parent ORDER BY parent""".stripMargin,

    "q17_exact_dedup" ->
      s"""WITH corpus AS ($dupCorpusSql)
         |SELECT sha256(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS canonical_id
         |FROM corpus GROUP BY content_hash HAVING count(*) > 1
         |ORDER BY content_hash""".stripMargin,

    "q18_neardup_lsh" ->
      s"""WITH corpus AS ($nearDupCorpusSql),
         |${minhashVerifiedSql(0.3)}
         |SELECT id_a, id_b, inter, sz_a, sz_b, jaccard FROM verified
         |ORDER BY id_a, id_b""".stripMargin,

    "q115_triangle_census" ->
      s"""WITH corpus AS ($triCorpusSql),
         |${minhashVerifiedSql(0.3)},
         |e AS (SELECT id_a AS u, id_b AS v FROM verified),
         |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
         |ek AS (
         |  SELECT e.u, e.v, du.deg * 4294967296 + e.u AS ku, dv.deg * 4294967296 + e.v AS kv
         |  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
         |oe AS (
         |  SELECT CASE WHEN ku < kv THEN u ELSE v END AS a,
         |         CASE WHEN ku < kv THEN v ELSE u END AS b,
         |         greatest(ku, kv) AS kb
         |  FROM ek),
         |tri AS (
         |  SELECT e1.a AS t1, e1.b AS t2, e2.b AS t3
         |  FROM oe e1
         |  JOIN oe e2 ON e1.a = e2.a AND e1.kb < e2.kb
         |  JOIN oe e3 ON e3.a = e1.b AND e3.b = e2.b),
         |pn AS (
         |  SELECT node, count(*) AS tri FROM (
         |    SELECT t1 AS node FROM tri
         |    UNION ALL SELECT t2 AS node FROM tri
         |    UNION ALL SELECT t3 AS node FROM tri) x
         |  GROUP BY node)
         |SELECT d.node AS node, d.deg AS deg,
         |  cast(coalesce(pn.tri, 0) as bigint) AS tri,
         |  (20000 * cast(coalesce(pn.tri, 0) as bigint)) // (d.deg * (d.deg - 1)) AS coeff_bp
         |FROM deg d LEFT JOIN pn ON pn.node = d.node
         |WHERE d.deg >= 2
         |ORDER BY node""".stripMargin,

    "q118_setsim_join" ->
      s"""WITH corpus AS ($nearDupCorpusSql),
         |$setSimChainSql
         |SELECT id_a, id_b, inter, sz_a, sz_b, jacc_bp FROM exacts
         |ORDER BY id_a, id_b""".stripMargin,

    // both pipelines replay (prefixed CTEs keep them apart), then the
    // three counts and the integer recall
    "q264_dedup_recall" ->
      s"""WITH corpus AS ($nearDupCorpusSql),
         |$setSimChainSql,
         |${minhashVerifiedSql(0.5, "corpus", "m")}
         |SELECT cast(e.n as bigint) AS n_exact, cast(l.n as bigint) AS n_lsh,
         |  cast(c.n as bigint) AS n_common,
         |  (10000 * c.n) // e.n AS recall_bp
         |FROM (SELECT count(*) AS n FROM exacts) e,
         |     (SELECT count(*) AS n FROM mverified) l,
         |     (SELECT count(*) AS n FROM exacts JOIN mverified USING (id_a, id_b)) c""".stripMargin,

    "q105_incremental_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id AS id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $Off2 AS id,
         |    substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
         |  FROM documents WHERE doc_id % 25 = 0),
         |${minhashVerifiedSql(0.3)}
         |SELECT id_a, id_b, inter, sz_a, sz_b, jaccard FROM verified
         |WHERE id_a >= $Off2 OR id_b >= $Off2
         |ORDER BY id_a, id_b""".stripMargin,

    // every window position rehashes through the same sha256-prefix trick
    "q172_cdc_chunking" ->
      """WITH p AS (
        |  SELECT doc_id, source, text,
        |    unnest(generate_series(1, greatest(length(text) - 15, 0))) AS i
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source, i FROM p
        |  WHERE cast(('0x' || substr(sha256(substring(text, cast(i as int), 16)), 2, 15))
        |          as bigint) % 64 = 0),
        |ab AS (
        |  SELECT source, count(*) AS n_boundaries,
        |    count(DISTINCT doc_id) AS n_cut_docs, sum(i) AS sum_cut_pos
        |  FROM b GROUP BY source),
        |ad AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        |SELECT ad.source, ad.n_docs,
        |  cast(coalesce(n_cut_docs, 0) as bigint) AS n_cut_docs,
        |  cast(coalesce(n_boundaries, 0) as bigint) AS n_boundaries,
        |  cast(coalesce(sum_cut_pos, 0) as bigint) AS sum_cut_pos,
        |  cast(ad.n_docs + coalesce(n_boundaries, 0) as bigint) AS n_chunks
        |FROM ad LEFT JOIN ab ON ab.source = ad.source
        |ORDER BY ad.source""".stripMargin,

    // the verified-pair replay bucketed by canonicalized source pair; the
    // mirror source guarantees cross-source rows
    "q170_source_overlap" ->
      s"""WITH corpus AS (
         |  SELECT doc_id AS id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 6000000000 AS id, 'mirror' AS source,
         |    substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
         |  FROM documents WHERE doc_id % 25 = 0),
         |${minhashVerifiedSql(0.3)},
         |lab AS (SELECT id, source FROM corpus),
         |m AS (
         |  SELECT least(a.source, b.source) AS source_a,
         |         greatest(a.source, b.source) AS source_b
         |  FROM verified v JOIN lab a ON a.id = v.id_a JOIN lab b ON b.id = v.id_b)
         |SELECT source_a, source_b, count(*) AS n_pairs
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q79's cluster replay + the q69 sha256-bucket split applied to the
    // cluster representative; naive-vs-cluster disagreement is replayed
    // with the same bucket formula on the member id
    "q164_leakage_safe_split" -> {
      def b(x: String) =
        s"cast(('0x' || substr(sha256(cast($x as varchar)), 2, 15)) as bigint) % 64"
      def sp(x: String) =
        s"CASE WHEN ${b(x)} < 51 THEN 'train' WHEN ${b(x)} < 57 THEN 'val' ELSE 'test' END"
      s"""WITH RECURSIVE corpus AS ($splitCorpusSql),
         |${minhashVerifiedSql(0.3)},
         |e AS (SELECT id_a AS src, id_b AS dst FROM verified),
         |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
         |reach(node, label) AS (
         |  SELECT DISTINCT src AS node, src AS label FROM sym
         |  UNION
         |  SELECT s.src AS node, r.label FROM sym s JOIN reach r ON s.dst = r.node),
         |comp AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
         |resolved AS (
         |  SELECT c.id, coalesce(p.label, c.id) AS canonical
         |  FROM corpus c LEFT JOIN comp p ON p.node = c.id)
         |SELECT ${sp("canonical")} AS split, count(*) AS n_docs,
         |  count(DISTINCT canonical) AS n_clusters,
         |  cast(sum(CASE WHEN ${sp("id")} <> ${sp("canonical")} THEN 1 ELSE 0 END) as bigint)
         |    AS n_rescued,
         |  cast(sum(id) as bigint) AS sum_ids
         |FROM resolved GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q200_snm_dedup" ->
      s"""WITH corpus AS ($resolveCorpusSql),
         |tok AS (
         |  SELECT id, text,
         |    list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
         |  FROM corpus),
         |ranked AS (
         |  SELECT substring(text, 1, 12) AS blk, id, toks,
         |    cast(row_number() OVER (PARTITION BY substring(text, 1, 12)
         |      ORDER BY length(text), id) as bigint) AS rnk
         |  FROM tok),
         |p AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    cast(len(list_filter(a.toks, t -> list_contains(b.toks, t))) as bigint)
         |      AS inter,
         |    cast(len(a.toks) + len(b.toks) as bigint) AS stot
         |  FROM ranked a JOIN ranked b ON a.blk = b.blk
         |    AND b.rnk > a.rnk AND b.rnk <= a.rnk + 3),
         |v AS (
         |  SELECT id_a, id_b,
         |    (10000 * inter) // greatest(stot - inter, 1) AS j_bp
         |  FROM p)
         |SELECT count(*) AS n_pairs,
         |  cast(sum(id_a) as bigint) AS sum_a, cast(sum(id_b) as bigint) AS sum_b,
         |  cast(sum(j_bp) as bigint) AS sum_j_bp,
         |  cast(sum(CASE WHEN id_a - id_b = $Off1 OR id_b - id_a = $Off1
         |    THEN 1 ELSE 0 END) as bigint) AS n_planted
         |FROM v WHERE j_bp >= 3000""".stripMargin,

    "q206_snm_multipass" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id AS id, text FROM base
         |  UNION ALL
         |  SELECT doc_id + $Off1 AS id,
         |    substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
         |  FROM base WHERE doc_id % 25 = 0
         |  UNION ALL
         |  SELECT doc_id + $Off2 AS id, 'EDITED VERSION ' || text AS text
         |  FROM base WHERE doc_id % 25 = 0),
         |tok AS (
         |  SELECT id, text,
         |    list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks,
         |    substring(text, 1, 12) AS blk_a,
         |    substring(text, cast(greatest(length(text) - 11, 1) as int), 12) AS blk_b,
         |    cast(length(text) as bigint) AS len
         |  FROM corpus),
         |ra AS (
         |  SELECT id, blk_a AS blk,
         |    cast(row_number() OVER (PARTITION BY blk_a ORDER BY len, id) as bigint) AS rnk
         |  FROM tok),
         |rb AS (
         |  SELECT id, blk_b AS blk,
         |    cast(row_number() OVER (PARTITION BY blk_b ORDER BY len, id) as bigint) AS rnk
         |  FROM tok),
         |pa AS (
         |  SELECT a.id AS id_a, b.id AS id_b FROM ra a JOIN ra b
         |  ON a.blk = b.blk AND b.rnk > a.rnk AND b.rnk <= a.rnk + 3),
         |pb AS (
         |  SELECT a.id AS id_a, b.id AS id_b FROM rb a JOIN rb b
         |  ON a.blk = b.blk AND b.rnk > a.rnk AND b.rnk <= a.rnk + 3),
         |cand AS (
         |  SELECT DISTINCT id_a, id_b FROM
         |  (SELECT * FROM pa UNION ALL SELECT * FROM pb)),
         |v AS (
         |  SELECT c.id_a, c.id_b,
         |    cast(len(list_filter(ta.toks, t -> list_contains(tb.toks, t))) as bigint)
         |      AS inter,
         |    cast(len(ta.toks) + len(tb.toks) as bigint) AS stot
         |  FROM cand c
         |  JOIN tok ta ON ta.id = c.id_a
         |  JOIN tok tb ON tb.id = c.id_b),
         |j AS (
         |  SELECT id_a, id_b,
         |    (10000 * inter) // greatest(stot - inter, 1) AS j_bp
         |  FROM v)
         |SELECT count(*) AS n_pairs,
         |  cast(sum(id_a) as bigint) AS sum_a, cast(sum(id_b) as bigint) AS sum_b,
         |  cast(sum(j_bp) as bigint) AS sum_j_bp,
         |  cast(sum(CASE WHEN abs(id_a - id_b) = $Off1 THEN 1 ELSE 0 END) as bigint)
         |    AS n_planted_trunc,
         |  cast(sum(CASE WHEN abs(id_a - id_b) = $Off2 THEN 1 ELSE 0 END) as bigint)
         |    AS n_planted_prefix
         |FROM j WHERE j_bp >= 3000""".stripMargin,

    "q201_snm_global" ->
      s"""WITH corpus AS ($resolveCorpusSql),
         |tok AS (
         |  SELECT id, text,
         |    list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
         |  FROM corpus),
         |ranked AS (
         |  SELECT id, toks,
         |    cast(row_number() OVER (ORDER BY substring(text, 1, 12),
         |      length(text), id) as bigint) AS rnk
         |  FROM tok),
         |p AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    cast(len(list_filter(a.toks, t -> list_contains(b.toks, t))) as bigint)
         |      AS inter,
         |    cast(len(a.toks) + len(b.toks) as bigint) AS stot
         |  FROM ranked a JOIN ranked b
         |    ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3),
         |v AS (
         |  SELECT id_a, id_b,
         |    (10000 * inter) // greatest(stot - inter, 1) AS j_bp
         |  FROM p)
         |SELECT count(*) AS n_pairs,
         |  cast(sum(id_a) as bigint) AS sum_a, cast(sum(id_b) as bigint) AS sum_b,
         |  cast(sum(j_bp) as bigint) AS sum_j_bp,
         |  cast(sum(CASE WHEN id_a - id_b = $Off1 OR id_b - id_a = $Off1
         |    THEN 1 ELSE 0 END) as bigint) AS n_planted
         |FROM v WHERE j_bp >= 3000""".stripMargin,

    "q79_dedup_resolve" ->
      s"""WITH RECURSIVE corpus AS ($resolveCorpusSql),
         |${minhashVerifiedSql(0.3)},
         |e AS (SELECT id_a AS src, id_b AS dst FROM verified),
         |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
         |reach(node, label) AS (
         |  SELECT DISTINCT src AS node, src AS label FROM sym
         |  UNION
         |  SELECT s.src AS node, r.label FROM sym s JOIN reach r ON s.dst = r.node),
         |comp AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
         |resolved AS (
         |  SELECT c.id, c.source, coalesce(p.label, c.id) AS canonical
         |  FROM corpus c LEFT JOIN comp p ON p.node = c.id)
         |SELECT source, count(*) AS n_docs,
         |  cast(sum(CASE WHEN id = canonical THEN 1 ELSE 0 END) as bigint) AS n_kept,
         |  cast(sum(CASE WHEN id = canonical THEN 0 ELSE 1 END) as bigint) AS n_dropped,
         |  cast(sum(CASE WHEN id = canonical THEN id ELSE 0 END) as bigint) AS kept_sum_ids
         |FROM resolved GROUP BY source ORDER BY source""".stripMargin,

    "q152_dedup_quality_resolve" ->
      s"""WITH RECURSIVE corpus AS ($qualityCorpusSql),
         |${minhashVerifiedSql(0.3)},
         |e AS (SELECT id_a AS src, id_b AS dst FROM verified),
         |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
         |reach(node, label) AS (
         |  SELECT DISTINCT src AS node, src AS label FROM sym
         |  UNION
         |  SELECT s.src AS node, r.label FROM sym s JOIN reach r ON s.dst = r.node),
         |comp AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
         |labeled AS (
         |  SELECT c.id, c.source, cast(length(c.text) as bigint) AS quality,
         |         coalesce(p.label, c.id) AS cluster
         |  FROM corpus c LEFT JOIN comp p ON p.node = c.id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY cluster
         |    ORDER BY quality DESC, id ASC) AS r
         |  FROM labeled)
         |SELECT source, count(*) AS n_docs,
         |  cast(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) as bigint) AS n_kept,
         |  cast(sum(CASE WHEN r = 1 THEN id ELSE 0 END) as bigint) AS kept_sum_ids,
         |  cast(sum(CASE WHEN r = 1 THEN quality ELSE 0 END) as bigint) AS kept_sum_quality
         |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "q49_fuzzy_match" ->
      s"""WITH corpus AS ($fuzzyCorpusSql),
         |d AS (
         |  SELECT doc_id, source, substring(text, 1, 24) AS pfx,
         |         substring(text, 1, 8) AS blk FROM corpus),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.pfx, b.pfx) AS dist
         |  FROM d a JOIN d b ON a.source = b.source
         |    AND a.blk = b.blk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, dist FROM pairs WHERE dist <= 8
         |ORDER BY id_a, id_b""".stripMargin,

    "q61_dedup_clusters_star" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents WHERE doc_id % 25 < 11),
        |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
        |reach(node, label) AS (
        |  SELECT DISTINCT src AS node, src AS label FROM sym
        |  UNION
        |  SELECT s.src AS node, r.label FROM sym s JOIN reach r ON s.dst = r.node),
        |comp AS (SELECT node, min(label) AS label FROM reach GROUP BY node)
        |SELECT label, count(*) AS n_nodes FROM comp GROUP BY label ORDER BY label""".stripMargin,

    "q48_dedup_clusters" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents WHERE doc_id % 10 < 3),
        |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
        |reach(node, label) AS (
        |  SELECT DISTINCT src AS node, src AS label FROM sym
        |  UNION
        |  SELECT s.src AS node, r.label FROM sym s JOIN reach r ON s.dst = r.node),
        |comp AS (SELECT node, min(label) AS label FROM reach GROUP BY node)
        |SELECT label, count(*) AS n_nodes FROM comp GROUP BY label ORDER BY label""".stripMargin,

    "q59_html_markdown" -> {
      val htmlSql =
        """'<html><body><h1>Doc ' || doc_id || '</h1>' ||
          |'<p>Lang: <b>' || lang || '</b> &amp; source <i>' || source || '</i></p>' ||
          |'<ul><li><a href="https://' || source || '.example.com/' || doc_id ||
          |'">visit</a></li><li>chars: ' || n_chars || '</li></ul><p>' ||
          |substring(text, 1, 60) || '</p><script>var x = 1;</script></body></html>'"""
          .stripMargin.replace("\n", " ")
      s"""SELECT doc_id, ${TextFns.htmlToMarkdownSql(s"($htmlSql)")} AS md
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q58_doc_urls" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/' || lang || '/' || doc_id || '.txt' AS url,
        |  doc_id || '.txt' AS basename,
        |  array_to_string(regexp_split_to_array(trim(text), '\s+')[1:3], ' ') AS first_words,
        |  strftime(DATE '2024-01-01' + INTERVAL (doc_id % 365) DAY, '%Y-%m-%d %a') AS day
        |FROM documents ORDER BY basename, doc_id""".stripMargin,

    "q42_token_stats" ->
      s"""SELECT lang,
         |  cast(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toksSql) END) as bigint) AS n_ws_tokens,
         |  cast(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) as bigint) AS n_bpe_tokens,
         |  round(quantile_cont(n_chars, 0.5), 2) AS median_chars,
         |  round(quantile_cont(n_chars, 0.9), 2) AS p90_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q43_approx_distinct" ->
      """SELECT source, count(DISTINCT doc_id) AS n_exact, true AS sketch_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q50_approx_quantile" ->
      """SELECT lang, round(quantile_cont(n_chars, 0.5), 2) AS median_exact,
        |  true AS sketch_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // the UDAF's per-bit majority vote replayed relationally: one ±1 vote
    // per (token occurrence, bit position), bit set iff the vote sum is
    // positive, bits assembled with << in BIGINT (values < 2^60, no overflow)
    "q20_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |hs AS (
        |  SELECT doc_id, cast(('0x' || substr(sha256(tok), 1, 15)) as bigint) AS h
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) js
        |  GROUP BY doc_id, j)
        |SELECT doc_id,
        |  cast(coalesce(sum(CASE WHEN s > 0 THEN (cast(1 as bigint) << j) END), 0) as bigint) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q19_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      t -> cast(('0x' || substr(sha256(t), 1, 8)) as bigint) % 1000000007),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents WHERE length(trim(text)) > 0
        |ORDER BY doc_id""".stripMargin)
}
