package graft.queries

import graft.{Engine, EngineConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import QHelpers._

/**
 * Lifecycle-level graded queries: the reference's actual user journey
 * (`src/main.py:5-58`: crawl→store, `vdb.update`, `vdb.search`) driven
 * end-to-end through [[graft.Engine]] (q64), and the Structured Streaming
 * ingest surface driven through a real `readStream` → `writeStream` run
 * (q65). Everything else in the suite grades one operator; these grade the
 * composition users run.
 */
object EngineQueries {

  /** Fixed search queries for the lifecycle run (the reference's `search`
    * verb takes free text, main.py:44). */
  private val searchTexts = Seq(
    "data quality analysis pipeline",
    "neural network training corpus",
    "distributed spark table join")

  /** Monotone run id so repeated bench invocations get fresh temp stores /
    * sink names without colliding. */
  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stopword-laden search texts for the analyzer query (q247): every
    * second token is on the english stoplist, so the standard and english
    * analyzers provably diverge on them. */
  private val analyzerTexts = Seq(
    "the table with a value",
    "this vector and the stream")

  /** Plural-laden search texts for the stemming analyzer (q276): every
    * content token is a plural form whose stem exists in the corpus —
    * `queries` also exercises the ies→y rewrite. */
  private val stemTexts = Seq(
    "the tables and queries",
    "values of streams")

  /** Derivational search texts for the FULL Snowball stemmer (q288):
    * 'relate' only meets the corpus's appended 'relational' under Porter2
    * (both → 'relat'; the minimal stemmer leaves both untouched and
    * unequal), and 'generous' only meets 'generously' the same way —
    * divergence on the QUERY side ('relate' → 'relat') and the INDEX side
    * ('relational' → 'relat') at once. 'tables' keeps a plural arm live so
    * the two stemmers' shared ground is represented too. */
  private val porterTexts = Seq(
    "the relate tables",
    "generous streams of values")

  /** Short-token-laden search texts for the length-filter analyzer
    * (q282): 'dup' and 'big' (3 letters) survive the english stoplist but
    * die on len:4:24 — the two analyzers provably diverge on them. */
  private val lenTexts = Seq(
    "the dup table with data",
    "big values and a stream")

  /**
   * A NON-hash stand-in for a real embedding model (`embed.py:21-39`'s
   * forward pass), proving the [[graft.Engine.Embedder]] seam end-to-end:
   * a fixed linear layer over letter-count features — x_i = w_i ·
   * count(letter_i), L2-normalized with the same double-product /
   * float-cast contract the hash embedder uses, so DuckDB can replay it
   * bit-exactly. The weights are arbitrary fixed literals (they play the
   * role of trained parameters; any user model slots in the same way).
   */
  private[graft] object LetterEmbedder extends graft.Engine.Embedder {
    val letters: Array[Char] = "aeiounst".toCharArray
    val weights: Array[Double] =
      Array(0.9273, -0.3141, 0.5772, -0.8415, 0.2718, 0.6931, -0.4142, 0.1618)
    val dim: Int = letters.length
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var c = 0; var j = 0
        while (j < t.length) { if (t.charAt(j) == letters(i)) c += 1; j += 1 }
        x(i) = weights(i) * c
        i += 1
      }
      var n2 = 0.0; i = 0
      while (i < dim) { n2 += x(i) * x(i); i += 1 }
      val out = new Array[Float](dim)
      if (n2 > 0) {
        val inv = 1.0 / math.sqrt(n2)
        i = 0
        while (i < dim) { out(i) = (x(i) * inv).toFloat; i += 1 }
      }
      out
    }
  }

  /** q156's checkpoint parameters: an 8×8 linear layer over letter-count
    * features, derived from seed 42 via the pure
    * [[graft.functions.FileEmbedder.syntheticWeights]] grid — the oracle
    * derives the same 3-decimal literals independently. */
  private[graft] lazy val q156Model = graft.functions.FileEmbedder.Model(
    "aeiounst".toCharArray, graft.functions.FileEmbedder.syntheticWeights(42L, 8, 8))

  /** q229's checkpoint: a TWO-layer MLP (8×8 relu → 8×8 linear) over the
    * same letter-count features, both weight tensors derived from seeds via
    * the pure [[graft.functions.FileEmbedder.syntheticWeights]] grid — the
    * oracle re-derives the same 3-decimal literals independently. */
  private[graft] lazy val q229Model = graft.functions.FileEmbedder.MlpModel(
    "aeiounst".toCharArray,
    List(
      graft.functions.FileEmbedder.Layer(
        graft.functions.FileEmbedder.syntheticWeights(7L, 8, 8), "relu"),
      graft.functions.FileEmbedder.Layer(
        graft.functions.FileEmbedder.syntheticWeights(13L, 8, 8), "none")))

  /** q286's checkpoint: the tiny deterministic TRANSFORMER (8-dim, 8-token
    * context, single-head attention + position-wise FFN), all six tensors
    * derived from seeds via the pure
    * [[graft.functions.FileEmbedder.syntheticWeights]] grid — the oracle
    * re-derives the same 3-decimal literals independently and replays the
    * attention forward bit-for-bit (every op IEEE-exact; the softmax is a
    * piecewise-linear exp2, not a libm transcendental). */
  private[graft] lazy val q286Model = graft.functions.FileEmbedder.AttnModel(
    "etaoinsh".toCharArray, 8,
    pos = graft.functions.FileEmbedder.syntheticWeights(17L, 8, 8),
    we = graft.functions.FileEmbedder.syntheticWeights(23L, 8, 8),
    wq = graft.functions.FileEmbedder.syntheticWeights(29L, 8, 8),
    wk = graft.functions.FileEmbedder.syntheticWeights(31L, 8, 8),
    wv = graft.functions.FileEmbedder.syntheticWeights(37L, 8, 8),
    w2 = graft.functions.FileEmbedder.syntheticWeights(41L, 8, 8))

  /** q292's checkpoint: the ARCHITECTURE-COMPLETE transformer — 2 heads ×
    * 2 post-LN encoder blocks (multi-head attention + Wo mix + residual +
    * layernorm + relu FFN + residual + layernorm), every tensor seed-derived
    * from the same pure grid. Gains sit near 1 (`1 + w/4`) and biases near 0
    * (`w/4`) — `/4` is a power-of-two divide, so both spellings round-trip
    * exactly through `Double.toString` into the oracle's SQL literals. */
  private[graft] lazy val q292Model: graft.functions.FileEmbedder.Attn2Model = {
    def sw(seed: Long) = graft.functions.FileEmbedder.syntheticWeights(seed, 8, 8)
    def gain(seed: Long) =
      graft.functions.FileEmbedder.syntheticWeights(seed, 1, 8).head.map(x => 1.0 + x / 4)
    def bias(seed: Long) =
      graft.functions.FileEmbedder.syntheticWeights(seed, 1, 8).head.map(_ / 4)
    def blk(s1: Long, s2: Long, s3: Long, s4: Long, s5: Long,
            s6: Long, s7: Long, s8: Long, s9: Long) =
      graft.functions.FileEmbedder.AttnBlock(sw(s1), sw(s2), sw(s3), sw(s4), sw(s5),
        gain(s6), bias(s7), gain(s8), bias(s9))
    graft.functions.FileEmbedder.Attn2Model(
      "etaoinsh".toCharArray, maxlen = 8, heads = 2,
      pos = sw(17L), we = sw(23L),
      blocks = List(
        blk(29L, 31L, 37L, 43L, 41L, 47L, 53L, 59L, 61L),
        blk(67L, 71L, 73L, 79L, 83L, 89L, 97L, 101L, 103L)))
  }

  val queries: Map[String, Q] = Map(
    // The whole Engine lifecycle as ONE graded query: dedup-ingest the
    // corpus twice (the second pass must append nothing — crawler.py:39-50's
    // idempotence contract), rebuild the vector index (chunk → batched
    // hash-embed → overwrite, vdb.py:57-86), then semantic search
    // (vdb.py:88-122): chunk-level cosine vs the embedded queries, best hit
    // per document, top-4 per query, hydration join, ranked output. The
    // oracle replays chunking, feature-hash embedding, scoring and ranking
    // relationally in DuckDB — so ingest idempotence, the index build, and
    // the search pipeline are all hash-checked, not just "rows > 0".
    "q64_engine_lifecycle" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q64_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.ingest(docs) // idempotent re-crawl: appends nothing or the oracle breaks
      eng.update()
      eng.search(searchTexts)
    }),

    // The V1 model seam graded end-to-end: the SAME lifecycle as q64 but
    // with an injected NON-hash embedder (LetterEmbedder — a fixed linear
    // layer standing in for embed.py:21-39's forward pass). Both documents
    // and queries flow through the injected model; the oracle replays the
    // chunker, the letter-count projection, the normalize, and the whole
    // search pipeline relationally — so the proof is that a user-supplied
    // model round-trips update→search unchanged, hash-checked.
    "q120_engine_model_seam" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q120_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg, LetterEmbedder)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      eng.search(searchTexts)
    }),

    // The CHECKPOINT-FILE model seam graded end-to-end: q120 proved a
    // user-supplied in-code model; this proves the full production shape —
    // parameters serialized to a versioned checkpoint on shared storage
    // (functions/FileEmbedder.scala), the task closure shipping only the
    // PATH, each executor JVM lazily loading the weights once (the
    // @transient-lazy + per-JVM-cache discipline a real ONNX/JNI session
    // needs; onnxruntime itself cannot resolve in this zero-egress sandbox).
    // Both documents and queries flow through the loaded 8×8 linear layer;
    // the oracle re-derives the SAME parameters from the seed (a pure
    // function) as SQL literals and replays chunk → char-counts → W·c →
    // float-normalize → cosine top-k → hydration relationally.
    "q156_file_embedder" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q156_${runSeq.incrementAndGet()}_").toString
      val mpath = s"$tmp/model.ckpt"
      graft.functions.FileEmbedder.save(mpath, q156Model)
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg, graft.functions.FileEmbedder(mpath))
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      eng.search(searchTexts)
    }),

    // Reciprocal-rank-fusion hybrid retrieval — the standard way to merge
    // a lexical (BM25) ranking with a vector ranking without score
    // calibration: fused = Σ_lists 1e6 DIV (60 + rank), integer-exact.
    // Each list is cut to its top-100 with sort+limit (TakeOrdered — no
    // global single-partition window over the corpus; the rank window
    // runs over 100 survivors). BM25 is q121's integral spelling; the
    // vector list is doc-level hash-embed cosine against the same query.
    "q177_rrf_fusion" -> ((s, dir) => {
      import graft.functions.{TextFns, VectorFns}
      import s.implicits._
      val terms = Seq("spark", "data", "model")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val toks = docs.select(col("doc_id"),
        explode(TextFns.tokens(lower(col("text")))).as("tok"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val corp = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_toks"))
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val bm25 = tf.join(broadcast(dfT), "tok")
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
        .agg(sum(expr("(idf_bp * tf_bp) DIV 10000")).as("bm25_bp"))
      val lexW = org.apache.spark.sql.expressions.Window
        .orderBy(col("bm25_bp").desc, col("doc_id").asc)
      val lex = bm25.orderBy(col("bm25_bp").desc, col("doc_id").asc).limit(100)
        .withColumn("lex_rank", row_number().over(lexW).cast("long"))
      val qdf = Seq(0).toDF("one")
        .select(VectorFns.hashEmbedCol(lit(terms.mkString(" ")), 64).as("qvec"))
      val vecW = org.apache.spark.sql.expressions.Window
        .orderBy(col("cs").desc, col("doc_id").asc)
      val vec = docs
        .select(col("doc_id"), VectorFns.hashEmbedCol(col("text"), 64).as("vec"))
        .crossJoin(broadcast(qdf))
        .select(col("doc_id"),
          round(VectorFns.cosineSim(col("vec"), col("qvec")), 4).as("cs"))
        .orderBy(col("cs").desc, col("doc_id").asc).limit(100)
        .withColumn("vec_rank", row_number().over(vecW).cast("long"))
      lex.select(col("doc_id"), col("lex_rank"))
        .join(vec.select(col("doc_id"), col("vec_rank")), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
          coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
          (coalesce(expr("1000000 DIV (60 + lex_rank)"), lit(0L)) +
            coalesce(expr("1000000 DIV (60 + vec_rank)"), lit(0L))).as("rrf_ppm"))
        .orderBy(col("rrf_ppm").desc, col("doc_id").asc)
        .limit(10)
    }),

    // Late-interaction (ColBERT MaxSim) retrieval — the multi-vector
    // scoring mode between single-vector cosine (q21/q64) and exact
    // lexical match: each QUERY TOKEN keeps its own vector, a document
    // scores Σ_qtok max_chunk cos(chunk, qtok), so one strongly-matching
    // chunk per query facet is enough (single-vector pooling averages the
    // facets away). Chunk table × 4 broadcast token vectors → per-(doc,
    // token) max (map-side combinable) → per-doc decimal-exact sum →
    // top-5. The corpus shuffles once, keyed on doc_id.
    "q176_late_interaction" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val chunks = docs
        .select(col("doc_id"),
          posexplode(graft.functions.TextFns.chunk(col("text"), 128, 64))
            .as(Seq("pos", "chunk")))
        .withColumn("vec", graft.functions.VectorFns.hashEmbedCol(col("chunk"), 64))
      val qdf = Seq("deep", "neural", "network", "training").zipWithIndex
        .map { case (tk, i) => (i.toLong, tk) }.toDF("qi", "qt")
        .withColumn("qvec", graft.functions.VectorFns.hashEmbedCol(col("qt"), 64))
      chunks.crossJoin(broadcast(qdf))
        .select(col("doc_id"), col("qi"),
          round(graft.functions.VectorFns.cosineSim(col("vec"), col("qvec")), 4).as("c"))
        .groupBy(col("doc_id"), col("qi")).agg(max(col("c")).as("m"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m").cast(org.apache.spark.sql.types.DecimalType(10, 4)))
          .cast("double").as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(5)
    }),

    // Inference failure handling graded end-to-end
    // (VectorFns.embedPartitionsResilient — the dead-letter channel): every
    // 31st document is poisoned so the injected model throws on ANY batch
    // containing it; the resilient wrapper must retry item-wise, embed all
    // healthy neighbors normally (their vec checksums equal the clean
    // hash-embed replay) and quarantine exactly the poisoned set with the
    // error recorded. batchSize=32 guarantees poisoned and healthy docs
    // share batches, so the isolation path genuinely runs.
    "q167_embed_dlq" -> ((s, dir) => {
      val marker = "__poison__"
      val poisoned = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        when(col("doc_id") % 31 === 0, concat(col("text"), lit(" " + marker)))
          .otherwise(col("text")).as("text2"))
      val embedder: Seq[String] => Seq[Array[Float]] = texts => {
        if (texts.exists(_.contains(marker)))
          throw new IllegalArgumentException("poison batch")
        texts.map(graft.functions.VectorFns.hashEmbed(_, 64))
      }
      graft.functions.VectorFns.embedPartitionsResilient(
          poisoned, "text2", "vec", "embed_err", 64, 32, embedder)
        .groupBy(col("lang"))
        .agg(sum(when(col("embed_err").isNull, 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("embed_err").isNotNull, 1L).otherwise(0L)).as("n_failed"),
          sum(when(col("embed_err").isNotNull, col("doc_id")).otherwise(0L))
            .as("failed_sum_ids"),
          sum(when(col("embed_err").isNull,
              round(aggregate(col("vec"), lit(0.0d), (a, x) => a + abs(x.cast("double"))), 4)
                .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 4))))
            .cast("double").as("ok_l1"))
        .orderBy(col("lang"))
    }),

    // Incremental index maintenance graded end-to-end (the 100TB path): build
    // the index over half the corpus, dedup-ingest the rest, then
    // updateIncremental must embed ONLY the new documents (anti join on the
    // indexed doc_ids) and append — never re-embed the corpus the way the
    // reference's renew lifecycle does (vdb.py:196-212). A second
    // updateIncremental must append zero chunks (incremental idempotence).
    // The oracle replays chunk + hash-embed over the WHOLE corpus: the
    // incrementally-built index must be indistinguishable from a full build.
    "q68_incremental_index" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q68_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update() // full build over the even half
      eng.ingest(docs) // dedup-append: only the odd half lands
      val appended = eng.updateIncremental() // embeds ONLY the odd half
      require(appended > 0, "q68: incremental update appended nothing")
      val again = eng.updateIncremental() // store unchanged ⇒ nothing to do
      require(again == 0, s"q68: second incremental update appended $again chunks")
      eng.index()
        .select(col("doc_id"), col("chunk_id"),
          // + 0.0 canonicalizes IEEE -0.0 to +0.0 (the oracle does the same;
          // DuckDB's round emits -0.0 where Spark's emits 0.0)
          (round(aggregate(col("vec"), lit(0.0d), (a, x) => a + x.cast("double")), 4) + lit(0.0d))
            .as("vec_sum"),
          round(aggregate(col("vec"), lit(0.0d), (a, x) => a + abs(x.cast("double"))), 4)
            .as("vec_l1"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Per-document DELETE propagation graded end-to-end: ingest + full
    // build, then Engine.delete forgets every doc_id%7==0 — the store AND
    // the index must both converge to exactly the surviving documents'
    // chunk+embed state (the q68 checksum contract restricted to
    // survivors). A second delete of the same ids must remove nothing
    // (delete idempotence).
    "q126_engine_delete" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q126_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      val doomed = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
      val removed = eng.delete(doomed)
      require(removed > 0, "q126: delete removed nothing")
      require(eng.delete(doomed) == 0L, "q126: delete is not idempotent")
      eng.index()
        .select(col("doc_id"), col("chunk_id"),
          (round(aggregate(col("vec"), lit(0.0d), (a, x) => a + x.cast("double")), 4) + lit(0.0d))
            .as("vec_sum"),
          round(aggregate(col("vec"), lit(0.0d), (a, x) => a + abs(x.cast("double"))), 4)
            .as("vec_l1"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Streaming checkpoint RECOVERY graded end-to-end — the exactly-once
    // file-source contract across a restart: run 1 drains the first
    // delivery under Trigger.AvailableNow and stops; a second delivery
    // lands while NO query is running; run 2 restarts from the SAME
    // checkpoint and must process only the new file — the checkpoint's
    // source log, not the directory listing, decides what is new (a
    // re-listing runtime would double-ingest delivery 1). Each micro-batch
    // appends an evidence row (run, rows, id-sum); the graded frame is the
    // per-run evidence, which equals exact half-corpus parity counts ONLY
    // under exactly-once recovery.
    "q155_stream_recovery" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q155_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val monitor = s"$tmp/monitor"
      def runOnce(runId: Int): Unit =
        s.readStream.schema(docs.schema).parquet(drop.toString)
          .writeStream.option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val b = batch.localCheckpoint(true)
            val st = b.agg(count(lit(1)).cast("long"), sum(col("doc_id"))).collect().head
            val sp = b.sparkSession
            import sp.implicits._
            // batchId-keyed write: an at-least-once re-run of this batch
            // REPLACES its own evidence partition instead of double-appending
            graft.streaming.StreamOps.idempotentAppend(
              Seq((runId.toLong, st.getLong(0), st.getLong(1)))
                .toDF("run", "n_rows", "sum_ids").coalesce(1),
              monitor, id)
          }
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      stageFile(docs.filter(col("doc_id") % 2 === 0), tmp.resolve("w1"), drop, "a.parquet")
      runOnce(1)
      stageFile(docs.filter(col("doc_id") % 2 === 1), tmp.resolve("w2"), drop, "b.parquet")
      runOnce(2)
      s.read.parquet(monitor)
        .groupBy(col("run"))
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_ids")).as("sum_ids"))
        .orderBy(col("run"))
    }),

    // Store↔index consistency audit graded end-to-end (Engine.fsck — the
    // validate/fsck verb between maintenance windows): after a full build
    // over half the corpus plus a dedup-ingest of the rest, the audit must
    // report exactly the un-indexed half as missing (and zero orphans —
    // nothing bypassed the engine); after the repair (updateIncremental,
    // the verb fsck points at) it must report a consistent pair. Both
    // audit rows are graded against parity counts over the corpus.
    "q153_engine_fsck" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q153_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update()
      eng.ingest(docs) // odd half lands un-indexed
      val before = eng.fsck().withColumn("stage", lit("pre_repair"))
        .localCheckpoint(true) // audit BEFORE the repair mutates the layouts
      eng.updateIncremental()
      val after = eng.fsck().withColumn("stage", lit("post_repair"))
      before.unionByName(after).orderBy(col("stage"))
    }),

    // Backup/restore graded end-to-end (mongo_backup_restore.sh parity,
    // Engine.backup/restore over operators/Backup.scala's DistCp-shaped
    // copy): build the engine, SNAPSHOT it, then damage the live store
    // (delete a third of the corpus — searches now differ), then RESTORE
    // and search. The oracle is the q64 lifecycle-search replay over the
    // FULL corpus: it can only match if the restore brought back the
    // pre-delete store and index byte-faithfully (every file digest-checked
    // against the snapshot manifest during the copy).
    "q150_backup_restore" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q150_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      val snapped = eng.backup(s"$tmp/snapshot")
      require(snapped > 0, "q150: backup copied no files")
      // post-snapshot damage the restore must undo
      val removed = eng.delete(docs.filter(col("doc_id") % 3 === 0).select("doc_id"))
      require(removed > 0, "q150: delete removed nothing — the fixture proves nothing")
      val restored = eng.restore(s"$tmp/snapshot")
      require(restored == snapped,
        s"q150: restored $restored of $snapped snapshotted files")
      eng.search(searchTexts)
    }),

    // Search served from the PERSISTED IVF layout graded end-to-end (the
    // create_index ↔ search split of the reference, vdb.py:209-211 /
    // :88-100): update() trains the quantizer and writes the cell layout
    // hive-partitioned by cell with the index fingerprint it derives from;
    // a FRESH Engine instance (new driver state — nothing memoized) must
    // then serve search by LOADING that layout, not rebuilding it, and
    // with nprobe = nlist the probe is exhaustive, so the results must
    // hash-match the q64 brute-path lifecycle replay exactly.
    "q188_ivf_persisted_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q188_${runSeq.incrementAndGet()}_").toString
      // nlist 16 (not the config default 128): with nprobe = nlist the probe
      // is exhaustive at ANY nlist, so correctness is unchanged while the
      // driver-side Lloyd fit (10 iters × sample × nlist × dim) shrinks 8×
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16,
        ivfThreshold = 1L) // every search routes through the IVF path
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update() // builds + persists the cell layout (create_index)
      val cellRoot = new java.io.File(s"$tmp/index_ivf/cells")
      require(cellRoot.isDirectory
          && cellRoot.listFiles().exists(_.getName.startsWith("cell=")),
        "q188: update() did not persist a cell-partitioned IVF layout")
      require(new java.io.File(s"$tmp/index_ivf/_INDEX_FINGERPRINT").isFile,
        "q188: persisted layout carries no index fingerprint")
      // fresh engine = fresh driver: serves from disk (EngineSpec gates
      // that this load rewrites nothing)
      new Engine(s, cfg).search(searchTexts)
    }),

    // INCREMENTAL maintenance of the persisted IVF layout — the
    // add-to-built-index path (Milvus insert-after-create_index): after a
    // half-corpus build persists the cell layout, updateIncremental must
    // extend it by routing ONLY the new chunks to their nearest existing
    // cell (quantizer untouched — EngineSpec gates that centroids are not
    // retrained and the old cell files are not rewritten), and a FRESH
    // engine then serves the full corpus from the extended layout. With
    // nprobe = nlist the probe is exhaustive, so results hash-match the
    // full-corpus q64 replay — which only holds if every appended chunk
    // landed in the layout.
    "q190_ivf_incremental_serve" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q190_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, // q188's fixture note: exhaustive at any nlist
        ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update() // persists the half-corpus cell layout
      eng.ingest(docs) // odd half appends to the store
      val appended = eng.updateIncremental() // extends the layout in place
      require(appended > 0, "q190: incremental update appended nothing")
      new Engine(s, cfg).search(searchTexts)
    }),

    // CONFIG-SELECTED index type: the reference's index_type knob
    // (config.yml:79) switched to IVF_PQ — the engine builds and PERSISTS
    // the composed index offline (seeded coarse quantizer cells + per-cell
    // PQ codes, both hive-partitioned; the codebooks are covered by the
    // layout fingerprint through their defining parameters), and a FRESH
    // engine serves search() from it: probe nprobe of nlist cells, ADC
    // candidate cut in the compressed domain (partition-pruned codes),
    // exact cosine re-rank of the pqRerank survivors, per-doc best hit,
    // top-limit, hydration. Every stage is seeded/data-independent, so the
    // oracle replays the ENTIRE path — chunker, hash embed, cell
    // assignment, probe, encode, LUT, ADC, re-rank — in SQL.
    "q203_engine_ivfpq" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q203_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 4, // a genuinely pruned probe — the oracle replays it
        ivfThreshold = 1L, indexType = "IVF_PQ")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update() // builds + persists cells AND pq codes (create_index)
      val codesRoot = new java.io.File(s"$tmp/index_ivf/pqcodes")
      require(codesRoot.isDirectory
          && codesRoot.listFiles().exists(_.getName.startsWith("cell=")),
        "q203: update() did not persist cell-partitioned PQ codes")
      val fp = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$tmp/index_ivf/_INDEX_FINGERPRINT")), "UTF-8")
      require(fp.contains("IVF_PQ"),
        s"q203: layout fingerprint does not cover the index type: $fp")
      new Engine(s, cfg).search(searchTexts)
    }),

    // The STREAMING production loop composed end-to-end — what a deployed
    // instance of the reference actually runs (scheduler.py's periodic
    // crawl → crawler dedup-insert → vdb update → serve), here as ONE
    // graded query: a half-corpus build persists the IVF layout, then the
    // other half arrives as TWO paced micro-batches whose foreachBatch
    // runs Engine.ingest (dedup-append) + Engine.updateIncremental (embed
    // only the new docs AND extend the persisted cell layout in place —
    // never a rebuild), and finally a FRESH engine serves the full corpus
    // from the incrementally-extended on-disk index. nprobe = nlist keeps
    // the probe exhaustive, so the result must hash-match the q64
    // full-corpus replay — which holds only if every streamed batch landed
    // in the store, the index, AND the layout.
    "q197_stream_engine_lifecycle" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q197_${runSeq.incrementAndGet()}_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update() // offline create_index: persists the half-corpus layout
      stageFile(docs.filter(col("doc_id") % 4 === 1), tmp.resolve("w1"), drop, "a.parquet")
      stageFile(docs.filter(col("doc_id") % 4 === 3), tmp.resolve("w2"), drop, "b.parquet")
      s.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
        .parquet(drop.toString)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.localCheckpoint(true) // pin: ingest + incremental both read it
          eng.ingest(b)            // crawler.py:39-50 dedup-insert, set-oriented
          eng.updateIncremental()  // embed only the batch; extend the layout
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      new Engine(s, cfg).search(searchTexts) // fresh driver: serves from disk
    }),

    // index_type = IVF_SQ8 — the third config-selected serving strategy
    // (Milvus IVF_SQ8): seeded coarse cells + per-dim min/max bounds +
    // byte-range codes all persisted offline; serving probes nprobe cells
    // and scores the full-precision query against the RECONSTRUCTIONS of
    // only the probed cells' codes (asymmetric SQ8, q145's scoring — the
    // full vectors are never read at serve time). Bounds are exact
    // aggregates and the quantizer is seeded, so the oracle replays the
    // entire path.
    "q205_engine_ivfsq8" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q205_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 4, ivfThreshold = 1L, indexType = "IVF_SQ8")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      val codesRoot = new java.io.File(s"$tmp/index_ivf/sq8codes")
      require(codesRoot.isDirectory
          && codesRoot.listFiles().exists(_.getName.startsWith("cell=")),
        "q205: update() did not persist cell-partitioned SQ8 codes")
      require(new java.io.File(s"$tmp/index_ivf/sq8bounds").isDirectory,
        "q205: update() did not persist the SQ8 bounds")
      new Engine(s, cfg).search(searchTexts)
    }),

    // Engine.searchRadius graded end-to-end — the radius verb over the
    // persisted layout (faiss range_search beside the reference's top-k):
    // ivfThreshold=1 forces the IVF route, so serving goes through the
    // cell-bound-pruned rangeSearch — whose angular bound is SOUND, so the
    // output must hash-match the brute replay (the oracle knows nothing of
    // cells or bounds). Per query: every document with any chunk at
    // rounded cosine ≥ 0.3, best chunk score, qualifying-chunk count.
    "q207_engine_radius" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q207_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchRadius(searchTexts, 0.3)
    }),

    // Per-document delete at IVF scale with IN-PLACE layout maintenance:
    // delete() anti-joins only the AFFECTED cells against the delete set
    // and dynamic-partition-overwrites those directories — quantizer,
    // untouched cells and bounds all stand, and the re-stamped layout
    // serves a FRESH engine with no rebuild (EngineSpec gates the no-write
    // property; here the cells layout is required free of deleted chunks
    // before serving). Results must hash-match the survivor-corpus
    // lifecycle replay — which only holds if the maintained layout is
    // exactly the post-delete index.
    "q208_delete_maintained" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q208_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      val removed = eng.delete(docs.filter(col("doc_id") % 7 === 0).select("doc_id"))
      require(removed > 0, "q208: delete removed nothing")
      require(s.read.parquet(s"$tmp/index_ivf/cells")
          .filter(col("doc_id") % 7 === 0).count() == 0L,
        "q208: deleted chunks survived in the maintained layout")
      new Engine(s, cfg).search(searchTexts)
    }),

    // Compaction mid-lifecycle: appends fragment the store and index,
    // compact() bin-packs both — and because a compaction changes FILES,
    // never CONTENT, the engine re-stamps the persisted layout instead of
    // letting the fingerprint mismatch force a quantizer rebuild
    // (EngineSpec gates the zero-write serve). A fresh engine then serves
    // the compacted corpus; results must hash-match the full-corpus
    // lifecycle replay — which only holds if the rewrite lost and
    // duplicated nothing.
    "q209_compact_serve" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q209_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update()
      eng.ingest(docs) // odd half appends → both layouts fragment
      eng.updateIncremental()
      val (sFiles, iFiles) = eng.compact(maxRecordsPerFile = 1000000L)
      require(sFiles >= 1 && iFiles >= 1, "q209: compact did not bin-pack")
      require(java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$tmp/index_ivf/_INDEX_FINGERPRINT")),
        "q209: compaction lost the layout stamp")
      new Engine(s, cfg).search(searchTexts)
    }),

    // Filtered vector search — Milvus's `expr` parameter on
    // collection.search (the hybrid scalar-predicate + ANN verb beside the
    // reference's unfiltered vdb.py:94-100 call): ingest the corpus WITH
    // its metadata columns, index everything, then search restricted to
    // lang='en' documents. The top-4 is taken WITHIN the eligible set
    // (pre-filtering — the eligibility semi-join gates the candidates
    // before the top-k reduce; a post-filtered top-k would miss eligible
    // hits whenever an ineligible doc out-scores them, and the oracle —
    // which chunks and scores ONLY eligible docs — would catch exactly
    // that). nprobe = nlist keeps the IVF route exhaustive, so the graded
    // property is the filter semantics, not probe recall.
    "q210_filtered_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q210_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang"))
      eng.update()
      new Engine(s, cfg).searchWhere(searchTexts, col("lang") === "en")
    }),

    // Tombstone deletes — how Milvus ACTUALLY deletes (delta log + read
    // masking; bytes leave at compaction): deleteSoft appends pks with
    // ZERO store/index IO (require-pinned: the store's files are
    // byte-identical across the call), reads mask immediately, and
    // vacuumDeleted applies physically with byte-identical results. The
    // graded read runs post-soft (masked) and its hash must equal the
    // survivor replay; requires pin the no-rewrite, the idempotent
    // re-delete (0 new), the vacuum count, and post-vacuum equality.
    "q263_soft_delete" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q263_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
      eng.ingest(docs)
      def storeState(): Seq[(String, Long)] = {
        val d = new java.io.File(s"$tmp/store")
        d.listFiles().toSeq.map(f => (f.getName, f.lastModified())).sortBy(_._1)
      }
      val before = storeState()
      val doomed = docs.filter(col("lang") === "es").select("doc_id")
      val expected = doomed.count()
      require(eng.deleteSoft(doomed) == expected && expected > 0)
      require(storeState() == before, "deleteSoft must not touch a store byte")
      require(eng.deleteSoft(doomed) == 0L, "re-delete must be a no-op")
      val masked = eng.query(col("n_chars") > 300L, Seq("lang", "n_chars"),
        limit = 200).localCheckpoint(true)
      require(eng.vacuumDeleted() == expected, "vacuum must apply every tombstone")
      val after = new Engine(s, cfg).query(col("n_chars") > 300L,
        Seq("lang", "n_chars"), limit = 200)
      require(masked.collect().toSeq == after.collect().toSeq,
        "masked and vacuumed reads must be byte-identical")
      after
    }),

    // Multi-request hybrid — Milvus hybrid_search with a LIST of
    // AnnSearchRequests: three ranking families (dense vector, BM25
    // lexical, sparse tf·idf — the latter two from the same persisted
    // postings layout) fused by integer-ppm RRF. The oracle replays all
    // three rankings AND the 3-way fusion relationally.
    "q261_hybrid_multi" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q261_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).hybridSearchMulti(searchTexts)
    }),

    // Multi-vector-field collection — Milvus 2.4: TWO dense vector fields
    // per document (an 8-dim text-digest embedding + the Multimodal decode
    // stub's image embedding, both deterministic so the oracle replays
    // them), each with its OWN persisted per-field IVF layout, fused by
    // hybrid_search over per-field AnnSearchRequests (RRF, integer ppm).
    // Query vectors are corpus-derived (doc 3's text probe, doc 11's image
    // probe); nprobe = nlist makes both pools exact, so the oracle replays
    // both dense rankings and the fusion relationally.
    "q290_multi_vector" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q290_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 8, nprobe = 8, limit = 10)
      val eng = new Engine(s, cfg)
      val base = t(s, dir, "documents").select("doc_id", "text", "n_chars")
      val img = graft.operators.Multimodal.decodeFeatures(
        graft.operators.Multimodal.mediaTable(base))
        .select(col("doc_id"),
          expr("transform(feat, x -> cast(round(x * 1000) as float))").as("img_vec"))
      val docs = base.select(col("doc_id"), col("text"))
        .withColumn("text_vec", expr(
          "transform(sequence(0, 7), j -> cast(cast(conv(substr(" +
            "sha2(concat('t:', text), 256), j * 8 + 1, 8), 16, 10) as bigint) " +
            "% 1000 as float))"))
        .join(img, Seq("doc_id"))
      eng.ingest(docs)
      val e2 = new Engine(s, cfg)
      // corpus-derived probes read back from the INGESTED store (floats
      // round-trip parquet exactly) — re-deriving `docs` here would run
      // the whole decode/digest pipeline once more per probe
      val qt = e2.store().filter(col("doc_id") === 3)
        .select("text_vec").head().getSeq[Float](0)
      val qi = e2.store().filter(col("doc_id") === 11)
        .select("img_vec").head().getSeq[Float](0)
      e2.hybridSearchFields(Seq(
        Engine.AnnFieldRequest("text_vec", Seq(qt), kPool = 50),
        Engine.AnnFieldRequest("img_vec", Seq(qi), kPool = 50)))
    }),

    // WeightedRanker over multi-vector fields — Milvus's other fusion
    // (hybrid_search(reqs, WeightedRanker(0.7, 0.3))): each pool min-max
    // normalizes per query to integer basis points, the fusion is
    // sum(w_i * norm_i) DIV 10000, absent-from-pool contributes 0 — all
    // integers, so the oracle replays the ranking exactly.
    "q294_multi_vector_weighted" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q294_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 8, nprobe = 8, limit = 10)
      val eng = new Engine(s, cfg)
      val base = t(s, dir, "documents").select("doc_id", "text", "n_chars")
      val img = graft.operators.Multimodal.decodeFeatures(
        graft.operators.Multimodal.mediaTable(base))
        .select(col("doc_id"),
          expr("transform(feat, x -> cast(round(x * 1000) as float))").as("img_vec"))
      val docs = base.select(col("doc_id"), col("text"))
        .withColumn("text_vec", expr(
          "transform(sequence(0, 7), j -> cast(cast(conv(substr(" +
            "sha2(concat('t:', text), 256), j * 8 + 1, 8), 16, 10) as bigint) " +
            "% 1000 as float))"))
        .join(img, Seq("doc_id"))
      eng.ingest(docs)
      val e2 = new Engine(s, cfg)
      // probes from the ingested store — see q290
      val qt = e2.store().filter(col("doc_id") === 3)
        .select("text_vec").head().getSeq[Float](0)
      val qi = e2.store().filter(col("doc_id") === 11)
        .select("img_vec").head().getSeq[Float](0)
      e2.hybridSearchFieldsWeighted(Seq(
        Engine.AnnFieldRequest("text_vec", Seq(qt), kPool = 50),
        Engine.AnnFieldRequest("img_vec", Seq(qi), kPool = 50)),
        weightsBp = Seq(7000L, 3000L))
    }),

    // Per-request filters on multi-vector hybrid_search — each
    // AnnSearchRequest carries its OWN Milvus expr (the documented
    // request shape): the text request pools only `lang == "en"` docs,
    // the image request only `n_chars >= 300` docs, each gate applied
    // BEFORE its pool's ranking window (a filtered-out doc leaves no
    // rank hole), then the RRF fusion runs over the differently-gated
    // pools. Composes q290's per-field layouts with q272/q254's expr
    // translation; the oracle replays both gated rankings + the fusion.
    "q293_multi_vector_filtered" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q293_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 8, nprobe = 8, limit = 10)
      val eng = new Engine(s, cfg)
      val base = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
      val img = graft.operators.Multimodal.decodeFeatures(
        graft.operators.Multimodal.mediaTable(base.select("doc_id", "text", "n_chars")))
        .select(col("doc_id"),
          expr("transform(feat, x -> cast(round(x * 1000) as float))").as("img_vec"))
      val docs = base
        .withColumn("text_vec", expr(
          "transform(sequence(0, 7), j -> cast(cast(conv(substr(" +
            "sha2(concat('t:', text), 256), j * 8 + 1, 8), 16, 10) as bigint) " +
            "% 1000 as float))"))
        .join(img, Seq("doc_id"))
      eng.ingest(docs)
      val e2 = new Engine(s, cfg)
      // probes from the ingested store — see q290
      val qt = e2.store().filter(col("doc_id") === 3)
        .select("text_vec").head().getSeq[Float](0)
      val qi = e2.store().filter(col("doc_id") === 11)
        .select("img_vec").head().getSeq[Float](0)
      e2.hybridSearchFields(Seq(
        Engine.AnnFieldRequest("text_vec", Seq(qt), kPool = 50,
          expr = """lang == "en""""),
        Engine.AnnFieldRequest("img_vec", Seq(qi), kPool = 50,
          expr = "n_chars >= 300")))
    }),

    // drop_index — Milvus's drop_index verb: remove the persisted ANN
    // layout and PIN serving to the exact FLAT scan until the next
    // create_index (update()). nprobe < nlist makes the pin a REAL
    // semantic claim: probed serving is approximate, the post-drop read
    // must be exact — and the require proves no lazy rebuild resurrected
    // the layout behind the operator's back.
    "q259_drop_index" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q259_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 8, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      val ivfDir = new java.io.File(s"$tmp/index_ivf")
      require(ivfDir.exists(), "fixture: update() must persist the layout")
      eng.dropIndex()
      require(!ivfDir.exists(), "dropIndex must remove the layout")
      val res = new Engine(s, cfg).search(searchTexts).localCheckpoint(true)
      require(!ivfDir.exists(), "a post-drop search may not rebuild the layout")
      res
    }),

    // rename_collection — Milvus's rename verb as a METADATA-ONLY move:
    // store, index, and every persisted layout change roots via
    // filesystem renames; the fingerprint stamps (relative names + mtime)
    // survive, so the renamed collection serves from its existing layout
    // with zero rebuild — the requires pin both the move and the
    // untouched layout bytes across the post-rename search.
    "q260_rename_collection" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q260_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      val cfg2 = eng.renameCollection(s"$tmp/renamed_store", s"$tmp/renamed_index")
      require(!new java.io.File(s"$tmp/store").exists() &&
        new java.io.File(s"$tmp/renamed_store").exists(), "the move must be real")
      def layoutState(): Seq[(String, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$tmp/renamed_index_ivf"))
          .map(f => (f.getPath, f.lastModified())).sortBy(_._1)
      }
      val before = layoutState()
      val res = new Engine(s, cfg2).search(searchTexts).localCheckpoint(true)
      require(layoutState() == before,
        "the renamed collection must serve from the moved layout, not rebuild")
      res
    }),

    // Expr-string filtered search — Milvus's search(expr=...) parameter:
    // q210's pre-filter discipline with the predicate arriving as a raw
    // Milvus expr STRING through the q254 translator (one dialect, both
    // read verbs). The conjunction is richer than q210's so the two
    // gradings can't collapse into one.
    "q258_search_expr" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q258_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"))
      eng.update()
      new Engine(s, cfg).searchExpr(searchTexts,
        """lang in ["en", "de"] && n_chars > 250""")
    }),

    // Quantizer-health maintenance (Engine.maintain): updateIncremental
    // NEVER retrains the coarse quantizer, so a long-lived deployment's
    // layout drifts from its training population; the faiss/Milvus answer
    // is a growth-triggered offline retrain. Train on 80% of the corpus,
    // extend with the remaining 20% (growth ≈ 0.25), then drive the policy
    // through three ticks: under-threshold (0.5 — must touch nothing),
    // over-threshold (0.1 — must retrain offline and reset the baseline),
    // and again post-retrain (0.1 — must be a no-op, proving the baseline
    // reset). Serving after maintenance must hash-match the full-corpus
    // replay — retraining may move every cell boundary but never a result.
    "q211_ivf_maintain" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q211_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 5 =!= 0))
      eng.update() // trains the quantizer; stamps the training population
      eng.ingest(docs)
      eng.updateIncremental() // extends the layout — no retrain, growth accrues
      val d1 = eng.maintain(maxGrowth = 0.5).head
      require(!d1.getBoolean(3) && d1.getLong(0) < d1.getLong(1),
        s"q211: under-threshold maintain must be a no-op, got $d1")
      val d2 = new Engine(s, cfg).maintain(maxGrowth = 0.1).head
      require(d2.getBoolean(3), s"q211: over-threshold maintain must retrain, got $d2")
      val eng3 = new Engine(s, cfg)
      val d3 = eng3.maintain(maxGrowth = 0.1).head
      require(!d3.getBoolean(3) && d3.getLong(0) == d3.getLong(1),
        s"q211: retrain must reset the growth baseline, got $d3")
      eng3.search(searchTexts)
    }),

    // The predicate × verb matrix completed: filtered RADIUS search (q210
    // is the top-k cell). ivfThreshold=1 routes through the cell-bound-
    // pruned rangeSearch; the eligibility gate commutes with the (sound,
    // query-side-only) bound prune, so the output must hash-match a brute
    // replay over the eligible corpus only.
    "q213_filtered_radius" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q213_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang"))
      eng.update()
      new Engine(s, cfg).searchRadiusWhere(searchTexts, 0.3, col("lang") === "en")
    }),

    // UPSERT — Milvus's replace-by-primary-key verb, the one mutation
    // ingest's insert-if-absent cannot express: a re-crawl where 10% of
    // documents CHANGED content. The changed tenth replaces its store row
    // and its index chunks (delete's in-place layout maintenance + a
    // delta-only re-embed); identical rows are no-ops, so the immediate
    // second upsert of the same snapshot must change zero rows (the
    // crawler idempotence contract, now under mutation). Serving
    // afterwards must hash-match the lifecycle replay over the MODIFIED
    // corpus — previews included, so a stale store row or a surviving old
    // chunk both hash-fail.
    "q220_engine_upsert" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q220_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      val v2 = docs.withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(" graft updated")))
          .otherwise(col("text")))
      val changed = eng.upsert(v2)
      require(changed == docs.filter(col("doc_id") % 10 === 0).count(),
        s"q220: upsert changed $changed rows, expected the modified tenth")
      require(eng.upsert(v2) == 0L,
        "q220: re-upserting the same snapshot must be a no-op")
      new Engine(s, cfg).search(searchTexts)
    }),

    // Scalar retrieval — Milvus's query(expr, output_fields, limit, offset)
    // verb, the no-vector half of the read API: filtered field retrieval
    // with pk-ordered paging. The predicate and the 4-column projection
    // both reach the parquet scan (PushedFilters / ReadSchema — EngineSpec
    // plan-gates it), and the page is a distributed top-(offset+limit),
    // never a global sort. The oracle is the literal SQL spelling.
    "q221_engine_query" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q221_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents"))
      eng.query(col("lang") === "en" && col("n_chars") > 200,
        Seq("lang", "n_chars", "source"), limit = 100, offset = 10)
    }),

    // Batched retrieval — Milvus's query_iterator: the FULL result of a
    // filter delivered in pk-ordered keyset pages (doc_id > cursor, each
    // page an independent pushed-filter top-batch — a drain costs O(n)
    // total IO where offset paging costs O(n²/batch); after compact()'s
    // range-clustering the cursor skips whole files via footer min/max).
    // Graded on the seam property: the concatenation of every page must
    // hash-match the one-shot filter — a duplicated or dropped row at any
    // page boundary fails. The runtime require pins that it actually paged.
    "q222_query_iterator" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q222_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents")
      eng.ingest(docs)
      val pages = eng.queryIterator(col("lang") === "en",
        Seq("n_chars", "source"), batchSize = 128).toSeq
      val n = docs.filter(col("lang") === "en").count()
      require(pages.length == ((n + 127) / 128).toInt,
        s"q222: ${pages.length} pages for $n rows at batch 128")
      pages.reduce(_.unionAll(_))
    }),

    // query_iterator(expr=...) — the expr-string spelling of q222's drain:
    // the raw Milvus filter (an in-list composed with a chained range)
    // translates once and the keyset drain reassembles the one-shot
    // filtered set exactly; the require pins that it actually paged.
    "q285_retrieve_iterator" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q285_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents")
      eng.ingest(docs)
      val pages = new Engine(s, cfg).retrieveIterator(
        """lang in ["en", "de"] && 150 <= n_chars < 700""",
        Seq("lang", "n_chars"), batchSize = 128).toSeq
      require(pages.length >= 2, s"q285 must page: got ${pages.length} pages")
      pages.reduce(_.unionAll(_))
    }),

    // A real transformer forward through the embedding seam — the one
    // reference component that had only ever been staged (embed.py:21-49
    // tokenize → forward → masked mean-pool → normalize). The GRAFT-ATTN
    // checkpoint (six tensors: position embeddings, input projection,
    // Wq/Wk/Wv attention, FFN) loads once per executor JVM; documents AND
    // queries flow through VectorFns.embedPartitions' 128-row batches;
    // the index is built from attention outputs and served. The oracle
    // replays tokenize → h=We·c+pos → scaled-dot-product attention with
    // piecewise-linear-exp2 softmax → relu FFN → masked mean-pool →
    // float-normalize → cosine top-k → hydration, bit-for-bit (all ops
    // IEEE-exact, fixed accumulation order).
    "q286_transformer_embed" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q286_${runSeq.incrementAndGet()}_").toString
      val mpath = s"$tmp/model.ckpt"
      graft.functions.FileEmbedder.saveAttn(mpath, q286Model)
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg, graft.functions.FileEmbedder(mpath))
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      eng.search(searchTexts)
    }),

    // The ARCHITECTURE-COMPLETE model seam: q286's lifecycle under the
    // GRAFT-ATTN 2 checkpoint — 2 attention heads × 2 stacked post-LN
    // encoder blocks (multi-head scaled-dot-product attention, Wo head
    // mix, residual adds, IEEE-exact layernorm, relu FFN), closing the
    // structural distance to embed.py:21-39's multi-head/multi-layer/
    // layernormed encoder. Every op stays bit-reproducible (power-of-two
    // divisors, piecewise-linear-exp2 softmax, fixed accumulation order),
    // so the oracle replays the ENTIRE 2-block forward — plus chunking,
    // pooling, normalize, cosine top-k, hydration — hash-exactly.
    "q292_transformer_deep" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q292_${runSeq.incrementAndGet()}_").toString
      val mpath = s"$tmp/model.ckpt"
      graft.functions.FileEmbedder.saveAttn2(mpath, q292Model)
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg, graft.functions.FileEmbedder(mpath))
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      eng.search(searchTexts)
    }),

    // Milvus 2.6 nullable-field expr corners: IS NULL / IS NOT NULL /
    // NOT LIKE over DYNAMIC fields, in one raw expr string. `lang` is
    // nulled for 'de' docs before a dynamic ingest (to_json drops null
    // producers, so the key is ABSENT — Milvus's own null spelling for
    // dynamic fields); `src_detail` exists on every fifth doc. The
    // graded arms: presence-as-null, IS NOT NULL composed in a
    // conjunction, and NOT LIKE's three-valued logic (a NULL lang must
    // NOT satisfy `not like "e%"` — NULL, not true, exactly SQL's and
    // Milvus's contract).
    "q287_null_expr" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q287_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
        .withColumn("lang",
          when(col("lang") === "de", lit(null: String)).otherwise(col("lang")))
        .withColumn("src_detail",
          when(col("doc_id") % 5 === 0, concat(lit("d"), col("doc_id"))))
      eng.ingestDynamic(docs)
      new Engine(s, cfg).retrieve(
        """(lang is null and n_chars >= 300) or (src_detail is not null and lang not like "e%")""",
        Seq(Engine.DynamicField), limit = 200)
    }),

    // Filtered counting — Milvus's documented counting verb,
    // query(expr, output_fields=["count(*)"]): the count of matching
    // servable rows with no row materialization. Four probes through ONE
    // collection: match-all (footer row counts — no column read), a
    // physical declared column, a dynamic field (numeric compare through
    // the $meta JSON hop), and an explicit JSON-path access with an
    // in-list. The oracle replays each translated predicate as a plain
    // COUNT; EngineSpec gates the no-data-column plan claim.
    "q291_filtered_count" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q291_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingestDynamic(
        t(s, dir, "documents").select("doc_id", "text", "lang", "source", "n_chars"),
        declared = Seq("lang"))
      val e2 = new Engine(s, cfg)
      Seq(
        "all" -> "",
        "dynamic" -> "n_chars > 400",
        "jsonpath" -> """$meta["source"] in ["src3", "src7"]""",
        "physical" -> """lang == "en" || lang like "d%"""")
        .map { case (nm, e) =>
          e2.queryCountDf(e).select(lit(nm).as("probe"), col("`count(*)`").as("cnt"))
        }.reduce(_ unionByName _).orderBy("probe")
    }),

    // Tenant removal — Milvus's drop_partition over a partition_key
    // collection: the named tenants leave the store (pushed-predicate
    // rewrite, no join), the index (their hive directories are REMOVED —
    // a metadata operation; no other tenant's file is read or rewritten,
    // EngineSpec gates mtimes) and the persisted IVF layout (pruned in
    // place, affected cells only — no rebuild). Re-dropping is a no-op.
    // Serving afterwards must hash-match the lifecycle replay over the
    // surviving tenants.
    "q223_drop_partition" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q223_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        partitionKey = "source", nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "source")
      eng.ingest(docs)
      eng.update() // persists + stamps the IVF layout (exhaustive probe ⇒ exact)
      val gone = Seq("src3", "src7")
      val removed = eng.dropPartition(gone)
      require(removed == docs.filter(col("source").isin(gone: _*)).count(),
        s"q223: dropPartition removed $removed rows")
      require(eng.dropPartition(gone) == 0L, "q223: re-drop must be a no-op")
      new Engine(s, cfg).search(searchTexts)
    }),

    // Point hydration — Milvus's get(ids, output_fields): the pk-list
    // special case of the scalar read API. The id list is a pushed In
    // filter; on a compacted range-clustered store a point get opens O(1)
    // files. The oracle is the literal IN-list SQL.
    "q224_engine_get" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q224_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents"))
      eng.get(Seq(5L, 42L, 137L, 400L), Seq("lang", "source", "n_chars"))
    }),

    // Collection metadata — Milvus's describe_collection + num_entities:
    // the one-row stats frame a deployment's dashboards poll. Counts are
    // footer-sized scans; layout_current must read TRUE from a FRESH
    // engine (the fingerprint rides the persisted layout, not the JVM).
    // The oracle recomputes both counts (docs; chunker-replay chunks) and
    // pins the config constants.
    "q225_engine_describe" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q225_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).describe()
    }),

    // Two-stage retrieval — the cross-encoder RERANK step (Milvus 2.4's
    // search Function/rerank hook): vector recall pools top-20 docs per
    // query through the IVF layout, only those texts hydrate, and the
    // batched CrossScorer reads each (query, text) PAIR — here the
    // deterministic lexical-overlap scorer in basis points, so the oracle
    // replays recall, hydration, pair scoring and the final
    // (ce, vec, pk) order hash-exactly. A doc with rank-20 vector recall
    // but top lexical overlap must surface — that reordering is the
    // graded contract.
    "q226_search_rerank" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q226_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchRerank(searchTexts, kPool = 20)
    }),

    // Full-ranking drain — Milvus's search_iterator, the vector sibling of
    // q222's scalar keyset iterator: ONE corpus scoring pass (the per-doc
    // best-score frame pins once), then (score desc, pk asc)-keyset pages
    // that never re-rank their prefix (offset paging pays O(p·batch) at
    // page p; the drain here is O(n) after the single scoring pass). Ranks
    // stay ABSOLUTE across pages, so the concatenation of every page must
    // hash-match the one-shot full ranking the oracle computes — a
    // duplicated, dropped or re-ordered row at any page seam fails, as
    // does any tie (rounded scores tie constantly) broken differently.
    "q227_search_iterator" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q227_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      // page size scales with the corpus so the drain is 4 pages at EVERY
      // scale factor — the seam property is exercised everywhere and the
      // per-page fixed costs don't balloon the query at sf0.1
      val batch = math.max(1L, (t(s, dir, "documents").count() + 3) / 4).toInt
      val pages = new Engine(s, cfg)
        .searchIterator(searchTexts.head, batchSize = batch).toSeq
      val total = pages.map(_.count()).sum
      require(pages.length == ((total + batch - 1) / batch).toInt,
        s"q227: ${pages.length} pages for $total ranked docs at batch $batch")
      require(pages.length >= 2, s"q227: ${pages.length} page(s) — the drain never paged")
      pages.reduce(_.unionAll(_))
    }),

    // STREAMING UPSERT — the scheduler's daily re-crawl IS an upsert
    // stream (scheduler.py:21-33 + crawler.py:39-50: re-fetched documents
    // whose content changed must replace): a CDC micro-batch of modified
    // documents flows through Engine.upsert under foreachBatch, and the
    // SAME batch re-delivered (Spark's foreachBatch is at-least-once after
    // a failure) must settle to the one-shot result — the digest-keyed
    // change detection makes redelivery a 0-row no-op, the idempotence
    // batch sinks need. Serving afterwards must hash-match the lifecycle
    // replay over the MUTATED corpus — scores AND previews re-derive from
    // the new text, so a stale store row, a surviving old chunk, or a
    // double-applied update all hash-fail.
    "q228_stream_upsert" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q228_${runSeq.incrementAndGet()}_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update() // the standing corpus serves; CDC arrives as a stream
      val cdc = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" graft cdc")))
      stageFile(cdc, tmp.resolve("w1"), drop, "a.parquet")
      stageFile(cdc, tmp.resolve("w2"), drop, "b.parquet") // re-delivery, byte-identical
      val changed = scala.collection.mutable.ArrayBuffer.empty[Long]
      s.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
        .parquet(drop.toString)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          changed += eng.upsert(batch.localCheckpoint(true))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      require(changed.length == 2, s"q228: expected 2 micro-batches, saw $changed")
      require(changed(0) == cdc.count(),
        s"q228: first CDC batch changed ${changed(0)} rows, expected the modified tenth")
      require(changed(1) == 0L,
        s"q228: the re-delivered batch changed ${changed(1)} rows — not idempotent")
      new Engine(s, cfg).search(searchTexts) // fresh driver: serves from disk
    }),

    // The checkpoint-file model seam over an ARBITRARY topology: q156
    // proved a linear layer round-trips the file; this loads a TWO-layer
    // MLP (8×8 relu → 8×8 linear) whose layer count, widths and activation
    // tags all live in the checkpoint, not the code — the shape a real
    // ONNX graph has. Both documents and queries flow through the loaded
    // stack; the oracle re-derives the same weight literals from the seeds
    // (pure function) and replays counts → W₁·c → relu → W₂·h →
    // float-normalize → cosine top-k → hydration relationally.
    "q229_mlp_checkpoint" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q229_${runSeq.incrementAndGet()}_").toString
      val mpath = s"$tmp/model.ckpt"
      graft.functions.FileEmbedder.saveMlp(mpath, q229Model)
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg, graft.functions.FileEmbedder(mpath))
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      eng.search(searchTexts)
    }),

    // COLLECTION ALIAS — Milvus's create_alias / alter_alias, the verb a
    // production deployment actually flips for blue/green (q219 flips
    // configs by hand; this grades the pointer): v1 (hash model) serves
    // through the alias, v2 (checkpoint model, NEW index path) builds
    // offline, then ONE atomic alias write cuts over — the final serving
    // must hash-match the checkpoint model's lifecycle replay, which holds
    // only if the alias resolution really re-points (a cached or torn
    // pointer would keep serving v1's hash-model ranking).
    "q230_alias_swap" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q230_${runSeq.incrementAndGet()}_").toString
      val alias = s"$tmp/collection.alias"
      val v1 = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/i1")
      val e1 = new Engine(s, v1)
      e1.ingest(t(s, dir, "documents").select("doc_id", "text"))
      e1.update()
      Engine.writeAlias(s, alias, v1) // create_alias
      require(Engine.forAlias(s, alias).search(searchTexts).count() > 0,
        "q230: the alias must serve v1 before the cutover")
      val mpath = s"$tmp/model.ckpt"
      graft.functions.FileEmbedder.save(mpath, q156Model)
      val v2 = v1.copy(indexPath = s"$tmp/i2", modelPath = mpath)
      new Engine(s, v2).update() // offline re-embed; the alias still names v1
      Engine.writeAlias(s, alias, v2) // alter_alias: the atomic cutover
      Engine.forAlias(s, alias).search(searchTexts)
    }),

    // Per-tenant stats — Milvus's get_partition_stats over a partition_key
    // collection: one row per tenant with document and chunk counts. Both
    // counts group on the partition column only, answered from directory
    // names + parquet footer row counts — no data column read (the verb a
    // tenancy dashboard polls at any corpus size). The oracle replays the
    // doc counts and the chunker's per-doc chunk-count formula.
    "q231_partition_stats" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q231_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        partitionKey = "source")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "source"))
      eng.update()
      new Engine(s, cfg).describePartitions()
    }),

    // Weighted fusion — Milvus 2.4 hybrid_search's WeightedRanker (the
    // alternative to q212's RRFRanker): pooled scores min-max normalize to
    // [0, 10000] bp per query, fuse at 7000 lexical / 3000 vector, top-4
    // hydrates. Asymmetric weights are part of the graded contract — a doc
    // with strong lexical but weak vector evidence must outrank the
    // converse, which RRF (rank-only) cannot express.
    "q232_weighted_fusion" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q232_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).hybridSearchWeighted(searchTexts, wLexBp = 7000L, wVecBp = 3000L)
    }),

    // TTL'd documents — Milvus's collection TTL (collection.ttl.seconds),
    // graded on three properties in one lifecycle: (a) moving the horizon
    // hides expired rows from search AND query instantly, with zero data
    // IO (logical expiry — a stamp write); (b) vacuumExpired physically
    // removes exactly those rows, riding delete's copy-on-write + in-place
    // layout maintenance; (c) serving before and after the vacuum is
    // byte-identical — the oracle replays the lifecycle over the LIVE
    // documents only, so a leaked expired doc, a lost live doc, or a
    // rank perturbed by the vacuum all hash-fail.
    "q233_ttl_expiry" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q233_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L, ttlField = "ts")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("ts", col("doc_id") % 100)) // synthetic event time
      eng.update()
      eng.expireBefore(50)
      require(eng.query(col("ts") < 50).count() == 0,
        "q233: query() served expired rows after the horizon moved")
      val logical = new Engine(s, cfg).search(searchTexts).collect().toSeq
      val removed = eng.vacuumExpired()
      require(removed > 0, "q233: the vacuum removed nothing")
      require(eng.vacuumExpired() == 0L, "q233: the vacuum is not idempotent")
      val served = new Engine(s, cfg).search(searchTexts)
      require(served.collect().toSeq == logical,
        "q233: serving changed across the physical vacuum")
      served
    }),

    // Bulk import — Milvus's do_bulk_insert (the restore-side sibling of
    // mongo_backup_restore.sh): a staging DIRECTORY ingested atomically.
    // Graded end-to-end: a POISONED staging dir (duplicate pks) commits
    // NOTHING and quarantines the rejects with reasons; a clean one
    // commits exactly once via metadata renames; the retry (the crash-
    // recovery path) imports zero rows; and the imported corpus serves
    // hash-identically to the ingested one — the all-or-nothing contract
    // as a graded row.
    "q234_bulk_import" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q234_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      docs.filter(col("doc_id") % 7 === 0)
        .union(docs.filter(col("doc_id") % 14 === 0)) // duplicated pks
        .write.parquet(s"$tmp/stage_bad")
      val poisoned =
        try { eng.bulkImport(s"$tmp/stage_bad", s"$tmp/quarantine"); false }
        catch { case _: IllegalArgumentException => true }
      require(poisoned, "q234: a poisoned staging dir must reject")
      require(!new java.io.File(s"$tmp/store").exists(),
        "q234: a poisoned import committed rows")
      require(s.read.parquet(s"$tmp/quarantine").count() > 0,
        "q234: rejects were not quarantined")
      docs.write.parquet(s"$tmp/stage_ok")
      require(eng.bulkImport(s"$tmp/stage_ok") == docs.count(),
        "q234: the clean import row count is wrong")
      require(eng.bulkImport(s"$tmp/stage_ok") == 0L,
        "q234: the idempotent retry re-imported rows")
      eng.update()
      new Engine(s, cfg).search(searchTexts)
    }),

    // Read-consistency levels — Milvus's consistency_level over this
    // engine's store→index lag: after the store moves (a second ingest
    // wave with no update tick), an Eventually read must serve the stamped
    // layout AS-IS (the runtime require pins it equal to the pre-move
    // serving, byte for byte), and a Strong read must read its writes —
    // the graded output, which the oracle replays over the FULL corpus.
    // A Strong read that misses the fresh documents, or one that rebuilt
    // instead of delta-extending (the require on the changed-chunk count),
    // hash-fails.
    "q235_read_consistency" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q235_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update()
      val stale = eng.search(searchTexts).collect().toSeq
      eng.ingest(docs.filter(col("doc_id") % 2 === 1)) // store moves, index lags
      require(new Engine(s, cfg).searchAt(searchTexts, "Eventually")
          .collect().toSeq == stale,
        "q235: an Eventually read must serve the stamped layout as-is")
      new Engine(s, cfg).searchAt(searchTexts, "Strong")
    }),

    // output_fields on search — Milvus's caller-chosen hydration
    // projection: the ranked hits hydrate NAMED store columns instead of
    // the text preview (EngineSpec gates that only those columns reach the
    // hydration scan's ReadSchema — on 100 TB, metadata hydration must
    // never read the text bytes). Ranking is byte-identical to q64's; the
    // oracle swaps the projection in the same replay.
    "q236_search_fields" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q236_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars"))
      eng.update()
      new Engine(s, cfg).searchFields(searchTexts, Seq("lang", "source", "n_chars"))
    }),

    // Annulus search — Milvus's radius + range_filter pair: chunks scoring
    // in [0.05, 0.3) qualify; per-doc best + census. The near-duplicate
    // review-queue shape: "similar but not identical" (the upper cut
    // excludes what q207's plain radius would rank first). The lower bound
    // still prunes through the IVF cell bounds; the upper cut is exact on
    // returned scores.
    "q237_annulus_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q237_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchRange(searchTexts, 0.05, 0.3)
    }),

    // Sparse-vector search — Milvus 2.4's SPARSE_INVERTED_INDEX: documents
    // and queries as sparse vectors over the token space (v(t) = tf·idf,
    // the deterministic stand-in for a learned sparse encoder), scored by
    // integral inner product and SERVED FROM THE SAME persisted postings
    // layout hybrid's BM25 uses — bucket PartitionFilters prune the scan
    // to the query's terms, so the plan scales with matched postings,
    // never the corpus. The oracle replays tokenize → tf → df → log2-idf →
    // Σ qtf·tf·(idf² DIV 10⁴) → top-4 relationally.
    "q238_sparse_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q238_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchSparse(searchTexts)
    }),

    // Full-text highlight — Milvus 2.6's highlight over BM25/sparse
    // results: q238's ranking plus a per-QUERY snippet (each query's own
    // terms wrap <em>…</em> in its previews; a batch must not highlight a
    // sibling query's terms). The oracle joins a per-query pattern table
    // and replays the identical word-bounded regex.
    "q277_sparse_highlight" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q277_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchSparseHighlight(searchTexts)
    }),

    // Binary-quantization serving — Milvus 2.6's RaBitQ index shape: the
    // engine persists 1-bit sign codes beside the IVF layout (32×
    // compression), serves the candidate cut by Hamming distance
    // (xor+popcount over packed longs), and exact-refines the top-20
    // survivors against the full vectors. nprobe = nlist here so the
    // oracle replays the global Hamming cut without the centroid CTEs;
    // cell pruning itself is q24/q188's graded property.
    "q248_engine_rabitq" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q248_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L, indexType = "IVF_RABITQ")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).search(searchTexts)
    }),

    // Analyzer configuration — Milvus 2.5's analyzer_params on the lexical
    // layer: the "english" analyzer filters stopwords on BOTH sides
    // (document tokenization at layout build, query tokenization at serve),
    // so 'the'/'a'/'with' — tokens with ~75% df in this corpus — can
    // neither dilute idf nor hold rank slots. The oracle replays the
    // sparse scoring with the same 33-word Lucene stoplist; a layout or
    // query side that keeps stopwords hash-fails.
    "q247_analyzer" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q247_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        analyzer = "english")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      new Engine(s, cfg).searchSparse(analyzerTexts, k = 8)
    }),

    // Stemming analyzer — the english_stem arm (Lucene's minimal English
    // plural stemmer after the stoplist): plural query terms must match
    // singular corpus tokens, and planted plural DOC tokens (every 5th
    // doc gains " tables queries") must merge into the singular postings
    // — one analyzer on both sides or df/tf/rank all drift. `queries`
    // exercises the ies→y rewrite on the query side AND the doc side.
    "q276_analyzer_stem" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q276_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        analyzer = "english_stem")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" tables queries")))
            .otherwise(col("text")))
      eng.ingest(docs)
      new Engine(s, cfg).searchSparse(stemTexts, k = 8)
    }),

    // FULL Snowball (Porter2) stemmer — Milvus analyzer_params' `stemmer`
    // filter at its real strength: derivational forms. Every fifth doc
    // gains ' relational generously'; under english_porter the query term
    // 'relate' and the corpus token 'relational' both stem to 'relat'
    // (and 'generous'/'generously' to 'generous') — matches the minimal
    // english_stem arm can NEVER make (it only strips plurals), so the
    // two analyzer arms provably diverge on both the index and the query
    // side. The oracle replays the full six-step algorithm as a per-step
    // CTE chain (Porter2.sqlCtes) over the same tokenization.
    "q288_porter_stem" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q288_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        analyzer = "english_porter")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" relational generously")))
            .otherwise(col("text")))
      eng.ingest(docs)
      new Engine(s, cfg).searchSparse(porterTexts, k = 8)
    }),

    // Porter2 on the EXPR route — the two-routes-agree contract (q280's
    // pattern) for the full stemmer: TEXT_MATCH inside a raw filter expr
    // must analyze BOTH sides with english_porter (query terms stem
    // driver-side; field tokens through the registered porter_stem UDF in
    // the translated SQL), so 'relate' in the expr finds docs whose text
    // says 'relational' — composed with a scalar arm under && precedence.
    "q289_expr_match_porter" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q289_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        analyzer = "english_porter")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "n_chars")
        .withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" relational generously")))
            .otherwise(col("text")))
      eng.ingest(docs)
      new Engine(s, cfg).retrieve(
        """TEXT_MATCH(text, "relate generous") && n_chars > 100""",
        Seq("n_chars"), limit = 150)
    }),

    // Length token filter — Milvus's analyzer_params `length` filter as
    // the config suffix `|len:<min>:<max>`, applied after the stoplist on
    // BOTH sides: 3-letter query terms ('dup', 'big') drop, and
    // out-of-range corpus tokens leave the postings entirely (df, dl and
    // rank slots all shift — one analyzer on both sides or they drift).
    // The oracle replays the same filter order: stop → len.
    "q282_analyzer_len" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q282_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        analyzer = "english|len:4:24")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      new Engine(s, cfg).searchSparse(lenTexts, k = 8)
    }),

    // group_size > 1 — Milvus 2.4.1's grouping-search depth knob: the top
    // 4 SOURCES per query still rank by their leader (best doc), but each
    // group now surfaces its top-3 documents; the flattened rank runs
    // (group order, within-group order). Group attribution rides the
    // partition-keyed index (q218's zero-join property, unchanged).
    "q239_grouped_size" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q239_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L, partitionKey = "source")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "source"))
      eng.update()
      new Engine(s, cfg).searchGrouped(searchTexts, "source", groupSize = 3)
    }),

    // strict_group_size = false — Milvus 2.4.1's OWN default for grouping
    // search: members come only from the global top-(limit × group_size)
    // candidate pool (here 12), so a surfaced source whose deeper docs
    // rank below the pool returns fewer than 3 rows. Group leaders (and
    // group order) are identical to q239's strict mode — only the member
    // depth differs. The oracle inserts the pool cap between the per-doc
    // ranking and the group window.
    "q269_grouped_loose" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q269_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L, partitionKey = "source")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "source"))
      eng.update()
      new Engine(s, cfg).searchGrouped(searchTexts, "source", groupSize = 3,
        strict = false)
    }),

    // Growing-segment search — Milvus's DEFAULT read path (ignore_growing
    // = false): after the store moves under a stamped index, sealed
    // documents serve through the persisted layout while the fresh wave is
    // brute-force scored on the fly from exactly the uncovered store files
    // (the sealed manifest) and merged into one ranking. Unlike q235's
    // Strong read, NOTHING is written — the runtime require pins that the
    // growing documents never entered the index; the oracle still replays
    // the FULL corpus, so a read that misses the fresh wave (or leaks a
    // sealed doc twice) hash-fails.
    "q240_growing_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q240_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 5 =!= 0))
      eng.update()
      eng.ingest(docs.filter(col("doc_id") % 5 === 0)) // store moves, index lags
      val served = new Engine(s, cfg)
      val res = served.searchGrowing(searchTexts)
      require(served.index()
          .join(docs.filter(col("doc_id") % 5 === 0), Seq("doc_id"), "left_semi")
          .count() == 0,
        "q240: a growing doc entered the index — the read path wrote")
      res
    }),

    // Schema evolution — Milvus 2.5's add_collection_field: a scalar field
    // added to a LIVE collection without rewriting a byte (one registry
    // line; at 100 TB an eager backfill is a full copy-on-write for a
    // constant). Rows ingested before the add read back as the default —
    // filled lazily at scan time — while a post-add ingest carries its own
    // values; a filter over the added field sees both populations in one
    // predicate. The fresh Engine proves the registry travels with the
    // store, not with a driver's memory.
    "q241_add_field" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q241_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      eng.ingest(docs.filter(col("doc_id") % 3 =!= 0)) // v1 schema
      eng.addField("quality", "long", "5")
      eng.ingest(docs.filter(col("doc_id") % 3 === 0) // v2 carries the field
        .withColumn("quality", col("doc_id") % 10))
      new Engine(s, cfg)
        .query(col("quality") >= 4, Seq("quality", "lang"), limit = 200)
    }),

    // TEXT_MATCH filtered search — Milvus 2.5's keyword filter inside a
    // search expr, OR semantics over the analyzer's tokens. Eligibility
    // comes from the PERSISTED inverted layout (term-bucket
    // PartitionFilters — postings volume, never a corpus text scan), and
    // the vector ranking runs within it (pre-filter, never a post-hoc
    // cut). 'dup' is a rare token (~5% df); 'nosuchtoken' exercises the
    // empty-postings term of the OR.
    "q242_text_match" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q242_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchTextMatch(searchTexts, "dup nosuchtoken")
    }),

    // Search highlight — Milvus 2.6's highlight over text-match results:
    // q242's eligibility + ranking, plus a snippet column wrapping every
    // matched-term occurrence in the preview with <em>…</em>. The
    // highlight is a k-row projection (result rows only), and the oracle
    // replays the identical word-bounded case-insensitive regex.
    "q273_search_highlight" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q273_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      val res = new Engine(s, cfg)
        .searchTextMatchHighlight(searchTexts, "dup nosuchtoken")
      require(res.filter(col("snippet").contains("<em>dup</em>")).count() > 0,
        "no highlighted occurrence in any snippet — the match terms must appear")
      res
    }),

    // PHRASE_MATCH filtered search — Milvus 2.5's positional keyword
    // filter: only docs where the phrase tokens appear CONSECUTIVELY are
    // eligible (slop 0). Candidates come conjunctively from the postings
    // layout (bucket-pruned); adjacency verifies over ONLY the candidate
    // docs' text. The oracle replays adjacency as a space-normalized
    // substring match — a candidate with both tokens non-adjacent leaking
    // through hash-fails.
    "q246_phrase_match" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q246_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).searchPhraseMatch(searchTexts, "table value")
    }),

    // ARRAY scalar field — Milvus's ARRAY field type with its filter
    // verbs: array_contains, array_contains_any (arrays_overlap), and
    // array_length (size) compose in one pushed predicate over an
    // array-typed store column; the projection returns scalars only. The
    // fresh Engine proves the array column round-trips the store layout.
    "q243_array_field" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q243_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
        .withColumn("tags",
          array(col("lang"), col("source"),
            concat(lit("len_"), (length(col("text")) % 10).cast("string"))))
      eng.ingest(docs)
      new Engine(s, cfg).query(
        array_contains(col("tags"), "en") &&
          arrays_overlap(col("tags"), array(lit("len_3"), lit("len_7"))) &&
          size(col("tags")) === 3,
        Seq("lang", "source"), limit = 150)
    }),

    // JSON field — Milvus's JSON field type: a JSON document column
    // ingested as data, filtered by JSON-path extraction (Milvus
    // `meta["lang"] == "en" and meta["n_chars"] > 500` exprs). The engine
    // genuinely parses the JSON at read time (get_json_object); the
    // oracle replays the filter from the base columns the JSON was built
    // from, so a path-extraction bug hash-fails.
    "q244_json_field" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q244_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
        .withColumn("meta", format_string(
          """{"lang":"%s","n_chars":%d}""", col("lang"), col("n_chars")))
      eng.ingest(docs.select("doc_id", "text", "meta"))
      new Engine(s, cfg).query(
        get_json_object(col("meta"), "$.lang") === "en" &&
          get_json_object(col("meta"), "$.n_chars").cast("long") > 500L,
        Seq("meta"), limit = 150)
    }),

    // JSON path index — Milvus 2.6's JSON field index: a persisted
    // value→doc_id layout over one JSON path serves the equality filter
    // with directory pruning + a doc_id semi-join, never a per-row JSON
    // parse (q244 is the unindexed sibling). The fresh Engine proves the
    // layout is discovered (and staleness-checked) from disk.
    "q249_json_index" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q249_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
        .withColumn("meta", format_string(
          """{"lang":"%s","n_chars":%d}""", col("lang"), col("n_chars")))
      eng.ingest(docs.select("doc_id", "text", "meta"))
      new Engine(s, cfg)
        .queryJsonIndexed("meta", "$.lang", "es", Seq("meta"), limit = 150)
    }),

    // Scalar index RANGE lookup — Milvus's INVERTED scalar index serves
    // ranges like the JSON index does (q281): the same equi-depth range
    // sibling + persisted boundaries, built beside q253's equality
    // postings; here an inclusive-low/strict-high band over n_chars.
    "q284_scalar_range" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q284_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"))
      new Engine(s, cfg).queryScalarIndexedRange("n_chars",
        lo = Some(200.0), hi = Some(450.0), hiInclusive = false,
        outputFields = Seq("lang", "n_chars"), limit = 150)
    }),

    // LIKE over a JSON path — the expr dialect's remaining documented
    // corner (round-11 verdict #3): `meta["url"] like "%/src3/%"`
    // translates to get_json_object(..) LIKE (the extraction yields the
    // string the pattern tests) and composes with a scalar arm. The url
    // packs source + doc_id so the pattern is selective but non-trivial
    // at every scale (~5% of docs).
    "q283_expr_json_like" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q283_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "source", "n_chars")
        .withColumn("meta", format_string(
          """{"n_chars":%d,"url":"https://data.example/%s/%d"}""",
          col("n_chars"), col("source"), col("doc_id")))
        .select("doc_id", "text", "meta")
      eng.ingest(docs)
      new Engine(s, cfg).retrieve(
        """meta["url"] like "%/src3/%" && meta["n_chars"] > 300""",
        Seq("meta"), limit = 150)
    }),

    // JSON path index RANGE lookup — Milvus 2.6's JSON index serves range
    // predicates too: `meta["stars"] > 100 and <= 300` maps to a
    // contiguous interval of equi-depth range buckets driver-side
    // (directory pruning on the numeric sibling layout; boundaries are
    // persisted quantizer state), with the residual bound pushed into the
    // pruned scan. The fresh Engine proves layout + boundaries are
    // discovered from disk; EngineSpec gates the pruning and the
    // unindexed-filter equivalence. stars = (doc_id·37) % 500 — uniform,
    // the strict-low/inclusive-high range keeps ~40% at every scale.
    "q281_json_range" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q281_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "n_chars")
        .withColumn("stars", (col("doc_id") * 37 % 500).cast("int"))
      eng.ingestDynamic(docs)
      new Engine(s, cfg).queryJsonIndexedRange(
        Engine.DynamicField, "$.stars",
        lo = Some(100.0), hi = Some(300.0), loInclusive = false,
        outputFields = Seq(Engine.DynamicField), limit = 150)
    }),

    // Predicate deletion — Milvus's delete(expr) form: the doomed set is
    // named by a filter, not an id list (the GDPR/re-crawl shape: "drop
    // everything from this source"). The graded read is a post-delete
    // scan through a FRESH engine, so the store rewrite itself is what's
    // hash-checked: the oracle replays the surviving population from the
    // raw corpus. The removed-count require pins the resolve step.
    "q250_delete_expr" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q250_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
      eng.ingest(docs)
      val expected = docs.filter(col("lang") === "de").count()
      val removed = eng.deleteWhere(col("lang") === "de")
      require(removed == expected && removed > 0,
        s"deleteWhere removed $removed, expected $expected")
      new Engine(s, cfg).query(col("n_chars") > 300L, Seq("lang", "n_chars"),
        limit = 200)
    }),

    // Dynamic field — Milvus's enable_dynamic_field: lang/source/n_chars
    // arrive UNDECLARED and pack into the hidden $meta JSON column at the
    // door (name-sorted, so the payload bytes are producer-order-free);
    // the filter reads them back through dyn() path extraction. The
    // oracle replays both the packing (printf over the base columns in
    // sorted-name order) and the filter — a packing or extraction bug
    // hash-fails.
    "q251_dynamic_field" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q251_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingestDynamic(
        t(s, dir, "documents").select("doc_id", "text", "lang", "source", "n_chars"))
      val e2 = new Engine(s, cfg)
      e2.query(
        e2.dyn("lang") === "en" && e2.dyn("n_chars").cast("long") > 400L,
        Seq(Engine.DynamicField), limit = 150)
    }),

    // Decay reranking — Milvus 2.6's linear decay ranker: vector
    // relevance × a freshness factor from a numeric field (n_chars plays
    // the recency column; the math is identical). Applied to the FULL
    // per-doc candidate pool, so freshness can promote docs from outside
    // the vector top-k. The oracle replays chunk/embed/score, then the
    // decay arithmetic (pure +,−,×,÷ — bit-exact in both engines) and
    // the re-ranked top-4.
    "q252_decay_rerank" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q252_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "n_chars"))
      eng.update()
      new Engine(s, cfg).searchDecay(searchTexts, "n_chars",
        origin = 300.0, scale = 200.0, decayOffset = 25.0)
    }),

    // Scalar inverted index — Milvus's INVERTED/BITMAP index on a plain
    // scalar field: the equality filter serves from a persisted
    // value→doc_id layout (one bucket directory read + semi-join
    // hydration), never a corpus column scan. The fresh Engine proves the
    // layout is discovered from disk; EngineSpec gates the pruning and
    // the unindexed-filter equivalence.
    "q253_scalar_index" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q253_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang", "source"))
      new Engine(s, cfg)
        .queryScalarIndexed("source", "src3", Seq("source", "lang"), limit = 150)
    }),

    // The reference's retrieve verb VERBATIM (vdb.py:218-223): the filter
    // is a raw Milvus expr STRING — ==, &&, ||, in [..] — over DYNAMIC
    // fields (the columns packed into $meta by ingestDynamic), translated
    // syntactically to Spark SQL and served through the pushed-filter
    // query path. The oracle replays both the packing and the translated
    // predicate — a translator precedence or literal-handling bug
    // hash-fails.
    "q254_retrieve_expr" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q254_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingestDynamic(
        t(s, dir, "documents").select("doc_id", "text", "lang", "source", "n_chars"))
      new Engine(s, cfg).retrieve(
        """lang == "en" && n_chars > 400 || source in ["src3"]""",
        Seq(Engine.DynamicField), limit = 150)
    }),

    // Near-dup retrieval — Milvus 2.6's MINHASH_LSH index: "is this text
    // already in the corpus?" served from a persisted banded-minhash
    // signature layout + exact shingle-intersection verify. The query
    // texts are 80% prefixes of two corpus documents (ids 3 and 11 — band-matched at every scale, probed offline) (computed from
    // the data on BOTH sides, so the oracle replays them exactly);
    // truncation nests the shingle sets, so each query must at least find
    // its source document above the 0.3 bar. The oracle unions the query
    // rows (negative ids) into the corpus and replays the full
    // shingle→minhash→band→verify pipeline.
    "q256_neardup_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q256_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      val qtexts = Seq(3L -> 0.8, 11L -> 0.8).map { case (id, frac) =>
        docs.filter(col("doc_id") === id)
          .select(expr(s"substring(text, 1, cast(floor(length(text)*$frac) as int))"))
          .head().getString(0)
      }
      val res = new Engine(s, cfg).searchNearDup(qtexts, threshold = 0.3)
      require(res.filter(col("query_id") === 0 && col("doc_id") === 3).count() == 1 &&
        res.filter(col("query_id") === 1 && col("doc_id") === 11).count() == 1,
        "each truncated query must find its source document")
      res
    }),

    // Nullable scalar fields — Milvus 2.4's nullable field attribute: NULL
    // values round-trip ingest→store→read, and IS NULL / IS NOT NULL
    // predicates push to the scan like any other filter. The fixture nulls
    // out one language at the door; the graded read mixes an is-null arm
    // with a value arm in one predicate.
    "q255_nullable_field" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q255_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
        .withColumn("lang",
          when(col("lang") === "de", lit(null: String)).otherwise(col("lang")))
      eng.ingest(docs)
      new Engine(s, cfg).query(
        col("lang").isNull || (col("lang") === "en" && col("n_chars") > 400L),
        Seq("lang", "n_chars"), limit = 200)
    }),

    // ARRAY field — Milvus's ARRAY datatype: an array<string> column
    // (tags: the document's first 12 ≥3-letter tokens) round-trips
    // ingest→store→filter, and the Milvus expr array operators
    // array_contains / not / array_length translate and serve through
    // retrieve()'s pushed-query path. Both predicate arms are non-trivial
    // at every scale (probed: 135/143/1275 matches). The oracle replays
    // the tags derivation and the filter with DuckDB list functions.
    "q265_array_field" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q265_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
        .withColumn("tags",
          slice(filter(split(lower(col("text")), "[^a-z]+"),
            tk => length(tk) >= 3), 1, 12))
      eng.ingest(docs)
      new Engine(s, cfg).retrieve(
        """(array_contains(tags, "data") and not array_contains(tags, "the")) or array_length(tags) < 12""",
        Seq("lang", "n_chars"), limit = 150)
    }),

    // ARRAY set operators — Milvus's array_contains_all / array_contains_any
    // (the ALL spelling arrives uppercase: Milvus accepts both): the
    // all-probe rewrites to an array_except emptiness test, the any-probe
    // to arrays_overlap, and both compose with a scalar arm under SQL
    // precedence. Probed non-trivial at every scale (111/115/1111).
    "q266_array_setops" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q266_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
        .withColumn("tags",
          slice(filter(split(lower(col("text")), "[^a-z]+"),
            tk => length(tk) >= 3), 1, 12))
      eng.ingest(docs)
      new Engine(s, cfg).retrieve(
        """ARRAY_CONTAINS_ALL(tags, ["window", "hash"]) or (array_contains_any(tags, ["vector", "stream"]) and n_chars < 150)""",
        Seq("lang", "n_chars"), limit = 150)
    }),

    // JSON array membership — Milvus's json_contains over a DYNAMIC field:
    // the tags array arrives undeclared, packs into the hidden $meta JSON
    // column (to_json renders it as a JSON array), and the filter
    // materializes it back with from_json before the membership test —
    // json_contains(tags, "data") && n_chars > 300, both fields dynamic.
    // The oracle replays the name-sorted packing (printf with a
    // quote-and-join over the list) and the filter on the raw columns.
    "q267_json_contains" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q267_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "n_chars")
        .withColumn("tags",
          slice(filter(split(lower(col("text")), "[^a-z]+"),
            tk => length(tk) >= 3), 1, 12))
      eng.ingestDynamic(docs)
      new Engine(s, cfg).retrieve(
        """json_contains(tags, "data") && n_chars > 300""",
        Seq(Engine.DynamicField), limit = 150)
    }),

    // TEXT_MATCH inside a filter expr — Milvus composes keyword match
    // with scalar arms in ANY expr (search, query, delete); here the
    // retrieve path runs `TEXT_MATCH(text, "dup nosuchtoken") &&
    // n_chars > 250` through the translator's arrays_overlap rewrite
    // ('dup' is a rare token; 'nosuchtoken' exercises the empty arm of
    // the OR). q242 grades the index-priced search-gate sibling.
    "q278_expr_text_match" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q278_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"))
      new Engine(s, cfg).retrieve(
        """TEXT_MATCH(text, "dup nosuchtoken") && n_chars > 250""",
        Seq("lang", "n_chars"), limit = 150)
    }),

    // Range spellings in the expr dialect — the documented Milvus corners
    // a user migrating real filters hits first: `between a and b` (SQL's
    // own BETWEEN, passed through), a CHAINED comparison `100 <= f < 160`
    // (split into conjoined arms — SQL has no chained comparison), and a
    // modulo arm `f % 2 == 0`, all composed in ONE expr string under
    // &&/|| precedence. Both OR arms are non-trivial at every scale
    // (probed: 125+55 / 113+70 / 1242+628 matches).
    "q279_expr_range" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q279_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"))
      new Engine(s, cfg).retrieve(
        """n_chars between 300 and 600 && n_chars % 2 == 0 || 100 <= n_chars < 160""",
        Seq("lang", "n_chars"), limit = 150)
    }),

    // TEXT_MATCH in a filter expr under a STEMMING analyzer — the expr
    // route must tokenize exactly like the postings route (q242/q276):
    // the plural query terms stem driver-side ('tables'→'table',
    // 'merges'→'merge') and the field tokenization stems in SQL, so the
    // match set equals searchTextMatch's under the same config. Without
    // analyzer plumbing the expr route would match only literal plural
    // tokens — the silent two-routes-disagree bug this query pins.
    // ~78% of docs carry 'table' or 'merge' post-stem at every scale.
    "q280_expr_match_stem" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q280_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        analyzer = "english_stem")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"))
      new Engine(s, cfg).retrieve(
        """TEXT_MATCH(text, "tables merges") && n_chars > 250""",
        Seq("lang", "n_chars"), limit = 150)
    }),

    // `exists` — Milvus's key-presence operator over dynamic fields: a
    // producer column that is NULL for a row simply never packs into that
    // row's $meta (to_json drops null fields), so presence of the key IS
    // the Milvus exists semantics. Every third doc gets a src_detail
    // annotation; the filter keeps annotated docs above a length bar.
    "q271_exists_expr" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q271_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "source", "lang", "n_chars")
        .withColumn("src_detail",
          when(col("doc_id") % 3 === 0, concat(col("source"), lit("/"), col("lang"))))
        .drop("source", "lang")
      eng.ingestDynamic(docs)
      new Engine(s, cfg).retrieve(
        """exists src_detail && n_chars > 250""",
        Seq(Engine.DynamicField), limit = 150)
    }),

    // Clustering compaction — Milvus 2.4's clustering_key compaction: the
    // store rewrites range-clustered on a scalar field so filtered reads
    // prune to the files whose footer min/max straddle the predicate.
    // Five ingest waves fragment the store first (the disease), the
    // rewrite clusters by lang, and the graded read must be byte-identical
    // to the same filter over the never-compacted corpus — layout moved,
    // content didn't. EngineSpec gates the actual file pruning.
    "q245_clustering_compact" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q245_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "n_chars")
      (0 until 5).foreach(w => eng.ingest(docs.filter(col("doc_id") % 5 === w)))
      eng.compactClustered("lang", maxRecordsPerFile = 100L)
      new Engine(s, cfg).query(col("lang") === "de" && col("n_chars") > 200L,
        Seq("lang", "n_chars"), limit = 200)
    }),

    // Blue/green MODEL MIGRATION — the most expensive day-2 operation a
    // vector deployment runs: upgrading the embedding model re-embeds the
    // whole corpus (embed.py's model is a config choice, so this WILL
    // happen). The discipline: build the new model's index at a NEW path
    // while v1 keeps serving (the run asserts v1 answers mid-migration AND
    // that the v2 build wrote no byte into v1's index — blue/green, not
    // in-place), then cut over by config flip (the alias swap). Results
    // after cutover must hash-match the NEW model's lifecycle replay.
    "q219_model_migration" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q219_${runSeq.incrementAndGet()}_").toString
      val v1 = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index_v1")
      val engV1 = new Engine(s, v1)
      engV1.ingest(t(s, dir, "documents").select("doc_id", "text"))
      engV1.update() // v1 (hash model) serves production
      def snap(p: String): Map[String, Long] = {
        def go(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(go) else Seq(f)
        go(new java.io.File(p)).map(f => f.getPath -> f.lastModified()).toMap
      }
      val v1Before = snap(s"$tmp/index_v1")
      // the offline re-embed: same store, new model, NEW index path
      val v2 = v1.copy(indexPath = s"$tmp/index_v2")
      new Engine(s, v2, LetterEmbedder).update()
      require(engV1.search(searchTexts).count() > 0,
        "q219: v1 must keep serving during the migration")
      require(snap(s"$tmp/index_v1") == v1Before,
        "q219: the v2 build touched v1's index — not blue/green")
      // cutover: a fresh driver on the v2 config serves the new model
      new Engine(s, v2, LetterEmbedder).search(searchTexts)
    }),

    // Grouping search — Milvus 2.4's group_by_field: top-4 SOURCES per
    // query, each represented by its best document (the diversity verb —
    // a plain top-k can fill up with one source's near-duplicates). The
    // index is partition-keyed on the same field, so group attribution
    // rides the index rows — zero store joins before hydration. The
    // oracle replays doc ranking → per-(query, source) best → top-4
    // groups relationally.
    "q218_grouped_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q218_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        partitionKey = "source")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "source"))
      eng.update()
      new Engine(s, cfg).searchGrouped(searchTexts, "source")
    }),

    // Result paging — Milvus's offset search parameter / the
    // search_iterator page verb: ranks 5..12 of the SAME total ranking
    // q64 serves page 1 of. The rank column stays absolute (consecutive
    // pages concatenate seamlessly); the oracle replay just moves the
    // QUALIFY window, so any off-by-one or re-ranking drift hash-fails.
    "q215_search_pagination" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q215_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      eng.searchPage(searchTexts, offset = 4, pageSize = 8)
    }),

    // Partition-keyed multi-tenancy — Milvus's partition_key_field +
    // partition_names search parameter: the index is hive-partitioned by
    // the document's source column, and a search naming its tenants reads
    // ONLY those partition directories (EngineSpec plan-gates the
    // PartitionFilters; the runtime require gates the on-disk hive
    // layout). Results must hash-match the lifecycle replay restricted to
    // the named tenants — the top-k is taken WITHIN the scope.
    "q214_partition_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q214_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        partitionKey = "source") // default ivfThreshold: the partition-pruned brute scan
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "source"))
      eng.update()
      require(new java.io.File(s"$tmp/index").listFiles()
          .exists(_.getName.startsWith("source=")),
        "q214: update() did not hive-partition the index by the partition key")
      new Engine(s, cfg).searchPartitions(searchTexts, Seq("src3", "src7", "src11"))
    }),

    // Hybrid retrieval as an ENGINE verb — Milvus 2.4's hybrid_search
    // (multi-ranker + rank fusion) over the engine's two native rankers:
    // the chunked vector ranking (per-doc best chunk, the q64 path) and an
    // integral BM25 ranking over the store, each pooled to its top-100 per
    // query, fused by reciprocal rank (k=60, ppm integers — rank fusion
    // needs no score calibration, which is why it replays hash-exactly).
    // The oracle recomputes BOTH rankings and the fusion relationally; a
    // doc surfacing on lexical evidence alone (vec_rank=0) or vector
    // evidence alone (lex_rank=0) is part of the graded contract.
    "q212_engine_hybrid" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q212_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text"))
      eng.update()
      new Engine(s, cfg).hybridSearch(searchTexts)
    }),

    // Filtered hybrid — Milvus hybrid_search's expr parameter: one scalar
    // predicate (lang ∈ {en, de} — 53% of the corpus) gates BOTH pools
    // BEFORE their top-100 cuts, so ineligible docs can't hold pool slots
    // and eligible docs outside the unfiltered pools can surface.
    // Collection-wide BM25 stats stay unfiltered (the Milvus semantics).
    // The oracle is q212's replay with an eligibility semi-join inserted
    // into both rank CTEs.
    "q272_hybrid_filtered" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q272_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L)
      val eng = new Engine(s, cfg)
      eng.ingest(t(s, dir, "documents").select("doc_id", "text", "lang"))
      eng.update()
      new Engine(s, cfg).hybridSearchWhere(searchTexts,
        col("lang").isin("en", "de"))
    }),

    // The production loop driven by the REAL Scheduler (scheduler.py:10-51
    // parity — q197 composes the same flow manually; this grades the
    // scheduler itself): init_run fires immediately with the first crawl
    // wave, then three period ticks arrive through the injectable clock —
    // two more waves and one EMPTY tick (nothing new crawled). Each firing
    // is the reference's job: ingest (dedup-insert) + updateIncremental
    // (embed only the delta, extend the persisted layout). The empty tick
    // must append zero chunks (tick idempotence — the property the
    // reference leans on MongoDB upserts for), the clock must have been
    // slept exactly period×3 ms, and a fresh engine must serve the full
    // corpus from the incrementally-built layout — hash-matching the q64
    // replay only if every scheduled wave landed.
    "q204_scheduler_loop" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q204_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L,
        schedulerInitRun = true, schedulerPeriod = "day")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val waves: Long => DataFrame = {
        case 0 => docs.filter(col("doc_id") % 2 === 0)
        case 1 => docs.filter(col("doc_id") % 4 === 1)
        case 2 => docs.filter(col("doc_id") % 4 === 3)
        case _ => docs.filter(col("doc_id") % 2 === 0) // re-crawl: nothing new
      }
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val appended = scala.collection.mutable.ArrayBuffer.empty[Long]
      val fired = graft.streaming.Scheduler.run(cfg, maxRuns = 4,
        job = r => {
          eng.ingest(waves(r))
          if (r == 0) eng.update() // offline create_index on the first wave
          else appended += eng.updateIncremental() // extend the layout
        },
        sleep = ms => slept += ms)
      require(fired == 4, s"q204: scheduler fired $fired of 4")
      require(slept.toSeq == Seq.fill(3)(86400000L),
        s"q204: clock slept ${slept.toSeq}, expected 3 day periods")
      require(appended.take(2).forall(_ > 0),
        s"q204: a crawl wave appended nothing: $appended")
      require(appended(2) == 0L,
        s"q204: the empty tick appended ${appended(2)} chunks — not idempotent")
      new Engine(s, cfg).search(searchTexts) // fresh driver: serves from disk
    }),

    // The maintenance window INSIDE the scheduled production loop: each
    // tick runs the reference's job (ingest + incremental index) and then
    // Engine.maintain(0.4) — the retrain policy as part of the schedule,
    // exactly where a deployment puts it. Wave sizes are chosen so growth
    // crosses the threshold exactly once (50% after wave 1 → retrain;
    // baseline resets; 33% after wave 2 → no-op; empty tick → no-op): the
    // loop must retrain EXACTLY once and the empty tick must leave every
    // layout byte untouched. Serving afterwards hash-matches the
    // full-corpus replay regardless of where the cell boundaries ended up.
    "q216_scheduled_maintain" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q216_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
        nlist = 16, nprobe = 16, ivfThreshold = 1L,
        schedulerInitRun = true, schedulerPeriod = "day")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val waves: Long => DataFrame = {
        case 0 => docs.filter(col("doc_id") % 2 === 0) // train on half
        case 1 => docs.filter(col("doc_id") % 4 === 1) // +~50% growth
        case 2 => docs.filter(col("doc_id") % 4 === 3) // +~33% of new baseline
        case _ => docs.filter(col("doc_id") % 2 === 0) // re-crawl: nothing new
      }
      val retrains = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      val fired = graft.streaming.Scheduler.run(cfg, maxRuns = 4,
        job = r => {
          eng.ingest(waves(r))
          if (r == 0) eng.update() else eng.updateIncremental()
          retrains += eng.maintain(maxGrowth = 0.4).head.getBoolean(3)
        },
        sleep = _ => ())
      require(fired == 4, s"q216: scheduler fired $fired of 4")
      require(retrains.toSeq == Seq(false, true, false, false),
        s"q216: retrain pattern ${retrains.toSeq}, expected exactly one at wave 1")
      new Engine(s, cfg).search(searchTexts)
    }),

    // The VERBATIM-CONFIG lifecycle: EngineConfig.load parses a copy of the
    // reference's own nested config.yml (vdb.milvus.* config.yml:75-87,
    // vdb.text.* :88-91, scheduler.* :97-100) and the FILE's values — not
    // code defaults — drive ingest → update → search end-to-end. The run
    // asserts the reference's numbers (nlist/nprobe 128, limit 4,
    // chunk 128/64, batch 128) actually arrived through the parser before
    // using them; only the store/index roots are re-pointed into the
    // sandbox tmp dir (the reference file names live DB endpoints, which
    // the loader maps to warehouse-local paths). Results hash-match the
    // q64 lifecycle replay — closing the config seam end-to-end.
    "q189_config_lifecycle" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q189_${runSeq.incrementAndGet()}_").toString
      val cfgFile = java.nio.file.Paths.get(s"$tmp/config.yml")
      val ref = java.nio.file.Paths.get("/root/reference/src/config.yml")
      if (java.nio.file.Files.isReadable(ref))
        java.nio.file.Files.copy(ref, cfgFile)
      else // shape-identical stand-in when no reference checkout is present
        java.nio.file.Files.write(cfgFile,
          """vdb:
            |  milvus:
            |    collection_name: 'dataset'
            |    nlist: 128
            |    nprobe: 128
            |    limit: 4
            |    batch_size: 128
            |  text:
            |    chunk_size: 128
            |    chunk_overlap: 64
            |scheduler:
            |  init_run: True
            |  period: day
            |""".stripMargin.getBytes("UTF-8"))
      val loaded = EngineConfig.load(cfgFile.toString)
      require(loaded.nlist == 128 && loaded.nprobe == 128 && loaded.limit == 4
          && loaded.chunkSize == 128 && loaded.chunkOverlap == 64
          && loaded.batchSize == 128,
        s"q189: parsed config does not carry the reference's values: $loaded")
      require(loaded.storePath.contains("dataset"),
        s"q189: collection_name did not shape the default store path: ${loaded.storePath}")
      val eng = new Engine(s,
        // re-point EVERY engine-written path into the sandbox tmp dir —
        // including ivfPath: a config file is untrusted input and must not
        // be able to aim any write outside the harness sandbox
        loaded.copy(storePath = s"$tmp/store", indexPath = s"$tmp/index",
          ivfPath = s"$tmp/index_ivf"))
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      eng.search(searchTexts)
    }),

    // Right-to-be-forgotten sweep graded end-to-end (Engine.forget — the
    // compliance verb over delete + fsck): sweep 1 purges the requested
    // residue class from the store AND the index, appends the tombstone
    // audit, and must prove zero survivors + store↔index consistency;
    // sweep 2 repeats the SAME request and must remove nothing (the
    // idempotence a re-played compliance job needs) while still auditing
    // the attempt. Both audit rows are graded against parity counts.
    "q182_forget_audit" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q182_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs)
      eng.update()
      val request = docs.filter(col("doc_id") % 11 === 0).select("doc_id")
      val audit1 = eng.forget(request, s"$tmp/audit")
        .withColumn("sweep", lit(1L)).localCheckpoint(true)
      val audit2 = eng.forget(request, s"$tmp/audit")
        .withColumn("sweep", lit(2L)).localCheckpoint(true)
      audit1.unionByName(audit2).orderBy(col("sweep"))
    }),

    // INCREMENTAL backup graded end-to-end (Engine.backupIncremental —
    // the nightly-delta shape over q150's full snapshot): full snapshot
    // of the half-corpus build, then dedup-ingest + incremental index of
    // the rest, then the incremental snapshot must COPY only the appended
    // part files and CARRY the base's files by manifest reference (both
    // counts required non-zero — the chain is real). Post-snapshot damage
    // + restore follows the chain across BOTH snapshots; the oracle is
    // the full-corpus lifecycle search replay, which only matches if the
    // chained restore reassembled the exact post-append state.
    "q181_incremental_backup" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_engine_q181_${runSeq.incrementAndGet()}_").toString
      val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
      val eng = new Engine(s, cfg)
      val docs = t(s, dir, "documents").select("doc_id", "text")
      eng.ingest(docs.filter(col("doc_id") % 2 === 0))
      eng.update()
      val full = eng.backup(s"$tmp/snapA")
      eng.ingest(docs) // odd half appends
      eng.updateIncremental()
      val (copied, carried) = eng.backupIncremental(s"$tmp/snapA", s"$tmp/snapB")
      require(copied > 0, "q181: the incremental copied nothing — no delta?")
      require(carried > 0, s"q181: nothing carried by reference (base had $full files)")
      require(carried <= full, s"q181: carried $carried exceeds base $full")
      val removed = eng.delete(docs.filter(col("doc_id") % 3 === 0).select("doc_id"))
      require(removed > 0, "q181: damage removed nothing")
      val restored = eng.restore(s"$tmp/snapB")
      require(restored == copied + carried,
        s"q181: restored $restored of ${copied + carried} chained files")
      eng.search(searchTexts)
    }),

    // Structured Streaming graded end-to-end: a real file-source readStream
    // over the corpus, grouped aggregation, memory sink in complete mode,
    // Trigger.AvailableNow (process everything that exists, then stop — the
    // batch-boundary trigger a scheduled re-crawl would use, scheduler.py:
    // 21-33). The settled sink content must equal the batch GROUP BY —
    // stream/batch unification is the correctness claim, here graded by the
    // DuckDB oracle instead of a spec-only assertion.
    "q65_stream_agg" -> ((s, dir) => {
      val schema = t(s, dir, "documents").schema
      val sink = s"q65_sink_${runSeq.incrementAndGet()}"
      // the file stream source watches a DIRECTORY (the drop-folder shape a
      // scheduled crawl feeds); stage the corpus file into one
      val drop = java.nio.file.Files.createTempDirectory(s"graft_q65_drop_")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        drop.resolve("documents.parquet"))
      val stream = s.readStream.schema(schema).parquet(drop.toString)
      stream.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          max(col("doc_id")).as("max_doc_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.table(sink).orderBy(col("lang"))
    }),

    // Idempotent streaming ingest graded end-to-end (the I2 contract as a
    // CORRECTNESS row, not just a spec): the drop-folder gets the corpus
    // PLUS a re-delivered slice (every third doc again), maxFilesPerTrigger=1
    // forces separate micro-batches so the cross-batch anti-join path in
    // StreamOps.ingestAppend actually runs, and the settled store must hold
    // exactly one row per doc_id — n_docs == n_distinct per source, equal to
    // the batch GROUP BY over the pristine corpus.
    "q66_stream_ingest" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_q66_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      touchAfter(drop, java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"), drop.resolve("a.parquet")))
      // second delivery: an overlapping slice, staged as a bare parquet file
      stageFile(docs.filter(col("doc_id") % 3 === 0), tmp.resolve("b2"), drop, "b.parquet")
      val store = s"$tmp/store"
      graft.streaming.StreamOps.ingestAppend(
          s.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
            .parquet(drop.toString),
          store, "doc_id", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(store)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    // Watermarked event-time window aggregation graded end-to-end in APPEND
    // mode — the mode that exercises watermark state EVICTION (complete mode,
    // q65, just re-emits everything). The real events arrive as micro-batch 1;
    // two sentinel ticks at the SAME far-future instant arrive as their own
    // micro-batches (maxFilesPerTrigger=1). The first sentinel batch advances
    // the watermark past every real window; the second is the data-carrying
    // batch in which those windows are emitted and their state dropped — so
    // emission never depends on whether AvailableNow schedules a no-data
    // flush batch. The sentinels share one window whose end always exceeds
    // the watermark (= sentinel_ts - delay), so it can never emit; the
    // result is exactly the batch hourly GROUP BY, which is the oracle.
    "q86_stream_window" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q86_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      // deliver the ORIGINAL parquet (a cheap copy, never a 1M-row
      // single-threaded rewrite); the stream reads ts in the file's raw
      // domain (ns-as-long legacy or native µs — QHelpers.tsNorm
      // dispatches) — the streaming spelling of t()'s batch-side read
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      touchAfter(drop, java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), drop.resolve("a.parquet")))
      val raw = s.read.parquet(s"$dir/events.parquet")
      // sentinel deliveries carry ts in the RAW staged-schema domain
      def sentinel = s.range(1).select(
        lit(-1L).as("event_id"),
        tsRawLit(raw, 4102444800L).as("ts"), // 2100-01-01
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0d).as("value"), lit("{}").as("props"))
      stageFile(sentinel, tmp.resolve("w2"), drop, "b.parquet")
      // the second sentinel is the SAME instant by design — copy, don't re-run
      touchAfter(drop,
        java.nio.file.Files.copy(drop.resolve("b.parquet"), drop.resolve("c.parquet")))
      val sink = s"q86_sink_${runSeq.incrementAndGet()}"
      // state-store partition pin (the q89/q95 discipline): 3 micro-batches
      // × 32 state partitions is 96 provider inits + commits for a handful
      // of windows; 2 partitions is the same result with 1/16 the state IO
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        tsNorm(s.readStream.schema(raw.schema).option("maxFilesPerTrigger", "1")
          .parquet(drop.toString))
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.table(sink)
        // defensive only: the sentinel window can never close (see above),
        // but harness scaffolding must not be able to leak into a graded row
        .filter(col("event_type") =!= "sentinel")
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Native state-store streaming dedup graded end-to-end: q66 grades the
    // foreachBatch anti-join spelling of idempotent ingest; this grades the
    // OTHER primitive — dropDuplicatesWithinWatermark
    // (StreamOps.dedupByKey), where the state store itself filters
    // re-deliveries. The corpus arrives as batch 1, a duplicate slice
    // (every 4th event, byte-identical) as its own micro-batch; the delay
    // is generous so the re-delivered rows are IN-watermark — they must be
    // removed by keyed state, not by the late-data filter. The settled
    // parquet sink must equal the pristine events table.
    "q89_stream_dedup" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q89_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      touchAfter(drop, java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), drop.resolve("a.parquet")))
      val raw = s.read.parquet(s"$dir/events.parquet") // raw file-schema ts
      stageFile(raw.filter(col("event_id") % 4 === 0), tmp.resolve("w2"), drop, "b.parquet")
      val store = s"$tmp/store"
      val deduped = graft.streaming.StreamOps.dedupByKey(
        tsNorm(s.readStream.schema(raw.schema).option("maxFilesPerTrigger", "1")
          .parquet(drop.toString)),
        keyCol = "event_id", tsCol = "ts", watermark = "3650 days")
      // dropDuplicatesWithinWatermark commits one state store per shuffle
      // partition per micro-batch; at this bounded state size the run cost
      // is all store-commit fan-out, so pin the stream's state partitioning
      // low (the q95 discipline — baked into the checkpoint at first start,
      // restored right after, batch queries unaffected)
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        deduped.writeStream.format("parquet")
          .option("path", store).option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.read.parquet(store)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_distinct"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Watermarked stream-stream interval join graded end-to-end: purchases
    // and clicks arrive as SEPARATE file streams; the click stream is
    // throttled (maxFilesPerTrigger=1) so its second half lands in a later
    // micro-batch and must match purchase rows buffered in the JOIN STATE
    // store — the cross-batch machinery a single-batch delivery would never
    // exercise. Watermarks exceed the data span, so no row is late and no
    // state is evicted before matching (eviction bounds state at scale; the
    // graded contract here is exact batch-equivalence: the settled sink
    // must equal q39's relational interval join, pair for pair).
    "q95_stream_join" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q95_")
      val dropP = java.nio.file.Files.createDirectory(tmp.resolve("p"))
      val dropC = java.nio.file.Files.createDirectory(tmp.resolve("c"))
      val raw = s.read.parquet(s"$dir/events.parquet") // raw file-schema ts
      stageFile(raw.filter(col("event_type") === "purchase"),
        tmp.resolve("w1"), dropP, "p.parquet")
      stageFile(raw.filter(col("event_type") === "click" && col("event_id") % 2 === 0),
        tmp.resolve("w2"), dropC, "a.parquet")
      stageFile(raw.filter(col("event_type") === "click" && col("event_id") % 2 === 1),
        tmp.resolve("w3"), dropC, "b.parquet")
      val purchases = tsNorm(s.readStream.schema(raw.schema).parquet(dropP.toString))
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("pts"))
        .withWatermark("pts", "60 days")
      val clicks = tsNorm(s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(dropC.toString))
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("cts"))
        .withWatermark("cts", "60 days")
      val joined = purchases.join(clicks,
        expr("c_user = p_user AND cts >= pts - interval 1 hour AND cts < pts"))
      val store = s"$tmp/store"
      // a stream-stream join commits 4 state stores per shuffle partition
      // per micro-batch; at this (bounded) state size the run cost is all
      // store-commit fan-out, so pin the stream's state partitioning low —
      // the setting is baked into the checkpoint at first start and does
      // not affect batch queries (restored right after)
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        joined.writeStream.format("parquet")
          .option("path", store).option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.read.parquet(store)
        .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // Watermarked LEFT OUTER stream-stream join — the state machine q95's
    // inner join never exercises: an unmatched left row must be HELD in the
    // join state until the right-side watermark proves no match can still
    // arrive, then emitted with nulls. Sentinels ride BOTH streams (global
    // watermark is the min across sources); the click side is paced
    // 1-file-per-trigger with advance + flush sentinel batches (the q86
    // discipline), so null-padded purchases emit via eviction, never via an
    // end-of-stream special case. Sentinel rows share one instant and the
    // condition is strict (cts < pts), so they can never join; the left
    // sentinel's own null-padded row is filtered by id. Unmatched click_id
    // is surfaced as -1 (both engines) so the graded frame has no nullable
    // int column to drift on.
    "q144_stream_left_join" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q144_")
      val dropP = java.nio.file.Files.createDirectory(tmp.resolve("p"))
      val dropC = java.nio.file.Files.createDirectory(tmp.resolve("c"))
      val raw = s.read.parquet(s"$dir/events.parquet")
      def sentinel = s.range(1).select(
        lit(-1L).as("event_id"),
        tsRawLit(raw, 4102444800L).as("ts"), // 2100-01-01
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0d).as("value"), lit("{}").as("props"))
      stageFile(raw.filter(col("event_type") === "purchase"),
        tmp.resolve("w1"), dropP, "p.parquet")
      stageFile(sentinel, tmp.resolve("w2"), dropP, "ps.parquet")
      stageFile(raw.filter(col("event_type") === "click" && col("event_id") % 2 === 0),
        tmp.resolve("w3"), dropC, "a.parquet")
      stageFile(raw.filter(col("event_type") === "click" && col("event_id") % 2 === 1),
        tmp.resolve("w4"), dropC, "b.parquet")
      stageFile(sentinel, tmp.resolve("w5"), dropC, "cs.parquet")
      touchAfter(dropC, java.nio.file.Files.copy(
        dropC.resolve("cs.parquet"), dropC.resolve("cs2.parquet")))
      val purchases = tsNorm(s.readStream.schema(raw.schema).parquet(dropP.toString))
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("pts"))
        .withWatermark("pts", "60 days")
      val clicks = tsNorm(s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(dropC.toString))
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("cts"))
        .withWatermark("cts", "60 days")
      val joined = purchases.join(clicks,
        expr("c_user = p_user AND cts >= pts - interval 1 hour AND cts < pts"),
        "left_outer")
      val store = s"$tmp/store"
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2") // the q95 state-store pin
      try {
        joined.writeStream.format("parquet")
          .option("path", store).option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.read.parquet(store)
        .filter(col("purchase_id") =!= -1L) // the left sentinel's own null-padded row
        .select(col("purchase_id"), coalesce(col("click_id"), lit(-1L)).as("click_id"),
          col("p_user").as("user_id"))
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // Custom-state streaming sessionization graded end-to-end: the
    // flatMapGroupsWithState sessionizer (StreamOps.sessionizeStateful) run
    // through a real readStream. Delivery is split BY TIME (first half /
    // second half of the month) so per-user event order is preserved across
    // micro-batches and open sessions spanning the split must CONTINUE from
    // keyed state; two same-instant far-future sentinel micro-batches then
    // advance the watermark so every residual open session closes via
    // event-time TIMEOUT (the q86 discipline — emission happens in
    // data-carrying batches, never relying on no-data flushes). The settled
    // sink must equal the batch gaps-and-islands sessionization (q27's
    // oracle, minus the double running sum, which is sequential-order
    // arithmetic and not hash-portable — bounds and counts are the graded
    // contract). State partitioning pinned low, the q95 lesson.
    "q100_stream_session" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q100_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val raw = s.read.parquet(s"$dir/events.parquet") // raw file-schema ts
      val mid = tsRawLit(raw, 1705276800L) // 2024-01-15 00:00:00 UTC
      stageFile(raw.filter(col("ts") < mid), tmp.resolve("w1"), drop, "a.parquet")
      stageFile(raw.filter(col("ts") >= mid), tmp.resolve("w2"), drop, "b.parquet")
      def sentinel = s.range(1).select(
        lit(-1L).as("event_id"),
        tsRawLit(raw, 4102444800L).as("ts"), // 2100-01-01
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0d).as("value"), lit("{}").as("props"))
      stageFile(sentinel, tmp.resolve("w3"), drop, "c.parquet")
      touchAfter(drop,
        java.nio.file.Files.copy(drop.resolve("c.parquet"), drop.resolve("d.parquet")))
      val stream = tsNorm(s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(drop.toString))
      val sessions = graft.streaming.StreamOps.sessionizeStateful(
        stream, gapMinutes = 30, watermark = "10 minutes")
      val store = s"$tmp/store"
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        sessions.writeStream.format("parquet")
          .option("path", store).option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.read.parquet(store)
        .filter(col("user_id") >= 0) // sentinel scaffolding must not leak
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // NEAR-dup dedup ON STREAMING INGEST — the continuous-ingest shape a
    // 100 TB pipeline actually runs (q66 grades exact-id streaming dedup;
    // q105 grades the batch-vs-store banding join; this composes them
    // end-to-end through a real readStream): the store starts as the
    // corpus; two micro-batches each deliver truncated NEAR-copies of
    // store documents (no id overlap — only the minhash path can catch
    // them) mixed with genuinely novel documents (unique synthetic token
    // streams). foreachBatch runs the incremental banding join against the
    // INDEX SNAPSHOT captured at stream start (the periodic-rebuild
    // production shape; the copy sets use disjoint residues so the two
    // batches are independent) and appends only survivors. The oracle
    // replays the full minhash chain per batch, filtered to batch-touching
    // pairs — exactly the q105 contract, composed — so every drop/keep
    // decision, including LSH misses on short docs, is hash-checked.
    "q125_stream_neardup" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q125_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val store = s"$tmp/store"
      docs.write.parquet(store) // pre-seeded store = the corpus
      def trunc(res: Int, off: Long) = docs.filter(col("doc_id") % 25 === res)
        .select((col("doc_id") + off).as("doc_id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 30, lit(1))).as("text"))
      def novel(parity: Int) = s.range(50).filter(col("id") % 2 === parity)
        .select((col("id") + 3000000000L).as("doc_id"),
          concat_ws(" ", (0 until 8).map(j =>
            concat(lit("nv"), col("id"), lit(s"x$j"))): _*).as("text"))
      stageFile(trunc(0, 4000000000L).unionByName(novel(0)),
        tmp.resolve("w1"), drop, "b1.parquet")
      stageFile(trunc(10, 5000000000L).unionByName(novel(1)),
        tmp.resolve("w2"), drop, "b2.parquet")
      // the index snapshot, with its near-dup SIGNATURE state built ONCE
      // (Dedup.buildSigIndex): each micro-batch pays only its own minhash
      // chain — the O(|batch|) production shape, not the O(|store|)
      // self-contained re-derivation per batch
      val snapIdx = graft.operators.Dedup.buildSigIndex(
        s.read.parquet(store), "text", "doc_id",
        shingleSize = 3, numHashes = 16, bands = 4)
      s.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
        .parquet(drop.toString)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.localCheckpoint(true) // pin: banding reads it repeatedly
          val pairs = graft.operators.Dedup.incrementalNearDupPairsIndexed(
            snapIdx, b, "text", threshold = 0.3)
          val dupIds = pairs.select(col("id_a").as("doc_id"))
            .unionByName(pairs.select(col("id_b").as("doc_id")))
            .join(b.select("doc_id"), "doc_id").distinct()
          val sp = b.sparkSession
          b.join(dupIds, Seq("doc_id"), "left_anti")
            // K1 dedup-insert discipline on the sink too: an at-least-once
            // re-run of this batch finds its survivors already in the store
            // and appends nothing (the anti-join IS the idempotence guard —
            // same as ingestAppend; batch ids are novel, so in the no-retry
            // path this drops nothing). The guard scan is pre-pruned to the
            // batch's id domain (all staged ids ≥ 3e9) so parquet footer
            // min/max skips the seeded-corpus files — the zone-map shape a
            // production guard takes from the batch's own min/max.
            .join(sp.read.parquet(store).select("doc_id")
              .filter(col("doc_id") >= 3000000000L), Seq("doc_id"), "left_anti")
            .write.mode("append").parquet(store)
        }
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(store)
        .groupBy(when(col("doc_id") >= 3000000000L, lit("planted"))
          .otherwise(lit("corpus")).as("part"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          sum(length(col("text"))).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("part"))
    }),

    // UPDATE-mode streaming MV maintenance: the running aggregation emits
    // only the groups each micro-batch CHANGED, and foreachBatch merges
    // those deltas into a versioned keyed store (read-prev → anti-join the
    // replaced keys → union → write v{batch} — copy-on-write, the plain-
    // parquet spelling of Delta MERGE). Two time-split deliveries force a
    // real cross-batch state update; the settled latest version must equal
    // the batch GROUP BY over everything — the incremental-view contract,
    // this time maintained BY the streaming runtime's state instead of
    // q85/q88's hand-rolled delta algebra.
    // Streaming data-quality monitor (the OOV drift watch a training
    // pipeline keeps on its ingest stream): per-micro-batch out-of-vocab
    // rate against a FIXED tokenizer vocabulary — the deployed-tokenizer
    // snapshot, computed once batch-side (q124's vocab contract) and
    // broadcast into every micro-batch. Two parity-split deliveries under
    // maxFilesPerTrigger=1 force two real batches; foreachBatch appends
    // one monitor row each. The settled monitor table must equal the
    // relational per-batch replay — rates in integer basis points.
    "q133_stream_oov" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q133_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val docs = t(s, dir, "documents")
      stageFile(docs.filter(col("doc_id") % 2 === 0), tmp.resolve("w1"), drop, "a.parquet")
      stageFile(docs.filter(col("doc_id") % 2 === 1), tmp.resolve("w2"), drop, "b.parquet")
      import graft.functions.TextFns
      val vocab = docs
        .select(explode(TextFns.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(30)
        .select(col("tok"), lit(1L).as("in_v"))
        .localCheckpoint(true) // snapshot: every micro-batch joins this
      val monitor = s"$tmp/monitor"
      // micro-batch shuffle pin (q89/q95 discipline): the per-batch agg is
      // a few thousand rows — 2 partitions, not 32 task launches per stage
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        s.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
          .parquet(drop.toString)
          .writeStream
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            // batchId-keyed write (StreamOps.idempotentAppend): an
            // at-least-once re-run replaces its own monitor partition
            graft.streaming.StreamOps.idempotentAppend(
              batch
                .select(col("doc_id"), explode(TextFns.tokens(lower(col("text")))).as("tok"))
                .join(broadcast(vocab), Seq("tok"), "left")
                .agg(countDistinct(col("doc_id")).as("n_docs"),
                  count(lit(1)).as("n_tok"),
                  sum(coalesce(col("in_v"), lit(0L))).as("n_in"))
                .select(lit(id).as("batch_id"), col("n_docs"), col("n_tok"),
                  (col("n_tok") - col("n_in")).as("n_oov"),
                  expr("(10000 * (n_tok - n_in)) DIV n_tok").as("oov_bp"))
                .coalesce(1),
              monitor, id)
          }
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.read.parquet(monitor).drop("batch").orderBy(col("batch_id"))
    }),

    // Incremental sketch-MV maintenance — the streaming form of q127's
    // mergeable-sketch rolling-distinct MV, and the shape a 100 TB
    // rolling-metrics pipeline actually runs: each micro-batch contributes
    // per-day HLL sketches (bytes, not users), and foreachBatch merges
    // them into the stored MV copy-on-write via hll_union_agg — O(days)
    // per batch, never a re-scan of history. HLL register-max union is
    // order- and partition-independent, so the settled MV's sketches are
    // IDENTICAL to a one-shot batch build; graded the q127 way (exact
    // rides along, lgK=14 estimate inside a 5% gate).
    "q135_stream_sketch_mv" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q135_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      // pre-regeneration TIMESTAMP(NANOS) vintage: must be set before the
      // raw read in a fresh session (q86/q89/q95 parity; tsNorm dispatches)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/events.parquet")
      stageFile(raw.filter(col("event_id") % 2 === 0), tmp.resolve("w1"), drop, "a.parquet")
      stageFile(raw.filter(col("event_id") % 2 === 1), tmp.resolve("w2"), drop, "b.parquet")
      val mv = java.nio.file.Files.createDirectory(tmp.resolve("mv")).toString
      // micro-batch shuffle pin (q89/q95 discipline): per-batch sketch agg
      // covers a handful of days — 2 partitions, not 32 tasks per stage
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        tsNorm(s.readStream.schema(raw.schema).option("maxFilesPerTrigger", "1")
          .parquet(drop.toString))
          .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
          .writeStream
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val sp = batch.sparkSession
            val delta = batch.groupBy(col("day"))
              .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
            val prevDirs = new java.io.File(mv).listFiles()
            val merged = Option(prevDirs).filter(_.nonEmpty).map { ds =>
              sp.read.parquet(ds.maxBy(_.getName.drop(1).toInt).getAbsolutePath)
                .unionByName(delta)
                .groupBy(col("day")).agg(hll_union_agg(col("sk")).as("sk"))
            }.getOrElse(delta)
            merged.coalesce(1).write.mode("overwrite").parquet(s"$mv/v$id")
          }
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      val latest = new java.io.File(mv).listFiles().maxBy(_.getName.drop(1).toInt)
      val est = s.read.parquet(latest.getAbsolutePath)
        .select(col("day"), hll_sketch_estimate(col("sk")).as("n_est"))
      val exact = t(s, dir, "events")
        .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("n_users"))
      exact.join(est, "day")
        .select(col("day").cast("timestamp").as("day"), col("n_users"),
          (abs(col("n_est") - col("n_users"))
            <= col("n_users").cast("double") * 0.05).as("sketch_ok"))
        .orderBy(col("day"))
    }),

    "q108_stream_update_mv" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q108_")
      val drop = java.nio.file.Files.createDirectory(tmp.resolve("drop"))
      val raw = s.read.parquet(s"$dir/events.parquet") // raw file-schema ts
      val mid = tsRawLit(raw, 1705276800L) // 2024-01-15 00:00:00 UTC
      stageFile(raw.filter(col("ts") < mid), tmp.resolve("w1"), drop, "a.parquet")
      stageFile(raw.filter(col("ts") >= mid), tmp.resolve("w2"), drop, "b.parquet")
      val mv = java.nio.file.Files.createDirectory(tmp.resolve("mv")).toString
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        s.readStream.schema(raw.schema).option("maxFilesPerTrigger", "1")
          .parquet(drop.toString)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .writeStream.outputMode("update")
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val sp = batch.sparkSession
            val prevDirs = new java.io.File(mv).listFiles()
            val prev = Option(prevDirs).filter(_.nonEmpty).map { ds =>
              sp.read.parquet(ds.maxBy(_.getName.drop(1).toInt).getAbsolutePath)
            }
            val b = batch.localCheckpoint(true) // pin: the merge reads it twice
            val merged = prev match {
              case Some(p) => p.join(b.select("event_type"), Seq("event_type"), "left_anti")
                .unionByName(b)
              case None => b
            }
            merged.coalesce(1).write.mode("overwrite").parquet(s"$mv/v$id")
          }
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      val latest = new java.io.File(mv).listFiles().maxBy(_.getName.drop(1).toInt)
      s.read.parquet(latest.getAbsolutePath).orderBy(col("event_type"))
    }))

  /** Write `df` as a single parquet part into `work`, then move that part
    * into the stream drop-folder under `name` — the "one delivery = one
    * file" staging q66 pioneered, shared by the streaming graded queries. */
  private def stageFile(df: org.apache.spark.sql.DataFrame,
      work: java.nio.file.Path, drop: java.nio.file.Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    df.coalesce(1).write.parquet(work.toString)
    val part = java.nio.file.Files.list(work).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(sys.error(s"stageFile: no part file written in $work"))
    val staged = java.nio.file.Files.move(part, drop.resolve(name))
    touchAfter(drop, staged)
  }

  /** FileStreamSource orders deliveries by modification time; coarse
    * filesystem timestamps can TIE files staged within the same second, and
    * a tie would let a watermark-advancing sentinel overtake the data file —
    * dropping every real row as late. Force a strict order: the staged
    * file's mtime is set 2s after every file already in the drop folder. */
  private def touchAfter(drop: java.nio.file.Path, file: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val fileName = file.getFileName.toString
    val others = java.nio.file.Files.list(drop).iterator().asScala
      .filterNot(_.getFileName.toString == fileName)
      .map(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
    val floor = (others ++ Iterator(System.currentTimeMillis())).max
    java.nio.file.Files.setLastModifiedTime(file,
      java.nio.file.attribute.FileTime.fromMillis(floor + 2000))
  }

  /** DuckDB spelling of [[graft.functions.VectorFns.hashEmbed]]'s per-token
    * (bucket, sign) for dim=64, decomposed so no value exceeds BIGINT: the
    * bucket needs only the LOW 60 hash bits (2^60 ≡ 0 mod 64, and Java's
    * ((h%64)+64)%64 equals the unsigned value mod 64), and sign bit 62 is
    * bit 2 of the TOP hex char. */
  private def tokBucket(tk: String): String =
    s"cast(cast(('0x' || substr(sha256($tk), 2, 15)) as bigint) % 64 as int)"
  private def tokSign(tk: String): String =
    s"(CASE WHEN (cast(('0x' || substr(sha256($tk), 1, 1)) as bigint) // 4) % 2 = 0" +
      " THEN 1.0 ELSE -1.0 END)"

  /** Embed a (id-cols, text) relation: tokens → signed buckets → dense
    * 64-dim count vector → float-normalized (mirroring hashEmbed's
    * `(count * (1/sqrt(norm))).toFloat` exactly — the float cast is part of
    * the contract) → double for the cosine. Keeps `nrm` so zero vectors can
    * reproduce cosine_sim's 0.0 instead of NaN. */
  private def embedSql(rel: String, ids: String, textCol: String): String = {
    val idCols = ids.split(", ").toSeq
    val rIds = idCols.map(i => s"r.$i").mkString(", ")
    val joinCond = idCols.map(i => s"c.$i = r.$i").mkString(" AND ")
    s"""tok AS (
       |  SELECT $ids, unnest(regexp_split_to_array(trim($textCol), '\\s+')) AS tk
       |  FROM $rel WHERE length(trim($textCol)) > 0),
       |hv AS (
       |  SELECT $ids, ${tokBucket("tk")} AS bucket, ${tokSign("tk")} AS sgn
       |  FROM tok WHERE tk <> ''),
       |cnt AS (
       |  SELECT $ids, bucket, cast(sum(sgn) as double) AS s
       |  FROM hv GROUP BY ALL),
       |dense AS (
       |  SELECT $rIds, list(coalesce(c.s, 0.0) ORDER BY g.j) AS cv
       |  FROM (SELECT DISTINCT $ids FROM $rel) r
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
       |  LEFT JOIN cnt c ON $joinCond AND c.bucket = g.j
       |  GROUP BY $rIds),
       |vec AS (
       |  SELECT $ids, cv,
       |    sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM dense)""".stripMargin
  }

  /** DuckDB spelling of [[LetterEmbedder]] over relation `rel` carrying
    * `ids` and `textCol`: letter counts (length-difference trick) →
    * weighted x → float-cast normalize, exactly the Scala op sequence
    * (0.0-seeded and first-element-seeded left folds agree because
    * 0.0 + v0 == v0). Emits CTEs `<p>x`, `<p>n`, `<p>v`. */
  private def letterEmbedSql(rel: String, ids: String, textCol: String,
                             p: String): String = {
    val xs = LetterEmbedder.letters.zip(LetterEmbedder.weights).map { case (ch, w) =>
      s"$w * (length($textCol) - length(replace($textCol, '$ch', '')))"
    }.mkString(", ")
    s"""${p}x AS (
       |  SELECT $ids, [$xs] AS x FROM $rel),
       |${p}n AS (
       |  SELECT $ids, x,
       |    list_reduce(list_transform(x, v -> v*v), (a,b) -> a+b) AS nrm2
       |  FROM ${p}x),
       |${p}v AS (
       |  SELECT $ids,
       |    CASE WHEN nrm2 > 0
       |         THEN list_transform(x, v -> cast(cast(v * (1.0/sqrt(nrm2)) as float) as double))
       |         ELSE x END AS v,
       |    nrm2
       |  FROM ${p}n)""".stripMargin
  }

  /** DuckDB spelling of [[q156Model]] (FileEmbedder's linear layer) over
    * relation `rel` carrying `ids` and `textCol`: per-feature char counts
    * (length-difference trick) → W·c with the seed-derived weight literals
    * → float-cast normalize, exactly the Scala op sequence in
    * [[graft.functions.FileEmbedder.Model.forward]]. Emits CTEs `<p>x`,
    * `<p>n`, `<p>v` — the same shape as [[letterEmbedSql]]. */
  private def matrixEmbedSql(rel: String, ids: String, textCol: String,
                             p: String): String = {
    val m = q156Model
    val counts = m.features.map(ch =>
      s"(length($textCol) - length(replace($textCol, '$ch', '')))")
    val xs = m.w.map { row =>
      row.zip(counts).map { case (w, c) => s"$w * $c" }.mkString(" + ")
    }.mkString(",\n      ")
    s"""${p}x AS (
       |  SELECT $ids, [$xs] AS x FROM $rel),
       |${p}n AS (
       |  SELECT $ids, x,
       |    list_reduce(list_transform(x, v -> v*v), (a,b) -> a+b) AS nrm2
       |  FROM ${p}x),
       |${p}v AS (
       |  SELECT $ids,
       |    CASE WHEN nrm2 > 0
       |         THEN list_transform(x, v -> cast(cast(v * (1.0/sqrt(nrm2)) as float) as double))
       |         ELSE x END AS v,
       |    nrm2
       |  FROM ${p}n)""".stripMargin
  }

  /** DuckDB spelling of [[q229Model]] (the two-layer MLP checkpoint) over
    * relation `rel`: per-feature char counts → W₁·c as a list of literal
    * left-to-right sums (bit-exact vs the Scala j-ascending accumulate) →
    * relu via list_transform (CASE, matching the Scala `> 0` selection —
    * NaN and −0.0 both map to 0.0 on both sides) → W₂·h over 1-indexed
    * list elements → float-cast normalize. Emits CTEs `<p>x`, `<p>n`,
    * `<p>v` — the [[letterEmbedSql]] shape, so the lifecycle CTEs splice
    * unchanged. */
  private def mlpEmbedSql(rel: String, ids: String, textCol: String,
                          p: String): String = {
    val m = q229Model
    val counts = m.features.map(ch =>
      s"(length($textCol) - length(replace($textCol, '$ch', '')))")
    val l1 = m.layers.head.w.map { row =>
      row.zip(counts).map { case (w, c) => s"$w * $c" }.mkString(" + ")
    }.mkString(",\n      ")
    val l2 = m.layers(1).w.map { row =>
      row.zipWithIndex.map { case (w, j) => s"$w * h[${j + 1}]" }.mkString(" + ")
    }.mkString(",\n      ")
    s"""${p}h0 AS (
       |  SELECT $ids, [$l1] AS h0 FROM $rel),
       |${p}h AS (
       |  SELECT $ids,
       |    list_transform(h0, v -> CASE WHEN v > 0 THEN v ELSE 0.0 END) AS h
       |  FROM ${p}h0),
       |${p}x AS (
       |  SELECT $ids, [$l2] AS x FROM ${p}h),
       |${p}n AS (
       |  SELECT $ids, x,
       |    list_reduce(list_transform(x, v -> v*v), (a,b) -> a+b) AS nrm2
       |  FROM ${p}x),
       |${p}v AS (
       |  SELECT $ids,
       |    CASE WHEN nrm2 > 0
       |         THEN list_transform(x, v -> cast(cast(v * (1.0/sqrt(nrm2)) as float) as double))
       |         ELSE x END AS v,
       |    nrm2
       |  FROM ${p}n)""".stripMargin
  }

  /** DuckDB spelling of [[q286Model]] (the GRAFT-ATTN transformer) over
    * relation `rel`: tokenize to `maxlen` slots + 0/1 masks → per-token
    * char counts → h = We·c + pos → q/k/v projections (q scaled by 1/d) →
    * scaled dot-product scores clamped to [-8, 8] → piecewise-linear exp2
    * (a 17-branch CASE over exact power-of-two literals — no libm exp, so
    * the softmax weights are bit-equal to the JVM's) → masked softmax →
    * attention outputs → relu FFN → masked mean-pool → float-cast
    * normalize. Every sum is written in the SAME ascending index order the
    * Scala forward accumulates in: IEEE ops are exactly specified, so
    * identical operand sequences give identical bits on both engines.
    * Masked slots ride as '' tokens whose terms contribute exact +0.0.
    * Emits CTEs ending `<p>x`, `<p>n`, `<p>v` — the [[letterEmbedSql]]
    * splice shape. */
  private def attnEmbedSql(rel: String, ids: String, textCol: String,
                           p: String): String = {
    val m = q286Model
    val d = m.dim; val L = m.maxlen
    def dot(w: Array[Double], ref: Int => String): String =
      w.indices.map(j => s"${w(j)} * ${ref(j)}").mkString(" + ")
    val trimmed = s"regexp_replace($textCol, '^\\s+|\\s+$$', '', 'g')"
    val slots = (1 to L).map(i =>
      s"CASE WHEN ntok >= $i THEN arr[$i] ELSE '' END AS t$i").mkString(", ")
    val masks = (1 to L).map(i =>
      s"CASE WHEN ntok >= $i THEN 1.0 ELSE 0.0 END AS m$i").mkString(", ")
    val mlist = (1 to L).map(i => s"m$i").mkString(", ")
    val cnts = (for { i <- 1 to L; j <- m.features.indices } yield {
      val ch = if (m.features(j) == '\'') "''" else m.features(j).toString
      s"cast(length(t$i) - length(replace(t$i, '$ch', '')) as double) AS c${i}_$j"
    }).mkString(",\n      ")
    val hs = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${dot(m.we(r), j => s"c${i}_$j")}) + ${m.pos(i - 1)(r)} AS h${i}_$r"
    ).mkString(",\n      ")
    val qs = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${dot(m.wq(r), j => s"h${i}_$j")}) / $d.0 AS q${i}_$r").mkString(",\n      ")
    val ks = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${dot(m.wk(r), j => s"h${i}_$j")}) AS k${i}_$r").mkString(",\n      ")
    val vs = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${dot(m.wv(r), j => s"h${i}_$j")}) AS v${i}_$r").mkString(",\n      ")
    val vlist = (for { i <- 1 to L; r <- 0 until d } yield s"v${i}_$r").mkString(", ")
    val ss = (for { i <- 1 to L; j <- 1 to L } yield {
      val dp = (0 until d).map(r => s"q${i}_$r * k${j}_$r").mkString(" + ")
      s"greatest(-8.0, least(8.0, ($dp) / ${d * d}.0)) AS s${i}_$j"
    }).mkString(",\n      ")
    val es = (for { i <- 1 to L; j <- 1 to L } yield {
      val p2 = graft.functions.FileEmbedder.pow2CaseSql(s"cast(floor(s${i}_$j) as int)")
      s"(($p2) * (1.0 + (s${i}_$j - floor(s${i}_$j)))) AS e${i}_$j"
    }).mkString(",\n      ")
    val dens = (1 to L).map(i =>
      s"(${(1 to L).map(j => s"e${i}_$j * m$j").mkString(" + ")}) AS den$i"
    ).mkString(",\n      ")
    val os = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${(1 to L).map(j => s"(e${i}_$j * m$j / den$i) * v${j}_$r").mkString(" + ")}) AS o${i}_$r"
    ).mkString(",\n      ")
    val ys = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${dot(m.w2(r), j => s"o${i}_$j")}) AS y${i}_$r").mkString(",\n      ")
    val gs = (for { i <- 1 to L; r <- 0 until d } yield
      s"CASE WHEN y${i}_$r > 0 THEN y${i}_$r ELSE 0.0 END AS g${i}_$r"
    ).mkString(",\n      ")
    val pool = (0 until d).map(r =>
      s"CASE WHEN ntok = 0 THEN 0.0 ELSE (" +
        (1 to L).map(i => s"g${i}_$r * m$i").mkString(" + ") +
        s") / cast(ntok as double) END").mkString(",\n      ")
    s"""${p}t0 AS (
       |  SELECT $ids, regexp_split_to_array($trimmed, '\\s+') AS arr,
       |    CASE WHEN length($trimmed) = 0 THEN 0
       |         ELSE least(len(regexp_split_to_array($trimmed, '\\s+')), $L) END AS ntok
       |  FROM $rel),
       |${p}tk AS (SELECT $ids, ntok, $slots, $masks FROM ${p}t0),
       |${p}cn AS (SELECT $ids, ntok, $mlist,
       |      $cnts
       |  FROM ${p}tk),
       |${p}hh AS (SELECT $ids, ntok, $mlist,
       |      $hs
       |  FROM ${p}cn),
       |${p}qk AS (SELECT $ids, ntok, $mlist,
       |      $qs,
       |      $ks,
       |      $vs
       |  FROM ${p}hh),
       |${p}sc AS (SELECT $ids, ntok, $mlist, $vlist,
       |      $ss
       |  FROM ${p}qk),
       |${p}ee AS (SELECT $ids, ntok, $mlist, $vlist,
       |      $es
       |  FROM ${p}sc),
       |${p}dn AS (SELECT *,
       |      $dens
       |  FROM ${p}ee),
       |${p}oo AS (SELECT $ids, ntok, $mlist,
       |      $os
       |  FROM ${p}dn),
       |${p}yy AS (SELECT $ids, ntok, $mlist,
       |      $ys
       |  FROM ${p}oo),
       |${p}gg AS (SELECT $ids, ntok, $mlist,
       |      $gs
       |  FROM ${p}yy),
       |${p}x AS (
       |  SELECT $ids, [$pool] AS x FROM ${p}gg),
       |${p}n AS (
       |  SELECT $ids, x,
       |    list_reduce(list_transform(x, v -> v*v), (a,b) -> a+b) AS nrm2
       |  FROM ${p}x),
       |${p}v AS (
       |  SELECT $ids,
       |    CASE WHEN nrm2 > 0
       |         THEN list_transform(x, v -> cast(cast(v * (1.0/sqrt(nrm2)) as float) as double))
       |         ELSE x END AS v,
       |    nrm2
       |  FROM ${p}n)""".stripMargin
  }

  /** DuckDB spelling of [[q292Model]] (GRAFT-ATTN 2 — 2 heads × 2 post-LN
    * encoder blocks) over relation `rel`: the [[attnEmbedSql]] replay
    * generalized per head and per block, plus the residual adds and the
    * IEEE-exact layernorms (mean and variance divide by dim — a power of
    * two; `1/sqrt(var+eps)` is two correctly-rounded ops; the affine is
    * `g·((x−mean)·inv)+b` with exactly the Scala forward's
    * parenthesization). Sums are spelled left-associative ascending —
    * SQL's own association order — matching the Scala accumulation, so
    * the whole 2-block forward is bit-equal on both engines. Emits CTEs
    * ending `<p>x`, `<p>n`, `<p>v` — the [[letterEmbedSql]] splice shape. */
  private def attn2EmbedSql(rel: String, ids: String, textCol: String,
                            p: String): String = {
    val m = q292Model
    val d = m.dim; val L = m.maxlen; val H = m.heads; val dh = m.dh
    val eps = graft.functions.FileEmbedder.LnEps
    def dot(w: Array[Double], ref: Int => String): String =
      w.indices.map(j => s"${w(j)} * ${ref(j)}").mkString(" + ")
    val trimmed = s"regexp_replace($textCol, '^\\s+|\\s+$$', '', 'g')"
    val slots = (1 to L).map(i =>
      s"CASE WHEN ntok >= $i THEN arr[$i] ELSE '' END AS t$i").mkString(", ")
    val masks = (1 to L).map(i =>
      s"CASE WHEN ntok >= $i THEN 1.0 ELSE 0.0 END AS m$i").mkString(", ")
    val mlist = (1 to L).map(i => s"m$i").mkString(", ")
    val cnts = (for { i <- 1 to L; j <- m.features.indices } yield {
      val ch = if (m.features(j) == '\'') "''" else m.features(j).toString
      s"cast(length(t$i) - length(replace(t$i, '$ch', '')) as double) AS c${i}_$j"
    }).mkString(",\n      ")
    val hlist = (for { i <- 1 to L; r <- 0 until d } yield s"h${i}_$r").mkString(", ")
    val hs = (for { i <- 1 to L; r <- 0 until d } yield
      s"(${dot(m.we(r), j => s"c${i}_$j")}) + ${m.pos(i - 1)(r)} AS h${i}_$r"
    ).mkString(",\n      ")
    // one encoder block: attention (per head), Wo mix + residual, LN1,
    // relu FFN + residual, LN2 → fresh h columns for the next block
    def block(l: Int, blk: graft.functions.FileEmbedder.AttnBlock,
              prev: String): (String, String) = {
      val vlist = (for { i <- 1 to L; r <- 0 until d } yield s"v${i}_$r").mkString(", ")
      val qkv = (for { i <- 1 to L; r <- 0 until d } yield
        s"(${dot(blk.wq(r), j => s"h${i}_$j")}) / $d.0 AS q${i}_$r").mkString(",\n      ") +
        ",\n      " + (for { i <- 1 to L; r <- 0 until d } yield
        s"(${dot(blk.wk(r), j => s"h${i}_$j")}) AS k${i}_$r").mkString(",\n      ") +
        ",\n      " + (for { i <- 1 to L; r <- 0 until d } yield
        s"(${dot(blk.wv(r), j => s"h${i}_$j")}) AS v${i}_$r").mkString(",\n      ")
      val ss = (for { hd <- 0 until H; i <- 1 to L; j <- 1 to L } yield {
        val base = hd * dh
        val dp = (base until base + dh).map(r => s"q${i}_$r * k${j}_$r").mkString(" + ")
        s"greatest(-8.0, least(8.0, ($dp) / ${d * d}.0)) AS s${hd}_${i}_$j"
      }).mkString(",\n      ")
      val es = (for { hd <- 0 until H; i <- 1 to L; j <- 1 to L } yield {
        val p2 = graft.functions.FileEmbedder.pow2CaseSql(s"cast(floor(s${hd}_${i}_$j) as int)")
        s"(($p2) * (1.0 + (s${hd}_${i}_$j - floor(s${hd}_${i}_$j)))) AS e${hd}_${i}_$j"
      }).mkString(",\n      ")
      val dens = (for { hd <- 0 until H; i <- 1 to L } yield
        s"(${(1 to L).map(j => s"e${hd}_${i}_$j * m$j").mkString(" + ")}) AS den${hd}_$i"
      ).mkString(",\n      ")
      val os = (for { i <- 1 to L; r <- 0 until d } yield {
        val hd = r / dh
        s"(${(1 to L).map(j => s"(e${hd}_${i}_$j * m$j / den${hd}_$i) * v${j}_$r").mkString(" + ")}) AS o${i}_$r"
      }).mkString(",\n      ")
      val r1s = (for { i <- 1 to L; r <- 0 until d } yield
        s"h${i}_$r + (${dot(blk.wo(r), j => s"o${i}_$j")}) AS a${i}_$r"
      ).mkString(",\n      ")
      def lnStats(in: String, mnN: String, vrN: String): (String, String) = (
        (1 to L).map(i =>
          s"(${(0 until d).map(r => s"$in${i}_$r").mkString(" + ")}) / $d.0 AS $mnN$i"
        ).mkString(",\n      "),
        (1 to L).map(i =>
          s"(${(0 until d).map(r => s"($in${i}_$r - $mnN$i) * ($in${i}_$r - $mnN$i)").mkString(" + ")}) / $d.0 AS $vrN$i"
        ).mkString(",\n      "))
      def lnOut(in: String, mnN: String, vrN: String, g: Array[Double],
                b: Array[Double], outN: String): String =
        (for { i <- 1 to L; r <- 0 until d } yield
          s"${g(r)} * (($in${i}_$r - $mnN$i) * (1.0/sqrt($vrN$i + $eps))) + ${b(r)} AS $outN${i}_$r"
        ).mkString(",\n      ")
      val (mn1, vr1) = lnStats("a", "ma", "va")
      val ln1 = lnOut("a", "ma", "va", blk.g1, blk.b1, "u")
      val ulist = (for { i <- 1 to L; r <- 0 until d } yield s"u${i}_$r").mkString(", ")
      val ys = (for { i <- 1 to L; r <- 0 until d } yield
        s"(${dot(blk.w2(r), j => s"u${i}_$j")}) AS y${i}_$r").mkString(",\n      ")
      val r2s = (for { i <- 1 to L; r <- 0 until d } yield
        s"u${i}_$r + (CASE WHEN y${i}_$r > 0 THEN y${i}_$r ELSE 0.0 END) AS f${i}_$r"
      ).mkString(",\n      ")
      val (mn2, vr2) = lnStats("f", "mf", "vf")
      val ln2 = lnOut("f", "mf", "vf", blk.g2, blk.b2, "h")
      val alist = (for { i <- 1 to L; r <- 0 until d } yield s"a${i}_$r").mkString(", ")
      val flist = (for { i <- 1 to L; r <- 0 until d } yield s"f${i}_$r").mkString(", ")
      val malist = (1 to L).map(i => s"ma$i").mkString(", ")
      val mflist = (1 to L).map(i => s"mf$i").mkString(", ")
      val sql =
        s"""${p}qk$l AS (SELECT $ids, ntok, $mlist, $hlist,
           |      $qkv
           |  FROM $prev),
           |${p}sc$l AS (SELECT $ids, ntok, $mlist, $hlist, $vlist,
           |      $ss
           |  FROM ${p}qk$l),
           |${p}ee$l AS (SELECT $ids, ntok, $mlist, $hlist, $vlist,
           |      $es
           |  FROM ${p}sc$l),
           |${p}dn$l AS (SELECT *,
           |      $dens
           |  FROM ${p}ee$l),
           |${p}oo$l AS (SELECT $ids, ntok, $mlist, $hlist,
           |      $os
           |  FROM ${p}dn$l),
           |${p}rs$l AS (SELECT $ids, ntok, $mlist,
           |      $r1s
           |  FROM ${p}oo$l),
           |${p}ma$l AS (SELECT $ids, ntok, $mlist, $alist,
           |      $mn1
           |  FROM ${p}rs$l),
           |${p}va$l AS (SELECT $ids, ntok, $mlist, $alist, $malist,
           |      $vr1
           |  FROM ${p}ma$l),
           |${p}u$l AS (SELECT $ids, ntok, $mlist,
           |      $ln1
           |  FROM ${p}va$l),
           |${p}yy$l AS (SELECT $ids, ntok, $mlist, $ulist,
           |      $ys
           |  FROM ${p}u$l),
           |${p}ff$l AS (SELECT $ids, ntok, $mlist,
           |      $r2s
           |  FROM ${p}yy$l),
           |${p}mf$l AS (SELECT $ids, ntok, $mlist, $flist,
           |      $mn2
           |  FROM ${p}ff$l),
           |${p}vf$l AS (SELECT $ids, ntok, $mlist, $flist, $mflist,
           |      $vr2
           |  FROM ${p}mf$l),
           |${p}hh$l AS (SELECT $ids, ntok, $mlist,
           |      $ln2
           |  FROM ${p}vf$l)""".stripMargin
      (sql, s"${p}hh$l")
    }
    val (blockSqls, lastCte) = m.blocks.zipWithIndex
      .foldLeft((List.empty[String], s"${p}h0x")) { case ((acc, prev), (blk, l)) =>
        val (sql, out) = block(l, blk, prev)
        (acc :+ sql, out)
      }
    val pool = (0 until d).map(r =>
      s"CASE WHEN ntok = 0 THEN 0.0 ELSE (" +
        (1 to L).map(i => s"h${i}_$r * m$i").mkString(" + ") +
        s") / cast(ntok as double) END").mkString(",\n      ")
    s"""${p}t0 AS (
       |  SELECT $ids, regexp_split_to_array($trimmed, '\\s+') AS arr,
       |    CASE WHEN length($trimmed) = 0 THEN 0
       |         ELSE least(len(regexp_split_to_array($trimmed, '\\s+')), $L) END AS ntok
       |  FROM $rel),
       |${p}tk AS (SELECT $ids, ntok, $slots, $masks FROM ${p}t0),
       |${p}cn AS (SELECT $ids, ntok, $mlist,
       |      $cnts
       |  FROM ${p}tk),
       |${p}h0x AS (SELECT $ids, ntok, $mlist,
       |      $hs
       |  FROM ${p}cn),
       |${blockSqls.mkString(",\n")},
       |${p}x AS (
       |  SELECT $ids, [$pool] AS x FROM $lastCte),
       |${p}n AS (
       |  SELECT $ids, x,
       |    list_reduce(list_transform(x, v -> v*v), (a,b) -> a+b) AS nrm2
       |  FROM ${p}x),
       |${p}v AS (
       |  SELECT $ids,
       |    CASE WHEN nrm2 > 0
       |         THEN list_transform(x, v -> cast(cast(v * (1.0/sqrt(nrm2)) as float) as double))
       |         ELSE x END AS v,
       |    nrm2
       |  FROM ${p}n)""".stripMargin
  }

  /** The engine-lifecycle search replay (chunker + hash-embed + cosine
    * top-k + hydration, q64's oracle). Shared by q150: a restored snapshot
    * must search EXACTLY like the engine the snapshot was taken from. */
  /** q120/q219's replay: the LetterEmbedder lifecycle relationally. */
  private lazy val letterLifecycleSql: String = {

      val qvalues = searchTexts.zipWithIndex
        .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${letterEmbedSql("ch", "chunk_id, doc_id", "chunk", "e")},
         |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
         |${letterEmbedSql("q0", "query_id, query", "query", "qe")},
         |scored AS (
         |  SELECT q.query_id, q.query, n.doc_id,
         |    round(CASE WHEN n.nrm2 = 0 OR q.nrm2 = 0 THEN 0.0
         |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
         |  FROM ev n CROSS JOIN qev q),
         |best AS (
         |  SELECT query_id, query, doc_id, max(score) AS score
         |  FROM scored GROUP BY ALL),
         |ranked AS (
         |  SELECT query_id, query, doc_id, score,
         |    cast(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) as int) AS rank
         |  FROM best QUALIFY rank <= 4)
         |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
         |ORDER BY query_id, rank""".stripMargin
  }

  /** q212's replay: the chunked vector ranking (lifecycle CTEs), the
    * integral BM25 ranking, and the reciprocal-rank fusion — all
    * relational, so the engine's hybridSearch is hash-checked end-to-end. */
  private lazy val hybridSearchSql: String = {
    val qvalues = searchTexts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    val qtvalues = searchTexts.zipWithIndex.flatMap { case (q, i) =>
      q.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => s"(cast($i as bigint), '${t.replace("'", "''")}')")
    }.mkString(", ")
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
       |  FROM documents WHERE length(text) > 0),
       |ch AS (
       |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
       |    substring(text, cast(pos*64+1 as int), 128) AS chunk
       |  FROM c),
       |${embedSql("ch", "chunk_id, doc_id", "chunk")},
       |nv AS (
       |  SELECT chunk_id, doc_id,
       |    CASE WHEN nrm > 0
       |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
       |         ELSE cv END AS v,
       |    nrm
       |  FROM vec),
       |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
       |qtok AS (
       |  SELECT query_id, query, unnest(regexp_split_to_array(trim(query), '\\s+')) AS tk
       |  FROM q0),
       |qhv AS (
       |  SELECT query_id, query, ${tokBucket("tk")} AS bucket, ${tokSign("tk")} AS sgn
       |  FROM qtok WHERE tk <> ''),
       |qcnt AS (
       |  SELECT query_id, query, bucket, cast(sum(sgn) as double) AS s
       |  FROM qhv GROUP BY ALL),
       |qdense AS (
       |  SELECT q0.query_id, q0.query, list(coalesce(c.s, 0.0) ORDER BY g.j) AS cv
       |  FROM q0
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
       |  LEFT JOIN qcnt c ON c.query_id = q0.query_id AND c.bucket = g.j
       |  GROUP BY ALL),
       |qvec AS (
       |  SELECT query_id, query, cv,
       |    sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM qdense),
       |qnv AS (
       |  SELECT query_id, query,
       |    CASE WHEN nrm > 0
       |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
       |         ELSE cv END AS v,
       |    nrm
       |  FROM qvec),
       |scored AS (
       |  SELECT q.query_id, n.doc_id,
       |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
       |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
       |  FROM nv n CROSS JOIN qnv q),
       |best AS (
       |  SELECT query_id, doc_id, max(score) AS score
       |  FROM scored GROUP BY ALL),
       |vrank AS (
       |  SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS vec_rank
       |  FROM best QUALIFY vec_rank <= 100),
       |ltok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS ltk
       |  FROM documents WHERE length(trim(text)) > 0),
       |dl AS (SELECT doc_id, count(*) AS dl FROM ltok GROUP BY doc_id),
       |corp AS (SELECT count(*) AS n_docs, sum(dl) AS t_toks FROM dl),
       |qt AS (SELECT * FROM (VALUES $qtvalues) t(query_id, ltk)),
       |tf AS (
       |  SELECT doc_id, ltk, count(*) AS tf FROM ltok
       |  WHERE ltk IN (SELECT DISTINCT ltk FROM qt) GROUP BY doc_id, ltk),
       |dft AS (SELECT ltk, count(*) AS df FROM tf GROUP BY ltk),
       |bm AS (
       |  SELECT q.query_id, x.doc_id, sum((x.idf_bp * x.tf_bp) // 10000) AS bm25_bp
       |  FROM (
       |    SELECT doc_id, ltk,
       |      10000 * (length(bin(s)) - 1)
       |        + (10000 * (s - (1::BIGINT << (length(bin(s)) - 1))))
       |          // (1::BIGINT << (length(bin(s)) - 1)) - 100000 AS idf_bp,
       |      tf_bp
       |    FROM (
       |      SELECT t.doc_id, t.ltk,
       |        (1024 * (2*c2.n_docs + 2)) // (2*d.df + 1) AS s,
       |        (10000 * 22 * c2.t_toks * t.tf)
       |          // (10 * c2.t_toks * t.tf + 3 * c2.t_toks + 9 * l.dl * c2.n_docs) AS tf_bp
       |      FROM tf t JOIN dft d USING (ltk) JOIN dl l USING (doc_id) CROSS JOIN corp c2) y) x
       |  JOIN qt q ON q.ltk = x.ltk
       |  GROUP BY q.query_id, x.doc_id),
       |lex AS (
       |  SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY bm25_bp DESC, doc_id ASC) AS lex_rank
       |  FROM bm QUALIFY lex_rank <= 100),
       |f AS (
       |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    coalesce(l.lex_rank, 0) AS lex_rank0,
       |    coalesce(v.vec_rank, 0) AS vec_rank0,
       |    coalesce(1000000 // (60 + l.lex_rank), 0)
       |      + coalesce(1000000 // (60 + v.vec_rank), 0) AS rrf_ppm
       |  FROM lex l FULL OUTER JOIN vrank v
       |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, lex_rank0, vec_rank0, rrf_ppm,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_ppm DESC, doc_id ASC) as int) AS rank
       |  FROM f QUALIFY rank <= 4)
       |SELECT r.query_id, q.query, r.doc_id,
       |  cast(r.lex_rank0 as bigint) AS lex_rank,
       |  cast(r.vec_rank0 as bigint) AS vec_rank,
       |  cast(r.rrf_ppm as bigint) AS rrf_ppm, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r
       |JOIN (SELECT * FROM (VALUES $qvalues) t(query_id, query)) q
       |  ON q.query_id = r.query_id
       |JOIN documents d ON d.doc_id = r.doc_id
       |ORDER BY r.query_id, r.rank""".stripMargin
  }

  /** q261's oracle: [[hybridSearchSql]]'s vector + BM25 replays, PLUS a
    * sparse tf·idf ranking over the same tf/dft/corp CTEs, fused 3-way by
    * the integer-ppm RRF. Surgery is require-pinned on both anchors; the
    * sparse chain omits qtf because every searchText's tokens are
    * distinct (require-pinned too — a repeated token would need the qtf
    * factor sparseSearchSqlFor carries). */
  private lazy val hybridMultiSql: String = {
    require(searchTexts.forall { q =>
      val t = q.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      t.distinct.length == t.length
    }, "hybridMultiSql's qtf=1 simplification needs distinct query tokens")
    val lexAnchor = "FROM bm QUALIFY lex_rank <= 100),"
    val fuseAnchor = "\nf AS ("
    require(hybridSearchSql.contains(lexAnchor) &&
      hybridSearchSql.indexOf(fuseAnchor) == hybridSearchSql.lastIndexOf(fuseAnchor) &&
      hybridSearchSql.contains(fuseAnchor),
      "hybridSearchSql moved — re-anchor hybridMultiSql")
    val sparseCtes =
      """spsc AS (
        |  SELECT q.query_id, x.doc_id,
        |    sum(x.tf * ((x.idf_bp * x.idf_bp) // 10000)) AS score_bp
        |  FROM (
        |    SELECT doc_id, ltk, tf,
        |      10000 * (length(bin(s)) - 1)
        |        + (10000 * (s - (1::BIGINT << (length(bin(s)) - 1))))
        |          // (1::BIGINT << (length(bin(s)) - 1)) - 100000 AS idf_bp
        |    FROM (
        |      SELECT t.doc_id, t.ltk, t.tf,
        |        (1024 * (2*c2.n_docs + 2)) // (2*d.df + 1) AS s
        |      FROM tf t JOIN dft d USING (ltk) CROSS JOIN corp c2) y) x
        |  JOIN qt q ON q.ltk = x.ltk
        |  GROUP BY q.query_id, x.doc_id),
        |srank AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_bp DESC, doc_id ASC) AS sp_rank
        |  FROM spsc QUALIFY sp_rank <= 100),""".stripMargin
    val tail =
      """f AS (
        |  SELECT query_id, doc_id,
        |    coalesce(max(lex_rank), 0) AS lex_rank0,
        |    coalesce(max(vec_rank), 0) AS vec_rank0,
        |    coalesce(max(sp_rank), 0) AS sp_rank0,
        |    coalesce(1000000 // (60 + max(lex_rank)), 0)
        |      + coalesce(1000000 // (60 + max(vec_rank)), 0)
        |      + coalesce(1000000 // (60 + max(sp_rank)), 0) AS rrf_ppm
        |  FROM (
        |    SELECT query_id, doc_id, lex_rank,
        |      cast(NULL as bigint) AS vec_rank, cast(NULL as bigint) AS sp_rank
        |    FROM lex
        |    UNION ALL SELECT query_id, doc_id, cast(NULL as bigint), vec_rank,
        |      cast(NULL as bigint) FROM vrank
        |    UNION ALL SELECT query_id, doc_id, cast(NULL as bigint),
        |      cast(NULL as bigint), sp_rank FROM srank) u
        |  GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT query_id, doc_id, lex_rank0, vec_rank0, sp_rank0, rrf_ppm,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_ppm DESC, doc_id ASC) as int) AS rank
        |  FROM f QUALIFY rank <= 4)
        |SELECT r.query_id, q.query, r.doc_id,
        |  cast(r.lex_rank0 as bigint) AS lex_rank,
        |  cast(r.vec_rank0 as bigint) AS vec_rank,
        |  cast(r.sp_rank0 as bigint) AS sparse_rank,
        |  cast(r.rrf_ppm as bigint) AS rrf_ppm, r.rank,
        |  substring(d.text, 1, 200) AS preview
        |FROM ranked r
        |JOIN (SELECT * FROM (VALUES QVALS) t(query_id, query)) q
        |  ON q.query_id = r.query_id
        |JOIN documents d ON d.doc_id = r.doc_id
        |ORDER BY r.query_id, r.rank""".stripMargin
    val qvalues = searchTexts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    val withSparse = hybridSearchSql.replace(lexAnchor, lexAnchor + "\n" + sparseCtes)
    withSparse.substring(0, withSparse.indexOf(fuseAnchor)) +
      tail.replace("QVALS", qvalues)
  }

  /** q156/q230's replay: the checkpoint linear-layer lifecycle — chunk →
    * char-counts → W·c (seed-derived literals) → float-normalize → cosine
    * top-k → hydration, all relational. */
  private lazy val fileEmbedderLifecycleSql: String = {
    val qvalues = searchTexts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
       |  FROM documents WHERE length(text) > 0),
       |ch AS (
       |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
       |    substring(text, cast(pos*64+1 as int), 128) AS chunk
       |  FROM c),
       |${matrixEmbedSql("ch", "chunk_id, doc_id", "chunk", "e")},
       |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
       |${matrixEmbedSql("q0", "query_id, query", "query", "qe")},
       |scored AS (
       |  SELECT q.query_id, q.query, n.doc_id,
       |    round(CASE WHEN n.nrm2 = 0 OR q.nrm2 = 0 THEN 0.0
       |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
       |  FROM ev n CROSS JOIN qev q),
       |best AS (
       |  SELECT query_id, query, doc_id, max(score) AS score
       |  FROM scored GROUP BY ALL),
       |ranked AS (
       |  SELECT query_id, query, doc_id, score,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) as int) AS rank
       |  FROM best QUALIFY rank <= 4)
       |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q232's replay: hybridSearchSql's scoring CTEs (per-doc best vector
    * score + integral BM25) with the WeightedRanker fusion instead of RRF —
    * per-query min-max normalization to [0, 10000] bp, weights 7000/3000.
    * Built by surgery on [[hybridSearchSql]] (the scoring prefix is shared
    * by construction); the requires pin the surgery keys so a prefix edit
    * can't silently leave the RRF tail in place. */
  private lazy val weightedHybridSql: String = {
    val vrankKey =
      """vrank AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id ASC) AS vec_rank
        |  FROM best QUALIFY vec_rank <= 100),""".stripMargin
    val vpool =
      """vpool AS (
        |  SELECT query_id, doc_id, cast(floor(score * 10000 + 0.5) as bigint) AS vs,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id ASC) AS vec_rank
        |  FROM best QUALIFY vec_rank <= 100),""".stripMargin
    val lexKey = "lex AS (" // the RRF tail starts here; everything after is replaced
    val tail =
      """lpool AS (
        |  SELECT query_id, doc_id, bm25_bp,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25_bp DESC, doc_id ASC) AS lex_rank
        |  FROM bm QUALIFY lex_rank <= 100),
        |lstat AS (SELECT query_id, min(bm25_bp) AS lmn, max(bm25_bp) AS lmx
        |          FROM lpool GROUP BY query_id),
        |vstat AS (SELECT query_id, min(vs) AS vmn, max(vs) AS vmx
        |          FROM vpool GROUP BY query_id),
        |f AS (
        |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
        |    coalesce(l.doc_id, v.doc_id) AS doc_id,
        |    CASE WHEN l.doc_id IS NULL THEN 0
        |         WHEN s.lmx > s.lmn THEN (10000 * (l.bm25_bp - s.lmn)) // (s.lmx - s.lmn)
        |         ELSE 10000 END AS lex_norm_bp,
        |    CASE WHEN v.doc_id IS NULL THEN 0
        |         WHEN t.vmx > t.vmn THEN (10000 * (v.vs - t.vmn)) // (t.vmx - t.vmn)
        |         ELSE 10000 END AS vec_norm_bp
        |  FROM lpool l FULL OUTER JOIN vpool v
        |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id
        |  LEFT JOIN lstat s ON s.query_id = coalesce(l.query_id, v.query_id)
        |  LEFT JOIN vstat t ON t.query_id = coalesce(l.query_id, v.query_id)),
        |ranked AS (
        |  SELECT query_id, doc_id, lex_norm_bp, vec_norm_bp,
        |    (7000 * lex_norm_bp + 3000 * vec_norm_bp) // 10000 AS fused_bp,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY (7000 * lex_norm_bp + 3000 * vec_norm_bp) // 10000 DESC,
        |        doc_id ASC) as int) AS rank
        |  FROM f QUALIFY rank <= 4)
        |SELECT r.query_id, q.query, r.doc_id,
        |  cast(r.lex_norm_bp as bigint) AS lex_norm_bp,
        |  cast(r.vec_norm_bp as bigint) AS vec_norm_bp,
        |  cast(r.fused_bp as bigint) AS fused_bp, r.rank,
        |  substring(d.text, 1, 200) AS preview
        |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
        |JOIN q0 q ON q.query_id = r.query_id
        |ORDER BY r.query_id, r.rank""".stripMargin
    require(hybridSearchSql.contains(vrankKey), "q232 surgery: vrank key drifted")
    val base = hybridSearchSql.replace(vrankKey, vpool)
    val at = base.indexOf(lexKey)
    require(at >= 0, "q232 surgery: lex key drifted")
    base.substring(0, at) + tail
  }

  private lazy val lifecycleSearchSql: String = {
    // chunker replay (q15's oracle spelling, size=128/overlap=64), then
    // the hash-embed replay for chunks and queries, then search replay
    val qvalues = searchTexts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
       |  FROM documents WHERE length(text) > 0),
       |ch AS (
       |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
       |    substring(text, cast(pos*64+1 as int), 128) AS chunk
       |  FROM c),
       |${embedSql("ch", "chunk_id, doc_id", "chunk")},
       |nv AS (
       |  SELECT chunk_id, doc_id,
       |    CASE WHEN nrm > 0
       |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
       |         ELSE cv END AS v,
       |    nrm
       |  FROM vec),
       |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
       |qtok AS (
       |  SELECT query_id, query, unnest(regexp_split_to_array(trim(query), '\\s+')) AS tk
       |  FROM q0),
       |qhv AS (
       |  SELECT query_id, query, ${tokBucket("tk")} AS bucket, ${tokSign("tk")} AS sgn
       |  FROM qtok WHERE tk <> ''),
       |qcnt AS (
       |  SELECT query_id, query, bucket, cast(sum(sgn) as double) AS s
       |  FROM qhv GROUP BY ALL),
       |qdense AS (
       |  SELECT q0.query_id, q0.query, list(coalesce(c.s, 0.0) ORDER BY g.j) AS cv
       |  FROM q0
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
       |  LEFT JOIN qcnt c ON c.query_id = q0.query_id AND c.bucket = g.j
       |  GROUP BY ALL),
       |qvec AS (
       |  SELECT query_id, query, cv,
       |    sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM qdense),
       |qnv AS (
       |  SELECT query_id, query,
       |    CASE WHEN nrm > 0
       |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
       |         ELSE cv END AS v,
       |    nrm
       |  FROM qvec),
       |scored AS (
       |  SELECT q.query_id, q.query, n.doc_id,
       |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
       |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
       |  FROM nv n CROSS JOIN qnv q),
       |best AS (
       |  SELECT query_id, query, doc_id, max(score) AS score
       |  FROM scored GROUP BY ALL),
       |ranked AS (
       |  SELECT query_id, query, doc_id, score,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) as int) AS rank
       |  FROM best QUALIFY rank <= 4)
       |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q252's oracle: [[lifecycleSearchSql]]'s chunk/embed/score replay with
    * the ranking stage swapped for the decay-reranked one — per-doc best
    * vector score × linear decay over n_chars (origin 300, scale 200,
    * offset 25 — the graded call's parameters), re-ranked top-4. The
    * surgery is require-pinned: if the lifecycle oracle's `best`/`ranked`
    * spelling ever changes, this fails loudly instead of drifting. */
  private lazy val decaySearchSql: String = {
    val marker = "best AS ("
    require(lifecycleSearchSql.contains(marker),
      "lifecycleSearchSql lost its `best AS (` CTE — re-anchor decaySearchSql")
    val prefix = lifecycleSearchSql.substring(0, lifecycleSearchSql.indexOf(marker))
    prefix +
      """best AS (
        |  SELECT query_id, query, doc_id, max(score) AS vscore
        |  FROM scored GROUP BY ALL),
        |dk AS (
        |  SELECT b.query_id, b.query, b.doc_id,
        |    round(b.vscore * greatest(0.0,
        |      (200.0 - greatest(abs(cast(d.n_chars as double) - 300.0) - 25.0,
        |                        0.0)) / 200.0), 4) AS score
        |  FROM best b JOIN documents d ON d.doc_id = b.doc_id),
        |ranked AS (
        |  SELECT query_id, query, doc_id, score,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id ASC) as int) AS rank
        |  FROM dk QUALIFY rank <= 4)
        |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
        |  substring(d.text, 1, 200) AS preview
        |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
        |ORDER BY query_id, rank""".stripMargin
  }

  /** Shared oracle prefix for the engine's seeded-quantizer index types
    * (q203 IVF_PQ, q205 IVF_SQ8): lifecycle chunk/embed CTEs, query embed,
    * seeded centroid VALUES, rounded-cosine cell assignment and the
    * nprobe-cell probe window — everything up to the compressed scoring,
    * which each index type appends. */
  private def engineSeededPrefixSql(nprobe: Int): String = {
    val qvalues = searchTexts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    val cents = graft.operators.Dedup.hyperplanes(64, 16, 7L)
    val centRows = cents.zipWithIndex.map { case (c, cell) =>
      s"($cell, [${c.map(f => f.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n")
    s"""c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
       |  FROM documents WHERE length(text) > 0),
       |ch AS (
       |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
       |    substring(text, cast(pos*64+1 as int), 128) AS chunk
       |  FROM c),
       |${embedSql("ch", "chunk_id, doc_id", "chunk")},
       |nv AS (
       |  SELECT chunk_id, doc_id,
       |    CASE WHEN nrm > 0
       |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
       |         ELSE cv END AS v,
       |    nrm
       |  FROM vec),
       |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
       |qtok AS (
       |  SELECT query_id, query, unnest(regexp_split_to_array(trim(query), '\\s+')) AS tk
       |  FROM q0),
       |qhv AS (
       |  SELECT query_id, query, ${tokBucket("tk")} AS bucket, ${tokSign("tk")} AS sgn
       |  FROM qtok WHERE tk <> ''),
       |qcnt AS (
       |  SELECT query_id, query, bucket, cast(sum(sgn) as double) AS s
       |  FROM qhv GROUP BY ALL),
       |qdense AS (
       |  SELECT q0.query_id, q0.query, list(coalesce(c.s, 0.0) ORDER BY g.j) AS cv
       |  FROM q0
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
       |  LEFT JOIN qcnt c ON c.query_id = q0.query_id AND c.bucket = g.j
       |  GROUP BY ALL),
       |qvec AS (
       |  SELECT query_id, query, cv,
       |    sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS nrm
       |  FROM qdense),
       |qnv AS (
       |  SELECT query_id, query,
       |    CASE WHEN nrm > 0
       |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
       |         ELSE cv END AS v,
       |    nrm
       |  FROM qvec),
       |cent(cell, cvec) AS (VALUES
       |$centRows),
       |assigned AS (
       |  SELECT chunk_id, cell FROM (
       |    SELECT n.chunk_id, cent.cell,
       |      row_number() OVER (PARTITION BY n.chunk_id
       |        ORDER BY round(CASE WHEN n.nrm = 0 THEN 0.0
       |          ELSE list_cosine_similarity(n.v, cent.cvec) END, 4) DESC,
       |          cent.cell ASC) AS arank
       |    FROM nv n, cent) WHERE arank = 1),
       |probed AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, cent.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY list_cosine_similarity(q.v, cent.cvec) DESC,
       |          cent.cell ASC) AS crank
       |    FROM qnv q, cent) WHERE crank <= $nprobe)""".stripMargin
  }

  /** q203: the IVF_PQ-served engine search replayed end-to-end — the shared
    * seeded prefix + seeded PQ codebooks, ADC cut and exact re-rank
    * (VectorQueries' ivfPqOracleSql shape over CHUNK vectors). */
  private lazy val enginePqSearchSql: String = {
    val books = graft.operators.VectorSearch.pqCodebooks(64, 4, 8, 11L)
    val cwRows = (for ((cws, sIdx) <- books.zipWithIndex; (cw, code) <- cws.zipWithIndex)
      yield s"($sIdx, $code, [${cw.map(f => f.toDouble.toString).mkString(", ")}])")
      .mkString(",\n")
    s"""WITH ${engineSeededPrefixSql(4)},
       |cw(s, code, pv) AS (VALUES
       |$cwRows),
       |cscore AS (
       |  SELECT n.chunk_id, cw.s, cw.code,
       |    round(list_reduce(list_transform(generate_series(1, 16), j ->
       |      (n.v[cw.s*16 + j] - cw.pv[j]) * (n.v[cw.s*16 + j] - cw.pv[j])),
       |      (a, b) -> a + b), 4) AS d
       |  FROM nv n, cw),
       |codes AS (
       |  SELECT chunk_id, s, code FROM cscore
       |  QUALIFY row_number() OVER (PARTITION BY chunk_id, s
       |    ORDER BY d ASC, code ASC) = 1),
       |lut AS (
       |  SELECT q.query_id, cw.s, cw.code,
       |    round(list_reduce(list_transform(generate_series(1, 16), j ->
       |      (q.v[cw.s*16 + j] - cw.pv[j]) * (q.v[cw.s*16 + j] - cw.pv[j])),
       |      (a, b) -> a + b), 4) AS d
       |  FROM qnv q, cw),
       |cand0 AS (
       |  SELECT p.query_id, a.chunk_id
       |  FROM assigned a JOIN probed p ON a.cell = p.cell),
       |acc AS (
       |  SELECT c0.query_id, c0.chunk_id, sum(cast(l.d as decimal(18,4))) AS sdec
       |  FROM cand0 c0
       |  JOIN codes k ON k.chunk_id = c0.chunk_id
       |  JOIN lut l ON l.query_id = c0.query_id AND l.s = k.s AND l.code = k.code
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, chunk_id FROM acc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY sdec ASC, chunk_id ASC) <= 20),
       |rer AS (
       |  SELECT q.query_id, q.query, n.doc_id,
       |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
       |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
       |  FROM cand cd
       |  JOIN nv n ON n.chunk_id = cd.chunk_id
       |  JOIN qnv q ON q.query_id = cd.query_id),
       |best AS (
       |  SELECT query_id, query, doc_id, max(score) AS score
       |  FROM rer GROUP BY ALL),
       |ranked AS (
       |  SELECT query_id, query, doc_id, score,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) as int) AS rank
       |  FROM best QUALIFY rank <= 4)
       |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q205: the IVF_SQ8-served engine search replayed end-to-end — the
    * shared seeded prefix + exact per-dim bounds, affine byte quantization,
    * reconstruction, probe-pruned asymmetric scoring (q145's SQ8 spelling
    * over CHUNK vectors), per-doc best, top-k, hydration. */
  private lazy val engineSq8SearchSql: String =
    s"""WITH ${engineSeededPrefixSql(4)},
       |cox AS (
       |  SELECT chunk_id, doc_id, i, v[i] AS x
       |  FROM nv, unnest(generate_series(1, 64)) AS u(i)),
       |b AS (SELECT i, min(x) AS mn, max(x) AS mx FROM cox GROUP BY i),
       |rec AS (
       |  SELECT chunk_id, doc_id, list(mn + (CASE WHEN mx = mn THEN 0.0
       |      ELSE floor((x - mn) * 255.0 / (mx - mn) + 0.5) END)
       |      * (mx - mn) / 255.0 ORDER BY i) AS rv
       |  FROM cox JOIN b USING (i) GROUP BY chunk_id, doc_id),
       |sc AS (
       |  SELECT p.query_id, q.query, r.doc_id,
       |    round(list_cosine_similarity(r.rv, q.v), 4) AS score
       |  FROM rec r
       |  JOIN assigned a USING (chunk_id)
       |  JOIN probed p ON p.cell = a.cell
       |  JOIN qnv q ON q.query_id = p.query_id),
       |best AS (
       |  SELECT query_id, query, doc_id, max(score) AS score
       |  FROM sc GROUP BY ALL),
       |ranked AS (
       |  SELECT query_id, query, doc_id, score,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) as int) AS rank
       |  FROM best QUALIFY rank <= 4)
       |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |ORDER BY query_id, rank""".stripMargin

  /** q207: the radius verb replayed — chunk/embed prefix (the seeded
    * prefix's quantizer CTEs go unreferenced and unevaluated), chunk-level
    * scoring with the zero-norm guard, threshold filter, per-doc census. */
  private lazy val engineRadiusSql: String =
    s"""WITH ${engineSeededPrefixSql(4)},
       |scored AS (
       |  SELECT q.query_id, q.query, n.doc_id,
       |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
       |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
       |  FROM nv n CROSS JOIN qnv q),
       |hits AS (
       |  SELECT query_id, query, doc_id, max(score) AS score,
       |    count(*) AS n_chunks
       |  FROM scored WHERE score >= 0.3 GROUP BY ALL)
       |SELECT query_id, query, doc_id, score, cast(n_chunks as bigint) AS n_chunks
       |FROM hits ORDER BY query_id, score DESC, doc_id""".stripMargin

  /** q238: the sparse inner-product replay — corpus tokenize → per-doc tf
    * over the query's terms → exact df → the engine's piecewise-linear
    * integer log2 idf → Σ qtf·tf·(idf_bp² DIV 10⁴) → top-4 per query
    * (score desc, pk asc), hydrated. The idf spelling is byte-shared with
    * the BM25 oracles (q121/q212) — `bin()`/`<<`/`//` agree with Spark's
    * `bin()`/`shiftleft()`/`DIV` on int64 for s ≥ 1. */
  private lazy val sparseSearchSql: String =
    sparseSearchSqlFor(searchTexts, Set.empty, 4)

  /** Sparse-scoring replay, parameterized by query texts, an analyzer
    * stoplist (applied to BOTH the query-term literals and the document
    * tokenization CTE — the engine's both-sides analyzer contract), and
    * the top-k cut. q238 uses the standard analyzer (empty stoplist, k=4);
    * q247 the english one. */
  private def sparseSearchSqlFor(texts: Seq[String], stop: Set[String],
                                 k: Int, stem: Boolean = false,
                                 lenRange: Option[(Int, Int)] = None): String = {
    val qvalues = texts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    val qtfvalues = texts.zipWithIndex.flatMap { case (q, i) =>
      val base = q.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).filterNot(stop)
      val stemmed =
        if (stem) base.map(graft.functions.TextFns.minEnglishStem(_: String)) else base
      // the length filter drops out-of-range QUERY terms too (both sides
      // of the analyzer contract, Engine.analyzeTerms's order: len LAST)
      val analyzed = lenRange.fold(stemmed.toSeq) { case (lo, hi) =>
        stemmed.toSeq.filter(t => t.length >= lo && t.length <= hi) }
      analyzed
        .groupBy(identity).toSeq.sortBy(_._1)
        .map { case (t, g) =>
          s"(cast($i as bigint), '${t.replace("'", "''")}', cast(${g.length} as bigint))"
        }
    }.mkString(", ")
    val stopWhere =
      if (stop.isEmpty) ""
      else stop.toSeq.sorted.map(s => s"'$s'")
        .mkString("\n  WHERE ltk NOT IN (", ", ", ")")
    // the stem wraps the stop-filtered stream (Lucene's filter order)
    val proj =
      if (stem) graft.functions.TextFns.minEnglishStemSql("ltk") + " AS ltk"
      else "ltk"
    // the length filter wraps the POST-stem stream (an outer select — the
    // stop WHERE sees the pre-stem token, the len filter the final one)
    val ltokBody =
      s"""  SELECT doc_id, $proj FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS ltk
         |    FROM documents WHERE length(trim(text)) > 0) u$stopWhere""".stripMargin
    val ltokCte = lenRange match {
      case Some((lo, hi)) =>
        s"""  SELECT doc_id, ltk FROM (
           |$ltokBody) v
           |  WHERE length(ltk) >= $lo AND length(ltk) <= $hi""".stripMargin
      case None => ltokBody
    }
    s"""WITH q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
       |qt AS (SELECT * FROM (VALUES $qtfvalues) t(query_id, ltk, qtf)),
       |ltok AS (
       |$ltokCte),
       |corp AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ltok),
       |tf AS (
       |  SELECT doc_id, ltk, count(*) AS tf FROM ltok
       |  WHERE ltk IN (SELECT DISTINCT ltk FROM qt) GROUP BY doc_id, ltk),
       |dft AS (SELECT ltk, count(*) AS df FROM tf GROUP BY ltk),
       |sp AS (
       |  SELECT q.query_id, x.doc_id,
       |    cast(sum(q.qtf * x.tf * ((x.idf_bp * x.idf_bp) // 10000)) as bigint) AS score_bp
       |  FROM (
       |    SELECT doc_id, ltk, tf,
       |      10000 * (length(bin(s)) - 1)
       |        + (10000 * (s - (1::BIGINT << (length(bin(s)) - 1))))
       |          // (1::BIGINT << (length(bin(s)) - 1)) - 100000 AS idf_bp
       |    FROM (
       |      SELECT t.doc_id, t.ltk, t.tf,
       |        (1024 * (2*c2.n_docs + 2)) // (2*d.df + 1) AS s
       |      FROM tf t JOIN dft d USING (ltk) CROSS JOIN corp c2) y) x
       |  JOIN qt q ON q.ltk = x.ltk
       |  GROUP BY q.query_id, x.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score_bp,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_bp DESC, doc_id ASC) as int) AS rank
       |  FROM sp QUALIFY rank <= $k)
       |SELECT r.query_id, q.query, r.doc_id, r.score_bp, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |JOIN q0 q ON q.query_id = r.query_id
       |ORDER BY r.query_id, r.rank""".stripMargin
  }

  /** q288's replay: [[sparseSearchSqlFor]]'s integral sparse scoring, with
    * BOTH sides of the analyzer running the full Porter2 stemmer — query
    * terms through the Scala [[graft.functions.Porter2.stem]] (literals),
    * document tokens through the per-step CTE chain
    * [[graft.functions.Porter2.sqlCtes]] (DuckDB has no Snowball without
    * the FTS extension, which zero-egress cannot install — the chain IS
    * the published algorithm, one CTE per step). `docsCte` supplies the
    * corpus (q288 appends derivational forms to every fifth doc). */
  private def porterSparseSearchSql(texts: Seq[String], k: Int,
                                    docsCte: String): String = {
    val stop = graft.Engine.englishStopwords
    val qvalues = texts.zipWithIndex
      .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
      .mkString(", ")
    val qtfvalues = texts.zipWithIndex.flatMap { case (q, i) =>
      q.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).filterNot(stop)
        .map(graft.functions.Porter2.stem).toSeq
        .groupBy(identity).toSeq.sortBy(_._1)
        .map { case (t, g) =>
          s"(cast($i as bigint), '${t.replace("'", "''")}', cast(${g.length} as bigint))"
        }
    }.mkString(", ")
    val stopIn = stop.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    s"""WITH docs2 AS (
       |$docsCte),
       |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
       |qt AS (SELECT * FROM (VALUES $qtfvalues) t(query_id, ltk, qtf)),
       |tok0 AS (
       |  SELECT doc_id, ltk FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS ltk
       |    FROM docs2 WHERE length(trim(text)) > 0) u
       |  WHERE ltk NOT IN ($stopIn)),
       |${graft.functions.Porter2.sqlCtes("tok0", "doc_id", "ltk", "ps")},
       |ltok AS (SELECT doc_id, tok AS ltk FROM psout),
       |corp AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ltok),
       |tf AS (
       |  SELECT doc_id, ltk, count(*) AS tf FROM ltok
       |  WHERE ltk IN (SELECT DISTINCT ltk FROM qt) GROUP BY doc_id, ltk),
       |dft AS (SELECT ltk, count(*) AS df FROM tf GROUP BY ltk),
       |sp AS (
       |  SELECT q.query_id, x.doc_id,
       |    cast(sum(q.qtf * x.tf * ((x.idf_bp * x.idf_bp) // 10000)) as bigint) AS score_bp
       |  FROM (
       |    SELECT doc_id, ltk, tf,
       |      10000 * (length(bin(s)) - 1)
       |        + (10000 * (s - (1::BIGINT << (length(bin(s)) - 1))))
       |          // (1::BIGINT << (length(bin(s)) - 1)) - 100000 AS idf_bp
       |    FROM (
       |      SELECT t.doc_id, t.ltk, t.tf,
       |        (1024 * (2*c2.n_docs + 2)) // (2*d.df + 1) AS s
       |      FROM tf t JOIN dft d USING (ltk) CROSS JOIN corp c2) y) x
       |  JOIN qt q ON q.ltk = x.ltk
       |  GROUP BY q.query_id, x.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score_bp,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_bp DESC, doc_id ASC) as int) AS rank
       |  FROM sp QUALIFY rank <= $k)
       |SELECT r.query_id, q.query, r.doc_id, r.score_bp, r.rank,
       |  substring(d.text, 1, 200) AS preview
       |FROM ranked r JOIN docs2 d ON d.doc_id = r.doc_id
       |JOIN q0 q ON q.query_id = r.query_id
       |ORDER BY r.query_id, r.rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q203_engine_ivfpq" -> enginePqSearchSql,
    "q205_engine_ivfsq8" -> engineSq8SearchSql,
    "q207_engine_radius" -> engineRadiusSql,

    // the full lifecycle replay over the SURVIVOR corpus — the maintained
    // layout must serve exactly what a from-scratch build over the
    // survivors would
    "q208_delete_maintained" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      "FROM documents WHERE length(text) > 0 AND doc_id % 7 <> 0"),

    // compaction must be invisible to results: the full-corpus replay
    "q209_compact_serve" -> lifecycleSearchSql,

    // filtered search: the oracle chunks and scores ONLY the eligible
    // (lang='en') documents — equal to indexing everything and gating
    // candidates before top-k, the engine's pre-filter shape
    "q210_filtered_search" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      "FROM documents WHERE length(text) > 0 AND lang = 'en'"),

    // the expr STRING replays as the equivalent SQL eligibility filter
    "q258_search_expr" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      "FROM documents WHERE length(text) > 0 AND lang IN ('en', 'de') AND n_chars > 250"),

    // post-drop serving is the exact scan: the full-corpus replay (the
    // pre-drop nprobe=8 layout would NOT replay this way — the drop is
    // what makes the oracle hold)
    "q259_drop_index" -> lifecycleSearchSql,

    // a rename moves bytes' NAMES only: the full-corpus replay
    "q260_rename_collection" -> lifecycleSearchSql,

    // all three rankings and the 3-way RRF fusion replay relationally
    "q261_hybrid_multi" -> hybridMultiSql,

    // both dense fields replay component-wise from the digests (the text
    // field salts with 't:'; the image field is the Multimodal stub's
    // sha256-of-payload recipe), then each pool ranks by rounded cosine
    // and the RRF fusion replays in integers
    "q290_multi_vector" -> {
      def dig(src: String) = (0 until 8).map(j =>
        s"cast(cast('0x' || substr(sha256($src), ${j * 8 + 1}, 8) as bigint) " +
          "% 1000 as double)").mkString("[", ", ", "]")
      s"""WITH docs AS (
         |  SELECT doc_id, ${dig("'t:' || text")} AS tv, ${dig("text")} AS iv
         |  FROM documents),
         |tq AS (SELECT tv AS v FROM docs WHERE doc_id = 3),
         |iq AS (SELECT iv AS v FROM docs WHERE doc_id = 11),
         |tpool AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY round(list_cosine_similarity(tv, (SELECT v FROM tq)), 4) DESC,
         |      doc_id ASC) AS r
         |  FROM docs QUALIFY r <= 50),
         |ipool AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY round(list_cosine_similarity(iv, (SELECT v FROM iq)), 4) DESC,
         |      doc_id ASC) AS r
         |  FROM docs QUALIFY r <= 50),
         |pools AS (
         |  SELECT doc_id, 'text_vec' AS field, r FROM tpool
         |  UNION ALL SELECT doc_id, 'img_vec', r FROM ipool),
         |fused AS (
         |  SELECT doc_id,
         |    string_agg(field || ':' || r, ',' ORDER BY field) AS field_ranks,
         |    cast(sum(1000000 // (60 + r)) as bigint) AS rrf_ppm
         |  FROM pools GROUP BY doc_id),
         |ranked AS (
         |  SELECT cast(0 as bigint) AS query_id, doc_id, field_ranks, rrf_ppm,
         |    cast(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id ASC) as int) AS rank
         |  FROM fused QUALIFY rank <= 10)
         |SELECT r.query_id, r.doc_id, r.field_ranks, r.rrf_ppm, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d USING (doc_id)
         |ORDER BY r.rank""".stripMargin
    },

    // q294: both pools replay to integer basis points, min-max per pool,
    // weighted integer fusion — exact in DuckDB's integer arithmetic
    "q294_multi_vector_weighted" -> {
      def dig(src: String) = (0 until 8).map(j =>
        s"cast(cast('0x' || substr(sha256($src), ${j * 8 + 1}, 8) as bigint) " +
          "% 1000 as double)").mkString("[", ", ", "]")
      s"""WITH docs AS (
         |  SELECT doc_id, ${dig("'t:' || text")} AS tv, ${dig("text")} AS iv
         |  FROM documents),
         |tq AS (SELECT tv AS v FROM docs WHERE doc_id = 3),
         |iq AS (SELECT iv AS v FROM docs WHERE doc_id = 11),
         |tpool AS (
         |  SELECT doc_id,
         |    cast(floor(round(list_cosine_similarity(tv, (SELECT v FROM tq)), 4) * 10000 + 0.5) as bigint) AS vs,
         |    row_number() OVER (
         |      ORDER BY round(list_cosine_similarity(tv, (SELECT v FROM tq)), 4) DESC,
         |        doc_id ASC) AS r
         |  FROM docs QUALIFY r <= 50),
         |ipool AS (
         |  SELECT doc_id,
         |    cast(floor(round(list_cosine_similarity(iv, (SELECT v FROM iq)), 4) * 10000 + 0.5) as bigint) AS vs,
         |    row_number() OVER (
         |      ORDER BY round(list_cosine_similarity(iv, (SELECT v FROM iq)), 4) DESC,
         |        doc_id ASC) AS r
         |  FROM docs QUALIFY r <= 50),
         |pools AS (
         |  SELECT doc_id, 'text_vec' AS field, vs, cast(7000 as bigint) AS w FROM tpool
         |  UNION ALL SELECT doc_id, 'img_vec', vs, 3000 FROM ipool),
         |stats AS (
         |  SELECT field, min(vs) AS mn, max(vs) AS mx FROM pools GROUP BY field),
         |normed AS (
         |  SELECT p.doc_id, p.field, p.w,
         |    CASE WHEN s.mx > s.mn THEN (10000 * (p.vs - s.mn)) // (s.mx - s.mn)
         |         ELSE 10000 END AS norm_bp
         |  FROM pools p JOIN stats s USING (field)),
         |fused AS (
         |  SELECT doc_id,
         |    string_agg(field || ':' || norm_bp, ',' ORDER BY field) AS field_scores,
         |    cast(sum(w * norm_bp) // 10000 as bigint) AS fused_bp
         |  FROM normed GROUP BY doc_id),
         |ranked AS (
         |  SELECT cast(0 as bigint) AS query_id, doc_id, field_scores, fused_bp,
         |    cast(row_number() OVER (ORDER BY fused_bp DESC, doc_id ASC) as int) AS rank
         |  FROM fused QUALIFY rank <= 10)
         |SELECT r.query_id, r.doc_id, r.field_scores, r.fused_bp, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d USING (doc_id)
         |ORDER BY r.rank""".stripMargin
    },

    // q293: both request gates replay as per-pool WHERE clauses before
    // the rank windows; the fusion is q290's integer-ppm RRF unchanged
    "q293_multi_vector_filtered" -> {
      def dig(src: String) = (0 until 8).map(j =>
        s"cast(cast('0x' || substr(sha256($src), ${j * 8 + 1}, 8) as bigint) " +
          "% 1000 as double)").mkString("[", ", ", "]")
      s"""WITH docs AS (
         |  SELECT doc_id, lang, n_chars,
         |    ${dig("'t:' || text")} AS tv, ${dig("text")} AS iv
         |  FROM documents),
         |tq AS (SELECT tv AS v FROM docs WHERE doc_id = 3),
         |iq AS (SELECT iv AS v FROM docs WHERE doc_id = 11),
         |tpool AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY round(list_cosine_similarity(tv, (SELECT v FROM tq)), 4) DESC,
         |      doc_id ASC) AS r
         |  FROM docs WHERE lang = 'en' QUALIFY r <= 50),
         |ipool AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY round(list_cosine_similarity(iv, (SELECT v FROM iq)), 4) DESC,
         |      doc_id ASC) AS r
         |  FROM docs WHERE n_chars >= 300 QUALIFY r <= 50),
         |pools AS (
         |  SELECT doc_id, 'text_vec' AS field, r FROM tpool
         |  UNION ALL SELECT doc_id, 'img_vec', r FROM ipool),
         |fused AS (
         |  SELECT doc_id,
         |    string_agg(field || ':' || r, ',' ORDER BY field) AS field_ranks,
         |    cast(sum(1000000 // (60 + r)) as bigint) AS rrf_ppm
         |  FROM pools GROUP BY doc_id),
         |ranked AS (
         |  SELECT cast(0 as bigint) AS query_id, doc_id, field_ranks, rrf_ppm,
         |    cast(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id ASC) as int) AS rank
         |  FROM fused QUALIFY rank <= 10)
         |SELECT r.query_id, r.doc_id, r.field_ranks, r.rrf_ppm, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d USING (doc_id)
         |ORDER BY r.rank""".stripMargin
    },

    // the survivor population replays from the raw corpus — masked and
    // vacuumed reads are require-pinned equal, so one oracle grades both
    "q263_soft_delete" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang <> 'es' AND n_chars > 300
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    // maintenance may move every cell boundary but never a result: the
    // full-corpus replay
    "q211_ivf_maintain" -> lifecycleSearchSql,

    // both rankings and the fusion replayed relationally
    "q212_engine_hybrid" -> hybridSearchSql,

    // q212's replay with the eligibility gate (lang ∈ {en, de}) inserted
    // into both rank CTEs BEFORE their windows; corpus-wide BM25 stats
    // stay unfiltered. Anchors are require-pinned.
    "q272_hybrid_filtered" -> {
      val headKey = "WITH c AS ("
      val vKey = "\n  FROM best QUALIFY vec_rank <= 100),"
      val lKey = "\n  FROM bm QUALIFY lex_rank <= 100),"
      require(hybridSearchSql.contains(headKey) &&
        hybridSearchSql.contains(vKey) && hybridSearchSql.contains(lKey),
        "q272 surgery: a hybridSearchSql anchor drifted")
      hybridSearchSql
        .replace(headKey,
          "WITH elig AS (SELECT doc_id FROM documents WHERE lang IN ('en', 'de')),\nc AS (")
        .replace(vKey, "\n  FROM best JOIN elig USING (doc_id) QUALIFY vec_rank <= 100),")
        .replace(lKey, "\n  FROM bm JOIN elig USING (doc_id) QUALIFY lex_rank <= 100),")
    },

    // the drained pages reassemble the FULL ranking of the first search
    // text: same lifecycle replay, first query only, no top-k cut
    "q227_search_iterator" -> lifecycleSearchSql
      .replace("t(query_id, query))", "t(query_id, query) WHERE query_id = 0)")
      .replace("FROM best QUALIFY rank <= 4)", "FROM best)"),

    // the streamed CDC settles to the lifecycle replay over the MUTATED
    // corpus: scores and previews both re-derive from the new text
    "q228_stream_upsert" -> lifecycleSearchSql
      .replace("WITH c AS (",
        "WITH documents2 AS (\n  SELECT doc_id," +
          " CASE WHEN doc_id % 10 = 0 THEN text || ' graft cdc' ELSE text END AS text" +
          " FROM documents),\nc AS (")
      .replace("FROM documents WHERE length(text) > 0",
        "FROM documents2 WHERE length(text) > 0")
      .replace("JOIN documents d", "JOIN documents2 d"),

    // q229: the MLP-checkpoint lifecycle relationally (q156's shape with
    // the two-layer forward)
    "q229_mlp_checkpoint" -> {
      val qvalues = searchTexts.zipWithIndex
        .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${mlpEmbedSql("ch", "chunk_id, doc_id", "chunk", "e")},
         |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
         |${mlpEmbedSql("q0", "query_id, query", "query", "qe")},
         |scored AS (
         |  SELECT q.query_id, q.query, n.doc_id,
         |    round(CASE WHEN n.nrm2 = 0 OR q.nrm2 = 0 THEN 0.0
         |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
         |  FROM ev n CROSS JOIN qev q),
         |best AS (
         |  SELECT query_id, query, doc_id, max(score) AS score
         |  FROM scored GROUP BY ALL),
         |ranked AS (
         |  SELECT query_id, query, doc_id, score,
         |    cast(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) as int) AS rank
         |  FROM best QUALIFY rank <= 4)
         |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
         |ORDER BY query_id, rank""".stripMargin
    },

    // radius replay over the eligible (lang='en') corpus only
    "q213_filtered_radius" -> engineRadiusSql.replace(
      "FROM documents WHERE length(text) > 0",
      "FROM documents WHERE length(text) > 0 AND lang = 'en'"),

    // the lifecycle replay restricted to the named tenants
    "q214_partition_search" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      "FROM documents WHERE length(text) > 0 AND source IN ('src3', 'src7', 'src11')"),

    // the same total ranking, QUALIFY window moved to ranks 5..12
    "q215_search_pagination" -> lifecycleSearchSql.replace(
      "QUALIFY rank <= 4", "QUALIFY rank > 4 AND rank <= 12"),

    // the lifecycle replay over the MODIFIED corpus (both the chunk scan
    // and the hydration preview read the upserted text)
    "q220_engine_upsert" -> lifecycleSearchSql
      .replace("WITH c AS (",
        """WITH mdocs AS (
  SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN text || ' graft updated'
                      ELSE text END AS text
  FROM documents),
c AS (""")
      .replace("FROM documents WHERE length(text) > 0",
        "FROM mdocs WHERE length(text) > 0")
      .replace("JOIN documents d ON d.doc_id = r.doc_id",
        "JOIN mdocs d ON d.doc_id = r.doc_id"),

    // the literal IN-list spelling of Milvus get(ids, output_fields)
    "q224_engine_get" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (5, 42, 137, 400)""".stripMargin,

    // both counts recomputed (docs; chunker-replay chunks) + config pins;
    // layout_current graded TRUE — a lost fingerprint stamp hash-fails
    "q225_engine_describe" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
        |  FROM documents WHERE length(text) > 0)
        |SELECT (SELECT count(*) FROM documents) AS n_docs,
        |       (SELECT count(*) FROM c) AS n_chunks,
        |       'IVF_FLAT' AS index_type,
        |       cast(16 as bigint) AS nlist,
        |       cast(16 as bigint) AS nprobe,
        |       cast(4 as bigint) AS k,
        |       '' AS partition_key,
        |       true AS layout_current""".stripMargin,

    // recall pool widened to 20, then the lexical pair score and the
    // (ce, vec, pk) rerank replayed relationally
    "q226_search_rerank" -> lifecycleSearchSql.replace(
      """FROM best QUALIFY rank <= 4)
        |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
        |  substring(d.text, 1, 200) AS preview
        |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
        |ORDER BY query_id, rank""".stripMargin,
      """FROM best QUALIFY rank <= 20),
        |pooled AS (
        |  SELECT r.query_id, r.query, r.doc_id, r.score AS vec_score, d.text,
        |    list_filter(list_distinct(regexp_split_to_array(trim(lower(r.query)), '\s+')), x -> x <> '') AS qt,
        |    list_filter(list_distinct(regexp_split_to_array(trim(lower(d.text)), '\s+')), x -> x <> '') AS tt
        |  FROM ranked r JOIN documents d ON d.doc_id = r.doc_id),
        |ce AS (
        |  SELECT query_id, query, doc_id, vec_score, text,
        |    CASE WHEN len(qt) = 0 OR len(tt) = 0 THEN cast(0 as bigint)
        |         ELSE cast((10000 * len(list_distinct(list_intersect(qt, tt))))
        |              // len(list_distinct(qt || tt)) as bigint) END AS ce_bp
        |  FROM pooled),
        |reranked AS (
        |  SELECT query_id, query, doc_id, ce_bp, vec_score, text,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY ce_bp DESC, vec_score DESC, doc_id ASC) as int) AS rank
        |  FROM ce QUALIFY rank <= 4)
        |SELECT query_id, query, doc_id, ce_bp, vec_score, rank,
        |  substring(text, 1, 200) AS preview
        |FROM reranked ORDER BY query_id, rank""".stripMargin),

    // the literal SQL spelling of Milvus query(expr, output_fields,
    // limit, offset): pk-ordered page of the filtered store
    "q221_engine_query" ->
      """SELECT doc_id, lang, n_chars, source FROM documents
        |WHERE lang = 'en' AND n_chars > 200
        |ORDER BY doc_id LIMIT 100 OFFSET 10""".stripMargin,

    // the drained iterator must reassemble the one-shot filter exactly —
    // any page-seam duplicate or miss hash-fails
    "q222_query_iterator" ->
      "SELECT doc_id, n_chars, source FROM documents WHERE lang = 'en'",

    // the translated expr replays as the equivalent SQL; the drain must
    // reassemble it exactly across page seams
    "q285_retrieve_iterator" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang IN ('en', 'de') AND 150 <= n_chars AND n_chars < 700""".stripMargin,

    // q286: the transformer lifecycle relationally — the attention forward
    // replayed bit-for-bit (IEEE-exact ops, fixed accumulation order,
    // piecewise-linear-exp2 softmax) over chunks AND query texts, then the
    // cosine top-k + hydration of the lifecycle shape
    "q286_transformer_embed" -> {
      val qvalues = searchTexts.zipWithIndex
        .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${attnEmbedSql("ch", "chunk_id, doc_id", "chunk", "e")},
         |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
         |${attnEmbedSql("q0", "query_id, query", "query", "qe")},
         |scored AS (
         |  SELECT q.query_id, q.query, n.doc_id,
         |    round(CASE WHEN n.nrm2 = 0 OR q.nrm2 = 0 THEN 0.0
         |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
         |  FROM ev n CROSS JOIN qev q),
         |best AS (
         |  SELECT query_id, query, doc_id, max(score) AS score
         |  FROM scored GROUP BY ALL),
         |ranked AS (
         |  SELECT query_id, query, doc_id, score,
         |    cast(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) as int) AS rank
         |  FROM best QUALIFY rank <= 4)
         |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
         |ORDER BY query_id, rank""".stripMargin
    },

    // q292: the deep-transformer lifecycle relationally — both stacked
    // encoder blocks (multi-head attention, residuals, layernorms, FFN)
    // replayed bit-for-bit over chunks AND query texts, then the cosine
    // top-k + hydration of the lifecycle shape
    "q292_transformer_deep" -> {
      val qvalues = searchTexts.zipWithIndex
        .map { case (q, i) => s"(cast($i as bigint), '${q.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${attn2EmbedSql("ch", "chunk_id, doc_id", "chunk", "e")},
         |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
         |${attn2EmbedSql("q0", "query_id, query", "query", "qe")},
         |scored AS (
         |  SELECT q.query_id, q.query, n.doc_id,
         |    round(CASE WHEN n.nrm2 = 0 OR q.nrm2 = 0 THEN 0.0
         |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
         |  FROM ev n CROSS JOIN qev q),
         |best AS (
         |  SELECT query_id, query, doc_id, max(score) AS score
         |  FROM scored GROUP BY ALL),
         |ranked AS (
         |  SELECT query_id, query, doc_id, score,
         |    cast(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) as int) AS rank
         |  FROM best QUALIFY rank <= 4)
         |SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
         |  substring(d.text, 1, 200) AS preview
         |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
         |ORDER BY query_id, rank""".stripMargin
    },

    // q287: the null-test arms replay with SQL's own three-valued logic
    // over the reconstructed dynamic column (name-sorted key packing;
    // absent key == null producer)
    "q287_null_expr" ->
      """SELECT doc_id, "$meta" FROM (
        |  SELECT doc_id, lang2, n_chars, sd,
        |    CASE
        |      WHEN lang2 IS NOT NULL AND sd IS NOT NULL THEN
        |        printf('{"lang":"%s","n_chars":%d,"src_detail":"%s"}', lang2, n_chars, sd)
        |      WHEN lang2 IS NOT NULL THEN
        |        printf('{"lang":"%s","n_chars":%d}', lang2, n_chars)
        |      WHEN sd IS NOT NULL THEN
        |        printf('{"n_chars":%d,"src_detail":"%s"}', n_chars, sd)
        |      ELSE printf('{"n_chars":%d}', n_chars) END AS "$meta"
        |  FROM (
        |    SELECT doc_id, n_chars,
        |      CASE WHEN lang = 'de' THEN NULL ELSE lang END AS lang2,
        |      CASE WHEN doc_id % 5 = 0 THEN 'd' || doc_id ELSE NULL END AS sd
        |    FROM documents) t0) t
        |WHERE (lang2 IS NULL AND n_chars >= 300)
        |   OR (sd IS NOT NULL AND lang2 NOT LIKE 'e%')
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    // each translated count replays as a plain COUNT under the same
    // predicate; the dynamic numeric compare routes through the JSON hop
    // exactly like the store does
    "q291_filtered_count" ->
      """SELECT probe, cnt FROM (
        |  SELECT 'all' AS probe, count(*) AS cnt FROM documents
        |  UNION ALL
        |  SELECT 'dynamic', count(*) FROM documents WHERE n_chars > 400
        |  UNION ALL
        |  SELECT 'jsonpath', count(*) FROM documents
        |  WHERE source IN ('src3', 'src7')
        |  UNION ALL
        |  SELECT 'physical', count(*) FROM documents
        |  WHERE lang = 'en' OR lang LIKE 'd%') t
        |ORDER BY probe""".stripMargin,

    // the lifecycle replay over the surviving tenants only
    "q223_drop_partition" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      "FROM documents WHERE length(text) > 0 AND source NOT IN ('src3', 'src7')"),

    // the scheduled loop with its maintenance window ends at the same
    // full-corpus serving state — retrains move cells, never results
    "q216_scheduled_maintain" -> lifecycleSearchSql,

    // doc ranking → per-(query, source) best → top-4 groups
    "q218_grouped_search" -> lifecycleSearchSql.replace(
      """ranked AS (
  SELECT query_id, query, doc_id, score,
    cast(row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) as int) AS rank
  FROM best QUALIFY rank <= 4)
SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
  substring(d.text, 1, 200) AS preview
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
ORDER BY query_id, rank""",
      """g AS (
  SELECT b.query_id, b.query, b.doc_id, b.score, d.source
  FROM best b JOIN documents d ON d.doc_id = b.doc_id),
repr AS (
  SELECT query_id, query, source, doc_id, score,
    row_number() OVER (PARTITION BY query_id, source
      ORDER BY score DESC, doc_id ASC) AS gr
  FROM g QUALIFY gr = 1),
ranked AS (
  SELECT query_id, query, source, doc_id, score,
    cast(row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) as int) AS rank
  FROM repr QUALIFY rank <= 4)
SELECT r.query_id, r.query, r.source, r.doc_id, r.score, r.rank,
  substring(d.text, 1, 200) AS preview
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
ORDER BY query_id, rank"""),

    // the scheduler-driven loop ends at the same full-corpus serving state
    "q204_scheduler_loop" -> lifecycleSearchSql,

    "q150_backup_restore" -> lifecycleSearchSql,

    // the chained restore must reassemble the exact post-append state —
    // the full-corpus search replay is the proof
    "q181_incremental_backup" -> lifecycleSearchSql,

    // two audit rows against parity counts: full removal then idempotence
    "q182_forget_audit" ->
      """WITH r AS (
        |  SELECT count(*) AS n, cast(coalesce(sum(doc_id), 0) as bigint) AS sm
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT n AS n_requested, n AS n_removed, sm AS requested_sum_ids,
        |  cast(0 as bigint) AS survivors, true AS consistent,
        |  cast(1 as bigint) AS sweep
        |FROM r
        |UNION ALL
        |SELECT n, cast(0 as bigint), sm, cast(0 as bigint), true, cast(2 as bigint)
        |FROM r
        |ORDER BY sweep""".stripMargin,

    "q155_stream_recovery" ->
      """SELECT cast(1 as bigint) AS run, count(*) AS n_rows,
        |  cast(sum(doc_id) as bigint) AS sum_ids
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT cast(2 as bigint), count(*), cast(sum(doc_id) as bigint)
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY run""".stripMargin,

    "q153_engine_fsck" ->
      """SELECT cast(count(*) as bigint) AS n_store_docs,
        |  cast(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) as bigint) AS n_indexed_docs,
        |  cast(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) as bigint) AS n_missing,
        |  cast(0 as bigint) AS n_orphaned,
        |  false AS consistent,
        |  'pre_repair' AS stage
        |FROM documents
        |UNION ALL
        |SELECT cast(count(*) as bigint), cast(count(*) as bigint),
        |  cast(0 as bigint), cast(0 as bigint), true, 'post_repair'
        |FROM documents
        |ORDER BY stage""".stripMargin,

    "q135_stream_sketch_mv" ->
      """SELECT cast(cast(date_trunc('day', ts) as date) as timestamp) AS day,
        |  count(DISTINCT user_id) AS n_users, true AS sketch_ok
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q133_stream_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |v AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |    ORDER BY cnt DESC, tok ASC LIMIT 30)),
        |b AS (
        |  SELECT t.doc_id % 2 AS batch_id, t.doc_id, t.tok,
        |    CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END AS in_v
        |  FROM toks t LEFT JOIN v ON t.tok = v.tok)
        |SELECT batch_id, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tok,
        |  count(*) - cast(sum(in_v) as bigint) AS n_oov,
        |  (10000 * (count(*) - cast(sum(in_v) as bigint))) // count(*) AS oov_bp
        |FROM b GROUP BY batch_id ORDER BY batch_id""".stripMargin,

    // replay both micro-batches' drop/keep decisions with the full minhash
    // chain (TextQueries.minhashVerifiedSql — the q105-proven spelling of
    // incrementalNearDupPairs), filtered to batch-touching ids; the final
    // store is corpus ∪ per-batch survivors
    "q125_stream_neardup" -> {
      val novelText = (0 until 8).map(j => s"'nv' || cast(i as varchar) || 'x$j'")
        .mkString(" || ' ' || ")
      s"""WITH novel AS (
         |  SELECT 3000000000 + i AS doc_id, $novelText AS text
         |  FROM (SELECT unnest(generate_series(0, 49)) AS i)),
         |b1 AS (
         |  SELECT doc_id + 4000000000 AS id,
         |    substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
         |  FROM documents WHERE doc_id % 25 = 0
         |  UNION ALL
         |  SELECT doc_id AS id, text FROM novel WHERE (doc_id - 3000000000) % 2 = 0),
         |b2 AS (
         |  SELECT doc_id + 5000000000 AS id,
         |    substring(text, 1, cast(greatest(length(text) - 30, 1) as int)) AS text
         |  FROM documents WHERE doc_id % 25 = 10
         |  UNION ALL
         |  SELECT doc_id AS id, text FROM novel WHERE (doc_id - 3000000000) % 2 = 1),
         |c1 AS (SELECT doc_id AS id, text FROM documents UNION ALL SELECT id, text FROM b1),
         |c2 AS (SELECT doc_id AS id, text FROM documents UNION ALL SELECT id, text FROM b2),
         |${TextQueries.minhashVerifiedSql(0.3, "c1", "a_")},
         |${TextQueries.minhashVerifiedSql(0.3, "c2", "b_")},
         |drop1 AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT id_a AS id FROM a_verified UNION ALL SELECT id_b FROM a_verified)
         |  WHERE id >= 3000000000),
         |drop2 AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT id_a AS id FROM b_verified UNION ALL SELECT id_b FROM b_verified)
         |  WHERE id >= 3000000000),
         |final AS (
         |  SELECT doc_id AS id, text FROM documents
         |  UNION ALL SELECT id, text FROM b1 WHERE id NOT IN (SELECT id FROM drop1)
         |  UNION ALL SELECT id, text FROM b2 WHERE id NOT IN (SELECT id FROM drop2))
         |SELECT CASE WHEN id >= 3000000000 THEN 'planted' ELSE 'corpus' END AS part,
         |  count(*) AS n_docs, count(DISTINCT id) AS n_distinct,
         |  cast(sum(length(text)) as bigint) AS sum_chars,
         |  cast(sum(id) as bigint) AS sum_ids
         |FROM final GROUP BY 1 ORDER BY part""".stripMargin
    },

    "q120_engine_model_seam" -> letterLifecycleSql,

    // blue/green model migration ends serving the NEW model's index — the
    // letter-model lifecycle replay is the cutover proof
    "q219_model_migration" -> letterLifecycleSql,


    // q120's replay with the checkpoint model's weight matrix in place of
    // the letter weights — the whole update→search lifecycle under weights
    // that only exist in a file the engine loaded
    "q156_file_embedder" -> fileEmbedderLifecycleSql,

    // q230 serves the SAME checkpoint model after the alias flip, so the
    // post-cutover ranking is q156's replay verbatim
    "q230_alias_swap" -> fileEmbedderLifecycleSql,

    // q231: per-tenant doc counts + the chunker count formula per doc
    "q231_partition_stats" ->
      """SELECT source, cast(count(*) as bigint) AS n_docs,
        |  cast(coalesce(sum(CASE WHEN length(text) > 0
        |    THEN cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)
        |    ELSE 0 END), 0) as bigint) AS n_chunks
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q232: the WeightedRanker fusion replay (shared scoring prefix with
    // q212, min-max normalization + 7000/3000 weights)
    "q232_weighted_fusion" -> weightedHybridSql,

    // the lifecycle replay over the LIVE (non-expired) documents only —
    // logical expiry, the physical vacuum, and the post-vacuum serve must
    // all land on this same ranking
    "q233_ttl_expiry" -> {
      val key = "FROM documents WHERE length(text) > 0"
      require(lifecycleSearchSql.contains(key), "q233 surgery: corpus key drifted")
      lifecycleSearchSql.replace(key, key + " AND doc_id % 100 >= 50")
    },

    // a bulk-imported corpus serves exactly like an ingested one
    "q234_bulk_import" -> lifecycleSearchSql,

    // the Strong read covers the full corpus (read-your-writes)
    "q235_read_consistency" -> lifecycleSearchSql,

    // sealed + growing merge covers the full corpus, zero index writes
    "q240_growing_search" -> lifecycleSearchSql,

    // pre-add rows read the default, post-add rows their own values
    "q241_add_field" ->
      """SELECT doc_id, quality, lang FROM (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN doc_id % 10 ELSE 5 END AS quality,
        |    lang
        |  FROM documents) t
        |WHERE quality >= 4 ORDER BY doc_id LIMIT 200""".stripMargin,

    // the oracle chunks and scores ONLY documents whose token set matches
    // the TEXT_MATCH terms (OR semantics) — equal to indexing everything
    // and gating candidates before top-k, the engine's pre-filter shape
    "q242_text_match" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      """FROM documents WHERE length(text) > 0
        |    AND list_has_any(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                     ['dup', 'nosuchtoken'])""".stripMargin),

    // q242's replay plus the snippet projection: the same word-bounded
    // case-insensitive wrap over the preview (DuckDB backrefs are \1,
    // Spark's $1 — same semantics)
    "q273_search_highlight" -> {
      val prevKey = "substring(d.text, 1, 200) AS preview"
      val base = lifecycleSearchSql.replace(
        "FROM documents WHERE length(text) > 0",
        """FROM documents WHERE length(text) > 0
          |    AND list_has_any(regexp_split_to_array(lower(trim(text)), '\s+'),
          |                     ['dup', 'nosuchtoken'])""".stripMargin)
      require(base.contains(prevKey), "q273 surgery: preview key drifted")
      base.replace(prevKey,
        prevKey + ",\n  regexp_replace(substring(d.text, 1, 200), " +
          "'(?i)\\b(dup|nosuchtoken)\\b', '<em>\\1</em>', 'g') AS snippet")
    },

    // the oracle chunks and scores ONLY documents whose space-normalized
    // text contains the phrase as consecutive tokens
    "q246_phrase_match" -> lifecycleSearchSql.replace(
      "FROM documents WHERE length(text) > 0",
      """FROM documents WHERE length(text) > 0
        |    AND ' ' || regexp_replace(lower(trim(text)), '\s+', ' ', 'g') || ' '
        |        LIKE '% table value %'""".stripMargin),

    // the array predicates replay over the same derived list
    "q243_array_field" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    [lang, source, 'len_' || cast(length(text) % 10 as varchar)] AS tags
        |  FROM documents) t
        |WHERE list_contains(tags, 'en')
        |  AND list_has_any(tags, ['len_3', 'len_7'])
        |  AND len(tags) = 3
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the JSON-path filter replays from the base columns the JSON was
    // built from; the meta payload itself must round-trip byte-exactly
    "q244_json_field" ->
      """SELECT doc_id, meta FROM (
        |  SELECT doc_id, lang, n_chars,
        |    printf('{"lang":"%s","n_chars":%d}', lang, n_chars) AS meta
        |  FROM documents) t
        |WHERE lang = 'en' AND n_chars > 500
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the indexed path lookup replays as the plain filter from the base
    // column the JSON was built from
    "q249_json_index" ->
      """SELECT doc_id, meta FROM (
        |  SELECT doc_id, lang,
        |    printf('{"lang":"%s","n_chars":%d}', lang, n_chars) AS meta
        |  FROM documents) t
        |WHERE lang = 'es'
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the surviving population replays from the raw corpus: everything
    // the predicate did NOT doom, through the same read filter
    "q250_delete_expr" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang <> 'de' AND n_chars > 300
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    // the $meta packing replays as printf over the base columns in
    // sorted-name order (to_json(struct(...)) emits fields in struct
    // order; ingestDynamic sorts them), then the dynamic filter
    "q251_dynamic_field" ->
      """SELECT doc_id, "$meta" FROM (
        |  SELECT doc_id, lang, n_chars,
        |    printf('{"lang":"%s","n_chars":%d,"source":"%s"}',
        |           lang, n_chars, source) AS "$meta"
        |  FROM documents) t
        |WHERE lang = 'en' AND n_chars > 400
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    "q252_decay_rerank" -> decaySearchSql,

    // the indexed scalar range replays as the plain band filter
    "q284_scalar_range" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE n_chars >= 200 AND n_chars < 450
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the json-path LIKE replays over the replayed printf packing; the
    // numeric arm rides DuckDB's string->int compare via explicit cast
    "q283_expr_json_like" ->
      """SELECT doc_id, meta FROM (
        |  SELECT doc_id,
        |    printf('{"n_chars":%d,"url":"https://data.example/%s/%d"}',
        |           n_chars, source, doc_id) AS meta,
        |    source, n_chars
        |  FROM documents) t
        |WHERE source = 'src3' AND n_chars > 300
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the indexed range lookup replays as the plain numeric filter over
    // the replayed dynamic packing (fields name-sorted: n_chars < stars)
    "q281_json_range" ->
      """SELECT doc_id, "$meta" FROM (
        |  SELECT doc_id,
        |    printf('{"n_chars":%d,"stars":%d}', n_chars, (doc_id*37)%500)
        |      AS "$meta",
        |    (doc_id*37)%500 AS stars
        |  FROM documents) t
        |WHERE stars > 100 AND stars <= 300
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the indexed scalar lookup replays as the plain filter
    "q253_scalar_index" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE source = 'src3'
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the Milvus expr string replays as the equivalent SQL predicate over
    // the base columns ('&&' binds tighter than '||'), plus the packing
    "q254_retrieve_expr" ->
      """SELECT doc_id, "$meta" FROM (
        |  SELECT doc_id, lang, n_chars, source,
        |    printf('{"lang":"%s","n_chars":%d,"source":"%s"}',
        |           lang, n_chars, source) AS "$meta"
        |  FROM documents) t
        |WHERE (lang = 'en' AND n_chars > 400) OR source IN ('src3')
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the full shingle→minhash→band→verify pipeline replays over the
    // corpus UNION the query prefixes (negative ids — always id_a in the
    // id_a < id_b candidate pairs, so query-vs-doc pairs are exactly the
    // negative/non-negative ones)
    "q256_neardup_search" ->
      s"""WITH qrows AS (
         |  SELECT cast(-1 as bigint) AS id,
         |    substring(text, 1, cast(floor(length(text)*0.8) as int)) AS text
         |  FROM documents WHERE doc_id = 3
         |  UNION ALL
         |  SELECT cast(-2 as bigint),
         |    substring(text, 1, cast(floor(length(text)*0.8) as int))
         |  FROM documents WHERE doc_id = 11),
         |corpus AS (
         |  SELECT doc_id AS id, text FROM documents
         |  UNION ALL SELECT id, text FROM qrows),
         |${graft.queries.TextQueries.minhashVerifiedSql(0.3)}
         |SELECT cast(-(id_a)-1 as bigint) AS query_id, id_b AS doc_id,
         |  inter, sz_a AS sz_q, sz_b AS sz_d, jaccard
         |FROM verified WHERE id_a < 0 AND id_b >= 0
         |ORDER BY query_id, jaccard DESC, doc_id""".stripMargin,

    // nulls created at the door replay via the same CASE; IS NULL and the
    // value arm compose exactly
    "q255_nullable_field" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, CASE WHEN lang = 'de' THEN NULL ELSE lang END AS lang,
        |         n_chars
        |  FROM documents) t
        |WHERE lang IS NULL OR (lang = 'en' AND n_chars > 400)
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    // the keyword arm replays as list_has_any over the same tokenization
    "q278_expr_text_match" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE list_has_any(regexp_split_to_array(lower(text), '\s+'),
        |                   ['dup', 'nosuchtoken'])
        |  AND n_chars > 250
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // BETWEEN and the modulo arm replay verbatim; the chained comparison
    // replays as its two conjoined arms — same precedence as the expr
    "q279_expr_range" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE (n_chars BETWEEN 300 AND 600 AND n_chars % 2 = 0)
        |   OR (100 <= n_chars AND n_chars < 160)
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the stemming replay: plural query terms arrive pre-stemmed as
    // literals ('table', 'merge'); the doc tokenization stop-filters then
    // stems (Lucene's filter order) before the membership test
    "q280_expr_match_stem" -> {
      val stop = graft.Engine.englishStopwords.toSeq.sorted
        .map(w => s"'$w'").mkString(", ")
      val stem = graft.functions.TextFns.minEnglishStemSql("ltk")
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id IN (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, $stem AS ltk FROM (
         |      SELECT doc_id,
         |        unnest(regexp_split_to_array(lower(text), '\\s+')) AS ltk
         |      FROM documents) u
         |    WHERE ltk NOT IN ($stop)) v
         |  WHERE ltk IN ('table', 'merge'))
         |  AND n_chars > 250
         |ORDER BY doc_id LIMIT 150""".stripMargin
    },

    // the conditional packing replays with a CASE (fields name-sorted:
    // n_chars < src_detail); exists = the key's presence
    "q271_exists_expr" ->
      """SELECT doc_id, "$meta" FROM (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN printf('{"n_chars":%d,"src_detail":"%s"}', n_chars,
        |                  source || '/' || lang)
        |      ELSE printf('{"n_chars":%d}', n_chars) END AS "$meta"
        |  FROM documents) t
        |WHERE doc_id % 3 = 0 AND n_chars > 250
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the tags derivation (first 12 ≥3-letter tokens) replays with DuckDB
    // list functions; both predicate arms as written in the Milvus expr
    "q265_array_field" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                tk -> len(tk) >= 3)[1:12] AS tags
        |  FROM documents) t
        |WHERE (list_contains(tags, 'data') AND NOT list_contains(tags, 'the'))
        |   OR len(tags) < 12
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    "q266_array_setops" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                tk -> len(tk) >= 3)[1:12] AS tags
        |  FROM documents) t
        |WHERE list_has_all(tags, ['window', 'hash'])
        |   OR (list_has_any(tags, ['vector', 'stream']) AND n_chars < 150)
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // the $meta packing replays name-sorted ({"n_chars":…,"tags":[…]});
    // the membership + numeric arms filter on the raw columns
    "q267_json_contains" ->
      """SELECT doc_id, "$meta" FROM (
        |  SELECT doc_id, n_chars, tags,
        |    printf('{"n_chars":%d,"tags":[%s]}', n_chars,
        |           coalesce(list_aggregate(
        |             list_transform(tags, x -> '"' || x || '"'),
        |             'string_agg', ','), '')) AS "$meta"
        |  FROM (
        |    SELECT doc_id, n_chars,
        |      list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                  tk -> len(tk) >= 3)[1:12] AS tags
        |    FROM documents) raw) t
        |WHERE list_contains(tags, 'data') AND n_chars > 300
        |ORDER BY doc_id LIMIT 150""".stripMargin,

    // layout moved, content didn't: the filter replays over the raw corpus
    "q245_clustering_compact" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'de' AND n_chars > 200
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    // same ranking, caller-chosen hydration projection
    "q236_search_fields" -> {
      val key = """SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
  substring(d.text, 1, 200) AS preview
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
ORDER BY query_id, rank"""
      require(lifecycleSearchSql.contains(key), "q236 surgery: final-select key drifted")
      lifecycleSearchSql.replace(key,
        """SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
  d.lang, d.source, d.n_chars
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
ORDER BY query_id, rank""")
    },

    // the radius replay with the range_filter upper cut on chunk scores
    "q237_annulus_search" -> {
      val key = "FROM scored WHERE score >= 0.3 GROUP BY ALL"
      require(engineRadiusSql.contains(key), "q237 surgery: radius key drifted")
      engineRadiusSql.replace(key,
        "FROM scored WHERE score >= 0.05 AND score < 0.3 GROUP BY ALL")
    },

    // sparse inner product replayed: tokenize -> tf -> df -> log2 idf ->
    // sum(qtf * tf * (idf_bp^2 DIV 10000)) -> top-4 (score desc, pk asc)
    "q238_sparse_search" -> sparseSearchSql,

    // q238's replay joined to a per-query pattern VALUES table; the same
    // word-bounded regex wraps each query's own terms in its previews
    "q277_sparse_highlight" -> {
      val pvalues = searchTexts.zipWithIndex.map { case (q, i) =>
        val ts = q.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        s"(cast($i as bigint), '(?i)\\b(${ts.mkString("|")})\\b')"
      }.mkString(", ")
      val tailKey = """SELECT r.query_id, q.query, r.doc_id, r.score_bp, r.rank,
  substring(d.text, 1, 200) AS preview
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
JOIN q0 q ON q.query_id = r.query_id
ORDER BY r.query_id, r.rank"""
      require(sparseSearchSql.contains(tailKey), "q277 surgery: tail key drifted")
      sparseSearchSql.replace(tailKey,
        s"""SELECT r.query_id, q.query, r.doc_id, r.score_bp, r.rank,
  substring(d.text, 1, 200) AS preview,
  regexp_replace(substring(d.text, 1, 200), p.pat, '<em>\\1</em>', 'g') AS snippet
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
JOIN q0 q ON q.query_id = r.query_id
JOIN (VALUES $pvalues) p(query_id, pat) ON p.query_id = r.query_id
ORDER BY r.query_id, r.rank""")
    },

    // same sparse replay under the english analyzer: the stoplist filters
    // both the query-term literals and the document tokenization CTE
    "q247_analyzer" ->
      sparseSearchSqlFor(analyzerTexts, graft.Engine.englishStopwords, 8),

    // the length-filter replay: out-of-range query terms drop from the
    // VALUES literals, the doc tokenization gains the post-stop length cut
    "q282_analyzer_len" ->
      sparseSearchSqlFor(lenTexts, graft.Engine.englishStopwords, 8,
        lenRange = Some((4, 24))),

    // the stemming replay: query-term literals stem driver-side, the doc
    // tokenization stems in SQL, and the planted plural corpus replays
    // through a docs2 CTE on BOTH the tokenization and the hydration
    "q276_analyzer_stem" -> {
      val base = sparseSearchSqlFor(stemTexts, graft.Engine.englishStopwords, 8,
        stem = true)
      val headKey = "WITH q0 AS"
      val tokKey = "FROM documents WHERE length(trim(text)) > 0"
      val hydKey = "JOIN documents d ON d.doc_id = r.doc_id"
      require(base.contains(headKey) && base.contains(tokKey) && base.contains(hydKey),
        "q276 surgery: a sparseSearchSqlFor anchor drifted")
      base
        .replace(headKey,
          "WITH docs2 AS (\n  SELECT doc_id, CASE WHEN doc_id % 5 = 0 " +
            "THEN text || ' tables queries' ELSE text END AS text\n" +
            "  FROM documents),\nq0 AS")
        .replace(tokKey, "FROM docs2 WHERE length(trim(text)) > 0")
        .replace(hydKey, "JOIN docs2 d ON d.doc_id = r.doc_id")
    },

    // q288: the full-Porter2 sparse replay over the derivational corpus
    "q288_porter_stem" -> porterSparseSearchSql(porterTexts, 8,
      """  SELECT doc_id, CASE WHEN doc_id % 5 = 0
        |    THEN text || ' relational generously' ELSE text END AS text
        |  FROM documents""".stripMargin),

    // q289: the expr-route TEXT_MATCH under the full stemmer — field
    // tokens run the same stop→Porter2 pipeline (per-step CTE chain),
    // query terms stem to the same literals, membership is the filter
    "q289_expr_match_porter" -> {
      val stopIn = graft.Engine.englishStopwords.toSeq.sorted
        .map(s => s"'$s'").mkString(", ")
      // the term set rides a VALUES subquery, NOT a constant IN-list: a
      // constant predicate gets pushed down the 12-CTE stemming chain by
      // expression substitution (each CTE's nested CASE inlines into the
      // next — exponential planning; DuckDB spun >60 s on 60 docs), while
      // an IN (subquery) plans as a semi-join above the chain (2 s)
      val terms = Seq("relate", "generous")
        .map(graft.functions.Porter2.stem)
        .map(t => s"('$t')").mkString(", ")
      s"""WITH docs2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' relational generously'
         |         ELSE text END AS text,
         |    n_chars
         |  FROM documents),
         |tok0 AS (
         |  SELECT doc_id, ltk FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS ltk
         |    FROM docs2 WHERE length(trim(text)) > 0) u
         |  WHERE ltk NOT IN ($stopIn)),
         |${graft.functions.Porter2.sqlCtes("tok0", "doc_id", "ltk", "ps")},
         |m AS (SELECT DISTINCT doc_id FROM psout
         |      WHERE tok IN (SELECT t FROM (VALUES $terms) v(t)))
         |SELECT d.doc_id, d.n_chars FROM docs2 d JOIN m USING (doc_id)
         |WHERE d.n_chars > 100
         |ORDER BY d.doc_id LIMIT 150""".stripMargin
    },

    // the RaBitQ replay: global Hamming cut over the SIGN comparison of
    // the same normalized embeddings (nprobe = nlist, so no probe window),
    // exact cosine refine of the top-20 survivors, then the usual per-doc
    // best / top-k reduction — a sign-pack or popcount bug hash-fails
    "q248_engine_rabitq" -> lifecycleSearchSql.replace(
      """scored AS (
        |  SELECT q.query_id, q.query, n.doc_id,
        |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
        |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
        |  FROM nv n CROSS JOIN qnv q),""".stripMargin,
      """ham AS (
        |  SELECT q.query_id, q.query, n.doc_id, n.chunk_id,
        |    n.v AS dv, n.nrm AS dnrm, q.v AS qv, q.nrm AS qnrm,
        |    list_sum(list_transform(generate_series(1, 64), i ->
        |      CASE WHEN (n.v[i] > 0) <> (q.v[i] > 0) THEN 1 ELSE 0 END)) AS hd
        |  FROM nv n CROSS JOIN qnv q),
        |cand AS (
        |  SELECT * FROM (
        |    SELECT *, cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY hd ASC, chunk_id ASC) as int) AS hrank
        |    FROM ham) h WHERE hrank <= 20),
        |scored AS (
        |  SELECT query_id, query, doc_id,
        |    round(CASE WHEN dnrm = 0 OR qnrm = 0 THEN 0.0
        |               ELSE list_cosine_similarity(dv, qv) END, 4) AS score
        |  FROM cand),""".stripMargin),

    // grouped search at depth 3: groups rank by their leader, members
    // flatten in (group order, within-group order)
    "q239_grouped_size" -> {
      val key = """ranked AS (
  SELECT query_id, query, doc_id, score,
    cast(row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) as int) AS rank
  FROM best QUALIFY rank <= 4)
SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
  substring(d.text, 1, 200) AS preview
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
ORDER BY query_id, rank"""
      require(lifecycleSearchSql.contains(key), "q239 surgery: ranked key drifted")
      lifecycleSearchSql.replace(key,
        """g AS (
  SELECT b.query_id, b.query, b.doc_id, b.score, d.source
  FROM best b JOIN documents d ON d.doc_id = b.doc_id),
repr AS (
  SELECT query_id, query, source, doc_id, score,
    row_number() OVER (PARTITION BY query_id, source
      ORDER BY score DESC, doc_id ASC) AS gr
  FROM g QUALIFY gr <= 3),
leaders AS (
  SELECT query_id, source, gr,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) AS grank
  FROM repr WHERE gr = 1 QUALIFY grank <= 4),
flat AS (
  SELECT r.query_id, r.query, r.source, r.doc_id, r.score,
    cast(row_number() OVER (PARTITION BY r.query_id
      ORDER BY l.grank ASC, r.gr ASC) as int) AS rank
  FROM repr r JOIN leaders l ON l.query_id = r.query_id AND l.source = r.source)
SELECT f.query_id, f.query, f.source, f.doc_id, f.score, f.rank,
  substring(d.text, 1, 200) AS preview
FROM flat f JOIN documents d ON d.doc_id = f.doc_id
ORDER BY query_id, rank""")
    },

    // q239's surgery with the candidate-pool cap (limit 4 × group_size 3 =
    // 12) inserted between the per-doc ranking and the group window —
    // Milvus's loose strict_group_size=false semantics
    "q269_grouped_loose" -> {
      val key = """ranked AS (
  SELECT query_id, query, doc_id, score,
    cast(row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) as int) AS rank
  FROM best QUALIFY rank <= 4)
SELECT r.query_id, r.query, r.doc_id, r.score, r.rank,
  substring(d.text, 1, 200) AS preview
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
ORDER BY query_id, rank"""
      require(lifecycleSearchSql.contains(key), "q269 surgery: ranked key drifted")
      lifecycleSearchSql.replace(key,
        """g AS (
  SELECT b.query_id, b.query, b.doc_id, b.score, d.source
  FROM best b JOIN documents d ON d.doc_id = b.doc_id),
pool AS (
  SELECT query_id, query, source, doc_id, score,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) AS pr
  FROM g QUALIFY pr <= 12),
repr AS (
  SELECT query_id, query, source, doc_id, score,
    row_number() OVER (PARTITION BY query_id, source
      ORDER BY score DESC, doc_id ASC) AS gr
  FROM pool QUALIFY gr <= 3),
leaders AS (
  SELECT query_id, source, gr,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id ASC) AS grank
  FROM repr WHERE gr = 1 QUALIFY grank <= 4),
flat AS (
  SELECT r.query_id, r.query, r.source, r.doc_id, r.score,
    cast(row_number() OVER (PARTITION BY r.query_id
      ORDER BY l.grank ASC, r.gr ASC) as int) AS rank
  FROM repr r JOIN leaders l ON l.query_id = r.query_id AND l.source = r.source)
SELECT f.query_id, f.query, f.source, f.doc_id, f.score, f.rank,
  substring(d.text, 1, 200) AS preview
FROM flat f JOIN documents d ON d.doc_id = f.doc_id
ORDER BY query_id, rank""")
    },

    "q64_engine_lifecycle" -> lifecycleSearchSql,
    "q188_ivf_persisted_search" -> lifecycleSearchSql,
    "q189_config_lifecycle" -> lifecycleSearchSql,
    "q190_ivf_incremental_serve" -> lifecycleSearchSql,
    "q197_stream_engine_lifecycle" -> lifecycleSearchSql,

    // after deleting doc_id%7==0 the index must equal the chunk+embed
    // replay over the SURVIVORS only — q68's CTE chain with the delete
    // predicate pushed into the corpus scan
    "q126_engine_delete" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0 AND doc_id % 7 <> 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${embedSql("ch", "chunk_id, doc_id", "chunk")},
         |nv AS (
         |  SELECT chunk_id, doc_id,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v
         |  FROM vec)
         |SELECT doc_id, chunk_id,
         |  round(list_reduce(v, (a, b) -> a + b), 4) + 0.0 AS vec_sum,
         |  round(list_reduce(list_transform(v, x -> abs(x)), (a, b) -> a + b), 4) AS vec_l1
         |FROM nv
         |ORDER BY doc_id, chunk_id""".stripMargin,

    // the incrementally-extended index must equal a full chunk+embed replay
    // over the whole corpus — same chunker + hash-embed CTEs as q64, graded
    // at the per-chunk level via two order-stable vector checksums (Spark's
    // aggregate() folds left from 0.0; list_reduce folds left from v[0];
    // 0.0 + v0 == v0 exactly, so the double-add sequences are identical)
    // both rank lists replay (integral BM25 + doc-level embed cosine),
    // then the integer RRF fold
    "q177_rrf_fusion" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents WHERE length(trim(text)) > 0),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
         |corp AS (SELECT count(*) AS n_docs, sum(dl) AS t_toks FROM dl),
         |tf AS (
         |  SELECT doc_id, tok, count(*) AS tf FROM toks
         |  WHERE tok IN ('spark', 'data', 'model') GROUP BY doc_id, tok),
         |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |bm AS (
         |  SELECT doc_id, sum((idf_bp * tf_bp) // 10000) AS bm25_bp FROM (
         |    SELECT doc_id,
         |      10000 * (length(bin(s)) - 1)
         |        + (10000 * (s - (1::BIGINT << (length(bin(s)) - 1))))
         |          // (1::BIGINT << (length(bin(s)) - 1)) - 100000 AS idf_bp,
         |      tf_bp
         |    FROM (
         |      SELECT t.doc_id,
         |        (1024 * (2*c.n_docs + 2)) // (2*d.df + 1) AS s,
         |        (10000 * 22 * c.t_toks * t.tf)
         |          // (10 * c.t_toks * t.tf + 3 * c.t_toks + 9 * l.dl * c.n_docs) AS tf_bp
         |      FROM tf t JOIN dft d USING (tok) JOIN dl l USING (doc_id) CROSS JOIN corp c) y)
         |  GROUP BY doc_id),
         |lex AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25_bp DESC, doc_id ASC) AS lex_rank
         |  FROM bm QUALIFY lex_rank <= 100),
         |docs0 AS (SELECT doc_id, text FROM documents),
         |${embedSql("docs0", "doc_id", "text")},
         |nv AS (
         |  SELECT doc_id,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v,
         |    nrm
         |  FROM vec),
         |q0 AS (SELECT 0 AS query_id, 'spark data model' AS query),
         |qtok AS (
         |  SELECT query_id, query, unnest(regexp_split_to_array(trim(query), '\\s+')) AS tk
         |  FROM q0),
         |qhv AS (
         |  SELECT query_id, query, ${tokBucket("tk")} AS bucket, ${tokSign("tk")} AS sgn
         |  FROM qtok WHERE tk <> ''),
         |qcnt AS (
         |  SELECT query_id, query, bucket, cast(sum(sgn) as double) AS s
         |  FROM qhv GROUP BY ALL),
         |qdense AS (
         |  SELECT q0.query_id, q0.query, list(coalesce(c.s, 0.0) ORDER BY g.j) AS cv
         |  FROM q0
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
         |  LEFT JOIN qcnt c ON c.query_id = q0.query_id AND c.bucket = g.j
         |  GROUP BY ALL),
         |qvec AS (
         |  SELECT query_id, cv,
         |    sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS nrm
         |  FROM qdense),
         |qnv AS (
         |  SELECT query_id,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v,
         |    nrm
         |  FROM qvec),
         |vsc AS (
         |  SELECT n.doc_id,
         |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
         |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS cs
         |  FROM nv n CROSS JOIN qnv q),
         |vrank AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS vec_rank
         |  FROM vsc QUALIFY vec_rank <= 100),
         |f AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    coalesce(l.lex_rank, 0) AS lex_rank,
         |    coalesce(v.vec_rank, 0) AS vec_rank,
         |    coalesce(1000000 // (60 + l.lex_rank), 0)
         |      + coalesce(1000000 // (60 + v.vec_rank), 0) AS rrf_ppm
         |  FROM lex l FULL OUTER JOIN vrank v ON v.doc_id = l.doc_id)
         |SELECT doc_id, cast(lex_rank as bigint) AS lex_rank,
         |  cast(vec_rank as bigint) AS vec_rank, cast(rrf_ppm as bigint) AS rrf_ppm
         |FROM f ORDER BY rrf_ppm DESC, doc_id ASC LIMIT 10""".stripMargin,

    // the lifecycle replay's chunk+query embedding chains, with the final
    // ranking swapped for MaxSim: per-(token, doc) max then decimal sum
    "q176_late_interaction" -> {
      val qvalues = Seq("deep", "neural", "network", "training").zipWithIndex
        .map { case (tk, i) => s"(cast($i as bigint), '$tk')" }.mkString(", ")
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${embedSql("ch", "chunk_id, doc_id", "chunk")},
         |nv AS (
         |  SELECT chunk_id, doc_id,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v,
         |    nrm
         |  FROM vec),
         |q0 AS (SELECT * FROM (VALUES $qvalues) t(query_id, query)),
         |qtok AS (
         |  SELECT query_id, query, unnest(regexp_split_to_array(trim(query), '\\s+')) AS tk
         |  FROM q0),
         |qhv AS (
         |  SELECT query_id, query, ${tokBucket("tk")} AS bucket, ${tokSign("tk")} AS sgn
         |  FROM qtok WHERE tk <> ''),
         |qcnt AS (
         |  SELECT query_id, query, bucket, cast(sum(sgn) as double) AS s
         |  FROM qhv GROUP BY ALL),
         |qdense AS (
         |  SELECT q0.query_id, q0.query, list(coalesce(c.s, 0.0) ORDER BY g.j) AS cv
         |  FROM q0
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
         |  LEFT JOIN qcnt c ON c.query_id = q0.query_id AND c.bucket = g.j
         |  GROUP BY ALL),
         |qvec AS (
         |  SELECT query_id, query, cv,
         |    sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS nrm
         |  FROM qdense),
         |qnv AS (
         |  SELECT query_id, query,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v,
         |    nrm
         |  FROM qvec),
         |scored AS (
         |  SELECT q.query_id, n.doc_id,
         |    round(CASE WHEN n.nrm = 0 OR q.nrm = 0 THEN 0.0
         |               ELSE list_cosine_similarity(n.v, q.v) END, 4) AS score
         |  FROM nv n CROSS JOIN qnv q),
         |best AS (
         |  SELECT query_id, doc_id, max(score) AS score
         |  FROM scored GROUP BY ALL),
         |li AS (
         |  SELECT doc_id, sum(cast(score as decimal(10,4))) AS sc
         |  FROM best GROUP BY doc_id)
         |SELECT doc_id, cast(sc as double) AS score
         |FROM li ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin
    },

    // healthy docs replay the clean hash-embed l1 checksum; the quarantine
    // set is exactly the planted residue class
    "q167_embed_dlq" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 31 = 0 THEN text || ' __poison__' ELSE text END AS text2
         |  FROM documents),
         |okset AS (SELECT doc_id, lang, text2 FROM base WHERE doc_id % 31 <> 0),
         |${embedSql("okset", "doc_id, lang", "text2")},
         |nv AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v
         |  FROM vec),
         |l1 AS (
         |  SELECT doc_id, lang,
         |    cast(round(list_reduce(list_transform(v, x -> abs(x)), (a, b) -> a + b), 4)
         |      as decimal(18,4)) AS d
         |  FROM nv),
         |agg AS (
         |  SELECT lang,
         |    cast(sum(CASE WHEN doc_id % 31 <> 0 THEN 1 ELSE 0 END) as bigint) AS n_ok,
         |    cast(sum(CASE WHEN doc_id % 31 = 0 THEN 1 ELSE 0 END) as bigint) AS n_failed,
         |    cast(sum(CASE WHEN doc_id % 31 = 0 THEN doc_id ELSE 0 END) as bigint)
         |      AS failed_sum_ids
         |  FROM base GROUP BY lang),
         |l1agg AS (SELECT lang, sum(d) AS ok_l1 FROM l1 GROUP BY lang)
         |SELECT a.lang, a.n_ok, a.n_failed, a.failed_sum_ids,
         |  cast(coalesce(l.ok_l1, 0) as double) AS ok_l1
         |FROM agg a LEFT JOIN l1agg l ON l.lang = a.lang
         |ORDER BY a.lang""".stripMargin,

    "q68_incremental_index" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, cast(greatest(floor((length(text)-64-1)/64.0)+1, 1) as bigint)-1)) AS pos
         |  FROM documents WHERE length(text) > 0),
         |ch AS (
         |  SELECT doc_id, doc_id || '_' || pos AS chunk_id,
         |    substring(text, cast(pos*64+1 as int), 128) AS chunk
         |  FROM c),
         |${embedSql("ch", "chunk_id, doc_id", "chunk")},
         |nv AS (
         |  SELECT chunk_id, doc_id,
         |    CASE WHEN nrm > 0
         |         THEN list_transform(cv, x -> cast(cast(x * (1.0/nrm) as float) as double))
         |         ELSE cv END AS v
         |  FROM vec)
         |SELECT doc_id, chunk_id,
         |  round(list_reduce(v, (a, b) -> a + b), 4) + 0.0 AS vec_sum,
         |  round(list_reduce(list_transform(v, x -> abs(x)), (a, b) -> a + b), 4) AS vec_l1
         |FROM nv
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "q65_stream_agg" ->
      """SELECT lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS total_chars,
        |  max(doc_id) AS max_doc_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // the settled deduped store must equal the PRISTINE corpus: re-delivery
    // changed nothing, so the oracle never sees the duplicate slice
    "q66_stream_ingest" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT doc_id) AS n_distinct,
        |  cast(sum(n_chars) as bigint) AS total_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // stream/batch unification under a watermark: the settled APPEND-mode
    // sink must equal the batch tumbling aggregation over the pristine
    // events (the sentinel ticks exist only in the staged drop-folder)
    "q86_stream_window" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM events
         |GROUP BY date_trunc('hour', ts), event_type
         |ORDER BY window_start, event_type""".stripMargin,

    // the settled deduped sink equals the PRISTINE events table — the
    // re-delivered slice was absorbed by the keyed state store
    "q89_stream_dedup" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  count(DISTINCT event_id) AS n_distinct,
         |  ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the settled stream-stream join equals the batch interval join — the
    // CAST truncates DuckDB's ns read to µs, the stream's own projection
    "q95_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        |  AND CAST(c.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)
        |ORDER BY purchase_id, click_id""".stripMargin,

    "q144_stream_left_join" ->
      """SELECT p.event_id AS purchase_id, coalesce(c.event_id, -1) AS click_id,
        |  p.user_id AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        |  AND CAST(c.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)
        |ORDER BY purchase_id, click_id""".stripMargin,

    // the settled custom-state sessionizer output equals batch
    // gaps-and-islands (q27's CTE, bounds + counts)
    "q100_stream_session" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800.0
        |            THEN 1 ELSE 0 END AS new_session FROM x),
        |z AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM y)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM z GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // the settled update-mode MV equals the batch GROUP BY
    "q108_stream_update_mv" ->
      """SELECT event_type, count(*) AS n_events,
        |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
