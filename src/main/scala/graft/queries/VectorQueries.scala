package graft.queries

import graft.functions.VectorFns
import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QHelpers._

/**
 * Vector / ANN search (SURVEY §2.9) over `embeddings` (the stand-in for the
 * reference's Milvus collection, vdb.py:203-208). k = 4 mirrors the
 * reference's `limit` (config.yml:83).
 *
 * The brute-force, aggregate, and IVF(nprobe=nlist) variants all have the
 * SAME exact-top-k oracle — the reference's own config (nlist=128,
 * nprobe=128, config.yml:81-82) makes IVF exhaustive, which gives the
 * approximate path a well-defined correctness gate.
 */
object VectorQueries {

  /** IVF index memo: the index build (KMeans + cell assignment) is an
    * offline step — like the reference's create_index (vdb.py:209-211) —
    * not part of a query; build it once per (dir, nlist) and cache the
    * cell-assigned layout. Never unpersisted by design: the memo lives for
    * the harness process exactly like a vector store's resident index; a
    * long-lived service would evict via Engine.update()'s invalidation. */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), VectorSearch.IvfIndex]

  private def ivf(s: SparkSession, dir: String, nlist: Int): VectorSearch.IvfIndex =
    ivfCache.getOrElseUpdate((dir, nlist), {
      val idx = VectorSearch.buildIvf(t(s, dir, "embeddings"), nlist)
      val cached = idx.copy(cells = idx.cells.cache())
      cached.cells.count() // materialize the layout once
      cached
    })

  /** Seeded (data-independent quantizer) IVF memo for the oracle-replayable
    * pruned probe (q24). Same memo discipline as [[ivf]]. */
  private val ivfSeededCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), VectorSearch.IvfIndex]

  private def ivfSeeded(s: SparkSession, dir: String, nlist: Int): VectorSearch.IvfIndex =
    ivfSeededCache.getOrElseUpdate((dir, nlist), {
      val idx = VectorSearch.buildIvfSeeded(t(s, dir, "embeddings"), nlist, dim = 64)
      val cached = idx.copy(cells = idx.cells.cache())
      cached.cells.count()
      cached
    })

  /** embeddings ∪ perturbed near-copies (vec_id+1e9 for vec_id%25==0 — the
    * offset sits far above any real vec_id at every scale factor, so planted
    * ids never alias onto real vectors): coordinate i gets
    * + ((vec_id + i) % 7 - 3)·1e-4, computed in double and
    * cast back to float — bit-identical in Spark and DuckDB, cosine ≈ 0.9999
    * vs a noise ceiling of ~0.51 on this corpus. */
  private def nearDupVecs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val planted = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") + ((col("vec_id") + i) % 7 - 3) * 1e-4).cast("float"))
          .as("embedding"))
    e.unionAll(planted)
  }

  private val nearDupVecsSql =
    """SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings
      |UNION ALL
      |SELECT vec_id + 1000000000 AS vec_id,
      |  cast(list_transform(generate_series(1, len(embedding)), i ->
      |    cast(cast(embedding[i] as double)
      |         + ((vec_id + i - 1) % 7 - 3) * 0.0001 as float)) as double[]) AS v
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin

  private def queriesDf(s: SparkSession, dir: String, lo: Int, hi: Int): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  /** Exact top-k oracle for query ids in [lo, hi). */
  private def bruteSql(lo: Int, hi: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
       |  FROM embeddings WHERE vec_id >= $lo AND vec_id < $hi)
       |SELECT q.query_id, e.vec_id,
       |  round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) AS score,
       |  cast(row_number() OVER (PARTITION BY q.query_id
       |    ORDER BY round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) DESC,
       |             e.vec_id ASC) as int) AS rank
       |FROM embeddings e, q
       |QUALIFY rank <= 4
       |ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, Q] = Map(
    // TK2 exact brute-force top-k (window ranking)
    "q21_ann_topk" -> ((s, dir) =>
      VectorSearch.topK(t(s, dir, "embeddings"), queriesDf(s, dir, 0, 5), k = 4)
        .orderBy(col("query_id"), col("rank"))),

    // Seeded negative sampling — the contrastive-training data op pairing
    // q139's hard negatives: each anchor draws k=4 reproducible uniform
    // negatives via an affine hash mod corpus size (doc_ids are contiguous
    // 0..n-1 in this corpus), with the self-collision bumped to the next
    // id. Coordination-free (a pure projection per anchor — re-runs and
    // backfills draw identical negatives); the tiny negative set
    // broadcasts into the hydration join so the corpus never shuffles.
    "q178_negative_sampling" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val n = docs.agg(count(lit(1)).as("n"))
      val negs = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("anchor_id"))
        .crossJoin(broadcast(n))
        .withColumn("j", explode(sequence(lit(0L), lit(3L))))
        .withColumn("cand",
          pmod(col("anchor_id") * lit(2654435761L) + (col("j") + 1) * lit(40503L), col("n")))
        .withColumn("neg_id",
          when(col("cand") === col("anchor_id"), pmod(col("cand") + 1, col("n")))
            .otherwise(col("cand")))
        .select(col("anchor_id"), col("j"), col("neg_id"))
      docs.join(broadcast(negs), col("doc_id") === col("neg_id"))
        .select(col("anchor_id"), col("j"), col("neg_id"), col("source").as("neg_source"))
        .orderBy(col("anchor_id"), col("j"))
    }),

    // The SQL-text surface of the custom Catalyst expressions (§2.11 /
    // GraftExtensions): the whole ANN-scoring pipeline written as one
    // spark.sql(...) string — cosine_sim / dot_product / l2_dist resolve
    // from the function registry (VectorFns.register, the programmatic
    // spelling of spark.sql.extensions=graft.GraftExtensions) and stay
    // codegen'd inside the same broadcast-probe + per-query-window plan
    // the DataFrame entry point produces. Grades that a SQL-only user of
    // the library gets identical results and plans.
    "q162_sql_surface" -> ((s, dir) => {
      graft.functions.VectorFns.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("emb_sql")
      s.sql(
        """SELECT query_id, vec_id, score, dot, dist, rank FROM (
          |  SELECT q.vec_id AS query_id, e.vec_id,
          |    round(cosine_sim(e.embedding, q.embedding), 4) AS score,
          |    round(dot_product(e.embedding, q.embedding), 4) AS dot,
          |    round(l2_dist(e.embedding, q.embedding), 4) AS dist,
          |    row_number() OVER (PARTITION BY q.vec_id
          |      ORDER BY round(cosine_sim(e.embedding, q.embedding), 4) DESC,
          |               e.vec_id ASC) AS rank
          |  FROM emb_sql e
          |  JOIN emb_sql q ON q.vec_id >= 15 AND q.vec_id < 20
          |) WHERE rank <= 4
          |ORDER BY query_id, rank""".stripMargin)
    }),

    // Matryoshka-style dimension truncation evaluated as a recall curve:
    // rank by cosine over the FIRST d coordinates only (d = 8/16/32/64) and
    // measure top-4 overlap against the full-dim exact ranking. The scale
    // story: truncated scoring cuts scan bandwidth d/64-fold for the
    // candidate pass (the same two-stage shape as q104's PQ re-rank); this
    // query grades how much ranking quality each truncation surrenders.
    // Probes broadcast; one window per (dim, query) partition ranks locally.
    "q138_matryoshka_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") >= 20 && col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val dims = s.range(0, 4)
        .select(pow(lit(2), col("id")).cast("int").multiply(8).as("dim"))
      val scored = e.crossJoin(broadcast(probes)).crossJoin(broadcast(dims))
        .select(col("dim"), col("query_id"), col("vec_id"),
          round(VectorFns.cosineSim(
            slice(col("embedding"), lit(1), col("dim")),
            slice(col("qv"), lit(1), col("dim"))), 4).as("score"))
      val w = Window.partitionBy(col("dim"), col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      val topk = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
        .select("dim", "query_id", "vec_id").localCheckpoint()
      val full = topk.filter(col("dim") === 64).select("query_id", "vec_id")
      topk.join(broadcast(full), Seq("query_id", "vec_id"))
        .groupBy(col("dim")).agg(count(lit(1)).as("n_hits"))
        .select(col("dim").cast("long").as("dim"), col("n_hits"),
          floor(lit(10000.0) * col("n_hits") / lit(40) + 0.5).cast("long").as("recall_bp"))
        .orderBy(col("dim"))
    }),

    // Hard-negative mining — the contrastive-training data op: for each
    // probe, the top-4 most-similar vectors whose LABEL DIFFERS (similar
    // but wrong = the gradient-rich negatives). Probe set broadcasts, the
    // corpus never shuffles; per-probe ranking is one window. At 100 TB the
    // candidate pass routes through the IVF/LSH index first (q24/q55), with
    // this exact scoring as the re-rank stage.
    "q139_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
          col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      e.crossJoin(broadcast(probes))
        .filter(col("label") =!= col("qlabel"))
        .select(col("query_id"), col("vec_id"), col("label").cast("long").as("label"),
          round(VectorFns.cosineSim(col("embedding"), col("qv")), 4).as("score"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), col("label"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // same semantics via the map-side-combining top-k aggregate (100 TB shape)
    "q22_ann_topk_agg" -> ((s, dir) =>
      VectorSearch.topKAgg(t(s, dir, "embeddings"), queriesDf(s, dir, 5, 10), k = 4)
        .orderBy(col("query_id"), col("rank"))),

    // IVF with nprobe = nlist ⇒ exact (the reference's own configuration)
    "q23_ann_ivf_exact" -> ((s, dir) =>
      ivf(s, dir, nlist = 16)
        .search(queriesDf(s, dir, 10, 15), k = 4, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))),

    // IVF with nprobe < nlist — the pruned scale path. The quantizer is the
    // SEEDED (data-independent) one, so the cell assignment, probe choice and
    // in-cell ranking all replay in DuckDB (ivfProbeOracleSql) — approximate
    // vs brute force, but deterministic vs its own definition, exactly the
    // q55 framing. The learned-KMeans quantizer stays graded by q23.
    "q24_ann_ivf_probe" -> ((s, dir) =>
      ivfSeeded(s, dir, nlist = 16)
        .search(queriesDf(s, dir, 10, 15), k = 4, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))),

    // Embedding-space corpus cartography (the SemDeDup/cluster-balanced
    // curation view): every vector assigned to its seeded cell (the q24
    // quantizer — data-independent, so the whole map replays in SQL),
    // then per-cluster population, mean affinity to the centroid, and the
    // exemplar (best-affinity member, id tie-break) — the summary a
    // curation pipeline uses to prune over-represented regions and pick
    // cluster representatives. One broadcast of 16 centroids, one window
    // over cells; the checkpointed scored table keeps the assignment fold
    // single. All float math rounds at declared scales.
    "q134_embed_clusters" -> ((s, dir) => {
      import graft.functions.VectorFns
      val idx = ivfSeeded(s, dir, nlist = 16)
      val scored = idx.cells.join(broadcast(idx.centroids), "cell")
        .select(col("cell"), col("vec_id"),
          round(VectorFns.cosineSim(col("embedding"), col("centroid")), 4).as("score"))
        .localCheckpoint()
      val agg = scored.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("score").cast("decimal(18,4)")).cast("double").as("ssum"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell")).orderBy(col("score").desc, col("vec_id").asc)
      val ex = scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("cell"), col("vec_id").as("exemplar_id"),
          col("score").as("exemplar_score"))
      agg.join(ex, "cell")
        .select(col("cell"), col("n_vecs"),
          floor(col("ssum") / col("n_vecs") * 10000 + 0.5).cast("long").as("mean_score_bp"),
          col("exemplar_id"), col("exemplar_score"))
        .orderBy(col("cell"))
    }),

    // SemDeDup-style semantic dedup (Abbas et al. 2023) — the PRUNE step
    // q134's cartography feeds: cluster-bucket the corpus with the seeded
    // quantizer, compute pairwise cosine ONLY within cells (the cell is
    // the blocking key — never a global n² join; at warehouse scale each
    // cell is one partition of the hive-partitioned IVF layout), and drop
    // the higher-id member of every pair at/above the dedup threshold.
    // The planted near-copies (q38's fixture, cosine ≈0.9999 vs a ~0.5
    // natural ceiling) land in their base vector's cell and must be
    // dropped; output is the per-cell population, drop count, and a
    // kept-id checksum the oracle replays end-to-end (assignment, pairs,
    // drop rule).
    "q151_semantic_dedup" -> ((s, dir) => {
      import graft.functions.VectorFns
      val aug = nearDupVecs(s, dir)
      val idx = VectorSearch.buildIvfSeeded(aug, nlist = 16, dim = 64)
      val cells = idx.cells.select(col("cell"), col("vec_id"), col("embedding"))
        .localCheckpoint() // feeds both pair sides + the final rollup
      val pairs = cells
        .select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("va"))
        .join(cells.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("vb")),
          Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .filter(round(VectorFns.cosineSim(col("va"), col("vb")), 4) >= 0.99)
      val dropped = pairs.select(col("id_b").as("vec_id")).distinct()
        .withColumn("dropped", lit(1L))
      cells.join(dropped, Seq("vec_id"), "left")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(coalesce(col("dropped"), lit(0L))).as("n_dropped"),
          sum(when(col("dropped").isNull, col("vec_id")).otherwise(0L)).as("kept_sum_ids"))
        .orderBy(col("cell"))
    }),

    // Embedding-space drift monitor — the observability check a training
    // pipeline keeps on its embedding column between corpus epochs (q131
    // watches VALUE distributions; this watches the representation space):
    // per label, the cosine between the two epochs' centroid DIRECTIONS.
    // Exactness discipline: coordinates quantize to integer 1e-4 units,
    // component sums are exact longs, and cosine needs no mean (scale-
    // invariant ⇒ sums suffice); the dot/norms stay inside exact-long
    // range (≤4e14 < 2^53), so even the final double math is bit-identical
    // across engines. Two partial-aggregated shuffles at any scale.
    "q154_embedding_drift" -> ((s, dir) => {
      val dims = 64
      val q = t(s, dir, "embeddings")
        .withColumn("epoch", when(col("vec_id") % 2 === 0, lit("a")).otherwise(lit("b")))
        .select(col("label").cast("long").as("label"), col("epoch"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("qv"))
      val summed = q.groupBy(col("label"), col("epoch"))
        .agg(count(lit(1)).as("n"),
          array((1 to dims).map(i => sum(element_at(col("qv"), i))): _*).as("v"))
      val a = summed.filter(col("epoch") === "a")
        .select(col("label"), col("n").as("n_a"), col("v").as("va"))
      val b = summed.filter(col("epoch") === "b")
        .select(col("label"), col("n").as("n_b"), col("v").as("vb"))
      def dotL(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, r) => p * r), lit(0L), (acc, v) => acc + v)
      a.join(b, "label")
        .withColumn("drift_bp",
          floor(lit(10000.0) * (dotL(col("va"), col("vb")).cast("double")
            / (sqrt(dotL(col("va"), col("va")).cast("double"))
              * sqrt(dotL(col("vb"), col("vb")).cast("double")))) + 0.5).cast("long"))
        .select(col("label"), col("n_a"), col("n_b"), col("drift_bp"))
        .orderBy(col("label"))
    }),

    // Retrieval-quality evaluation — the recall@k measurement every ANN
    // index ships with (and the gate an index-parameter change must pass
    // before rollout): the pruned probe's top-4 against the exact top-4
    // on the same queries, hit counts by a keyed join, recall in integer
    // basis points. Both sides are deterministic, so the metric itself is
    // exact and replays in SQL — index QUALITY measured with the same
    // rigor as index results.
    "q136_ann_recall" -> ((s, dir) => {
      val q = queriesDf(s, dir, 10, 15)
      val exact = VectorSearch.topK(t(s, dir, "embeddings"), q, k = 4)
        .select(col("query_id"), col("vec_id"))
      val approx = ivfSeeded(s, dir, nlist = 16).search(q, k = 4, nprobe = 4)
        .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("query_id"), col("k"), col("n_hits"),
          expr("(10000 * n_hits) DIV k").as("recall_bp"))
        .orderBy(col("query_id"))
    }),

    // Product-quantization ANN (ADC scan): codes + a per-query LUT join
    // stand in for full-precision vectors — the memory-compression scale
    // path beside IVF's IO pruning. Seeded codebook ⇒ the encode, the LUT
    // and the summed approximate distances all replay in DuckDB.
    "q94_ann_pq" -> ((s, dir) =>
      VectorSearch.topKPqSeeded(t(s, dir, "embeddings"), queriesDf(s, dir, 20, 25),
          k = 4, dim = 64)
        .orderBy(col("query_id"), col("rank"))),

    // Two-stage retrieval: PQ candidates (compressed-domain scan) → exact
    // cosine re-rank of the 20 survivors per query — the production ANN
    // shape; the whole path (codes, LUT, candidate cut, re-rank) replays
    "q104_ann_rerank" -> ((s, dir) =>
      VectorSearch.topKPqRerank(t(s, dir, "embeddings"), queriesDf(s, dir, 25, 30),
          kCand = 20, k = 4, dim = 64)
        .orderBy(col("query_id"), col("rank"))),

    // Int8 scalar-quantization ANN (Milvus SQ8 / faiss ScalarQuantizer):
    // per-dim corpus min/max bounds → one byte per coordinate → asymmetric
    // scoring of the full-precision query against reconstructions. The 4×
    // compression tier between full floats and PQ's 16-32×; bounds are
    // exact aggregates so the whole path replays in SQL.
    // BINARY-vector search (Milvus BINARY_FLAT with HAMMING / JACCARD
    // metrics, faiss IndexBinaryFlat): sign-binarize the float embeddings
    // into 2 packed longs (dims 0-31 → lo, 32-63 → hi; 32× compression —
    // the cheap sketch tier below SQ8/PQ), then score by popcount
    // arithmetic — Hamming = bit_count(xor) over both words, Jaccard
    // similarity = |AND| / |OR| in integer basis points. Codegen'd bit ops
    // end to end: no arrays survive past the binarize map, so the scoring
    // scan moves 16 bytes per corpus row. At 100 TB this tier is the
    // pre-filter in front of exact re-ranking (q20's SimHash buckets are
    // the indexed spelling of the same idea). Top-5 per query by (Hamming
    // asc, id asc); both metrics replay bit-exactly in SQL.
    "q217_hamming_topk" -> ((s, dir) => {
      val pack = (from: Int) =>
        s"aggregate(zip_with(slice(embedding, $from, 32), sequence(0, 31), " +
          "(x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)"
      val codes = t(s, dir, "embeddings")
        .selectExpr("vec_id", s"${pack(1)} AS lo", s"${pack(33)} AS hi")
      val q = codes.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("lo").as("qlo"), col("hi").as("qhi"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming").asc, col("vec_id").asc)
      codes.filter(col("vec_id") >= 3)
        .crossJoin(broadcast(q))
        .withColumn("hamming",
          expr("cast(bit_count(lo ^ qlo) + bit_count(hi ^ qhi) as bigint)"))
        .withColumn("jaccard_bp", expr(
          """cast(CASE WHEN bit_count(lo | qlo) + bit_count(hi | qhi) = 0 THEN 10000
            |ELSE (10000 * (bit_count(lo & qlo) + bit_count(hi & qhi)))
            |  DIV (bit_count(lo | qlo) + bit_count(hi | qhi)) END as bigint)""".stripMargin))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id"), col("hamming"), col("jaccard_bp"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // RANGE search — the OTHER search verb production vector stores expose
    // beside top-k (faiss range_search, Milvus radius search): ALL
    // neighbors at/above a similarity threshold, not a fixed k — the shape
    // dedup-by-radius and recall-oriented retrieval use. Result size is
    // data-dependent, so the graded output is the per-query hit census
    // (count, id-sum membership checksum, score bounds). Same scan shape
    // as brute top-k minus the window: threshold filter replaces ranking,
    // so nothing even shuffles until the per-query rollup.
    "q199_range_search" -> ((s, dir) => {
      import graft.functions.VectorFns
      t(s, dir, "embeddings").crossJoin(broadcast(queriesDf(s, dir, 50, 55)))
        .withColumn("score",
          round(VectorFns.cosineSim(col("embedding"), col("query_vec")), 4))
        .filter(col("score") >= 0.25)
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"), sum(col("vec_id")).as("sum_ids"),
          max(col("score")).as("max_score"), min(col("score")).as("min_score"))
        .orderBy(col("query_id"))
    }),

    // IVF-PRUNED range search over the PERSISTED layout (faiss
    // range_search on IndexIVF): the coarse quantizer is trained and the
    // cell layout + per-cell angular radii written offline; serving loads
    // the layout and probes ONLY cells whose angular upper bound
    // cos(θ(q,c) − θmax(cell)) clears the threshold, exact-rescoring
    // inside. The bound is SOUND, so the pruned result is hash-identical
    // to q199's brute replay shape — an oracle-checkable claim no nprobe
    // top-k can make — while at corpus scale unqualifying cells are
    // partition-pruned IO. Census shape = q199 over a different query band.
    "q202_range_ivf" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q202_ivf_").toString
      val built = VectorSearch.buildIvf(t(s, dir, "embeddings"), nlist = 16)
      VectorSearch.writeIvf(built, tmp)
      val layout = VectorSearch.loadIvf(s, tmp)
      layout.rangeSearch(queriesDf(s, dir, 60, 65), threshold = 0.25)
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"), sum(col("vec_id")).as("sum_ids"),
          max(col("score")).as("max_score"), min(col("score")).as("min_score"))
        .orderBy(col("query_id"))
    }),

    // IVF-PQ — the composed production index (faiss IndexIVFPQ / Milvus
    // IVF_PQ): seeded coarse quantizer prunes to nprobe of nlist cells per
    // query, seeded-PQ asymmetric distance ranks only inside probed cells.
    // Both stages are data-independent, so the oracle replays cell
    // assignment, probe choice, encode, LUT and the pruned ADC ranking.
    "q198_ann_ivfpq" -> ((s, dir) =>
      VectorSearch.topKIvfPq(t(s, dir, "embeddings"), queriesDf(s, dir, 40, 45),
        k = 4, dim = 64)),

    "q145_ann_sq8" -> ((s, dir) =>
      VectorSearch.topKSq8(t(s, dir, "embeddings"), queriesDf(s, dir, 30, 35), k = 4)
        .orderBy(col("query_id"), col("rank"))),

    // LSH-bucketed ANN — the training-free scale path (approximate →
    // rows-only, like the pruned IVF probe q24)
    "q55_ann_lsh" -> ((s, dir) =>
      VectorSearch.topKLsh(t(s, dir, "embeddings"), queriesDf(s, dir, 15, 20),
          k = 4, dim = 64)
        .orderBy(col("query_id"), col("rank"))),

    // embedding-cosine near-dup (BASELINE.json dedup mandate): sign-LSH
    // bucketing bounds the pairwise work; exact cosine verifies. Planted
    // near-copies (tiny deterministic perturbation) are the ground truth —
    // the brute-force oracle must agree exactly.
    "q38_embed_neardup" -> ((s, dir) => {
      graft.operators.Dedup.embedNearDupPairs(
          nearDupVecs(s, dir), "vec_id", "embedding",
          dim = 64, bands = 6, bitsPerBand = 16, threshold = 0.9)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // V2 masked mean-pool (embed.py:44-49: sum(token_emb·mask)/sum(mask),
    // then L2-normalize) as pure vectorized array ops — no UDF, no explode
    // in the pooling itself. Token embeddings are four deterministic
    // transforms of the document embedding; the mask knocks one token out
    // per vec_id residue class. Result exploded to (vec_id, i, v) scalars
    // so the oracle hash-checks every dimension.
    "q57_mean_pool" -> ((s, dir) => {
      import graft.functions.VectorFns
      val e = t(s, dir, "embeddings")
        .filter(col("vec_id") < 200)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val tokVecs = array(
        col("v"),
        transform(col("v"), x => x * 0.5 + 0.25),
        transform(col("v"), x => -x),
        transform(col("v"), x => x + 0.1))
      val mask = array((1 to 4).map(tk =>
        when((col("vec_id") + tk) % 3 === 0, 0.0).otherwise(1.0)): _*)
      // staged projections: each alias is referenced twice downstream, so
      // CollapseProject leaves the stages separate and every array is
      // computed ONCE per row — folding pool+normalize into one expression
      // tree re-evaluates the nested lambdas combinatorially (no CSE inside
      // interpreted higher-order functions; this was a 25× slowdown)
      e.select(col("vec_id"), VectorFns.maskedMeanPool(tokVecs, mask).as("pooled"))
        .select(col("vec_id"), col("pooled"), VectorFns.l2Norm(col("pooled")).as("nrm"))
        .select(col("vec_id"),
          posexplode(transform(col("pooled"), x => x / col("nrm"))).as(Seq("i", "v")))
        .select(col("vec_id"), col("i").cast("int").as("i"), round(col("v"), 4).as("v"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // J3/S8 hydration join: top-k hits stitched onto the document corpus
    // (vdb.py:105-119) — hits side is tiny ⇒ broadcast
    "q25_search_hydrate" -> ((s, dir) => {
      val hits = VectorSearch.topK(t(s, dir, "embeddings"), queriesDf(s, dir, 0, 3), k = 4)
      val docs = t(s, dir, "documents")
      docs.join(broadcast(hits), docs("doc_id") === hits("vec_id"))
        .select(col("query_id"), col("doc_id"), col("score"), col("rank"),
          col("lang"), col("source"), substring(col("text"), 1, 40).as("preview"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** DuckDB replay of sign-LSH banded ANN (topKLsh, q55). The hyperplanes
    * depend only on (dim=64, bands=6, bitsPerBand=8, seed=42) — NOT on the
    * data — so the oracle embeds the exact runtime plane values as SQL
    * literals: `Double.toString` of the widened float round-trips bit-exactly
    * through DuckDB's double parser, and both engines then accumulate the
    * same float-widened products. A sign flip would need |v·h| ≈ 0 to within
    * summation-order noise (~1e-13 relative), which Gaussian planes make
    * vanishingly improbable; candidate sets therefore agree exactly and the
    * query stops being "approximate → rows-only": approximate vs BRUTE FORCE,
    * deterministic vs ITS OWN DEFINITION, which is what this replays. */
  private lazy val lshOracleSql: String = {
    val planes = graft.operators.Dedup.hyperplanes(64, 48, 42L)
    val rows = planes.zipWithIndex.map { case (p, bit) =>
      s"(${bit / 8}, ${bit % 8}, [${p.map(f => f.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n")
    s"""WITH planes(band, j, h) AS (VALUES
       |$rows),
       |q AS (SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
       |      FROM embeddings WHERE vec_id >= 15 AND vec_id < 20),
       |corpus AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |csig AS (SELECT vec_id, band,
       |    sum(CASE WHEN list_dot_product(v, h) >= 0 THEN 1 << j ELSE 0 END) AS bsig
       |  FROM corpus, planes GROUP BY vec_id, band),
       |qsig AS (SELECT query_id, band,
       |    sum(CASE WHEN list_dot_product(qv, h) >= 0 THEN 1 << j ELSE 0 END) AS bsig
       |  FROM q, planes GROUP BY query_id, band),
       |cand AS (SELECT DISTINCT qs.query_id, cs.vec_id
       |  FROM csig cs JOIN qsig qs ON cs.band = qs.band AND cs.bsig = qs.bsig),
       |scored AS (SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(e.v, q.qv), 4) AS score
       |  FROM cand c JOIN corpus e ON e.vec_id = c.vec_id
       |              JOIN q ON q.query_id = c.query_id)
       |SELECT query_id, vec_id, score,
       |  cast(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, vec_id ASC) as int) AS rank
       |FROM scored QUALIFY rank <= 4
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of the SEEDED pruned IVF probe (q24). Centroids are
    * data-independent Gaussian directions (hyperplanes(64, 16, 7)) embedded
    * as double literals — `Double.toString` of the widened float round-trips
    * bit-exactly, the q55 precedent. The replay mirrors each stage of
    * buildIvfSeeded + IvfIndex.search:
    *  - cell assignment: argmax ROUNDED(4) cosine, ties → lowest cell
    *    (the strict-> left fold keeps the earliest max);
    *  - probe choice: top-nprobe cells by UNROUNDED cosine (search's
    *    centroid window), ties → lowest cell;
    *  - in-cell ranking: rounded score DESC, vec_id ASC — the q21 pattern.
    * Unrounded orderings agree cross-engine because both accumulate the
    * same widened-float products in index order; a flip would need two
    * Gaussian-direction cosines within summation-noise (~1e-15) of each
    * other — the q55 sign-flip argument. */
  /** The probe chain as CTEs ending in `approx(query_id, vec_id, score,
    * rank ≤ 4)` — shared by q24 (graded ranking) and q136 (recall vs the
    * exact top-k). Exposes `q(query_id, qv)` for reuse by later CTEs. */
  private lazy val ivfProbeCtes: String = {
    val cents = graft.operators.Dedup.hyperplanes(64, 16, 7L)
    val rows = cents.zipWithIndex.map { case (c, cell) =>
      s"($cell, [${c.map(f => f.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n")
    s"""cent(cell, cv) AS (VALUES
       |$rows),
       |corpus AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY round(list_cosine_similarity(v, cv), 4) DESC, cell ASC) AS arank
       |  FROM corpus, cent QUALIFY arank = 1),
       |q AS (SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
       |      FROM embeddings WHERE vec_id >= 10 AND vec_id < 15),
       |probed AS (
       |  SELECT query_id, qv, cell,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_cosine_similarity(qv, cv) DESC, cell ASC) AS crank
       |  FROM q, cent QUALIFY crank <= 4),
       |cand AS (
       |  SELECT p.query_id, p.qv, a.vec_id, a.v
       |  FROM assigned a JOIN probed p ON a.cell = p.cell),
       |approx AS (
       |  SELECT query_id, vec_id,
       |    round(list_cosine_similarity(v, qv), 4) AS score,
       |    cast(row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(list_cosine_similarity(v, qv), 4) DESC, vec_id ASC) as int) AS rank
       |  FROM cand QUALIFY rank <= 4)""".stripMargin
  }

  private lazy val ivfProbeOracleSql: String =
    s"""WITH $ivfProbeCtes
       |SELECT query_id, vec_id, score, rank FROM approx
       |ORDER BY query_id, rank""".stripMargin

  /** Recall@4 of the pruned probe vs the exact top-4 over the same
    * queries (q136): the exact side reuses the probe's `q` CTE, the
    * intersection is a keyed left join, recall in integer basis points. */
  private lazy val annRecallOracleSql: String =
    s"""WITH $ivfProbeCtes,
       |brute AS (
       |  SELECT q.query_id, e.vec_id,
       |    cast(row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) DESC,
       |               e.vec_id ASC) as int) AS rank
       |  FROM embeddings e, q QUALIFY rank <= 4)
       |SELECT b.query_id, count(*) AS k,
       |  cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_hits,
       |  (10000 * cast(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint))
       |    // count(*) AS recall_bp
       |FROM brute b LEFT JOIN approx a
       |  ON a.query_id = b.query_id AND a.vec_id = b.vec_id
       |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin

  /** DuckDB replay of the seeded-PQ ADC scan (q94): codebooks as double
    * literals (the q24 precedent), per-subspace argmin on ROUNDED L2² with
    * code-ASC tie-break (the strict-< fold), LUT join on (s, code), and the
    * DECIMAL distance sum so partial-merge order can't drift the hash. */
  /** CTE chain `cw…acc` replaying the seeded-PQ ADC scan for query ids in
    * [lo, hi): codebook literals, per-subspace argmin encode, LUT join,
    * DECIMAL distance sum per (query, vector). Shared by q94 (graded ADC
    * ranking) and q104 (PQ candidates → exact re-rank). */
  private def pqCtes(lo: Int, hi: Int): String = {
    val books = VectorSearch.pqCodebooks(64, 4, 8, 11L)
    val rows = (for ((cws, s) <- books.zipWithIndex; (cw, c) <- cws.zipWithIndex)
      yield s"($s, $c, [${cw.map(f => f.toDouble.toString).mkString(", ")}])")
      .mkString(",\n")
    s"""cw(s, code, cv) AS (VALUES
       |$rows),
       |corpus AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |scored AS (
       |  SELECT vec_id, s, code,
       |    round(list_reduce(list_transform(generate_series(1, 16), j ->
       |      (v[s*16 + j] - cv[j]) * (v[s*16 + j] - cv[j])), (a, b) -> a + b), 4) AS d
       |  FROM corpus, cw),
       |codes AS (
       |  SELECT vec_id, s, code FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, s
       |    ORDER BY d ASC, code ASC) = 1),
       |q AS (SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
       |      FROM embeddings WHERE vec_id >= $lo AND vec_id < $hi),
       |lut AS (
       |  SELECT query_id, s, code,
       |    round(list_reduce(list_transform(generate_series(1, 16), j ->
       |      (qv[s*16 + j] - cv[j]) * (qv[s*16 + j] - cv[j])), (a, b) -> a + b), 4) AS d
       |  FROM q, cw),
       |acc AS (
       |  SELECT query_id, vec_id, sum(cast(d as decimal(18,4))) AS sdec
       |  FROM codes JOIN lut USING (s, code)
       |  GROUP BY query_id, vec_id)""".stripMargin
  }

  /** DuckDB replay of the IVF-PQ composition (q198): the ivfProbeCtes cell
    * assignment + probe rules (rounded-argmax assignment, unrounded probe
    * window) gate the candidate set; the pqCtes encode/LUT/decimal-sum
    * rules rank inside it. Two literal codebooks (cv = centroids seed 7,
    * pv = PQ codewords seed 11) keep the whole path data-independent. */
  private lazy val ivfPqOracleSql: String = {
    val cents = graft.operators.Dedup.hyperplanes(64, 16, 7L)
    val centRows = cents.zipWithIndex.map { case (c, cell) =>
      s"($cell, [${c.map(f => f.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n")
    val books = VectorSearch.pqCodebooks(64, 4, 8, 11L)
    val cwRows = (for ((cws, s) <- books.zipWithIndex; (cw, c) <- cws.zipWithIndex)
      yield s"($s, $c, [${cw.map(f => f.toDouble.toString).mkString(", ")}])")
      .mkString(",\n")
    s"""WITH cent(cell, cv) AS (VALUES
       |$centRows),
       |cw(s, code, pv) AS (VALUES
       |$cwRows),
       |corpus AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY round(list_cosine_similarity(v, cv), 4) DESC, cell ASC) AS arank
       |    FROM corpus, cent) WHERE arank = 1),
       |q AS (SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
       |      FROM embeddings WHERE vec_id >= 40 AND vec_id < 45),
       |probed AS (
       |  SELECT query_id, cell FROM (
       |    SELECT query_id, cell,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv, cv) DESC, cell ASC) AS crank
       |    FROM q, cent) WHERE crank <= 4),
       |scored AS (
       |  SELECT vec_id, s, code,
       |    round(list_reduce(list_transform(generate_series(1, 16), j ->
       |      (v[s*16 + j] - pv[j]) * (v[s*16 + j] - pv[j])), (a, b) -> a + b), 4) AS d
       |  FROM corpus, cw),
       |codes AS (
       |  SELECT vec_id, s, code FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, s
       |    ORDER BY d ASC, code ASC) = 1),
       |lut AS (
       |  SELECT query_id, s, code,
       |    round(list_reduce(list_transform(generate_series(1, 16), j ->
       |      (qv[s*16 + j] - pv[j]) * (qv[s*16 + j] - pv[j])), (a, b) -> a + b), 4) AS d
       |  FROM q, cw),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM assigned a JOIN probed p ON a.cell = p.cell),
       |acc AS (
       |  SELECT c.query_id, c.vec_id, sum(cast(l.d as decimal(18,4))) AS sdec
       |  FROM cand c
       |  JOIN codes k ON k.vec_id = c.vec_id
       |  JOIN lut l ON l.query_id = c.query_id AND l.s = k.s AND l.code = k.code
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id, cast(sdec as double) AS adist,
       |  cast(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sdec ASC, vec_id ASC) as int) AS rank
       |FROM acc QUALIFY rank <= 4
       |ORDER BY query_id, rank""".stripMargin
  }

  private lazy val pqOracleSql: String =
    s"""WITH ${pqCtes(20, 25)}
       |SELECT query_id, vec_id, cast(sdec as double) AS adist,
       |  cast(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sdec ASC, vec_id ASC) as int) AS rank
       |FROM acc QUALIFY rank <= 4
       |ORDER BY query_id, rank""".stripMargin

  /** q104: PQ top-20 candidates (the acc ranking), exact-cosine re-rank. */
  private lazy val pqRerankOracleSql: String =
    s"""WITH ${pqCtes(25, 30)},
       |pqtop AS (
       |  SELECT query_id, vec_id FROM acc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY sdec ASC, vec_id ASC) <= 20),
       |rer AS (
       |  SELECT p.query_id, p.vec_id,
       |    round(list_cosine_similarity(c.v, q.qv), 4) AS score
       |  FROM pqtop p
       |  JOIN corpus c ON c.vec_id = p.vec_id
       |  JOIN q ON q.query_id = p.query_id)
       |SELECT query_id, vec_id, score,
       |  cast(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, vec_id ASC) as int) AS rank
       |FROM rer QUALIFY rank <= 4
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of the cluster cartography (q134): the q24 assignment
    * CTE (argmax rounded cosine, earliest-max tie → lowest cell), then the
    * per-cell aggregate over decimal-cast rounded scores and the exemplar
    * window. floor(x*1e4 + 0.5) instead of round() — the .00005-boundary
    * rule. */
  private lazy val embedClustersOracleSql: String = {
    val cents = graft.operators.Dedup.hyperplanes(64, 16, 7L)
    val rows = cents.zipWithIndex.map { case (c, cell) =>
      s"($cell, [${c.map(f => f.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n")
    s"""WITH cent(cell, cv) AS (VALUES
       |$rows),
       |corpus AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY round(list_cosine_similarity(v, cv), 4) DESC, cell ASC) AS arank
       |  FROM corpus, cent QUALIFY arank = 1),
       |sc AS (
       |  SELECT a.vec_id, a.cell,
       |    round(list_cosine_similarity(a.v, c.cv), 4) AS score
       |  FROM assigned a JOIN cent c USING (cell)),
       |agg AS (
       |  SELECT cell, count(*) AS n_vecs,
       |    cast(sum(cast(score as decimal(18,4))) as double) AS ssum
       |  FROM sc GROUP BY cell),
       |ex AS (
       |  SELECT cell, vec_id AS exemplar_id, score AS exemplar_score,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY score DESC, vec_id ASC) AS r
       |  FROM sc QUALIFY r = 1)
       |SELECT a.cell, a.n_vecs,
       |  cast(floor(a.ssum / a.n_vecs * 10000 + 0.5) as bigint) AS mean_score_bp,
       |  e.exemplar_id, e.exemplar_score
       |FROM agg a JOIN ex e USING (cell)
       |ORDER BY a.cell""".stripMargin
  }

  /** DuckDB replay of q151: the q24/q134 seeded assignment CTE over the
    * AUGMENTED corpus (q38's planted near-copies), within-cell pairwise
    * cosine at the dedup threshold, drop-the-higher-id rule, per-cell
    * rollup with a kept-id checksum. */
  private lazy val semanticDedupOracleSql: String = {
    val cents = graft.operators.Dedup.hyperplanes(64, 16, 7L)
    val rows = cents.zipWithIndex.map { case (c, cell) =>
      s"($cell, [${c.map(f => f.toDouble.toString).mkString(", ")}])"
    }.mkString(",\n")
    s"""WITH cent(cell, cv) AS (VALUES
       |$rows),
       |corpus AS (
       |$nearDupVecsSql),
       |assigned AS (
       |  SELECT vec_id, v, cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY round(list_cosine_similarity(v, cv), 4) DESC, cell ASC) AS arank
       |  FROM corpus, cent QUALIFY arank = 1),
       |pairs AS (
       |  SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.99),
       |dropped AS (SELECT DISTINCT id_b AS vec_id FROM pairs)
       |SELECT a.cell, count(*) AS n_vecs,
       |  cast(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_dropped,
       |  cast(sum(CASE WHEN d.vec_id IS NULL THEN a.vec_id ELSE 0 END) as bigint) AS kept_sum_ids
       |FROM assigned a LEFT JOIN dropped d USING (vec_id)
       |GROUP BY a.cell ORDER BY a.cell""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q151_semantic_dedup" -> semanticDedupOracleSql,

    "q217_hamming_topk" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) AS j
        |  FROM embeddings),
        |codes AS (
        |  SELECT vec_id,
        |    bit_or(CASE WHEN v > 0 AND j <= 32 THEN (1::BIGINT << (j-1)) ELSE 0 END) AS lo,
        |    bit_or(CASE WHEN v > 0 AND j > 32 THEN (1::BIGINT << (j-33)) ELSE 0 END) AS hi
        |  FROM ex GROUP BY vec_id),
        |q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM codes WHERE vec_id < 3),
        |s AS (
        |  SELECT q.query_id, c.vec_id,
        |    cast(bit_count(xor(c.lo, q.qlo)) + bit_count(xor(c.hi, q.qhi)) as bigint) AS hamming,
        |    cast(CASE WHEN bit_count(c.lo | q.qlo) + bit_count(c.hi | q.qhi) = 0 THEN 10000
        |         ELSE (10000 * (bit_count(c.lo & q.qlo) + bit_count(c.hi & q.qhi)))
        |           // (bit_count(c.lo | q.qlo) + bit_count(c.hi | q.qhi)) END as bigint) AS jaccard_bp
        |  FROM codes c CROSS JOIN q WHERE c.vec_id >= 3),
        |r AS (
        |  SELECT query_id, vec_id, hamming, jaccard_bp,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY hamming ASC, vec_id ASC) as int) AS rank
        |  FROM s QUALIFY rank <= 5)
        |SELECT query_id, vec_id, hamming, jaccard_bp, rank
        |FROM r ORDER BY query_id, rank""".stripMargin,

    "q154_embedding_drift" ->
      """WITH q AS (
        |  SELECT cast(label as bigint) AS label,
        |    CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS epoch,
        |    list_transform(cast(embedding as double[]),
        |      x -> cast(floor(x * 10000 + 0.5) as bigint)) AS qv
        |  FROM embeddings),
        |ex AS (
        |  SELECT label, epoch, g.i, cast(sum(qv[g.i]) as bigint) AS s
        |  FROM q, (SELECT unnest(generate_series(1, 64)) AS i) g
        |  GROUP BY label, epoch, g.i),
        |sv AS (SELECT label, epoch, list(s ORDER BY i) AS v FROM ex GROUP BY label, epoch),
        |cnt AS (SELECT label, epoch, count(*) AS n FROM q GROUP BY label, epoch),
        |j AS (
        |  SELECT a.label, ca.n AS n_a, cb.n AS n_b, a.v AS va, b.v AS vb
        |  FROM sv a
        |  JOIN sv b ON b.label = a.label AND b.epoch = 'b'
        |  JOIN cnt ca ON ca.label = a.label AND ca.epoch = 'a'
        |  JOIN cnt cb ON cb.label = a.label AND cb.epoch = 'b'
        |  WHERE a.epoch = 'a')
        |SELECT label, n_a, n_b,
        |  cast(floor(10000.0 * (cast(list_reduce(
        |      list_transform(generate_series(1, 64), i -> va[i] * vb[i]),
        |      (x, y) -> x + y) as double)
        |    / (sqrt(cast(list_reduce(list_transform(generate_series(1, 64), i -> va[i] * va[i]), (x, y) -> x + y) as double))
        |       * sqrt(cast(list_reduce(list_transform(generate_series(1, 64), i -> vb[i] * vb[i]), (x, y) -> x + y) as double))))
        |    + 0.5) as bigint) AS drift_bp
        |FROM j ORDER BY label""".stripMargin,

    "q138_matryoshka_recall" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id >= 20 AND vec_id < 30),
        |dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
        |scored AS (
        |  SELECT d.dim, q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      (cast(e.embedding as double[]))[1:d.dim], (q.qv)[1:d.dim]), 4) AS score
        |  FROM embeddings e, q, dims d),
        |topk AS (
        |  SELECT dim, query_id, vec_id FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY dim, query_id
        |    ORDER BY score DESC, vec_id ASC) <= 4),
        |fullk AS (SELECT query_id, vec_id FROM topk WHERE dim = 64)
        |SELECT cast(t.dim as bigint) AS dim, cast(count(*) as bigint) AS n_hits,
        |  cast(floor(10000.0 * count(*) / 40 + 0.5) as bigint) AS recall_bp
        |FROM topk t JOIN fullk f USING (query_id, vec_id)
        |GROUP BY t.dim ORDER BY dim""".stripMargin,

    "q145_ann_sq8" ->
      """WITH co AS (
        |  SELECT vec_id, i, cast(embedding[i] as double) AS x
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)),
        |b AS (SELECT i, min(x) AS mn, max(x) AS mx FROM co GROUP BY i),
        |rec AS (
        |  SELECT vec_id, list(mn + (CASE WHEN mx = mn THEN 0.0
        |      ELSE floor((x - mn) * 255.0 / (mx - mn) + 0.5) END)
        |      * (mx - mn) / 255.0 ORDER BY i) AS rv
        |  FROM co JOIN b USING (i) GROUP BY vec_id),
        |q AS (SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |      FROM embeddings WHERE vec_id >= 30 AND vec_id < 35)
        |SELECT q.query_id, r.vec_id,
        |  round(list_cosine_similarity(r.rv, q.qv), 4) AS score,
        |  cast(row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY round(list_cosine_similarity(r.rv, q.qv), 4) DESC,
        |             r.vec_id ASC) as int) AS rank
        |FROM rec r, q
        |QUALIFY rank <= 4
        |ORDER BY query_id, rank""".stripMargin,

    "q139_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, label AS qlabel, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id, cast(e.label as bigint) AS label,
        |    round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) AS score
        |  FROM embeddings e, q
        |  WHERE e.label <> q.qlabel)
        |SELECT query_id,
        |  cast(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, vec_id ASC) as bigint) AS rank,
        |  vec_id, label, score
        |FROM scored
        |QUALIFY rank <= 4
        |ORDER BY query_id, rank""".stripMargin,
    "q134_embed_clusters" -> embedClustersOracleSql,
    "q136_ann_recall" -> annRecallOracleSql,
    "q94_ann_pq" -> pqOracleSql,
    "q198_ann_ivfpq" -> ivfPqOracleSql,
    "q199_range_search" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id >= 50 AND vec_id < 55),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) AS score
        |  FROM embeddings e, q)
        |SELECT query_id, count(*) AS n_hits,
        |  cast(sum(vec_id) as bigint) AS sum_ids,
        |  max(score) AS max_score, min(score) AS min_score
        |FROM scored WHERE score >= 0.25
        |GROUP BY query_id ORDER BY query_id""".stripMargin,

    // the pruned IVF range search must match the BRUTE replay exactly —
    // the oracle deliberately knows nothing about cells or bounds
    "q202_range_ivf" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id >= 60 AND vec_id < 65),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) AS score
        |  FROM embeddings e, q)
        |SELECT query_id, count(*) AS n_hits,
        |  cast(sum(vec_id) as bigint) AS sum_ids,
        |  max(score) AS max_score, min(score) AS min_score
        |FROM scored WHERE score >= 0.25
        |GROUP BY query_id ORDER BY query_id""".stripMargin,
    "q104_ann_rerank" -> pqRerankOracleSql,
    "q55_ann_lsh" -> lshOracleSql,
    "q24_ann_ivf_probe" -> ivfProbeOracleSql,
    "q57_mean_pool" ->
      """WITH e AS (
        |  SELECT vec_id, cast(embedding as double[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |m AS (SELECT vec_id, v,
        |  CASE WHEN (vec_id + 1) % 3 = 0 THEN 0.0 ELSE 1.0 END AS m1,
        |  CASE WHEN (vec_id + 2) % 3 = 0 THEN 0.0 ELSE 1.0 END AS m2,
        |  CASE WHEN (vec_id + 3) % 3 = 0 THEN 0.0 ELSE 1.0 END AS m3,
        |  CASE WHEN (vec_id + 4) % 3 = 0 THEN 0.0 ELSE 1.0 END AS m4
        |  FROM e),
        |pooled AS (SELECT vec_id,
        |  list_transform(generate_series(1, len(v)), j ->
        |    (m1 * v[j] + m2 * (v[j]*0.5 + 0.25) + m3 * (-v[j]) + m4 * (v[j] + 0.1))
        |    / (m1 + m2 + m3 + m4)) AS p
        |  FROM m),
        |norm AS (SELECT vec_id, p,
        |  sqrt(list_reduce(list_transform(p, x -> x*x), (a,b) -> a+b)) AS nrm
        |  FROM pooled),
        |flat AS (SELECT vec_id, unnest(generate_series(1, len(p))) AS j, p, nrm
        |  FROM norm)
        |SELECT vec_id, cast(j - 1 as int) AS i, round(p[j] / nrm, 4) AS v
        |FROM flat ORDER BY vec_id, i""".stripMargin,
    "q21_ann_topk" -> bruteSql(0, 5),

    // the affine draw, self-collision bump, and hydration replay exactly
    "q178_negative_sampling" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |a AS (SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 97 = 0),
        |e AS (
        |  SELECT anchor_id, j,
        |    (anchor_id * 2654435761 + (j + 1) * 40503) % n.n AS cand, n.n AS nn
        |  FROM a CROSS JOIN n
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
        |x AS (
        |  SELECT anchor_id, j,
        |    CASE WHEN cand = anchor_id THEN (cand + 1) % nn ELSE cand END AS neg_id
        |  FROM e)
        |SELECT anchor_id, j, neg_id, d.source AS neg_source
        |FROM x JOIN documents d ON d.doc_id = x.neg_id
        |ORDER BY anchor_id, j""".stripMargin,

    // the q21 brute replay widened with DuckDB's own list dot/distance —
    // all three registered expressions must agree with the list-native
    // spellings at 4 decimals
    "q162_sql_surface" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id >= 15 AND vec_id < 20)
        |SELECT query_id, vec_id, score, dot, dist, rank FROM (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) AS score,
        |    round(list_dot_product(cast(e.embedding as double[]), q.qv), 4) AS dot,
        |    round(list_distance(cast(e.embedding as double[]), q.qv), 4) AS dist,
        |    cast(row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) DESC,
        |               e.vec_id ASC) as int) AS rank
        |  FROM embeddings e, q)
        |WHERE rank <= 4
        |ORDER BY query_id, rank""".stripMargin,
    "q22_ann_topk_agg" -> bruteSql(5, 10),
    "q23_ann_ivf_exact" -> bruteSql(10, 15),
    "q38_embed_neardup" ->
      s"""WITH corpus AS ($nearDupVecsSql)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_cosine_similarity(a.v, b.v), 4) AS score
         |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
         |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,
    "q25_search_hydrate" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id >= 0 AND vec_id < 3),
        |hits AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) AS score,
        |    cast(row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY round(list_cosine_similarity(cast(e.embedding as double[]), q.qv), 4) DESC,
        |               e.vec_id ASC) as int) AS rank
        |  FROM embeddings e, q
        |  QUALIFY rank <= 4)
        |SELECT h.query_id, d.doc_id, h.score, h.rank, d.lang, d.source,
        |  substring(d.text, 1, 40) AS preview
        |FROM documents d JOIN hits h ON d.doc_id = h.vec_id
        |ORDER BY query_id, rank""".stripMargin)
}
