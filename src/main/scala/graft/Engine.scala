package graft

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Ingest, VectorSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Knobs mirroring the reference's `config.yml` surface: chunking
 * (`config.yml:89-90`), embedding batch (`config.yml:86`), IVF + top-k
 * (`config.yml:81-83`). Store/index paths play the roles of the MongoDB
 * collection and Milvus collection respectively.
 */
final case class EngineConfig(
    storePath: String,
    indexPath: String,
    chunkSize: Int = 128,
    chunkOverlap: Int = 64,
    embedDim: Int = 64,
    batchSize: Int = 128,
    nlist: Int = 128,
    nprobe: Int = 128,
    limit: Int = 4)

object EngineConfig {
  /**
   * Load from a minimal `key: value` file — the flat shape of the
   * reference's `config.yml` (chunk_size/chunk_overlap config.yml:89-90,
   * batch_size :86, nlist/nprobe/limit :81-83) without a YAML dependency:
   * `#` comments and blank lines ignored, unknown keys ignored, absent
   * keys keep the case-class defaults. store_path/index_path are required.
   */
  def load(path: String): EngineConfig = {
    val src = scala.io.Source.fromFile(path)
    val kv = try {
      src.getLines()
        .map(_.takeWhile(_ != '#').trim)
        .filter(_.nonEmpty)
        .flatMap(_.split(":", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }).toMap
    } finally src.close()
    def int(key: String, dflt: Int): Int = kv.get(key).map(_.toInt).getOrElse(dflt)
    def req(key: String): String = kv.getOrElse(key,
      throw new IllegalArgumentException(s"EngineConfig: missing required key '$key' in $path"))
    EngineConfig(
      storePath = req("store_path"),
      indexPath = req("index_path"),
      chunkSize = int("chunk_size", 128),
      chunkOverlap = int("chunk_overlap", 64),
      embedDim = int("embed_dim", 64),
      batchSize = int("batch_size", 128),
      nlist = int("nlist", 128),
      nprobe = int("nprobe", 128),
      limit = int("limit", 4))
  }
}

/**
 * The user-facing lifecycle of the reference, Spark-native — a user of
 * coldata's `main.py` flow (crawl→store, `vdb.update`, `vdb.search`;
 * `src/main.py:5-58`) drives the same three verbs here:
 *
 *  - [[ingest]]  — idempotent dedup-append to the document store
 *                  (replaces the crawler's per-row find-then-insert,
 *                  `crawler.py:39-50`)
 *  - [[update]]  — chunk + batched embed + write the vector index
 *                  (`vdb.py:57-86`), optionally IVF-cell-partitioned
 *  - [[search]]  — embed queries, chunk-level top-k, per-document best
 *                  hit, hydration join, metric-ordered results
 *                  (`vdb.py:88-122`)
 *
 * Every verb is a plain DataFrame pipeline: ingest is one anti join,
 * update is one narrow chunk/embed stage plus a parquet write, search is
 * a broadcast score + window top-k + one hydration join.
 */
class Engine(spark: SparkSession, cfg: EngineConfig) {

  /** Dedup-append documents (must carry `doc_id` and `text`). Re-ingesting
    * the same batch is a no-op. */
  def ingest(docs: DataFrame, keyCol: String = "doc_id"): Unit =
    Ingest.dedupAppend(docs, cfg.storePath, keyCol)

  /** The document store as a DataFrame. */
  def store(): DataFrame = spark.read.parquet(cfg.storePath)

  /**
   * (Re)build the vector index from the store: overlapping chunks
   * (`vdb.py:66-74`), chunk ids `doc_id_pos` (`vdb.py:70`), per-partition
   * batched embedding (`vdb.py:76-79`; deterministic hash embedder in the
   * harness, a real model drops into VectorFns.embedPartitions), overwrite
   * write — the reference's `renew` collection lifecycle (`vdb.py:196-212`).
   */
  def update(): Unit = {
    chunkEmbed(store())
      .write.mode("overwrite").parquet(cfg.indexPath)
    invalidateIvf()
  }

  /**
   * Incrementally extend the index: chunk + embed ONLY the store documents
   * whose `doc_id` is absent from the index (one anti join), and append.
   * This is the corpus-scale path — when a re-crawl adds a sliver of new
   * documents, [[update]]'s renew-everything lifecycle (`vdb.py:196-212`)
   * would re-embed the whole corpus; here the embedding cost is proportional
   * to the NEW documents only. Sound because the store is dedup-append
   * ([[ingest]]): a doc_id's text never changes, so existing index rows
   * never go stale. Returns the number of chunks appended (counted via an
   * `Observation` riding the write — no extra job).
   */
  def updateIncremental(): Long = {
    val fresh =
      if (!indexExists) store()
      else store().join(index().select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val obs = org.apache.spark.sql.Observation()
    chunkEmbed(fresh)
      .observe(obs, count(lit(1)).as("chunks"))
      .write.mode("append").parquet(cfg.indexPath)
    invalidateIvf()
    obs.get("chunks").asInstanceOf[Long]
  }

  /** Overlapping chunks (`vdb.py:66-74`), chunk ids `doc_id_pos`
    * (`vdb.py:70`), per-partition batched embedding (`vdb.py:76-79`) —
    * the narrow stage both [[update]] and [[updateIncremental]] write. */
  private def chunkEmbed(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"),
        posexplode(TextFns.chunk(col("text"), cfg.chunkSize, cfg.chunkOverlap))
          .as(Seq("pos", "chunk")))
      .select(col("doc_id"),
        TextFns.chunkId(col("doc_id"), col("pos")).as("chunk_id"), col("chunk"))
    VectorFns.embedPartitions(chunks, "chunk", "vec", cfg.embedDim, cfg.batchSize)
      .select("doc_id", "chunk_id", "vec")
  }

  private def indexExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(cfg.indexPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The vector index changed: drop the memoized IVF layout. */
  private def invalidateIvf(): Unit = {
    ivfMemo.foreach(_.cells.unpersist())
    ivfMemo = None
  }

  /** The vector index as a DataFrame. */
  def index(): DataFrame = spark.read.parquet(cfg.indexPath)

  /**
   * Semantic search: returns up to `cfg.limit` documents per query, best
   * chunk score per document, hydrated with the document row, ordered by
   * score descending (the COSINE/IP direction, `vdb.py:155-160`).
   */
  def search(queries: Seq[String]): DataFrame = {
    import spark.implicits._
    val qdf = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("query_id", "query")
      .withColumn("query_vec", VectorFns.hashEmbedUdf(cfg.embedDim)(col("query")))
    // chunk-level scoring against the broadcast query side, then the
    // per-parent best-hit reduce (vdb.py:104-110) and top-k per query
    val scored = index().crossJoin(broadcast(qdf))
      .withColumn("score", round(VectorFns.cosineSim(col("vec"), col("query_vec")), 4))
    val best = scored.groupBy(col("query_id"), col("query"), col("doc_id"))
      .agg(max(col("score")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val topk = best
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= cfg.limit)
    // hydration join (vdb.py:113-119): hits side is tiny ⇒ broadcast
    store().join(broadcast(topk), "doc_id")
      .select(col("query_id"), col("query"), col("doc_id"), col("score"),
        col("rank"), substring(col("text"), 1, 200).as("preview"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Memoized IVF layout over the current index — building the quantizer is
    * an OFFLINE step (the reference's create_index, vdb.py:209-211), never
    * part of a search. Invalidated by [[update]] (the index changed). */
  @volatile private var ivfMemo: Option[VectorSearch.IvfIndex] = None

  /** The IVF layout for the current index, built at most once per [[update]].
    * The cell assignment is cached (it feeds every subsequent search). */
  def ivfIndex(): VectorSearch.IvfIndex = ivfMemo.getOrElse(synchronized {
    ivfMemo.getOrElse {
      val built = VectorSearch.buildIvf(index(), cfg.nlist, idCol = "chunk_id", vecCol = "vec")
      val cached = built.copy(cells = built.cells.cache())
      ivfMemo = Some(cached)
      cached
    }
  })

  /** IVF variant of [[search]] for corpus scale: probe `cfg.nprobe` of
    * `cfg.nlist` cells of the memoized [[ivfIndex]]. With nprobe = nlist
    * (the reference's own configuration) results equal [[search]]. */
  def searchIvf(queries: Seq[String]): DataFrame = {
    import spark.implicits._
    val qdf = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("query_id", "query")
      .withColumn("query_vec", VectorFns.hashEmbedUdf(cfg.embedDim)(col("query")))
    val hits = ivfIndex().search(qdf, cfg.limit, cfg.nprobe)
      .withColumn("doc_id", TextFns.parentId(col("chunk_id")).cast("long"))
    store().join(broadcast(hits), "doc_id")
      .select(col("query_id"), col("doc_id"), col("chunk_id"), col("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
