package graft

import graft.functions.{TextFns, VectorFns}
import graft.operators.VectorSearch
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query (SURVEY §7.1): the reference's one real end-to-end path —
   * semantic dataset search (`src/main.py:44`: embed query → ANN top-k →
   * per-parent best hit → hydrate → rank). Spark-native slice on sf0.001:
   * corpus scan → chunk → deterministic hash-embed → score vs the embedded
   * query → top-k → parent dedup → hydration join → ordered results.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dim = 64

    // chunk (vdb.py:66-74) + embed (vdb.py:76-79 batched; here hash-embed V1)
    val chunks = docs
      .select(col("doc_id"), posexplode(TextFns.chunk(col("text"), 128, 64)).as(Seq("pos", "chunk")))
      .select(col("doc_id"), TextFns.chunkId(col("doc_id"), col("pos")).as("chunk_id"), col("chunk"))
    val embedded = chunks.withColumn("vec", VectorFns.hashEmbedCol(col("chunk"), dim))

    // query side: one-row DataFrame through the same embedding
    import spark.implicits._
    val query = Seq("spark window join table").toDF("qtext")
      .select(lit(0L).as("query_id"), VectorFns.hashEmbedCol(col("qtext"), dim).as("query_vec"))

    // score all chunks (broadcast the single query), best chunk per parent, k=4
    val scored = embedded.crossJoin(broadcast(query))
      .withColumn("score", round(VectorFns.cosineSim(col("vec"), col("query_vec")), 4))
    val best = scored.groupBy(col("doc_id")).agg(max(col("score")).as("score"))
    val topk = best.orderBy(col("score").desc, col("doc_id").asc).limit(4)

    // hydrate (vdb.py:113-119): stitch document records onto hits
    topk.join(docs, "doc_id")
      .select(col("doc_id"), col("score"), col("lang"), col("source"),
        substring(col("text"), 1, 80).as("preview"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      EventQueries.queries ++ SourceQueries.queries ++ MultimodalQueries.queries ++
      EngineQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. EVERY declared query has one (EntrySpec gates the
    * rows-only allowlist at empty): approximate operators use seeded
    * data-independent randomness embedded as SQL literals so their whole
    * path replays — see q24/q55/q94 and EntrySpec's history note. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ VectorQueries.oracle ++
      EventQueries.oracle ++ SourceQueries.oracle ++ MultimodalQueries.oracle ++
      EngineQueries.oracle ++ PipelineQueries.oracle
}
