package graft

import org.apache.spark.sql.functions._

/** End-to-end lifecycle of the Engine facade: ingest → update → search —
  * the reference's `main.py` flow (crawl-all → vdb.update → vdb.search)
  * as three DataFrame verbs. */
class EngineSpec extends SparkSpec {

  private def freshEngine(): Engine = {
    val dir = java.nio.file.Files.createTempDirectory("graft-engine").toString
    new Engine(spark, EngineConfig(
      storePath = s"$dir/store", indexPath = s"$dir/index",
      nlist = 8, nprobe = 8))
  }

  test("ingest is idempotent; update builds one vector per chunk; search ranks k docs") {
    val eng = freshEngine()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source")

    eng.ingest(docs)
    eng.ingest(docs) // second ingest must be a no-op
    assert(eng.store().count() == docs.count())

    eng.update()
    val idx = eng.index()
    assert(idx.count() > docs.count()) // chunking fans out
    assert(idx.select("chunk_id").distinct().count() == idx.count())

    val hits = eng.search(Seq("data processing pipeline", "machine learning"))
    val byQuery = hits.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    assert(byQuery.length == 2)
    assert(byQuery.forall(_.getLong(1) <= 4))
    // ranked descending within each query
    val q0 = hits.filter(col("query_id") === 0).orderBy("rank")
      .select("score").collect().map(_.getDouble(0))
    assert(q0.sameElements(q0.sorted(Ordering[Double].reverse)))
  }

  test("search plans broadcast-side scoring and broadcast hydration (no shuffle joins)") {
    // the 100 TB shape: the corpus/index side never shuffles for a search —
    // queries broadcast into the scoring scan, hits broadcast into hydration
    val eng = freshEngine()
    eng.ingest(spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text"))
    eng.update()
    val plan = eng.search(Seq("vector search")).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)       // hydration join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // broadcast query side
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("searchIvf with nprobe == nlist matches exact search doc set") {
    val eng = freshEngine()
    eng.ingest(spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text"))
    eng.update()
    val q = Seq("statistical analysis of results")
    val exact = SparkEntryTestHelpers.docIds(eng.search(q))
    val ivf = SparkEntryTestHelpers.docIds(eng.searchIvf(q))
    assert(ivf == exact)
  }

  test("updateIncremental embeds only new docs and converges to the full-build index") {
    val full = freshEngine()
    val incr = freshEngine()
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

    full.ingest(docs)
    full.update()

    // incremental path: half the corpus, full build, then the rest lands
    incr.ingest(docs.filter(col("doc_id") % 2 === 0))
    incr.update()
    val evenChunks = incr.index().count()
    incr.ingest(docs)
    val appended = incr.updateIncremental()
    assert(appended > 0)
    assert(incr.index().count() == evenChunks + appended)
    // unchanged store ⇒ nothing new to embed
    assert(incr.updateIncremental() == 0L)

    // the two indexes are indistinguishable, vectors included
    def snap(e: Engine): Array[(String, Seq[Float])] = e.index()
      .select("chunk_id", "vec").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    assert(snap(incr).sameElements(snap(full)))

    // empty index path ⇒ updateIncremental degrades to a full first build
    val cold = freshEngine()
    cold.ingest(docs)
    assert(cold.updateIncremental() == full.index().count())
  }

  test("EngineConfig.load parses key:value config with comments and defaults") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".yml")
    java.nio.file.Files.writeString(f,
      """# engine config (reference config.yml shape)
        |store_path: /tmp/graft/store
        |index_path: /tmp/graft/index   # inline comment
        |chunk_size: 256
        |nprobe: 16
        |unknown_key: ignored
        |""".stripMargin)
    val cfg = EngineConfig.load(f.toString)
    assert(cfg.storePath == "/tmp/graft/store")
    assert(cfg.indexPath == "/tmp/graft/index")
    assert(cfg.chunkSize == 256)
    assert(cfg.nprobe == 16)
    assert(cfg.chunkOverlap == 64 && cfg.limit == 4) // defaults survive
    intercept[IllegalArgumentException] {
      val g = java.nio.file.Files.createTempFile("graft-cfg-bad", ".yml")
      java.nio.file.Files.writeString(g, "chunk_size: 1\n")
      EngineConfig.load(g.toString)
    }
  }

  test("searchIvf reuses one built IVF index across calls; update invalidates it") {
    val eng = freshEngine()
    eng.ingest(spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text"))
    eng.update()
    eng.searchIvf(Seq("first query")).count()
    val built = eng.ivfIndex()
    eng.searchIvf(Seq("a different query")).count()
    // the search path must NOT rebuild: same memoized instance
    assert(eng.ivfIndex() eq built)
    // rebuilding the vector index drops the memo
    eng.update()
    assert(!(eng.ivfIndex() eq built))
  }
}

object SparkEntryTestHelpers {
  def docIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet
}
