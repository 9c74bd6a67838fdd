package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Concurrent-serving benchmark — the contention sample the single-stream
 * bench cannot give (reference seam: `demo.py:61-68`, Gradio serving
 * concurrent users). One engine is built and persisted once (store + IVF
 * layout + lexical postings), then N client threads drive the four
 * serving verbs — vector search, scalar query, expr retrieve, hybrid —
 * through the engine's own admission path (a finite `searchRate`
 * configures the token bucket, so requests really cross it). Per verb it
 * reports the solo (1-thread) median and p50/p95 at 4 and 16 concurrent
 * streams, and flags any verb whose p95 at 16 streams exceeds 3x its solo
 * median — the SLO shape a serving deployment actually watches. Spark
 * schedules the concurrent jobs FIFO across the shared local[32] pool;
 * on a real cluster each stream's jobs would fan across executors the
 * same way (fair-scheduler pools are the one knob this run leaves at
 * default, noted in BASELINE.md).
 *
 * Output: one JSON line on stdout + BENCH_SERVE_<sf>.json (same
 * parse-proof file channel as Bench).
 *
 * SPARK_GRAFT_RW=1 adds the MIXED read/write regime (round-13 verdict
 * task): one writer thread ticks upsert → strong read-your-writes check →
 * soft delete → periodic maintain() against the same engine while every
 * reader level runs. Readers execute through [[graft.Engine.served]]
 * (plan + action under the layout read lock — the serving contract), the
 * writer's rewrites take the write side, and the run asserts the
 * consistency claims under real contention: every writer tick's Strong
 * read sees its own upsert (`ryw_ok`/`ryw_fail`), and no reader ever
 * observes a torn layout (empty or rank-holed results off a half-rewritten
 * listing — `torn`) or an exception (`reader_errors`). Artifact:
 * BENCH_SERVE_<sf>_rw.json with per-level writer tick counts/latency
 * beside the reader percentiles.
 */
object BenchServe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_FAIR=1 measures the latency-SLO configuration: FAIR
    // scheduling shares the executor pool round-robin across the
    // concurrent streams' jobs instead of FIFO's arrival order — the knob
    // a p95-bound deployment flips (documented in BASELINE.md either way)
    val fair = sys.env.get("SPARK_GRAFT_FAIR").contains("1")
    val rw = sys.env.get("SPARK_GRAFT_RW").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", if (fair) "FAIR" else "FIFO")
      .config("spark.ui.enabled", "false")
      // fork-free local-FS permissions (graft.util.NioLocalFileSystem):
      // stock Hadoop shells out to /bin/chmod per created file
      .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft_serve_").toString
    // searchRate 100/s: far above achievable throughput here, so the token
    // bucket is exercised on every request without becoming the bottleneck
    // being measured
    val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index",
      nlist = 16, nprobe = 4, ivfThreshold = 1L, searchRate = 100.0)
    val eng = new Engine(spark, cfg)
    eng.ingest(spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars"))
    eng.update()

    val queryPool = Seq(
      "table dedup merge pipeline", "stream window state store",
      "vector index probe cells", "join shuffle partition skew")
    // every reader executes through served{} — frame creation AND action
    // under the layout read lock, the snapshot-consistent serving shape
    // (uncontended cost is one lock acquisition; under RW it is the
    // correctness boundary the writer's rewrites exclude against)
    val torn = new java.util.concurrent.atomic.AtomicLong(0)
    val readerErrors = new java.util.concurrent.atomic.AtomicLong(0)
    def tornCheck(rows: Array[org.apache.spark.sql.Row], ranked: Boolean): Long = {
      if (rows.isEmpty) torn.incrementAndGet()
      else if (ranked) {
        val ranks = rows.map(_.getAs[Int]("rank")).sorted.toSeq
        if (ranks.zipWithIndex.exists { case (r, i) => r != i + 1 }) torn.incrementAndGet()
      }
      rows.length.toLong
    }
    val verbs: Seq[(String, Int => Long)] = Seq(
      "search" -> ((i: Int) => tornCheck(eng.served {
        eng.search(Seq(queryPool(i % queryPool.length))).collect() }, ranked = true)),
      "query" -> ((i: Int) => tornCheck(eng.served {
        eng.query(col("lang") === "en" && col("n_chars") > (100 + (i % 7) * 50),
          Seq("lang", "n_chars"), limit = 100).collect() }, ranked = false)),
      "retrieve" -> ((i: Int) => tornCheck(eng.served {
        eng.retrieve(s"""lang in ["en", "de"] && ${100 + (i % 5) * 25} <= n_chars < 700""",
          Seq("lang", "n_chars"), limit = 100).collect() }, ranked = false)),
      "hybrid" -> ((i: Int) => tornCheck(eng.served {
        eng.hybridSearch(Seq(queryPool(i % queryPool.length))).collect() }, ranked = true)))

    // warmup, single-threaded: materialize the persisted layouts and every
    // lazy memo (IVF handles, lexical postings) so contention runs measure
    // serving, not first-touch builds
    verbs.foreach { case (_, f) => require(f(0) >= 0) }

    def percentile(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, math.max(0, math.ceil(p * s.length).toInt - 1)))
    }
    def runLevel(f: Int => Long, conc: Int, n: Int): (Seq[Double], Double) = {
      val pool = Executors.newFixedThreadPool(conc)
      val tasks = (0 until n).map { i =>
        new Callable[Double] {
          def call(): Double = {
            val t0 = System.nanoTime()
            try f(i) catch { case _: Throwable => readerErrors.incrementAndGet() }
            (System.nanoTime() - t0) / 1e9
          }
        }
      }
      val w0 = System.nanoTime()
      val lat = pool.invokeAll(scala.jdk.CollectionConverters.SeqHasAsJava(tasks).asJava)
        .toArray.toSeq.map(_.asInstanceOf[java.util.concurrent.Future[Double]].get())
      val wall = (System.nanoTime() - w0) / 1e9
      pool.shutdown(); pool.awaitTermination(10, TimeUnit.MINUTES)
      (lat, n / wall) // requests per second at this concurrency
    }

    // The RW writer: one thread ticking the mutation lifecycle a serving
    // deployment actually runs in place — upsert a changed document,
    // bring the index current, verify read-your-writes visibility on both
    // routes (scalar text + index membership), soft-delete another
    // document, and every third tick a maintain() growth check. Tick
    // latency is reported per level; ryw_fail counts mutations a
    // subsequent read failed to see (must be 0).
    val rywOk = new java.util.concurrent.atomic.AtomicLong(0)
    val rywFail = new java.util.concurrent.atomic.AtomicLong(0)
    val annHit = new java.util.concurrent.atomic.AtomicLong(0)
    val annMiss = new java.util.concurrent.atomic.AtomicLong(0)
    val tickSeq = new java.util.concurrent.atomic.AtomicLong(0)
    val writerIds: Array[Long] =
      if (rw) eng.served { eng.store().select("doc_id").limit(64).collect() }
        .map(_.getLong(0))
      else Array.empty
    // the upserted row must carry the store's EXACT schema (names AND
    // types — an int where the store holds bigint writes a mixed-type
    // parquet column that poisons every later read)
    val storeSchema = if (rw) eng.served { eng.store().schema } else null
    def writerTick(): Double = {
      import spark.implicits._
      val i = tickSeq.incrementAndGet()
      val token = s"zzrw$i"
      val target = writerIds((i % writerIds.length).toInt)
      val t0 = System.nanoTime()
      val row = Seq((target, (token + " ") * 40, "en", 40 * (token.length + 1)))
        .toDF("doc_id", "text", "lang", "n_chars")
        .select(storeSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      eng.upsert(row)
      eng.updateIncremental()
      // Read-your-writes = VISIBILITY, on both routes: the scalar read
      // must return the new text (exact by construction) and the new
      // version's chunks must be IN the index snapshot searches serve
      // from. Top-k presence under the approximate probe is tracked
      // separately (ann_hit/ann_miss): this config probes 4 of 16 cells,
      // and a one-off token vector is exactly the outlier direction an
      // approximate probe may rank-miss — that is ANN recall, not a
      // consistency violation (nprobe = nlist makes it deterministic;
      // the EngineSpec race case gates that exact configuration).
      val scalar = eng.served {
        eng.query(col("doc_id") === target, Seq("text")).collect()
      }
      val visible = eng.served {
        eng.index().filter(col("doc_id") === target).limit(1).count() > 0
      }
      if (visible && scalar.length == 1 &&
          scalar.head.getAs[String]("text").startsWith(token))
        rywOk.incrementAndGet()
      else rywFail.incrementAndGet()
      val strong = eng.served { eng.search(Seq(token)).collect() }
      if (strong.exists(_.getAs[Long]("doc_id") == target)) annHit.incrementAndGet()
      else annMiss.incrementAndGet()
      eng.deleteSoft(Seq(writerIds(((i + 17) % writerIds.length).toInt)).toDF("doc_id"))
      if (i % 3 == 0) eng.maintain(0.5).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val writerErrors = new java.util.concurrent.atomic.AtomicLong(0)
    def withWriter[T](body: => T): (T, Seq[Double]) = {
      if (!rw) return (body, Seq.empty)
      val ticks = scala.collection.mutable.ArrayBuffer.empty[Double]
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val w = new Thread(() => {
        // a failed tick is counted, never thread-fatal: the artifact must
        // show writer_errors > 0, not silently degrade to read-only
        while (!stop.get()) {
          try ticks += writerTick()
          catch { case _: Throwable => writerErrors.incrementAndGet() }
        }
      })
      w.start()
      val out = try body finally { stop.set(true); w.join(600000) }
      (out, ticks.toSeq)
    }

    val levels = Seq(1 -> 9, 4 -> 24, 16 -> 32)
    val writerStats = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Double)]
    val results = verbs.map { case (name, f) =>
      val byLevel = levels.map { case (conc, n) =>
        val (r, ticks) = withWriter(runLevel(f, conc, n))
        if (rw) writerStats += ((name, conc, ticks.length,
          if (ticks.isEmpty) 0.0 else ticks.sum / ticks.length))
        conc -> r
      }
      name -> byLevel
    }
    def fmt(d: Double) = f"$d%.3f"
    val flags = scala.collection.mutable.ArrayBuffer.empty[String]
    val verbJson = results.map { case (name, byLevel) =>
      val solo = percentile(byLevel.head._2._1, 0.5)
      val inner = byLevel.map { case (conc, (lat, rps)) =>
        val p50 = percentile(lat, 0.5); val p95 = percentile(lat, 0.95)
        if (conc == 16 && p95 > 3 * solo) flags += name
        s""""c$conc":{"p50":${fmt(p50)},"p95":${fmt(p95)},"rps":${fmt(rps)},"n":${lat.length}}"""
      }.mkString(",")
      s""""$name":{"solo_median":${fmt(solo)},$inner}"""
    }.mkString(",")
    val flagJson = flags.distinct.map(f => s""""$f"""").mkString("[", ",", "]")
    val writerJson = if (!rw) "" else {
      val per = writerStats.map { case (v, c, n, mean) =>
        s"""{"verb":"$v","conc":$c,"ticks":$n,"mean_tick_sec":${fmt(mean)}}"""
      }.mkString("[", ",", "]")
      s""","writer":{"ticks":$per,"ryw_ok":${rywOk.get},"ryw_fail":${rywFail.get},"ann_hit":${annHit.get},"ann_miss":${annMiss.get},"writer_errors":${writerErrors.get},"torn":${torn.get},"reader_errors":${readerErrors.get}}"""
    }
    spark.stop()
    val line = s"""{"metric":"serve","sf":"$sfDir","cpus":$cpus,"scheduler":"${if (fair) "FAIR" else "FIFO"}","rw":$rw,"verbs":{$verbJson}$writerJson,"p95_over_3x_solo":$flagJson}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SERVE_FILE",
        s"BENCH_SERVE_${new java.io.File(sfDir).getName}${if (fair) "_fair" else ""}${if (rw) "_rw" else ""}.json")),
      line.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    System.out.flush()
  }
}
