package graft

import graft.operators.Events
import graft.queries.QHelpers
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Structured Streaming correctness: every streaming operator must produce
 * exactly the batch result on the same data once all input is processed —
 * that batch equivalence is the oracle (the declared-query suite checks the
 * batch side against DuckDB, so transitively the streaming side too).
 */
/** Top-level so the Dataset encoder can instantiate it without an outer pointer. */
case class Ev(ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def sampleEvents(n: Int): Seq[Ev] = {
    val rows = QHelpers.t(spark, sf, "events")
      .select("ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(n).collect()
    rows.toSeq.map(r => Ev(r.getTimestamp(0), r.getLong(1), r.getString(2), r.getDouble(3)))
  }

  test("streaming windowed counts equal the batch aggregation") {
    val s = spark
    import s.implicits._
    val data = sampleEvents(500)
    val mem = MemoryStream[Ev](s)
    val q = StreamOps.windowedCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      // two batches: watermark advances between them, late-ish rows still land
      mem.addData(data.take(250)); q.processAllAvailable()
      mem.addData(data.drop(250)); q.processAllAvailable()
      val streamed = s.table("wc")
        .select("window_start", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = Events.tumblingCounts(data.toDF(), "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming session windows equal the batch session aggregation") {
    val s = spark
    import s.implicits._
    val data = sampleEvents(400)
    val mem = MemoryStream[Ev](s)
    val q = StreamOps.sessionCounts(mem.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sc").outputMode("complete").start()
    try {
      mem.addData(data); q.processAllAvailable()
      val streamed = s.table("sc").orderBy("user_id", "session_start").collect().toSeq
      val batch = Events.sessionWindows(data.toDF(), "30 minutes")
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .orderBy("user_id", "session_start").collect().toSeq
      // session_window end = last event + gap; both spellings must agree on
      // (user, start, count); end differs by construction (max ts vs ts+gap)
      assert(streamed.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
        == batch.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions equal the batch gaps-and-islands result") {
    val s = spark
    import s.implicits._
    val data = sampleEvents(300)
    val maxTs = data.map(_.ts.getTime).max
    // sentinel events push the watermark far past every real session's
    // end + gap so all open state times out and is emitted
    val sentinel1 = Ev(new java.sql.Timestamp(maxTs + 86400000L), -1L, "x", 0.0)
    val sentinel2 = Ev(new java.sql.Timestamp(maxTs + 2 * 86400000L), -1L, "x", 0.0)
    val mem = MemoryStream[Ev](s)
    val q = StreamOps.sessionizeStateful(mem.toDF(), gapMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("fs").outputMode("append").start()
    try {
      mem.addData(data); q.processAllAvailable()
      mem.addData(sentinel1); q.processAllAvailable()
      mem.addData(sentinel2); q.processAllAvailable()
      val streamed = s.table("fs").filter(col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .orderBy("user_id", "session_start").collect().toSeq
      val batch = Events.sessionize(data.toDF(), gapMinutes = 30)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("sum_value"), 6).as("sum_value"))
        .orderBy("user_id", "session_start").collect().toSeq
      val streamedCmp = streamed.map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), math.round(r.getDouble(4) * 1e6)))
      val batchCmp = batch.map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), math.round(r.getDouble(4) * 1e6)))
      assert(streamedCmp == batchCmp)
    } finally q.stop()
  }

  test("foreachBatch ingest is idempotent under re-delivery (I2 contract)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val store = s"$dir/store"
    val data = sampleEvents(100)
    val mem = MemoryStream[Ev](s)
    val q = StreamOps.ingestAppend(mem.toDF().withColumn("k", col("user_id")),
      store, "k", s"$dir/ckpt").start()
    try {
      mem.addData(data.take(60)); q.processAllAvailable()
      mem.addData(data) // full re-delivery: only genuinely new keys may land
      q.processAllAvailable()
      val stored = s.read.parquet(store)
      assert(stored.count() == stored.select("k").distinct().count())
      assert(stored.select("k").distinct().count()
        == data.map(_.user_id).distinct.size)
    } finally q.stop()
  }

  test("file-source streaming: AvailableNow over a parquet directory equals batch") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val events = graft.queries.QHelpers.t(s, sf, "events")
      .select("ts", "user_id", "event_type", "value")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = s.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = StreamOps.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("fsw").outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = s.table("fsw")
        .select("window_start", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = Events.tumblingCounts(events, "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedupByKey drops re-delivered keys within the watermark") {
    val s = spark
    import s.implicits._
    val data = sampleEvents(100)
    val mem = MemoryStream[Ev](s)
    // the watermark horizon must cover the whole sample's event-time span:
    // dedup is guaranteed only for re-deliveries inside the horizon
    val q = StreamOps.dedupByKey(mem.toDF().withColumn("k", col("user_id")), "k", "ts", "30 days")
      .writeStream.format("memory").queryName("dk").outputMode("append").start()
    try {
      mem.addData(data); q.processAllAvailable()
      mem.addData(data) // exact re-delivery: every (k, ts) already seen
      q.processAllAvailable()
      // re-delivery with a DIFFERENT event time (+1 min, inside the
      // watermark): still the same key, must also be suppressed
      val shifted = data.map(e =>
        e.copy(ts = new java.sql.Timestamp(e.ts.getTime + 60000)))
      mem.addData(shifted); q.processAllAvailable()
      val out = s.table("dk")
      assert(out.count() == data.map(_.user_id).distinct.size)
    } finally q.stop()
  }

  test("scheduler: two scheduled ingest+update runs are idempotent (scheduler.py:21-51)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sched").toString
    val eng = new Engine(spark, EngineConfig(
      storePath = s"$dir/store", indexPath = s"$dir/index"))
    val docs = QHelpers.t(spark, sf, "documents").select("doc_id", "text")
    val appended = scala.collection.mutable.ArrayBuffer.empty[Long]
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    // the reference's daily re-crawl: init_run fires immediately, the next
    // firing comes one period later (sleep injected, nothing waits a day)
    val fired = graft.streaming.Scheduler.run("day", initRun = true, maxRuns = 2,
      job = _ => { eng.ingest(docs); appended += eng.updateIncremental() },
      sleep = ms => { slept += ms; () })
    assert(fired == 2)
    assert(slept.toSeq == Seq(86400000L))
    assert(appended.head > 0 && appended(1) == 0) // the re-run appended NOTHING
    assert(eng.store().count() == docs.count())
    assert(eng.index().select("chunk_id").distinct().count() == eng.index().count())

    // a failing firing is reported, the schedule stays alive (scheduler.py:14-16)
    var calls = 0
    graft.streaming.Scheduler.run("week", initRun = false, maxRuns = 2,
      job = n => { calls += 1; if (n == 0) sys.error("boom") }, sleep = _ => ())
    assert(calls == 2)
    // scheduler.py:30's rejection of unknown periods
    intercept[IllegalArgumentException](graft.streaming.Scheduler.periodSeconds("hour"))
  }

  test("scheduler: an empty tick leaves the persisted IVF layout byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sched2").toString
    val eng = new Engine(spark, EngineConfig(
      storePath = s"$dir/store", indexPath = s"$dir/index",
      nlist = 8, nprobe = 8, ivfThreshold = 1L))
    val docs = QHelpers.t(spark, sf, "documents").select("doc_id", "text")
    def walk(f: java.io.File): Map[String, Long] =
      if (!f.exists()) Map.empty
      else if (f.isFile) Map(f.getPath -> (f.length() + f.lastModified()))
      else f.listFiles().toSeq.flatMap(walk).toMap
    // run 0 builds + persists; runs 1 and 2 arrive with nothing new —
    // two fired periods must equal one: zero appends, zero layout churn
    val appended = scala.collection.mutable.ArrayBuffer.empty[Long]
    var layoutAfterFirst: Map[String, Long] = Map.empty
    graft.streaming.Scheduler.run("day", initRun = true, maxRuns = 3,
      job = r => {
        eng.ingest(docs)
        if (r == 0) {
          eng.update() // offline create_index persists the layout
          layoutAfterFirst = walk(new java.io.File(s"$dir/index_ivf"))
        } else appended += eng.updateIncremental()
      },
      sleep = _ => ())
    assert(appended.toSeq == Seq(0L, 0L), appended.toSeq.toString)
    assert(layoutAfterFirst.nonEmpty)
    assert(walk(new java.io.File(s"$dir/index_ivf")) == layoutAfterFirst,
      "an empty scheduled tick rewrote the persisted layout")
  }

  test("RocksDB state store: stateful agg matches HDFS-backed results") {
    // the large-state lever: at 100 TB of keyed state the default in-heap
    // HDFSBackedStateStore OOMs executors; RocksDB spills to local disk.
    // Same query, both providers, identical settled results + the RocksDB
    // run must actually report rocksdb state metrics.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    def drain(provider: String, sinkName: String): Map[String, Long] = {
      val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      try {
        val q = spark.readStream.format("graft-log")
          .option("topics", "t").option("partitionsPerTopic", "2")
          .option("rowsPerPartition", "500").load()
          .withColumn("k", pmod(col("offset"), lit(97L)))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("offset")).as("so"))
          .writeStream.format("memory").queryName(sinkName)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        if (provider.contains("RocksDB")) {
          val metrics = q.lastProgress.stateOperators.flatMap(
            _.customMetrics.keySet().toArray.map(_.toString))
          assert(metrics.exists(_.startsWith("rocksdb")),
            s"expected rocksdb state metrics, saw ${metrics.take(5).mkString(",")}")
        }
        spark.table(sinkName).collect()
          .map(r => r.getAs[Long]("k").toString -> (r.getAs[Long]("n") * 1000000 + r.getAs[Long]("so")))
          .toMap
      } finally {
        if (saved.isEmpty) spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
      }
    }
    val rocks = drain(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "rocks_sink")
    val hdfs = drain(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "hdfs_sink")
    assert(rocks.nonEmpty && rocks == hdfs)
  }

  test("foreachBatch crash AFTER the sink write: restart re-runs the batchId without duplicating") {
    // the real at-least-once scenario the batchId keying exists for: the
    // sink write lands, the batch dies before its commit, the restarted
    // query re-runs the SAME batchId — an unguarded append would now hold
    // the batch twice
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_retry_").toString
    val drop = new java.io.File(s"$tmp/drop"); drop.mkdirs()
    val staged = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    staged.coalesce(1).write.parquet(s"$tmp/w1")
    val part = new java.io.File(s"$tmp/w1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(drop, "a.parquet").toPath)
    val sink = s"$tmp/sink"
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit =
      spark.readStream.schema(staged.schema).parquet(drop.toString)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamOps.idempotentAppend(
            batch.agg(count(lit(1)).as("n"), sum(col("v")).as("sv")).coalesce(1),
            sink, id)
          if (attempts.incrementAndGet() == 1)
            throw new RuntimeException("simulated commit failure after the sink write")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run() }
    run() // restart from the checkpoint: batch 0 re-runs with the SAME id
    assert(attempts.get() >= 2, "the retry never happened — fixture proves nothing")
    val out = spark.read.parquet(sink)
    assert(out.count() == 1L, "retried batch duplicated the sink")
    val r = out.select(col("n"), col("sv")).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 60L)
  }

  test("mid-write kill: a partial batch partition from a dead write is overwritten on retry") {
    // the OTHER at-least-once failure mode (q155 covers crash-after-write;
    // this is crash-DURING-write): part files of batch=<id> landed, the
    // writer died before finishing, no checkpoint commit happened. The
    // restart re-runs the batchId and the dynamic partition overwrite must
    // replace the ENTIRE partial partition — stray files included — or the
    // sink serves half a batch forever.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_midwrite_").toString
    val drop = new java.io.File(s"$tmp/drop"); drop.mkdirs()
    val staged = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    staged.coalesce(1).write.parquet(s"$tmp/w1")
    val part = new java.io.File(s"$tmp/w1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(drop, "a.parquet").toPath)
    val sink = s"$tmp/sink"
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit =
      spark.readStream.schema(staged.schema).parquet(drop.toString)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          if (attempts.incrementAndGet() == 1) {
            // the dying write: one part file of the batch partition lands,
            // then the process is gone — no _SUCCESS, no commit
            Seq((99L, 999L)).toDF("k", "v").coalesce(1)
              .write.mode("append").parquet(s"$sink/batch=$id")
            throw new RuntimeException("simulated mid-write kill")
          }
          StreamOps.idempotentAppend(batch, sink, id)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run() }
    // the poisoned partial partition is really on disk before the retry
    assert(spark.read.parquet(sink).filter(col("v") === 999L).count() == 1L)
    run() // checkpoint survived: batch 0 re-runs with the SAME id
    assert(attempts.get() >= 2)
    val out = spark.read.parquet(sink)
    assert(out.filter(col("v") === 999L).count() == 0L,
      "the partial write's stray file survived the retried overwrite")
    assert(out.count() == 3L)
    assert(out.agg(sum(col("v"))).head.getLong(0) == 60L)
  }

  test("idempotentAppend: a re-delivered batchId replaces its partition, never duplicates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_").toString + "/sink"
    StreamOps.idempotentAppend(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir, 0L)
    StreamOps.idempotentAppend(Seq((3L, 30L)).toDF("k", "v"), dir, 1L)
    // the at-least-once retry: batch 0 re-runs with the same id
    StreamOps.idempotentAppend(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir, 0L)
    val out = spark.read.parquet(dir)
    assert(out.count() == 3L, "retried batch double-appended")
    assert(out.agg(sum(col("v"))).head.getLong(0) == 60L)
    // batch 1's output survived batch 0's retry untouched
    assert(out.filter(col("batch") === 1).count() == 1L)
  }
}
