package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session accumulator carried in GroupState by
  * [[StreamOps.sessionizeStateful]] (epoch microseconds). */
final case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)

/** A closed session emitted by [[StreamOps.sessionizeStateful]]. */
final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp, n_events: Long,
                               sum_value: Double)

/**
 * Structured Streaming surface (SURVEY §2.10): the reference has no
 * streaming runtime — its incrementality is a daily batch re-crawl
 * (`src/scheduler.py:10-33`) made idempotent by an anti-join-shaped dedup
 * (`src/coldata/crawler/crawler.py:39-50`). These operators are the
 * streaming-native spellings; each takes a streaming OR batch DataFrame
 * (the plans are identical — that equivalence is the test oracle, see
 * StreamingSpec).
 *
 * At scale: watermarks bound state; `dropDuplicates` keeps one key per
 * watermark window; `foreachBatch` ingest makes re-delivery idempotent the
 * same way the reference's find-then-insert did, but set-oriented.
 */
object StreamOps {

  /** Tumbling event-time counts with a watermark (late data beyond
    * `watermark` is dropped; state per open window only). Identical
    * aggregation to Events.tumblingCounts — batch-checkable. */
  def windowedCounts(events: DataFrame, every: String, watermark: String,
                     tsCol: String = "ts", typeCol: String = "event_type"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), every).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))

  /** Session windows with a watermark — the streaming spelling of
    * Events.sessionWindows; state closes `watermark` after the gap. */
  def sessionCounts(events: DataFrame, gap: String, watermark: String,
                    userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming key dedup (the I2 contract): exactly-once per `keyCol`
    * within the watermark horizon — a re-delivered key is suppressed even
    * when it arrives with a DIFFERENT event time (the reference's ingest
    * dedups purely on `index`, crawler.py:39-50).
    * `dropDuplicatesWithinWatermark` keys state on `keyCol` alone and
    * expires each entry once the watermark passes its first-seen event
    * time + the delay, so state stays bounded. */
  def dedupByKey(events: DataFrame, keyCol: String, tsCol: String,
                 watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCol)

  /**
   * Custom-state sessionization via `flatMapGroupsWithState` with an
   * event-time timeout — the API for session semantics `session_window`
   * can't express (e.g. per-session running aggregates, session caps).
   * State per user is ONE open-session accumulator, closed and emitted
   * either when a new event arrives past the gap or when the watermark
   * passes end + gap (the timeout). Events are processed in event-time
   * order within each batch; cross-batch late data within the watermark
   * re-opens nothing (documented trade-off vs `session_window`, which
   * merges late events — use [[sessionCounts]] when that matters).
   */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int, watermark: String,
                         userCol: String = "user_id", tsCol: String = "ts",
                         valueCol: String = "value"): org.apache.spark.sql.Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // java.sql.Timestamp.getTime is milliseconds — microseconds live in
    // getNanos; round-trip through epoch-µs must preserve them
    def toUs(ts: java.sql.Timestamp): Long =
      ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000000 * 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }

    events
      .select(col(userCol).cast("long"), col(tsCol).cast("timestamp"),
        col(valueCol).cast("double"))
      .withWatermark(tsCol, watermark)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (!rows.hasNext) {
            // watermark passed end + gap: close and emit the open session
            val out = state.getOption.map(s =>
              ClosedSession(user, toTs(s.startUs), toTs(s.endUs), s.n, s.sum))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(r => toUs(r._2))
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val us = toUs(ts)
              open match {
                case Some(s) if us - s.endUs <= gapUs =>
                  open = Some(s.copy(endUs = math.max(s.endUs, us), n = s.n + 1, sum = s.sum + v))
                case Some(s) =>
                  closed += ClosedSession(user, toTs(s.startUs), toTs(s.endUs), s.n, s.sum)
                  open = Some(OpenSession(us, us, 1, v))
                case None =>
                  open = Some(OpenSession(us, us, 1, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }
  }

  /**
   * Idempotent micro-batch ingest (reference `_upload_data`, crawler.py:39-50,
   * made set-oriented): per micro-batch, anti-join the batch against the
   * store on `keyCol` and append only unseen keys. Safe under re-delivery;
   * at scale this is the Delta MERGE shape expressed with plain parquet.
   */
  def ingestAppend(stream: DataFrame, storePath: String, keyCol: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = batch.dropDuplicates(keyCol)
        // Hadoop-FS existence probe (works on HDFS/S3/local); a java.io.File
        // check would always be false on a cluster store and skip the dedup
        val novel =
          if (graft.operators.Ingest.storeExists(spark, storePath)) {
            val existing = spark.read.parquet(storePath).select(col(keyCol))
            deduped.join(existing, Seq(keyCol), "left_anti")
          } else deduped
        novel.write.mode("append").parquet(storePath)
      }

  /**
   * Replay-idempotent foreachBatch APPEND. Spark's foreachBatch contract is
   * at-least-once: a batch whose sink write died mid-flight is re-run with
   * the SAME batchId, and a guard-less `mode("append")` then double-writes.
   * This keys the write on the batchId instead — the rows land under a
   * `batch=<id>` hive partition with dynamic partition overwrite, so a
   * retry REPLACES its own partition and every other batch's output is
   * untouched. Readers see the union of all batch partitions (drop or cast
   * the `batch` column — partition discovery types it int).
   *
   * This is the monitor/evidence-sink counterpart of [[ingestAppend]]'s
   * anti-join idempotence: there the DATA is keyed, here the BATCH is.
   */
  def idempotentAppend(df: DataFrame, path: String, batchId: Long): Unit =
    df.withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(path)
}
