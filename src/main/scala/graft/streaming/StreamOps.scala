package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * within the watermark horizon. */
  def dedupByKey(events: DataFrame, keyCol: String, tsCol: String,
                 watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keyCol, tsCol)

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
        val novel =
          if (new java.io.File(storePath).exists()) {
            val existing = spark.read.parquet(storePath).select(col(keyCol))
            deduped.join(existing, Seq(keyCol), "left_anti")
          } else deduped
        novel.write.mode("append").parquet(storePath)
      }
}
