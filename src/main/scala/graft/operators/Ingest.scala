package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transient catalog/SDK failure — the retryable class ([[Ingest.fetchCatalog]]). */
final class TransientFetchError(msg: String) extends RuntimeException(msg)

/**
 * Set-oriented ingest (SURVEY §2.2 K1, §2.4 J4, §2.10 I2).
 *
 * The reference deduplicates ingest with a per-row `find_one` probe before
 * every `insert_one` (`src/coldata/crawler/crawler.py:39-50`) — a per-row
 * RPC. The engine-native replacement is one anti join per batch: idempotent,
 * one shuffle (or zero, when the existing-key side broadcasts).
 */
object Ingest {

  /** Rows of `incoming` whose `keyCol` is absent from `existing` — the
    * insert set of the reference's insert-if-absent loop. */
  def newRows(incoming: DataFrame, existing: DataFrame, keyCol: String): DataFrame =
    incoming.join(existing.select(keyCol), Seq(keyCol), "left_anti")

  /** True iff `path` exists, resolved through the Hadoop FileSystem API so
    * the probe is correct on HDFS/S3/local alike (java.io.File would be
    * local-only and silently false on a cluster store). */
  private[graft] def storeExists(spark: org.apache.spark.sql.SparkSession,
                                 path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hPath)
  }

  /**
   * SDK/REST catalog scan (SURVEY §2.1 S4) with bounded retry/backoff
   * (§2.10 I4) and per-partition rate limiting (§2.10 I5) — the reference's
   * `list_datasets` SDK loop (kaggle.py:23-33) and its implicit API-limit
   * handling, distributed the only way that scales: ONE client per
   * partition (`clientFor`, created inside mapPartitions — never
   * serialized from the driver), ids streamed through it, each call
   * retried up to `maxRetries` times on [[TransientFetchError]] with
   * exponential backoff, and a fixed inter-call pacing of
   * `minCallIntervalMs` (a token-bucket degenerate: 1 token per interval)
   * so P partitions stay under P·(1000/interval) calls/sec.
   *
   * Permanent errors (anything not [[TransientFetchError]]) propagate —
   * retrying them would hide data loss.
   *
   * Returns (idCol, payload). The fake deterministic client in the specs
   * stands in for a real SDK exactly like the multimodal decode stub.
   */
  def fetchCatalog(ids: DataFrame, idCol: String,
                   clientFor: Int => Long => String,
                   maxRetries: Int = 3, backoffMs: Long = 1,
                   minCallIntervalMs: Long = 0): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("payload", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val client = clientFor(pid) // one SDK handle per partition
      var lastCall = 0L
      rows.map { r =>
        val id = r.getLong(idx)
        // I5: pace calls within this partition
        if (minCallIntervalMs > 0) {
          val wait = lastCall + minCallIntervalMs - System.currentTimeMillis()
          if (wait > 0) Thread.sleep(wait)
          lastCall = System.currentTimeMillis()
        }
        // I4: bounded retry with exponential backoff on transient errors
        var attempt = 0
        var out: String = null
        var done = false
        while (!done) {
          try { out = client(id); done = true } catch {
            case e: TransientFetchError =>
              attempt += 1
              if (attempt > maxRetries) throw e
              Thread.sleep(backoffMs << (attempt - 1))
          }
        }
        Row(id, out)
      }
    }(enc)
  }

  /** Idempotent append: write only unseen keys. Appending the same batch
    * twice is a no-op (the I2 exactly-once-ish contract). Only a genuinely
    * absent store skips the anti join — any read failure on an existing
    * store (corrupt footer, permissions, transient FS error) propagates,
    * because silently re-appending the whole batch would break idempotence.
    *
    * With `partitionCol` set (the engine's `partition_key` multi-tenancy
    * discipline) the append hive-partitions on it — rows cluster by tenant
    * first so each batch lands one file per touched directory — which makes
    * tenant drops metadata-only directory deletes and gives tenant-scoped
    * predicates PartitionFilter pruning on the STORE, not just the index. */
  def dedupAppend(incoming: DataFrame, storePath: String, keyCol: String,
                  partitionCol: Option[String] = None): Unit = {
    val spark = incoming.sparkSession
    val existed = storeExists(spark, storePath)
    val novel =
      if (existed) newRows(incoming, graft.util.FastParquet.read(spark, storePath), keyCol)
      else incoming
    partitionCol match {
      case Some(k) =>
        // tenant-value validity (non-null, inference-safe) is the ENGINE's
        // door check (Engine.validateTenantValues) — enforcing it here
        // would force a full-batch materialization on the hot write path
        novel.repartition(col(k)).write.mode("append").partitionBy(k).parquet(storePath)
      case None =>
        novel.write.mode("append").parquet(storePath)
        // a CREATED flat store's read schema is the written one (nullable):
        // record it so the first read skips the footer-inference job; an
        // append to an existing store keeps the inference-derived memo
        if (!existed) graft.util.FastParquet.prime(spark, storePath, novel.schema)
    }
  }
}
