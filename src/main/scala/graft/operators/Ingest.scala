package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Idempotent append: write only unseen keys. Appending the same batch
    * twice is a no-op (the I2 exactly-once-ish contract). Only a genuinely
    * absent store skips the anti join — any read failure on an existing
    * store (corrupt footer, permissions, transient FS error) propagates,
    * because silently re-appending the whole batch would break idempotence. */
  def dedupAppend(incoming: DataFrame, storePath: String, keyCol: String): Unit = {
    val spark = incoming.sparkSession
    val novel =
      if (storeExists(spark, storePath))
        newRows(incoming, spark.read.parquet(storePath), keyCol)
      else incoming
    novel.write.mode("append").parquet(storePath)
  }
}
