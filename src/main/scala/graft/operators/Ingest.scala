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

  /** Idempotent append: write only unseen keys. Appending the same batch
    * twice is a no-op (the I2 exactly-once-ish contract). */
  def dedupAppend(incoming: DataFrame, storePath: String, keyCol: String): Unit = {
    val spark = incoming.sparkSession
    val existing =
      try spark.read.parquet(storePath)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema) }
    newRows(incoming, existing, keyCol).write.mode("append").parquet(storePath)
  }
}
