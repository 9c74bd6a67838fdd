package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Small-file compaction — the lakehouse maintenance rewrite (Delta
 * OPTIMIZE / Iceberg rewrite_data_files) that undoes ingest fragmentation.
 * Streaming appends and per-batch writes leave hive-partitioned layouts
 * with one small file per (batch × partition); at 100 TB that is millions
 * of sub-row-group files, and every downstream scan pays open/footer/seek
 * costs per file plus task-scheduling overhead proportional to file count,
 * not byte count. Compaction rewrites each partition directory into few
 * near-target-size files.
 *
 * Shape: one shuffle on the partition column routes every directory's rows
 * to a single task (hash collisions between partition values are harmless —
 * `partitionBy` still splits the writer per directory), and
 * `maxRecordsPerFile` re-splits oversized directories so compaction never
 * recreates the opposite problem (the multi-GB part file q67 guards
 * against). Rows within a directory are written contiguously, restoring
 * row-group locality for min/max skipping.
 */
object Compaction {

  /** Rewrite `inPath` (hive-partitioned by `partCol`) into `outPath` with
    * at most ceil(rows / maxRecordsPerFile) files per partition directory
    * (one file per directory when the bound permits). `sortCols` cluster
    * rows inside the rewritten files (a local sort — no extra exchange),
    * restoring parquet min/max zone-map skipping that interleaved ingest
    * batches destroyed — the OPTIMIZE ... ZORDER/sort half of the rewrite. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              partCol: String, maxRecordsPerFile: Long = 10000000L,
              sortCols: Seq[String] = Nil): Unit = {
    val shuffled = spark.read.parquet(inPath).repartition(col(partCol))
    val clustered =
      if (sortCols.isEmpty) shuffled
      else shuffled.sortWithinPartitions((partCol +: sortCols).map(col): _*)
    clustered.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .parquet(outPath)
  }
}
