package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

  /** Per-directory file stats of a hive-partitioned layout, from a
    * driver-side filesystem listing — a metadata walk, NO Spark job and no
    * data IO. `value` is the raw partition value from the directory name. */
  final case class DirStat(value: String, files: Int, bytes: Long)

  def partitionStats(spark: SparkSession, path: String, partCol: String): Seq[DirStat] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map { d =>
        val data = fs.listStatus(d.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
        DirStat(d.getPath.getName.stripPrefix(partCol + "="),
          data.length, data.map(_.getLen).sum)
      }
  }

  /**
   * Partition-SELECTIVE, skew-safe, in-place compaction (the Delta
   * OPTIMIZE file-selection shape; round-6 verdict task 2). [[compact]]
   * rewrites every directory even when only a few are fragmented — at 100 TB
   * with thousands of partition dirs of which a handful accreted small
   * files since the last maintenance pass, that multiplies both IO and
   * shuffle by the healthy:sick ratio. This variant:
   *
   *  1. enumerates fragmented directories DRIVER-SIDE from the listing —
   *     a dir is sick when its file count exceeds BOTH `maxFilesPerDir`
   *     (the churn floor: merging 3 files into 1 is not worth a rewrite)
   *     AND its own target layout `ceil(bytes/targetFileBytes)` (a dir of
   *     10 near-target files is healthy at any `maxFilesPerDir`). The
   *     double bound makes the verb IDEMPOTENT: a pass's own output —
   *     whose bytes shrink vs the pre-estimate as per-file overhead
   *     collapses — can never re-trigger it. No job touches healthy dirs;
   *  2. reads ONLY those partitions (the `isin` filter on the partition
   *     column prunes at the source — healthy dirs see zero IO);
   *  3. shuffles on (partCol, salt) where salt = hash(saltCol) mod
   *     ceil(dirBytes / targetFileBytes) — an oversized (skewed) directory
   *     fans out across multiple writer tasks instead of serializing
   *     through one straggler, while small dirs keep salt-domain 1;
   *  4. overwrites with `partitionOverwriteMode=dynamic`, which replaces
   *     exactly the rewritten directories and leaves the rest byte-identical
   *     (their files are never listed, read, or re-written).
   *
   * `maxRecordsPerFile` stays as the hard upper bound per file (salting is
   * for write parallelism; the record cap is the size guarantee). Rows are
   * sorted within tasks on (partCol, saltCol) so zone-map locality is
   * restored inside each rewritten file. Returns the rewritten partition
   * values (empty = layout already healthy, nothing was read or written).
   */
  def compactSelective(spark: SparkSession, path: String, partCol: String,
                       saltCol: String, maxFilesPerDir: Int = 4,
                       targetFileBytes: Long = 128L * 1024 * 1024,
                       maxRecordsPerFile: Long = 10000000L): Seq[String] = {
    val stats = partitionStats(spark, path, partCol)
    def targetFiles(s: DirStat): Long =
      math.max(1L, (s.bytes + targetFileBytes - 1) / targetFileBytes)
    val frag = stats.filter(s => s.files > math.max(maxFilesPerDir.toLong, targetFiles(s)))
    if (frag.isEmpty) return Nil
    val nFiles: Map[String, Long] = frag.map(s => s.value -> targetFiles(s)).toMap
    // dir-name partition values are strings; compare on cast-to-string so
    // numeric partition columns round-trip (kb=3 dir ↔ long column)
    val saltDomain = map(nFiles.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val sel = spark.read.parquet(path)
      .filter(col(partCol).cast("string").isin(frag.map(_.value): _*))
      .withColumn("__salt", pmod(xxhash64(col(saltCol)),
        element_at(saltDomain, col(partCol).cast("string"))))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // EXPLICIT partition count: an unnumbered repartition is fair game for
    // AQE's post-shuffle coalescing, which at low volume merges the salt
    // groups back into one task — exactly the straggler the salt exists to
    // kill. A user-specified count is respected by AQE; 4× the salt-group
    // total keeps hash collisions between groups rare so the hot dir
    // really lands on multiple writers.
    val shufflePartitions = math.max(
      spark.sessionState.conf.numShufflePartitions,
      4 * nFiles.values.sum.toInt)
    try {
      sel.repartition(shufflePartitions, col(partCol), col("__salt"))
        .sortWithinPartitions(partCol, saltCol)
        .drop("__salt")
        .localCheckpoint(true) // pin BEFORE overwriting the dirs being read
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(partCol)
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    frag.map(_.value)
  }

  /**
   * Retention vacuum for versioned copy-on-write stores (the `v{n}`
   * layout the streaming MV maintenance writes — each refresh lands a
   * full new version directory, so superseded versions accumulate
   * forever unless something deletes them; Delta/Iceberg call this verb
   * VACUUM / expire_snapshots). Keeps the newest `keep` versions, deletes
   * the rest. Pure driver-side file metadata — no Spark job; at 100 TB
   * the deletes are the only IO and they touch superseded data exclusively,
   * so a concurrent reader of the latest version is never disturbed.
   * Returns the deleted version names (oldest first).
   */
  def vacuumVersions(spark: SparkSession, path: String, keep: Int): Seq[String] = {
    require(keep >= 1, "must keep at least the latest version")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => d.getName.matches("v\\d+"))
      .sortBy(_.getName.drop(1).toInt)
    val doomed = versions.dropRight(keep)
    doomed.foreach(d => fs.delete(d, true))
    doomed.map(_.getName).toSeq
  }
}
