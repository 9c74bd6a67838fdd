package graft.operators

import java.security.MessageDigest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Store snapshot / export-import (`mongo_backup_restore.sh` parity — the
 * reference shells out to mongodump/mongorestore; here the "database" is a
 * pair of parquet layouts, so a snapshot is a file-level copy with an
 * integrity manifest).
 *
 * Shape is DistCp, not a driver loop: the DRIVER only lists the tree and
 * writes the manifest; every file COPY (and its SHA-256, computed on the
 * stream as it is copied — no second read) runs inside a Spark task, so a
 * thousand-file 100 TB layout snapshots at cluster bandwidth, one file per
 * task. Restore re-copies from the snapshot and verifies each file's
 * digest against the manifest DURING the copy, failing loudly on any
 * corruption — the byte-identical guarantee EngineSpec's round-trip gates
 * on.
 */
object Backup {

  /** One manifest row: logical part ("store"/"index"), path relative to the
    * part root, size, content digest, the snapshot directory that holds
    * the payload bytes — its OWN directory for a full snapshot, possibly an
    * EARLIER snapshot's for entries an incremental carried forward — and the
    * live file's modification time when it was snapshot (-1 on manifests
    * written before mtime was recorded). */
  final case class Entry(part: String, rel: String, bytes: Long, sha256: String,
                         root: String, mtime: Long = -1L)

  private def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  /** Recursive driver-side listing of data files under `root`, as
    * root-relative paths with (size, mtime) — metadata walk only, no data
    * IO. */
  private def listRel(root: String): Seq[(String, Long, Long)] = {
    val rootP = new Path(root)
    val f = fs(rootP)
    if (!f.exists(rootP)) return Nil
    val base = f.getFileStatus(rootP).getPath.toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    graft.util.FsWalk.files(f, rootP).foreach { st =>
      if (st.isFile) {
        val full = st.getPath.toUri.getPath
        out += ((full.stripPrefix(base).stripPrefix("/"), st.getLen,
          st.getModificationTime))
      }
    }
    out.toSeq
  }

  /** Stream-copy one file, digesting as it flows. Runs inside a task. */
  private def copyOne(srcPath: String, dstPath: String): (Long, String) = {
    val src = new Path(srcPath); val dst = new Path(dstPath)
    val in = fs(src).open(src)
    val dfs = fs(dst)
    dfs.mkdirs(dst.getParent)
    val out = dfs.create(dst, true)
    val md = MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](1 << 20)
    var total = 0L
    try {
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) { md.update(buf, 0, n); out.write(buf, 0, n); total += n }
        n = in.read(buf)
      }
    } finally { in.close(); out.close() }
    (total, md.digest().map("%02x".format(_)).mkString)
  }

  /** Snapshot every (part → rootDir) into `snapshotPath/<part>/...` and
    * write `snapshotPath/MANIFEST.tsv`. Returns the manifest. */
  def snapshot(spark: SparkSession, parts: Map[String, String],
               snapshotPath: String): Seq[Entry] = {
    val jobs = parts.toSeq.flatMap { case (part, root) =>
      listRel(root).map { case (rel, _, mtime) =>
        (part, rel, s"$root/$rel", s"$snapshotPath/$part/$rel", mtime)
      }
    }
    val entries =
      if (jobs.isEmpty) Seq.empty[Entry]
      else spark.sparkContext
        .parallelize(jobs, math.min(jobs.size, 64))
        .map { case (part, rel, src, dst, mtime) =>
          val (bytes, digest) = copyOne(src, dst)
          Entry(part, rel, bytes, digest, snapshotPath, mtime)
        }
        .collect().toSeq.sortBy(e => (e.part, e.rel))
    writeManifest(snapshotPath, entries)
    entries
  }

  /**
   * INCREMENTAL snapshot against a base snapshot's manifest — the daily
   * backup shape once the full snapshot exists: parquet part files are
   * immutable by convention (appends create new parts, rewrites rename),
   * so any live file whose (part, rel, size) matches a base-manifest entry
   * is carried forward by REFERENCE (its manifest row keeps pointing at
   * the snapshot that owns the bytes — a backup chain, like synthetic
   * fulls) and only genuinely new or resized files are copied + digested.
   * At 100 TB this turns the nightly backup from a full-store read into a
   * delta read. [[restore]] follows each row to its owning snapshot, so a
   * chain restores exactly like a full. Returns (copied, carried).
   */
  def snapshotIncremental(spark: SparkSession, parts: Map[String, String],
                          basePath: String, snapshotPath: String): (Long, Long) = {
    val base = readManifest(basePath)
    val baseMap = base.map(e => (e.part, e.rel) -> e).toMap
    val live = parts.toSeq.flatMap { case (part, root) =>
      listRel(root).map { case (rel, bytes, mtime) => (part, rel, bytes, mtime, root) }
    }
    // Carry-by-reference requires size AND mtime to match the base entry —
    // a file rewritten in place with identical size (a same-size parquet
    // rewrite, an intentional tamper) has a new mtime and is re-copied +
    // re-digested. Legacy manifests without mtime (-1) never carry: a copy
    // is the safe direction.
    val (carriedSrc, fresh) = live.partition { case (part, rel, bytes, mtime, _) =>
      baseMap.get((part, rel)).exists(e =>
        e.bytes == bytes && e.mtime >= 0L && e.mtime == mtime)
    }
    val carried = carriedSrc.map { case (part, rel, _, _, _) => baseMap((part, rel)) }
    val copied =
      if (fresh.isEmpty) Seq.empty[Entry]
      else spark.sparkContext
        .parallelize(fresh, math.min(fresh.size, 64))
        .map { case (part, rel, _, mtime, root) =>
          val (bytes, digest) = copyOne(s"$root/$rel", s"$snapshotPath/$part/$rel")
          Entry(part, rel, bytes, digest, snapshotPath, mtime)
        }
        .collect().toSeq
    val entries = (carried ++ copied).sortBy(e => (e.part, e.rel))
    writeManifest(snapshotPath, entries)
    (copied.size.toLong, carried.size.toLong)
  }

  /** Restore a snapshot into the given (part → rootDir) targets. Each live
    * root is cleared first (a restore REPLACES the layout — stale part
    * files from the post-snapshot timeline must not survive next to the
    * restored ones). Every copied file's digest is checked against the
    * manifest; any mismatch aborts with the full mismatch list. Returns the
    * number of files restored. */
  def restore(spark: SparkSession, parts: Map[String, String],
              snapshotPath: String): Long = {
    val manifest = readManifest(snapshotPath)
    val jobs = manifest.flatMap { e =>
      parts.get(e.part).map(root =>
        (s"${e.root}/${e.part}/${e.rel}", s"$root/${e.rel}", e))
    }
    parts.collect { case (part, root) if manifest.exists(_.part == part) =>
      val p = new Path(root)
      val f = fs(p)
      if (f.exists(p)) f.delete(p, true)
    }
    if (jobs.isEmpty) return 0L
    val mismatches = spark.sparkContext
      .parallelize(jobs, math.min(jobs.size, 64))
      .map { case (src, dst, e) =>
        val (bytes, digest) = copyOne(src, dst)
        if (bytes == e.bytes && digest == e.sha256) None
        else Some(s"${e.part}/${e.rel}: manifest ${e.bytes}B/${e.sha256.take(12)} " +
          s"but snapshot holds ${bytes}B/${digest.take(12)}")
      }
      .collect().flatten
    if (mismatches.nonEmpty)
      throw new IllegalStateException(
        s"snapshot at $snapshotPath failed integrity check:\n${mismatches.mkString("\n")}")
    jobs.size.toLong
  }

  private def writeManifest(snapshotPath: String, entries: Seq[Entry]): Unit = {
    val p = new Path(s"$snapshotPath/MANIFEST.tsv")
    val out = fs(p).create(p, true)
    try entries.foreach(e => out.write(
      s"${e.part}\t${e.rel}\t${e.bytes}\t${e.sha256}\t${e.root}\t${e.mtime}\n"
        .getBytes("UTF-8")))
    finally out.close()
  }

  private def readManifest(snapshotPath: String): Seq[Entry] = {
    val p = new Path(s"$snapshotPath/MANIFEST.tsv")
    val in = fs(p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq.filter(_.nonEmpty).map { l =>
      l.split("\t", 6) match {
        case Array(part, rel, bytes, digest, root, mtime) =>
          Entry(part, rel, bytes.toLong, digest, root, mtime.toLong)
        case Array(part, rel, bytes, digest, root) => // pre-mtime manifests
          Entry(part, rel, bytes.toLong, digest, root)
      }
    } finally in.close()
  }
}
