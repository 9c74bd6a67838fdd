package graft.util

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive metadata walk via `listStatus` — a drop-in for
  * `FileSystem.listFiles(p, recursive = true)` on metadata-only paths.
  *
  * `listFiles` wraps every entry in a `LocatedFileStatus`, whose constructor
  * eagerly materializes the permission bits; on a local FS without native
  * bindings that is one forked `ls -ld` PER FILE
  * (`DeprecatedRawLocalFileStatus.loadPermissionInfo`). The engine's
  * fingerprint/manifest walks only read name+len+mtime, so a plain
  * `listStatus` recursion returns the same facts with zero forks and zero
  * block-location lookups (the other thing `listFiles` pays for — pointless
  * on any FS the driver walks for metadata).
  */
object FsWalk {
  /** Every file under `root`, depth-first. `root` must exist. */
  def files(fs: FileSystem, root: Path): Seq[FileStatus] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath) else out += st
    }
    walk(root)
    out.toSeq
  }
}
