package graft.util

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

/**
 * `file://` filesystem whose permission writes are syscalls, not forks.
 *
 * Hadoop's stock [[RawLocalFileSystem.setPermission]] shells out to
 * `/bin/chmod` (one `ProcessBuilder.start` per created file or directory)
 * whenever the libhadoop native bindings are absent — which they are in a
 * plain Spark-on-JVM deployment. Every parquet part file, checksum file,
 * committer temp dir and staging dir pays a full process fork of the
 * multi-GB JVM; JFR on one engine-lifecycle bench query counted 3,358 forks
 * in 80 s, serialized through task/job commit (optimization guide §6: commit
 * cost on local/object stores). This subclass performs the same chmod
 * through `java.nio.file.Files.setPosixFilePermissions` — identical
 * permission bits, no process. Modes java.nio cannot express (sticky/setuid,
 * never used by Spark's committers) fall back to the shell path.
 */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) super.setPermission(p, permission) // sticky/setuid: shell
    else {
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      val flags = Seq(
        0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
        0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
        0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
      flags.foreach { case (bit, perm) => if ((bits & bit) != 0) set.add(perm) }
      try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      catch {
        case _: UnsupportedOperationException => super.setPermission(p, permission)
        case e: java.io.IOException => throw e
      }
    }
  }
}

/** Drop-in `fs.file.impl`: stock [[LocalFileSystem]] (checksummed) over the
  * fork-free raw layer. Wire with
  * `.config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")`. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
