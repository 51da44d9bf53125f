package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Storage interface for DATA-path maintenance I/O — the round-8
  * companion to [[LogStore]], covering the operations that touch data
  * files OUTSIDE Spark's own Hadoop FileSystem layer.
  *
  * Scope split (why two seams):
  *  - Spark reads/writes the parquet payload through its Hadoop FS
  *    layer, which already speaks S3/GCS/ABFS — no seam needed.
  *  - The LOG protocol needs one atomicity primitive (conditional
  *    put) — [[LogStore]].
  *  - What remains is MAINTENANCE plumbing the engine does directly:
  *    vacuum's directory sweep, fsck's existence checks, bloom-sidecar
  *    bytes, per-file sizes, branch listing/cleanup, and WAP branch
  *    publish's directory RELOCATION. POSIX `Files.move` has no object
  *    store analog, and a raw directory walk assumes directories
  *    exist — this trait is where those assumptions live, per backend.
  *
  * [[relocateDir]] is the interesting operation: WAP publish moves a
  * branch's staged data dirs into main's tree BEFORE the squash
  * manifest publishes. On POSIX that is one rename; on an object store
  * it is copy-then-delete — which is SAFE here precisely because of
  * the manifest-last ordering: until the squash commit is durable,
  * nothing references the destination objects, so a crash mid-copy
  * leaves unreferenced garbage (vacuum-able), never a manifest
  * pointing at missing data. [[CopyingDataStore]] implements that
  * rename-free shape so a spec can prove the whole maintenance surface
  * runs without POSIX rename/move semantics.
  *
  * Stores are registered per table-root prefix
  * ([[VersionedTable.registerDataStore]]); unregistered roots use
  * [[PosixDataStore]].
  */
trait DataStore {
  def exists(path: Path): Boolean
  def isDir(path: Path): Boolean
  /** Size in bytes of a regular file. */
  def size(path: Path): Long
  /** Last-modified epoch millis (vacuum's age guard). */
  def mtimeMs(path: Path): Long
  /** Immediate child NAMES of `dir`; empty if `dir` does not exist. */
  def listDir(dir: Path): Seq[String]
  /** Every regular file anywhere under `dir` (LIST-by-prefix shape). */
  def listFilesRecursive(dir: Path): Seq[Path]
  def readBytes(path: Path): Array[Byte]
  /** Write a whole object, creating parents as needed. */
  def write(path: Path, bytes: Array[Byte]): Unit
  /** Recursively delete `dir` (vacuum / dropBranch); absence is ok. */
  def deleteTree(dir: Path): Unit
  /** Delete a single object; absence is ok. Defaults to
    * [[deleteTree]], which is correct for a regular file — a concrete
    * default so existing wrappers keep compiling and recording. */
  def deleteFile(path: Path): Unit = deleteTree(path)
  /** Relocate directory tree `src` to `dst` (must not exist). POSIX:
    * rename. Object stores: copy objects then delete source — callers
    * guarantee nothing references `dst` until a later manifest
    * publish, so the non-atomicity is safe (see class doc). */
  def relocateDir(src: Path, dst: Path): Unit
}

/** Shared local-filesystem reads for the two local stores. */
sealed trait LocalFsDataReads extends DataStore {
  override def exists(path: Path): Boolean = Files.exists(path)
  override def isDir(path: Path): Boolean = Files.isDirectory(path)
  override def size(path: Path): Long = Files.size(path)
  override def mtimeMs(path: Path): Long =
    Files.getLastModifiedTime(path).toMillis
  override def listDir(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir) // eager + closed (fd hygiene, see LogStore)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  override def listFilesRecursive(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq.filter(Files.isRegularFile(_))
    finally s.close()
  }
  override def readBytes(path: Path): Array[Byte] = Files.readAllBytes(path)
  override def write(path: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(path.getParent)
    Files.write(path, bytes)
  }
  override def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  override def deleteFile(path: Path): Unit = Files.deleteIfExists(path)
}

/** Default store: directory relocation via one atomic rename. */
object PosixDataStore extends LocalFsDataReads {
  override def relocateDir(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
  }
}

/** Rename-FREE store (the object-store shape): relocation is a
  * per-file copy into `dst` followed by deletion of `src`. Correct
  * under the manifest-last contract ([[DataStore]] doc); exists so
  * specs can prove vacuum/clone/WAP-publish/REORG run with no code
  * path depending on POSIX rename outside this interface. */
object CopyingDataStore extends LocalFsDataReads {
  override def relocateDir(src: Path, dst: Path): Unit = {
    require(!Files.exists(dst), s"relocateDir: $dst already exists")
    listFilesRecursive(src).foreach { f =>
      val to = dst.resolve(src.relativize(f))
      Files.createDirectories(to.getParent)
      Files.copy(f, to, StandardCopyOption.COPY_ATTRIBUTES)
    }
    deleteTree(src)
  }
}
