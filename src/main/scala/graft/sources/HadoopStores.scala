package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Path, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** [[LogStore]] + [[DataStore]] bound to `org.apache.hadoop.fs
  * .FileSystem` — the bridge that runs the whole graft protocol
  * through Hadoop's filesystem abstraction, so a `file:///` root
  * works today and an `s3a://` / `gs://` / `abfs://` root binds
  * off-sandbox with ZERO graft changes (register the stores for the
  * root prefix and go).
  *
  * Contract mapping:
  *  - [[LogStore.putIfAbsent]] → `FileSystem.create(path,
  *    overwrite = false)`. On HDFS that create is atomic-exclusive;
  *    on S3A, enable the filesystem's conditional-create
  *    (`If-None-Match: *`) support so the loser of a commit race
  *    gets the exception rather than a silent overwrite — the same
  *    requirement Delta's S3 LogStore documents.
  *  - [[DataStore.relocateDir]] → per-file stream copy + source
  *    delete, NEVER `FileSystem.rename` (non-atomic and O(data) on
  *    object stores anyway; safe here under the manifest-last
  *    ordering, see [[DataStore]]).
  *  - Directory listings treat a missing directory as empty
  *    (LIST-on-prefix semantics).
  *
  * Path bridging: the seams speak `java.nio.file.Path`, which
  * collapses `scheme://` to `scheme:/` — [[HadoopStores.toHPath]]
  * repairs that, so URI-rooted tables round-trip through the
  * existing `Paths.get(root, rel)` call sites unchanged.
  */
object HadoopStores {
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):/([^/].*)$".r

  /** nio → Hadoop path, restoring the `//` a nio Path collapsed. */
  def toHPath(p: Path): HPath = p.toString match {
    case SchemeRe(scheme, rest) => new HPath(s"$scheme://$rest")
    case plain => new HPath(plain)
  }

  /** Hadoop → nio path; non-file schemes stay textual (they
    * round-trip back through [[toHPath]]'s repair). */
  def toNioPath(h: HPath): Path = {
    val u = h.toUri
    if (u.getScheme == null || u.getScheme == "file") Paths.get(u.getPath)
    else Paths.get(u.toString)
  }
}

final class HadoopLogStore(conf: Configuration) extends LogStore {
  import HadoopStores.toHPath
  private def fs(h: HPath): FileSystem = h.getFileSystem(conf)

  override def mkdirs(dir: Path): Unit = {
    val h = toHPath(dir); fs(h).mkdirs(h); ()
  }
  override def listDir(dir: Path): Seq[String] = {
    val h = toHPath(dir)
    try fs(h).listStatus(h).toSeq.map(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }
  override def exists(path: Path): Boolean = {
    val h = toHPath(path); fs(h).exists(h)
  }
  override def readBytes(path: Path): Array[Byte] = {
    val h = toHPath(path)
    val in = fs(h).open(h)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
  override def readLines(path: Path): Seq[String] = {
    val s = new String(readBytes(path), UTF_8)
    val lines = s.split("\n", -1).toSeq.map(_.stripSuffix("\r"))
    if (lines.nonEmpty && lines.last.isEmpty) lines.init else lines
  }
  override def mtimeMs(path: Path): Long = {
    val h = toHPath(path)
    fs(h).getFileStatus(h).getModificationTime
  }
  override def putIfAbsent(path: Path, body: Array[Byte]): Unit = {
    val h = toHPath(path)
    // only the REAL already-exists signal converts to the commit-race
    // exception: FileAlreadyExistsException itself, or a RemoteException
    // wrapping it (the RPC shape HDFS uses). Message sniffing would
    // also match "File does not exist"/"Parent does not exist" and
    // misreport genuine I/O failures as lost races.
    val out =
      try fs(h).create(h, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new java.nio.file.FileAlreadyExistsException(path.toString)
        case e: org.apache.hadoop.ipc.RemoteException
            if e.getClassName ==
              classOf[org.apache.hadoop.fs.FileAlreadyExistsException]
                .getName =>
          throw new java.nio.file.FileAlreadyExistsException(path.toString)
      }
    try out.write(body) finally out.close()
  }
  override def delete(path: Path): Unit = {
    val h = toHPath(path); fs(h).delete(h, false); ()
  }
}

final class HadoopDataStore(conf: Configuration) extends DataStore {
  import HadoopStores.{toHPath, toNioPath}
  private def fs(h: HPath): FileSystem = h.getFileSystem(conf)

  override def exists(path: Path): Boolean = {
    val h = toHPath(path); fs(h).exists(h)
  }
  override def isDir(path: Path): Boolean = {
    val h = toHPath(path)
    try fs(h).getFileStatus(h).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }
  override def size(path: Path): Long = {
    val h = toHPath(path); fs(h).getFileStatus(h).getLen
  }
  override def mtimeMs(path: Path): Long = {
    val h = toHPath(path); fs(h).getFileStatus(h).getModificationTime
  }
  override def listDir(dir: Path): Seq[String] = {
    val h = toHPath(dir)
    try fs(h).listStatus(h).toSeq.map(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }
  override def listFilesRecursive(dir: Path): Seq[Path] = {
    val h = toHPath(dir)
    val out = Seq.newBuilder[Path]
    try {
      val it = fs(h).listFiles(h, true)
      while (it.hasNext) out += toNioPath(it.next().getPath)
    } catch { case _: java.io.FileNotFoundException => () }
    out.result()
  }
  override def readBytes(path: Path): Array[Byte] = {
    val h = toHPath(path)
    val in = fs(h).open(h)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }
  override def write(path: Path, bytes: Array[Byte]): Unit = {
    val h = toHPath(path)
    val out = fs(h).create(h, true) // create() makes parents on Hadoop
    try out.write(bytes) finally out.close()
  }
  override def deleteTree(dir: Path): Unit = {
    val h = toHPath(dir); fs(h).delete(h, true); ()
  }
  override def deleteFile(path: Path): Unit = {
    val h = toHPath(path); fs(h).delete(h, false); ()
  }
  override def relocateDir(src: Path, dst: Path): Unit = {
    val hDst = toHPath(dst)
    require(!fs(hDst).exists(hDst), s"relocateDir: $dst already exists")
    listFilesRecursive(src).foreach { f =>
      val to = dst.resolve(src.relativize(f))
      val hf = toHPath(f); val ht = toHPath(to)
      val in = fs(hf).open(hf)
      try {
        val out = fs(ht).create(ht, false)
        try {
          val buf = new Array[Byte](256 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally out.close()
      } finally in.close()
    }
    deleteTree(src)
  }
}
