package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

/** CATALOG seam for the Iceberg interop — the third storage seam next
  * to [[LogStore]] (graft log artifacts) and [[DataStore]] (data-file
  * maintenance I/O), isolating the ONE thing every Iceberg catalog
  * implementation must provide (iceberg.apache.org/spec/, "Table
  * Metadata" + the REST catalog OpenAPI): resolve the table's CURRENT
  * metadata document, and publish a successor with COMPARE-AND-SWAP
  * semantics — exactly one of two racing writers wins.
  *
  * Everything else in [[IcebergMeta]] (manifest lists, manifests,
  * data/delete/Puffin files) is immutable content-addressed storage
  * and stays on the filesystem/Hadoop layer; only the mutable
  * current-pointer goes through the catalog. Implementations:
  *
  *  - [[FsIceCatalog]] — the HadoopCatalog convention (default):
  *    `metadata/v{N}.metadata.json` published by conditional put
  *    (loser gets the exception), advisory `version-hint.text`
  *    advanced last-writer-wins;
  *  - a REST catalog binding is a client away: `currentMetadata` ⇒
  *    `GET /v1/{prefix}/namespaces/{ns}/tables/{t}` (the response's
  *    `metadata` + `metadata-location`), `commit` ⇒
  *    `POST .../tables/{t}` with an `assert-table-uuid` /
  *    snapshot-ref requirement carrying the CAS — the server rejects
  *    a stale base exactly like the conditional put does. No such
  *    client ships here (zero-egress environment); the seam +
  *    [[graft.sources.IceCatalogSpec recording spec]] prove every
  *    pointer mutation flows through the interface.
  *
  * Registration is per root prefix (longest registered prefix wins;
  * unregistered roots use [[FsIceCatalog]]) — the same shape as
  * [[VersionedTable.registerLogStore]].
  */
trait IceCatalog {

  /** Does a table exist at `root`? */
  def tableExists(root: String): Boolean

  /** The current metadata version — the CHEAP freshness probe
    * ([[IcebergMetaFileIndex]] polls it per access; implementations
    * should make it one small read, not a full metadata fetch). */
  def currentVersion(root: String): Int

  /** The current metadata document: (version, raw JSON bytes). */
  def currentMetadata(root: String): (Int, Array[Byte])

  /** Create a NEW table: publish `metadata` as version 1; refuse if
    * the table already exists. */
  def create(root: String, metadata: Array[Byte]): Unit

  /** Publish `metadata` as the successor of `expectedVersion` with
    * CAS semantics: if another writer already committed version
    * `expectedVersion + 1`, throw
    * [[VersionedTable.ConcurrentCommitException]] — the caller
    * re-reads and retries; NEVER silently overwrite. */
  def commit(root: String, expectedVersion: Int,
      metadata: Array[Byte]): Unit
}

/** The filesystem catalog (Iceberg's HadoopCatalog convention):
  * versioned metadata files under `metadata/`, conditional-put commit
  * through the [[LogStore]] seam (so object-store bindings inherit
  * the same one-winner guarantee), and an ADVISORY
  * `version-hint.text` — a concurrent writer mid-rewrite can expose
  * a truncated/empty hint, which degrades to the listing, never
  * throws. */
object FsIceCatalog extends IceCatalog {

  private def metaDir(root: String): Path = Paths.get(root, "metadata")

  private def docPath(root: String, v: Int): Path =
    metaDir(root).resolve(s"v$v.metadata.json")

  override def tableExists(root: String): Boolean =
    Files.exists(metaDir(root))

  override def currentVersion(root: String): Int = {
    val hint = metaDir(root).resolve("version-hint.text")
    val hinted: Option[Int] =
      if (!Files.exists(hint)) None
      else scala.util.Try(
        new String(Files.readAllBytes(hint), UTF_8).trim.toInt).toOption
    hinted.getOrElse {
      val vs = PosixDataStore.listDir(metaDir(root))
        .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toInt }
      require(vs.nonEmpty, s"$root is not an Iceberg table (no metadata)")
      vs.max
    }
  }

  override def currentMetadata(root: String): (Int, Array[Byte]) = {
    val v = currentVersion(root)
    (v, Files.readAllBytes(docPath(root, v)))
  }

  override def create(root: String, metadata: Array[Byte]): Unit = {
    require(!Files.exists(
      metaDir(root).resolve("version-hint.text")),
      s"iceberg-meta: $root already exists")
    Files.createDirectories(metaDir(root))
    try PosixLogStore.putIfAbsent(docPath(root, 1), metadata)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(1)
    }
    writeHint(root, 1)
  }

  override def commit(root: String, expectedVersion: Int,
      metadata: Array[Byte]): Unit = {
    try PosixLogStore.putIfAbsent(
      docPath(root, expectedVersion + 1), metadata)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(
          expectedVersion + 1)
    }
    writeHint(root, expectedVersion + 1)
  }

  /** Publish `version-hint.text` ATOMICALLY (temp file + rename):
    * `Files.write` truncates in place, and a concurrent reader
    * between truncate and write sees an EMPTY hint — observed as a
    * NumberFormatException in a streaming tail racing a commit. */
  private def writeHint(root: String, v: Int): Unit = {
    val tmp = Files.createTempFile(metaDir(root), ".hint-", ".tmp")
    Files.write(tmp, v.toString.getBytes(UTF_8))
    Files.move(tmp, metaDir(root).resolve("version-hint.text"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

object IceCatalog {

  private val catalogs =
    new java.util.concurrent.ConcurrentHashMap[String, IceCatalog]()

  /** Use `catalog` for every table whose root starts with
    * `rootPrefix` (longest registered prefix wins; unregistered
    * roots use [[FsIceCatalog]]). */
  def register(rootPrefix: String, catalog: IceCatalog): Unit =
    catalogs.put(rootPrefix, catalog)

  def unregister(rootPrefix: String): Unit =
    catalogs.remove(rootPrefix)

  def forRoot(root: String): IceCatalog =
    if (catalogs.isEmpty) FsIceCatalog
    else {
      var best: String = null
      val it = catalogs.keys()
      while (it.hasMoreElements) {
        val k = it.nextElement()
        if (root.startsWith(k) && (best == null || k.length > best.length))
          best = k
      }
      if (best == null) FsIceCatalog else catalogs.get(best)
    }
}
