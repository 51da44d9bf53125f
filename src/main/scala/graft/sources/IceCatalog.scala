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
  *  - [[RestIceCatalog]] — the REST catalog binding over
  *    `java.net.http.HttpClient`: `currentMetadata` ⇒
  *    `GET /v1/{prefix}/namespaces/{ns}/tables/{t}` (the response's
  *    `metadata` + `metadata-location`), `commit` ⇒
  *    `POST .../tables/{t}` with a requirements-carrying body — the
  *    server rejects a stale base with 409 exactly like the
  *    conditional put does (IceCatalogSpec proves the one-winner
  *    race through real HTTP against an in-process stub; the
  *    zero-egress sandbox has no external catalog to talk to).
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

/** REST catalog BINDING — the Iceberg REST catalog protocol's two
  * operations this seam needs, over `java.net.http.HttpClient`
  * (endpoint shapes per the published REST catalog OpenAPI;
  * `{prefix}` and table identifiers as the spec routes them):
  *
  *  - resolve: `GET {base}/v1/{prefix}/namespaces/{ns}/tables/{t}` —
  *    the response's `metadata-location` (version parsed from the
  *    spec's `v{N}.metadata.json` convention) + `metadata` document;
  *    404 = no such table;
  *  - create: `POST {base}/v1/{prefix}/namespaces/{ns}/tables` with
  *    the name + initial metadata; 409 = already exists;
  *  - commit: `POST {base}/v1/{prefix}/namespaces/{ns}/tables/{t}`
  *    carrying a REQUIREMENTS array — here the location CAS
  *    (`assert-metadata-location` on the expected current pointer,
  *    the same check `assert-table-uuid`/ref assertions express in
  *    the OpenAPI) — plus the successor document; the server
  *    answers 409 when the requirement fails, which surfaces as
  *    [[VersionedTable.ConcurrentCommitException]] — exactly one of
  *    two racing writers wins, same contract as the conditional put.
  *
  * Divergence, stated: this engine publishes FULL metadata documents
  * (the HadoopCatalog model), so the commit body carries `metadata`
  * verbatim rather than the OpenAPI's incremental `updates` list — a
  * server-side catalog stores the document it is handed. Table
  * identifiers are an opaque URL-safe token of the root path (a real
  * deployment maps real namespace/table names). The zero-egress
  * sandbox means the peer is an in-process stub
  * ([[graft.sources.IceCatalogSpec]] binds one over localhost and
  * proves the one-winner race through real HTTP). */
final class RestIceCatalog(baseUri: String, prefix: String = "graft",
    namespace: String = "default") extends IceCatalog {

  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  private val http = HttpClient.newHttpClient()

  /** Opaque URL-safe table token for a filesystem root. */
  private def token(root: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(root.getBytes(UTF_8))

  private def tablesUri = java.net.URI.create(
    s"$baseUri/v1/$prefix/namespaces/$namespace/tables")

  private def tableUri(root: String) = java.net.URI.create(
    s"$baseUri/v1/$prefix/namespaces/$namespace/tables/${token(root)}")

  private def send(req: HttpRequest): HttpResponse[Array[Byte]] =
    http.send(req, HttpResponse.BodyHandlers.ofByteArray())

  private def versionOf(location: String): Int =
    location.split('/').last
      .stripPrefix("v").stripSuffix(".metadata.json").toInt

  private def resolve(root: String): Option[(Int, Array[Byte])] = {
    val resp = send(HttpRequest.newBuilder(tableUri(root)).GET().build())
    resp.statusCode() match {
      case 200 =>
        val n = mapper.readTree(resp.body())
        Some((versionOf(n.get("metadata-location").asText()),
          mapper.writeValueAsBytes(n.get("metadata"))))
      case 404 => None
      case other => throw new IllegalStateException(
        s"rest-catalog: GET ${tableUri(root)} returned $other")
    }
  }

  override def tableExists(root: String): Boolean =
    resolve(root).isDefined

  override def currentVersion(root: String): Int =
    resolve(root).map(_._1).getOrElse(throw new IllegalArgumentException(
      s"$root is not an Iceberg table (rest catalog: not found)"))

  override def currentMetadata(root: String): (Int, Array[Byte]) =
    resolve(root).getOrElse(throw new IllegalArgumentException(
      s"$root is not an Iceberg table (rest catalog: not found)"))

  private def post(uri: java.net.URI, body: Array[Byte],
      conflictVersion: Int): Unit = {
    val resp = send(HttpRequest.newBuilder(uri)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build())
    resp.statusCode() match {
      case 200 => ()
      case 409 =>
        throw new VersionedTable.ConcurrentCommitException(conflictVersion)
      case other => throw new IllegalStateException(
        s"rest-catalog: POST $uri returned $other")
    }
  }

  override def create(root: String, metadata: Array[Byte]): Unit = {
    val body = mapper.createObjectNode()
    body.put("name", token(root))
    body.put("metadata-location", "v1.metadata.json")
    body.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
      mapper.readTree(metadata))
    post(tablesUri, mapper.writeValueAsBytes(body), 1)
  }

  override def commit(root: String, expectedVersion: Int,
      metadata: Array[Byte]): Unit = {
    val body = mapper.createObjectNode()
    val req = body.putArray("requirements").addObject()
    req.put("type", "assert-metadata-location")
    req.put("metadata-location", s"v$expectedVersion.metadata.json")
    body.put("metadata-location", s"v${expectedVersion + 1}.metadata.json")
    body.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
      mapper.readTree(metadata))
    post(tableUri(root), mapper.writeValueAsBytes(body),
      expectedVersion + 1)
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
