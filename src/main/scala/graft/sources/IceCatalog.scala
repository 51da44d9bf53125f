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

/** REST catalog BINDING — the Iceberg REST catalog protocol's
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
  *    carrying the OpenAPI's INCREMENTAL body — a `requirements`
  *    array (`assert-table-uuid` + `assert-ref-snapshot-id` on
  *    `main`'s expected snapshot — the spec's optimistic lock) and
  *    an `updates` array DIFFED from the caller's base document
  *    against its successor (`add-snapshot`, `set-snapshot-ref`,
  *    `remove-snapshots`, `add-schema`/`set-current-schema`,
  *    `add-spec`/`set-default-spec`, `set-statistics`/
  *    `remove-statistics`, `set-properties`/`remove-properties`,
  *    `upgrade-format-version`). The SERVER maintains the derived
  *    fields (`last-updated-ms`, `last-sequence-number`,
  *    `snapshot-log`, `next-row-id`, `current-snapshot-id`) from the
  *    updates it applies — exactly the OpenAPI contract; 409 when a
  *    requirement fails surfaces as
  *    [[VersionedTable.ConcurrentCommitException]] — exactly one of
  *    two racing writers wins.
  *
  * A document change the update vocabulary cannot express refuses
  * loudly (never a silent partial publish). Table identifiers are an
  * opaque URL-safe token of the root path (a real deployment maps
  * real namespace/table names). The zero-egress sandbox means the
  * peer is an in-process stub ([[graft.sources.IceCatalogSpec]]
  * binds one over localhost that VALIDATES the requirement/update
  * shapes, applies them server-side, and proves the one-winner race
  * through real HTTP). */
final class RestIceCatalog(val baseUri: String,
    prefix: String = "graft",
    namespace: String = "default") extends IceCatalog {

  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
  import scala.jdk.CollectionConverters._

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
    // the base for the diff is the SERVER's current document — when
    // the pointer already moved past the caller's base, the commit is
    // a guaranteed loser; fail fast with the seam's exception
    val (curVer, curBytes) = resolve(root).getOrElse(
      throw new IllegalArgumentException(
        s"$root is not an Iceberg table (rest catalog: not found)"))
    if (curVer != expectedVersion)
      throw new VersionedTable.ConcurrentCommitException(
        expectedVersion + 1)
    val oldDoc = mapper.readTree(curBytes)
    val newDoc = mapper.readTree(metadata)
    val body = mapper.createObjectNode()
    val updates = diffUpdates(oldDoc, newDoc)
    val reqs = body.putArray("requirements")
    val r1 = reqs.addObject()
    r1.put("type", "assert-table-uuid")
    r1.put("uuid", oldDoc.path("table-uuid").asText())
    val r2 = reqs.addObject()
    r2.put("type", "assert-ref-snapshot-id")
    r2.put("ref", "main")
    oldMainSnapshot(oldDoc) match {
      case Some(id) => r2.put("snapshot-id", id)
      case None => r2.putNull("snapshot-id") // ref must not exist yet
    }
    // per-update-type assertions (the requirements faithful Iceberg
    // clients send): a ref-preserving commit would otherwise race a
    // concurrent same-kind commit undetected — two add-schema writers
    // off one base must not both land
    val actions = updates.elements().asScala
      .map(_.get("action").asText()).toSet
    if (actions("add-schema") || actions("set-current-schema")) {
      val r = reqs.addObject()
      r.put("type", "assert-current-schema-id")
      r.put("current-schema-id",
        oldDoc.path("current-schema-id").asInt())
      val f = reqs.addObject()
      f.put("type", "assert-last-assigned-field-id")
      f.put("last-assigned-field-id",
        oldDoc.path("last-column-id").asInt())
    }
    if (actions("add-spec") || actions("set-default-spec")) {
      val r = reqs.addObject()
      r.put("type", "assert-default-spec-id")
      r.put("default-spec-id", oldDoc.path("default-spec-id").asInt())
    }
    if (actions("add-sort-order") || actions("set-default-sort-order")) {
      val r = reqs.addObject()
      r.put("type", "assert-default-sort-order-id")
      r.put("default-sort-order-id",
        oldDoc.path("default-sort-order-id").asInt())
    }
    body.set[JsonNode]("updates", updates)
    post(tableUri(root), mapper.writeValueAsBytes(body),
      expectedVersion + 1)
  }

  private def oldMainSnapshot(doc: JsonNode): Option[Long] = {
    val viaRef = Option(doc.get("refs")).filterNot(_.isNull)
      .flatMap(r => Option(r.get("main"))).filterNot(_.isNull)
      .map(_.get("snapshot-id").asLong())
    viaRef.orElse(Option(doc.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong()).filter(_ != -1L))
  }

  /** Top-level fields the SERVER derives from applied updates — a
    * diff in these never needs (or gets) an update of its own
    * (last-column-id rides add-schema, last-partition-id rides
    * add-spec, the rest are commit bookkeeping). */
  private val ServerDerived = Set("last-updated-ms",
    "last-sequence-number", "snapshot-log", "next-row-id",
    "current-snapshot-id", "last-column-id", "last-partition-id",
    // the server owns its metadata-location history (the OpenAPI's
    // previous-metadata tracking) — the client's local metadata-log
    // never publishes
    "metadata-log")

  /** The OpenAPI `updates` list that turns `oldDoc` into `newDoc`.
    * Any difference outside the expressible vocabulary throws — a
    * partial publish would desynchronize every other client. */
  private def diffUpdates(oldDoc: JsonNode, newDoc: JsonNode)
      : ArrayNode = {
    val updates = mapper.createArrayNode()
    def elems(doc: JsonNode, field: String): Seq[JsonNode] =
      Option(doc.get(field)).filterNot(_.isNull).toSeq
        .flatMap(_.elements().asScala)
    def byKey(doc: JsonNode, field: String, key: String)
        : Map[Long, JsonNode] =
      elems(doc, field).map(n => n.get(key).asLong() -> n).toMap
    val handled = scala.collection.mutable.Set.empty[String]
    handled ++= ServerDerived
    // table-uuid and location are deliberately NOT handled: no writer
    // here changes them, and a change must hit the refusal loop below
    // (assign-uuid/set-location exist in the OpenAPI but expressing
    // them silently would mask a corrupted successor document)
    // format-version
    handled += "format-version"
    if (oldDoc.path("format-version").asInt() !=
        newDoc.path("format-version").asInt()) {
      val u = updates.addObject()
      u.put("action", "upgrade-format-version")
      u.put("format-version", newDoc.get("format-version").asInt())
    }
    // schemas + current-schema-id
    handled ++= Seq("schemas", "current-schema-id", "schema")
    val oldSchemas = byKey(oldDoc, "schemas", "schema-id").keySet
    val newSchemaIds = byKey(newDoc, "schemas", "schema-id").keySet
    // the OpenAPI has no remove-schema action — a successor document
    // that PRUNED a schema entry cannot publish; silently emitting
    // only the add-schema side would violate this function's "any
    // inexpressible difference throws" contract
    val prunedSchemas = oldSchemas -- newSchemaIds
    if (prunedSchemas.nonEmpty) throw new IllegalArgumentException(
      "ice-catalog: no update representation for removed schema ids " +
        s"${prunedSchemas.toSeq.sorted.mkString(",")} — the REST " +
        "vocabulary cannot express schema removal")
    elems(newDoc, "schemas")
      .filterNot(s => oldSchemas(s.get("schema-id").asLong()))
      .foreach { s =>
        val u = updates.addObject()
        u.put("action", "add-schema")
        u.set[JsonNode]("schema", s)
        Option(newDoc.get("last-column-id")).filterNot(_.isNull)
          .foreach(id => u.put("last-column-id", id.asInt()))
      }
    if (oldDoc.path("current-schema-id").asInt(-1) !=
        newDoc.path("current-schema-id").asInt(-1)) {
      val u = updates.addObject()
      u.put("action", "set-current-schema")
      u.put("schema-id", newDoc.get("current-schema-id").asInt())
    }
    // partition specs
    handled ++= Seq("partition-specs", "default-spec-id")
    val oldSpecs = byKey(oldDoc, "partition-specs", "spec-id").keySet
    val prunedSpecs =
      oldSpecs -- byKey(newDoc, "partition-specs", "spec-id").keySet
    if (prunedSpecs.nonEmpty) throw new IllegalArgumentException(
      "ice-catalog: no update representation for removed spec ids " +
        s"${prunedSpecs.toSeq.sorted.mkString(",")} — the REST " +
        "vocabulary cannot express partition-spec removal")
    elems(newDoc, "partition-specs")
      .filterNot(s => oldSpecs(s.get("spec-id").asLong()))
      .foreach { s =>
        val u = updates.addObject()
        u.put("action", "add-spec")
        u.set[JsonNode]("spec", s)
      }
    if (oldDoc.path("default-spec-id").asInt(-1) !=
        newDoc.path("default-spec-id").asInt(-1)) {
      val u = updates.addObject()
      u.put("action", "set-default-spec")
      u.put("spec-id", newDoc.get("default-spec-id").asInt())
    }
    // sort orders — same add/point/never-remove shape as specs
    // (OpenAPI: add-sort-order + set-default-sort-order)
    handled ++= Seq("sort-orders", "default-sort-order-id")
    val oldOrders = byKey(oldDoc, "sort-orders", "order-id").keySet
    val prunedOrders =
      oldOrders -- byKey(newDoc, "sort-orders", "order-id").keySet
    if (prunedOrders.nonEmpty) throw new IllegalArgumentException(
      "ice-catalog: no update representation for removed sort-order " +
        s"ids ${prunedOrders.toSeq.sorted.mkString(",")} — the REST " +
        "vocabulary cannot express sort-order removal")
    elems(newDoc, "sort-orders")
      .filterNot(s => oldOrders(s.get("order-id").asLong()))
      .foreach { s =>
        val u = updates.addObject()
        u.put("action", "add-sort-order")
        u.set[JsonNode]("sort-order", s)
      }
    if (oldDoc.path("default-sort-order-id").asInt(-1) !=
        newDoc.path("default-sort-order-id").asInt(-1)) {
      val u = updates.addObject()
      u.put("action", "set-default-sort-order")
      u.put("sort-order-id", newDoc.get("default-sort-order-id").asInt())
    }
    // snapshots: additions in sequence order, removals as one batch
    handled += "snapshots"
    val oldSnaps = byKey(oldDoc, "snapshots", "snapshot-id")
    val newSnaps = byKey(newDoc, "snapshots", "snapshot-id")
    newSnaps.toSeq.filterNot { case (id, _) => oldSnaps.contains(id) }
      .sortBy(_._2.path("sequence-number").asLong())
      .foreach { case (_, s) =>
        val u = updates.addObject()
        u.put("action", "add-snapshot")
        u.set[JsonNode]("snapshot", s)
      }
    val removedSnaps = oldSnaps.keySet -- newSnaps.keySet
    if (removedSnaps.nonEmpty) {
      val u = updates.addObject()
      u.put("action", "remove-snapshots")
      val ids = u.putArray("snapshot-ids")
      removedSnaps.toSeq.sorted.foreach(ids.add)
    }
    // refs: every changed/new ref, the main pointer included (a bare
    // current-snapshot-id move — rollback — expresses as a main move)
    handled += "refs"
    def refsOf(doc: JsonNode): Map[String, JsonNode] =
      Option(doc.get("refs")).filterNot(_.isNull).toSeq
        .flatMap(_.properties().asScala.map(e => e.getKey -> e.getValue))
        .toMap
    val oldRefs = refsOf(oldDoc)
    val newRefs0 = refsOf(newDoc)
    // synthesize the main move when only current-snapshot-id moved
    val newRefs =
      if (newRefs0.contains("main") ||
        newDoc.path("current-snapshot-id").asLong(-1L) == -1L) newRefs0
      else {
        val m = mapper.createObjectNode()
        m.put("snapshot-id", newDoc.get("current-snapshot-id").asLong())
        m.put("type", "branch")
        newRefs0 + ("main" -> m)
      }
    val mainMoved = oldMainSnapshot(oldDoc) !=
      Option(newDoc.get("current-snapshot-id")).filterNot(_.isNull)
        .map(_.asLong()).filter(_ != -1L)
    newRefs.foreach { case (name, node) =>
      if (!oldRefs.get(name).contains(node) ||
        (name == "main" && mainMoved)) {
        val u = updates.addObject()
        u.put("action", "set-snapshot-ref")
        u.put("ref-name", name)
        u.put("snapshot-id",
          if (name == "main" && mainMoved)
            newDoc.get("current-snapshot-id").asLong()
          else node.get("snapshot-id").asLong())
        u.put("type", node.path("type").asText("branch"))
      }
    }
    (oldRefs.keySet -- newRefs.keySet).toSeq.sorted.foreach { name =>
      val u = updates.addObject()
      u.put("action", "remove-snapshot-ref")
      u.put("ref-name", name)
    }
    // statistics
    handled += "statistics"
    val oldStats = byKey(oldDoc, "statistics", "snapshot-id")
    val newStats = byKey(newDoc, "statistics", "snapshot-id")
    (oldStats.keySet -- newStats.keySet).toSeq.sorted.foreach { id =>
      val u = updates.addObject()
      u.put("action", "remove-statistics")
      u.put("snapshot-id", id)
    }
    newStats.toSeq.sortBy(_._1).foreach { case (id, s) =>
      if (!oldStats.get(id).contains(s)) {
        val u = updates.addObject()
        u.put("action", "set-statistics")
        u.put("snapshot-id", id)
        u.set[JsonNode]("statistics", s)
      }
    }
    // properties
    handled += "properties"
    def propsOf(doc: JsonNode): Map[String, String] =
      Option(doc.get("properties")).filterNot(_.isNull).toSeq
        .flatMap(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText())).toMap
    val oldProps = propsOf(oldDoc)
    val newProps = propsOf(newDoc)
    val setProps = newProps.filterNot { case (k, v) =>
      oldProps.get(k).contains(v) }
    if (setProps.nonEmpty) {
      val u = updates.addObject()
      u.put("action", "set-properties")
      val m = u.putObject("updates")
      setProps.toSeq.sortBy(_._1).foreach { case (k, v) => m.put(k, v) }
    }
    val gone = oldProps.keySet -- newProps.keySet
    if (gone.nonEmpty) {
      val u = updates.addObject()
      u.put("action", "remove-properties")
      val a = u.putArray("removals")
      gone.toSeq.sorted.foreach(a.add)
    }
    // anything else that differs is inexpressible — refuse loudly
    val allFields = (oldDoc.asInstanceOf[ObjectNode].properties().asScala
      .map(_.getKey) ++
      newDoc.asInstanceOf[ObjectNode].properties().asScala
        .map(_.getKey)).toSet
    (allFields -- handled).foreach { f =>
      require(Option(oldDoc.get(f)) == Option(newDoc.get(f)),
        s"rest-catalog: metadata field '$f' changed but has no " +
          "update representation in the REST commit vocabulary — " +
          "refusing to publish a partial commit")
    }
    updates
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
