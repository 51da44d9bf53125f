package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The Iceberg CATALOG seam ([[IceCatalog]]): the representative
  * protocol surface (create, append, positional + DV delete, ref ops,
  * spec evolution) must resolve its commit BASE and publish every
  * current-pointer mutation THROUGH the interface — a recording
  * wrapper proves no code path touches `v{N}.metadata.json` behind
  * the seam's back (the [[LogStoreSpec]] shape), which is exactly
  * what makes a REST-catalog binding a drop-in client. */
class IceCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  /** [[FsIceCatalog]] with every call recorded. */
  private class RecordingCatalog extends IceCatalog {
    val creates = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val commits = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    @volatile var reads = 0
    @volatile var probes = 0
    private val inner = FsIceCatalog
    override def tableExists(root: String): Boolean = inner.tableExists(root)
    override def currentVersion(root: String): Int = {
      probes += 1; inner.currentVersion(root)
    }
    override def currentMetadata(root: String): (Int, Array[Byte]) = {
      reads += 1; inner.currentMetadata(root)
    }
    override def create(root: String, metadata: Array[Byte]): Unit = {
      inner.create(root, metadata); creates.add(root)
    }
    override def commit(root: String, expectedVersion: Int,
        metadata: Array[Byte]): Unit = {
      inner.commit(root, expectedVersion, metadata)
      commits.add(expectedVersion + 1)
    }
  }

  private def withCatalog[A](f: (String, RecordingCatalog) => A): A = {
    val root = Files.createTempDirectory("ice_cat_").toString + "/t"
    val cat = new RecordingCatalog
    IceCatalog.register(root, cat)
    try f(root, cat)
    finally IceCatalog.unregister(root)
  }

  private def versionsOnDisk(root: String): Set[Int] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(root, "metadata"))
    try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toInt }
      .toSet
    finally s.close()
  }

  test("every pointer mutation of the protocol surface flows through the seam") {
    withCatalog { (root, cat) =>
      IcebergMeta.writeFixture(
        spark.range(0, 20).toDF("k").withColumn("v", col("k") * 2)
          .repartitionByRange(2, col("k")), root)
      assert(cat.creates.contains(root))
      IcebergMeta.append(
        spark.range(20, 30).toDF("k").withColumn("v", col("k") * 2)
          .coalesce(1), root)                         // -> v2
      IcebergMeta.delete(spark, root, col("k") === 5) // -> v3
      IcebergMeta.setRef(root, "audit", "tag")        // -> v4
      IcebergMeta.evolveSpec(root, Seq("k" -> "bucket[4]")) // -> v5
      assert(cat.commits.asScala.toSet === Set(2, 3, 4, 5))
      assert(versionsOnDisk(root) === Set(1, 2, 3, 4, 5),
        "a metadata version appeared on disk without a seam commit")
      assert(cat.reads > 0, "commit bases must resolve through the seam")
      // the read path's freshness probe is the cheap call, and the
      // result is right
      val before = cat.probes
      val df = spark.read.format("iceberg-meta").load(root)
      assert(df.count() === 29)
      assert(cat.probes > before)
    }
  }

  test("v3 DV deletes commit through the seam too") {
    withCatalog { (root, cat) =>
      IcebergMeta.writeFixture(
        spark.range(0, 12).toDF("k").coalesce(1), root, formatVersion = 3)
      IcebergMeta.delete(spark, root, col("k") % 3 === 0) // -> v2 (DV)
      assert(cat.commits.asScala.toSet === Set(2))
      assert(IcebergMeta.snapshot(root).dvs.nonEmpty)
      assert(spark.read.format("iceberg-meta").load(root).count() === 8)
    }
  }

  test("stale-base commit gets the CAS exception; create refuses an existing table") {
    withCatalog { (root, cat) =>
      IcebergMeta.writeFixture(spark.range(0, 4).toDF("k"), root)
      val (v, bytes) = cat.currentMetadata(root)
      cat.commit(root, v, bytes) // legitimate successor
      intercept[VersionedTable.ConcurrentCommitException] {
        cat.commit(root, v, bytes) // same base again → loser
      }
      intercept[IllegalArgumentException] {
        cat.create(root, bytes)
      }
    }
  }

  /** In-process REST catalog stub (JDK HttpServer) implementing the
    * OpenAPI commit contract FOR REAL: the commit body is VALIDATED
    * (known requirement/update shapes only — anything else is a 400)
    * and the update list is APPLIED server-side to the stored
    * document, with the server maintaining the derived fields
    * (metadata-location version, last-updated-ms,
    * last-sequence-number, snapshot-log, current-snapshot-id from the
    * main ref, next-row-id from add-snapshot's first-row-id +
    * added-records). `assert-table-uuid` / `assert-ref-snapshot-id`
    * failures answer 409 — the spec's optimistic lock. */
  private def withRestCatalog[A](f: (String, RestIceCatalog) => A): A = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tables =
      scala.collection.mutable.Map.empty[String, (String, Array[Byte])]
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) x.getResponseBody.write(body)
      x.close()
    }
    def mainOf(doc: JsonNode): Option[Long] =
      Option(doc.get("refs")).filterNot(_.isNull)
        .flatMap(r => Option(r.get("main"))).filterNot(_.isNull)
        .map(_.get("snapshot-id").asLong())
        .orElse(Option(doc.get("current-snapshot-id"))
          .filterNot(_.isNull).map(_.asLong()).filter(_ != -1L))
    def checkRequirements(doc: JsonNode, reqs: JsonNode): Boolean =
      reqs.elements().asScala.forall { r =>
        r.get("type").asText() match {
          case "assert-table-uuid" =>
            doc.path("table-uuid").asText() == r.get("uuid").asText()
          case "assert-ref-snapshot-id" =>
            require(r.get("ref").asText() == "main",
              s"stub: unexpected ref ${r.get("ref")}")
            val want = Option(r.get("snapshot-id")).filterNot(_.isNull)
              .map(_.asLong())
            mainOf(doc) == want
          case "assert-current-schema-id" =>
            doc.path("current-schema-id").asInt() ==
              r.get("current-schema-id").asInt()
          case "assert-last-assigned-field-id" =>
            doc.path("last-column-id").asInt() ==
              r.get("last-assigned-field-id").asInt()
          case "assert-default-spec-id" =>
            doc.path("default-spec-id").asInt() ==
              r.get("default-spec-id").asInt()
          case "assert-default-sort-order-id" =>
            doc.path("default-sort-order-id").asInt() ==
              r.get("default-sort-order-id").asInt()
          case other =>
            throw new IllegalArgumentException(
              s"stub: unknown requirement type $other")
        }
      }
    def applyUpdates(doc0: ObjectNode, updates: JsonNode): ObjectNode = {
      val doc = doc0.deepCopy()
      updates.elements().asScala.foreach { u =>
        u.get("action").asText() match {
          case "upgrade-format-version" =>
            doc.put("format-version", u.get("format-version").asInt())
          case "add-schema" =>
            doc.withArray[ArrayNode]("schemas")
              .add(u.get("schema"))
            Option(u.get("last-column-id")).filterNot(_.isNull)
              .foreach(id => doc.put("last-column-id", id.asInt()))
          case "set-current-schema" =>
            doc.put("current-schema-id", u.get("schema-id").asInt())
          case "add-spec" =>
            val spec = u.get("spec")
            doc.withArray[ArrayNode]("partition-specs").add(spec)
            // the server owns last-partition-id (derived, like
            // last-sequence-number from add-snapshot)
            val maxField = spec.path("fields").elements().asScala
              .map(_.path("field-id").asInt(999)).maxOption.getOrElse(999)
            if (maxField > doc.path("last-partition-id").asInt(999))
              doc.put("last-partition-id", maxField)
          case "set-default-spec" =>
            doc.put("default-spec-id", u.get("spec-id").asInt())
          case "add-sort-order" =>
            doc.withArray[ArrayNode]("sort-orders")
              .add(u.get("sort-order"))
          case "set-default-sort-order" =>
            doc.put("default-sort-order-id",
              u.get("sort-order-id").asInt())
          case "add-snapshot" =>
            val s = u.get("snapshot")
            doc.withArray[ArrayNode]("snapshots").add(s)
            val seq = s.path("sequence-number").asLong(0L)
            if (seq > doc.path("last-sequence-number").asLong(0L))
              doc.put("last-sequence-number", seq)
            // v3 row lineage: the server owns the high-water mark
            if (doc.hasNonNull("next-row-id") &&
                s.hasNonNull("first-row-id")) {
              val mark = s.get("first-row-id").asLong() +
                s.path("summary").path("added-records").asText("0").toLong
              if (mark > doc.get("next-row-id").asLong())
                doc.put("next-row-id", mark)
            }
          case "remove-snapshots" =>
            val gone = u.get("snapshot-ids").elements().asScala
              .map(_.asLong()).toSet
            def prune(field: String, key: String): Unit =
              if (doc.hasNonNull(field)) {
                val kept = doc.get(field).elements().asScala
                  .filterNot(n => gone(n.get(key).asLong())).toSeq
                val arr = doc.putArray(field)
                kept.foreach(arr.add)
              }
            prune("snapshots", "snapshot-id")
            prune("snapshot-log", "snapshot-id")
          case "set-snapshot-ref" =>
            val name = u.get("ref-name").asText()
            val refs =
              if (doc.hasNonNull("refs"))
                doc.get("refs").asInstanceOf[ObjectNode]
              else doc.putObject("refs")
            val r = mapper.createObjectNode()
            r.put("snapshot-id", u.get("snapshot-id").asLong())
            r.put("type", u.path("type").asText("branch"))
            refs.set[JsonNode](name, r)
            if (name == "main") {
              val sid = u.get("snapshot-id").asLong()
              doc.put("current-snapshot-id", sid)
              // the spec's record of the main-pointer move; a
              // snapshot added IN THIS COMMIT logs at its own commit
              // instant, a rollback to an old one logs at now
              val ts = doc.get("snapshots").elements().asScala
                .find(s => s.get("snapshot-id").asLong() == sid &&
                  updates.elements().asScala.exists(v =>
                    v.get("action").asText() == "add-snapshot" &&
                      v.get("snapshot").get("snapshot-id").asLong() == sid))
                .map(_.get("timestamp-ms").asLong())
                .getOrElse(System.currentTimeMillis())
              val e = doc.withArray[ArrayNode]("snapshot-log").addObject()
              e.put("timestamp-ms", ts)
              e.put("snapshot-id", sid)
            }
          case "remove-snapshot-ref" =>
            if (doc.hasNonNull("refs"))
              doc.get("refs").asInstanceOf[ObjectNode]
                .remove(u.get("ref-name").asText())
          case "set-statistics" =>
            val sid = u.get("snapshot-id").asLong()
            val kept =
              if (!doc.hasNonNull("statistics")) Nil
              else doc.get("statistics").elements().asScala
                .filterNot(_.get("snapshot-id").asLong() == sid).toSeq
            val arr = doc.putArray("statistics")
            kept.foreach(arr.add)
            arr.add(u.get("statistics"))
          case "remove-statistics" =>
            if (doc.hasNonNull("statistics")) {
              val sid = u.get("snapshot-id").asLong()
              val kept = doc.get("statistics").elements().asScala
                .filterNot(_.get("snapshot-id").asLong() == sid).toSeq
              val arr = doc.putArray("statistics")
              kept.foreach(arr.add)
            }
          case "set-properties" =>
            val props =
              if (doc.hasNonNull("properties"))
                doc.get("properties").asInstanceOf[ObjectNode]
              else doc.putObject("properties")
            u.get("updates").properties().asScala
              .foreach(e => props.set[JsonNode](e.getKey, e.getValue))
          case "remove-properties" =>
            if (doc.hasNonNull("properties")) {
              val props = doc.get("properties").asInstanceOf[ObjectNode]
              u.get("removals").elements().asScala
                .foreach(n => props.remove(n.asText()))
            }
          case other => throw new IllegalArgumentException(
            s"stub: unknown update action $other")
        }
      }
      doc.put("last-updated-ms", System.currentTimeMillis())
      doc
    }
    server.createContext("/v1/", (x: HttpExchange) => {
      val parts = x.getRequestURI.getPath.split('/').filter(_.nonEmpty)
      // /v1/{prefix}/namespaces/{ns}/tables[/{token}]
      val ok = parts.length >= 5 && parts(0) == "v1" &&
        parts(2) == "namespaces" && parts(4) == "tables"
      if (!ok) respond(x, 400, Array.emptyByteArray)
      else tables.synchronized {
        (x.getRequestMethod, parts.lift(5)) match {
          case ("GET", Some(t)) => tables.get(t) match {
            case None => respond(x, 404, Array.emptyByteArray)
            case Some((loc, doc)) =>
              val out = mapper.createObjectNode()
              out.put("metadata-location", loc)
              out.set[com.fasterxml.jackson.databind.JsonNode](
                "metadata", mapper.readTree(doc))
              respond(x, 200, mapper.writeValueAsBytes(out))
          }
          case ("POST", None) => // createTable
            val n = mapper.readTree(x.getRequestBody.readAllBytes())
            val t = n.get("name").asText()
            if (tables.contains(t)) respond(x, 409, Array.emptyByteArray)
            else {
              tables(t) = (n.get("metadata-location").asText(),
                mapper.writeValueAsBytes(n.get("metadata")))
              respond(x, 200, Array.emptyByteArray)
            }
          case ("POST", Some(t)) => // commitTable: requirements+updates
            try {
              val n = mapper.readTree(x.getRequestBody.readAllBytes())
              require(n.hasNonNull("requirements") &&
                n.hasNonNull("updates"),
                "stub: commit body must carry requirements + updates")
              tables.get(t) match {
                case None => respond(x, 404, Array.emptyByteArray)
                case Some((loc, bytes)) =>
                  val doc = mapper.readTree(bytes)
                  if (!checkRequirements(doc, n.get("requirements")))
                    respond(x, 409, Array.emptyByteArray) // CAS loser
                  else {
                    val next = applyUpdates(
                      doc.asInstanceOf[ObjectNode], n.get("updates"))
                    val v = loc.split('/').last.stripPrefix("v")
                      .stripSuffix(".metadata.json").toInt
                    tables(t) = (s"v${v + 1}.metadata.json",
                      mapper.writeValueAsBytes(next))
                    respond(x, 200, Array.emptyByteArray)
                  }
              }
            } catch {
              case e: IllegalArgumentException =>
                respond(x, 400, e.getMessage.getBytes("UTF-8"))
            }
          case _ => respond(x, 405, Array.emptyByteArray)
        }
      }
    })
    server.start()
    val root = Files.createTempDirectory("ice_rest_").toString + "/t"
    val cat = new RestIceCatalog(
      s"http://127.0.0.1:${server.getAddress.getPort}")
    IceCatalog.register(root, cat)
    try f(root, cat)
    finally {
      IceCatalog.unregister(root)
      server.stop(0)
    }
  }

  test("REST binding: pointer lives server-side, DML round-trips over HTTP") {
    withRestCatalog { (root, cat) =>
      IcebergMeta.writeFixture(
        spark.range(0, 12).toDF("k").withColumn("v", col("k") * 3)
          .coalesce(1), root, formatVersion = 3)
      IcebergMeta.append(
        spark.range(12, 16).toDF("k").withColumn("v", col("k") * 3)
          .coalesce(1), root)
      IcebergMeta.delete(spark, root, col("k") % 4 === 1) // v3 DV
      // reads resolve the pointer over HTTP; data stays filesystem
      val r = spark.read.format("iceberg-meta").load(root)
      assert(r.count() === 12)
      assert(r.agg(sum("v")).as[Long].head() ===
        (0 until 16).filterNot(_ % 4 == 1).map(_ * 3L).sum)
      assert(cat.currentVersion(root) === 3)
      // the metadata DOCUMENT never touched the filesystem — the
      // stub owns the pointer (manifests/data files are content-
      // addressed and stay on disk)
      assert(!Files.exists(Paths.get(root, "metadata/v1.metadata.json")))
      assert(!Files.exists(Paths.get(root, "metadata/version-hint.text")))
    }
  }

  test("REST binding: the full update vocabulary round-trips server-side") {
    withRestCatalog { (root, cat) =>
      IcebergMeta.writeFixture(
        spark.range(0, 10).toDF("k").coalesce(1), root,
        formatVersion = 3)
      IcebergMeta.append(spark.range(10, 14).toDF("k").coalesce(1),
        root)                                    // add-snapshot + main
      IcebergMeta.setRef(root, "audit", "tag")   // set-snapshot-ref
      IcebergMeta.writeStatistics(spark, root, exact = true)
      //                                         // set-statistics
      val preRollback = IcebergMeta.snapshotLog(root).head.snapshotId
      IcebergMeta.rollbackTo(root, preRollback)  // main moves BACK
      assert(spark.read.format("iceberg-meta").load(root).count() === 10)
      IcebergMeta.rollbackTo(root,
        IcebergMeta.refSnapshotId(root, "audit")) // forward again
      // v3 row lineage survived the server-side derivation: appends
      // continue past the server-maintained next-row-id
      IcebergMeta.append(spark.range(14, 16).toDF("k").coalesce(1),
        root)
      val ids = IcebergMetaRead.readWithRowIds(spark, root)
        .select("k", "_row_id").as[(Long, Long)].collect().toMap
      assert(ids(14L) === 14L && ids(15L) === 15L)
      // statistics visible through the REST-resolved document
      assert(IcebergMeta.columnNdv(root).get("k").exists(_ >= 10L))
      // dropping the tag expresses as remove-snapshot-ref
      IcebergMeta.dropRef(root, "audit")
      assert(!IcebergMeta.refs(root).contains("audit"))
      assert(spark.read.format("iceberg-meta").load(root).count() === 16)
      // SCHEMA evolution expresses as add-schema/set-current-schema
      // (with assert-current-schema-id + assert-last-assigned-field-id)
      IcebergMeta.addColumnWithDefault(root, "tag",
        org.apache.spark.sql.types.StringType, "x")
      assert(spark.read.format("iceberg-meta").load(root)
        .filter(col("tag") === "x").count() === 16)
      // SORT ORDER declaration expresses as add-sort-order +
      // set-default-sort-order (with assert-default-sort-order-id)
      assert(IcebergMeta.setSortOrder(root, Seq("k" -> "asc")) === 1)
      // SPEC evolution expresses as add-spec/set-default-spec; the
      // server derives last-partition-id — a post-evolution
      // partitioned append must still work against the REST document
      IcebergMeta.evolveSpec(root, Seq("k" -> "bucket[4]"))
      IcebergMeta.append(
        Seq((100L, "y"), (101L, "z")).toDF("k", "tag").coalesce(1),
        root)
      assert(spark.read.format("iceberg-meta").load(root).count() === 18)
      assert(spark.read.format("iceberg-meta").load(root)
        .filter(col("tag") === "y").count() === 1)
    }
  }

  test("REST binding: CAS race has exactly one winner (HTTP 409)") {
    withRestCatalog { (root, cat) =>
      IcebergMeta.writeFixture(spark.range(0, 4).toDF("k"), root)
      val (v, bytes) = cat.currentMetadata(root)
      // two writers race the same base: the winner commits, the loser
      // fails the freshness check against the moved pointer
      cat.commit(root, v, bytes)
      val e = intercept[VersionedTable.ConcurrentCommitException] {
        cat.commit(root, v, bytes)
      }
      assert(e.getMessage.contains((v + 1).toString))
      // the SERVER-side optimistic lock, proven through raw HTTP: a
      // commit whose assert-ref-snapshot-id names a stale snapshot
      // answers 409 even when it skips the client's freshness check
      val http = java.net.http.HttpClient.newHttpClient()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val token = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(root.getBytes("UTF-8"))
      def post(body: String): Int = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"${cat.baseUri}/v1/graft/namespaces/default/tables/$token"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      val uuid = mapper.readTree(cat.currentMetadata(root)._2)
        .get("table-uuid").asText()
      assert(post(
        s"""{"requirements":[
           |{"type":"assert-table-uuid","uuid":"$uuid"},
           |{"type":"assert-ref-snapshot-id","ref":"main",
           | "snapshot-id":12345}],
           |"updates":[]}""".stripMargin) === 409)
      // malformed update lists are REJECTED (shape validation), not
      // silently stored
      assert(post(
        s"""{"requirements":[
           |{"type":"assert-table-uuid","uuid":"$uuid"}],
           |"updates":[{"action":"no-such-update"}]}""".stripMargin)
        === 400)
      // create of an existing table answers 409 too, surfaced as the
      // same one-winner exception
      intercept[VersionedTable.ConcurrentCommitException] {
        cat.create(root, bytes)
      }
    }
  }

  test("REST binding: a pruned schema/spec entry refuses loudly, nothing publishes") {
    import scala.jdk.CollectionConverters._
    withRestCatalog { (root, cat) =>
      IcebergMeta.writeFixture(spark.range(0, 4).toDF("k"), root,
        formatVersion = 3)
      IcebergMeta.addColumnWithDefault(root, "tag",
        org.apache.spark.sql.types.StringType, "x") // schemas: 0 and 1
      IcebergMeta.evolveSpec(root, Seq("k" -> "bucket[4]")) // specs: 0, 1
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def pruned(field: String, key: String): Array[Byte] = {
        val doc = mapper.readTree(cat.currentMetadata(root)._2)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val arr = doc.withArray[
          com.fasterxml.jackson.databind.node.ArrayNode](field)
        val kept = arr.elements().asScala.toSeq
          .filter(_.get(key).asInt() != 0)
        val out = doc.putArray(field)
        kept.foreach(out.add)
        mapper.writeValueAsBytes(doc)
      }
      // the REST vocabulary has no remove-schema / remove-spec: a
      // successor that PRUNED one must throw, not publish only the
      // expressible half of the diff
      val v = cat.currentVersion(root)
      val e1 = intercept[IllegalArgumentException] {
        cat.commit(root, v, pruned("schemas", "schema-id"))
      }
      assert(e1.getMessage.contains("no update representation"))
      val e2 = intercept[IllegalArgumentException] {
        cat.commit(root, v, pruned("partition-specs", "spec-id"))
      }
      assert(e2.getMessage.contains("no update representation"))
      // nothing landed: the pointer did not move
      assert(cat.currentVersion(root) === v)
    }
  }

  test("unregistered roots use the filesystem catalog unchanged") {
    val root = Files.createTempDirectory("ice_cat_d_").toString + "/t"
    IcebergMeta.writeFixture(spark.range(0, 6).toDF("k"), root)
    IcebergMeta.append(spark.range(6, 9).toDF("k").coalesce(1), root)
    assert(IcebergMeta.latestMetadataVersion(root) === 2)
    assert(spark.read.format("iceberg-meta").load(root).count() === 9)
  }

  private implicit class SetOps[T](
      s: java.util.concurrent.ConcurrentHashMap.KeySetView[T, _]) {
    def asScala: Iterable[T] = {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    }
  }
}
