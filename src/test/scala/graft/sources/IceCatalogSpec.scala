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

  /** In-process REST catalog stub (JDK HttpServer): tables keyed by
    * the client's opaque token, state = (metadata-location, document)
    * guarded by a lock so the CAS is real — a stale
    * `assert-metadata-location` requirement answers 409. */
  private def withRestCatalog[A](f: (String, RestIceCatalog) => A): A = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
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
          case ("POST", Some(t)) => // commitTable with requirements
            val n = mapper.readTree(x.getRequestBody.readAllBytes())
            val want = n.get("requirements").elements().next()
            require(want.get("type").asText() == "assert-metadata-location")
            tables.get(t) match {
              case Some((loc, _))
                  if loc == want.get("metadata-location").asText() =>
                tables(t) = (n.get("metadata-location").asText(),
                  mapper.writeValueAsBytes(n.get("metadata")))
                respond(x, 200, Array.emptyByteArray)
              case _ => respond(x, 409, Array.emptyByteArray) // CAS loser
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

  test("REST binding: CAS race has exactly one winner (HTTP 409)") {
    withRestCatalog { (root, cat) =>
      IcebergMeta.writeFixture(spark.range(0, 4).toDF("k"), root)
      val (v, bytes) = cat.currentMetadata(root)
      // two writers race the same base through real HTTP
      cat.commit(root, v, bytes)
      val e = intercept[VersionedTable.ConcurrentCommitException] {
        cat.commit(root, v, bytes)
      }
      assert(e.getMessage.contains((v + 1).toString))
      // create of an existing table answers 409 too, surfaced as the
      // same one-winner exception
      intercept[VersionedTable.ConcurrentCommitException] {
        cat.create(root, bytes)
      }
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
