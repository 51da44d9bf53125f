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
