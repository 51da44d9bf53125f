package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The Hadoop-`FileSystem` store bindings ([[HadoopLogStore]] /
  * [[HadoopDataStore]]): the FULL VersionedTable lifecycle — commits,
  * partitioned commits, bloom sidecars, WAP branch publish, MOR
  * delete + REORG, vacuum, fsck, datasource scans — must run with
  * BOTH seams routed through `org.apache.hadoop.fs.FileSystem`
  * (rename-free relocation, conditional-put via create-no-overwrite).
  * This is the `file:///` leg of the object-store story: an `s3a://`
  * root binds the same two registrations with zero graft changes. */
class HadoopStoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("full VersionedTable lifecycle through the Hadoop stores") {
    val root = java.nio.file.Files.createTempDirectory("graft_hfs_").toString
    val conf = spark.sparkContext.hadoopConfiguration
    VersionedTable.registerLogStore(root, new HadoopLogStore(conf))
    VersionedTable.registerDataStore(root, new HadoopDataStore(conf))
    try {
      VersionedTable.commit(
        spark.range(0, 8).toDF("k").withColumn("v", col("k") * 10)
          .coalesce(1), root)                                        // v0
      VersionedTable.commit(
        spark.range(8, 16).toDF("k").withColumn("v", col("k") * 10),
        root, partitionBy =
          Some(PartitionTransform.Bucket(2, "k")))                   // v1
      VersionedTable.buildBloomIndex(spark, root, "k")               // v2
      // WAP: stage on a branch, publish relocates through the store
      VersionedTable.createBranch(root, "wap")
      val bp = VersionedTable.branchRoot(root, "wap")
      VersionedTable.commit(
        spark.range(16, 24).toDF("k").withColumn("v", col("k") * 10)
          .coalesce(1), bp)
      val vPub = VersionedTable.publishBranch(spark, root, "wap")
      assert(vPub > 0)
      assert(VersionedTable.read(spark, root).count() === 24)
      // time travel works while v0 is still retained
      assert(spark.read.format("graft").option("versionAsOf", 0)
        .load(root).count() === 8)
      // MOR delete + purge + vacuum
      VersionedTable.deleteKeysMOR(spark, root, "k", Seq(3L).toDF("k"))
      val vPurge = VersionedTable.purgeTombstones(spark, root)
      VersionedTable.vacuum(root, retain = vPurge, minAgeMs = 0L)
      assert(VersionedTable.fsck(root).ok)
      assert(VersionedTable.read(spark, root)
        .agg(sum("v")).as[Long].head() ===
        (0 until 24).filter(_ != 3).map(_ * 10).sum)
      // datasource scan + bloom probe post-vacuum
      assert(spark.read.format("graft").load(root)
        .filter(col("k") === 9).count() === 1)
      // commit-race loser gets the conditional-put exception
      val v = VersionedTable.latestVersion(root)
      val manifest = java.nio.file.Paths.get(root, "_graft_log",
        f"v$v%05d.txt")
      val store = new HadoopLogStore(conf)
      assert(store.exists(manifest))
      intercept[java.nio.file.FileAlreadyExistsException] {
        store.putIfAbsent(manifest, "loser".getBytes)
      }
    } finally {
      VersionedTable.unregisterLogStore(root)
      VersionedTable.unregisterDataStore(root)
    }
  }

  test("path bridging repairs nio's collapsed scheme slashes") {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = java.nio.file.Paths.get("s3a://bucket/table/_graft_log")
    assert(HadoopStores.toHPath(p) ===
      new HPath("s3a://bucket/table/_graft_log"))
    assert(HadoopStores.toHPath(java.nio.file.Paths.get("/tmp/x")) ===
      new HPath("/tmp/x"))
    // round trip through toNioPath
    assert(HadoopStores.toHPath(HadoopStores.toNioPath(
      new HPath("s3a://b/k/f.parquet"))) ===
      new HPath("s3a://b/k/f.parquet"))
    assert(HadoopStores.toNioPath(new HPath("file:/tmp/y")) ===
      java.nio.file.Paths.get("/tmp/y"))
  }
}
