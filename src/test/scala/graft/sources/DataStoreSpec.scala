package graft.sources

import graft.SparkSpecBase
import java.nio.file.Path
import org.apache.spark.sql.functions._

/** The data-storage seam ([[DataStore]]): the whole MAINTENANCE
  * surface — partitioned commits, bloom sidecars, WAP branch
  * create/publish, merge-on-read + REORG PURGE, vacuum, fsck,
  * DESCRIBE DETAIL — must run against a deliberately RENAME-FREE
  * store (per-file copy + delete, the object-store shape), with the
  * log simultaneously on the conditional-put-only [[LogStore]]. A
  * recording wrapper proves the operations actually flow through the
  * seam (relocations, tree deletes, sidecar writes observed), i.e.
  * "object-store mode" is a registration, not a fork of the engine. */
class DataStoreSpec extends SparkSpecBase {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  /** [[CopyingDataStore]] that records every mutation it performs. */
  private class RecordingDataStore extends DataStore {
    val relocates = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val treeDeletes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val writes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val inner = CopyingDataStore
    override def exists(path: Path): Boolean = inner.exists(path)
    override def isDir(path: Path): Boolean = inner.isDir(path)
    override def size(path: Path): Long = inner.size(path)
    override def mtimeMs(path: Path): Long = inner.mtimeMs(path)
    override def listDir(dir: Path): Seq[String] = inner.listDir(dir)
    override def listFilesRecursive(dir: Path): Seq[Path] =
      inner.listFilesRecursive(dir)
    override def readBytes(path: Path): Array[Byte] = inner.readBytes(path)
    override def write(path: Path, bytes: Array[Byte]): Unit = {
      inner.write(path, bytes); writes.add(path.toString)
    }
    override def deleteTree(dir: Path): Unit = {
      inner.deleteTree(dir); treeDeletes.add(dir.toString)
    }
    override def relocateDir(src: Path, dst: Path): Unit = {
      inner.relocateDir(src, dst); relocates.add(s"$src -> $dst")
    }
  }

  private def withStores[A](f: (String, RecordingDataStore) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_ds2_").toString
    val store = new RecordingDataStore
    VersionedTable.registerDataStore(root, store)
    VersionedTable.registerLogStore(root, ConditionalPutLogStore)
    try f(root, store)
    finally {
      VersionedTable.unregisterDataStore(root)
      VersionedTable.unregisterLogStore(root)
    }
  }

  test("maintenance surface runs rename-free through the data seam") {
    withStores { (root, store) =>
      // plain + hidden-partitioned commits
      VersionedTable.commit(
        spark.range(0, 8).toDF("k").withColumn("v", col("k") * 10)
          .coalesce(1), root)                                        // v0
      VersionedTable.commit(
        spark.range(8, 16).toDF("k").withColumn("v", col("k") * 10),
        root, partitionBy =
          Some(PartitionTransform.Bucket(2, "k")))                   // v1
      // bloom sidecars land through the seam
      VersionedTable.buildBloomIndex(spark, root, "k")               // v2
      assert(store.writes.asScala.exists(_.contains("bloomidx")))
      // WAP: stage on a branch, publish = seam RELOCATION (copy+delete
      // here — no rename anywhere), squash manifest lands after
      VersionedTable.createBranch(root, "wap")
      val bp = VersionedTable.branchRoot(root, "wap")
      VersionedTable.commit(
        spark.range(16, 24).toDF("k").withColumn("v", col("k") * 10)
          .coalesce(1), bp)
      val vPub = VersionedTable.publishBranch(spark, root, "wap")
      assert(store.relocates.size() >= 1,
        "branch publish must relocate data dirs through the seam")
      assert(store.treeDeletes.asScala.exists(_.contains("_graft_branches")),
        "consumed branch dir must delete through the seam")
      assert(VersionedTable.read(spark, root).count() === 24)
      // merge-on-read delete + REORG PURGE (rewrite only dirty files)
      VersionedTable.deleteKeysMOR(spark, root, "k", Seq(3L).toDF("k"))
      val vPurge = VersionedTable.purgeTombstones(spark, root)
      assert(VersionedTable.read(spark, root).count() === 23)
      // vacuum reclaims the pre-purge dirs through the seam
      val dels0 = store.treeDeletes.size()
      VersionedTable.vacuum(root, retain = vPurge, minAgeMs = 0L)
      assert(store.treeDeletes.size() > dels0,
        "vacuum must delete through the seam")
      // physical state still consistent; reads exact; detail works
      assert(VersionedTable.fsck(root).ok)
      val now = VersionedTable.read(spark, root)
      assert(now.agg(sum("v")).as[Long].head() ===
        (0 until 24).filter(_ != 3).map(_ * 10).sum)
      assert(VersionedTable.detail(root).numFiles ===
        VersionedTable.snapshotFiles(root, VersionedTable.latestVersion(root)).size)
      // the scan path (datasource + bloom probe) also stays seam-clean
      assert(spark.read.format("graft").load(root)
        .filter(col("k") === 9).count() === 1)
      assert(vPub > 0)
    }
  }
}
