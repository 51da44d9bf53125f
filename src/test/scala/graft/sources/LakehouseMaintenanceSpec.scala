package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Maintenance parity for the interop formats: Delta VACUUM (age- and
  * reference-guarded physical deletion, CDF files included, seam-routed
  * I/O) and Iceberg expire_snapshots (snapshot pruning + reachability-
  * based file deletion, conditional-put metadata commit). */
class LakehouseMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("lh_maint_").toString

  import scala.jdk.CollectionConverters._

  private def filesUnder(root: String): Set[String] = {
    val r = Paths.get(root)
    val s = Files.walk(r)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => r.relativize(p).toString).toSet
    finally s.close()
  }

  test("Delta VACUUM: unreferenced + aged files go, live table intact") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 8).toDF("k").coalesce(1), root)  // v0
    DeltaLog.commit(spark.range(8, 16).toDF("k").coalesce(1), root) // v1
    DeltaLog.deleteWhere(spark, root, col("k") % 2 === 0)           // v2 rewrite
    DeltaLog.compact(spark, root)                                   // v3 rewrite
    val live = DeltaLog.snapshot(spark, root)
    val liveRel = live.adds.map(_.path).toSet
    val all = filesUnder(root)
    val before = all.filter(_.endsWith(".parquet"))
    val logBefore = all.count(_.startsWith("_delta_log/"))
    assert(liveRel.subsetOf(before))
    assert(before.size > liveRel.size) // replaced files still on disk
    // retention guard: nothing young enough is deleted
    assert(DeltaLog.vacuum(spark, root, retainMs = 3600 * 1000L) === 0L)
    // retain 0: every unreferenced data file deletes; log untouched
    val n = DeltaLog.vacuum(spark, root, retainMs = 0L)
    assert(n === (before.size - liveRel.size))
    val after = filesUnder(root)
    assert(after.filter(_.endsWith(".parquet")) === liveRel)
    assert(after.count(_.startsWith("_delta_log/")) === logBefore)
    // current read unaffected
    assert(spark.read.format("delta-log").load(root)
      .agg(sum("k")).as[Long].head() ===
      (0L until 16L).filter(_ % 2 == 1).sum)
    // time travel to v0 now fails at scan time (files are GONE) —
    // vacuum's documented contract
    val e = intercept[Exception] {
      spark.read.format("delta-log").option("versionAsOf", "0")
        .load(root).count()
    }
    assert(e != null)
  }

  test("Delta VACUUM keeps live DV files, sweeps expired cdc files") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k").coalesce(1), root) // v0
    DeltaLog.setConfiguration(spark, root,
      Map("delta.enableChangeDataFeed" -> "true"))                  // v1
    DeltaLog.deleteWhere(spark, root, col("k") === 3)               // v2: cdc + rewrite
    // attach a DV to the rewritten file (drop position 0)
    val a = DeltaLog.snapshot(spark, root).adds.head
    val d = DeletionVectors.writeFile(root, Array(0L))
    Files.write(Paths.get(root, "_delta_log", f"${3L}%020d.json"),
      (s"""{"add":{"path":"${a.path}","partitionValues":{},"size":${a.size},"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(filesUnder(root).exists(_.startsWith("_change_data/")))
    DeltaLog.vacuum(spark, root, retainMs = 0L)
    val after = filesUnder(root)
    // live DV file survives (referenced by the current snapshot)
    assert(after.exists(_.endsWith(".bin")))
    // expired cdc files are swept — CDF range now bounded by retention
    assert(!after.exists(_.startsWith("_change_data/")))
    assert(spark.read.format("delta-log").load(root).count() === 8L)
  }

  test("Delta VACUUM routes every delete through the DataStore seam") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 6).toDF("k").coalesce(1), root)
    DeltaLog.deleteWhere(spark, root, col("k") === 1)
    val deleted = scala.collection.mutable.ListBuffer.empty[Path]
    val recording = new DataStore {
      private val inner = PosixDataStore
      override def exists(p: Path) = inner.exists(p)
      override def isDir(p: Path) = inner.isDir(p)
      override def size(p: Path) = inner.size(p)
      override def mtimeMs(p: Path) = inner.mtimeMs(p)
      override def listDir(d: Path) = inner.listDir(d)
      override def listFilesRecursive(d: Path) = inner.listFilesRecursive(d)
      override def readBytes(p: Path) = inner.readBytes(p)
      override def write(p: Path, b: Array[Byte]) = inner.write(p, b)
      override def deleteTree(d: Path) = inner.deleteTree(d)
      override def relocateDir(s: Path, d: Path) = inner.relocateDir(s, d)
      override def deleteFile(p: Path): Unit = {
        deleted += p; inner.deleteFile(p)
      }
    }
    VersionedTable.registerDataStore(root, recording)
    try {
      val n = DeltaLog.vacuum(spark, root, retainMs = 0L)
      assert(n === 1L)
      assert(deleted.size === 1)
    } finally VersionedTable.unregisterDataStore(root)
  }

  test("Iceberg expire_snapshots: history pruned, only-expired files deleted") {
    val root = tmp() + "/t"
    IcebergMeta.writeFixture(
      spark.range(0, 8).toDF("k").coalesce(1), root)            // snap 1
    IcebergMeta.append(
      spark.range(8, 16).toDF("k").coalesce(1), root)           // snap 2
    IcebergMeta.compact(spark, root)                            // snap 3 (replace)
    IcebergMeta.append(
      spark.range(16, 20).toDF("k").coalesce(1), root)          // snap 4
    val history = IcebergMeta.snapshotLog(root)
    assert(history.size === 4)
    val dataBefore = filesUnder(root).count(_.startsWith("data/"))
    // nothing is old enough → no-op
    assert(IcebergMeta.expireSnapshots(root, olderThanMs = 0L)
      .expiredSnapshots === 0)
    // expire everything except current + retainLast=1
    val r = IcebergMeta.expireSnapshots(root,
      olderThanMs = System.currentTimeMillis() + 3600 * 1000L,
      retainLast = 2)
    assert(r.expiredSnapshots === 2) // snaps 1 and 2 go
    assert(r.deletedManifestLists === 2)
    // the first two appends' ORIGINAL data files were compacted away
    // at snap 3, so they are only-expired references → physically gone
    assert(r.deletedFiles === 2)
    val dataAfter = filesUnder(root).count(_.startsWith("data/"))
    assert(dataAfter === dataBefore - 2)
    // history pruned; current still reads every row
    assert(IcebergMeta.snapshotLog(root).size === 2)
    assert(spark.read.format("iceberg-meta").load(root)
      .agg(sum("k")).as[Long].head() === (0L until 20L).sum)
    // time travel to an expired snapshot refuses
    val gone = history.head.snapshotId
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.snapshot(root, Some(gone))
    }
    assert(e.getMessage.contains("not in"))
    // a surviving older snapshot still time-travels: snap 3's files
    // are shared with snap 4's manifests, so they were kept
    val snap3 = IcebergMeta.snapshotLog(root).head.snapshotId
    assert(IcebergMeta.snapshot(root, Some(snap3)).files.nonEmpty)
  }

  test("SQL surfaces: GRAFT VACUUM DELTA and GRAFT EXPIRE SNAPSHOTS") {
    val droot = tmp()
    DeltaLog.commit(spark.range(0, 6).toDF("k").coalesce(1), droot)
    DeltaLog.deleteWhere(spark, droot, col("k") === 2)
    // young files survive the default retention; RETAIN 0 MS sweeps
    assert(spark.sql(s"GRAFT VACUUM DELTA '$droot'")
      .as[Long].head() === 0L)
    // DRY RUN counts without deleting
    assert(spark.sql(s"GRAFT VACUUM DELTA '$droot' RETAIN 0 MS DRY RUN")
      .as[Long].head() === 1L)
    assert(spark.sql(s"GRAFT VACUUM DELTA '$droot' RETAIN 0 MS DRY RUN")
      .as[Long].head() === 1L) // still there
    assert(spark.sql(s"GRAFT VACUUM DELTA '$droot' RETAIN 0 MS")
      .as[Long].head() === 1L)
    val iroot = tmp() + "/t"
    IcebergMeta.writeFixture(spark.range(0, 4).toDF("k").coalesce(1), iroot)
    IcebergMeta.compact(spark, iroot)
    val r = spark.sql(s"GRAFT EXPIRE SNAPSHOTS '$iroot' OLDER THAN ${
      System.currentTimeMillis() + 60000} RETAIN LAST 1")
      .as[(Int, Int, Int, Int)].head()
    assert(r === ((1, 1, 1, 1))) // snap 1 + its file/manifest/list
    assert(spark.read.format("iceberg-meta").load(iroot).count() === 4L)
  }

  test("Delta RESTORE: files, schema and DVs travel back; history lists it") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k").coalesce(1), root) // v0
    // v1: a deletion vector hides k=0 (dataChange-false re-add)
    val a = DeltaLog.snapshot(spark, root).adds.head
    val d = DeletionVectors.writeFile(root, Array(0L))
    Files.write(Paths.get(root, "_delta_log", f"${1L}%020d.json"),
      (s"""{"add":{"path":"${a.path}","partitionValues":{},"size":${a.size},"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    DeltaLog.commit(spark.range(100, 105).toDF("k").coalesce(1), root) // v2
    assert(spark.read.format("delta-log").load(root).count() === 14L)
    // restore to v1: the append leaves, the DV SURVIVES the re-add
    val rv = spark.sql(s"GRAFT RESTORE DELTA '$root' VERSION AS OF 1")
      .as[Long].head()
    assert(rv === 3L)
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.count() === 9L)
    assert(ds.filter(col("k") === 0).count() === 0L) // DV still applied
    // history lists the operations newest-first
    val hist = spark.sql(s"GRAFT HISTORY DELTA '$root'")
      .select("version", "operation").as[(Long, Option[String])]
      .collect().toSeq
    assert(hist.head === ((3L, Some("RESTORE"))))
    assert(hist.map(_._1) === Seq(3L, 2L, 1L, 0L))
    // restoring past vacuumed files refuses
    DeltaLog.vacuum(spark, root, retainMs = 0L) // v2's file now gone
    val e = intercept[IllegalArgumentException] {
      DeltaLog.restore(spark, root, 2L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("Delta SHALLOW CLONE: absolute-path refs, independent evolution") {
    val src = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k")
      .withColumn("p", col("k") % 2).repartition(col("p")),
      src, partitionBy = Seq("p"))
    // DV on one source file (u-storage → must re-anchor absolutely)
    val a = DeltaLog.snapshot(spark, src).adds.head
    val d = DeletionVectors.writeFile(src, Array(0L))
    Files.write(Paths.get(src, "_delta_log", f"${1L}%020d.json"),
      (s"""{"add":{"path":"${a.path}","partitionValues":{${
        a.partitionValues.map { case (k2, v2) => s""""$k2":"$v2"""" }
          .mkString(",")}},"size":${a.size},"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val srcCount = spark.read.format("delta-log").load(src).count()
    val dst = tmp() + "/clone"
    spark.sql(s"GRAFT CLONE DELTA '$src' TO '$dst'")
    val clone = spark.read.format("delta-log").load(dst)
    assert(clone.count() === srcCount) // DV applied through the clone
    // zero data files under the clone's root
    val r = Paths.get(dst)
    val walked = {
      val st = Files.walk(r)
      try st.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => r.relativize(p).toString).toSeq
      finally st.close()
    }
    assert(walked.forall(_.startsWith("_delta_log/")))
    // the clone evolves independently of the source
    DeltaLog.commit(spark.range(100, 103).toDF("k")
      .withColumn("p", col("k") % 2).repartition(col("p")),
      dst, partitionBy = Seq("p"))
    assert(spark.read.format("delta-log").load(dst).count() ===
      srcCount + 3)
    assert(spark.read.format("delta-log").load(src).count() === srcCount)
    // vacuuming the CLONE never touches the source's files (they are
    // outside its root)
    DeltaLog.vacuum(spark, dst, retainMs = 0L)
    assert(spark.read.format("delta-log").load(src).count() === srcCount)
    assert(spark.read.format("delta-log").load(dst).count() ===
      srcCount + 3)
  }

  test("Iceberg ROLLBACK: pointer moves in one metadata commit") {
    val root = tmp() + "/t"
    IcebergMeta.writeFixture(spark.range(0, 4).toDF("k").coalesce(1), root)
    val snap1 = IcebergMeta.snapshot(root).snapshotId
    IcebergMeta.append(spark.range(4, 9).toDF("k").coalesce(1), root)
    assert(spark.read.format("iceberg-meta").load(root).count() === 9L)
    // the snapshots listing (SQL)
    val snaps = spark.sql(s"GRAFT SNAPSHOTS ICEBERG '$root'")
      .select("sequence_number", "operation").as[(Long, String)]
      .collect().toSeq
    assert(snaps === Seq((1L, "append"), (2L, "append")))
    spark.sql(s"GRAFT ROLLBACK ICEBERG '$root' TO SNAPSHOT $snap1")
    assert(spark.read.format("iceberg-meta").load(root).count() === 4L)
    // the rolled-past snapshot is still time-travelable, and expire
    // keeps the (new) current pointer
    assert(IcebergMeta.snapshotLog(root).size === 2)
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.rollbackTo(root, 424242L)
    }
    assert(e.getMessage.contains("not in"))
    val r = IcebergMeta.expireSnapshots(root,
      olderThanMs = System.currentTimeMillis() + 60000, retainLast = 1)
    assert(r.expiredSnapshots === 1) // the rolled-past append expired
    assert(spark.read.format("iceberg-meta").load(root).count() === 4L)
  }

  test("Iceberg refs SQL: tag/branch create, refs listing, fast-forward, drop") {
    val root = tmp() + "/t"
    IcebergMeta.writeFixture(spark.range(0, 4).toDF("k").coalesce(1), root)
    spark.sql(s"GRAFT TAG ICEBERG '$root' CREATE v1")
    IcebergMeta.append(spark.range(4, 6).toDF("k").coalesce(1), root,
      toBranch = Some("audit"))
    val refs = spark.sql(s"GRAFT REFS ICEBERG '$root'")
      .select("ref", "type").as[(String, String)].collect().toMap
    assert(refs === Map("audit" -> "branch", "main" -> "branch",
      "v1" -> "tag"))
    // staged rows invisible at head; SQL fast-forward publishes
    assert(spark.read.format("iceberg-meta").load(root).count() === 4)
    spark.sql(s"GRAFT FAST FORWARD ICEBERG '$root' main TO audit")
    assert(spark.read.format("iceberg-meta").load(root).count() === 6)
    spark.sql(s"GRAFT TAG ICEBERG '$root' DROP v1")
    assert(!IcebergMeta.refs(root).contains("v1"))
    // SQL spec evolution: bucket the table, append under the new
    // spec, read across both generations
    val sid = spark.sql(
      s"GRAFT EVOLVE SPEC ICEBERG '$root' PARTITION BY bucket(2, k)")
      .as[Int].head()
    assert(sid === 1)
    IcebergMeta.append(spark.range(6, 10).toDF("k"), root)
    assert(spark.read.format("iceberg-meta").load(root).count() === 10)
    assert(IcebergMeta.snapshot(root).files.exists(_.specId == 1))
    assert(spark.sql(s"GRAFT EVOLVE SPEC ICEBERG '$root' UNPARTITIONED")
      .as[Int].head() === 2)
  }

  test("Iceberg expire keeps files a surviving manifest marks DELETED") {
    val root = tmp() + "/t"
    IcebergMeta.writeFixture(
      spark.range(0, 4).toDF("k").coalesce(1), root)            // snap 1
    IcebergMeta.append(
      spark.range(4, 8).toDF("k").coalesce(1), root)            // snap 2
    // snap 3: equality-delete + append (carries forward snap 2's
    // manifests, which still NAME snap 1/2's data files)
    IcebergMeta.upsertKeyed(spark, root,
      Seq(0L).toDF("k"), "k")
    val r = IcebergMeta.expireSnapshots(root,
      olderThanMs = System.currentTimeMillis() + 3600 * 1000L,
      retainLast = 1)
    assert(r.expiredSnapshots === 2)
    // every data file is still named by the CURRENT snapshot's
    // manifests (carried forward) → zero data-file deletions
    assert(r.deletedFiles === 0)
    assert(spark.read.format("iceberg-meta").load(root).count() === 8L)
  }
}
