package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Targeted maintenance surface: the writeStream graft sink, REORG
  * PURGE (tombstone-only rewrite), and VACUUM DRY RUN. */
class MaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_mnt_").toString

  test("writeStream.format(graft) commits micro-batches exactly-once") {
    val root = tmp()
    val ckpt = tmp()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    def run() = mem.toDF().toDF("k")
      .writeStream.format("graft")
      .option("path", root).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = run()
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      mem.addData(3L)
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted
      === Array(1L, 2L, 3L))
    // each micro-batch is one tagged commit; history shows the tags
    assert(VersionedTable.latestVersion(root) === 1L)
    // restart re-delivers nothing new: table unchanged (exactly-once)
    val q2 = run()
    try {
      mem.addData(4L)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L))
    // update/complete modes refuse loudly
    intercept[Exception] {
      mem.toDF().toDF("k").groupBy("k").count()
        .writeStream.format("graft").option("path", tmp())
        .option("checkpointLocation", tmp())
        .outputMode("complete").start()
    }
  }

  test("partitioned streaming ingest: pruned reads, exactly-once restart") {
    val root = tmp()
    val ckpt = tmp()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    def run() = mem.toDF().toDF("user_id", "v")
      .writeStream.format("graft")
      .option("path", root).option("checkpointLocation", ckpt)
      .option("partitionBy", "bucket(4,user_id)")
      .outputMode("append").start()
    val q = run()
    try {
      mem.addData((0 until 32).map(i => (i.toLong, i.toLong * 10)): _*)
      q.processAllAvailable()
      mem.addData((32 until 64).map(i => (i.toLong, i.toLong * 10)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.read(spark, root).count() === 64)
    // streamed files carry partition tags: an equality probe prunes
    // to one bucket per commit (2 of 8 files)
    val df = spark.read.format("graft").load(root)
      .filter(col("user_id") === 7L)
    assert(df.select(sum("v")).as[Long].head() === 70L)
    // the DEFAULT (DSv2) route prunes by the same tags — observable
    // through the v2 scan's planning counter
    val (kept, total) = Graft2DataSource.lastPlanned(root)
    assert(kept * 4 <= total,
      s"bucket tags should prune streamed files, kept $kept/$total")
    // restart: re-delivered batches skip (exactly-once), new ones land
    val q2 = run()
    try {
      mem.addData((100L, 1L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(VersionedTable.read(spark, root).count() === 65)
    // multi-column partitionBy refuses with the supported form named
    val e = intercept[Exception] {
      mem.toDF().toDF("user_id", "v")
        .writeStream.format("graft")
        .option("path", tmp()).option("checkpointLocation", tmp())
        .partitionBy("user_id", "v")
        .outputMode("append").start()
    }
    assert(e.getMessage.contains("ONE partition column"))
  }

  test("REORG PURGE rewrites only tombstoned files; sidecars become " +
      "vacuum candidates") {
    val root = tmp()
    // two files: only one will carry a tombstone
    VersionedTable.commit(Seq(1L, 2L).toDF("k").coalesce(1), root)  // v0
    VersionedTable.commit(Seq(10L, 11L).toDF("k").coalesce(1), root) // v1
    VersionedTable.deleteKeysMOR(spark, root, "k", Seq(2L).toDF("k")) // v2
    val filesBefore = VersionedTable.snapshotFiles(root, 2L).toSet
    val purgedV = VersionedTable.purgeTombstones(spark, root)        // v3
    assert(purgedV === 3L)
    val after = VersionedTable.snapshotFiles(root, purgedV).toSet
    // the clean file carried over BY REFERENCE; the dirty one rewrote
    assert(after.intersect(filesBefore).nonEmpty, "clean file must carry over")
    assert(after != filesBefore, "dirty file must be rewritten")
    assert(VersionedTable.snapshotTombstones(root, purgedV).isEmpty)
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted
      === Array(1L, 10L, 11L))
    // a second purge is a metadata no-op
    assert(VersionedTable.purgeTombstones(spark, root) === purgedV)
    // dry run: with only the purged snapshot retained, the tombstone
    // sidecar dir and the original dirty file's dir are candidates
    val would = VersionedTable.vacuumDryRun(root, retain = purgedV,
      minAgeMs = 0L)
    assert(would.exists(_.startsWith("tomb-")),
      s"sidecar dir should be reclaimable after purge, got $would")
    // dry run deleted NOTHING
    assert(VersionedTable.fsck(root).ok)
    val wouldSet = would.toSet
    VersionedTable.vacuum(root, retain = purgedV, minAgeMs = 0L)
    // real vacuum deletes exactly what the dry run promised
    val remaining = VersionedTable.vacuumDryRun(root, purgedV, 0L)
    assert(remaining.isEmpty, s"vacuum left promised dirs: $remaining")
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted
      === Array(1L, 10L, 11L))
    assert(wouldSet.nonEmpty)
  }

  test("manifest-recorded file sizes: exact, folded, checkpoint-surviving") {
    val root = tmp()
    (0 until 12).foreach(i => // crosses the auto-checkpoint at v10
      VersionedTable.commit(Seq(i.toLong).toDF("k").coalesce(1), root))
    VersionedTable.deleteRanges(spark, root,
      Seq(("k", Some(0L), Some(0L)))) // replace commit records sizes too
    val st = VersionedTable.state(root, VersionedTable.latestVersion(root))
    assert(st.sizes.keySet === st.files.toSet,
      "every live file must carry a recorded size")
    st.files.foreach { f =>
      assert(st.sizes(f) ===
        Files.size(java.nio.file.Paths.get(root, f)),
        s"recorded size of $f must match the filesystem")
    }
    // resolution through (checkpoint + suffix) preserves the sizes
    VersionedTable.truncateLog(root)
    val st2 = VersionedTable.state(root, VersionedTable.latestVersion(root))
    assert(st2.sizes === st.sizes)
    // consumers agree: DETAIL and the datasource FileIndex report the
    // same metadata-derived total
    val detailBytes = VersionedTable.detail(root).sizeBytes
    assert(detailBytes === st.sizes.values.sum)
    withReadPathV1 {
      val df = spark.read.format("graft").load(root)
      val idx = df.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            r: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => r.location.asInstanceOf[GraftFileIndex]
      }.head
      assert(idx.sizeInBytes === detailBytes)
    }
  }

  test("SQL: GRAFT VACUUM DRY RUN and GRAFT REORG PURGE") {
    val root = tmp()
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root)
    VersionedTable.deleteKeysMOR(spark, root, "k", Seq(1L).toDF("k"))
    val v = spark.sql(s"GRAFT REORG '$root' PURGE").head().getLong(0)
    assert(v === 2L)
    assert(VersionedTable.read(spark, root).as[Long].collect() === Array(2L))
    val dry = spark.sql(
      s"GRAFT VACUUM '$root' RETAIN $v MIN AGE 0 DRY RUN")
    assert(dry.columns.toSeq === Seq("would_delete"))
    assert(dry.count() >= 1) // pre-purge dirs are candidates, undeleted
    assert(VersionedTable.fsck(root).ok)
  }
}
