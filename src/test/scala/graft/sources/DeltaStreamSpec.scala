package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** `spark.readStream.format("delta-log")` — streaming a REAL Delta
  * table: initial snapshot + per-commit adds exactly once across
  * restart, `startingVersion` shapes, the delete/update refusal
  * posture with `ignoreDeletes`/`ignoreChanges`, backlog pacing, and
  * composition with partitioned tables. */
class DeltaStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("delta_stream_").toString

  test("initial snapshot then per-commit appends, exactly once across restart") {
    val root = tmp()
    val ckpt = Files.createTempDirectory("delta_stream_ck_").toString
    DeltaLog.commit(spark.range(0, 3).toDF("k"), root)  // v0
    DeltaLog.commit(spark.range(3, 5).toDF("k"), root)  // v1
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("delta-log").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("k").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }.start()
    val q1 = run()
    try {
      q1.processAllAvailable()
      // first batch = full snapshot at the stream's first offset
      assert(seen.size === 5)
      DeltaLog.commit(spark.range(5, 7).toDF("k"), root) // v2, mid-stream
      q1.processAllAvailable()
      assert(seen.size === 7)
    } finally q1.stop()
    // commits while the stream is DOWN arrive once on restart
    DeltaLog.commit(spark.range(7, 9).toDF("k"), root)   // v3
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted === (0L until 9L))
  }

  test("startingVersion: explicit N and latest") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 3).toDF("k"), root)  // v0
    DeltaLog.commit(spark.range(3, 5).toDF("k"), root)  // v1
    DeltaLog.commit(spark.range(5, 6).toDF("k"), root)  // v2
    // N = 1: tail from commit 1's own adds — v0's files never emit
    val q = spark.readStream.format("delta-log")
      .option("startingVersion", "1").load(root)
      .writeStream.format("memory").queryName("ds_sv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM ds_sv").as[Long]
        .collect().sorted.toSeq === (3L until 6L))
    } finally q.stop()
    // latest: only commits after stream start
    val q2 = spark.readStream.format("delta-log")
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("ds_lat")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM ds_lat").as[Long].head() === 0L)
      DeltaLog.commit(spark.range(100, 102).toDF("k"), root) // v3
      q2.processAllAvailable()
      assert(spark.sql("SELECT k FROM ds_lat").as[Long]
        .collect().sorted.toSeq === Seq(100L, 101L))
    } finally q2.stop()
  }

  test("deletes/updates refuse; ignoreDeletes and ignoreChanges admit them") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 4).toDF("k")
      .withColumn("p", col("k") % 2).repartition(col("p")),
      root, partitionBy = Seq("p"))
    val q = spark.readStream.format("delta-log")
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("ds_ref")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // whole-partition delete → remove-only commit → stream refuses
      DeltaLog.deleteWhere(spark, root, col("p") === 0)
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("DELETES data"), e.getMessage)
    } finally q.stop()
    // ignoreDeletes: remove-only commits pass silently
    val q2 = spark.readStream.format("delta-log")
      .option("startingVersion", "latest").option("ignoreDeletes", "true")
      .load(root)
      .writeStream.format("memory").queryName("ds_del")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      DeltaLog.deleteWhere(spark, root, col("k") === 1) // rewrite of p=1
      // remove+add rewrite still refuses under ignoreDeletes alone
      val e2 = intercept[Exception] { q2.processAllAvailable() }
      assert(e2.getMessage.contains("UPDATES data"), e2.getMessage)
    } finally q2.stop()
    // ignoreChanges: the rewrite re-emits the rewritten file in full
    val q3 = spark.readStream.format("delta-log")
      .option("startingVersion", "0").option("ignoreChanges", "true")
      .load(root)
      .writeStream.format("memory").queryName("ds_chg")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      // v0 adds (k=0..3) + the v2 rewrite re-emitting p=1's survivor (3)
      val got = spark.sql("SELECT k FROM ds_chg").as[Long]
        .collect().sorted.toSeq
      assert(got === Seq(0L, 1L, 2L, 3L, 3L), s"got $got")
    } finally q3.stop()
  }

  test("maxVersionsPerTrigger paces; AvailableNow drains the backlog") {
    val root = tmp()
    (0 until 5).foreach(i =>
      DeltaLog.commit(Seq(i.toLong).toDF("k"), root)) // v0..v4
    val ckpt = Files.createTempDirectory("delta_stream_ck2_").toString
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("delta-log")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select("k").collect().map(_.getLong(0)).toSeq)
        ()
      }.start()
    assert(q.awaitTermination(120000))
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq
    // the full backlog drained (NOT one capped bite), in capped steps
    assert(bs.flatten.sorted === (0L until 5L), s"batches=$bs")
    assert(bs.forall(_.size <= 2) && bs.size >= 3, s"batches=$bs")
  }

  test("readChangeFeed streams CDC rows: snapshot inserts, cdc deletes") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 4).toDF("k").coalesce(1), root)  // v0
    DeltaLog.setConfiguration(spark, root,
      Map("delta.enableChangeDataFeed" -> "true"))                  // v1
    val q = spark.readStream.format("delta-log")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName("ds_cdf")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // initial snapshot = inserts at the first offset's version
      assert(spark.sql(
        "SELECT k, _change_type FROM ds_cdf").as[(Long, String)]
        .collect().toSet ===
        (0L until 4L).map(k => (k, "insert")).toSet)
      DeltaLog.commit(spark.range(4, 6).toDF("k").coalesce(1), root) // v2
      DeltaLog.deleteWhere(spark, root, col("k") === 1)              // v3: cdc
      q.processAllAvailable()
      val after = spark.sql(
        "SELECT k, _change_type, _commit_version FROM ds_cdf")
        .as[(Long, String, Long)].collect().toSet
      assert(after.contains((4L, "insert", 2L)) &&
        after.contains((5L, "insert", 2L)) &&
        after.contains((1L, "delete", 3L)), s"got $after")
      assert(after.size === 7) // 4 snapshot + 2 inserts + 1 delete
    } finally q.stop()
  }

  test("schema drift mid-stream refuses with the restart instruction") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 2).toDF("k"), root)
    val q = spark.readStream.format("delta-log").load(root)
      .writeStream.format("memory").queryName("ds_drift")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // overwrite restates metaData with a different schema
      DeltaLog.commit(spark.range(0, 2).toDF("k")
        .withColumn("extra", lit(1L)), root, mode = "overwrite")
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("restart"), e.getMessage)
    } finally q.stop()
  }

  test("streaming SINK: one commit per batch, txn handshake dedups replays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val ckpt = Files.createTempDirectory("delta_sink_ck_").toString
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("k")
      .writeStream.format("delta-log")
      .option("path", root).option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L, 5L)
      q.processAllAvailable()
    } finally q.stop()
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.orderBy("k").as[Long].collect().toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // each batch committed once, carrying its txn action
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.version === 1L)
    assert(snap.txns.values.toSeq.sorted === Seq(1L) ||
      snap.txns.nonEmpty) // latest batch id per appId
    // a REPLAYED batch (restart handing the same batchId again) skips:
    // drive the sink directly with a duplicate
    val sink = new DeltaLogDataSource().createSink(spark.sqlContext,
      Map("path" -> root, "txnAppId" -> snap.txns.keys.head), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(1L, Seq(4L, 5L).toDF("k")) // duplicate of batch 1
    assert(DeltaLog.latestVersion(root) === 1L) // nothing committed
    assert(spark.read.format("delta-log").load(root).count() === 5L)
    sink.addBatch(2L, Seq(6L).toDF("k")) // genuinely new batch
    assert(DeltaLog.latestVersion(root) === 2L)
    assert(spark.read.format("delta-log").load(root).count() === 6L)
    // txn state survives CHECKPOINTING (exactly-once across log
    // truncation) — the checkpoint carries txn structs
    DeltaLog.checkpoint(spark, root)
    import java.nio.file.Paths
    (0L to 2L).foreach(v => java.nio.file.Files.delete(
      Paths.get(root, "_delta_log", f"$v%020d.json")))
    val snap2 = DeltaLog.snapshot(spark, root)
    assert(snap2.txns.values.max === 2L)
    sink.addBatch(2L, Seq(7L).toDF("k")) // still dedups post-truncation
    assert(spark.read.format("delta-log").load(root).count() === 6L)
  }

  test("source stream stays exactly-once across METADATA CLEANUP") {
    val root = tmp()
    val ckpt = Files.createTempDirectory("delta_stream_mc_").toString
    DeltaLog.commit(spark.range(0, 3).toDF("k"), root,
      properties = Map(
        "delta.logRetentionDuration" -> "interval 1 millisecond")) // v0
    DeltaLog.commit(spark.range(3, 5).toDF("k"), root)             // v1
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("delta-log").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("k").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }.start()
    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(seen.size === 5)
      // checkpoint + cleanup retire the already-consumed prefix while
      // the stream is LIVE; its next offset is past the horizon
      DeltaLog.checkpoint(spark, root)
      assert(DeltaLog.cleanupMetadata(spark, root,
        nowMs = System.currentTimeMillis + 60000) === 1L) // v0.json
      DeltaLog.commit(spark.range(5, 7).toDF("k"), root)  // v2
      q1.processAllAvailable()
      assert(seen.size === 7)
    } finally q1.stop()
    // restart from the stream checkpoint: offsets resume past the
    // horizon, every row exactly once
    DeltaLog.commit(spark.range(7, 9).toDF("k"), root)    // v3
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted === (0L until 9L))
    // a stream whose offset fell BELOW the horizon refuses loudly
    // (commitActions reports the truncation, never re-guesses rows)
    val e = intercept[IllegalStateException] {
      DeltaLog.commitActions(root, 0L)
    }
    assert(e.getMessage.contains("truncated"))
  }
}
