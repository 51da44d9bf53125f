package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** `spark.readStream.format("iceberg-meta")` — streaming a REAL
  * Iceberg table by sequence number: initial snapshot (deletes
  * applied) + per-append batches exactly once across restart,
  * `startingSequence` shapes, the non-append refusal posture with
  * `ignoreDeletes`, and backlog pacing with AvailableNow. */
class IcebergStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("ice_stream_").toString + "/t"

  test("initial snapshot then per-append batches, exactly once across restart") {
    val root = tmp()
    val ckpt = Files.createTempDirectory("ice_stream_ck_").toString
    IcebergMeta.writeFixture(spark.range(0, 3).toDF("k"), root)  // seq 1
    IcebergMeta.append(spark.range(3, 5).toDF("k"), root)        // seq 2
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("iceberg-meta").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("k").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }.start()
    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(seen.size === 5) // initial snapshot
      IcebergMeta.append(spark.range(5, 7).toDF("k"), root)      // seq 3
      q1.processAllAvailable()
      assert(seen.size === 7)
    } finally q1.stop()
    IcebergMeta.append(spark.range(7, 9).toDF("k"), root)        // seq 4
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted === (0L until 9L))
  }

  test("initial snapshot applies row-level deletes; startingSequence tails") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").withColumn("cat", lit("x")), root) // seq 1
    IcebergMeta.delete(spark, root, col("k") === 0)                  // seq 2
    IcebergMeta.append(
      spark.range(10, 12).toDF("k").withColumn("cat", lit("y")), root) // seq 3
    // default: initial snapshot = visible rows (positional delete applied)
    val q = spark.readStream.format("iceberg-meta").load(root)
      .writeStream.format("memory").queryName("is_init")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM is_init").as[Long]
        .collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L))
    } finally q.stop()
    // startingSequence = 3: only the second append's files
    val q2 = spark.readStream.format("iceberg-meta")
      .option("startingSequence", "3").load(root)
      .writeStream.format("memory").queryName("is_sv")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.sql("SELECT k FROM is_sv").as[Long]
        .collect().sorted.toSeq === Seq(10L, 11L))
    } finally q2.stop()
    // latest: nothing until a new append lands
    val q3 = spark.readStream.format("iceberg-meta")
      .option("startingSequence", "latest").load(root)
      .writeStream.format("memory").queryName("is_lat")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM is_lat").as[Long].head() === 0L)
      IcebergMeta.append(
        spark.range(100, 102).toDF("k").withColumn("cat", lit("z")), root)
      q3.processAllAvailable()
      assert(spark.sql("SELECT k FROM is_lat").as[Long]
        .collect().sorted.toSeq === Seq(100L, 101L))
    } finally q3.stop()
  }

  test("delete snapshots refuse mid-stream; ignoreDeletes skips them") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 4).toDF("k").withColumn("cat", lit("x")), root)
    val q = spark.readStream.format("iceberg-meta")
      .option("startingSequence", "latest").load(root)
      .writeStream.format("memory").queryName("is_ref")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      IcebergMeta.deleteEquality(spark, root, Seq("x").toDF("cat"))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("not append"), e.getMessage)
    } finally q.stop()
    // ignoreDeletes: the delete snapshot passes, later appends stream
    val q2 = spark.readStream.format("iceberg-meta")
      .option("startingSequence", "latest").option("ignoreDeletes", "true")
      .load(root)
      .writeStream.format("memory").queryName("is_del")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      IcebergMeta.deleteEquality(spark, root, Seq(1L).toDF("k")) // delete snap
      IcebergMeta.append(
        spark.range(50, 52).toDF("k").withColumn("cat", lit("w")), root)
      q2.processAllAvailable()
      assert(spark.sql("SELECT k FROM is_del").as[Long]
        .collect().sorted.toSeq === Seq(50L, 51L))
    } finally q2.stop()
  }

  test("maxSequencesPerTrigger paces; AvailableNow drains the backlog") {
    val root = tmp()
    IcebergMeta.writeFixture(Seq(0L).toDF("k"), root)            // seq 1
    (1 until 5).foreach(i =>
      IcebergMeta.append(Seq(i.toLong).toDF("k"), root))         // seq 2..5
    val ckpt = Files.createTempDirectory("ice_stream_ck2_").toString
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("iceberg-meta")
      .option("startingSequence", "1")
      .option("maxSequencesPerTrigger", "2").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select("k").collect().map(_.getLong(0)).toSeq)
        ()
      }.start()
    assert(q.awaitTermination(120000))
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq
    assert(bs.flatten.sorted === (0L until 5L), s"batches=$bs")
    assert(bs.forall(_.size <= 2) && bs.size >= 3, s"batches=$bs")
  }

  test("streaming SINK: one snapshot per batch, exactly-once on replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("ice_sink_").toString + "/t"
    val ckpt = Files.createTempDirectory("ice_sink_ck_").toString
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("k")
      .writeStream.format("iceberg-meta")
      .option("path", root).option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L, 5L)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.format("iceberg-meta").load(root)
      .orderBy("k").as[Long].collect().toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
    // one append snapshot per batch, each carrying its epoch mark
    assert(IcebergMeta.snapshotLog(root).size === 2)
    assert(IcebergMeta.lastCommittedEpoch(root, ckpt) === Some(1L))
    // a REPLAYED batch (restart handing the same batchId) skips
    val sink = new IcebergMetaDataSource().createSink(spark.sqlContext,
      Map("path" -> root, "txnAppId" -> ckpt), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(1L, Seq(4L, 5L).toDF("k"))
    assert(spark.read.format("iceberg-meta").load(root).count() === 5)
    assert(IcebergMeta.snapshotLog(root).size === 2)
    sink.addBatch(2L, Seq(6L).toDF("k")) // genuinely new
    assert(spark.read.format("iceberg-meta").load(root).count() === 6)
    assert(IcebergMeta.lastCommittedEpoch(root, ckpt) === Some(2L))
    // a DIFFERENT app's epochs do not mask this one's
    assert(IcebergMeta.lastCommittedEpoch(root, "other") === None)
    // the epoch mark survives expiration even when MAINTENANCE
    // commits land after it (the crash-then-compact window): expire
    // PINS each app's highest mark like a ref
    IcebergMeta.append(Seq(100L).toDF("k").coalesce(1), root)
    IcebergMeta.expireSnapshots(root,
      olderThanMs = System.currentTimeMillis() + 100000L, retainLast = 1)
    assert(IcebergMeta.lastCommittedEpoch(root, ckpt) === Some(2L))
    sink.addBatch(2L, Seq(7L).toDF("k")) // still dedups post-expire
    assert(spark.read.format("iceberg-meta").load(root).count() === 7)
  }
}
