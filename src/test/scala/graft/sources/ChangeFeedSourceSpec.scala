package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The table-as-stream contract: a streaming query tailing a
  * VersionedTable's commit log sees exactly the CDC rows of each
  * commit, in version order, exactly once — including across a
  * stop/restart from the checkpointed offset. */
class ChangeFeedSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("graft_cfs_").toString

  test("change feed streams snapshot + appends + MOR deletes as CDC rows") {
    val root = newRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root) // v0
    VersionedTable.commit(Seq((4L, "d")).toDF("k", "v"), root)   // v1
    val q = spark.readStream
      .format("graft-change-feed").option("root", root).load()
      .writeStream.format("memory").queryName("cf1")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.sql("SELECT k, _change, _version FROM cf1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(first.toSet == Set(
        (1L, "insert", 0L), (2L, "insert", 0L), (3L, "insert", 0L),
        (4L, "insert", 1L)))
      // commits landing WHILE the stream runs arrive as their deltas
      VersionedTable.commit(Seq((5L, "e")).toDF("k", "v"), root) // v2
      VersionedTable.deleteKeysMOR(spark, root, "k",
        Seq(2L).toDF("k"))                                       // v3
      q.processAllAvailable()
      val all = spark.sql("SELECT k, _change, _version FROM cf1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(all.length == first.length + 2)
      assert(all.toSet.contains((5L, "insert", 2L)))
      assert(all.toSet.contains((2L, "delete", 3L)))
    } finally q.stop()
  }

  test("restart resumes from the checkpointed version — no re-delivery") {
    val root = newRoot()
    val ckpt = Files.createTempDirectory("graft_cfs_ck_").toString
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root) // v0
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format("graft.sources.ChangeFeedSource") // class-name registration
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("k"), col("_version")).collect()
            .foreach(r => seen.add((r.getLong(0), r.getLong(1))))
          ()
        }.start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.size == 2) // v0 snapshot
    // more commits while the stream is DOWN
    VersionedTable.commit(Seq(3L).toDF("k"), root) // v1
    VersionedTable.commit(Seq(4L).toDF("k"), root) // v2
    val q2 = run()
    try { q2.processAllAvailable() } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val delivered = seen.asScala.toSeq
    // exactly once: v0's rows once (from run 1), v1+v2's rows once
    assert(delivered.sorted == Seq(
      (1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)).sorted,
      s"delivered=$delivered")
  }

  test("readStream.format(graft) serves the feed under the table's name") {
    // One format name for both directions (the Delta shape):
    // read/write = snapshot + commits, readStream = initial snapshot
    // then incremental CDC — delegating to the same ChangeFeedSource,
    // with checkpointed restart and Delta's startingVersion spelling.
    val root = newRoot()
    val ckpt = Files.createTempDirectory("graft_cfs_gf_").toString
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root) // v0
    VersionedTable.commit(Seq(3L).toDF("k"), root)     // v1
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .format("graft").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("k"), col("_version")).collect()
            .foreach(r => seen.add((r.getLong(0), r.getLong(1))))
          ()
        }.start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    // initial snapshot (v0 inserts) + v1, exactly once
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L)))
    VersionedTable.commit(Seq(4L).toDF("k"), root) // v2 while down
    val q2 = run()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(seen.asScala.toSeq.sorted ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)))

    // startingVersion = first INCLUDED version (Delta's spelling,
    // translated to the feed's startingAfterVersion)
    val q3 = spark.readStream
      .format("graft").option("path", root)
      .option("startingVersion", 1).load()
      .writeStream.format("memory").queryName("gf_sv")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      val rows = spark.sql("SELECT k, _version FROM gf_sv")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(rows == Seq((3L, 1L), (4L, 2L))) // no v0 snapshot
    } finally q3.stop()
  }

  test("change feed drives an incremental MV that matches batch recompute") {
    // The full lakehouse loop: base table -> streaming change feed ->
    // per-batch delta aggregation -> MV table commit. The MV is only
    // ever touched with the batch's DELTA (insert = +1, delete = -1
    // per group) — never a full base recompute — yet must equal the
    // batch groupBy at every quiescent point, including across a
    // stream restart from the checkpoint.
    val base = newRoot()
    val mv = newRoot()
    val ckpt = Files.createTempDirectory("graft_cfs_mv_").toString
    VersionedTable.commit(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("k", "g"), base) // v0
    VersionedTable.commit(Seq((0L, "cnt")).toDF("n", "g").limit(0)
      .select(col("g"), col("n")), mv) // empty MV, schema (g, n)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-change-feed").option("root", base)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val delta = df.groupBy(col("g"))
            .agg(sum(when(col("_change") === "insert", 1L)
              .otherwise(-1L)).as("dn"))
          val cur = VersionedTable.read(spark, mv)
          val next = cur.join(delta, Seq("g"), "full_outer")
            .select(col("g"),
              (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                .as("n"))
            .filter(col("n") > 0)
          VersionedTable.commit(next, mv, "overwrite")
          ()
        }.start()
    def mvState(): Map[String, Long] = VersionedTable.read(spark, mv)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def baseState(): Map[String, Long] = VersionedTable.read(spark, base)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(mvState() == Map("x" -> 2L, "y" -> 1L))
      VersionedTable.commit(Seq((4L, "y"), (5L, "z")).toDF("k", "g"), base)
      VersionedTable.deleteKeysMOR(spark, base, "k", Seq(1L).toDF("k"))
      q1.processAllAvailable()
      assert(mvState() == baseState())
      assert(mvState() == Map("x" -> 1L, "y" -> 2L, "z" -> 1L))
    } finally q1.stop()
    // stream down; base keeps moving; restart catches the MV up
    VersionedTable.deleteKeysMOR(spark, base, "k", Seq(5L).toDF("k"))
    VersionedTable.commit(Seq((6L, "x")).toDF("k", "g"), base)
    val q2 = run()
    try {
      q2.processAllAvailable()
      assert(mvState() == baseState())
      assert(mvState() == Map("x" -> 2L, "y" -> 2L))
    } finally q2.stop()
  }

  test("startingAfterVersion skips history; feed fails without a root") {
    val root = newRoot()
    VersionedTable.commit(Seq(1L).toDF("k"), root) // v0
    VersionedTable.commit(Seq(2L).toDF("k"), root) // v1
    val q = spark.readStream
      .format("graft-change-feed").option("root", root)
      .option("startingAfterVersion", "1")
      .load()
      .writeStream.format("memory").queryName("cf3")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cf3").count() == 0) // history skipped
      VersionedTable.commit(Seq(3L).toDF("k"), root) // v2
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, _version FROM cf3").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((3L, 2L)))
    } finally q.stop()
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-change-feed").load()
    }
  }

  test("mid-stream rename fails the stream loudly; restart picks up " +
      "the new schema") {
    val root = newRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "s"), root) // v0
    val q = spark.readStream
      .format("graft-change-feed").option("root", root).load()
      .writeStream.format("memory").queryName("cf_ren")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cf_ren").count() == 1)
      // a rename lands while the stream runs; the next batch must NOT
      // mis-bind the renamed column positionally — it must fail with
      // the restart instruction
      VersionedTable.renameColumn(root, "k", "key") // v1
      VersionedTable.commit(Seq((2L, "b")).toDF("key", "s"), root) // v2
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("schema changed mid-stream")),
        s"expected the schema-drift guard, got: ${messages(e)}")
    } finally q.stop()
    // a fresh stream declares the NEW schema and reads everything
    val q2 = spark.readStream
      .format("graft-change-feed").option("root", root).load()
      .writeStream.format("memory").queryName("cf_ren2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val rows = spark.sql("SELECT key, _version FROM cf_ren2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(rows.toSeq == Seq((1L, 0L), (2L, 2L)), rows.mkString(","))
    } finally q2.stop()
  }

  test("updateImagesKey: the stream emits update pre/post images for " +
      "same-commit key pairs") {
    val root = newRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root) // v0
    val q = spark.readStream
      .format("graft-change-feed").option("root", root)
      .option("updateImagesKey", "k")
      .load()
      .writeStream.format("memory").queryName("cf_upd")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // v1: merge updates k=2, inserts k=3 — arrives mid-stream
      VersionedTable.mergeKeyed(spark, root,
        Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "k")
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, v, _change, _version FROM cf_upd")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      assert(rows == Set(
        (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
        (3L, "c", "insert", 1L),
        (2L, "b", "update_preimage", 1L),
        (2L, "B", "update_postimage", 1L)), s"got: $rows")
    } finally q.stop()
    // a key that is not a column fails at stream DEFINITION, loudly
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-change-feed").option("root", root)
        .option("updateImagesKey", "nope").load()
    }
  }

  test("maxVersionsPerTrigger bounds each micro-batch and survives restart") {
    val root = newRoot()
    val ckpt = Files.createTempDirectory("graft_cfs_rl_").toString
    (0 until 5).foreach(i =>
      VersionedTable.commit(Seq(i.toLong).toDF("k"), root)) // v0..v4
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-change-feed")
        .option("root", root).option("maxVersionsPerTrigger", "2").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.add(df.select(col("_version")).distinct().collect()
            .map(_.getLong(0)).sorted.toSeq)
          ()
        }.start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq.filter(_.nonEmpty)
    assert(bs.forall(_.size <= 2),
      s"a batch exceeded the 2-version cap: $bs")
    assert(bs.flatten.sorted == Seq(0L, 1L, 2L, 3L, 4L),
      s"backlog not fully drained exactly once: $bs")
    assert(bs.size >= 3, s"5 versions at <=2/batch needs >=3 batches: $bs")
    // restart against a NEW backlog: the cap still applies and the
    // persisted high-water mark prevents both re-delivery and a
    // capped offset running backwards past the committed one
    (5 until 9).foreach(i =>
      VersionedTable.commit(Seq(i.toLong).toDF("k"), root)) // v5..v8
    batches.clear()
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val bs2 = batches.asScala.toSeq.filter(_.nonEmpty)
    assert(bs2.forall(_.size <= 2), s"post-restart cap violated: $bs2")
    assert(bs2.flatten.sorted == Seq(5L, 6L, 7L, 8L),
      s"post-restart delivery wrong: $bs2")
  }

  test("Trigger.AvailableNow drains the backlog in capped bites, then stops") {
    val root = newRoot()
    (0 until 5).foreach(i =>
      VersionedTable.commit(Seq(i.toLong).toDF("k"), root)) // v0..v4
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream
      .format("graft-change-feed").option("root", root)
      .option("maxVersionsPerTrigger", 2).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select("k").collect().map(_.getLong(0)).toSeq)
        ()
      }.start()
    // AvailableNow must TERMINATE on its own once the captured backlog
    // drains — no stop() needed (the backfill-then-exit contract)
    assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq.filter(_.nonEmpty)
    assert(bs.forall(_.size <= 2), s"cap violated under AvailableNow: $bs")
    assert(bs.size >= 3, s"backlog should take >= 3 capped bites: $bs")
    assert(bs.flatten.sorted == Seq(0L, 1L, 2L, 3L, 4L),
      s"AvailableNow must deliver exactly the backlog: $bs")
    // rows committed AFTER the stream captured its end point are NOT
    // delivered by this run — they wait for the next scheduled run
    VersionedTable.commit(Seq(99L).toDF("k"), root)
    assert(!q.isActive)
  }
}
