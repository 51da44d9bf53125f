package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics under real micro-batches (MemoryStream), and
  * batch/stream equivalence of the shared transforms. */
class EventStreamsSpec extends SparkSpecBase {
  import spark.implicits._

  import EventStreamsSpec.Ev

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val batch = Seq(
    Ev(ts(0), "click", 1.0, 1), Ev(ts(5), "click", 2.0, 1),
    Ev(ts(10), "view", 3.0, 2), Ev(ts(59), "click", 4.0, 2))

  test("tumblingCounts: batch mode aggregates per hour window") {
    val out = EventStreams.tumblingCounts(batch.toDF(), "1 hour")
      .select(col("event_type"), col("n"), col("sum_value"))
      .orderBy("event_type").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === Seq(("click", 3L, 7.0), ("view", 1L, 3.0)))
  }

  test("tumblingCounts: streaming micro-batches produce the same result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(mem.toDF(), "1 hour")
      .select(col("window.start").as("start"), col("event_type"), col("n"),
        col("sum_value"))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      mem.addData(batch.take(2): _*)
      q.processAllAvailable()
      mem.addData(batch.drop(2): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM tumbling")
        .orderBy("event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        === Seq(("click", 3L, 7.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionCounts: events merge within gap, split beyond it") {
    val evs = Seq(
      Ev(ts(0), "c", 1, 7), Ev(ts(10), "c", 1, 7), // session 1 (gap 10m < 30m)
      Ev(ts(50), "c", 1, 7), // session 2 (40m gap)
      Ev(ts(0), "c", 1, 8)) // other user
    val out = EventStreams.sessionCounts(evs.toDF(), "30 minutes")
      .select(col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("n_events")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((7L, 1L), (7L, 2L), (8L, 1L)))
  }

  test("runningTotals: state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      mem.addData(EventStreams.UserEvent(1, 10, 100),
        EventStreams.UserEvent(1, 11, 200))
      q.processAllAvailable()
      mem.addData(EventStreams.UserEvent(1, 12, 300),
        EventStreams.UserEvent(2, 13, 50))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT user_id, max(n_events) AS n, max(last_ts_sec) AS t FROM totals GROUP BY user_id")
        .orderBy("user_id").collect()
      assert(last.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        === Seq((1L, 3L, 300L), (2L, 1L, 50L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicate ids dropped across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreamsSpec.IdEv
    val mem = MemoryStream[IdEv]
    val q = EventStreams
      .dedupWithinWatermark(mem.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(IdEv(ts(0), 1L), IdEv(ts(1), 2L), IdEv(ts(1), 1L))
      q.processAllAvailable()
      // same id re-sent in a later micro-batch, still inside the horizon
      mem.addData(IdEv(ts(2), 2L), IdEv(ts(3), 3L))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()

    // batch mode: plain dropDuplicates semantics
    val b = EventStreams.dedupWithinWatermark(
      Seq(IdEv(ts(0), 1L), IdEv(ts(5), 1L), IdEv(ts(6), 2L)).toDF())
    assert(b.count() === 2)
  }

  test("late data beyond the watermark is dropped in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(mem.toDF(), "10 minutes", "10 minutes")
      .select(col("window.start").as("start"), col("n"))
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      // advance event time far enough that the 10:00 window is closed
      mem.addData(Ev(ts(0), "c", 1, 1))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2026-01-01 11:00:00"), "c", 1, 1))
      q.processAllAvailable()
      // this event is an hour late -> must not reopen the closed window
      mem.addData(Ev(ts(1), "c", 1, 1))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2026-01-01 12:00:00"), "c", 1, 1))
      q.processAllAvailable()
      val counts = spark.sql("SELECT sum(n) FROM late").head().getLong(0)
      assert(counts <= 2, s"late row leaked into a closed window ($counts)")
    } finally q.stop()
  }

  test("clickViewAttribution: stream-stream join matches across batches") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreamsSpec.{Click, View}
    val clicks = MemoryStream[Click]
    val views = MemoryStream[View]
    val q = EventStreams
      .clickViewAttribution(clicks.toDF(), views.toDF(), "1 hour", 3600L)
      .select(col("c_id"), col("v_id"))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // view arrives in an EARLIER micro-batch than its click — the
      // join must buffer it in state and still match.
      views.addData(View(ts(0), 7L, 100L))
      q.processAllAvailable()
      clicks.addData(Click(ts(30), 7L, 1L)) // 30 min after the view
      clicks.addData(Click(ts(30), 8L, 2L)) // different user: no match
      q.processAllAvailable()
      val got = spark.sql("SELECT c_id, v_id FROM attr")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === Seq((1L, 100L)))
    } finally q.stop()

    // batch mode: identical join, checkable against a plain inequality
    val bc = Seq(Click(ts(30), 7L, 1L), Click(ts(30), 8L, 2L)).toDF()
    val bv = Seq(View(ts(0), 7L, 100L), View(ts(45), 7L, 101L)).toDF()
    val b = EventStreams.clickViewAttribution(bc, bv)
      .select(col("c_id"), col("v_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(b === Seq((1L, 100L))) // v_ts 10:45 > c_ts 10:30: excluded
  }

  test("streamingDistinctUsers: stream estimate equals batch HLL") {
    import EventStreams.TypedKeyEvent
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedKeyEvent]
    val q = EventStreams.streamingDistinctUsers(mem.toDS())
      .writeStream.format("memory").queryName("hllstream")
      .outputMode("update").start()
    try {
      // Two micro-batches with overlapping users: state must carry
      // registers across batches, and duplicates must not move them.
      mem.addData((1L to 300L).map(u => TypedKeyEvent("click", u)): _*)
      q.processAllAvailable()
      mem.addData((201L to 500L).map(u => TypedKeyEvent("click", u)): _*)
      mem.addData(Seq(TypedKeyEvent("view", 7L), TypedKeyEvent("view", 8L)): _*)
      q.processAllAvailable()
      val last = spark.sql(
        """SELECT event_type, n_seen, estimate FROM hllstream
          |WHERE (event_type, n_seen) IN
          |  (SELECT event_type, max(n_seen) FROM hllstream GROUP BY 1)
          |""".stripMargin)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // Batch reference: same aggregator over the union of all rows.
      val agg = new graft.ops.HllAgg(64)
      val clickRegs = ((1L to 300L) ++ (201L to 500L))
        .foldLeft(agg.zero)(agg.reduce)
      assert(last("click") === ((600L, agg.estimate(clickRegs))))
      val viewRegs = Seq(7L, 8L).foldLeft(agg.zero)(agg.reduce)
      assert(last("view") === ((2L, agg.estimate(viewRegs))))
      // sanity: 500 distinct clicks estimated within 2.5 sigma (13%)
      val est = last("click")._2
      assert(math.abs(est - 500L) <= 165, s"est=$est")
    } finally q.stop()
  }
  test("streamingFirstWins: only the first copy of a doc survives") {
    import EventStreams.DocIn
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = EventStreams.streamingFirstWins(mem.toDS())
      .writeStream.format("memory").queryName("firstwins")
      .outputMode("append").start()
    try {
      mem.addData(DocIn(1, 100, "a"), DocIn(2, 200, "b"), DocIn(3, 100, "a"))
      q.processAllAvailable()
      // doc 4: cross-batch exact dup; doc 6: hash COLLISION with key
      // 100 but different text — must survive (dedup is on content,
      // the hash only partitions)
      mem.addData(DocIn(4, 100, "a"), DocIn(5, 300, "c"),
        DocIn(6, 100, "not-a"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id FROM firstwins ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows === Seq(1L, 2L, 5L, 6L))
    } finally q.stop()
    // batch mode: same survivors via the min-id-per-distinct-text rule
    val b = EventStreams.streamingFirstWins(Seq(
      DocIn(1, 100, "a"), DocIn(2, 200, "b"), DocIn(3, 100, "a"),
      DocIn(4, 100, "a"), DocIn(5, 300, "c"), DocIn(6, 100, "not-a")).toDS())
      .collect().map(_.doc_id).sorted.toSeq
    assert(b === Seq(1L, 2L, 5L, 6L))
  }

  test("idempotentParquetSink: a replayed micro-batch does not duplicate") {
    import EventStreams.DocIn
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val sink = EventStreams.idempotentParquetSink(dir)
    val b0 = Seq(DocIn(1, 100, "a"), DocIn(2, 200, "b")).toDF()
    val b1 = Seq(DocIn(3, 300, "c")).toDF()
    sink(b0, 0L)
    sink(b1, 1L)
    sink(b1, 1L) // replay after a simulated failure
    val out = spark.read.parquet(dir)
    assert(out.count() == 3, "replayed batch appended duplicates")
    assert(out.select("batch_id").distinct().count() == 2)
  }

  test("file source -> transform -> VersionedTable sink: exactly-once " +
      "across restart and replay") {
    // The external-source end-to-end: a REAL file source (JSON-lines
    // dropped into a watched directory — the Kafka-shaped ingest this
    // offline container can host), through a stream-capable
    // EventStreams transform, into the transactional
    // VersionedTable.streamingSink, with a checkpointed restart in
    // the middle and a simulated redelivery at the end.
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("evsrc").toString
    val tbl = Files.createTempDirectory("evtbl").toString
    val ckpt = Files.createTempDirectory("evckpt").toString
    def drop(name: String, lines: Seq[String]): Unit = {
      // write-then-rename so the source never lists a half-written file
      val tmp = Paths.get(src, s".$name.tmp")
      Files.writeString(tmp, lines.mkString("", "\n", "\n"))
      Files.move(tmp, Paths.get(src, name))
    }
    def ev(id: Long, user: Long, minute: Int): String =
      f"""{"event_id":$id,"user_id":$user,""" +
        f""""ts":"2026-01-01 10:$minute%02d:00","value":1.5}"""
    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE")
        .json(src)
        .transform(df => EventStreams.dedupWithinWatermark(df))
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(graft.sources.VersionedTable.streamingSink(tbl))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def ids(): Seq[Long] =
      graft.sources.VersionedTable.read(spark, tbl)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq

    drop("b0.json", Seq(ev(1, 10, 0), ev(2, 10, 1), ev(2, 11, 2), ev(3, 12, 3)))
    run() // first run: dedup drops the second event_id=2
    assert(ids() == Seq(1L, 2L, 3L))
    // restart from the same checkpoint; only the NEW file is processed
    drop("b1.json", Seq(ev(4, 10, 10), ev(5, 13, 11)))
    run()
    assert(ids() == Seq(1L, 2L, 3L, 4L, 5L))
    // simulated at-least-once redelivery: re-commit every batch id the
    // sink has already seen — the tag check must skip them all
    val before = graft.sources.VersionedTable.versions(tbl)
    val sink = graft.sources.VersionedTable.streamingSink(tbl)
    sink(Seq((99L, 99L)).toDF("event_id", "user_id"), 0L)
    sink(Seq((99L, 99L)).toDF("event_id", "user_id"), 1L)
    assert(graft.sources.VersionedTable.versions(tbl) == before,
      "replayed batch ids must not commit new versions")
    assert(ids() == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("inactivityFlags: watermark passage emits the quiet user, retires state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val src = mem.toDF()
      .select(col("ts"), col("user_id"),
        col("value").cast("long").as("event_id"))
    val q = EventStreams.inactivityFlags(src, watermark = "10 minutes",
        quietSec = 1800L)
      .writeStream.format("memory").queryName("inactive")
      .outputMode("append").start()
    try {
      // Batch 1: users 1 and 2 active at 10:00.
      mem.addData(Ev(ts(0), "c", 1.0, 1), Ev(ts(0), "c", 2.0, 2))
      q.processAllAvailable()
      // Batch 2: user 2 again at 11:30 -> watermark 11:20, past user
      // 1's 10:30 timeout but not user 2's 12:00. The no-data batch
      // after it runs the timeout path.
      mem.addData(Ev(Timestamp.valueOf("2026-01-01 11:30:00"), "c", 3.0, 2))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT user_id, last_ts_sec, n_events FROM inactive")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq === Seq((1L, ts(0).getTime / 1000, 1L)),
        s"expected exactly user 1 flagged, got ${rows.toSeq}")
    } finally q.stop()

    // Batch twin agrees on the same rows: frontier 11:30, user 1 quiet
    // (last 10:00 + 30 min < 11:30), user 2 not. Called through
    // inactivityFlags itself — the batch path must route to the twin,
    // not hit the watermark-less EventTimeTimeout crash.
    val batchRows = Seq(
      Ev(ts(0), "c", 1.0, 1), Ev(ts(0), "c", 2.0, 2),
      Ev(Timestamp.valueOf("2026-01-01 11:30:00"), "c", 3.0, 2))
    val out = EventStreams.inactivityFlags(batchRows.toDF())
      .collect().map(i => (i.user_id, i.n_events))
    assert(out.toSeq === Seq((1L, 1L)))
  }
}

object EventStreamsSpec {
  case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
  case class IdEv(ts: Timestamp, event_id: Long)
  case class Click(c_ts: Timestamp, c_user: Long, c_id: Long)
  case class View(v_ts: Timestamp, v_user: Long, v_id: Long)
}
