package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Event-stream processing (SURVEY.md §2b "Streaming"): the reference's
  * nightly batch cadence re-expressed as Structured Streaming, with
  * batch-equivalent forms so the same code is oracle-checkable.
  *
  * Every transform here takes/returns DataFrames so it runs identically
  * on a batch `spark.read` frame and a `spark.readStream` frame — the
  * Spark-first way to keep one codepath for both. Watermarks bound
  * state (a 100 TB stream with unbounded state OOMs; with a watermark,
  * state is O(active windows), not O(history)).
  */
object EventStreams {

  /** Tumbling-window counts per event type. Streaming: append-mode
    * safe (watermark closes windows). Batch: the watermark is a no-op
    * and this is exactly catalog query q24. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Gap-based sessionization via the native `session_window` operator:
    * events merge while each arrives strictly before last_ts + gap.
    * One shuffle on user_id; state per open session. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen, keeping state only within the watermark horizon —
    * `dropDuplicatesWithinWatermark` bounds the seen-set to
    * O(events per watermark window) where a plain `dropDuplicates`
    * on a stream retains every key forever (unbounded state, the
    * thing that OOMs a 100 TB ingest). Batch mode: equivalent to
    * `dropDuplicates(idCols)`. */
  def dedupWithinWatermark(events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours",
      tsCol: String = "ts"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Typed per-key custom state (the mapGroupsWithState surface):
    * cumulative per-user event counter carried across micro-batches.
    * In batch mode each group is processed once with empty state —
    * same totals. */
  case class UserEvent(user_id: Long, event_id: Long, ts_sec: Long)
  case class UserTotal(user_id: Long, n_events: Long, last_ts_sec: Long)

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, Long.MinValue))
          val evs = it.toSeq
          val updated = UserTotal(uid, prev.n_events + evs.size,
            math.max(prev.last_ts_sec, if (evs.isEmpty) Long.MinValue else evs.map(_.ts_sec).max))
          state.update(updated)
          updated
      }
  }

  /** Streaming approximate distinct count with BOUNDED state: the
    * portable HLL sketch ([[graft.ops.HllAgg]]) carried as
    * mapGroupsWithState state, m registers per key FOREVER — the
    * streaming replacement for count(DISTINCT user) whose exact seen-
    * set grows with the key universe (the thing that OOMs a 100 TB
    * ingest; dedupWithinWatermark bounds state by TIME, this bounds it
    * by CONSTANT size and never expires). Register-max is commutative
    * and idempotent, so replayed or reordered micro-batches leave the
    * estimate unchanged, and the stream's registers after any prefix
    * equal the batch aggregator's over the same rows
    * (EventStreamsSpec proves equivalence). Batch mode: each group
    * processed once with empty state — the plain HLL estimate. */
  case class TypedKeyEvent(event_type: String, user_id: Long)
  case class HllState(regs: Array[Long], n_seen: Long)
  case class HllEstimate(event_type: String, n_seen: Long, estimate: Long)

  def streamingDistinctUsers(events: Dataset[TypedKeyEvent],
      m: Int = 64): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    val agg = new graft.ops.HllAgg(m)
    events.groupByKey(_.event_type)
      .mapGroupsWithState[HllState, HllEstimate](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[TypedKeyEvent], state: GroupState[HllState]) =>
          val prev = state.getOption.getOrElse(HllState(agg.zero, 0L))
          var n = prev.n_seen
          val regs = prev.regs.clone()
          it.foreach { e => agg.reduce(regs, e.user_id); n += 1 }
          state.update(HllState(regs, n))
          HllEstimate(k, n, agg.estimate(regs))
      }
  }

  /** Streaming FIRST-WINS document dedup (the ingest half of q107's
    * incremental dedup, as a stream): docs SHUFFLE by the polynomial
    * hash of their normalized text, then dedup EXACTLY on the text
    * itself — the hash is only the partitioner, so two distinct
    * documents that collide on it both survive (a hash-only seen-set
    * silently drops one: P ≈ 2^30 gives ~50% collision odds by 37k
    * docs). `flatMapGroupsWithState` rather than `dropDuplicates`
    * because the OUTPUT is the surviving payload (a dedup'd corpus
    * stream) — and state per key is the distinct texts seen, almost
    * always exactly one (a production variant stores a 128-bit strong
    * hash instead of the text to shrink state; same shape). State
    * never expires here (exact dedup across the whole ingest); for a
    * bounded-horizon variant compose with [[dedupWithinWatermark]]
    * upstream. Batch mode: each group is one call with empty state —
    * keep min doc_id per distinct text (same first-wins rule made
    * deterministic by id order). */
  case class DocIn(doc_id: Long, norm_hash: Long, text: String)
  case class SeenState(texts: Seq[String])

  def streamingFirstWins(docs: Dataset[DocIn]): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    // first = lowest doc_id per distinct text within this batch of rows
    def firsts(it: Iterator[DocIn]): Seq[DocIn] =
      it.toSeq.groupBy(_.text).valuesIterator
        .map(_.minBy(_.doc_id)).toSeq.sortBy(_.doc_id)
    if (!docs.isStreaming)
      docs.groupByKey(_.norm_hash).flatMapGroups((_, it) => firsts(it))
    else
      docs.groupByKey(_.norm_hash)
        .flatMapGroupsWithState[SeenState, DocIn](
          org.apache.spark.sql.streaming.OutputMode.Append,
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
          (_: Long, it: Iterator[DocIn], state: GroupState[SeenState]) =>
            val seen = state.getOption.map(_.texts).getOrElse(Seq.empty)
            val fresh = firsts(it).filterNot(d => seen.contains(d.text))
            if (fresh.nonEmpty)
              state.update(SeenState(seen ++ fresh.map(_.text)))
            fresh.iterator
        }
  }

  /** Inactivity detection via EVENT-TIME state timeout — the state-
    * expiry pattern the other stateful ops here deliberately avoid
    * (NoTimeout keeps state forever; this one RETIRES it): each user's
    * state arms a timeout at `last_event + quietSec`, and when the
    * WATERMARK passes that point Spark invokes the function once more
    * with `hasTimedOut` — the group emits a went-quiet record and
    * removes its state. State is O(active users within the quiet
    * horizon), the bounded form a 100 TB stream needs; the emission is
    * driven by watermark progress (other users' events), not wall
    * clock, so replays are deterministic.
    *
    * Batch mode has no timeout machinery; the batch twin is the same
    * question asked retrospectively — users whose last event is more
    * than `quietSec` before the frame's max timestamp (see
    * [[inactiveUsersBatch]], oracle-checked as catalog q115). */
  case class Inactivity(user_id: Long, last_ts_sec: Long, n_events: Long)
  /** Carries the WATERMARKED timestamp column itself — projecting it
    * down to epoch seconds before the stateful operator would drop the
    * event-time annotation and EventTimeTimeout refuses to plan. Only
    * the fields the state function reads: every extra column is dead
    * payload serialized through the groupByKey exchange per event. */
  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)

  def inactivityFlags(events: DataFrame, watermark: String = "2 hours",
      quietSec: Long = 1800L): Dataset[Inactivity] = {
    import events.sparkSession.implicits._
    // Batch mode has no watermark machinery (EliminateEventTimeWatermark
    // strips the node and getCurrentWatermarkMs throws executor-side):
    // the batch twin answers the same question retrospectively, keeping
    // the module's one-codepath contract.
    if (!events.isStreaming)
      return inactiveUsersBatch(events, quietSec).as[Inactivity]
    val typed = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[TimedEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, Inactivity](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Inactivity(uid, s.last_ts_sec, s.n_events))
          } else {
            val evs = it.toSeq
            val prev = state.getOption.getOrElse(UserTotal(uid, 0L, Long.MinValue))
            val upd = UserTotal(uid, prev.n_events + evs.size,
              math.max(prev.last_ts_sec,
                evs.map(_.ts.getTime / 1000L).max))
            state.update(upd)
            // Event-time timeouts must sit at or past the current
            // watermark; a late batch whose last_ts already trails the
            // watermark would otherwise throw. Clamp forward.
            val target = (upd.last_ts_sec + quietSec) * 1000L
            val floor = state.getCurrentWatermarkMs() + 1L
            state.setTimeoutTimestamp(math.max(target, floor))
            Iterator.empty
          }
      }
  }

  /** Batch twin of [[inactivityFlags]]: users whose LAST event is more
    * than `quietSec` before the frame's max timestamp, with the same
    * (user, last_ts_sec, n_events) output. The frontier derives from
    * the per-user aggregate (max of per-user maxes), so the fact table
    * is scanned and shuffled ONCE — an independent global-max agg
    * would be a second full pass. */
  def inactiveUsersBatch(events: DataFrame,
      quietSec: Long = 1800L): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(unix_timestamp(col("ts"))).as("last_ts_sec"),
        count(lit(1)).as("n_events"))
    val frontier = perUser
      .agg(max(col("last_ts_sec")).as("frontier_sec"))
    perUser.crossJoin(broadcast(frontier))
      .filter(col("last_ts_sec") + quietSec < col("frontier_sec"))
      .select(col("user_id"), col("last_ts_sec"), col("n_events"))
  }

  /** Idempotent micro-batch parquet sink for `foreachBatch` — the
    * exactly-once write pattern: each micro-batch lands in its own
    * `batch_id=N` partition with DYNAMIC partition overwrite, so a
    * replayed batch (failure/restart re-delivers the same batchId)
    * OVERWRITES its own partition instead of appending duplicates.
    * At-least-once delivery + idempotent write = exactly-once output,
    * without any sink-side transaction log. Usage:
    * `ds.writeStream.foreachBatch(idempotentParquetSink(path)).start()`. */
  def idempotentParquetSink(path: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)

  /** Stream-stream inner join with a bounded time condition: each
    * click joined to the same user's views within the preceding
    * `horizon` (attribution). BOTH sides carry watermarks and the join
    * predicate bounds event-time distance — that pair of constraints
    * is what lets Spark expire join state (without them a
    * stream-stream join buffers both streams forever). Input frames
    * must already carry distinct column names (`c`-/`v`-prefixed).
    * Batch mode: the same equi+range join, oracle-checkable. */
  def clickViewAttribution(clicks: DataFrame, views: DataFrame,
      watermark: String = "2 hours",
      horizonSec: Long = 3600L): DataFrame = {
    val c =
      if (clicks.isStreaming) clicks.withWatermark("c_ts", watermark)
      else clicks
    val v =
      if (views.isStreaming) views.withWatermark("v_ts", watermark)
      else views
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $horizonSec SECONDS"))
  }
}
