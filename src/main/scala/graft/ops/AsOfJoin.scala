package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal alignment operator Spark lacks
  * natively (SURVEY.md §2b: "operator the reference/Spark doesn't
  * have"): for each left row, attach payload from the right row with
  * the greatest `rightTime <= leftTime` for the same key (ties on the
  * time value match — "on or before").
  *
  * Spark-first composition instead of an inequality join: an
  * `l.key = r.key AND r.t <= l.t` join plans as a broadcast nested
  * loop (or cartesian) and evaluates every (left × right-per-key)
  * pair. Here both sides are UNIONED, sorted once per key, and the
  * payload is carried forward with `last(_, ignoreNulls)` over a
  * running window — ONE shuffle on the key, O(n log n) per key, the
  * shape that survives 100 TB. (This is also how stream-stream as-of
  * alignment works: order by event time, carry state forward.)
  *
  * Contract: the right side must be unique per (key, time) — pre-
  * aggregate duplicates first (e.g. keep max payload per day), or the
  * carried value among equal times is unspecified.
  */
object AsOfJoin {

  private val Kind = "__asof_kind"
  private val Payload = "__asof_payload"

  /** @param payload right-side columns to attach (null when no right
    *                row is on-or-before the left row's time). */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    // Payload names must be new columns: a collision would make
    // unionByName merge left values into the carried payload.
    require(payload.intersect(left.columns).isEmpty,
      s"payload columns ${payload.intersect(left.columns).mkString(",")} " +
        "collide with left-side columns")
    // The internal marker/payload columns are added with withColumn,
    // which silently REPLACES a same-named input column — corrupting
    // results rather than failing. Reject frames that carry them.
    val reserved = Seq(Kind, Payload)
    val clash = (left.columns ++ right.columns).intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with asofBackward's " +
        s"reserved internal names (${reserved.mkString(", ")})")
    val l = left.withColumn(Kind, lit(1))
    // NULL right keys/times never match in as-of semantics (r.t <= l.t
    // is NULL), but NULLS FIRST ordering would put them at the head of
    // the partition and carry their payload everywhere — drop them.
    // The payload travels as ONE struct (non-null for every right row,
    // null for left rows): `last(ignoreNulls)` then always carries the
    // whole latest right ROW — per-column carry would skip a legitimate
    // NULL payload value and resurrect a staler row's value, and could
    // stitch columns from different right rows into one output.
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as(leftKey), col(rightTime).as(leftTime),
        struct(payload.map(col): _*).as(Payload))
      .withColumn(Kind, lit(0))
    // Right rows (kind 0) sort before left rows (kind 1) at equal
    // times, so a right row AT the left row's time is visible to it.
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col(leftTime), col(Kind))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn(Payload, last(col(Payload), ignoreNulls = true).over(w))
      .filter(col(Kind) === 1)
    payload
      .foldLeft(carried)((df, p) =>
        df.withColumn(p, col(Payload).getField(p)))
      .drop(Kind, Payload)
  }
}
