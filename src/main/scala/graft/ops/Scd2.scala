package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — compress a change log into
  * versioned validity intervals (the dimension-history pattern next to
  * [[MergeOps]]' current-state upsert; together they are the lakehouse
  * write-path pair). Each key's consecutive runs of an equal attribute
  * value become ONE version row `[valid_from, valid_to)`, with an open
  * (NULL) `valid_to` on the current version.
  *
  * Shape: two window passes over the same key partitioning — `lag` to
  * find run starts, then `lead` over the surviving run-start rows to
  * close intervals. One shuffle on the key (the second window reuses
  * the partitioning; Catalyst plans a single Exchange), O(n log n)
  * per key for the sort. Run-compression compares with null-safe
  * equality so a NULL attribute value forms runs like any other.
  *
  * Contract: `changes` must be unique per (key, ts) — pre-dedup a raw
  * feed to one record per key per timestamp first (latest writer
  * wins), or run boundaries are ambiguous.
  */
object Scd2 {

  private val Prev = "__scd2_prev"
  private val First = "__scd2_first"

  /** @param changes change log (key, attr, ts, ...other columns kept
    *                from the run-START row of each version)
    * @return one row per version: all change-log columns plus
    *         `valid_from` / `valid_to` (ts-typed; `valid_to` NULL for
    *         the open current version) */
  def fromChangeLog(changes: DataFrame, key: String, attr: String,
      ts: String): DataFrame = {
    val reserved = Seq(Prev, First, "valid_from", "valid_to")
    val clash = changes.columns.intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with Scd2's " +
        s"internal/output names (${reserved.mkString(", ")})")
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts))
    changes
      // NULL timestamps are dropped (same convention as AsOfJoin's
      // null times): they would sort to the head of the partition,
      // making lag(ts).isNull flag the NEXT row as a run start and
      // emitting a duplicate version with a NULL valid_from. With
      // non-null ts, lag(ts).isNull is true exactly on the first row.
      .filter(col(ts).isNotNull)
      // window outputs materialize as columns first — a window
      // function cannot appear inside filter() directly
      .withColumn(Prev, lag(col(attr), 1).over(byKey))
      .withColumn(First, lag(col(ts), 1).over(byKey).isNull)
      // run start: first row of the key, or value differs from the
      // previous row (null-safe: NULL -> NULL is NOT a new run)
      .filter(col(First) || !(col(Prev) <=> col(attr)))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(byKey))
      .drop(Prev, First)
  }
}
