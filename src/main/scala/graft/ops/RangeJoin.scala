package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second join shape Spark has no
  * native operator for (SURVEY.md §2b). A bare
  * `p.t BETWEEN i.start AND i.end` join has no equi key, so Spark
  * plans BroadcastNestedLoop/cartesian: every point × every interval.
  *
  * Bucketing turns it into an equi-join: quantize time into
  * `bucketWidth` buckets, explode each interval over the buckets it
  * covers, equi-join points to intervals on the bucket id, then apply
  * the exact range predicate as a residual filter. One shuffle on the
  * bucket key; pair work is points × intervals-per-bucket instead of
  * points × all-intervals. Each (point, interval) pair joins exactly
  * once (a point has ONE bucket), so no distinct pass is needed.
  *
  * Pick `bucketWidth` near the typical interval length: much smaller
  * explodes intervals into many buckets; much larger packs unrelated
  * intervals into each bucket and shifts work to the residual filter.
  */
object RangeJoin {

  private val B = "__range_bucket"

  /** Exact long floor-division bucket id. Double division
    * (`floor(c / w)`) is wrong for time values beyond 2^53 — epoch
    * NANOSECONDS are ~1.7e18, and a ±128 ns rounding moves boundary
    * points into the wrong bucket, silently dropping pairs. Subtracting
    * the positive modulus makes the dividend an exact multiple, so
    * integer `div` equals floor division for negatives too. */
  private def bucketOf(c: String, w: Long) =
    expr(s"(`$c` - pmod(`$c`, ${w}L)) div ${w}L")

  /** All (point-row ++ interval-row) combinations where
    * `pointCol ∈ [startCol, endCol]` (inclusive). Column names must be
    * disjoint between the two sides. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(points.columns.intersect(intervals.columns).isEmpty,
      "point/interval column names must be disjoint")
    require(!(points.columns ++ intervals.columns).contains(B),
      s"input column $B collides with pointInInterval's internal " +
        "bucket name — rename it first")
    val p = points.withColumn(B, bucketOf(pointCol, bucketWidth))
    val iv = intervals
      .withColumn(B, explode(sequence(
        bucketOf(startCol, bucketWidth), bucketOf(endCol, bucketWidth))))
    p.join(iv, B)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(B)
  }

  /** All (left-row ++ right-row) combinations where the closed
    * intervals `[lStart, lEnd]` and `[rStart, rEnd]` overlap
    * (`lStart <= rEnd AND rStart <= lEnd`). Column names must be
    * disjoint between the two sides.
    *
    * Interval × interval is the general case of [[pointInInterval]]:
    * BOTH sides explode over their covered buckets, and a pair of
    * overlapping intervals now meets in EVERY bucket both cover — so
    * the join would emit duplicates. Instead of a distinct pass over
    * the (wide) output, the residual filter keeps each pair only in
    * one canonical bucket: the bucket of `greatest(lStart, rStart)`,
    * i.e. where the overlap begins. That bucket is covered by both
    * sides whenever the intervals overlap, so exactly one copy
    * survives — dedup costs one comparison per candidate instead of a
    * shuffle of the join output (the thing that matters when the
    * output is 100× the input at scale). */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(left.columns.intersect(right.columns).isEmpty,
      "left/right column names must be disjoint")
    val reservedClash =
      (left.columns ++ right.columns).intersect(Seq(B, s"${B}_r"))
    require(reservedClash.isEmpty,
      s"input columns ${reservedClash.mkString(",")} collide with " +
        "intervalOverlap's internal bucket names — rename them first")
    val l = left.withColumn(B, explode(sequence(
      bucketOf(lStart, bucketWidth), bucketOf(lEnd, bucketWidth))))
    val r = right.withColumn(s"${B}_r", explode(sequence(
      bucketOf(rStart, bucketWidth), bucketOf(rEnd, bucketWidth))))
    l.join(r, col(B) === col(s"${B}_r"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // canonical-bucket dedup: keep the pair only where the overlap
      // starts (exact long floor-div of greatest(lStart, rStart)).
      .filter(col(B) === expr(
        s"(greatest(`$lStart`, `$rStart`) - " +
          s"pmod(greatest(`$lStart`, `$rStart`), ${bucketWidth}L)) " +
          s"div ${bucketWidth}L"))
      .drop(B, s"${B}_r")
  }
}
