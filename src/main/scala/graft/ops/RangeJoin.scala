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
    val p = points.withColumn(B, bucketOf(pointCol, bucketWidth))
    val iv = intervals
      .withColumn(B, explode(sequence(
        bucketOf(startCol, bucketWidth), bucketOf(endCol, bucketWidth))))
    p.join(iv, B)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(B)
  }
}
