package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("point-in-interval: inclusive bounds, each pair exactly once") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 15L), (4L, 30L))
      .toDF("pid", "t")
    val ivals = Seq((100L, 10L, 15L), (200L, 14L, 29L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "t", ivals, "lo", "hi", 4L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    // t=10 in [10,15]; t=15 in [10,15] and [14,29]; t=0, t=30 in none
    assert(got === Seq((2L, 100L), (3L, 100L), (3L, 200L)))
  }

  test("bucket ids stay exact beyond 2^53 (epoch-nanosecond times)") {
    // Double-division bucketing rounds ~1.7e18 longs by up to ~128 ns,
    // pushing boundary points into the wrong bucket. Exact long
    // floor-div must keep every containing pair.
    val base = 1700000000000000000L // ~2023 in epoch nanos
    val w = 1000000000L // 1 s buckets
    val points = Seq((1L, base + w - 1), (2L, base + w), (3L, base + w + 1))
      .toDF("pid", "t")
    val ivals = Seq((9L, base + w - 1, base + w + 1)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "t", ivals, "lo", "hi", w)
      .select($"pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("matches the naive BETWEEN join on random data, any bucket width") {
    val rnd = new scala.util.Random(11)
    val points = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "t")
    val ivals = Seq.tabulate(60) { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong + 1000, lo, lo + rnd.nextInt(40).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(ivals, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid")
    val c = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.mkString("|")).sorted.toSeq
    for (w <- Seq(1L, 7L, 32L, 500L))
      assert(c(RangeJoin.pointInInterval(points, "t", ivals, "lo", "hi", w)
        .select($"pid", $"iid")) === c(naive), s"bucketWidth=$w")
  }
}
