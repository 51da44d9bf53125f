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

  test("interval overlap: inclusive touch, each pair exactly once") {
    val l = Seq((1L, 0L, 10L), (2L, 20L, 25L)).toDF("lid", "ls", "le")
    val r = Seq((100L, 10L, 12L), (200L, 11L, 19L), (300L, 0L, 30L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re", 4L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted
    // [0,10] touches [10,12] at 10; misses [11,19]; [0,30] overlaps both
    assert(got === Seq((1L, 100L), (1L, 300L), (2L, 300L)))
  }

  test("interval overlap matches the naive inequality join, any width") {
    val rnd = new scala.util.Random(23)
    val mk = (n: Int, idBase: Long, maxLen: Int) => Seq.tabulate(n) { i =>
      val lo = rnd.nextInt(500).toLong
      (idBase + i, lo, lo + rnd.nextInt(maxLen).toLong)
    }
    val l = mk(120, 0L, 30).toDF("lid", "ls", "le")
    val r = mk(80, 1000L, 60).toDF("rid", "rs", "re")
    val naive = l.join(r, $"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid")
    val c = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.mkString("|")).sorted.toSeq
    for (w <- Seq(1L, 9L, 40L, 600L))
      assert(c(RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re", w)
        .select($"lid", $"rid")) === c(naive), s"bucketWidth=$w")
  }
}
