package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("backward as-of: on-or-before semantics, null when no prior row") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 110.0), (2L, 15L, 7.0))
      .toDF("qk", "qt", "px")
    val trades = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 5L))
      .toDF("k", "t")
    val got = AsOfJoin.asofBackward(trades, quotes,
        "k", "qk", "t", "qt", Seq("px"))
      .orderBy($"k", $"t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq(
      (1L, 9L, None),          // before any quote
      (1L, 10L, Some(100.0)),  // equal time matches
      (1L, 25L, Some(110.0)),  // latest prior
      (2L, 14L, None),
      (3L, 5L, None)))         // key with no right rows at all
  }

  test("right rows with NULL time or key never match") {
    val quotes = Seq(
      (Some(1L), Some(10L), 100.0),
      (Some(1L), None, 666.0),     // null time: must not be carried
      (None, Some(5L), 777.0))     // null key: must not group anywhere
      .toDF("qk", "qt", "px")
    val trades = Seq((1L, 9L), (1L, 10L)).toDF("k", "t")
    val got = AsOfJoin.asofBackward(trades, quotes,
        "k", "qk", "t", "qt", Seq("px"))
      .orderBy($"t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(got === Seq(None, Some(100.0)))
  }

  test("latest right row wins even when its payload value is NULL") {
    val quotes = Seq(
      (1L, 10L, Some(100.0)),
      (1L, 20L, None)) // latest on-or-before for t>=20: px must be NULL
      .toDF("qk", "qt", "px")
    val trades = Seq((1L, 15L), (1L, 25L)).toDF("k", "t")
    val got = AsOfJoin.asofBackward(trades, quotes,
        "k", "qk", "t", "qt", Seq("px"))
      .orderBy($"t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    // t=15 -> quote@10 (100.0); t=25 -> quote@20 whose px is NULL —
    // NOT the stale 100.0 from t=10
    assert(got === Seq(Some(100.0), None))
  }

  test("matches the naive inequality-join definition on random data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // right unique per (key, time): keep max payload
    val right = Seq.tabulate(200)(i =>
        (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong * 10))
      .toDF("k", "t", "pay")
      .groupBy($"k", $"t").agg(max($"pay").as("pay"))
      .withColumnRenamed("k", "rk").withColumnRenamed("t", "rt")
    val composed = AsOfJoin.asofBackward(left, right,
        "k", "rk", "t", "rt", Seq("pay"))
      .select($"lid", $"pay")
    val naive = left.join(right,
        $"k" === $"rk" && $"rt" <= $"t", "left_outer")
      .groupBy($"lid", $"k", $"t")
      .agg(max_by($"pay", $"rt").as("pay"))
      .select($"lid", $"pay")
    val c = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.mkString("|")).sorted.toSeq
    assert(c(composed) === c(naive))
  }

  test("frames carrying the reserved internal names are rejected") {
    val right = Seq((1L, 10L, 1.0)).toDF("rk", "rt", "px")
    // withColumn would silently overwrite these, corrupting results.
    val badLeft = Seq((1L, 10L, 0)).toDF("k", "t", "__asof_kind")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(badLeft, right, "k", "rk", "t", "rt", Seq("px"))
    }
    val badRight = Seq((1L, 10L, 1.0, 0)).toDF("rk", "rt", "px", "__asof_payload")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(Seq((1L, 10L)).toDF("k", "t"),
        badRight, "k", "rk", "t", "rt", Seq("px"))
    }
  }
}
