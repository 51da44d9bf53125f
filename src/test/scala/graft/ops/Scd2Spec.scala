package graft.ops

import graft.SparkSpecBase

class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Option[String], Long)]) =
    Scd2.fromChangeLog(rows.toDF("k", "attr", "t"), "k", "attr", "t")
      .select("k", "attr", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq.sortBy(x => (x._1, x._3))

  test("equal-value runs compress; intervals chain; current is open") {
    val got = run(Seq(
      (1L, Some("a"), 10L), (1L, Some("a"), 20L), // run of a
      (1L, Some("b"), 30L),                       // change
      (1L, Some("a"), 40L),                       // back to a: NEW version
      (2L, Some("x"), 5L)))
    assert(got === Seq(
      (1L, Some("a"), 10L, Some(30L)),
      (1L, Some("b"), 30L, Some(40L)),
      (1L, Some("a"), 40L, None),
      (2L, Some("x"), 5L, None)))
  }

  test("NULL attribute values form runs like any other value") {
    val got = run(Seq(
      (1L, None, 10L), (1L, None, 20L), // one NULL run, not two
      (1L, Some("a"), 30L)))
    assert(got === Seq(
      (1L, None, 10L, Some(30L)),
      (1L, Some("a"), 30L, None)))
  }

  test("reserved output names are rejected") {
    intercept[IllegalArgumentException] {
      Scd2.fromChangeLog(
        Seq((1L, "a", 1L, 9L)).toDF("k", "attr", "t", "valid_from"),
        "k", "attr", "t")
    }
  }
}
