package graft.ops

import graft.SparkSpecBase

class MergeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    .toDF("k", "name", "v")

  test("update replaces, delete removes, insert adds, untouched kept") {
    val updates = Seq(
      (2L, "B2", 200L, false), // update
      (3L, "c", 30L, true),    // delete
      (9L, "new", 90L, false), // insert
      (8L, "x", 0L, true))     // delete of an absent key: no-op
      .toDF("k", "name", "v", "del")
    val got = MergeOps.merge(base, updates, "k", "del")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got === Seq((1L, "a", 10L), (2L, "B2", 200L), (9L, "new", 90L)))
  }

  test("empty update batch is the identity") {
    val updates = Seq.empty[(Long, String, Long, Boolean)]
      .toDF("k", "name", "v", "del")
    val got = MergeOps.merge(base, updates, "k", "del")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got === base.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("merge is idempotent for a pure-upsert batch") {
    val updates = Seq((2L, "B2", 200L, false), (9L, "new", 90L, false))
      .toDF("k", "name", "v", "del")
    val once = MergeOps.merge(base, updates, "k", "del")
    val twice = MergeOps.merge(once, updates, "k", "del")
    val c = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.mkString("|")).sorted.toSeq
    assert(c(once) === c(twice))
  }

  test("schema mismatch is rejected") {
    intercept[IllegalArgumentException] {
      MergeOps.merge(base, Seq((1L, true)).toDF("k", "del"), "k", "del")
    }
  }
}
