package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorAggregatesSpec extends SparkSpecBase {
  import spark.implicits._

  test("CentroidAgg: exact element-wise sums and counts per group") {
    val df = Seq(
      ("a", Array(1L, 2L, 3L)),
      ("a", Array(10L, 20L, 30L)),
      ("b", Array(-5L, 0L, 5L))).toDF("label", "q")
    val agg = udaf(new VectorAggregates.CentroidAgg(3))
    val rows = df.groupBy($"label").agg(agg($"q").as("c"))
      .select($"label", $"c.sums", $"c.n").orderBy($"label").collect()
    assert(rows(0).getSeq[Long](1) === Seq(11L, 22L, 33L))
    assert(rows(0).getLong(2) === 2L)
    assert(rows(1).getSeq[Long](1) === Seq(-5L, 0L, 5L))
    assert(rows(1).getLong(2) === 1L)
  }

  test("CentroidAgg is partition-order independent (exact integers)") {
    val data = (1 to 500).map(i => ("g", Array(i.toLong, (i * 7).toLong)))
    val agg = udaf(new VectorAggregates.CentroidAgg(2))
    def total(parts: Int): Seq[Long] =
      spark.createDataFrame(data).toDF("label", "q")
        .repartition(parts)
        .groupBy($"label").agg(agg($"q").as("c"))
        .select($"c.sums").head().getSeq[Long](0)
    assert(total(1) === total(7))
  }

  test("TopKAgg: (value desc, id asc) order, ties, cap, merge parity") {
    // value ties (40 appears 3x) force the id-asc tie-break; 6 rows
    // into k=3 exercises the cap; repartition forces partial merges.
    val data = Seq(("g", 40L, 9L), ("g", 40L, 2L), ("g", 40L, 5L),
      ("g", 50L, 7L), ("g", 10L, 1L), ("g", 30L, 4L))
    val agg = udaf(new VectorAggregates.TopKAgg(3))
    def run(parts: Int): (Seq[Long], Seq[Long]) = {
      val r = spark.createDataFrame(data).toDF("g", "v", "id")
        .repartition(parts)
        .groupBy($"g").agg(agg(array($"v", $"id")).as("t"))
        .select($"t.vals", $"t.ids").head()
      (r.getSeq[Long](0), r.getSeq[Long](1))
    }
    assert(run(1) === ((Seq(50L, 40L, 40L), Seq(7L, 2L, 5L))))
    assert(run(5) === run(1), "merge path disagrees with single-partition")
  }

  test("TopKAgg: groups smaller than k return all rows, sorted") {
    val agg = udaf(new VectorAggregates.TopKAgg(5))
    val r = Seq(("g", 1L, 10L), ("g", 3L, 30L)).toDF("g", "v", "id")
      .groupBy($"g").agg(agg(array($"v", $"id")).as("t"))
      .select($"t.vals", $"t.ids").head()
    assert(r.getSeq[Long](0) === Seq(3L, 1L))
    assert(r.getSeq[Long](1) === Seq(30L, 10L))
  }
}
