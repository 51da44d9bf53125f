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
}
