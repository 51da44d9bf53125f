package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted operators must be result-equivalent to their plain forms on
  * skewed data (one key holding ~90% of rows — the shape that melts a
  * single reducer at scale). */
class SkewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // hot key "h": 900 rows; 10 cold keys: 10 rows each
  private lazy val skewed: DataFrame =
    ((1 to 900).map(i => ("h", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong)))
      .toDF("key", "v")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("saltedSumCount == plain groupBy sum/count") {
    val plain = skewed.groupBy($"key")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n_rows"))
    assert(canon(SkewOps.saltedSumCount(skewed, Seq("key"), "v", salts = 8))
      === canon(plain))
  }

  test("saltedJoin == plain inner join") {
    val dim = Seq(("h", "hot"), ("k1", "cold1"), ("k2", "cold2"))
      .toDF("key", "name")
    val plain = skewed.join(dim, Seq("key"))
    val saltedRes = SkewOps.saltedJoin(skewed, dim, "key", salts = 8)
    assert(saltedRes.columns.toSeq === plain.columns.toSeq)
    assert(canon(saltedRes) === canon(plain))
  }

  test("saltedTopK == plain per-key top-k") {
    val k = 5
    val plain = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"key").orderBy($"v".desc, $"key")
      skewed.withColumn("rn", row_number().over(w))
        .filter($"rn" <= k).drop("rn")
    }
    val saltedRes =
      SkewOps.saltedTopK(skewed, Seq("key"), $"v".desc, k, salts = 8)
    assert(canon(saltedRes) === canon(plain))
  }
}
