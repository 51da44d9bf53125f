package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val (m, k) = (4096, 3)

  test("no false negatives, and absent keys are mostly rejected") {
    val rnd = new scala.util.Random(3)
    val inserted = Seq.fill(200)(rnd.nextLong().abs % 1000000L).distinct
    val absent = (1000001L to 1000400L).toSeq
    val bits = BloomOps.build(inserted.toDF("key"), "key", m, k)
    val probe = (inserted ++ absent).toDF("key").withColumn("id", col("key"))
    val got = BloomOps.mightContain(probe, Seq("id"), "key", bits, m, k, "pass")
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    // every inserted key passes — the filter never false-negatives
    inserted.foreach(x => assert(got(x), s"inserted key $x rejected"))
    // with 200 keys * 3 bits in 4096 cells (~14% fill), false
    // positives are rare; 10% is a loose deterministic bound
    val fp = absent.count(got(_))
    assert(fp <= absent.size / 10, s"$fp/${absent.size} false positives")
  }

  test("word table stays small and words keep the sign bit clear") {
    val bits = BloomOps.build((0L until 500L).toDF("key"), "key", m, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bits.length <= m / 63 + 1)
    bits.foreach { case (w, word) =>
      assert(word >= 0L, s"word $w has the sign bit set")
    }
  }
}
