package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg bucket transform hash, pinned to the SPEC's published
  * test vectors (spec Appendix B) — the values FOREIGN Iceberg readers
  * prune by, so they must match bit-for-bit, not just be stable. */
class IcebergTransformSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucket hash matches the spec's published vectors") {
    // int and long hash IDENTICALLY (widening-safe), via the 8-byte
    // little-endian form
    assert(IcebergBucket.hashLong(34L) === 2017239379)
    assert(IcebergBucket.hashLong(34) === 2017239379)
    // date 2017-11-16 = 17486 days from epoch
    assert(IcebergBucket.hashLong(17486L) === -653330422)
    // strings hash their UTF-8 bytes
    assert(IcebergBucket.hashUtf8(
      UTF8String.fromString("iceberg")) === 1210000089)
    // bucket = (hash & Int.MaxValue) % N
    assert(IcebergBucket.bucketLong(34L, 16) === (2017239379 & Int.MaxValue) % 16)
  }

  test("IcebergBucket expression: eval and codegen agree with the kernel") {
    val df = Seq(34L, 0L, -1L, 123456789L).toDF("k")
      .withColumn("b", org.apache.spark.sql.GraftColumnBridge.column(
        IcebergBucket(org.apache.spark.sql.GraftColumnBridge.expression(
          col("k")), 8)))
    val rows = df.select("k", "b").as[(Long, Int)].collect().toMap
    rows.foreach { case (k, b) =>
      assert(b === IcebergBucket.bucketLong(k, 8), s"k=$k")
    }
    val sdf = Seq("iceberg", "", "graft").toDF("s")
      .withColumn("b", org.apache.spark.sql.GraftColumnBridge.column(
        IcebergBucket(org.apache.spark.sql.GraftColumnBridge.expression(
          col("s")), 5)))
    sdf.select("s", "b").as[(String, Int)].collect().foreach {
      case (v, b) => assert(b ===
        IcebergBucket.bucketUtf8(UTF8String.fromString(v), 5), s"s=$v")
    }
    // nulls stay null
    assert(Seq[Option[Long]](None).toDF("k")
      .withColumn("b", org.apache.spark.sql.GraftColumnBridge.column(
        IcebergBucket(org.apache.spark.sql.GraftColumnBridge.expression(
          col("k")), 8)))
      .filter(col("b").isNull).count() === 1L)
  }
}
