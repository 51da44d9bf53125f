package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def calc(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("i").select(c.as("r")).head().get(0)

  private def arr(xs: Double*) = array(xs.map(lit): _*)

  test("dot / l2norm / cosine basics") {
    assert(calc(VectorOps.dot(arr(1, 2, 3), arr(4, 5, 6))) === 32.0)
    assert(calc(VectorOps.l2norm(arr(3, 4))) === 5.0)
    assert(calc(VectorOps.cosine(arr(1, 0), arr(0, 1))) === 0.0)
    assert(math.abs(calc(VectorOps.cosine(arr(2, 2), arr(5, 5)))
      .asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("toDouble casts float arrays before arithmetic") {
    val f = Seq(Seq(1.5f, 2.5f)).toDF("v")
    val d = f.select(VectorOps.toDouble(col("v")).as("v")).head().getSeq[Double](0)
    assert(d === Seq(1.5, 2.5))
  }

  test("codegen kernels match the interpreted HOF reference forms bit-for-bit") {
    // Values chosen to be IEEE-order-sensitive (mixed magnitudes/signs):
    // equality here proves the codegen loop accumulates in the same
    // left-to-right order as the HOF fold (and hence the DuckDB oracle).
    val vs = Seq(
      (1 to 64).map(i => math.sin(i) * math.pow(10, i % 7 - 3)),
      (1 to 64).map(i => if (i % 2 == 0) 1e-8 * i else -1e6 / i),
      Seq(0.0, -0.0, 1.0 / 3, 2.0 / 7))
    val df = vs.map(v => Tuple1(v)).toDF("v")
    val rows = df.select(
      VectorOps.dot(col("v"), col("v")).as("d_c"),
      VectorOps.dotHof(col("v"), col("v")).as("d_h"),
      VectorOps.hyperplaneBucket(col("v"), 8).as("b_c"),
      VectorOps.hyperplaneBucketHof(col("v"), 8).as("b_h"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot bit-exact")
      assert(r.getLong(2) === r.getLong(3), "hyperplaneBucket")
    }
  }

  test("l2DistSq: exact integer distance, matches the HOF fold") {
    val df = Seq((Seq(3L, -4L, 10000000L), Seq(0L, 0L, -10000000L)))
      .toDF("a", "b")
    val got = df.select(
      VectorOps.l2DistSq(col("a"), col("b")).as("c"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (s, t) => s + t).as("h")).head()
    assert(got.getLong(0) === got.getLong(1))
    assert(got.getLong(0) === 9L + 16L + 400000000000000L)
  }

  test("hyperplaneBucket: bounded, deterministic, sign-sensitive") {
    val v = arr((1 to 64).map(_.toDouble / 10): _*)
    val b1 = calc(VectorOps.hyperplaneBucket(v, 8)).asInstanceOf[Long]
    assert(b1 >= 0L && b1 < 256L)
    assert(calc(VectorOps.hyperplaneBucket(v, 8)) === b1)
    // negating the vector flips every sign bit -> complement bucket
    val neg = arr((1 to 64).map(i => -i.toDouble / 10): _*)
    val b2 = calc(VectorOps.hyperplaneBucket(neg, 8)).asInstanceOf[Long]
    assert((b1 ^ b2) === 255L)
  }
}
