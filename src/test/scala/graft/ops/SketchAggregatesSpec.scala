package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchAggregatesSpec extends SparkSpecBase {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("aggregator sketch equals the algebraic groupBy-built matrix") {
    val rnd = new scala.util.Random(7)
    val words = Seq("the", "a", "data", "query", "spark", "scan", "merge")
    val tokens = Seq.fill(5000)(words(rnd.nextInt(words.length)))
    val agg = new CountMinAgg(depth, width)
    // Distributed path: per-partition partial buffers, merged.
    val sketch = tokens.toDF("tok").repartition(7)
      .select(udaf(agg).apply(col("tok"))).head().getSeq[Long](0)
    // Algebraic path: exact counts summed into each row's buckets.
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong)
    val expected = new Array[Long](depth * width)
    for ((t, n) <- exact; j <- 0 until depth)
      expected(j * width + agg.bucket(t, j)) += n
    assert(sketch.toArray === expected)
  }

  test("estimates never undercount; exact when collision-free") {
    val agg = new CountMinAgg(depth, width)
    val tokens = Seq.fill(30)("x") ++ Seq.fill(5)("y") ++ Seq("z")
    val sketch = tokens.foldLeft(agg.zero)(agg.reduce)
    assert(agg.estimate(sketch, "x") >= 30L)
    assert(agg.estimate(sketch, "y") >= 5L)
    // 3 distinct tokens in 4x64 cells: if no row collides anywhere the
    // estimate is exact; either way the one-sided bound must hold.
    assert(agg.estimate(sketch, "z") >= 1L)
  }

  test("merge is element-wise and order-independent") {
    val agg = new CountMinAgg(depth, width)
    val a = Seq("p", "q", "p").foldLeft(agg.zero)(agg.reduce)
    val b = Seq("q", "r").foldLeft(agg.zero)(agg.reduce)
    val ab = agg.merge(a.clone(), b.clone())
    val ba = agg.merge(b.clone(), a.clone())
    assert(ab === ba)
    assert(agg.estimate(ab, "p") >= 2L && agg.estimate(ab, "q") >= 2L)
  }

  test("HLL aggregator registers equal the algebraic DataFrame build") {
    val agg = new HllAgg(64)
    val keys = (1L to 4000L).map(_ * 37 + 11)
    // Distributed path: per-partition partials merged by register max.
    val regs = keys.toDF("key").repartition(9)
      .select(udaf(agg).apply(col("key"))).head().getSeq[Long](0)
    // Algebraic path: same expressions q85 evaluates (and the oracle
    // mirrors): Knuth hash, bucket = h mod m, rank via trailing zeros.
    val expected = new Array[Long](64)
    keys.foreach { k =>
      val (b, rho) = agg.register(k)
      if (rho > expected(b)) expected(b) = rho.toLong
    }
    assert(regs.toArray === expected)
  }

  test("HLL estimate: raw branch within ~2.5 sigma; duplicates free") {
    val agg = new HllAgg(64)
    val keys = (1L to 5000L) ++ (1L to 5000L) // duplicates change nothing
    val regs = keys.foldLeft(agg.zero)(agg.reduce)
    val est = agg.estimate(regs)
    // m=64 → std error 1.04/sqrt(64) = 13%; allow 2.5 sigma ≈ 32%.
    assert(math.abs(est - 5000L) <= 1625, s"est=$est")
    val once = (1L to 5000L).foldLeft(agg.zero)(agg.reduce)
    assert(regs === once)
  }

  test("HLL linear-counting branch is exact-ish at tiny cardinality") {
    val agg = new HllAgg(64)
    val regs = (1L to 6L).foldLeft(agg.zero)(agg.reduce)
    val est = agg.estimate(regs)
    // 6 keys, 64 registers: linear counting ln-table path.
    assert(est >= 4 && est <= 8, s"est=$est")
  }

  test("HLL merge is register-max: union of disjoint streams") {
    val agg = new HllAgg(64)
    val a = (1L to 1000L).foldLeft(agg.zero)(agg.reduce)
    val b = (1001L to 2000L).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(a.clone(), b.clone())
    val direct = (1L to 2000L).foldLeft(agg.zero)(agg.reduce)
    assert(merged === direct)
  }
}
