package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.expressions.TextExpressions

/** Count-min sketch as a typed `Aggregator` — the fixed-size,
  * merge-associative frequency summary a 100 TB pipeline uses where
  * exact per-key counts would need an unbounded shuffle (SURVEY.md §2b
  * aggregations row; Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005).
  *
  * The buffer is a flattened `depth × width` long matrix; `update`
  * increments one cell per row, `merge` is element-wise addition —
  * order-independent, so partial sketches combine map-side exactly
  * like any algebraic aggregate. Estimates are biased UP only:
  * `estimate(t) >= true_count(t)` always (each cell only ever
  * over-counts via collisions), which [[graft.queries.Sketches]]
  * verifies row-for-row against exact counts.
  *
  * Hash family: row j buckets token t at
  * `(polyhash(t) * (2j+1) + j*12345 + 67) mod P mod width` — the same
  * permutation family as the MinHash kernel, cross-engine exact, so a
  * DuckDB oracle can rebuild the identical sketch.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1, s"bad CMS shape ${depth}x$width")

  private val P = TextExpressions.P

  /** Row-j bucket from an already-computed token hash. */
  def bucketOfHash(h: Long, j: Int): Int =
    ((h * (2 * j + 1) + j * 12345L + 67) % P % width).toInt

  /** Row-j bucket of token `t` (shared with the algebraic mirror).
    * Hot paths hash once and use [[bucketOfHash]] — the char-fold and
    * the UTF8String allocation are independent of j. */
  def bucket(t: String, j: Int): Int = bucketOfHash(hash(t), j)

  private def hash(t: String): Long =
    TextExpressions.hashToken(
      org.apache.spark.unsafe.types.UTF8String.fromString(t))

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], t: String): Array[Long] = {
    val h = hash(t)
    var j = 0
    while (j < depth) {
      buf(j * width + bucketOfHash(h, j)) += 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], t: String): Long = {
    val h = hash(t)
    var est = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = sketch(j * width + bucketOfHash(h, j))
      if (c < est) est = c
      j += 1
    }
    est
  }

  // Reflection-derived encoders: the public Encoders factory exposes
  // no primitive-array encoder, and the buffer must serialize compactly
  // (it shuffles once per partial).
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Portable HyperLogLog distinct-count sketch as a typed `Aggregator`
  * (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm", AofA 2007).
  *
  * Spark's own `approx_count_distinct` is already HLL++, but its
  * register layout is engine-private: a sketch built here can't be
  * rebuilt or audited by another system. This variant is built from
  * cross-engine-exact arithmetic — `h = (key * 2654435761) mod P`
  * (Knuth multiplicative, P = 1e9+7 shared with the text kernels),
  * bucket `h mod m`, rank = trailing zeros of `h div m` + 1 over the
  * remaining W bits — so a SQL engine (the DuckDB oracle, a fleet
  * auditor) reproduces the registers bit-for-bit from the raw keys.
  *
  * Buffer = one register byte per bucket stored in a long array;
  * `merge` is element-wise max — commutative + idempotent, so partials
  * combine map-side and REPLAYED rows change nothing (exactly-once not
  * required). Estimation (`HllAgg.estimate`) is pure integer math:
  * `floor(alpha_scaled * m^2 * 2^(W+1) / (1000 * S))` where
  * `S = sum_j 2^(W+1-M[j])`, with linear-counting fallback
  * `floor(m * ln(m/V) )` below 2.5m using a precomputed micro-scaled
  * ln table (libm never runs per-engine — the table constants are
  * inlined into both the Spark plan and the oracle SQL, so both sides
  * share identical integers).
  */
class HllAgg(m: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(m >= 2 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")

  private val P = TextExpressions.P

  /** Knuth multiplicative step + quadratic mix, all mod P. The affine
    * step ALONE is not enough for HLL: sequential keys form an
    * arithmetic progression mod P whose trailing-zero ranks are
    * structured, not geometric (measured +74% bias at n=5000); the
    * squaring step breaks the linearity. h0*h0 < P^2 ≈ 1e18 stays
    * inside BIGINT in both engines. */
  def hash(key: Long): Long = {
    val x0 = (key * 2654435761L) % P
    val x = if (x0 < 0) x0 + P else x0
    (x * x + x) % P
  }

  /** Rank width: bits available in h div m (h < P < 2^30). */
  val width: Int = 30 - java.lang.Long.numberOfTrailingZeros(m.toLong).toInt

  def register(key: Long): (Int, Int) = {
    val h = hash(key)
    val bucket = (h % m).toInt
    val rest = h / m
    val rho =
      if (rest == 0L) width + 1
      else java.lang.Long.numberOfTrailingZeros(rest) + 1
    (bucket, rho)
  }

  override def zero: Array[Long] = new Array[Long](m)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val (b, rho) = register(key)
    if (rho > buf(b)) buf(b) = rho
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** Integer-exact cardinality estimate from finished registers. */
  def estimate(regs: Array[Long]): Long = HllAgg.estimate(m, width, regs)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object HllAgg {
  /** alpha_m scaled by 1000 (classic HLL bias constants). */
  def alphaScaled(m: Int): Long = m match {
    case 16 => 673L
    case 32 => 697L
    case 64 => 709L
    case _  => math.round(1000.0 * 0.7213 / (1 + 1.079 / m))
  }

  /** Micro-scaled `ln(m / v)` table for linear counting, v in 1..m.
    * Computed once here and inlined verbatim into BOTH engines. */
  def lnMicro(m: Int): IndexedSeq[Long] =
    (1 to m).map(v => math.round(math.log(m.toDouble / v) * 1e6))

  /** floor(alpha*m^2 / sum 2^-M[j]) with linear-counting fallback —
    * all-integer, same formula the oracle SQL evaluates. */
  def estimate(m: Int, width: Int, regs: Array[Long]): Long = {
    val scale = 1L << (width + 1)
    var s = 0L
    var empty = 0
    regs.foreach { r =>
      s += (scale >> r.toInt)
      if (r == 0L) empty += 1
    }
    val raw = alphaScaled(m) * m * m * scale / (1000L * s)
    if (empty > 0 && raw * 2 <= 5L * m)
      m.toLong * lnMicro(m)(empty - 1) / 1000000L
    else raw
  }
}
