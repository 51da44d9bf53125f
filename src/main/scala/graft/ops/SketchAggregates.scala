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
