package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation surface (SURVEY.md §2b UDF/UDAF row): per-group
  * element-wise vector aggregation as an `Aggregator[IN, BUF, OUT]`.
  *
  * Why an Aggregator and not `posexplode → groupBy(label, pos) → avg →
  * re-collect`: the explode form shuffles one row per vector ELEMENT
  * (100 TB of 64-dim embeddings → 6.4T shuffle rows); the Aggregator
  * shuffles only per-partition partial buffers (one 64-slot array per
  * group per partition) — the same partial+final shape as Spark's
  * built-in aggregates, via the public typed-UDAF API.
  *
  * Determinism contract: inputs are pre-quantized to integers
  * (`floor(x * 1e6)` longs), so partial sums are exact and
  * merge-order-independent — the DuckDB oracle reproduces the result
  * bit-for-bit, which float summation (order-dependent) cannot
  * guarantee across engines. */
object VectorAggregates {

  /** Buffer: element-wise long sums + row count. */
  final case class CentroidBuf(sums: Array[Long], n: Long)

  /** Element-wise sum + count over quantized vectors; `finish` leaves
    * (sums, n) so callers pick the division/rounding form they can
    * mirror in an oracle. */
  class CentroidAgg(dim: Int)
      extends Aggregator[Array[Long], CentroidBuf, CentroidBuf] {

    override def zero: CentroidBuf = CentroidBuf(new Array[Long](dim), 0L)

    override def reduce(b: CentroidBuf, v: Array[Long]): CentroidBuf = {
      // A silent truncate/zero-pad would divide short dims by an
      // inflated count — wrong means with no error. Fail loudly.
      require(v.length == dim,
        s"CentroidAgg(dim=$dim) got a vector of length ${v.length}")
      val s = b.sums
      var i = 0
      while (i < dim) { s(i) += v(i); i += 1 }
      CentroidBuf(s, b.n + 1)
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      val s = a.sums
      var i = 0
      while (i < dim) { s(i) += b.sums(i); i += 1 }
      CentroidBuf(s, a.n + b.n)
    }

    override def finish(r: CentroidBuf): CentroidBuf = r

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product
    override def outputEncoder: Encoder[CentroidBuf] = Encoders.product
  }

  /** Bounded top-k buffer: parallel arrays sorted by (value desc,
    * id asc), length ≤ k. */
  final case class TopKBuf(vals: Array[Long], ids: Array[Long])

  /** Per-group top-k as a BOUNDED-MEMORY mergeable aggregate — the
    * scale-honest alternative to both the window form (row_number ≤ k
    * sorts every group's full row set through the shuffle) and the
    * `slice(sort_array(collect_list(...)))` form (whose partial
    * buffers grow with the group, not with k). Partials here are ≤ k
    * entries per group per partition, combine map-side, and merge in
    * O(k) — the classic top-k combiner. Input: `array(value, id)`
    * longs; ties break (value desc, id asc), exactly mirrorable by a
    * row_number oracle. */
  class TopKAgg(k: Int) extends Aggregator[Array[Long], TopKBuf, TopKBuf] {

    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

    private def beats(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    private def insert(b: TopKBuf, v: Long, id: Long): TopKBuf = {
      val n = b.vals.length
      if (n == k && !beats(v, id, b.vals(n - 1), b.ids(n - 1))) return b
      // insertion point by (value desc, id asc); k is small — linear
      var p = 0
      while (p < n && !beats(v, id, b.vals(p), b.ids(p))) p += 1
      val m = math.min(n + 1, k)
      val nv = new Array[Long](m); val ni = new Array[Long](m)
      System.arraycopy(b.vals, 0, nv, 0, p)
      System.arraycopy(b.ids, 0, ni, 0, p)
      nv(p) = v; ni(p) = id
      val tail = m - p - 1
      if (tail > 0) {
        System.arraycopy(b.vals, p, nv, p + 1, tail)
        System.arraycopy(b.ids, p, ni, p + 1, tail)
      }
      TopKBuf(nv, ni)
    }

    override def reduce(b: TopKBuf, in: Array[Long]): TopKBuf = {
      // SQL aggregates skip NULL inputs; a null array row must not NPE
      if (in == null) return b
      require(in.length == 2, s"TopKAgg expects array(value, id), got " +
        s"length ${in.length}")
      insert(b, in(0), in(1))
    }

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var r = a
      var i = 0
      while (i < b.vals.length) { r = insert(r, b.vals(i), b.ids(i)); i += 1 }
      r
    }

    override def finish(r: TopKBuf): TopKBuf = r

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product
  }
}
