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
}
