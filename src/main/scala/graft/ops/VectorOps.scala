package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels for similarity search / near-dup detection
  * over `array<float>` columns (SURVEY.md §2b north star).
  *
  * All kernels are higher-order-function `Column`s (no UDFs). Arithmetic
  * is done in double with a strict left fold so the DuckDB oracle
  * (`list_reduce` in the same order) produces bit-identical IEEE
  * results — float math is only deterministic cross-engine if the
  * reduction order matches, so we pin it.
  *
  * Scale notes: brute-force cosine is O(probes × corpus) — fine when the
  * probe side broadcasts. The hyperplane-LSH bucket (`hyperplaneBucket`)
  * is the 100 TB path: one shuffle on an 8-bit key prunes the corpus
  * ~256× before any distance math runs.
  */
object VectorOps {

  /** Element-wise cast to double — do this BEFORE any arithmetic, so
    * both engines multiply doubles, not floats. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + strict left-fold sum. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic pseudo-random hyperplane component: integer-exact in
    * both engines, values in [-1000, 1000]. Plane j, component i (0-based). */
  private def planeVal(j: Column, i: Column): Column =
    ((j * 64 + i) * lit(2654435761L)) % 2001 - 1000

  /** Random-hyperplane LSH bucket id in [0, 2^nPlanes): bit j is the
    * sign of v · plane_j. Vectors with the same bucket are "probably
    * nearby" — the candidate-pruning key for ANN at scale. */
  def hyperplaneBucket(v: Column, nPlanes: Int): Column =
    aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L), (acc, j) => {
      val proj = aggregate(
        transform(sequence(lit(1), size(v)), i =>
          element_at(v, i) * planeVal(j, i - 1).cast("double")),
        lit(0.0), (s, x) => s + x)
      acc + when(proj > 0, pow(lit(2), j).cast("long")).otherwise(0L)
    })
}
