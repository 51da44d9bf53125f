package graft.ops

import graft.expressions.VectorExpressions.{DotProduct, HyperplaneBucket, L2Norm}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Embedding-vector kernels for similarity search / near-dup detection
  * over `array<float>` columns (SURVEY.md §2b north star).
  *
  * The hot kernels (dot / l2norm / hyperplane bucket) are native
  * Catalyst expressions with `doGenCode` ([[graft.expressions.VectorExpressions]])
  * — a 64-dim dot product is one primitive loop inside whole-stage
  * codegen instead of ~192 interpreted higher-order-lambda calls. The
  * HOF forms are kept (`dotHof`) as the reference semantics the
  * codegen path must match bit-for-bit (asserted in VectorOpsSpec):
  * both accumulate strictly left-to-right, so DuckDB's `list_reduce`
  * produces identical IEEE doubles.
  *
  * Scale notes: brute-force cosine is O(probes × corpus) — fine when the
  * probe side broadcasts. The hyperplane-LSH bucket (`hyperplaneBucket`)
  * is the 100 TB path: one shuffle on an 8-bit key prunes the corpus
  * ~256× before any distance math runs.
  */
object VectorOps {

  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)
  private def col(e: Expression): Column = GraftColumnBridge.column(e)

  /** Element-wise cast to double — do this BEFORE any arithmetic, so
    * both engines multiply doubles, not floats. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product — codegen'd primitive loop, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  /** Reference HOF form of [[dot]] (zip_with + strict left-fold sum);
    * interpreted, kept as the semantics oracle for the codegen path. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def l2norm(a: Column): Column = col(L2Norm(expr(a)))

  /** Exact integer squared L2 distance over quantized long vectors —
    * codegen'd loop (the IVF cell-assignment kernel). Throws on
    * dimension mismatch (a silent truncate would underestimate). */
  def l2DistSq(a: Column, b: Column): Column =
    col(graft.expressions.VectorExpressions.L2DistSq(expr(a), expr(b)))

  /** Micro-unit quantization: `floor(x * 1e6)` per element as long —
    * THE shared scale for every exact-integer vector computation
    * (q50 centroids, q59 IVF assignment). One definition so the
    * quantizer can never desynchronize between them. */
  def microQuantize(v: Column): Column =
    transform(toDouble(v), x => floor(x * 1000000).cast("long"))

  /** Rounded micro-unit mean from a (sum, count) pair:
    * `floor(sum / n + 0.5)` — the centroid component formula shared by
    * q50's checked output and q59's coarse quantizer. */
  def centroidMicro(sum: Column, n: Column): Column =
    floor(sum.cast("double") / n + 0.5).cast("long")

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Random-hyperplane LSH bucket id in [0, 2^nPlanes): bit j is the
    * sign of v · plane_j over the deterministic integer-exact plane
    * family `((j*64 + i) * 2654435761) % 2001 - 1000`. Vectors with the
    * same bucket are "probably nearby" — the candidate-pruning key for
    * ANN at scale. */
  def hyperplaneBucket(v: Column, nPlanes: Int): Column =
    col(HyperplaneBucket(expr(v), nPlanes))

  /** Reference HOF form of [[hyperplaneBucket]] (nested interpreted
    * folds), kept as the semantics oracle for the codegen path. */
  def hyperplaneBucketHof(v: Column, nPlanes: Int): Column =
    aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L), (acc, j) => {
      val proj = aggregate(
        transform(sequence(lit(1), size(v)), i =>
          element_at(v, i) * planeVal(j, i - 1).cast("double")),
        lit(0.0), (s, x) => s + x)
      acc + when(proj > 0, pow(lit(2), j).cast("long")).otherwise(0L)
    })

  /** Deterministic pseudo-random hyperplane component: integer-exact in
    * both engines, values in [-1000, 1000]. Plane j, component i (0-based). */
  private def planeVal(j: Column, i: Column): Column =
    ((j * 64 + i) * lit(2654435761L)) % 2001 - 1000
}
