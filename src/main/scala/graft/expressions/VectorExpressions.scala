package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector kernels (SURVEY.md §2b
  * similarity search / embedding dedup).
  *
  * The higher-order-function forms in [[graft.ops.VectorOps]] are
  * correct but interpreted: Catalyst evaluates HOF lambdas element by
  * element with no codegen, so a 64-dim dot product costs ~192
  * interpreted calls per pair — the dominant cost of the pairwise
  * similarity queries. These expressions generate a tight primitive
  * loop inside whole-stage codegen instead (`doGenCode`), preserving
  * the exact left-to-right IEEE accumulation order of the HOF fold and
  * the DuckDB `list_reduce` oracle — same values bit-for-bit, ~100×
  * less interpretation overhead.
  *
  * Null contract: inputs are null-intolerant (null array → null
  * result); array ELEMENTS are assumed non-null, which the embedding
  * pipeline guarantees (`transform(v, cast)` of a non-null float
  * array). That assumption is what lets the loop read primitive
  * doubles without per-element null checks.
  */
object VectorExpressions {

  /** Shared input contract: array<double>, with implicit casts so a
    * SQL caller passing array<float> (e.g. the raw embeddings column)
    * gets an analyzer-inserted elementwise cast instead of silently
    * mis-reading 4-byte-packed data as 8-byte doubles. */
  abstract class DoubleArrayFold extends BinaryExpression
      with ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    override def inputTypes =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  }

  /** dot(a, b) = Σ a[i]*b[i], accumulated left-to-right (IEEE order
    * pinned to match the DuckDB fold). Truncates to the shorter array
    * like `zip_with` would after the filter guards equal lengths. */
  case class DotProduct(left: Expression, right: Expression)
      extends DoubleArrayFold {
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** l2norm(a) = sqrt(Σ a[i]²), same pinned accumulation order. */
  case class L2Norm(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def prettyName: String = "graft_l2norm"
    override def dataType: DataType = DoubleType
    override def inputTypes = Seq(ArrayType(DoubleType))

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  final double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Squared L2 distance between two quantized integer vectors —
    * an EXACT long (elements ≤ ~1e7 ⇒ squares ≤ 4e14, 64-dim sums
    * ≤ 2.6e16 < 2^63), which is what makes IVF cell assignment
    * bit-identical cross-engine; a double accumulator would lose
    * exactness past 2^53. */
  case class L2DistSq(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_l2distsq"
    override def dataType: DataType = LongType
    override def inputTypes =
      Seq(ArrayType(LongType), ArrayType(LongType))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // Mismatched dimensions fail loudly: a silent truncate returns an
      // underestimated distance (wrong IVF cell, no error) — same
      // contract as CentroidAgg.
      if (x.numElements() != y.numElements())
        throw new IllegalArgumentException(
          s"graft_l2distsq: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
      val n = x.numElements()
      var s = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val dd = ctx.freshName("d")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "graft_l2distsq: dimension mismatch " + $n + " vs " + $b.numElements());
           |}
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  final long $dd = $a.getLong($i) - $b.getLong($i);
           |  $s += $dd * $dd;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane LSH bucket id in [0, 2^nPlanes): bit j is the
    * sign of v · plane_j, with the deterministic integer-exact plane
    * family `plane_j[i] = ((j*64 + i) * 2654435761) % 2001 - 1000`
    * (mirrors [[graft.ops.VectorOps.hyperplaneBucket]] and the DuckDB
    * oracle bit-for-bit — the projection is a left fold in index
    * order). */
  case class HyperplaneBucket(child: Expression, nPlanes: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    // Analysis-time bounds: beyond 63 the bucket bit `1L << j` silently
    // wraps (j is masked mod 64 by the JVM shift) — duplicate planes,
    // not an error, unless rejected here.
    require(nPlanes >= 1 && nPlanes <= 63,
      s"graft_hyperplane_bucket: nPlanes must be in [1, 63], got $nPlanes")
    override def prettyName: String = "graft_hyperplane_bucket"
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(DoubleType))

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var acc = 0L
      var j = 0
      while (j < nPlanes) {
        var s = 0.0
        var i = 0
        while (i < n) {
          s += x.getDouble(i) * (((j * 64L + i) * 2654435761L) % 2001 - 1000).toDouble
          i += 1
        }
        if (s > 0) acc += 1L << j
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |long $acc = 0L;
           |for (int $j = 0; $j < $nPlanes; $j++) {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $a.getDouble($i) *
           |      (double) ((($j * 64L + $i) * 2654435761L) % 2001L - 1000L);
           |  }
           |  if ($s > 0) $acc += 1L << $j;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
