package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst expressions for the geospatial surface (Iceberg v3
  * `geometry`/`geography` columns — [[graft.sources.IcebergMeta]]).
  *
  * Spark 4.1's built-in ST family is construction-only
  * (`st_geomfromwkb`, `st_geogfromwkb`, `st_asbinary`, `st_srid`,
  * `st_setsrid`): there is no `st_point`, so a pipeline cannot BUILD a
  * geometry value from coordinate columns without a WKB source. This
  * fills exactly that gap at the WKB layer — emit the 21-byte
  * well-known-binary POINT encoding from (x, y) doubles, which
  * `st_geomfromwkb` then lifts to a native GEOMETRY. Kept as a
  * BinaryType producer on purpose: WKB is the public interchange form
  * (ISO 19125 / OGC 06-103r4), stable under Spark's evolving internal
  * geometry representation, and is byte-for-byte what Iceberg v3
  * stores in parquet for geometry columns.
  */
object GeoExpressions {

  /** `graft_st_point(x, y)` → WKB POINT bytes: byte order 01
    * (little-endian), geometry type 1 (Point), x, y as IEEE-754
    * doubles — 21 bytes. Null-intolerant (null coordinate → null). */
  case class StPointWkb(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_st_point"
    override def dataType: DataType = BinaryType
    override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

    override def nullSafeEval(x: Any, y: Any): Any =
      StPointWkb.encode(x.asInstanceOf[Double], y.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.expressions.GeoExpressions.pointWkb($x, $y);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): StPointWkb =
      copy(left = newLeft, right = newRight)
  }

  object StPointWkb {
    private[expressions] def encode(x: Double, y: Double): Array[Byte] =
      pointWkb(x, y)
  }

  /** Static codegen target for [[StPointWkb]]. */
  def pointWkb(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // little-endian marker
    bb.putInt(1) // Point
    bb.putDouble(x)
    bb.putDouble(y)
    bb.array()
  }
}
