package graft.sources

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-expression file-skipping evaluator over per-column
  * [[VersionedTable.ColStats]] — the shared core of the external-format
  * FileIndexes ([[DeltaLogFileIndex]], [[IcebergMetaFileIndex]]).
  * Strictly CONSERVATIVE: any shape it does not recognize keeps the
  * file, and Spark re-applies every predicate row-wise downstream, so
  * pruning can change cost, never answers. (The graft-native
  * [[GraftFileIndex]] keeps its own richer walk — blooms and hidden
  * partition tags layer on top of the range checks here.) */
private[sources] object StatsPruning {

  private def ext(l: Literal): Any = l.value match {
    case u: UTF8String => u.toString
    case d: Decimal => d.toBigDecimal
    case o => o
  }

  def mayMatchExpr(stats: Map[String, VersionedTable.ColStats],
      e: Expression): Boolean = {
    def cs(name: String) = stats.get(name)
    e match {
      case And(x, y) => mayMatchExpr(stats, x) && mayMatchExpr(stats, y)
      case Or(x, y) => mayMatchExpr(stats, x) || mayMatchExpr(stats, y)
      case EqualTo(a: AttributeReference, l: Literal) =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), Some(ext(l)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), Some(ext(l)))
      case EqualNullSafe(a: AttributeReference, l: Literal)
          if l.value != null =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), Some(ext(l)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), None)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), None)
      case LessThan(a: AttributeReference, l: Literal) =>
        VersionedTable.mayMatch(cs(a.name), None, Some(ext(l)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        VersionedTable.mayMatch(cs(a.name), None, Some(ext(l)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        VersionedTable.mayMatch(cs(a.name), None, Some(ext(l)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        VersionedTable.mayMatch(cs(a.name), None, Some(ext(l)))
      case LessThan(l: Literal, a: AttributeReference) =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), None)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        VersionedTable.mayMatch(cs(a.name), Some(ext(l)), None)
      case In(a: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(l => VersionedTable.mayMatch(cs(a.name),
          Some(ext(l.asInstanceOf[Literal])),
          Some(ext(l.asInstanceOf[Literal]))))
      case InSet(a: AttributeReference, vs) =>
        vs.exists { v =>
          val x = v match { case u: UTF8String => u.toString; case o => o }
          VersionedTable.mayMatch(cs(a.name), Some(x), Some(x))
        }
      case IsNull(a: AttributeReference) =>
        VersionedTable.mayMatchNullness(cs(a.name), wantNull = true)
      case IsNotNull(a: AttributeReference) =>
        VersionedTable.mayMatchNullness(cs(a.name), wantNull = false)
      case _ => true
    }
  }
}
