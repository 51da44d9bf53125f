package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{
  RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.TimestampType

/** SQL time travel — `SELECT ... FROM t VERSION AS OF n` /
  * `TIMESTAMP AS OF ts` — on graft (and interop) catalog tables.
  *
  * Spark parses the clause into a [[RelationTimeTravel]] node, but its
  * analyzer only resolves it for DSv2 tables; a v1 session-catalog
  * table throws `UNSUPPORTED_FEATURE.TIME_TRAVEL` from INSIDE the
  * builtin resolution rule — before any extension rule can see the
  * node. So the interception happens one stage earlier, at PARSE time
  * ([[GraftTimeTravelParse]], called by [[GraftSqlParser]] on every
  * delegate-parsed plan): each `RelationTimeTravel` over a plain table
  * name is swapped for a [[GraftTimeTravelRelation]] placeholder that
  * the builtins ignore, carrying the original node for fallback.
  *
  * [[GraftTimeTravelResolve]] (an injected resolution rule, running in
  * the analyzer's main fixed-point batch so `SELECT *` expansion and
  * every downstream operator resolve against the pinned schema) then
  * looks the identifier up in the session catalog:
  *
  *  - `USING graft`       → pinned relation (`versionAsOf` for numeric
  *    versions, `tagAsOf` for tag names, `timestampAsOf` for
  *    `TIMESTAMP AS OF` literals — millis from a cast to timestamp);
  *  - `USING delta-log`   → `versionAsOf` / `timestampAsOf` (ICT-aware);
  *  - `USING iceberg-meta`→ `snapshotId` / `timestampAsOf`
  *    (snapshot-log resolution);
  *  - anything else       → the ORIGINAL node is restored and Spark's
  *    own analyzer produces its standard error on the next pass —
  *    non-graft behavior is untouched.
  *
  * The pinned relation is immutable by construction, so DML on it
  * refuses downstream (`GraftDmlRewrite.refusePinned`) exactly as with
  * `option("versionAsOf", ...)` reads.
  */
case class GraftTimeTravelRelation(ident: Seq[String],
    timestamp: Option[Expression], version: Option[String],
    original: LogicalPlan) extends LeafNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
}

object GraftTimeTravelParse {
  /** Parse-time rewrite: hide every `RelationTimeTravel` over a bare
    * table reference from the builtin analyzer (see class doc). */
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case t @ RelationTimeTravel(u: UnresolvedRelation, ts, v) =>
      GraftTimeTravelRelation(u.multipartIdentifier, ts, v, t)
  }
}

case class GraftTimeTravelResolve(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      // wait for the fixed point to resolve the timestamp expression
      // (function lookup, implicit casts) before evaluating it
      case t: GraftTimeTravelRelation if t.timestamp.forall(_.resolved) =>
        resolve(t)
    }

  private def resolve(t: GraftTimeTravelRelation): LogicalPlan = {
    val catalog = session.sessionState.catalog
    val ti = t.ident match {
      case Seq(tbl) => Some(TableIdentifier(tbl))
      case Seq(db, tbl) => Some(TableIdentifier(tbl, Some(db)))
      case Seq(cat, db, tbl) if cat.equalsIgnoreCase("spark_catalog") =>
        Some(TableIdentifier(tbl, Some(db)))
      case _ => None
    }
    val meta = ti.filter(catalog.tableExists).map(catalog.getTableMetadata)
    meta.flatMap(_.provider).map(_.toLowerCase) match {
      case Some(p @ ("graft" | "delta-log" | "iceberg-meta")) =>
        val opts = Map.newBuilder[String, String]
        opts += "path" -> meta.get.location.getPath
        p match {
          case "graft" =>
            t.version.foreach { v =>
              opts += (if (v.forall(_.isDigit)) "versionAsOf" -> v
              else "tagAsOf" -> v)
            }
            t.timestamp.foreach(e =>
              opts += "timestampAsOf" -> tsMillis(e).toString)
          case "delta-log" =>
            // TIMESTAMP AS OF resolves through the authoritative
            // per-commit timestamps (recorded inCommitTimestamp where
            // the ICT feature governs, commit-file mtime below it)
            t.version.foreach(v => opts += "versionAsOf" -> v)
            t.timestamp.foreach(e =>
              opts += "timestampAsOf" -> tsMillis(e).toString)
          case "iceberg-meta" =>
            // TIMESTAMP AS OF resolves through the snapshot-log's
            // timestamp-ms (current-pointer history, spec)
            t.version.foreach(v => opts += "snapshotId" -> v)
            t.timestamp.foreach(e =>
              opts += "timestampAsOf" -> tsMillis(e).toString)
        }
        val ds: org.apache.spark.sql.sources.RelationProvider = p match {
          case "graft" => new graft.sources.GraftDataSource()
          case "delta-log" => new graft.sources.DeltaLogDataSource()
          case _ => new graft.sources.IcebergMetaDataSource()
        }
        LogicalRelation(
          ds.createRelation(session.sqlContext, opts.result()),
          isStreaming = false)
      case _ => t.original // Spark's own (refusing) path, untouched
    }
  }

  /** `TIMESTAMP AS OF <literal>` → epoch millis via a Catalyst cast in
    * the session timezone — accepts timestamp, date, and the usual
    * string spellings, refuses non-literals (a correlated timestamp
    * would make the snapshot choice non-deterministic per row). */
  private def tsMillis(e: Expression): Long = {
    val micros =
      try {
        require(e.foldable,
          s"TIMESTAMP AS OF must be a literal, got: ${e.sql}")
        Cast(e, TimestampType,
          Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null)
      } catch {
        case ia: IllegalArgumentException => throw ia
        case scala.util.control.NonFatal(ex) =>
          // malformed literal under ANSI cast, or an expression that is
          // foldable but not evaluable at analysis time
          throw new IllegalArgumentException(
            s"TIMESTAMP AS OF: cannot read ${e.sql} as a timestamp " +
              s"literal (${ex.getMessage})", ex)
      }
    require(micros != null,
      s"TIMESTAMP AS OF: cannot read ${e.sql} as a timestamp")
    micros.asInstanceOf[Long] / 1000L
  }
}
