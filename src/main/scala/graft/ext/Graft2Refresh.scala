package graft.ext

import graft.sources.{Graft2DataSource, Graft2Table, VersionedTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

/** Keeps DSv2-swapped graft relations FRESH — the other half of
  * [[GraftDsv2Swap]]'s contract with the v1 path's always-fresh
  * unpinned relations (CatalogFreshnessSpec):
  *
  * A v1 unpinned [[graft.sources.GraftFileIndex]] re-resolves the log
  * head at every listing, so a held DataFrame serves external commits
  * with no REFRESH. The swap bakes a resolved version into the
  * analyzed tree instead — so on every RE-analysis (each new action
  * re-runs the analyzer over the tree) this rule, injected FIRST in
  * the post-hoc batch:
  *
  *  - re-points a refreshable [[Graft2Table]] at the CURRENT latest
  *    version (output attributes kept — the baseline schema must stay
  *    a valid projection of the new snapshot, the v1 contract; a
  *    dropped or re-typed baseline column refuses loudly);
  *  - swaps the relation BACK to a fresh v1 relation when the current
  *    snapshot became INELIGIBLE for the v2 scan (an external MOR
  *    delete or column rename landed): the v1 scan rewrites that run
  *    later in this same batch ([[GraftMorScan]], the mapping rules)
  *    then serve it — deleted rows are resolved, never silently
  *    included, and never a refusal the v1 path would have served.
  */
/** Re-anchor a freshly-resolved v1 read under a replaced relation's
  * ORIGINAL output ids — the one idiom behind every "swap this
  * relation for a computed read" rule ([[Graft2Refresh]]'s two
  * fallbacks, [[InteropCatalogScan]]): resolver-matched by name,
  * aliased under the original exprId/qualifier so parent references
  * re-bind for free, loud on a missing column. */
private[ext] object RealignToOriginalOutput {
  def apply(session: SparkSession,
      resolved: LogicalPlan,
      out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      what: String): LogicalPlan = {
    val resolver = session.sessionState.analyzer.resolver
    Project(
      out.map { a =>
        val src = resolved.output.find(o => resolver(o.name, a.name))
          .getOrElse(throw new IllegalStateException(
            s"$what lacks column ${a.name}"))
        Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      },
      resolved)
  }
}

case class Graft2Refresh(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case rel @ DataSourceV2Relation(t: Graft2Table, out, _, _, _, _)
        if t.refreshable =>
      val root = t.root
      val latest = VersionedTable.latestVersion(root)
      val clean = !VersionedTable.hasTombstones(root, latest) &&
        !VersionedTable.hasColumnMapping(root, latest)
      if (clean) {
        if (latest == t.snapshotVersion) rel
        else {
          val schema = Graft2DataSource.asNullable(
            VersionedTable.tableSchema(root, latest).getOrElse(
              throw new IllegalStateException(
                s"$root v$latest has no schema metadata")))
            .asInstanceOf[StructType]
          // gates re-fire on refresh: every baseline column must still
          // project, name and type intact
          out.foreach { a =>
            val f = schema.fields.find(f =>
              session.sessionState.analyzer.resolver(f.name, a.name))
            require(f.exists(_.dataType ==
              Graft2DataSource.asNullable(a.dataType)),
              s"graft: cached relation of $root no longer projects " +
                s"onto v$latest (column ${a.name}) — re-read the table")
          }
          rel.copy(table = new Graft2Table(root, latest, schema,
            refreshable = true))
        }
      } else {
        // back to the v1 path under the ORIGINAL output ids — via a
        // full nested re-resolution, so the MOR/mapping rewrites have
        // ALREADY shaped the subtree (deleted rows resolved, renamed
        // columns restored) by the time it lands here
        RealignToOriginalOutput(session,
          session.read.format("graft").load(root)
            .queryExecution.analyzed,
          out, s"graft: re-resolved read of $root")
      }

    // a TRAVEL-pinned catalog relation (`lake.db.t VERSION AS OF v`)
    // whose snapshot carries MOR tombstones or column mapping cannot
    // be served by the DSv2 scan — swap it to the equivalent PINNED
    // v1 read, which the MOR/mapping rewrites later in this batch
    // already shaped (same mechanism as the unpinned fallback above,
    // with the version kept)
    case rel @ DataSourceV2Relation(t: Graft2Table, out, _, _, _, _)
        if t.travelPinned &&
          (VersionedTable.hasTombstones(t.root, t.snapshotVersion) ||
            VersionedTable.hasColumnMapping(t.root, t.snapshotVersion)) =>
      RealignToOriginalOutput(session,
        session.read.format("graft")
          .option("versionAsOf", t.snapshotVersion).load(t.root)
          .queryExecution.analyzed,
        out, s"graft: re-resolved read of ${t.root}")
  }
}
