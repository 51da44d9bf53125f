package graft.ext

import graft.sources.{IcebergMetaFileIndex, IcebergMetaRead}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Applies Iceberg v2 POSITIONAL delete files at scan time — the
  * Iceberg merge-on-read contract, expressed as the same analysis-time
  * plan rewrite [[GraftMorScan]] uses for graft's own tombstones:
  *
  * {{{
  *   Union(
  *     scan(files outside every delete's file_path bounds), // stock path
  *     antiJoin(scan(touched files) + _metadata(file, pos),
  *              delete-file rows))                          // resolving
  * }}}
  *
  * File-level targeting comes from the delete manifests' file_path
  * bounds alone (reserved field id 2147483546) — no delete parquet is
  * read for the clean majority, so a 100 TB table with one point
  * delete pays the anti-join for ONE file. The raw listing keeps a
  * physical-time gate ([[IcebergMetaFileIndex.listFiles]]): a session
  * without this rule fails loudly instead of resurrecting deleted
  * rows.
  *
  * EQUALITY deletes (content=2) rewrite through
  * [[IcebergMetaRead.morRead]] instead: data files partition by which
  * equality deletes apply (the spec's strict seq ordering — later
  * appends out-scope older deletes), each branch gets positional
  * deletes via the split above plus one broadcast null-safe anti-join
  * per equality-column set.
  *
  * v3 DELETION VECTORS ride the same positional split: each DV names
  * its one target file (`referenced_data_file`), so the touched set is
  * exact from metadata alone; blobs decode driver-side
  * ([[IcebergMetaRead.dvPositions]], ceiling-guarded) and anti-join on
  * `(file, _metadata.row_index)` like delete-parquet rows.
  */
case class IcebergMorScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[IcebergMetaFileIndex] && {
            val s = r.location.asInstanceOf[IcebergMetaFileIndex].snap
            s.deletes.nonEmpty || s.eqDeletes.nonEmpty ||
              s.dvs.nonEmpty || s.needsDefaultFill ||
              s.schema.exists(f =>
                graft.sources.IcebergMeta.isGeoType(f.dataType))
          } =>
        val idx = r.location.asInstanceOf[IcebergMetaFileIndex]
        val snap = idx.snap
        val resolver = session.sessionState.analyzer.resolver
        def align(df: org.apache.spark.sql.DataFrame,
            keepIds: Boolean): LogicalPlan = {
          val resolvedPlan = df.queryExecution.analyzed
          Project(
            l.output.map { a =>
              val src = resolvedPlan.output
                .find(o => resolver(o.name, a.name))
                .getOrElse(throw new IllegalStateException(
                  s"iceberg MOR rewrite: resolved read of " +
                    s"${snap.root} lacks column ${a.name}"))
              // keepIds: this plan REPLACES l wholesale, so reusing
              // l's exprIds re-anchors every parent reference for free
              Alias(src, a.name)(
                if (keepIds) a.exprId else NamedExpression.newExprId)
            },
            resolvedPlan)
        }
        if (snap.eqDeletes.nonEmpty || snap.needsDefaultFill ||
            snap.schema.exists(f =>
              graft.sources.IcebergMeta.isGeoType(f.dataType))) {
          // v3 DEFAULT VALUES route through morRead too: its scan
          // branches apply the per-file-group default coalesce (and
          // compose with every delete kind); the positional-only
          // fast path below keeps a RAW clean-majority relation,
          // which would null-fill where the default must read.
          // GEO columns likewise: the raw relation claims GEOMETRY/
          // GEOGRAPHY output but the files store WKB — the computed
          // read lifts them above the scan
          align(IcebergMetaRead.morRead(session, snap), keepIds = true)
        } else {
          val (cleanSnap, touched) =
            IcebergMetaRead.posDeleteSplit(session, snap)
          val clean = l.copy(
            relation = IcebergMetaRead.relation(session, cleanSnap))
          touched match {
            case None => clean
            case Some(df) => Union(clean, align(df, keepIds = false))
          }
        }
    }
}
