package graft.ext

import graft.sources.{GraftFileIndex, VersionedTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Makes merge-on-read snapshots first-class for SQL reads — the Delta
  * deletion-vector read-path shape, expressed as an analysis-time plan
  * rewrite instead of a bespoke reader.
  *
  * A graft snapshot that carries MOR tombstones ([[VersionedTable
  * .deleteKeysMOR]] / [[VersionedTable.updateKeysMOR]], or SQL
  * `UPDATE ... WHERE key = v` via the point-predicate fast path)
  * cannot be served by a raw parquet file listing — the deleted rows'
  * bytes are still in the data files. Rather than refuse (the
  * pre-round-8 posture, which made a table unreadable by `SELECT`
  * right after a SQL point UPDATE), this rule rewrites every scan of
  * such a snapshot into
  *
  * {{{
  *   Union(
  *     scan(files with NO applicable tombstone),   // stock pruned path
  *     antiJoin(scan(touched files), sidecarKeys)) // resolving path
  * }}}
  *
  * The clean side keeps the original relation's output attributes (so
  * the parent plan re-anchors for free) and stays a manifest-backed
  * [[GraftFileIndex]] scan — stats/bloom/partition-tag pruning,
  * vectorized parquet, whole-stage codegen. Only the files a
  * tombstone actually applies to pay the broadcast anti-join; on a
  * 100 TB table after a point update that is one file, not the table.
  *
  * Safety: the raw listing path keeps a physical-time gate
  * ([[GraftFileIndex.listFiles]] refuses tombstoned snapshots), so a
  * session without this rule — or a plan analyzed before an external
  * MOR edit landed — fails loudly instead of resurrecting deleted
  * rows. The rewrite pins both branches to the version resolved at
  * analysis time, so one query reads one consistent snapshot.
  *
  * Runs AFTER [[GraftDmlRewrite]] (same Once batch, injection order):
  * DML statements have already been captured as leaf commands whose
  * table reference is a field, not a child, so this rule only ever
  * touches genuine read-side scans.
  */
case class GraftMorScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[GraftFileIndex] &&
            r.location.asInstanceOf[GraftFileIndex].currentHasTombstones =>
        val idx = r.location.asInstanceOf[GraftFileIndex]
        val (cleanRel, touched) = VersionedTable.morReadSplit(
          session, idx.tableRoot, idx.currentVersion)
        // same output attributes as the scan being replaced — parents
        // (and the Union below) keep resolving against l.output
        val clean = l.copy(relation = cleanRel)
        touched match {
          case None => clean
          case Some(df) =>
            val resolvedPlan = df.queryExecution.analyzed
            val resolver = session.sessionState.analyzer.resolver
            // align the resolving side to the original column order;
            // fresh exprIds are fine on the non-head Union branch
            val aligned = Project(
              l.output.map { a =>
                val src = resolvedPlan.output.find(o => resolver(o.name, a.name))
                  .getOrElse(throw new IllegalStateException(
                    s"graft MOR rewrite: resolved read of ${idx.tableRoot} " +
                      s"lacks column ${a.name}"))
                Alias(src, a.name)(NamedExpression.newExprId)
              },
              resolvedPlan)
            Union(clean, aligned)
        }
    }
}
