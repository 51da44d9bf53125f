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
  * rows. Equality deletes refuse at snapshot replay
  * ([[graft.sources.IcebergMeta.snapshot]]).
  */
case class IcebergMorScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[IcebergMetaFileIndex] &&
            r.location.asInstanceOf[IcebergMetaFileIndex]
              .snap.deletes.nonEmpty =>
        val idx = r.location.asInstanceOf[IcebergMetaFileIndex]
        val (cleanSnap, touched) =
          IcebergMetaRead.posDeleteSplit(session, idx.snap)
        val clean = l.copy(
          relation = IcebergMetaRead.relation(session, cleanSnap))
        touched match {
          case None => clean
          case Some(df) =>
            val resolvedPlan = df.queryExecution.analyzed
            val resolver = session.sessionState.analyzer.resolver
            val aligned = Project(
              l.output.map { a =>
                val src = resolvedPlan.output
                  .find(o => resolver(o.name, a.name))
                  .getOrElse(throw new IllegalStateException(
                    s"iceberg MOR rewrite: resolved read of " +
                      s"${idx.snap.root} lacks column ${a.name}"))
                Alias(src, a.name)(NamedExpression.newExprId)
              },
              resolvedPlan)
            Union(clean, aligned)
        }
    }
}
