package graft.ext

import graft.sources.{DeltaLogFileIndex, DeltaLogRead}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Applies Delta Lake DELETION VECTORS at scan time — the reader half
  * of the `deletionVectors` table feature (delta.io `PROTOCOL.md`),
  * expressed as the same analysis-time rewrite [[GraftMorScan]] /
  * [[IcebergMorScan]] use:
  *
  * {{{
  *   Union(
  *     scan(adds WITHOUT a DV),                    // stock pruned path
  *     antiJoin(scan(DV-carrying adds) + _metadata(file, row_index),
  *              decoded DV positions))             // resolving path
  * }}}
  *
  * DV bitmaps ([[graft.sources.RoaringBitmapArray]] portable format,
  * inline-z85 or `.bin` sidecar files) decode DRIVER-side — they are
  * log metadata, the same cost class as the replay itself — bounded by
  * [[DeltaLogRead.MaxDecodedPositions]] with a compact-first refusal
  * beyond it. Only DV-carrying files pay the anti-join; a 100 TB table
  * with one point delete resolves one file. The raw listing keeps a
  * physical-time gate ([[DeltaLogFileIndex.listFiles]]): a session
  * without this rule fails loudly instead of resurrecting deleted
  * rows.
  */
case class DeltaMorScan(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[DeltaLogFileIndex] &&
            r.location.asInstanceOf[DeltaLogFileIndex]
              .currentSnapshot.adds.exists(_.deletionVector.isDefined) =>
        val idx = r.location.asInstanceOf[DeltaLogFileIndex]
        val (cleanSnap, touched) =
          DeltaLogRead.dvSplit(session, idx.currentSnapshot)
        val clean = l.copy(
          relation = DeltaLogRead.relation(session, cleanSnap))
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
                    s"delta DV rewrite: resolved read of ${idx.root} " +
                      s"lacks column ${a.name}"))
                Alias(src, a.name)(NamedExpression.newExprId)
              },
              resolvedPlan)
            Union(clean, aligned)
        }
    }
}
