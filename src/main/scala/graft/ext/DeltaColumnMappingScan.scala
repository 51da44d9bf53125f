package graft.ext

import graft.sources.{DeltaLogFileIndex, DeltaLogRead}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Reads Delta tables with COLUMN MAPPING ('name'/'id' modes — the
  * `columnMapping` table feature): the parquet files, partition
  * directories, and stats all carry PHYSICAL column names
  * (`delta.columnMapping.physicalName` in the schema metadata), so a
  * scan resolved under logical names would read nothing. This rule
  * replaces such a scan with
  *
  * {{{
  *   Project(physical AS logical ...,   // ORIGINAL exprIds — parents
  *     scan(snapshot restated in physical column space))  // re-anchor free
  * }}}
  *
  * The physical scan is the stock pruned path (partition pruning and
  * stats skipping key on physical names, which is what the log
  * records). Runs BEFORE [[DeltaMorScan]] in injection order, so a
  * mapped table WITH deletion vectors composes: this rule exposes the
  * physical relation, the DV rule then rewrites it in physical space.
  * Raw listings without the extensions refuse
  * ([[DeltaLogFileIndex.listFiles]]); nested mapped fields refuse at
  * replay ([[graft.sources.DeltaLog]]).
  */
case class DeltaColumnMappingScan(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[DeltaLogFileIndex] &&
            r.location.asInstanceOf[DeltaLogFileIndex]
              .currentSnapshot.columnMapping.nonEmpty =>
        val idx = r.location.asInstanceOf[DeltaLogFileIndex]
        val snap = idx.currentSnapshot
        val physRel = DeltaLogRead.relation(session, snap.physical)
        val phys = LogicalRelation(physRel, isStreaming = false)
        Project(
          l.output.map { a =>
            val physName = snap.columnMapping.getOrElse(a.name, a.name)
            val src = phys.output.find(_.name == physName)
              .getOrElse(throw new IllegalStateException(
                s"delta-log column mapping: physical column $physName " +
                  s"(logical ${a.name}) missing from ${idx.root}"))
            // keep the ORIGINAL exprIds: every parent reference to
            // this relation's attributes re-anchors for free
            Alias(src, a.name)(a.exprId)
          },
          phys)
    }
}
