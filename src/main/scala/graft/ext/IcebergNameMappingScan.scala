package graft.ext

import graft.sources.{IcebergMetaFileIndex, IcebergMetaRead}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Name-mapping scan rewrite — how an Iceberg table whose
  * `schema.name-mapping.default` maps field ids to DIFFERENTLY-named
  * parquet columns reads correctly (the UniForm mirror of a
  * COLUMN-MAPPED Delta table: parquet carries physical names like
  * `col-3f9a`, the Iceberg schema carries logical names with ids
  * equal to the Delta column-mapping ids, and the name mapping ties
  * them together — the spec's mechanism for exactly this).
  *
  * The relation's scan re-plans in PHYSICAL space (schema and
  * per-file stats keys renamed through the mapping, so file pruning
  * still fires on the pushed physical predicates) and a Project
  * restores the logical names under the ORIGINAL output ids — the
  * same shape as [[DeltaColumnMappingScan]] on the Delta side. The
  * raw scan without extensions refuses loudly
  * ([[IcebergMetaFileIndex]]'s physical-time gate) — a name-mapped
  * snapshot scanned by logical names would null-fill every mapped
  * column, a wrong answer. */
case class IcebergNameMappingScan(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case LogicalRelation(r: HadoopFsRelation, out, _, _, _)
        if r.location.isInstanceOf[IcebergMetaFileIndex] &&
          r.location.asInstanceOf[IcebergMetaFileIndex]
            .snap.physicalByName.nonEmpty =>
      val snap = r.location.asInstanceOf[IcebergMetaFileIndex].snap
      val pbn = snap.physicalByName
      val physSchema = StructType(snap.schema.fields.map(f =>
        f.copy(name = pbn.getOrElse(f.name, f.name))))
      val physFiles = snap.files.map(f => f.copy(stats =
        f.stats.map { case (n, cs) => pbn.getOrElse(n, n) -> cs }))
      val physSnap = snap.copy(schema = physSchema, files = physFiles,
        physicalByName = Map.empty)
      val physRel = LogicalRelation(
        IcebergMetaRead.relation(session, physSnap),
        isStreaming = false)
      // positional: physSchema fields mirror snap.schema's order
      Project(
        out.zip(physRel.output).map { case (a, p) =>
          Alias(p, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        },
        physRel)
  }
}
