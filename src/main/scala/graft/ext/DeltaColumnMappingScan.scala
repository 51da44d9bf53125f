package graft.ext

import graft.sources.{DeltaLogFileIndex, DeltaLogRead}
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{
  col, lit, struct, transform, transform_keys, transform_values, when}
import org.apache.spark.sql.types.{
  ArrayType, DataType, MapType, StructType}

/** Reads Delta tables with COLUMN MAPPING ('name'/'id' modes — the
  * `columnMapping` table feature): the parquet files, partition
  * directories, and stats all carry PHYSICAL column names
  * (`delta.columnMapping.physicalName` in the schema metadata, on
  * EVERY field including nested ones), so a scan resolved under
  * logical names would read nothing. This rule replaces such a scan
  * with
  *
  * {{{
  *   Project(restore(physical) AS logical ...,  // ORIGINAL exprIds
  *     scan(snapshot restated in physical column space))
  * }}}
  *
  * where `restore` is identity for flat columns and a recursive
  * REBUILD for nested ones: structs re-assemble field-by-field under
  * their logical names (NULL structs stay NULL), arrays and maps
  * restore their elements through `transform` /
  * `transform_keys`/`transform_values` — all codegen'd builtins, no
  * UDFs. The physical scan is the stock pruned path (partition
  * pruning and stats skipping key on physical names, which is what
  * the log records). Runs BEFORE [[DeltaMorScan]] in injection order,
  * so a mapped table WITH deletion vectors composes: this rule
  * exposes the physical relation, the DV rule then rewrites it in
  * physical space. Raw listings without the extensions refuse
  * ([[DeltaLogFileIndex.listFiles]]).
  */
case class DeltaColumnMappingScan(session: SparkSession)
    extends Rule[LogicalPlan] {

  /** Logical-shaped value of a physically-named column: identity for
    * leaves, recursive rebuild for structs/arrays/maps. */
  private def restore(c: Column, logical: DataType,
      physical: DataType): Column = (logical, physical) match {
    case (ls: StructType, ps: StructType) =>
      val rebuilt = struct(ls.fields.zip(ps.fields).map {
        case (lf, pf) =>
          restore(c.getField(pf.name), lf.dataType, pf.dataType)
            .as(lf.name)
      }.toSeq: _*)
      // struct(...) of a NULL struct would be a struct of NULLs — keep
      // NULL rows NULL, and cast both branches to the exact logical type
      when(c.isNotNull, rebuilt.cast(ls)).otherwise(lit(null).cast(ls))
    case (ArrayType(le, _), ArrayType(pe, _)) if le != pe =>
      transform(c, x => restore(x, le, pe))
    case (MapType(lk, lv, _), MapType(pk, pv, _))
        if lk != pk || lv != pv =>
      val keyed =
        if (lk == pk) c else transform_keys(c, (k, _) => restore(k, lk, pk))
      if (lv == pv) keyed
      else transform_values(keyed, (_, v) => restore(v, lv, pv))
    case _ => c
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.isInstanceOf[DeltaLogFileIndex] &&
            r.location.asInstanceOf[DeltaLogFileIndex]
              .currentSnapshot.columnMapping.nonEmpty =>
        val idx = r.location.asInstanceOf[DeltaLogFileIndex]
        val snap = idx.currentSnapshot
        val physSnap = snap.physical
        val physDf = GraftColumnBridge.ofRows(session,
          LogicalRelation(DeltaLogRead.relation(session, physSnap),
            isStreaming = false))
        val restored = physDf.select(l.output.map { a =>
          val lf = snap.schema.find(_.name == a.name)
            .getOrElse(throw new IllegalStateException(
              s"delta-log column mapping: ${idx.root} lacks logical " +
                s"column ${a.name}"))
          val physName = snap.columnMapping.getOrElse(a.name, a.name)
          val pf = physSnap.schema.find(_.name == physName)
            .getOrElse(throw new IllegalStateException(
              s"delta-log column mapping: physical column $physName " +
                s"(logical ${a.name}) missing from ${idx.root}"))
          restore(col(s"`$physName`"), lf.dataType, pf.dataType)
            .as(a.name)
        }.toSeq: _*)
        val resolved = restored.queryExecution.analyzed
        Project(
          l.output.map { a =>
            val src = resolved.output.find(_.name == a.name)
              .getOrElse(throw new IllegalStateException(
                s"delta-log column mapping: restored read of " +
                  s"${idx.root} lacks column ${a.name}"))
            // keep the ORIGINAL exprIds: every parent reference to
            // this relation's attributes re-anchors for free
            Alias(src, a.name)(a.exprId)
          },
          resolved)
    }
}
