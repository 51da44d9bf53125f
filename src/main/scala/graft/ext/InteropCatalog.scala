package graft.ext

import java.util.{Set => JSet}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{DeltaLog, IcebergMeta}

/** A Delta or Iceberg root resolved through a NAMED graft catalog
  * identifier (`lake.db.t`) — the DSv2 `Table` seam that lets the
  * interop formats share the catalog surface graft tables already
  * have ([[GraftCatalog]]).
  *
  * Split of responsibilities, mirroring the graft DSv2 design:
  *
  *  - READS: this table never scans. [[InteropCatalogScan]] (a
  *    post-hoc resolution rule) swaps the catalog-resolved relation
  *    for the format's own v1 read — the full replay path with MOR
  *    deletes, deletion vectors, column mapping, defaults and geo
  *    lifts already applied by the rules that own them. A session
  *    without the extensions fails loudly in [[newScanBuilder]]
  *    instead of mis-reading (the [[graft.sources
  *    .IcebergMetaFileIndex]] posture).
  *  - WRITES: `INSERT INTO` / `INSERT OVERWRITE` / CTAS land through
  *    the public V1 write fallback ([[V1Write]] →
  *    [[InsertableRelation]]), committing through
  *    [[DeltaLog.commit]] / [[IcebergMeta.append]]/`overwrite` — the
  *    same protocol-checked commit paths the path-addressed route
  *    uses. No extension rule needed on the write side.
  *  - DML: DELETE/UPDATE/MERGE on the identifier lower through
  *    [[GraftDmlRewrite]] (which matches this table like it matches
  *    [[graft.sources.Graft2Table]]) to the formats' COW/MOR command
  *    family.
  *
  * `travel` carries the format reader's own pinning options
  * (`versionAsOf`/`timestampAsOf` for delta-log, `snapshotId`/
  * `refAsOf`/`timestampAsOf` for iceberg-meta); a pinned table
  * refuses writes — snapshots are immutable. */
class InteropTable(
    val root: String,
    val format: String, // "delta-log" | "iceberg-meta"
    val travel: Map[String, String],
    tableSchema: StructType,
    identName: String) extends Table with SupportsRead with SupportsWrite {

  def pinned: Boolean = travel.nonEmpty

  override def name(): String = identName
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    throw new UnsupportedOperationException(
      s"graft catalog: reading $identName ($format) requires the graft " +
        "extensions (spark.sql.extensions=graft.ext.GraftExtensions) — " +
        "the catalog read rewrite routes it through the format's full " +
        "replay; a raw scan would mis-read deletes and mappings")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncating = false
      override def truncate(): WriteBuilder = { truncating = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                overwrite: Boolean): Unit = {
              require(travel.isEmpty,
                s"$format: cannot write to a time-travel-pinned " +
                  "relation (snapshots are immutable)")
              val over = truncating || overwrite
              format match {
                case "delta-log" =>
                  // the table's own partitioning must restate on every
                  // commit (DeltaLog.commit's append check) — without
                  // this a catalog-created PARTITIONED BY table would
                  // be un-insertable through its identifier
                  DeltaLog.commit(data, root,
                    mode = if (over) "overwrite" else "append",
                    partitionBy = DeltaLog.snapshot(
                      data.sparkSession, root).partitionColumns)
                case "iceberg-meta" =>
                  if (over) IcebergMeta.overwrite(
                    data.sparkSession, root, data)
                  else IcebergMeta.append(data, root)
                case other => throw new IllegalStateException(
                  s"graft catalog: unknown interop format $other")
              }
            }
          }
      }
    }
}

/** Swaps a catalog-resolved [[InteropTable]] relation for the
  * format's own fully-shaped v1 read (nested re-resolution, so the
  * MOR/DV/mapping/default/geo rules have already run over the
  * subtree), re-anchored under the original output ids — the same
  * mechanism [[Graft2Refresh]] uses for ineligible graft snapshots.
  * Relations standing as a WRITE command's target are left alone:
  * the write side goes through the table's own V1 write fallback. */
case class InteropCatalogScan(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // reference identity of write targets: AppendData /
    // OverwriteByExpression hold their table as a child relation the
    // swap must not touch
    val writeTargets =
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        writeTargets.add(w.table)
      case _ => ()
    }
    plan.transformUp {
      case rel @ DataSourceV2Relation(t: InteropTable, out, _, _, _, _)
          if !writeTargets.contains(rel) =>
        val reader = t.travel.foldLeft(session.read.format(t.format)) {
          case (r, (k, v)) => r.option(k, v)
        }
        RealignToOriginalOutput(session,
          reader.load(t.root).queryExecution.analyzed, out,
          s"graft catalog: re-resolved ${t.format} read of ${t.root}")
    }
  }
}
