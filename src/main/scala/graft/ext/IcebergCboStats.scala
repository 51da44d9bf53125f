package graft.ext

import graft.sources.{IcebergMeta, IcebergMetaFileIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat,
  CatalogStatistics, CatalogStorageFormat, CatalogTable,
  CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Feeds the table's PUFFIN NDV statistics
  * ([[IcebergMeta.columnNdv]] — `apache-datasketches-theta-v1` blobs
  * published by ANALYZE / `compute_table_stats`-shaped writers)
  * into Spark's cost-based optimizer: every resolved `iceberg-meta`
  * relation that has stats gains a `CatalogStatistics` carrying
  * rowCount and per-column distinctCount, which is exactly what
  * `FilterEstimation` needs to turn an equality predicate into a
  * 1/NDV selectivity — and what `JoinSelection` then needs to pick
  * the RIGHT broadcast side.
  *
  * Why this matters at 100 TB: without NDV, a filtered fact table
  * estimates at its full scan size, so a `fact JOIN dim ON fact.k =
  * dim.k WHERE fact.high_ndv_col = x` plans a shuffle join even when
  * the filter keeps a handful of rows; with NDV the estimate shrinks
  * by the distinct count and the filtered side broadcasts — the
  * plan-shape difference IcebergCboStatsSpec pins. AQE can recover
  * some of this at RUNTIME from shuffle sizes, but only after paying
  * the first shuffle; statistics fix the INITIAL plan.
  *
  * Driver-only metadata I/O (one Puffin footer read per planned
  * relation, cached by the session's relation cache); fires only when
  * the table actually has a `statistics` entry and the relation has
  * no catalog stats yet. Stats are estimates by contract — a DV'd
  * snapshot's rowCount subtracts the deletion-vector cardinalities,
  * position-delete overlap stays an upper bound. */
case class IcebergCboStats(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case lr @ LogicalRelation(r: HadoopFsRelation, _, None, _, _)
          if r.location.isInstanceOf[IcebergMetaFileIndex] =>
        val idx = r.location.asInstanceOf[IcebergMetaFileIndex]
        val snap = idx.snap
        val ndv =
          try IcebergMeta.columnNdv(snap.root, Some(snap.snapshotId))
          catch { case scala.util.control.NonFatal(_) =>
            Map.empty[String, Long] }
        if (ndv.isEmpty) lr
        else {
          val rowCount = math.max(0L,
            snap.files.map(_.records).sum -
              snap.dvs.map(_.cardinality).sum)
          val colStats = lr.output.flatMap(a =>
            ndv.get(a.name).map(n =>
              a.name -> CatalogColumnStat(
                distinctCount = Some(BigInt(math.max(1L, n)))))).toMap
          val ct = CatalogTable(
            identifier = TableIdentifier(
              s"iceberg_meta_stats_${math.abs(snap.root.hashCode)}"),
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty,
            schema = lr.schema,
            provider = Some("iceberg-meta"),
            stats = Some(CatalogStatistics(
              sizeInBytes = BigInt(snap.files.map(_.sizeBytes).sum),
              rowCount = Some(BigInt(rowCount)),
              colStats = colStats)))
          lr.copy(catalogTable = Some(ct))
        }
    }
}
