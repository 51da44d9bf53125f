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
        val ndv = IcebergCboStats.ndvFor(snap.root, snap.snapshotId)
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

object IcebergCboStats {

  /** Positive-result cache: statistics are IMMUTABLE per (root,
    * snapshot) once read, and this rule runs on every query analysis
    * — without the cache a REST-cataloged table pays one metadata GET
    * + Puffin footer read per planned relation. Negative results are
    * NOT cached (an ANALYZE publishes stats WITHOUT moving the
    * snapshot, and the very next plan must see them); tables without
    * stats pay one cheap metadata parse per plan, the same cost class
    * as the index's own freshness probe. Bounded: cleared wholesale
    * past 1024 entries (a cap, not an LRU — stats maps are tiny). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Map[String, Long]]()

  // canonical key — lookup (ndvFor) and invalidation (writeStatistics
  // replacing a snapshot's statistics entry in place) must agree on
  // the root's spelling
  private def keyOf(root: String, snapshotId: Long): (String, Long) =
    (java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString,
      snapshotId)

  /** Drop the cached NDVs for one (root, snapshot): ANALYZE replaces
    * that snapshot's statistics entry WITHOUT moving the snapshot, so
    * without invalidation a re-ANALYZE would keep serving the old
    * numbers for the rest of the session. */
  def invalidate(root: String, snapshotId: Long): Unit = {
    cache.remove(keyOf(root, snapshotId))
    ()
  }

  private[ext] def ndvFor(root: String, snapshotId: Long)
      : Map[String, Long] = {
    val key = keyOf(root, snapshotId)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val ndv =
        try IcebergMeta.columnNdv(root, Some(snapshotId))
        catch { case scala.util.control.NonFatal(_) =>
          Map.empty[String, Long] }
      if (ndv.nonEmpty) {
        if (cache.size > 1024) cache.clear()
        cache.put(key, ndv)
      }
      ndv
    }
  }
}
