package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister,
  RelationProvider}
import org.apache.spark.sql.types.StructType

/** `spark.read.format("iceberg-meta").load(root)` — read a REAL
  * Apache Iceberg table through the [[IcebergMeta]] metadata-tree
  * reader, no iceberg-spark runtime needed:
  *
  * {{{
  *   spark.read.format("iceberg-meta").load(root)               // current
  *   spark.read.format("iceberg-meta")
  *     .option("snapshotId", 123456789L).load(root)             // time travel
  * }}}
  *
  * Same integration shape as the Delta and graft sources: the replayed
  * snapshot backs a [[FileIndex]] inside Spark's stock parquet
  * `HadoopFsRelation` (vectorized reads, codegen, column pruning),
  * while `listFiles` skips files whose manifest-recorded column
  * bounds (spec single-value serialization, decoded into the shared
  * [[VersionedTable.ColStats]] model) cannot match the pushed
  * filters. Iceberg data files carry ALL columns (identity partition
  * values included), so no partition reconstruction is needed — the
  * file list IS the scan. Feature gates ([[IcebergMeta.snapshot]]):
  * format-version 3+, delete files/manifests, non-parquet files
  * refuse loudly.
  *
  * WRITE path: `df.write.format("iceberg-meta").mode(m).save(root)` —
  * `ErrorIfExists` creates a new table ([[IcebergMeta.writeFixture]]),
  * `Append` commits a new snapshot onto an existing one
  * ([[IcebergMeta.append]]: conditional-put `v{N+1}.metadata.json`,
  * prior snapshots stay time-travelable). `Overwrite` refuses — use
  * graft's own format for replace semantics; the interop posture here
  * is additive only. */
class IcebergMetaDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "iceberg-meta"

  private def rootOf(parameters: Map[String, String]): String = {
    val p = parameters.getOrElse("path", throw new IllegalArgumentException(
      "iceberg-meta requires a path: .load(root) / .save(root)"))
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val snap = IcebergMeta.snapshot(root,
      parameters.get("snapshotId").map(_.toLong))
    val idx = new IcebergMetaFileIndex(spark, snap)
    HadoopFsRelation(
      location = idx,
      partitionSchema = new StructType(),
      dataSchema = snap.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val root = rootOf(parameters)
    val exists = java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "metadata"))
    mode match {
      case SaveMode.Append =>
        if (exists) IcebergMeta.append(data, root)
        else IcebergMeta.writeFixture(data, root)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"iceberg-meta: $root already exists (mode=errorifexists)")
        IcebergMeta.writeFixture(data, root)
      case SaveMode.Ignore =>
        if (!exists) IcebergMeta.writeFixture(data, root)
      case SaveMode.Overwrite =>
        throw new UnsupportedOperationException(
          "iceberg-meta: Overwrite is not supported — the interop " +
            "writer is additive (append) only")
    }
    createRelation(sqlContext, parameters)
  }
}

/** Snapshot-backed [[FileIndex]] over an Iceberg metadata replay —
  * file list, sizes and bounds all from the manifests (no directory
  * listing; the reason Iceberg exists at 100 TB). The snapshot is
  * immutable by construction (Iceberg metadata documents are
  * versioned), so the index is pinned at creation. */
class IcebergMetaFileIndex(spark: SparkSession,
    snap: IcebergMeta.IceSnapshot) extends FileIndex {

  private val statuses: Seq[(IcebergMeta.IceFile, FileStatus)] =
    snap.files.map { f =>
      f -> new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
        new HPath(new java.io.File(f.path).toURI))
    }

  /** (files kept, files total) of the most recent listing. */
  @volatile var lastListing: Option[(Int, Int)] = None

  override def rootPaths: Seq[HPath] = Seq(new HPath(snap.root))
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = snap.files.map(_.sizeBytes).sum
  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep = statuses.filter { case (f, _) =>
      dataFilters.forall(e => StatsPruning.mayMatchExpr(f.stats, e))
    }
    lastListing = Some((keep.size, statuses.size))
    Seq(PartitionDirectory(InternalRow.empty, keep.map(_._2).toArray))
  }
}
