package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2b "Scans/sources", "Sinks"):
  * parquet + CSV like the reference (workflow/Extractor.py:3-9,
  * workflow/Loader.py:2-3), plus JSON-lines and the lakehouse-style
  * layouts the reference delegates to Glue/Redshift — partitioned
  * parquet (partition pruning at scan) and bucketed session-catalog
  * tables (shuffle-free co-located joins).
  *
  * Scale notes: CSV reads take an explicit schema — `inferSchema` is a
  * full extra pass over 100 TB. Partitioned writes put the partition
  * key in the directory layout so filters prune at file-listing time
  * (`PartitionFilters` in the scan node, verified in FormatsSpec).
  */
object Formats {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Header CSV with explicit schema (preferred); falls back to
    * inference only when no schema is supplied (reference behavior,
    * workflow/Extractor.py:7-9). */
  def readCsv(s: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = s.read.option("header", true)
    schema.fold(base.option("inferSchema", true))(base.schema).csv(path)
  }

  /** JSON-lines scan; explicit schema avoids the inference pass. */
  def readJson(s: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema.fold(s.read)(s.read.schema).json(path)

  /** The reference's mart sink: headered CSV directory per table. */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", true).csv(path)

  /** Hive-layout partitioned parquet: equality filters on `cols` prune
    * whole directories at listing time. */
  /** Hive-partitioned parquet mart. The pre-write `repartition` on the
    * partition columns is the small-files guard: without it EVERY task
    * holding rows of a partition value writes its own file there (up
    * to tasks × partitions files — the classic partitioned-write
    * explosion that at 100 TB turns the downstream listing into the
    * bottleneck); with it each partition value lands in exactly one
    * task, so one file per directory. Skew note: a hot partition value
    * then writes through one task — split such values with an extra
    * salt column in `cols` if a single value dominates. */
  def writePartitionedParquet(df: DataFrame, path: String,
      cols: Seq[String], mode: String = "overwrite"): Unit =
    df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Bucketed, sorted session-catalog table: joins/aggregations on
    * `key` across two tables bucketed the same way need no exchange. */
  def writeBucketedTable(df: DataFrame, table: String, key: String,
      buckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode).bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Pluggable lakehouse-format catalog table write. `format` is any
    * registered DataSourceV2 short name — "parquet" (the offline
    * baseline here), or "delta" / "iceberg" when those connectors are
    * on the classpath; the call site is identical, which is the whole
    * point of the pluggable layer. Partition columns land in the
    * catalog metadata so partition pruning survives `saveAsTable`. */
  def writeTable(df: DataFrame, table: String,
      format: String = "parquet", partitionCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode).format(format)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .saveAsTable(table)
  }

  /** Catalog table read — format-agnostic by construction (the catalog
    * resolves the provider recorded at write time). */
  def readTable(s: SparkSession, table: String): DataFrame = s.table(table)

  /** Schema-evolution read: union the schemas of all parquet footers
    * under `path` (columns added by later writer versions appear as
    * NULL in older files). Off by default in Spark because footer
    * merging lists every file — acceptable at read-of-evolved-table
    * time, wrong as a permanent default at 100 TB; a real lakehouse
    * table format (Delta/Iceberg) tracks the schema in metadata and
    * skips the footer scan, which is exactly what [[writeTable]]'s
    * pluggable layer buys when one of those connectors is present. */
  def readParquetEvolved(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", true).parquet(path)
}
