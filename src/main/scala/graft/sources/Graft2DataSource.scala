package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, Statistics, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{
  DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 `TableProvider` read path for graft tables — the migration
  * SPIKE the v1 datasource will eventually retire into, registered
  * under its own short name so the production `format("graft")`
  * surface stays v1 until parity:
  *
  * {{{
  *   spark.read.format("graft2").load(root)
  *   spark.read.format("graft2").option("versionAsOf", 3).load(root)
  * }}}
  *
  * What the spike proves end-to-end on the PUBLIC connector API
  * (org.apache.spark.sql.connector.*, no private[sql] shims — the
  * point of the migration):
  *  - pushed data filters prune FILES from the manifest's min/max
  *    stats, null counts, and bloom sidecars BEFORE planning, with
  *    the same ratios as the v1 [[GraftFileIndex]] (observable via
  *    [[Graft2DataSource.lastPlanned]]); every filter is returned as
  *    residual, so Spark re-applies them row-wise and pruning can
  *    never change an answer;
  *  - column pruning reaches the parquet read (the requested
  *    projection is pushed into the reader's schema);
  *  - manifest-reported `sizeInBytes` drives planning
  *    ([[SupportsReportStatistics]]) — broadcast decisions without a
  *    filesystem stat.
  *
  * The row reader is parquet-mr's example Group API — correct and
  * dependency-free, but row-at-a-time (no vectorization, no codegen).
  * That is the honest cost of DSv2-from-public-API today and the
  * reason `format("graft")` stays on the v1 `HadoopFsRelation` path
  * (stock vectorized reader + whole-stage codegen) until a
  * vectorized DSv2 reader lands. Feature gates: snapshots with MOR
  * tombstones or column mapping refuse loudly (read those through
  * `format("graft")`).
  */
class Graft2DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft2"

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft2 requires a path"))
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
  }

  private def snapshotOf(options: CaseInsensitiveStringMap)
      : (String, Long) = {
    val root = rootOf(options)
    val latest = VersionedTable.latestVersion(root)
    require(latest >= 0, s"$root is not a graft table (empty log)")
    val v = Option(options.get("versionAsOf")).map(_.toLong).getOrElse(latest)
    require(v >= 0 && v <= latest, s"version $v out of range [0, $latest]")
    (root, v)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (root, v) = snapshotOf(options)
    VersionedTable.tableSchema(root, v).getOrElse(
      throw new IllegalStateException(
        s"$root has no schema metadata — commit through VersionedTable"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (root, v) = snapshotOf(options)
    new Graft2Table(root, v, schema)
  }
}

object Graft2DataSource {
  /** (files kept, files total) of the most recent planInputPartitions
    * per table root — spec observability for pruning, the DSv2
    * sibling of [[GraftFileIndex.lastListing]]. */
  val lastPlanned = scala.collection.concurrent.TrieMap[String, (Int, Int)]()
}

class Graft2Table(root: String, version: Long, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft2:$root@v$version"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Graft2ScanBuilder(root, version, schema)
}

class Graft2ScanBuilder(root: String, version: Long, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var filters: Array[Filter] = Array.empty

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // ALL residual: the source prunes files, Spark re-checks rows
  }
  override def pushedFilters(): Array[Filter] = filters
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new Graft2Scan(root, version, full, required, filters)
}

class Graft2Scan(root: String, version: Long, full: StructType,
    required: StructType, filters: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft2 $root v$version cols=[${required.fieldNames.mkString(",")}] " +
      s"pushed=[${filters.mkString(",")}]"

  override def estimateStatistics(): Statistics = new Statistics {
    private val sizes = Graft2Scan.planState(root, version)._2
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(sizes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (files, _) = Graft2Scan.planState(root, version)
    val keep = files.filter { case (_, stats, bloomRels) =>
      // blooms loaded lazily once per (file, column), through the data
      // seam — and probed ONLY for the column they index (a probe of
      // column B against column A's bloom would wrongly prune files)
      val loaded =
        scala.collection.mutable.Map[String,
          org.apache.spark.util.sketch.BloomFilter]()
      def bloomFor(col: String) = bloomRels.get(col).map(rel =>
        loaded.getOrElseUpdate(col,
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(
              VersionedTable.readDataBytes(root, rel)))))
      filters.forall(f => Graft2Scan.mayMatch(stats, bloomFor, f))
    }
    Graft2DataSource.lastPlanned(root) = (keep.size, files.size)
    keep.map { case (abs, _, _) =>
      Graft2Partition(abs, required.fieldNames): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Graft2ReaderFactory(required)
}

object Graft2Scan {
  /** Driver-side snapshot resolution: (per-file (absolute path, stats,
    * bloom sidecars KEYED BY INDEXED COLUMN), total bytes). Refuses
    * tombstoned or column-mapped snapshots (this path cannot honor
    * them). */
  private[sources] def planState(root: String, v: Long)
      : (Seq[(String, Map[String, VersionedTable.ColStats],
          Map[String, String])],
        Long) = {
    val st = VersionedTable.state(root, v)
    if (st.tombs.values.exists(_.nonEmpty))
      throw new UnsupportedOperationException(
        s"graft2: snapshot v$v of $root carries merge-on-read " +
          "tombstones — read via format(\"graft\") (MOR scan rewrite)")
    if (st.colMap.nonEmpty)
      throw new UnsupportedOperationException(
        s"graft2: snapshot v$v of $root has renamed columns — read via " +
          "format(\"graft\")")
    val files = st.files.map { f =>
      val stats = st.stats.getOrElse(f, Map.empty)
      val bloomRels = st.blooms.collect {
        case ((ff, col), sc) if ff == f => col -> sc
      }.toMap
      (VersionedTable.dataPath(root, f).toString, stats, bloomRels)
    }
    val bytes = st.files.map(f => st.sizes.getOrElse(f, 0L)).sum
    (files, bytes)
  }

  /** Can any row of a file with `stats` satisfy v1-filter `f`?
    * `bloom(col)` yields the file's sidecar indexing exactly `col`
    * (probing a bloom built over a DIFFERENT column would prune files
    * that do contain matches — mirrors [[GraftFileIndex]]'s
    * `(file, column)`-keyed bloomOk). Unrecognized shapes keep the
    * file (conservative). */
  private[sources] def mayMatch(stats: Map[String, VersionedTable.ColStats],
      bloom: String => Option[org.apache.spark.util.sketch.BloomFilter],
      f: Filter): Boolean = {
    def cs(c: String) = stats.get(c)
    f match {
      case org.apache.spark.sql.sources.And(a, b) =>
        mayMatch(stats, bloom, a) && mayMatch(stats, bloom, b)
      case org.apache.spark.sql.sources.Or(a, b) =>
        mayMatch(stats, bloom, a) || mayMatch(stats, bloom, b)
      case EqualTo(c, v) =>
        VersionedTable.mayMatch(cs(c), Some(v), Some(v)) &&
          bloom(c).forall(_.mightContainString(VersionedTable.bloomProbe(v)))
      case In(c, vs) =>
        vs.exists(v => VersionedTable.mayMatch(cs(c), Some(v), Some(v)))
      case GreaterThan(c, v) => VersionedTable.mayMatch(cs(c), Some(v), None)
      case GreaterThanOrEqual(c, v) =>
        VersionedTable.mayMatch(cs(c), Some(v), None)
      case LessThan(c, v) => VersionedTable.mayMatch(cs(c), None, Some(v))
      case LessThanOrEqual(c, v) =>
        VersionedTable.mayMatch(cs(c), None, Some(v))
      case IsNull(c) =>
        VersionedTable.mayMatchNullness(cs(c), wantNull = true)
      case IsNotNull(c) =>
        VersionedTable.mayMatchNullness(cs(c), wantNull = false)
      case _ => true
    }
  }
}

/** One file = one partition (graft data files are written to target
  * size; at 100 TB split planning would mirror the v1 path's
  * maxPartitionBytes — out of spike scope). */
case class Graft2Partition(file: String, columns: Array[String])
    extends InputPartition

class Graft2ReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new Graft2Reader(p.asInstanceOf[Graft2Partition], required)
}

/** Row-at-a-time parquet reader over the example Group API — public
  * parquet-mr only. Supported types: the graft catalog's scalar set
  * (long/int/short/byte, double/float, string, boolean, date). */
class Graft2Reader(p: Graft2Partition, required: StructType)
    extends PartitionReader[InternalRow] {

  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group

  private val conf = new org.apache.hadoop.conf.Configuration()
  locally {
    // projection pushdown: request only the needed columns
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.file), conf))
    val fileSchema = try footer.getFooter.getFileMetaData.getSchema
    finally footer.close()
    val wanted = required.fieldNames.filter(fileSchema.containsField)
    if (wanted.nonEmpty) {
      val proj = new org.apache.parquet.schema.MessageType("spark_schema",
        wanted.map(n =>
          fileSchema.getType(Seq(n): _*)): _*)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        proj.toString)
    }
  }

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(p.file)).withConf(conf).build()

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      val schema = current.getType
      vals(i) =
        if (!schema.containsField(f.name)) null // added-column evolution
        else {
          val idx = schema.getFieldIndex(f.name)
          if (current.getFieldRepetitionCount(idx) == 0) null
          else {
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            val prim = schema.getType(idx).asPrimitiveType()
              .getPrimitiveTypeName
            f.dataType match {
              // type-widened tables: old files keep narrow physical
              // types; up-cast like the vectorized reader does
              case LongType if prim == INT32 =>
                current.getInteger(idx, 0).toLong
              case LongType => current.getLong(idx, 0)
              case IntegerType => current.getInteger(idx, 0)
              case ShortType => current.getInteger(idx, 0).toShort
              case ByteType => current.getInteger(idx, 0).toByte
              case DoubleType if prim == FLOAT =>
                current.getFloat(idx, 0).toDouble
              case DoubleType => current.getDouble(idx, 0)
              case FloatType => current.getFloat(idx, 0)
              case BooleanType => current.getBoolean(idx, 0)
              case DateType => current.getInteger(idx, 0)
              case StringType =>
                UTF8String.fromBytes(current.getBinary(idx, 0).getBytes)
              case other => throw new UnsupportedOperationException(
                s"graft2 reader: type $other not in the spike's scalar " +
                  "set — read via format(\"graft\")")
            }
          }
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}
