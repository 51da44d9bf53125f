package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, Statistics, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo,
  PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.sources.{
  DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 `TableProvider` read path for graft tables — since round 9
  * the DEFAULT serving path for plain reads ([[graft.ext
  * .GraftDsv2Swap]] routes unpinned clean-snapshot `format("graft")`
  * reads here; `format("graft2")` loads it directly):
  *
  * {{{
  *   spark.read.format("graft2").load(root)
  *   spark.read.format("graft2").option("versionAsOf", 3).load(root)
  * }}}
  *
  * Everything runs on the PUBLIC connector API
  * (org.apache.spark.sql.connector.*):
  *  - pushed data filters prune FILES from the manifest's min/max
  *    stats, null counts, bloom sidecars (keyed per (file, column)),
  *    and hidden partition tags BEFORE planning, with the same ratios
  *    as the v1 [[GraftFileIndex]] (observable via
  *    [[Graft2DataSource.lastPlanned]]); every filter is returned as
  *    residual, so Spark re-applies them row-wise and pruning can
  *    never change an answer;
  *  - column pruning reaches the parquet read (the requested
  *    projection is pushed into the reader's schema);
  *  - manifest-reported `sizeInBytes` drives planning
  *    ([[SupportsReportStatistics]]) — broadcast decisions without a
  *    filesystem stat;
  *  - the reader is VECTORIZED: Spark's own parquet batch reader
  *    behind the columnar `PartitionReaderFactory` contract, so DSv2
  *    reads get ColumnarBatches + whole-stage codegen + parquet
  *    row-group/page pushdown + the full type surface, and surviving
  *    files split by `maxPartitionBytes` for task parallelism.
  *
  * Feature gates: snapshots with MOR tombstones or column mapping
  * refuse loudly — on the default path [[graft.ext.Graft2Refresh]]
  * routes those back to the v1 rewrites before the refusal can fire,
  * so the gate only trips on direct `format("graft2")` misuse.
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
    Graft2DataSource.asNullable(VersionedTable.tableSchema(root, v)
      .getOrElse(throw new IllegalStateException(
        s"$root has no schema metadata — commit through VersionedTable")))
      .asInstanceOf[StructType]
  }

  // a WRITE's schema comes from the query, not the (possibly not yet
  // existing) table — the contract that lets
  // `df.write.format("graft2").save(root)` create a fresh table
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val root = rootOf(options)
    val latest = VersionedTable.latestVersion(root)
    // -1 (no log yet) is a legal WRITE target; scans gate on it
    val v = Option(options.get("versionAsOf")).map(_.toLong)
      .getOrElse(latest)
    require(v <= latest, s"version $v out of range [0, $latest]")
    new Graft2Table(root, v, schema)
  }
}

object Graft2DataSource {
  /** (files kept, files total) of the most recent planInputPartitions
    * per table root — spec observability for pruning, the DSv2
    * sibling of [[GraftFileIndex.lastListing]]. */
  val lastPlanned = scala.collection.concurrent.TrieMap[String, (Int, Int)]()

  /** Nullable-normalized schema — what every Spark file source
    * exposes (a schema-evolved table's old files MISS added columns;
    * the vectorized reader null-fills them only when the requested
    * field is nullable). */
  private[graft] def asNullable(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case ArrayType(e, _) => ArrayType(asNullable(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(asNullable(k), asNullable(v), valueContainsNull = true)
    case o => o
  }
}

class Graft2Table(val root: String, val snapshotVersion: Long,
    schema: StructType,
    // true only for relations the DSv2 swap rule creates from
    // UNPINNED v1 reads: [[graft.ext.Graft2Refresh]] re-resolves them
    // to the log head on re-analysis (the v1 freshness contract);
    // datasource-created tables keep the spike's pinned-at-load shape
    val refreshable: Boolean = false,
    // true when the relation came from an EXPLICIT time travel
    // (catalog `VERSION/TIMESTAMP AS OF`) — DML must refuse on it
    // (snapshots are immutable); a head-resolved catalog load is not
    // pinned in this sense even though it is version-stamped
    val travelPinned: Boolean = false)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft2:$root@v$snapshotVersion"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(snapshotVersion >= 0,
      s"$root is not a graft table yet (write-only handle)")
    new Graft2ScanBuilder(root, snapshotVersion, schema)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new Graft2WriteBuilder(root, info.schema())
}

/** DSv2 WRITE path: `WriteBuilder` → [[Graft2BatchWrite]]. Append by
  * default; `truncate()` (Spark's v2 lowering of INSERT OVERWRITE /
  * SaveMode.Overwrite on a whole table) switches the commit action
  * to overwrite — both land through [[VersionedTable
  * .commitStagedFiles]]'s atomic manifest publish, CHECK enforcement
  * and footer-stats harvest, the SAME log commit the v1 writer uses
  * (two write APIs, one commit protocol). */
class Graft2WriteBuilder(root: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var mode = "append"
  override def truncate(): WriteBuilder = { mode = "overwrite"; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new Graft2BatchWrite(root, schema, mode)
  }
}

/** One staged parquet file a writer task produced (name only — the
  * batch knows the staging dir), or none for an empty task. */
private[sources] final case class Graft2TaskFile(name: Option[String])
  extends WriterCommitMessage

/** Driver half of the v2 write: plans one staging directory under the
  * table root (files are INVISIBLE until the manifest names them — no
  * temp-dir rename dance needed), hands executors Spark's own parquet
  * [[org.apache.spark.sql.execution.datasources.OutputWriterFactory]]
  * (same writer the v1 path uses, so footer stats/compression/types
  * are identical), and commits the returned file names through the
  * graft log. Abort deletes the staged files — and even an abort that
  * never runs leaves only manifest-unreferenced files, which FSCK
  * reports and vacuum-style cleanup may remove. */
class Graft2BatchWrite(root: String, schema: StructType, mode: String)
    extends BatchWrite {
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private val dataRel =
    s"data/v${VersionedTable.latestVersion(root) + 1}-$nonce"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    // prepareWrite CONFIGURES the job conf (write support class,
    // schema, compression) — serialize the conf AFTER it
    val owf = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    new Graft2WriterFactory(owf,
      java.nio.file.Paths.get(root, dataRel).toString, schema, nonce,
      new SerializableHadoopConf(job.getConfiguration))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case Graft2TaskFile(Some(n)) => s"$dataRel/$n"
    }.toSeq
    VersionedTable.commitStagedFiles(SparkSession.active, root,
      files, schema, mode)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(root, dataRel)
    messages.collect { case Graft2TaskFile(Some(n)) => n }.foreach { n =>
      try java.nio.file.Files.deleteIfExists(dir.resolve(n))
      catch { case _: java.io.IOException => () }
    }
  }
}

/** Java-serializable Hadoop `Configuration` carrier (Spark's own
  * wrapper for this is `private[spark]`; the Writable round-trip is
  * the same public technique). */
private[sources] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** Executor half: each task opens ONE parquet writer (Spark's
  * `OutputWriter`, vectorizable types, footer stats for free) on a
  * deterministic per-attempt file name and streams `InternalRow`s
  * into it. Empty tasks delete their file and report none — a
  * zero-row part must never land in the manifest. */
class Graft2WriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    stagingDir: String, schema: StructType, nonce: String,
    conf: SerializableHadoopConf)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    val attempt = new TaskAttemptID(
      new TaskID(new JobID(s"graft2-$nonce", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf.value, attempt)
    val name =
      f"part-$partitionId%05d-$taskId-$nonce${owf.getFileExtension(ctx)}"
    val file = new org.apache.hadoop.fs.Path(stagingDir, name)
    file.getFileSystem(conf.value).mkdirs(file.getParent)
    val writer = owf.newInstance(file.toString, schema, ctx)
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(row: InternalRow): Unit = { writer.write(row); n += 1 }
      override def commit(): WriterCommitMessage = {
        writer.close()
        if (n == 0L) {
          file.getFileSystem(conf.value).delete(file, false)
          Graft2TaskFile(None)
        } else Graft2TaskFile(Some(name))
      }
      override def abort(): Unit = {
        try writer.close() catch { case _: Throwable => () }
        file.getFileSystem(conf.value).delete(file, false)
        ()
      }
      override def close(): Unit = ()
    }
  }
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
    val (files, _, schema) = Graft2Scan.planState(root, version)
    val typeOf = (c: String) => schema.flatMap(
      _.fields.find(_.name == c)).map(_.dataType)
    val keep = files.filter { file =>
      // blooms loaded lazily once per (file, column), through the data
      // seam — and probed ONLY for the column they index (a probe of
      // column B against column A's bloom would wrongly prune files)
      val loaded =
        scala.collection.mutable.Map[String,
          org.apache.spark.util.sketch.BloomFilter]()
      def bloomFor(col: String) = file.blooms.get(col).map(rel =>
        loaded.getOrElseUpdate(col,
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(
              VersionedTable.readDataBytes(root, rel)))))
      filters.forall(f =>
        Graft2Scan.mayMatch(file, bloomFor, typeOf, f))
    }
    Graft2DataSource.lastPlanned(root) = (keep.size, files.size)
    // split surviving files by maxPartitionBytes — the v1 path's task
    // granularity (parquet readers align splits to row groups), so a
    // few huge files still parallelize across the cluster
    val spark = SparkSession.active
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    keep.flatMap { file =>
      val chunks = math.max(1L, (file.size + maxSplit - 1) / maxSplit)
      (0L until chunks).map { c =>
        val start = c * maxSplit
        Graft2Partition(
          org.apache.spark.sql.execution.datasources.PartitionedFile(
            InternalRow.empty,
            org.apache.spark.paths.SparkPath.fromPathString(file.abs),
            start, math.min(maxSplit, file.size - start),
            Array.empty, 0L, file.size)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val ff = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat
    // the SAME reader the v1 path plans: vectorized batches, codegen,
    // parquet row-group/page pushdown from the pushed v1 filters
    val columnar = ff.supportBatch(spark, required)
    val readFunc = ff.buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = full,
      partitionSchema = new StructType(),
      requiredSchema = required,
      filters = filters.toSeq,
      options = Map(
        org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> columnar.toString),
      hadoopConf = spark.sessionState.newHadoopConfWithOptions(Map.empty))
    new Graft2ReaderFactory(readFunc, columnar)
  }
}

object Graft2Scan {
  /** One plannable data file: manifest-recorded size/stats, bloom
    * sidecars KEYED BY INDEXED COLUMN, and the file's hidden
    * partition tag (transform spec, value) when partitioned. */
  private[sources] final case class Graft2File(abs: String, size: Long,
      stats: Map[String, VersionedTable.ColStats],
      blooms: Map[String, String],
      part: Option[(String, String)])

  /** Driver-side snapshot resolution: (files, total bytes, schema).
    * Refuses tombstoned or column-mapped snapshots (this path cannot
    * honor them — [[graft.ext.Graft2Refresh]] routes those back to
    * the v1 rewrites). */
  private[sources] def planState(root: String, v: Long)
      : (Seq[Graft2File], Long, Option[StructType]) = {
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
      val abs = VersionedTable.dataPath(root, f)
      // manifest-recorded size; pre-fsize manifests stat once THROUGH
      // THE DATA SEAM (non-POSIX stores included). A stat failure
      // propagates loudly: a silent 0 here would plan a zero-length
      // split and the file would contribute zero rows on the default
      // read path — a wrong answer, not an error.
      val size = st.sizes.getOrElse(f, VersionedTable.dataSize(root, f))
      Graft2File(abs.toString, size, stats, bloomRels, st.parts.get(f))
    }
    val bytes = files.map(_.size).sum
    (files, bytes, VersionedTable.physicalSchemaOf(st))
  }

  /** Can any row of `file` satisfy v1-filter `f`? `bloom(col)` yields
    * the file's sidecar indexing exactly `col` (probing a bloom built
    * over a DIFFERENT column would prune files that do contain
    * matches); equality probes also consult the file's hidden
    * partition TAG (a transform mismatch proves absence) — both
    * mirror [[GraftFileIndex]]'s layers exactly. Unrecognized shapes
    * keep the file (conservative). */
  private[sources] def mayMatch(file: Graft2File,
      bloom: String => Option[org.apache.spark.util.sketch.BloomFilter],
      typeOf: String => Option[DataType],
      f: Filter): Boolean = {
    def cs(c: String) = file.stats.get(c)
    def partOk(c: String, v: Any): Boolean = file.part match {
      case Some((spec, pv)) => PartitionTransform.parseOpt(spec) match {
        case Some(t) if t.srcCol == c =>
          typeOf(c).flatMap(t.probe(v, _)).forall(_ == pv)
        case _ => true
      }
      case None => true
    }
    f match {
      case org.apache.spark.sql.sources.And(a, b) =>
        mayMatch(file, bloom, typeOf, a) && mayMatch(file, bloom, typeOf, b)
      case org.apache.spark.sql.sources.Or(a, b) =>
        mayMatch(file, bloom, typeOf, a) || mayMatch(file, bloom, typeOf, b)
      case EqualTo(c, v) =>
        VersionedTable.mayMatch(cs(c), Some(v), Some(v)) &&
          bloom(c).forall(_.mightContainString(VersionedTable.bloomProbe(v))) &&
          partOk(c, v)
      case In(c, vs) =>
        vs.exists(v => VersionedTable.mayMatch(cs(c), Some(v), Some(v)))
      case GreaterThan(c, v) => VersionedTable.mayMatchStrict(cs(c),
        Some(v), lowerStrict = true, None, upperStrict = false)
      case GreaterThanOrEqual(c, v) =>
        VersionedTable.mayMatch(cs(c), Some(v), None)
      case LessThan(c, v) => VersionedTable.mayMatchStrict(cs(c),
        None, lowerStrict = false, Some(v), upperStrict = true)
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
/** One pruned data file, carried as the [[PartitionedFile]] the
  * vectorized reader consumes (whole file — graft data files are
  * written to target size, so row-group-level parallelism inside one
  * file is not the bottleneck the way raw landed data would be). */
case class Graft2Partition(
    file: org.apache.spark.sql.execution.datasources.PartitionedFile)
    extends InputPartition

/** VECTORIZED reader factory: the read function is produced by
  * Spark's own [[org.apache.spark.sql.execution.datasources.parquet
  * .ParquetFileFormat]] (`buildReaderWithPartitionValues`) — the same
  * machinery the v1 path runs, so the DSv2 route gets columnar
  * batches, whole-stage codegen, parquet predicate pushdown, and the
  * full type surface (nested included) with zero hand-rolled decode.
  * When `columnar`, the iterator's elements ARE ColumnarBatches (the
  * FileFormat contract behind `supportBatch`); otherwise rows. The
  * underlying readers close via the task-completion listeners the
  * format registers itself. */
class Graft2ReaderFactory(
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow],
    columnar: Boolean)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val it = readFunc(p.asInstanceOf[Graft2Partition].file)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val it = readFunc(p.asInstanceOf[Graft2Partition].file)
      .asInstanceOf[Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]]
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var cur: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = cur
      override def close(): Unit = ()
    }
  }
}
