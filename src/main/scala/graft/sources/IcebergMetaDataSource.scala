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
  * file list IS the scan. Row-level deletes (v2 position/equality
  * files, v3 deletion vectors) apply through the GraftExtensions scan
  * rewrites, and v3 default-valued columns coalesce over
  * pre-evolution files there too; feature gates
  * ([[IcebergMeta.snapshot]]): format-version 4+, v3 NESTED
  * initial-defaults, encryption, non-parquet data files refuse
  * loudly.
  *
  * WRITE path: `df.write.format("iceberg-meta").mode(m).save(root)` —
  * `ErrorIfExists` creates a new table ([[IcebergMeta.writeFixture]]),
  * `Append` commits a new snapshot onto an existing one
  * ([[IcebergMeta.append]]: conditional-put `v{N+1}.metadata.json`,
  * prior snapshots stay time-travelable), `Overwrite` replaces the
  * table's entire contents in one `overwrite` snapshot
  * ([[IcebergMeta.overwrite]] — on v3 with fresh inheritance row ids;
  * priors stay time-travelable). */
class IcebergMetaDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "iceberg-meta"

  // ---- streaming write: one Iceberg append snapshot per micro-batch,
  // made EXACTLY-ONCE through the snapshot SUMMARY (the open property
  // map the spec provides — iceberg-spark records its streaming dedup
  // state the same way): each commit carries streaming-app-id +
  // streaming-epoch-id, and a restarted query skips batches at or
  // below the highest replayed epoch ([[IcebergMeta
  // .lastCommittedEpoch]]; expire_snapshots PINS each app's highest
  // mark like a ref, so maintenance landing between a crash and the
  // restart replay cannot reap the dedup state). appId
  // defaults to the checkpointLocation — stable across restarts, the
  // Delta sink's convention too. The FIRST batch creates the table
  // (partitioned by `partitionBy` when the query sets it). ----
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"iceberg-meta streaming sink is append-only, got $outputMode")
    val root = rootOf(parameters)
    val fv = parameters.get("formatVersion").map(_.toInt).getOrElse(2)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "iceberg-meta streaming sink needs a checkpointLocation or " +
          "an explicit option(\"txnAppId\", ...) for exactly-once"))
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.DataFrame): Unit = {
        val props = Map("streaming-app-id" -> appId,
          "streaming-epoch-id" -> batchId.toString)
        val batch = org.apache.spark.sql.GraftColumnBridge.asBatch(data)
        if (!IceCatalog.forRoot(root).tableExists(root))
          IcebergMeta.writeFixture(batch, root,
            partitionBy = partitionColumns, formatVersion = fv,
            summaryProps = props)
        else if (!IcebergMeta.lastCommittedEpoch(root, appId)
            .exists(_ >= batchId))
          IcebergMeta.append(batch, root, summaryProps = props)
        // else: replayed batch after restart — already committed
      }
      override def toString: String = s"IcebergMetaSink[$root]"
    }
  }

  // ---- streaming read: tail snapshots by sequence number ----
  // `spark.readStream.format("iceberg-meta").load(root)` — initial
  // snapshot (row-level deletes applied), then each micro-batch
  // carries the data files the `append` snapshots in the sequence
  // range added; non-append snapshots refuse unless `ignoreDeletes`
  // — see [[IcebergMetaStream]].

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      IcebergMeta.snapshot(rootOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    IcebergMetaStream.create(sqlContext, metadataPath, schema,
      parameters, rootOf(parameters))

  private def rootOf(parameters: Map[String, String]): String = {
    val p = parameters.getOrElse("path", throw new IllegalArgumentException(
      "iceberg-meta requires a path: .load(root) / .save(root)"))
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    // time travel: by snapshot id, by REF NAME (tag/branch from the
    // metadata.json refs map — Iceberg's VERSION AS OF 'name'), or
    // by TIMESTAMP (epoch millis → the snapshot-log entry current
    // then)
    val snapId = parameters.get("snapshotId").map(_.toLong)
      .orElse(parameters.get("refAsOf")
        .map(n => IcebergMeta.refSnapshotId(root, n)))
      .orElse(parameters.get("timestampAsOf")
        .map(ts => IcebergMeta.snapshotIdAtTimestamp(root, ts.toLong)))
    val snap = IcebergMeta.snapshot(root, snapId)
    // geo tables need the session's geospatial feature for the
    // WKB→GEOMETRY lift; refuse HERE with the conf named — without
    // this, Spark's own analysis gate fires first with a generic
    // "feature is disabled" that never names the remedy
    val geoCols = snap.schema.fields
      .filter(f => IcebergMeta.isGeoType(f.dataType))
    require(geoCols.isEmpty ||
      spark.conf.get("spark.sql.geospatial.enabled", "false")
        .equalsIgnoreCase("true"),
      s"iceberg-meta: $root carries geometry/geography columns " +
        s"(${geoCols.map(_.name).mkString(", ")}) — set " +
        "spark.sql.geospatial.enabled=true to read them")
    val idx = new IcebergMetaFileIndex(spark, snap,
      pinned = snapId.isDefined)
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
    // partition spec for table CREATION (an existing table's spec
    // comes from its own metadata — appends follow it). Split on
    // commas OUTSIDE parentheses: "bucket(4,k), day(d)" is two specs.
    val partitionBy = parameters.get("partitionBy").toSeq.flatMap { s =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var depth = 0
      val sb = new StringBuilder
      s.foreach {
        case '(' => depth += 1; sb += '('
        case ')' => depth -= 1; sb += ')'
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case ch => sb += ch
      }
      out += sb.toString
      out.toSeq
    }.map(_.trim).filter(_.nonEmpty)
    // table CREATION format version (2 default; 3 = row-lineage
    // metadata + DV deletes) — existing tables keep their own
    val fv = parameters.get("formatVersion").map(_.toInt).getOrElse(2)
    mode match {
      case SaveMode.Append =>
        if (exists) IcebergMeta.append(data, root)
        else IcebergMeta.writeFixture(data, root, partitionBy, fv)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"iceberg-meta: $root already exists (mode=errorifexists)")
        IcebergMeta.writeFixture(data, root, partitionBy, fv)
      case SaveMode.Ignore =>
        if (!exists) IcebergMeta.writeFixture(data, root, partitionBy, fv)
      case SaveMode.Overwrite =>
        // replace-ALL commit (one `overwrite` snapshot; priors stay
        // time-travelable) — on v3 the replacement mints fresh
        // inheritance ids, no lineage threading needed (no row
        // survives a total replacement)
        if (exists) IcebergMeta.overwrite(sqlContext.sparkSession,
          root, data)
        else IcebergMeta.writeFixture(data, root, partitionBy, fv)
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
    snap0: IcebergMeta.IceSnapshot,
    val pinned: Boolean = false) extends FileIndex {

  // Freshness (same contract as GraftFileIndex): an UNPINNED index
  // re-resolves the metadata tree per access, so a cached catalog
  // relation reads fresh data after external commits (appends,
  // positional deletes) without a REFRESH TABLE dance; the metadata
  // re-read is one JSON document + manifests when the version-hint
  // advanced, a single small file read otherwise. A pinned index
  // (explicit snapshotId, or a rewrite-built snapshot subset) is
  // immutable by construction.
  @volatile private var cached: (Int, IcebergMeta.IceSnapshot) =
    (IcebergMeta.latestMetadataVersion(snap0.root), snap0)

  def snap: IcebergMeta.IceSnapshot =
    if (pinned) snap0
    else {
      val v = IcebergMeta.latestMetadataVersion(snap0.root)
      val (v0, s0) = cached
      if (v == v0) s0
      else {
        val s = IcebergMeta.snapshot(snap0.root)
        cached = (v, s)
        s
      }
    }

  private def statuses: Seq[(IcebergMeta.IceFile, FileStatus)] =
    snap.files.map { f =>
      f -> new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
        new HPath(new java.io.File(f.path).toURI))
    }

  /** (files kept, files total) of the most recent listing. */
  @volatile var lastListing: Option[(Int, Int)] = None

  override def rootPaths: Seq[HPath] = Seq(new HPath(snap0.root))
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = snap.files.map(_.sizeBytes).sum
  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // Physical-time safety gate (same posture as GraftFileIndex for
    // MOR tombstones): a raw listing of a snapshot with positional
    // deletes would resurrect deleted rows. The IcebergMorScan rewrite
    // replaces this index with a deletes-cleared one; a session
    // WITHOUT the graft extensions fails loudly, never wrong.
    val s = snap
    if (s.deletes.nonEmpty || s.eqDeletes.nonEmpty || s.dvs.nonEmpty ||
        s.needsDefaultFill || s.physicalByName.nonEmpty ||
        s.schema.exists(f => IcebergMeta.isGeoType(f.dataType)))
      throw new IllegalStateException(
        s"iceberg-meta: snapshot ${s.snapshotId} of ${s.root} " +
          "carries row-level delete files (v2 position/equality or " +
          "v3 deletion vectors), v3 default-valued columns over " +
          "pre-evolution files, a name mapping over differently-" +
          "named parquet columns, or geometry/geography columns " +
          "(physically WKB BINARY) — readable only with " +
          "GraftExtensions enabled (the delete/default/name-mapping/" +
          "geo scan rewrites)")
    val listed = s.files.map { f =>
      f -> new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
        new HPath(new java.io.File(f.path).toURI))
    }
    val keep = listed.filter { case (f, _) =>
      dataFilters.forall(e => StatsPruning.mayMatchExpr(f.stats, e))
    }
    lastListing = Some((keep.size, listed.size))
    Seq(PartitionDirectory(InternalRow.empty, keep.map(_._2).toArray))
  }
}

/** Plan-building support for the positional-delete read path
  * ([[graft.ext.IcebergMorScan]]) and the [[IcebergMeta.delete]]
  * writer: DataFrames over snapshot subsets with the parquet
  * `_metadata` (file URI, row index) exposed, the recorded-path ↔
  * scan-URI mapping, and the clean/touched split. */
object IcebergMetaRead {
  import org.apache.spark.sql.{DataFrame, Row, GraftColumnBridge}
  import org.apache.spark.sql.execution.datasources.LogicalRelation
  import org.apache.spark.sql.functions.{broadcast, col}
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  /** Working-column names (reserved-prefix guarded like graft's own). */
  val FpCol = "__ice_fp"
  val PosCol = "__ice_pos"

  def relation(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot): HadoopFsRelation =
    HadoopFsRelation(
      // pinned: rewrite branches and writer scans operate on an
      // EXPLICIT snapshot (often a file subset) — never re-resolve
      location = new IcebergMetaFileIndex(spark, snap, pinned = true),
      partitionSchema = new StructType(),
      dataSchema = snap.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)

  /** Scan-space frame: geo columns stay their stored WKB BINARY here
    * (the parquet reader knows no geometry); [[filledDf]] lifts them
    * to the native types at its single exit. */
  private def plainDf(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot): DataFrame =
    GraftColumnBridge.ofRows(spark,
      LogicalRelation(relation(spark,
        snap.copy(schema = IcebergMeta.geoErase(snap.schema))),
        isStreaming = false))

  /** Lift stored WKB back to Spark's native GEOMETRY/GEOGRAPHY —
    * applied ONCE at [[filledDf]]'s exit, after the metadata-column
    * projection (hidden `_metadata` refs must resolve before any
    * added Project) and after the default-fill union. Reading a geo
    * table requires the session's geospatial feature: every ST
    * expression is analysis-gated on it, so refuse up front with the
    * exact conf named instead of surfacing Spark's generic error. */
  private def geoRestore(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot, d: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{GeographyType, GeometryType}
    val geos = snap.schema.fields.filter(f =>
      IcebergMeta.isGeoType(f.dataType))
    if (geos.isEmpty) return d
    require(spark.conf.get("spark.sql.geospatial.enabled", "false")
        .equalsIgnoreCase("true"),
      s"iceberg-meta: ${snap.root} carries geometry/geography " +
        s"columns (${geos.map(_.name).mkString(", ")}) — set " +
        "spark.sql.geospatial.enabled=true to read them")
    geos.foldLeft(d)((cur, f) => f.dataType match {
      case g: GeometryType => cur.withColumn(f.name,
        expr(s"st_setsrid(st_geomfromwkb(`${f.name}`), ${g.srid})"))
      case _: GeographyType => cur.withColumn(f.name,
        expr(s"st_geogfromwkb(`${f.name}`)"))
      case other => throw new IllegalStateException(s"not geo: $other")
    })
  }

  /** Scan of `snap` with v3 DEFAULT VALUES applied: files are grouped
    * by WHICH defaults apply to them (file.seq < default.firstSeq —
    * pure metadata), each group scans through the stock parquet path,
    * pre-evolution groups coalesce the default literal over the
    * scan's null-fill, and the groups union. One default on a table
    * with old+new files plans exactly two branches; a table whose
    * files all postdate every default (or has none) stays ONE stock
    * scan. `withMeta` projects the `_metadata` file/position columns
    * PER BRANCH — metadata columns resolve only directly over a
    * file-source relation, never through the fill Union. */
  private def filledDf(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot, withMeta: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    def project(d: DataFrame): DataFrame =
      if (!withMeta) d
      else d.withColumn(FpCol, col("_metadata.file_path"))
        .withColumn(PosCol, col("_metadata.row_index"))
    geoRestore(spark, snap,
      if (!snap.needsDefaultFill) project(plainDf(spark, snap))
      else {
        val groups = snap.files
          .groupBy(f => snap.defaults
            .filter(d => IcebergMeta.defaultApplies(f, d)))
          .toSeq.sortBy { case (_, fs) => fs.map(_.path).min }
        groups.map { case (ds, fs) =>
          // defaults cleared on the branch snapshot: the fill happens
          // HERE, and the branch's pinned index must not re-gate
          val base = project(plainDf(spark,
            snap.copy(files = fs, defaults = Nil)))
          ds.foldLeft(base) { case (cur, d) =>
            d.segments match {
              case Seq(top) =>
                cur.withColumn(top, coalesce(col(s"`$top`"),
                  lit(d.value).cast(d.dataType)))
              case top +: rest =>
                // STRUCT-NESTED default: the pre-evolution file's
                // struct lacks the member entirely, so every row of
                // this branch reads the default — withField fills it
                // while rows whose PARENT struct is null stay null
                // (a null struct cannot carry a member value, the
                // spec's own shape)
                cur.withColumn(top, col(s"`$top`").withField(
                  rest.map(s => s"`$s`").mkString("."),
                  lit(d.value).cast(d.dataType)))
            }
          }
        }.reduce(_ unionByName _)
      })
  }

  private def df(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot): DataFrame =
    filledDf(spark, snap, withMeta = false)

  /** The URI `_metadata.file_path` reports for a snapshot file. */
  def scanUri(f: IcebergMeta.IceFile): String =
    new HPath(new java.io.File(f.path).toURI).toString

  /** Two-column mapping (scan URI → manifest-recorded path) for exact
    * matching of delete rows against `_metadata.file_path`; broadcast
    * by the callers (O(files in play), driver-known). */
  def uriToRecorded(spark: SparkSession,
      files: Seq[IcebergMeta.IceFile]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        files.map(f => Row(scanUri(f), f.recordedPath)), 1),
      new StructType(Array(
        StructField(FpCol, StringType, nullable = false),
        StructField("file_path", StringType, nullable = false))))

  /** Decoded-positions ceiling for one scan's deletion vectors: DV
    * bitmaps decode on the driver (they are log metadata, the same
    * cost class as the replay — exactly the Delta posture,
    * [[DeltaLogRead.MaxDecodedPositions]]); a snapshot whose total DV
    * cardinality exceeds this refuses with advice rather than
    * silently exhausting driver memory. */
  val MaxDecodedPositions = 50L * 1000 * 1000

  /** (scan URI, deleted position) rows of every v3 deletion vector in
    * `dvs`, decoded driver-side with the [[MaxDecodedPositions]]
    * guard. Only DVs whose referenced file is IN `files` (and in seq
    * scope) decode — the caller passes the touched subset. */
  def dvPositions(spark: SparkSession,
      files: Seq[IcebergMeta.IceFile],
      dvs: Seq[IcebergMeta.IceDV]): DataFrame = {
    val byRef = dvs.map(d => d.referencedDataFile -> d).toMap
    val targeted = files.flatMap(f =>
      byRef.get(f.recordedPath).filter(f.seq <= _.seq).map(f -> _))
    val total = targeted.map(_._2.cardinality).sum
    require(total <= MaxDecodedPositions,
      s"iceberg-meta: $total deleted positions across " +
        s"${targeted.size} deletion vectors exceeds the " +
        s"$MaxDecodedPositions decode ceiling — compact the table " +
        "before reading through this path")
    val rows = targeted.flatMap { case (f, d) =>
      val uri = scanUri(f)
      Puffin.decodeDeletionVector(Puffin.readBlob(
          java.nio.file.Paths.get(d.puffinPath), d.offset, d.length))
        .map(p => Row(uri, p))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      new StructType(Array(
        StructField(FpCol, StringType, nullable = false),
        StructField(PosCol, LongType, nullable = false))))
  }

  /** All VISIBLE rows of `snap` (existing positional deletes AND v3
    * deletion vectors already anti-joined away) with `FpCol` = scan
    * URI, `PosCol` = row index in file — the addressing the delete
    * writer needs. */
  def withPositions(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot): DataFrame = {
    val base = filledDf(spark, snap.copy(deletes = Nil, dvs = Nil),
      withMeta = true)
    val fromParquet: Option[DataFrame] =
      if (snap.deletes.isEmpty) None
      else Some(spark.read.parquet(snap.deletes.map(_.path): _*)
        .select(col("file_path"), col("pos"))
        .join(broadcast(uriToRecorded(spark, snap.files)), Seq("file_path"))
        .select(col(FpCol), col("pos").as(PosCol)))
    val fromDvs: Option[DataFrame] =
      if (snap.dvs.isEmpty) None
      else Some(dvPositions(spark, snap.files, snap.dvs))
    (fromParquet.toSeq ++ fromDvs.toSeq).reduceOption(_ union _) match {
      case None => base
      case Some(del) => base.join(del, Seq(FpCol, PosCol), "left_anti")
    }
  }

  /** All visible rows of a v3 table plus the ROW LINEAGE read
    * surface: `_row_id` = the file's first_row_id + the row's
    * physical position (the spec's inheritance-based assignment,
    * resolved at replay — [[IcebergMeta.IceFile.firstRowId]]), and
    * `_last_updated_sequence_number` = the file's data sequence
    * number (this writer never rewrites v3 files, so the file's seq
    * IS the row's). Positions are stable under deletion vectors
    * (deleted rows keep occupying their physical slots), so ids
    * survive DV deletes — the stable-key property incremental
    * consumers rely on. A file carrying MATERIALIZED lineage columns
    * (a [[IcebergMeta.compact]]-rewritten file — the spec's
    * preservation mechanism) contributes its per-row values instead,
    * via one coalesce; a row resolving NEITHER way fails the scan.
    * Refuses non-v3 tables and tables with equality deletes (their
    * hidden rows are value- not position-addressed). */
  def readWithRowIds(spark: SparkSession, root: String): DataFrame = {
    require(IcebergMeta.formatVersion(root) == 3,
      s"iceberg-meta: $root is not a format-version 3 table — no row " +
        "lineage to read")
    rowIdFrame(spark, IcebergMeta.snapshot(root))
  }

  /** The lineage-resolving core of [[readWithRowIds]], over an
    * EXPLICIT snapshot (possibly a file subset — the v3 COW UPDATE
    * reads only the touched files through it). A row's id comes from
    * the file's MATERIALIZED lineage columns when present (compacted
    * files — the spec's preservation mechanism), else from
    * inheritance metadata + position; resolving neither way fails
    * the scan rather than emitting a null id. EQUALITY deletes apply
    * here too — one broadcast null-safe anti-join per distinct
    * (column set, sequence number) group, seq-gated per row by the
    * FILE's data sequence number (unlike [[morRead]]'s file-set
    * branching, the gate rides the already-joined per-file seq
    * column) — so upserted v3 tables read, update and compact. */
  /** A FOREIGN writer may have keyed equality deletes on a geo column
    * — the spec forbids nothing, but geo values have no defined
    * equality and the anti-join could not compare them. Refuse loudly
    * rather than resurrecting or over-hiding rows. (This engine's own
    * [[IcebergMeta.deleteEquality]] refuses at write time.) */
  private def requireEqDeletesComparable(
      snap: IcebergMeta.IceSnapshot): Unit = {
    val geoNames = snap.schema.fields
      .filter(f => IcebergMeta.isGeoType(f.dataType)).map(_.name).toSet
    val bad = snap.eqDeletes.flatMap(_.eqCols).distinct
      .filter(geoNames.contains)
    require(bad.isEmpty,
      s"iceberg-meta: ${snap.root} carries equality deletes keyed on " +
        s"geometry/geography columns (${bad.mkString(", ")}) — no " +
        "defined equality to apply them under")
  }

  private[sources] def rowIdFrame(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit, raise_error, when}
    requireEqDeletesComparable(snap)
    val lineageNames = Seq("_row_id", "_last_updated_sequence_number")
    require(!snap.schema.fieldNames.exists(lineageNames.contains),
      s"iceberg-meta: table schema of ${snap.root} claims the " +
        s"reserved lineage column names ${lineageNames.mkString(", ")}")
    val extSnap = snap.copy(schema = StructType(snap.schema.fields ++
      lineageNames.map(n => StructField(n, LongType, nullable = true))))
    val info = spark.createDataFrame(
      spark.sparkContext.parallelize(snap.files.map(f =>
        Row(scanUri(f), f.firstRowId.map(Long.box).orNull, f.seq)), 1),
      new StructType(Array(
        StructField(FpCol, StringType, nullable = false),
        StructField("__rl_fr", LongType, nullable = true),
        StructField("__rl_seq", LongType, nullable = false))))
    val base = withPositions(spark, extSnap.copy(eqDeletes = Nil))
      .join(broadcast(info), Seq(FpCol))
    // equality deletes: a delete at seq D hides matching rows of
    // files with seq < D (strict, the spec) — the per-file seq is
    // already a column here, so the gate is one extra conjunct on a
    // broadcast anti-join instead of a file-set partition
    val eqApplied = snap.eqDeletes
      .groupBy(d => (d.eqCols, d.seq)).toSeq
      .sortBy { case ((cols, dseq), _) => (cols.mkString(","), dseq) }
      .foldLeft(base) { case (cur, ((eqCols, dseq), dels)) =>
        val delRows = spark.read.parquet(dels.map(_.path): _*)
          .select(eqCols.map(c => col(s"`$c`").as(s"__eq_$c")): _*)
          .distinct()
        val cond = eqCols.map(c =>
          col(s"`$c`") <=> col(s"__eq_$c")).reduce(_ && _) &&
          col("__rl_seq") < lit(dseq)
        cur.join(broadcast(delRows), cond, "left_anti")
      }
    eqApplied
      .withColumn("__rid_out", coalesce(col("_row_id"),
        col("__rl_fr") + col(PosCol)))
      .withColumn("__seq_out",
        coalesce(col("_last_updated_sequence_number"), col("__rl_seq")))
      .withColumn("__rid_out",
        when(col("__rid_out").isNotNull, col("__rid_out"))
          .otherwise(raise_error(lit("iceberg-meta: a row of " +
            snap.root + " resolves no row id — its file carries " +
            "neither first_row_id metadata nor materialized _row_id"))
            .cast(LongType)))
      .drop("_row_id", "_last_updated_sequence_number",
        FpCol, PosCol, "__rl_fr", "__rl_seq")
      .withColumnRenamed("__rid_out", "_row_id")
      .withColumnRenamed("__seq_out", "_last_updated_sequence_number")
  }

  /** Split a snapshot with positional deletes into (1) a deletes-FREE
    * snapshot of the files no delete can target (manifest file_path
    * bounds — stock pruned scan, no join) and (2) a resolving
    * DataFrame over just the touched files, deletes anti-joined away.
    * None when no file is touched. */
  def posDeleteSplit(spark: SparkSession, snap: IcebergMeta.IceSnapshot)
      : (IcebergMeta.IceSnapshot, Option[DataFrame]) = {
    // seq gate per spec: a position delete covers rows that existed
    // when it was written — data appended AFTER it (f.seq > d.seq)
    // is out of scope even if the file_path bounds would match.
    // v3 deletion vectors target exactly one file by recorded path,
    // same seq gate — so the clean majority is every file no delete
    // CAN touch, resolved from metadata alone.
    val touched = snap.files.filter(f =>
      snap.deletes.exists(d =>
        f.seq <= d.seq &&
          d.pathLo.forall(_ <= f.recordedPath) &&
          d.pathHi.forall(f.recordedPath <= _)) ||
      snap.dvs.exists(d =>
        f.seq <= d.seq && d.referencedDataFile == f.recordedPath))
    val touchedSet = touched.map(_.path).toSet
    val clean = snap.copy(
      files = snap.files.filterNot(f => touchedSet(f.path)),
      deletes = Nil, dvs = Nil)
    if (touched.isEmpty) (clean, None)
    else (clean, Some(
      withPositions(spark, snap.copy(files = touched))
        .drop(FpCol, PosCol)))
  }

  /** All visible rows of a snapshot under BOTH v2 delete kinds — the
    * full merge-on-read read path. Shape: data files are partitioned
    * by WHICH equality deletes apply to them (spec seq gate:
    * `file.seq < delete.seq`), so the branch count is bounded by the
    * number of DISTINCT applicable-delete sets — a 100 TB table with
    * one equality-delete commit plans exactly two branches (older
    * files anti-joined, newer files stock scan). Within each branch,
    * positional deletes apply via [[posDeleteSplit]] (file_path-bounds
    * targeted), then one broadcast LEFT ANTI hash join per distinct
    * equality-column set — the join keys are null-safe equalities
    * (spec: "null values are considered equal"), which Spark plans as
    * an equi hash join, never a nested loop. Delete-value lists are
    * small by contract (they are WRITTEN as single bounded files);
    * broadcasting them keeps the data side shuffle-free. */
  def morRead(spark: SparkSession,
      snap: IcebergMeta.IceSnapshot): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    requireEqDeletesComparable(snap)
    if (snap.files.isEmpty)
      return df(spark, snap.copy(deletes = Nil, eqDeletes = Nil,
        dvs = Nil))
    val groups = snap.files
      .groupBy(f => snap.eqDeletes.filter(d => f.seq < d.seq))
      .toSeq.sortBy { case (_, fs) => fs.map(_.path).min } // determinism
    val branches = groups.map { case (applicable, fs) =>
      val sub = snap.copy(files = fs, eqDeletes = Nil)
      val (clean, touched) = posDeleteSplit(spark, sub)
      val base = ((if (clean.files.nonEmpty) Seq(df(spark, clean))
        else Seq.empty[DataFrame]) ++ touched.toSeq).reduce(_ union _)
      applicable.groupBy(_.eqCols).toSeq
        .sortBy(_._1.mkString(","))
        .foldLeft(base) { case (cur, (eqCols, dels)) =>
          val delRows = spark.read.parquet(dels.map(_.path): _*)
            .select(eqCols.map(c => col(c).as(s"__ice_eq_$c")): _*)
            .distinct()
          val cond = eqCols.map(c => col(c) <=> col(s"__ice_eq_$c"))
            .reduce(_ && _)
          cur.join(broadcast(delRows), cond, "left_anti")
        }
    }
    branches.reduce(_ union _)
  }
}

/** Structured-streaming SOURCE over a real Iceberg table — the
  * incremental-append read (Iceberg's Spark streaming shape), through
  * the dependency-free [[IcebergMeta]] metadata reader:
  *
  *  - offsets ARE the table's SEQUENCE NUMBERS (strictly monotonic
  *    per commit, spec), so exactly-once is structural: a replayed
  *    range re-reads identical immutable metadata;
  *  - the FIRST batch is the full current snapshot with row-level
  *    deletes APPLIED (the morRead path), unless `startingSequence`
  *    is a sequence N (tail from commit N's own files) or `"latest"`;
  *  - each later batch emits the data files whose sequence number
  *    falls in `(start, end]` — discovery is pure metadata (files
  *    carry their data sequence number through manifest inheritance);
  *  - a non-`append` snapshot in the range refuses by default:
  *    `ignoreDeletes` skips `delete` snapshots (their positional /
  *    equality delete files target already-emitted rows — the
  *    documented at-least-once caveat); `overwrite`/`replace`/unknown
  *    operations always refuse (restart from a fresh snapshot);
  *  - schema drift refuses with the restart instruction;
  *  - `maxSequencesPerTrigger` paces backlogs with a persisted
  *    high-water mark, and Trigger.AvailableNow drains to the head
  *    frozen at start (own implementation — the generic wrapper
  *    would drain one capped bite; see [[ChangeFeedSource]]). */
object IcebergMetaStream {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.execution.streaming.{Offset, Source}
  import org.apache.spark.sql.execution.streaming.runtime.{
    LongOffset, SerializedOffset}
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  private def offsetSeq(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  private[sources] def create(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      parameters: Map[String, String], root: String): Source = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val declared = schema.getOrElse(IcebergMeta.snapshot(root).schema)
    val head = IcebergMeta.latestSequence(root)
    val (initialSnapshot, startAfter) =
      lower.get("startingsequence") match {
        case None => (true, 0L)
        case Some(v) if v.equalsIgnoreCase("latest") => (false, head)
        case Some(v) => (false, v.toLong - 1L)
      }
    val maxPerTrigger = lower.get("maxsequencespertrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxSequencesPerTrigger must be positive, got $n")
      n
    }
    new SeqTail(sqlContext, root, declared, initialSnapshot, startAfter,
      maxPerTrigger,
      ignoreDeletes = lower.get("ignoredeletes").exists(_.toBoolean),
      metadataPath)
  }

  private[sources] final class SeqTail(sqlContext: SQLContext,
      root: String, declared: StructType, initialSnapshot: Boolean,
      startAfter: Long, maxPerTrigger: Option[Long],
      ignoreDeletes: Boolean, metadataPath: String)
      extends Source
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

    import java.nio.file.{Files, Paths, StandardCopyOption}

    private val spark = sqlContext.sparkSession

    private val hwmFile = {
      val dir =
        if (metadataPath.contains(":")) new java.net.URI(metadataPath).getPath
        else metadataPath
      Paths.get(dir, "iceberg-seq-hwm")
    }

    private var handedOut: Long =
      if (Files.exists(hwmFile))
        math.max(startAfter, new String(Files.readAllBytes(hwmFile),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      else startAfter

    private def persistHwm(v: Long): Unit = {
      Files.createDirectories(hwmFile.getParent)
      val tmp = Files.createTempFile(hwmFile.getParent, ".hwm", "")
      Files.write(tmp, v.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, hwmFile, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }

    override def schema: StructType = declared

    override def getOffset: Option[Offset] = nextOffset(None)

    private var availableNowTarget: Option[Long] = None

    override def prepareForTriggerAvailableNow(): Unit =
      availableNowTarget = Some(IcebergMeta.latestSequence(root))

    override def getDefaultReadLimit
        : org.apache.spark.sql.connector.read.streaming.ReadLimit =
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

    override def latestOffset(
        start: org.apache.spark.sql.connector.read.streaming.Offset,
        limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
        : org.apache.spark.sql.connector.read.streaming.Offset =
      nextOffset(availableNowTarget).orNull

    private def nextOffset(target: Option[Long]): Option[LongOffset] = {
      val head = IcebergMeta.latestSequence(root)
      val bounded = target.fold(head)(math.min(head, _))
      val capped = maxPerTrigger
        .fold(bounded)(m => math.min(bounded, handedOut + m))
      if (capped <= handedOut) None else Some(LongOffset(capped))
    }

    private def driftGuard(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      val want = declared.fields.map(f => f.name -> f.dataType).toSeq
      if (got != want)
        throw new IllegalStateException(
          s"iceberg-meta stream of $root: table schema changed " +
            s"mid-stream — restart the streaming query to pick up " +
            "the new schema")
      df
    }

    private def ofRows(snap: IcebergMeta.IceSnapshot)
        : org.apache.spark.sql.DataFrame =
      GraftColumnBridge.ofRows(spark,
        LogicalRelation(IcebergMetaRead.relation(spark, snap),
          isStreaming = false))

    override def getBatch(start: Option[Offset], end: Offset)
        : org.apache.spark.sql.DataFrame = {
      val to = offsetSeq(end)
      if (to > handedOut) {
        handedOut = to
        if (maxPerTrigger.isDefined) persistHwm(to)
      }
      // pin the replay at the offset's own snapshot — commits landing
      // between offset planning and batch construction stay out
      val log = IcebergMeta.snapshotLog(root)
      val atTo = log.filter(_.seq <= to).lastOption.map(_.snapshotId)
      val snap = IcebergMeta.snapshot(root, atTo)
      val batch = start match {
        case None if initialSnapshot =>
          // full snapshot; the IcebergMorScan rewrite applies any
          // row-level deletes (and refuses without extensions)
          ofRows(snap)
        case _ =>
          val after = start.map(offsetSeq).getOrElse(startAfter)
          log.filter(r => r.seq > after && r.seq <= to)
            .foreach { r =>
              if (r.op != "append" && !(r.op == "delete" && ignoreDeletes))
                throw new IllegalStateException(
                  s"iceberg-meta stream of $root: snapshot at sequence " +
                    s"${r.seq} is operation '${r.op}', not append — " +
                    (if (r.op == "delete")
                      "set ignoreDeletes to skip delete snapshots " +
                        "(already-emitted rows stay emitted), or "
                    else "") + "restart from a fresh snapshot")
            }
          // appended data files carry their sequence through manifest
          // inheritance — discovery is pure metadata
          ofRows(snap.copy(
            files = snap.files.filter(f => f.seq > after && f.seq <= to),
            deletes = Nil, eqDeletes = Nil))
      }
      GraftColumnBridge.asStreaming(driftGuard(batch))
    }

    override def stop(): Unit = ()
  }
}
