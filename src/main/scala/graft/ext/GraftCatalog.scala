package graft.ext

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NamespaceAlreadyExistsException, NoSuchNamespaceException,
  NoSuchTableException, NonEmptyNamespaceException,
  TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  Identifier, NamespaceChange, StagedTable, StagingTableCatalog,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{Graft2DataSource, Graft2Table, VersionedTable}

/** DSv2 `TableCatalog` + `SupportsNamespaces` for graft tables — the
  * NAMED-catalog consumption surface real Spark users address
  * lakehouse tables through (how the Iceberg/Delta catalogs plug in):
  *
  * {{{
  *   spark.sql.catalog.lake           = graft.ext.GraftCatalog
  *   spark.sql.catalog.lake.warehouse = /data/lake
  *
  *   CREATE NAMESPACE lake.db
  *   CREATE TABLE lake.db.t (k BIGINT, v STRING)
  *   INSERT INTO lake.db.t ...            -- DSv2 write (Graft2BatchWrite)
  *   SELECT * FROM lake.db.t              -- DSv2 vectorized read
  *   SELECT * FROM lake.db.t VERSION AS OF 0
  *   DELETE FROM lake.db.t WHERE ...      -- same COW command as paths
  *   ALTER TABLE lake.db.t ADD COLUMNS (x DOUBLE)
  *   SHOW TABLES IN lake.db / DROP TABLE lake.db.t
  *   df.write.saveAsTable("lake.db.t")    -- CTAS through createTable
  * }}}
  *
  * Layout is filesystem-native, no extra metastore state: a namespace
  * is a directory under the warehouse, a table is a directory holding
  * a `_graft_log` — the SAME table roots `format("graft").load(path)`
  * reads, so path users and identifier users share every table.
  *
  * The catalog fronts ALL THREE formats through one identifier space:
  * a `_delta_log` root resolves as a Delta table and an Iceberg
  * `metadata/` root as an Iceberg table ([[InteropTable]] — reads
  * swap to the format's full replay via [[InteropCatalogScan]],
  * INSERT/CTAS land through the V1 write fallback, DML lowers through
  * [[GraftDmlRewrite]], travel uses each format's own vocabulary).
  * `CREATE TABLE lake.db.t (...) USING delta | iceberg` creates the
  * foreign root in place (schema lands as an empty first commit
  * through the format's own creation path; Iceberg CREATEs accept the
  * spec transform family in PARTITIONED BY and a `format-version`
  * property). An
  * external `LOCATION` registers as a SYMLINK into the warehouse:
  * `CREATE TABLE lake.db.ext ... LOCATION '/elsewhere/t'` links an
  * existing (or fresh) graft root under the identifier, and DROP
  * removes only the link — the data and log stay, exactly the
  * external-table contract. Managed tables (no LOCATION) delete
  * recursively on DROP.
  *
  * At 100 TB the catalog itself stays O(1): every operation here is
  * driver-side directory metadata — resolution costs one readdir, the
  * data path underneath is the same pruned vectorized DSv2 scan and
  * staged-commit write the path-addressed route uses.
  *
  * Divergences, stated loudly in the refusals: CREATE with partition
  * transforms refuses (graft's HIDDEN partitioning is applied
  * per-commit via `VersionedTable.commit(partitionBy)`, not declared
  * at the table; a declared-but-unenforced spec would lie to readers),
  * and ALTER RENAME/DROP COLUMN refuse (they produce column-mapped
  * snapshots only the v1 `format("graft")` rewrite path can read —
  * a catalog-resolved DSv2 scan would refuse right after). */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name': set spark.sql.catalog.$name.warehouse " +
          "to the warehouse directory"))
    warehouse = Paths.get(
      if (w.startsWith("file:")) new java.net.URI(w).getPath else w)
      .toAbsolutePath.normalize
  }

  override def name(): String = catalogName

  // ---------------------------------------------------------------
  // layout: warehouse/<ns...>/<table>; a table dir holds _graft_log
  // ---------------------------------------------------------------

  /** Identifier segments become path segments — anything that could
    * escape or alias the warehouse tree refuses before touching the
    * filesystem. Dot-PREFIXED names are reserved for catalog
    * internals (`.staging`) and refuse too: an addressable `.x`
    * identifier could alias (and CASCADE-drop) the staging tree. */
  private def seg(s: String): String = {
    require(s.nonEmpty && !s.startsWith(".") &&
      !s.contains('/') && !s.contains('\\') && !s.contains(0.toChar),
      s"graft catalog: illegal identifier segment '$s'")
    s
  }

  private def nsDir(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, s) => p.resolve(seg(s)))

  private def tableDir(ident: Identifier): Path =
    nsDir(ident.namespace).resolve(seg(ident.name))

  /** What kind of table root `p` is — the catalog fronts all THREE
    * formats through one identifier space: graft roots (`_graft_log`),
    * Delta roots (`_delta_log`), and Iceberg roots (a `metadata/`
    * documents dir). A directory holding none is a namespace. */
  private def tableKind(p: Path): Option[String] =
    if (Files.isDirectory(p.resolve("_graft_log"))) Some("graft")
    else if (Files.isDirectory(p.resolve("_delta_log"))) Some("delta-log")
    else if (Files.isDirectory(p.resolve("metadata")) && {
      val s = Files.list(p.resolve("metadata"))
      try s.iterator().asScala.exists { q =>
        val n = q.getFileName.toString
        n == "version-hint.text" || n.endsWith(".metadata.json")
      } finally s.close()
    }) Some("iceberg-meta")
    else None

  private def isTable(p: Path): Boolean = tableKind(p).isDefined

  /** A namespace is a real directory that is NOT a table root, not
    * inside one (a table's internal `data/` dir must never resolve as
    * a namespace), and not a dot-prefixed catalog-internal dir
    * (`.staging`). */
  private def isNamespace(p: Path): Boolean =
    p == warehouse || (Files.isDirectory(p) && !isTable(p) &&
      !p.getFileName.toString.startsWith(".") &&
      p.startsWith(warehouse) && {
        var q = p.getParent
        var inside = false
        while (q != null && q.startsWith(warehouse) && !inside) {
          if (isTable(q)) inside = true
          q = q.getParent
        }
        !inside
      })

  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  // ---------------------------------------------------------------
  // tables
  // ---------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!isNamespace(dir)) throw new NoSuchNamespaceException(namespace)
    listDir(dir).filter(isTable)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** `VERSION AS OF <v>` on the identifier. Per format's own
    * vocabulary: graft — a version number or TAG name; delta-log — a
    * version number; iceberg-meta — a snapshot id or REF name
    * (tag/branch). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val numeric = version.nonEmpty && version.forall(_.isDigit)
    tableKind(dir) match {
      case None => throw new NoSuchTableException(ident)
      case Some("delta-log") =>
        require(numeric, s"graft catalog: delta table $ident travels " +
          s"by version number, got '$version'")
        interop(ident, dir, "delta-log", Map("versionAsOf" -> version))
      case Some("iceberg-meta") =>
        interop(ident, dir, "iceberg-meta",
          if (numeric) Map("snapshotId" -> version)
          else Map("refAsOf" -> version))
      case Some(_) =>
        val v =
          if (numeric) version.toLong
          else VersionedTable.tags(dir.toString).getOrElse(version,
            throw new IllegalArgumentException(
              s"graft catalog: '$version' is neither a version number " +
                s"nor a tag of ${ident.toString}"))
        loadAt(ident, Some(v))
    }
  }

  /** `TIMESTAMP AS OF` — Spark hands epoch MICROseconds; every
    * format's as-of resolution here is millisecond-stamped. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    tableKind(dir) match {
      case None => throw new NoSuchTableException(ident)
      case Some(f @ ("delta-log" | "iceberg-meta")) =>
        interop(ident, dir, f,
          Map("timestampAsOf" -> (timestamp / 1000L).toString))
      case Some(_) =>
        loadAt(ident,
          Some(VersionedTable.versionAsOf(dir.toString, timestamp / 1000L)))
    }
  }

  /** Resolve an interop identifier: schema comes from the format's
    * own reader (travel options applied — the exact frame the scan
    * rewrite will serve), so the catalog surface can never disagree
    * with the read. Known cost: this replays the log once for the
    * schema and [[InteropCatalogScan]] replays again for the data
    * plan — identifier reads pay ~2x a path read's resolution I/O.
    * Accepted for freshness (both legs always see the current head);
    * a snapshot carried on the table would serve a STALE plan after
    * an external commit, the bug [[Graft2Refresh]] exists to fix on
    * the graft side. */
  private def interop(ident: Identifier, dir: Path, format: String,
      travel: Map[String, String]): Table = {
    val reader = travel.foldLeft(
      SparkSession.active.read.format(format)) {
      case (r, (k, v)) => r.option(k, v)
    }
    new InteropTable(dir.toString, format, travel,
      reader.load(dir.toString).schema, ident.toString)
  }

  private def loadAt(ident: Identifier, vOpt: Option[Long]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    tableKind(dir) match {
      case Some(f @ ("delta-log" | "iceberg-meta")) =>
        return interop(ident, dir, f, Map.empty)
      case _ => ()
    }
    graftTableAt(dir, ident.toString, vOpt)
  }

  /** The graft DSv2 table at `dir` — shared by identifier resolution
    * and the staging seam (which addresses a table not yet at its
    * final identifier path). */
  private def graftTableAt(dir: Path, what: String,
      vOpt: Option[Long]): Table = {
    val root = dir.toString
    val latest = VersionedTable.latestVersion(root)
    val v = vOpt.getOrElse(latest)
    require(v >= 0 && v <= latest,
      s"graft catalog: version $v of $what out of range [0, $latest]")
    val schema = VersionedTable.tableSchema(root, v).getOrElse(
      throw new IllegalStateException(
        s"graft catalog: $what@v$v has no schema metadata"))
    // unpinned loads are REFRESHABLE: [[Graft2Refresh]] re-points them
    // at the log head on re-analysis and swaps to the v1 MOR/mapping
    // rewrites when the snapshot is not DSv2-servable; travel loads
    // stay pinned (the same rule swaps an ineligible pinned snapshot
    // to a versionAsOf v1 read)
    new Graft2Table(root, v,
      Graft2DataSource.asNullable(schema).asInstanceOf[StructType],
      refreshable = vOpt.isEmpty, travelPinned = vOpt.isDefined)
  }

  /** The table format a CREATE names via `USING <provider>` (or
    * `df.write.format(...).saveAsTable`). Unstated — and Spark's own
    * session default, `parquet`, which every plain `saveAsTable`
    * carries — means graft. */
  private def providerOf(properties: JMap[String, String]): String =
    Option(properties.get(TableCatalog.PROP_PROVIDER))
      .map(_.toLowerCase) match {
      case None | Some("graft") | Some("parquet") => "graft"
      case Some("delta") | Some("delta-log") => "delta-log"
      case Some("iceberg") | Some("iceberg-meta") => "iceberg-meta"
      case Some(other) => throw new UnsupportedOperationException(
        s"graft catalog: USING $other is not supported " +
          "(graft | delta | iceberg)")
    }

  /** An interop CREATE's initial commit: the declared schema lands as
    * an empty first version through the format's own creation path,
    * so features/properties/partitioning are format-checked exactly
    * like a data-bearing write. */
  private def createInterop(format: String, root: String,
      schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): Unit = {
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      schema)
    // `CLUSTER BY (c1, c2)` arrives as a cluster_by transform — Delta
    // liquid clustering takes it at creation; Iceberg has no
    // clustering declaration (its layout policy is the sort order /
    // rewrite job), so it refuses below like any unknown transform
    val (clusterT, partT) = partitions.toSeq.partition(t =>
      format == "delta-log" && t.name() == "cluster_by")
    val clusterBy = clusterT.flatMap(_.references().toSeq.map { r =>
      require(r.fieldNames.length == 1,
        s"graft catalog: CLUSTER BY supports top-level columns, got " +
          r.fieldNames.mkString("."))
      r.fieldNames.head
    })
    val specs = partT.map(interopTransform(format, _))
    val props = properties.asScala.toMap -- Seq(
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_EXTERNAL, "format-version")
    format match {
      case "delta-log" =>
        graft.sources.DeltaLog.commit(empty, root,
          partitionBy = specs, properties = props,
          clusterBy = clusterBy)
      case "iceberg-meta" =>
        val fv = Option(properties.get("format-version"))
          .map(_.toInt).getOrElse(2)
        graft.sources.IcebergMeta.writeFixture(empty, root,
          partitionBy = specs, formatVersion = fv,
          summaryProps = Map.empty)
        if (props.nonEmpty)
          graft.sources.IcebergMeta.setProperties(root, props)
    }
  }

  /** DSv2 partition transform → the format's own spelling. Delta's
    * Hive layout supports identity only; Iceberg takes the spec
    * transform family [[graft.sources.IcebergMeta]]'s fixture parser
    * accepts. */
  private def interopTransform(format: String, t: Transform): String = {
    def col(): String = {
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"graft catalog: partition transform $t must reference one " +
          "top-level column")
      refs.head.fieldNames.head
    }
    def width(): Int = t.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value.isInstanceOf[Int] => l.value.asInstanceOf[Int]
    }.getOrElse(throw new IllegalArgumentException(
      s"graft catalog: transform $t needs an integer argument"))
    (format, t.name()) match {
      case (_, "identity") => col()
      case ("iceberg-meta", "bucket") => s"bucket(${width()},${col()})"
      case ("iceberg-meta", "truncate") => s"truncate(${width()},${col()})"
      case ("iceberg-meta", "years" | "year") => s"year(${col()})"
      case ("iceberg-meta", "months" | "month") => s"month(${col()})"
      case ("iceberg-meta", "days" | "day") => s"day(${col()})"
      case ("iceberg-meta", "hours" | "hour") => s"hour(${col()})"
      case (f, other) => throw new UnsupportedOperationException(
        s"graft catalog: PARTITIONED BY $other is not supported for $f")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    val provider = providerOf(properties)
    require(partitions.isEmpty || provider != "graft",
      "graft catalog: partitioned CREATE is not supported — graft " +
        "partitioning is HIDDEN and applied per-commit " +
        "(VersionedTable.commit partitionBy); create unpartitioned " +
        "and lay batches out at write time")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val parent = nsDir(ident.namespace)
    if (!isNamespace(parent))
      throw new NoSuchNamespaceException(ident.namespace)
    val dir = tableDir(ident)
    require(!Files.exists(dir),
      s"graft catalog: path $dir exists but is not a table")
    Option(properties.get(TableCatalog.PROP_LOCATION)) match {
      case Some(loc) =>
        // EXTERNAL registration: the identifier becomes a symlink to
        // the location; a table root already there is adopted as-is
        // (schema and history kept, whatever its format), a fresh
        // location gets the declared schema committed at v0
        val target = Paths.get(
          if (loc.startsWith("file:")) new java.net.URI(loc).getPath
          else loc).toAbsolutePath.normalize
        if (!isTable(target)) {
          require(schema.nonEmpty,
            s"graft catalog: LOCATION $target holds no table " +
              "and no schema was declared")
          if (provider == "graft")
            VersionedTable.createTable(SparkSession.active,
              target.toString, schema)
          else createInterop(provider, target.toString, schema,
            partitions, properties)
        }
        Files.createSymbolicLink(dir, target)
      case None =>
        require(schema.nonEmpty,
          s"graft catalog: CREATE TABLE $ident needs at least one column")
        if (provider == "graft")
          VersionedTable.createTable(SparkSession.active, dir.toString,
            schema)
        else createInterop(provider, dir.toString, schema, partitions,
          properties)
    }
    loadTable(ident)
  }

  // ---------------------------------------------------------------
  // StagingTableCatalog: atomic CTAS / REPLACE TABLE [AS SELECT]
  // ---------------------------------------------------------------

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = false, orCreate = false)

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = true, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier,
      schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = true, orCreate = true)

  /** ATOMIC CTAS/RTAS: the table (any of the three formats) is
    * created and WRITTEN in a hidden staging directory, then one
    * directory move publishes it under the identifier —
    * `commitStagedChanges`. A failed or aborted query deletes the
    * staging dir and the identifier never changes: no half-written
    * table, and `CREATE OR REPLACE ... AS SELECT` keeps serving the
    * OLD table until the new one is complete. (Safe for Iceberg
    * staging trees: this writer's metadata references are
    * root-relative; the RENAME refusal below concerns FOREIGN trees.) */
  private def stage(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String],
      replace: Boolean, orCreate: Boolean): StagedTable = {
    require(Option(properties.get(TableCatalog.PROP_LOCATION)).isEmpty,
      "graft catalog: staged CREATE ... AS SELECT with LOCATION is " +
        "not supported — register the location with CREATE TABLE, " +
        "then INSERT")
    val parent = nsDir(ident.namespace)
    if (!isNamespace(parent))
      throw new NoSuchNamespaceException(ident.namespace)
    if (!replace && tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    if (replace && !orCreate && !tableExists(ident))
      throw new NoSuchTableException(ident)
    val provider = providerOf(properties)
    require(partitions.isEmpty || provider != "graft",
      "graft catalog: partitioned CREATE is not supported — graft " +
        "partitioning is HIDDEN and applied per-commit")
    val staging = warehouse.resolve(".staging")
      .resolve(java.util.UUID.randomUUID().toString)
    Files.createDirectories(staging.getParent)
    if (provider == "graft")
      VersionedTable.createTable(SparkSession.active, staging.toString,
        schema)
    else createInterop(provider, staging.toString, schema, partitions,
      properties)
    val inner = tableKind(staging) match {
      case Some(f @ ("delta-log" | "iceberg-meta")) =>
        new InteropTable(staging.toString, f, Map.empty,
          SparkSession.active.read.format(f).load(staging.toString)
            .schema, ident.toString)
      case _ => graftTableAt(staging, ident.toString, None)
    }
    new GraftStagedTable(inner, staging, tableDir(ident), this)
  }

  /** One-move publish; REPLACE swaps through a trash dir so a failed
    * move restores the old table. */
  private[ext] def publishStaged(staging: Path, finalDir: Path): Unit =
    if (Files.exists(finalDir)) {
      val trash = staging.resolveSibling(
        staging.getFileName.toString + "_old")
      Files.move(finalDir, trash)
      try Files.move(staging, finalDir)
      catch { case e: Throwable => Files.move(trash, finalDir); throw e }
      deleteRecursively(trash)
    } else Files.move(staging, finalDir)

  private[ext] def discardStaged(staging: Path): Unit =
    if (Files.exists(staging)) deleteRecursively(staging)

  /** ADD COLUMNS maps to graft's metadata-only schema evolution;
    * property changes and the column changes that would produce a
    * column-mapped snapshot (rename/drop) refuse loudly — the DSv2
    * read path cannot serve mapped snapshots (the v1
    * `format("graft")` route owns those rewrites). */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    tableKind(dir) match {
      case Some(f @ ("delta-log" | "iceberg-meta")) =>
        throw new UnsupportedOperationException(
          s"graft catalog: ALTER on $ident goes through $f's own " +
            "evolution surface (GRAFT RENAME/DROP COLUMN DDL, " +
            "mergeSchema writes, addColumnWithDefault) — the catalog " +
            "does not translate TableChange for interop formats")
      case _ => ()
    }
    val root = dir.toString
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft catalog: ADD COLUMNS supports top-level columns only, " +
            s"got ${a.fieldNames.mkString(".")}")
        StructField(a.fieldNames.head, a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER on $ident: $other — " +
          "ADD COLUMNS is the supported shape (RENAME/DROP COLUMN " +
          "produce column-mapped snapshots only the v1 " +
          "format(\"graft\") read path serves; properties are not " +
          "stored by graft tables)")
    }
    if (adds.nonEmpty) VersionedTable.addColumns(root, adds)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else if (Files.isSymbolicLink(dir)) {
      // external table: drop the registration, keep data + log
      Files.delete(dir)
      true
    } else {
      // managed table: the warehouse owns the data
      deleteRecursively(dir)
      true
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    // a filesystem move is safe only when every metadata reference is
    // root-relative: graft and Delta guarantee that by spec; Iceberg
    // metadata documents may embed absolute locations (and real
    // Iceberg renames through its catalog, never the filesystem)
    require(!tableKind(from).contains("iceberg-meta"),
      s"graft catalog: RENAME of iceberg table $oldIdent is not " +
        "supported — iceberg metadata may reference absolute paths; " +
        "re-register under a new identifier instead")
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    val toParent = nsDir(newIdent.namespace)
    if (!isNamespace(toParent))
      throw new NoSuchNamespaceException(newIdent.namespace)
    Files.move(from, tableDir(newIdent))
    ()
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverseIterator
      .foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  // ---------------------------------------------------------------
  // namespaces
  // ---------------------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || isNamespace(nsDir(namespace))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    val dir = nsDir(namespace)
    if (!isNamespace(dir)) throw new NoSuchNamespaceException(namespace)
    listDir(dir).filter(p => Files.isDirectory(p) && !isTable(p) &&
        !p.getFileName.toString.startsWith("."))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    val dir = nsDir(namespace)
    if (!isNamespace(dir)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> dir.toUri.toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    require(namespace.nonEmpty,
      "graft catalog: the root namespace always exists")
    val dir = nsDir(namespace)
    if (Files.exists(dir))
      throw new NamespaceAlreadyExistsException(namespace)
    // the parent must BE a namespace — creating one under a table
    // identifier would pollute the table root with an unreachable dir
    // (invisible to listNamespaces, undroppable through the catalog)
    if (!isNamespace(dir.getParent))
      throw new NoSuchNamespaceException(namespace.dropRight(1))
    Files.createDirectories(dir)
    ()
  }

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    require(namespace.nonEmpty,
      "graft catalog: cannot drop the root namespace")
    val dir = nsDir(namespace)
    if (!isNamespace(dir) || !Files.exists(dir)) false
    else {
      if (!cascade && listDir(dir).nonEmpty)
        throw new NonEmptyNamespaceException(namespace)
      deleteRecursively(dir)
      true
    }
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")
}

/** A table created-and-written in a staging directory, published (or
  * discarded) in one move — the atomic half of [[GraftCatalog]]'s
  * CTAS/RTAS. Reads and writes delegate to the staged root's real
  * table; only commit/abort know about the final location. */
private[ext] class GraftStagedTable(inner: Table, staging: Path,
    finalDir: Path, cat: GraftCatalog) extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.catalog.SupportsWrite
  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def capabilities(): java.util.Set[
    org.apache.spark.sql.connector.catalog.TableCapability] =
    inner.capabilities()
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.asInstanceOf[SupportsWrite].newWriteBuilder(info)
  override def commitStagedChanges(): Unit =
    cat.publishStaged(staging, finalDir)
  override def abortStagedChanges(): Unit = cat.discardStaged(staging)
}
