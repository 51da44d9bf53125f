package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free implementation of the PUBLIC Delta Lake transaction
  * log protocol (delta.io `PROTOCOL.md`) — the interop piece that lets
  * this library read (and write) tables a user's existing Delta
  * tooling produced, without the delta-spark jar.
  *
  * Log layout (all public spec):
  *  - `_delta_log/%020d.json` — one commit per version; every line is
  *    a JSON object carrying ONE action: `protocol`, `metaData`,
  *    `add`, `remove`, `commitInfo`, `txn`, `cdc`, `domainMetadata`.
  *  - `_delta_log/_last_checkpoint` — JSON hint
  *    `{"version":V,"size":N[,"parts":P]}` naming the newest
  *    checkpoint.
  *  - `_delta_log/%020d.checkpoint.parquet` (or the multi-part
  *    `%020d.checkpoint.%010d.%010d.parquet`) — the replayed state at
  *    V as parquet rows with `add`/`remove`/`metaData`/`protocol`
  *    struct columns (one non-null action per row).
  *
  * Snapshot reconstruction (the spec's state machine): newest
  * checkpoint at or below the target version seeds the file set; JSON
  * commits `(cp, target]` replay on top — a later `add` of the same
  * path supersedes the earlier one, `remove` drops it, the latest
  * `metaData`/`protocol` win. Commit files must be CONTIGUOUS through
  * the target (a gap means an incomplete copy — refuse, never guess).
  *
  * Reader feature gates (the spec's forward-compatibility contract: a
  * reader that cannot honor the table's protocol must fail loudly,
  * never return wrong rows):
  *  - `minReaderVersion` 1 and 2 (column mapping: 'name'/'id' modes
  *    resolve through the schema metadata's physicalName entries,
  *    recursively — nested structs/arrays/maps restore at scan time)
  *    are supported; 3 requires every listed `readerFeatures` entry
  *    to be in [[supportedReaderFeatures]].
  *  - `deletionVector`s decode ([[DeletionVectors]]) and apply at
  *    scan time (graft.ext.DeltaMorScan); raw listings without the
  *    extensions refuse.
  *  - non-parquet `format.provider` refuses.
  *
  * Commits publish through the [[LogStore]] seam's `putIfAbsent` —
  * exactly Delta's own requirement ("mutual exclusion" on the commit
  * file; S3 conditional PUT / GCS generation-match in production,
  * link(2) locally) — so concurrent writers race safely.
  *
  * Scale posture: replay is a DRIVER fold over file METADATA (the same
  * cost model as the graft manifest and Delta's own Snapshot), not a
  * data scan; checkpoints bound it to O(suffix since last checkpoint).
  * The data files themselves are read by Spark's stock vectorized
  * parquet path through [[DeltaLogFileIndex]], with partition pruning
  * from `partitionValues` and file skipping from per-file `stats`.
  */
object DeltaLog {

  /** v3 reader features this implementation genuinely honors.
    * `timestampNtz` only needs TIMESTAMP_NTZ in the schema, which
    * Spark 4 reads natively. `deletionVectors` are decoded by
    * [[DeletionVectors]] and applied at scan time by
    * [[graft.ext.DeltaMorScan]] (without the extensions, a raw
    * listing of a DV-carrying snapshot refuses loudly).
    * `columnMapping` resolves physical names from the schema metadata
    * (graft.ext.DeltaColumnMappingScan aliases the scan back to
    * logical names). Everything else (v2Checkpoint, typeWidening,
    * ...) refuses. */
  val supportedReaderFeatures: Set[String] =
    Set("timestampNtz", "deletionVectors", "columnMapping",
      "v2Checkpoint",
      // widened columns read natively: Spark 4's vectorized parquet
      // reader upcasts a file whose physical type is narrower than
      // the declared schema (exactly the promotions the feature
      // licenses); `delta.typeChanges` metadata is informational
      "typeWidening",
      // vacuumProtocolCheck (reader-writer): the READ side carries no
      // obligation at all (the spec's point is forcing VACUUM
      // implementations through a full protocol check, which
      // [[vacuum]] does by replaying the snapshot through these very
      // gates before touching a file) — recent delta-spark enables it
      // on new tables by default, so refusing would make those tables
      // unreadable for no protective reason
      "vacuumProtocolCheck",
      // variantType: the schema's `variant` columns parse to Spark
      // 4's native VariantType (DataType.fromJson) and the stock
      // vectorized parquet reader decodes the spec's binary
      // metadata/value encoding — the exact representation the Delta
      // feature mandates (it IS Spark's)
      "variantType",
      // variantShredding: files storing variant values as
      // typed_value subcolumns per the parquet shredding spec —
      // Spark 4's parquet reader REASSEMBLES shredded variants
      // natively (SparkShreddingUtils.assembleVariant behind its
      // variant converters), so shredded and unshredded files read
      // identically through the same scan
      "variantShredding")

  final case class DeltaAdd(
      path: String,                        // decoded, relative or absolute
      partitionValues: Map[String, String], // null values omitted from map
      nullPartitionCols: Set[String],       // partition cols with null value
      size: Long,
      statsJson: Option[String],
      deletionVector: Option[DeletionVectors.Descriptor] = None,
      // ROW TRACKING (PROTOCOL.md): the file's fresh-row-id block
      // starts here ([baseRowId, baseRowId + numRecords)), assigned
      // when the rowTracking writer feature is active; recommits of
      // the same file (DV merges, RESTORE) carry them forward
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  final case class DeltaSnapshot(
      root: String,
      version: Long,
      schema: StructType,                  // full logical schema
      partitionColumns: Seq[String],
      configuration: Map[String, String],
      adds: Seq[DeltaAdd],
      // column mapping ('name'/'id' modes): logical → physical name of
      // every top-level field; empty when the table is unmapped. The
      // parquet files, partitionValues keys, and stats JSON keys all
      // use PHYSICAL names — [[physical]] restates this snapshot in
      // that space, and graft.ext.DeltaColumnMappingScan aliases the
      // scan back to logical names.
      columnMapping: Map[String, String] = Map.empty,
      // streaming-writer idempotence state: latest `txn` version per
      // appId (the exactly-once handshake the streaming sink uses)
      txns: Map[String, Long] = Map.empty,
      // the table's protocol action as last replayed — writers carry
      // it forward on overwrite (never silently downgrade a table)
      // and check writerFeatures before using feature-gated writes
      // (deletion vectors)
      minReaderVersion: Int = 1,
      minWriterVersion: Int = 2,
      readerFeatures: Set[String] = Set.empty,
      writerFeatures: Set[String] = Set.empty,
      // the metaData action's id — restatements carry it forward
      tableId: String = "",
      // domainMetadata replay state: domain → (configuration JSON,
      // removed). Latest action per domain wins; removed=true is the
      // spec's tombstone. Carried through checkpoints and RESTORE.
      domains: Map[String, (String, Boolean)] = Map.empty) {
    def dataSchema: StructType =
      StructType(schema.fields.filterNot(f => partitionColumns.contains(f.name)))
    def partitionSchema: StructType =
      StructType(partitionColumns.map(c =>
        schema.fields.find(_.name == c).getOrElse(throw new IllegalStateException(
          s"delta-log: partition column $c missing from schemaString"))))
    /** This snapshot restated in PHYSICAL column space — names
      * renamed recursively (nested struct fields included). */
    def physical: DeltaSnapshot = {
      if (columnMapping.isEmpty) return this
      def phys(n: String) = columnMapping.getOrElse(n, n)
      copy(
        schema = physicalSchemaOf(root, schema),
        partitionColumns = partitionColumns.map(phys),
        columnMapping = Map.empty)
    }
  }

  private val mapper = new ObjectMapper()

  private def logDir(root: String): Path = Paths.get(root, "_delta_log")

  private def io(root: String): LogStore = PosixLogStore

  private def commitPath(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%020d.json")

  // ------------------------------------------------------------------
  // Replay
  // ------------------------------------------------------------------

  /** ONE `_delta_log` listing, partitioned into the three artifact
    * kinds — at the stated scale posture (~500k log files, where the
    * LISTING dominates snapshot construction) the hot read path must
    * list the directory ONCE, not once per artifact kind. Compacted
    * spans with `end <= start` (corrupt or adversarial names) are
    * dropped here, so the replay walk can never move backwards. */
  private final case class LogListing(jsons: Seq[Long],
      cps: Seq[Long], spans: Map[Long, Seq[Long]]) {
    def latest: Long = {
      val ends = spans.values.flatten
      if (jsons.isEmpty && cps.isEmpty && ends.isEmpty) -1L
      else (jsons ++ cps ++ ends).max
    }
  }

  private def listLog(root: String): LogListing = {
    val names = io(root).listDir(logDir(root))
    LogListing(
      names.filter(n => n.length == 25 && n.endsWith(".json") &&
        n.take(20).forall(_.isDigit)).map(_.take(20).toLong).sorted,
      names.filter(n => n.contains(".checkpoint.") &&
        (n.endsWith(".parquet") || n.endsWith(".json")) &&
        n.take(20).forall(_.isDigit))
        .map(_.take(20).toLong).distinct.sorted,
      names.filter(n => n.length == 56 &&
        n.endsWith(".compacted.json") &&
        n.take(20).forall(_.isDigit) &&
        n.slice(21, 41).forall(_.isDigit))
        .map(n => n.take(20).toLong -> n.slice(21, 41).toLong)
        .filter { case (s, e) => e > s }
        .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted })
  }

  /** Versions that have a JSON commit file in the log. */
  def jsonVersions(root: String): Seq[Long] = listLog(root).jsons

  /** Latest version of the table (max of JSON commits, checkpoint
    * versions and compacted-span ends — a cleaned log may keep only
    * the checkpoint, or a compacted span past its retired JSONs). */
  def latestVersion(root: String): Long = listLog(root).latest

  private def checkpointVersions(root: String): Seq[Long] =
    listLog(root).cps

  /** The `path` field is RFC 2396 percent-encoded per the spec. */
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  /** The actions of ONE commit JSON, for the streaming tail
    * ([[DeltaLogStream]]): data-changing adds (compaction adds with
    * `dataChange: false` are invisible to a stream, per the Delta
    * contract), removed paths with their dataChange flag, and whether
    * the commit restated metaData/protocol (schema drift → the stream
    * must refuse and ask for a restart). Refuses when the commit file
    * is gone (log truncated past a checkpoint): a stream cannot
    * replay vacuumed history. */
  final case class CommitActions(version: Long, adds: Seq[DeltaAdd],
      removedPaths: Seq[String], dataChangingRemoves: Boolean,
      metaChanged: Boolean,
      // `cdc` actions (change-data files under _change_data/) — when
      // present they are the commit's AUTHORITATIVE change set and
      // replace add/remove derivation (the CDF spec rule)
      cdcFiles: Seq[DeltaAdd] = Nil)

  def commitActions(root: String, v: Long): CommitActions = {
    val p = commitPath(root, v)
    if (!io(root).exists(p))
      throw new IllegalStateException(
        s"delta-log: commit $v of $root has no JSON file (log " +
          "truncated past a checkpoint) — restart the stream from a " +
          "fresh snapshot")
    val adds = scala.collection.mutable.ListBuffer.empty[DeltaAdd]
    val removes = scala.collection.mutable.ListBuffer.empty[String]
    val cdc = scala.collection.mutable.ListBuffer.empty[DeltaAdd]
    var removeChangesData = false
    var metaChanged = false
    io(root).readLines(p)
      .iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        val name = n.fieldNames().next()
        val body = n.get(name)
        name match {
          case "add" =>
            val dataChange = !body.hasNonNull("dataChange") ||
              body.get("dataChange").asBoolean()
            if (dataChange) adds += parseAdd(body)
          case "remove" =>
            removes += decodePath(body.get("path").asText())
            if (!body.hasNonNull("dataChange") ||
              body.get("dataChange").asBoolean()) removeChangesData = true
          case "cdc" => cdc += parseAdd(body)
          case "metaData" | "protocol" => metaChanged = true
          case _ => ()
        }
      }
    CommitActions(v, adds.toSeq, removes.toSeq, removeChangesData,
      metaChanged, cdc.toSeq)
  }

  private def parseAdd(n: JsonNode): DeltaAdd = {
    val dv = Option(n.get("deletionVector")).filterNot(_.isNull).map { d =>
      DeletionVectors.Descriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong())
    }
    val pv = scala.collection.mutable.Map.empty[String, String]
    val nullPv = scala.collection.mutable.Set.empty[String]
    val pvNode = n.get("partitionValues")
    if (pvNode != null && pvNode.isObject) {
      pvNode.asInstanceOf[ObjectNode].fields().asScala.foreach { e =>
        if (e.getValue == null || e.getValue.isNull) nullPv += e.getKey
        else pv(e.getKey) = e.getValue.asText()
      }
    }
    DeltaAdd(decodePath(n.get("path").asText()),
      pv.toMap, nullPv.toSet,
      if (n.hasNonNull("size")) n.get("size").asLong() else 0L,
      if (n.hasNonNull("stats")) Some(n.get("stats").asText()) else None,
      dv,
      baseRowId = if (n.hasNonNull("baseRowId"))
        Some(n.get("baseRowId").asLong()) else None,
      defaultRowCommitVersion = if (n.hasNonNull("defaultRowCommitVersion"))
        Some(n.get("defaultRowCommitVersion").asLong()) else None)
  }

  private def gateProtocol(n: JsonNode): Unit = {
    val r = if (n.hasNonNull("minReaderVersion"))
      n.get("minReaderVersion").asInt() else 1
    if (r >= 3) {
      val feats =
        if (n.hasNonNull("readerFeatures"))
          n.get("readerFeatures").elements().asScala.map(_.asText()).toSet
        else Set.empty[String]
      val unsupported = feats -- supportedReaderFeatures
      if (unsupported.nonEmpty)
        throw new UnsupportedOperationException(
          "delta-log: table requires reader features " +
            s"${unsupported.toSeq.sorted.mkString(", ")} this " +
            "implementation does not support (supported: " +
            s"${supportedReaderFeatures.toSeq.sorted.mkString(", ")})")
    } else if (r > 2)
      throw new UnsupportedOperationException(
        s"delta-log: minReaderVersion $r not supported")
  }

  /** Mutable replay state. */
  private final class Replay {
    var protocolSeen = false
    var minReader = 1
    var minWriter = 2
    var readerFeatures = Set.empty[String]
    var writerFeatures = Set.empty[String]
    var schemaJson: Option[String] = None
    var tableId: String = ""
    var partitionColumns: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, DeltaAdd]
    val txns = scala.collection.mutable.Map.empty[String, Long]
    val domains = scala.collection.mutable.Map.empty[String, (String, Boolean)]

    def applyAction(kind: String, body: JsonNode): Unit = kind match {
      case "protocol" =>
        protocolSeen = true
        gateProtocol(body)
        minReader = if (body.hasNonNull("minReaderVersion"))
          body.get("minReaderVersion").asInt() else 1
        minWriter = if (body.hasNonNull("minWriterVersion"))
          body.get("minWriterVersion").asInt() else 2
        def feats(k: String): Set[String] =
          if (body.hasNonNull(k))
            body.get(k).elements().asScala.map(_.asText()).toSet
          else Set.empty
        readerFeatures = feats("readerFeatures")
        writerFeatures = feats("writerFeatures")
      case "metaData" =>
        val fmt = body.get("format")
        if (fmt != null && fmt.hasNonNull("provider") &&
            fmt.get("provider").asText().toLowerCase != "parquet")
          throw new UnsupportedOperationException(
            s"delta-log: format ${fmt.get("provider").asText()} not " +
              "supported (parquet only)")
        schemaJson = Option(body.get("schemaString")).map(_.asText())
        if (body.hasNonNull("id")) tableId = body.get("id").asText()
        partitionColumns =
          if (body.hasNonNull("partitionColumns"))
            body.get("partitionColumns").elements().asScala
              .map(_.asText()).toSeq
          else Nil
        configuration =
          if (body.hasNonNull("configuration"))
            body.get("configuration").asInstanceOf[ObjectNode]
              .fields().asScala
              .filterNot(e => e.getValue == null || e.getValue.isNull)
              .map(e => e.getKey -> e.getValue.asText()).toMap
          else Map.empty
        // column mapping resolves at snapshot() end from the FINAL
        // schema + configuration (both may be restated by later
        // metaData actions)
      case "add" =>
        val a = parseAdd(body)
        adds(a.path) = a
      case "remove" =>
        adds.remove(decodePath(body.get("path").asText()))
      case "txn" =>
        // streaming-writer idempotence: keep the LATEST version per
        // appId (the spec's SetTransaction semantics)
        val app = body.get("appId").asText()
        val ver = body.get("version").asLong()
        if (txns.getOrElse(app, Long.MinValue) < ver) txns(app) = ver
      case "domainMetadata" =>
        // latest action per domain wins (the spec's reconciliation)
        domains(body.get("domain").asText()) = (
          if (body.hasNonNull("configuration"))
            body.get("configuration").asText() else "",
          body.hasNonNull("removed") && body.get("removed").asBoolean())
      case _ => () // commitInfo / cdc: no reader state
    }
  }

  /** Replay the log to `versionAsOf` (default: latest). */
  def snapshot(spark: SparkSession, root: String,
      versionAsOf: Option[Long] = None): DeltaSnapshot = {
    val lst = listLog(root) // ONE listing serves the whole replay
    val latest = lst.latest
    require(latest >= 0, s"$root is not a Delta table (no _delta_log)")
    val target = versionAsOf.getOrElse(latest)
    require(target >= 0 && target <= latest,
      s"delta-log: version $target out of range [0, $latest]")
    val replay = new Replay
    // newest checkpoint at or below the target seeds the state
    val cp = lst.cps.filter(_ <= target).lastOption
    cp.foreach(v => replayCheckpoint(spark, root, v, replay))
    val needed = (cp.map(_ + 1).getOrElse(0L)) to target
    val present = lst.jsons.toSet
    def applyFile(p: Path): Unit =
      io(root).readLines(p).foreach { line =>
        if (line.nonEmpty) {
          val n = mapper.readTree(line)
          n.fields().asScala.foreach(e =>
            replay.applyAction(e.getKey, e.getValue))
        }
      }
    // LOG COMPACTION (delta-spark's minor compactions): a
    // `{s}.{e}.compacted.json` wholly inside the needed range stands
    // in for its per-commit files — replay reads O(compactions)
    // files between checkpoints instead of O(commits), and a
    // compacted span COUNTS as contiguity (its commits may have been
    // cleaned). Greedy walk over the LONGEST in-range span at each
    // step — shorter overlapping spans (e.g. [1,3] next to a later
    // [1,5]) remain usable for targets the long one overshoots.
    // Everything else (streams, CDF, cleanup) keeps reading the
    // per-commit files.
    val plan = scala.collection.mutable.ListBuffer.empty[Path]
    var at = needed.start
    while (at <= target) {
      lst.spans.getOrElse(at, Nil).filter(_ <= target)
        .maxOption match {
        case Some(e) =>
          plan += logDir(root).resolve(
            f"$at%020d.$e%020d.compacted.json")
          at = e + 1
        case None =>
          if (!present(at))
            throw new IllegalStateException(
              s"delta-log: cannot reconstruct v$target of $root — " +
                s"commit file $at missing (truncated log without a " +
                "covering checkpoint or compaction)")
          plan += commitPath(root, at)
          at += 1
      }
    }
    plan.foreach(applyFile)
    val schemaStr = replay.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta-log: $root has no metaData action — not a valid Delta log"))
    val schema = DataType.fromJson(schemaStr).asInstanceOf[StructType]
    DeltaSnapshot(root, target, schema,
      replay.partitionColumns, replay.configuration,
      replay.adds.values.toSeq,
      columnMappingOf(root, schema, replay.configuration),
      txns = replay.txns.toMap,
      minReaderVersion = replay.minReader,
      minWriterVersion = replay.minWriter,
      readerFeatures = replay.readerFeatures,
      writerFeatures = replay.writerFeatures,
      tableId = replay.tableId,
      domains = replay.domains.toMap)
  }

  /** logical → physical top-level names under column mapping
    * ('name'/'id' modes both record `...physicalName` in the field
    * metadata; 'id' additionally writes parquet field ids, which a
    * by-physical-name read does not need). Nested mapped fields are
    * refused — translating inner struct names is beyond this layer. */
  private def columnMappingOf(root: String, schema: StructType,
      configuration: Map[String, String]): Map[String, String] = {
    val mode = configuration.getOrElse("delta.columnMapping.mode", "none")
    if (mode == "none") return Map.empty
    if (mode != "name" && mode != "id")
      throw new UnsupportedOperationException(
        s"delta-log: column mapping mode '$mode' not supported")
    schema.fields.map { f =>
      val key = "delta.columnMapping.physicalName"
      require(f.metadata.contains(key),
        s"delta-log: mapped table $root lacks $key on field ${f.name}")
      f.name -> f.metadata.getString(key)
    }.toMap
  }

  /** The schema as the PARQUET FILES carry it under column mapping:
    * every struct field — top-level and NESTED (the spec stamps
    * `physicalName` metadata on every field) — renamed to its
    * physical name, recursively through structs, arrays and maps.
    * [[graft.ext.DeltaColumnMappingScan]] scans in this space and
    * rebuilds the logical shape. */
  def physicalSchemaOf(root: String, schema: StructType): StructType = {
    def rename(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val key = "delta.columnMapping.physicalName"
        // CDF's _change_type is stored UNMAPPED in cdc files (it is
        // not part of the table schema, so the writer never stamps
        // it) — every real column must carry its physicalName
        require(f.metadata.contains(key) || f.name == "_change_type",
          s"delta-log: mapped table $root lacks $key on nested field " +
            f.name)
        if (!f.metadata.contains(key)) f
        else f.copy(name = f.metadata.getString(key),
          dataType = rename(f.dataType))
      })
      case ArrayType(e, n) => ArrayType(rename(e), n)
      case MapType(k, v, n) => MapType(rename(k), rename(v), n)
      case other => other
    }
    rename(schema).asInstanceOf[StructType]
  }

  /** Seed a replay from checkpoint parquet (single- or multi-part):
    * the checkpoint rows ARE the actions, one non-null struct per row.
    * Only the reader-relevant columns are selected; the read is one
    * Spark job over metadata-sized parquet, collected to the driver
    * (the same cost class as reading the JSON commits). */
  private def replayCheckpoint(spark: SparkSession, root: String,
      v: Long, replay: Replay): Unit = {
    val prefix = f"$v%020d.checkpoint"
    val names = io(root).listDir(logDir(root)).filter { n =>
      n.startsWith(prefix) &&
        (n.endsWith(".parquet") || n.endsWith(".json"))
    }
    // V2 (UUID-named) checkpoints are SELF-CONTAINED: exactly ONE is
    // read — several writers may each have left a complete one, and
    // mixing them with classic parts would double-feed the replay.
    // Classic files read together (multi-part checkpoints PARTITION
    // the adds across `%010d.%010d`-suffixed parts; all are needed).
    def isV2(n: String): Boolean = {
      val tok = n.stripSuffix(".parquet").stripSuffix(".json")
        .stripPrefix(prefix).stripPrefix(".")
      tok.nonEmpty && !tok.contains(".") && !tok.forall(_.isDigit)
    }
    names.filter(isV2).sorted.headOption match {
      case Some(name) => replayV2Checkpoint(spark, root, v, name, replay)
      case None =>
        val classic = names.filterNot(isV2).sorted
          .map(n => logDir(root).resolve(n).toString)
        applyCheckpointRows(spark.read.parquet(classic: _*),
          Seq("protocol", "metaData", "add", "remove", "txn",
          "domainMetadata"), replay)
    }
  }

  /** Checkpoint-parquet rows → replay actions, via a JSON round-trip:
    * `toJSON` of a checkpoint row yields `{"add":{...}}` — the same
    * shape [[Replay.applyAction]] parses from commit files. Order
    * within a checkpoint is unspecified; actions are disjoint per row
    * and replay state is commutative across DISTINCT action kinds. */
  private def applyCheckpointRows(df: DataFrame, kinds: Seq[String],
      replay: Replay): Unit = {
    val cols = df.columns.toSet
    val actions = df.select(kinds.filter(cols).map(df.col): _*)
    actions.toJSON.collect().foreach { line =>
      val n = mapper.readTree(line)
      n.fields().asScala.foreach(e =>
        if (!e.getValue.isNull) replay.applyAction(e.getKey, e.getValue))
    }
  }

  /** Replay ONE self-contained V2 checkpoint (spec: `v2Checkpoint`
    * reader-writer feature, `delta.checkpointPolicy = v2`). The
    * UUID-named top-level file (parquet or json) carries exactly one
    * `checkpointMetadata` action naming its version, the protocol +
    * metaData, inline add/remove/txn rows, and `sidecar` actions
    * pointing at parquet files under `_delta_log/_sidecars/` that
    * hold the rest of the add/remove set — one level of indirection,
    * SAME action schema, so the classic row fold applies to both
    * levels. Recent Databricks runtimes write these by default on
    * feature-bearing tables; without this replay such tables are
    * unreadable outright. */
  private def replayV2Checkpoint(spark: SparkSession, root: String,
      v: Long, name: String, replay: Replay): Unit = {
    val path = logDir(root).resolve(name)
    val sidecars = scala.collection.mutable.ListBuffer.empty[String]
    def checkVersion(cv: Long): Unit = require(cv == v,
      s"delta-log: v2 checkpoint $name declares version $cv, " +
        s"file name says $v — corrupt checkpoint")
    if (name.endsWith(".json")) {
      var sawMeta = false
      io(root).readLines(path).foreach { line =>
        if (line.nonEmpty) {
          mapper.readTree(line).fields().asScala.foreach { e =>
            e.getKey match {
              case "checkpointMetadata" =>
                sawMeta = true
                checkVersion(e.getValue.get("version").asLong())
              case "sidecar" =>
                sidecars += e.getValue.get("path").asText()
              case k =>
                if (!e.getValue.isNull) replay.applyAction(k, e.getValue)
            }
          }
        }
      }
      require(sawMeta, s"delta-log: UUID-named checkpoint $name has " +
        "no checkpointMetadata action — not a spec-shaped v2 checkpoint")
    } else {
      val df = spark.read.parquet(path.toString)
      val cols = df.columns.toSet
      require(cols.contains("checkpointMetadata"),
        s"delta-log: UUID-named checkpoint $name has no " +
          "checkpointMetadata action — not a spec-shaped v2 checkpoint")
      val cpv = df.select("checkpointMetadata.version")
        .where(df.col("checkpointMetadata").isNotNull).collect()
      require(cpv.length == 1,
        s"delta-log: v2 checkpoint $name must carry exactly one " +
          s"checkpointMetadata action, found ${cpv.length}")
      checkVersion(cpv.head.getLong(0))
      if (cols.contains("sidecar"))
        df.select("sidecar.path")
          .where(df.col("sidecar").isNotNull).collect()
          .foreach(r => sidecars += r.getString(0))
      applyCheckpointRows(df,
        Seq("protocol", "metaData", "add", "remove", "txn",
          "domainMetadata"), replay)
    }
    if (sidecars.nonEmpty) {
      // relative sidecar paths resolve under _delta_log/_sidecars/
      // (the spec's layout); absolute URIs pass through
      val resolved = sidecars.toSeq.sorted.map { p =>
        if (p.contains("://") || p.startsWith("/")) p
        else logDir(root).resolve("_sidecars").resolve(p).toString
      }
      applyCheckpointRows(spark.read.parquet(resolved: _*),
        Seq("add", "remove"), replay)
    }
  }

  // ------------------------------------------------------------------
  // Writer — protocol-conformant minimal writer (protocol (1,2): no
  // writer features needed for plain appends/overwrites of a
  // partitioned parquet table). Data files land first (invisible
  // until referenced), then the commit JSON publishes atomically via
  // LogStore.putIfAbsent — the spec's mutual-exclusion requirement.
  // ------------------------------------------------------------------

  private def jsonStr(s: String): String = mapper.writeValueAsString(s)

  /** Dotted column path → Spark type, recursively through structs —
    * what [[statsJsonOf]] needs to serialize temporal stats in the
    * spec's forms (footer stats type DATE/TIMESTAMP chunks as raw
    * int32/int64). */
  private def dottedTypes(schema: StructType): Map[String, DataType] = {
    def walk(prefix: String, st: StructType): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => (p -> f.dataType) +: walk(p, s)
          case _ => Seq(p -> f.dataType)
        }
      }
    walk("", schema).toMap
  }

  /** Render footer stats as the spec's per-file `stats` JSON.
    * Temporal columns follow the spec's STRING stat forms: DATE
    * min/max serialize as `"yyyy-MM-dd"` (footer stats carry raw
    * epoch days); TIMESTAMP/TIMESTAMP_NTZ min/max are OMITTED
    * (emitting the raw micros a foreign reader would parse as a
    * timestamp string mis-prunes — absent stats just disable
    * skipping), with nullCount kept (type-agnostic). */
  private def statsJsonOf(stats: Map[String, VersionedTable.ColStats],
      types: Map[String, DataType]): Option[String] = {
    if (stats.isEmpty) return None
    val rows = stats.values.map(_.rows).max
    def jsonVal(c: String, typ: String, v: String): Option[String] =
      types.get(c) match {
        case Some(DateType) =>
          Some(jsonStr(java.time.LocalDate.ofEpochDay(v.toLong).toString))
        case Some(TimestampType) | Some(TimestampNTZType) => None
        // COLLATED strings: footer min/max are BINARY-ordered, which
        // does not order like the collation — a collation-aware
        // reader pruning on them would skip matching files. Omit
        // min/max (absent stats just disable skipping); nullCount is
        // type-agnostic and stays
        case Some(s: StringType) if s != StringType => None
        case _ => Some(typ match {
          case "long" | "double" => v
          case _ => jsonStr(v)
        })
      }
    val cols = stats.toSeq.sortBy(_._1)
    val mins = cols.flatMap { case (c, cs) => cs.min.flatMap(v =>
      jsonVal(c, cs.typ, v)).map(j => s"${jsonStr(c)}:$j") }
    val maxs = cols.flatMap { case (c, cs) => cs.max.flatMap(v =>
      jsonVal(c, cs.typ, v)).map(j => s"${jsonStr(c)}:$j") }
    // UNKNOWN counts (<0 sentinel) are omitted, never serialized —
    // a written 0 would claim "no nulls" to every reader's pruner
    val nulls = cols.filter(_._2.nulls >= 0)
      .map { case (c, cs) => s"${jsonStr(c)}:${cs.nulls}" }
    Some(s"""{"numRecords":$rows,"minValues":{${mins.mkString(",")}},""" +
      s""""maxValues":{${maxs.mkString(",")}},""" +
      s""""nullCount":{${nulls.mkString(",")}}}""")
  }

  private def encodePath(p: String): String =
    p.split("/").map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
      .mkString("/")

  /** Stage `df` as parquet (Hive-style `col=value/` dirs when
    * `partitionBy` is set — the partition columns land in the DIRS,
    * not the files, per the spec's layout), then relocate every leaf
    * under the table root with globally unique names, decoding each
    * leaf's directory chain back into `partitionValues` (Spark's own
    * path escaping, `__HIVE_DEFAULT_PARTITION__` → null). Shared by
    * [[commit]] and the copy-on-write rewrite ([[replaceFiles]]). */
  /** TOP-LEVEL collated string columns of `schema` — the stats
    * harvest must see the TABLE's collated types (the staged frame
    * carries plain strings), so [[statsJsonOf]] omits their
    * binary-ordered min/max. */
  /** Dotted paths of every collated string column, NESTED members
    * included — the stats-serialization overrides keying into
    * [[dottedTypes]]'s namespace, so a plain-string staged frame
    * never records binary-ordered min/max for a collated column at
    * any depth. */
  private def collatedTypesOf(schema: StructType): Map[String, DataType] = {
    def walk(prefix: String, st: StructType): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StringType if s.collationId != 0 => Seq(p -> f.dataType)
          case s: StructType => walk(p, s)
          case _ => Nil
        }
      }
    walk("", schema).toMap
  }

  private def stageAndLand(spark: SparkSession, df: DataFrame,
      root: String, partitionBy: Seq[String], nonce: String,
      prefix: String = "",
      // table-side type overrides for the stats serialization (a
      // collated table's staged frames carry PLAIN strings)
      typeOverrides: Map[String, DataType] = Map.empty): Seq[DeltaAdd] = {
    // subdir: createTempDirectory pre-creates the parent, and Spark's
    // errorifexists mode refuses an existing target path
    val staging = Files.createTempDirectory("delta_stage_").resolve("out")
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(staging.toString)
    val stream = Files.walk(staging)
    val leaves =
      try stream.iterator().asScala.toSeq.filter(p =>
        Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("."))
      finally stream.close()
    // ZERO-ROW leaves drop before landing: Spark's writer emits one
    // empty part file per empty task, and committing them bloats the
    // log with adds no reader can use (and no row-id block can size)
    leaves.sortBy(_.toString)
      .map(p => p -> parquetRowCount(spark, p))
      .filter(_._2 > 0L)
      .zipWithIndex.map { case ((p, rowCount), i) =>
      val relDir = staging.relativize(p).getParent // partition dirs or null
      val pvPairs = Option(relDir).toSeq.flatMap(_.iterator().asScala)
        .map(_.toString).filter(_.contains("="))
        .map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(v)
        }
      val nullCols = pvPairs.collect {
        case (k, v) if v == "__HIVE_DEFAULT_PARTITION__" => k }.toSet
      val pv = pvPairs.filterNot(kv => nullCols(kv._1)).toMap
      val name = f"part-$i%05d-$nonce.parquet" // deterministic unique name
      val rel = prefix +
        Option(relDir).map(_.toString + "/").getOrElse("") + name
      val dst = Paths.get(root, rel)
      Files.createDirectories(dst.getParent)
      Files.move(p, dst)
      val st = VersionedTable.footerStats(spark, dst)
      // a file whose columns all lack usable footer stats (e.g. pure
      // binary payloads) still records numRecords — the stat every
      // replayer needs (DV density bounds, row-id block sizing)
      DeltaAdd(rel, pv, nullCols, Files.size(dst),
        statsJsonOf(st, dottedTypes(df.schema) ++ typeOverrides)
          .orElse(Some(
            s"""{"numRecords":$rowCount,"minValues":{},""" +
              """"maxValues":{},"nullCount":{}}""")))
    }
  }

  /** Exact row count from a parquet footer (block record counts). */
  private def parquetRowCount(spark: SparkSession, file: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri),
      spark.sparkContext.hadoopConfiguration))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

  /** One spec-shaped `add` JSON line. */
  private def addLine(a: DeltaAdd, dataChange: Boolean = true): String = {
    val pvJson = (a.partitionValues.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" } ++
      a.nullPartitionCols.toSeq.sorted.map(k => s"${jsonStr(k)}:null"))
      .mkString(",")
    // a deletion vector must survive re-adds (RESTORE) — dropping the
    // descriptor would silently resurrect its deleted rows
    val dvJson = a.deletionVector.fold("") { d =>
      s""","deletionVector":{"storageType":${jsonStr(d.storageType)},""" +
        s""""pathOrInlineDv":${jsonStr(d.pathOrInlineDv)}""" +
        d.offset.fold("")(o => s""","offset":$o""") +
        s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
    }
    val rtJson = a.baseRowId.fold("")(b => s""","baseRowId":$b""") +
      a.defaultRowCommitVersion.fold("")(v =>
        s""","defaultRowCommitVersion":$v""")
    s"""{"add":{"path":${jsonStr(encodePath(a.path))},""" +
      s""""partitionValues":{$pvJson},"size":${a.size},""" +
      s""""modificationTime":${System.currentTimeMillis},""" +
      s""""dataChange":$dataChange${a.statsJson.fold("")(s =>
        s""","stats":${jsonStr(s)}""")}$dvJson$rtJson}}"""
  }

  /** One spec-shaped `protocol` JSON line. Feature lists are emitted
    * only at the versions that define them (readerFeatures at 3,
    * writerFeatures at 7). */
  private def protocolLine(r: Int, w: Int,
      rf: Set[String], wf: Set[String]): String = {
    val rfs = if (r >= 3)
      s""","readerFeatures":[${rf.toSeq.sorted.map(jsonStr).mkString(",")}]"""
    else ""
    val wfs = if (w >= 7)
      s""","writerFeatures":[${wf.toSeq.sorted.map(jsonStr).mkString(",")}]"""
    else ""
    s"""{"protocol":{"minReaderVersion":$r,"minWriterVersion":$w$rfs$wfs}}"""
  }

  /** One spec-shaped `metaData` JSON line. */
  private def metaDataLine(schemaJson: String,
      partitionColumns: Seq[String],
      configuration: Map[String, String],
      tableId: Option[String] = None): String = {
    val parts = partitionColumns.map(jsonStr).mkString(",")
    val conf = configuration.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }.mkString(",")
    // restatements carry the table's id forward — foreign streaming
    // readers key source identity on it
    s"""{"metaData":{"id":${jsonStr(tableId.getOrElse(
      java.util.UUID.randomUUID().toString))},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jsonStr(schemaJson)},"partitionColumns":[$parts],""" +
      s""""configuration":{$conf},"createdTime":${System.currentTimeMillis}}}"""
  }

  /** `dt` with every nested nullability flag forced true and field
    * metadata dropped — for nullability- and metadata-INSENSITIVE
    * schema compatibility checks (writing non-null rows into a
    * nullable column is always sound; mapping ids on the table's
    * nested fields are not a shape difference). */
  private def nullableOf(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = nullableOf(f.dataType), nullable = true,
        metadata = Metadata.empty)))
    case ArrayType(e, _) => ArrayType(nullableOf(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(nullableOf(k), nullableOf(v), valueContainsNull = true)
    case other => other
  }

  /** Writer features a LEGACY minWriterVersion implies — a protocol
    * upgrade to (3,7) must list them as active (the spec's upgrade
    * rule; dropping one would let a feature-unaware writer corrupt
    * an e.g. CDF-enabled table). */
  private def legacyWriterFeatures(w: Int): Set[String] = {
    val ladder = Seq(
      2 -> Set("appendOnly", "invariants"),
      3 -> Set("checkConstraints"),
      4 -> Set("generatedColumns", "changeDataFeed"),
      5 -> Set("columnMapping"),
      6 -> Set("identityColumns"))
    ladder.filter(_._1 <= w).flatMap(_._2).toSet
  }
  private def legacyReaderFeatures(r: Int): Set[String] =
    if (r >= 2) Set("columnMapping") else Set.empty

  /** Writer features whose obligations THIS writer actually honors on
    * every write/DML path: `appendOnly` (non-append ops refuse below),
    * `invariants` + `checkConstraints` ([[enforceRowContracts]] runs
    * on every path that lands new rows), `deletionVectors`,
    * `changeDataFeed`, `columnMapping` (first-class write support),
    * and `timestampNtz` (pure type support — Spark's TimestampNTZType
    * round-trips through parquet natively). */
  private val EnforcedWriterFeatures: Set[String] = Set("appendOnly",
    "invariants", "checkConstraints", "deletionVectors",
    "changeDataFeed", "columnMapping", "timestampNtz",
    // v2Checkpoint's writer obligation — checkpoints in v2 format
    // only — is honored by [[checkpoint]]'s format switch
    "v2Checkpoint",
    // generated columns compute-or-verify on every row-landing path
    // ([[applyGeneratedColumns]]); identity columns allocate past the
    // mark and restate it in the same commit ([[applyIdentityColumns]]),
    // with UPDATE/MERGE assignment refusals guarding the rest
    "generatedColumns", "identityColumns",
    // widening writes record `delta.typeChanges` and upgrade the
    // protocol in the same commit ([[evolveSchema]])
    "typeWidening",
    // domain metadata is REPLAY state here: every commit leaves it in
    // the log, [[checkpoint]] compacts the live domains into the
    // checkpoint, RESTORE reconciles to the target's domains, and the
    // putIfAbsent commit protocol makes ANY concurrent commit —
    // same-domain ones included — conflict. The clustered-table
    // writer obligation is "preserve the delta.clustering domain"
    // (which the above provides — real clustered tables stay
    // writable) plus best-effort layout maintenance, which
    // [[compact]] honors by re-clustering on the domain's columns.
    // Both protocol spellings: delta-spark lists `clusteredTable`;
    // `clustering` is the earlier preview spelling.
    "domainMetadata", "clustering", "clusteredTable",
    // row tracking: every path that lands new adds assigns fresh
    // id blocks past the high-water mark and restates the
    // delta.rowTracking domain in the same commit ([[assignRowIds]],
    // called from commit/replaceFiles/DV-DML/OPTIMIZE/RESTORE);
    // checkpoints carry baseRowId/defaultRowCommitVersion
    "rowTracking",
    // in-commit timestamps: every commit path leads with
    // [[commitInfoLine]], which stamps a MONOTONIC inCommitTimestamp
    // (> predecessor's) as the first action whenever the
    // delta.enableInCommitTimestamps property is on — exactly the
    // spec's writer obligation (recent delta-spark enables ICT on
    // new tables by default; without this, those tables would be
    // read-only here)
    "inCommitTimestamp",
    // vacuumProtocolCheck's writer obligation is "run VACUUM only
    // after a full protocol check" — [[vacuum]] resolves the snapshot
    // through gateProtocol/gateWriterObligations before touching any
    // file, which IS that check
    "vacuumProtocolCheck",
    // icebergCompatV2 (UniForm): every commit path ends in
    // [[syncUniform]], which advances the co-located live Iceberg
    // metadata tree over the same files — the feature's whole point
    "icebergCompatV2",
    // checkpointProtection's obligation binds METADATA CLEANUP: log
    // truncation must never land a boundary below
    // requireCheckpointProtectionBeforeVersion — [[cleanupMetadata]]
    // (the ONE log-truncation path here) refuses exactly that sweep
    // unless the whole protected range cleans in one pass
    "checkpointProtection",
    // variantType's writer obligation — write variant values in the
    // spec's binary encoding — is Spark 4's own parquet writer
    // behavior for VariantType columns (the staged files ARE the
    // mandated representation)
    "variantType",
    // variantShredding's writer obligation: either write valid
    // shredded files or unshredded ones (shredding is optional per
    // file) — this writer stages variant columns unshredded through
    // Spark's parquet writer, which is a conformant choice
    "variantShredding",
    // collations: collated strings surface through Spark 4's native
    // collated StringType (DataType.fromJson reconstitutes them from
    // the __COLLATIONS field metadata delta-spark writes), so row
    // comparisons — filters, DML predicates, CHECKs, sorts — are
    // collation-aware via Spark itself. The obligations this engine
    // honors: schema restates carry the collation metadata verbatim
    // (schemaString round-trips), file-skipping NEVER prunes on a
    // collated column (its binary-ordered stats don't order like the
    // collation — read side keeps such files conservatively, write
    // side omits their min/max in [[statsJsonOf]]), and appends
    // accept plain-string frames into collated columns (the parquet
    // physical type is identical; collation is logical metadata)
    "collations")

  /** Does `dt` contain a COLLATED string anywhere (nested included)? */
  private def hasCollatedType(dt: DataType): Boolean = dt match {
    case s: StringType => s.collationId != 0
    case st: StructType => st.fields.exists(f => hasCollatedType(f.dataType))
    case ArrayType(e, _) => hasCollatedType(e)
    case MapType(k, v, _) => hasCollatedType(k) || hasCollatedType(v)
    case _ => false
  }

  /** Every collated StringType instance normalized to the default —
    * the collation-insensitive schema-compat shape (collation is
    * comparison semantics, not physical layout). */
  private def decollate(dt: DataType): DataType = dt match {
    case _: StringType => StringType
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = decollate(f.dataType))))
    case ArrayType(e, n) => ArrayType(decollate(e), n)
    case MapType(k, v, n) => MapType(decollate(k), decollate(v), n)
    case o => o
  }

  /** Does `dt` contain a variant ANYWHERE (nested included)? Both
    * specs gate variant by feature/format-version on the whole
    * schema, so every creation/evolution/conversion path checks
    * recursively. */
  private[sources] def hasVariantType(dt: DataType): Boolean = dt match {
    case VariantType => true
    case st: StructType => st.fields.exists(f => hasVariantType(f.dataType))
    case ArrayType(e, _) => hasVariantType(e)
    case MapType(k, v, _) => hasVariantType(k) || hasVariantType(v)
    case _ => false
  }

  /** Is the in-commit-timestamps table property on? (The obligation
    * keys on the PROPERTY; the protocol feature licenses it.) */
  private def ictEnabled(configuration: Map[String, String]): Boolean =
    configuration.get("delta.enableInCommitTimestamps").contains("true")

  /** Is UniForm active? (`delta.enableIcebergCompatV2` or Iceberg
    * listed in `delta.universalFormat.enabledFormats` — delta-spark's
    * two spellings; the compat property is what the writer feature
    * `icebergCompatV2` licenses.) */
  private def uniformEnabled(configuration: Map[String, String]): Boolean =
    configuration.get("delta.enableIcebergCompatV2").contains("true") ||
      configuration.get("delta.universalFormat.enabledFormats")
        .exists(_.split(",").map(_.trim).contains("iceberg"))

  /** PRE-COMMIT gate for UniForm writes: the shapes [[syncUniform]]
    * cannot mirror must refuse BEFORE the Delta commit lands — a
    * post-commit refusal would leave a durably-advanced log behind an
    * exception the caller reads as "nothing happened". Checked with
    * the PROSPECTIVE post-commit state at every hook site;
    * syncUniform's own requires remain as a backstop. */
  private def gateUniform(root: String,
      configuration: Map[String, String],
      schema: StructType, partitionColumns: Seq[String],
      columnMapping: Map[String, String], carriesDv: Boolean,
      operation: String): Unit = {
    if (!uniformEnabled(configuration)) return
    gateUniformShape(schema, partitionColumns, columnMapping,
      carriesDv, operation)
    // schema DRIFT against an existing mirror must also refuse
    // pre-commit: a mergeSchema append or schema-changing overwrite
    // whose drift the mirror cannot follow (type change, required
    // addition) would otherwise land durably and then fail in the
    // post-commit sync. Expressible drift (added nullable / dropped /
    // renamed-mapped columns) passes — syncUniform publishes the
    // evolved schema.
    IcebergMeta.requireMirrorSyncable(root, schema,
      uniformMappingOf(schema, columnMapping))
  }

  /** logical name → (column-mapping id, physical name) — the id-mode
    * contract real icebergCompatV2 mandates, handed to the Iceberg
    * sync so the mirror's field ids EQUAL the Delta mapping ids and
    * its `schema.name-mapping.default` names the physical parquet
    * columns. Empty for unmapped tables. */
  private def uniformMappingOf(schema: StructType,
      columnMapping: Map[String, String])
      : Map[String, (Int, String)] =
    if (columnMapping.isEmpty) Map.empty
    else schema.fields.map { f =>
      f.name -> (
        f.metadata.getLong("delta.columnMapping.id").toInt,
        f.metadata.getString("delta.columnMapping.physicalName"))
    }.toMap

  private def gateUniformShape(schema: StructType,
      partitionColumns: Seq[String],
      columnMapping: Map[String, String], carriesDv: Boolean,
      operation: String): Unit = {
    // COLUMN-MAPPED tables mirror through the id contract (field ids
    // = mapping ids + the spec's name-mapping property), FLAT shapes
    // only — a nested mapped schema would need physical names at
    // every level, which the mirror's name mapping does not carry
    if (columnMapping.nonEmpty) {
      require(schema.fields.forall(f => f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      }), s"delta-log $operation: NESTED column-mapped tables cannot " +
        "enable icebergCompatV2 (the mirror's name mapping covers " +
        "top-level columns only)")
      require(schema.fields.forall(f =>
        f.metadata.contains("delta.columnMapping.id") &&
          f.metadata.contains("delta.columnMapping.physicalName")),
        s"delta-log $operation: a mapped field lacks its " +
          "delta.columnMapping.id/physicalName metadata — " +
          "icebergCompatV2 mandates id-mode mapping ids")
    }
    require(partitionColumns.isEmpty,
      s"delta-log $operation: partitioned tables cannot enable " +
        "icebergCompatV2 (Hive layout keeps partition columns OUT of " +
        "the data files, which Iceberg requires IN them)")
    // collated strings have no Iceberg type — without this PRE-commit
    // refusal the Delta commit would land durably and then fail in
    // the post-commit sync (the exact stranded-commit mode this gate
    // exists to prevent, same posture as the variant refusal below)
    require(!hasCollatedType(schema),
      s"delta-log $operation: tables with collated string columns " +
        "cannot enable icebergCompatV2 (Iceberg has no collated " +
        "string type for the mirror schema)")
    require(!carriesDv,
      s"delta-log $operation: deletion vectors cannot be mirrored " +
        "zero-copy into the Iceberg tree — REORG PURGE the table " +
        "first")
    require(!hasVariantType(schema),
      s"delta-log $operation: variant columns have no v2 Iceberg " +
        "type — not mirrorable")
  }

  /** The `icebergCompatV2` writer obligation, honored FOR REAL: after
    * every commit on a UniForm table, advance the LIVE Iceberg
    * metadata tree co-located at the table root (`metadata/` next to
    * `_delta_log/`) so both formats reference the SAME parquet —
    * [[IcebergMeta.syncExternal]], the incremental form of the r12
    * one-shot converter (new files: one ADDED manifest with footer
    * bounds, per-COMMIT planning I/O; retired files: manifest
    * restatement; no change: no Iceberg commit at all). An Iceberg
    * engine then reads the Delta table's root directly.
    *
    * Divergences, stated: real icebergCompatV2 mandates id-mode
    * column mapping (Iceberg readers resolve by field id); this
    * engine's Iceberg reader resolves by NAME, so the supported
    * UniForm shape here is UNMAPPED tables — mapped, partitioned,
    * DV-carrying or variant-typed tables refuse loudly rather than
    * publish a tree other engines would misread. */
  private def syncUniform(spark: SparkSession, root: String,
      evenIfDisabled: Boolean = false): Unit = {
    val snap = snapshot(spark, root)
    if (!evenIfDisabled && !uniformEnabled(snap.configuration)) return
    require(snap.partitionColumns.isEmpty,
      "delta-log uniform: partitioned tables are not synced (Hive " +
        "layout keeps partition columns OUT of the data files, which " +
        "Iceberg requires IN them)")
    require(snap.adds.forall(_.deletionVector.isEmpty),
      "delta-log uniform: deletion vectors cannot be mirrored " +
        "zero-copy — REORG PURGE the table first")
    require(!hasVariantType(snap.schema),
      "delta-log uniform: variant columns have no v2 Iceberg type — " +
        "not mirrorable")
    val rootP = Paths.get(root).toAbsolutePath.normalize
    val files = snap.adds.sortBy(_.path).map { a =>
      val p = Paths.get(a.path)
      ((if (p.isAbsolute) p else rootP.resolve(p)).normalize, a.path)
    }
    IcebergMeta.syncExternal(spark, rootP.toString, snap.schema, files,
      uniformMappingOf(snap.schema, snap.columnMapping))
    ()
  }

  /** [[syncUniform]] with CAS-race convergence: the sync reads the
    * CURRENT Delta snapshot and diffs against the CURRENT Iceberg
    * tree, so losing an Iceberg commit race to a concurrent writer's
    * sync just means someone else advanced the mirror — re-reading
    * and re-diffing converges (usually to a no-op). Without the
    * retry, the LOSER's Delta commit — already durable — would
    * surface as a failure. Bounded: a livelock past the bound is a
    * real error worth seeing. */
  private def syncUniformConverging(spark: SparkSession,
      root: String, evenIfDisabled: Boolean = false): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try { syncUniform(spark, root, evenIfDisabled); done = true }
      catch {
        case e: VersionedTable.ConcurrentCommitException =>
          if (attempts < 5) attempts += 1
          // at exhaustion the caller must NOT read this as a failed
          // write: the Delta commit is already durable — only the
          // Iceberg mirror lags (livelock is still worth surfacing)
          else throw new IllegalStateException(
            s"delta-log uniform: the Delta commit at $root is DURABLE " +
              s"and the table state is correct, but the Iceberg mirror " +
              s"sync lost $attempts consecutive commit races and gave " +
              "up — the mirror lags the Delta log until the next " +
              "commit (or any re-run sync) advances it", e)
      }
    }
  }

  private def ictOfFile(root: String, p: Path): Option[Long] =
    io(root).readLines(p).view
      .filter(_.nonEmpty).map(mapper.readTree)
      .flatMap(n => Option(n.get("commitInfo")))
      .flatMap(ci => Option(ci.get("inCommitTimestamp"))
        .filterNot(_.isNull).map(_.asLong()))
      .headOption

  /** The recorded `commitInfo.inCommitTimestamp` of commit `v` —
    * one small log-file read; None when the commit carries none.
    * A commit retired behind a COMPACTED span ending exactly at `v`
    * resolves through the span's preserved final commitInfo
    * ([[compactLog]] keeps it for exactly this — an ICT table's next
    * commit must still see its predecessor's timestamp). */
  private[sources] def ictOf(root: String, v: Long): Option[Long] =
    if (io(root).exists(commitPath(root, v)))
      ictOfFile(root, commitPath(root, v))
    else listLog(root).spans.toSeq
      .collect { case (s, es) if es.contains(v) => s }
      .sorted.lastOption
      .flatMap(s => ictOfFile(root,
        logDir(root).resolve(f"$s%020d.$v%020d.compacted.json")))

  /** The in-commit timestamp THIS commit must carry: wall clock,
    * floored to strictly exceed the predecessor's recorded ICT (the
    * spec's monotonicity rule — a clock-skewed writer never emits a
    * non-increasing timestamp). */
  private def nextIct(root: String, prevVersion: Long): Long = {
    val now = System.currentTimeMillis
    val prev = if (prevVersion < 0) None else ictOf(root, prevVersion)
    math.max(now, prev.map(_ + 1L).getOrElse(now))
  }

  /** The leading `commitInfo` line of a commit. With in-commit
    * timestamps ON in `configuration` (this commit's FINAL table
    * configuration), stamps the monotonic `inCommitTimestamp` — the
    * spec additionally requires commitInfo to be the FIRST action,
    * which every writer path here satisfies by construction (this
    * line is always `lines += ...`'d first). */
  private def commitInfoLine(root: String, operation: String,
      configuration: Map[String, String], prevVersion: Long): String =
    if (!ictEnabled(configuration))
      s"""{"commitInfo":{"timestamp":${System.currentTimeMillis},""" +
        s""""operation":"$operation"}}"""
    else {
      val ict = nextIct(root, prevVersion)
      s"""{"commitInfo":{"inCommitTimestamp":$ict,"timestamp":$ict,""" +
        s""""operation":"$operation"}}"""
    }

  /** The authoritative commit timestamp of version `v` — what
    * TIMESTAMP AS OF and history ordering key on: the recorded
    * `inCommitTimestamp` for every version the feature governs
    * (from `delta.inCommitTimestampEnablementVersion`, or 0 when the
    * property was on from creation — a governed commit missing its
    * ICT is corrupt and refuses), the commit FILE's modification
    * time below that (the pre-ICT rule; mtime is what delta-spark
    * uses there, and why late enablement records the provenance
    * properties at all). */
  def commitTimestamp(root: String,
      configuration: Map[String, String], v: Long): Long = {
    val governed = ictEnabled(configuration) &&
      v >= configuration.get("delta.inCommitTimestampEnablementVersion")
        .map(_.toLong).getOrElse(0L)
    if (governed) ictOf(root, v).getOrElse(
      throw new IllegalStateException(
        s"delta-log: commit $v of $root must carry " +
          "inCommitTimestamp (the feature governs it) — corrupt log"))
    else io(root).mtimeMs(commitPath(root, v))
  }

  /** TIMESTAMP AS OF resolution: the LATEST version whose commit
    * timestamp ([[commitTimestamp]]) is `<= tsMillis`. Binary search
    * over the RETAINED commit files — a checkpoint-truncated log
    * (delta-spark metadata cleanup) keeps only a recent JSON suffix,
    * and versions whose commit file is gone are not addressable by
    * timestamp (delta-spark refuses them identically) — so O(log n)
    * small log reads, never a full-history scan. `configuration`
    * spares a second full replay when the caller already holds the
    * latest snapshot. */
  def versionAtTimestamp(spark: SparkSession, root: String,
      tsMillis: Long,
      configuration: Option[Map[String, String]] = None): Long = {
    val versions = jsonVersions(root).sorted
    require(versions.nonEmpty,
      s"$root is not a Delta table (no _delta_log)")
    val conf = configuration.getOrElse(
      snapshot(spark, root).configuration)
    def tsOf(v: Long): Long = commitTimestamp(root, conf, v)
    require(tsOf(versions.head) <= tsMillis,
      s"delta-log: timestamp $tsMillis predates the earliest " +
        s"RETAINED commit of $root (v${versions.head} at " +
        s"${tsOf(versions.head)})")
    var lo = 0
    var hi = versions.size - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (tsOf(versions(mid)) <= tsMillis) lo = mid else hi = mid - 1
    }
    versions(lo)
  }

  /** The Delta protocol's writer rule: a writer MUST honor every
    * ACTIVE writer feature's obligations or refuse the commit — an
    * unenforced commit silently breaks the table's contract for every
    * other engine (a CHECK-violating append, a delete on an
    * append-only table). Active features come from `writerFeatures`
    * at protocol (…,7) or the legacy `minWriterVersion` ladder below
    * it. `delta.appendOnly=true`
    * additionally refuses any operation that removes or rewrites
    * existing rows with `dataChange` (OPTIMIZE's dataChange=false
    * rewrite stays legal). Called by every write/DML entry point. */
  private def gateWriterObligations(snap: DeltaSnapshot,
      operation: String, removesData: Boolean): Unit = {
    val active =
      if (snap.minWriterVersion >= 7) snap.writerFeatures
      else legacyWriterFeatures(snap.minWriterVersion)
    val unenforced = active -- EnforcedWriterFeatures
    if (unenforced.nonEmpty) throw new UnsupportedOperationException(
      s"delta-log $operation: table requires writer feature(s) " +
        s"${unenforced.toSeq.sorted.mkString(", ")} this writer does " +
        "not enforce — refusing to write (an unenforced commit would " +
        "silently break the table's contract for other engines)")
    if (removesData &&
        snap.configuration.get("delta.appendOnly").contains("true"))
      throw new UnsupportedOperationException(
        s"delta-log $operation: table is append-only " +
          "(delta.appendOnly=true) — operations that remove or " +
          "rewrite existing rows are prohibited")
  }

  /** Enforce the table's ROW-LEVEL write contracts on `df` (LOGICAL
    * schema): CHECK constraints (`delta.constraints.<name>` in the
    * configuration — NULL passes, the SQL rule) and legacy column
    * invariants (`delta.invariants` field metadata — NULL violates,
    * delta-spark's rule for them). One extra aggregate pass over the
    * rows being written, all contracts counted simultaneously — the
    * same shape as graft's own CHECK enforcement
    * ([[VersionedTable]]'s DML routes). No contracts → no job. */
  private def enforceRowContracts(df: => DataFrame,
      schema: StructType, configuration: Map[String, String],
      operation: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not,
      sum, when}
    val checks = configuration.toSeq.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        (s"constraint ${k.stripPrefix("delta.constraints.")}", v, true)
    }.sortBy(_._1)
    val invariants = schema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains("delta.invariants")) Nil
      else {
        val n = mapper.readTree(f.metadata.getString("delta.invariants"))
        val e = n.path("expression").path("expression")
        if (e.isTextual) Seq((s"invariant on ${f.name}", e.asText(), false))
        else Nil
      }
    }
    val all = checks ++ invariants
    if (all.isEmpty) return
    val aggs = all.map { case (_, sql, nullPasses) =>
      sum(when(not(coalesce(expr(sql), lit(nullPasses))), 1L)
        .otherwise(0L))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    all.zipWithIndex.foreach { case ((name, sql, _), i) =>
      val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (bad > 0) throw new IllegalArgumentException(
        s"delta-log $operation: $bad row(s) violate CHECK $name ($sql)")
    }
  }

  /** May a column physically stored as `from` be DECLARED as `to`,
    * with old files upcast at read time? Exactly the promotions the
    * Delta `typeWidening` table feature licenses AND Spark 4's
    * vectorized parquet reader performs natively when the declared
    * schema is wider than a file's physical type: the integer chain,
    * float→double, decimal precision growth at the same scale, and
    * date→timestamp_ntz. Narrowing, scale changes and cross-family
    * retypes change VALUES, not headroom — refused. */
  private def isSafeWidening(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d2.precision > d1.precision && d2.scale == d1.scale
      case (DateType, TimestampNTZType) => true
      case _ => false
    }

  /** Delta's primitive type name of `dt` (what `delta.typeChanges`
    * records) — Spark's JSON names coincide for every widenable
    * type. */
  private def deltaTypeName(dt: DataType): String =
    dt.json.stripPrefix("\"").stripSuffix("\"")

  /** The `mergeSchema` evolution of an append: incoming-only columns
    * ADD (nullable, at the end — old files null-fill them at read
    * time, the Delta rule), and an incoming column WIDER than the
    * table's widens the declared type when [[isSafeWidening]] allows
    * (recorded in `delta.typeChanges` field metadata; the caller
    * upgrades the protocol with the `typeWidening` reader-writer
    * feature — the spec only licenses reading narrow old files under
    * a wide schema on feature-bearing tables). Anything else —
    * narrowing, retypes, nested shape changes — is left for the
    * append schema check to refuse. On COLUMN-MAPPED tables added
    * fields are stamped with fresh mapping ids + physical names and
    * `delta.columnMapping.maxColumnId` advances in the same commit.
    * Returns (evolved schema, any widening happened, updated
    * configuration), or None when nothing evolves. */
  private def evolveSchema(prev: StructType, incoming: StructType,
      mapped: Boolean, configuration: Map[String, String])
      : Option[(StructType, Boolean, Map[String, String])] = {
    var widened = false
    val updated = prev.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(inF) if nullableOf(inF.dataType) != nullableOf(f.dataType) &&
            isSafeWidening(f.dataType, inF.dataType) =>
          widened = true
          val change = new MetadataBuilder()
            .putString("fromType", deltaTypeName(f.dataType))
            .putString("toType", deltaTypeName(inF.dataType)).build()
          val prior =
            if (f.metadata.contains("delta.typeChanges"))
              f.metadata.getMetadataArray("delta.typeChanges")
            else Array.empty[Metadata]
          f.copy(dataType = inF.dataType, metadata =
            new MetadataBuilder().withMetadata(f.metadata)
              .putMetadataArray("delta.typeChanges", prior :+ change)
              .build())
        case _ => f
      }
    }
    val prevNames = prev.fieldNames.toSet
    val added0 = incoming.fields.toSeq
      .filterNot(f => prevNames.contains(f.name))
      .map(f => f.copy(nullable = true, metadata = Metadata.empty))
    // mergeSchema restates metaData without a protocol line — an
    // ADDED variant column would land on a table whose protocol
    // never listed the variantType feature (a spec violation
    // feature-unaware engines then mis-handle)
    added0.foreach(f => require(!hasVariantType(f.dataType),
      s"delta-log mergeSchema: cannot ADD variant column " +
        s"'${f.name}' — the variantType feature must be stamped at " +
        "creation; recreate the table with the column instead"))
    var conf = configuration
    val added =
      if (!mapped || added0.isEmpty) added0
      else {
        var nextId = configuration
          .get("delta.columnMapping.maxColumnId").map(_.toLong)
          .getOrElse(0L)
        val stamped = added0.map { f =>
          def hasStruct(dt: DataType): Boolean = dt match {
            case _: StructType => true
            case ArrayType(e, _) => hasStruct(e)
            case MapType(k, v, _) => hasStruct(k) || hasStruct(v)
            case _ => false
          }
          require(!hasStruct(f.dataType),
            s"delta-log mergeSchema: cannot add STRUCT column ${f.name} " +
              "to a column-mapped table (nested members need their own " +
              "mapping ids) — evolve with delta-spark")
          nextId += 1
          f.copy(metadata = new MetadataBuilder()
            .putLong("delta.columnMapping.id", nextId)
            .putString("delta.columnMapping.physicalName",
              s"col-${java.util.UUID.randomUUID()}")
            .build())
        }
        conf = configuration +
          ("delta.columnMapping.maxColumnId" -> nextId.toString)
        stamped
      }
    if (!widened && added.isEmpty) None
    else Some((StructType(updated ++ added), widened, conf))
  }

  /** Top-level fields carrying a GENERATED ALWAYS AS expression
    * (`delta.generationExpression` field metadata — the
    * generatedColumns writer feature's anchor). */
  private def generatedFields(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(
      _.metadata.contains("delta.generationExpression"))

  /** Honor the `generatedColumns` writer obligation on `df` (LOGICAL
    * schema): columns MISSING from the frame compute from their
    * generation expression; columns SUPPLIED verify against it (the
    * protocol requires the stored value to equal the expression's
    * result — a mismatched supplied value must refuse, never land).
    * All supplied columns verify in ONE aggregate pass (null-safe
    * equality: a NULL result matches a NULL supplied value). No
    * generated columns → `df` unchanged, no job. */
  private def applyGeneratedColumns(df: DataFrame, schema: StructType,
      operation: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, sum, when}
    val gens = generatedFields(schema)
    if (gens.isEmpty) return df
    def genExpr(f: StructField) =
      expr(f.metadata.getString("delta.generationExpression"))
        .cast(f.dataType)
    val supplied = gens.filter(g => df.columns.contains(g.name))
    if (supplied.nonEmpty) {
      val aggs = supplied.map(g =>
        sum(when(!(col(s"`${g.name}`") <=> genExpr(g)), 1L)
          .otherwise(0L)))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      supplied.zipWithIndex.foreach { case (g, i) =>
        val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
        if (bad > 0) throw new IllegalArgumentException(
          s"delta-log $operation: $bad row(s) supply a value for " +
            s"generated column ${g.name} that does not match its " +
            "generation expression " +
            s"(${g.metadata.getString("delta.generationExpression")})")
      }
    }
    gens.filterNot(g => df.columns.contains(g.name))
      .foldLeft(df)((d, g) => d.withColumn(g.name, genExpr(g)))
  }

  /** Top-level IDENTITY fields (`delta.identity.*` field metadata —
    * the identityColumns writer feature's anchor). */
  private def identityFields(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f =>
      f.metadata.contains("delta.identity.start") ||
        f.metadata.contains("delta.identity.step") ||
        f.metadata.contains("delta.identity.highWaterMark") ||
        f.metadata.contains("delta.identity.allowExplicitInsert"))

  private def identityAllowsExplicit(f: StructField): Boolean =
    f.metadata.contains("delta.identity.allowExplicitInsert") &&
      f.metadata.getBoolean("delta.identity.allowExplicitInsert")

  /** Honor the `identityColumns` writer obligation on an incoming
    * frame: identity columns MISSING from `df` allocate values past
    * the recorded high-water mark (`hwm + k*step`, first value
    * `start` on a fresh column) and the updated mark restates in the
    * SAME commit's metaData (the spec's monotonicity contract —
    * losing the mark would let a later writer re-issue values);
    * identity columns SUPPLIED refuse unless the column was declared
    * GENERATED BY DEFAULT (`allowExplicitInsert` — explicit values
    * do NOT move the mark, the spec's rule; re-syncing is a separate
    * maintenance op in every engine). Allocation is one
    * `zipWithIndex` pass — per-partition offsets resolve from one
    * count job, no global sort, dense values (delta-spark reserves
    * gappy per-task blocks; both are legal, dense keeps the mark
    * small). Returns the frame plus the restated schema when a mark
    * moved. */
  private def applyIdentityColumns(df: DataFrame, schema: StructType,
      operation: String): (DataFrame, Option[StructType]) = {
    val ids = identityFields(schema)
    if (ids.isEmpty) return (df, None)
    ids.filter(f => df.columns.contains(f.name)).foreach { f =>
      if (!identityAllowsExplicit(f))
        throw new IllegalArgumentException(
          s"delta-log $operation: column ${f.name} is GENERATED ALWAYS " +
            "AS IDENTITY — explicit values are not allowed (declare it " +
            "GENERATED BY DEFAULT to permit them)")
    }
    val missing = ids.filterNot(f => df.columns.contains(f.name))
    if (missing.isEmpty) return (df, None)
    missing.foreach(f => require(
      f.dataType == LongType || f.dataType == IntegerType,
      s"delta-log: identity column ${f.name} must be integral, " +
        s"is ${f.dataType.simpleString}"))
    case class Alloc(start: Long, step: Long, base: Long)
    val allocs = missing.map { f =>
      val start = if (f.metadata.contains("delta.identity.start"))
        f.metadata.getLong("delta.identity.start") else 1L
      val step = if (f.metadata.contains("delta.identity.step"))
        f.metadata.getLong("delta.identity.step") else 1L
      require(step != 0, s"delta-log: identity step of ${f.name} is 0")
      val base = if (f.metadata.contains("delta.identity.highWaterMark"))
        f.metadata.getLong("delta.identity.highWaterMark")
      else start - step
      f -> Alloc(start, step, base)
    }
    val n = df.count()
    if (n == 0) return (df, None)
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ allocs.map(_._1))
    val withIds = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq ++ allocs.map { case (f, a) =>
        val v = a.base + a.step * (i + 1)
        if (f.dataType == IntegerType) {
          require(v >= Int.MinValue && v <= Int.MaxValue,
            s"identity value $v overflows INT column ${f.name}")
          v.toInt
        } else v
      })
    }
    val out = spark.createDataFrame(withIds, outSchema)
    val newSchema = StructType(schema.fields.map { f =>
      allocs.find(_._1.name == f.name) match {
        case Some((_, a)) => f.copy(metadata =
          new MetadataBuilder().withMetadata(f.metadata)
            .putLong("delta.identity.highWaterMark", a.base + a.step * n)
            .build())
        case None => f
      }
    })
    (out, Some(newSchema))
  }

  /** Stamp a FRESH column mapping onto `schema`: every struct field —
    * top-level and nested — gets `delta.columnMapping.id` (DFS
    * order, 1-based) and a `col-<uuid>` physicalName, the metadata
    * the spec requires in BOTH 'name' and 'id' modes. Returns the
    * mapped logical schema and the maxColumnId to record. */
  private def stampMapping(schema: StructType): (StructType, Long) = {
    var nextId = 0L
    def walk(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        nextId += 1
        val id = nextId
        // nullable-normalized: the logical-restore projection rebuilds
        // nested structs via null-guarded struct(), which is nullable —
        // a NOT NULL nested field in the recorded schema could never
        // be restored (and nullable is a pure widening)
        f.copy(dataType = walk(f.dataType), nullable = true, metadata =
          new MetadataBuilder().withMetadata(f.metadata)
            .putLong("delta.columnMapping.id", id)
            .putString("delta.columnMapping.physicalName",
              s"col-${java.util.UUID.randomUUID()}")
            .build())
      })
      case ArrayType(e, n) => ArrayType(walk(e), n)
      case MapType(k, v, n) => MapType(walk(k), walk(v), n)
      case other => other
    }
    val out = walk(schema).asInstanceOf[StructType]
    (out, nextId)
  }

  /** Physical schema with `parquet.field.id` copied from the mapping
    * ids: Spark's parquet writer (fieldId.write.enabled, on by
    * default) then writes REAL field ids into the staged files —
    * what an 'id'-mode foreign reader resolves columns by. */
  private def withParquetFieldIds(schema: StructType): StructType = {
    def walk(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val md = if (f.metadata.contains("delta.columnMapping.id"))
          new MetadataBuilder().withMetadata(f.metadata)
            .putLong("parquet.field.id",
              f.metadata.getLong("delta.columnMapping.id")).build()
        else f.metadata
        f.copy(dataType = walk(f.dataType), metadata = md)
      })
      case ArrayType(e, n) => ArrayType(walk(e), n)
      case MapType(k, v, n) => MapType(walk(k), walk(v), n)
      case other => other
    }
    walk(schema).asInstanceOf[StructType]
  }

  /** `df` restated in the PHYSICAL column space of a mapped table for
    * staging: every column renamed to its physical name with the
    * physical field's metadata attached (incl. parquet.field.id);
    * NESTED renames ride a by-position struct cast — types were
    * already validated against the logical schema, so the cast can
    * only rename, never coerce. */
  private def toPhysicalDf(df: DataFrame, logicalSchema: StructType,
      root: String): DataFrame = {
    val phys = withParquetFieldIds(physicalSchemaOf(root, logicalSchema))
    val byLogical = logicalSchema.fieldNames.zip(phys.fields).toMap
    df.select(df.schema.fieldNames.toSeq.map { n =>
      val pf = byLogical.getOrElse(n, throw new IllegalArgumentException(
        s"delta-log: column $n not in the table schema"))
      df.col(s"`$n`").cast(pf.dataType).as(pf.name, pf.metadata)
    }: _*)
  }

  /** Commit `df` to the Delta table at `root`.
    *
    * `mode`: `append` adds files (schema must match the table's by
    * name and type); `overwrite` removes every live file and restates
    * the metadata — carrying the existing table's CONFIGURATION and
    * PROTOCOL forward (an overwrite must not strip CDF or downgrade
    * features). `partitionBy`: identity partition columns — data
    * files land under Hive-style `col=value/` directories WITHOUT the
    * partition columns (the spec's layout), and each add records its
    * `partitionValues`.
    *
    * `properties` (new tables only) become the table configuration:
    *  - `delta.columnMapping.mode` = `name`|`id` creates a
    *    COLUMN-MAPPED table — the schema is stamped with mapping ids
    *    and `col-<uuid>` physical names, files stage under physical
    *    names with parquet field ids, and the protocol records
    *    (2,5);
    *  - `delta.enableDeletionVectors` = `true` raises the protocol
    *    to (3,7) with the `deletionVectors` feature, after which
    *    [[deleteWhere]] writes DVs instead of rewriting files.
    *
    * Appends and overwrites of MAPPED tables (created here or by
    * delta-spark) stage in physical space automatically; overwrite
    * of a mapped table must keep the table schema (the restated
    * schemaString is the existing mapped one). Returns the committed
    * version. */
  def commit(df: DataFrame, root: String, mode: String = "append",
      partitionBy: Seq[String] = Nil,
      txn: Option[(String, Long)] = None,
      properties: Map[String, String] = Map.empty,
      mergeSchema: Boolean = false,
      // LIQUID CLUSTERING at creation (delta-spark's CLUSTER BY): the
      // first commit records the `delta.clustering` domain and lists
      // the clusteredTable + domainMetadata writer features; OPTIMIZE
      // then re-clusters by these columns ([[compact]])
      clusterBy: Seq[String] = Nil): Long = {
    require(mode == "append" || mode == "overwrite",
      s"delta-log: mode must be append|overwrite, got $mode")
    val spark = df.sparkSession
    io(root).mkdirs(logDir(root))
    val latest = latestVersion(root)
    val existing = if (latest < 0) None else Some(snapshot(spark, root))
    require(existing.isEmpty || properties.isEmpty,
      "delta-log: table properties are set at CREATION (or via " +
        "setConfiguration) — not on writes to an existing table")
    if (clusterBy.nonEmpty) {
      require(existing.isEmpty,
        "delta-log: CLUSTER BY is set at table CREATION — an existing " +
          "table keeps its own clustering domain")
      // the protocol's clusteredTable contract: clustered tables are
      // never Hive-partitioned (clustering IS the layout policy)
      require(partitionBy.isEmpty,
        "delta-log: CLUSTER BY and PARTITIONED BY are mutually " +
          "exclusive")
      val missing = clusterBy.filterNot(df.schema.fieldNames.contains)
      require(missing.isEmpty,
        s"delta-log: CLUSTER BY names non-columns ${missing.mkString(", ")}")
    }
    val opName = if (mode == "append") "WRITE" else "OVERWRITE"
    // writer features with METADATA-anchored obligations, honored
    // BEFORE the shape checks so the enriched frame is what validates
    // and stages: identity columns allocate (and move the mark),
    // generated columns compute when missing / verify when supplied.
    // CREATION records the incoming schema verbatim (the frame DEFINES
    // the contract — there is no prior mark to honor); generated
    // values still verify.
    val (dfId, identitySchema) = existing match {
      case Some(s) => applyIdentityColumns(df, s.schema, opName)
      case None => (df, None)
    }
    val dfIn0 = applyGeneratedColumns(dfId,
      existing.map(_.schema).getOrElse(df.schema), opName)
    // SCHEMA EVOLUTION (`mergeSchema` appends): add-only columns and
    // safe widenings merge into the table schema, restated in the
    // SAME commit (with the typeWidening protocol upgrade when a
    // type changed). Evolution composes with an identity
    // allocation's mark restatement — it evolves the already-updated
    // schema.
    val evolution = existing match {
      case Some(s) if mergeSchema && mode == "append" =>
        evolveSchema(identitySchema.getOrElse(s.schema), dfIn0.schema,
          s.columnMapping.nonEmpty, s.configuration)
      case _ => None
    }
    // widened: stage the incoming rows AT the widened type — new
    // files carry the wide type, old files upcast at read time
    val dfIn = evolution match {
      case Some((sch, true, _)) =>
        import org.apache.spark.sql.functions.col
        val tgt = sch.fields.map(f => f.name -> f.dataType).toMap
        dfIn0.select(dfIn0.schema.fieldNames.toSeq.map(c =>
          col(s"`$c`").cast(tgt.getOrElse(c, dfIn0.schema(c).dataType))
            .as(c)): _*)
      case _ => dfIn0
    }
    // target shape: (logical schema to record, configuration,
    // protocol) — existing tables carry theirs forward, new tables
    // derive from `properties`
    val (recordSchema0, configuration, proto) = existing match {
      case Some(s) =>
        gateWriterObligations(s,
          if (mode == "append") "WRITE" else "OVERWRITE",
          removesData = mode == "overwrite")
        if (mode == "append") {
          require(s.partitionColumns == partitionBy,
            s"delta-log: append partitioning $partitionBy != table's " +
              s"${s.partitionColumns}")
          // nullability-insensitive: writing non-null rows into a
          // nullable column is always sound; with mergeSchema the
          // check runs against the EVOLVED schema (added columns and
          // widened types are in)
          // collation-insensitive: a plain-string frame appends into
          // a collated column (identical parquet physical type — the
          // collation is logical metadata the TABLE schema keeps)
          val tbl = evolution.map(_._1).getOrElse(s.schema).fields
            .map(f => f.name -> nullableOf(decollate(f.dataType))).toMap
          val bad = dfIn.schema.fields.filter(f =>
            !tbl.get(f.name).contains(nullableOf(decollate(f.dataType))))
          require(bad.isEmpty,
            s"delta-log: append schema mismatch on ${bad.map(_.name).mkString(", ")}")
        } else if (s.columnMapping.nonEmpty) {
          // the restated schemaString is the existing MAPPED one, so
          // the incoming frame must BE the logical schema
          require(
            dfIn.schema.fields.toSeq.map(f => (f.name, nullableOf(f.dataType))) ==
            s.schema.fields.toSeq.map(f => (f.name, nullableOf(f.dataType))),
            "delta-log: overwrite of a column-mapped table must keep " +
              "the table schema (mapped schema evolution needs " +
              "delta-spark)")
          require(partitionBy == s.partitionColumns,
            "delta-log: overwrite of a column-mapped table must keep " +
              s"its partitioning ${s.partitionColumns}")
        }
        val schema =
          if (mode == "overwrite" && s.columnMapping.isEmpty) dfIn.schema
          else evolution.map(_._1).getOrElse(s.schema)
        val conf = evolution.map(_._3).getOrElse(s.configuration)
        // a WIDENING commit must carry the typeWidening reader-writer
        // feature — the spec only licenses reading narrow old files
        // under a wide declared schema on feature-bearing tables
        val p0 = (s.minReaderVersion, s.minWriterVersion,
          s.readerFeatures, s.writerFeatures)
        val p =
          if (!evolution.exists(_._2) ||
            (s.minReaderVersion >= 3 &&
              s.readerFeatures.contains("typeWidening"))) p0
          else (3, 7,
            s.readerFeatures ++ legacyReaderFeatures(s.minReaderVersion) ++
              Set("typeWidening"),
            s.writerFeatures ++ legacyWriterFeatures(s.minWriterVersion) ++
              Set("typeWidening"))
        // an overwrite that INTRODUCES a variant column must license
        // it in the same commit: the restated schemaString would carry
        // variant while the carried-forward protocol never lists the
        // variantType feature — the exact spec violation the creation
        // (varFeat), mergeSchema, and MERGE-evolution paths all gate
        // against (feature-unaware engines then mis-handle the table).
        // Same (3,7) upgrade shape as the creation path.
        val pv =
          if (!hasVariantType(schema) ||
            (p._1 >= 3 && p._3.contains("variantType"))) p
          else (3, 7,
            p._3 ++ legacyReaderFeatures(p._1) ++ Set("variantType"),
            p._4 ++ legacyWriterFeatures(p._2) ++ Set("variantType"))
        (schema, conf, pv)
      case None =>
        val mapMode = properties.getOrElse("delta.columnMapping.mode", "none")
        require(mapMode == "none" || mapMode == "name" || mapMode == "id",
          s"delta-log: column mapping mode '$mapMode' not supported")
        val wantsDv =
          properties.get("delta.enableDeletionVectors").contains("true")
        val (schema, conf) =
          if (mapMode == "none") (dfIn.schema, properties)
          else {
            val (mapped, maxId) = stampMapping(dfIn.schema)
            (mapped, properties +
              ("delta.columnMapping.maxColumnId" -> maxId.toString))
          }
        val mapFeat =
          if (mapMode == "none") Set.empty[String] else Set("columnMapping")
        // at (3,7) every ACTIVE feature must be listed — a property
        // without its feature is dead to conformant writers
        val cdfFeat =
          if (properties.get("delta.enableChangeDataFeed")
            .contains("true")) Set("changeDataFeed")
          else Set.empty[String]
        // the spec licenses v2 checkpoints ONLY on tables carrying the
        // v2Checkpoint reader-writer feature — a checkpointPolicy=v2
        // property without it is non-conformant (foreign readers would
        // reject the UUID checkpoint `_last_checkpoint` points at)
        val v2cpFeat =
          if (properties.get("delta.checkpointPolicy").contains("v2"))
            Set("v2Checkpoint")
          else Set.empty[String]
        val dvFeat =
          if (wantsDv) Set("deletionVectors") else Set.empty[String]
        // rowTracking is WRITER-only: feature-listing needs writer 7,
        // the reader version stays wherever the reader features put it
        val rtFeat =
          if (properties.get("delta.enableRowTracking").contains("true"))
            Set("rowTracking") else Set.empty[String]
        // in-commit timestamps: WRITER-only feature, same (…,7)
        // listing shape as rowTracking
        val ictFeat =
          if (ictEnabled(properties)) Set("inCommitTimestamp")
          else Set.empty[String]
        // UniForm: WRITER-only feature, same (…,7) listing shape —
        // the first commit below also creates the Iceberg tree
        val uniFeat =
          if (uniformEnabled(properties)) Set("icebergCompatV2")
          else Set.empty[String]
        // a variant column anywhere in the schema requires the
        // reader-writer variantType feature from creation
        val varFeat =
          if (hasVariantType(dfIn.schema)) Set("variantType")
          else Set.empty[String]
        // collations is WRITER-only (any reader may read collated
        // strings under their base type) — a created table whose
        // schema carries collated columns must LIST it so
        // feature-aware writers keep the collation obligations
        val collFeat =
          if (hasCollatedType(dfIn.schema)) Set("collations")
          else Set.empty[String]
        // liquid clustering: WRITER-only clusteredTable, whose
        // obligation ("preserve the delta.clustering domain") rides
        // the domainMetadata feature's replay machinery — both listed
        val cluFeat =
          if (clusterBy.nonEmpty) Set("clusteredTable", "domainMetadata")
          else Set.empty[String]
        val p =
          if (wantsDv || v2cpFeat.nonEmpty || varFeat.nonEmpty)
            (3, 7, dvFeat ++ mapFeat ++ v2cpFeat ++ varFeat,
              dvFeat ++ mapFeat ++ v2cpFeat ++ varFeat ++ cdfFeat ++
                rtFeat ++ ictFeat ++ uniFeat ++ collFeat ++ cluFeat ++
                legacyWriterFeatures(if (mapMode == "none") 2 else 5))
          else if (rtFeat.nonEmpty || ictFeat.nonEmpty ||
            uniFeat.nonEmpty || collFeat.nonEmpty || cluFeat.nonEmpty)
            (if (mapMode == "none") 1 else 2, 7, Set.empty[String],
              rtFeat ++ ictFeat ++ uniFeat ++ collFeat ++ cluFeat ++
                cdfFeat ++
                legacyWriterFeatures(if (mapMode == "none") 2 else 5))
          else if (mapMode != "none") (2, 5, Set.empty[String], Set.empty[String])
          // CDF alone requires minWriterVersion >= 4 (the spec's
          // changeDataFeed gate): at (1,2) a feature-unaware writer
          // could legally commit without cdc actions and silently
          // corrupt the feed — the same rule setConfiguration applies
          else if (cdfFeat.nonEmpty) (1, 4, Set.empty[String], Set.empty[String])
          // CHECK constraints require writer 3 — below it, a
          // feature-unaware writer could append violating rows
          else if (properties.keys.exists(
            _.startsWith("delta.constraints.")))
            (1, 3, Set.empty[String], Set.empty[String])
          else (1, 2, Set.empty[String], Set.empty[String])
        (schema, conf, p)
    }
    // an identity allocation restates the schema (the moved mark)
    val recordSchema = identitySchema.getOrElse(recordSchema0)
    // writer contracts: CHECK constraints / invariants verify the
    // incoming rows (logical space) BEFORE anything stages — a
    // violating frame must never reach the log
    enforceRowContracts(dfIn, recordSchema, configuration, opName)
    // COLUMN-MAPPED tables: parquet files (and partition dirs) carry
    // PHYSICAL names — stage the frame renamed, with field ids for
    // 'id'-mode readers. Ungated, a logical-name append would read
    // back all-NULL through every mapped reader (this repo's and
    // delta-spark's).
    val mapping =
      // an evolved mapped schema carries freshly stamped ids — derive
      // the logical→physical map from IT, not the stale snapshot
      if (evolution.isDefined)
        columnMappingOf(root, recordSchema, configuration)
      else existing.map(_.columnMapping).getOrElse(
        columnMappingOf(root, recordSchema, configuration))
    // UniForm gates run BEFORE anything stages or commits — a
    // post-commit refusal would leave a durably-advanced log
    gateUniform(root, configuration, recordSchema, partitionBy, mapping,
      carriesDv = mode == "append" &&
        existing.exists(_.adds.exists(_.deletionVector.isDefined)),
      opName)
    val stagedDf =
      if (mapping.isEmpty) dfIn else toPhysicalDf(dfIn, recordSchema, root)
    val stagedPartitionBy = partitionBy.map(c => mapping.getOrElse(c, c))
    // data files: stage, then relocate under the table root with
    // globally unique names (the spec requires uniqueness, not layout;
    // Hive-style dirs keep the table browsable)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val adds = stageAndLand(spark, stagedDf, root, stagedPartitionBy, nonce,
      typeOverrides = collatedTypesOf(recordSchema))
    val next = latest + 1
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += commitInfoLine(root,
      if (mode == "append") "WRITE" else "OVERWRITE",
      configuration, latest)
    if (latest < 0 || mode == "overwrite") {
      lines += protocolLine(proto._1, proto._2, proto._3, proto._4)
      lines += metaDataLine(recordSchema.json, partitionBy, configuration)
      if (clusterBy.nonEmpty) {
        // the domain stores PHYSICAL names (delta-spark's contract —
        // clustering survives RENAME COLUMN under mapping because the
        // physical name is the stable one)
        val cols = clusterBy.map(c => mapping.getOrElse(c, c))
          .map(c => s"""[${jsonStr(c)}]""").mkString(",")
        lines += s"""{"domainMetadata":{"domain":"delta.clustering",""" +
          s""""configuration":${jsonStr(
            s"""{"clusteringColumns":[$cols]}""")},"removed":false}}"""
      }
    } else if (identitySchema.isDefined || evolution.isDefined) {
      // restated in the SAME commit: an identity allocation's moved
      // mark, and/or a mergeSchema evolution's new schema (plus the
      // typeWidening protocol upgrade when a type widened)
      if (evolution.exists(_._2) && existing.exists(e =>
          !(e.minReaderVersion >= 3 &&
            e.readerFeatures.contains("typeWidening"))))
        lines += protocolLine(proto._1, proto._2, proto._3, proto._4)
      lines += metaDataLine(recordSchema.json, partitionBy, configuration,
        existing.map(_.tableId))
    }
    if (mode == "overwrite") existing.foreach(_.adds.foreach { a =>
      lines += s"""{"remove":{"path":${jsonStr(encodePath(a.path))},""" +
        s""""deletionTimestamp":${System.currentTimeMillis},"dataChange":true}}"""
    })
    txn.foreach { case (app, ver) =>
      lines += s"""{"txn":{"appId":${jsonStr(app)},"version":$ver,""" +
        s""""lastUpdated":${System.currentTimeMillis}}}"""
    }
    val (addsRt, rtLines) = assignRowIds(
      rowTrackingActive(proto._2, proto._4),
      existing.map(_.domains).getOrElse(Map.empty),
      // overwrite retires the old adds with their blocks; the mark
      // is monotonic over the whole history and never reuses them
      existing.map(_.adds).getOrElse(Nil), next, adds)
    rtLines.foreach(lines += _)
    addsRt.foreach(a => lines += addLine(a))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    if (uniformEnabled(configuration)) syncUniformConverging(spark, root)
    next
  }

  /** Row-level `DELETE FROM` for delta-log tables — COPY-ON-WRITE:
    * files holding matching rows are rewritten without them and the
    * commit carries `remove` + `add` actions, so EVERY Delta reader
    * (DV-capable or not) reads the result correctly — the
    * compatibility-first choice over writing deletion vectors (which
    * would force the `deletionVectors` writer feature on the table).
    * Deletion vectors already ON the touched files are materialized by
    * the rewrite (the rewritten file has both the DV'd and the newly
    * deleted rows gone, and its `remove` retires the DV).
    *
    * Rows where `cond` is NULL are KEPT (SQL DELETE semantics).
    * PARTITIONED tables rewrite per partition: the survivors of the
    * touched files restage through the same Hive-style
    * `col=value/` layout the writer uses ([[stageAndLand]]), so each
    * new add re-records its `partitionValues` and files in UNtouched
    * partitions are never read or rewritten. Returns the committed
    * version (or the current one unchanged when nothing matches). */
  def deleteWhere(spark: SparkSession, root: String,
      cond0: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val snap0 = snapshot(spark, root)
    gateWriterObligations(snap0, "DELETE", removesData = true)
    // COLUMN-MAPPED tables rewrite in PHYSICAL space: the predicate's
    // logical names remap, the survivors restage under physical names
    // (what a mapped table's files must carry), stats/partitionValues
    // come out physical for free. Nested-field predicates fail at
    // analysis with the physical struct's field names — flat
    // predicates (the DML norm) work.
    val snap = snap0.physical
    val cond = remapTopLevel(spark, cond0, snap0.schema,
      snap0.columnMapping)
    val vis = DeltaLogRead.withPositions(spark, snap)
    val touchedUris = vis.filter(cond)
      .select(DeltaLogRead.FpCol).distinct()
      .collect().map(_.getString(0)).sorted // bounded by file count
    if (touchedUris.isEmpty) return snap.version
    val idx = new DeltaLogFileIndex(spark, root, snap, pinned = true)
    val uriToAdd = snap.adds.map(a => idx.scanUriOf(a) -> a).toMap
    val touchedAdds = touchedUris.map(u => uriToAdd.getOrElse(u,
      throw new IllegalStateException(
        s"delta-log: scan URI $u not in snapshot v${snap.version}")))
    // survivors keep their partition columns: stageAndLand routes
    // them back into `col=value/` dirs and re-records partitionValues
    val touchedRows = vis
      .filter(col(DeltaLogRead.FpCol).isin(touchedUris.toSeq: _*))
    val keep = touchedRows
      .filter(not(coalesce(cond, lit(false))))
      .drop(DeltaLogRead.FpCol, DeltaLogRead.PosCol)
    // CDF: when the table records a change feed, the deleted rows
    // land as `cdc` parquet under _change_data/ — the authoritative
    // change set readers use instead of deriving from remove+add
    val cdcAdds =
      if (!snap.configuration.get("delta.enableChangeDataFeed")
        .contains("true")) Nil
      else {
        import org.apache.spark.sql.functions.lit
        val deleted = touchedRows
          .filter(coalesce(cond, lit(false)))
          .drop(DeltaLogRead.FpCol, DeltaLogRead.PosCol)
          .withColumn("_change_type", lit("delete"))
        stageAndLand(spark, deleted, root, snap.partitionColumns,
          java.util.UUID.randomUUID().toString.take(8),
          prefix = "_change_data/")
      }
    // DELETION-VECTOR path: when the table opted in
    // (delta.enableDeletionVectors) and its protocol carries the
    // writer feature, a delete touching a SMALL fraction of the
    // touched files' rows writes DVs instead of rewriting files —
    // O(deleted rows) commit I/O instead of re-staging every
    // surviving row of every touched file. Falls back to COW when
    // the delete is driver-unboundable or dense (rewriting is
    // cheaper than carrying a majority-dead file).
    if (snap.configuration.get("delta.enableDeletionVectors")
        .contains("true") &&
      snap0.minWriterVersion >= 7 &&
      snap0.writerFeatures.contains("deletionVectors")) {
      val matched = vis.filter(coalesce(cond, lit(false)))
        .select(DeltaLogRead.FpCol, DeltaLogRead.PosCol)
      dvRemoveRows(spark, root, snap, matched,
        touchedAdds.toSeq, idx, cdcAdds) match {
        case Some(v) => return v
        case None => () // too large/dense — COW below
      }
    }
    replaceFiles(spark, root, snap, touchedAdds.map(_.path).toSeq,
      keep, snap.partitionColumns, cdcAdds)
  }

  /** `numRecords` from an add's stats JSON — the physical row count
    * [[dvRemoveRows]] needs for its density bound. */
  /** Is the `rowTracking` writer feature active on this protocol? */
  private def rowTrackingActive(minWriterVersion: Int,
      writerFeatures: Set[String]): Boolean =
    minWriterVersion >= 7 && writerFeatures.contains("rowTracking")

  /** ROW TRACKING's writer obligation (PROTOCOL.md "Row Tracking"):
    * when the feature is active, every NEW add action gets a fresh
    * contiguous row-id block `[baseRowId, baseRowId + numRecords)`
    * past the table's high-water mark (the `delta.rowTracking`
    * domain's rowIdHighWaterMark), plus this commit's version as
    * defaultRowCommitVersion; the moved mark lands as a
    * domainMetadata action in the SAME commit. Adds already carrying
    * a baseRowId keep it (recommits: DV merges of the same file,
    * RESTORE re-adds). The mark floor also covers the live adds'
    * own blocks — defensive against a foreign table whose domain row
    * went missing (never reassign a live block). An add without a
    * numRecords stat refuses: the block width would be unknown. */
  private def assignRowIds(active: Boolean,
      domains: Map[String, (String, Boolean)],
      existingAdds: Seq[DeltaAdd], commitVersion: Long,
      adds: Seq[DeltaAdd]): (Seq[DeltaAdd], Seq[String]) = {
    if (!active) return (adds, Nil)
    val domainMark = domains.get("delta.rowTracking").filterNot(_._2)
      .flatMap(d => Option(mapper.readTree(d._1)
        .get("rowIdHighWaterMark")).map(_.asLong()))
      .getOrElse(-1L)
    val liveMark = existingAdds.flatMap { a =>
      a.baseRowId.map { b =>
        // without the domain mark, an add lacking numRecords stats
        // has an UNBOUNDABLE live block — assuming width 1 could
        // under-floor the mark and hand out overlapping fresh ids
        // on a foreign table whose delta.rowTracking domain row
        // went missing; refuse loudly instead
        val n = numRecordsOf(a).getOrElse {
          if (domainMark < 0L) throw new UnsupportedOperationException(
            s"delta-log: existing add ${a.path} carries baseRowId " +
              "but no numRecords stats, and the delta.rowTracking " +
              "high-water-mark domain is missing — its live row-id " +
              "block cannot be bounded; refusing to assign fresh ids")
          1L // domainMark dominates: the floor value is inert
        }
        b + n - 1
      }
    }.maxOption.getOrElse(-1L)
    var hwm = math.max(domainMark, liveMark)
    var moved = false
    val out = adds.map { a =>
      if (a.baseRowId.isDefined) a
      else {
        val n = numRecordsOf(a).getOrElse(
          throw new UnsupportedOperationException(
            s"delta-log: rowTracking requires numRecords stats to " +
              s"size the row-id block of ${a.path} — refusing to " +
              "commit an id-less add"))
        val assigned = a.copy(baseRowId = Some(hwm + 1),
          defaultRowCommitVersion = Some(commitVersion))
        hwm += n
        moved = true
        assigned
      }
    }
    (out, if (!moved) Nil else Seq(
      s"""{"domainMetadata":{"domain":"delta.rowTracking",""" +
        s""""configuration":${jsonStr(s"""{"rowIdHighWaterMark":$hwm}""")},""" +
        """"removed":false}}"""))
  }

  private def numRecordsOf(a: DeltaAdd): Option[Long] =
    a.statsJson.flatMap { js =>
      try {
        val n = mapper.readTree(js)
        if (n.hasNonNull("numRecords")) Some(n.get("numRecords").asLong())
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Deleted-positions ceiling for one DV-writing delete: positions
    * collect to the driver (they are commit metadata, like the log),
    * so a larger delete falls back to copy-on-write. */
  private val MaxDvPositions = 2 * 1000 * 1000

  /** The DV write path shared by [[deleteWhere]] and [[updateWhere]]:
    * collect the matched (file, position) pairs, merge each touched
    * file's existing DV, write one spec-framed DV file per touched
    * data file, and commit remove+add pairs that KEEP every data file
    * (same path, stats, partition values) under its new descriptor.
    * A file whose merged DV covers every physical row is removed
    * outright (no dead-file add). `extraRows` (the UPDATE case's
    * post-update rows) land as ordinary new data files in the SAME
    * commit. Returns None when the operation exceeds
    * [[MaxDvPositions]], a touched file lacks numRecords (density
    * unknowable), or the touched files would end up majority-dead
    * (COW is cheaper). */
  private def dvRemoveRows(spark: SparkSession, root: String,
      snap: DeltaSnapshot, matched: DataFrame,
      touchedAdds: Seq[DeltaAdd],
      idx: DeltaLogFileIndex, cdcAdds: Seq[DeltaAdd],
      operation: String = "DELETE",
      extraRows: Option[DataFrame] = None): Option[Long] = {
    // UniForm tables never take the DV route: a deletion vector has
    // no zero-copy mirror in the Iceberg tree — None falls back to
    // the COW rewrite, which syncs cleanly
    if (uniformEnabled(snap.configuration)) return None
    val rows = matched.limit(MaxDvPositions + 1).collect()
    if (rows.length > MaxDvPositions) return None
    val physRows = touchedAdds.map(a => numRecordsOf(a) match {
      case Some(n) => n
      case None => return None
    }).sum
    val priorDeleted = touchedAdds.flatMap(_.deletionVector)
      .map(_.cardinality).sum
    if ((priorDeleted + rows.length).toDouble / physRows.max(1L) > 0.5)
      return None
    // positions dedupe: a (file, pos) pair reaching here twice (e.g.
    // a tagged merge emitting one target row through two clauses)
    // would otherwise serialize a spec-invalid bitmap whose recorded
    // cardinality exceeds its distinct values — unreadable thereafter
    val byFile = rows.groupBy(_.getString(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)).distinct.sorted }
    // new files first: invisible until the commit JSON references
    // them; an empty frame stages nothing (Spark would still write
    // one zero-row part, which must not land in the log)
    val extraAdds = extraRows.toSeq.filterNot(_.isEmpty).flatMap(df =>
      stageAndLand(spark, df, root, snap.partitionColumns,
        java.util.UUID.randomUUID().toString.take(8),
        typeOverrides = collatedTypesOf(snap.schema)))
    if (rows.isEmpty && extraAdds.isEmpty)
      return Some(snap.version) // nothing fired: no empty commit
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += commitInfoLine(root, operation, snap.configuration,
      snap.version)
    touchedAdds.foreach { a =>
      val fresh = byFile.getOrElse(idx.scanUriOf(a), Array.empty[Long])
      // key-envelope-touched files with no actually-dead rows (a
      // merge whose clauses fired elsewhere) carry over untouched
      if (fresh.nonEmpty) {
        val mergedPos = a.deletionVector match {
          case Some(d) =>
            (DeletionVectors.read(root, d) ++ fresh).distinct.sorted
          case None => fresh
        }
        lines += s"""{"remove":{"path":${jsonStr(encodePath(a.path))},""" +
          s""""deletionTimestamp":${System.currentTimeMillis},""" +
          """"dataChange":true}}"""
        if (mergedPos.length < numRecordsOf(a).get) // fully dead: no re-add
          lines += addLine(a.copy(deletionVector =
            Some(DeletionVectors.writeFile(root, mergedPos))))
      }
    }
    val next = snap.version + 1
    val (extraRt, rtLines) = assignRowIds(
      rowTrackingActive(snap.minWriterVersion, snap.writerFeatures),
      snap.domains, snap.adds, next, extraAdds)
    rtLines.foreach(lines += _)
    extraRt.foreach(a => lines += addLine(a))
    cdcAdds.foreach(a => lines += cdcLine(a))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    Some(next)
  }

  /** A predicate with its TOP-LEVEL attribute names remapped
    * logical→physical (no-op for unmapped tables). API-route Columns
    * are opaque ColumnNode wrappers until analysis, so the predicate
    * first ANALYZES against an empty frame carrying the LOGICAL
    * schema — the resolved references then remap by name. */
  private def remapTopLevel(spark: SparkSession,
      c: org.apache.spark.sql.Column, logicalSchema: StructType,
      mapping: Map[String, String]): org.apache.spark.sql.Column = {
    if (mapping.isEmpty) return c
    val analyzed = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        logicalSchema)
      .filter(c).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.getOrElse(throw new IllegalArgumentException(
        "delta-log: predicate does not analyze against the table schema"))
    org.apache.spark.sql.GraftColumnBridge.column(analyzed.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          .quoted(mapping.getOrElse(a.name, a.name))
    })
  }

  /** One spec-shaped `cdc` JSON line (change-data file under
    * `_change_data/`). */
  private def cdcLine(a: DeltaAdd): String = {
    val pvJson = (a.partitionValues.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" } ++
      a.nullPartitionCols.toSeq.sorted.map(k => s"${jsonStr(k)}:null"))
      .mkString(",")
    s"""{"cdc":{"path":${jsonStr(encodePath(a.path))},""" +
      s""""partitionValues":{$pvJson},"size":${a.size},""" +
      """"dataChange":false}}"""
  }

  /** COW support: land `df` as new data files (Hive-style dirs +
    * re-recorded `partitionValues` when `partitionBy` is set) and
    * commit one version of `remove(removedPaths)` + `add(new files)`. */
  private def replaceFiles(spark: SparkSession, root: String,
      base: DeltaSnapshot,
      removedPaths: Seq[String], df: DataFrame,
      partitionBy: Seq[String] = Nil,
      cdcAdds: Seq[DeltaAdd] = Nil,
      operation: String = "DELETE",
      metaRestate: Option[String] = None): Long = {
    gateUniform(root, base.configuration, base.schema, base.partitionColumns,
      base.columnMapping,
      carriesDv = base.adds.exists(a =>
        a.deletionVector.isDefined && !removedPaths.contains(a.path)),
      operation)
    val latest = latestVersion(root)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val adds = stageAndLand(spark, df, root, partitionBy, nonce,
      typeOverrides = collatedTypesOf(base.schema))
    val next = latest + 1
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += commitInfoLine(root, operation, base.configuration, latest)
    // schema evolution lands its restated metaData in the SAME commit
    metaRestate.foreach(lines += _)
    removedPaths.foreach { p =>
      lines += s"""{"remove":{"path":${jsonStr(encodePath(p))},""" +
        s""""deletionTimestamp":${System.currentTimeMillis},""" +
        """"dataChange":true}}"""
    }
    val (addsRt, rtLines) = assignRowIds(
      rowTrackingActive(base.minWriterVersion, base.writerFeatures),
      base.domains, base.adds, next, adds)
    rtLines.foreach(lines += _)
    addsRt.foreach(a => lines += addLine(a))
    cdcAdds.foreach(a => lines += cdcLine(a))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    if (uniformEnabled(base.configuration)) syncUniformConverging(spark, root)
    next
  }

  /** OPTIMIZE-style compaction of the Delta table at `root`: rewrite
    * the live data into `filesPerPartition` files (total, for an
    * unpartitioned table; one per partition dir for a partitioned
    * one), committed as remove+add with
    * `dataChange: false` — readers see identical rows, streams see
    * NOTHING (per-commit tails skip non-data-changing actions), and
    * prior versions stay time-travelable. Deletion vectors on the
    * rewritten files are MATERIALIZED (Delta's REORG PURGE): the new
    * files carry only visible rows and no descriptors, so the table
    * becomes readable by DV-less readers again. Column-mapped tables
    * compact in PHYSICAL space.
    *
    * `zorderBy` = OPTIMIZE ... ZORDER BY (delta-spark parity): the
    * rewrite clusters rows by the Morton interleave of the two named
    * dimension columns ([[graft.ops.ZOrder]] — values must be
    * nonnegative and fit `zorderBits` bits), range-split into
    * `filesPerPartition` files covering disjoint z-ranges, so the
    * files' min/max become tight bounding boxes in BOTH dimensions
    * and stats skipping prunes on either column or their conjunction
    * — the layout-maintenance job that keeps 100 TB data skipping
    * effective. Unpartitioned tables only (a partitioned table's
    * coarse cluster IS its partitioning). Returns the committed
    * version, or the current one when the table already meets the
    * target. */
  def compact(spark: SparkSession, root: String,
      filesPerPartition: Int = 1,
      zorderBy: Option[(String, String)] = None,
      zorderBits: Int = 21): Long = {
    import org.apache.spark.sql.functions.col
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    // mapped tables compact in PHYSICAL space — the rewrite never
    // touches logical names at all
    val snap0 = snapshot(spark, root)
    val snap = snap0.physical
    // OPTIMIZE rewrites with dataChange=false — legal on append-only
    // tables, but unknown writer features still refuse
    gateWriterObligations(snap, "OPTIMIZE", removesData = false)
    // post-compact state carries no DVs (they materialize away), so
    // the UniForm gate checks shape only — OPTIMIZE is the UNBRICK
    // path for a DV-carrying UniForm table
    gateUniform(root, snap0.configuration, snap0.schema,
      snap0.partitionColumns, snap0.columnMapping,
      carriesDv = false, "OPTIMIZE")
    zorderBy.foreach { case (x, y) =>
      require(snap.partitionColumns.isEmpty,
        "delta-log: ZORDER BY on a partitioned table is not " +
          "supported — the partitioning is the coarse cluster")
      Seq(x, y).foreach(c => require(snap0.schema.fieldNames.contains(c),
        s"delta-log: ZORDER BY names non-column '$c'"))
    }
    // LIQUID CLUSTERING maintenance: with no explicit ZORDER request,
    // a table carrying the `delta.clustering` domain re-clusters by
    // its declared columns — OPTIMIZE on a clustered table IS the
    // re-layout job (delta-spark's behavior). Columns arrive in
    // PHYSICAL space (the domain's contract), matching the rewrite
    // frame. Stated divergence: the layout is a multi-column
    // lexicographic range-cluster (tight leading-column file bounds,
    // locality on the rest), not delta-spark's Hilbert curve — any
    // clustering is spec-legal, the domain only names the columns.
    val clusterCols: Seq[String] =
      if (zorderBy.nonEmpty) Nil
      else snap0.domains.get("delta.clustering")
        .collect { case (cfg, false) => cfg }.toSeq.flatMap { cfg =>
          val node = mapper.readTree(cfg)
          Option(node.get("clusteringColumns")).toSeq.flatMap(
            _.elements().asScala.map { arr =>
              require(arr.isArray && arr.size() == 1,
                "delta-log: nested clustering column " +
                  s"${arr.toString} is not supported by this OPTIMIZE")
              arr.get(0).asText()
            }.toSeq)
        }
    require(clusterCols.isEmpty || snap.partitionColumns.isEmpty,
      "delta-log: a clustered table must not be Hive-partitioned " +
        "(clusteredTable contract)")
    val partitions = snap.adds.map(a =>
      (a.partitionValues, a.nullPartitionCols)).distinct.size.max(1)
    // a ZORDER request always rewrites — same file COUNT, new LAYOUT;
    // so does clustered-table maintenance
    if (zorderBy.isEmpty && clusterCols.isEmpty &&
      snap.adds.size <= partitions.toLong * filesPerPartition &&
      !snap.adds.exists(_.deletionVector.isDefined))
      return snap.version // already compact, nothing to purge
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // PRESERVED row tracking through OPTIMIZE (spec, "Row Tracking"):
    // each surviving row's id and last-updated version MATERIALIZE as
    // the configured hidden columns in the rewritten files — minted
    // and registered in this commit's metaData when absent — so the
    // compaction keeps ids stable (the reader coalesces materialized
    // values over the files' fresh blocks). Mapped tables skip
    // (fresh blocks — spec-legal unpreserved mode).
    val preserve = rowTrackingActive(snap.minWriterVersion,
      snap.writerFeatures) && snap0.columnMapping.isEmpty &&
      snap.adds.forall(_.baseRowId.isDefined)
    val matRid = snap0.configuration.getOrElse(
      "delta.rowTracking.materializedRowIdColumnName",
      s"_row_id_col_$nonce")
    val matVer = snap0.configuration.getOrElse(
      "delta.rowTracking.materializedRowCommitVersionColumnName",
      s"_row_version_col_$nonce")
    val mintNames = preserve && !snap0.configuration.contains(
      "delta.rowTracking.materializedRowIdColumnName")
    // visible rows only: DVs applied here = materialized in the output
    val vis =
      if (preserve)
        DeltaLogRead.readWithRowIds(spark, root)
          .withColumnRenamed("_row_id", matRid)
          .withColumnRenamed("_last_updated_version", matVer)
      else DeltaLogRead.withPositions(spark, snap)
        .drop(DeltaLogRead.FpCol, DeltaLogRead.PosCol)
    val packed = zorderBy match {
      case Some((x, y)) =>
        // ZORDER: a column-mapped table's frame is PHYSICAL here —
        // resolve the logical dimension names through the mapping
        val (px, py) = (snap0.columnMapping.getOrElse(x, x),
          snap0.columnMapping.getOrElse(y, y))
        require(!vis.columns.contains("__zorder"),
          "delta-log: table already has a __zorder column")
        vis.withColumn("__zorder", graft.ops.ZOrder.interleave2(
            col(s"`$px`"), col(s"`$py`"), zorderBits))
          .repartitionByRange(filesPerPartition, col("__zorder"))
          .sortWithinPartitions(col("__zorder"))
          .drop("__zorder")
      case None if clusterCols.nonEmpty =>
        // the frame is physical space and so are the domain's names;
        // a foreign domain naming unknown columns refuses rather than
        // silently skipping the layout obligation
        clusterCols.foreach(c => require(vis.columns.contains(c),
          s"delta-log: clustering column '$c' of the delta.clustering " +
            "domain is not a column of the table"))
        vis.repartitionByRange(filesPerPartition,
            clusterCols.map(c => col(s"`$c`")): _*)
          .sortWithinPartitions(clusterCols.map(c => col(s"`$c`")): _*)
      case None =>
        if (snap.partitionColumns.isEmpty) vis.coalesce(filesPerPartition)
        else vis.repartition(
          snap.partitionColumns.map(col): _*) // one task (→ file) per partition
    }
    val adds = stageAndLand(spark, packed, root, snap.partitionColumns,
      nonce, typeOverrides = collatedTypesOf(snap.schema))
    val next = snap.version + 1
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += commitInfoLine(root, "OPTIMIZE", snap0.configuration,
      snap.version)
    if (mintNames)
      lines += metaDataLine(snap0.schema.json, snap0.partitionColumns,
        snap0.configuration +
          ("delta.rowTracking.materializedRowIdColumnName" -> matRid) +
          ("delta.rowTracking.materializedRowCommitVersionColumnName" ->
            matVer),
        Option(snap0.tableId).filter(_.nonEmpty))
    snap.adds.foreach { a =>
      lines += s"""{"remove":{"path":${jsonStr(encodePath(a.path))},""" +
        s""""deletionTimestamp":${System.currentTimeMillis},""" +
        """"dataChange":false}}"""
    }
    // fresh blocks for the rewritten files (unpreserved row
    // tracking — the compaction shuffles rows across files)
    val (addsRt, rtLines) = assignRowIds(
      rowTrackingActive(snap.minWriterVersion, snap.writerFeatures),
      snap.domains, snap.adds, next, adds)
    rtLines.foreach(lines += _)
    addsRt.foreach(a => lines += addLine(a, dataChange = false))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    if (uniformEnabled(snap.configuration)) syncUniformConverging(spark, root)
    next
  }

  /** RESTORE the Delta table to `toVersion` — delta-spark's
    * `RESTORE TABLE ... VERSION AS OF`: ONE new commit that re-adds
    * the target version's files (original stats/partition
    * values/deletion vectors), removes the files only the current
    * version holds, and restates the target's metaData (schema,
    * partitioning, configuration travel WITH the restore). History
    * is preserved — the restore is itself a version; nothing is
    * deleted until VACUUM. Refuses when a target file was already
    * vacuumed (checked through the DataStore seam) — same error
    * delta-spark raises. Returns the committed version. */
  def restore(spark: SparkSession, root: String, toVersion: Long): Long = {
    val now = snapshot(spark, root)
    gateWriterObligations(now, "RESTORE", removesData = true)
    require(toVersion < now.version,
      s"delta-log: RESTORE to v$toVersion is not behind v${now.version}")
    val target = snapshot(spark, root, Some(toVersion))
    // the TARGET's configuration travels with the restore — its
    // UniForm shape must be mirrorable BEFORE the commit lands
    gateUniform(root, target.configuration, target.schema,
      target.partitionColumns, target.columnMapping,
      carriesDv = target.adds.exists(_.deletionVector.isDefined),
      "RESTORE")
    // RESTORE to a PRE-UniForm version disables the sync hook with
    // the travelling configuration — without a FINAL sync the
    // co-located Iceberg tree would stay live but frozen at the
    // pre-restore state, silently showing rows Delta no longer has.
    // Sync the mirror one last time to the restored file set (gated
    // pre-commit: the target shape must be mirrorable); from then on
    // the mirror is frozen AT the restored state, the same posture as
    // explicit UniForm disablement.
    val finalMirrorSync = uniformEnabled(now.configuration) &&
      !uniformEnabled(target.configuration) &&
      IceCatalog.forRoot(root).tableExists(root)
    if (finalMirrorSync) {
      gateUniformShape(target.schema, target.partitionColumns,
        target.columnMapping,
        carriesDv = target.adds.exists(_.deletionVector.isDefined),
        "RESTORE (final mirror sync)")
      IcebergMeta.requireMirrorSyncable(root, target.schema)
    }
    val store = VersionedTable.dataIO(root)
    val gone = target.adds.filterNot(a =>
      store.exists(Paths.get(root).resolve(a.path)))
    require(gone.isEmpty,
      s"delta-log: cannot RESTORE $root to v$toVersion — data file(s) " +
        s"${gone.take(3).map(_.path).mkString(", ")} were vacuumed")
    val nowPaths = now.adds.map(_.path).toSet
    val targetPaths = target.adds.map(_.path).toSet
    val next = now.version + 1
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    // ICT PROVENANCE through the restore: the target's configuration
    // travels, but its enablement marks describe the TARGET's moment
    // in history — restating them verbatim can declare versions in a
    // disabled window "governed" and make commitTimestamp refuse on
    // their missing ICTs. Three sound shapes:
    //  - target OFF → marks drop with the property;
    //  - both ON   → governance never broke; the CURRENT marks (or
    //    their absence = governed from 0) stay authoritative;
    //  - target ON, now OFF → re-enablement across a disabled
    //    window: fresh marks at THIS commit, whose own ICT is the
    //    recorded enablement timestamp (the setConfiguration rule).
    val ictMarks = Seq("delta.inCommitTimestampEnablementVersion",
      "delta.inCommitTimestampEnablementTimestamp")
    val freshIct: Option[Long] =
      if (ictEnabled(target.configuration)) Some(nextIct(root, now.version))
      else None
    val restoredConf: Map[String, String] =
      if (!ictEnabled(target.configuration))
        target.configuration -- ictMarks
      else if (ictEnabled(now.configuration))
        target.configuration -- ictMarks ++
          now.configuration.view.filterKeys(ictMarks.contains).toMap
      else target.configuration +
        ("delta.inCommitTimestampEnablementVersion" -> next.toString) +
        ("delta.inCommitTimestampEnablementTimestamp" ->
          freshIct.get.toString)
    lines += (freshIct match {
      case Some(t) =>
        s"""{"commitInfo":{"inCommitTimestamp":$t,"timestamp":$t,""" +
          s""""operation":"RESTORE"}}"""
      case None =>
        s"""{"commitInfo":{"timestamp":${System.currentTimeMillis},""" +
          s""""operation":"RESTORE"}}"""
    })
    // the target's metaData travels with the restore (schema and
    // configuration may have drifted since; the table id is forever)
    lines += metaDataLine(target.schema.json, target.partitionColumns,
      restoredConf,
      Option(target.tableId).filter(_.nonEmpty)
        .orElse(Option(now.tableId).filter(_.nonEmpty)))
    // domain metadata restores with the state: domains that drifted
    // re-emit the target's value, domains born since tombstone —
    // EXCEPT delta.rowTracking: the row-id high-water mark is
    // monotonic over the whole history (restoring an older, lower
    // mark would let future commits reassign already-issued blocks)
    target.domains.filterNot(_._2._2).toSeq.sortBy(_._1).foreach {
      case ("delta.rowTracking", _) => ()
      case (d, (conf, _)) if !now.domains.get(d).contains((conf, false)) =>
        lines += s"""{"domainMetadata":{"domain":${jsonStr(d)},""" +
          s""""configuration":${jsonStr(conf)},"removed":false}}"""
      case _ => ()
    }
    now.domains.filterNot(_._2._2).keys.toSeq.sorted
      .filterNot(d => target.domains.get(d).exists(!_._2))
      .filterNot(_ == "delta.rowTracking")
      .foreach { d =>
        lines += s"""{"domainMetadata":{"domain":${jsonStr(d)},""" +
          s""""configuration":"","removed":true}}"""
      }
    now.adds.filterNot(a => targetPaths(a.path)).foreach { a =>
      lines += s"""{"remove":{"path":${jsonStr(encodePath(a.path))},""" +
        s""""deletionTimestamp":${System.currentTimeMillis},""" +
        """"dataChange":true}}"""
    }
    // re-adds keep their original blocks; a pre-feature file with no
    // block gets a fresh one (the same file-recommit rule as DVs)
    val (reAddsRt, rtLines) = assignRowIds(
      rowTrackingActive(now.minWriterVersion, now.writerFeatures),
      now.domains, now.adds, next,
      target.adds.filterNot(a => nowPaths(a.path)))
    rtLines.foreach(lines += _)
    reAddsRt.foreach(a => lines += addLine(a))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    // the restored state mirrors to the Iceberg tree too (the
    // TARGET's configuration governs — it travels with the restore);
    // a restore that DISABLES UniForm still syncs once so the mirror
    // freezes at the restored state, not the pre-restore one
    if (uniformEnabled(target.configuration))
      syncUniformConverging(spark, root)
    else if (finalMirrorSync)
      syncUniformConverging(spark, root, evenIfDisabled = true)
    next
  }

  /** SHALLOW CLONE — delta-spark's zero-copy table copy: `dst`
    * becomes a NEW one-commit Delta table whose adds reference the
    * SOURCE's data files by ABSOLUTE path (the spec allows absolute
    * add paths for exactly this). No data moves; stats, partition
    * values and deletion vectors carry (DVs re-anchor as absolute 'p'
    * descriptors so they keep resolving from the clone). The clone
    * then evolves independently — its own commits, DML, VACUUM (which
    * never deletes the source's files: they live outside the clone's
    * root, and vacuum only sweeps under it). Vacuuming the SOURCE can
    * break the clone, delta-spark's documented caveat too. */
  def cloneShallow(spark: SparkSession, src: String, dst: String,
      versionAsOf: Option[Long] = None): Long = {
    val snap = snapshot(spark, src, versionAsOf)
    require(latestVersion(dst) < 0,
      s"delta-log: clone target $dst already exists")
    val srcRoot = Paths.get(src).toAbsolutePath.normalize
    io(dst).mkdirs(logDir(dst))
    // ICT enablement provenance refers to the SOURCE's history — the
    // clone's history starts at 0, so the stale marks drop and the
    // property (if on) governs from the clone's own commit 0, which
    // commitInfoLine stamps accordingly
    val cloneConf = snap.configuration -
      "delta.inCommitTimestampEnablementVersion" -
      "delta.inCommitTimestampEnablementTimestamp"
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += commitInfoLine(dst, "CLONE", cloneConf, -1L)
    // the clone CARRIES the source's protocol — cloning a
    // feature-bearing table (deletion vectors, column mapping, row
    // tracking) to (1,2) would let feature-unaware writers corrupt
    // the copy, and DV descriptors would be unreadable to conformant
    // readers that trust the stated protocol
    lines += protocolLine(snap.minReaderVersion, snap.minWriterVersion,
      snap.readerFeatures, snap.writerFeatures)
    lines += s"""{"metaData":{"id":${jsonStr(java.util.UUID.randomUUID().toString)},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jsonStr(snap.schema.json)},""" +
      s""""partitionColumns":[${snap.partitionColumns.map(jsonStr).mkString(",")}],""" +
      s""""configuration":{${cloneConf.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }.mkString(",")}}}}"""
    // live domain metadata travels with the clone (a clustered or
    // row-tracked source's domains are part of its contract)
    snap.domains.filterNot(_._2._2).toSeq.sortBy(_._1).foreach {
      case (d, (conf, _)) =>
        lines += s"""{"domainMetadata":{"domain":${jsonStr(d)},""" +
          s""""configuration":${jsonStr(conf)},"removed":false}}"""
    }
    snap.adds.foreach { a =>
      val abs = {
        val p = Paths.get(a.path)
        (if (p.isAbsolute) p else srcRoot.resolve(a.path)).normalize.toString
      }
      // DV descriptors with relative ('u') storage resolve against
      // the TABLE root — re-anchor them absolutely for the clone
      val dv = a.deletionVector.map { d =>
        if (d.storageType != "u") d
        else DeletionVectors.fileOf(src, d) match {
          case Some(f) => d.copy(storageType = "p",
            pathOrInlineDv = f.toAbsolutePath.normalize.toString)
          case None => d
        }
      }
      lines += addLine(a.copy(path = abs, deletionVector = dv))
    }
    try io(dst).putIfAbsent(commitPath(dst, 0L),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(0L)
    }
    0L
  }

  /** CONVERT an Iceberg table to Delta, ZERO-COPY (the xtable shape,
    * [[graft.sources.IcebergMeta.importDelta]]'s mirror): commit a
    * `_delta_log` version 0 at `dst` whose adds reference the Iceberg
    * snapshot's live data files by absolute path — no data moves, the
    * source keeps working. Stats travel from the MANIFESTS (zero
    * file reads): numRecords always; min/max/nullCount for the types
    * whose manifest bounds translate to Delta's stats JSON exactly
    * (integer/long/double/string — timestamp bounds are epoch-micro
    * longs where Delta wants ISO strings, so those columns just skip
    * stats rather than risk a wrong prune). An Iceberg PARTITIONED
    * layout converts fine — Iceberg files carry ALL columns — it
    * simply lands as an unpartitioned Delta table (rows exact,
    * partition pruning becomes stats pruning). Refuses row-level
    * deletes of any kind (hidden rows — compact first) and
    * default-valued columns still resolving over pre-evolution files
    * (the raw files do not store the default). */
  def importIceberg(spark: SparkSession, iceSrc: String,
      dst: String): Long = {
    val snap = IcebergMeta.snapshot(iceSrc)
    require(snap.deletes.isEmpty && snap.eqDeletes.isEmpty &&
      snap.dvs.isEmpty,
      s"delta-log: $iceSrc carries row-level deletes — their hidden " +
        "rows cannot be represented zero-copy; compact " +
        "(rewrite_data_files) first")
    require(!snap.needsDefaultFill,
      s"delta-log: $iceSrc has default-valued columns over " +
        "pre-evolution files — the raw files do not store the " +
        "default; compact first")
    require(!hasVariantType(snap.schema),
      s"delta-log: $iceSrc has variant columns (nested included) — " +
        "the conversion would need the variantType feature at (3,7); " +
        "recreate through the write path instead")
    require(latestVersion(dst) < 0,
      s"delta-log: convert target $dst already exists")
    io(dst).mkdirs(logDir(dst))
    val typeOf = snap.schema.fields.map(f => f.name -> f.dataType).toMap
    def statsJsonOf(f: IcebergMeta.IceFile): String = {
      def v(dt: DataType, typ: String, s: String): Option[String] =
        (dt, typ) match {
          case (IntegerType | LongType, "long") => Some(s)
          case (FloatType | DoubleType, "double") => Some(s)
          case (StringType, "string") => Some(jsonStr(s))
          case _ => None // timestamps/dates: absent stats never mis-prune
        }
      val mins = scala.collection.mutable.ListBuffer.empty[String]
      val maxs = scala.collection.mutable.ListBuffer.empty[String]
      val nulls = scala.collection.mutable.ListBuffer.empty[String]
      f.stats.toSeq.sortBy(_._1).foreach { case (name, cs) =>
        typeOf.get(name).foreach { dt =>
          for (m <- cs.min; jv <- v(dt, cs.typ, m))
            mins += s"${jsonStr(name)}:$jv"
          for (m <- cs.max; jv <- v(dt, cs.typ, m))
            maxs += s"${jsonStr(name)}:$jv"
          // a manifest that omitted null_value_counts replays as the
          // UNKNOWN sentinel — omit, never coin a zero (wrong IS
          // NULL pruning on the converted table)
          if (cs.nulls >= 0) nulls += s"${jsonStr(name)}:${cs.nulls}"
        }
      }
      s"""{"numRecords":${f.records},""" +
        s""""minValues":{${mins.mkString(",")}},""" +
        s""""maxValues":{${maxs.mkString(",")}},""" +
        s""""nullCount":{${nulls.mkString(",")}}}"""
    }
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += s"""{"commitInfo":{"timestamp":${System.currentTimeMillis},""" +
      s""""operation":"CONVERT"}}"""
    lines += protocolLine(1, 2, Set.empty, Set.empty)
    lines += metaDataLine(snap.schema.json, Nil, Map.empty)
    snap.files.sortBy(_.path).foreach { f =>
      lines += addLine(DeltaAdd(
        Paths.get(f.path).toAbsolutePath.normalize.toString,
        Map.empty, Set.empty, f.sizeBytes, Some(statsJsonOf(f))))
    }
    try io(dst).putIfAbsent(commitPath(dst, 0L),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(0L)
    }
    0L
  }

  /** The table's commit history, newest first — DESCRIBE HISTORY's
    * rows: (version, operation, timestamp) from each commit's
    * commitInfo (absent commitInfo → operation NULL; checkpointed-
    * away commits are simply not listed). The recorded
    * `inCommitTimestamp` is authoritative over the advisory
    * `timestamp` when present (the ICT feature's read rule — mtime
    * and the advisory field can both lie on moved/rewritten logs).
    * Metadata-scale I/O. */
  def history(root: String): Seq[(Long, Option[String], Option[Long])] =
    jsonVersions(root).sorted.reverse.map { v =>
      val info = io(root).readLines(commitPath(root, v))
        .filter(_.nonEmpty).map(mapper.readTree)
        .flatMap(n => Option(n.get("commitInfo"))).headOption
      (v,
        info.flatMap(i => Option(i.get("operation")).map(_.asText())),
        info.flatMap(i => Option(i.get("inCommitTimestamp"))
          .orElse(Option(i.get("timestamp"))).map(_.asLong())))
    }

  /** VACUUM the Delta table at `root`: delete data-path files that
    * are (a) NOT referenced by the CURRENT snapshot — neither as a
    * live add nor as an add's deletion-vector file — and (b) older
    * than `retainMs` by modification time (delta-spark's rule; the
    * mtime guard is what protects a concurrent writer's just-staged
    * files that have not committed yet). `_delta_log/` is never
    * touched; other hidden paths (`_`/`.`-prefixed segments) are
    * skipped EXCEPT `_change_data/` — expired cdc files are vacuumed
    * exactly like delta-spark does, which is why a CDF read range is
    * bounded by the retention window. Time travel to versions whose
    * files were vacuumed breaks, BY DESIGN (same everywhere).
    * All I/O routes through the [[DataStore]] seam. Returns the
    * number of files deleted. */
  def vacuum(spark: SparkSession, root: String,
      retainMs: Long = 7L * 24 * 3600 * 1000,
      nowMs: Long = System.currentTimeMillis,
      dryRun: Boolean = false): Long = {
    require(retainMs >= 0, s"vacuum: negative retention $retainMs")
    val snap = snapshot(spark, root)
    // the vacuumProtocolCheck obligation, explicit: a FULL protocol
    // check before deleting anything — an unknown writer feature may
    // imply live files this replay cannot see (exactly the corruption
    // the feature exists to prevent), so refuse rather than sweep
    gateWriterObligations(snap, "VACUUM", removesData = false)
    val store = VersionedTable.dataIO(root)
    val rootP = Paths.get(root).normalize
    def resolve(p: String): Path = {
      val pp = Paths.get(p)
      (if (pp.isAbsolute) pp else rootP.resolve(p)).normalize
    }
    val keep: Set[Path] =
      (snap.adds.map(a => resolve(a.path)) ++
        snap.adds.flatMap(_.deletionVector.flatMap(d =>
          DeletionVectors.fileOf(root, d)).map(_.normalize))).toSet
    val cutoff = nowMs - retainMs
    def hidden(rel: Path): Boolean = {
      val names = (0 until rel.getNameCount).map(rel.getName(_).toString)
      names.head != "_change_data" &&
        names.exists(n => n.startsWith("_") || n.startsWith("."))
    }
    var n = 0L
    store.listFilesRecursive(rootP).foreach { f0 =>
      val f = f0.normalize
      val rel = rootP.relativize(f)
      if (rel.getName(0).toString != "_delta_log" && !hidden(rel) &&
          !keep.contains(f) && store.mtimeMs(f) <= cutoff) {
        if (!dryRun) store.deleteFile(f)
        n += 1
      }
    }
    n
  }

  /** SQL UPDATE on the Delta table, copy-on-write: rows of the
    * touched files matching `cond` get each SET column replaced by
    * its expression — ALL evaluated against the PRE-update row (SQL
    * UPDATE semantics, one select), non-matching rows carry over
    * verbatim, untouched files never rewrite. Updating a PARTITION
    * column works: rewritten rows restage through the partitionBy
    * layout and land in their new `col=value/` dirs with re-recorded
    * partitionValues. When `delta.enableChangeDataFeed` is set, the
    * commit records `update_preimage`/`update_postimage` cdc rows.
    * NULL `cond` keeps the row (SQL). Returns the committed version,
    * or the current one when nothing matches. */
  def updateWhere(spark: SparkSession, root: String,
      set: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression])
      : Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    require(set.nonEmpty, "UPDATE needs at least one SET column")
    require(set.map(_._1).distinct.size == set.size,
      s"duplicate SET column in ${set.map(_._1).mkString(", ")}")
    val snap0 = snapshot(spark, root)
    gateWriterObligations(snap0, "UPDATE", removesData = true)
    // SET names validate against the LOGICAL schema (user-facing),
    // then everything — names, expressions, the rewrite itself —
    // moves to PHYSICAL space for mapped tables (see deleteWhere)
    val missing = set.map(_._1).toSet -- snap0.schema.fieldNames.toSet
    require(missing.isEmpty,
      s"UPDATE SET names non-columns: ${missing.mkString(", ")}")
    // identityColumns obligation: the stored values are the
    // allocator's — rewriting them breaks the mark's monotonicity
    // contract (delta-spark refuses identically)
    val idHit = identityFields(snap0.schema).map(_.name).toSet &
      set.map(_._1).toSet
    require(idHit.isEmpty,
      s"UPDATE on IDENTITY column(s) ${idHit.toSeq.sorted.mkString(", ")} " +
        "is not allowed")
    val mapping = snap0.columnMapping
    val snap = snap0.physical
    // re-anchor analyzed expressions by NAME against the fresh scan,
    // remapping logical references to their physical names
    def rebindE(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      e.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted(mapping.getOrElse(a.name, a.name))
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if u.nameParts.size == 1 =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted(mapping.getOrElse(u.name, u.name))
      }
    def rebind(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.GraftColumnBridge.column(rebindE(e))
    val condCol = cond.map(rebind).getOrElse(lit(true))
    val hit = coalesce(condCol, lit(false))
    val vis = DeltaLogRead.withPositions(spark, snap)
    val touchedUris = vis.filter(condCol)
      .select(DeltaLogRead.FpCol).distinct()
      .collect().map(_.getString(0)).sorted
    if (touchedUris.isEmpty) return snap.version
    val idx = new DeltaLogFileIndex(spark, root, snap, pinned = true)
    val uriToAdd = snap.adds.map(a => idx.scanUriOf(a) -> a).toMap
    val touchedAdds = touchedUris.map(u => uriToAdd.getOrElse(u,
      throw new IllegalStateException(
        s"delta-log: scan URI $u not in snapshot v${snap.version}")))
    val touchedRows = vis
      .filter(col(DeltaLogRead.FpCol).isin(touchedUris.toSeq: _*))
    val setByCol = set.map { case (n, e) =>
      mapping.getOrElse(n, n) -> e }.toMap // physical keys
    // generatedColumns obligation: a generated column NOT explicitly
    // SET recomputes from the POST-update row (its sources may be the
    // updated columns — delta-spark's rule); source references that
    // are themselves SET substitute the SET expression (all SET RHS
    // evaluate over the pre-update row, standard UPDATE semantics)
    val genByPhys = generatedFields(snap0.schema)
      .map(g => mapping.getOrElse(g.name, g.name) -> g).toMap
    def genPost(g: StructField): org.apache.spark.sql.Column = {
      val parsed = spark.sessionState.sqlParser.parseExpression(
        g.metadata.getString("delta.generationExpression"))
      // manual recursion, NOT transform: a substituted SET expression
      // may reference the same column it replaces (SET k = k + 1), and
      // transformDown would re-substitute inside it forever
      def subst(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : org.apache.spark.sql.catalyst.expressions.Expression = e match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if u.nameParts.size == 1 =>
          val phys = mapping.getOrElse(u.name, u.name)
          setByCol.get(phys) match {
            case Some(se) => rebindE(se)
            case None =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                .quoted(phys)
          }
        case other => other.mapChildren(subst)
      }
      org.apache.spark.sql.GraftColumnBridge.column(subst(parsed))
        .cast(g.dataType)
    }
    def applied(df: DataFrame): DataFrame =
      df.select(snap.schema.fieldNames.toSeq.map { c =>
        setByCol.get(c) match {
          case Some(e) => when(hit, rebind(e)).otherwise(col(c)).as(c)
          case None => genByPhys.get(c) match {
            case Some(g) =>
              when(hit, genPost(g)).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }
      }: _*)
    // writer contracts: CHECKs/invariants verify the POST-UPDATE rows
    // in LOGICAL space (mapped tables rename back by position — types
    // are identical modulo names, so the cast is a pure rename). The
    // frame is by-name lazy: with no contracts recorded, no job runs.
    lazy val physFields = withParquetFieldIds(
      physicalSchemaOf(root, snap0.schema)).fields
    def updatedLogical: DataFrame = {
      val updated = applied(touchedRows.filter(hit))
      if (mapping.isEmpty) updated
      else updated.select(snap0.schema.fields.toSeq.zip(physFields)
        .map { case (lf, pf) => col(s"`${pf.name}`")
          .cast(nullableOf(lf.dataType)).as(lf.name) }: _*)
    }
    enforceRowContracts(updatedLogical,
      snap0.schema, snap.configuration, "UPDATE")
    // a generated column explicitly SET verifies against its
    // expression on the post-update rows (mismatch refuses — the
    // stored value must equal the expression's result)
    if (generatedFields(snap0.schema).exists(g =>
        setByCol.contains(mapping.getOrElse(g.name, g.name))))
      applyGeneratedColumns(updatedLogical, snap0.schema, "UPDATE")
    val cdcAdds =
      if (!snap.configuration.get("delta.enableChangeDataFeed")
        .contains("true")) Nil
      else {
        val matched = touchedRows.filter(hit)
        val pre = matched
          .select(snap.schema.fieldNames.toSeq.map(col): _*)
          .withColumn("_change_type", lit("update_preimage"))
        val post = applied(matched)
          .withColumn("_change_type", lit("update_postimage"))
        stageAndLand(spark, pre.union(post), root, snap.partitionColumns,
          java.util.UUID.randomUUID().toString.take(8),
          prefix = "_change_data/")
      }
    // DELETION-VECTOR path (delta-spark's UPDATE-with-DVs shape):
    // when the table opted in and the update touches a SMALL fraction
    // of the touched files' rows, the commit marks the pre-update
    // rows dead via per-file DVs and appends ONLY the post-update
    // rows as new files — O(updated rows) write I/O instead of
    // restaging every surviving row of every touched file.
    if (snap.configuration.get("delta.enableDeletionVectors")
        .contains("true") &&
      snap0.minWriterVersion >= 7 &&
      snap0.writerFeatures.contains("deletionVectors")) {
      val matched = vis.filter(hit)
        .select(DeltaLogRead.FpCol, DeltaLogRead.PosCol)
      dvRemoveRows(spark, root, snap, matched, touchedAdds.toSeq, idx,
        cdcAdds, operation = "UPDATE",
        extraRows = Some(applied(touchedRows.filter(hit)
          .drop(DeltaLogRead.FpCol, DeltaLogRead.PosCol)))) match {
        case Some(v) => return v
        case None => () // too large/dense — COW below
      }
    }
    replaceFiles(spark, root, snap, touchedAdds.map(_.path).toSeq,
      applied(touchedRows), snap.partitionColumns, cdcAdds,
      operation = "UPDATE")
  }

  /** MERGE INTO the Delta table with the full Delta clause algebra —
    * conditional/partial `WHEN MATCHED UPDATE/DELETE`, conditional
    * `WHEN NOT MATCHED INSERT`, `WHEN NOT MATCHED BY SOURCE` — the
    * same one-full-outer-join cascade as graft's own
    * [[VersionedTable.mergeConditional]], committed copy-on-write:
    * only files whose rows can match the source's key envelope are
    * read and rewritten (every file when a by-source clause ranges
    * over the whole target), survivors + merge output restage through
    * the partition layout, untouched files carry over. Source keys
    * must be unique (Delta raises the same). COLUMN-MAPPED tables
    * with flat schemas work (cascade in logical space, scan/staging
    * renamed at the boundary); nested mapped columns refuse. On a
    * CDF-enabled table
    * the commit records the merge's change rows (`insert` /
    * `update_preimage`+`update_postimage` / `delete`, carry-over rows
    * recording nothing) as cdc actions — Delta's merge CDF shape. */
  def mergeConditional(spark: SparkSession, root: String,
      source: DataFrame, tKey: String, sKey: String,
      matched: Seq[VersionedTable.MergeClause] = Nil,
      notMatched: Seq[VersionedTable.MergeClause] = Nil,
      bySource: Seq[VersionedTable.MergeClause] = Nil,
      withSchemaEvolution: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{col, lit, min => fmin, max => fmax}
    val snap0 = snapshot(spark, root)
    // insert-only merges stay legal on append-only tables (they
    // remove nothing); any matched/by-source clause can rewrite rows
    gateWriterObligations(snap0, "MERGE",
      removesData = matched.nonEmpty || bySource.nonEmpty)
    val mapping = snap0.columnMapping
    // COLUMN-MAPPED: the clause cascade runs in LOGICAL space (clause
    // expressions reference __t_<logical>/__s_* — rewriting their
    // internals would be fragile across the SQL and API routes), with
    // the scan renamed physical→logical on the way in and the outputs
    // renamed back before staging. NESTED mapped columns rename via
    // by-position struct casts both ways (types are identical modulo
    // names, so the cast is a pure rename — the same trick the
    // writer's staging uses), with parquet field ids re-attached on
    // the way out for id-mode readers.
    val snap = snap0.physical
    lazy val physSchema = withParquetFieldIds(
      physicalSchemaOf(root, snap0.schema))
    def toLogical(df: DataFrame): DataFrame =
      if (mapping.isEmpty) df
      else df.select(snap0.schema.fields.toSeq.zip(physSchema.fields)
        .map { case (lf, pf) =>
          col(s"`${pf.name}`").cast(nullableOf(lf.dataType)).as(lf.name)
        }: _*)
    def toPhysical(df: DataFrame): DataFrame =
      if (mapping.isEmpty) df
      else {
        val byLogical = snap0.schema.fieldNames.zip(physSchema.fields).toMap
        df.select(df.columns.toSeq.map {
          case "_change_type" => col("_change_type")
          case l =>
            val pf = byLogical.getOrElse(l, throw new IllegalStateException(
              s"delta-log merge: unexpected output column $l"))
            col(s"`$l`").cast(pf.dataType).as(pf.name, pf.metadata)
        }: _*)
      }
    matched.foreach(c => require(
      !c.isInstanceOf[VersionedTable.MergeInsert],
      "WHEN MATCHED cannot INSERT"))
    notMatched.foreach(c => require(
      c.isInstanceOf[VersionedTable.MergeInsert],
      "WHEN NOT MATCHED can only INSERT"))
    bySource.foreach(c => require(
      !c.isInstanceOf[VersionedTable.MergeInsert],
      "WHEN NOT MATCHED BY SOURCE cannot INSERT"))
    require(snap0.schema.fieldNames.contains(tKey),
      s"no target column '$tKey'")
    require(source.columns.contains(sKey), s"no source column '$sKey'")
    // identityColumns obligations under MERGE: assignments to an
    // identity column are out (the allocator owns those values), and
    // INSERT clauses must supply the column explicitly — which only a
    // GENERATED BY DEFAULT declaration licenses (per-clause allocation
    // would need the mark threaded through the cascade; delta-spark
    // refuses the ALWAYS case the same way)
    val idFieldsM = identityFields(snap0.schema)
    if (idFieldsM.nonEmpty) {
      val idNames = idFieldsM.map(_.name).toSet
      val assigned = (matched ++ bySource).flatMap {
        case u: VersionedTable.MergeUpdate => u.set.keySet
        case _ => Set.empty[String]
      }.toSet
      require((assigned & idNames).isEmpty,
        "delta-log MERGE: cannot UPDATE IDENTITY column(s) " +
          s"${(assigned & idNames).toSeq.sorted.mkString(", ")}")
      if (notMatched.nonEmpty) idFieldsM.foreach { f =>
        require(identityAllowsExplicit(f),
          s"delta-log MERGE: column ${f.name} is GENERATED ALWAYS AS " +
            "IDENTITY — INSERT clauses cannot supply or omit it; " +
            "append() allocates, or declare GENERATED BY DEFAULT")
        notMatched.foreach {
          case ins: VersionedTable.MergeInsert =>
            require(ins.values.contains(f.name),
              s"delta-log MERGE: INSERT must supply identity column " +
                s"${f.name} explicitly (GENERATED BY DEFAULT)")
          case _ => ()
        }
      }
    }
    // WITH SCHEMA EVOLUTION: an assignment targeting a column the
    // table lacks ADDS it (nullable, typed by the same-named SOURCE
    // column — the only type authority the clause algebra carries);
    // without the flag such an assignment refuses. Mapped tables
    // refuse evolution (added fields would need mapping ids threaded
    // through the physical rename).
    val assignedTargets = (matched ++ notMatched ++ bySource).flatMap {
      case u: VersionedTable.MergeUpdate => u.set.keys
      case i: VersionedTable.MergeInsert => i.values.keys
      case _ => Nil
    }.toSet
    val newCols = (assignedTargets -- snap0.schema.fieldNames).toSeq.sorted
    if (newCols.nonEmpty) {
      require(withSchemaEvolution,
        s"delta-log MERGE: clause assigns non-existing column(s) " +
          s"${newCols.mkString(", ")} — use WITH SCHEMA EVOLUTION")
      require(mapping.isEmpty,
        "delta-log MERGE: schema evolution on a column-mapped table " +
          "is not supported — evolve with delta-spark first")
      newCols.foreach(c => require(source.columns.contains(c),
        s"delta-log MERGE WITH SCHEMA EVOLUTION: new column $c has no " +
          "same-named source column to take its type from"))
      // this path restates metaData WITHOUT a protocol line — adding
      // a variant column here would produce a variant schema on a
      // table whose protocol never listed the variantType feature
      newCols.foreach(c => require(
        !hasVariantType(source.schema(c).dataType),
        s"delta-log MERGE WITH SCHEMA EVOLUTION: new column $c is a " +
          "variant — the variantType feature must be stamped at " +
          "creation; recreate the table with the column instead"))
    }
    val schemaM =
      if (newCols.isEmpty) snap0.schema
      else StructType(snap0.schema.fields ++ newCols.map(c =>
        StructField(c, source.schema(c).dataType, nullable = true)))
    val metaRestateM =
      if (newCols.isEmpty) None
      else Some(metaDataLine(schemaM.json, snap0.partitionColumns,
        snap0.configuration, Option(snap0.tableId).filter(_.nonEmpty)))
    val genFieldsM = generatedFields(snap0.schema)
    val nSrc = source.count()
    if (nSrc == 0 && bySource.isEmpty) return snap.version
    require(source.select(col(sKey)).where(col(sKey).isNotNull)
        .distinct().count() ==
      source.where(col(sKey).isNotNull).count(),
      "delta-log MERGE: source keys must be unique (two source rows " +
        "matching one target row have no deterministic outcome)")
    val vis = DeltaLogRead.withPositions(spark, snap)
    // file targeting: a by-source clause ranges over EVERY target
    // row; otherwise the key-envelope filter pushes into the scan's
    // per-file stats, so only overlapping files are even read
    val touchedUris: Seq[String] =
      if (bySource.nonEmpty)
        vis.select(DeltaLogRead.FpCol).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
      else {
        val b = source.agg(fmin(col(sKey)), fmax(col(sKey))).head()
        if (b.isNullAt(0)) return snap.version // all-NULL keys: no-op
        val ptKey = mapping.getOrElse(tKey, tKey)
        vis.filter(col(s"`$ptKey`") >= lit(b.get(0)) &&
            col(s"`$ptKey`") <= lit(b.get(1)))
          .select(DeltaLogRead.FpCol).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
      }
    val idx = new DeltaLogFileIndex(spark, root, snap, pinned = true)
    val uriToAdd = snap.adds.map(a => idx.scanUriOf(a) -> a).toMap
    val touchedAdds = touchedUris.map(u => uriToAdd.getOrElse(u,
      throw new IllegalStateException(
        s"delta-log: scan URI $u not in snapshot v${snap.version}")))
    val touchedFrame =
      if (touchedUris.isEmpty) vis.filter(lit(false))
      else vis.filter(col(DeltaLogRead.FpCol).isin(touchedUris: _*))
    val tgtRows0 = toLogical(
      touchedFrame.drop(DeltaLogRead.FpCol, DeltaLogRead.PosCol))
    // evolution: existing rows null-fill the added columns
    val tgtRows = newCols.foldLeft(tgtRows0)((d, c) =>
      d.withColumn(c, lit(null).cast(source.schema(c).dataType)))
    if (!snap.configuration.get("delta.enableChangeDataFeed")
        .contains("true")) {
      // DELETION-VECTOR path (delta-spark's MERGE-with-DVs shape):
      // when the table opted in, run the cascade in TAGGED form with
      // the target rows' (file, position) addressing threaded
      // through — matched-updated and deleted target rows die via
      // per-file DVs, updated/inserted rows append as new files, and
      // CARRY-OVER rows never restage (the O(changed rows) contract).
      // Dense merges fall back to the COW rewrite below.
      if (snap.configuration.get("delta.enableDeletionVectors")
          .contains("true") &&
        newCols.isEmpty && // evolution restates metaData — COW route
        snap0.minWriterVersion >= 7 &&
        snap0.writerFeatures.contains("deletionVectors")) {
        val tgtWithPos =
          if (mapping.isEmpty) touchedFrame
          else touchedFrame.select(
            snap0.schema.fields.toSeq.zip(physSchema.fields).map {
              case (lf, pf) => col(s"`${pf.name}`")
                .cast(nullableOf(lf.dataType)).as(lf.name)
            } ++ Seq(col(DeltaLogRead.FpCol),
              col(DeltaLogRead.PosCol)): _*)
        val tagged = VersionedTable.mergeCascadeTagged(tgtWithPos,
          source, snap0.schema, tKey, sKey, matched, notMatched,
          bySource, passThrough =
            Seq(DeltaLogRead.FpCol, DeltaLogRead.PosCol))
          .persist()
        try {
          val dead = tagged.filter(
            col(DeltaLogRead.FpCol).isNotNull &&
              col("__ct").isin("update", "delete"))
            .select(col(DeltaLogRead.FpCol), col(DeltaLogRead.PosCol))
          val freshLogical = tagged
            .filter(col("__keep") && col("__ct").isin("update", "insert"))
            .select(snap0.schema.fieldNames.toSeq.map(col): _*)
          // writer contracts on exactly the rows the merge lands
          enforceRowContracts(freshLogical, snap0.schema,
            snap.configuration, "MERGE")
          if (genFieldsM.nonEmpty)
            applyGeneratedColumns(freshLogical, snap0.schema, "MERGE")
          val freshRows = toPhysical(freshLogical)
          dvRemoveRows(spark, root, snap, dead, touchedAdds.toSeq,
            idx, Nil, operation = "MERGE",
            extraRows = Some(freshRows)) match {
            case Some(v) => return v
            case None => () // too large/dense — COW below
          }
        } finally tagged.unpersist()
      }
      val out = VersionedTable.mergeCascadeRows(tgtRows, source,
        schemaM, tKey, sKey, matched, notMatched, bySource)
      enforceRowContracts(out, schemaM, snap.configuration, "MERGE")
      if (genFieldsM.nonEmpty)
        applyGeneratedColumns(out, schemaM, "MERGE")
      return replaceFiles(spark, root, snap,
        touchedAdds.map(_.path).toSeq,
        toPhysical(out), snap.partitionColumns, operation = "MERGE",
        metaRestate = metaRestateM)
    }
    // CDF: run the cascade ONCE in tagged form, derive the new table
    // rows AND the change rows from it — carry-over rows (NULL __ct)
    // record nothing, exactly Delta's merge CDF. The tagged frame is
    // persisted because it feeds four scans (out + three change
    // kinds); unpersist after the commit materializes everything.
    val dataCols = schemaM.fieldNames.toSeq
    val tagged = VersionedTable.mergeCascadeTagged(tgtRows, source,
      schemaM, tKey, sKey, matched, notMatched, bySource).persist()
    try {
      if (tagged.filter(col("__ct").isNotNull).isEmpty)
        return snap.version // no clause fired: no change, no commit
      val out = tagged.filter(col("__keep")).select(dataCols.map(col): _*)
      enforceRowContracts(out, schemaM, snap.configuration, "MERGE")
      if (genFieldsM.nonEmpty)
        applyGeneratedColumns(out, schemaM, "MERGE")
      def pre(df: DataFrame) =
        df.select(dataCols.map(c => col(s"__pre_$c").as(c)): _*)
      def post(df: DataFrame) = df.select(dataCols.map(col): _*)
      val upd = tagged.filter(col("__ct") === "update")
      val changeRows =
        pre(tagged.filter(col("__ct") === "delete"))
          .withColumn("_change_type", lit("delete"))
        .union(pre(upd).withColumn("_change_type", lit("update_preimage")))
        .union(post(upd).withColumn("_change_type", lit("update_postimage")))
        .union(post(tagged.filter(col("__ct") === "insert"))
          .withColumn("_change_type", lit("insert")))
      val cdcAdds = stageAndLand(spark, toPhysical(changeRows), root,
        snap.partitionColumns,
        java.util.UUID.randomUUID().toString.take(8),
        prefix = "_change_data/")
      replaceFiles(spark, root, snap, touchedAdds.map(_.path).toSeq,
        toPhysical(out), snap.partitionColumns, cdcAdds,
        operation = "MERGE", metaRestate = metaRestateM)
    } finally tagged.unpersist()
  }

  /** `ALTER TABLE RENAME COLUMN` — legal ONLY under column mapping
    * (delta-spark's rule: without mapping the parquet files' column
    * names ARE the schema, and a rename would need a full rewrite).
    * One metadata-only commit restating the schema with the new
    * LOGICAL name; the field keeps its `physicalName` and mapping id,
    * so no data file changes — and on a UniForm table the mirror
    * follows BY ID (the Iceberg column renames in the same sync). */
  def renameColumn(spark: SparkSession, root: String,
      oldName: String, newName: String): Long = {
    val snap = snapshot(spark, root)
    gateWriterObligations(snap, "RENAME COLUMN", removesData = false)
    require(snap.columnMapping.nonEmpty,
      s"delta-log: RENAME COLUMN requires column mapping " +
        "(delta.columnMapping.mode = name|id) — without it the " +
        "parquet column names are the schema")
    require(snap.schema.fieldNames.contains(oldName),
      s"delta-log: no column '$oldName' in $root")
    require(!snap.schema.fieldNames.contains(newName),
      s"delta-log: column '$newName' already exists in $root")
    val newSchema = StructType(snap.schema.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    gateUniform(root, snap.configuration, newSchema,
      snap.partitionColumns,
      columnMappingOf(root, newSchema, snap.configuration),
      carriesDv = snap.adds.exists(_.deletionVector.isDefined),
      "RENAME COLUMN")
    val next = snap.version + 1
    val ict: Option[Long] =
      if (ictEnabled(snap.configuration))
        Some(nextIct(root, snap.version))
      else None
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += (ict match {
      case Some(t) =>
        s"""{"commitInfo":{"inCommitTimestamp":$t,"timestamp":$t,""" +
          s""""operation":"RENAME COLUMN"}}"""
      case None =>
        s"""{"commitInfo":{"timestamp":${System.currentTimeMillis},""" +
          s""""operation":"RENAME COLUMN"}}"""
    })
    lines += metaDataLine(newSchema.json, snap.partitionColumns,
      snap.configuration, Option(snap.tableId).filter(_.nonEmpty))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    if (uniformEnabled(snap.configuration))
      syncUniformConverging(spark, root)
    next
  }

  /** Restate the table's metaData with `props` merged into its
    * configuration — the `ALTER TABLE SET TBLPROPERTIES` commit shape
    * (schema and partitioning carried verbatim). The canonical use
    * here: `delta.enableChangeDataFeed -> true`, after which COW
    * deletes record `cdc` actions ([[deleteWhere]]) and [[changes]]
    * reads them as the authoritative feed. */
  def setConfiguration(spark: SparkSession, root: String,
      props: Map[String, String]): Long = {
    val snap = snapshot(spark, root)
    gateWriterObligations(snap, "SET TBLPROPERTIES", removesData = false)
    val next = snap.version + 1
    val merged0 = snap.configuration ++ props
    // ICT LATE ENABLEMENT (the spec's provenance rule): the commit
    // that turns delta.enableInCommitTimestamps on records WHERE the
    // feature starts governing — this commit's version and its own
    // in-commit timestamp — so readers use mtime below the mark and
    // recorded ICTs from it onward. Disabling drops the marks.
    val enablingIct = ictEnabled(props) && !ictEnabled(snap.configuration)
    val disablingIct = props.get("delta.enableInCommitTimestamps")
      .contains("false")
    val ictStamp: Option[Long] =
      if (ictEnabled(merged0)) Some(nextIct(root, snap.version))
      else None
    val merged =
      if (enablingIct) merged0 +
        ("delta.inCommitTimestampEnablementVersion" -> next.toString) +
        ("delta.inCommitTimestampEnablementTimestamp" ->
          ictStamp.get.toString)
      else if (disablingIct) merged0 -
        "delta.inCommitTimestampEnablementVersion" -
        "delta.inCommitTimestampEnablementTimestamp"
      else merged0
    // enabling UniForm on a shape the sync cannot mirror must refuse
    // BEFORE the property commit lands
    gateUniform(root, merged, snap.schema, snap.partitionColumns,
      snap.columnMapping,
      carriesDv = snap.adds.exists(_.deletionVector.isDefined),
      "SET TBLPROPERTIES")
    // ADDING a CHECK constraint verifies the EXISTING rows first —
    // delta-spark's ADD CONSTRAINT rule (a constraint the current
    // data violates must never land in the configuration)
    val newChecks = props.filter { case (k, _) =>
      k.startsWith("delta.constraints.") &&
        !snap.configuration.contains(k)
    }
    if (newChecks.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val phys = snap.physical
      val vis = DeltaLogRead.withPositions(spark, phys)
        .drop(DeltaLogRead.FpCol, DeltaLogRead.PosCol)
      val logicalVis =
        if (snap.columnMapping.isEmpty) vis
        else {
          val physFields = withParquetFieldIds(
            physicalSchemaOf(root, snap.schema)).fields
          vis.select(snap.schema.fields.toSeq.zip(physFields).map {
            case (lf, pf) => col(s"`${pf.name}`")
              .cast(nullableOf(lf.dataType)).as(lf.name)
          }: _*)
        }
      enforceRowContracts(logicalVis, StructType(Nil), newChecks,
        "ADD CONSTRAINT")
    }
    // enabling row tracking on an EXISTING table is a backfill
    // operation (every live file needs a block assigned and
    // materialized consistently) — delta-spark runs it as a
    // dedicated ALTER; refuse rather than flip the property without
    // the obligation's state
    if (props.get("delta.enableRowTracking").contains("true") &&
      !(snap.minWriterVersion >= 7 &&
        snap.writerFeatures.contains("rowTracking")))
      throw new UnsupportedOperationException(
        "delta-log: enabling row tracking on an existing table " +
          "requires backfilling id blocks for every live file — " +
          "not supported; create the table with " +
          "delta.enableRowTracking=true instead")
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    // commitInfo FIRST (the ICT placement rule); the stamp reuses the
    // enablement-provenance value so the two marks agree exactly
    lines += (ictStamp match {
      case Some(t) =>
        s"""{"commitInfo":{"inCommitTimestamp":$t,"timestamp":$t,""" +
          s""""operation":"SET TBLPROPERTIES"}}"""
      case None =>
        s"""{"commitInfo":{"timestamp":${System.currentTimeMillis},""" +
          s""""operation":"SET TBLPROPERTIES"}}"""
    })
    // property-implied protocol upgrades land in the SAME commit, as
    // ONE combined protocol line; never downgrade anything:
    //  - deletion vectors → (3,7) + feature (legacy-implied features
    //    kept active, the spec's upgrade rule);
    //  - change data feed → writer 4, or the changeDataFeed feature
    //    when the table is already on (…,7) — below either, a
    //    conformant writer would ignore the property.
    val wantDv = props.get("delta.enableDeletionVectors")
      .contains("true") &&
      !(snap.minWriterVersion >= 7 &&
        snap.writerFeatures.contains("deletionVectors"))
    // v2 checkpoints are licensed only by the v2Checkpoint
    // reader-writer feature — setting the policy must add it (same
    // commit), or foreign engines reject the next checkpoint
    val wantV2cp = props.get("delta.checkpointPolicy")
      .contains("v2") &&
      !(snap.minReaderVersion >= 3 &&
        snap.readerFeatures.contains("v2Checkpoint"))
    // ICT is WRITER-only: feature-listing needs writer 7, reader
    // version stays put
    val wantIctFeat = enablingIct &&
      !(snap.minWriterVersion >= 7 &&
        snap.writerFeatures.contains("inCommitTimestamp"))
    // UniForm late enablement: writer-only feature + the enabling
    // commit creates the Iceberg tree (syncUniform below)
    val wantUniFeat = uniformEnabled(merged) &&
      !(snap.minWriterVersion >= 7 &&
        snap.writerFeatures.contains("icebergCompatV2"))
    val targetW0 =
      if (wantDv || wantV2cp || wantIctFeat || wantUniFeat) 7
      else if (props.get("delta.enableChangeDataFeed").contains("true") &&
        snap.minWriterVersion < 4) math.max(snap.minWriterVersion, 4)
      else snap.minWriterVersion
    // a CHECK constraint requires writer 3 (or the checkConstraints
    // feature at (…,7)) — below it, a feature-unaware writer could
    // legally append violating rows
    val targetW =
      if (newChecks.nonEmpty && targetW0 < 7) math.max(targetW0, 3)
      else targetW0
    val wantCdfFeat = props.get("delta.enableChangeDataFeed")
      .contains("true") &&
      (targetW >= 7 || snap.minWriterVersion >= 7) &&
      !snap.writerFeatures.contains("changeDataFeed")
    val wantCheckFeat = newChecks.nonEmpty &&
      (targetW >= 7 || snap.minWriterVersion >= 7) &&
      !snap.writerFeatures.contains("checkConstraints")
    if (wantDv || wantV2cp || wantCdfFeat || wantCheckFeat ||
      wantIctFeat || wantUniFeat || targetW != snap.minWriterVersion) {
      val w = math.max(targetW, snap.minWriterVersion)
      val r = if (wantDv || wantV2cp) 3 else snap.minReaderVersion
      val rf = snap.readerFeatures ++
        (if (wantDv || wantV2cp)
          legacyReaderFeatures(snap.minReaderVersion)
         else Set.empty[String]) ++
        (if (wantDv) Set("deletionVectors") else Set.empty[String]) ++
        (if (wantV2cp) Set("v2Checkpoint") else Set.empty[String])
      val wf = snap.writerFeatures ++
        (if (w >= 7) legacyWriterFeatures(snap.minWriterVersion)
         else Set.empty[String]) ++
        (if (wantDv) Set("deletionVectors") else Set.empty[String]) ++
        (if (wantV2cp) Set("v2Checkpoint") else Set.empty[String]) ++
        (if (wantCdfFeat || (w >= 7 && merged
          .get("delta.enableChangeDataFeed").contains("true")))
          Set("changeDataFeed") else Set.empty[String]) ++
        (if (wantCheckFeat || (w >= 7 &&
          merged.keys.exists(_.startsWith("delta.constraints."))))
          Set("checkConstraints") else Set.empty[String]) ++
        (if (wantIctFeat || (w >= 7 && ictEnabled(merged)))
          Set("inCommitTimestamp") else Set.empty[String]) ++
        (if (wantUniFeat || (w >= 7 && uniformEnabled(merged)))
          Set("icebergCompatV2") else Set.empty[String])
      lines += protocolLine(r, w, rf, wf)
    }
    lines += metaDataLine(snap.schema.json, snap.partitionColumns,
      merged, Option(snap.tableId).filter(_.nonEmpty))
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    // enabling UniForm is the moment the Iceberg tree materializes
    // (and any enabled table's property change keeps it in sync)
    if (uniformEnabled(merged)) syncUniformConverging(spark, root)
    next
  }

  /** Commit a `domainMetadata` action — the Delta protocol's named
    * metadata domain (system domains like `delta.clustering` live
    * here). Latest action per domain wins on replay; `removed=true`
    * tombstones the domain. Writing requires the `domainMetadata`
    * writer feature — absent, the protocol upgrades to (…,7) with the
    * feature (and every legacy-implied feature) in the SAME commit,
    * the spec's upgrade rule. Same-domain concurrency is safe by
    * construction: every commit lands via putIfAbsent, so ANY
    * concurrent commit — same domain or not — raises
    * [[VersionedTable.ConcurrentCommitException]] instead of
    * silently merging. */
  def setDomainMetadata(spark: SparkSession, root: String,
      domain: String, configuration: String,
      removed: Boolean = false): Long = {
    val snap = snapshot(spark, root)
    gateWriterObligations(snap, "SET DOMAIN METADATA",
      removesData = false)
    val next = snap.version + 1
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    lines += commitInfoLine(root, "SET DOMAIN METADATA",
      snap.configuration, snap.version)
    if (!(snap.minWriterVersion >= 7 &&
        snap.writerFeatures.contains("domainMetadata")))
      lines += protocolLine(snap.minReaderVersion, 7,
        snap.readerFeatures,
        snap.writerFeatures ++
          legacyWriterFeatures(snap.minWriterVersion) ++
          Set("domainMetadata"))
    lines += s"""{"domainMetadata":{"domain":${jsonStr(domain)},""" +
      s""""configuration":${jsonStr(configuration)},""" +
      s""""removed":$removed}}"""
    try io(root).putIfAbsent(commitPath(root, next),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new VersionedTable.ConcurrentCommitException(next)
    }
    next
  }

  /** CHANGE DATA FEED rows of the commits in `(afterVersion,
    * toVersion]` — Delta's `table_changes` read, via the public CDF
    * protocol: a commit's `cdc` actions (parquet under
    * `_change_data/`, carrying the data columns + `_change_type`) are
    * its authoritative change set when present; otherwise changes
    * derive — an add-only commit's rows are `insert`s, a remove-only
    * commit's rows are `delete`s (read from the still-retained
    * removed files, addressed through the PRIOR version's snapshot),
    * and a remove+add rewrite WITHOUT cdc refuses (the change data
    * was never recorded — delta-spark errors identically). Output
    * schema: table columns + `_change_type` + `_commit_version`.
    * COLUMN-MAPPED tables work: each per-version sub-scan routes
    * through the same [[DeltaLogRead.relation]] the batch read uses,
    * so the mapping rule (graft.ext.DeltaColumnMappingScan) restates
    * it physically and aliases back — `_change_type`, which the CDF
    * spec stores UNmapped in cdc files, carries no physicalName
    * metadata and restores as itself. Cost: O(changed files)
    * per version — never a table scan. */
  def changes(spark: SparkSession, root: String,
      afterVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val snapTo = snapshot(spark, root, Some(toVersion))
    val dataCols = snapTo.schema.fieldNames.toSeq
    val ctField = StructField("_change_type", StringType, nullable = false)
    // one sub-scan per (version, change kind): rows resolve through
    // the same pinned-snapshot relation as batch reads
    def rowsOf(schema: StructType, adds: Seq[DeltaAdd],
        changeType: Option[String], v: Long): DataFrame = {
      val sub = snapTo.copy(schema = schema, adds = adds)
      val df = org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
        org.apache.spark.sql.execution.datasources.LogicalRelation(
          DeltaLogRead.relation(spark, sub), isStreaming = false))
      val typed = changeType.fold(df)(t =>
        df.withColumn("_change_type", lit(t)))
      typed.withColumn("_commit_version", lit(v))
        .select((dataCols ++ Seq("_change_type", "_commit_version"))
          .map(col): _*)
    }
    val parts = ((afterVersion + 1) to toVersion).flatMap { v =>
      val ca = commitActions(root, v)
      if (ca.cdcFiles.nonEmpty)
        // authoritative: cdc parquet already carries _change_type
        Some(rowsOf(StructType(snapTo.schema.fields :+ ctField),
          ca.cdcFiles, None, v))
      else if (ca.adds.nonEmpty && !ca.dataChangingRemoves)
        Some(rowsOf(snapTo.schema, ca.adds, Some("insert"), v))
      else if (ca.adds.isEmpty && ca.dataChangingRemoves) {
        // deletes of whole files: their add entries (size, partition
        // values, possible DV) live in the PRIOR version's snapshot
        val prior = snapshot(spark, root, Some(v - 1))
        val byPath = prior.adds.map(a => a.path -> a).toMap
        val removed = ca.removedPaths.flatMap(byPath.get)
        require(removed.forall(_.deletionVector.isEmpty),
          s"delta-log: CDF derivation for v$v would resurrect rows " +
            "hidden by a deletion vector — the change data was not " +
            "recorded; enable delta.enableChangeDataFeed")
        if (removed.isEmpty) None
        else Some(rowsOf(snapTo.schema, removed, Some("delete"), v))
      } else if (ca.adds.nonEmpty && ca.dataChangingRemoves)
        throw new IllegalStateException(
          s"delta-log: commit v$v of $root rewrites data without cdc " +
            "actions — change data was not recorded for it; enable " +
            "delta.enableChangeDataFeed before such commits")
      else None // metadata-only / dataChange-false commit: no changes
    }
    if (parts.isEmpty) {
      val empty = snapTo.copy(adds = Nil)
      rowsOf(empty.schema, Nil, Some("insert"), toVersion)
        .filter(lit(false))
    } else parts.reduce(_ union _)
  }

  /** Write a checkpoint of `version` (default latest): the replayed
    * state as `%020d.checkpoint.parquet` plus the `_last_checkpoint`
    * hint — readers then replay O(commits since checkpoint). */
  def checkpoint(spark: SparkSession, root: String,
      version: Option[Long] = None,
      // SIDECAR fan-out (v2 checkpoints only): split the add set
      // across this many `_delta_log/_sidecars/` parquet files —
      // 0 = inline (the single-file form). At 100 TB a million-add
      // checkpoint written inline is one task writing one giant file
      // and one task replaying it; sidecars write in ONE partitioned
      // Spark job and replay as a multi-file parquet scan. Tables
      // past [[SidecarAutoThreshold]] adds fan out automatically.
      sidecarFiles: Int = 0): Long = {
    val v = version.getOrElse(latestVersion(root))
    val snap = snapshot(spark, root, Some(v))
    // a checkpoint MUTATES the log's replay contract: compacting a
    // table whose active writer features this writer does not honor
    // would silently drop the state those features maintain (e.g. a
    // rowTracking table's domain rows) from the compacted view — the
    // same corruption every other write path refuses on
    gateWriterObligations(snap, "CHECKPOINT", removesData = false)
    val addSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      // deletion vectors survive checkpointing — dropping the struct
      // here would silently resurrect deleted rows after replay
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType)))),
      // row tracking survives too — a compacted log must not strip
      // the files' id blocks (readers derive _row_id from them)
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))
    val metaSchema = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoSchema = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val txnSchema = StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))
    val domainSchema = StructType(Seq(
      StructField("domain", StringType),
      StructField("configuration", StringType),
      StructField("removed", BooleanType)))
    val cpSchema0 = StructType(Seq(
      StructField("protocol", protoSchema),
      StructField("metaData", metaSchema),
      StructField("add", addSchema),
      // txn state survives checkpointing — dropping it would break
      // the streaming sink's exactly-once across a truncated log
      StructField("txn", txnSchema),
      // domain metadata survives too (the domainMetadata feature's
      // core obligation — a clustered table's delta.clustering
      // domain must not vanish when the JSON prefix is cleaned);
      // removed-domain tombstones may be omitted, the spec's rule
      StructField("domainMetadata", domainSchema)))
    // v2Checkpoint's WRITER obligation: once the feature is active,
    // checkpoints may only be written in v2 format (UUID-named +
    // checkpointMetadata action) — a classic checkpoint here would
    // violate the table's contract for other engines
    val v2Mode = (snap.minReaderVersion >= 3 &&
        snap.readerFeatures.contains("v2Checkpoint")) ||
      snap.configuration.get("delta.checkpointPolicy").contains("v2")
    val cpSchema =
      if (!v2Mode) cpSchema0
      else StructType(cpSchema0.fields :+ StructField(
        "checkpointMetadata",
        StructType(Seq(StructField("version", LongType)))))
    // the REAL protocol — stamping (1,2) here would downgrade a
    // feature-bearing table on every replay-from-checkpoint, letting
    // feature-unaware writers corrupt it afterwards
    val protoRow = Row(Row(snap.minReaderVersion, snap.minWriterVersion,
      if (snap.minReaderVersion >= 3)
        snap.readerFeatures.toSeq.sorted else null,
      if (snap.minWriterVersion >= 7)
        snap.writerFeatures.toSeq.sorted else null),
      null, null, null, null)
    val metaRow = Row(null, Row(
      if (snap.tableId.nonEmpty) snap.tableId
      else java.util.UUID.randomUUID().toString,
      Row("parquet", Map.empty[String, String]), snap.schema.json,
      snap.partitionColumns, snap.configuration), null, null, null)
    val addRows = snap.adds.map { a =>
      val pv = a.partitionValues ++ a.nullPartitionCols.map(_ -> null)
      val dvRow = a.deletionVector.map(d => Row(d.storageType,
        d.pathOrInlineDv, d.offset.map(Int.box).orNull, d.sizeInBytes,
        d.cardinality)).orNull
      Row(null, null, Row(encodePath(a.path), pv, a.size, 0L, true,
        a.statsJson.orNull, dvRow,
        a.baseRowId.map(Long.box).orNull,
        a.defaultRowCommitVersion.map(Long.box).orNull), null, null)
    }
    val txnRows = snap.txns.toSeq.sortBy(_._1).map { case (app, ver) =>
      Row(null, null, null, Row(app, ver), null)
    }
    val domainRows = snap.domains.toSeq.filterNot(_._2._2)
      .sortBy(_._1).map { case (d, (conf, _)) =>
        Row(null, null, null, null, Row(d, conf, false))
      }
    val useSidecars = v2Mode && addRows.nonEmpty &&
      (sidecarFiles > 0 || addRows.length > SidecarAutoThreshold)
    val nSidecars =
      if (!useSidecars) 0
      else if (sidecarFiles > 0) sidecarFiles
      else 1 + addRows.length / SidecarAutoThreshold
    val sidecarInfos: Seq[(String, Long)] =
      if (!useSidecars) Nil
      else {
        // the adds land as SIDECAR parquet (spec: same action schema,
        // one level of indirection) in ONE partitioned Spark job —
        // each part file becomes one sidecar
        val scSchema = StructType(Seq(
          StructField("add", addSchema),
          StructField("remove", StructType(Seq(
            StructField("path", StringType))))))
        val scStaging =
          Files.createTempDirectory("delta_cp_sc_").resolve("out")
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            addRows.map(r => Row(r.get(2), null)), nSidecars),
          scSchema).write.parquet(scStaging.toString)
        val dir = logDir(root).resolve("_sidecars")
        Files.createDirectories(dir)
        val stream = Files.list(scStaging)
        val parts =
          try stream.iterator().asScala
            .filter(p => p.getFileName.toString.endsWith(".parquet") &&
              !p.getFileName.toString.startsWith("."))
            .toSeq.sortBy(_.getFileName.toString)
          finally stream.close() // fd hygiene, the DataStore convention
        parts.map { p =>
          val name = s"${java.util.UUID.randomUUID()}.parquet"
          Files.move(p, dir.resolve(name))
          name -> Files.size(dir.resolve(name))
        }
      }
    val baseRows = protoRow +: metaRow +:
      ((if (useSidecars) Nil else addRows) ++ txnRows ++ domainRows)
    val sidecarSchemaTop = StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))
    val cpSchemaFinal =
      if (!useSidecars) cpSchema
      else StructType(cpSchema.fields :+
        StructField("sidecar", sidecarSchemaTop))
    val rows =
      if (!v2Mode) baseRows
      else {
        val withMeta =
          baseRows.map(r => Row.fromSeq(r.toSeq :+ null)) :+
            Row(null, null, null, null, null, Row(v)) // checkpointMetadata
        if (!useSidecars) withMeta
        else withMeta.map(r => Row.fromSeq(r.toSeq :+ null)) ++
          sidecarInfos.map { case (name, size) =>
            Row(null, null, null, null, null, null,
              Row(name, size, System.currentTimeMillis))
          }
      }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cpSchemaFinal)
    val staging = Files.createTempDirectory("delta_cp_").resolve("out")
    df.coalesce(1).write.parquet(staging.toString)
    val cpStream = Files.list(staging)
    val part =
      try cpStream.iterator().asScala
        .find(p => p.getFileName.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("."))
        .getOrElse(throw new IllegalStateException(
          "checkpoint write produced no file"))
      finally cpStream.close()
    val dst = logDir(root).resolve(
      if (v2Mode)
        f"$v%020d.checkpoint.${java.util.UUID.randomUUID()}.parquet"
      else f"$v%020d.checkpoint.parquet")
    Files.move(part, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // size is the checkpoint's ACTION count — in v2 mode that includes
    // the checkpointMetadata row (and with sidecars, the add actions
    // living IN the sidecar files); derive from what was actually
    // written so a count-validating foreign reader never rejects it
    val hint =
      s"""{"version":$v,"size":${rows.length +
        (if (useSidecars) addRows.length else 0)}}"""
    Files.write(logDir(root).resolve("_last_checkpoint"), hint.getBytes(UTF_8))
    v
  }

  /** Add-count past which a v2 checkpoint fans out to sidecars
    * automatically (delta-spark's own order of magnitude). */
  private val SidecarAutoThreshold = 100000

  /** Minor LOG COMPACTION — delta-spark's `{start}.{end}.compacted.
    * json`: ONE file reconciling the actions of commits `[start,
    * end]` under replay semantics, which [[snapshot]] then reads in
    * place of the per-commit files (replay I/O between checkpoints
    * drops from O(commits) to O(compactions); a minutely-committed
    * table replays ~60× fewer files per planning pass with hourly
    * compactions). Reconciliation: the latest `protocol`/`metaData`
    * win; a later `add` of a path supersedes earlier ones; `remove`s
    * are KEPT (tombstones for paths added before the range — a
    * remove of a nonexistent path replays as a no-op) unless the
    * path was re-added later in the range; latest `txn` per app and
    * `domainMetadata` per domain; `commitInfo`/`cdc` drop (the CDF
    * and streaming paths read the per-commit files, which stay —
    * compaction is a pure read optimization, and metadata cleanup
    * stays checkpoint-keyed). Published atomically via putIfAbsent;
    * requires every commit in the range to be present. */
  def compactLog(root: String, start: Long, end: Long): Unit = {
    require(start >= 0 && end > start,
      s"delta-log compactLog: bad range [$start, $end]")
    val out = logDir(root).resolve(
      f"$start%020d.$end%020d.compacted.json")
    if (io(root).exists(out)) return // idempotent — already published
    val present = jsonVersions(root).toSet
    val missing = (start to end).filterNot(present)
    require(missing.isEmpty,
      s"delta-log compactLog: commit file(s) ${
        missing.take(5).mkString(", ")} missing from [$start, $end]")
    var protocol: Option[JsonNode] = None
    var metaData: Option[JsonNode] = None
    // the span's FINAL commitInfo is PRESERVED (first line, the ICT
    // placement rule): an ICT table's next commit reads its
    // predecessor's timestamp through it once the per-commit files
    // are retired ([[ictOf]]'s span fallback)
    var commitInfo: Option[JsonNode] = None
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]
    val removes =
      scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]
    val txns = scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]
    val domains =
      scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]
    (start to end).foreach { v =>
      io(root).readLines(commitPath(root, v))
        .iterator.filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          val name = n.fieldNames().next()
          val body = n.get(name)
          name match {
            case "protocol" => protocol = Some(body)
            case "metaData" => metaData = Some(body)
            case "commitInfo" => commitInfo = Some(body)
            case "add" =>
              val p = body.get("path").asText()
              adds(p) = body
              removes.remove(p)
            case "remove" =>
              val p = body.get("path").asText()
              adds.remove(p)
              removes(p) = body
            case "txn" =>
              val app = body.get("appId").asText()
              val keep = txns.get(app).forall(prev =>
                prev.get("version").asLong() <= body.get("version").asLong())
              if (keep) txns(app) = body
            case "domainMetadata" =>
              domains(body.get("domain").asText()) = body
            case _ => () // cdc: per-commit CDF reads keep their own files
          }
        }
    }
    def wrap(kind: String, body: JsonNode): String =
      mapper.writeValueAsString(
        mapper.createObjectNode().set[JsonNode](kind, body))
    val lines =
      commitInfo.map(wrap("commitInfo", _)).toSeq ++
        protocol.map(wrap("protocol", _)).toSeq ++
        metaData.map(wrap("metaData", _)).toSeq ++
        removes.values.map(wrap("remove", _)) ++
        adds.values.map(wrap("add", _)) ++
        txns.values.map(wrap("txn", _)) ++
        domains.values.map(wrap("domainMetadata", _))
    try io(root).putIfAbsent(out,
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    catch {
      case _: java.nio.file.FileAlreadyExistsException => () // idempotent
    }
  }

  /** Parse a Delta duration property value (`interval N unit[s]`, the
    * CalendarInterval subset delta-spark accepts for
    * `delta.logRetentionDuration` et al.) to milliseconds. */
  private[sources] def parseInterval(s: String): Long = {
    val m = "(?i)\\s*interval\\s+(\\d+)\\s+(week|day|hour|minute|second|millisecond)s?\\s*"
      .r.pattern.matcher(s)
    require(m.matches(),
      s"delta-log: cannot parse duration '$s' (expected 'interval N unit')")
    val n = m.group(1).toLong
    n * (m.group(2).toLowerCase match {
      case "week" => 7L * 24 * 3600 * 1000
      case "day" => 24L * 3600 * 1000
      case "hour" => 3600L * 1000
      case "minute" => 60L * 1000
      case "second" => 1000L
      case "millisecond" => 1L
    })
  }

  /** The authoritative timestamp of log version `v` for RETENTION
    * decisions: the commit's [[commitTimestamp]] when its JSON is
    * retained, the checkpoint file's mtime when only the checkpoint
    * survives (a previous sweep's boundary). */
  private def retentionTimestamp(root: String,
      configuration: Map[String, String], v: Long): Long =
    if (io(root).exists(commitPath(root, v)))
      commitTimestamp(root, configuration, v)
    else io(root).listDir(logDir(root))
      .filter(n => n.startsWith(f"$v%020d.checkpoint."))
      .map(n => io(root).mtimeMs(logDir(root).resolve(n)))
      .maxOption.getOrElse(Long.MaxValue)

  /** METADATA CLEANUP — delta-spark's `MetadataCleanup` shape: after
    * a [[checkpoint]], delete commit JSONs and checkpoint files that
    * are (a) older than `delta.logRetentionDuration` (default 30
    * days) by COMMIT timestamp (ICT-aware — [[commitTimestamp]]) and
    * (b) covered by a newer retained checkpoint, so every RETAINED
    * version stays reconstructible and every truncated one refuses
    * exactly like delta-spark (snapshot() of a version below the
    * horizon reports the missing commits; TIMESTAMP AS OF only
    * resolves over retained commits by construction). The boundary is
    * the NEWEST checkpoint whose own commit timestamp has passed
    * retention: everything strictly below it serves only expired
    * targets. v2 sidecar files under `_delta_log/_sidecars/` are NOT
    * swept (they may be shared by the retained checkpoint; delta-spark
    * keeps their cleanup separate too).
    *
    * `checkpointProtection` honored FOR REAL (the feature's one
    * writer obligation): when the table carries
    * `delta.requireCheckpointProtectionBeforeVersion` = V, the log
    * must never be truncated to a boundary BELOW V — a partial sweep
    * inside the protected range could strand a reader on a
    * checkpoint the protecting writer planned to supersede. Either
    * the whole range [0, V) is cleaned in ONE sweep (boundary >= V)
    * or nothing is deleted (refuse loudly).
    *
    * Scale posture: the `_delta_log` listing is the one unbounded
    * metadata-growth term on the write path — a year of minutely
    * commits is ~500k files whose LISTING alone dominates snapshot
    * construction; checkpoint + cleanup bounds the directory to
    * O(retention window). Driver-only metadata I/O, no data files
    * touched (that is [[vacuum]]'s job). Returns the number of log
    * files deleted. */
  def cleanupMetadata(spark: SparkSession, root: String,
      nowMs: Long = System.currentTimeMillis): Long = {
    val snap = snapshot(spark, root)
    gateWriterObligations(snap, "METADATA CLEANUP", removesData = false)
    val conf = snap.configuration
    val retainMs = parseInterval(conf.getOrElse(
      "delta.logRetentionDuration", "interval 30 days"))
    val cutoff = nowMs - retainMs
    val cps = checkpointVersions(root)
    // newest checkpoint whose version is itself expired — the sound
    // truncation boundary (every deleted file only serves targets
    // strictly below an expired, still-reconstructible version)
    cps.filter(v => retentionTimestamp(root, conf, v) <= cutoff)
      .maxOption.fold(0L) { boundary =>
        // deliberately BOTH `v < boundary` AND timestamp-expired: a
        // below-boundary commit JSON whose recorded timestamp
        // postdates the cutoff (clock skew, a backfilled file) is
        // LEFT BEHIND this pass — harmless, replay never starts below
        // the boundary checkpoint, and the stray file sweeps on a
        // later pass once its timestamp expires; not a partial-sweep
        // bug
        val doomedJson = jsonVersions(root).filter(v => v < boundary &&
          commitTimestamp(root, conf, v) <= cutoff)
        val doomedCp = cps.filter(v => v < boundary &&
          retentionTimestamp(root, conf, v) <= cutoff)
        if (doomedJson.isEmpty && doomedCp.isEmpty) 0L
        else {
          val protectedBefore = conf
            .get("delta.requireCheckpointProtectionBeforeVersion")
            .map(_.toLong).getOrElse(0L)
          if (boundary < protectedBefore)
            throw new UnsupportedOperationException(
              s"delta-log METADATA CLEANUP: the log of $root is " +
                s"checkpoint-protected below version $protectedBefore " +
                s"and the retention boundary is $boundary — truncating " +
                "INSIDE the protected range could strand readers on a " +
                "superseded checkpoint; clean the whole protected " +
                "range in one sweep (checkpoint at or past it first) " +
                "or raise the retention")
          val dir = logDir(root)
          var n = 0L
          doomedJson.foreach { v =>
            io(root).delete(commitPath(root, v)); n += 1
          }
          val doomedSet = doomedCp.toSet
          io(root).listDir(dir)
            .filter(name => name.contains(".checkpoint.") &&
              name.take(20).forall(_.isDigit) &&
              doomedSet.contains(name.take(20).toLong))
            .foreach { name =>
              io(root).delete(dir.resolve(name)); n += 1
            }
          // compacted spans wholly below the boundary can never be
          // consulted again (replay starts at a retained checkpoint)
          // — sweeping them is what keeps the listing bounded under
          // minutely-commit + hourly-compaction regimes
          listLog(root).spans.foreach { case (s, es) =>
            es.filter(_ < boundary).foreach { e =>
              io(root).delete(dir.resolve(
                f"$s%020d.$e%020d.compacted.json")); n += 1
            }
          }
          n
        }
      }
  }
}
