package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Iceberg FORMAT-VERSION 3: metadata superset parsing, Puffin
  * deletion-vector replay through the MOR scan rewrite, the DV DELETE
  * writer (merge + manifest rewrite), additive writes with
  * inheritance-assigned row lineage, the `_row_id` read surface,
  * compaction + COW UPDATE/MERGE with MATERIALIZED lineage,
  * replace-all OVERWRITE with fresh inheritance ids, DEFAULT VALUES
  * (snapshot-history dating, expired-gap refusal), timestamp_ns +
  * variant reads, changes() derivation from DV diffs, NESTED
  * struct-member defaults (read fill + the dotted ADD COLUMN writer),
  * and the refusal gates (list/map-nested or undatable defaults,
  * encryption, parquet position deletes, duplicate DVs, v4+). */
class IcebergV3Spec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("iceberg_v3_").toString

  private def metaJson(root: String): String = new String(
    Files.readAllBytes(Paths.get(root,
      s"metadata/v${IcebergMeta.latestMetadataVersion(root)}.metadata.json")),
    UTF_8)

  test("v3 fixture round-trips; DV delete hides rows; merge keeps one DV per file") {
    val root = tmp()
    val df = spark.range(0, 60).toDF("k")
      .withColumn("v", col("k") * 10)
      .repartitionByRange(3, col("k"))
    val snap0 = IcebergMeta.writeFixture(df, root, formatVersion = 3)
    assert(metaJson(root).contains("\"next-row-id\""))
    assert(spark.read.format("iceberg-meta").load(root).count() === 60)

    // first DELETE → a puffin DV, not a parquet position delete
    IcebergMeta.delete(spark, root, col("k") % 10 === 3)
    val s1 = IcebergMeta.snapshot(root)
    assert(s1.deletes.isEmpty && s1.eqDeletes.isEmpty)
    assert(s1.dvs.nonEmpty)
    assert(s1.dvs.forall(_.puffinPath.endsWith(".puffin")))
    val r1 = spark.read.format("iceberg-meta").load(root)
    assert(r1.count() === 54)
    assert(r1.filter(col("k") % 10 === 3).count() === 0)

    // second DELETE touching the same files MERGES per file: replay
    // still sees at most one DV per data file (the spec obligation)
    IcebergMeta.delete(spark, root, col("k") % 10 === 7)
    val s2 = IcebergMeta.snapshot(root)
    assert(s2.dvs.groupBy(_.referencedDataFile).forall(_._2.size == 1))
    val r2 = spark.read.format("iceberg-meta").load(root)
    assert(r2.count() === 48)
    assert(r2.agg(sum("v")).as[Long].head() ===
      (0 until 60).filter(k => k % 10 != 3 && k % 10 != 7)
        .map(_ * 10L).sum)

    // prior snapshots stay exact through the rewritten manifests
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", snap0).load(root).count() === 60)
    val mid = IcebergMeta.snapshotLog(root).map(_.snapshotId)(1)
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", mid).load(root).count() === 54)

    // the new snapshots carry first-row-id (no rows added → the
    // table's next-row-id, unchanged)
    assert(metaJson(root).contains("\"first-row-id\""))
  }

  test("v3 partitioned table: DV entries restate the target file's tuple") {
    val root = tmp()
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "b"))
      .toDF("k", "p")
    IcebergMeta.writeFixture(df, root, partitionBy = Seq("p"),
      formatVersion = 3)
    IcebergMeta.delete(spark, root, col("k") === 3 || col("k") === 1)
    val s = IcebergMeta.snapshot(root)
    assert(s.dvs.size === 2) // one per touched file (one per partition)
    assert(s.dvs.forall(_.partitionTuple.map(_._1) == Seq("p")))
    val r = spark.read.format("iceberg-meta").load(root)
    assert(r.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((2L, "a"), (4L, "b"), (5L, "b")))
  }

  test("iceberg_changes derives exact per-commit deltas from DV diffs") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").coalesce(1), root, formatVersion = 3)
    IcebergMeta.delete(spark, root, col("k") < 2)
    IcebergMeta.delete(spark, root, col("k") === 5) // merges into same DV
    val ch = IcebergMeta.changes(spark, root, afterSeq = 1L, toSeq = 3L)
      .orderBy("_commit_seq", "k")
      .select("k", "_change_type", "_commit_seq")
      .as[(Long, String, Long)].collect().toSeq
    // commit 2 deleted {0,1}; commit 3 deleted exactly {5} (the DV
    // replaced the old one, but only the diff is a change)
    assert(ch === Seq((0L, "delete", 2L), (1L, "delete", 2L),
      (5L, "delete", 3L)))
  }

  test("hand-written foreign v3 tree: DV + row-lineage fields read exactly") {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val root = tmp()
    val dataDir = Paths.get(root, "data")
    // one data file, k = 0..9, one row group
    spark.range(0, 10).toDF("k").coalesce(1).write.parquet(dataDir.toString)
    import scala.jdk.CollectionConverters._
    val part = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted.head
      finally s.close()
    }
    // DV hiding positions 2, 3, 7 — written with real Puffin framing
    val Seq(blob) = Puffin.writeDvFile(Paths.get(root, "data/dv.puffin"),
      snapshotId = 7L, sequenceNumber = 2L,
      Seq(s"data/$part" -> Array(2L, 3L, 7L)))
    Files.createDirectories(Paths.get(root, "metadata"))
    def writeAvro(path: String, schema: org.apache.avro.Schema,
        rows: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, Paths.get(root, path).toFile)
      rows.foreach(w.append)
      w.close()
    }
    // data manifest: carries the v3 first_row_id field (must be
    // tolerated and ignored on read)
    val dataManifest = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"first_row_id","type":["null","long"],"default":null}
        |]}}]}""".stripMargin)
    val de = new GenericData.Record(dataManifest)
    de.put("status", 1)
    de.put("sequence_number", java.lang.Long.valueOf(1L))
    val dd = new GenericData.Record(
      dataManifest.getField("data_file").schema())
    dd.put("content", 0)
    dd.put("file_path", s"data/$part")
    dd.put("file_format", "PARQUET")
    dd.put("record_count", 10L)
    dd.put("file_size_in_bytes", Files.size(dataDir.resolve(part)))
    dd.put("first_row_id", java.lang.Long.valueOf(0L))
    de.put("data_file", dd)
    writeAvro("metadata/m0.avro", dataManifest, Seq(de))
    // delete manifest: the v3 DV addressing triple
    val delManifest = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"referenced_data_file","type":["null","string"],"default":null},
        |  {"name":"content_offset","type":["null","long"],"default":null},
        |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}
        |]}}]}""".stripMargin)
    val ve = new GenericData.Record(delManifest)
    ve.put("status", 1)
    ve.put("sequence_number", java.lang.Long.valueOf(2L))
    val vd = new GenericData.Record(
      delManifest.getField("data_file").schema())
    vd.put("content", 1)
    vd.put("file_path", "data/dv.puffin")
    vd.put("file_format", "PUFFIN")
    vd.put("record_count", 3L)
    vd.put("file_size_in_bytes",
      Files.size(Paths.get(root, "data/dv.puffin")))
    vd.put("referenced_data_file", s"data/$part")
    vd.put("content_offset", java.lang.Long.valueOf(blob.offset))
    vd.put("content_size_in_bytes", java.lang.Long.valueOf(blob.length))
    ve.put("data_file", vd)
    writeAvro("metadata/m1.avro", delManifest, Seq(ve))
    // manifest list with v3 first_row_id on the data row
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"sequence_number","type":"long"},
        |{"name":"first_row_id","type":["null","long"],"default":null}
        |]}""".stripMargin)
    def listRow(p: String, content: Int, seq: Long,
        firstRowId: Option[Long]): GenericRecord = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", Files.size(Paths.get(root, p)))
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", seq)
      firstRowId.foreach(v => r.put("first_row_id", java.lang.Long.valueOf(v)))
      r
    }
    writeAvro("metadata/snap.avro", listSchema, Seq(
      listRow("metadata/m0.avro", 0, 1L, Some(0L)),
      listRow("metadata/m1.avro", 1, 2L, None)))
    Files.write(Paths.get(root, "metadata/v1.metadata.json"),
      s"""{"format-version":3,"table-uuid":"t","location":"$root",
         |"last-sequence-number":2,"next-row-id":10,
         |"current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"k","required":false,"type":"long",
         |   "write-default":0}]}],
         |"current-snapshot-id":7,
         |"snapshots":[{"snapshot-id":7,"sequence-number":2,
         |  "first-row-id":10,
         |  "manifest-list":"metadata/snap.avro",
         |  "timestamp-ms":1,"summary":{"operation":"delete"}}]}"""
        .stripMargin.getBytes(UTF_8))
    Files.write(Paths.get(root, "metadata/version-hint.text"),
      "1".getBytes(UTF_8))
    val r = spark.read.format("iceberg-meta").load(root)
    assert(r.orderBy("k").as[Long].collect().toSeq ===
      Seq(0L, 1L, 4L, 5L, 6L, 8L, 9L))
  }

  test("v3 append/upsert assign row lineage; equality deletes compose") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("v", col("k"))
        .coalesce(1), root, formatVersion = 3)
    assert(metaJson(root).contains("\"next-row-id\":10"))
    // append: snapshot first-row-id = old next-row-id; mark moves
    IcebergMeta.append(
      spark.range(10, 16).toDF("k").withColumn("v", col("k"))
        .coalesce(1), root)
    val m1 = metaJson(root)
    assert(m1.contains("\"next-row-id\" : 16") ||
      m1.contains("\"next-row-id\":16"), m1.take(400))
    assert(m1.contains("\"first-row-id\" : 10") ||
      m1.contains("\"first-row-id\":10"))
    assert(spark.read.format("iceberg-meta").load(root).count() === 16)
    // equality delete: no rows added, mark unchanged
    IcebergMeta.deleteEquality(spark, root, Seq(3L, 12L).toDF("k"))
    assert(spark.read.format("iceberg-meta").load(root).count() === 14)
    // upsert: replaces k=5, inserts k=100 — mark moves by the SOURCE
    // row count (new images are new rows; old images hide via eq
    // delete, their ids retire with them)
    IcebergMeta.upsertKeyed(spark, root,
      Seq((5L, 555L), (100L, 1L)).toDF("k", "v"), "k")
    val m2 = metaJson(root)
    assert(m2.contains("\"next-row-id\" : 18") ||
      m2.contains("\"next-row-id\":18"))
    val r = spark.read.format("iceberg-meta").load(root)
    assert(r.count() === 15)
    assert(r.filter(col("k") === 5).select("v").as[Long].head() === 555L)
    // DV delete on an equality-carrying table keeps the documented
    // mixed-kind refusal (same rule as v2 positional deletes)
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.delete(spark, root, col("k") === 11)
    }
    assert(e.getMessage.contains("EQUALITY"))
    // the _row_id read APPLIES the equality deletes (file-seq-gated
    // anti-join): retired images' ids are gone, upserted images carry
    // the fresh ids the mark moved for
    val ids = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids.keySet === ((0L until 16L).toSet -- Set(3L, 12L)) + 100L)
    assert(Set(ids(5L), ids(100L)) === Set(16L, 17L))
    assert(ids(4L) === 4L && ids(15L) === 15L)
    // compaction CLEARS the equality deletes and preserves the ids
    IcebergMeta.compact(spark, root)
    val s2 = IcebergMeta.snapshot(root)
    assert(s2.eqDeletes.isEmpty && s2.files.size === 1)
    assert(IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap === ids)
  }

  test("v3 compaction preserves row lineage via materialized columns") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").coalesce(1).orderBy("k"), root,
      formatVersion = 3)
    IcebergMeta.append(
      spark.range(100, 104).toDF("k").coalesce(1).orderBy("k"), root)
    IcebergMeta.delete(spark, root, col("k") % 4 === 1) // DV
    val before = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id", "_last_updated_sequence_number")
      .as[(Long, Long, Long)].collect().toSet
    IcebergMeta.compact(spark, root)
    val snap = IcebergMeta.snapshot(root)
    assert(snap.files.size === 1 && snap.dvs.isEmpty)
    // every surviving row keeps BOTH its id and its seq, through the
    // materialized columns the rewritten file now carries
    val after = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id", "_last_updated_sequence_number")
      .as[(Long, Long, Long)].collect().toSet
    assert(after === before)
    // the plain read does NOT surface the lineage columns
    assert(spark.read.format("iceberg-meta").load(root)
      .columns.toSeq === Seq("k"))
    // life continues: another append inherits fresh ids; its rows and
    // the materialized rows coexist under one read
    IcebergMeta.append(
      spark.range(200, 202).toDF("k").coalesce(1).orderBy("k"), root)
    val ids = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids(200L) === 14L && ids(201L) === 15L)
    assert(ids(0L) === 0L && ids(103L) === 13L)
  }

  test("v3 UPDATE and MERGE keep _row_id, restamp seq, mint insert ids") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 8).toDF("k").withColumn("v", col("k") * 10)
        .coalesce(1).orderBy("k"), root, formatVersion = 3)
    val parse = spark.sessionState.sqlParser.parseExpression _
    IcebergMeta.updateWhere(spark, root,
      Seq("v" -> parse("v + 1000")), Some(parse("k % 3 = 1")))
    val rows = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "v", "_row_id", "_last_updated_sequence_number")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // values updated where hit; EVERY row keeps _row_id == k (the
    // sorted single-file layout); only hit rows carry the new seq
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      (0L until 8L).map(k => (k, if (k % 3 == 1) k * 10 + 1000 else k * 10)))
    assert(rows.forall(r => r._3 == r._1))
    assert(rows.forall(r =>
      r._4 == (if (r._1 % 3 == 1) 2L else 1L)), rows.mkString(","))
    // a second update composes on the materialized lineage
    IcebergMeta.updateWhere(spark, root,
      Seq("v" -> parse("0")), Some(parse("k = 7")))
    val r7 = IcebergMetaRead.readWithRowIds(spark, root)
      .filter(col("k") === 7)
      .select("v", "_row_id", "_last_updated_sequence_number")
      .as[(Long, Long, Long)].head()
    assert(r7 === ((0L, 7L, 3L)))
    // MERGE threads lineage through the tagged cascade: update keeps
    // id + restamps seq, delete retires the id, insert mints fresh
    // ids from next-row-id and the mark moves with them
    import graft.sources.VersionedTable.{MergeDelete, MergeInsert,
      MergeRef, MergeUpdate}
    IcebergMeta.mergeConditional(spark, root,
      Seq((2L, 222L), (4L, 444L), (100L, 1L)).toDF("k", "v"), "k", "k",
      matched = Seq(
        MergeUpdate(Some(col("__s_v") === 222L),
          Map("v" -> MergeRef.source("v"))),
        MergeDelete(None)), // k=4 deletes
      notMatched = Seq(MergeInsert(None,
        Map("k" -> MergeRef.source("k"), "v" -> MergeRef.source("v")))),
      bySource = Nil)
    val m = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "v", "_row_id", "_last_updated_sequence_number")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!m.contains(4L))
    assert(m(2L) === ((2L, 222L, 2L, 4L))) // kept id 2, new seq 4
    assert(m(0L)._3 === 0L && m(0L)._4 === 1L) // untouched rows as-was
    assert(m(100L)._2 === 1L && m(100L)._3 === 8L && m(100L)._4 === 4L)
    assert(metaJson(root).contains("\"next-row-id\" : 9") ||
      metaJson(root).contains("\"next-row-id\":9"))
  }

  test("v3 gates: nested/undatable defaults, encryption, pos deletes") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 4).toDF("k").coalesce(1), root, formatVersion = 3)

    def patchMeta(f: String => String): Unit = {
      val p = Paths.get(root,
        s"metadata/v${IcebergMeta.latestMetadataVersion(root)}.metadata.json")
      val orig = new String(Files.readAllBytes(p), UTF_8)
      Files.write(p, f(orig).getBytes(UTF_8))
    }

    // a TOP-LEVEL initial-default no longer refuses — it resolves
    // (here the field is in every snapshot's schema, so no file
    // predates it and stored values win everywhere)
    patchMeta(_.replace(""""name":"k"""",
      """"name":"k","initial-default":42"""))
    assert(spark.read.format("iceberg-meta").load(root).count() === 4)
    patchMeta(_.replace(""","initial-default":42""", ""))

    // a NESTED initial-default RESOLVES (round 13): the replay dates
    // it like a top-level one and records its struct path — here the
    // field's schema is every snapshot's schema, so no live file
    // predates it and no fill branch plans
    patchMeta(_.replace("""}]}],""",
      """},{"id":9,"name":"s","required":false,"type":{"type":"struct",""" +
        """"fields":[{"id":10,"name":"c","required":false,""" +
        """"type":"int","initial-default":5}]}}]}],"""))
    val snapNested = IcebergMeta.snapshot(root)
    assert(snapNested.defaults.map(d => (d.name, d.segments)) ===
      Seq(("s.c", Seq("s", "c"))))
    assert(!snapNested.needsDefaultFill)
    assert(spark.read.format("iceberg-meta").load(root).count() === 4)
    patchMeta(_.replace(
      """},{"id":9,"name":"s","required":false,"type":{"type":"struct",""" +
        """"fields":[{"id":10,"name":"c","required":false,""" +
        """"type":"int","initial-default":5}]}}]}],""", """}]}],"""))

    // a default that cannot be DATED (a snapshot without schema-id)
    // refuses rather than guessing which files predate the field
    patchMeta(_
      .replace(""""name":"k"""", """"name":"k","initial-default":42""")
      .replace(""","schema-id":0}]}""", """}]}"""))
    val e2 = intercept[IllegalArgumentException] {
      IcebergMeta.snapshot(root)
    }
    assert(e2.getMessage.contains("schema-id"))
    patchMeta(_
      .replace(""","initial-default":42""", "")
      .replace(""""summary":{"operation":"append"}}""",
        """"summary":{"operation":"append"},"schema-id":0}"""))

    // encryption refuses
    patchMeta(_.replace(""""current-schema-id":0""",
      """"encryption-keys":[{"key-id":"x"}],"current-schema-id":0"""))
    val e3 = intercept[IllegalArgumentException] {
      IcebergMeta.snapshot(root)
    }
    assert(e3.getMessage.contains("encryption"))
    patchMeta(_.replace(
      """"encryption-keys":[{"key-id":"x"}],""", ""))

    // sanity: the patched document is healthy again
    assert(spark.read.format("iceberg-meta").load(root).count() === 4)
  }

  test("v3 initial-default: pre-evolution files read the default") {
    import org.apache.spark.sql.types.StringType
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").coalesce(1).orderBy("k"), root,
      formatVersion = 3)
    val snap0 = IcebergMeta.snapshot(root).snapshotId
    IcebergMeta.addColumnWithDefault(root, "lang", StringType, "en")
    // every existing row reads the default through the fill branch
    val r1 = spark.read.format("iceberg-meta").load(root)
    assert(r1.columns.toSeq === Seq("k", "lang"))
    assert(r1.filter(col("lang") === "en").count() === 6)
    // append with explicit values INCLUDING a stored NULL: stored
    // values win — the null is a value, not a missing column
    IcebergMeta.append(
      Seq((10L, "fr"), (11L, null)).toDF("k", "lang").coalesce(1), root)
    val m2 = spark.read.format("iceberg-meta").load(root)
      .select("k", "lang").as[(Long, Option[String])].collect().toMap
    assert(m2(0L) === Some("en") && m2(10L) === Some("fr") &&
      m2(11L) === None)
    // a DV delete composes with the fill (delete targets an OLD file)
    IcebergMeta.delete(spark, root, col("k") === 1)
    val r3 = spark.read.format("iceberg-meta").load(root)
    assert(r3.count() === 7)
    assert(r3.filter(col("k") === 2).select("lang").as[String].head()
      === "en")
    // the row-id read composes too: old rows keep inherited ids AND
    // read the default; appended rows continue past next-row-id
    val ids = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id", "lang")
      .as[(Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ids(0L) === ((0L, Some("en"))))
    assert(ids(10L) === ((6L, Some("fr"))))
    // time travel to the pre-evolution snapshot reads through the
    // CURRENT schema (this reader's posture): defaults everywhere
    val tt = spark.read.format("iceberg-meta")
      .option("snapshotId", snap0).load(root)
    assert(tt.count() === 6 && tt.filter(col("lang") === "en").count() === 6)
    // compaction MATERIALIZES the default into rewritten files — the
    // fill branch disappears, values stay
    IcebergMeta.compact(spark, root)
    assert(!IcebergMeta.snapshot(root).needsDefaultFill)
    val m4 = spark.read.format("iceberg-meta").load(root)
      .select("k", "lang").as[(Long, Option[String])].collect().toMap
    assert(m4(0L) === Some("en") && m4(11L) === None && !m4.contains(1L))
  }

  test("hand-written foreign v3 tree with an evolved default column") {
    val root = tmp()
    val dataDir = Paths.get(root, "data")
    // file A written at seq 1 under schema 0 (k only); file B at
    // seq 2 under schema 1 (k + lang, REQUIRED with default "xx")
    spark.range(0, 3).toDF("k").coalesce(1)
      .write.parquet(dataDir.resolve("a").toString)
    Seq((10L, "fr"), (11L, "de")).toDF("k", "lang").coalesce(1)
      .write.parquet(dataDir.resolve("b").toString)
    import scala.jdk.CollectionConverters._
    def partOf(dir: String): String = {
      val s = Files.list(dataDir.resolve(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted.head
      finally s.close()
    }
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    Files.createDirectories(Paths.get(root, "metadata"))
    val manifest = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin)
    def entry(rel: String, seq: Long, records: Long): GenericRecord = {
      val e = new GenericData.Record(manifest)
      e.put("status", 1)
      e.put("sequence_number", java.lang.Long.valueOf(seq))
      val d = new GenericData.Record(
        manifest.getField("data_file").schema())
      d.put("content", 0)
      d.put("file_path", rel)
      d.put("file_format", "PARQUET")
      d.put("record_count", records)
      d.put("file_size_in_bytes", Files.size(Paths.get(root, rel)))
      e.put("data_file", d)
      e
    }
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](manifest))
    w.create(manifest, Paths.get(root, "metadata/m0.avro").toFile)
    w.append(entry(s"data/a/${partOf("a")}", 1L, 3L))
    w.append(entry(s"data/b/${partOf("b")}", 2L, 2L))
    w.close()
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"sequence_number","type":"long"}
        |]}""".stripMargin)
    val lw = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, Paths.get(root, "metadata/snap.avro").toFile)
    val lr = new GenericData.Record(listSchema)
    lr.put("manifest_path", "metadata/m0.avro")
    lr.put("manifest_length",
      Files.size(Paths.get(root, "metadata/m0.avro")))
    lr.put("partition_spec_id", 0)
    lr.put("content", 0)
    lr.put("sequence_number", 2L)
    lw.append(lr)
    lw.close()
    Files.write(Paths.get(root, "metadata/v1.metadata.json"),
      s"""{"format-version":3,"table-uuid":"t","location":"$root",
         |"last-sequence-number":2,"last-column-id":2,
         |"current-schema-id":1,
         |"schemas":[
         |  {"type":"struct","schema-id":0,"fields":[
         |    {"id":1,"name":"k","required":false,"type":"long"}]},
         |  {"type":"struct","schema-id":1,"fields":[
         |    {"id":1,"name":"k","required":false,"type":"long"},
         |    {"id":2,"name":"lang","required":true,"type":"string",
         |     "initial-default":"xx","write-default":"xx"}]}],
         |"current-snapshot-id":8,
         |"snapshots":[
         |  {"snapshot-id":7,"sequence-number":1,"schema-id":0,
         |   "manifest-list":"metadata/snap.avro","timestamp-ms":1,
         |   "summary":{"operation":"append"}},
         |  {"snapshot-id":8,"sequence-number":2,"schema-id":1,
         |   "parent-snapshot-id":7,
         |   "manifest-list":"metadata/snap.avro","timestamp-ms":2,
         |   "summary":{"operation":"append"}}]}"""
        .stripMargin.getBytes(UTF_8))
    Files.write(Paths.get(root, "metadata/version-hint.text"),
      "1".getBytes(UTF_8))
    val snap = IcebergMeta.snapshot(root)
    assert(snap.defaults.map(d => (d.name, d.value, d.firstSeq)) ===
      Seq(("lang", "xx", 2L)))
    assert(snap.needsDefaultFill)
    val got = spark.read.format("iceberg-meta").load(root)
      .select("k", "lang").as[(Long, String)].collect().toMap
    assert(got === Map(0L -> "xx", 1L -> "xx", 2L -> "xx",
      10L -> "fr", 11L -> "de"))
    // without the extensions the raw listing must refuse, not
    // null-fill — exercised via the gate directly
    val e = intercept[IllegalStateException] {
      new IcebergMetaFileIndex(spark, snap, pinned = true)
        .listFiles(Nil, Nil)
    }
    assert(e.getMessage.contains("default-valued"))
  }

  test("_row_id read surface: inheritance, DV stability, append continuation") {
    val root = tmp()
    // one sorted file: physical position == k, so _row_id == k
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").coalesce(1).orderBy("k"), root,
      formatVersion = 3)
    def ids(): Map[Long, Long] =
      IcebergMetaRead.readWithRowIds(spark, root)
        .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids() === (0L until 10L).map(k => k -> k).toMap)
    // DV delete: survivors KEEP their row ids (positions are stable)
    IcebergMeta.delete(spark, root, col("k") % 3 === 0)
    val afterDv = ids()
    assert(afterDv === (0L until 10L).filter(_ % 3 != 0)
      .map(k => k -> k).toMap)
    // append: new file's ids continue from next-row-id by inheritance
    IcebergMeta.append(
      spark.range(100, 103).toDF("k").coalesce(1).orderBy("k"), root)
    val afterAppend = ids()
    assert(afterAppend(100L) === 10L && afterAppend(102L) === 12L)
    assert(afterAppend(5L) === 5L)
    // seq surface: the appended rows carry the appending commit's seq
    val seqs = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_last_updated_sequence_number")
      .as[(Long, Long)].collect().toMap
    assert(seqs(100L) === 3L && seqs(5L) === 1L)
    // SQL surface
    assert(spark.sql(s"SELECT sum(_row_id) FROM iceberg_row_ids('$root')")
      .as[Long].head() ===
      afterAppend.values.sum)
    // a v2 table has no lineage to read
    val v2root = tmp()
    IcebergMeta.writeFixture(spark.range(0, 4).toDF("k"), v2root)
    assert(intercept[IllegalArgumentException] {
      IcebergMetaRead.readWithRowIds(spark, v2root)
    }.getMessage.contains("row lineage"))
  }

  test("v3 replace-all OVERWRITE mints fresh inheritance ids") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").coalesce(1).orderBy("k"), root,
      formatVersion = 3)
    IcebergMeta.delete(spark, root, col("k") === 2) // a DV to retire
    val preSnap = IcebergMeta.snapshot(root).snapshotId
    // plain OVERWRITE through the datasource — no lineage threading
    spark.range(100, 104).toDF("k").coalesce(1).orderBy("k")
      .write.format("iceberg-meta").mode("overwrite").save(root)
    val snap = IcebergMeta.snapshot(root)
    assert(snap.dvs.isEmpty && snap.deletes.isEmpty)
    // ids restart PAST the pre-overwrite mark (6 rows were minted
    // before): fresh inheritance ids 6..9, mark moves to 10
    val ids = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids === Map(100L -> 6L, 101L -> 7L, 102L -> 8L, 103L -> 9L))
    val m = metaJson(root)
    assert(m.contains("\"next-row-id\" : 10") ||
      m.contains("\"next-row-id\":10"))
    // time travel to the pre-overwrite snapshot: old rows, old ids
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", preSnap).load(root)
      .orderBy("k").as[Long].collect().toSeq ===
      Seq(0L, 1L, 3L, 4L, 5L))
    // appends continue past the moved mark
    IcebergMeta.append(
      spark.range(500, 502).toDF("k").coalesce(1).orderBy("k"), root)
    val ids2 = IcebergMetaRead.readWithRowIds(spark, root)
      .select("k", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids2(500L) === 10L && ids2(501L) === 11L)
    // a TARGETED un-threaded rewrite still refuses (there are now two
    // files: one would survive, and its lineage would be lost)
    val one = IcebergMeta.snapshot(root).files.head.recordedPath
    val e = intercept[UnsupportedOperationException] {
      IcebergMeta.replaceFiles(spark, root, Set(one),
        spark.range(0, 2).toDF("k"))
    }
    assert(e.getMessage.contains("row lineage"))
  }

  test("v3 timestamp_ns reads as epoch-nano longs; bounds prune exactly") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 64).toDF("k")
        .withColumn("ts", col("k") * 1000000000L + 123456789L)
        .repartitionByRange(4, col("k")), root, formatVersion = 3)
    // flip the declared type to the v3 nanosecond timestamp — the
    // shape a foreign ns-precision writer publishes (the parquet
    // long payload IS the spec's storage: epoch nanos)
    val p = Paths.get(root,
      s"metadata/v${IcebergMeta.latestMetadataVersion(root)}.metadata.json")
    Files.write(p, new String(Files.readAllBytes(p), UTF_8)
      .replace(""""name":"ts","required":true,"type":"long"""",
        """"name":"ts","required":true,"type":"timestamp_ns"""")
      .getBytes(UTF_8))
    val snap = IcebergMeta.snapshot(root)
    assert(snap.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    val r = spark.read.format("iceberg-meta").load(root)
    assert(r.agg(sum("ts")).as[Long].head() ===
      (0 until 64).map(k => k * 1000000000L + 123456789L).sum)
    // the manifest's 8-byte ns bounds prune files for long predicates
    val q = spark.read.format("iceberg-meta").load(root)
      .filter(col("ts") >= 20L * 1000000000L &&
        col("ts") <= 25L * 1000000000L + 999999999L)
    assert(q.count() === 6)
    val idx = q.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          r: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        r.location.asInstanceOf[IcebergMetaFileIndex]
    }.head
    val (kept, total) = idx.lastListing.get
    assert(total === 4 && kept === 1, s"expected 1/4 files, got $kept/$total")
  }

  test("v3 variant round-trips unshredded through Spark's VariantType") {
    val root = tmp()
    val df = spark.range(0, 8).toDF("k")
      .withColumn("doc", parse_json(
        concat(lit("""{"id":"""), col("k"),
          lit(""","tag":"t"""), col("k") % 2, lit(""""}"""))))
      .coalesce(1)
    IcebergMeta.writeFixture(df, root, formatVersion = 3)
    assert(metaJson(root).contains("\"type\":\"variant\""))
    val snap = IcebergMeta.snapshot(root)
    assert(snap.schema("doc").dataType ===
      org.apache.spark.sql.types.VariantType)
    val back = spark.read.format("iceberg-meta").load(root)
      .select(col("k"), to_json(col("doc")).as("j"))
      .as[(Long, String)].collect().toMap
    assert(back(3L) === """{"id":3,"tag":"t1"}""")
    assert(back.size === 8)
    // variant fields project through variant_get like any Spark read
    assert(spark.read.format("iceberg-meta").load(root)
      .selectExpr("sum(variant_get(doc, '$.id', 'long'))")
      .as[Long].head() === (0 until 8).sum)
    // a v2 fixture refuses variant columns (spec: v3 type)
    assert(intercept[IllegalArgumentException] {
      IcebergMeta.writeFixture(df, tmp(), formatVersion = 2)
    }.getMessage.contains("variant"))
  }

  test("v3 SHREDDED variant reads identical to its unshredded twin") {
    // the same frame written twice: once unshredded, once SHREDDED
    // (typed_value subcolumns per the parquet variant shredding spec
    // — produced by Spark's own shredding writer, the spec's
    // reference implementation); rows 0,2,4 carry an extra field the
    // shredding schema does not cover, so their residual rides the
    // `value` column and reassembly must merge both
    def frame() = spark.range(0, 6).toDF("k")
      .withColumn("v", parse_json(concat(
        lit("""{"a":"""), col("k"), lit(""","b":"s"""), col("k"),
        lit("\""),
        when(col("k") % 2 === 0, lit(""","extra":[1,2]"""))
          .otherwise(lit("")),
        lit("}")))).coalesce(1)
    val rootU = tmp()
    IcebergMeta.writeFixture(frame(), rootU, formatVersion = 3)
    val rootS = tmp()
    val shredConfs = Seq(
      "spark.sql.variant.writeShredding.enabled" -> "true",
      "spark.sql.variant.forceShreddingSchemaForTest" ->
        "a bigint, b string")
    shredConfs.foreach { case (c, v) => spark.conf.set(c, v) }
    try IcebergMeta.writeFixture(frame(), rootS, formatVersion = 3)
    finally shredConfs.foreach { case (c, _) => spark.conf.unset(c) }
    // the staged file IS shredded: its footer carries typed_value
    import scala.jdk.CollectionConverters._
    val dataFile = {
      val s = Files.list(Paths.get(rootS, "data"))
      try s.iterator().asScala.map(_.toString)
        .find(n => n.endsWith(".parquet")).get
      finally s.close()
    }
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(new java.io.File(dataFile).toURI),
        new org.apache.hadoop.conf.Configuration()))
    val vGroup =
      try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
        .find(_.getName == "v").get.asGroupType()
      finally reader.close()
    assert(vGroup.getFields.asScala.map(_.getName).toSet
      .contains("typed_value"),
      s"fixture is not shredded: $vGroup")
    // both tables read IDENTICALLY — values (residual merged back),
    // projections through the shredded column, and counts
    def rows(root: String): Map[Long, String] =
      spark.read.format("iceberg-meta").load(root)
        .select(col("k"), to_json(col("v")).as("j"))
        .as[(Long, String)].collect().toMap
    assert(rows(rootS) === rows(rootU))
    assert(rows(rootS)(2L).contains("\"extra\":[1,2]"))
    assert(spark.read.format("iceberg-meta").load(rootS)
      .selectExpr("sum(variant_get(v, '$.a', 'long'))")
      .as[Long].head() === (0 until 6).sum)
  }

  test("v3 refuses a parquet position delete file loudly") {
    // build a v2 table with a real positional delete, then flip the
    // document to v3: the reader must refuse rather than apply
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").coalesce(1), root)
    IcebergMeta.delete(spark, root, col("k") === 2)
    val p = Paths.get(root,
      s"metadata/v${IcebergMeta.latestMetadataVersion(root)}.metadata.json")
    Files.write(p, new String(Files.readAllBytes(p), UTF_8)
      .replace("\"format-version\":2", "\"format-version\":3")
      .replace("\"format-version\" : 2", "\"format-version\" : 3")
      .getBytes(UTF_8))
    val e = intercept[UnsupportedOperationException] {
      IcebergMeta.snapshot(root)
    }
    assert(e.getMessage.contains("position delete"))
  }

  test("default dating falls back to footers when history was expired") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 4).toDF("k").coalesce(1), root, formatVersion = 3)
    IcebergMeta.addColumnWithDefault(root, "lang",
      org.apache.spark.sql.types.StringType, "en")
    // a post-evolution file STORING explicit NULLs (the case a naive
    // seq rule would corrupt once its snapshot expires)
    IcebergMeta.append(
      Seq((10L, "fr"), (11L, null)).toDF("k", "lang").coalesce(1), root)
    IcebergMeta.append(
      Seq((20L, "de")).toDF("k", "lang").coalesce(1), root)
    // expire everything but the head: BOTH older files' snapshots are
    // gone — their dating is ambiguous, so the replay resolves each
    // from its own parquet footer (the spec's field-presence rule):
    // the pre-evolution file (no lang column) reads the default, the
    // post-evolution file keeps its stored values, NULL included
    IcebergMeta.expireSnapshots(root,
      olderThanMs = System.currentTimeMillis() + 100000L, retainLast = 1)
    val snap = IcebergMeta.snapshot(root)
    assert(snap.files.count(_.footerColumns.isDefined) === 2)
    val got = spark.read.format("iceberg-meta").load(root)
      .select("k", "lang").as[(Long, Option[String])].collect().toMap
    assert(got === Map(0L -> Some("en"), 1L -> Some("en"),
      2L -> Some("en"), 3L -> Some("en"),
      10L -> Some("fr"), 11L -> None, 20L -> Some("de")))
    // and the recommended remediation actually RUNS now: compaction
    // materializes the defaults and clears the ambiguity
    IcebergMeta.compact(spark, root)
    assert(IcebergMeta.snapshot(root)
      .files.forall(_.footerColumns.isEmpty))
    assert(spark.read.format("iceberg-meta").load(root)
      .filter(col("lang") === "en").count() === 4)
  }

  test("NESTED initial-default: foreign fixture fills struct members per file") {
    val root = tmp()
    val dataDir = Paths.get(root, "data")
    // file A at seq 1 under schema 0 (k, s:struct<a:long>) — one row
    // with a NULL struct (must STAY null: a null struct cannot carry
    // a member value); file B at seq 2 under schema 1, where s grew
    // tag:string with initial-default "xx" — B stores explicit
    // values including a stored NULL tag (stored values win)
    spark.range(0, 3).toDF("k")
      .select(col("k"), when(col("k") === 1, lit(null))
        .otherwise(struct((col("k") * 2).as("a"))).as("s"))
      .coalesce(1).write.parquet(dataDir.resolve("a").toString)
    spark.createDataFrame(Seq(
        (10L, (100L, "fr")), (11L, (110L, null: String))))
      .toDF("k", "s0")
      .select(col("k"), struct(col("s0._1").as("a"),
        col("s0._2").as("tag")).as("s"))
      .coalesce(1).write.parquet(dataDir.resolve("b").toString)
    import scala.jdk.CollectionConverters._
    def partOf(dir: String): String = {
      val s = Files.list(dataDir.resolve(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted.head
      finally s.close()
    }
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    Files.createDirectories(Paths.get(root, "metadata"))
    val manifest = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin)
    def entry(rel: String, seq: Long, records: Long): GenericRecord = {
      val e = new GenericData.Record(manifest)
      e.put("status", 1)
      e.put("sequence_number", java.lang.Long.valueOf(seq))
      val d = new GenericData.Record(
        manifest.getField("data_file").schema())
      d.put("content", 0)
      d.put("file_path", rel)
      d.put("file_format", "PARQUET")
      d.put("record_count", records)
      d.put("file_size_in_bytes", Files.size(Paths.get(root, rel)))
      e.put("data_file", d)
      e
    }
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](manifest))
    w.create(manifest, Paths.get(root, "metadata/m0.avro").toFile)
    w.append(entry(s"data/a/${partOf("a")}", 1L, 3L))
    w.append(entry(s"data/b/${partOf("b")}", 2L, 2L))
    w.close()
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"sequence_number","type":"long"}
        |]}""".stripMargin)
    val lw = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, Paths.get(root, "metadata/snap.avro").toFile)
    val lr = new GenericData.Record(listSchema)
    lr.put("manifest_path", "metadata/m0.avro")
    lr.put("manifest_length",
      Files.size(Paths.get(root, "metadata/m0.avro")))
    lr.put("partition_spec_id", 0)
    lr.put("content", 0)
    lr.put("sequence_number", 2L)
    lw.append(lr)
    lw.close()
    val sStruct0 =
      """{"type":"struct","fields":[
        |{"id":3,"name":"a","required":false,"type":"long"}]}"""
        .stripMargin
    val sStruct1 =
      """{"type":"struct","fields":[
        |{"id":3,"name":"a","required":false,"type":"long"},
        |{"id":4,"name":"tag","required":true,"type":"string",
        | "initial-default":"xx","write-default":"xx"}]}"""
        .stripMargin
    Files.write(Paths.get(root, "metadata/v1.metadata.json"),
      s"""{"format-version":3,"table-uuid":"t","location":"$root",
         |"last-sequence-number":2,"last-column-id":4,
         |"current-schema-id":1,
         |"schemas":[
         |  {"type":"struct","schema-id":0,"fields":[
         |    {"id":1,"name":"k","required":false,"type":"long"},
         |    {"id":2,"name":"s","required":false,"type":$sStruct0}]},
         |  {"type":"struct","schema-id":1,"fields":[
         |    {"id":1,"name":"k","required":false,"type":"long"},
         |    {"id":2,"name":"s","required":false,"type":$sStruct1}]}],
         |"current-snapshot-id":8,
         |"snapshots":[
         |  {"snapshot-id":7,"sequence-number":1,"schema-id":0,
         |   "manifest-list":"metadata/snap.avro","timestamp-ms":1,
         |   "summary":{"operation":"append"}},
         |  {"snapshot-id":8,"sequence-number":2,"schema-id":1,
         |   "parent-snapshot-id":7,
         |   "manifest-list":"metadata/snap.avro","timestamp-ms":2,
         |   "summary":{"operation":"append"}}]}"""
        .stripMargin.getBytes(UTF_8))
    Files.write(Paths.get(root, "metadata/version-hint.text"),
      "1".getBytes(UTF_8))
    val snap = IcebergMeta.snapshot(root)
    assert(snap.defaults.map(d => (d.name, d.segments, d.value,
      d.firstSeq)) === Seq(("s.tag", Seq("s", "tag"), "xx", 2L)))
    assert(snap.needsDefaultFill)
    // nested member surfaces NULLABLE despite required=true — the
    // fill restores totality above the scan
    val schema = spark.read.format("iceberg-meta").load(root).schema
    assert(schema("s").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("tag").nullable)
    val got = spark.read.format("iceberg-meta").load(root)
      .select(col("k"), col("s.a").as("a"), col("s.tag").as("tag"),
        col("s").isNull.as("snull"))
      .as[(Long, Option[Long], Option[String], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // pre-evolution rows read the default; the NULL STRUCT stays null
    assert(got(0L) === ((Some(0L), Some("xx"), false)))
    assert(got(1L) === ((None, None, true)))
    assert(got(2L) === ((Some(4L), Some("xx"), false)))
    // post-evolution rows read stored values — the stored NULL wins
    assert(got(10L) === ((Some(100L), Some("fr"), false)))
    assert(got(11L) === ((Some(110L), None, false)))
    // a filter through the filled member answers correctly
    assert(spark.read.format("iceberg-meta").load(root)
      .filter(col("s.tag") === "xx").count() === 2)
  }

  test("nested ADD COLUMN DEFAULT: writer evolution, fill, append round-trip") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k")
        .select(col("k"),
          struct(concat(lit("s"), col("k")).as("status")).as("meta"))
        .coalesce(1), root, formatVersion = 3)
    // one metadata-only commit adds meta.src with a default — the
    // dotted path walks into the struct, fresh id past last-column-id
    IcebergMeta.addColumnWithDefault(root, "meta.src",
      org.apache.spark.sql.types.StringType, "web")
    val r1 = spark.read.format("iceberg-meta").load(root)
    assert(r1.filter(col("meta.src") === "web").count() === 6)
    // appends under the evolved schema store explicit values
    // (including NULL — stored values win over the default)
    IcebergMeta.append(
      spark.range(10, 12).toDF("k")
        .select(col("k"), struct(
          concat(lit("s"), col("k")).as("status"),
          when(col("k") === 10, "api")
            .otherwise(lit(null).cast("string")).as("src")).as("meta"))
        .coalesce(1), root)
    val got = spark.read.format("iceberg-meta").load(root)
      .select(col("k"), col("meta.src").as("src"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(0L) === Some("web") && got(5L) === Some("web"))
    assert(got(10L) === Some("api") && got(11L) === None)
    // refusals: unknown parent, non-struct parent
    assert(intercept[IllegalArgumentException] {
      IcebergMeta.addColumnWithDefault(root, "nope.x",
        org.apache.spark.sql.types.StringType, "v")
    }.getMessage.contains("parent"))
    assert(intercept[IllegalArgumentException] {
      IcebergMeta.addColumnWithDefault(root, "k.x",
        org.apache.spark.sql.types.StringType, "v")
    }.getMessage.contains("not a struct"))
  }

  test("initial-default under a LIST refuses loudly") {
    val root = tmp()
    Files.createDirectories(Paths.get(root, "metadata"))
    Files.write(Paths.get(root, "metadata/v1.metadata.json"),
      s"""{"format-version":3,"table-uuid":"t","location":"$root",
         |"last-sequence-number":0,"last-column-id":5,
         |"current-schema-id":0,
         |"schemas":[
         |  {"type":"struct","schema-id":0,"fields":[
         |    {"id":1,"name":"k","required":false,"type":"long"},
         |    {"id":2,"name":"xs","required":false,"type":{
         |      "type":"list","element-id":3,"element-required":false,
         |      "element":{"type":"struct","fields":[
         |        {"id":4,"name":"a","required":false,"type":"long"},
         |        {"id":5,"name":"tag","required":false,"type":"string",
         |         "initial-default":"xx"}]}}}]}],
         |"current-snapshot-id":-1,
         |"snapshots":[]}""".stripMargin.getBytes(UTF_8))
    Files.write(Paths.get(root, "metadata/version-hint.text"),
      "1".getBytes(UTF_8))
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.snapshot(root)
    }
    assert(e.getMessage.contains("under a list/map"))
  }

  test("rewrite_manifests on a lineage table materializes first_row_id explicitly") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").coalesce(1).orderBy("k"), root,
      formatVersion = 3)
    IcebergMeta.append(
      spark.range(100, 103).toDF("k").coalesce(1).orderBy("k"), root)
    // a DV rides a delete manifest across the rewrite too
    IcebergMeta.delete(spark, root, col("k") % 3 === 0)
    def ids(): Map[Long, Long] =
      IcebergMetaRead.readWithRowIds(spark, root)
        .select("k", "_row_id").as[(Long, Long)].collect().toMap
    val pre = ids()
    assert(pre(100L) === 10L && pre(5L) === 5L)
    IcebergMeta.rewriteManifests(root)
    // the restated entries can no longer inherit from their ORIGINAL
    // list rows — ids survive only because the rewrite materialized
    // them (spec field 142); any drift here is silent lineage
    // corruption
    assert(ids() === pre)
    assert(IcebergMeta.manifestsFrame(spark, root).collect()
      .count(_.getInt(2) == 0) === 1)
    // the mark did not move (metadata-only commit adds no rows) —
    // a post-rewrite append continues exactly where it would have
    IcebergMeta.append(
      spark.range(200, 202).toDF("k").coalesce(1).orderBy("k"), root)
    val post = ids()
    assert(post(200L) === 13L && post(201L) === 14L)
    assert(post.filterNot(kv => kv._1 >= 200) === pre)
  }

  /** Deterministic (k, WKB point) source: graft_st_point builds the
    * 21-byte LE WKB from coordinate doubles — the constructor Spark
    * 4.1's ST family lacks. */
  private def geoSource(lo: Long, hi: Long) =
    spark.range(lo, hi).selectExpr(
      "id AS k",
      "graft_st_point(CAST(id % 360 - 180 AS DOUBLE), " +
        "CAST(id % 180 - 90 AS DOUBLE)) AS wkb")

  test("v3 geometry/geography: create, native types, exact WKB round-trip") {
    val root = tmp() + "/t"
    val geo = geoSource(1, 21).selectExpr("k", "wkb",
      "st_setsrid(st_geomfromwkb(wkb), 4326) AS g",
      "st_geogfromwkb(wkb) AS geog").coalesce(1)
    IcebergMeta.writeFixture(geo, root, formatVersion = 3)
    // the metadata document spells the spec types (bare = default
    // CRS OGC:CRS84 / spherical edges)
    assert(metaJson(root).contains("\"type\":\"geometry\""))
    assert(metaJson(root).contains("\"type\":\"geography\""))

    val back = spark.read.format("iceberg-meta").load(root)
    assert(back.schema.catalogString ===
      "struct<k:bigint,wkb:binary,g:geometry(4326),geog:geography(4326)>")
    // parquet physically stores WKB BINARY (foreign readers see the
    // spec encoding, not some engine-private geometry blob)
    val dataFile = IcebergMeta.snapshot(root).files.head.path
    assert(spark.read.parquet(dataFile).schema("g").dataType ===
      org.apache.spark.sql.types.BinaryType)
    // byte-exact round-trip through the native types, srid stamped
    assert(back.filter(
      "st_asbinary(g) = wkb AND st_asbinary(geog) = wkb AND " +
        "st_srid(g) = 4326").count() === 20)

    // append + DV delete + COMPACT: every rewrite path restages
    // geometry through the same WKB seam
    IcebergMeta.append(geoSource(21, 31).selectExpr("k", "wkb",
      "st_setsrid(st_geomfromwkb(wkb), 4326) AS g",
      "st_geogfromwkb(wkb) AS geog").coalesce(1), root)
    IcebergMeta.delete(spark, root, col("k") % 5 === 0)
    val afterDelete = spark.read.format("iceberg-meta").load(root)
    assert(afterDelete.count() === 24)
    assert(afterDelete.filter("st_asbinary(g) = wkb").count() === 24)
    IcebergMeta.compact(spark, root)
    val compacted = spark.read.format("iceberg-meta").load(root)
    assert(compacted.filter("st_asbinary(g) = wkb AND " +
      "st_asbinary(geog) = wkb").count() === 24)
    // row lineage survives the geo restage
    assert(IcebergMetaRead.readWithRowIds(spark, root)
      .select("_row_id").distinct().count() === 24)
    // time travel to the creating snapshot still reads 20 geo rows
    val snap0 = IcebergMeta.snapshotLog(root).head.snapshotId
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", snap0).load(root)
      .filter("st_asbinary(g) = wkb").count() === 20)
  }

  test("geometry gates: v2, flag-off, nested, bad CRS, eq-delete, partition") {
    val root = tmp() + "/t"
    val geo = geoSource(1, 6).selectExpr("k",
      "st_setsrid(st_geomfromwkb(wkb), 4326) AS g").coalesce(1)
    // v2 cannot carry geo (spec: geometry/geography are v3 types)
    val e1 = intercept[IllegalArgumentException] {
      IcebergMeta.writeFixture(geo, root + "_v2", formatVersion = 2)
    }
    assert(e1.getMessage.contains("format-version 3"))
    // no spec partition transform exists over geo
    val e2 = intercept[IllegalArgumentException] {
      IcebergMeta.writeFixture(geo, root + "_p",
        partitionBy = Seq("g"), formatVersion = 3)
    }
    assert(e2.getMessage.contains("geometry/geography"))

    IcebergMeta.writeFixture(geo, root, formatVersion = 3)
    // reading without the session feature refuses NAMING the conf
    spark.conf.set("spark.sql.geospatial.enabled", "false")
    try {
      val e3 = intercept[IllegalArgumentException] {
        spark.read.format("iceberg-meta").load(root).count()
      }
      assert(e3.getMessage.contains("spark.sql.geospatial.enabled"))
    } finally spark.conf.set("spark.sql.geospatial.enabled", "true")

    // equality delete keyed on a geo column refuses (write side)
    val e4 = intercept[IllegalArgumentException] {
      IcebergMeta.deleteEquality(spark, root,
        spark.read.format("iceberg-meta").load(root)
          .select("g").limit(1))
    }
    assert(e4.getMessage.contains("equality delete"))

    // foreign documents: NESTED geometry and an unknown CRS refuse
    // with the shape named (mis-mapping a CRS would silently
    // re-interpret every coordinate)
    val nroot = tmp() + "/n"
    IcebergMeta.writeFixture(spark.range(0, 3)
      .selectExpr("id AS k", "named_struct('gnest', id) AS s")
      .coalesce(1), nroot, formatVersion = 3)
    val mp = Paths.get(nroot, s"metadata/v${
      IcebergMeta.latestMetadataVersion(nroot)}.metadata.json")
    val doc = new String(Files.readAllBytes(mp), UTF_8)
    Files.write(mp, doc.replaceAll(
      """("name":"gnest","required":(?:true|false),"type":)"long"""",
      "$1\"geometry\"").getBytes(UTF_8))
    val e5 = intercept[Exception] {
      spark.read.format("iceberg-meta").load(nroot).count()
    }
    assert(e5.getMessage.contains("nested"))

    val croot = tmp() + "/c"
    IcebergMeta.writeFixture(geo, croot, formatVersion = 3)
    val cp = Paths.get(croot, s"metadata/v${
      IcebergMeta.latestMetadataVersion(croot)}.metadata.json")
    Files.write(cp, new String(Files.readAllBytes(cp), UTF_8)
      .replace("\"type\":\"geometry\"",
        "\"type\":\"geometry(FOO:1)\"").getBytes(UTF_8))
    val e6 = intercept[Exception] {
      spark.read.format("iceberg-meta").load(croot).count()
    }
    assert(e6.getMessage.contains("FOO:1"))
  }
}
