package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Delta column mapping ('name'/'id' modes): physical-name resolution
  * from the schema metadata, the logical-aliasing scan rewrite, stats
  * skipping in physical space, composition with deletion vectors, and
  * the refusal posture (nested mapping, DML, extension-less reads). */
class DeltaColumnMappingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("dcm_spec_").toString

  /** A mapped table: logical (k, v), physical (col-aaa, col-bbb),
    * two range files with hand-written stats under PHYSICAL names. */
  private def mappedTable(): String = {
    val root = tmp()
    spark.range(0, 10).toDF("col-aaa")
      .withColumn("col-bbb", col("col-aaa") * 10).coalesce(1)
      .write.parquet(root + "/data1")
    spark.range(10, 30).toDF("col-aaa")
      .withColumn("col-bbb", col("col-aaa") * 10).coalesce(1)
      .write.parquet(root + "/data2")
    import scala.jdk.CollectionConverters._
    def part(dir: String): String = {
      val s = Files.list(Paths.get(root, dir))
      try dir + "/" + s.iterator().asScala.map(_.getFileName.toString)
        .find(n => n.endsWith(".parquet") && !n.startsWith(".")).get
      finally s.close()
    }
    // real logs record TRUE file sizes; the scan plans byte ranges
    // from them, so a wrong size silently reads nothing
    def sizeOf(rel: String): Long = Files.size(Paths.get(root, rel))
    val meta = (k: String, phys: String, id: Int) =>
      s"""{\\"delta.columnMapping.id\\":$id,\\"delta.columnMapping.physicalName\\":\\"$phys\\"}"""
    val schema =
      s"""{\\"type\\":\\"struct\\",\\"fields\\":[
         |{\\"name\\":\\"k\\",\\"type\\":\\"long\\",\\"nullable\\":true,\\"metadata\\":${meta("k", "col-aaa", 1)}},
         |{\\"name\\":\\"v\\",\\"type\\":\\"long\\",\\"nullable\\":true,\\"metadata\\":${meta("v", "col-bbb", 2)}}
         |]}""".stripMargin.replace("\n", "")
    val log = Paths.get(root, "_delta_log")
    Files.createDirectories(log)
    def statsFor(lo: Long, hi: Long, n: Long) =
      s"""{\\"numRecords\\":$n,\\"minValues\\":{\\"col-aaa\\":$lo},\\"maxValues\\":{\\"col-aaa\\":$hi},\\"nullCount\\":{\\"col-aaa\\":0}}"""
    Files.write(log.resolve(f"${0L}%020d.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}\n""" +
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"}}}\n""" +
        s"""{"add":{"path":"${part("data1")}","partitionValues":{},"size":${sizeOf(part("data1"))},"modificationTime":0,"dataChange":true,"stats":"${statsFor(0, 9, 10)}"}}\n""" +
        s"""{"add":{"path":"${part("data2")}","partitionValues":{},"size":${sizeOf(part("data2"))},"modificationTime":0,"dataChange":true,"stats":"${statsFor(10, 29, 20)}"}}\n""")
        .getBytes(UTF_8))
    root
  }

  private def indexOf(df: org.apache.spark.sql.DataFrame)
      : DeltaLogFileIndex =
    df.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          r: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        r.location.asInstanceOf[DeltaLogFileIndex]
    }.head

  test("mapped table reads under LOGICAL names; stats skip physically") {
    val root = mappedTable()
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.columns.toSeq === Seq("k", "v"))
    assert(ds.count() === 30)
    assert(ds.agg(sum("v")).as[Long].head() === (0 until 30).map(_ * 10).sum)
    // a LOGICAL filter prunes via the PHYSICAL stats: k<=9 is one file
    val q = spark.read.format("delta-log").load(root).filter(col("k") <= 9)
    assert(q.agg(sum("v")).as[Long].head() === (0 until 10).map(_ * 10).sum)
    assert(indexOf(q).lastListing.get === ((1, 2)))
    // SQL over a catalog table resolves logical names end to end
    spark.sql(s"CREATE TABLE dcm_t USING `delta-log` OPTIONS (path '$root')")
    try assert(spark.sql(
      "SELECT count(*) AS c FROM dcm_t WHERE k BETWEEN 5 AND 14")
      .as[Long].head() === 10L)
    finally spark.sql("DROP TABLE IF EXISTS dcm_t")
  }

  test("column mapping composes with deletion vectors") {
    val root = mappedTable()
    // DV on the first file (rows are k=0..9 in order): drop pos 2, 5
    val a = DeltaLog.snapshot(spark, root).adds
      .find(_.path.startsWith("data1")).get
    val d = DeletionVectors.writeFile(root, Array(2L, 5L))
    Files.write(Paths.get(root, "_delta_log", f"${1L}%020d.json"),
      (s"""{"add":{"path":"${a.path}","partitionValues":{},"size":${a.size},"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}\n""")
        .getBytes(UTF_8))
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.count() === 28)
    assert(ds.filter(col("k") < 10).orderBy("k").select("k")
      .as[Long].collect().toSeq ===
      (0L until 10L).filterNot(k => k == 2 || k == 5).toSeq)
  }

  test("DML on a MAPPED table rewrites in physical space") {
    val root = mappedTable()
    // DELETE: logical predicate, physical rewrite
    DeltaLog.deleteWhere(spark, root, col("k") === 1)
    val ds1 = spark.read.format("delta-log").load(root)
    assert(ds1.count() === 29)
    assert(ds1.filter(col("k") === 1).count() === 0)
    // the rewritten file carries PHYSICAL column names
    val rewritten = DeltaLog.snapshot(spark, root).adds
      .filterNot(_.path.startsWith("data2")).head
    assert(spark.read.parquet(root + "/" + rewritten.path)
      .columns.toSeq === Seq("col-aaa", "col-bbb"))
    // UPDATE through the SQL surface: logical names end to end
    spark.sql(s"CREATE TABLE dcm_dml USING `delta-log` OPTIONS (path '$root')")
    try {
      spark.sql("UPDATE dcm_dml SET v = k * 1000 WHERE k = 2")
      val ds2 = spark.read.format("delta-log").load(root)
      assert(ds2.filter(col("k") === 2).select("v").as[Long]
        .head() === 2000L)
      assert(ds2.count() === 29)
    } finally spark.sql("DROP TABLE IF EXISTS dcm_dml")
    // OPTIMIZE packs the mapped table physically
    DeltaLog.compact(spark, root)
    assert(DeltaLog.snapshot(spark, root).adds.size === 1)
    val ds3 = spark.read.format("delta-log").load(root)
    assert(ds3.count() === 29)
    assert(ds3.agg(sum("v")).as[Long].head() ===
      (0 until 30).filter(k => k != 1).map(k =>
        if (k == 2) 2000L else k * 10L).sum)
  }

  test("MERGE on a MAPPED table: logical-space cascade, physical staging") {
    val root = mappedTable()
    spark.sql(s"CREATE TABLE dcm_m USING `delta-log` OPTIONS (path '$root')")
    Seq((5L, 555L), (7L, -1L), (40L, 400L))
      .toDF("k", "nv").createOrReplaceTempView("dcm_m_src")
    try {
      spark.sql(
        """MERGE INTO dcm_m t USING dcm_m_src s ON t.k = s.k
          |WHEN MATCHED AND s.nv < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
          |""".stripMargin)
      // k=5 updated, k=7 deleted, k=40 inserted; 30 - 1 + 1 rows
      val ds = spark.read.format("delta-log").load(root)
      assert(ds.count() === 30L)
      assert(ds.filter(col("k") === 5).select("v").as[Long].head() === 555L)
      assert(ds.filter(col("k") === 7).count() === 0L)
      assert(ds.filter(col("k") === 40).select("v").as[Long].head() === 400L)
      // the merge's staged files carry PHYSICAL names
      val newest = DeltaLog.snapshot(spark, root).adds
        .filterNot(a => a.path.startsWith("data1") ||
          a.path.startsWith("data2")).head
      assert(spark.read.parquet(root + "/" + newest.path)
        .columns.toSeq === Seq("col-aaa", "col-bbb"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS dcm_m")
      spark.catalog.dropTempView("dcm_m_src")
    }
  }

  test("refusals: raw listing gate, nested metadata") {
    val root = mappedTable()
    // the raw listing gate outside the rewrite
    val snap = DeltaLog.snapshot(spark, root)
    val idx = new DeltaLogFileIndex(spark, root, snap, pinned = true)
    val e2 = intercept[IllegalStateException] { idx.listFiles(Nil, Nil) }
    assert(e2.getMessage.contains("column mapping"))
    // a nested field MISSING its physicalName metadata still refuses
    val nroot = tmp()
    val nlog = Paths.get(nroot, "_delta_log")
    Files.createDirectories(nlog)
    val nschema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"s\",\"type\":{\"type\":\"struct\",\"fields\":[{\"name\":\"a\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]},\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col-s\"}}]}"""
    Files.write(nlog.resolve(f"${0L}%020d.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}\n""" +
        s"""{"metaData":{"id":"n","format":{"provider":"parquet","options":{}},"schemaString":"$nschema","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}\n""")
        .getBytes(UTF_8))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, nroot).physical
    }
    assert(e3.getMessage.contains("nested field a"))
  }

  test("CDF on a MAPPED table: cdc files and derived branches restore") {
    val root = mappedTable() // v0: two adds (k=0..9, k=10..29)
    // v1: an append — its feed rows DERIVE as inserts through the
    // mapped scan path
    spark.range(30, 33).toDF("col-aaa")
      .withColumn("col-bbb", col("`col-aaa`") * 10).coalesce(1)
      .write.parquet(root + "/data3")
    import scala.jdk.CollectionConverters._
    def part(dir: String): String = {
      val s = Files.list(Paths.get(root, dir))
      try dir + "/" + s.iterator().asScala.map(_.getFileName.toString)
        .find(n => n.endsWith(".parquet") && !n.startsWith(".")).get
      finally s.close()
    }
    Files.write(Paths.get(root, "_delta_log", f"${1L}%020d.json"),
      (s"""{"add":{"path":"${part("data3")}","partitionValues":{},"size":${Files.size(Paths.get(root, part("data3")))},"modificationTime":0,"dataChange":true}}\n""")
        .getBytes(UTF_8))
    // v2: a rewrite carrying cdc actions — cdc parquet stores the
    // PHYSICAL data columns plus the UNmapped _change_type (CDF spec)
    val oldAdd = DeltaLog.snapshot(spark, root).adds
      .find(_.path.startsWith("data1")).get
    spark.range(0, 10).toDF("col-aaa")
      .withColumn("col-bbb",
        when(col("`col-aaa`") === 3, lit(-1L))
          .otherwise(col("`col-aaa`") * 10))
      .coalesce(1).write.parquet(root + "/data4")
    Seq((3L, 30L, "update_preimage"), (3L, -1L, "update_postimage"))
      .toDF("col-aaa", "col-bbb", "_change_type").coalesce(1)
      .write.parquet(root + "/cdc1")
    Files.write(Paths.get(root, "_delta_log", f"${2L}%020d.json"),
      (s"""{"remove":{"path":"${oldAdd.path}","deletionTimestamp":1,"dataChange":true}}\n""" +
        s"""{"add":{"path":"${part("data4")}","partitionValues":{},"size":${Files.size(Paths.get(root, part("data4")))},"modificationTime":0,"dataChange":true}}\n""" +
        s"""{"cdc":{"path":"${part("cdc1")}","partitionValues":{},"size":${Files.size(Paths.get(root, part("cdc1")))},"dataChange":false}}\n""")
        .getBytes(UTF_8))
    val feed = DeltaLog.changes(spark, root, 0L, 2L)
    assert(feed.columns.toSeq ===
      Seq("k", "v", "_change_type", "_commit_version"))
    val rows = feed.select("k", "v", "_change_type", "_commit_version")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(rows === Set(
      (30L, 300L, "insert", 1L), (31L, 310L, "insert", 1L),
      (32L, 320L, "insert", 1L),
      (3L, 30L, "update_preimage", 2L),
      (3L, -1L, "update_postimage", 2L)))
    // the TVF route works too (SQL surface, logical names)
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM delta_changes('$root', 0, 1)")
      .as[Long].head() === 930L)
  }

  test("NESTED column mapping: structs, arrays of structs, maps restore") {
    val root = tmp()
    // physical layout a real mapped writer would produce: every name
    // at every level is a uuid-ish physical name
    spark.range(0, 6).toDF("col-k")
      .withColumn("col-s",
        when(col("`col-k`") =!= 2, struct(
          (col("`col-k`") * 10).as("col-a"),
          concat(lit("v"), col("`col-k`")).as("col-b"))))
      .withColumn("col-arr",
        when(col("`col-k`") =!= 4, array(
          struct((col("`col-k`") + 100).as("col-x")),
          struct((col("`col-k`") + 200).as("col-x")))))
      .withColumn("col-m",
        map(lit("one"), struct((col("`col-k`") + 7).as("col-y"))))
      .coalesce(1).write.parquet(root + "/data")
    import scala.jdk.CollectionConverters._
    val part = {
      val s = Files.list(Paths.get(root, "data"))
      try "data/" + s.iterator().asScala.map(_.getFileName.toString)
        .find(n => n.endsWith(".parquet") && !n.startsWith(".")).get
      finally s.close()
    }
    def fld(l: String, p: String, tpe: String, id: Int) =
      s"""{\\"name\\":\\"$l\\",\\"type\\":$tpe,\\"nullable\\":true,\\"metadata\\":{\\"delta.columnMapping.id\\":$id,\\"delta.columnMapping.physicalName\\":\\"$p\\"}}"""
    val sType =
      s"""{\\"type\\":\\"struct\\",\\"fields\\":[${fld("a", "col-a", "\\\"long\\\"", 3)},${fld("b", "col-b", "\\\"string\\\"", 4)}]}"""
    val xType =
      s"""{\\"type\\":\\"struct\\",\\"fields\\":[${fld("x", "col-x", "\\\"long\\\"", 6)}]}"""
    val arrType =
      s"""{\\"type\\":\\"array\\",\\"elementType\\":$xType,\\"containsNull\\":true}"""
    val yType =
      s"""{\\"type\\":\\"struct\\",\\"fields\\":[${fld("y", "col-y", "\\\"long\\\"", 8)}]}"""
    val mapType =
      s"""{\\"type\\":\\"map\\",\\"keyType\\":\\"string\\",\\"valueType\\":$yType,\\"valueContainsNull\\":true}"""
    val schema =
      s"""{\\"type\\":\\"struct\\",\\"fields\\":[${Seq(
        fld("k", "col-k", "\\\"long\\\"", 1),
        fld("s", "col-s", sType, 2),
        fld("arr", "col-arr", arrType, 5),
        fld("m", "col-m", mapType, 7)).mkString(",")}]}"""
    val log = Paths.get(root, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}\n""" +
        s"""{"metaData":{"id":"n","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}\n""" +
        s"""{"add":{"path":"$part","partitionValues":{},"size":${Files.size(Paths.get(root, part))},"modificationTime":0,"dataChange":true}}\n""")
        .getBytes(UTF_8))
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.columns.toSeq === Seq("k", "s", "arr", "m"))
    // nested struct restores under logical names; NULL structs stay NULL
    assert(ds.agg(sum("s.a"), count(col("s.a"))).as[(Long, Long)]
      .head() === ((130L, 5L)))
    assert(ds.filter(col("s").isNull).select("k").as[Long]
      .collect().toSeq === Seq(2L))
    assert(ds.filter(col("k") === 1).select(col("s.b")).as[String]
      .head() === "v1")
    // arrays of structs restore element-wise; NULL arrays stay NULL
    assert(ds.filter(col("k") === 3)
      .select(expr("transform(arr, e -> e.x)")).as[Seq[Long]]
      .head() === Seq(103L, 203L))
    assert(ds.filter(col("arr").isNull).select("k").as[Long]
      .collect().toSeq === Seq(4L))
    // map values restore
    assert(ds.filter(col("k") === 5).select(col("m")("one")("y"))
      .as[Long].head() === 12L)
    // flat filters still prune through to the physical scan
    assert(ds.filter(col("k") <= 2).count() === 3)
  }

  test("writer CREATES a mapped table: physical files, field ids, DML round trip") {
    val root = tmp()
    spark.range(0, 20).toDF("k").withColumn("v", col("k") * 10)
      .coalesce(1).write.format("delta-log")
      .option("delta.columnMapping.mode", "id").save(root)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.minReaderVersion === 2 && snap.minWriterVersion === 5)
    assert(snap.configuration.get("delta.columnMapping.mode")
      .contains("id"))
    assert(snap.configuration.get("delta.columnMapping.maxColumnId")
      .contains("2"))
    assert(snap.columnMapping.keySet === Set("k", "v"))
    assert(snap.columnMapping.values.forall(_.startsWith("col-")))
    // the staged parquet carries PHYSICAL names (and, id mode, real
    // parquet field ids — what a foreign id-mode reader resolves by)
    val raw = spark.read.parquet(root + "/" + snap.adds.head.path)
    assert(raw.columns.toSeq.sorted ===
      snap.columnMapping.values.toSeq.sorted)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          Paths.get(root, snap.adds.head.path).toUri),
        spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val ids = footer.getFooter.getFileMetaData.getSchema.getFields
        .asScala.map(f => Option(f.getId).map(_.intValue()))
      assert(ids.flatten.toSet === Set(1, 2),
        "id-mode files must carry parquet field ids from the mapping")
    } finally footer.close()
    // logical read + append through the mapping
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.columns.toSeq === Seq("k", "v"))
    assert(ds.agg(sum("v")).as[Long].head() ===
      (0 until 20).map(_ * 10L).sum)
    spark.range(20, 30).toDF("k").withColumn("v", col("k") * 10)
      .write.format("delta-log").mode("append").save(root)
    assert(spark.read.format("delta-log").load(root).count() === 30)
    // SQL DML drives the physical rewrite end to end
    spark.sql(s"CREATE TABLE dcm_cw USING `delta-log` OPTIONS (path '$root')")
    try {
      spark.sql("DELETE FROM dcm_cw WHERE k >= 25")
      spark.sql("UPDATE dcm_cw SET v = 0 WHERE k = 3")
      assert(spark.sql(
        "SELECT count(*) AS c, sum(v) AS s FROM dcm_cw")
        .as[(Long, Long)].head() ===
        ((25L, (0 until 25).filter(_ != 3).map(_ * 10L).sum)))
    } finally spark.sql("DROP TABLE IF EXISTS dcm_cw")
    // overwrite keeps the mapping, config and protocol
    spark.range(0, 5).toDF("k").withColumn("v", col("k"))
      .write.format("delta-log").mode("overwrite").save(root)
    val ow = DeltaLog.snapshot(spark, root)
    assert(ow.columnMapping === snap.columnMapping)
    assert(ow.minWriterVersion === 5)
    assert(spark.read.format("delta-log").load(root)
      .agg(sum("v")).as[Long].head() === 10L)
  }

  test("writer CREATES a mapped table with NESTED columns; append restates them") {
    val root = tmp()
    val df = spark.range(0, 8).toDF("id")
      .withColumn("rec", struct(col("id").as("a"),
        struct((col("id") * 2).as("b")).as("inner")))
    df.coalesce(1).write.format("delta-log")
      .option("delta.columnMapping.mode", "name").save(root)
    val snap = DeltaLog.snapshot(spark, root)
    // every nested struct field got an id + physicalName (4 fields:
    // id, rec, rec.a, rec.inner, rec.inner.b)
    assert(snap.configuration.get("delta.columnMapping.maxColumnId")
      .contains("5"))
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.columns.toSeq === Seq("id", "rec"))
    assert(ds.select(col("rec.inner.b")).as[Long].collect().sorted
      .toSeq === (0L until 8L).map(_ * 2))
    // nested append restates physical names via the struct cast
    spark.range(8, 10).toDF("id")
      .withColumn("rec", struct(col("id").as("a"),
        struct((col("id") * 2).as("b")).as("inner")))
      .write.format("delta-log").mode("append").save(root)
    val all = spark.read.format("delta-log").load(root)
    assert(all.count() === 10)
    assert(all.agg(sum(col("rec.inner.b"))).as[Long].head() ===
      (0L until 10L).map(_ * 2).sum)
    // MERGE with NESTED mapped columns (round 9): the cascade runs in
    // logical space; the scan and outputs rename via by-position
    // struct casts, so nested structs survive the round trip
    spark.sql(s"CREATE TABLE dcm_nm USING `delta-log` OPTIONS (path '$root')")
    spark.range(9, 12).toDF("id")
      .withColumn("rec", struct((col("id") * 100).as("a"),
        struct((col("id") * 200).as("b")).as("inner")))
      .createOrReplaceTempView("dcm_nm_src")
    try {
      spark.sql(
        """MERGE INTO dcm_nm t USING dcm_nm_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET rec = s.rec
          |WHEN NOT MATCHED THEN INSERT (id, rec) VALUES (s.id, s.rec)
          |""".stripMargin)
      val merged = spark.read.format("delta-log").load(root)
      assert(merged.count() === 12) // 10 + inserted 10, 11
      assert(merged.filter(col("id") === 9)
        .select(col("rec.inner.b")).as[Long].head() === 1800L)
      assert(merged.filter(col("id") === 11)
        .select(col("rec.a")).as[Long].head() === 1100L)
      assert(merged.filter(col("id") === 3)
        .select(col("rec.inner.b")).as[Long].head() === 6L) // untouched
      // every live file (incl. the merge-staged ones) carries
      // PHYSICAL column names
      DeltaLog.snapshot(spark, root).adds.foreach { a =>
        assert(spark.read.parquet(root + "/" + a.path)
          .columns.forall(_.startsWith("col-")), a.path)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS dcm_nm")
      spark.catalog.dropTempView("dcm_nm_src")
    }
  }
}
