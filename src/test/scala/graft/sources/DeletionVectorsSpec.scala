package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Deletion-vector codecs and the Delta DV read path: Z85 against the
  * published reference vector, RoaringBitmapArray round-trips across
  * all container shapes plus a hand-crafted run container, DV file /
  * inline framing, scan-time application through the DeltaMorScan
  * rewrite, checkpoint fidelity, the no-extensions refusal gate, and
  * SQL COW DELETE on delta-log tables. */
class DeletionVectorsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("dv_spec_").toString

  test("Z85 round-trips and matches the ZeroMQ reference vector") {
    // the Z85 spec's reference: 0x86 4F D2 6F B5 59 F7 5B ↔ HelloWorld
    val ref = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(Z85.encode(ref) === "HelloWorld")
    assert(Z85.decode("HelloWorld").toSeq === ref.toSeq)
    val rnd = new scala.util.Random(7)
    val bytes = Array.fill(64)(rnd.nextInt().toByte)
    assert(Z85.decode(Z85.encode(bytes)).toSeq === bytes.toSeq)
  }

  test("RoaringBitmapArray round-trips: array, bitmap, multi-high") {
    def rt(xs: Array[Long]): Unit =
      assert(RoaringBitmapArray.deserialize(
        RoaringBitmapArray.serialize(xs)).toSeq === xs.toSeq)
    rt(Array.empty[Long])
    rt(Array(0L, 1L, 3L, 65536L, 65537L))          // two array containers
    rt((0L until 5000L).toArray)                   // bitmap container
    rt(Array(5L, (1L << 32) | 7L, (3L << 32) | 9L)) // multi-bitmap (gaps)
    rt((0L until 70000L by 7).toArray)             // mixed containers
  }

  test("run containers deserialize (real writers emit them)") {
    // hand-craft: magic, 1 bitmap, SERIAL_COOKIE(12347) with 1
    // container marked run, card 11, runs [(3,len4),(10,len5)] → the
    // spec stores length-1; values 3..7 and 10..15
    val bb = ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RoaringBitmapArray.Magic)
    bb.putLong(1L)
    bb.putInt(12347 | (0 << 16)) // 1 container
    bb.put(1.toByte)             // run flag bitset: container 0 is run
    bb.putShort(0)               // key
    bb.putShort(10)              // cardinality - 1 = 10 (11 values)
    // < NoOffsetThreshold containers with runs → no offset header
    bb.putShort(2)               // numRuns
    bb.putShort(3); bb.putShort(4)  // 3..7
    bb.putShort(10); bb.putShort(5) // 10..15
    val got = RoaringBitmapArray.deserialize(
      java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(got.toSeq === ((3L to 7L) ++ (10L to 15L)).toSeq)
  }

  test("DV file and inline descriptors round-trip with framing checks") {
    val root = tmp()
    val pos = Array(1L, 3L, 4096L, 70000L)
    val d = DeletionVectors.writeFile(root, pos)
    assert(d.storageType === "u" && d.cardinality === 4)
    assert(DeletionVectors.read(root, d).toSeq === pos.toSeq)
    val i = DeletionVectors.inline(pos)
    assert(i.storageType === "i" && i.offset.isEmpty)
    assert(DeletionVectors.read(root, i).toSeq === pos.toSeq)
    // corrupt the sidecar → checksum refusal
    val bin = {
      val s = Files.list(Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.find(
          _.getFileName.toString.startsWith("deletion_vector_")).get
      } finally s.close()
    }
    val bytes = Files.readAllBytes(bin)
    bytes(8) = (bytes(8) ^ 0x7f).toByte
    Files.write(bin, bytes)
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.read(root, d)
    }
    assert(e.getMessage.contains("checksum") ||
      e.getMessage.contains("magic"))
  }

  /** A delta table of range(0, 20) in one file + a hand-committed DV
    * deleting positions (= values) 1, 3, 17. */
  private def dvTable(): String = {
    val root = tmp()
    DeltaLog.commit(
      spark.range(0, 20).toDF("k").withColumn("v", col("k") * 10)
        .coalesce(1), root)
    val a = DeltaLog.snapshot(spark, root).adds.head
    val d = DeletionVectors.writeFile(root, Array(1L, 3L, 17L))
    val dvJson = s"""{"storageType":"${d.storageType}",""" +
      s""""pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset.get},""" +
      s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
    Files.write(Paths.get(root, "_delta_log",
      f"${1L}%020d.json"),
      (s"""{"add":{"path":"${a.path}","partitionValues":{},""" +
        s""""size":${a.size},"modificationTime":0,"dataChange":false,""" +
        s""""deletionVector":$dvJson}}""" + "\n").getBytes(UTF_8))
    root
  }

  test("deletion vectors apply at scan time; time travel sees all rows") {
    val root = dvTable()
    val cur = spark.read.format("delta-log").load(root)
    assert(cur.count() === 17)
    assert(cur.agg(sum("v")).as[Long].head() ===
      (0 until 20).filter(k => k != 1 && k != 3 && k != 17).map(_ * 10).sum)
    // a filter composes with the DV anti-join
    assert(cur.filter(col("k") < 5).count() === 3) // 0, 2, 4
    // pre-DV version reads everything
    assert(spark.read.format("delta-log")
      .option("versionAsOf", 0).load(root).count() === 20)
  }

  test("DVs survive checkpointing; raw listing refuses without rewrite") {
    val root = dvTable()
    DeltaLog.checkpoint(spark, root)
    // drop the JSON commits: replay must come from the checkpoint
    Files.delete(Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(root, "_delta_log", f"${1L}%020d.json"))
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.adds.head.deletionVector.exists(_.cardinality === 3))
    assert(spark.read.format("delta-log").load(root).count() === 17)
    // the gate: listing a DV snapshot outside the rewrite fails loudly
    val idx = new DeltaLogFileIndex(spark, root, snap, pinned = true)
    val e = intercept[IllegalStateException] { idx.listFiles(Nil, Nil) }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("SQL DELETE FROM a delta-log table: COW commit, DVs materialized") {
    val root = dvTable()
    spark.sql(s"CREATE TABLE dv_del USING `delta-log` OPTIONS (path '$root')")
    try {
      val before = DeltaLog.snapshot(spark, root)
      spark.sql("DELETE FROM dv_del WHERE k >= 10")
      val after = DeltaLog.snapshot(spark, root)
      // the touched (DV-carrying) file was rewritten: no DVs remain
      assert(after.adds.forall(_.deletionVector.isEmpty))
      assert(!after.adds.map(_.path).toSet
        .contains(before.adds.head.path))
      // survivors: k in 0..9 minus the DV'd 1 and 3
      assert(spark.sql("SELECT count(*) AS c FROM dv_del")
        .as[Long].head() === 8L)
      // WHERE-NULL keeps rows
      spark.sql("DELETE FROM dv_del WHERE if(k = 2, NULL, FALSE)")
      assert(spark.sql("SELECT count(*) AS c FROM dv_del")
        .as[Long].head() === 8L)
    } finally spark.sql("DROP TABLE IF EXISTS dv_del")
  }

  test("partitioned delta DELETE rewrites only touched partitions; huge-DV decode refuses") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k")
      .withColumn("p", col("k") % 2)
      .repartition(col("p")), // one file per partition dir
      root, partitionBy = Seq("p"))
    val before = DeltaLog.snapshot(spark, root)
    DeltaLog.deleteWhere(spark, root, col("k") === 1) // lives in p=1
    val after = DeltaLog.snapshot(spark, root)
    // p=0's file(s) carried over untouched; p=1 rewrote with pv intact
    val beforeP0 = before.adds.filter(_.partitionValues.get("p").contains("0"))
      .map(_.path).toSet
    assert(beforeP0.subsetOf(after.adds.map(_.path).toSet))
    assert(after.adds.filter(_.partitionValues.get("p").contains("1"))
      .forall(a => !before.adds.map(_.path).contains(a.path)))
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.count() === 9)
    assert(ds.filter(col("p") === 1).select("k").as[Long]
      .collect().sorted.toSeq === Seq(3L, 5L, 7L, 9L))
    // a partition-predicate delete prunes: only p=0 files touched
    DeltaLog.deleteWhere(spark, root, col("p") === 0 && col("k") < 4)
    assert(spark.read.format("delta-log").load(root).count() === 7)
    // cardinality guard refuses before decoding anything
    val big = DeletionVectors.Descriptor("i", "", None, 0,
      DeltaLogRead.MaxDecodedPositions + 1)
    val add = DeltaLog.DeltaAdd("x.parquet", Map.empty, Set.empty, 1L,
      None, Some(big))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLogRead.deletedPositions(spark, root, Seq(add))
    }
    assert(e2.getMessage.contains("decode ceiling"))
  }

  test("DELETE on a DV-enabled table WRITES a deletion vector: no data file rewritten") {
    val root = tmp()
    spark.range(0, 100).toDF("k").withColumn("v", col("k") * 10)
      .coalesce(2).write.format("delta-log")
      .option("delta.enableDeletionVectors", "true").save(root)
    val before = DeltaLog.snapshot(spark, root)
    assert(before.minReaderVersion === 3 && before.minWriterVersion === 7)
    assert(before.writerFeatures.contains("deletionVectors"))
    // small delete → DV path: same data files, new descriptors
    DeltaLog.deleteWhere(spark, root, col("k") % 10 === 3)
    val after = DeltaLog.snapshot(spark, root)
    assert(after.adds.map(_.path).toSet === before.adds.map(_.path).toSet,
      "a DV delete must not rewrite or re-stage any data file")
    assert(after.adds.flatMap(_.deletionVector).map(_.cardinality).sum === 10)
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.count() === 90)
    assert(ds.filter(col("k") % 10 === 3).count() === 0)
    // second delete MERGES into the existing DVs (one descriptor per
    // file still, cardinality grows)
    DeltaLog.deleteWhere(spark, root, col("k") % 10 === 7)
    val after2 = DeltaLog.snapshot(spark, root)
    assert(after2.adds.map(_.path).toSet === before.adds.map(_.path).toSet)
    assert(after2.adds.flatMap(_.deletionVector).map(_.cardinality).sum === 20)
    assert(spark.read.format("delta-log").load(root).count() === 80)
    // time travel: pre-delete version still reads 100
    assert(spark.read.format("delta-log").option("versionAsOf", 0)
      .load(root).count() === 100)
    // a DENSE delete (>50% of touched files' rows) falls back to COW
    DeltaLog.deleteWhere(spark, root, col("k") < 70)
    val after3 = DeltaLog.snapshot(spark, root)
    assert(spark.read.format("delta-log").load(root).count() ===
      (70 until 100).count(k => k % 10 != 3 && k % 10 != 7))
    assert(after3.adds.forall(a =>
      !before.adds.map(_.path).contains(a.path) &&
        a.deletionVector.isEmpty),
      "dense delete should COW-rewrite and materialize the DVs")
  }

  test("DV delete drops a fully-dead file; compact purges descriptors") {
    val root = tmp()
    // two single-partition files: k 0..9 and k 10..39
    spark.range(0, 10).toDF("k").coalesce(1).write.format("delta-log")
      .option("delta.enableDeletionVectors", "true").save(root)
    spark.range(10, 40).toDF("k").coalesce(1).write.format("delta-log")
      .mode("append").save(root)
    val before = DeltaLog.snapshot(spark, root)
    assert(before.adds.size === 2)
    // kill ALL of file 1 and a bit of file 2 — 11/40 stays under the
    // 50% density bound, so the DV path runs, and the fully-dead
    // file is REMOVED outright (no zombie add)
    DeltaLog.deleteWhere(spark, root, col("k") < 10 || col("k") === 11)
    val after = DeltaLog.snapshot(spark, root)
    assert(after.adds.size === 1)
    assert(before.adds.map(_.path).contains(after.adds.head.path))
    assert(after.adds.head.deletionVector.exists(_.cardinality === 1L))
    assert(spark.read.format("delta-log").load(root)
      .select("k").as[Long].collect().sorted.toSeq ===
      (10L until 40L).filter(_ != 11))
    // REORG PURGE: compaction materializes the written DV
    DeltaLog.compact(spark, root)
    val purged = DeltaLog.snapshot(spark, root)
    assert(purged.adds.forall(_.deletionVector.isEmpty))
    assert(spark.read.format("delta-log").load(root).count() === 29)
  }

  test("UPDATE on a DV-enabled table: pre-update rows die via DVs, post rows append") {
    val root = tmp()
    spark.range(0, 100).toDF("k").withColumn("v", col("k") * 10)
      .coalesce(2).write.format("delta-log")
      .option("delta.enableDeletionVectors", "true").save(root)
    val before = DeltaLog.snapshot(spark, root)
    spark.sql(s"CREATE TABLE dv_upd USING `delta-log` OPTIONS (path '$root')")
    try {
      spark.sql("UPDATE dv_upd SET v = -1 WHERE k % 25 = 3")
      val after = DeltaLog.snapshot(spark, root)
      // every original file survives (under a DV) — no survivor
      // restaging — and the post-update rows land as NEW files
      assert(before.adds.map(_.path).toSet
        .subsetOf(after.adds.map(_.path).toSet))
      assert(after.adds.size > before.adds.size)
      assert(after.adds.flatMap(_.deletionVector)
        .map(_.cardinality).sum === 4)
      assert(spark.sql("SELECT count(*) AS c FROM dv_upd")
        .as[Long].head() === 100L)
      assert(spark.sql("SELECT count(*) AS c FROM dv_upd WHERE v = -1")
        .as[Long].head() === 4L)
      assert(spark.sql(
        "SELECT CAST(sum(v) AS LONG) AS s FROM dv_upd").as[Long]
        .head() === (0 until 100)
        .map(k => if (k % 25 == 3) -1L else k * 10L).sum)
      // a second DV update composes (merged descriptors)
      spark.sql("UPDATE dv_upd SET v = -2 WHERE k = 10")
      assert(spark.sql("SELECT v FROM dv_upd WHERE k = 10").as[Long]
        .head() === -2L)
      assert(spark.sql("SELECT count(*) AS c FROM dv_upd")
        .as[Long].head() === 100L)
    } finally spark.sql("DROP TABLE IF EXISTS dv_upd")
  }

  test("MERGE on a DV-enabled table: changed target rows die via DVs, carry-overs never restage") {
    val root = tmp()
    spark.range(0, 60).toDF("k").withColumn("v", col("k") * 10)
      .coalesce(2).write.format("delta-log")
      .option("delta.enableDeletionVectors", "true").save(root)
    val before = DeltaLog.snapshot(spark, root)
    spark.sql(s"CREATE TABLE dv_mrg USING `delta-log` OPTIONS (path '$root')")
    Seq((5L, 555L), (17L, -1L), (100L, 1000L))
      .toDF("k", "nv").createOrReplaceTempView("dv_mrg_src")
    try {
      spark.sql(
        """MERGE INTO dv_mrg t USING dv_mrg_src s ON t.k = s.k
          |WHEN MATCHED AND s.nv < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
          |""".stripMargin)
      val after = DeltaLog.snapshot(spark, root)
      // every original file survives under a DV; new files carry the
      // updated + inserted rows; carry-over rows were never restaged
      assert(before.adds.map(_.path).toSet
        .subsetOf(after.adds.map(_.path).toSet))
      assert(after.adds.size > before.adds.size)
      // k=5 (update) and k=17 (delete) died positionally
      assert(after.adds.flatMap(_.deletionVector)
        .map(_.cardinality).sum === 2)
      assert(spark.sql("SELECT count(*) AS c FROM dv_mrg")
        .as[Long].head() === 60L) // 60 - 1 deleted + 1 inserted
      assert(spark.sql("SELECT v FROM dv_mrg WHERE k = 5")
        .as[Long].head() === 555L)
      assert(spark.sql("SELECT count(*) AS c FROM dv_mrg WHERE k = 17")
        .as[Long].head() === 0L)
      assert(spark.sql("SELECT v FROM dv_mrg WHERE k = 100")
        .as[Long].head() === 1000L)
      // a merge where nothing fires commits nothing
      val vBefore = DeltaLog.latestVersion(root)
      Seq((900000L, 1L)).toDF("k", "nv")
        .createOrReplaceTempView("dv_mrg_miss")
      spark.sql(
        """MERGE INTO dv_mrg t USING dv_mrg_miss s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |""".stripMargin)
      spark.catalog.dropTempView("dv_mrg_miss")
      assert(DeltaLog.latestVersion(root) === vBefore)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dv_mrg")
      spark.catalog.dropTempView("dv_mrg_src")
    }
  }

  test("DVs + CDF together: DV delete records cdc rows; features all listed") {
    val root = tmp()
    spark.range(0, 40).toDF("k").coalesce(1).write.format("delta-log")
      .option("delta.enableDeletionVectors", "true")
      .option("delta.enableChangeDataFeed", "true").save(root)
    val snap = DeltaLog.snapshot(spark, root)
    // (3,7) with EVERY active feature listed — a (…,7) table with an
    // unlisted feature is dead to conformant writers
    assert(snap.minReaderVersion === 3 && snap.minWriterVersion === 7)
    assert(Set("deletionVectors", "changeDataFeed")
      .subsetOf(snap.writerFeatures))
    DeltaLog.deleteWhere(spark, root, col("k") % 10 === 2)
    val after = DeltaLog.snapshot(spark, root)
    // the delete rode DVs (no file restaged) AND recorded the feed
    assert(after.adds.map(_.path).toSet === snap.adds.map(_.path).toSet)
    assert(after.adds.head.deletionVector.exists(_.cardinality === 4))
    val ch = DeltaLog.changes(spark, root, 0, after.version)
    assert(ch.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 12L, 22L, 32L))
    // enabling CDF on a LEGACY table raises the writer version to 4
    val root2 = tmp()
    spark.range(0, 4).toDF("k").coalesce(1)
      .write.format("delta-log").save(root2)
    DeltaLog.setConfiguration(spark, root2,
      Map("delta.enableChangeDataFeed" -> "true"))
    val s2 = DeltaLog.snapshot(spark, root2)
    assert(s2.minWriterVersion === 4 && s2.minReaderVersion === 1)
  }

  test("enabling DVs on an existing table upgrades the protocol in-commit") {
    val root = tmp()
    spark.range(0, 40).toDF("k").coalesce(1)
      .write.format("delta-log").save(root)
    val v0 = DeltaLog.snapshot(spark, root)
    assert(v0.minWriterVersion === 2)
    DeltaLog.setConfiguration(spark, root,
      Map("delta.enableDeletionVectors" -> "true"))
    val v1 = DeltaLog.snapshot(spark, root)
    assert(v1.minReaderVersion === 3 && v1.minWriterVersion === 7)
    // legacy-implied features stay listed (spec upgrade rule)
    assert(Set("appendOnly", "invariants", "deletionVectors")
      .subsetOf(v1.writerFeatures))
    DeltaLog.deleteWhere(spark, root, col("k") === 5)
    val v2 = DeltaLog.snapshot(spark, root)
    assert(v2.adds.map(_.path).toSet === v0.adds.map(_.path).toSet)
    assert(v2.adds.head.deletionVector.exists(_.cardinality === 1L))
    assert(spark.read.format("delta-log").load(root).count() === 39)
  }
}
