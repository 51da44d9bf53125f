package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[DeltaLog.compact]] — OPTIMIZE/REORG-PURGE for Delta tables: file
  *-count reduction and DV materialization as a `dataChange: false`
  * commit that rows, streams, and time travel all agree is a no-op. */
class DeltaCompactSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("delta_compact_").toString

  test("compaction packs files; rows identical; streams see nothing") {
    val root = tmp()
    (0 until 4).foreach(i =>
      DeltaLog.commit(spark.range(i * 5L, i * 5L + 5).toDF("k")
        .coalesce(1), root))
    assert(DeltaLog.snapshot(spark, root).adds.size === 4)
    // a tail running across the compaction must deliver NOTHING
    val q = spark.readStream.format("delta-log")
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("dc_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val v = DeltaLog.compact(spark, root)
      val snap = DeltaLog.snapshot(spark, root)
      assert(snap.version === v && snap.adds.size === 1)
      q.processAllAvailable() // no refusal, no rows — dataChange: false
      assert(spark.sql("SELECT count(*) FROM dc_tail").as[Long]
        .head() === 0L)
    } finally q.stop()
    assert(spark.read.format("delta-log").load(root)
      .select("k").as[Long].collect().sorted.toSeq === (0L until 20L))
    // pre-compaction version still time-travels
    assert(spark.read.format("delta-log").option("versionAsOf", "3")
      .load(root).count() === 20)
    // idempotent: already-compact table commits nothing
    val v2 = DeltaLog.compact(spark, root)
    assert(v2 === DeltaLog.snapshot(spark, root).version)
  }

  test("compaction materializes deletion vectors (REORG PURGE)") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k").coalesce(1), root)
    // attach a DV deleting positions 2 and 5 of the single file
    val a = DeltaLog.snapshot(spark, root).adds.head
    val d = DeletionVectors.writeFile(root, Array(2L, 5L))
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      f"${1L}%020d.json"),
      (s"""{"add":{"path":"${a.path}","partitionValues":{},"size":${a.size},"modificationTime":0,"dataChange":false,"deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(DeltaLog.snapshot(spark, root).adds
      .exists(_.deletionVector.isDefined))
    DeltaLog.compact(spark, root)
    val snap = DeltaLog.snapshot(spark, root)
    // descriptors gone, rows stay deleted — DV-less readers work again
    assert(snap.adds.forall(_.deletionVector.isEmpty))
    assert(spark.read.format("delta-log").load(root)
      .select("k").as[Long].collect().sorted.toSeq ===
      (0L until 10L).filterNot(k => k == 2 || k == 5))
  }

  test("partitioned compaction keeps partition values; mapped refuses") {
    val root = tmp()
    (0 until 3).foreach(_ =>
      DeltaLog.commit(spark.range(0, 6).toDF("k")
        .withColumn("p", col("k") % 2).repartition(col("p")),
        root, partitionBy = Seq("p")))
    assert(DeltaLog.snapshot(spark, root).adds.size === 6)
    DeltaLog.compact(spark, root)
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.adds.size === 2)
    assert(snap.adds.map(_.partitionValues("p")).sorted === Seq("0", "1"))
    val ds = spark.read.format("delta-log").load(root)
    assert(ds.count() === 18)
    assert(ds.filter(col("p") === 1).count() === 9)
    // pruning still exact after compaction
    val q = ds.filter(col("p") === 0)
    q.count()
    // a column-mapped EMPTY table compacts as a no-op (round 8:
    // mapped tables compact in physical space — the real mapped
    // compaction is covered by DeltaColumnMappingSpec)
    val mroot = tmp()
    val mlog = java.nio.file.Paths.get(mroot, "_delta_log")
    Files.createDirectories(mlog)
    val mschema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col-aa\"}}]}"""
    Files.write(mlog.resolve(f"${0L}%020d.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" + "\n" +
        s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":"$mschema","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(DeltaLog.compact(spark, mroot) === 0L) // already compact
  }

  test("OPTIMIZE ZORDER BY: 2-D bounding boxes, both dimensions prune") {
    val root = Files.createTempDirectory("delta_z_").toString
    // rows arrive ordered by x alone — y bounds are useless pre-zorder
    DeltaLog.commit(
      spark.range(0, 4096).toDF("i")
        .withColumn("x", col("i") % 64)
        .withColumn("y", (col("i") / lit(64)).cast("long"))
        .withColumn("v", col("x") * 1000 + col("y"))
        .repartitionByRange(8, col("i")).drop("i"), root)
    spark.sql(s"GRAFT OPTIMIZE DELTA '$root' ZORDER BY x, y FILES 8")
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.adds.size === 8)
    def kept(c: String, lo: Int, hi: Int): (Int, Int) = {
      val q = spark.read.format("delta-log").load(root)
        .filter(col(c) >= lo && col(c) <= hi)
      assert(q.count() === 64L * (hi - lo + 1))
      val idx = q.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            hr: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => hr.location.asInstanceOf[DeltaLogFileIndex]
      }.head
      idx.lastListing.get
    }
    // a narrow range on EITHER dimension prunes files (the z-layout's
    // per-file min/max are tight boxes in both)
    val (kx, tx) = kept("x", 3, 6)
    assert(tx === 8 && kx < 8, s"x-range kept $kx/$tx")
    val (ky, ty) = kept("y", 3, 6)
    assert(ty === 8 && ky < 8, s"y-range kept $ky/$ty")
    // rows identical through the rewrite
    assert(spark.read.format("delta-log").load(root)
      .agg(sum("v")).as[Long].head() ===
      (0 until 4096).map(i => (i % 64) * 1000L + (i / 64)).sum)
    // refusals: partitioned target, unknown column
    val pr = Files.createTempDirectory("delta_zp_").toString
    DeltaLog.commit(spark.range(0, 8).toDF("k")
      .withColumn("p", col("k") % 2), pr, partitionBy = Seq("p"))
    assert(intercept[IllegalArgumentException] {
      DeltaLog.compact(spark, pr, 2, Some(("k", "p")))
    }.getMessage.contains("partitioned"))
    assert(intercept[IllegalArgumentException] {
      DeltaLog.compact(spark, root, 2, Some(("x", "nope")))
    }.getMessage.contains("nope"))
  }
}
