package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Puffin NDV statistics ([[Puffin]] theta codec +
  * [[IcebergMeta.writeStatistics]]/[[IcebergMeta.columnNdv]]) and the
  * CBO feed ([[graft.ext.IcebergCboStats]]): round-trips through the
  * metadata `statistics` field, decoding a HAND-WRITTEN foreign
  * Puffin stats file (no `ndv` property — the sketch itself is the
  * authority), and the plan-shape assertion that NDV flips a join
  * build side under the cost-based optimizer. */
class IcebergStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("ice_stats_").toString + "/t"

  test("theta codec: estimates decode across empty/single/exact/estimation") {
    assert(Puffin.thetaEstimate(Puffin.encodeThetaSketch(0L)) === 0L)
    assert(Puffin.thetaEstimate(Puffin.encodeThetaSketch(1L)) === 1L)
    assert(Puffin.thetaEstimate(Puffin.encodeThetaSketch(77L)) === 77L)
    assert(Puffin.thetaEstimate(Puffin.encodeThetaSketch(4096L)) === 4096L)
    val est = Puffin.thetaEstimate(Puffin.encodeThetaSketch(1000000L))
    assert(math.abs(est - 1000000L) <= 1L, s"estimation-mode decode $est")
    // refusals: wrong serVer, big-endian, non-compact family
    val bad = Puffin.encodeThetaSketch(77L).clone()
    bad(1) = 2
    assert(intercept[IllegalArgumentException] {
      Puffin.thetaEstimate(bad)
    }.getMessage.contains("version"))
  }

  test("ANALYZE round-trip: statistics entry, columnNdv, snapshot keying") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 1000).toDF("k")
        .withColumn("bucket", col("k") % 10)
        .withColumn("label", concat(lit("v"), col("k") % 100))
        .coalesce(1), root)
    // EXACT mode: count(DISTINCT) — deterministic round-trip
    val written = IcebergMeta.writeStatistics(spark, root, exact = true)
    assert(written === Map("k" -> 1000L, "bucket" -> 10L,
      "label" -> 100L))
    assert(IcebergMeta.columnNdv(root) === written)
    // stats survive in the document; a new snapshot has no EXACT
    // entry but falls back to the most recent one (estimate contract)
    IcebergMeta.append(spark.range(1000, 1100).toDF("k")
      .withColumn("bucket", col("k") % 10)
      .withColumn("label", concat(lit("v"), col("k") % 100))
      .coalesce(1), root)
    assert(IcebergMeta.columnNdv(root) === written)
    // re-ANALYZE after the append replaces the fallback with fresh
    // numbers keyed to the new snapshot
    val w2 = IcebergMeta.writeStatistics(spark, root, exact = true)
    assert(w2("k") === 1100L)
    assert(IcebergMeta.columnNdv(root) === w2)
    // column subset + SQL surface (approx mode: HLL++, exact at this
    // cardinality)
    val viaSql = spark.sql(
      s"GRAFT ANALYZE ICEBERG '$root' FOR COLUMNS bucket EXACT")
      .as[(String, Long)].collect().toMap
    assert(viaSql === Map("bucket" -> 10L))
    // unknown / unsketchable columns refuse
    assert(intercept[IllegalArgumentException] {
      IcebergMeta.writeStatistics(spark, root, Seq("nope"))
    }.getMessage.contains("no column"))
  }

  test("compact/overwrite withStats refresh the published NDV") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 200).toDF("k")
        .withColumn("bucket", col("k") % 8).coalesce(1), root)
    IcebergMeta.writeStatistics(spark, root, exact = true)
    assert(IcebergMeta.columnNdv(root) === Map("k" -> 200L,
      "bucket" -> 8L))
    IcebergMeta.append(spark.range(200, 300).toDF("k")
      .withColumn("bucket", col("k") % 8).coalesce(1), root)
    // compact with withStats republishes for the NEW snapshot (approx
    // mode — HLL++ is tolerance-checked, not bit-pinned)
    IcebergMeta.compact(spark, root, withStats = true)
    val afterCompact = IcebergMeta.columnNdv(root)
    assert(math.abs(afterCompact("k") - 300L) <= 16L &&
      afterCompact("bucket") === 8L, s"got $afterCompact")
    // overwrite with withStats sketches the REPLACEMENT (read back
    // from the landed files, never recomputing the incoming frame)
    IcebergMeta.overwrite(spark, root,
      spark.range(0, 50).toDF("k")
        .withColumn("bucket", col("k") % 4).coalesce(1),
      withStats = true)
    val afterOverwrite = IcebergMeta.columnNdv(root)
    assert(math.abs(afterOverwrite("k") - 50L) <= 4L &&
      afterOverwrite("bucket") === 4L, s"got $afterOverwrite")
  }

  test("hand-written FOREIGN Puffin stats file decodes through the sketch") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 20).toDF("k").coalesce(1), root)
    val sid = IcebergMeta.snapshot(root).snapshotId
    // compose the Puffin file BYTE BY BYTE, the way a foreign engine
    // would: one exact-mode compact theta sketch (retained 7 ⇒ NDV
    // 7), footer WITHOUT the ndv property — the decoder is the only
    // path to the number
    val sketch = {
      val bb = ByteBuffer.allocate(16 + 7 * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte).put(3.toByte).put(3.toByte) // preLongs serVer fam
        .put(12.toByte).put(0.toByte)
        .put((0x02 | 0x08 | 0x10).toByte)          // readOnly|compact|ordered
        .putShort(0x93cc.toShort)
      bb.putInt(7).putFloat(1.0f)
      (1 to 7).foreach(i => bb.putLong(i.toLong * 1000000007L))
      bb.array()
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Puffin.Magic)
    val off = out.size().toLong
    out.write(sketch)
    val footerJson =
      s"""{"blobs":[{"type":"apache-datasketches-theta-v1",
         |"fields":[1],"snapshot-id":$sid,"sequence-number":1,
         |"offset":$off,"length":${sketch.length}}]}"""
        .stripMargin.replaceAll("\n", "")
    out.write(Puffin.Magic)
    out.write(footerJson.getBytes(UTF_8))
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(footerJson.getBytes(UTF_8).length).array())
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(Puffin.Magic)
    Files.write(Paths.get(root, "metadata", "foreign.stats"),
      out.toByteArray)
    // splice the StatisticsFile entry into the metadata document
    val metaPath = Paths.get(root,
      s"metadata/v${IcebergMeta.latestMetadataVersion(root)}.metadata.json")
    val doc = new String(Files.readAllBytes(metaPath), UTF_8)
    Files.write(metaPath, doc.replaceFirst(
      """\{"format-version":2,""",
      s"""{"format-version":2,"statistics":[{"snapshot-id":$sid,
         |"statistics-path":"metadata/foreign.stats",
         |"file-size-in-bytes":${out.size()},
         |"file-footer-size-in-bytes":1,
         |"blob-metadata":[{"type":"apache-datasketches-theta-v1",
         |"snapshot-id":$sid,"sequence-number":1,"fields":[1]}]}],"""
        .stripMargin.replaceAll("\n", "")).getBytes(UTF_8))
    assert(IcebergMeta.columnNdv(root) === Map("k" -> 7L))
  }

  test("re-ANALYZE on an unchanged snapshot refreshes the CBO cache; statistics-path is absolute") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 100).toDF("k")
        .withColumn("bucket", col("k") % 10).coalesce(1), root)
    def attrNdv(): Map[String, BigInt] = {
      val df = spark.read.format("iceberg-meta").load(root)
      df.queryExecution.optimizedPlan.stats.attributeStats
        .map { case (a, cs) => a.name -> cs.distinctCount.get }.toMap
    }
    val saved = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      IcebergMeta.writeStatistics(spark, root, Seq("k"), exact = true)
      assert(attrNdv() === Map("k" -> BigInt(100))) // cache populated
      // ANALYZE again on the SAME snapshot (no data moved) with a
      // different column set: writeStatistics REPLACES the snapshot's
      // statistics entry, so the (root, snapshot) CBO cache must drop
      // its stale NDVs — the very next plan sees the new numbers
      IcebergMeta.writeStatistics(spark, root, Seq("bucket"),
        exact = true)
      assert(attrNdv() === Map("bucket" -> BigInt(10)))
    } finally spark.conf.set("spark.sql.cbo.enabled", saved)
    // the published StatisticsFile carries a FULL location (the
    // spec's contract — a foreign engine resolves it as-is), and the
    // reader still resolves it
    val doc = Files.readString(Paths.get(root, "metadata",
      s"v${IcebergMeta.latestMetadataVersion(root)}.metadata.json"))
    val pathRe = """"statistics-path"\s*:\s*"([^"]+)"""".r
    val rec = pathRe.findFirstMatchIn(doc).get.group(1)
    assert(rec.startsWith("/"), s"statistics-path not absolute: $rec")
    assert(IcebergMeta.columnNdv(root) === Map("bucket" -> 10L))
  }

  test("NDV flips the join build side under the CBO") {
    val factRoot = tmp()
    val dimRoot = tmp()
    // fact: 40k rows, hk is unique (NDV 40000); dim: 8k rows — both
    // files comfortably above the broadcast threshold below
    IcebergMeta.writeFixture(
      spark.range(0, 40000).toDF("hk")
        .withColumn("jk", col("hk") % 8000)
        .withColumn("pad", concat(lit("x"), col("hk"))).coalesce(1),
      factRoot)
    IcebergMeta.writeFixture(
      spark.range(0, 8000).toDF("jk")
        .withColumn("dpad", concat(lit("y"), col("jk"))).coalesce(1),
      dimRoot)
    def planOf(): String = {
      val fact = spark.read.format("iceberg-meta").load(factRoot)
        .filter(col("hk") === 123L)
      val dim = spark.read.format("iceberg-meta").load(dimRoot)
      fact.join(dim, "jk").queryExecution.executedPlan.toString
    }
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // without statistics the filtered fact still estimates at its
      // full file size (> threshold on both sides) → shuffle join
      val before = planOf()
      assert(before.contains("SortMergeJoin") &&
        !before.contains("BroadcastHashJoin"),
        s"expected a shuffle join without stats, got:\n$before")
      // ANALYZE publishes NDV; the equality filter on hk now
      // estimates rowCount/NDV(hk) = 1 row → the fact side
      // broadcasts
      IcebergMeta.writeStatistics(spark, factRoot)
      val after = planOf()
      assert(after.contains("BroadcastHashJoin"),
        s"expected NDV stats to flip the build side, got:\n$after")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
