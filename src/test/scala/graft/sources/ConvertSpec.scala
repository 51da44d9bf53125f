package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CONVERT (foreign lakehouse table → graft, one metadata commit):
  * [[VersionedTable.importDelta]] / [[VersionedTable.importIceberg]].
  * The import must be zero-copy (ext: refs), carry the source's
  * per-file stats into graft's skipping model, leave the source's
  * files untouched by vacuum, and produce a FULL graft table that
  * accepts commits on top. */
class ConvertSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_conv_").toString

  test("importDelta: zero-copy, stats imported, live graft table on top") {
    val deltaRoot = tmp()
    // 4 range-disjoint files via 4 Delta commits
    (0 until 4).foreach { i =>
      DeltaLog.commit(
        spark.range(16 * i, 16 * i + 16).toDF("k")
          .withColumn("v", col("k") * 10).coalesce(1), deltaRoot)
    }
    val graftRoot = tmp()
    val v0 = VersionedTable.importDelta(spark, deltaRoot, graftRoot)
    assert(v0 === 0L)
    // zero-copy: every graft ref is ext:, no data dir was created
    val files = VersionedTable.snapshotFiles(graftRoot, 0L)
    assert(files.nonEmpty && files.forall(_.startsWith("ext:")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(graftRoot, "data")))
    // reads equal the Delta read
    assert(VersionedTable.read(spark, graftRoot).orderBy("k")
      .collect().toSeq ===
      spark.read.format("delta-log").load(deltaRoot).orderBy("k")
        .collect().toSeq)
    // imported stats drive file skipping
    val (kept, total) = VersionedTable.pruneFiles(graftRoot, 0L, "k",
      Some(20L), Some(25L))
    assert(total === 4 && kept.size === 1, s"got ${kept.size}/$total")
    // ...and the datasource scan path prunes through them too
    val q = spark.read.format("graft").load(graftRoot)
      .filter(col("k") >= 20 && col("k") <= 25)
    assert(q.agg(sum("v")).as[Long].head() === (20 to 25).map(_ * 10).sum)
    // a LIVE graft table: append on top, both slices answer
    VersionedTable.commit(
      Seq((1000L, 1L)).toDF("k", "v"), graftRoot)
    assert(VersionedTable.read(spark, graftRoot).count() === 65)
    // vacuum must never reach through ext: refs into the source
    VersionedTable.vacuum(graftRoot,
      retain = VersionedTable.latestVersion(graftRoot), minAgeMs = 0L)
    assert(spark.read.format("delta-log").load(deltaRoot).count() === 64,
      "vacuum deleted source files through an ext: ref")
  }

  test("importDelta refuses partitioned Delta tables (files lack the column)") {
    val deltaRoot = tmp()
    DeltaLog.commit(
      spark.range(0, 8).toDF("k").withColumn("p", (col("k") % 2).cast("int")),
      deltaRoot, partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.importDelta(spark, deltaRoot, tmp())
    }
    assert(e.getMessage.contains("partitioned"))
  }

  test("GRAFT CONVERT SQL statements lower to the import commands") {
    val deltaRoot = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k").coalesce(1), deltaRoot)
    val dst1 = tmp() + "/t"
    val v = spark.sql(s"GRAFT CONVERT DELTA '$deltaRoot' TO '$dst1'")
      .collect().head.getLong(0)
    assert(v === 0L)
    assert(VersionedTable.read(spark, dst1).count() === 10)
    val iceRoot = tmp()
    IcebergMeta.writeFixture(spark.range(0, 5).toDF("k"), iceRoot)
    val dst2 = tmp() + "/t"
    spark.sql(s"GRAFT CONVERT ICEBERG '$iceRoot' TO '$dst2'")
    assert(VersionedTable.read(spark, dst2).count() === 5)
  }

  test("importIceberg: zero-copy with manifest bounds as graft stats") {
    val iceRoot = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 64).toDF("k").withColumn("v", col("k") * 10)
        .repartitionByRange(4, col("k")), iceRoot)
    val graftRoot = tmp()
    VersionedTable.importIceberg(spark, iceRoot, graftRoot)
    assert(VersionedTable.read(spark, graftRoot).count() === 64)
    val (kept, total) = VersionedTable.pruneFiles(graftRoot, 0L, "k",
      Some(40L), Some(47L))
    assert(total === 4 && kept.size === 1, s"got ${kept.size}/$total")
    // DML works on the imported table: a copy-on-write DELETE rewrites
    // only the touched ext file into a LOCAL file, others stay ext:
    VersionedTable.deleteRanges(spark, graftRoot,
      Seq(("k", Some(20L), Some(25L))))
    val now = VersionedTable.read(spark, graftRoot)
    assert(now.count() === 58)
    val filesNow = VersionedTable.snapshotFiles(graftRoot,
      VersionedTable.latestVersion(graftRoot))
    assert(filesNow.count(_.startsWith("ext:")) === 3)
    assert(filesNow.exists(!_.startsWith("ext:")))
  }
}
