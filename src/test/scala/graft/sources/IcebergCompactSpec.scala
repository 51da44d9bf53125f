package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[IcebergMeta.compact]] — the rewrite_data_files maintenance
  * action: delete materialization, refusal-loop closure (CONVERT,
  * positional-after-equality), time travel, and the stream posture. */
class IcebergCompactSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("ice_cpt_spec_").toString + "/t"

  test("compact materializes deletes into a carried-nothing snapshot") {
    val root = tmp()
    val snap0 = IcebergMeta.writeFixture(
      spark.range(0, 12).toDF("k").withColumn("cat",
        when(col("k") % 3 === 0, "a").otherwise("b")), root)
    IcebergMeta.delete(spark, root, col("k") === 1)           // positional
    IcebergMeta.deleteEquality(spark, root, Seq("a").toDF("cat")) // equality
    IcebergMeta.compact(spark, root)
    val snap = IcebergMeta.snapshot(root)
    assert(snap.deletes.isEmpty && snap.eqDeletes.isEmpty)
    assert(snap.files.size === 1)
    assert(snap.files.head.recordedPath.contains("compact-"))
    val want = (0L until 12L).filterNot(k => k == 1 || k % 3 == 0)
    assert(spark.read.format("iceberg-meta").load(root)
      .select("k").as[Long].collect().sorted.toSeq === want)
    // the refusal loops reopen: positional DELETE works again...
    IcebergMeta.delete(spark, root, col("k") === 2)
    assert(spark.read.format("iceberg-meta").load(root).count() ===
      want.size - 1)
    // ...and time travel still reads the ORIGINAL snapshot in full
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", snap0.toString).load(root).count() === 12)
  }

  test("compact unlocks CONVERT of a formerly delete-carrying table") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("cat", lit("x")), root)
    IcebergMeta.deleteEquality(spark, root, Seq("x").toDF("cat"))
    IcebergMeta.append(
      spark.range(50, 55).toDF("k").withColumn("cat", lit("y")), root)
    val g1 = Files.createTempDirectory("cpt_conv_").toString + "/g1"
    intercept[IllegalArgumentException] {
      VersionedTable.importIceberg(spark, root, g1)
    }
    IcebergMeta.compact(spark, root)
    val g2 = Files.createTempDirectory("cpt_conv_").toString + "/g2"
    VersionedTable.importIceberg(spark, root, g2)
    assert(VersionedTable.read(spark, g2).select("k").as[Long]
      .collect().sorted.toSeq === (50L until 55L))
  }

  test("z-order compaction: both dimensions prune after the rewrite") {
    val root = Files.createTempDirectory("ice_z_").toString + "/t"
    IcebergMeta.writeFixture(
      spark.range(0, 4096).toDF("i")
        .withColumn("x", col("i") % 64)
        .withColumn("y", (col("i") / lit(64)).cast("long"))
        .drop("i").repartitionByRange(8, col("x")), root)
    spark.sql(s"GRAFT OPTIMIZE ICEBERG '$root' ZORDER BY x, y FILES 8")
    val snap = IcebergMeta.snapshot(root)
    assert(snap.files.size === 8)
    def kept(c: String): (Int, Int) = {
      val q = spark.read.format("iceberg-meta").load(root)
        .filter(col(c) >= 3 && col(c) <= 6)
      assert(q.count() === 64L * 4)
      val idx = q.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            hr: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => hr.location.asInstanceOf[IcebergMetaFileIndex]
      }.head
      idx.lastListing.get
    }
    val (kx, tx) = kept("x")
    assert(tx === 8 && kx < 8, s"x kept $kx/$tx")
    val (ky, ty) = kept("y")
    assert(ty === 8 && ky < 8, s"y kept $ky/$ty")
    // partitioned spec + zorder refuses
    val pr = Files.createTempDirectory("ice_zp_").toString + "/t"
    IcebergMeta.writeFixture(
      spark.range(0, 8).toDF("k").withColumn("p", col("k") % 2), pr,
      partitionBy = Seq("p"))
    assert(intercept[IllegalArgumentException] {
      IcebergMeta.compact(spark, pr, 2, Some(("k", "p")))
    }.getMessage.contains("partitioned"))
  }
}
