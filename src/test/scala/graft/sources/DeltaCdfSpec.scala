package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Delta CHANGE DATA FEED ([[DeltaLog.changes]] + the
  * `delta_changes` TVF): derived inserts/deletes, cdc actions written
  * by the CDF-enabled COW delete and read back as the authoritative
  * change set, and the not-recorded refusal. */
class DeltaCdfSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("delta_cdf_").toString

  private def enableCdf(root: String): Unit =
    DeltaLog.setConfiguration(spark, root,
      Map("delta.enableChangeDataFeed" -> "true"))

  test("derived feed: appends are inserts, remove-only commits are deletes") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 4).toDF("k")
      .withColumn("p", col("k") % 2).repartition(col("p")),
      root, partitionBy = Seq("p"))                       // v0: inserts
    DeltaLog.commit(spark.range(4, 6).toDF("k")
      .withColumn("p", col("k") % 2).repartition(col("p")),
      root, partitionBy = Seq("p"))                       // v1: inserts
    DeltaLog.deleteWhere(spark, root, col("p") === 0)     // v2: remove-only
    val feed = DeltaLog.changes(spark, root, -1L, 2L)
    assert(feed.columns.toSeq ===
      Seq("k", "p", "_change_type", "_commit_version"))
    val rows = feed.select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(rows === Set(
      (0L, "insert", 0L), (1L, "insert", 0L), (2L, "insert", 0L),
      (3L, "insert", 0L), (4L, "insert", 1L), (5L, "insert", 1L),
      (0L, "delete", 2L), (2L, "delete", 2L), (4L, "delete", 2L)))
    // range (1, 2]: only the delete
    assert(DeltaLog.changes(spark, root, 1L, 2L)
      .select("_change_type").distinct().as[String]
      .collect().toSeq === Seq("delete"))
    // compaction emits NO feed rows (dataChange: false)
    DeltaLog.compact(spark, root)
    assert(DeltaLog.changes(spark, root, 2L,
      DeltaLog.snapshot(spark, root).version).count() === 0L)
  }

  test("CDF-enabled COW delete writes cdc actions; reader trusts them") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k").coalesce(1), root) // v0
    enableCdf(root)                                                  // v1
    val v = DeltaLog.deleteWhere(spark, root, col("k") % 3 === 0)    // v2
    // the commit carries cdc actions under _change_data/
    val ca = DeltaLog.commitActions(root, v)
    assert(ca.cdcFiles.nonEmpty)
    assert(ca.cdcFiles.forall(_.path.startsWith("_change_data/")))
    assert(ca.adds.nonEmpty && ca.dataChangingRemoves) // rewrite shape
    // without cdc this remove+add commit would REFUSE; with them the
    // feed is exactly the deleted rows
    val feed = DeltaLog.changes(spark, root, v - 1, v)
    assert(feed.select("k", "_change_type").as[(Long, String)]
      .collect().toSet ===
      Set((0L, "delete"), (3L, "delete"), (6L, "delete"), (9L, "delete")))
    // the table itself reads correctly after the CDF delete
    assert(spark.read.format("delta-log").load(root).count() === 6L)
  }

  test("CDF-enabled MERGE records every clause kind; carry-overs nothing") {
    import graft.sources.{VersionedTable => VT}
    val root = tmp()
    DeltaLog.commit(spark.range(0, 8).toDF("k")
      .withColumn("v", col("k") * 10).coalesce(1), root)   // v0
    enableCdf(root)                                         // v1
    val src = Seq((1L, 111L), (3L, -1L), (20L, 200L), (30L, -5L))
      .toDF("k", "nv")
    val v = DeltaLog.mergeConditional(spark, root, src, "k", "k",
      matched = Seq(
        VT.MergeDelete(Some(VT.MergeRef.source("nv") < 0)),
        VT.MergeUpdate(None, Map("v" -> VT.MergeRef.source("nv")))),
      notMatched = Seq(VT.MergeInsert(
        Some(VT.MergeRef.source("nv") >= 0),
        Map("k" -> VT.MergeRef.source("k"), "v" -> VT.MergeRef.source("nv")))))
    // k=1 updated 10→111, k=3 deleted, k=20 inserted, k=30 skipped
    val feed = DeltaLog.changes(spark, root, v - 1, v)
      .select("k", "v", "_change_type").as[(Long, Long, String)]
      .collect().toSet
    assert(feed === Set(
      (1L, 10L, "update_preimage"), (1L, 111L, "update_postimage"),
      (3L, 30L, "delete"),
      (20L, 200L, "insert")))
    // carry-over rows (0,2,4..7) recorded nothing, but the table moved
    val now = spark.read.format("delta-log").load(root)
    assert(now.count() === 8L) // 8 - 1 delete + 1 insert
    assert(now.filter(col("k") === 1).select("v").as[Long].head() === 111L)
    // a merge where NO clause fires commits nothing at all
    val v2 = DeltaLog.mergeConditional(spark, root,
      Seq((99L, -1L)).toDF("k", "nv"), "k", "k",
      notMatched = Seq(VT.MergeInsert(
        Some(VT.MergeRef.source("nv") >= 0),
        Map("k" -> VT.MergeRef.source("k"), "v" -> VT.MergeRef.source("nv")))))
    assert(v2 === v)
  }

  test("rewrite without cdc refuses; TVF serves the feed in SQL") {
    val root = tmp()
    DeltaLog.commit(spark.range(0, 10).toDF("k").coalesce(1), root) // v0
    val v = DeltaLog.deleteWhere(spark, root, col("k") === 3)       // v1: rewrite, no CDF
    val e = intercept[IllegalStateException] {
      DeltaLog.changes(spark, root, 0L, v).count()
    }
    assert(e.getMessage.contains("enableChangeDataFeed"))
    // the TVF reads a derivable range
    assert(spark.sql(
      s"SELECT count(*) AS c FROM delta_changes('$root', -1, 0)")
      .as[Long].head() === 10L)
  }
}
