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
