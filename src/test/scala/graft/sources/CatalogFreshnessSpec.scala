package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Freshness contract of graft relations when the underlying table
  * advances outside the session: unpinned relations re-resolve the
  * log head per query (the Delta behavior — no REFRESH TABLE for data
  * changes); explicitly pinned snapshots never move; feature gates
  * re-fire on refresh so an external MOR delete cannot slip wrong
  * rows past a cached relation. */
class CatalogFreshnessSpec extends SparkSpecBase {
  import spark.implicits._

  test("catalog table reads fresh data after external commits") {
    val root = Files.createTempDirectory("graft_fresh_").toString
    VersionedTable.commit(Seq(1L).toDF("k"), root)
    spark.sql("DROP TABLE IF EXISTS g_fresh")
    spark.sql(s"CREATE TABLE g_fresh USING graft OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT count(*) FROM g_fresh").as[Long].head() === 1)
      VersionedTable.commit(Seq(2L).toDF("k"), root) // external commit
      assert(spark.sql("SELECT count(*) FROM g_fresh").as[Long].head() === 2,
        "cached relation must serve the new snapshot without REFRESH")
      // add-only schema evolution: old projection stays valid, new
      // rows appear; the new column waits for a re-resolution
      VersionedTable.commit(Seq((3L, "x")).toDF("k", "s"), root)
      assert(spark.sql("SELECT count(*) FROM g_fresh").as[Long].head() === 3)
      assert(spark.sql("SELECT * FROM g_fresh").columns.toSeq === Seq("k"))
    } finally spark.sql("DROP TABLE IF EXISTS g_fresh")
  }

  test("pinned snapshots never move; gates re-fire on refresh") {
    val root = Files.createTempDirectory("graft_pin_").toString
    VersionedTable.commit(Seq(1L).toDF("k"), root)
    val pinned = spark.read.format("graft").option("versionAsOf", 0)
      .load(root)
    VersionedTable.commit(Seq(2L).toDF("k"), root)
    assert(pinned.count() === 1, "versionAsOf must stay pinned")
    val live = spark.read.format("graft").load(root)
    assert(live.count() === 2)
    // an EXTERNAL MOR delete lands after the relation was resolved:
    // the next query re-analyzes, the GraftMorScan rewrite resolves the
    // tombstone — the deleted row is gone, never silently included
    VersionedTable.deleteKeysMOR(spark, root, "k", Seq(1L).toDF("k"))
    assert(live.count() === 1)
    assert(live.select("k").as[Long].collect().toSeq === Seq(2L))
  }
}
