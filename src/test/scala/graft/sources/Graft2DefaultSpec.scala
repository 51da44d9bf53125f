package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The DEFAULT graft read path is DSv2 ([[graft.ext.GraftDsv2Swap]] +
  * [[graft.ext.Graft2Refresh]]): plain reads execute through the
  * public connector API with the VECTORIZED batch reader, at the v1
  * index's exact pruning ratios, while commands, time travel, MOR
  * snapshots and the `spark.graft.readPath=v1` fallback keep the v1
  * machinery. */
class Graft2DefaultSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft2_def_").toString

  private def rangedTable(): String = {
    val root = tmp()
    (0 until 8).foreach { i =>
      VersionedTable.commit(
        spark.range(8 * i, 8 * i + 8).toDF("k")
          .withColumn("v", col("k") * 10).coalesce(1), root)
    }
    root
  }

  private def isV2(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[Graft2Table] => r
    }.nonEmpty

  test("plain reads execute through the vectorized DSv2 scan by default") {
    val root = rangedTable()
    val df = spark.read.format("graft").load(root)
    assert(isV2(df), "default read should be the DSv2 route:\n" +
      df.queryExecution.optimizedPlan.treeString)
    assert(df.orderBy("k").select("k").as[Long].collect().toSeq ===
      (0L until 64L))
    // the physical plan is COLUMNAR: a BatchScan under codegen
    // (execute first — AQE materializes the final plan lazily)
    val agg = df.groupBy().sum("v")
    agg.collect()
    val physical = agg.queryExecution.executedPlan.toString
    assert(physical.contains("BatchScan"), physical)
    // columnar batches feed codegen ('*(n)' = WholeStageCodegen id)
    assert(physical.contains("ColumnarToRow"), physical)
    assert(physical.contains("*(1) "), physical)
    // pruning ratio identical to the v1 index's on the same predicate
    val q = df.filter(col("k") >= 17 && col("k") <= 22)
    assert(q.select(sum("v")).as[Long].head() ===
      (17 to 22).map(_ * 10).sum)
    assert(Graft2DataSource.lastPlanned(root) === ((1, 8)))
    // the fallback restores v1 wholesale
    withReadPathV1 {
      val v1 = spark.read.format("graft").load(root)
      assert(!isV2(v1))
      assert(v1.count() === 64)
    }
  }

  test("catalog SQL goes DSv2; INSERT INTO and REFRESH keep working") {
    val root = rangedTable()
    spark.sql(s"CREATE TABLE g2d_t USING graft OPTIONS (path '$root')")
    try {
      val q = spark.sql("SELECT sum(v) AS s FROM g2d_t WHERE k <= 7")
      assert(isV2(q))
      assert(q.as[Long].head() === (0 to 7).map(_ * 10).sum)
      assert(Graft2DataSource.lastPlanned(root)._1 === 1)
      // writes stay on the commit protocol (v1 lowering)
      spark.sql("INSERT INTO g2d_t VALUES (100, 1000)")
      assert(spark.sql("SELECT count(*) FROM g2d_t").as[Long]
        .head() === 65L)
      // REFRESH TABLE walks the cached v2 relation without blowing up
      spark.sql("REFRESH TABLE g2d_t")
      assert(spark.sql("SELECT count(*) FROM g2d_t").as[Long]
        .head() === 65L)
    } finally spark.sql("DROP TABLE IF EXISTS g2d_t")
  }

  test("freshness: held DataFrames serve external commits and MOR deletes") {
    val root = tmp()
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root)
    val live = spark.read.format("graft").load(root)
    assert(isV2(live) && live.count() === 2)
    // external append: the refresh rule re-points the v2 table
    VersionedTable.commit(Seq(3L).toDF("k"), root)
    assert(live.count() === 3)
    // external MOR delete: the snapshot is v2-ineligible now — the
    // refresh rule swaps BACK to v1 and the MOR rewrite serves it
    VersionedTable.deleteKeysMOR(spark, root, "k", Seq(1L).toDF("k"))
    assert(live.count() === 2)
    assert(live.select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 3L))
    // and a fresh read of the now-clean compacted table is v2 again
    VersionedTable.purgeTombstones(spark, root)
    val fresh = spark.read.format("graft").load(root)
    assert(isV2(fresh) && fresh.count() === 2)
  }

  test("time travel stays pinned; complex types read vectorized") {
    val root = tmp()
    VersionedTable.commit(spark.range(0, 4).toDF("k")
      .withColumn("emb", array(col("k").cast("float"),
        lit(1.0f))), root)
    VersionedTable.commit(spark.range(4, 8).toDF("k")
      .withColumn("emb", array(col("k").cast("float"),
        lit(1.0f))), root)
    // arrays (beyond the old spike's scalar set) read through the
    // vectorized path end to end
    val df = spark.read.format("graft").load(root)
    assert(isV2(df))
    assert(df.select(explode(col("emb"))).count() === 16)
    // pinned time travel keeps v1 semantics (never moves)
    val v0 = spark.read.format("graft").option("versionAsOf", 0)
      .load(root)
    assert(!isV2(v0))
    VersionedTable.commit(spark.range(8, 9).toDF("k")
      .withColumn("emb", array(col("k").cast("float"), lit(1.0f))),
      root)
    assert(v0.count() === 4)
  }
}
