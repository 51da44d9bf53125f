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

  test("INSERT INTO executes through the DSv2 write path") {
    val root = rangedTable()
    spark.sql(s"CREATE TABLE g2w_t USING graft OPTIONS (path '$root')")
    try {
      def writeShape(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.analyzed.collectFirst {
          case _: org.apache.spark.sql.catalyst.plans.logical.AppendData =>
            "append-v2"
          case _: org.apache.spark.sql.catalyst.plans.logical
              .OverwriteByExpression => "overwrite-v2"
          case _: org.apache.spark.sql.execution.datasources
              .InsertIntoDataSourceCommand => "insert-v1"
          case _: graft.ext.GraftInsertCommand => "insert-v1"
        }.getOrElse("?")
      val ins = spark.sql("INSERT INTO g2w_t VALUES (100, 1000), (101, 1010)")
      assert(writeShape(ins) === "append-v2",
        ins.queryExecution.analyzed.treeString)
      assert(spark.sql("SELECT count(*) FROM g2w_t").as[Long]
        .head() === 66L)
      // the staged commit harvested footer stats: the new file prunes
      val q = spark.sql("SELECT sum(v) AS s FROM g2w_t WHERE k >= 100")
      assert(q.as[Long].head() === 2010L)
      // only the insert's file(s) survive pruning — the 8 original
      // files (k <= 63) all skip on the harvested stats
      val (kept, total) = Graft2DataSource.lastPlanned(root)
      assert(total > 8 && kept === total - 8, s"kept $kept of $total")
      // INSERT OVERWRITE lowers to the v2 truncate-write
      val ow = spark.sql("INSERT OVERWRITE g2w_t VALUES (7, 70)")
      assert(writeShape(ow) === "overwrite-v2",
        ow.queryExecution.analyzed.treeString)
      assert(spark.sql("SELECT k, v FROM g2w_t").as[(Long, Long)]
        .collect().toSeq === Seq((7L, 70L)))
      // v1 fallback pins the old lowering
      spark.conf.set("spark.graft.writePath", "v1")
      try {
        val v1ins = spark.sql("INSERT INTO g2w_t VALUES (8, 80)")
        assert(writeShape(v1ins) === "insert-v1",
          v1ins.queryExecution.analyzed.treeString)
        assert(spark.sql("SELECT count(*) FROM g2w_t").as[Long]
          .head() === 2L)
      } finally spark.conf.unset("spark.graft.writePath")
    } finally spark.sql("DROP TABLE IF EXISTS g2w_t")
  }

  test("v2 write: CHECKs enforce; graft2 saves round-trip; renamed tables fall back") {
    // direct datasource writes: fresh-table create, append, overwrite
    val root = tmp() + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .write.format("graft2").mode("append").save(root)
    Seq((3L, "c")).toDF("k", "s")
      .write.format("graft2").mode("append").save(root)
    assert(spark.read.format("graft").load(root).orderBy("k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(VersionedTable.latestVersion(root) === 1L)
    // CHECK constraints gate the staged commit exactly like v1's
    VersionedTable.addCheck(spark, root, "k_small", "k < 100")
    val e = intercept[IllegalArgumentException] {
      Seq((200L, "x")).toDF("k", "s")
        .write.format("graft2").mode("append").save(root)
    }
    assert(e.getMessage.contains("k_small"))
    assert(spark.read.format("graft").load(root).count() === 3)
    // overwrite replaces the file set (and the schema may change)
    Seq((9L, 99L)).toDF("k", "n")
      .write.format("graft2").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).columns.toSeq ===
      Seq("k", "n"))
    // a RENAMED table refuses v2 appends (physical names are the v1
    // writer's job) — and the catalog INSERT keeps working through
    // the v1 fallback the rewrite rule leaves in place
    val r2 = tmp() + "/t2"
    Seq((1L, 10L)).toDF("a", "b").write.format("graft2")
      .mode("append").save(r2)
    VersionedTable.renameColumn(r2, "a", "a2")
    val e2 = intercept[Exception] {
      Seq((2L, 20L)).toDF("a2", "b").write.format("graft2")
        .mode("append").save(r2)
    }
    assert(e2.getMessage.contains("renamed"), e2.getMessage)
    // the v1 API write (which owns the physical rename) still lands
    VersionedTable.commit(Seq((2L, 20L)).toDF("a2", "b"), r2)
    assert(VersionedTable.read(spark, r2).orderBy("a2")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 10L), (2L, 20L)))
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
