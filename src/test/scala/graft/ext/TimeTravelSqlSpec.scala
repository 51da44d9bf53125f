package graft.ext

import graft.SparkSpecBase
import graft.sources.{DeltaLog, VersionedTable}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** SQL time travel (`FROM t VERSION AS OF n` / `TIMESTAMP AS OF ts`)
  * through the parse-time placeholder + resolution rule
  * ([[GraftTimeTravelParse]]/[[GraftTimeTravelResolve]]): numeric
  * versions, tag names, timestamp literals, interop providers, the
  * untouched fallback for non-graft tables, and join/star expansion
  * against the pinned schema. */
class TimeTravelSqlSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tt_sql_").toString

  private def drop(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  test("VERSION AS OF pins a graft catalog table to a snapshot") {
    val root = tmp()
    VersionedTable.commit(spark.range(0, 10).toDF("k"), root)
    VersionedTable.commit(spark.range(10, 25).toDF("k"), root)
    spark.sql(s"CREATE TABLE tt_g USING graft OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT count(*) AS c FROM tt_g VERSION AS OF 0")
        .as[Long].head() === 10L)
      assert(spark.sql("SELECT count(*) AS c FROM tt_g VERSION AS OF 1")
        .as[Long].head() === 25L)
      // star expansion + aggregation resolve against the pinned plan
      assert(spark.sql(
        "SELECT * FROM tt_g VERSION AS OF 0 ORDER BY k DESC LIMIT 1")
        .as[Long].head() === 9L)
      // a joined current-vs-past query: rows added since v0
      assert(spark.sql(
        """SELECT count(*) AS c FROM tt_g cur
          |LEFT ANTI JOIN (SELECT k FROM tt_g VERSION AS OF 0) old
          |ON cur.k = old.k""".stripMargin).as[Long].head() === 15L)
      // out-of-range version refuses loudly
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM tt_g VERSION AS OF 9").collect()
      }
      assert(e.getMessage.contains("out of range"))
    } finally drop("tt_g")
  }

  test("VERSION AS OF a tag name; TIMESTAMP AS OF a literal") {
    val root = tmp()
    VersionedTable.commit(spark.range(0, 5).toDF("k"), root)
    spark.sql(s"GRAFT TAG '$root' CREATE v-zero VERSION AS OF 0")
    VersionedTable.commit(spark.range(5, 9).toDF("k"), root)
    spark.sql(s"CREATE TABLE tt_tag USING graft OPTIONS (path '$root')")
    try {
      assert(spark.sql(
        "SELECT count(*) AS c FROM tt_tag VERSION AS OF 'v-zero'")
        .as[Long].head() === 5L)
      // a timestamp after the last commit resolves to the latest snapshot
      assert(spark.sql(
        "SELECT count(*) AS c FROM tt_tag TIMESTAMP AS OF '2099-01-01'")
        .as[Long].head() === 9L)
      // foldable expressions evaluate once at analysis (Delta allows
      // these too) — current time + a day is after the last commit
      assert(spark.sql(
        """SELECT count(*) AS c FROM tt_tag
          |TIMESTAMP AS OF current_timestamp() + INTERVAL 1 DAY"""
          .stripMargin).as[Long].head() === 9L)
      // an unreadable timestamp literal refuses loudly
      val e = intercept[Exception] {
        spark.sql(
          "SELECT * FROM tt_tag TIMESTAMP AS OF 'not-a-timestamp'")
          .collect()
      }
      assert(e.getMessage.contains("cannot read") ||
        e.getMessage.contains("CAST_INVALID_INPUT"))
    } finally drop("tt_tag")
  }

  test("VERSION AS OF on delta-log and iceberg-meta catalog tables") {
    val dRoot = tmp()
    DeltaLog.commit(spark.range(0, 6).toDF("k").coalesce(1), dRoot)
    DeltaLog.commit(spark.range(6, 10).toDF("k").coalesce(1), dRoot)
    spark.sql(s"CREATE TABLE tt_d USING `delta-log` OPTIONS (path '$dRoot')")
    val iRoot = tmp() + "/t"
    val snap0 = graft.sources.IcebergMeta.writeFixture(
      spark.range(0, 7).toDF("k"), iRoot)
    graft.sources.IcebergMeta.append(
      spark.range(7, 12).toDF("k"), iRoot)
    spark.sql(s"CREATE TABLE tt_i USING `iceberg-meta` OPTIONS (path '$iRoot')")
    try {
      assert(spark.sql("SELECT count(*) AS c FROM tt_d VERSION AS OF 0")
        .as[Long].head() === 6L)
      assert(spark.sql("SELECT count(*) AS c FROM tt_d").as[Long].head() === 10L)
      assert(spark.sql(
        s"SELECT count(*) AS c FROM tt_i VERSION AS OF $snap0")
        .as[Long].head() === 7L)
      assert(spark.sql("SELECT count(*) AS c FROM tt_i").as[Long].head() === 12L)
    } finally { drop("tt_d"); drop("tt_i") }
  }

  test("non-graft tables keep Spark's own time-travel refusal") {
    val root = tmp()
    spark.range(0, 3).toDF("k").write.parquet(root + "/p")
    spark.sql(s"CREATE TABLE tt_pq USING parquet OPTIONS (path '$root/p')")
    try {
      val e = intercept[AnalysisException] {
        spark.sql("SELECT * FROM tt_pq VERSION AS OF 0").collect()
      }
      // Spark's standard error, not ours — fallback restored the node
      assert(!e.getMessage.contains("graft"))
    } finally drop("tt_pq")
  }
}
