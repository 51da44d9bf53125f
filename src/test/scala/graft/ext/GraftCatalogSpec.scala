package graft.ext

import java.nio.file.{Files, Paths}
import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The DSv2 named-catalog surface ([[GraftCatalog]]): every lifecycle
  * step driven purely through `catalog.namespace.table` identifiers —
  * CREATE / INSERT / SELECT / VERSION+TIMESTAMP AS OF / DML / ALTER
  * ADD COLUMNS / RENAME / SHOW / DROP — plus external LOCATION
  * registration and the namespace tree. The underlying roots are
  * ordinary graft tables: path reads and identifier reads serve the
  * same data. */
class GraftCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  private val wh = Files.createTempDirectory("graft_cat_wh_").toString
  private val cat = "graftlake"
  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
  spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)

  test("CREATE -> INSERT -> SELECT -> travel -> DROP purely through identifiers") {
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING)")
    assert(spark.table(s"$cat.db.t").count() === 0)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, 'c' FROM range(3, 6)")
    assert(spark.table(s"$cat.db.t").count() === 5)
    assert(spark.sql(s"SELECT sum(k) AS s FROM $cat.db.t")
      .as[Long].head() === 15L)
    // the identifier resolves to the SAME root a path read serves
    val root = Paths.get(wh, "db", "t").toString
    assert(spark.read.format("graft").load(root).count() === 5)
    // VERSION AS OF through the identifier (v0 = empty CREATE commit,
    // v1 = first insert)
    assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 0")
      .count() === 0)
    assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 1")
      .count() === 2)
    // TIMESTAMP AS OF resolves through the manifest stamps
    assert(spark.sql(
      s"SELECT * FROM $cat.db.t TIMESTAMP AS OF current_timestamp()")
      .count() === 5)
    // INSERT OVERWRITE lowers to the DSv2 truncate+write
    spark.sql(s"INSERT OVERWRITE $cat.db.t VALUES (9, 'z')")
    assert(spark.table(s"$cat.db.t").as[(Long, String)].collect()
      .toSeq === Seq((9L, "z")))
    spark.sql(s"DROP TABLE $cat.db.t")
    assert(!Files.exists(Paths.get(wh, "db", "t")))
    assert(spark.sql(s"SHOW TABLES IN $cat.db").count() === 0)
  }

  test("DML through identifiers: DELETE, UPDATE keep history travelable") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.dml (k BIGINT, v STRING)")
    spark.sql(
      s"INSERT INTO $cat.db.dml SELECT id, concat('v', id) FROM range(10)")
    spark.sql(s"DELETE FROM $cat.db.dml WHERE k % 2 = 0")
    assert(spark.table(s"$cat.db.dml").select("k").as[Long]
      .collect().toSeq.sorted === Seq(1L, 3L, 5L, 7L, 9L))
    spark.sql(s"UPDATE $cat.db.dml SET v = 'x' WHERE k = 3")
    assert(spark.table(s"$cat.db.dml").where(col("v") === "x")
      .select("k").as[Long].head() === 3L)
    // history stayed: the pre-delete version still reads 10 rows
    assert(spark.sql(s"SELECT * FROM $cat.db.dml VERSION AS OF 1")
      .count() === 10)
    spark.sql(s"DROP TABLE $cat.db.dml")
  }

  test("ALTER ADD COLUMNS, RENAME TABLE, saveAsTable (CTAS), SHOW TABLES") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.a (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.a VALUES (1), (2)")
    spark.sql(s"ALTER TABLE $cat.db.a ADD COLUMNS (score DOUBLE)")
    assert(spark.table(s"$cat.db.a").columns.toSeq ===
      Seq("k", "score"))
    assert(spark.table(s"$cat.db.a").where(col("score").isNull)
      .count() === 2) // metadata-only evolution null-fills old files
    spark.sql(s"INSERT INTO $cat.db.a VALUES (3, 1.5)")
    assert(spark.sql(s"SELECT sum(score) AS s FROM $cat.db.a")
      .as[Double].head() === 1.5)
    // RENAME/DROP COLUMN refuse loudly (column-mapped snapshots are a
    // v1-read-path feature)
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE $cat.db.a RENAME COLUMN k TO kk")
    }
    assert(e.getMessage.contains("format(\"graft\")"))
    // the rename TARGET is resolved inside the source table's catalog
    // (Spark's contract — no catalog prefix on the target)
    spark.sql(s"ALTER TABLE $cat.db.a RENAME TO db.b")
    assert(spark.table(s"$cat.db.b").count() === 3)
    // CTAS via saveAsTable goes through createTable + the DSv2 write
    spark.range(0, 4).toDF("n").write.saveAsTable(s"$cat.db.ctas")
    assert(spark.table(s"$cat.db.ctas").count() === 4)
    val names = spark.sql(s"SHOW TABLES IN $cat.db")
      .select("tableName").as[String].collect().toSet
    assert(names === Set("b", "ctas"))
    spark.sql(s"DROP TABLE $cat.db.b")
    spark.sql(s"DROP TABLE $cat.db.ctas")
  }

  test("external LOCATION registers a symlink; DROP keeps the data") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    // adopt an EXISTING path-addressed graft table under an identifier
    val ext = Files.createTempDirectory("graft_cat_ext_").toString + "/t"
    graft.sources.VersionedTable.commit(
      spark.range(0, 7).toDF("k").coalesce(1), ext)
    spark.sql(s"CREATE TABLE $cat.db.ext USING graft LOCATION '$ext'")
    assert(spark.table(s"$cat.db.ext").count() === 7)
    // writes through the identifier land in the external root
    spark.sql(s"INSERT INTO $cat.db.ext VALUES (100)")
    assert(spark.read.format("graft").load(ext).count() === 8)
    // DROP removes only the registration — data and log stay
    spark.sql(s"DROP TABLE $cat.db.ext")
    assert(spark.read.format("graft").load(ext).count() === 8)
    assert(!Files.exists(Paths.get(wh, "db", "ext")))
  }

  test("namespace tree: create, list, non-empty refusal, cascade") {
    spark.sql(s"CREATE NAMESPACE $cat.ns1")
    spark.sql(s"CREATE NAMESPACE $cat.ns1.sub")
    spark.sql(s"CREATE TABLE $cat.ns1.sub.t (k BIGINT)")
    val nss = spark.sql(s"SHOW NAMESPACES IN $cat.ns1")
      .select("namespace").as[String].collect().toSet
    assert(nss === Set("ns1.sub"))
    // a table dir never lists as a namespace
    assert(!spark.sql(s"SHOW NAMESPACES IN $cat.ns1.sub")
      .select("namespace").as[String].collect().contains("ns1.sub.t"))
    val e = intercept[Exception] {
      spark.sql(s"DROP NAMESPACE $cat.ns1.sub")
    }
    spark.sql(s"DROP NAMESPACE $cat.ns1 CASCADE")
    assert(!Files.exists(Paths.get(wh, "ns1")))
  }
}
