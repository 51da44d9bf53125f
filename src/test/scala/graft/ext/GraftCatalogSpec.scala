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

  test("DELTA through identifiers: create, insert, DML, travel, overwrite") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.d (k BIGINT, v STRING) USING delta")
    val root = Paths.get(wh, "lake", "d").toString
    // the root is a REAL Delta table — the path reader serves it too
    assert(Files.isDirectory(Paths.get(root, "_delta_log")))
    assert(spark.table(s"$cat.lake.d").count() === 0)
    spark.sql(s"INSERT INTO $cat.lake.d SELECT id, concat('v', id) " +
      "FROM range(10)")
    assert(spark.table(s"$cat.lake.d").count() === 10)
    assert(spark.read.format("delta-log").load(root).count() === 10)
    // DML lowers to the Delta COW commands
    spark.sql(s"DELETE FROM $cat.lake.d WHERE k % 2 = 0")
    spark.sql(s"UPDATE $cat.lake.d SET v = 'odd' WHERE k = 3")
    assert(spark.table(s"$cat.lake.d").count() === 5)
    assert(spark.sql(s"SELECT v FROM $cat.lake.d WHERE k = 3")
      .as[String].head() === "odd")
    // travel by DELTA VERSION NUMBER on the identifier (v0 = empty
    // create, v1 = insert, v2 = delete)
    assert(spark.sql(s"SELECT * FROM $cat.lake.d VERSION AS OF 0")
      .count() === 0)
    assert(spark.sql(s"SELECT * FROM $cat.lake.d VERSION AS OF 1")
      .count() === 10)
    assert(spark.sql(
      s"SELECT * FROM $cat.lake.d TIMESTAMP AS OF current_timestamp()")
      .count() === 5)
    // a pinned identifier refuses writes
    val ep = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.lake.d VERSION AS OF 1 WHERE k = 1")
    }
    // INSERT OVERWRITE replaces through the Delta overwrite commit
    spark.sql(s"INSERT OVERWRITE $cat.lake.d VALUES (99, 'z')")
    assert(spark.table(s"$cat.lake.d").as[(Long, String)]
      .collect().toSeq === Seq((99L, "z")))
    // ALTER refuses with the format's own surface named
    val ea = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.d ADD COLUMNS (x DOUBLE)")
    }
    assert(ea.getMessage.contains("evolution"))
    spark.sql(s"DROP TABLE $cat.lake.d")
    assert(!Files.exists(Paths.get(root)))
  }

  test("ICEBERG through identifiers: create, partition spec, refs, DML") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.i (k BIGINT, v STRING) " +
      "USING iceberg PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('format-version' = '3')")
    val root = Paths.get(wh, "lake", "i").toString
    assert(graft.sources.IcebergMeta.formatVersion(root) === 3)
    spark.sql(s"INSERT INTO $cat.lake.i SELECT id, concat('v', id) " +
      "FROM range(20)")
    assert(spark.table(s"$cat.lake.i").count() === 20)
    assert(spark.read.format("iceberg-meta").load(root).count() === 20)
    // the declared spec really partitioned the append
    assert(graft.sources.IcebergMeta.snapshot(root).files.size > 1)
    // DML: v3 delete → deletion vectors, still 1 manifest family
    spark.sql(s"DELETE FROM $cat.lake.i WHERE k % 4 = 1")
    assert(spark.table(s"$cat.lake.i").count() === 15)
    // travel by SNAPSHOT ID and by REF NAME on the identifier
    val snaps = graft.sources.IcebergMeta.snapshotLog(root)
    assert(spark.sql(
      s"SELECT * FROM $cat.lake.i VERSION AS OF ${snaps(1).snapshotId}")
      .count() === 20)
    graft.sources.IcebergMeta.setRef(root, "before_delete",
      snapshotId = Some(snaps(1).snapshotId))
    assert(spark.sql(
      s"SELECT * FROM $cat.lake.i VERSION AS OF 'before_delete'")
      .count() === 20)
    // RENAME refuses for iceberg (metadata may embed absolute paths)
    val er = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.i RENAME TO $cat.lake.i2")
    }
    assert(er.getMessage.contains("RENAME"))
    spark.sql(s"DROP TABLE $cat.lake.i")
    assert(!Files.exists(Paths.get(root)))
  }

  test("partitioned Delta through identifiers: create + insert restate the partitioning") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.dp (k BIGINT, d STRING) " +
      "USING delta PARTITIONED BY (d)")
    val root = Paths.get(wh, "lake", "dp").toString
    assert(graft.sources.DeltaLog.snapshot(spark, root)
      .partitionColumns === Seq("d"))
    // the identifier INSERT must restate the table's partitioning
    // (the commit-side check would refuse a bare append)
    spark.sql(s"INSERT INTO $cat.lake.dp " +
      "SELECT id, concat('d', id % 3) FROM range(9)")
    assert(spark.table(s"$cat.lake.dp").count() === 9)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.lake.dp WHERE d = 'd1'")
      .head().getLong(0) === 3)
    spark.sql(s"INSERT OVERWRITE $cat.lake.dp VALUES (1, 'x')")
    assert(spark.table(s"$cat.lake.dp").count() === 1)
    spark.sql(s"DROP TABLE $cat.lake.dp")
    // catalog-internal dirs and table-parented namespaces stay out of
    // the namespace tree
    intercept[Exception] {
      spark.sql(s"CREATE NAMESPACE $cat.lake.`.hidden`")
    }
    spark.sql(s"CREATE TABLE $cat.lake.nst (k BIGINT)")
    intercept[Exception] {
      spark.sql(s"CREATE NAMESPACE $cat.lake.nst.sub")
    }
    assert(!Files.exists(Paths.get(wh, "lake", "nst", "sub")))
    spark.sql(s"DROP TABLE $cat.lake.nst")
  }

  test("CLUSTER BY through the catalog creates a liquid-clustered Delta table") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
    spark.sql(s"CREATE TABLE $cat.lake.dc (k BIGINT, v BIGINT) " +
      "USING delta CLUSTER BY (k)")
    val root = Paths.get(wh, "lake", "dc").toString
    val s0 = graft.sources.DeltaLog.snapshot(spark, root)
    assert(s0.writerFeatures.contains("clusteredTable"))
    assert(s0.domains("delta.clustering")._1
      === """{"clusteringColumns":[["k"]]}""")
    spark.sql(s"INSERT INTO $cat.lake.dc SELECT id, id % 5 FROM range(100)")
    // OPTIMIZE via the DDL re-clusters by the domain's columns
    spark.sql(s"GRAFT OPTIMIZE DELTA '$root' FILES 2")
    val s1 = graft.sources.DeltaLog.snapshot(spark, root)
    assert(s1.adds.size === 2 &&
      s1.domains.contains("delta.clustering"))
    assert(spark.table(s"$cat.lake.dc").count() === 100)
    spark.sql(s"DROP TABLE $cat.lake.dc")
  }

  test("atomic CTAS/RTAS: staged write, one-move publish, old table survives failure") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.stg")
    // CTAS lands atomically (staging dir → one move); all three
    // formats stage the same way
    spark.sql(s"CREATE TABLE $cat.stg.c USING delta AS " +
      "SELECT id AS k FROM range(10)")
    assert(spark.table(s"$cat.stg.c").count() === 10)
    assert(Files.isDirectory(Paths.get(wh, "stg", "c", "_delta_log")))
    // CREATE OR REPLACE ... AS SELECT: the old table serves until the
    // new one is COMPLETE; a mid-query failure leaves it untouched
    val e = intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TABLE $cat.stg.c USING delta AS " +
        "SELECT CASE WHEN id < 5 THEN id ELSE " +
        "raise_error('boom') END AS k FROM range(10)")
    }
    assert(spark.table(s"$cat.stg.c").count() === 10) // old intact
    // ...and no staging debris outlives the abort
    val stagingDir = Paths.get(wh, ".staging")
    assert(!Files.exists(stagingDir) ||
      !Files.list(stagingDir).iterator().hasNext)
    // the catalog-internal .staging dir never lists as a namespace
    assert(!spark.sql(s"SHOW NAMESPACES IN $cat")
      .select("namespace").as[String].collect().exists(_.contains("stag")))
    // a successful replace swaps wholesale (fresh history: v0+v1)
    spark.sql(s"CREATE OR REPLACE TABLE $cat.stg.c AS " +
      "SELECT id AS k FROM range(3)") // default provider → graft
    assert(spark.table(s"$cat.stg.c").count() === 3)
    assert(Files.isDirectory(Paths.get(wh, "stg", "c", "_graft_log")))
    // REPLACE of a missing table refuses without OR CREATE
    val e2 = intercept[Exception] {
      spark.sql(s"REPLACE TABLE $cat.stg.missing AS " +
        "SELECT id FROM range(1)")
    }
    spark.sql(s"DROP TABLE $cat.stg.c")
  }

  test("interop LOCATION adoption + mixed-format SHOW TABLES + CTAS") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mix")
    // an EXISTING path-written Delta table registers under an
    // identifier via LOCATION — adopted as-is, DROP keeps the data
    val ext = Files.createTempDirectory("cat_ext_delta_").toString + "/t"
    graft.sources.DeltaLog.commit(
      spark.range(0, 7).toDF("k").coalesce(1), ext)
    spark.sql(s"CREATE TABLE $cat.mix.adopted LOCATION '$ext'")
    assert(spark.table(s"$cat.mix.adopted").count() === 7)
    spark.sql(s"INSERT INTO $cat.mix.adopted VALUES (100)")
    assert(spark.read.format("delta-log").load(ext).count() === 8)
    // CTAS through saveAsTable with an interop provider
    spark.range(0, 5).toDF("k").write.format("iceberg-meta")
      .saveAsTable(s"$cat.mix.ice_ctas")
    assert(spark.table(s"$cat.mix.ice_ctas").count() === 5)
    assert(Files.isDirectory(
      Paths.get(wh, "mix", "ice_ctas", "metadata")))
    // graft, delta and iceberg tables list side by side
    spark.sql(s"CREATE TABLE $cat.mix.g (k BIGINT)")
    val shown = spark.sql(s"SHOW TABLES IN $cat.mix")
      .select("tableName").as[String].collect().toSet
    assert(shown === Set("adopted", "ice_ctas", "g"))
    spark.sql(s"DROP TABLE $cat.mix.adopted")
    assert(spark.read.format("delta-log").load(ext).count() === 8)
  }
}
