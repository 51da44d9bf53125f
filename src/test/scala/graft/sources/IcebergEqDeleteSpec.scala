package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Iceberg v2 EQUALITY deletes ([[IcebergMeta.deleteEquality]] +
  * [[IcebergMetaRead.morRead]]): delete-by-value commits that read no
  * data files, the spec's strict sequence-number scoping (later
  * appends re-inserting a deleted key survive), null-safe matching,
  * composition with positional deletes, and the refusal posture. */
class IcebergEqDeleteSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("ice_eq_spec_").toString + "/t"

  test("equality delete removes matching rows; no data file rewritten") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 20).toDF("k").withColumn("cat",
        when(col("k") % 3 === 0, "a").otherwise("b")), root)
    val before = IcebergMeta.snapshot(root).files.map(_.path).toSet
    IcebergMeta.deleteEquality(spark, root, Seq("a").toDF("cat"))
    val snap = IcebergMeta.snapshot(root)
    assert(snap.eqDeletes.size === 1)
    assert(snap.eqDeletes.head.eqCols === Seq("cat"))
    // zero write amplification: every pre-delete data file survives
    assert(snap.files.map(_.path).toSet === before)
    val ds = spark.read.format("iceberg-meta").load(root)
    assert(ds.count() === (0 until 20).count(_ % 3 != 0))
    assert(ds.filter(col("cat") === "a").count() === 0)
    assert(ds.agg(sum("k")).as[Long].head() ===
      (0 until 20).filter(_ % 3 != 0).sum)
  }

  test("strict seq scoping: a later append re-inserting the key survives") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("cat", lit("x")), root)
    IcebergMeta.deleteEquality(spark, root, Seq("x").toDF("cat"))
    // seq(new files) > seq(delete) → out of the delete's scope
    IcebergMeta.append(
      spark.range(100, 105).toDF("k").withColumn("cat", lit("x")), root)
    val ds = spark.read.format("iceberg-meta").load(root)
    assert(ds.count() === 5)
    assert(ds.agg(sum("k")).as[Long].head() === (100 until 105).sum)
    // a SECOND delete at a yet-higher seq removes the re-inserts too
    IcebergMeta.deleteEquality(spark, root, Seq("x").toDF("cat"))
    assert(spark.read.format("iceberg-meta").load(root).count() === 0)
  }

  test("multi-column + null-safe matching; empty values is a no-op") {
    val root = tmp()
    IcebergMeta.writeFixture(
      Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "a"),
        (3L, null), (4L, "a")).toDF("k", "cat"), root)
    val snapBefore = IcebergMeta.snapshot(root).snapshotId
    // empty values → no commit at all
    assert(IcebergMeta.deleteEquality(spark, root,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cat",
            org.apache.spark.sql.types.StringType)))))
      === snapBefore)
    // (null, "a") deletes exactly the row with k IS NULL AND cat='a'
    IcebergMeta.deleteEquality(spark, root,
      Seq[(java.lang.Long, String)]((null, "a")).toDF("k", "cat"))
    val left = spark.read.format("iceberg-meta").load(root)
      .select("k").as[java.lang.Long].collect().toSet
    assert(left === Set[java.lang.Long](1L, 2L, 3L, 4L))
  }

  test("composes with positional deletes and time travel") {
    val root = tmp()
    val snap0 = IcebergMeta.writeFixture(
      spark.range(0, 12).toDF("k").withColumn("cat",
        when(col("k") < 6, "old").otherwise("new")), root)
    // positional first (pos machinery refuses AFTER an eq delete)
    IcebergMeta.delete(spark, root, col("k") === 0)
    IcebergMeta.deleteEquality(spark, root, Seq("new").toDF("cat"))
    val ds = spark.read.format("iceberg-meta").load(root)
    assert(ds.select("k").as[Long].collect().sorted.toSeq ===
      (1L until 6L))
    // positional DELETE now refuses (kinds don't mix in the writer)
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.delete(spark, root, col("k") === 1)
    }
    assert(e.getMessage.contains("EQUALITY"))
    // time travel to the original snapshot sees everything
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", snap0.toString).load(root).count() === 12)
  }

  test("SQL DELETE routes equality predicates to equality-delete commits") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 20).toDF("k").withColumn("cat",
        when(col("k") % 2 === 0, "even").otherwise("odd")), root)
    val before = IcebergMeta.snapshot(root).files.map(_.path).toSet
    spark.sql(s"CREATE TABLE eq_sql_t USING `iceberg-meta` OPTIONS (path '$root')")
    try {
      // equality shape → zero-read equality-delete commit
      spark.sql("DELETE FROM eq_sql_t WHERE cat = 'even'")
      val s1 = IcebergMeta.snapshot(root)
      assert(s1.eqDeletes.size === 1 && s1.deletes.isEmpty)
      assert(s1.files.map(_.path).toSet === before) // no data file touched
      assert(spark.sql("SELECT count(*) FROM eq_sql_t").as[Long]
        .head() === 10L)
      // IN + conjunction: one commit, cross-product value rows
      spark.sql("DELETE FROM eq_sql_t WHERE k IN (1, 3) AND cat = 'odd'")
      val s2 = IcebergMeta.snapshot(root)
      assert(s2.eqDeletes.size === 2)
      assert(spark.sql("SELECT count(*) FROM eq_sql_t").as[Long]
        .head() === 8L)
      // a RANGE predicate cannot be an equality file — and the
      // positional path refuses on an eq-delete-carrying table, so
      // the statement fails loudly rather than mixing kinds
      val e = intercept[Exception] {
        spark.sql("DELETE FROM eq_sql_t WHERE k > 15")
      }
      assert(e.getMessage.contains("EQUALITY"))
    } finally spark.sql("DROP TABLE IF EXISTS eq_sql_t")
  }

  test("refusals: raw listing, convert, schema mismatch") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").withColumn("cat", lit("x")), root)
    IcebergMeta.deleteEquality(spark, root, Seq("x").toDF("cat"))
    val snap = IcebergMeta.snapshot(root)
    assert(snap.deletes.isEmpty && snap.eqDeletes.size === 1)
    // raw listing outside the rewrite refuses
    val idx = new IcebergMetaFileIndex(spark, snap)
    val e1 = intercept[IllegalStateException] { idx.listFiles(Nil, Nil) }
    assert(e1.getMessage.contains("row-level delete"))
    // CONVERT would resurrect the deleted rows → refuses
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.importIceberg(spark, root,
        Files.createTempDirectory("eq_conv_").toString + "/g")
    }
    assert(e2.getMessage.contains("resurrect"))
    // equality columns must match table fields by name AND type
    val e3 = intercept[IllegalArgumentException] {
      IcebergMeta.deleteEquality(spark, root, Seq(1).toDF("cat"))
    }
    assert(e3.getMessage.contains("mismatched"))
  }

  test("upsertKeyed: one MOR snapshot replaces matched keys, inserts rest") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("v", col("k") * 10), root)
    val before = IcebergMeta.snapshot(root)
    // upsert: keys 3, 5 replace; key 100 inserts — one commit
    IcebergMeta.upsertKeyed(spark, root,
      Seq((3L, -3L), (5L, -5L), (100L, -100L)).toDF("k", "v"), "k")
    val snap = IcebergMeta.snapshot(root)
    // zero existing data files touched; one eq delete recorded
    assert(before.files.map(_.path).toSet
      .subsetOf(snap.files.map(_.path).toSet))
    assert(snap.eqDeletes.size === 1 && snap.eqDeletes.head.eqCols === Seq("k"))
    val ds = spark.read.format("iceberg-meta").load(root)
    assert(ds.count() === 11)
    assert(ds.filter(col("k").isin(3L, 5L, 100L)).select("v").as[Long]
      .collect().sorted.toSeq === Seq(-100L, -5L, -3L))
    assert(ds.filter(col("k") === 4).select("v").as[Long].head() === 40L)
    // a SECOND upsert composes (its delete out-scopes the first's images)
    IcebergMeta.upsertKeyed(spark, root,
      Seq((3L, 333L)).toDF("k", "v"), "k")
    assert(spark.read.format("iceberg-meta").load(root)
      .filter(col("k") === 3).select("v").as[Long].head() === 333L)
    // time travel: the pre-upsert snapshot still reads the old images
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", before.snapshotId.toString).load(root)
      .filter(col("k") === 3).select("v").as[Long].head() === 30L)
    // streaming tails refuse the overwrite snapshot (rows changed)
    val q = spark.readStream.format("iceberg-meta")
      .option("startingSequence", "1").load(root)
      .writeStream.format("memory").queryName("ups_tail")
      .outputMode("append").start()
    try {
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("overwrite"), e.getMessage)
    } finally q.stop()
  }

  test("SQL MERGE star form lowers to the MOR upsert; other shapes refuse") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").withColumn("v", col("k")), root)
    spark.sql(s"CREATE TABLE ups_sql_t USING `iceberg-meta` OPTIONS (path '$root')")
    Seq((2L, 222L), (50L, 500L)).toDF("k", "v")
      .createOrReplaceTempView("ups_sql_src")
    try {
      val filesBefore = IcebergMeta.snapshot(root).files.map(_.path).toSet
      spark.sql(
        """MERGE INTO ups_sql_t t USING ups_sql_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(filesBefore.subsetOf(
        IcebergMeta.snapshot(root).files.map(_.path).toSet))
      assert(spark.sql("SELECT sum(v) FROM ups_sql_t").as[Long]
        .head() === (0L + 1 + 222 + 3 + 4 + 5 + 500))
      // non-star shapes lower to the conditional COW merge (round 8):
      // WHEN MATCHED THEN DELETE retires the source's keys
      spark.sql(
        """MERGE INTO ups_sql_t t USING ups_sql_src s ON t.k = s.k
          |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(spark.sql("SELECT sum(v) FROM ups_sql_t").as[Long]
        .head() === (0L + 1 + 3 + 4 + 5))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ups_sql_t")
      spark.catalog.dropTempView("ups_sql_src")
    }
  }

  test("iceberg_changes TVF: appends as inserts, both delete kinds derive, rewrites refuse") {
    val root = tmp()
    // seq 1: append 0..9; seq 2: append 10..19; seq 3: positional
    // delete of k in {3, 12}; seq 4: equality delete of cat 'a'
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("cat",
        when(col("k") % 5 === 0, "a").otherwise("b")), root)
    IcebergMeta.append(
      spark.range(10, 20).toDF("k").withColumn("cat",
        when(col("k") % 5 === 0, "a").otherwise("b")), root)
    IcebergMeta.delete(spark, root, col("k") === 3 || col("k") === 12)
    IcebergMeta.deleteEquality(spark, root, Seq("a").toDF("cat"))
    val ch = IcebergMeta.changes(spark, root, 0L, 4L)
    assert(ch.columns.toSeq ===
      Seq("k", "cat", "_change_type", "_commit_seq"))
    // inserts: all 20 rows, tagged by their commit
    assert(ch.filter(col("_change_type") === "insert").count() === 20L)
    assert(ch.filter(col("_change_type") === "insert" &&
      col("_commit_seq") === 1).count() === 10L)
    // seq 3 deletes: exactly k in {3, 12}
    assert(ch.filter(col("_change_type") === "delete" &&
      col("_commit_seq") === 3).select("k").as[Long]
      .collect().sorted.toSeq === Seq(3L, 12L))
    // seq 4 deletes: every 'a' row still visible at seq 3 (k % 5 == 0)
    assert(ch.filter(col("_change_type") === "delete" &&
      col("_commit_seq") === 4).select("k").as[Long]
      .collect().sorted.toSeq === Seq(0L, 5L, 10L, 15L))
    // half-open range (after=2): only the delete commits
    assert(IcebergMeta.changes(spark, root, 2L, 4L)
      .filter(col("_change_type") === "insert").count() === 0L)
    // the incremental-MV identity: snapshot(to) = snapshot(after) + Δ
    val delta = ch.withColumn("signed",
      when(col("_change_type") === "insert", col("k"))
        .otherwise(-col("k")))
      .agg(sum("signed")).as[Long].head()
    assert(delta === spark.read.format("iceberg-meta").load(root)
      .agg(sum("k")).as[Long].head())
    // the TVF through SQL
    assert(spark.sql(
      s"SELECT count(*) AS n FROM iceberg_changes('$root', 0, 4)")
      .as[Long].head() === 26L)
    // a rewrite snapshot (compaction → 'replace') refuses
    IcebergMeta.compact(spark, root)
    val e = intercept[UnsupportedOperationException] {
      IcebergMeta.changes(spark, root, 4L, 5L).count()
    }
    assert(e.getMessage.contains("replace"))
    // empty range: empty frame, schema intact
    val empty = IcebergMeta.changes(spark, root, 2L, 2L)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq ===
      Seq("k", "cat", "_change_type", "_commit_seq"))
  }
}
