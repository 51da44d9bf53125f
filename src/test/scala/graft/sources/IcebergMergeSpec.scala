package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Iceberg-side conditional MERGE and SQL-shaped UPDATE — the targeted
  * copy-on-write write path ([[IcebergMeta.replaceFiles]]): clause
  * cascade correctness, manifest-bounds file targeting, sequence-number
  * preservation for carried files (the equality-delete resurrection
  * hazard), merge-on-read visibility under both v2 delete kinds, and
  * time travel across the overwrite. */
class IcebergMergeSpec extends SparkSpecBase {
  import spark.implicits._
  import VersionedTable.{MergeDelete, MergeInsert, MergeRef, MergeUpdate}
  private def X(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  private def tmp(): String =
    Files.createTempDirectory("ice_mrg_spec_").toString + "/t"

  private def rows(root: String): Seq[(Long, String)] =
    spark.read.format("iceberg-meta").load(root)
      .select("k", "cat").as[(Long, String)].collect().sorted.toSeq

  test("conditional MERGE: update-if, delete-if, insert-if cascade") {
    val root = tmp()
    IcebergMeta.writeFixture(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "cat"), root)
    val source = Seq((2L, "B"), (3L, "drop"), (4L, "skip"), (9L, "new"))
      .toDF("k", "cat")
    IcebergMeta.mergeConditional(spark, root, source, "k", "k",
      matched = Seq(
        MergeDelete(Some(MergeRef.source("cat") === "drop")),
        MergeUpdate(Some(MergeRef.source("cat") =!= "skip"),
          Map("cat" -> MergeRef.source("cat")))),
      notMatched = Seq(
        MergeInsert(Some(MergeRef.source("cat") =!= "skip"),
          Map("k" -> MergeRef.source("k"),
            "cat" -> MergeRef.source("cat")))))
    // 1 untouched-by-clause, 2 updated, 3 deleted, 4 matched-but-no-
    // clause-fires (kept verbatim), 9 inserted
    assert(rows(root) ===
      Seq((1L, "a"), (2L, "B"), (4L, "d"), (9L, "new")))
  }

  test("MERGE targets files by manifest key bounds; others carry") {
    val root = tmp()
    // two data files with disjoint k ranges inside one manifest
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("cat", lit("lo"))
        .repartitionByRange(2, col("k")), root)
    val before = IcebergMeta.snapshot(root)
    assert(before.files.size === 2)
    val loFile = before.files.minBy(_.stats("k").min.get.toString.toLong)
    IcebergMeta.mergeConditional(spark, root,
      Seq((7L, "HI")).toDF("k", "cat"), "k", "k",
      matched = Seq(MergeUpdate(None, Map("cat" -> MergeRef.source("cat")))))
    val after = IcebergMeta.snapshot(root)
    // the low-range file survived the rewrite BY REFERENCE
    assert(after.files.map(_.recordedPath).contains(loFile.recordedPath))
    assert(!after.files.map(_.recordedPath)
      .exists(p => p != loFile.recordedPath && !p.contains("cow-")))
    assert(rows(root) === (0L until 10L).map(k =>
      (k, if (k == 7) "HI" else "lo")))
  }

  test("carried files keep their sequence numbers: equality deletes " +
    "still apply after an unrelated rewrite") {
    val root = tmp()
    // one manifest, two files: [0,4] and [5,9]; cat=x rows in BOTH
    IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("cat",
        when(col("k") % 5 === 0, "x").otherwise("y"))
        .repartitionByRange(2, col("k")), root)
    IcebergMeta.deleteEquality(spark, root, Seq("x").toDF("cat"))
    assert(rows(root).map(_._1) ===
      (0L until 10L).filterNot(k => k % 5 == 0))
    // rewrite ONLY the high file; the low file is carried EXISTING in
    // a rewritten manifest — with an inherited (new) seq the eq delete
    // would detach from it and resurrect k=0
    IcebergMeta.mergeConditional(spark, root,
      Seq((7L, "z")).toDF("k", "cat"), "k", "k",
      matched = Seq(MergeUpdate(None, Map("cat" -> MergeRef.source("cat")))))
    assert(rows(root) === (0L until 10L).filterNot(_ % 5 == 0).map(k =>
      (k, if (k == 7) "z" else "y")))
    // and the rewritten file is delete-free: k=5 (hidden x) is GONE,
    // not carried into the new file
    val snap = IcebergMeta.snapshot(root)
    val cow = snap.files.filter(_.recordedPath.contains("cow-"))
    assert(cow.nonEmpty && cow.forall(_.stats("k").min.get.toString
      .toLong >= 5L))
  }

  test("WHEN NOT MATCHED BY SOURCE ranges over every file") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").withColumn("cat", lit("old"))
        .repartitionByRange(2, col("k")), root)
    IcebergMeta.mergeConditional(spark, root,
      Seq((1L, "keep"), (4L, "keep")).toDF("k", "cat"), "k", "k",
      matched = Seq(MergeUpdate(None, Map("cat" -> MergeRef.source("cat")))),
      bySource = Seq(MergeDelete(None)))
    assert(rows(root) === Seq((1L, "keep"), (4L, "keep")))
  }

  test("MERGE reads through MOR: positionally-deleted rows neither " +
    "match nor resurrect") {
    val root = tmp()
    IcebergMeta.writeFixture(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "cat"), root)
    IcebergMeta.delete(spark, root, col("k") === 2)
    IcebergMeta.mergeConditional(spark, root,
      Seq((2L, "back"), (3L, "C")).toDF("k", "cat"), "k", "k",
      matched = Seq(MergeUpdate(None, Map("cat" -> MergeRef.source("cat")))),
      notMatched = Seq(MergeInsert(None,
        Map("k" -> MergeRef.source("k"), "cat" -> MergeRef.source("cat")))))
    // k=2 was deleted → NOT matched → inserts as a new row
    assert(rows(root) === Seq((1L, "a"), (2L, "back"), (3L, "C")))
  }

  test("MERGE refusals: matched INSERT, duplicate source keys") {
    val root = tmp()
    IcebergMeta.writeFixture(Seq((1L, "a")).toDF("k", "cat"), root)
    intercept[IllegalArgumentException] {
      IcebergMeta.mergeConditional(spark, root,
        Seq((1L, "x")).toDF("k", "cat"), "k", "k",
        matched = Seq(MergeInsert(None, Map.empty)))
    }
    intercept[IllegalArgumentException] {
      IcebergMeta.mergeConditional(spark, root,
        Seq((1L, "x"), (1L, "y")).toDF("k", "cat"), "k", "k",
        matched = Seq(MergeUpdate(None, Map("cat" -> MergeRef.source("cat")))))
    }
  }

  test("updateWhere: COW point update, untouched file carried, " +
    "no-match is a no-op, time travel intact") {
    val root = tmp()
    val snap0 = IcebergMeta.writeFixture(
      spark.range(0, 10).toDF("k").withColumn("cat", lit("v1"))
        .repartitionByRange(2, col("k")), root)
    val before = IcebergMeta.snapshot(root)
    val loFile = before.files.minBy(_.stats("k").min.get.toString.toLong)
    val up = IcebergMeta.updateWhere(spark, root,
      Seq("cat" -> X(lit("v2"))),
      Some(X(col("k") === 8)))
    assert(rows(root) === (0L until 10L).map(k =>
      (k, if (k == 8) "v2" else "v1")))
    // stats targeting: the low-bounds file never rewrote
    assert(IcebergMeta.snapshot(root).files.map(_.recordedPath)
      .contains(loFile.recordedPath))
    // predicate matching nothing: same snapshot, no commit
    assert(IcebergMeta.updateWhere(spark, root,
      Seq("cat" -> X(lit("v3"))),
      Some(X(col("k") === 999))) === up)
    // the pre-update snapshot still reads in full
    assert(spark.read.format("iceberg-meta")
      .option("snapshotId", snap0.toString).load(root)
      .where(col("cat") === "v1").count() === 10)
  }

  test("updateWhere applies deletes first: hidden rows do not " +
    "reappear in the rewritten file") {
    val root = tmp()
    IcebergMeta.writeFixture(
      spark.range(0, 6).toDF("k").withColumn("cat", lit("a")), root)
    IcebergMeta.delete(spark, root, col("k") === 3)
    IcebergMeta.updateWhere(spark, root,
      Seq("cat" -> X(lit("b"))), Some(X(col("k") >= 2)))
    assert(rows(root) === Seq((0L, "a"), (1L, "a"), (2L, "b"),
      (4L, "b"), (5L, "b")))
  }
}
