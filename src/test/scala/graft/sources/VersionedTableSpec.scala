package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The table-format contract: snapshot isolation, time travel, atomic
  * commits under a race, compaction invisibility, vacuum bounds. */
class VersionedTableSpec extends SparkSpecBase {
  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("vtable").toString

  test("append/overwrite replay and time travel") {
    val root = newRoot()
    val v0 = VersionedTable.commit(Seq(1L, 2L).toDF("id"), root, "append")
    val v1 = VersionedTable.commit(Seq(3L).toDF("id"), root, "append")
    val v2 = VersionedTable.commit(Seq(9L).toDF("id"), root, "overwrite")
    val v3 = VersionedTable.commit(Seq(10L).toDF("id"), root, "append")
    assert(Seq(v0, v1, v2, v3) == Seq(0L, 1L, 2L, 3L))
    def ids(v: Long): Seq[Long] =
      VersionedTable.read(spark, root, Some(v))
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(0) == Seq(1L, 2L))
    assert(ids(1) == Seq(1L, 2L, 3L)) // append extends
    assert(ids(2) == Seq(9L)) // overwrite resets
    assert(ids(3) == Seq(9L, 10L))
    // latest == explicit max version
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(9L, 10L))
  }

  test("commit race: exactly one writer wins a version") {
    val root = newRoot()
    VersionedTable.commit(Seq(1L).toDF("id"), root) // v0
    // two writers read basis v0 and both target v1; writer A lands first
    val basis = VersionedTable.latestVersion(root)
    val vA = VersionedTable.commit(Seq(2L).toDF("id"), root, "append",
      expected = Some(basis + 1))
    assert(vA == 1L)
    val race = intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.commit(Seq(3L).toDF("id"), root, "append",
        expected = Some(basis + 1)) // writer B, stale basis
    }
    assert(race.getMessage.contains("concurrent commit"))
    // the loser's retry on the new basis succeeds; nothing was lost
    val vB = VersionedTable.commit(Seq(3L).toDF("id"), root, "append",
      expected = Some(VersionedTable.latestVersion(root) + 1))
    assert(vB == 2L)
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("compaction rewrites the snapshot without changing its rows") {
    val root = newRoot()
    VersionedTable.commit(spark.range(100).toDF(), root)
    VersionedTable.commit(spark.range(100, 200).toDF(), root)
    val before = VersionedTable.read(spark, root)
      .agg(count(lit(1)), sum(col("id"))).collect()(0)
    val cv = VersionedTable.compact(spark, root, numFiles = 1)
    val after = VersionedTable.read(spark, root)
      .agg(count(lit(1)), sum(col("id"))).collect()(0)
    assert(before == after, "compaction changed table content")
    assert(VersionedTable.snapshotFiles(root, cv).size == 1)
    // pre-compaction snapshot still time-travels
    assert(VersionedTable.read(spark, root, Some(cv - 1)).count() == 200)
  }

  test("merge commits a CDC upsert atomically on the current snapshot") {
    val root = newRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), root)
    // update 2, delete 3, insert 4
    val v = VersionedTable.merge(spark, root,
      Seq((2L, "B", false), (3L, "c", true), (4L, "d", false))
        .toDF("id", "v", "del"),
      key = "id", deleteCol = "del")
    val rows = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (2L, "B"), (4L, "d")))
    // pre-merge snapshot still intact
    assert(VersionedTable.read(spark, root, Some(v - 1)).count() == 3)
  }

  test("streamingSink: replayed micro-batch commits exactly once") {
    val root = newRoot()
    val sink = VersionedTable.streamingSink(root)
    sink(Seq(1L, 2L).toDF("id"), 0L)
    sink(Seq(3L).toDF("id"), 1L)
    sink(Seq(3L).toDF("id"), 1L) // replay after simulated restart
    assert(VersionedTable.read(spark, root).count() == 3,
      "replayed batch double-committed")
    assert(VersionedTable.latestVersion(root) == 1L)
  }

  test("diff: CDC between snapshots, file-pruned") {
    val root = newRoot()
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    VersionedTable.commit(Seq((3L, "c")).toDF("id", "v"), root) // append
    VersionedTable.merge(spark, root,
      Seq((2L, "B", false)).toDF("id", "v", "del"), "id", "del") // update 2
    def changes(from: Long, to: Long): Set[(Long, String, String)] =
      VersionedTable.diff(spark, root, from, to).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // append-only step: inserts only
    assert(changes(0, 1) == Set((3L, "c", "insert")))
    // update step (overwrite commit): the changed row appears as a
    // delete+insert pair; untouched rows are absent
    assert(changes(1, 2) == Set((2L, "b", "delete"), (2L, "B", "insert")))
    // self-diff and full-range sanity
    assert(changes(2, 2).isEmpty)
    assert(changes(0, 2) ==
      Set((3L, "c", "insert"), (2L, "b", "delete"), (2L, "B", "insert")))
  }

  test("vacuum reclaims unreferenced data dirs, keeps retained versions") {
    val root = newRoot()
    VersionedTable.commit(spark.range(10).toDF(), root) // v0
    VersionedTable.commit(spark.range(10, 20).toDF(), root, "overwrite") // v1
    VersionedTable.commit(spark.range(20, 30).toDF(), root) // v2
    val dirsBefore = Files.list(Paths.get(root, "data")).count()
    assert(dirsBefore == 3)
    // age threshold first: a fresh (in-flight-aged) dir is NOT deleted
    VersionedTable.vacuum(root, retain = 1)
    assert(Files.list(Paths.get(root, "data")).count() == 3,
      "vacuum deleted a dir younger than the safety age")
    // explicit zero age (no live writers in this test) reclaims v0
    VersionedTable.vacuum(root, retain = 1, minAgeMs = 0)
    val dirsAfter = Files.list(Paths.get(root, "data")).count()
    assert(dirsAfter == 2, "v0's dir (only referenced below retain) survives")
    // retained snapshots unaffected
    assert(VersionedTable.read(spark, root, Some(1)).count() == 10)
    assert(VersionedTable.read(spark, root).count() == 20)
    // the off-by-one that would wipe the table is rejected
    intercept[IllegalArgumentException] {
      VersionedTable.vacuum(root, retain = VersionedTable.latestVersion(root) + 1,
        minAgeMs = 0)
    }
  }

  test("commit rejects an expected version that would gap the log") {
    val root = newRoot()
    VersionedTable.commit(Seq(1L).toDF("id"), root)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(Seq(2L).toDF("id"), root, "append",
        expected = Some(5L))
    }
  }
}
