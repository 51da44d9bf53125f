package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Named refs (tags): immutable version pins with retention pinning —
  * vacuum keeps a tagged snapshot's files past the horizon, truncateLog
  * refuses to orphan a tag, and the datasource reads by tag name. */
class TagsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_tag_").toString

  test("create / list / read / drop; tags are immutable") {
    val root = tmp()
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root) // v0
    VersionedTable.commit(Seq(3L).toDF("k"), root)     // v1
    assert(VersionedTable.createTag(root, "train-v1", Some(0L)) === 0L)
    assert(VersionedTable.createTag(root, "latest-blessed") === 1L)
    assert(VersionedTable.tags(root) ===
      Map("train-v1" -> 0L, "latest-blessed" -> 1L))
    assert(VersionedTable.readTag(spark, root, "train-v1").count() === 2)
    val e = intercept[IllegalStateException] {
      VersionedTable.createTag(root, "train-v1", Some(1L))
    }
    assert(e.getMessage.contains("immutable"))
    VersionedTable.dropTag(root, "train-v1")
    assert(VersionedTable.tags(root) === Map("latest-blessed" -> 1L))
    intercept[IllegalArgumentException] {
      VersionedTable.versionOfTag(root, "train-v1")
    }
    intercept[IllegalArgumentException] { // path-safety rail
      VersionedTable.createTag(root, "../evil", Some(0L))
    }
  }

  test("vacuum pins tagged snapshots past the retain horizon") {
    val root = tmp()
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root)         // v0
    VersionedTable.createTag(root, "release", Some(0L))
    VersionedTable.commit(Seq(9L).toDF("k"), root, "overwrite") // v1
    // retain only v1; v0's files are candidates — but the tag pins them
    VersionedTable.vacuum(root, retain = 1L, minAgeMs = 0L)
    assert(VersionedTable.readTag(spark, root, "release")
      .as[Long].collect().sorted === Array(1L, 2L))
    // released, the same vacuum reclaims v0's files
    VersionedTable.dropTag(root, "release")
    VersionedTable.vacuum(root, retain = 1L, minAgeMs = 0L)
    val e = intercept[Exception] {
      VersionedTable.read(spark, root, Some(0L)).collect()
    }
    assert(e != null) // historic snapshot gone, read fails loudly
    assert(VersionedTable.read(spark, root).as[Long].head() === 9L)
  }

  test("truncateLog refuses to orphan a tag below the horizon") {
    val root = tmp()
    (0 until 12).foreach(i => // auto-checkpoint lands at v10
      VersionedTable.commit(Seq(i.toLong).toDF("k"), root))
    VersionedTable.createTag(root, "early", Some(2L))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.truncateLog(root)
    }
    assert(e.getMessage.contains("early"))
    VersionedTable.dropTag(root, "early")
    assert(VersionedTable.truncateLog(root) > 0) // now it proceeds
  }

  test("datasource tagAsOf option and SQL TAG statements") {
    val root = tmp()
    VersionedTable.commit(Seq(1L, 2L).toDF("k"), root) // v0
    VersionedTable.commit(Seq(3L).toDF("k"), root)     // v1
    spark.sql(s"GRAFT TAG '$root' CREATE snap1 VERSION AS OF 0")
    assert(spark.sql(s"GRAFT TAGS '$root'").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("snap1", 0L)))
    assert(spark.read.format("graft").option("tagAsOf", "snap1")
      .load(root).count() === 2)
    spark.sql(s"GRAFT TAG '$root' DROP snap1")
    assert(VersionedTable.tags(root).isEmpty)
  }
}
