package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. One session per suite (local[2],
  * tiny shuffle partitioning) keeps the whole test run fast. */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session

  override def afterAll(): Unit = () // session shared across suites

  /** Run `f` with graft reads forced onto the v1 path — for asserts
    * that introspect the v1 index (the supported config fallback);
    * everything else exercises the default DSv2 route. */
  def withReadPathV1[A](f: => A): A = {
    spark.conf.set("spark.graft.readPath", "v1")
    try f finally spark.conf.unset("spark.graft.readPath")
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[2]")
    .withExtensions(new graft.ext.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("spark-wh").toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.geospatial.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  // keep test output readable — Spark's INFO firehose drowns scalatest
  session.sparkContext.setLogLevel("WARN")
}
