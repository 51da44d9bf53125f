package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val fn = SparkEntry.queries(args.headOption.getOrElse("q28_minhash_lsh"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      println(f"[scratch] run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    }
    spark.stop()
  }
}
