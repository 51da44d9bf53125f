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
    spark.range(1000).selectExpr("sum(id)").collect()
    val name = args.headOption.getOrElse("q30_ngram_jaccard")
    val df = SparkEntry.queries(name)(spark, d)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    spark.stop()
  }
}
