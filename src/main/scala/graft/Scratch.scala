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
    val name = args.headOption.getOrElse("q40_etl_books_dim")
    val df = SparkEntry.queries(name)(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    println("[scratch] plan mentions Image-URL: " + plan.contains("Image-URL"))
    println("[scratch] plan mentions Location concat: " + plan.contains("Location"))
    println("[scratch] plan mentions Age: " + plan.contains("Age"))
    spark.stop()
  }
}
