package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
// Throwaway audit: per-query physical-plan operator counts.
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.ext.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.allDefs.map { q =>
      try {
        val p = q.fn(spark, "/root/testdata/sf0.001")
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        def c(op: String) = p.linesIterator.count(_.matches(s"^\\(\\d+\\) $op.*"))
        spark.sharedState.cacheManager.clearCache()
        (q.name, c("Scan parquet"), c("Exchange"), c("SortMergeJoin"), c("CartesianProduct"))
      } catch { case e: Throwable =>
        spark.sharedState.cacheManager.clearCache()
        (q.name, -1, -1, -1, -1)
      }
    }
    rows.sortBy(r => -(r._2 + r._3)).foreach { case (n, s, e, smj, cp) =>
      println(f"[scan] $n%-32s scans=$s%-3d exch=$e%-3d smj=$smj cart=$cp")
    }
    spark.stop()
  }
}
