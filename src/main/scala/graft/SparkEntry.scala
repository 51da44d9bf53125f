package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Dedup, Etl, Functions, Graphs, Lakehouse, Relational, Similarity, Sketches, TextAnalysis, Training, Windowed}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL for every SQL-expressible entry. Column names are aligned between
  * the two on purpose — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** All catalog modules, concatenated. Order is stable (display only). */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ Functions.defs ++ Windowed.defs ++
      Dedup.defs ++ Similarity.defs ++ TextAnalysis.defs ++
      Sketches.defs ++ Training.defs ++ Graphs.defs ++ Etl.defs ++
      Lakehouse.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole spine (scan → join → group → having → top-k):
    * Top-100 parts by average quantity, SURVEY.md §2 serving query 1.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.find(_.name == "q09_serving_top_parts").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
