package graft.queries

import java.nio.file.Files
import graft.{QueryDef, Tables}
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Lakehouse table-format catalog entries (SURVEY.md §2b north star:
  * "Spark reads/writes lakehouse formats"): the behaviors the real
  * Delta/Iceberg connectors would provide, exercised through
  * [[graft.sources.VersionedTable]] under the driver's differential
  * check. The data result of each entry is layout-independent by
  * construction (that is the POINT of a table format), so the DuckDB
  * oracle states the plain relational semantics over the raw tables
  * and the entry must reproduce it through the versioned layout —
  * commit protocol, manifest stats, and file pruning all sit in the
  * checked path.
  */
object Lakehouse {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // DATA SKIPPING end-to-end: commit `orders` range-clustered on
    // o_orderkey (8 files with disjoint key ranges — the Z-order/
    // cluster-by layout a lakehouse table maintains), then answer a
    // selective key-range aggregate through the manifest's per-file
    // min/max stats. readSkipping opens ONLY the files whose range
    // can match ([1, 1024] touches 1-2 of the 8 at every sf) — at
    // 100 TB this is the difference between a full-table scan and a
    // handful of file opens, decided from metadata alone before any
    // row is read. The oracle is the layout-free WHERE over the raw
    // table: pruning must be invisible in the answer (a wrong skip
    // loses rows; the harness would catch it as a hash mismatch).
    // VersionedTableSpec asserts the file-count side (scan touches
    // fewer files); integer-only aggregates keep the check exact.
    QueryDef(
      "q120_table_data_skipping",
      (s, d) => {
        val root = Files.createTempDirectory("graft_skip_").toString
        VersionedTable.commit(
          orders(s, d).repartitionByRange(8, col("o_orderkey")), root)
        VersionedTable.readSkipping(s, root, "o_orderkey",
            lower = Some(1L), upper = Some(1024L))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_orderkey")).as("sum_key"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
             |FROM orders WHERE o_orderkey BETWEEN 1 AND 1024
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
