package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / CDC-upsert semantics in plain DataFrame algebra — the
  * lakehouse write-path operation (Delta/Iceberg `MERGE INTO`)
  * expressed engine-neutrally (SURVEY.md §2b sinks row; the reference's
  * append-mode nightly load is exactly the anti-pattern this replaces:
  * non-idempotent duplicate marts, workflow/StringConstant.py:4).
  *
  * Semantics per key (update rows carry a delete flag):
  *   - matched & delete    -> row removed
  *   - matched & !delete   -> update row replaces the base row
  *   - unmatched base      -> kept as-is
  *   - unmatched update    -> inserted (unless flagged delete)
  *
  * Shape: ONE full-outer shuffle join on the key — both sides
  * co-partition, no driver involvement, linear in input. At scale this
  * runs per partition-of-the-mart (rewrite only partitions containing
  * touched keys — pair with partitioned writes for that).
  *
  * Contract: `updates` must be unique per key (pre-dedup a CDC batch
  * to its latest record per key — e.g. max-by change sequence number).
  */
object MergeOps {

  /** @param base      current table state
    * @param updates   CDC batch: same schema as `base` plus `deleteCol`
    * @param key       equi-merge key column (same name both sides)
    * @param deleteCol boolean column on `updates`: true = tombstone
    */
  def merge(base: DataFrame, updates: DataFrame, key: String,
      deleteCol: String): DataFrame = {
    val dataCols = base.columns.filter(_ != key).toSeq
    require(updates.columns.toSet == base.columns.toSet + deleteCol,
      s"updates must carry base's schema plus $deleteCol " +
        s"(got ${updates.columns.mkString(",")})")
    val b = base.select(col(key) +: dataCols.map(c => col(c).as(s"b_$c")): _*)
    val u = updates.select(
      col(key) +: (dataCols.map(c => col(c).as(s"u_$c")) :+
        col(deleteCol).as("__mrg_del") :+ lit(true).as("__mrg_hit")): _*)
    b.join(u, Seq(key), "full_outer")
      // tombstone for an existing key (or a no-op delete for an
      // unmatched key) -> drop the row
      .filter(!coalesce(col("__mrg_del"), lit(false)))
      .select(col(key) +: dataCols.map(c =>
        when(coalesce(col("__mrg_hit"), lit(false)), col(s"u_$c"))
          .otherwise(col(s"b_$c")).as(c)): _*)
  }
}
