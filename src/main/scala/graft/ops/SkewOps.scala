package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §7.4 trap 8 / the 100 TB
  * posture): salting for hot keys.
  *
  * Where this sits vs AQE: adaptive execution splits oversized shuffle
  * PARTITIONS (`spark.sql.adaptive.skewJoin.enabled`, on by default),
  * but it cannot split a single hot KEY — all rows of one key hash to
  * one reducer no matter how partitions are rebalanced. Salting splits
  * the key itself:
  *
  *  - aggregation: two-phase — aggregate on (key, salt) first (the hot
  *    key's rows land on `salts` different reducers), then merge the
  *    partials per key. Correct for any algebraic aggregate
  *    (sum/count/min/max and combinations, e.g. avg = sum/count).
  *  - join: replicate the bounded side `salts`×, salt the skewed side,
  *    join on (key, salt) — each hot-key reducer handles 1/salts of
  *    the rows.
  *
  * The salt is `monotonically_increasing_id() % salts`: independent of
  * row content, so identical hot rows still spread. Determinism caveat:
  * it is stable only when the input's per-partition row order is —
  * true for scan-ordered sources (files), NOT for the output of a
  * prior shuffle, where a fetch-failure recompute can reorder rows and
  * reassign salts mid-job (the SPARK-23207 class of bug; rand() has
  * the same exposure). For salting a post-shuffle frame, checkpoint it
  * first or derive the salt from stable row content. */
object SkewOps {

  private val SaltCol = "__graft_salt"

  private def salted(df: DataFrame, salts: Int): DataFrame =
    df.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salts.toLong)))

  /** Two-phase salted sum+count per key — the building block for
    * sum/count/avg over a hot-keyed 100 TB fact table. Output columns:
    * keys, `sum_<valueCol>`, `n_rows`. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val partial = salted(df, salts)
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(valueCol)).as("s"), count(lit(1)).as("c"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("s")).as(s"sum_$valueCol"), sum(col("c")).as("n_rows"))
  }

  /** Salted inner equi-join of a skewed big side against a bounded
    * side: the bounded side is exploded `salts`× and both sides join
    * on (key, salt). Equivalent to `big.join(bounded, key)` for any
    * data; worth the replication only when a key is hot enough to
    * dominate a reducer. */
  def saltedJoin(big: DataFrame, bounded: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = salted(big, salts)
    val replicated = bounded.withColumn(
      SaltCol, explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig
      .join(replicated, Seq(key, SaltCol))
      .drop(SaltCol)
  }

  /** Top-k per hot key without a global sort: per-salt top-k first,
    * then merge — the salted form of TakeOrderedAndProject for the
    * "top N events of THE hot user" shape where one key's rows
    * overwhelm a single reducer's memory. `order` should be a total
    * order (include tie-break columns) for deterministic output. */
  def saltedTopK(df: DataFrame, keys: Seq[String], order: Column, k: Int,
      salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSalt = Window
      .partitionBy((keys :+ SaltCol).map(col): _*).orderBy(order)
    val merged = Window.partitionBy(keys.map(col): _*).orderBy(order)
    salted(df, salts)
      .withColumn("__rn1", row_number().over(perSalt))
      .filter(col("__rn1") <= k) // candidates: k per salt cover global k
      .withColumn("__rn2", row_number().over(merged))
      .filter(col("__rn2") <= k)
      .drop(SaltCol, "__rn1", "__rn2")
  }
}
