package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter in plain DataFrame algebra — the runtime
  * join-pruning filter (SURVEY.md §2b: at 100 TB, a selective dim-side
  * predicate should cut the fact scan BEFORE the join shuffle; Spark's
  * own injected bloom does this opaquely, this one is engine-portable
  * and oracle-checkable).
  *
  * Representation: `m` bits packed 63-per-word (bits 0..62 of a
  * signed 64-bit word — the sign bit stays clear because DuckDB's
  * `<<` overflow-checks `1::BIGINT << 63`, and an always-nonnegative
  * word also sidesteps arithmetic-shift sign extension) — a DataFrame
  * of (`w` word-index, `word` bits), ~m/63 rows, broadcastable at any
  * realistic m. Hash family: position j of key x is
  * `((x mod P) * (2j+1) + j*12345 + 67) mod P mod m` — the same
  * permutation family as the MinHash/CMS kernels, integer-exact
  * cross-engine.
  *
  * Contract: no false negatives ever (a key that was inserted always
  * passes); false positives at the standard (1-e^{-kn/m})^k rate.
  * Unlike `DataFrameStatFunctions.bloomFilter`, nothing collects to
  * the driver: build is an aggregation, probe is a broadcast join.
  */
object BloomOps {

  private val P = graft.expressions.TextExpressions.P

  /** The k probe positions of `key` (long column) in an m-bit filter. */
  private def positions(key: Column, m: Int, k: Int): Column =
    array((0 until k).map(j =>
      (pmod(key, lit(P)) * (2 * j + 1) + j * 12345L + 67) % P % m): _*)

  /** Build the bit table from `keys(keyCol)` (long-typed; duplicates
    * fine). */
  def build(keys: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    require(k >= 1, s"k must be >= 1: $k")
    keys
      .select(explode(positions(col(keyCol), m, k)).as("pos"))
      .select(expr("pos div 63").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 63) AS INT))")
          .as("bit"))
      .groupBy(col("w"))
      .agg(expr("bit_or(bit)").as("word"))
  }

  /** Adds `passCol` (boolean): true iff every probe bit of
    * `keyCol` is set in `bits`. `idCols` must uniquely identify probe
    * rows (they survive; all other columns are re-attached by the
    * caller if needed — the probe is a pre-join pruning step, so its
    * natural position is directly after the scan with only the join
    * key and row id in flight). */
  def mightContain(probe: DataFrame, idCols: Seq[String], keyCol: String,
      bits: DataFrame, m: Int, k: Int, passCol: String): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    // The internal working columns are added with withColumn/select,
    // which silently REPLACE same-named inputs — an idCol named "w"
    // would regroup the verdict by the word index (same corruption
    // class AsOfJoin guards against).
    val reserved = Seq("pos", "w", "word", "hit")
    val clash = (idCols :+ keyCol).intersect(reserved)
    require(clash.isEmpty,
      s"probe columns ${clash.mkString(",")} collide with mightContain's " +
        s"internal names (${reserved.mkString(", ")}) — rename them first")
    probe
      .select((idCols :+ keyCol).map(col): _*)
      .select(col("*"), explode(positions(col(keyCol), m, k)).as("pos"))
      .withColumn("w", expr("pos div 63"))
      // missing word row = all-zero word = bit not set
      .join(broadcast(bits), Seq("w"), "left")
      .withColumn("hit",
        coalesce(expr("(shiftright(word, CAST(pmod(pos, 63) AS INT)) & 1) = 1"),
          lit(false)))
      .groupBy((idCols :+ keyCol).map(col): _*)
      .agg(min(col("hit")).as(passCol))
  }
}
