package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst column pruning / predicate pushdown
  * reach the scan (verify with `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")

  /** `events` with the parquet timestamp normalized to a fixed shape,
    * whatever physical type the generator wrote:
    *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]); sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (see Verify/Bench)
    *     so it arrives as a LongType of epoch-nanos.
    *   - parquet TIMESTAMP(MICROS) (isAdjustedToUTC either way): arrives
    *     as TimestampType or TimestampNTZType; sessions pin
    *     `spark.sql.session.timeZone=UTC`, making the NTZ→TIMESTAMP cast
    *     value-identity and matching DuckDB's naive `epoch_ns(ts)`.
    * Output columns (identical either way):
    *   - `ts`      TimestampType at microsecond precision (exact integer
    *               `div`, no double round-trip — epoch-nanos overflows the
    *               53-bit double mantissa)
    *   - `ts_ns`   epoch nanoseconds as long (oracle: `epoch_ns(ts)`)
    *   - `ts_sec`  epoch seconds as long (exact in both Spark and DuckDB,
    *               the oracle-safe form for time arithmetic)
    */
  def eventsNorm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .withColumn("ts_sec", expr("ts_ns div 1000000000"))
      case _ =>
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
          .withColumn("ts_sec", expr("ts_ns div 1000000000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One catalog entry: the Spark query plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same bare table names.
  *
  * Determinism contract (SURVEY.md §7.4): every query ends in a fully
  * tie-broken ORDER BY, float aggregates are rounded, and column aliases
  * match the oracle exactly (the driver sorts columns by name and hashes
  * values).
  *
  * NOTE the trailing un-limited ORDER BY is a HARNESS artifact, not a
  * production pattern: the differential check hashes rows in order, so
  * results must be totally ordered. A real pipeline would stop at the
  * aggregate/limit above the final sort — copying the global sort into
  * a 100 TB job would serialize the result through one range exchange
  * for no semantic gain.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
