package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's ETL surface rebuilt Spark-first (SURVEY.md §2a):
  * a 12-string-column denormalized ratings table is expanded
  * (Location split), cleaned (`" "` → NULL, then key-null drop), and
  * projected into a star schema + a top-k table.
  *
  * Semantics preserved from the reference (cites into /root/reference):
  *  - Location is `'city, state, country'` split on bare `','`, so
  *    state/country keep a leading space (workflow/Transformer.py:16-18);
  *    the dims trim — documented decision per SURVEY.md §7.4 trap 6.
  *  - Only the literal one-space string `" "` becomes NULL; `""`
  *    survives (workflow/Transformer.py:35-36).
  *  - The null-drop subset is the six key columns; `Age` is NOT in it,
  *    so cleaned-to-NULL ages survive (workflow/Transformer.py:23).
  *  - Top-k groups by (ISBN, Book-Title), filters `count >= minRatings`,
  *    sorts by average desc (workflow/Transformer.py:98-102) — here with
  *    an ISBN tie-break for determinism (SURVEY.md §7.4 trap 1).
  *
  * Scale notes: the raw build joins the fact to `orders`/`customer` by
  * key (shuffle joins that AQE co-partitions) and broadcasts every
  * bounded dim. `runPipeline` persists the cleaned frame once and fans
  * out the four writes — the shared-prefix reuse the reference misses
  * (SURVEY.md §4, spark-main.py:18-27 recomputes it 4×).
  */
object Bookstore {

  /** Columns whose NULLs disqualify a row (reference drop subset). */
  val keyColumns: Seq[String] =
    Seq("Customer-ID", "ISBN", "Book-Rating", "Country", "State", "City")

  /** Deterministic 12-column raw bookstore table synthesized from the
    * testdata star schema (TESTDATA.md) — the stand-in for the
    * reference's raw parquet scan. `custkey % 13` rows get a blank
    * Location and `custkey % 7` rows a blank Age, so the cleaning
    * operators have real work at every scale factor. */
  def buildRaw(s: SparkSession, dir: String): DataFrame = {
    // The testdata files are single-row-group parquet => one input
    // split, so without this spread the whole pipeline (broadcast
    // joins + heavy string projection) collapses into a 1-task stage.
    // On a real cluster the source has many splits and this exchange
    // is unnecessary — it guards the degenerate-split case.
    // HASH-repartition on the row key rather than round-robin: a
    // keyless repartition(n) pays a LOCAL SORT of its input first
    // (spark.sql.execution.sortBeforeRepartition, needed so retried
    // tasks reproduce the same row placement) — on this one-split
    // scan that sort is single-core over the whole table. Hash
    // placement is deterministic by value, so no sort; l_orderkey's
    // cardinality (orders >> partitions) spreads evenly (guide §2.5).
    val li = Tables.lineitem(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
    val o = Tables.orders(s, dir)
    val isbn = col("l_partkey").cast("string")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("o_custkey").cast("string").as("Customer-ID"),
        isbn.as("ISBN"),
        (col("l_quantity").cast("long") % 11).cast("string").as("Book-Rating"),
        when(col("c_custkey") % 13 === 0, lit(" "))
          .otherwise(concat(
            lit("city"), (col("c_custkey") % 100).cast("string"), lit(", "),
            lower(col("n_name")), lit(", "), lower(col("r_name"))))
          .as("Location"),
        when(col("c_custkey") % 7 === 0, lit(" "))
          .otherwise((lit(18) + col("c_custkey") % 62).cast("string"))
          .as("Age"),
        col("p_name").as("Book-Title"),
        concat(lit("author "), col("p_type")).as("Book-Author"),
        (lit(1900) + col("p_partkey") % 120).cast("string").as("Year-Of-Publication"),
        col("p_brand").as("Publisher"),
        concat(lit("http://images.example/"), isbn, lit("/S.jpg")).as("Image-URL-S"),
        concat(lit("http://images.example/"), isbn, lit("/M.jpg")).as("Image-URL-M"),
        concat(lit("http://images.example/"), isbn, lit("/L.jpg")).as("Image-URL-L"))
  }

  /** O3-O5: split `Location` into City / State / Country (split on bare
    * `','`; items 1..2 keep their leading space). */
  def expandLocation(df: DataFrame): DataFrame = {
    val parts = split(col("Location"), ",")
    // get() (not getItem): out-of-bounds yields NULL instead of an ANSI
    // error — a malformed Location must clean away, not kill the job.
    df.withColumns(Map(
      "City" -> get(parts, lit(0)),
      "State" -> get(parts, lit(1)),
      "Country" -> get(parts, lit(2))))
  }

  /** O6-O7: rewrite the literal one-space string to NULL in EVERY
    * column, then drop rows with NULL in any key column. */
  def cleanNulls(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
        when(col(c) === " ", lit(null)).otherwise(col(c)).as(c)): _*)
      .na.drop("any", keyColumns)

  /** Books dimension: 5-column distinct projection (O8+O9). */
  def booksDim(df: DataFrame): DataFrame =
    df.select(col("ISBN"), col("Book-Title"), col("Book-Author"),
        col("Year-Of-Publication"), col("Publisher"))
      .distinct()

  /** Customers dimension, geography trimmed at dim build. */
  def customersDim(df: DataFrame): DataFrame =
    df.select(col("Customer-ID"), col("Age"), trim(col("City")).as("City"),
        trim(col("State")).as("State"), trim(col("Country")).as("Country"))
      .distinct()

  /** Ratings fact: plain projection, intentionally NOT deduplicated
    * (workflow/Transformer.py:71-82). */
  def ratingsFact(df: DataFrame): DataFrame =
    df.select(col("ISBN"), col("Customer-ID"), col("Book-Rating"))

  /** Top-k books by average rating (O10-O12). `minRatings` is the
    * HAVING threshold (reference hardcodes 100). Rating strings are
    * cast to double explicitly — ANSI-safe (SURVEY.md §7.4 trap 4). */
  def topBooks(df: DataFrame, minRatings: Long = 100, k: Int = 100): DataFrame =
    df.groupBy(col("ISBN"), col("Book-Title"))
      .agg(
        round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
        count(lit(1)).as("Total-Ratings"))
      .filter(col("Total-Ratings") >= minRatings)
      .orderBy(col("Average-Rating").desc, col("ISBN"))
      .limit(k)

  /** O14: the string-keyed transformer registry (the reference's
    * dispatch table, workflow/Transformer.py:105-123). */
  val registry: Map[String, DataFrame => DataFrame] = Map(
    "ExpandData" -> expandLocation,
    "CleanData" -> cleanNulls,
    "BooksDimensionTable" -> booksDim,
    "CustomersDimensionTable" -> customersDim,
    "RatingsFactTable" -> ratingsFact,
    "Top100Books" -> (df => topBooks(df)))

  def transform(df: DataFrame, kind: String): DataFrame =
    registry.getOrElse(kind,
      throw new IllegalArgumentException(s"unknown transform: $kind"))(df)

  /** The full pipeline (spark-main.py:13-27): raw → expand → clean →
    * 4 writes. The cleaned frame is persisted once. `mode` defaults to
    * overwrite (tests); pass "append" for reference-parity nightly
    * semantics (workflow/StringConstant.py:4 — non-idempotent, trap 5).
    */
  def runPipeline(s: SparkSession, raw: DataFrame, outDir: String,
      mode: String = "overwrite", minRatings: Long = 100): Unit = {
    val clean = cleanNulls(expandLocation(raw)).persist()
    try {
      Seq(
        "Books" -> booksDim(clean),
        "Customers" -> customersDim(clean),
        "Ratings" -> ratingsFact(clean),
        "Top100books" -> topBooks(clean, minRatings))
        .foreach { case (name, df) =>
          df.write.mode(mode).option("header", true).csv(s"$outDir/$name")
        }
    } finally clean.unpersist()
  }
}
