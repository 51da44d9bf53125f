package graft.queries

import graft.QueryDef
import graft.etl.Bookstore
import org.apache.spark.sql.functions._

/** ETL-parity catalog: the reference's full pipeline (raw → expand →
  * clean → star schema → top-k) and its four serving queries
  * (external-table-queries.sql:13-42), run through [[Bookstore]] over
  * the deterministic synthesized raw table. Every entry's oracle
  * replicates the whole pipeline in DuckDB SQL, so the differential
  * check covers expansion, cleaning, dedup, and serving semantics
  * end-to-end — not just the final operator.
  */
object Etl {

  /** DuckDB mirror of Bookstore.buildRaw + expandLocation + cleanNulls.
    * Only the columns consumed downstream are carried (the image URLs
    * can never be `" "` and feed nothing here). */
  private val cleanCte =
    """raw AS (
      |  SELECT CAST(o.o_custkey AS VARCHAR) AS "Customer-ID",
      |    CAST(l.l_partkey AS VARCHAR) AS "ISBN",
      |    CAST(CAST(l.l_quantity AS BIGINT) % 11 AS VARCHAR) AS "Book-Rating",
      |    CASE WHEN c.c_custkey % 13 = 0 THEN ' '
      |         ELSE 'city' || CAST(c.c_custkey % 100 AS VARCHAR) || ', ' ||
      |              lower(n.n_name) || ', ' || lower(r.r_name) END AS "Location",
      |    CASE WHEN c.c_custkey % 7 = 0 THEN ' '
      |         ELSE CAST(18 + c.c_custkey % 62 AS VARCHAR) END AS "Age",
      |    p.p_name AS "Book-Title",
      |    'author ' || p.p_type AS "Book-Author",
      |    CAST(1900 + p.p_partkey % 120 AS VARCHAR) AS "Year-Of-Publication",
      |    p.p_brand AS "Publisher"
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey),
      |expanded AS (SELECT raw.*,
      |    string_split("Location", ',')[1] AS "City",
      |    string_split("Location", ',')[2] AS "State",
      |    string_split("Location", ',')[3] AS "Country"
      |  FROM raw),
      |clean AS (SELECT "Customer-ID", "ISBN", "Book-Rating",
      |    CASE WHEN "Age" = ' ' THEN NULL ELSE "Age" END AS "Age",
      |    "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher",
      |    CASE WHEN "City" = ' ' THEN NULL ELSE "City" END AS "City",
      |    "State", "Country"
      |  FROM expanded
      |  WHERE "Customer-ID" IS NOT NULL AND "ISBN" IS NOT NULL
      |    AND "Book-Rating" IS NOT NULL
      |    AND (CASE WHEN "City" = ' ' THEN NULL ELSE "City" END) IS NOT NULL
      |    AND "State" IS NOT NULL AND "Country" IS NOT NULL)""".stripMargin

  /** Spark side of the same prefix. */
  private def clean(s: org.apache.spark.sql.SparkSession, d: String) =
    Bookstore.cleanNulls(Bookstore.expandLocation(Bookstore.buildRaw(s, d)))

  val defs: Seq[QueryDef] = Seq(

    // The reference's whole spine: Top100Books off the cleaned table
    // (HAVING >= 20 fits testdata group sizes; reference uses 100).
    QueryDef(
      "q39_etl_top100_books",
      (s, d) => Bookstore.topBooks(clean(s, d), minRatings = 20),
      Some(s"""WITH $cleanCte
             |SELECT "ISBN", "Book-Title",
             |  round(avg(CAST("Book-Rating" AS DOUBLE)), 4) AS "Average-Rating",
             |  count(*) AS "Total-Ratings"
             |FROM clean GROUP BY "ISBN", "Book-Title"
             |HAVING count(*) >= 20
             |ORDER BY "Average-Rating" DESC, "ISBN" LIMIT 100""".stripMargin)),

    // Books dimension: 5-col distinct projection (O8+O9).
    QueryDef(
      "q40_etl_books_dim",
      (s, d) => Bookstore.booksDim(clean(s, d)).orderBy(col("ISBN")),
      Some(s"""WITH $cleanCte
             |SELECT DISTINCT "ISBN", "Book-Title", "Book-Author",
             |  "Year-Of-Publication", "Publisher"
             |FROM clean ORDER BY "ISBN"""".stripMargin)),

    // Customers dimension: geography trimmed at dim build; NULL ages
    // survive (Age is outside the drop subset — trap 3).
    QueryDef(
      "q41_etl_customers_dim",
      (s, d) => Bookstore.customersDim(clean(s, d)).orderBy(col("Customer-ID")),
      Some(s"""WITH $cleanCte
             |SELECT DISTINCT "Customer-ID", "Age", trim("City") AS "City",
             |  trim("State") AS "State", trim("Country") AS "Country"
             |FROM clean ORDER BY "Customer-ID"""".stripMargin)),

    // Serving query 2 analog: top-10 countries by customer count.
    QueryDef(
      "q42_etl_top_countries",
      (s, d) =>
        Bookstore.customersDim(clean(s, d))
          .groupBy(col("Country"))
          .agg(count(lit(1)).as("Customer-Count"))
          .orderBy(col("Customer-Count").desc, col("Country"))
          .limit(10),
      Some(s"""WITH $cleanCte,
             |cust AS (SELECT DISTINCT "Customer-ID", "Age", trim("City") AS "City",
             |    trim("State") AS "State", trim("Country") AS "Country"
             |  FROM clean)
             |SELECT "Country", count(*) AS "Customer-Count"
             |FROM cust GROUP BY "Country"
             |ORDER BY "Customer-Count" DESC, "Country" LIMIT 10""".stripMargin)),

    // Serving query 3 analog: top-10 states inside one country.
    QueryDef(
      "q43_etl_top_states",
      (s, d) =>
        Bookstore.customersDim(clean(s, d))
          .filter(col("Country") === "europe")
          .groupBy(col("Country"), col("State"))
          .agg(count(lit(1)).as("Customer-Count"))
          .orderBy(col("Customer-Count").desc, col("State"))
          .limit(10),
      Some(s"""WITH $cleanCte,
             |cust AS (SELECT DISTINCT "Customer-ID", "Age", trim("City") AS "City",
             |    trim("State") AS "State", trim("Country") AS "Country"
             |  FROM clean)
             |SELECT "Country", "State", count(*) AS "Customer-Count"
             |FROM cust WHERE "Country" = 'europe'
             |GROUP BY "Country", "State"
             |ORDER BY "Customer-Count" DESC, "State" LIMIT 10""".stripMargin)),

    // Serving query 4 analog: top authors by average rating
    // (join fact to dim, HAVING > n — note > vs >= per the reference's
    // two variants, SURVEY.md §2a discrepancies).
    QueryDef(
      "q44_etl_top_authors",
      (s, d) => {
        // Both branches (fact + dim) read the cleaned table; persist
        // the pruned column set once instead of re-running the 6-way
        // raw build per branch. Only the 7 columns the branches need
        // are cached — the full clean frame carries 14 incl. the image
        // URLs. (Bench/Verify clear the cache after each query.)
        val c = clean(s, d)
          .select(col("ISBN"), col("Customer-ID"), col("Book-Rating"),
            col("Book-Title"), col("Book-Author"),
            col("Year-Of-Publication"), col("Publisher"))
          .persist()
        Bookstore.ratingsFact(c)
          .join(broadcast(Bookstore.booksDim(c)), Seq("ISBN"))
          .groupBy(col("Book-Author"))
          .agg(
            round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
            count(lit(1)).as("Total-Ratings"))
          .filter(col("Total-Ratings") > 100)
          .orderBy(col("Average-Rating").desc, col("Book-Author"))
          .limit(10)
      },
      Some(s"""WITH $cleanCte,
             |ratings AS (SELECT "ISBN", "Customer-ID", "Book-Rating" FROM clean),
             |books AS (SELECT DISTINCT "ISBN", "Book-Title", "Book-Author",
             |    "Year-Of-Publication", "Publisher" FROM clean)
             |SELECT b."Book-Author",
             |  round(avg(CAST(r."Book-Rating" AS DOUBLE)), 4) AS "Average-Rating",
             |  count(*) AS "Total-Ratings"
             |FROM ratings r JOIN books b ON r."ISBN" = b."ISBN"
             |GROUP BY b."Book-Author"
             |HAVING count(*) > 100
             |ORDER BY "Average-Rating" DESC, b."Book-Author" LIMIT 10""".stripMargin)),

    // Reference-VERBATIM grain of the top-books serving query
    // (external-table-queries.sql:13-19 groups by book-title ALONE;
    // q39 carries the ETL side's (ISBN, title) grain). Where one title
    // spans multiple ISBNs the two diverge — this entry merges those
    // ISBNs' ratings into one row, exactly what a user porting the
    // reference SQL gets. Same spine: fact→broadcast-dim join,
    // group, HAVING, top-k (TakeOrderedAndProject).
    QueryDef(
      "q121_etl_top_books_title",
      (s, d) => {
        val c = clean(s, d)
          .select(col("ISBN"), col("Customer-ID"), col("Book-Rating"),
            col("Book-Title"), col("Book-Author"),
            col("Year-Of-Publication"), col("Publisher"))
          .persist()
        Bookstore.ratingsFact(c)
          .join(broadcast(Bookstore.booksDim(c)), Seq("ISBN"))
          .groupBy(col("Book-Title"))
          .agg(
            round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
            count(lit(1)).as("Total-Ratings"))
          .filter(col("Total-Ratings") >= 20)
          .orderBy(col("Average-Rating").desc, col("Book-Title"))
          .limit(100)
      },
      Some(s"""WITH $cleanCte,
             |ratings AS (SELECT "ISBN", "Customer-ID", "Book-Rating" FROM clean),
             |books AS (SELECT DISTINCT "ISBN", "Book-Title", "Book-Author",
             |    "Year-Of-Publication", "Publisher" FROM clean)
             |SELECT b."Book-Title",
             |  round(avg(CAST(r."Book-Rating" AS DOUBLE)), 4) AS "Average-Rating",
             |  count(*) AS "Total-Ratings"
             |FROM ratings r JOIN books b ON r."ISBN" = b."ISBN"
             |GROUP BY b."Book-Title"
             |HAVING count(*) >= 20
             |ORDER BY "Average-Rating" DESC, b."Book-Title" LIMIT 100""".stripMargin)),

    // The mart LAYOUT the reference gestures at (README.md:40,44:
    // columnar mart + Glue partition discovery), proven to PRUNE:
    // customers written as Hive-partitioned parquet on Country, then
    // queried through a JOIN against a filtered region dim — the
    // partition filter arrives at the scan via DYNAMIC partition
    // pruning (the dim's country set is only known at run time; Spark
    // plans a dynamicpruning subquery into PartitionFilters, locked
    // by PlanShapeSpec). At 100 TB only the joined countries'
    // directories are listed/read — the same pushdown Redshift
    // Spectrum does against the reference's partitioned S3 mart. The
    // oracle is layout-free: partitioning must not change the answer.
    QueryDef(
      "q122_mart_partition_pruning",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft_dpp_").toString
        graft.sources.Formats.writePartitionedParquet(
          Bookstore.customersDim(clean(s, d)), root, Seq("Country"))
        val mart = s.read.parquet(root)
        val dim = graft.Tables.region(s, d)
          .filter(col("r_regionkey") === 3)
          .select(lower(col("r_name")).as("Country"))
        mart.join(dim, Seq("Country"))
          .groupBy(col("Country"), col("State"))
          .agg(count(lit(1)).as("Customer-Count"))
          .orderBy(col("Country"), col("State"))
      },
      Some(s"""WITH $cleanCte,
             |cust AS (SELECT DISTINCT "Customer-ID", "Age", trim("City") AS "City",
             |    trim("State") AS "State", trim("Country") AS "Country"
             |  FROM clean),
             |dim AS (SELECT lower(r_name) AS "Country" FROM region
             |  WHERE r_regionkey = 3)
             |SELECT c."Country", c."State", count(*) AS "Customer-Count"
             |FROM cust c JOIN dim d ON c."Country" = d."Country"
             |GROUP BY c."Country", c."State"
             |ORDER BY c."Country", c."State"""".stripMargin)),

    // Cleaning audit: raw vs clean row counts + surviving NULL ages —
    // pins the O6/O7 semantics (one-space → NULL; Age outside subset).
    QueryDef(
      "q45_etl_clean_stats",
      (s, d) => {
        // One pass over the expanded table with conditional aggregation
        // instead of three pipeline re-executions + cross joins.
        val keep = Bookstore.keyColumns
          .map(c => col(c).isNotNull && col(c) =!= " ")
          .reduce(_ && _)
        val ageNull = col("Age").isNull || col("Age") === " "
        Bookstore.expandLocation(Bookstore.buildRaw(s, d))
          .agg(
            count(lit(1)).as("n_raw"),
            sum(when(keep, 1L).otherwise(0L)).as("n_clean"),
            sum(when(keep && ageNull, 1L).otherwise(0L)).as("n_age_null"))
      },
      Some(s"""WITH $cleanCte
             |SELECT (SELECT count(*) FROM raw) AS n_raw,
             |  (SELECT count(*) FROM clean) AS n_clean,
             |  (SELECT count(*) FROM clean WHERE "Age" IS NULL) AS n_age_null""".stripMargin))
  )
}
