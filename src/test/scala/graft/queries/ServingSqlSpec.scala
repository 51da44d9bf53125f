package graft.queries

import graft.SparkSpecBase
import graft.etl.Bookstore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL serving layer ≡ DataFrame pipeline: the four reference queries
  * run as SQL text over the registered mart must return exactly what
  * the equivalent DataFrame compositions return. */
class ServingSqlSpec extends SparkSpecBase {

  private lazy val clean: DataFrame = {
    val c = Bookstore.cleanNulls(Bookstore.expandLocation(
      Bookstore.buildRaw(spark, "/root/testdata/sf0.001")))
    ServingSql.registerMart(c)
    c
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("top books by rating: SQL == DataFrame") {
    clean
    val sql = ServingSql.topBooksByRating(spark, minRatings = 5, k = 20)
    val api = Bookstore.ratingsFact(clean)
      .join(broadcast(Bookstore.booksDim(clean)), "ISBN")
      .groupBy(col("ISBN"), col("Book-Title"))
      .agg(round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
        count(lit(1)).as("Total-Ratings"))
      .filter(col("Total-Ratings") > 5)
      .orderBy(col("Average-Rating").desc, col("ISBN"))
      .limit(20)
      .select("ISBN", "Book-Title", "Average-Rating", "Total-Ratings")
    assert(rows(sql) === rows(api))
    assert(sql.count() > 0, "non-degenerate at sf0.001")
  }

  test("top books by TITLE grain (reference-verbatim): SQL == DataFrame") {
    clean
    val sql = ServingSql.topBooksByTitle(spark, minRatings = 5, k = 20)
    val api = Bookstore.ratingsFact(clean)
      .join(broadcast(Bookstore.booksDim(clean)), "ISBN")
      .groupBy(col("Book-Title"))
      .agg(round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
        count(lit(1)).as("Total-Ratings"))
      .filter(col("Total-Ratings") > 5)
      .orderBy(col("Average-Rating").desc, col("Book-Title"))
      .limit(20)
    assert(rows(sql) === rows(api))
    // grain sanity: title rows never exceed (ISBN, title) rows
    val isbnGrain = ServingSql.topBooksByRating(spark, minRatings = 5, k = 1000)
    val titleGrain = ServingSql.topBooksByTitle(spark, minRatings = 5, k = 1000)
    assert(titleGrain.count() <= isbnGrain.count())
  }

  test("top countries / top states: SQL == DataFrame") {
    clean
    val cust = Bookstore.customersDim(clean)
    assert(rows(ServingSql.topCountries(spark, 5)) ===
      rows(cust.groupBy(col("Country"))
        .agg(count(lit(1)).as("Customer Count"))
        .orderBy(col("Customer Count").desc, col("Country")).limit(5)))
    assert(rows(ServingSql.topStates(spark, "europe", 5)) ===
      rows(cust.filter(col("Country") === "europe")
        .groupBy(col("Country"), col("State"))
        .agg(count(lit(1)).as("Customer Count"))
        .orderBy(col("Customer Count").desc, col("State")).limit(5)))
  }

  test("top authors: SQL == DataFrame, HAVING-> variant") {
    clean
    val sql = ServingSql.topAuthors(spark, minRatings = 5, k = 10)
    val api = Bookstore.ratingsFact(clean)
      .join(broadcast(Bookstore.booksDim(clean)), "ISBN")
      .groupBy(col("Book-Author"))
      .agg(round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
        count(lit(1)).as("Total-Ratings"))
      .filter(col("Total-Ratings") > 5)
      .orderBy(col("Average-Rating").desc, col("Book-Author"))
      .limit(10)
    assert(rows(sql) === rows(api))
  }
}
