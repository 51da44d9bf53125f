package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks of the ETL surface (SURVEY.md §5.3):
  * idempotence of cleaning, dim-distinct invariants, top-k prefix
  * consistency, and split semantics — over randomly generated raw
  * tables with adversarial edge values (`" "`, `""`, missing Location
  * parts, extra commas).
  *
  * Deterministic: generators are driven from fixed seeds so failures
  * reproduce. ScalaCheck is used as the generator engine; assertions
  * run per generated dataset.
  */
class BookstorePropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val locGen: Gen[String] = Gen.oneOf(
    Gen.const(" "),
    Gen.const(""),
    Gen.const("city1, east, europe"),
    Gen.const("city2,west,asia"),          // no spaces after commas
    Gen.const("cityonly"),                 // missing state/country
    Gen.const("a, b"),                     // missing country
    Gen.const("a, b, c, d"),               // extra part
    for { c <- Gen.alphaLowerStr; s <- Gen.alphaLowerStr } yield s"$c, $s, usa")

  private val strOrBlank: Gen[String] =
    Gen.oneOf(Gen.const(" "), Gen.const(""), Gen.numStr.map(_.take(3)),
      Gen.alphaLowerStr.map(_.take(6)))

  private case class RawRow(
      `Customer-ID`: String, ISBN: String, `Book-Rating`: String,
      Location: String, Age: String, `Book-Title`: String,
      `Book-Author`: String, `Year-Of-Publication`: String,
      Publisher: String, `Image-URL-S`: String, `Image-URL-M`: String,
      `Image-URL-L`: String)

  private val rowGen: Gen[RawRow] = for {
    cid <- Gen.chooseNum(1, 40).map(_.toString)
    isbn <- Gen.chooseNum(1, 25).map(_.toString)
    rating <- Gen.oneOf(Gen.chooseNum(0, 10).map(_.toString), strOrBlank)
    loc <- locGen
    age <- strOrBlank
    title <- Gen.oneOf("t1", "t2", "t3", " ", "")
    author <- Gen.oneOf("a1", "a2", " ")
    year <- Gen.oneOf("1990", "2001", " ")
    pub <- Gen.oneOf("p1", "p2")
  } yield RawRow(cid, isbn, rating, loc, age, title, author, year, pub,
    s"http://img/$isbn/S", s"http://img/$isbn/M", s"http://img/$isbn/L")

  /** Deterministic sample of n rows from a seed. */
  private def rawDf(seed: Long, n: Int): DataFrame = {
    val rows = Iterator.iterate(Seed(seed))(_.next)
      .map(s => rowGen.pureApply(Gen.Parameters.default, s))
      .take(n).toSeq
    spark.createDataFrame(rows)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("")).sorted.toSeq

  test("cleanNulls is idempotent and drops exactly the key-null rows") {
    for (seed <- 1L to 3L) {
      val expanded = Bookstore.expandLocation(rawDf(seed, 300))
      val once = Bookstore.cleanNulls(expanded)
      val twice = Bookstore.cleanNulls(once)
      assert(canon(once) === canon(twice), s"idempotence (seed=$seed)")
      // every surviving row has non-null, non-" " key columns
      val bad = once.filter(
        Bookstore.keyColumns.map(c => col(c).isNull || col(c) === " ")
          .reduce(_ || _)).count()
      assert(bad === 0, s"key columns clean (seed=$seed)")
      // " " ages were nullified but the rows survive (Age not in subset)
      val blankAges = expanded
        .filter(Bookstore.keyColumns.map(c =>
          col(c).isNotNull && col(c) =!= " ").reduce(_ && _))
        .filter(col("Age") === " ").count()
      assert(once.filter(col("Age").isNull).count() >= blankAges,
        s"blank ages survive as NULL (seed=$seed)")
    }
  }

  test("dims are exact distinct projections") {
    for (seed <- 4L to 6L) {
      val clean = Bookstore.cleanNulls(
        Bookstore.expandLocation(rawDf(seed, 300)))
      val books = Bookstore.booksDim(clean)
      assert(books.count() === books.distinct().count(), "no dup rows")
      assert(canon(books) ===
        canon(clean.select("ISBN", "Book-Title", "Book-Author",
          "Year-Of-Publication", "Publisher").distinct()))
    }
  }

  test("topBooks equals the k-prefix of the fully sorted aggregate") {
    for (seed <- 7L to 9L) {
      val clean = Bookstore.cleanNulls(
        Bookstore.expandLocation(rawDf(seed, 400)))
      // numeric-only ratings so the double cast is ANSI-safe
      val numeric = clean.filter(col("Book-Rating").rlike("^[0-9]+$"))
      val k = 5
      val top = Bookstore.topBooks(numeric, minRatings = 2, k = k)
      val full = numeric.groupBy(col("ISBN"), col("Book-Title"))
        .agg(round(avg(col("Book-Rating").cast("double")), 4).as("Average-Rating"),
          count(lit(1)).as("Total-Ratings"))
        .filter(col("Total-Ratings") >= 2)
        .orderBy(col("Average-Rating").desc, col("ISBN"))
      assert(canon(top) === canon(full.limit(k)),
        s"top-k prefix (seed=$seed)")
    }
  }

  test("expandLocation preserves bare-comma split semantics") {
    for (seed <- 10L to 12L) {
      val df = rawDf(seed, 200)
      val got = Bookstore.expandLocation(df)
        .select("Location", "City", "State", "Country").collect()
      got.foreach { r =>
        val parts = r.getString(0).split(",", -1)
        def want(i: Int): Option[String] =
          if (parts.length > i) Some(parts(i)) else None
        assert(Option(r.getString(1)) === want(0), s"City of '${r.getString(0)}'")
        assert(Option(r.getString(2)) === want(1), s"State of '${r.getString(0)}'")
        assert(Option(r.getString(3)) === want(2), s"Country of '${r.getString(0)}'")
      }
    }
  }
}
