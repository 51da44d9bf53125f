package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the reference's cleaning/expansion semantics (SURVEY.md §7.4
  * traps): exact one-space nulling, Age survival, bare-comma split with
  * leading spaces, registry dispatch, top-k tie-breaks, write layout. */
class BookstoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def rawRow(
      cust: String = "1", isbn: String = "b1", rating: String = "5",
      loc: String = "springfield, il, usa", age: String = "30") =
    (cust, isbn, rating, loc, age, "title", "author x", "1999", "pub",
      "u", "u", "u")

  private val rawCols = Seq("Customer-ID", "ISBN", "Book-Rating",
    "Location", "Age", "Book-Title", "Book-Author", "Year-Of-Publication",
    "Publisher", "Image-URL-S", "Image-URL-M", "Image-URL-L")

  private def df(rows: (String, String, String, String, String, String,
      String, String, String, String, String, String)*) =
    rows.toSeq.toDF(rawCols: _*)

  test("split keeps leading spaces in State/Country (bare-comma split)") {
    val out = Bookstore.expandLocation(df(rawRow()))
      .select("City", "State", "Country").head()
    assert(out === Row("springfield", " il", " usa"))
  }

  test("malformed Location yields NULLs, not an ANSI error") {
    val out = Bookstore.expandLocation(df(rawRow(loc = "cityonly")))
      .select("City", "State", "Country").head()
    assert(out === Row("cityonly", null, null))
  }

  test("only the literal one-space string becomes NULL; empty survives") {
    val cleaned = Bookstore.cleanNulls(
      Bookstore.expandLocation(df(
        rawRow(age = " "), // one space -> NULL, row survives (Age not a key)
        rawRow(cust = "2", age = ""), // empty string survives as-is
        rawRow(cust = "3", loc = " ")))) // blank location -> keys NULL -> dropped
    val byCust = cleaned.select("Customer-ID", "Age").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCust === Map("1" -> null, "2" -> ""))
  }

  test("ratings fact keeps duplicates; dims dedup") {
    val d = df(rawRow(), rawRow())
    val clean = Bookstore.cleanNulls(Bookstore.expandLocation(d))
    assert(Bookstore.ratingsFact(clean).count() === 2)
    assert(Bookstore.booksDim(clean).count() === 1)
    assert(Bookstore.customersDim(clean).count() === 1)
  }

  test("customers dim trims geography") {
    val clean = Bookstore.cleanNulls(Bookstore.expandLocation(df(rawRow())))
    assert(Bookstore.customersDim(clean).select("State", "Country").head()
      === Row("il", "usa"))
  }

  test("topBooks: string ratings average via explicit cast, HAVING, tie-break") {
    val rows = Seq.tabulate(4)(i => rawRow(cust = s"c$i", isbn = "a", rating = "4")) ++
      Seq.tabulate(4)(i => rawRow(cust = s"d$i", isbn = "b", rating = "4")) ++
      Seq(rawRow(isbn = "rare", rating = "10"))
    val clean = Bookstore.cleanNulls(Bookstore.expandLocation(df(rows: _*)))
    val top = Bookstore.topBooks(clean, minRatings = 2).collect()
    // 'rare' filtered by HAVING; equal averages tie-break by ISBN asc
    assert(top.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(top.head.getDouble(2) === 4.0)
  }

  test("registry dispatches and rejects unknown kinds") {
    val d = df(rawRow())
    assert(Bookstore.transform(d, "ExpandData").columns.contains("Country"))
    intercept[IllegalArgumentException](Bookstore.transform(d, "nope"))
  }

  test("runPipeline writes the four mart tables as headered CSV") {
    val out = Files.createTempDirectory("mart").toString
    Bookstore.runPipeline(spark, df(rawRow(), rawRow(cust = "9", isbn = "z")),
      out, minRatings = 1)
    val top = spark.read.option("header", true).csv(s"$out/Top100books")
    assert(top.columns.toSeq ===
      Seq("ISBN", "Book-Title", "Average-Rating", "Total-Ratings"))
    assert(top.count() === 2)
    assert(spark.read.option("header", true).csv(s"$out/Ratings").count() === 2)
  }

  test("clean(clean(df)) == clean(df) (idempotence)") {
    val d = Bookstore.expandLocation(df(rawRow(age = " "), rawRow(cust = "2")))
    val once = Bookstore.cleanNulls(d)
    val twice = Bookstore.cleanNulls(once)
    assert(once.collect().toSeq === twice.collect().toSeq)
  }
}
