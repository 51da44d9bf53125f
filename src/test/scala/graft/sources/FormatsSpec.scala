package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class FormatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("fmt").toString

  private val df = Seq(
    ("a", "usa", 1), ("b", "usa", 2), ("c", "germany", 3))
    .toDF("id", "country", "v")

  test("csv roundtrip with explicit schema keeps types without inference") {
    val out = tmp()
    Formats.writeCsv(df, out)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("country", StringType),
      StructField("v", IntegerType)))
    val back = Formats.readCsv(spark, out, Some(schema))
    assert(back.schema("v").dataType === IntegerType)
    assert(back.count() === 3)
  }

  test("json-lines roundtrip") {
    val out = tmp()
    df.write.mode("overwrite").json(out)
    assert(Formats.readJson(spark, out).count() === 3)
  }

  test("partitioned parquet: layout + partition pruning in the scan") {
    val out = tmp()
    Formats.writePartitionedParquet(df, out, Seq("country"))
    assert(new java.io.File(s"$out/country=usa").isDirectory)
    val q = Formats.readParquet(spark, out).filter(col("country") === "usa")
    assert(q.count() === 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("country"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("pluggable table write/read: catalog roundtrip with partition metadata") {
    Formats.writeTable(df, "fmt_tbl", format = "parquet",
      partitionCols = Seq("country"))
    val back = Formats.readTable(spark, "fmt_tbl")
    assert(back.count() === 3)
    // partition column recorded in the catalog → pruning at scan
    val plan = back.filter(col("country") === "usa")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("country"),
      s"catalog partition pruning missing:\n$plan")
    // append mode accumulates (the reference's nightly-append semantics)
    Formats.writeTable(df, "fmt_tbl", partitionCols = Seq("country"),
      mode = "append")
    assert(Formats.readTable(spark, "fmt_tbl").count() === 6)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    Formats.writeBucketedTable(df, "fmt_left", "id", 4)
    Formats.writeBucketedTable(
      Seq(("a", 10), ("b", 20)).toDF("id", "w"), "fmt_right", "id", 4)
    val joined = spark.table("fmt_left")
      .join(spark.table("fmt_right"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() === 2)
  }

  test("schema evolution: columns added by later writers merge, old rows null") {
    val dir = tmp()
    // v1 writer: (id, v)
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // v2 writer adds a column
    Seq((3L, 30L, "x")).toDF("id", "v", "tag")
      .write.mode("append").parquet(dir)
    val evolved = Formats.readParquetEvolved(spark, dir)
    assert(evolved.columns.sorted.toSeq === Seq("id", "tag", "v"))
    val rows = evolved.orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        if (r.isNullAt(r.fieldIndex("tag"))) None
        else Some(r.getString(r.fieldIndex("tag")))))
      .toSeq
    assert(rows === Seq((1L, None), (2L, None), (3L, Some("x"))))
    // the plain read is allowed to pick EITHER footer's schema —
    // evolution must be explicit, which is why the helper exists
    assert(Formats.readParquet(spark, dir).count() === 3)
  }
}
