package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Sketch-based summaries (SURVEY.md §2b aggregations row, beyond the
  * q47 HLL distinct): fixed-size frequency summaries for heavy-hitter
  * queries over unbounded key domains — the shape that replaces exact
  * per-key counts when the vocabulary itself no longer fits a shuffle
  * at 100 TB.
  */
object Sketches {
  import Tables._

  private val P = TextOps.P
  private val Depth = 4
  private val Width = 256

  val defs: Seq[QueryDef] = Seq(

    // Count-min heavy hitters: top tokens by exact count, with the CMS
    // estimate next to the truth. The sketch here is built
    // ALGEBRAICALLY — row j, bucket b holds the total count of all
    // tokens hashing to b — which is exactly the matrix the mergeable
    // CountMinAgg aggregator produces (SketchesSpec asserts the two
    // are identical cell-for-cell); this form is the one a SQL oracle
    // can rebuild bit-for-bit. The estimate invariant `cms_est >=
    // n_exact` (one-sided error) is emitted as a checked column, and
    // `overest` quantifies collision error at 4×256 cells. At scale
    // the aggregator replaces the exact groupBy: partials merge
    // map-side into 8 KB buffers regardless of key cardinality.
    QueryDef(
      "q65_cms_heavy_hitters",
      (s, d) => {
        val tok = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
        val exact = tok.groupBy(col("tok"))
          .agg(count(lit(1)).as("n_exact"))
        // Hash only the distinct vocabulary; summing exact counts into
        // buckets equals counting occurrences directly (same sums).
        val vocab = exact.withColumn("th",
          element_at(TextOps.tokenHashes(array(col("tok"))), 1))
        val bucketed = vocab.select(col("tok"), col("n_exact"),
          explode(array((0 until Depth).map(j => struct(
            lit(j).as("j"),
            ((col("th") * (2 * j + 1) + j * 12345L + 67) % P % Width)
              .as("bucket"))): _*)).as("jb"))
          .select(col("tok"), col("n_exact"),
            col("jb.j").as("j"), col("jb.bucket").as("bucket"))
        val cms = bucketed.groupBy(col("j"), col("bucket"))
          .agg(sum(col("n_exact")).as("total"))
        bucketed.join(broadcast(cms), Seq("j", "bucket"))
          .groupBy(col("tok"))
          .agg(max(col("n_exact")).as("n_exact"),
            min(col("total")).as("cms_est"))
          .select(col("tok"), col("n_exact"), col("cms_est"),
            (col("cms_est") - col("n_exact")).as("overest"),
            (col("cms_est") >= col("n_exact")).as("never_under"))
          .orderBy(col("n_exact").desc, col("tok"))
          .limit(15)
      },
      Some(s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |exact AS (SELECT tok, count(*) AS n_exact FROM tok GROUP BY tok),
             |v AS (SELECT tok, n_exact,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(tok, ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |      (h, c) -> (h*31 + c) % $P) AS th
             |  FROM exact),
             |b AS (SELECT tok, n_exact, j,
             |    (th*(2*j+1) + j*12345 + 67) % $P % $Width AS bucket
             |  FROM v, (SELECT unnest(range(0, $Depth)) AS j)),
             |cms AS (SELECT j, bucket, CAST(sum(n_exact) AS BIGINT) AS total
             |  FROM b GROUP BY j, bucket),
             |est AS (SELECT b.tok, b.n_exact, min(c.total) AS cms_est
             |  FROM b JOIN cms c ON b.j = c.j AND b.bucket = c.bucket
             |  GROUP BY b.tok, b.n_exact)
             |SELECT tok, n_exact, cms_est, cms_est - n_exact AS overest,
             |  cms_est >= n_exact AS never_under
             |FROM est ORDER BY n_exact DESC, tok LIMIT 15""".stripMargin))
  )
}
