package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps
import org.apache.spark.sql.expressions.Window
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

  /** q85 linear-counting table, micro-scaled ln(64/v) — computed once
    * here and inlined into BOTH the Spark plan and the oracle SQL. */
  private val HllLn = graft.ops.HllAgg.lnMicro(64)

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
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
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
             |FROM est ORDER BY n_exact DESC, tok LIMIT 15""".stripMargin)),

    // Portable HyperLogLog (graft.ops.HllAgg): distinct counts whose
    // SKETCH — not just the answer — is reproducible by any engine.
    // Spark's approx_count_distinct (q47) answers the question but its
    // HLL++ register layout is private; here the registers are built
    // from cross-engine-exact arithmetic (Knuth hash mod P, trailing-
    // zero rank via the bit_count((x&-x)-1) identity) so the DuckDB
    // oracle rebuilds the identical 64-register sketch and the
    // identical all-integer estimate, including the linear-counting
    // small-range branch (exercised by the supplier-per-nation grain,
    // ~4 keys/group; the customer-per-priority grain exercises the raw
    // harmonic-mean branch). The ln() table for linear counting is
    // computed ONCE in the driver and inlined into both plans — libm
    // never runs per-engine. At 100 TB the mergeable HllAgg aggregator
    // (SketchAggregatesSpec proves it produces these exact registers)
    // replaces count(DISTINCT): 64 bytes per group, map-side merge,
    // and sketches from different days/clusters union by register max.
    QueryDef(
      "q85_hll_distinct",
      (s, d) => {
        val m = 64
        val width = 24                  // h < P < 2^30, minus 6 bucket bits
        val scale = 1L << (width + 1)
        val num = graft.ops.HllAgg.alphaScaled(m) * m * m * scale
        val keys = orders(s, d)
          .select(lit("cust_by_priority").as("grain"),
            col("o_orderpriority").as("grp"), col("o_custkey").as("key"))
          .unionByName(supplier(s, d)
            .select(lit("supp_by_nation").as("grain"),
              col("s_nationkey").cast("string").as("grp"),
              col("s_suppkey").as("key")))
        val reg = keys
          // Affine Knuth step + quadratic mix (see HllAgg.hash: the
          // affine step alone leaves sequential keys' trailing-zero
          // ranks structured → badly biased estimates).
          .withColumn("h0", pmod(col("key") * lit(2654435761L), lit(P)))
          .withColumn("h", expr(s"(h0 * h0 + h0) % $P"))
          .withColumn("bucket", col("h") % m)
          .withColumn("rest", expr(s"h div $m"))
          .groupBy(col("grain"), col("grp"), col("bucket"))
          .agg(max(when(col("rest") === 0, width + 1)
            .otherwise(expr("bit_count((rest & -rest) - 1) + 1"))).as("reg"))
        val sums = reg.groupBy(col("grain"), col("grp"))
          .agg(sum(expr(s"shiftright(CAST($scale AS BIGINT), CAST(reg AS INT))"))
            .as("s_present"), count(lit(1)).as("n_buckets"))
          .withColumn("n_empty", lit(m) - col("n_buckets"))
          .withColumn("S", col("s_present") + col("n_empty") * scale)
          .withColumn("raw", expr(s"CAST($num AS BIGINT) div (1000 * S)"))
          .withColumn("hll_est",
            when(col("n_empty") > 0 && col("raw") <= lit(5L * m / 2),
              expr(s"($m * element_at(array(${HllLn.map(_ + "L").mkString(",")}), " +
                "CAST(n_empty AS INT))) div 1000000"))
              .otherwise(col("raw")))
        keys.groupBy(col("grain"), col("grp"))
          .agg(countDistinct(col("key")).as("n_exact"))
          .join(broadcast(sums), Seq("grain", "grp"))
          .select(col("grain"), col("grp"), col("n_exact"), col("hll_est"),
            expr("abs(hll_est - n_exact) * 1000 div n_exact").as("err_permille"),
            col("n_empty"))
          .orderBy(col("grain"), col("grp"))
      },
      Some(s"""WITH keys AS (
             |  SELECT 'cust_by_priority' AS grain, o_orderpriority AS grp,
             |      o_custkey AS key FROM orders
             |  UNION ALL
             |  SELECT 'supp_by_nation', CAST(s_nationkey AS VARCHAR), s_suppkey
             |      FROM supplier),
             |h0 AS (SELECT grain, grp, key,
             |    (key * 2654435761) % $P AS h0 FROM keys),
             |h AS (SELECT grain, grp, key,
             |    (h0 * h0 + h0) % $P AS h FROM h0),
             |reg AS (SELECT grain, grp, h % 64 AS bucket,
             |    max(CASE WHEN h // 64 = 0 THEN 25
             |        ELSE bit_count(((h // 64) & -(h // 64)) - 1) + 1 END) AS reg
             |  FROM h GROUP BY 1, 2, 3),
             |s AS (SELECT grain, grp,
             |    CAST(sum(33554432 >> CAST(reg AS INT)) AS BIGINT)
             |      + (64 - count(*)) * 33554432 AS S,
             |    64 - count(*) AS n_empty
             |  FROM reg GROUP BY 1, 2),
             |est AS (SELECT grain, grp, n_empty,
             |    CAST(${709L * 64 * 64 * 33554432} AS BIGINT) // (1000 * S) AS raw
             |  FROM s),
             |fin AS (SELECT grain, grp, n_empty,
             |    CASE WHEN n_empty > 0 AND raw <= 160
             |      THEN (64 * ([${HllLn.mkString(",")}][CAST(n_empty AS INT)]))
             |        // 1000000
             |      ELSE raw END AS hll_est
             |  FROM est),
             |ex AS (SELECT grain, grp, count(DISTINCT key) AS n_exact
             |  FROM keys GROUP BY 1, 2)
             |SELECT f.grain, f.grp, n_exact, hll_est,
             |  abs(hll_est - n_exact) * 1000 // n_exact AS err_permille,
             |  n_empty
             |FROM fin f JOIN ex USING (grain, grp)
             |ORDER BY grain, grp""".stripMargin)),

    // Bloom-filter join pruning (graft.ops.BloomOps): the runtime-
    // filter pattern — a selective predicate on one join side becomes
    // a broadcastable bit table that prunes the other side BEFORE its
    // shuffle. Here: customers holding a big urgent order, probed
    // against the full customer table; output compares the bloom
    // verdict to ground truth per nation. `n_missed` must be 0 in
    // every row — Bloom filters never false-negative, and the column
    // makes the invariant part of the differential check. m=32768
    // bits / k=3 keeps the false-positive rate ~1% at sf0.1's ~2.7k
    // keys (observable in n_false_pos).
    QueryDef(
      "q69_bloom_prune",
      (s, d) => {
        val (m, k) = (32768, 3)
        val keys = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 450000)
          .select(col("o_custkey"))
        val bits = graft.ops.BloomOps.build(keys, "o_custkey", m, k)
        val passed = graft.ops.BloomOps.mightContain(
          customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          Seq("c_custkey", "c_nationkey"), "c_custkey", bits, m, k,
          "bloom_pass")
        val truth = keys.distinct()
          .withColumnRenamed("o_custkey", "c_custkey")
          .withColumn("is_urgent", lit(true))
        passed.join(broadcast(truth), Seq("c_custkey"), "left")
          .withColumn("is_urgent", coalesce(col("is_urgent"), lit(false)))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
            sum(when(col("is_urgent"), 1L).otherwise(0L)).as("n_true"),
            sum(when(col("bloom_pass") && !col("is_urgent"), 1L).otherwise(0L))
              .as("n_false_pos"),
            sum(when(col("is_urgent") && !col("bloom_pass"), 1L).otherwise(0L))
              .as("n_missed"))
          .orderBy(col("c_nationkey"))
      },
      Some(s"""WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000),
             |js AS (SELECT unnest(range(0, 3)) AS j),
             |kpos AS (SELECT ((key % $P) * (2*j+1) + j*12345 + 67) % $P % 32768
             |    AS pos FROM keys, js),
             |bits AS (SELECT pos // 63 AS w,
             |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
             |  FROM kpos GROUP BY 1),
             |ppos AS (SELECT c_custkey, c_nationkey,
             |    ((c_custkey % $P) * (2*j+1) + j*12345 + 67) % $P % 32768 AS pos
             |  FROM customer, js),
             |hit AS (SELECT c_custkey, c_nationkey,
             |    min(CASE WHEN ((b.word >> CAST(p.pos % 63 AS INT)) & 1) = 1
             |        THEN true ELSE false END) AS bloom_pass
             |  FROM ppos p LEFT JOIN bits b ON p.pos // 63 = b.w
             |  GROUP BY 1, 2),
             |tr AS (SELECT h.c_nationkey, h.bloom_pass,
             |    (k.key IS NOT NULL) AS is_urgent
             |  FROM hit h LEFT JOIN keys k ON h.c_custkey = k.key)
             |SELECT c_nationkey, count(*) AS n_customers,
             |  CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_bloom_pass,
             |  CAST(sum(CASE WHEN is_urgent THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_true,
             |  CAST(sum(CASE WHEN bloom_pass AND NOT is_urgent THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_false_pos,
             |  CAST(sum(CASE WHEN is_urgent AND NOT bloom_pass THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_missed
             |FROM tr GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // SKETCH ROLLUP — the property that makes sketches worth storing:
    // a materialized PER-DAY register table (day, event_type, bucket,
    // reg) merges to any coarser grain by max(reg) per bucket, with
    // NO re-scan of the raw events — the pre-aggregated-sketch-table
    // pattern every metrics store uses (union a year of daily distinct
    // users from 365 × 64 registers instead of 365 days of raw). This
    // entry materializes the daily sketches (q85's algebraic HLL,
    // SQL-replicable bit-for-bit), merges them to per-event_type
    // totals, and emits the merged estimate against the exact distinct
    // count — plus n_days to show how many sketches merged. At 100 TB
    // the daily table is O(days × types × 64) rows, the merge never
    // touches raw data, and both aggregations combine map-side.
    QueryDef(
      "q135_sketch_rollup",
      (s, d) => {
        val m = 64
        val width = 24
        val scale = 1L << (width + 1)
        val num = graft.ops.HllAgg.alphaScaled(m) * m * m * scale
        val daily = eventsNorm(s, d)
          .select(date_trunc("DAY", col("ts")).as("day"),
            col("event_type"), col("user_id").as("key"))
          .withColumn("h0", pmod(col("key") * lit(2654435761L), lit(P)))
          .withColumn("h", expr(s"(h0 * h0 + h0) % $P"))
          .withColumn("bucket", col("h") % m)
          .withColumn("rest", expr(s"h div $m"))
          .groupBy(col("day"), col("event_type"), col("bucket"))
          .agg(max(when(col("rest") === 0, width + 1)
            .otherwise(expr("bit_count((rest & -rest) - 1) + 1"))).as("reg"))
        // the MERGE: registers max-combine across days — associative,
        // commutative, idempotent, so any rollup grain works
        val merged = daily.groupBy(col("event_type"), col("bucket"))
          .agg(max(col("reg")).as("reg"))
        val est = merged.groupBy(col("event_type"))
          .agg(sum(expr(s"shiftright(CAST($scale AS BIGINT), CAST(reg AS INT))"))
            .as("s_present"), count(lit(1)).as("n_buckets"))
          .withColumn("n_empty", lit(m) - col("n_buckets"))
          .withColumn("S", col("s_present") + col("n_empty") * scale)
          .withColumn("raw", expr(s"CAST($num AS BIGINT) div (1000 * S)"))
          .withColumn("hll_est",
            when(col("n_empty") > 0 && col("raw") <= lit(5L * m / 2),
              expr(s"($m * element_at(array(${HllLn.map(_ + "L").mkString(",")}), " +
                "CAST(n_empty AS INT))) div 1000000"))
              .otherwise(col("raw")))
          .select(col("event_type"), col("hll_est"))
        val days = daily.groupBy(col("event_type"))
          .agg(countDistinct(col("day")).as("n_days"))
        eventsNorm(s, d)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
          .join(broadcast(est), Seq("event_type"))
          .join(broadcast(days), Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("n_exact"),
            col("hll_est"),
            expr("abs(hll_est - n_exact) * 1000 div n_exact")
              .as("err_permille"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH keys AS (
             |  SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             |    event_type, user_id AS key FROM events),
             |h0 AS (SELECT day, event_type, key,
             |    (key * 2654435761) % $P AS h0 FROM keys),
             |h AS (SELECT day, event_type,
             |    (h0 * h0 + h0) % $P AS h FROM h0),
             |daily AS (SELECT day, event_type, h % 64 AS bucket,
             |    max(CASE WHEN h // 64 = 0 THEN 25
             |        ELSE bit_count(((h // 64) & -(h // 64)) - 1) + 1 END) AS reg
             |  FROM h GROUP BY 1, 2, 3),
             |merged AS (SELECT event_type, bucket, max(reg) AS reg
             |  FROM daily GROUP BY 1, 2),
             |s AS (SELECT event_type,
             |    CAST(sum(33554432 >> CAST(reg AS INT)) AS BIGINT)
             |      + (64 - count(*)) * 33554432 AS S,
             |    64 - count(*) AS n_empty
             |  FROM merged GROUP BY 1),
             |est AS (SELECT event_type, n_empty,
             |    CAST(${709L * 64 * 64 * 33554432} AS BIGINT) // (1000 * S) AS raw
             |  FROM s),
             |fin AS (SELECT event_type,
             |    CASE WHEN n_empty > 0 AND raw <= 160
             |      THEN (64 * ([${HllLn.mkString(",")}][CAST(n_empty AS INT)]))
             |        // 1000000
             |      ELSE raw END AS hll_est
             |  FROM est),
             |days AS (SELECT event_type, count(DISTINCT day) AS n_days
             |  FROM daily GROUP BY 1),
             |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
             |  FROM events GROUP BY 1)
             |SELECT event_type, n_days, n_exact, hll_est,
             |  abs(hll_est - n_exact) * 1000 // n_exact AS err_permille
             |FROM fin JOIN days USING (event_type) JOIN ex USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // HLL SET INTERSECTION — audience-overlap by inclusion–exclusion
    // over the portable HLL: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    // where est(A∪B) comes from the register-max merge (the only set
    // operation HLL supports natively; intersection has no sketch
    // form, which is exactly why the estimate-vs-exact error column
    // matters). The three register sets build in ONE aggregation pass
    // over the segment rows (grain ∈ a/b/u via a self-union — 2× the
    // filtered segment rows, never the full table), and the estimate
    // arithmetic is q85's engine-portable integer pipeline, so the
    // DuckDB oracle rebuilds registers AND estimates bit-for-bit.
    // At 100 TB the segments never co-shuffle: each side's 64-byte
    // sketch merges map-side; only sketches meet the driver. Exact
    // truth here is one groupBy over the two bounded segments — at
    // scale you'd drop it and keep the sketch arithmetic (that loss
    // of an error column is the price of never re-scanning).
    QueryDef(
      "q151_hll_intersection",
      (s, d) => {
        val m = 64
        val width = 24
        val scale = 1L << (width + 1)
        val num = graft.ops.HllAgg.alphaScaled(m) * m * m * scale
        val seg = orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(when(col("o_orderpriority") === "1-URGENT", "a")
            .otherwise("b").as("grain"), col("o_custkey").as("key"))
        val keys = seg.unionByName(
          seg.select(lit("u").as("grain"), col("key")))
        val est = keys
          .withColumn("h0", pmod(col("key") * lit(2654435761L), lit(P)))
          .withColumn("h", expr(s"(h0 * h0 + h0) % $P"))
          .withColumn("bucket", col("h") % m)
          .withColumn("rest", expr(s"h div $m"))
          .groupBy(col("grain"), col("bucket"))
          .agg(max(when(col("rest") === 0, width + 1)
            .otherwise(expr("bit_count((rest & -rest) - 1) + 1"))).as("reg"))
          .groupBy(col("grain"))
          .agg(sum(expr(s"shiftright(CAST($scale AS BIGINT), CAST(reg AS INT))"))
            .as("s_present"), count(lit(1)).as("n_buckets"))
          .withColumn("n_empty", lit(m) - col("n_buckets"))
          .withColumn("S", col("s_present") + col("n_empty") * scale)
          .withColumn("raw", expr(s"CAST($num AS BIGINT) div (1000 * S)"))
          .withColumn("hll_est",
            when(col("n_empty") > 0 && col("raw") <= lit(5L * m / 2),
              expr(s"($m * element_at(array(${HllLn.map(_ + "L").mkString(",")}), " +
                "CAST(n_empty AS INT))) div 1000000"))
              .otherwise(col("raw")))
        val wide = est.groupBy()
          .agg(max(when(col("grain") === "a", col("hll_est"))).as("est_a"),
            max(when(col("grain") === "b", col("hll_est"))).as("est_b"),
            max(when(col("grain") === "u", col("hll_est"))).as("est_union"))
          .withColumn("est_inter",
            col("est_a") + col("est_b") - col("est_union"))
        val exact = orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy(col("o_custkey"))
          .agg(max(when(col("o_orderpriority") === "1-URGENT", 1)
            .otherwise(0)).as("ia"),
            max(when(col("o_orderpriority") === "2-HIGH", 1)
              .otherwise(0)).as("ib"))
          .agg(sum(expr("CAST(ia * ib AS BIGINT)")).as("n_exact_inter"))
        wide.crossJoin(broadcast(exact))
          .select(col("est_a"), col("est_b"), col("est_union"),
            col("est_inter"), col("n_exact_inter"),
            abs(col("est_inter") - col("n_exact_inter")).as("err_abs"))
      },
      Some(s"""WITH seg AS (
             |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
             |      ELSE 'b' END AS grain,
             |    o_custkey AS key
             |  FROM orders
             |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
             |keys AS (SELECT grain, key FROM seg
             |  UNION ALL SELECT 'u' AS grain, key FROM seg),
             |h0 AS (SELECT grain, (key * 2654435761) % $P AS h0 FROM keys),
             |h AS (SELECT grain, (h0 * h0 + h0) % $P AS h FROM h0),
             |reg AS (SELECT grain, h % 64 AS bucket,
             |    max(CASE WHEN h // 64 = 0 THEN 25
             |        ELSE bit_count(((h // 64) & -(h // 64)) - 1) + 1 END)
             |      AS reg
             |  FROM h GROUP BY 1, 2),
             |sums AS (SELECT grain,
             |    CAST(sum(33554432 >> CAST(reg AS INT)) AS BIGINT)
             |      + (64 - count(*)) * 33554432 AS S,
             |    64 - count(*) AS n_empty
             |  FROM reg GROUP BY 1),
             |est0 AS (SELECT grain, n_empty,
             |    CAST(${709L * 64 * 64 * 33554432L} AS BIGINT) // (1000 * S)
             |      AS raw
             |  FROM sums),
             |est AS (SELECT grain,
             |    CASE WHEN n_empty > 0 AND raw <= 160
             |      THEN (64 * ([${HllLn.mkString(",")}][CAST(n_empty AS INT)]))
             |        // 1000000
             |      ELSE raw END AS hll_est
             |  FROM est0),
             |wide AS (SELECT
             |    max(CASE WHEN grain = 'a' THEN hll_est END) AS est_a,
             |    max(CASE WHEN grain = 'b' THEN hll_est END) AS est_b,
             |    max(CASE WHEN grain = 'u' THEN hll_est END) AS est_union
             |  FROM est),
             |exact AS (SELECT CAST(sum(ia * ib) AS BIGINT) AS n_exact_inter
             |  FROM (
             |    SELECT o_custkey,
             |      max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
             |        ELSE 0 END) AS ia,
             |      max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1
             |        ELSE 0 END) AS ib
             |    FROM orders
             |    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    GROUP BY 1))
             |SELECT est_a, est_b, est_union,
             |  est_a + est_b - est_union AS est_inter, n_exact_inter,
             |  abs(est_a + est_b - est_union - n_exact_inter) AS err_abs
             |FROM wide, exact""".stripMargin)),

    // QUANTILE ROLLUP — q135's pre-aggregated-sketch-table pattern,
    // for quantiles: a materialized PER-DAY fixed-width histogram
    // (day × bin counts; bins are mergeable by plain SUM — the one
    // quantile summary with a trivial exact merge) rolls up to any
    // coarser grain with NO raw re-scan, and the merged cumsum
    // locates any percentile to ±1 bin. The entry materializes daily
    // value histograms per event_type, merges to per-type totals,
    // walks the cumsum for p50/p99 bin BOUNDS, and emits the exact
    // within-bin error envelope (hi − lo of the located bin) — the
    // honest statement of what a histogram rollup can and cannot
    // answer (cf. q150, which pays a second raw pass to collapse
    // that envelope to exact). Bin width fixes at 2^20 micros so
    // day-to-day histograms align — mergeability REQUIRES a shared
    // bucket grid, which is why the width is a constant here and not
    // data-derived per day.
    QueryDef(
      "q177_quantile_rollup",
      (s, d) => {
        val W = 1L << 20
        val daily = eventsNorm(s, d)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"),
            expr("ts_sec div 86400").as("day"),
            expr(s"CAST(floor(value * 1000000 + 0.5) AS BIGINT) div $W")
              .as("bin"))
          .agg(count(lit(1)).as("cnt"))
        // the MERGE: plain sums across days — associative/commutative,
        // any rollup grain works with no raw data
        val merged = daily.groupBy(col("event_type"), col("bin"))
          .agg(sum(col("cnt")).as("cnt"))
        val wBin = Window.partitionBy(col("event_type")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = merged
          .withColumn("cum", sum(col("cnt")).over(wBin))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(col("event_type"))))
        val days = daily.groupBy(col("event_type"))
          .agg(countDistinct(col("day")).as("n_days"))
        cum
          .filter((col("cum") - col("cnt")) < expr("(n * 50 + 99) div 100")
              && expr("(n * 50 + 99) div 100") <= col("cum") ||
            (col("cum") - col("cnt")) < expr("(n * 99 + 99) div 100")
              && expr("(n * 99 + 99) div 100") <= col("cum"))
          .groupBy(col("event_type"))
          .agg(min(col("n")).as("n_values"),
            min(when((col("cum") - col("cnt"))
                < expr("(n * 50 + 99) div 100"), col("bin")))
              .as("p50_bin"),
            max(col("bin")).as("p99_bin"))
          .join(broadcast(days), Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("n_values"),
            (col("p50_bin") * W).as("p50_lo_micro"),
            ((col("p50_bin") + 1) * W - 1).as("p50_hi_micro"),
            (col("p99_bin") * W).as("p99_lo_micro"),
            ((col("p99_bin") + 1) * W - 1).as("p99_hi_micro"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
             |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) // ${1L << 20}
             |      AS bin,
             |    count(*) AS cnt
             |  FROM events WHERE value IS NOT NULL
             |  GROUP BY 1, 2, 3),
             |merged AS (
             |  SELECT event_type, bin, CAST(sum(cnt) AS BIGINT) AS cnt
             |  FROM daily GROUP BY 1, 2),
             |c AS (
             |  SELECT event_type, bin, cnt,
             |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM merged),
             |hit AS (
             |  SELECT event_type, bin, cum, cnt, n
             |  FROM c
             |  WHERE (cum - cnt < (n * 50 + 99) // 100
             |      AND (n * 50 + 99) // 100 <= cum)
             |     OR (cum - cnt < (n * 99 + 99) // 100
             |      AND (n * 99 + 99) // 100 <= cum)),
             |agg AS (
             |  SELECT event_type, min(n) AS n_values,
             |    min(CASE WHEN cum - cnt < (n * 50 + 99) // 100
             |      THEN bin END) AS p50_bin,
             |    max(bin) AS p99_bin
             |  FROM hit GROUP BY event_type),
             |days AS (
             |  SELECT event_type, count(DISTINCT day) AS n_days
             |  FROM daily GROUP BY 1)
             |SELECT a.event_type, days.n_days,
             |  CAST(a.n_values AS BIGINT) AS n_values,
             |  a.p50_bin * ${1L << 20} AS p50_lo_micro,
             |  (a.p50_bin + 1) * ${1L << 20} - 1 AS p50_hi_micro,
             |  a.p99_bin * ${1L << 20} AS p99_lo_micro,
             |  (a.p99_bin + 1) * ${1L << 20} - 1 AS p99_hi_micro
             |FROM agg a JOIN days ON a.event_type = days.event_type
             |ORDER BY a.event_type""".stripMargin)),

    // BOTTOM-K (KMV) SET-SIMILARITY SKETCH — the sketch family's set
    // operation the HLL/CMS/Bloom trio can't do: the fixed k=16
    // smallest distinct hash values per source form a mergeable
    // signature whose pairwise comparison estimates Jaccard WITHOUT
    // touching the document sets again (Beyer et al. '07 K-minimum-
    // values). Per pair: merge the two sketches, keep the k smallest
    // of the union (= the union's KMV sketch), count how many live in
    // BOTH input sketches — m/|S| estimates |A∩B|/|A∪B|. At 100 TB
    // the sketches are k rows per source (one shuffle over distinct
    // hashes builds them all); every pairwise estimate is arithmetic
    // over tiny broadcast tables — no doc×doc work, and the sketch
    // table persists for any future pair. The element universe is each
    // source's distinct 3-word-shingle hash set (sources share
    // phrasing, so overlaps are non-trivial); the parity-hash family
    // keeps the
    // whole pipeline integer-exact, so the oracle replays it
    // bit-for-bit; exact Jaccard (from the full hash sets) rides
    // along per pair, the estimator's in-result audit (the q123
    // recall pattern).
    QueryDef(
      "q186_bottomk_jaccard",
      (s, d) => {
        val k = 16
        val h = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("source"),
            explode(TextOps.shingleHashes3(TextOps.tokens(col("text"))))
              .as("h"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w = Window.partitionBy(col("source")).orderBy(col("h"))
        val sk = h.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
        // per-source set sizes double as the SOURCE LIST: deriving the
        // pair table from this 20-row aggregate (persisted) instead of
        // two h.distinct() passes drops two full-corpus exchanges
        // (r14 optimization; the exact-audit joins below reuse it).
        val sizes = h.groupBy(col("source")).agg(count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = sizes.select(col("source").as("sa"))
          .join(sizes.select(col("source").as("sb")),
            col("sa") < col("sb"))
        // union the two sketches per pair, rank, keep the union's
        // bottom-k, count members present in both input sketches
        val est = broadcast(pairs)
          .join(sk, col("source") === col("sa") || col("source") === col("sb"))
          .groupBy(col("sa"), col("sb"), col("h"))
          .agg(max(col("source") === col("sa")).as("in_a"),
            max(col("source") === col("sb")).as("in_b"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
          .filter(col("rn") <= k)
          .groupBy(col("sa"), col("sb"))
          .agg(count(lit(1)).as("s_size"),
            sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("m"))
          .withColumn("est_ppm", expr("m * 1000000 div s_size"))
        // exact Jaccard from the FULL hash sets (the audit) — kept
        // EQUI-join-only so it survives corpus scale: per-source set
        // sizes from one groupBy, pairwise intersections from a
        // self-equi-join ON THE HASH (shuffle key = h, never a
        // pair x corpus nested loop), union by inclusion-exclusion.
        val inter = h.select(col("source").as("sa"), col("h"))
          .join(h.select(col("source").as("sb"), col("h")), Seq("h"))
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa"), col("sb"))
          .agg(count(lit(1)).as("n_inter"))
        val exact = pairs
          .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
          .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
          .join(inter, Seq("sa", "sb"), "left")
          .na.fill(0L, Seq("n_inter"))
          .withColumn("n_union", expr("na + nb - n_inter"))
          .withColumn("exact_ppm", expr("n_inter * 1000000 div n_union"))
        est.join(exact, Seq("sa", "sb"))
          .select(col("sa"), col("sb"), col("m"), col("s_size"),
            col("est_ppm"), col("n_inter"), col("n_union"),
            col("exact_ppm"))
          .orderBy(col("sa"), col("sb"))
      },
      Some("""WITH t AS (SELECT source, string_split(text, ' ') AS ws
             |  FROM documents),
             |th AS (SELECT source, list_transform(ws, w ->
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(w, ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |      (h, c) -> (h * 31 + c) % 1000000007)) AS th
             |  FROM t WHERE len(ws) >= 3),
             |hs AS (SELECT DISTINCT source, h FROM
             |    (SELECT source, unnest(list_transform(range(1, len(th) - 1),
             |       i -> (th[i]*1009 + th[i+1]*9176 + th[i+2]) % 1000000007))
             |       AS h
             |     FROM th)),
             |sk AS (SELECT source, h FROM
             |    (SELECT source, h, row_number() OVER (PARTITION BY source
             |       ORDER BY h) AS rn FROM hs)
             |  WHERE rn <= 16),
             |pr AS (SELECT a.source AS sa, b.source AS sb
             |  FROM (SELECT DISTINCT source FROM hs) a,
             |       (SELECT DISTINCT source FROM hs) b
             |  WHERE a.source < b.source),
             |um AS (SELECT pr.sa, pr.sb, sk.h,
             |    max(sk.source = pr.sa) AS in_a,
             |    max(sk.source = pr.sb) AS in_b
             |  FROM pr JOIN sk ON sk.source = pr.sa OR sk.source = pr.sb
             |  GROUP BY pr.sa, pr.sb, sk.h),
             |topk AS (SELECT * FROM
             |    (SELECT *, row_number() OVER (PARTITION BY sa, sb
             |       ORDER BY h) AS rn FROM um)
             |  WHERE rn <= 16),
             |est AS (SELECT sa, sb, count(*) AS s_size,
             |    CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
             |      AS BIGINT) AS m
             |  FROM topk GROUP BY sa, sb),
             |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |  FROM hs GROUP BY source),
             |iv AS (SELECT a.source AS sa, b.source AS sb,
             |    CAST(count(*) AS BIGINT) AS n_inter
             |  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
             |  GROUP BY 1, 2),
             |ex AS (SELECT pr.sa, pr.sb,
             |    za.n + zb.n - coalesce(iv.n_inter, 0) AS n_union,
             |    coalesce(iv.n_inter, 0) AS n_inter
             |  FROM pr JOIN sz za ON za.source = pr.sa
             |  JOIN sz zb ON zb.source = pr.sb
             |  LEFT JOIN iv ON iv.sa = pr.sa AND iv.sb = pr.sb)
             |SELECT e.sa, e.sb, e.m, e.s_size,
             |  e.m * 1000000 // e.s_size AS est_ppm,
             |  x.n_inter, x.n_union,
             |  x.n_inter * 1000000 // x.n_union AS exact_ppm
             |FROM est e JOIN ex x ON e.sa = x.sa AND e.sb = x.sb
             |ORDER BY e.sa, e.sb""".stripMargin))
  )
}