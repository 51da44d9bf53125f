package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator catalog: the reference's operator inventory
  * (SURVEY.md §2a, O1-O14 / Q1-Q9) re-expressed over the testdata star
  * schema. Each entry pairs idiomatic Spark DataFrame code with DuckDB
  * oracle SQL on the same tables.
  *
  * Reference operators covered here (cites into /root/reference):
  *  - O1/O8 scan+project+filter    (workflow/Extractor.py:3-5)
  *  - O3/O4 split + array index    (workflow/Transformer.py:16-18)
  *  - O6/O7 null-encode + na.drop  (workflow/Transformer.py:35-37)
  *  - O9 distinct                  (workflow/Transformer.py:52,67)
  *  - O10-O12 group-agg + having + top-k (workflow/Transformer.py:98-102)
  *  - Q1-Q7 serving joins/aggs     (external-table-queries.sql:13-42)
  *
  * Scale notes (100 TB posture): dimension joins are broadcast;
  * aggregations rely on Spark's partial+final hash agg; top-k uses
  * orderBy+limit which Catalyst plans as TakeOrderedAndProject (per-
  * partition top-k, no full sort/shuffle of the data).
  */
object Relational {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // O1/O8 + pushdown: scan with filter + tight projection. The filter
    // and 3-column ReadSchema must reach the parquet scan.
    QueryDef(
      "q01_scan_filter_project",
      (s, d) =>
        orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_orderkey LIMIT 100""".stripMargin)),

    // O3/O4/O5: string split -> array -> getItem, the Location-expansion
    // analog (p_name is 'adjective noun').
    QueryDef(
      "q02_split_expand",
      (s, d) =>
        part(s, d)
          .withColumn("name_parts", split(col("p_name"), " "))
          .select(
            col("p_partkey"),
            col("name_parts").getItem(0).as("adjective"),
            col("name_parts").getItem(1).as("noun"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  string_split(p_name, ' ')[1] AS adjective,
             |  string_split(p_name, ' ')[2] AS noun
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // O6/O7: conditional null-encode (when/otherwise) then na.drop on the
    // key column — the " "->NULL cleaning analog.
    QueryDef(
      "q03_clean_null_drop",
      (s, d) =>
        customer(s, d)
          .withColumn(
            "segment",
            when(col("c_mktsegment") === "MACHINERY", lit(null))
              .otherwise(col("c_mktsegment")))
          .na.drop(Seq("segment"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("segment")),
      Some("""SELECT segment, count(*) AS n_customers FROM (
             |  SELECT CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
             |              ELSE c_mktsegment END AS segment
             |  FROM customer) t
             |WHERE segment IS NOT NULL
             |GROUP BY segment ORDER BY segment""".stripMargin)),

    // O9: distinct projection (dimension dedup).
    QueryDef(
      "q04_distinct_dim",
      (s, d) =>
        orders(s, d)
          .select(col("o_orderstatus"), col("o_orderpriority"))
          .distinct()
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority
             |FROM orders ORDER BY 1, 2""".stripMargin)),

    // O10: multi-key hash aggregate with several agg functions. Partial
    // aggregation (map-side combine) is automatic in HashAggregateExec.
    QueryDef(
      "q05_group_agg",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // O10-O12: the Top100Books spine — group, avg, HAVING >=, sort desc
    // with deterministic tie-break, LIMIT (TakeOrderedAndProject).
    QueryDef(
      "q06_having_topk",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("n_ratings"))
          .filter(col("n_ratings") >= 10)
          .orderBy(col("avg_qty").desc, col("l_partkey"))
          .limit(100),
      Some("""SELECT l_partkey, round(avg(l_quantity), 4) AS avg_qty,
             |  count(*) AS n_ratings
             |FROM lineitem GROUP BY l_partkey
             |HAVING count(*) >= 10
             |ORDER BY avg_qty DESC, l_partkey LIMIT 100""".stripMargin)),

    // Q1: inner equi-join with an explicitly broadcast dimension —
    // top customers by spend. At 100 TB the orders side never shuffles;
    // the dim ships to every executor.
    QueryDef(
      "q07_join_broadcast",
      (s, d) =>
        orders(s, d)
          .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("total_spend"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("total_spend").desc, col("c_custkey"))
          .limit(50),
      Some("""SELECT c_custkey, c_name,
             |  round(sum(o_totalprice), 2) AS total_spend,
             |  count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY total_spend DESC, c_custkey LIMIT 50""".stripMargin)),

    // Q4/Q5/Q6: pre-agg WHERE + multi-dim join + count(*) per group —
    // the "customers per country" serving analog with a snowflaked dim.
    QueryDef(
      "q08_where_group_count",
      (s, d) =>
        customer(s, d)
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("customer_count"))
          .orderBy(col("customer_count").desc, col("n_name"))
          .limit(10),
      Some("""SELECT n_name, count(*) AS customer_count
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY customer_count DESC, n_name LIMIT 10""".stripMargin)),

    // Serving query 1 analog (external-table-queries.sql:13-19): fact
    // join dim + CAST + group + HAVING > + order + limit.
    QueryDef(
      "q09_serving_top_parts",
      (s, d) =>
        lineitem(s, d)
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"), col("p_name"))
          .agg(
            round(avg(col("l_quantity").cast("double")), 4).as("avg_qty"),
            count(lit(1)).as("n_lines"))
          .filter(col("n_lines") > 10)
          .orderBy(col("avg_qty").desc, col("p_partkey"))
          .limit(100),
      Some("""SELECT p_partkey, p_name,
             |  round(avg(CAST(l_quantity AS double)), 4) AS avg_qty,
             |  count(*) AS n_lines
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_partkey, p_name
             |HAVING count(*) > 10
             |ORDER BY avg_qty DESC, p_partkey LIMIT 100""".stripMargin)),

    // Semi join (EXISTS): customers that have at least one order, counted
    // per market segment. At scale: the orders side is only scanned for
    // keys; no row explosion.
    QueryDef(
      "q11_semi_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_active
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Anti join (NOT EXISTS): customers with no high-value order. The
    // subquery filter keeps the result non-degenerate at every sf.
    QueryDef(
      "q12_anti_join",
      (s, d) =>
        customer(s, d)
          .join(
            orders(s, d).filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_inactive"))
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_inactive
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_totalprice > 400000)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Left outer join + count of the nullable side (0 for no matches).
    QueryDef(
      "q13_outer_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("n_orders").desc, col("c_custkey"))
          .limit(100),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey
             |ORDER BY n_orders DESC, c_custkey LIMIT 100""".stripMargin)),

    // O12/Q7: global top-k by sort — TakeOrderedAndProject, no full sort.
    QueryDef(
      "q10_orderby_limit",
      (s, d) =>
        orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Z-order clustering arithmetic (graft.ops.ZOrder): Morton-code
    // customers on (nationkey, quantized acctbal) and report the
    // per-z-range bounding boxes — tight boxes in BOTH dimensions are
    // exactly why a z-sorted layout lets min/max file stats prune 2-D
    // predicates (ZOrderSpec asserts the written layout: disjoint
    // z-ranges per file). Money is floor(x*100 + 0.5) exact cents —
    // Spark's double->long cast truncates while DuckDB's rounds, so
    // the cast must never see a fractional value (§7.4 trap family).
    QueryDef(
      "q70_zorder_layout",
      (s, d) => {
        customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("x"),
            expr("least(greatest((CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)" +
              " + 100000) div 4400, 0), 255)").as("y"))
          .withColumn("z", graft.ops.ZOrder.interleave2(col("x"), col("y"), 8))
          .withColumn("zrange", expr("z div 4096"))
          .groupBy(col("zrange"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("x_min"), max(col("x")).as("x_max"),
            min(col("y")).as("y_min"), max(col("y")).as("y_max"))
          .orderBy(col("zrange"))
      },
      Some("""WITH q AS (SELECT c_custkey,
             |    CAST(c_nationkey AS BIGINT) AS x,
             |    least(greatest((CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |      + 100000) // 4400, 0), 255) AS y
             |  FROM customer),
             |z AS (SELECT c_custkey, x, y,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 8)),
             |      (acc, b) -> acc
             |        + ((x >> CAST(b AS INT)) & 1)
             |          * (CAST(1 AS BIGINT) << CAST(2*b AS INT))
             |        + ((y >> CAST(b AS INT)) & 1)
             |          * (CAST(1 AS BIGINT) << CAST(2*b + 1 AS INT))) AS z
             |  FROM q)
             |SELECT z // 4096 AS zrange, count(*) AS n_rows,
             |  min(x) AS x_min, max(x) AS x_max,
             |  min(y) AS y_min, max(y) AS y_max
             |FROM z GROUP BY zrange ORDER BY zrange""".stripMargin)),

    // MERGE / CDC upsert (graft.ops.MergeOps): apply a change batch
    // (updates + tombstones + inserts) to the customer table in one
    // full-outer key join — the lakehouse MERGE INTO, and the
    // idempotent replacement for the reference's append-mode nightly
    // load (workflow/StringConstant.py:4). The synthesized batch
    // touches every class: %10 keys update (+100.00), %97 keys are
    // tombstoned, %500 keys also insert a new 1M-offset key. Money in
    // floor-exact cents.
    QueryDef(
      "q71_merge_upsert",
      (s, d) => {
        val base = customer(s, d).select(col("c_custkey"), col("c_nationkey"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
        val upd = base
          .filter(col("c_custkey") % 10 === 0 && col("c_custkey") % 97 =!= 0)
          .select(col("c_custkey"), col("c_nationkey"),
            (col("cents") + 10000L).as("cents"), lit(false).as("is_delete"))
          .unionByName(base.filter(col("c_custkey") % 97 === 0)
            .select(col("c_custkey"), col("c_nationkey"), col("cents"),
              lit(true).as("is_delete")))
          // insert-key offset far above any real custkey (TPC-H keys
          // span 1..150k*SF: 1e8 stays collision-free to SF ~666;
          // colliding keys would duplicate in `updates` and fan out
          // the full-outer join)
          .unionByName(base.filter(col("c_custkey") % 500 === 0)
            .select((col("c_custkey") + 100000000L).as("c_custkey"),
              col("c_nationkey"), lit(123456L).as("cents"),
              lit(false).as("is_delete")))
        graft.ops.MergeOps.merge(base, upd, "c_custkey", "is_delete")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total_cents"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH base AS (SELECT c_custkey, c_nationkey,
             |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
             |  FROM customer),
             |upd AS (
             |  SELECT c_custkey, c_nationkey, cents + 10000 AS cents,
             |    false AS is_delete
             |  FROM base WHERE c_custkey % 10 = 0 AND c_custkey % 97 != 0
             |  UNION ALL
             |  SELECT c_custkey, c_nationkey, cents, true
             |  FROM base WHERE c_custkey % 97 = 0
             |  UNION ALL
             |  SELECT c_custkey + 100000000, c_nationkey, 123456, false
             |  FROM base WHERE c_custkey % 500 = 0),
             |m AS (SELECT
             |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey
             |         ELSE b.c_nationkey END AS c_nationkey,
             |    CASE WHEN u.c_custkey IS NOT NULL THEN u.cents
             |         ELSE b.cents END AS cents,
             |    coalesce(u.is_delete, false) AS del
             |  FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey)
             |SELECT c_nationkey, count(*) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS total_cents
             |FROM m WHERE NOT del GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    // Set-containment join (ALL-match semi-join): orders whose item
    // set CONTAINS an entire probe basket — match rows per (order,
    // basket item), then keep orders matching the full basket size.
    // The equi-join on the item key is the only wide operation; the
    // containment test is a count compared to the basket's size
    // (carried by a broadcast scalar join, no collect). This is the
    // "orders containing all of {x, y}" shape that a naive approach
    // writes as k chained EXISTS subqueries.
    QueryDef(
      "q83_containment_join",
      (s, d) => {
        // Pruned 2-column distinct, persisted: the basket derivation
        // reads it twice and the probe once — unpersisted that is
        // three full distinct shuffles of the fact projection.
        val items = lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // deterministic probe basket guaranteed to co-occur: the 2
        // lowest part keys of the smallest multi-item order
        val firstMulti = items.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items"))
          .filter(col("n_items") >= 2)
          .agg(min(col("l_orderkey")).as("mok"))
        val basket = items.join(broadcast(firstMulti),
            col("l_orderkey") === col("mok"))
          .orderBy(col("l_partkey")).limit(2)
          .select(col("l_partkey").as("bk"))
        val bsize = basket.agg(count(lit(1)).as("bsize"))
        items.join(broadcast(basket), col("l_partkey") === col("bk"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_matched"))
          .crossJoin(broadcast(bsize))
          .filter(col("n_matched") === col("bsize"))
          .select(col("l_orderkey"), col("n_matched"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
             |  FROM lineitem),
             |mo AS (SELECT min(l_orderkey) AS mok FROM (
             |    SELECT l_orderkey FROM items
             |    GROUP BY l_orderkey HAVING count(*) >= 2) t),
             |basket AS (SELECT l_partkey AS bk FROM items, mo
             |  WHERE l_orderkey = mok ORDER BY l_partkey LIMIT 2)
             |SELECT i.l_orderkey, count(*) AS n_matched
             |FROM items i JOIN basket b ON i.l_partkey = b.bk
             |GROUP BY i.l_orderkey
             |HAVING count(*) = (SELECT count(*) FROM basket)
             |ORDER BY i.l_orderkey""".stripMargin)),

    // Table-content checksums for reconciliation: an ORDER-INDEPENDENT
    // content hash per table — per-row parity hash of a canonical
    // field encoding, summed mod P with the row count. Two replicas
    // (or a pre- and post-migration copy) agree iff counts and sums
    // agree, with no sort and no row shipping — the 100 TB
    // anti-entropy check. Canonical encoding pins field order and a
    // separator that cannot appear in the values.
    QueryDef(
      "q84_table_checksum",
      (s, d) => {
        import graft.ops.TextOps
        val P = TextOps.P
        def sig(df: org.apache.spark.sql.DataFrame, name: String,
            canon: org.apache.spark.sql.Column) =
          df.select(TextOps.polyHash(canon).as("h"))
            .agg(count(lit(1)).as("n_rows"),
              (sum(col("h")) % P).as("content_sum"))
            .select(lit(name).as("table_name"), col("n_rows"),
              col("content_sum"))
        sig(region(s, d), "region",
          concat_ws("", col("r_regionkey"), col("r_name")))
          .unionByName(sig(nation(s, d), "nation",
            concat_ws("", col("n_nationkey"), col("n_name"),
              col("n_regionkey"))))
          .unionByName(sig(part(s, d), "part",
            concat_ws("", col("p_partkey"), col("p_name"),
              col("p_brand"))))
          .orderBy(col("table_name"))
      },
      Some("""WITH s AS (
             |  SELECT 'region' AS table_name, count(*) AS n_rows,
             |    CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(
             |        CAST(r_regionkey AS VARCHAR) || chr(1) || r_name, ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |      (h, c) -> (h*31 + c) % 1000000007)) % 1000000007
             |      AS BIGINT) AS content_sum
             |  FROM region
             |  UNION ALL
             |  SELECT 'nation', count(*),
             |    CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(
             |        CAST(n_nationkey AS VARCHAR) || chr(1) || n_name ||
             |        chr(1) || CAST(n_regionkey AS VARCHAR), ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |      (h, c) -> (h*31 + c) % 1000000007)) % 1000000007
             |      AS BIGINT)
             |  FROM nation
             |  UNION ALL
             |  SELECT 'part', count(*),
             |    CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(
             |        CAST(p_partkey AS VARCHAR) || chr(1) || p_name ||
             |        chr(1) || p_brand, ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |      (h, c) -> (h*31 + c) % 1000000007)) % 1000000007
             |      AS BIGINT)
             |  FROM part)
             |SELECT table_name, n_rows, content_sum
             |FROM s ORDER BY table_name""".stripMargin)),

    // k-anonymity audit (privacy/compliance gate for published or
    // training data): group the table by its quasi-identifier tuple
    // (nation, market segment) and measure, per nation, how many rows
    // sit in groups smaller than k=10 — those rows are re-identifiable
    // by the QI combination alone. One partial+final aggregation to
    // group sizes, one tiny rollup over the (≤ |nations|×|segments|)
    // group-size table; nothing scales with row count except the first
    // pass. The permille ratio is integer-exact (no float div).
    QueryDef(
      "q88_k_anonymity",
      (s, d) => {
        val k = 10L
        customer(s, d)
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("c_nationkey"))
          .agg(sum(col("sz")).as("n_rows"),
            count(lit(1)).as("n_groups"),
            sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_risky_groups"),
            sum(when(col("sz") < k, col("sz")).otherwise(0L))
              .as("n_risky_rows"))
          .withColumn("risk_permille",
            expr("n_risky_rows * 1000 div n_rows"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz
             |  FROM customer GROUP BY 1, 2)
             |SELECT c_nationkey,
             |  CAST(sum(sz) AS BIGINT) AS n_rows,
             |  count(*) AS n_groups,
             |  CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_risky_groups,
             |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
             |    AS n_risky_rows,
             |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
             |    * 1000 // CAST(sum(sz) AS BIGINT) AS risk_permille
             |FROM g GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Deterministic exact-k uniform sample: rank every row by a
    // quadratic-mixed hash of its key (same P/mix family as the HLL
    // kernel — affine-only hashing would leave sequential keys
    // structured) and keep the k smallest. Reproducible across
    // retries, partitionings, and engines — rand()-based sample()
    // is none of those — and Catalyst plans TakeOrderedAndProject:
    // each partition keeps only its local top-k, the driver merges
    // k×partitions rows, so there is NO full sort and NO global
    // shuffle at any scale. The hash column is emitted so the oracle
    // check pins the ranking itself, not just the membership.
    QueryDef(
      "q89_exactk_sample",
      (s, d) => {
        val P = graft.ops.TextOps.P
        orders(s, d)
          .withColumn("h0", pmod(col("o_orderkey") * 2654435761L, lit(P)))
          .withColumn("h", expr(s"(h0 * h0 + h0) % $P"))
          .select(col("o_orderkey"), col("o_orderpriority"), col("h"))
          .orderBy(col("h"), col("o_orderkey"))
          .limit(64)
      },
      Some(s"""WITH h0 AS (SELECT o_orderkey, o_orderpriority,
             |    (o_orderkey * 2654435761) % ${graft.ops.TextOps.P} AS h0
             |  FROM orders),
             |h AS (SELECT o_orderkey, o_orderpriority,
             |    (h0 * h0 + h0) % ${graft.ops.TextOps.P} AS h FROM h0)
             |SELECT o_orderkey, o_orderpriority, h
             |FROM h ORDER BY h, o_orderkey LIMIT 64""".stripMargin)),

    // Small-file compaction planning (lakehouse table maintenance):
    // given per-file sizes — here one "file" per order day, size
    // proxied by its row count × an average row width — assign files
    // to compaction bins by cumulative size over the day order, bin =
    // running_total div target. One window pass over the FILE LIST
    // (thousands of rows, never the row data), so planning cost is
    // independent of table size; the plan itself is what a rewrite
    // job would execute per bin. Greedy-by-order keeps time locality:
    // each output file covers a contiguous day range, preserving
    // partition pruning after the rewrite.
    QueryDef(
      "q100_compaction_plan",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val target = 4L * 1024 * 1024 // 4 MiB per compacted file
        val files = orders(s, d)
          .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("bytes", col("n_rows") * 128L)
        files
          .withColumn("cum", sum(col("bytes"))
            .over(Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("bin", expr(s"(cum - 1) div ${target}L"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
            min(col("day")).cast("string").as("day_from"),
            max(col("day")).cast("string").as("day_to"))
          .orderBy(col("bin"))
      },
      Some("""WITH f AS (SELECT CAST(o_orderdate AS DATE) AS day,
             |    count(*) AS n_rows, count(*) * 128 AS bytes
             |  FROM orders GROUP BY 1),
             |c AS (SELECT day, bytes,
             |    CAST(sum(bytes) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM f)
             |SELECT (cum - 1) // 4194304 AS bin, count(*) AS n_files,
             |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
             |  CAST(min(day) AS VARCHAR) AS day_from,
             |  CAST(max(day) AS VARCHAR) AS day_to
             |FROM c GROUP BY 1 ORDER BY bin""".stripMargin)),

    // SKYLINE (Pareto frontier) — multi-criteria dominance: the
    // customers no one beats on BOTH order count and spend (Börzsönyi
    // et al., "The Skyline Operator", ICDE 2001). The naive form is
    // an O(n²) self-anti-join; this is the sort-based O(n log n)
    // plan: over the per-customer AGGREGATE (bounded relative to the
    // fact table — the only global window, same stance as q116),
    // sort by x desc and keep a point iff its y strictly exceeds the
    // running max y of all points with strictly greater x
    // (RANGE .. 1 PRECEDING on integer x = "x > current", exact) and
    // it holds the max y within its own x tie-group. The ORACLE is
    // deliberately the quadratic NOT EXISTS dominance definition —
    // structurally different from the plan under test, so agreement
    // checks the algorithm, not the transcription. Spend quantizes
    // to exact cents. At domain scale the aggregate itself can be
    // pre-filtered by a grid prune (only cells on the staircase can
    // hold skyline points) before any sort.
    QueryDef(
      "q147_skyline",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byCust = orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("spend_cents"))
        val higherX = Window.orderBy(col("n_orders").desc)
          .rangeBetween(Window.unboundedPreceding, -1)
        val sameX = Window.partitionBy(col("n_orders"))
        byCust
          .withColumn("best_y_higher_x",
            max(col("spend_cents")).over(higherX))
          .withColumn("best_y_same_x",
            max(col("spend_cents")).over(sameX))
          .filter((col("best_y_higher_x").isNull ||
              col("spend_cents") > col("best_y_higher_x")) &&
            col("spend_cents") === col("best_y_same_x"))
          .select(col("o_custkey"), col("n_orders"), col("spend_cents"))
          .orderBy(col("spend_cents").desc, col("o_custkey"))
      },
      Some("""WITH c AS (
             |  SELECT o_custkey, count(*) AS n_orders,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS spend_cents
             |  FROM orders GROUP BY o_custkey)
             |SELECT o_custkey, n_orders, spend_cents
             |FROM c p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM c q
             |  WHERE q.n_orders >= p.n_orders
             |    AND q.spend_cents >= p.spend_cents
             |    AND (q.n_orders > p.n_orders
             |      OR q.spend_cents > p.spend_cents))
             |ORDER BY spend_cents DESC, o_custkey""".stripMargin)),

    // SMOOTHED RATE RANKING — the cold-start correction: ranking parts
    // by raw return rate promotes 1-for-1 flukes over 48-of-50 real
    // offenders; Laplace (add-one) smoothing (r+1)/(n+2) shrinks
    // small samples toward 1/2 so confidence is priced into the rank.
    // All-integer: smoothed_ppm = (r+1)·10⁶ div (n+2); the result
    // carries raw next to smoothed plus the rank DISPLACEMENT each
    // part suffers (two row_numbers over the bounded per-part
    // aggregate — the hash check pins the reordering itself, not just
    // the scores). One fact aggregation; everything after is
    // aggregate-sized. Top-20 by smoothed rate.
    QueryDef(
      "q167_smoothed_rate",
      (s, d) => {
        val w1 = org.apache.spark.sql.expressions.Window
          .orderBy(expr("raw_ppm").desc, col("l_partkey"))
        val w2 = org.apache.spark.sql.expressions.Window
          .orderBy(expr("smoothed_ppm").desc, col("l_partkey"))
        lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("r"))
          .withColumn("raw_ppm", expr("r * 1000000 div n"))
          .withColumn("smoothed_ppm",
            expr("(r + 1) * 1000000 div (n + 2)"))
          .withColumn("raw_rank", row_number().over(w1).cast("long"))
          .withColumn("rank", row_number().over(w2).cast("long"))
          .filter(col("rank") <= 20)
          .select(col("rank"), col("l_partkey"), col("n"), col("r"),
            col("raw_ppm"), col("smoothed_ppm"),
            (col("raw_rank") - col("rank")).as("displacement"))
          .orderBy(col("rank"))
      },
      Some("""WITH a AS (
             |  SELECT l_partkey, count(*) AS n,
             |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS r
             |  FROM lineitem GROUP BY l_partkey),
             |s AS (
             |  SELECT l_partkey, n, r,
             |    r * 1000000 // n AS raw_ppm,
             |    (r + 1) * 1000000 // (n + 2) AS smoothed_ppm
             |  FROM a),
             |rk AS (
             |  SELECT l_partkey, n, r, raw_ppm, smoothed_ppm,
             |    row_number() OVER (ORDER BY raw_ppm DESC, l_partkey)
             |      AS raw_rank,
             |    row_number() OVER (ORDER BY smoothed_ppm DESC, l_partkey)
             |      AS rank
             |  FROM s)
             |SELECT rank, l_partkey, n, r, raw_ppm, smoothed_ppm,
             |  raw_rank - rank AS displacement
             |FROM rk WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // TRENDING DETECTION — brands whose share of shipped volume ROSE
    // most in the recent window vs the baseline: rise is the ratio of
    // shares across windows, cross-multiplied to integers with a +1
    // Laplace floor on the baseline (q167's cold-start rule — a brand
    // unseen in the baseline must rank by its recent mass, not divide
    // by zero): rise_ppm = c₂·(N₁+1)·10⁶ div ((c₁+1)·N₂). Window
    // split derives from the data's max ship date (last 90 days =
    // recent, prior = baseline) via one 1-row broadcast; per-brand
    // counts aggregate in ONE pass with conditional sums (no
    // per-window scans); the brand dim rides a broadcast join.
    // Min-support 5 recent rows filters flukes; top-15 by the
    // integer ratio, fully tie-broken.
    QueryDef(
      "q178_trending",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_partkey"),
            // day number via datediff from a fixed anchor (the
            // Functions.scala q-family idiom — TIMESTAMP_NTZ casts to
            // neither BIGINT nor epoch portably; only differences
            // matter here)
            datediff(col("l_shipdate"), lit("1992-01-01")).cast("long")
              .as("day"))
          .join(broadcast(part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
        val hi = li.agg(max(col("day")).as("dmax"))
        val counts = li.crossJoin(broadcast(hi))
          .withColumn("recent", col("day") > col("dmax") - 90)
          .groupBy(col("p_brand"))
          .agg(sum(when(col("recent"), 0L).otherwise(1L)).as("c1"),
            sum(when(col("recent"), 1L).otherwise(0L)).as("c2"))
        val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(expr("rise_ppm").desc, col("p_brand"))
        counts.crossJoin(broadcast(tot))
          .filter(col("c2") >= 5)
          .withColumn("rise_ppm", expr(
            "CAST(CAST(c2 AS DECIMAL(38,0)) * (n1 + 1) * 1000000 " +
              "div ((c1 + 1) * CAST(n2 AS DECIMAL(38,0))) AS BIGINT)"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 15)
          .select(col("rk"), col("p_brand"), col("c1").as("n_baseline"),
            col("c2").as("n_recent"), col("rise_ppm"))
          .orderBy(col("rk"))
      },
      Some("""WITH li AS (
             |  SELECT p.p_brand,
             |    CAST(datediff('day', DATE '1992-01-01',
             |      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS day
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
             |hi AS (SELECT max(day) AS dmax FROM li),
             |c AS (
             |  SELECT p_brand,
             |    CAST(sum(CASE WHEN day > dmax - 90 THEN 0 ELSE 1 END)
             |      AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN day > dmax - 90 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c2
             |  FROM li, hi GROUP BY p_brand),
             |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2 FROM c),
             |r AS (
             |  SELECT p_brand, c1, c2,
             |    CAST(c2 * (n1 + 1) * 1000000 // ((c1 + 1) * n2)
             |      AS BIGINT) AS rise_ppm
             |  FROM c, t WHERE c2 >= 5),
             |rk AS (
             |  SELECT p_brand, c1, c2, rise_ppm,
             |    row_number() OVER (ORDER BY rise_ppm DESC, p_brand)
             |      AS rk
             |  FROM r)
             |SELECT rk, p_brand, c1 AS n_baseline, c2 AS n_recent,
             |  rise_ppm
             |FROM rk WHERE rk <= 15 ORDER BY rk""".stripMargin)),

    // AGGREGATE TOP-K — q16's per-group top-k re-expressed as a
    // bounded-memory mergeable aggregate ([[graft.ops.VectorAggregates
    // .TopKAgg]]): the window form sorts every group's FULL row set
    // through the shuffle; this form's partials are ≤ k entries per
    // group per partition and combine map-side, so the exchange
    // carries O(groups·k), not O(rows) — the shape that wins when
    // groups are few and rows are 100 TB. The oracle is deliberately
    // the window form (a structurally different algorithm must agree
    // row-for-row); PlanShapeSpec asserts this plan contains no
    // Window operator at all.
    QueryDef(
      "q169_topk_aggregate",
      (s, d) => {
        val top = udaf(new graft.ops.VectorAggregates.TopKAgg(3))
        part(s, d)
          .select(col("p_brand"),
            expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)")
              .as("cents"), col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(top(array(col("cents"), col("p_partkey"))).as("t"))
          .select(col("p_brand"),
            posexplode(arrays_zip(col("t.vals"), col("t.ids")))
              .as(Seq("pos", "e")))
          .select(col("p_brand"), (col("pos") + 1).cast("long").as("rank"),
            col("e.ids").as("p_partkey"), col("e.vals").as("price_cents"))
          .orderBy(col("p_brand"), col("rank"))
      },
      Some("""SELECT p_brand, rank, p_partkey, price_cents FROM (
             |  SELECT p_brand, p_partkey,
             |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
             |      AS price_cents,
             |    row_number() OVER (PARTITION BY p_brand
             |      ORDER BY CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
             |        DESC, p_partkey) AS rank
             |  FROM part) t
             |WHERE rank <= 3 ORDER BY p_brand, rank""".stripMargin))
  )
}
