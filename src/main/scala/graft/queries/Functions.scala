package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Function-surface catalog (SURVEY.md §2b rows: grouping sets, set ops,
  * string fns, date fns, array fns, json fns): every scalar-function
  * family the engine supports, each oracle-paired.
  *
  * All expressions are `org.apache.spark.sql.functions._` built-ins so
  * they stay inside whole-stage codegen — no UDFs in these paths.
  */
object Functions {
  import Tables._

  /** q97 Benford expectation, permille: round(log10(1 + 1/d) * 1000)
    * for d = 1..9 — computed once here, inlined into BOTH engines. */
  private val BenfordPermille: IndexedSeq[Long] =
    (1 to 9).map(dd => math.round(math.log10(1.0 + 1.0 / dd) * 1000))

  val defs: Seq[QueryDef] = Seq(

    // ROLLUP drill-down (README.md:24's "drill down and roll up"):
    // region → nation → grand total. NULL grouping slots are folded to
    // 'ALL' in both engines so ordering/hashing is NULL-free.
    QueryDef(
      "q14_rollup",
      (s, d) =>
        customer(s, d)
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("n_customers"))
          .orderBy(col("region"), col("nation")),
      Some("""SELECT coalesce(r_name, 'ALL') AS region,
             |  coalesce(n_name, 'ALL') AS nation,
             |  count(*) AS n_customers
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)
             |ORDER BY region, nation""".stripMargin)),

    // CUBE over two independent dimensions.
    QueryDef(
      "q15_cube",
      (s, d) =>
        orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"), col("total_price"))
          .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total_price
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // Set operations: UNION / INTERSECT / EXCEPT over the distinct
    // customer sets of two order-status slices, reduced to one row.
    QueryDef(
      "q19_set_ops",
      (s, d) => {
        // Set algebra fused into ONE pass: per-customer presence flags,
        // then a scalar conditional aggregation. The literal
        // intersect/except/union-of-distincts plan is 3 full shuffles +
        // 3 joins of the same scan; this is one shuffle on o_custkey.
        orders(s, d)
          .filter(col("o_orderstatus").isin("O", "F"))
          .groupBy(col("o_custkey"))
          .agg(
            max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("has_o"),
            max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("has_f"))
          .agg(
            sum(when(col("has_o") === 1 && col("has_f") === 1, 1L)
              .otherwise(0L)).as("n_intersect"),
            sum(when(col("has_o") === 1 && col("has_f") === 0, 1L)
              .otherwise(0L)).as("n_except"),
            count(lit(1)).as("n_union"))
      },
      Some("""SELECT
             |  (SELECT count(*) FROM (
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |     INTERSECT
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') t1)
             |   AS n_intersect,
             |  (SELECT count(*) FROM (
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |     EXCEPT
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') t2)
             |   AS n_except,
             |  (SELECT count(*) FROM (
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |     UNION
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') t3)
             |   AS n_union""".stripMargin)),

    // String function family: upper/substring/concat/length/regexp.
    QueryDef(
      "q20_string_fns",
      (s, d) =>
        part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up_name"),
            substring(col("p_name"), 1, 4).as("prefix4"),
            concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
            length(col("p_name")).as("name_len"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up_name,
             |  substring(p_name, 1, 4) AS prefix4,
             |  p_brand || ':' || p_type AS brand_type,
             |  length(p_name) AS name_len,
             |  regexp_extract(p_name, '^(\w+)', 1) AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Date/time extraction + aggregation by calendar parts.
    QueryDef(
      "q21_date_fns",
      (s, d) =>
        orders(s, d)
          .groupBy(
            year(col("o_orderdate")).as("yr"),
            quarter(col("o_orderdate")).as("qtr"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"))
          .orderBy(col("yr"), col("qtr")),
      Some("""SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total_price
             |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin)),

    // Array family: split → explode (lateral unnest) → re-aggregate.
    // This is the tokenize→explode→count shape of the text pipeline.
    QueryDef(
      "q22_explode_tokens",
      (s, d) =>
        part(s, d)
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word")),
      Some("""SELECT word, count(*) AS n FROM (
             |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
             |GROUP BY word ORDER BY n DESC, word""".stripMargin)),

    // JSON family: extract a field from the events.props JSON string and
    // aggregate it per event type.
    QueryDef(
      "q23_json_extract",
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(
            round(avg(col("k")), 4).as("avg_k"),
            max(col("k")).as("max_k"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
             |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Map-type family: parse the props JSON into map<string,int>
    // (from_json), explode entries, aggregate per (event_type, key) —
    // the nested-type surface (§1.3 notes the reference has none; the
    // events extension carries it). Oracle mirrors with DuckDB's
    // json_each lateral.
    QueryDef(
      "q55_json_map_fns",
      (s, d) =>
        events(s, d)
          .select(col("event_type"),
            explode(from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType))).as(Seq("k", "v")))
          .groupBy(col("event_type"), col("k"))
          .agg(count(lit(1)).as("n"),
            sum(col("v")).as("sum_v"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"))
          .orderBy(col("event_type"), col("k")),
      Some("""SELECT event_type, k, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
             |    AS BIGINT) AS sum_v,
             |  min(CAST(json_extract_string(props, '$.' || k) AS INTEGER)) AS min_v,
             |  max(CAST(json_extract_string(props, '$.' || k) AS INTEGER)) AS max_v
             |FROM (SELECT event_type, props, unnest(json_keys(props)) AS k
             |      FROM events) t
             |GROUP BY event_type, k
             |ORDER BY event_type, k""".stripMargin)),

    // CASE WHEN bucketing + conditional aggregation (manual pivot shape).
    QueryDef(
      "q26_case_pivot",
      (s, d) =>
        events(s, d)
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
            sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
            sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"))
          .filter(col("n_purchase") > 0)
          .orderBy(col("n_purchase").desc, col("user_id"))
          .limit(100),
      // CAST AS BIGINT: DuckDB sum(INTEGER) yields HUGEINT (float64 via
      // pandas) while Spark sum(int) is BIGINT — same fix as q48's oracle.
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
             |FROM events GROUP BY user_id
             |HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
             |ORDER BY n_purchase DESC, user_id LIMIT 100""".stripMargin)),

    // HLL sketch distinct (the 100 TB path for distinct counts — a
    // groupBy-distinct over billions of keys shuffles everything; the
    // sketch is mergeable map-side state). The approx value itself is
    // engine-specific, so the checked output is the exact count plus a
    // bound assertion that the sketch landed within 5%.
    QueryDef(
      "q47_approx_distinct",
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("exact_customers"),
            approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
          .select(col("o_orderstatus"), col("exact_customers"),
            (abs(col("approx") - col("exact_customers")) <=
              col("exact_customers") * 0.05).as("approx_within_5pct"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |  count(DISTINCT o_custkey) AS exact_customers,
             |  true AS approx_within_5pct
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // Explicit GROUPING SETS — the generalization rollup/cube are
    // shorthands for: independent per-status and per-priority margins
    // plus the grand total, without the full cross of q15's cube.
    // Runs through the SQL entry point (the DataFrame API has no
    // grouping-sets method; SURVEY.md §3 entry point 2).
    QueryDef(
      "q53_grouping_sets",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("orders_q53")
        s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                |  coalesce(o_orderpriority, 'ALL') AS priority,
                |  count(*) AS n_orders,
                |  round(sum(o_totalprice), 2) AS total_price
                |FROM orders_q53
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY status, priority""".stripMargin)
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total_price
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY status, priority""".stripMargin)),

    // Statistical aggregates with EXACT cross-engine arithmetic:
    // var_samp/stddev from integer moment sums (n, Σx, Σx²) — the
    // quantities are integral doubles, so the sums are exact longs and
    // var = (n·Σx² − (Σx)²) / (n·(n−1)) is one double division both
    // engines evaluate identically. Built-in var_samp would drift in
    // the last ulp with partition order (§7.4 trap 2); this is the
    // numerically-stable-by-exactness form, emitted in micro/milli
    // integer units.
    QueryDef(
      "q56_variance_exact",
      (s, d) => {
        // Singleton-group guard: n=1 divides by zero — Infinity, which
        // Spark casts to Long.MaxValue while DuckDB ERRORS on
        // CAST(inf AS BIGINT). var_samp of one sample is undefined, so
        // emit NULL (what built-in var_samp does) in both engines.
        val varExpr0 = (col("n") * col("s2") - col("s1") * col("s1")) * lit(1.0) /
          (col("n") * (col("n") - 1))
        val varExpr = when(col("n") > 1, varExpr0)
        lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity").cast("long").as("q"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("q")).as("s1"),
            sum(col("q") * col("q")).as("s2"))
          .select(col("l_returnflag"), col("l_linestatus"), col("n"),
            floor(varExpr * 1000000 + 0.5).cast("long").as("var_micro"),
            floor(sqrt(varExpr) * 1000 + 0.5).cast("long").as("stddev_milli"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""WITH g AS (SELECT l_returnflag, l_linestatus, count(*) AS n,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
             |      AS BIGINT) AS s2
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, l_linestatus, n,
             |  CAST(floor(CASE WHEN n > 1
             |      THEN (n*s2 - s1*s1) * 1.0 / (n * (n - 1)) END
             |    * 1000000 + 0.5) AS BIGINT) AS var_micro,
             |  CAST(floor(sqrt(CASE WHEN n > 1
             |      THEN (n*s2 - s1*s1) * 1.0 / (n * (n - 1)) END)
             |    * 1000 + 0.5) AS BIGINT) AS stddev_milli
             |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Percentiles: DISCRETE percentiles (actual data values — exact
    // integers on the quantity domain, no interpolation arithmetic to
    // match cross-engine) plus the sketch path a 100 TB engine
    // actually uses — approx_percentile, checked q47-style as a
    // within-tolerance flag since sketch internals are engine-specific.
    QueryDef(
      "q57_percentiles",
      (s, d) =>
        lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY q)").as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY q)").as("p90"),
            expr("approx_percentile(q, 0.5, 1000)").as("ap50"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            col("p50").cast("long").as("p50"),
            col("p90").cast("long").as("p90"),
            (abs(col("ap50") - col("p50")) <= 2).as("approx_p50_close"),
            col("n"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.5) AS BIGINT) AS p50,
             |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.9) AS BIGINT) AS p90,
             |  true AS approx_p50_close,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Correlated scalar subqueries (EXISTS was q11/q12): customers
    // whose total spend exceeds twice their nation's mean account
    // balance — Catalyst decorrelates both subqueries into aggregates
    // + joins; exercised through the SQL entry point. All money is
    // floor(x*100 + 0.5) integer cents and the mean comparison is
    // cross-multiplied, so the predicate is exact integer arithmetic
    // in both engines (a float threshold could flip boundary rows on
    // last-ulp summation differences).
    QueryDef(
      "q58_correlated_subquery",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("orders_q58")
        customer(s, d).createOrReplaceTempView("customer_q58")
        s.sql("""
          |SELECT c_nationkey, count(*) AS n_above_avg
          |FROM customer_q58 c
          |WHERE (SELECT coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
          |       FROM orders_q58 o WHERE o.o_custkey = c.c_custkey)
          |     * (SELECT count(*) FROM customer_q58 n
          |        WHERE n.c_nationkey = c.c_nationkey)
          |   > (SELECT 2 * sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
          |      FROM customer_q58 n WHERE n.c_nationkey = c.c_nationkey)
          |GROUP BY c_nationkey
          |ORDER BY c_nationkey""".stripMargin)
      },
      Some("""SELECT c_nationkey, count(*) AS n_above_avg
             |FROM customer c
             |WHERE (SELECT coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
             |       FROM orders o WHERE o.o_custkey = c.c_custkey)
             |     * (SELECT count(*) FROM customer n
             |        WHERE n.c_nationkey = c.c_nationkey)
             |   > (SELECT 2 * CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             |      FROM customer n WHERE n.c_nationkey = c.c_nationkey)
             |GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    // SQL-lambda higher-order functions (transform / filter /
    // aggregate as SQL syntax) plus array_join — the lambda surface a
    // SQL user of the engine writes directly, mirrored by DuckDB's
    // list_transform / list_filter / list_reduce.
    QueryDef(
      "q60_sql_higher_order",
      (s, d) =>
        part(s, d)
          .select(col("p_partkey"),
            expr("CAST(size(filter(split(p_name, ' '), t -> length(t) > 4)) AS BIGINT)")
              .as("n_long"),
            expr("CAST(aggregate(split(p_name, ' '), 0, (a, x) -> a + length(x)) AS BIGINT)")
              .as("total_chars"),
            expr("array_join(transform(split(p_name, ' '), x -> upper(x)), '-')")
              .as("upper_joined"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  CAST(len(list_filter(string_split(p_name, ' '),
             |    t -> length(t) > 4)) AS BIGINT) AS n_long,
             |  CAST(list_reduce(list_prepend(0,
             |    list_transform(string_split(p_name, ' '), x -> length(x))),
             |    (a, b) -> a + b) AS BIGINT) AS total_chars,
             |  array_to_string(list_transform(string_split(p_name, ' '),
             |    x -> upper(x)), '-') AS upper_joined
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Salted two-phase aggregation under the differential gate:
    // l_returnflag has 3 values over 600k rows — exactly the hot-key
    // shape SkewOps exists for (every key is "hot"). The salted
    // (key, salt) partial + merge must equal the plain group-by, so
    // the oracle is simply the unsalted SQL.
    QueryDef(
      "q61_salted_agg",
      (s, d) =>
        graft.ops.SkewOps.saltedSumCount(
            lineitem(s, d)
              .select(col("l_returnflag"),
                col("l_quantity").cast("long").as("qty")),
            Seq("l_returnflag"), "qty", salts = 16)
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Native pivot (wide transpose of q26's manual CASE form).
    QueryDef(
      "q48_pivot",
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0, Seq("F", "O", "P"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
             |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
             |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Equi-width histogram (the numeric-binning family next to q57's
    // percentiles): order totals bucketed on exact integer cents, one
    // aggregation pass, bin edges reported in whole cents so both
    // engines agree bit-for-bit. The one-pass groupBy-on-computed-bin
    // is the distributed histogram shape — no sorting, no per-bin
    // scans; at 100 TB it is a single map-side-combined aggregate.
    QueryDef(
      "q79_histogram",
      (s, d) => {
        val w = 5000000L // 50k-dollar bins in cents
        orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
          .withColumn("bin", expr(s"cents div ${w}L"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("cents")).as("min_cents"),
            max(col("cents")).as("max_cents"))
          .withColumn("bin_lo_cents", col("bin") * w)
          .select(col("bin"), col("bin_lo_cents"), col("n_orders"),
            col("min_cents"), col("max_cents"))
          .orderBy(col("bin"))
      },
      Some("""WITH c AS (SELECT
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders)
             |SELECT cents // 5000000 AS bin,
             |  (cents // 5000000) * 5000000 AS bin_lo_cents,
             |  count(*) AS n_orders,
             |  min(cents) AS min_cents, max(cents) AS max_cents
             |FROM c GROUP BY bin ORDER BY bin""".stripMargin)),

    // Blocked fuzzy matching (edit-distance entity resolution — the
    // dedup family's typo-tolerant member): part names matched across
    // a deliberately perturbed probe set via levenshtein <= 2, with
    // candidate pairs BLOCKED on (first word, length band) so the
    // quadratic distance computation only runs inside tiny blocks —
    // never name × name. Both engines implement classic DP
    // levenshtein: integer-exact parity.
    QueryDef(
      "q80_fuzzy_match",
      (s, d) => {
        val names = part(s, d).select(col("p_partkey"), col("p_name"))
        // probes: every 100th part with its name's LAST character
        // dropped — a deterministic typo one edit away.
        val probes = names.filter(col("p_partkey") % 100 === 0)
          .select(col("p_partkey").as("probe_key"),
            expr("substring(p_name, 1, length(p_name) - 1)").as("typo"))
        val block = (c: org.apache.spark.sql.Column) =>
          split(c, " ").getItem(0)
        broadcast(probes)
          .join(names,
            block(col("typo")) === block(col("p_name")) &&
              abs(length(col("typo")) - length(col("p_name"))) <= 2)
          .withColumn("dist", levenshtein(col("typo"), col("p_name")))
          .filter(col("dist") <= 2)
          .groupBy(col("probe_key"), col("typo"))
          .agg(count(lit(1)).as("n_matches"),
            min(struct(col("dist"), col("p_partkey"))).getField("p_partkey")
              .as("best_key"),
            min(struct(col("dist"), col("p_partkey"))).getField("dist")
              .as("best_dist"))
          .orderBy(col("probe_key"))
      },
      Some("""WITH names AS (SELECT p_partkey, p_name FROM part),
             |probes AS (SELECT p_partkey AS probe_key,
             |    substring(p_name, 1, length(p_name) - 1) AS typo
             |  FROM part WHERE p_partkey % 100 = 0),
             |cand AS (SELECT p.probe_key, p.typo, n.p_partkey,
             |    levenshtein(p.typo, n.p_name) AS dist
             |  FROM probes p JOIN names n
             |    ON string_split(p.typo, ' ')[1] = string_split(n.p_name, ' ')[1]
             |    AND abs(length(p.typo) - length(n.p_name)) <= 2),
             |ok AS (SELECT * FROM cand WHERE dist <= 2),
             |agg AS (SELECT probe_key, typo, count(*) AS n_matches
             |  FROM ok GROUP BY 1, 2),
             |best AS (SELECT probe_key, typo, p_partkey AS best_key,
             |    dist AS best_dist
             |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_key, typo
             |      ORDER BY dist, p_partkey) AS rn FROM ok) t
             |  WHERE rn = 1)
             |SELECT a.probe_key, a.typo, a.n_matches, b.best_key, b.best_dist
             |FROM agg a JOIN best b USING (probe_key, typo)
             |ORDER BY a.probe_key""".stripMargin)),

    // Per-group OLS regression slope — the bivariate extension of
    // q56's moment-sum trick: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
    // from EXACT integer sums (x = days since the TPC-H epoch ≤ ~2500,
    // y = whole dollars ≤ 6e5 — every product and n-scaled sum stays
    // far inside int64), then ONE double division floored to micro
    // units. Spark's built-in regr_slope would drift in the last ulp
    // with partition order; this is order-independent by construction.
    // Trend detection per key in a single partial+final aggregate.
    QueryDef(
      "q82_group_regression",
      (s, d) => {
        val x = datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        val y = expr("CAST(floor(o_totalprice) AS BIGINT)")
        val slope0 = (col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0) /
          (col("n") * col("sxx") - col("sx") * col("sx"))
        orders(s, d)
          .select(col("o_orderpriority"), x.as("x"), y.as("y"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("o_orderpriority"), col("n"),
            floor(when(col("n") * col("sxx") > col("sx") * col("sx"), slope0)
              * 1000000 + 0.5).cast("long").as("slope_micro"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH m AS (SELECT o_orderpriority,
             |    CAST(date_diff('day', DATE '1992-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             |    CAST(floor(o_totalprice) AS BIGINT) AS y
             |  FROM orders),
             |g AS (SELECT o_orderpriority, count(*) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*y) AS BIGINT) AS sxy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx
             |  FROM m GROUP BY o_orderpriority)
             |SELECT o_orderpriority, n,
             |  CAST(floor(CASE WHEN n*sxx > sx*sx
             |      THEN (n*sxy - sx*sy) * 1.0 / (n*sxx - sx*sx) END
             |    * 1000000 + 0.5) AS BIGINT) AS slope_micro
             |FROM g ORDER BY o_orderpriority""".stripMargin)),

    // Unpivot / melt (wide → long), the inverse of q48's pivot: per-
    // priority measures become (grp, measure, value) rows via the
    // native Dataset.unpivot — Catalyst plans an Expand (each input
    // row emits one row per measure in the same task), so the reshape
    // is projection-only: no shuffle beyond the feeding aggregation,
    // no join of per-measure subqueries. The long form is what a
    // metrics store or a generic "all KPIs by group" dashboard scan
    // wants at 100 TB — one schema regardless of how many measures.
    QueryDef(
      "q86_unpivot_long",
      (s, d) => {
        val wide = orders(s, d)
          .groupBy(col("o_orderpriority").as("grp"))
          .agg(count(lit(1)).as("n_orders"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("sum_price_cents"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L))
              .as("n_open"))
        wide.unpivot(
            Array(col("grp")),
            Array(col("n_orders"), col("sum_price_cents"), col("n_open")),
            "measure", "value")
          .orderBy(col("grp"), col("measure"))
      },
      Some("""WITH w AS (SELECT o_orderpriority AS grp,
             |    count(*) AS n_orders,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS sum_price_cents,
             |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_open
             |  FROM orders GROUP BY 1)
             |SELECT grp, measure, value FROM (
             |  SELECT grp, 'n_orders' AS measure, n_orders AS value FROM w
             |  UNION ALL SELECT grp, 'sum_price_cents', sum_price_cents FROM w
             |  UNION ALL SELECT grp, 'n_open', n_open FROM w)
             |ORDER BY grp, measure""".stripMargin)),

    // Skewness / excess kurtosis from exact integer moment sums (the
    // higher-moment siblings of q56's variance and q82's OLS slope):
    // one partial+final aggregation collects n, Σq..Σq⁴ as exact longs
    // (q ≤ 50 so Σq⁴ ≤ 4e12 — no overflow at sf100), then the shape
    // statistics are derived in ONE deterministic double expression
    // tree shared textually with the oracle — identical IEEE ops in
    // identical order, so floor(x*1e6+0.5) agrees bit-for-bit where
    // Spark's builtin skewness/kurtosis (streaming M2/M3/M4 updates)
    // is partitioning-order-dependent in the last ulps.
    QueryDef(
      "q87_higher_moments",
      (s, d) => {
        lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
            sum(expr("q*q")).as("s2"), sum(expr("q*q*q")).as("s3"),
            sum(expr("q*q*q*q")).as("s4"))
          .withColumn("mean", expr("CAST(s1 AS DOUBLE) / n"))
          .withColumn("m2", expr("CAST(s2 AS DOUBLE) / n - mean*mean"))
          .withColumn("m3", expr(
            "CAST(s3 AS DOUBLE)/n - 3*mean*CAST(s2 AS DOUBLE)/n" +
              " + 2*mean*mean*mean"))
          .withColumn("m4", expr(
            "CAST(s4 AS DOUBLE)/n - 4*mean*CAST(s3 AS DOUBLE)/n" +
              " + 6*mean*mean*CAST(s2 AS DOUBLE)/n - 3*mean*mean*mean*mean"))
          .select(col("l_returnflag"), col("n"),
            expr("CAST(floor(CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END" +
              " * 1000000 + 0.5) AS BIGINT)").as("skew_micro"),
            expr("CAST(floor(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 END" +
              " * 1000000 + 0.5) AS BIGINT)").as("kurt_micro"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (SELECT l_returnflag,
             |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
             |g AS (SELECT l_returnflag, count(*) AS n,
             |    CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q*q) AS BIGINT) AS s2,
             |    CAST(sum(q*q*q) AS BIGINT) AS s3,
             |    CAST(sum(q*q*q*q) AS BIGINT) AS s4
             |  FROM m GROUP BY l_returnflag),
             |mm AS (SELECT l_returnflag, n, s2, s3, s4,
             |    CAST(s1 AS DOUBLE) / n AS mean FROM g),
             |c AS (SELECT l_returnflag, n, mean, s3, s4, s2,
             |    CAST(s2 AS DOUBLE) / n - mean*mean AS m2 FROM mm),
             |c3 AS (SELECT l_returnflag, n, mean, s2, s3, s4, m2,
             |    CAST(s3 AS DOUBLE)/n - 3*mean*CAST(s2 AS DOUBLE)/n
             |      + 2*mean*mean*mean AS m3 FROM c),
             |c4 AS (SELECT l_returnflag, n, m2, m3,
             |    CAST(s4 AS DOUBLE)/n - 4*mean*CAST(s3 AS DOUBLE)/n
             |      + 6*mean*mean*CAST(s2 AS DOUBLE)/n
             |      - 3*mean*mean*mean*mean AS m4 FROM c3)
             |SELECT l_returnflag, n,
             |  CAST(floor(CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END
             |    * 1000000 + 0.5) AS BIGINT) AS skew_micro,
             |  CAST(floor(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 END
             |    * 1000000 + 0.5) AS BIGINT) AS kurt_micro
             |FROM c4 ORDER BY l_returnflag""".stripMargin)),

    // Z-score outlier audit (data-quality family): flag rows more
    // than 3σ from their group mean. Two passes over the fact table —
    // one partial+final aggregation to (n, Σx, Σx²) per group, then
    // the 9-row stats table BROADCAST back onto the rows, so the
    // second pass is a map-only scan: no row ever shuffles on the
    // group key. The comparison derives mean/m2 as doubles from the
    // exact integer sums with the oracle sharing the identical
    // expression text — same IEEE ops, same verdict on every row,
    // even for rows sitting exactly on the 3σ boundary.
    QueryDef(
      "q90_zscore_outliers",
      (s, d) => {
        val rows = lineitem(s, d).select(col("l_returnflag"),
          col("l_linestatus"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        val stats = rows.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
            sum(expr("cents * cents")).as("s2"))
          .withColumn("mean", expr("CAST(s1 AS DOUBLE) / n"))
          .withColumn("m2", expr("CAST(s2 AS DOUBLE) / n - mean*mean"))
        rows.join(broadcast(stats), Seq("l_returnflag", "l_linestatus"))
          .withColumn("dev", expr("CAST(cents AS DOUBLE) - mean"))
          .withColumn("is_out", expr("dev * dev > 9 * m2"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(max(col("n")).as("n"),
            sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
          .withColumn("out_permille", expr("n_outliers * 1000 div n"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""WITH r AS (SELECT l_returnflag, l_linestatus,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM lineitem),
             |g AS (SELECT l_returnflag, l_linestatus, count(*) AS n,
             |    CAST(sum(cents) AS BIGINT) AS s1,
             |    CAST(sum(cents * cents) AS BIGINT) AS s2
             |  FROM r GROUP BY 1, 2),
             |st AS (SELECT l_returnflag, l_linestatus, n, s2,
             |    CAST(s1 AS DOUBLE) / n AS mean FROM g),
             |st2 AS (SELECT l_returnflag, l_linestatus, n, mean,
             |    CAST(s2 AS DOUBLE) / n - mean*mean AS m2 FROM st),
             |j AS (SELECT r.l_returnflag, r.l_linestatus, n,
             |    CAST(cents AS DOUBLE) - mean AS dev, m2
             |  FROM r JOIN st2 USING (l_returnflag, l_linestatus))
             |SELECT l_returnflag, l_linestatus, max(n) AS n,
             |  CAST(sum(CASE WHEN dev * dev > 9 * m2 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers,
             |  CAST(sum(CASE WHEN dev * dev > 9 * m2 THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000 // max(n) AS out_permille
             |FROM j GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Referential-integrity audit (data-quality family): orphan
    // counts for each FK edge of the star schema in one result. Each
    // edge is a LEFT ANTI join — the child shuffles on its key once,
    // the parent side ships only its key column, and counting orphan
    // rows + distinct orphan keys is a single follow-up aggregate.
    // This is the check a lakehouse runs before publishing a
    // snapshot; zero rows orphaned is the expected (and verified)
    // steady state, and the n_child baseline makes the zeros
    // meaningful in the differential check.
    QueryDef(
      "q92_fk_audit",
      (s, d) => {
        // One left join + one aggregate per FK edge: n_child, orphan
        // rows, and orphan keys all come out of the SAME child pass
        // (a separate count(*) pass would re-scan the child table per
        // edge). Parents are primary keys, so the left join cannot
        // multiply child rows.
        def audit(edge: String, child: DataFrame, key: String,
            parent: DataFrame, pkey: String): DataFrame =
          child.select(col(key))
            .join(parent.select(col(pkey).as(key))
              .withColumn("__hit", lit(1)), Seq(key), "left")
            .agg(count(lit(1)).as("n_child"),
              sum(when(col("__hit").isNull, 1L).otherwise(0L))
                .as("n_orphans"),
              countDistinct(when(col("__hit").isNull, col(key)))
                .as("n_orphan_keys"))
            .select(lit(edge).as("fk_edge"), col("n_child"),
              col("n_orphans"), col("n_orphan_keys"))
        audit("lineitem.orderkey->orders", lineitem(s, d), "l_orderkey",
            orders(s, d), "o_orderkey")
          .unionByName(audit("lineitem.partkey->part", lineitem(s, d),
            "l_partkey", part(s, d), "p_partkey"))
          .unionByName(audit("orders.custkey->customer", orders(s, d),
            "o_custkey", customer(s, d), "c_custkey"))
          .orderBy(col("fk_edge"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'lineitem.orderkey->orders' AS fk_edge,
             |    (SELECT count(*) FROM lineitem) AS n_child,
             |    (SELECT count(*) FROM lineitem l LEFT JOIN orders o
             |      ON l.l_orderkey = o.o_orderkey
             |      WHERE o.o_orderkey IS NULL) AS n_orphans,
             |    (SELECT count(DISTINCT l_orderkey) FROM lineitem l
             |      LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
             |      WHERE o.o_orderkey IS NULL) AS n_orphan_keys
             |  UNION ALL
             |  SELECT 'lineitem.partkey->part',
             |    (SELECT count(*) FROM lineitem),
             |    (SELECT count(*) FROM lineitem l LEFT JOIN part p
             |      ON l.l_partkey = p.p_partkey
             |      WHERE p.p_partkey IS NULL),
             |    (SELECT count(DISTINCT l_partkey) FROM lineitem l
             |      LEFT JOIN part p ON l.l_partkey = p.p_partkey
             |      WHERE p.p_partkey IS NULL)
             |  UNION ALL
             |  SELECT 'orders.custkey->customer',
             |    (SELECT count(*) FROM orders),
             |    (SELECT count(*) FROM orders o LEFT JOIN customer c
             |      ON o.o_custkey = c.c_custkey
             |      WHERE c.c_custkey IS NULL),
             |    (SELECT count(DISTINCT o_custkey) FROM orders o
             |      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             |      WHERE c.c_custkey IS NULL))
             |ORDER BY fk_edge""".stripMargin)),

    // Equi-depth histogram via ntile (the quantile-bucketing sibling
    // of q79's equi-width bins): 8 buckets of equal row count over
    // exact integer cents, per-bucket count and [min, max] edges.
    // The window's ORDER BY carries a full tie-break (cents, key) so
    // bucket membership is deterministic under duplicate prices in
    // both engines. This exact form costs one global range sort — the
    // honest price of exact boundaries; the sketch path for 100 TB is
    // q57's approx_percentile, and this query is its audit: run both,
    // compare edges.
    QueryDef(
      "q93_equidepth_hist",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        orders(s, d)
          .select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("cents"))
          .withColumn("tile", ntile(8).over(
            Window.orderBy(col("cents"), col("o_orderkey"))))
          .groupBy(col("tile"))
          .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
            max(col("cents")).as("hi_cents"))
          .orderBy(col("tile"))
      },
      Some("""WITH t AS (SELECT
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |    ntile(8) OVER (ORDER BY
             |      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
             |      o_orderkey) AS tile
             |  FROM orders)
             |SELECT tile, count(*) AS n, min(cents) AS lo_cents,
             |  max(cents) AS hi_cents
             |FROM t GROUP BY tile ORDER BY tile""".stripMargin)),

    // Chi-square independence audit: is event type independent of
    // time-of-day? Contingency cells are one exact partial+final
    // count; row/column marginals are re-aggregations of the tiny
    // cell table, broadcast back onto it — the fact table is scanned
    // ONCE. Each cell's (O-E)²/E term is derived from exact integer
    // counts in a shared double expression tree, then floor-scaled to
    // integer micros BEFORE summing, so the per-group sums are
    // order-independent (a double sum across cells would not be).
    // Emitted per event type; the global statistic is the column sum.
    QueryDef(
      "q94_chi2_independence",
      (s, d) => {
        val cells = eventsNorm(s, d)
          .select(col("event_type"),
            expr("((ts_sec div 3600) % 24) div 6").as("daypart"))
          .groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy(col("event_type"))
          .agg(sum(col("o")).as("rt"))
        val colT = cells.groupBy(col("daypart"))
          .agg(sum(col("o")).as("ct"))
        val total = cells.agg(sum(col("o")).as("nn"))
        cells.join(broadcast(rowT), Seq("event_type"))
          .join(broadcast(colT), Seq("daypart"))
          .crossJoin(broadcast(total))
          .withColumn("e", expr("CAST(rt * ct AS DOUBLE) / nn"))
          .withColumn("term_micro", expr(
            "CAST(floor((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)" +
              " / e * 1000000 + 0.5) AS BIGINT)"))
          .groupBy(col("event_type"))
          .agg(sum(col("o")).as("n_events"),
            sum(col("term_micro")).as("chi2_contrib_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH c AS (SELECT event_type,
             |    ((CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 3600) % 24)
             |      // 6 AS daypart,
             |    count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
             |  FROM c GROUP BY 1),
             |ct AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ct
             |  FROM c GROUP BY 1),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM c),
             |t AS (SELECT c.event_type, c.o,
             |    CAST(rt.rt * ct.ct AS DOUBLE) / n.nn AS e
             |  FROM c JOIN rt ON c.event_type = rt.event_type
             |    JOIN ct ON c.daypart = ct.daypart CROSS JOIN n)
             |SELECT event_type, CAST(sum(o) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(floor((CAST(o AS DOUBLE) - e)
             |      * (CAST(o AS DOUBLE) - e) / e * 1000000 + 0.5) AS BIGINT))
             |    AS BIGINT) AS chi2_contrib_micro
             |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Benford first-digit audit (fraud/synthetic-data smell test):
    // leading-digit distribution of order totals vs the Benford
    // expectation. The first digit is pure integer arithmetic —
    // cents div 10^(decimal_length-1) — no float log in the data
    // path; the expected-permille table IS log10-derived but is
    // computed once in the driver and inlined into both engines
    // (same discipline as q85's ln table). One aggregation pass,
    // 9-row output with observed-vs-expected deltas.
    QueryDef(
      "q97_benford_digits",
      (s, d) => {
        val digits = orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
          .filter(col("cents") > 0)
          .withColumn("digit", expr(
            "cents div CAST(power(10, length(CAST(cents AS STRING)) - 1)" +
              " AS BIGINT)"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        digits.crossJoin(broadcast(digits.agg(sum(col("n")).as("total"))))
          .withColumn("obs_permille", expr("n * 1000 div total"))
          .withColumn("exp_permille", expr(
            s"element_at(array(${BenfordPermille.mkString(",")}), " +
              "CAST(digit AS INT))"))
          .select(col("digit"), col("n"), col("obs_permille"),
            col("exp_permille"),
            (col("obs_permille") - col("exp_permille")).as("delta_permille"))
          .orderBy(col("digit"))
      },
      Some(s"""WITH c AS (SELECT
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders
             |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
             |d AS (SELECT cents // CAST(power(10,
             |      length(CAST(cents AS VARCHAR)) - 1) AS BIGINT) AS digit
             |  FROM c),
             |g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
             |SELECT digit, n, n * 1000 // total AS obs_permille,
             |  [${BenfordPermille.mkString(",")}][CAST(digit AS INT)]
             |    AS exp_permille,
             |  n * 1000 // total
             |    - [${BenfordPermille.mkString(",")}][CAST(digit AS INT)]
             |    AS delta_permille
             |FROM g CROSS JOIN t ORDER BY digit""".stripMargin)),

    // SALTED JOIN (q61's sibling for joins): the fact side's join key
    // gains a uniform salt, the bounded dim side replicates salts×,
    // and the join runs on (key, salt) — a hot key's rows now spread
    // over `salts` reducers instead of pinning one straggler task,
    // the manual form of AQE's skew-join split that also works where
    // AQE can't see the skew (pre-shuffle, or under non-AQE engines).
    // Result set is IDENTICAL to the plain join for any data — the
    // oracle states the plain join + rollup, so the salting must be
    // invisible. Cost model in the scaladoc of SkewOps.saltedJoin:
    // replication is salts × |dim|, worth it only when one key
    // dominates a reducer.
    QueryDef(
      "q137_salted_join",
      (s, d) => {
        val big = lineitem(s, d)
          .select(col("l_partkey").as("partkey"),
            col("l_quantity").cast("long").as("qty"))
        val dim = part(s, d)
          .select(col("p_partkey").as("partkey"), col("p_type"))
        graft.ops.SkewOps.saltedJoin(big, dim, "partkey", salts = 8)
          .groupBy(col("p_type"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("qty")).as("sum_qty"))
          .orderBy(col("n_items").desc, col("p_type"))
          .limit(10)
      },
      Some("""SELECT p_type, count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_type
             |ORDER BY n_items DESC, p_type LIMIT 10""".stripMargin)),

    // DATA-QUALITY EXPECTATIONS (the declarative constraint gate a
    // lakehouse runs on ingest — Delta constraints / DLT-expectation
    // shape): N rules evaluated in ONE scan as conditional sums, then
    // unpivoted to a per-rule audit row (rule, n_rows, n_violations,
    // pass_permille). Adding a rule adds a column to one projection,
    // never a pass over the data — at 100 TB the expectation suite
    // costs the same single scan as one rule. Violation predicates
    // are null-safe (a NULL check result counts as a violation for
    // NOT-NULL rules, as a pass for domain rules on other columns —
    // each rule states its own NULL policy explicitly).
    QueryDef(
      "q138_expectations",
      (s, d) => {
        def viol(c: org.apache.spark.sql.Column) =
          sum(when(c, 1L).otherwise(0L))
        val agg = orders(s, d).agg(
          count(lit(1)).as("n_rows"),
          viol(col("o_orderkey").isNull).as("v_key_null"),
          viol(coalesce(!col("o_orderstatus").isin("O", "F", "P"),
            lit(true))).as("v_status_domain"),
          viol(coalesce(col("o_totalprice") <= 0, lit(true)))
            .as("v_price_pos"),
          viol(coalesce(col("o_orderdate") <
            to_timestamp(lit("1995-01-01")), lit(true))).as("v_date_min"))
        agg.select(col("n_rows"), expr(
          "stack(4, " +
            "'key_not_null', v_key_null, " +
            "'status_in_domain', v_status_domain, " +
            "'price_positive', v_price_pos, " +
            "'date_after_1995', v_date_min) AS (rule, n_violations)"))
          .select(col("rule"), col("n_rows"), col("n_violations"),
            expr("(n_rows - n_violations) * 1000 div n_rows")
              .as("pass_permille"))
          .orderBy(col("rule"))
      },
      Some("""WITH a AS (SELECT count(*) AS n_rows,
             |    CAST(sum(CASE WHEN o_orderkey IS NULL
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v_key_null,
             |    CAST(sum(CASE WHEN coalesce(
             |        o_orderstatus NOT IN ('O','F','P'), TRUE)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain,
             |    CAST(sum(CASE WHEN coalesce(o_totalprice <= 0, TRUE)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v_price_pos,
             |    CAST(sum(CASE WHEN coalesce(
             |        o_orderdate < TIMESTAMP '1995-01-01', TRUE)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v_date_min
             |  FROM orders),
             |u AS (
             |  SELECT 'key_not_null' AS rule, n_rows,
             |    v_key_null AS n_violations FROM a
             |  UNION ALL SELECT 'status_in_domain', n_rows,
             |    v_status_domain FROM a
             |  UNION ALL SELECT 'price_positive', n_rows,
             |    v_price_pos FROM a
             |  UNION ALL SELECT 'date_after_1995', n_rows,
             |    v_date_min FROM a)
             |SELECT rule, n_rows, n_violations,
             |  (n_rows - n_violations) * 1000 // n_rows AS pass_permille
             |FROM u ORDER BY rule""".stripMargin)),

    // BITMAP INDEX (the Druid/ClickHouse/roaring segment-membership
    // structure): each customer segment compresses to one 64-bit word
    // per 64-key bucket (bit k of bucket b set ⇔ key 64b+k is in the
    // segment — bit_or is idempotent, so duplicate orders cost
    // nothing), and set algebra becomes WORD algebra: AND/OR the
    // bucket-aligned words, bit_count the result. Segment
    // intersection over millions of members reduces to a join on
    // bucket ids with one integer op per 64 members — the reason
    // every OLAP store keeps dimension bitmaps. The oracle computes
    // the same four cardinalities from first principles (DISTINCT
    // sets, join/union), so a single wrong bit anywhere breaks the
    // hash. Bit 63 lands in the sign bit — harmless, & | bit_count
    // are two's-complement-blind, which this entry exercises by
    // construction (custkeys ≡ 63 mod 64 exist at every sf).
    QueryDef(
      "q139_bitmap_index",
      (s, d) => {
        val o = orders(s, d)
        def segment(status: String, w: String) =
          o.filter(col("o_orderstatus") === status)
            .groupBy(expr("o_custkey div 64").as("bucket"))
            .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), " +
              "CAST(o_custkey % 64 AS INT)))").as(w))
        segment("F", "wa")
          .join(segment("O", "wb"), Seq("bucket"), "full_outer")
          .select(coalesce(col("wa"), lit(0L)).as("wa"),
            coalesce(col("wb"), lit(0L)).as("wb"))
          .agg(
            sum(expr("bit_count(wa)")).as("n_seg_a"),
            sum(expr("bit_count(wb)")).as("n_seg_b"),
            sum(expr("bit_count(wa & wb)")).as("n_both"),
            sum(expr("bit_count(wa | wb)")).as("n_either"))
          .select(col("n_seg_a").cast("long").as("n_seg_a"),
            col("n_seg_b").cast("long").as("n_seg_b"),
            col("n_both").cast("long").as("n_both"),
            col("n_either").cast("long").as("n_either"))
      },
      Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderstatus = 'F'),
             |b AS (SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderstatus = 'O')
             |SELECT
             |  CAST((SELECT count(*) FROM a) AS BIGINT) AS n_seg_a,
             |  CAST((SELECT count(*) FROM b) AS BIGINT) AS n_seg_b,
             |  CAST((SELECT count(*) FROM a JOIN b USING (o_custkey))
             |    AS BIGINT) AS n_both,
             |  CAST((SELECT count(*) FROM
             |      (SELECT o_custkey FROM a UNION
             |       SELECT o_custkey FROM b))
             |    AS BIGINT) AS n_either""".stripMargin))
  ,

    // Salted-hash PSEUDONYMIZATION (the GDPR-grade PII treatment
    // q64's scrubbing is the redaction half of): replace the natural
    // key with sha256(salt ‖ key) so records stay JOINABLE across
    // tables — the property tokenization must preserve and masking
    // destroys — while the raw id never leaves the boundary.
    // Consistency is proven IN the checked result: customer and
    // orders are pseudonymized independently, then joined on the
    // pseudonym; the per-segment rollup (plus a sampled pseudonym
    // value, pinned by min()) must equal the plain-key join the
    // oracle states with DuckDB's own sha256 — same digest, same
    // hex, or the join collapses. sha2 is a codegen'd built-in on
    // both sides (no UDF); the salt is a pipeline secret in
    // production, a literal here. Narrow projections + one
    // broadcastable dim join; the digest widens the join key to 32
    // bytes — at 100 TB substring the hex to 16 chars (64 bits) if
    // key-width dominates shuffle cost (collision odds ~n²/2⁶⁵).
    QueryDef(
      "q148_pseudonymize",
      (s, d) => {
        val pseud = (k: org.apache.spark.sql.Column) =>
          sha2(concat(lit("graft-pepper-v1:"), k.cast("string")), 256)
        val c = customer(s, d)
          .select(pseud(col("c_custkey")).as("p_cust"),
            col("c_mktsegment"))
        val o = orders(s, d)
          .select(pseud(col("o_custkey")).as("p_cust"))
        o.join(broadcast(c), Seq("p_cust"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            countDistinct(col("p_cust")).as("n_customers"),
            min(col("p_cust")).as("sample_pseudonym"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH c AS (
             |  SELECT sha256('graft-pepper-v1:' ||
             |      CAST(c_custkey AS VARCHAR)) AS p_cust, c_mktsegment
             |  FROM customer),
             |o AS (
             |  SELECT sha256('graft-pepper-v1:' ||
             |      CAST(o_custkey AS VARCHAR)) AS p_cust
             |  FROM orders)
             |SELECT c_mktsegment, count(*) AS n_orders,
             |  count(DISTINCT o.p_cust) AS n_customers,
             |  min(o.p_cust) AS sample_pseudonym
             |FROM o JOIN c ON o.p_cust = c.p_cust
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // SHUFFLE-KEY SKEW PROFILER (q137's planning sibling): before
    // committing a 100 TB join to a key, measure the key — one
    // map-side-combined groupBy per candidate yields rows, distinct
    // keys, the hottest key and its share (ppm), and the SALT FACTOR
    // q137/SkewOps would need: ceil(max_freq / (rows/32 partitions)),
    // i.e. how many reducers the hottest key's rows must spread over
    // before no single task drowns. skew_ppm ~ 1e6/n_keys means
    // uniform (salt 1 = don't salt); orders of magnitude above it
    // flags the straggler before it happens. The hot-key argmax is
    // the struct-max idiom — (freq, key) max picks the largest freq
    // with the largest key as the deterministic tie-break, identical
    // to the oracle's ORDER BY freq DESC, key DESC LIMIT 1.
    QueryDef(
      "q210_skew_profile",
      (s, d) => {
        def profile(df: DataFrame, keyCol: String, label: String)
            : DataFrame =
          df.filter(col(keyCol).isNotNull)
            .select(col(keyCol).cast("string").as("k"))
            .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
            .agg(sum(col("cnt")).as("n_rows"),
              count(lit(1)).as("n_keys"),
              max(struct(col("cnt"), col("k"))).as("m"))
            .select(lit(label).as("key_name"), col("n_rows"),
              col("n_keys"), col("m.cnt").as("max_freq"),
              col("m.k").as("top_key"))
            .withColumn("skew_ppm",
              expr("max_freq * 1000000 div n_rows"))
            .withColumn("salt_factor",
              expr("(max_freq * 32 + n_rows - 1) div n_rows"))
        profile(lineitem(s, d), "l_orderkey", "lineitem.l_orderkey")
          .unionByName(
            profile(lineitem(s, d), "l_suppkey", "lineitem.l_suppkey"))
          .unionByName(
            profile(events(s, d), "user_id", "events.user_id"))
          .unionByName(
            profile(events(s, d), "event_type", "events.event_type"))
          .orderBy(col("key_name"))
      },
      Some("""WITH src AS (
             |  SELECT 'lineitem.l_orderkey' AS key_name,
             |    CAST(l_orderkey AS VARCHAR) AS k
             |  FROM lineitem WHERE l_orderkey IS NOT NULL
             |  UNION ALL
             |  SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS VARCHAR)
             |  FROM lineitem WHERE l_suppkey IS NOT NULL
             |  UNION ALL
             |  SELECT 'events.user_id', CAST(user_id AS VARCHAR)
             |  FROM events WHERE user_id IS NOT NULL
             |  UNION ALL
             |  SELECT 'events.event_type', event_type
             |  FROM events WHERE event_type IS NOT NULL),
             |f AS (
             |  SELECT key_name, k, count(*) AS cnt
             |  FROM src GROUP BY key_name, k),
             |p AS (
             |  SELECT key_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
             |    count(*) AS n_keys, max(cnt) AS max_freq
             |  FROM f GROUP BY key_name),
             |tk AS (
             |  SELECT key_name, k AS top_key
             |  FROM (SELECT key_name, k, row_number() OVER (
             |      PARTITION BY key_name
             |      ORDER BY cnt DESC, k DESC) AS rn FROM f)
             |  WHERE rn = 1)
             |SELECT p.key_name, p.n_rows, p.n_keys, p.max_freq,
             |  tk.top_key,
             |  p.max_freq * 1000000 // p.n_rows AS skew_ppm,
             |  (p.max_freq * 32 + p.n_rows - 1) // p.n_rows
             |    AS salt_factor
             |FROM p JOIN tk ON p.key_name = tk.key_name
             |ORDER BY p.key_name""".stripMargin))
  )
}
