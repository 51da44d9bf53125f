package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function + temporal catalog (SURVEY.md §2b "Window functions",
  * "Streaming" batch-checkable forms).
  *
  * Scale notes: windows over FACT tables always partition by a key — a
  * `Window.orderBy` without partitionBy funnels 100 TB through one task.
  * Two deliberate exceptions run unpartitioned over bounded AGGREGATES,
  * never facts: q98 (25-row nation rollup) and q116's ntile quartiles
  * (per-customer aggregate — bounded relative to the fact table, but at
  * domain scale, ~1e9 customers, replace with range-partitioned
  * row_number + the closed-form ntile bucket floor((rn-1)·k/n)+1; the
  * global window here keeps the catalog form oracle-exact). Time
  * bucketing uses exact integer epoch math so the DuckDB oracle agrees
  * bit-for-bit.
  */
object Windowed {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // row_number per group → per-group top-k (the windowed form of the
    // reference's Top100 O12).
    QueryDef(
      "q16_window_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        part(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, rn, p_partkey, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    row_number() OVER (PARTITION BY p_brand
             |      ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) t
             |WHERE rn <= 2 ORDER BY p_brand, rn""".stripMargin)),

    // Running (cumulative) aggregate per key, ROWS UNBOUNDED PRECEDING.
    QueryDef(
      "q17_window_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .filter(col("o_custkey") < 20)
          .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
          .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS UNBOUNDED PRECEDING), 2) AS running_spend
             |FROM orders WHERE o_custkey < 20
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // lag(): inter-order gap in days per customer.
    QueryDef(
      "q18_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d)
          .filter(col("o_custkey") < 20)
          .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
          .select(
            col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate"), col("prev_date")).as("days_since_prev"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(date_diff('day',
             |    lag(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey),
             |    o_orderdate) AS INTEGER) AS days_since_prev
             |FROM orders WHERE o_custkey < 20
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Tumbling time window (batch form of the streaming agg): hourly
    // event counts per type. Buckets as exact epoch seconds.
    QueryDef(
      "q24_time_bucket",
      (s, d) =>
        eventsNorm(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("sum_value"))
          .select(
            col("window.start").cast("long").as("bucket_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("bucket_start"), col("event_type")),
      Some("""SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2
             |ORDER BY bucket_start, event_type""".stripMargin)),

    // Sessionization via gaps-and-islands: a session breaks after >30 min
    // of user inactivity. Pure window functions — expressible in both
    // engines, and at scale it is one shuffle on user_id.
    QueryDef(
      "q25_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        eventsNorm(s, d)
          .withColumn("prev_sec", lag(col("ts_sec"), 1).over(byUser))
          .withColumn(
            "new_session",
            when(col("prev_sec").isNull ||
              col("ts_sec") - col("prev_sec") > 1800, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"))
          .filter(col("user_id") < 20)
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id,
             |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec,
             |    lag(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) OVER (
             |      PARTITION BY user_id
             |      ORDER BY CAST(epoch_ns(ts) // 1000000000 AS BIGINT), event_id)
             |      AS prev_sec
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, ts_sec,
             |    CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 1800
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM g),
             |sess AS (
             |  SELECT user_id, ts_sec,
             |    sum(new_session) OVER (PARTITION BY user_id
             |      ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING)
             |      AS session_id
             |  FROM m)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  count(*) AS n_events,
             |  max(ts_sec) - min(ts_sec) AS duration_sec
             |FROM sess WHERE user_id < 20
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Native session_window (the Structured Streaming sessionization
    // operator, batch-executed): merges events arriving strictly
    // within 30 min of the previous one. The oracle rebuilds the same
    // sessions as gaps-and-islands (new session when diff >= 1800 s —
    // session_window's [start, last+gap) range is end-exclusive).
    // Second-truncated timestamps so both engines bucket identically.
    QueryDef(
      "q46_session_window",
      (s, d) =>
        eventsNorm(s, d)
          .withColumn("tss", timestamp_seconds(col("ts_sec")))
          .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .filter(col("user_id") < 20)
          .select(col("user_id"),
            col("session_window.start").cast("long").as("session_start"),
            col("n_events"))
          .orderBy(col("user_id"), col("session_start")),
      Some("""WITH g AS (
             |  SELECT user_id, event_id,
             |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, ts_sec,
             |    CASE WHEN lag(ts_sec) OVER w IS NULL
             |           OR ts_sec - lag(ts_sec) OVER w >= 1800
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
             |sess AS (
             |  SELECT user_id, ts_sec,
             |    sum(new_session) OVER (PARTITION BY user_id
             |      ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM m)
             |SELECT user_id, min(ts_sec) AS session_start, count(*) AS n_events
             |FROM sess WHERE user_id < 20
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_start""".stripMargin)),

    // Distribution window functions: ntile quartiles, percent_rank,
    // cume_dist, and first/last frame values per customer's order
    // history. Ordering is fully tie-broken (date then key) so the
    // rank-derived ratios are deterministic; ratios are micro-unit
    // integers (floor(x*1e6 + 0.5)) per §7.4 trap 2.
    QueryDef(
      "q54_window_distribution",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val frame = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, d)
          .filter(col("o_custkey") < 20)
          .select(
            col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            floor(percent_rank().over(w) * 1000000 + 0.5).cast("long")
              .as("pct_rank_micro"),
            floor(cume_dist().over(w) * 1000000 + 0.5).cast("long")
              .as("cume_dist_micro"),
            first(col("o_orderkey")).over(frame).as("first_order"),
            last(col("o_orderkey")).over(frame).as("last_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  ntile(4) OVER w AS quartile,
             |  CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
             |    AS pct_rank_micro,
             |  CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
             |    AS cume_dist_micro,
             |  first_value(o_orderkey) OVER wf AS first_order,
             |  last_value(o_orderkey) OVER wf AS last_order
             |FROM orders WHERE o_custkey < 20
             |WINDOW w AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey),
             |  wf AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Backward as-of join (graft.ops.AsOfJoin): each event aligned to
    // the customer's most recent order on-or-before the event's day.
    // Spark side is the union + running-last composition (one shuffle,
    // no inequality join); the oracle is DuckDB's NATIVE ASOF LEFT
    // JOIN — two independent implementations of the operator must
    // agree row-for-row. Days are integer epoch-day buckets (div
    // arithmetic, timezone-free in both engines); orders are deduped
    // to one per (custkey, day) per the as-of uniqueness contract.
    QueryDef(
      "q51_asof_join",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"),
            expr("ts_sec div 86400").as("day"))
        // Pre-filter to the probed keys: without it every customer's
        // orders shuffle and sort through the as-of window only to be
        // discarded by the final kind filter. (At scale: semi-join
        // against the left key set instead of a literal predicate.)
        val ords = orders(s, d)
          .filter(col("o_custkey") < 5)
          .select(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
              .as("order_day"),
            col("o_orderkey"))
          .groupBy(col("o_custkey"), col("order_day"))
          .agg(max(col("o_orderkey")).as("last_orderkey"))
        graft.ops.AsOfJoin.asofBackward(
            ev, ords, leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "day", rightTime = "order_day",
            payload = Seq("last_orderkey"))
          .select(col("user_id"), col("event_id"), col("day"),
            col("last_orderkey"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
             |  FROM events WHERE user_id < 5),
             |o AS (SELECT o_custkey,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             |      AS order_day,
             |    max(o_orderkey) AS last_orderkey
             |  FROM orders GROUP BY 1, 2)
             |SELECT e.user_id, e.event_id, e.day, o.last_orderkey
             |FROM ev e ASOF LEFT JOIN o
             |  ON e.user_id = o.o_custkey AND e.day >= o.order_day
             |ORDER BY e.user_id, e.event_id""".stripMargin)),

    // Point-in-interval range join (graft.ops.RangeJoin): traffic
    // within ±6 h of each big purchase. No equi key exists, so the
    // Spark side uses interval bucketing (equi-join on quantized time
    // + residual filter — one shuffle, never a cartesian); the oracle
    // is DuckDB's planner on the bare BETWEEN predicate (its native
    // IEJoin handles inequality joins exactly). Two independent
    // algorithms, same rows.
    QueryDef(
      "q52_range_join",
      (s, d) => {
        val hr = expr("ts_sec div 3600")
        val ev = eventsNorm(s, d)
          .select(col("event_id"), col("user_id"), hr.as("hr"))
        val promos = eventsNorm(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 200)
          .select(col("event_id").as("promo_id"),
            (hr - 6).as("w_start"), (hr + 6).as("w_end"))
        graft.ops.RangeJoin
          .pointInInterval(ev, "hr", promos, "w_start", "w_end", 6L)
          .groupBy(col("promo_id"))
          .agg(min(col("w_start")).as("window_start"),
            count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("promo_id"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) AS hr
             |  FROM events),
             |p AS (SELECT event_id AS promo_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) - 6 AS w_start,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) + 6 AS w_end
             |  FROM events WHERE event_type = 'purchase' AND value > 200)
             |SELECT p.promo_id, min(p.w_start) AS window_start,
             |  count(*) AS n_events,
             |  count(DISTINCT e.user_id) AS n_users
             |FROM p JOIN ev e ON e.hr BETWEEN p.w_start AND p.w_end
             |GROUP BY p.promo_id ORDER BY p.promo_id""".stripMargin)),

    // Interval × interval overlap join (graft.ops.RangeJoin
    // .intervalOverlap): promo windows (±6 h around big purchases)
    // against incident windows (±3 h around severe errors) — "which
    // promotions ran during an incident". No equi key exists; the
    // Spark side explodes BOTH interval sets over time buckets and
    // keeps each pair only in the bucket where its overlap starts (one
    // equi-join shuffle, no cartesian, no distinct over the output).
    // The oracle is DuckDB's native IEJoin on the bare inequality
    // predicate — two independent algorithms, same rows.
    QueryDef(
      "q66_interval_overlap",
      (s, d) => {
        val hr = expr("ts_sec div 3600")
        val promos = eventsNorm(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 200)
          .select(col("event_id").as("promo_id"),
            (hr - 6).as("p_start"), (hr + 6).as("p_end"))
        val incidents = eventsNorm(s, d)
          .filter(col("event_type") === "error" && col("value") > 95)
          .select(col("event_id").as("incident_id"),
            (hr - 3).as("i_start"), (hr + 3).as("i_end"))
        graft.ops.RangeJoin
          .intervalOverlap(promos, "p_start", "p_end",
            incidents, "i_start", "i_end", 6L)
          .select(col("promo_id"), col("incident_id"),
            greatest(col("p_start"), col("i_start")).as("overlap_start"),
            least(col("p_end"), col("i_end")).as("overlap_end"))
          .orderBy(col("promo_id"), col("incident_id"))
      },
      Some("""WITH p AS (SELECT event_id AS promo_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) - 6 AS p_start,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) + 6 AS p_end
             |  FROM events WHERE event_type = 'purchase' AND value > 200),
             |i AS (SELECT event_id AS incident_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) - 3 AS i_start,
             |    CAST(epoch_ns(ts) // 1000000000 // 3600 AS BIGINT) + 3 AS i_end
             |  FROM events WHERE event_type = 'error' AND value > 95)
             |SELECT p.promo_id, i.incident_id,
             |  greatest(p.p_start, i.i_start) AS overlap_start,
             |  least(p.p_end, i.i_end) AS overlap_end
             |FROM p JOIN i ON p.p_start <= i.i_end AND i.i_start <= p.p_end
             |ORDER BY p.promo_id, i.incident_id""".stripMargin)),

    // SCD2 dimension history (graft.ops.Scd2): each customer's order
    // priority treated as a changing attribute; the change log (one
    // record per key per day, latest order wins) compresses into
    // versioned [valid_from, valid_to) intervals, open-ended on the
    // current version. Days are exact epoch-day integers. The oracle
    // rebuilds the same run compression with lag/lead in DuckDB.
    QueryDef(
      "q72_scd2_history",
      (s, d) => {
        val changes = orders(s, d)
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
              .as("day"),
            col("o_orderkey"), col("o_orderpriority"))
          // unique per (key, ts): latest order of the day wins
          .groupBy(col("o_custkey"), col("day"))
          .agg(max_by(col("o_orderpriority"), col("o_orderkey"))
            .as("priority"))
        graft.ops.Scd2.fromChangeLog(changes, "o_custkey", "priority", "day")
          .select(col("o_custkey"), col("priority"),
            col("valid_from"), col("valid_to"))
          .orderBy(col("o_custkey"), col("valid_from"))
      },
      Some("""WITH ch AS (SELECT o_custkey,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             |      AS day,
             |    max_by(o_orderpriority, o_orderkey) AS priority
             |  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
             |r AS (SELECT *,
             |    lag(priority) OVER (PARTITION BY o_custkey ORDER BY day)
             |      AS prev,
             |    lag(day) OVER (PARTITION BY o_custkey ORDER BY day)
             |      AS prev_day
             |  FROM ch),
             |starts AS (SELECT o_custkey, priority, day AS valid_from
             |  FROM r WHERE prev_day IS NULL OR prev IS DISTINCT FROM priority)
             |SELECT o_custkey, priority, valid_from,
             |  lead(valid_from) OVER (PARTITION BY o_custkey
             |    ORDER BY valid_from) AS valid_to
             |FROM starts ORDER BY o_custkey, valid_from""".stripMargin)),

    // Ordered-funnel analysis (the MATCH_RECOGNIZE-shaped sequential
    // pattern: view → click → purchase, each step strictly after the
    // previous one, per user). Composed as a chain of conditional-min
    // aggregations — step k+1 is min(ts) over events after the user's
    // step-k time — ONE aggregation pass per funnel step, each a
    // shuffle on user_id only (never a per-event self-join, never
    // collect). Times are exact epoch seconds. Output: per-step user
    // counts + mean step-transition seconds over completed funnels.
    QueryDef(
      "q75_funnel",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .select(col("user_id"), col("event_type"), col("ts_sec"))
        val s1 = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("ts_sec"))).as("t1"))
          .filter(col("t1").isNotNull)
        // Persisted: s2 feeds both s3's lineage and the final join —
        // without it the scan→join→agg pipeline behind it re-executes
        // for the second reference (the multiply-referenced-derived-
        // corpus rule; harness clears the cache per query).
        val s2 = ev.join(s1, "user_id")
          .groupBy(col("user_id"), col("t1"))
          .agg(min(when(col("event_type") === "click" &&
            col("ts_sec") > col("t1"), col("ts_sec"))).as("t2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val s3 = ev.join(s2.filter(col("t2").isNotNull), "user_id")
          .groupBy(col("user_id"), col("t1"), col("t2"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("ts_sec") > col("t2"), col("ts_sec"))).as("t3"))
        s2.select(col("user_id"), col("t1"), col("t2"))
          .join(s3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .agg(
            count(lit(1)).as("n_view"),
            sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_view_click"),
            sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_full_funnel"),
            sum(when(col("t3").isNotNull, col("t2") - col("t1")))
              .as("sum_vc"),
            sum(when(col("t3").isNotNull, col("t3") - col("t2")))
              .as("sum_cb"))
          .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
            expr("sum_vc div n_full_funnel").as("mean_view_to_click_s"),
            expr("sum_cb div n_full_funnel").as("mean_click_to_buy_s"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
             |  FROM events),
             |s1 AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts_sec END) AS t1
             |  FROM ev GROUP BY user_id HAVING t1 IS NOT NULL),
             |s2 AS (SELECT e.user_id, s1.t1,
             |    min(CASE WHEN e.event_type = 'click' AND e.ts_sec > s1.t1
             |        THEN e.ts_sec END) AS t2
             |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
             |  GROUP BY e.user_id, s1.t1),
             |s3 AS (SELECT e.user_id, s2.t1, s2.t2,
             |    min(CASE WHEN e.event_type = 'purchase' AND e.ts_sec > s2.t2
             |        THEN e.ts_sec END) AS t3
             |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
             |  WHERE s2.t2 IS NOT NULL
             |  GROUP BY e.user_id, s2.t1, s2.t2)
             |SELECT count(*) AS n_view,
             |  CAST(sum(CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_view_click,
             |  CAST(sum(CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_full_funnel,
             |  CAST(sum(CASE WHEN s3.t3 IS NOT NULL THEN s2.t2 - s2.t1 END)
             |    AS BIGINT)
             |    // CAST(sum(CASE WHEN s3.t3 IS NOT NULL THEN 1 END) AS BIGINT)
             |    AS mean_view_to_click_s,
             |  CAST(sum(CASE WHEN s3.t3 IS NOT NULL THEN s3.t3 - s2.t2 END)
             |    AS BIGINT)
             |    // CAST(sum(CASE WHEN s3.t3 IS NOT NULL THEN 1 END) AS BIGINT)
             |    AS mean_click_to_buy_s
             |FROM s2 LEFT JOIN s3 ON s2.user_id = s3.user_id""".stripMargin)),

    // Cohort retention: users grouped by first-activity week, then
    // counted per (cohort, week-offset) — the product-analytics
    // retention triangle. Two aggregation passes (per-user first week,
    // then distinct user-week activity joined back), both shuffling on
    // user_id; weeks are exact integer epoch-week buckets.
    QueryDef(
      "q76_cohort_retention",
      (s, d) => {
        val wk = expr("ts_sec div 604800")
        val ev = eventsNorm(s, d)
          .select(col("user_id"), wk.as("week")).distinct()
        val cohorts = ev.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        ev.join(cohorts, "user_id")
          .withColumn("offset", col("week") - col("cohort_week"))
          .filter(col("offset") <= 4)
          .groupBy(col("cohort_week"), col("offset"))
          // plain count: ev is distinct on (user_id, week) and a
          // user's week is pinned to cohort_week+offset inside the
          // group, so each user contributes exactly one row —
          // count(DISTINCT) would add a whole extra aggregate phase
          // and exchange for the same value.
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_week"), col("offset"))
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 604800 AS BIGINT) AS week
             |  FROM events),
             |c AS (SELECT user_id, min(week) AS cohort_week
             |  FROM ev GROUP BY user_id)
             |SELECT c.cohort_week, e.week - c.cohort_week AS "offset",
             |  count(DISTINCT e.user_id) AS n_users
             |FROM ev e JOIN c ON e.user_id = c.user_id
             |WHERE e.week - c.cohort_week <= 4
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Pairwise co-occurrence (market-basket): parts bought together in
    // one order, counted corpus-wide. The pair join BLOCKS on the
    // order key — pairs only form within an order (bounded by order
    // size, ~7 items in TPC-H), so the output is O(orders · size²),
    // never an unblocked item × item square. Top pairs fully
    // tie-broken.
    QueryDef(
      "q77_cooccurrence",
      (s, d) => {
        // Same r14 rewrite as q114's edge build: collect each order's
        // item SET once and expand a<b pairs narrowly from the array —
        // no distinct exchange, no basket self-join; per-order pair
        // multiplicity is 1 either way, so n_orders is unchanged.
        lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
          .select(explode(flatten(transform(col("pks"), x =>
            transform(col("pks"), y =>
              struct(x.as("part_a"), y.as("part_b"))))))
            .as("e"))
          .select(col("e.part_a"), col("e.part_b"))
          .filter(col("part_a") < col("part_b"))
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
          .limit(20)
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok,
             |    l_partkey AS pk FROM lineitem)
             |SELECT x.pk AS part_a, y.pk AS part_b, count(*) AS n_orders
             |FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk
             |GROUP BY 1, 2
             |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin)),

    // Collect/nest (the inverse of q22's explode): each user's first
    // five events gathered into an ORDERED path string, then top paths
    // by frequency — clickstream path analysis. Ordering inside the
    // aggregate is pinned by collecting (ts, event_id, type) structs
    // and sort_array-ing the result (collect_list alone has no
    // deterministic order after a shuffle — the struct sort is what
    // makes the nest reproducible; DuckDB mirrors with
    // list(... ORDER BY ...)). event_id breaks ts ties.
    QueryDef(
      "q78_event_paths",
      (s, d) => {
        // Bound per-user state BEFORE the collect: a window top-5 keeps
        // at most 5 structs per user in the aggregation, where
        // collect-then-slice would buffer (and sort) a heavy user's
        // entire history in one task — the unbounded-key-state OOM.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val paths = eventsNorm(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            col("event_type"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("user_id"),
            struct(col("ts_sec"), col("event_id"), col("event_type")).as("e"))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(col("e"))).as("es"))
          .select(col("user_id"),
            array_join(
              transform(col("es"), e => e.getField("event_type")),
              ">").as("path"))
        paths.groupBy(col("path"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(15)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
             |  FROM events),
             |p AS (SELECT user_id,
             |    array_to_string(
             |      list(event_type ORDER BY ts_sec, event_id)[1:5], '>')
             |      AS path
             |  FROM ev GROUP BY user_id)
             |SELECT path, count(*) AS n_users
             |FROM p GROUP BY path
             |ORDER BY n_users DESC, path LIMIT 15""".stripMargin)),

    // Time-series resample: each user's purchase `value` series
    // re-gridded to regular 6-hour buckets over the user's own active
    // span, gaps forward-filled with the last observation. The grid is
    // generated per user with sequence+explode (no driver loop, no
    // cross join with a global calendar), observations attach by
    // equi-join on the bucket, and the fill is one running
    // last(ignoreNulls) window — the same carry-forward primitive as
    // the as-of join, now on a dense grid. Money in exact cents;
    // bucket of the LAST event per bucket wins (max_by event_id).
    QueryDef(
      "q81_resample_ffill",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .filter(col("event_type") === "purchase" && col("user_id") < 6)
          .select(col("user_id"), expr("ts_sec div 21600").as("bucket"),
            col("event_id"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .groupBy(col("user_id"), col("bucket"))
          .agg(max_by(col("cents"), col("event_id")).as("cents"))
        val span = ev.groupBy(col("user_id"))
          .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
        val grid = span.select(col("user_id"),
          explode(sequence(col("b0"), col("b1"))).as("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        grid.join(ev, Seq("user_id", "bucket"), "left")
          .withColumn("filled_cents", last(col("cents"), ignoreNulls = true).over(w))
          .withColumn("is_gap", col("cents").isNull)
          .select(col("user_id"), col("bucket"), col("filled_cents"),
            col("is_gap"))
          .orderBy(col("user_id"), col("bucket"))
      },
      Some("""WITH ev AS (SELECT user_id,
             |    CAST(epoch_ns(ts) // 1000000000 // 21600 AS BIGINT) AS bucket,
             |    max_by(CAST(floor(value * 100 + 0.5) AS BIGINT), event_id)
             |      AS cents
             |  FROM events
             |  WHERE event_type = 'purchase' AND user_id < 6
             |  GROUP BY 1, 2),
             |span AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
             |  FROM ev GROUP BY user_id),
             |grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
             |  FROM span)
             |SELECT g.user_id, g.bucket,
             |  last_value(e.cents IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.bucket
             |    ROWS UNBOUNDED PRECEDING) AS filled_cents,
             |  e.cents IS NULL AS is_gap
             |FROM grid g LEFT JOIN ev e
             |  ON g.user_id = e.user_id AND g.bucket = e.bucket
             |ORDER BY g.user_id, g.bucket""".stripMargin)),

    // RANGE-frame trailing window (the time-based frame the ROWS
    // frames in q17/q54 can't express): per user, spend count + sum
    // over the TRAILING HOUR of event time — the frame is defined by
    // the ORDER-BY VALUE (ts_sec within [cur-3600, cur]), so rows
    // with equal timestamps always share one frame and the result is
    // tie-order-independent by construction. Money in exact integer
    // cents. Partitioned by user: each user's window state lives on
    // one task; nothing global, scales with the partition count.
    QueryDef(
      "q95_range_frame_window",
      (s, d) => {
        eventsNorm(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_sec"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .withColumn("trail_n", count(lit(1)).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
              .rangeBetween(-3600, 0)))
          .withColumn("trail_cents", sum(col("cents")).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
              .rangeBetween(-3600, 0)))
          .select(col("event_id"), col("user_id"), col("ts_sec"),
            col("trail_n"), col("trail_cents"))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase')
             |SELECT event_id, user_id, ts_sec,
             |  count(*) OVER w AS trail_n,
             |  CAST(sum(cents) OVER w AS BIGINT) AS trail_cents
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts_sec, event_id""".stripMargin)),

    // Gaps & islands: find the missing ranges in a key sequence with
    // one lag() pass over the sorted keys — the classic sequence-
    // completeness audit (billing IDs, log offsets, kafka offsets).
    // The audited sequence is the urgent-order subset (the full
    // testdata keyspace is dense, which would make the check vacuous);
    // the filter pushes to the scan, THEN the survivors sort. The
    // global ORDER BY is range-partitioned by the sort exchange; the
    // lag() needs only one neighbor so the boundary row per partition
    // is the only cross-task traffic. Top-20 largest gaps, tie-broken.
    QueryDef(
      "q96_gaps_islands",
      (s, d) => {
        orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
          .withColumn("prev", lag(col("o_orderkey"), 1).over(
            Window.orderBy(col("o_orderkey"))))
          .filter(col("prev").isNotNull &&
            col("o_orderkey") - col("prev") > 1)
          .select((col("prev") + 1).as("gap_start"),
            (col("o_orderkey") - 1).as("gap_end"),
            (col("o_orderkey") - col("prev") - 1).as("gap_len"))
          .orderBy(col("gap_len").desc, col("gap_start"))
          .limit(20)
      },
      Some("""WITH l AS (SELECT o_orderkey,
             |    lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev
             |  FROM orders WHERE o_orderpriority = '1-URGENT')
             |SELECT prev + 1 AS gap_start, o_orderkey - 1 AS gap_end,
             |  o_orderkey - prev - 1 AS gap_len
             |FROM l WHERE prev IS NOT NULL AND o_orderkey - prev > 1
             |ORDER BY gap_len DESC, gap_start LIMIT 20""".stripMargin)),

    // Ratio-to-report (percent-of-total window): each nation's share
    // of global revenue — the unbounded empty-partition window frame,
    // the one window shape q16-q18/q54/q95 don't cover. The window
    // runs over the 25-row AGGREGATE, not the fact table: reduce
    // first, window the summary — at 100 TB the whole-table window
    // would funnel everything through one task; this form's window
    // input is |nations| rows. Integer-permille share, tie-broken.
    QueryDef(
      "q98_ratio_to_total",
      (s, d) => {
        val rev = customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("rev_cents"))
        rev.withColumn("total_cents",
            sum(col("rev_cents")).over(Window.partitionBy()))
          .select(col("c_nationkey"), col("rev_cents"),
            expr("rev_cents * 1000 div total_cents").as("share_permille"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH rev AS (SELECT c_nationkey,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS rev_cents
             |  FROM customer JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_nationkey)
             |SELECT c_nationkey, rev_cents,
             |  rev_cents * 1000 // CAST(sum(rev_cents) OVER () AS BIGINT)
             |    AS share_permille
             |FROM rev ORDER BY c_nationkey""".stripMargin)),

    // Inactivity audit — the BATCH twin of the streaming state-timeout
    // operator (graft.streaming.EventStreams.inactivityFlags, whose
    // event-time-timeout path EventStreamsSpec drives under real
    // micro-batches): users whose last event is more than 30 minutes
    // behind the frame's max timestamp, with their final state. One
    // groupBy plus a broadcast single-row frontier — never a window
    // over the fact table for a global max.
    QueryDef(
      "q115_inactive_users",
      (s, d) =>
        graft.streaming.EventStreams
          .inactiveUsersBatch(eventsNorm(s, d), quietSec = 1800L)
          .orderBy(col("user_id")),
      Some("""WITH per_user AS (SELECT user_id,
             |    max(CAST(epoch_ns(ts) // 1000000000 AS BIGINT))
             |      AS last_ts_sec,
             |    count(*) AS n_events
             |  FROM events GROUP BY user_id),
             |frontier AS (SELECT
             |    max(CAST(epoch_ns(ts) // 1000000000 AS BIGINT))
             |      AS frontier_sec
             |  FROM events)
             |SELECT user_id, last_ts_sec, n_events
             |FROM per_user CROSS JOIN frontier
             |WHERE last_ts_sec + 1800 < frontier_sec
             |ORDER BY user_id""".stripMargin)),

    // RFM customer segmentation — the mart-layer scoring query the
    // reference's serving SQL stops short of: quartile each customer
    // on Recency (days since last order), Frequency, and Monetary
    // (exact cents), then profile the 4x4x4 segments. The three ntile
    // windows are global sorts, but over the CUSTOMER AGGREGATE, never
    // the fact table (header note: the bounded-aggregate exception,
    // with the range-partitioned form as the domain-scale path); full
    // custkey tie-breaks make every quartile assignment cross-engine
    // deterministic. The frontier is a direct single-column max over
    // orders — deriving it from `per` would re-run the whole groupBy
    // shuffle just to extract one value (max of per-customer maxes =
    // the global max).
    QueryDef(
      "q116_rfm_segments",
      (s, d) => {
        val per = orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(max(expr("CAST(o_orderdate AS DATE)")).as("last_date"),
            count(lit(1)).as("n_orders"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("cents"))
        val frontier = orders(s, d)
          .agg(max(expr("CAST(o_orderdate AS DATE)")).as("frontier_date"))
        val wr = Window.orderBy(col("recency_days"), col("o_custkey"))
        val wf = Window.orderBy(col("n_orders").desc, col("o_custkey"))
        val wm = Window.orderBy(col("cents").desc, col("o_custkey"))
        per.crossJoin(broadcast(frontier))
          .withColumn("recency_days",
            datediff(col("frontier_date"), col("last_date")).cast("long"))
          .withColumn("r", ntile(4).over(wr))
          .withColumn("f", ntile(4).over(wf))
          .withColumn("m", ntile(4).over(wm))
          .groupBy(col("r"), col("f"), col("m"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("cents")).as("segment_cents"))
          .orderBy(col("r"), col("f"), col("m"))
      },
      Some("""WITH per AS (SELECT o_custkey,
             |    max(CAST(o_orderdate AS DATE)) AS last_date,
             |    count(*) AS n_orders,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM orders GROUP BY o_custkey),
             |frontier AS (SELECT max(last_date) AS frontier_date FROM per),
             |scored AS (SELECT p.*,
             |    date_diff('day', p.last_date, f.frontier_date)
             |      AS recency_days
             |  FROM per p CROSS JOIN frontier f),
             |tiled AS (SELECT o_custkey, cents,
             |    ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r,
             |    ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
             |    ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS m
             |  FROM scored)
             |SELECT r, f, m, count(*) AS n_customers,
             |  CAST(sum(cents) AS BIGINT) AS segment_cents
             |FROM tiled GROUP BY r, f, m ORDER BY r, f, m""".stripMargin)),

    // Time-decayed popularity — recency weighting in INTEGER-EXACT
    // exponential decay: an event aged w whole weeks contributes
    // 1e6 >> min(w, 19) micro-points (half-life = one week; the shift
    // clamp keeps the divisor in range and floors contributions past
    // ~5 months to 1-2 micro-points). Float exp() would drift between
    // engines; a power-of-2 decay divides exactly. Per-event weights
    // need the event rows joined to the frontier: one aggregate scan
    // for max-day plus one scoring scan with the single-row frontier
    // broadcast — cheaper than any unpartitioned window over the fact.
    QueryDef(
      "q117_decayed_popularity",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .select(col("event_type"), expr("ts_sec div 86400").as("day"))
        val frontier = ev.agg(max(col("day")).as("frontier_day"))
        ev.crossJoin(broadcast(frontier))
          .withColumn("w",
            expr("least((frontier_day - day) div 7, 19L)").cast("int"))
          .withColumn("pts", expr("1000000L div shiftleft(1L, w)"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("pts")).as("decayed_micro"))
          .orderBy(col("decayed_micro").desc, col("event_type"))
      },
      Some("""WITH ev AS (SELECT event_type,
             |    CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
             |  FROM events),
             |frontier AS (SELECT max(day) AS frontier_day FROM ev),
             |scored AS (SELECT event_type,
             |    1000000 // (1 << CAST(least((f.frontier_day - day) // 7, 19)
             |      AS INTEGER)) AS pts
             |  FROM ev CROSS JOIN frontier f)
             |SELECT event_type, count(*) AS n_events,
             |  CAST(sum(pts) AS BIGINT) AS decayed_micro
             |FROM scored GROUP BY event_type
             |ORDER BY decayed_micro DESC, event_type""".stripMargin)),

    // SLIDING (hopping) time windows — q24's tumbling bucket with
    // window ≠ slide: 2-hour windows every hour, so each event lands
    // in exactly window/slide = 2 overlapping windows (the smoothing
    // aggregation streaming dashboards run; identical semantics under
    // `readStream` — `window()` is the same operator in both modes).
    // Spark fans each row out to its window set BEFORE the hash agg
    // (narrow ×2 fanout, then one shuffle on the window start — never
    // a self-join of bucket aggregates); the oracle states the same
    // fanout with unnest of the two containing window starts.
    QueryDef(
      "q134_sliding_window",
      (s, d) =>
        eventsNorm(s, d)
          .groupBy(window(col("ts"), "2 hours", "1 hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("sum_value"))
          .select(col("window.start").cast("long").as("win_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("win_start"), col("event_type")),
      Some("""WITH fan AS (
             |  SELECT event_type, value, unnest([
             |      time_bucket(INTERVAL '1 hour', ts),
             |      time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'
             |    ]) AS ws
             |  FROM events)
             |SELECT CAST(epoch(ws) AS BIGINT) AS win_start, event_type,
             |  count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM fan GROUP BY 1, 2
             |ORDER BY win_start, event_type""".stripMargin)),

    // ROC AUC by rank-sum (Mann-Whitney U with tie correction) — the
    // model-eval aggregate a training pipeline runs over scored
    // examples, computed exactly without any sort of the raw table
    // into one task: scores quantize to integer cents, the per-
    // (group, score) aggregate collapses ties FIRST (the only fact-
    // table shuffle), and the rank arithmetic runs on the collapsed
    // tie groups — |distinct scores| rows, not |rows|. Tie handling
    // is the textbook average-rank: a tie block occupying ranks
    // r+1..r+t contributes 2·avg_rank = 2r+t+1 per member (×2 keeps
    // it integer). AUC = (S − n⁺(n⁺+1)/2) / (n⁺·n⁻) with S the
    // positive rank sum; everything stays in DECIMAL(38,0) until the
    // final ppm integer division, so the identity survives group
    // sizes far past the long envelope (the q112/q119 lesson —
    // widen, don't document). Label: order priority URGENT/HIGH;
    // score: order value in cents. AUC(ppm) answers "does price
    // rank-predict urgency" per status, exactly.
    QueryDef(
      "q142_auc_ranksum",
      (s, d) => {
        val scored = orders(s, d)
          .select(col("o_orderstatus").as("grp"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("cents"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("pos"))
        val ties = scored.groupBy(col("grp"), col("cents"))
          .agg(count(lit(1)).as("t"), sum(col("pos")).as("p"))
        val cumBefore = coalesce(
          sum(col("t")).over(Window.partitionBy(col("grp"))
            .orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        ties
          .withColumn("r0", cumBefore)
          .groupBy(col("grp"))
          .agg(sum((col("p") * (col("r0") * 2 + col("t") + 1))
            .cast("decimal(38,0)")).as("s2"),
            sum(col("p")).as("n_pos"),
            (sum(col("t")) - sum(col("p"))).as("n_neg"))
          .filter(col("n_pos") > 0 && col("n_neg") > 0)
          .withColumn("auc_ppm", expr(
            "CAST((CAST(s2 AS DECIMAL(38,0)) " +
              "- CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000 " +
              "div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
          .select(col("grp").as("o_orderstatus"), col("n_pos"),
            col("n_neg"), col("auc_ppm"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH scored AS (
             |  SELECT o_orderstatus AS grp,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |         THEN 1 ELSE 0 END AS pos
             |  FROM orders),
             |ties AS (
             |  SELECT grp, cents, count(*) AS t, sum(pos) AS p
             |  FROM scored GROUP BY grp, cents),
             |ranked AS (
             |  SELECT grp, t, p,
             |    coalesce(sum(t) OVER (PARTITION BY grp ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS r0
             |  FROM ties),
             |agg AS (
             |  SELECT grp, sum(p * (r0 * 2 + t + 1)) AS s2,
             |    sum(p) AS n_pos, sum(t) - sum(p) AS n_neg
             |  FROM ranked GROUP BY grp)
             |SELECT grp AS o_orderstatus,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_neg AS BIGINT) AS n_neg,
             |  CAST((s2 - n_pos * (n_pos + 1)) * 1000000
             |    // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
             |FROM agg WHERE n_pos > 0 AND n_neg > 0
             |ORDER BY o_orderstatus""".stripMargin)),

    // Robust outlier detection by MEDIAN / MAD (the z-score family's
    // q90 uses mean/stddev, which outliers themselves corrupt; the
    // median absolute deviation is the robust estimator data-quality
    // monitors actually deploy). Exact and engine-portable: values
    // quantize to integer micros; the k-th-smallest order statistics
    // come from a row_number window per event_type (never a global
    // sort); ×2/×4 scaling keeps the even-count "average of the two
    // middle elements" in integers — med2 = x⌈n/2⌉ + x⌊n/2⌋₊₁ is
    // twice the median, mad4 twice the median of the doubled
    // deviations |2v − med2|, so the 3-sigma-equivalent outlier rule
    // |v − med| > 3·MAD becomes the integer test 2·dev2 > 3·mad4.
    // Two window passes + two broadcast joins of a 5-row medians
    // table; the fact table shuffles once per pass on event_type
    // (salt via SkewOps if one type dominates at scale).
    QueryDef(
      "q145_mad_outliers",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"),
            expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)")
              .as("v"))
        val byV = Window.partitionBy(col("event_type"))
          .orderBy(col("v"), col("event_id"))
        val ranked = ev
          .withColumn("rn", row_number().over(byV))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
        val med = ranked
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("n div 2 + 1"))
          .groupBy(col("event_type"))
          .agg((sum(col("v")) * 2 / count(lit(1))).cast("long").as("med2"),
            first(col("n")).as("n"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("dev2", abs(col("v") * 2 - col("med2")))
        val byDev = Window.partitionBy(col("event_type"))
          .orderBy(col("dev2"), col("event_id"))
        val mad = dev
          .withColumn("rn", row_number().over(byDev))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("n div 2 + 1"))
          .groupBy(col("event_type"))
          .agg((sum(col("dev2")) * 2 / count(lit(1))).cast("long")
            .as("mad4"))
        dev.join(broadcast(mad), "event_type")
          .groupBy(col("event_type"))
          .agg(first(col("n")).as("n_events"),
            first(col("med2")).as("med2_micro"),
            first(col("mad4")).as("mad4_micro"),
            sum(when(col("dev2") * 2 > col("mad4") * 3, 1L)
              .otherwise(0L)).as("n_outliers"),
            max(col("dev2")).as("max_dev2_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, event_id,
             |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
             |  FROM events WHERE value IS NOT NULL),
             |ranked AS (
             |  SELECT event_type, v,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY v, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM ev),
             |med AS (
             |  SELECT event_type,
             |    CAST(sum(v) * 2 // count(*) AS BIGINT) AS med2,
             |    min(n) AS n
             |  FROM ranked
             |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |  GROUP BY event_type),
             |dev AS (
             |  SELECT ev.event_type, ev.event_id,
             |    abs(ev.v * 2 - med.med2) AS dev2, med.med2, med.n
             |  FROM ev JOIN med ON ev.event_type = med.event_type),
             |dranked AS (
             |  SELECT event_type, dev2,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY dev2, event_id) AS rn, n
             |  FROM dev),
             |mad AS (
             |  SELECT event_type,
             |    CAST(sum(dev2) * 2 // count(*) AS BIGINT) AS mad4
             |  FROM dranked
             |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |  GROUP BY event_type)
             |SELECT dev.event_type, min(dev.n) AS n_events,
             |  min(dev.med2) AS med2_micro,
             |  min(mad.mad4) AS mad4_micro,
             |  CAST(sum(CASE WHEN dev.dev2 * 2 > mad.mad4 * 3
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |  max(dev.dev2) AS max_dev2_micro
             |FROM dev JOIN mad ON dev.event_type = mad.event_type
             |GROUP BY dev.event_type
             |ORDER BY dev.event_type""".stripMargin)),

    // TWO-PASS EXACT QUANTILE — the algorithm that replaces a global
    // sort (or a full-table row_number window) when an EXACT p50/p90/
    // p99 is required at 100 TB. Pass 1 aggregates a coarse fixed-
    // width histogram (cents div 65536 → ~160 bins here; O(bins) rows
    // regardless of table size, partials merge map-side) and walks its
    // cumsum to locate, for each target rank k = ⌈n·p/100⌉, the one
    // bin that contains it. Pass 2 ranks ONLY the rows of the selected
    // bins (a ~1/bins fraction of the table, partitioned per bin — no
    // global window) and picks rank k − cum_before inside the bin.
    // Ties on equal cents make row_number assignment arbitrary but the
    // selected VALUE is still the well-defined k-th smallest. The bin
    // cumsum window is unpartitioned over the ≤161-row aggregate —
    // the documented bounded-aggregate exception, never the fact
    // table. Percentile targets ride a 3-row broadcast; the rank-
    // locating join is non-equi over 3 × 161 rows (broadcast nested
    // loop, bounded both sides).
    QueryDef(
      "q150_twopass_quantile",
      (s, d) => {
        val li = lineitem(s, d)
          .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
          .withColumn("bin", expr("cents div 65536"))
        val wBin = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // persisted so pass 1 runs ONCE: n, the targets, and the rank-
        // locating join all derive from these ≤161 rows — without the
        // persist each consumer re-scans the fact table and "two-pass"
        // silently becomes five-pass.
        val binCum = li.groupBy(col("bin"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(wBin))
          .withColumn("cum_before", col("cum") - col("cnt"))
          .persist()
        val total = binCum.agg(sum(col("cnt")).as("n"))
        val targets = s.range(1)
          .select(explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
          .crossJoin(broadcast(total))
          .select(col("p"), expr("(n * p + 99) div 100").as("k"))
        val sel = broadcast(targets).join(binCum,
            col("cum_before") < col("k") && col("k") <= col("cum"))
          .select(col("p"), col("k"), col("bin"), col("cum_before"))
        val ranked = li
          .join(broadcast(sel.select(col("bin")).distinct()), Seq("bin"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("bin")).orderBy(col("cents"))))
        ranked.join(broadcast(sel), Seq("bin"))
          .filter(col("rn") === col("k") - col("cum_before"))
          .select(col("p"), col("k").as("k_rank"), col("cents").as("q_cents"))
          .orderBy(col("p"))
      },
      Some("""WITH li AS (
             |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |      AS cents,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 65536
             |      AS bin
             |  FROM lineitem),
             |n AS (SELECT count(*) AS n FROM li),
             |t AS (SELECT CAST(p AS BIGINT) AS p, (n.n * p + 99) // 100 AS k
             |  FROM (SELECT unnest([50, 90, 99]) AS p), n),
             |bc AS (SELECT bin, count(*) AS cnt FROM li GROUP BY bin),
             |cum AS (SELECT bin, cnt,
             |    sum(cnt) OVER (ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM bc),
             |sel AS (SELECT t.p, t.k, c.bin, c.cum - c.cnt AS cum_before
             |  FROM t JOIN cum c ON c.cum - c.cnt < t.k AND t.k <= c.cum),
             |ranked AS (SELECT li.bin, li.cents,
             |    row_number() OVER (PARTITION BY li.bin ORDER BY li.cents)
             |      AS rn
             |  FROM li JOIN (SELECT DISTINCT bin FROM sel) s
             |    ON li.bin = s.bin)
             |SELECT sel.p, sel.k AS k_rank, r.cents AS q_cents
             |FROM sel JOIN ranked r
             |  ON sel.bin = r.bin AND r.rn = sel.k - sel.cum_before
             |ORDER BY sel.p""".stripMargin)),

    // EWMA ANOMALY DETECTION — the monitoring primitive over a metric
    // series: each day's event count against an exponentially-weighted
    // moving average of the previous 8 observed days. α = 1/2 because
    // halving has an exact integer form: weight 2^(8−i) for the i-th
    // most recent prior day, so ewma = num/den with num = Σ cᵢ·2^(8−i)
    // and den = Σ 2^(8−i) over the days actually present (the grid has
    // gaps only at the series head; den normalizes partial windows
    // exactly). The 3× alert rule c > 3·ewma becomes the integer test
    // c·den > 3·num — no float division anywhere; ratio_ppm is emitted
    // via one final integer div. The fact table aggregates once to a
    // (type, day) grid (≤ types × days rows); the depth-8 lag window
    // runs over that bounded aggregate partitioned by type. Overflow
    // envelope: c·den·10⁶ needs c < 3.6e10/day/type — generous at any
    // realistic grain (widen to DECIMAL(38,0) past that).
    QueryDef(
      "q152_ewma_anomaly",
      (s, d) => {
        val daily = eventsNorm(s, d)
          .groupBy(col("event_type"),
            expr("ts_sec div 86400").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val lagged = (1 to 8).foldLeft(daily) { (df, i) =>
          df.withColumn(s"l$i", lag(col("c"), i).over(w))
        }
        val num = (1 to 8).map(i =>
          coalesce(col(s"l$i"), lit(0L)) * lit(1L << (8 - i)))
          .reduce(_ + _)
        val den = (1 to 8).map(i =>
          when(col(s"l$i").isNotNull, lit(1L << (8 - i))).otherwise(lit(0L)))
          .reduce(_ + _)
        lagged
          .withColumn("ewma_num", num)
          .withColumn("ewma_den", den)
          .filter(col("ewma_den") > 0)
          .select(col("event_type"), col("day"), col("c"),
            col("ewma_num"), col("ewma_den"),
            expr("c * ewma_den * 1000000 div ewma_num").as("ratio_ppm"),
            (col("c") * col("ewma_den") > col("ewma_num") * 3)
              .as("is_anomaly"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |lagged AS (
             |  SELECT event_type, day, c,
             |    lag(c, 1) OVER w AS l1, lag(c, 2) OVER w AS l2,
             |    lag(c, 3) OVER w AS l3, lag(c, 4) OVER w AS l4,
             |    lag(c, 5) OVER w AS l5, lag(c, 6) OVER w AS l6,
             |    lag(c, 7) OVER w AS l7, lag(c, 8) OVER w AS l8
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
             |scored AS (
             |  SELECT event_type, day, c,
             |    coalesce(l1, 0)*128 + coalesce(l2, 0)*64
             |      + coalesce(l3, 0)*32 + coalesce(l4, 0)*16
             |      + coalesce(l5, 0)*8 + coalesce(l6, 0)*4
             |      + coalesce(l7, 0)*2 + coalesce(l8, 0) AS ewma_num,
             |    CASE WHEN l1 IS NULL THEN 0 ELSE 128 END
             |      + CASE WHEN l2 IS NULL THEN 0 ELSE 64 END
             |      + CASE WHEN l3 IS NULL THEN 0 ELSE 32 END
             |      + CASE WHEN l4 IS NULL THEN 0 ELSE 16 END
             |      + CASE WHEN l5 IS NULL THEN 0 ELSE 8 END
             |      + CASE WHEN l6 IS NULL THEN 0 ELSE 4 END
             |      + CASE WHEN l7 IS NULL THEN 0 ELSE 2 END
             |      + CASE WHEN l8 IS NULL THEN 0 ELSE 1 END AS ewma_den
             |  FROM lagged)
             |SELECT event_type, day, c,
             |  CAST(ewma_num AS BIGINT) AS ewma_num,
             |  CAST(ewma_den AS BIGINT) AS ewma_den,
             |  CAST(c * ewma_den * 1000000 // ewma_num AS BIGINT)
             |    AS ratio_ppm,
             |  c * ewma_den > ewma_num * 3 AS is_anomaly
             |FROM scored WHERE ewma_den > 0
             |ORDER BY event_type, day""".stripMargin)),

    // LAST-TOUCH ATTRIBUTION — each purchase credited to the user's
    // most recent PRIOR non-purchase event within a 7-day lookback
    // (the as-of-join semantics of marketing attribution, expressed
    // as one ignore-nulls window carry instead of a join: the running
    // "last touch seen" propagates down each user's ordered event
    // stream, so the fact table shuffles ONCE on user_id and no
    // purchases×touches pairing ever materializes). Purchases whose
    // carry is missing or older than 7 days land in the '(none)'
    // bucket, so Σ n_purchases over the result is exactly the
    // purchase count — the self-auditing form. Revenue quantizes to
    // integer micros before summing (engine-portable; no float-sum
    // order sensitivity). Window ties break on (ts_ns, event_id) —
    // total order, deterministic carry.
    QueryDef(
      "q153_last_touch_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carried = eventsNorm(s, d)
          .withColumn("touch_type",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .withColumn("touch_sec",
            last(when(col("event_type") =!= "purchase", col("ts_sec")),
              ignoreNulls = true).over(w))
        carried
          .filter(col("event_type") === "purchase")
          .withColumn("attr",
            when(col("touch_sec").isNotNull &&
              col("ts_sec") - col("touch_sec") <= 604800L,
              col("touch_type")).otherwise(lit("(none)")))
          .groupBy(col("attr"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)"))
              .as("revenue_micro"))
          .orderBy(col("attr"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type, value,
             |    epoch_ns(ts) AS ts_ns,
             |    epoch_ns(ts) // 1000000000 AS ts_sec
             |  FROM events),
             |carried AS (
             |  SELECT event_type, value, ts_sec,
             |    last_value(CASE WHEN event_type <> 'purchase'
             |        THEN event_type END IGNORE NULLS) OVER w AS touch_type,
             |    last_value(CASE WHEN event_type <> 'purchase'
             |        THEN ts_sec END IGNORE NULLS) OVER w AS touch_sec
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT
             |  CASE WHEN touch_sec IS NOT NULL
             |      AND ts_sec - touch_sec <= 604800
             |    THEN touch_type ELSE '(none)' END AS attr,
             |  count(*) AS n_purchases,
             |  CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
             |    AS BIGINT) AS revenue_micro
             |FROM carried WHERE event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DISTRIBUTION DRIFT — train/serve skew monitoring: the total-
    // variation distance between each event_type's `value`
    // distribution in the first 15 days vs the rest, over a 10-bucket
    // per-type histogram. TV = ½·Σ|p_i − q_i| computed CROSS-
    // MULTIPLIED — Σ|c1ᵢ·N2 − c2ᵢ·N1| · 10⁶ div (2·N1·N2) — so no
    // per-bucket division ever happens and the only rounding is the
    // final ppm div; the product chain widens to DECIMAL(38,0) up
    // front (the q142 rule: widen, don't document the overflow).
    // Bucket bounds derive per type as (hi − lo) div 10 + 1-wide
    // fixed intervals — exact integers, and the div-width form
    // guarantees bucket ∈ [0,9] with no boundary epsilon. A bucket
    // empty on one side still contributes |0 − c| because buckets are
    // keyed by (type, bucket) with both halves summed in ONE pass —
    // there is no outer join to forget. Everything is aggregates over
    // aggregates: one fact shuffle on (type, bucket), then 5-row
    // broadcast joins; the day-0 anchor is a 1-row broadcast.
    QueryDef(
      "q158_tv_drift",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("v"),
            expr("ts_sec div 86400").as("day"))
        // ONE stats pass carries both the per-type bucket bounds and
        // (via a second tiny agg over its 5 rows) the global day-0
        // anchor — the fact table is scanned exactly twice: stats,
        // then counts. cnt persists because tot and the final join
        // both consume it.
        val stats = ev.groupBy(col("event_type"))
          .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
            min(col("day")).as("dmin"))
          .withColumn("width", expr("(hi - lo) div 10 + 1"))
          .persist()
        val minDay = stats.agg(min(col("dmin")).as("d0"))
        val cnt = ev.crossJoin(broadcast(minDay))
          .withColumn("half",
            when(col("day") < col("d0") + 15, 1).otherwise(2))
          .join(broadcast(stats), Seq("event_type"))
          .withColumn("bucket", expr("(v - lo) div width"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"),
            sum(when(col("half") === 2, 1L).otherwise(0L)).as("c2"))
          .persist()
        val tot = cnt.groupBy(col("event_type"))
          .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        cnt.join(broadcast(tot), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(min(col("n1")).as("n1"), min(col("n2")).as("n2"),
            sum(abs(expr("CAST(c1 AS DECIMAL(38,0)) * n2") -
              expr("CAST(c2 AS DECIMAL(38,0)) * n1"))).as("s"),
            count(lit(1)).as("n_buckets_hit"))
          .select(col("event_type"), col("n1"), col("n2"),
            col("n_buckets_hit"),
            expr("CAST((s * 1000000) div " +
              "(2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
              .as("tv_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day
             |  FROM events WHERE value IS NOT NULL),
             |d0 AS (SELECT min(day) AS d0 FROM ev),
             |bounds AS (
             |  SELECT event_type, min(v) AS lo, max(v) AS hi,
             |    (max(v) - min(v)) // 10 + 1 AS width
             |  FROM ev GROUP BY 1),
             |cnt AS (
             |  SELECT ev.event_type, (ev.v - b.lo) // b.width AS bucket,
             |    CAST(sum(CASE WHEN ev.day < d0.d0 + 15 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN ev.day < d0.d0 + 15 THEN 0 ELSE 1 END)
             |      AS BIGINT) AS c2
             |  FROM ev, d0 JOIN bounds b ON ev.event_type = b.event_type
             |  GROUP BY 1, 2),
             |tot AS (
             |  SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2
             |  FROM cnt GROUP BY 1)
             |SELECT cnt.event_type, min(tot.n1) AS n1, min(tot.n2) AS n2,
             |  count(*) AS n_buckets_hit,
             |  CAST(sum(abs(c1 * tot.n2 - c2 * tot.n1)) * 1000000
             |    // (2 * min(tot.n1) * min(tot.n2)) AS BIGINT) AS tv_ppm
             |FROM cnt JOIN tot ON cnt.event_type = tot.event_type
             |GROUP BY cnt.event_type
             |ORDER BY cnt.event_type""".stripMargin)),

    // GINI CONCENTRATION — "is this source dominated by a few huge
    // documents?" — the corpus-curation inequality statistic, exact
    // via the sorted-form identity G = Σ(2i − n − 1)·xᵢ / (n·Σx)
    // (i = ascending rank): one per-source row_number window, no
    // pairwise |xᵢ−xⱼ| expansion (the definition is O(n²); the
    // sorted form is one pass). All products widen to DECIMAL(38,0)
    // before summing (rank·chars already brushes int64 at corpus
    // scale); the only rounding is the final ppm div. G≈0 → uniform
    // doc sizes; G→1 → token mass concentrated in few docs — the
    // signal that caps/length-filters are needed before training.
    QueryDef(
      "q159_gini_concentration",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(expr("CAST(2 * CAST(rn AS BIGINT) AS DECIMAL(38,0)) " +
              "* n_chars")).as("s2rn"))
          .select(col("source"), col("n_docs"), col("total_chars"),
            expr("CAST(((s2rn - CAST(n_docs + 1 AS DECIMAL(38,0)) " +
              "* total_chars) * 1000000) div " +
              "(CAST(n_docs AS DECIMAL(38,0)) * total_chars) AS BIGINT)")
              .as("gini_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH r AS (
             |  SELECT source, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS rn
             |  FROM documents),
             |a AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |    sum(2 * rn * n_chars) AS s2rn
             |  FROM r GROUP BY source)
             |SELECT source, n_docs, total_chars,
             |  CAST((s2rn - (n_docs + 1) * total_chars) * 1000000
             |    // (n_docs * total_chars) AS BIGINT) AS gini_ppm
             |FROM a ORDER BY source""".stripMargin)),

    // TIME-TO-CONVERT — the latency half of funnel analytics (q75
    // counts who converts; this measures HOW LONG signup→first
    // purchase takes): per-user first-signup / first-subsequent-
    // purchase timestamps, exact p50/p90 of the latency in seconds
    // via rank-at-k order statistics (k = ⌈n·p/100⌉, the q150 rank
    // rule) over the CONVERTED-USER aggregate — one row per user,
    // bounded relative to the event stream; the global rank window
    // is the documented bounded-aggregate exception (at ~1e9
    // converted users swap in q150's histogram-locate pass — the
    // rank-value semantics are identical). Purchases join signups
    // once on user_id (one shuffle), no event×event pairing.
    QueryDef(
      "q162_time_to_convert",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .select(col("user_id"), col("event_type"), col("ts_sec"))
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t0"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(su, Seq("user_id"))
          .filter(col("ts_sec") >= col("t0"))
          .groupBy(col("user_id"), col("t0"))
          .agg(min(col("ts_sec")).as("tp"))
          .select(col("user_id"), (col("tp") - col("t0")).as("lat"))
        val ranked = conv
          .withColumn("rn", row_number().over(
            Window.orderBy(col("lat"), col("user_id"))).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(lit(1))))
        val pcts = ranked
          .filter(col("rn") === expr("(n * 50 + 99) div 100") ||
            col("rn") === expr("(n * 90 + 99) div 100"))
          .agg(min(col("lat")).as("p50_sec"), max(col("lat")).as("p90_sec"),
            min(col("n")).as("n_converted"))
        su.agg(count(lit(1)).as("n_signups"))
          .crossJoin(broadcast(pcts))
          .select(col("n_signups"), col("n_converted"),
            expr("n_converted * 1000 div n_signups").as("conv_permille"),
            col("p50_sec"), col("p90_sec"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type,
             |    epoch_ns(ts) // 1000000000 AS ts_sec
             |  FROM events),
             |su AS (
             |  SELECT user_id, min(ts_sec) AS t0
             |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
             |conv AS (
             |  SELECT ev.user_id, min(ev.ts_sec) - min(su.t0) AS lat
             |  FROM ev JOIN su ON ev.user_id = su.user_id
             |  WHERE ev.event_type = 'purchase' AND ev.ts_sec >= su.t0
             |  GROUP BY ev.user_id),
             |r AS (
             |  SELECT lat,
             |    row_number() OVER (ORDER BY lat, user_id) AS rn,
             |    count(*) OVER () AS n
             |  FROM conv),
             |p AS (
             |  SELECT min(lat) AS p50_sec, max(lat) AS p90_sec,
             |    min(n) AS n_converted
             |  FROM r
             |  WHERE rn = (n * 50 + 99) // 100
             |     OR rn = (n * 90 + 99) // 100)
             |SELECT (SELECT count(*) FROM su) AS n_signups, n_converted,
             |  CAST(n_converted * 1000
             |    // (SELECT count(*) FROM su) AS BIGINT) AS conv_permille,
             |  p50_sec, p90_sec
             |FROM p""".stripMargin)),

    // SEASONAL-BASELINE ANOMALY — q152's EWMA treats every prior day
    // alike, so a weekly-periodic metric (weekend dips) alarms every
    // Monday; the deployed fix is a day-of-week baseline: each day's
    // count vs the MEDIAN of its own weekday's history. dow = epoch-day
    // mod 7 (pure integer periodicity — no calendar libm); the median
    // is the q145 ×2 order-statistic trick (med2 = sum of the two
    // middle ranks = twice the median, exact for even counts), so the
    // 1.5× alert rule multiplies through: 2·c > 3·med2/2 ⇔
    // 4·c > 3·med2 — all integers. Both the grid and the per-(type,
    // dow) median windows are bounded aggregates, never the fact
    // table; the ratio column is the only division, one final div.
    QueryDef(
      "q164_seasonal_baseline",
      (s, d) => {
        val daily = eventsNorm(s, d)
          .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("dow", expr("day % 7"))
        val byDow = Window.partitionBy(col("event_type"), col("dow"))
          .orderBy(col("c"), col("day"))
        val med = daily
          .withColumn("rn", row_number().over(byDow))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"), col("dow"))))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("n div 2 + 1"))
          .groupBy(col("event_type"), col("dow"))
          .agg((sum(col("c")) * 2 / count(lit(1))).cast("long").as("med2"))
        daily.join(broadcast(med), Seq("event_type", "dow"))
          .select(col("event_type"), col("day"), col("dow"), col("c"),
            col("med2"),
            expr("c * 2 * 1000000 div med2").as("ratio_ppm"),
            (col("c") * 4 > col("med2") * 3).as("is_anomaly"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT event_type, day, c, day % 7 AS dow FROM daily),
             |r AS (
             |  SELECT event_type, dow, c, day,
             |    row_number() OVER (PARTITION BY event_type, dow
             |      ORDER BY c, day) AS rn,
             |    count(*) OVER (PARTITION BY event_type, dow) AS n
             |  FROM g),
             |med AS (
             |  SELECT event_type, dow,
             |    CAST(sum(c) * 2 // count(*) AS BIGINT) AS med2
             |  FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |  GROUP BY event_type, dow)
             |SELECT g.event_type, g.day, g.dow, g.c, med.med2,
             |  CAST(g.c * 2 * 1000000 // med.med2 AS BIGINT) AS ratio_ppm,
             |  g.c * 4 > med.med2 * 3 AS is_anomaly
             |FROM g JOIN med ON g.event_type = med.event_type
             |  AND g.dow = med.dow
             |ORDER BY g.event_type, g.day""".stripMargin)),

    // LATENCY SLO BANDS — the observability dashboard primitive: per
    // (event_type, day), exact p50/p95 of `value` via rank-at-k order
    // statistics (k = ⌈n·p/100⌉) inside each daily partition. Unlike
    // q150's global quantile this window IS fact-sized but partitioned
    // on the natural reporting grain (type × day) — thousands of
    // independent partitions, each bounded by a day's traffic, which
    // is exactly how SLO jobs shard at scale (a skew-heavy type/day
    // would salt into sub-day slices). Values quantize to micros; both
    // target ranks select in ONE window pass (two filters over the
    // same row_number), and the only rows leaving the partition are
    // the ≤2 selected order statistics per cell.
    QueryDef(
      "q166_latency_slo",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), expr("ts_sec div 86400").as("day"),
            col("event_id"),
            expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("v"))
        val w = Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("v"), col("event_id"))
        val ranked = ev
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"), col("day"))))
        ranked
          .filter(col("rn") === expr("(n * 50 + 99) div 100") ||
            col("rn") === expr("(n * 95 + 99) div 100"))
          .groupBy(col("event_type"), col("day"))
          .agg(min(col("n")).as("n_events"),
            min(col("v")).as("p50_micro"), max(col("v")).as("p95_micro"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
             |    event_id,
             |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
             |  FROM events WHERE value IS NOT NULL),
             |r AS (
             |  SELECT event_type, day, v,
             |    row_number() OVER (PARTITION BY event_type, day
             |      ORDER BY v, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type, day) AS n
             |  FROM ev)
             |SELECT event_type, day, min(n) AS n_events,
             |  min(v) AS p50_micro, max(v) AS p95_micro
             |FROM r
             |WHERE rn = (n * 50 + 99) // 100 OR rn = (n * 95 + 99) // 100
             |GROUP BY event_type, day
             |ORDER BY event_type, day""".stripMargin)),

    // SESSION TRANSITION MATRIX — first-order Markov behavior model
    // (q78 mines whole top paths; this is the normalized edge model a
    // recommender or anomaly scorer consumes): within-user transitions
    // between consecutive events at most 30 min apart (the session
    // rule), counted per (from, to) pair and row-normalized to ppm by
    // integer div. One shuffle on user_id for the lead() window; the
    // matrix itself is |types|² — broadcast-sized at any scale; row
    // totals come from a second window over that bounded matrix, not
    // the fact table. Σ p_ppm per row ≤ 10⁶ with the deficit < |row|
    // (integer floors) — the self-auditing property of div-normalized
    // distributions.
    QueryDef(
      "q168_transition_matrix",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        val trans = eventsNorm(s, d)
          .select(col("user_id"), col("event_id"), col("ts_ns"),
            col("ts_sec"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .withColumn("to_sec", lead(col("ts_sec"), 1).over(w))
          .filter(col("to_type").isNotNull &&
            col("to_sec") - col("ts_sec") <= 1800L)
          .groupBy(col("event_type").as("from_type"),
            col("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = Window.partitionBy(col("from_type"))
        trans
          .withColumn("row_total", sum(col("n")).over(tot))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 1000000 div row_total").as("p_ppm"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_ns(ts) AS ts_ns,
             |    epoch_ns(ts) // 1000000000 AS ts_sec
             |  FROM events),
             |t AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type, 1) OVER w AS to_type,
             |    lead(ts_sec, 1) OVER w - ts_sec AS gap
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
             |m AS (
             |  SELECT from_type, to_type, count(*) AS n
             |  FROM t WHERE to_type IS NOT NULL AND gap <= 1800
             |  GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type)
             |    AS BIGINT) AS p_ppm
             |FROM m ORDER BY from_type, to_type""".stripMargin)),

    // LORENZ CURVE DECILES — q159's Gini collapses inequality to one
    // number; the curve says WHERE the mass sits: per source, docs
    // ascending by size, the cumulative share of chars held by each
    // population decile (decile = ⌈rn·10/n⌉ — every decile ±1 row by
    // construction). share_ppm strictly convex toward 10⁶ ⇔
    // concentration; a uniform source reads ~100k·d. Cum-chars comes
    // from ONE running-sum window (same per-source partition as the
    // rank), then only the ≤10 decile-boundary rows aggregate out —
    // O(sources·10) leaves the shuffle.
    QueryDef(
      "q170_lorenz_deciles",
      (s, d) => {
        val bySrc = Window.partitionBy(col("source"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(bySrc))
          .withColumn("cum", sum(col("n_chars")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum(col("n_chars")).over(bySrc))
          .withColumn("decile", expr("(rn * 10 + n - 1) div n"))
          .filter(col("rn") === expr("(decile * n) div 10"))
          .select(col("source"), col("decile"), col("rn").as("n_docs_cum"),
            col("cum").as("chars_cum"),
            // cum is a corpus-scale char total (~1e14 at 100 TB):
            // ×10⁶ exceeds int64 — widen first (the q142 rule).
            expr("CAST(CAST(cum AS DECIMAL(38,0)) * 1000000 div tot " +
              "AS BIGINT)").as("share_ppm"))
          .orderBy(col("source"), col("decile"))
      },
      Some("""WITH r AS (
             |  SELECT source, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS rn,
             |    count(*) OVER (PARTITION BY source) AS n,
             |    sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(n_chars) OVER (PARTITION BY source) AS tot
             |  FROM documents),
             |d AS (SELECT source, rn, n, cum, tot,
             |    (rn * 10 + n - 1) // n AS decile
             |  FROM r)
             |SELECT source, decile, rn AS n_docs_cum,
             |  CAST(cum AS BIGINT) AS chars_cum,
             |  CAST(cum * 1000000 // tot AS BIGINT) AS share_ppm
             |FROM d WHERE rn = (decile * n) // 10
             |ORDER BY source, decile""".stripMargin)),

    // BOILERPLATE DETECTION — template text shared across a source's
    // documents (nav headers, license stubs) is the C4-class cleaning
    // target: here, each doc's leading 4-token prefix, counted per
    // (source, prefix); a prefix covering >10% of a source is flagged.
    // The prefix is a FIXED-width key (4 tokens) so the shuffle key is
    // bounded — never whole documents (the q27 lesson applied to
    // near-boilerplate); one aggregation pass + a per-source top-1
    // window over the bounded (source, prefix) counts. Emits the top
    // prefix per source with its share and flag.
    QueryDef(
      "q171_boilerplate",
      (s, d) => {
        val pfx = concat_ws(" ",
          slice(graft.ops.TextOps.tokens(col("text")), 1, 4))
        val counts = documents(s, d)
          .select(col("source"), pfx.as("prefix"))
          .groupBy(col("source"), col("prefix"))
          .agg(count(lit(1)).as("n_docs"))
        val bySrc = Window.partitionBy(col("source"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_docs").desc, col("prefix"))
        counts
          .withColumn("src_total", sum(col("n_docs")).over(bySrc))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("source"), col("prefix"), col("n_docs"),
            col("src_total"),
            expr("n_docs * 1000000 div src_total").as("share_ppm"),
            (col("n_docs") * 10 > col("src_total")).as("is_boilerplate"))
          .orderBy(col("source"))
      },
      Some("""WITH p AS (
             |  SELECT source,
             |    array_to_string(string_split(text, ' ')[1:4], ' ')
             |      AS prefix
             |  FROM documents),
             |c AS (
             |  SELECT source, prefix, count(*) AS n_docs
             |  FROM p GROUP BY 1, 2),
             |r AS (
             |  SELECT source, prefix, n_docs,
             |    sum(n_docs) OVER (PARTITION BY source) AS src_total,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_docs DESC, prefix) AS rk
             |  FROM c)
             |SELECT source, prefix, n_docs,
             |  CAST(src_total AS BIGINT) AS src_total,
             |  CAST(n_docs * 1000000 // src_total AS BIGINT) AS share_ppm,
             |  n_docs * 10 > src_total AS is_boilerplate
             |FROM r WHERE rk = 1 ORDER BY source""".stripMargin)),

    // WEIGHTED MEDIAN — the robust center when rows carry unequal
    // mass (price per unit weighted by quantity; q145's unweighted
    // median treats a 1-unit and a 50-unit line alike). Lower
    // weighted median: sort by value, take the first row whose
    // cumulative weight reaches half the total — the crossing row is
    // unique by 2·cum ≥ W ∧ 2·(cum − w) < W, so no second pass and
    // no averaging rule to disagree on. Weights stay integral
    // (quantity floors to long); the per-group running sum is one
    // window. Three groups here; at a skewed 100 TB grain the same
    // crossing rule rides q150's histogram pass (locate the bin
    // where cum crosses W/2, rank only that bin).
    QueryDef(
      "q173_weighted_median",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_returnflag"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
              .as("cents"),
            expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qty"),
            col("l_orderkey"), col("l_linenumber"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy(col("l_returnflag"))
        li.withColumn("cum", sum(col("qty")).over(w))
          .withColumn("tw", sum(col("qty")).over(tot))
          .filter(col("cum") * 2 >= col("tw") &&
            (col("cum") - col("qty")) * 2 < col("tw"))
          .select(col("l_returnflag"), col("tw").as("total_weight"),
            col("cents").as("wmedian_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH li AS (
             |  SELECT l_returnflag,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |      AS cents,
             |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
             |    l_orderkey, l_linenumber
             |  FROM lineitem),
             |r AS (
             |  SELECT l_returnflag, cents, qty,
             |    sum(qty) OVER (PARTITION BY l_returnflag
             |      ORDER BY cents, l_orderkey, l_linenumber
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(qty) OVER (PARTITION BY l_returnflag) AS tw
             |  FROM li)
             |SELECT l_returnflag, CAST(tw AS BIGINT) AS total_weight,
             |  cents AS wmedian_cents
             |FROM r
             |WHERE cum * 2 >= tw AND (cum - qty) * 2 < tw
             |ORDER BY l_returnflag""".stripMargin)),

    // CONSISTENT (JOIN-PRESERVING) SAMPLING — row-Bernoulli samples of
    // two tables destroy their join (a sampled order's customer is
    // usually missing); sampling by KEY HASH keeps referential
    // integrity: a customer is in-sample iff mix(custkey) < 10%·M,
    // and orders inherit membership by applying the SAME hash to
    // their foreign key — no coordination, no join needed to sample,
    // any table keyed by custkey joins consistently forever. The
    // result proves it: per-table sampled counts + share, and the
    // orphan count of the sampled join — structurally zero, under
    // the hash check. Shuffle-free sampling (a filter on each scan);
    // the orphan proof is one anti-join of the two samples.
    QueryDef(
      "q174_consistent_sample",
      (s, d) => {
        def inSample(key: org.apache.spark.sql.Column) =
          expr(s"((((${key} % 1000003) * 131 + 17) % 1000003) * 137 + 29) " +
            "% 1000003") < 100000
        val cust = customer(s, d).filter(inSample(col("c_custkey")))
        val ords = orders(s, d).filter(inSample(col("o_custkey")))
        val orphans = ords.join(cust,
          col("o_custkey") === col("c_custkey"), "left_anti")
        val cn = cust.agg(count(lit(1)).as("n_cust_sampled"))
        val on = ords.agg(count(lit(1)).as("n_orders_sampled"))
        val tot = customer(s, d).agg(count(lit(1)).as("n_cust_total"))
          .crossJoin(broadcast(orders(s, d)
            .agg(count(lit(1)).as("n_orders_total"))))
        cn.crossJoin(broadcast(on))
          .crossJoin(broadcast(tot))
          .crossJoin(broadcast(
            orphans.agg(count(lit(1)).as("n_orphan_orders"))))
          .select(col("n_cust_sampled"), col("n_cust_total"),
            expr("n_cust_sampled * 1000 div n_cust_total")
              .as("cust_permille"),
            col("n_orders_sampled"), col("n_orders_total"),
            expr("n_orders_sampled * 1000 div n_orders_total")
              .as("orders_permille"),
            col("n_orphan_orders"))
      },
      Some("""WITH cs AS (
             |  SELECT c_custkey FROM customer
             |  WHERE ((((c_custkey % 1000003) * 131 + 17) % 1000003)
             |    * 137 + 29) % 1000003 < 100000),
             |os AS (
             |  SELECT o_custkey FROM orders
             |  WHERE ((((o_custkey % 1000003) * 131 + 17) % 1000003)
             |    * 137 + 29) % 1000003 < 100000),
             |orph AS (
             |  SELECT count(*) AS n_orphan_orders FROM os
             |  WHERE NOT EXISTS (SELECT 1 FROM cs
             |    WHERE cs.c_custkey = os.o_custkey))
             |SELECT
             |  (SELECT count(*) FROM cs) AS n_cust_sampled,
             |  (SELECT count(*) FROM customer) AS n_cust_total,
             |  CAST((SELECT count(*) FROM cs) * 1000
             |    // (SELECT count(*) FROM customer) AS BIGINT)
             |    AS cust_permille,
             |  (SELECT count(*) FROM os) AS n_orders_sampled,
             |  (SELECT count(*) FROM orders) AS n_orders_total,
             |  CAST((SELECT count(*) FROM os) * 1000
             |    // (SELECT count(*) FROM orders) AS BIGINT)
             |    AS orders_permille,
             |  n_orphan_orders
             |FROM orph""".stripMargin)),

    // INTERVAL UNION — total COVERED time per user when each event
    // opens a ±5-minute activity window: the classic union-of-
    // intervals measure (dwell time, billable coverage, machine
    // uptime) where naive Σ(lengths) double-counts every overlap.
    // Sweep form: sort intervals by start per user, a new island
    // begins where start exceeds the running max end (strictly —
    // touching intervals merge), then covered = Σ per island of
    // max(end) − min(start). Two windows over the same per-user
    // sort order (one exchange), all epoch-second integers. The
    // checked result also carries Σ raw lengths, so the hash pins
    // the overlap actually removed.
    QueryDef(
      "q175_interval_union",
      (s, d) => {
        val iv = eventsNorm(s, d)
          .filter(col("user_id") < 50)
          .select(col("user_id"),
            (col("ts_sec") - 300L).as("st"), (col("ts_sec") + 300L).as("en"),
            col("event_id"))
        val byU = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("en"), col("event_id"))
        val prevMaxEnd = max(col("en")).over(
          byU.rowsBetween(Window.unboundedPreceding, -1))
        val marked = iv
          .withColumn("brk",
            when(prevMaxEnd.isNull || col("st") > prevMaxEnd, 1L)
              .otherwise(0L))
          .withColumn("island", sum(col("brk")).over(
            byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        marked
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("st")).as("s0"), max(col("en")).as("e0"),
            sum(col("en") - col("st")).as("raw"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_islands"),
            sum(col("e0") - col("s0")).as("covered_sec"),
            sum(col("raw")).as("raw_sec"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (
             |  SELECT user_id,
             |    epoch_ns(ts) // 1000000000 - 300 AS st,
             |    epoch_ns(ts) // 1000000000 + 300 AS en,
             |    event_id
             |  FROM events WHERE user_id < 50),
             |m AS (
             |  SELECT user_id, st, en, event_id,
             |    CASE WHEN max(en) OVER (PARTITION BY user_id
             |        ORDER BY st, en, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |        IS NULL
             |      OR st > max(en) OVER (PARTITION BY user_id
             |        ORDER BY st, en, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      THEN 1 ELSE 0 END AS brk
             |  FROM iv),
             |isl AS (
             |  SELECT user_id, st, en,
             |    sum(brk) OVER (PARTITION BY user_id
             |      ORDER BY st, en, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS island
             |  FROM m),
             |g AS (
             |  SELECT user_id, island, min(st) AS s0, max(en) AS e0,
             |    sum(en - st) AS raw
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_islands,
             |  CAST(sum(e0 - s0) AS BIGINT) AS covered_sec,
             |  CAST(sum(raw) AS BIGINT) AS raw_sec
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // TUKEY IQR FENCES — the third robust-outlier family member
    // (q90 z-score assumes normality, q145 MAD needs two median
    // passes; the boxplot fence is ONE rank pass): q1/q3 as rank-at-k
    // order statistics (k = ⌈n·25/100⌉, ⌈n·75/100⌉), outlier ⇔
    // value outside [q1 − 1.5·IQR, q3 + 1.5·IQR], multiplied through
    // to the all-integer tests 2·v < 5·q1 − 3·q3 and
    // 2·v > 5·q3 − 3·q1. One window pass extracts both quartiles;
    // one broadcast join scores the facts.
    QueryDef(
      "q176_tukey_fences",
      (s, d) => {
        val ev = eventsNorm(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"),
            expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("v"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("v"), col("event_id"))
        val q13 = ev
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .filter(col("rn") === expr("(n * 25 + 99) div 100") ||
            col("rn") === expr("(n * 75 + 99) div 100"))
          .groupBy(col("event_type"))
          .agg(min(col("v")).as("q1"), max(col("v")).as("q3"))
        ev.join(broadcast(q13), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            min(col("q1")).as("q1_micro"), min(col("q3")).as("q3_micro"),
            sum(when(col("v") * 2 < col("q1") * 5 - col("q3") * 3, 1L)
              .otherwise(0L)).as("n_low_outliers"),
            sum(when(col("v") * 2 > col("q3") * 5 - col("q1") * 3, 1L)
              .otherwise(0L)).as("n_high_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, event_id,
             |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
             |  FROM events WHERE value IS NOT NULL),
             |r AS (
             |  SELECT event_type, v,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY v, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM ev),
             |q AS (
             |  SELECT event_type, min(v) AS q1, max(v) AS q3
             |  FROM r
             |  WHERE rn = (n * 25 + 99) // 100 OR rn = (n * 75 + 99) // 100
             |  GROUP BY event_type)
             |SELECT ev.event_type, count(*) AS n_events,
             |  min(q.q1) AS q1_micro, min(q.q3) AS q3_micro,
             |  CAST(sum(CASE WHEN ev.v * 2 < q.q1 * 5 - q.q3 * 3
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
             |  CAST(sum(CASE WHEN ev.v * 2 > q.q3 * 5 - q.q1 * 3
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
             |FROM ev JOIN q ON ev.event_type = q.event_type
             |GROUP BY ev.event_type
             |ORDER BY ev.event_type""".stripMargin)),

    // OVERDISPERSION TEST — count-data QA: a Poisson arrival stream
    // has variance ≈ mean on its daily counts; an index of dispersion
    // s²/x̄ well above 1 means bursty/clumped traffic (bot spikes,
    // batch replays) and below 1 means suspiciously regular
    // (synthetic or rate-limited) — either way the count model
    // downstream jobs assume is wrong. Exactly integer via cross-
    // multiplication: s²/x̄ = (n·Σc² − S²)·10⁶ div (S·(n−1)) with
    // S = Σc — no mean or variance is ever materialized as a float.
    // Products widen to DECIMAL(38,0) (Σc² at count scale squares
    // past int64). Input is the bounded (type, day) grid; one fact
    // aggregation, then arithmetic on ≤ types rows.
    QueryDef(
      "q179_overdispersion",
      (s, d) => {
        eventsNorm(s, d)
          .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("c")).as("s1"),
            sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
          .select(col("event_type"), col("n_days"),
            col("s1").as("n_events"),
            expr("s1 * 1000 div n_days").as("mean_milli"),
            expr("CAST((CAST(n_days AS DECIMAL(38,0)) * s2 - " +
              "CAST(s1 AS DECIMAL(38,0)) * s1) * 1000000 div " +
              "(CAST(s1 AS DECIMAL(38,0)) * (n_days - 1)) AS BIGINT)")
              .as("dispersion_ppm"))
          .withColumn("is_overdispersed",
            col("dispersion_ppm") > 1500000L)
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |a AS (
             |  SELECT event_type, count(*) AS n_days,
             |    CAST(sum(c) AS BIGINT) AS s1, sum(c * c) AS s2
             |  FROM daily GROUP BY event_type)
             |SELECT event_type, n_days, s1 AS n_events,
             |  CAST(s1 * 1000 // n_days AS BIGINT) AS mean_milli,
             |  CAST((n_days * s2 - s1 * s1) * 1000000
             |    // (s1 * (n_days - 1)) AS BIGINT) AS dispersion_ppm,
             |  CAST((n_days * s2 - s1 * s1) * 1000000
             |    // (s1 * (n_days - 1)) AS BIGINT) > 1500000
             |    AS is_overdispersed
             |FROM a ORDER BY event_type""".stripMargin)),

    // GROWTH ACCOUNTING — the DAU decomposition every product
    // dashboard runs: each day's active users split into NEW (first
    // day ever), RETAINED (also active yesterday), RESURRECTED
    // (active before, but not yesterday); plus CHURNED attributed to
    // the day after a user's last consecutive run. The identity
    // active_d = new + retained + resurrected and churned_d =
    // active_{d−1} − retained_d makes the result self-auditing — the
    // hash check would catch any classification drift. One distinct
    // (user, day) grid, ONE user-partitioned window pass carrying
    // lag/lead/min — no day×day self-join; day-level counts are
    // conditional sums over the bounded union. Churn on the day
    // after the observed span is out of frame (capped at dmax via a
    // 1-row broadcast).
    QueryDef(
      "q180_growth_accounting",
      (s, d) => {
        val ud = eventsNorm(s, d)
          .select(col("user_id"), expr("ts_sec div 86400").as("day"))
          .distinct()
        val byU = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val marked = ud
          .withColumn("prev", lag(col("day"), 1).over(byU))
          .withColumn("nxt", lead(col("day"), 1).over(byU))
          .withColumn("first_day",
            min(col("day")).over(Window.partitionBy(col("user_id"))))
        val status = marked.select(col("day"),
          when(col("day") === col("first_day"), "new")
            .when(col("prev") === col("day") - 1, "retained")
            .otherwise(lit("resurrected")).as("kind"))
        val dmax = ud.agg(max(col("day")).as("dmax"))
        val churn = marked
          .filter(col("nxt").isNull || col("nxt") > col("day") + 1)
          .crossJoin(broadcast(dmax))
          .filter(col("day") + 1 <= col("dmax"))
          .select((col("day") + 1).as("day"), lit("churned").as("kind"))
        status.unionByName(churn)
          .groupBy(col("day"))
          .agg(
            sum(when(col("kind") === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when(col("kind") === "retained", 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("kind") === "resurrected", 1L).otherwise(0L))
              .as("n_resurrected"),
            sum(when(col("kind") === "churned", 1L).otherwise(0L))
              .as("n_churned"))
          .withColumn("n_active",
            col("n_new") + col("n_retained") + col("n_resurrected"))
          .orderBy(col("day"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day
             |  FROM events),
             |m AS (
             |  SELECT user_id, day,
             |    lag(day, 1) OVER w AS prev,
             |    lead(day, 1) OVER w AS nxt,
             |    min(day) OVER (PARTITION BY user_id) AS first_day
             |  FROM ud
             |  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
             |status AS (
             |  SELECT day,
             |    CASE WHEN day = first_day THEN 'new'
             |         WHEN prev = day - 1 THEN 'retained'
             |         ELSE 'resurrected' END AS kind
             |  FROM m),
             |dmax AS (SELECT max(day) AS dmax FROM ud),
             |churn AS (
             |  SELECT m.day + 1 AS day, 'churned' AS kind
             |  FROM m, dmax
             |  WHERE (m.nxt IS NULL OR m.nxt > m.day + 1)
             |    AND m.day + 1 <= dmax.dmax),
             |u AS (SELECT * FROM status UNION ALL SELECT * FROM churn)
             |SELECT day,
             |  CAST(sum(CASE WHEN kind = 'new' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_new,
             |  CAST(sum(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_retained,
             |  CAST(sum(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_resurrected,
             |  CAST(sum(CASE WHEN kind = 'churned' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_churned,
             |  CAST(sum(CASE WHEN kind IN ('new', 'retained',
             |    'resurrected') THEN 1 ELSE 0 END) AS BIGINT) AS n_active
             |FROM u GROUP BY day ORDER BY day""".stripMargin)),

    // MULTIVARIATE OLS VIA GRAM-MATRIX AGGREGATION: fit, per event
    // type, daily_count = a + b·day + c·is_weekend by the closed-form
    // normal equations — the DISTRIBUTED shape for linear models: the
    // whole fit reduces to O(d²) Gram sums (n, Σx, Σxxᵀ, Σxy), which
    // aggregate map-side-partial like any other sum; the 3×3 solve is
    // Cramer's rule in plain integer arithmetic ON THE AGGREGATE (no
    // driver collect, no gradient loop, no libm — the matrix inverse
    // a 100 TB regression actually computes is this, per partition,
    // merged). Exact-rational output: coef_ppm = num·10⁶ div det with
    // both engines truncating toward zero, so negative trends are
    // hash-safe. Long envelope holds to ~1e9 events/day (num·10⁶ <
    // 2⁶³); past that the sums widen to DECIMAL(38,0) — the q112
    // pattern. x1 is the epoch-day re-based by a fixed constant
    // (smaller cross-products; any fixed base gives the same fit at
    // shifted intercept, and BOTH engines use the same base so the
    // check is exact). Weekend = epoch-day mod 7 ∈ {2,3} (day 0,
    // 1970-01-01, was a Thursday).
    QueryDef(
      "q192_ols_gram_trend",
      (s, d) => {
        val daily = eventsNorm(s, d)
          .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("x1", col("day") - 19700L)
          .withColumn("x2",
            expr("CASE WHEN day % 7 IN (2, 3) THEN 1L ELSE 0L END"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
            sum(expr("x1 * x1")).as("s11"),
            sum(expr("x1 * x2")).as("s12"),
            sum(expr("x2 * x2")).as("s22"),
            sum(col("c")).as("sy"),
            sum(expr("x1 * c")).as("s1y"),
            sum(expr("x2 * c")).as("s2y"))
          .withColumn("det", expr(
            """n * (s11*s22 - s12*s12) - sx1 * (sx1*s22 - s12*sx2)
              | + sx2 * (sx1*s12 - s11*sx2)""".stripMargin))
          .withColumn("a_ppm", expr(
            """(sy * (s11*s22 - s12*s12) - sx1 * (s1y*s22 - s12*s2y)
              | + sx2 * (s1y*s12 - s11*s2y)) * 1000000 div det""".stripMargin))
          .withColumn("b_ppm", expr(
            """(n * (s1y*s22 - s2y*s12) - sy * (sx1*s22 - s12*sx2)
              | + sx2 * (sx1*s2y - s1y*sx2)) * 1000000 div det""".stripMargin))
          .withColumn("c_ppm", expr(
            """(n * (s11*s2y - s12*s1y) - sx1 * (sx1*s2y - s1y*sx2)
              | + sy * (sx1*s12 - s11*sx2)) * 1000000 div det""".stripMargin))
          .select(col("event_type"), col("n"), col("sy"), col("det"),
            col("a_ppm"), col("b_ppm"), col("c_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |x AS (
             |  SELECT event_type, c, day - 19700 AS x1,
             |    CASE WHEN day % 7 IN (2, 3) THEN CAST(1 AS BIGINT)
             |         ELSE CAST(0 AS BIGINT) END AS x2
             |  FROM daily),
             |g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x1) AS BIGINT) AS sx1,
             |    CAST(sum(x2) AS BIGINT) AS sx2,
             |    CAST(sum(x1*x1) AS BIGINT) AS s11,
             |    CAST(sum(x1*x2) AS BIGINT) AS s12,
             |    CAST(sum(x2*x2) AS BIGINT) AS s22,
             |    CAST(sum(c) AS BIGINT) AS sy,
             |    CAST(sum(x1*c) AS BIGINT) AS s1y,
             |    CAST(sum(x2*c) AS BIGINT) AS s2y
             |  FROM x GROUP BY event_type)
             |SELECT event_type, n, sy,
             |  n * (s11*s22 - s12*s12) - sx1 * (sx1*s22 - s12*sx2)
             |    + sx2 * (sx1*s12 - s11*sx2) AS det,
             |  (sy * (s11*s22 - s12*s12) - sx1 * (s1y*s22 - s12*s2y)
             |    + sx2 * (s1y*s12 - s11*s2y)) * 1000000 // (
             |  n * (s11*s22 - s12*s12) - sx1 * (sx1*s22 - s12*sx2)
             |    + sx2 * (sx1*s12 - s11*sx2)) AS a_ppm,
             |  (n * (s1y*s22 - s2y*s12) - sy * (sx1*s22 - s12*sx2)
             |    + sx2 * (sx1*s2y - s1y*sx2)) * 1000000 // (
             |  n * (s11*s22 - s12*s12) - sx1 * (sx1*s22 - s12*sx2)
             |    + sx2 * (sx1*s12 - s11*sx2)) AS b_ppm,
             |  (n * (s11*s2y - s12*s1y) - sx1 * (sx1*s2y - s1y*sx2)
             |    + sy * (sx1*s12 - s11*sx2)) * 1000000 // (
             |  n * (s11*s22 - s12*s12) - sx1 * (sx1*s22 - s12*sx2)
             |    + sx2 * (sx1*s12 - s11*sx2)) AS c_ppm
             |FROM g ORDER BY event_type""".stripMargin)),

    // LINEAR MULTI-TOUCH ATTRIBUTION (q153's sibling: last-touch
    // credits one event; linear splits the credit across EVERY prior
    // touch in the lookback). The purchase×touch pairing is a
    // per-user RANGE join — one user_id shuffle, per-user bounded by
    // the 7-day window, never a global cartesian. Credit is integer-
    // exact: each touch gets rev div n and the MOST RECENT touch also
    // takes rev mod n, so Σ credit over the whole result equals Σ
    // purchase revenue to the micro — the self-auditing identity the
    // hash check pins (a lost remainder or double-credit breaks it).
    // Orphan purchases (no touch in window) keep full credit in
    // '(none)'.
    QueryDef(
      "q196_linear_attribution",
      (s, d) => {
        val ev = eventsNorm(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            col("ts_ns").as("pns"), col("ts_sec").as("psec"),
            expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("rev"))
        val t = ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id").as("t_user"), col("event_id").as("tid"),
            col("event_type").as("ttype"), col("ts_ns").as("tns"),
            col("ts_sec").as("tsec"))
        val j = p.join(t,
          col("user_id") === col("t_user") && col("tns") < col("pns") &&
            col("psec") - col("tsec") <= 604800L, "left")
        val byP = Window.partitionBy(col("pid"))
        j.withColumn("n_t", count(col("ttype")).over(byP))
          .withColumn("rn", row_number().over(
            byP.orderBy(col("tns").desc, col("tid").desc)))
          .withColumn("attr",
            when(col("n_t") === 0, lit("(none)")).otherwise(col("ttype")))
          .withColumn("credit",
            when(col("n_t") === 0, col("rev"))
              .otherwise(expr("rev div n_t") +
                when(col("rn") === 1, expr("rev % n_t")).otherwise(0L)))
          .groupBy(col("attr"))
          .agg(count(lit(1)).as("n_credits"),
            sum(col("credit")).as("credit_micro"))
          .orderBy(col("attr"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type, value,
             |    epoch_ns(ts) AS ts_ns,
             |    epoch_ns(ts) // 1000000000 AS ts_sec
             |  FROM events),
             |p AS (
             |  SELECT user_id, event_id AS pid, ts_ns AS pns,
             |    ts_sec AS psec,
             |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS rev
             |  FROM ev WHERE event_type = 'purchase'),
             |t AS (
             |  SELECT user_id AS t_user, event_id AS tid,
             |    event_type AS ttype, ts_ns AS tns, ts_sec AS tsec
             |  FROM ev WHERE event_type <> 'purchase'),
             |j AS (
             |  SELECT * FROM p LEFT JOIN t
             |  ON p.user_id = t.t_user AND t.tns < p.pns
             |    AND p.psec - t.tsec <= 604800),
             |w AS (
             |  SELECT pid, rev, ttype,
             |    count(ttype) OVER (PARTITION BY pid) AS n_t,
             |    row_number() OVER (PARTITION BY pid
             |      ORDER BY tns DESC, tid DESC) AS rn
             |  FROM j),
             |c AS (
             |  SELECT
             |    CASE WHEN n_t = 0 THEN '(none)' ELSE ttype END AS attr,
             |    CASE WHEN n_t = 0 THEN rev
             |         ELSE rev // n_t
             |           + CASE WHEN rn = 1 THEN rev % n_t ELSE 0 END
             |    END AS credit
             |  FROM w)
             |SELECT attr, count(*) AS n_credits,
             |  CAST(sum(credit) AS BIGINT) AS credit_micro
             |FROM c GROUP BY attr ORDER BY attr""".stripMargin)),

    // ROLLING 7-DAY DISTINCT ACTIVE USERS (WAU per day) — the rolling
    // COUNT(DISTINCT) window SQL cannot express directly (DISTINCT
    // isn't a frame aggregate) and the naive form computes as a
    // day×day self-join. The scalable identity: a user is active in
    // the window ending on day D iff some (user, day) event-day lands
    // in [D−6, D] — so EXPLODE each distinct (user, day) into the ≤7
    // window-end days it covers, de-duplicate (user, cover_day)
    // (a user active twice in a window counts once), and count per
    // cover_day. Cost = 7× the distinct user-day grid (linear, the
    // window length is the fan-out), one shuffle — no self-join, no
    // n² anywhere. Trailing partial windows at the range edge are
    // CLAMPED to observed days (the result says how many, via
    // n_window_days) so the curve is honest at both ends. dau rides
    // along: wau/dau (the stickiness ratio product teams track) is
    // integer ppm.
    QueryDef(
      "q199_rolling_wau",
      (s, d) => {
        val ud = eventsNorm(s, d)
          .select(col("user_id"), expr("ts_sec div 86400").as("day"))
          .distinct()
          .persist()
        val bounds = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val wau = ud
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(sequence(col("day"),
              least(col("day") + 6, col("hi")))).as("cover_day"))
          .distinct()
          .groupBy(col("cover_day")).agg(count(lit(1)).as("wau"))
        val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        wau.join(dau, col("cover_day") === col("day"))
          .crossJoin(broadcast(bounds))
          .select(col("cover_day").as("day"),
            least(col("cover_day") - col("lo") + 1, lit(7L))
              .as("n_window_days"),
            col("dau"), col("wau"),
            expr("dau * 1000000 div wau").as("stickiness_ppm"))
          .orderBy(col("day"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id,
             |    (epoch_ns(ts) // 1000000000) // 86400 AS day
             |  FROM events),
             |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
             |cov AS (
             |  SELECT DISTINCT ud.user_id, u.cover_day
             |  FROM ud CROSS JOIN b,
             |    LATERAL (SELECT unnest(range(ud.day,
             |      least(ud.day + 6, b.hi) + 1)) AS cover_day) u),
             |wau AS (
             |  SELECT cover_day, CAST(count(*) AS BIGINT) AS wau
             |  FROM cov GROUP BY cover_day),
             |dau AS (
             |  SELECT day, CAST(count(*) AS BIGINT) AS dau
             |  FROM ud GROUP BY day)
             |SELECT w.cover_day AS day,
             |  least(w.cover_day - b.lo + 1, 7) AS n_window_days,
             |  dau.dau, w.wau,
             |  dau.dau * 1000000 // w.wau AS stickiness_ppm
             |FROM wau w JOIN dau ON w.cover_day = dau.day CROSS JOIN b
             |ORDER BY day""".stripMargin))
  )
}
