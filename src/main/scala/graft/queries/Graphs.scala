package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over derived relationship graphs (SURVEY.md §2b —
  * the companion of `ops/GraphOps`'s connected components, which
  * clusters near-dup pairs; here the graph measures IMPORTANCE).
  * At corpus scale this family ranks domains/sources by their link
  * structure to weight training data; the testdata analogue is the
  * parts-bought-together graph (same co-occurrence edges as q77).
  *
  * All rank arithmetic is integer-micro with floor division —
  * order-independent, so the DuckDB oracle reproduces every rank
  * exactly (float PageRank would drift in summation order).
  */
object Graphs {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // Weighted PageRank, two unrolled power iterations (damping 0.85)
    // over the co-purchase multigraph: an edge occurrence per order
    // containing the pair, so frequently co-bought parts pass more
    // rank mass (deg = total outgoing weight). Per iteration: ONE
    // broadcast of the node-sized rank table onto the cached edge
    // list, one integer share = (r·85) div (100·deg) per occurrence,
    // one map-side-combined groupBy dst. Symmetric edges mean every
    // node has in-edges, so no dangling-mass term is needed; a graph
    // whose node table outgrows broadcast buckets the edge list by
    // src instead — the loop body is unchanged.
    QueryDef(
      "q111_pagerank_cooccurrence",
      (s, d) => {
        // Edge generation WITHOUT a self-join and WITHOUT a pair-level
        // distinct: baskets are tiny (~4-7 items), so collect each
        // order's item SET once (collect_set dedups within the order —
        // no pre-distinct shuffle needed) and expand pair occurrences
        // narrowly from the array. Each order contributes a pair once;
        // a pair occurring in w orders appears w times — the MULTIGRAPH
        // edge list, aggregated by the downstream map-side-combining
        // groupBys instead of a 3M-row distinct shuffle. (A self-join
        // on the order key benched ~2× slower and sort-merges the fact
        // table against itself; the gap grows with scale.)
        val edges = lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
          .select(explode(flatten(transform(col("pks"), x =>
            transform(col("pks"), y => struct(x.as("src"), y.as("dst"))))))
            .as("e"))
          .select(col("e.src"), col("e.dst"))
          .filter(col("src") =!= col("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // node-sized; persisted — referenced by r0 and by BOTH step()
        // joins (3 plan branches would each re-aggregate the edge list)
        val deg = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ranks carry (node, deg, r); r0 = 1.0 in micro units
        val r0 = deg.withColumn("r", lit(1000000L))
        // The rank table is node-sized (edges/nodes ≈ avg degree, so
        // nodes ≪ edges): BROADCAST it onto the cached edge list each
        // iteration — the edge list never moves after its one build
        // shuffle. (A graph whose node table outgrows broadcast would
        // bucket edges by src instead; the loop body is unchanged.)
        def step(ranks: DataFrame): DataFrame =
          edges
            .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .withColumn("share", expr("(r * 85) div (100 * deg)"))
            .groupBy(col("dst").as("node"))
            .agg(sum(col("share")).as("in_share"))
            .join(broadcast(deg), "node")
            .withColumn("r", lit(150000L) + col("in_share"))
            .select(col("node"), col("deg"), col("r"))
        step(step(r0))
          .select(col("node").as("part"), col("deg"), col("r").as("rank_micro"))
          .orderBy(col("rank_micro").desc, col("part"))
          .limit(20)
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok,
             |    l_partkey AS pk FROM lineitem),
             |edges AS (SELECT x.pk AS src, y.pk AS dst
             |  FROM items x JOIN items y
             |    ON x.ok = y.ok AND x.pk != y.pk),
             |deg AS (SELECT src AS node, count(*) AS deg FROM edges
             |  GROUP BY src),
             |r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS r
             |  FROM deg),
             |s1 AS (SELECT e.dst AS node,
             |    CAST(sum((r.r * 85) // (100 * r.deg)) AS BIGINT)
             |      AS in_share
             |  FROM edges e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
             |r1 AS (SELECT s.node, d.deg, 150000 + s.in_share AS r
             |  FROM s1 s JOIN deg d ON s.node = d.node),
             |s2 AS (SELECT e.dst AS node,
             |    CAST(sum((r.r * 85) // (100 * r.deg)) AS BIGINT)
             |      AS in_share
             |  FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
             |r2 AS (SELECT s.node, d.deg, 150000 + s.in_share AS r
             |  FROM s2 s JOIN deg d ON s.node = d.node)
             |SELECT node AS part, deg, r AS rank_micro
             |FROM r2 ORDER BY rank_micro DESC, part LIMIT 20""".stripMargin)),

    // Triangle counting over the strong co-purchase graph (edges = part
    // pairs bought together in >= 2 orders): the clustering-coefficient
    // primitive next to q111's centrality. Spark side uses the
    // DEGREE-ORIENTED wedge join (Cohen / Suri-Vassilvitskii): every
    // edge is directed from its lower-(degree, id) endpoint, wedges
    // form only between a node's out-neighbors, and the closing edge is
    // probed in canonical orientation — out-degrees are bounded by
    // O(sqrt(m)), so no hub ever fans a quadratic wedge set (the
    // id-ordered orientation would put every hub-adjacent wedge on the
    // hub; at 100 TB that is THE skew failure). All equi-joins, no OR
    // conditions (an OR closing-edge probe plans a nested loop). The
    // oracle is the orientation-free exhaustive a<b<c 3-join — a
    // structurally different algorithm that must agree on every
    // per-node count.
    QueryDef(
      "q114_triangle_count",
      (s, d) => {
        // Edge generation via the q111 shape (collect_set + narrow
        // array expansion) instead of distinct + basket self-join:
        // baskets are tiny, so each order's item SET expands its a<b
        // pairs without the distinct exchange or the self-join
        // build/probe over the whole fact table (r14 optimization:
        // 2 Exchange + 1 join fewer; warm time 2.76 -> ~2.0 s at
        // sf0.1). Per-order multiplicity is 1 either way (set
        // semantics), so w = #orders containing the pair — identical
        // to the oracle's DISTINCT + self-join + HAVING.
        val e = lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
          .select(explode(flatten(transform(col("pks"), x =>
            transform(col("pks"), y => struct(x.as("a"), y.as("b"))))))
            .as("e"))
          .select(col("e.a"), col("e.b"))
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
          .select(col("a"), col("b"))
        // ._1: the oriented-edge cache handle stays with the harness
        // convention (Bench/Verify clear the cache per query); a
        // library caller would unpersist ._2 after the action.
        graft.ops.GraphOps.triangleCounts(e, "a", "b")._1
          .select(col("id").as("part"), col("n_triangles"))
          .orderBy(col("n_triangles").desc, col("part"))
          .limit(10)
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok,
             |    l_partkey AS pk FROM lineitem),
             |e AS (SELECT x.pk AS a, y.pk AS b
             |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |tri AS (SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
             |  FROM e e1 JOIN e e2 ON e1.b = e2.a
             |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |nodes AS (SELECT unnest([n1, n2, n3]) AS part FROM tri)
             |SELECT part, count(*) AS n_triangles
             |FROM nodes GROUP BY part
             |ORDER BY n_triangles DESC, part LIMIT 10""".stripMargin)),

    // NEGATIVE EDGE SAMPLING — link-prediction training data needs
    // NON-edges, and uniform rejection sampling is neither
    // deterministic nor shuffle-friendly; this is the portable form:
    // per customer, 6 candidate parts from the mixing-hash family
    // (hash(custkey·7 + slot) mod |parts|, mapped to real part ids
    // through a dense row_number index over the part dimension — a
    // bounded-dim global window, the documented exception), positives
    // removed with ONE anti-join against the distinct purchase edge
    // list, then the first 3 surviving negatives per customer by slot
    // order. Deterministic end-to-end (same negatives every run —
    // reproducible epochs), O(customers·k) candidates, no rejection
    // loop; the candidate build never touches the fact table (facts
    // appear only in the distinct edge list the anti-join probes).
    // Emitted sample: custkey < 200 keeps the checked result bounded.
    QueryDef(
      "q165_negative_sampling",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Persisted: the dense index is read twice (size scalar +
        // candidate mapping) and its global row_number sort should
        // run once.
        val partsIdx = part(s, d)
          .select(col("p_partkey"))
          .withColumn("idx", row_number().over(
            Window.orderBy(col("p_partkey"))).cast("long") - 1)
          .persist()
        val nP = partsIdx.agg(count(lit(1)).as("np"))
        // Positives restricted to the probed customers BEFORE the
        // join+distinct — the filter pushes into the orders scan, so
        // the anti-join probe set is built from ~|sample| customers'
        // orders, not the whole fact table.
        val pos = orders(s, d).filter(col("o_custkey") < 200)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("custkey"),
            col("l_partkey").as("p_partkey"))
          .distinct()
        val cand = orders(s, d)
          .filter(col("o_custkey") < 200)
          .select(col("o_custkey").as("custkey")).distinct()
          .select(col("custkey"),
            explode(expr("sequence(0, 5)")).as("slot"))
          .crossJoin(broadcast(nP))
          .withColumn("idx", expr(
            "((((custkey * 7 + slot) % 1000003) * 131 + 17) % 1000003) " +
              "% np"))
          .join(broadcast(partsIdx), Seq("idx"))
        val w = Window.partitionBy(col("custkey")).orderBy(col("slot"))
        cand
          .join(pos, Seq("custkey", "p_partkey"), "left_anti")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("custkey"), col("rk").cast("long").as("neg_rank"),
            col("p_partkey").as("neg_partkey"), col("slot").cast("long")
              .as("slot"))
          .orderBy(col("custkey"), col("neg_rank"))
      },
      Some("""WITH pidx AS (
             |  SELECT p_partkey,
             |    row_number() OVER (ORDER BY p_partkey) - 1 AS idx
             |  FROM part),
             |np AS (SELECT count(*) AS np FROM part),
             |pos AS (
             |  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey
             |    AS p_partkey
             |  FROM orders o JOIN lineitem l
             |    ON o.o_orderkey = l.l_orderkey
             |  WHERE o.o_custkey < 200),
             |cust AS (
             |  SELECT DISTINCT o_custkey AS custkey FROM orders
             |  WHERE o_custkey < 200),
             |cand AS (
             |  SELECT c.custkey, s.slot,
             |    ((((c.custkey * 7 + s.slot) % 1000003) * 131 + 17)
             |      % 1000003) % np.np AS idx
             |  FROM cust c, (SELECT unnest(range(0, 6)) AS slot) s, np),
             |neg AS (
             |  SELECT cd.custkey, cd.slot, p.p_partkey
             |  FROM cand cd JOIN pidx p ON cd.idx = p.idx
             |  WHERE NOT EXISTS (SELECT 1 FROM pos
             |    WHERE pos.custkey = cd.custkey
             |      AND pos.p_partkey = p.p_partkey)),
             |r AS (
             |  SELECT custkey, slot, p_partkey,
             |    row_number() OVER (PARTITION BY custkey
             |      ORDER BY slot) AS rk
             |  FROM neg)
             |SELECT custkey, rk AS neg_rank, p_partkey AS neg_partkey,
             |  CAST(slot AS BIGINT) AS slot
             |FROM r WHERE rk <= 3
             |ORDER BY custkey, neg_rank""".stripMargin)),

    // HIERARCHY FLATTEN — the recursive-query operator (org charts,
    // BOM explosions, category trees): root + depth for every node of
    // a parent-pointer forest via [[graft.ops.GraphOps
    // .pointerJumpDepths]] — pointer JUMPING, ⌈log₂ depth⌉ self-join
    // rounds where the naive parent-walk (and the SQL recursive CTE
    // it replaces) takes `depth` rounds: at a million-deep chain
    // that's 20 joins vs a million. The hierarchy here derives from
    // part keys as the binary tree parent(k) = k div 2 (shifted
    // 1-based) — synthetic, like q148's pepper, because the OPERATOR
    // is the deliverable; the oracle exploits the same derivation's
    // closed form depth(k) = ⌊log₂ k⌋ = len(bin(k)) − 1, so a
    // structurally different computation (bit arithmetic vs iterated
    // joins) must agree on every row. Output: depth histogram + the
    // root-propagation check (min=max=1 per depth).
    QueryDef(
      "q172_hierarchy_flatten",
      (s, d) => {
        val nodes = part(s, d)
          .select((col("p_partkey") + 1).as("id"))
          .withColumn("parent",
            when(col("id") === 1, 1L).otherwise(expr("id div 2")))
        graft.ops.GraphOps.pointerJumpDepths(nodes, "id", "parent")
          .groupBy(col("depth"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("root")).as("root_min"), max(col("root")).as("root_max"))
          .orderBy(col("depth"))
      },
      Some("""SELECT CAST(len(bin(p_partkey + 1)) - 1 AS BIGINT) AS depth,
             |  count(*) AS n_nodes,
             |  CAST(1 AS BIGINT) AS root_min, CAST(1 AS BIGINT) AS root_max
             |FROM part GROUP BY 1 ORDER BY depth""".stripMargin))
  )
}
