package graft.queries

import graft.{SparkSpecBase, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions over the catalog (SURVEY.md §4):
  * the optimizations the engine's scale story depends on must be
  * visible in `explain`, not assumed — pushdown reaching the parquet
  * scan, bounded sides broadcast, top-k as TakeOrderedAndProject, and
  * no accidental cartesian products or full sorts. Guards against the
  * round-2 regression class where a size-estimate flip silently turned
  * a probe broadcast into a ~100 MB corpus broadcast.
  */
class PlanShapeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: filter and projection are pushed into the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.matches("(?s).*PushedFilters: \\[.*o_orderstatus.*\\].*"),
      s"filter not pushed:\n$p")
    assert(!p.contains("o_orderdate"), "unprojected column read")
    assert(p.contains("TakeOrderedAndProject"), "top-k should not full-sort")
  }

  test("top-k queries plan TakeOrderedAndProject, not global Sort+Limit") {
    for (q <- Seq("q06_having_topk", "q07_join_broadcast", "q10_orderby_limit"))
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q full-sorts")
  }

  test("dimension joins broadcast — no shuffle of the fact side") {
    for (q <- Seq("q07_join_broadcast", "q08_where_group_count",
        "q09_serving_top_parts")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!p.contains("SortMergeJoin"), s"$q shuffles the fact side")
    }
  }

  test("similarity probes broadcast on the build side, corpus streams") {
    for (q <- Seq("q30_ngram_jaccard", "q32_ann_bruteforce")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q: probe side must broadcast")
      assert(!p.contains("CartesianProduct"), s"$q degraded to cartesian")
    }
  }

  test("no catalog query plans a CartesianProduct") {
    // Every pairwise operator must pair through a bucket/blocking join
    // or an explicit bounded broadcast — the no-unblocked-n² invariant.
    // Same sweep also enforces the catalog-wide scan ceiling: current
    // max is 6 numbered parquet scans (the 6-table ETL raw build and
    // q92's 3 FK edges); anything above 8 means a new query is
    // re-evaluating an unpersisted aggregate per consumer (the
    // round-7 audit class — q114 hit 10 before its fix).
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      val p = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      val scans = """(?m)^\(\d+\) Scan parquet""".r.findAllIn(p).size
      assert(scans <= 8,
        s"$name scans parquet $scans times — repeated-scan antipattern")
      // Oracle-determinism contract (round-7, after q191): no entry may
      // EMIT a DECIMAL or FLOAT column — DuckDB materializes decimals
      // through pandas as float64 while the Spark parquet dump keeps
      // exact decimals, so the driver's hash diverges on REPRESENTATION
      // even when every value is bit-correct (the q191 class). Wide
      // decimals are fine INTERNALLY; the final select must land on
      // integer/long/string/date/bool. DOUBLE outputs are grandfathered
      // for the frozen pairs below (parquet float64 round-trips
      // identically through both engines and the driver's float compare
      // tolerates them — 6 rounds green); NEW entries must not add to
      // this list: emit BIGINT or integer-scaled values instead.
      import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
      val hard = df.schema.fields.collect {
        case f if f.dataType == FloatType ||
          f.dataType.isInstanceOf[DecimalType] => s"${f.name}: ${f.dataType}"
      }
      assert(hard.isEmpty,
        s"$name emits non-hash-stable column(s) ${hard.mkString(", ")} — " +
          "cast to BIGINT (or scale to integer micros) before the final select")
      val doubles = df.schema.fields.collect {
        case f if f.dataType == DoubleType => f.name }.toSet
      val extra = doubles -- grandfatheredDoubles.getOrElse(name, Set.empty)
      assert(extra.isEmpty,
        s"$name emits new DOUBLE column(s) ${extra.mkString(", ")} — " +
          "the catalog contract for new entries is integer/bigint/string " +
          "output (scale to micros); the grandfathered list is frozen")
    }
  }

  /** The 30 pre-round-7 entries whose DOUBLE outputs have hash-matched
    * the DuckDB oracle since they landed — frozen, not extensible. */
  private val grandfatheredDoubles: Map[String, Set[String]] = Map(
    "q01_scan_filter_project" -> Set("o_totalprice"),
    "q05_group_agg" -> Set("sum_qty", "avg_price", "revenue"),
    "q06_having_topk" -> Set("avg_qty"),
    "q07_join_broadcast" -> Set("total_spend"),
    "q09_serving_top_parts" -> Set("avg_qty"),
    "q10_orderby_limit" -> Set("o_totalprice"),
    "q121_etl_top_books_title" -> Set("Average-Rating"),
    "q123_ann_ivf_multiprobe" -> Set("cos"),
    "q134_sliding_window" -> Set("sum_value"),
    "q15_cube" -> Set("total_price"),
    "q16_window_topk_per_group" -> Set("p_retailprice"),
    "q17_window_running_sum" -> Set("running_spend"),
    "q208_random_projection" -> Set("cos"),
    "q219_ann_incremental" -> Set("cos"),
    "q21_date_fns" -> Set("total_price"),
    "q23_json_extract" -> Set("avg_k"),
    "q24_time_bucket" -> Set("sum_value"),
    "q28_minhash_lsh" -> Set("jaccard"),
    "q30_ngram_jaccard" -> Set("word_jaccard", "shingle_jaccard"),
    "q31_embedding_neardup" -> Set("cos"),
    "q32_ann_bruteforce" -> Set("cos"),
    "q33_ann_lsh" -> Set("cos"),
    "q35_quality_score" -> Set("stop_ratio", "distinct_ratio", "len_score"),
    "q36_token_stats" -> Set("avg_ws_tokens"),
    "q39_etl_top100_books" -> Set("Average-Rating"),
    "q44_etl_top_authors" -> Set("Average-Rating"),
    "q49_similarity_join_exact" -> Set("jaccard"),
    "q53_grouping_sets" -> Set("total_price"),
    "q59_ann_ivf" -> Set("cos"),
    "q73_ann_quantized" -> Set("cos_exact", "cos_q"))

  test("ETL plans prune unused derived columns (image URLs, Age)") {
    // buildRaw synthesizes 3 image-URL concats and Age; queries that
    // don't consume them must not compute them — Catalyst's
    // ColumnPruning through cleanNulls' all-column select.
    val p = plan("q40_etl_books_dim")
    assert(!p.contains("Image-URL"), "image URLs not pruned from q40")
    assert(!p.contains("\"Age\"") && !p.contains("AS Age"), "Age not pruned")
  }

  test("group-aggregates run partial+final (map-side combine)") {
    val p = plan("q05_group_agg")
    assert(p.matches("(?s).*HashAggregate.*HashAggregate.*"),
      "expected two-phase hash aggregation")
  }

  test("round-3 operators keep their bounded sides broadcast") {
    // q65: the 4×256-cell sketch joins back onto the vocabulary;
    // q69: the ≤m/63-word bit table probes the full customer side;
    // q63: the term-df table re-attaches to the (doc, term) pairs.
    // In each, the bounded summary must broadcast — shuffling the big
    // side on a summary join is the scale regression to lock out.
    for (q <- Seq("q65_cms_heavy_hitters", "q69_bloom_prune", "q63_tfidf")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
    }
  }

  test("merge upsert joins by key — full-outer, never a cartesian") {
    val p = plan("q71_merge_upsert")
    assert(p.contains("FullOuter"), s"merge must be a full-outer key join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("training-shaping operators keep their scale shapes") {
    // q101 chunking is narrow per-doc work: no join anywhere in the
    // plan (a join would mean chunking stopped being map-only).
    val p101 = plan("q101_token_chunking")
    assert(!p101.contains("Join"), s"q101 must stay join-free:\n$p101")
    // q103's single-row budget and q104's k×dim centroid table must
    // broadcast — shuffling the corpus/vector side against a
    // metadata-sized summary is the scale regression to lock out.
    for (q <- Seq("q103_corpus_mixing", "q104_kmeans_embeddings")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q lost its bounded-side broadcast")
    }
    // q104's per-vector argmin must partial-aggregate (map-side
    // combine of min(struct)) — a row_number window here would shuffle
    // all k×N candidate rows.
    val p104 = plan("q104_kmeans_embeddings")
    assert(p104.matches("(?s).*partial_min.*"),
      "q104 assignment must map-side combine its argmin")
    // q110's posting collection must run against the broadcast kept-
    // term set; q111's rank iterations must broadcast the node table
    // onto the cached edge list (and never self-join the fact table).
    for (q <- Seq("q110_inverted_index", "q111_pagerank_cooccurrence")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast")
      assert(!p.contains("SortMergeJoin"), s"$q shuffles a join side")
    }
  }

  test("q112/q113/q114: retrieval and graph additions keep their shapes") {
    // BM25: corpus constants and df table broadcast; top-20 must be a
    // TakeOrderedAndProject, never a global sort of the scored docs.
    val bm25 = plan("q112_bm25")
    assert(bm25.contains("TakeOrderedAndProject"), "q112 full-sorts")
    assert(!bm25.contains("SortMergeJoin"), "q112 shuffles a join side")
    // Paragraph dedup is join-free by construction: one window shuffle
    // on the unit text plus the final per-source aggregation.
    val para = plan("q113_paragraph_dedup")
    assert(!para.contains("Join"), s"q113 grew a join:\n$para")
    // Triangle counting: every probe is an equi-join (hash joins only)
    // — an OR-form closing-edge probe would plan a nested loop over
    // the wedge set.
    val tri = plan("q114_triangle_count")
    assert(!tri.contains("BroadcastNestedLoopJoin"),
      "q114 closing-edge probe degenerated to a nested loop")
  }

  test("q122: partitioned mart scan carries a dynamic partition filter") {
    // The mart is Hive-partitioned on Country and queried through a
    // join against a filtered region dim — the partition filter is
    // only knowable at run time, so it must arrive as a dynamicpruning
    // subquery in the scan's PartitionFilters. A plan without it
    // lists/reads every country directory: the 100 TB regression this
    // entry exists to lock out.
    val p = plan("q122_mart_partition_pruning")
    assert(p.contains("PartitionFilters"),
      s"q122 scan has no partition filters:\n$p")
    assert(p.contains("dynamicpruning"),
      s"q122 lost dynamic partition pruning:\n$p")
  }

  test("scd2 computes both windows over ONE key exchange") {
    // lag (run detection) and lead (interval close) partition the same
    // way; a second Exchange would mean the partitioning was lost.
    val p = plan("q72_scd2_history")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, // one for the groupBy dedup, one for windows
      s"q72 re-shuffles between its window passes ($exchanges exchanges)")
  }

  test("repeated-scan audit: consumers of bounded aggregates reuse them") {
    // Round-7 ScanProbe findings, locked: a plan whose parquet-scan
    // count exceeds the distinct tables the query reads means some
    // consumer re-evaluates an unpersisted aggregate's whole lineage
    // (q114 was a 10-scan plan before `triangleCounts` persisted its
    // input). The bound is per-query: distinct tables read, plus the
    // documented extra pass where the algorithm has one (q27's
    // collision-redo branch).
    val bounds = Seq(
      "q150_twopass_quantile" -> 2, // two passes = two lineitem scans
      "q158_tv_drift" -> 2,         // stats pass + counts pass
      "q161_dist_match" -> 2,       // bounds pass + cell-counts pass
      "q114_triangle_count" -> 2,   // pairs self-join; rest from cache
      "q123_ann_ivf_multiprobe" -> 3, // cents/corpus/probes derivations
      "q92_fk_audit" -> 6,          // 3 FK edges x (child + parent)
      "q83_containment_join" -> 1,  // single persisted items distinct
      "q165_negative_sampling" -> 4) // part idx + orders(cand,pos) + li
    for ((name, maxScans) <- bounds) {
      // Numbered operator lines only: formatted explain repeats each
      // InMemoryRelation's cached-plan subtree (whose scan is NOT an
      // executed operator of this query).
      val n = """(?m)^\(\d+\) Scan parquet""".r.findAllIn(plan(name)).size
      assert(n <= maxScans,
        s"$name scans parquet $n times (bound $maxScans) — an " +
          "unpersisted aggregate is being re-evaluated")
    }
  }

  test("aggregate top-k plans no Window operator (bounded partials)") {
    // q169's whole point vs q16: the exchange carries O(groups·k)
    // TopKAgg partials, never a per-group full sort.
    val p = plan("q169_topk_aggregate")
    assert(!p.matches("(?s).*\\(\\d+\\) Window.*"),
      s"q169 fell back to a window plan:\n$p")
  }
}
