package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.VectorOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search catalog over `embeddings` (array<float>[64]):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Scale design: the probe set is tiny and broadcast, so brute force is
  * one scan of the corpus with no shuffle of the big side. The LSH
  * variant prunes candidates by an 8-bit signature equality first —
  * at 100 TB that turns "distance to everything" into "distance to
  * ~1/256th of everything" per probe, still with zero corpus shuffles.
  * Ranking uses the ROUNDED cosine (then vec_id) so ordering is
  * deterministic and engine-independent.
  */
object Similarity {
  import Tables._

  /** DuckDB left-fold cosine between two double-list columns (bit-exact
    * mirror of [[graft.ops.VectorOps.cosine]]). */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])),
       |      (s, t) -> s + t)
       |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |         list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])),
       |         (s, t) -> s + t))
       |     * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |         list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])),
       |         (s, t) -> s + t)))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Brute-force ANN baseline: 8 broadcast probes × corpus, exact
    // cosine, top-5 per probe via window rank on (rounded cos, vec_id).
    QueryDef(
      "q32_ann_bruteforce",
      (s, d) => {
        // repartition: the single-row-group scan would otherwise pin
        // the per-pair fold arithmetic to one task.
        val e = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val probes = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("probe"), col("v").as("pv"))
        val w = Window.partitionBy(col("probe"))
          .orderBy(col("cos").desc, col("vec_id"))
        broadcast(probes)
          .join(e.filter(col("vec_id") >= 8), lit(true))
          .select(col("probe"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe"), col("rn"), col("vec_id"), col("cos"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |scored AS (SELECT p.vec_id AS probe, c.vec_id AS vec_id,
             |    round(${cosSql("p.v", "c.v")}, 4) AS cos
             |  FROM e p JOIN e c ON p.vec_id < 8 AND c.vec_id >= 8),
             |ranked AS (SELECT probe, vec_id, cos,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos DESC, vec_id) AS rn
             |  FROM scored)
             |SELECT probe, rn, vec_id, cos FROM ranked
             |WHERE rn <= 5 ORDER BY probe, rn""".stripMargin)),

    // Hyperplane-LSH ANN: 8-bit signature buckets prune the corpus
    // before any exact distance; top-3 within the probe's bucket.
    QueryDef(
      "q33_ann_lsh",
      (s, d) => {
        val e = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .withColumn("bucket", hyperplaneBucket(col("v"), 8))
        val probes = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("probe"), col("v").as("pv"),
            col("bucket").as("pbucket"))
        val w = Window.partitionBy(col("probe"))
          .orderBy(col("cos").desc, col("vec_id"))
        broadcast(probes)
          .join(e.filter(col("vec_id") >= 8),
            col("pbucket") === col("bucket"))
          .select(col("probe"), col("pbucket").as("bucket"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("probe"), col("bucket"), col("rn"), col("vec_id"), col("cos"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |bk AS (SELECT vec_id, v,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 8)),
             |      (acc, j) -> acc + CASE WHEN
             |          list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |            list_transform(range(1, len(v) + 1), i ->
             |              v[i] * CAST(((j*64 + (i-1)) * 2654435761) % 2001 - 1000
             |                          AS DOUBLE))),
             |            (s, x) -> s + x) > 0
             |        THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS bucket
             |  FROM e),
             |scored AS (SELECT p.vec_id AS probe, p.bucket AS bucket,
             |    c.vec_id AS vec_id, round(${cosSql("p.v", "c.v")}, 4) AS cos
             |  FROM bk p JOIN bk c
             |    ON p.vec_id < 8 AND c.vec_id >= 8 AND p.bucket = c.bucket),
             |ranked AS (SELECT probe, bucket, vec_id, cos,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos DESC, vec_id) AS rn
             |  FROM scored)
             |SELECT probe, bucket, rn, vec_id, cos FROM ranked
             |WHERE rn <= 3 ORDER BY probe, rn""".stripMargin)),

    // IVF (inverted-file) ANN: coarse quantizer = the 10 per-label
    // centroids (micro-unit integers from the q50 aggregator), every
    // vector assigned to its NEAREST centroid cell by exact integer
    // L2²  — micro-quantized elements make dist² an exact long, so
    // cell assignment is bit-identical cross-engine with no float
    // order risk. Probes then search ONLY their own cell (~1/10th of
    // the corpus; at 100 TB the cell scan replaces a full-corpus
    // sweep and the centroid table stays broadcast-sized). Exact
    // cosine re-ranks within the cell, rounded + tie-broken.
    QueryDef(
      "q59_ann_ivf",
      (s, d) => {
        val cAgg = udaf(new graft.ops.VectorAggregates.CentroidAgg(64))
        // repartition: single-row-group testdata parquet = one input
        // split; the quantize + 10-way distance stage is CPU-bound.
        val q = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), col("label"),
            toDouble(col("embedding")).as("v"),
            microQuantize(col("embedding")).as("qv"))
        val cents = q.groupBy(col("label")).agg(cAgg(col("qv")).as("c"))
          .select(col("label").as("cent_id"),
            transform(col("c.sums"), s => centroidMicro(s, col("c.n")))
              .as("cent"))
        // exact integer L2² to each centroid (codegen kernel);
        // nearest cell per vector. Persisted: probes and corpus are
        // both slices of it, and the assignment lineage contains two
        // shuffles + the UDAF — re-deriving it per join branch would
        // double the whole pipeline (the multiply-referenced-corpus
        // rule from the dedup suite).
        val assigned = q.join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("label"), col("v"),
            col("cent_id"), l2DistSq(col("qv"), col("cent")).as("d2"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("d2"), col("cent_id"))).as("m"),
            first(col("v")).as("v"))
          .select(col("vec_id"), col("m.cent_id").as("cell"), col("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val probes = assigned.filter(col("vec_id") < 8)
          .select(col("vec_id").as("probe"), col("cell").as("pcell"),
            col("v").as("pv"))
        val w = Window.partitionBy(col("probe"))
          .orderBy(col("cos").desc, col("vec_id"))
        broadcast(probes)
          .join(assigned.filter(col("vec_id") >= 8),
            col("pcell") === col("cell"))
          .select(col("probe"), col("pcell").as("cell"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("probe"), col("cell"), col("rn"), col("vec_id"), col("cos"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             |    list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |u AS (SELECT label, unnest(qv) AS el,
             |    generate_subscripts(qv, 1) AS pos FROM e),
             |cm AS (SELECT label, pos,
             |    CAST(floor(CAST(CAST(sum(el) AS BIGINT) AS DOUBLE) / count(*)
             |      + 0.5) AS BIGINT) AS cv
             |  FROM u GROUP BY label, pos),
             |cents AS (SELECT label AS cent_id,
             |    list(cv ORDER BY pos) AS cent FROM cm GROUP BY label),
             |dist AS (SELECT e.vec_id, e.label, e.v, c.cent_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, len(e.qv) + 1),
             |        i -> (e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i]))),
             |      (a, t) -> a + t) AS d2
             |  FROM e CROSS JOIN cents c),
             |assigned AS (SELECT vec_id, v, cent_id AS cell FROM (
             |    SELECT vec_id, v, cent_id,
             |      row_number() OVER (PARTITION BY vec_id
             |        ORDER BY d2, cent_id) AS rn
             |    FROM dist) t WHERE rn = 1),
             |scored AS (SELECT p.vec_id AS probe, p.cell AS cell,
             |    c.vec_id AS vec_id, round(${cosSql("p.v", "c.v")}, 4) AS cos
             |  FROM assigned p JOIN assigned c
             |    ON p.vec_id < 8 AND c.vec_id >= 8 AND p.cell = c.cell),
             |ranked AS (SELECT probe, cell, vec_id, cos,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos DESC, vec_id) AS rn
             |  FROM scored)
             |SELECT probe, cell, rn, vec_id, cos FROM ranked
             |WHERE rn <= 3 ORDER BY probe, rn""".stripMargin)),

    // IVF MULTI-PROBE (the recall dial on q59): each probe searches
    // its nprobe=2 nearest cells instead of 1 — the standard fix for
    // the single-probe failure mode where a query sitting near a cell
    // boundary misses neighbors quantized into the adjacent cell.
    // Corpus vectors keep q59's map-side-combine argmin assignment
    // (never a window over N×k rows); only the BOUNDED probe set (8
    // rows × k cells) pays a window for its top-2 cells. Every result
    // row carries `from_cell_rank` (which probe cell found it) and
    // `in_exact_top3` (membership in the exhaustive ranking — the
    // q73 recall-flag pattern), so the probes-vs-recall tradeoff is
    // measured in the output, not asserted from theory. Scale shape:
    // candidates = 2 cells ≈ 2/k of the corpus per probe, probe and
    // exact-top3 tables broadcast, corpus never shuffled.
    QueryDef(
      "q123_ann_ivf_multiprobe",
      (s, d) => {
        val cAgg = udaf(new graft.ops.VectorAggregates.CentroidAgg(64))
        val q = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), col("label"),
            toDouble(col("embedding")).as("v"),
            microQuantize(col("embedding")).as("qv"))
        // cents (one row per label) and probes (8 rows) persist: both
        // are consumed twice, and an unpersisted consumer re-runs the
        // embeddings scan + centroid aggregation each time.
        val cents = q.groupBy(col("label")).agg(cAgg(col("qv")).as("c"))
          .select(col("label").as("cent_id"),
            transform(col("c.sums"), s0 => centroidMicro(s0, col("c.n")))
              .as("cent"))
          .persist()
        // corpus: q59's exact-integer argmin cell assignment (persisted
        // — the candidate join and the exact ranking both read it)
        val corpus = q.filter(col("vec_id") >= 8)
          .join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("v"),
            col("cent_id"), l2DistSq(col("qv"), col("cent")).as("d2"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("d2"), col("cent_id"))).as("m"),
            first(col("v")).as("v"))
          .select(col("vec_id"), col("m.cent_id").as("cell"), col("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // probes: 8 rows — the nprobe window is over 8×k rows, bounded
        val wCell = Window.partitionBy(col("vec_id"))
          .orderBy(col("d2"), col("cent_id"))
        val probes = q.filter(col("vec_id") < 8)
          .join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("v"),
            col("cent_id"), l2DistSq(col("qv"), col("cent")).as("d2"))
          .withColumn("crk", row_number().over(wCell))
          .filter(col("crk") <= 2)
          .select(col("vec_id").as("probe"), col("cent_id").as("pcell"),
            col("crk").as("from_cell_rank"), col("v").as("pv"))
          .persist()
        // exhaustive top-3 per probe — the recall ground truth
        val wE = Window.partitionBy(col("probe"))
          .orderBy(col("cosx").desc, col("vec_id"))
        val exact3 = broadcast(
            probes.filter(col("from_cell_rank") === 1)
              .select(col("probe"), col("pv")))
          .join(corpus, lit(true))
          .select(col("probe"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cosx"))
          .withColumn("ern", row_number().over(wE))
          .filter(col("ern") <= 3)
          .select(col("probe").as("eprobe"), col("vec_id").as("evec"))
        val wC = Window.partitionBy(col("probe"))
          .orderBy(col("cos").desc, col("vec_id"))
        broadcast(probes)
          .join(corpus, col("pcell") === col("cell"))
          .select(col("probe"), col("from_cell_rank"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cos"))
          .withColumn("rn", row_number().over(wC))
          .filter(col("rn") <= 3)
          .join(broadcast(exact3),
            col("probe") === col("eprobe") && col("vec_id") === col("evec"),
            "left")
          .select(col("probe"), col("rn"), col("vec_id"), col("cos"),
            col("from_cell_rank"),
            col("evec").isNotNull.as("in_exact_top3"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             |    list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |u AS (SELECT label, unnest(qv) AS el,
             |    generate_subscripts(qv, 1) AS pos FROM e),
             |cm AS (SELECT label, pos,
             |    CAST(floor(CAST(CAST(sum(el) AS BIGINT) AS DOUBLE) / count(*)
             |      + 0.5) AS BIGINT) AS cv
             |  FROM u GROUP BY label, pos),
             |cents AS (SELECT label AS cent_id,
             |    list(cv ORDER BY pos) AS cent FROM cm GROUP BY label),
             |dist AS (SELECT e.vec_id, e.v, c.cent_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, len(e.qv) + 1),
             |        i -> (e.qv[i] - c.cent[i]) * (e.qv[i] - c.cent[i]))),
             |      (a, t) -> a + t) AS d2
             |  FROM e CROSS JOIN cents c),
             |arnk AS (SELECT vec_id, v, cent_id,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY d2, cent_id) AS crk
             |  FROM dist),
             |corpus AS (SELECT vec_id, v, cent_id AS cell
             |  FROM arnk WHERE crk = 1 AND vec_id >= 8),
             |probes AS (SELECT vec_id AS probe, v AS pv,
             |    cent_id AS pcell, crk AS from_cell_rank
             |  FROM arnk WHERE crk <= 2 AND vec_id < 8),
             |exact AS (SELECT probe, vec_id FROM (
             |    SELECT p.probe, c.vec_id,
             |      row_number() OVER (PARTITION BY p.probe
             |        ORDER BY round(${cosSql("p.pv", "c.v")}, 4) DESC,
             |          c.vec_id) AS ern
             |    FROM (SELECT probe, pv FROM probes WHERE from_cell_rank = 1) p
             |    CROSS JOIN corpus c) t WHERE ern <= 3),
             |cand AS (SELECT p.probe, p.from_cell_rank, c.vec_id,
             |    round(${cosSql("p.pv", "c.v")}, 4) AS cos
             |  FROM probes p JOIN corpus c ON p.pcell = c.cell),
             |ranked AS (SELECT probe, from_cell_rank, vec_id, cos,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos DESC, vec_id) AS rn
             |  FROM cand)
             |SELECT r.probe, r.rn, r.vec_id, r.cos, r.from_cell_rank,
             |  x.vec_id IS NOT NULL AS in_exact_top3
             |FROM ranked r LEFT JOIN exact x
             |  ON r.probe = x.probe AND r.vec_id = x.vec_id
             |WHERE r.rn <= 3 ORDER BY r.probe, r.rn""".stripMargin)),

    // Per-label centroid via the typed Aggregator (SURVEY.md §2b
    // UDF/UDAF row): ONE pass, partial buffers shuffle instead of one
    // row per vector element (the posexplode->groupBy form shuffles
    // dim× more rows — 6.4T at 100 TB scale). Elements are quantized
    // to floor(x*1e6) longs first so partial sums are exact integers:
    // merge-order-independent, hence bit-reproducible in DuckDB —
    // float summation can't promise that across engines. The checked
    // output is posexploded to scalar rows (label, dim, centroid).
    QueryDef(
      "q50_embedding_centroid",
      (s, d) => {
        val cAgg = udaf(new graft.ops.VectorAggregates.CentroidAgg(64))
        embeddings(s, d)
          .select(col("label"), microQuantize(col("embedding")).as("q"))
          .groupBy(col("label"))
          .agg(cAgg(col("q")).as("c"))
          .select(col("label"), col("c.n").as("n_vectors"),
            posexplode(col("c.sums")).as(Seq("dim", "sum_q")))
          // Micro-unit output (centroidMicro): floor(mean + 0.5) in the
          // quantized space — one double division then integer floor,
          // no round() whose tie rules differ between engines (§7.4
          // trap 2). Same helper as q59's coarse quantizer.
          .select(col("label"), col("dim"),
            centroidMicro(col("sum_q"), col("n_vectors"))
              .as("centroid_micro"),
            col("n_vectors"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH e AS (SELECT label,
             |    list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
             |  FROM embeddings),
             |u AS (SELECT label, unnest(q) AS el,
             |    generate_subscripts(q, 1) AS pos FROM e),
             |g AS (SELECT label, pos, CAST(sum(el) AS BIGINT) AS sum_q,
             |    count(*) AS n FROM u GROUP BY label, pos)
             |SELECT label, pos - 1 AS dim,
             |  CAST(floor(CAST(sum_q AS DOUBLE) / n + 0.5) AS BIGINT)
             |    AS centroid_micro,
             |  n AS n_vectors
             |FROM g ORDER BY label, dim""".stripMargin)),

    // Scalar (int8) quantization for ANN — the storage-compression
    // path: each vector stored as 64 bytes (q_i = round(v_i·127/max|v|)
    // ∈ [-127,127]) instead of 256+ float bytes, 4× more corpus per
    // executor. The quantized cosine ranks against the exact ranking
    // (same probes/tie-breaks as q32); `in_q_top5` reports per-row
    // whether the quantized index would have recalled it. Quantized
    // dots stay EXACT cross-engine: products ≤ 127² summed over 64
    // dims sit far inside the double mantissa, so the only float ops
    // are the final division and sqrt — identical in both engines.
    QueryDef(
      "q73_ann_quantized",
      (s, d) => {
        val e = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .withColumn("mx", expr("array_max(transform(v, x -> abs(x)))"))
          .filter(col("mx") > 0)
          // qd: quantized codes carried as exact-integer doubles so the
          // codegen dot/norm kernels apply unchanged.
          .withColumn("qd", expr(
            "transform(v, x -> CAST(CAST(floor(x * 127 / mx + 0.5) AS BIGINT) AS DOUBLE))"))
        val probes = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("probe"), col("v").as("pv"),
            col("qd").as("pq"))
        val corpus = e.filter(col("vec_id") >= 8)
        val scored = broadcast(probes).join(corpus, lit(true))
          .select(col("probe"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cos_exact"),
            round(cosine(col("pq"), col("qd")), 4).as("cos_q"))
        val wE = Window.partitionBy(col("probe"))
          .orderBy(col("cos_exact").desc, col("vec_id"))
        val wQ = Window.partitionBy(col("probe"))
          .orderBy(col("cos_q").desc, col("vec_id"))
        scored
          .withColumn("rn", row_number().over(wE))
          .withColumn("rn_q", row_number().over(wQ))
          .filter(col("rn") <= 5)
          .select(col("probe"), col("rn"), col("vec_id"),
            col("cos_exact"), col("cos_q"),
            (col("rn_q") <= 5).as("in_q_top5"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH e0 AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |e AS (SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) AS mx FROM e0),
             |q AS (SELECT vec_id, v,
             |    list_transform(v, x ->
             |      CAST(CAST(floor(x * 127 / mx + 0.5) AS BIGINT) AS DOUBLE))
             |      AS qd
             |  FROM e WHERE mx > 0),
             |scored AS (SELECT p.vec_id AS probe, c.vec_id AS vec_id,
             |    round(${cosSql("p.v", "c.v")}, 4) AS cos_exact,
             |    round(${cosSql("p.qd", "c.qd")}, 4) AS cos_q
             |  FROM q p JOIN q c ON p.vec_id < 8 AND c.vec_id >= 8),
             |ranked AS (SELECT probe, vec_id, cos_exact, cos_q,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos_exact DESC, vec_id) AS rn,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos_q DESC, vec_id) AS rn_q
             |  FROM scored)
             |SELECT probe, rn, vec_id, cos_exact, cos_q,
             |  rn_q <= 5 AS in_q_top5
             |FROM ranked WHERE rn <= 5 ORDER BY probe, rn""".stripMargin)),

    // PRODUCT QUANTIZATION ANN (the memory-scale path past int8:
    // Jégou et al., the IVF-PQ family every billion-vector index
    // uses): the 64-dim space splits into m=2 orthogonal 32-dim
    // subspaces, each with its own codebook (here the per-label
    // subvector centroids, micro-quantized — the same coarse
    // quantizer q59 uses); a corpus vector stores only its 2 nearest-
    // codeword ids — the 256-byte float vector becomes 2 SMALL INTS,
    // the ~100× compression that lets 100 TB of embeddings sit in
    // cluster memory. Search is ASYMMETRIC DISTANCE (ADC): each probe
    // precomputes its distance TABLE to every codeword per subspace
    // (m × k entries, broadcast-sized), and a candidate's approx
    // distance is one table lookup per subspace, summed — here two
    // broadcast equi-joins on the code ids, never a full-vector op
    // against the corpus. All distances are exact integer L2² in
    // micro units (cross-engine bit-stable). Every result row carries
    // `in_exact_top3` vs the exhaustive full-vector ranking, so the
    // quantization-vs-recall tradeoff is measured in the output.
    QueryDef(
      "q132_ann_pq",
      (s, d) => {
        val cAgg = udaf(new graft.ops.VectorAggregates.CentroidAgg(32))
        val q = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), col("label"),
            microQuantize(col("embedding")).as("qv"))
          .withColumn("q1", slice(col("qv"), 1, 32))
          .withColumn("q2", slice(col("qv"), 33, 32))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Each codebook (10 rows) is consumed twice — encode + the ADC
        // distance table; persist so the centroid aggregation over the
        // corpus cache runs once per subspace, not twice.
        def codebook(sub: String) =
          q.groupBy(col("label")).agg(cAgg(col(sub)).as("c"))
            .select(col("label").as("code"),
              transform(col("c.sums"), s0 => centroidMicro(s0, col("c.n")))
                .as("cw"))
            .persist()
        val (cb1, cb2) = (codebook("q1"), codebook("q2"))
        // encode: nearest codeword per subspace (exact integer L2²,
        // map-side-combined argmin — the q59 assignment shape)
        def encode(sub: String, cb: org.apache.spark.sql.DataFrame,
            out: String) =
          q.filter(col("vec_id") >= 8)
            .join(broadcast(cb), lit(true))
            .select(col("vec_id"), col("code"),
              l2DistSq(col(sub), col("cw")).as("d2"))
            .groupBy(col("vec_id"))
            .agg(min(struct(col("d2"), col("code"))).as("m"))
            .select(col("vec_id"), col("m.code").as(out))
        val codes = encode("q1", cb1, "c1")
          .join(encode("q2", cb2, "c2"), "vec_id")
        // probe ADC tables: probe × codeword distances per subspace
        val probes = q.filter(col("vec_id") < 8)
        def dtable(sub: String, cb: org.apache.spark.sql.DataFrame,
            dcol: String) =
          probes.join(broadcast(cb), lit(true))
            .select(col("vec_id").as("probe"), col("code"),
              l2DistSq(col(sub), col("cw")).as(dcol))
        val t2 = dtable("q2", cb2, "d2")
          .select(col("probe").as("probe2"), col("code").as("code2"),
            col("d2"))
        val scored = codes
          .join(broadcast(dtable("q1", cb1, "d1")),
            col("c1") === col("code"))
          .drop("code")
          .join(broadcast(t2),
            col("probe") === col("probe2") && col("c2") === col("code2"))
          .select(codes("vec_id"), col("probe"),
            (col("d1") + col("d2")).as("approx_d2"))
        val wA = Window.partitionBy(col("probe"))
          .orderBy(col("approx_d2"), col("vec_id"))
        // exhaustive full-vector ground truth (integer L2²)
        val wE = Window.partitionBy(col("probe"))
          .orderBy(col("exact_d2"), col("vec_id"))
        val exact3 = probes
          .select(col("vec_id").as("probe"), col("qv").as("pqv"))
          .join(q.filter(col("vec_id") >= 8)
            .select(col("vec_id"), col("qv")), lit(true))
          .select(col("probe"), col("vec_id"),
            l2DistSq(col("pqv"), col("qv")).as("exact_d2"))
          .withColumn("re", row_number().over(wE))
          .filter(col("re") <= 3)
          .select(col("probe").as("eprobe"), col("vec_id").as("evec"))
        scored
          .withColumn("rn", row_number().over(wA))
          .filter(col("rn") <= 3)
          .join(broadcast(exact3),
            col("probe") === col("eprobe") &&
              col("vec_id") === col("evec"), "left")
          .select(col("probe"), col("rn"), col("vec_id"),
            col("approx_d2"), col("eprobe").isNotNull.as("in_exact_top3"))
          .orderBy(col("probe"), col("rn"))
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |s AS (SELECT vec_id, label, qv,
             |    qv[1:32] AS q1, qv[33:64] AS q2 FROM e),
             |u1 AS (SELECT label, unnest(q1) AS el,
             |    generate_subscripts(q1, 1) AS pos FROM s),
             |cm1 AS (SELECT label, pos,
             |    CAST(floor(CAST(CAST(sum(el) AS BIGINT) AS DOUBLE) / count(*)
             |      + 0.5) AS BIGINT) AS cv
             |  FROM u1 GROUP BY label, pos),
             |cb1 AS (SELECT label AS code, list(cv ORDER BY pos) AS cw
             |  FROM cm1 GROUP BY label),
             |u2 AS (SELECT label, unnest(q2) AS el,
             |    generate_subscripts(q2, 1) AS pos FROM s),
             |cm2 AS (SELECT label, pos,
             |    CAST(floor(CAST(CAST(sum(el) AS BIGINT) AS DOUBLE) / count(*)
             |      + 0.5) AS BIGINT) AS cv
             |  FROM u2 GROUP BY label, pos),
             |cb2 AS (SELECT label AS code, list(cv ORDER BY pos) AS cw
             |  FROM cm2 GROUP BY label),
             |d1 AS (SELECT s.vec_id, c.code,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, 33),
             |        i -> (s.q1[i] - c.cw[i]) * (s.q1[i] - c.cw[i]))),
             |      (a, t) -> a + t) AS d2
             |  FROM s CROSS JOIN cb1 c),
             |d2t AS (SELECT s.vec_id, c.code,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, 33),
             |        i -> (s.q2[i] - c.cw[i]) * (s.q2[i] - c.cw[i]))),
             |      (a, t) -> a + t) AS d2
             |  FROM s CROSS JOIN cb2 c),
             |codes AS (SELECT vec_id,
             |    (SELECT code FROM d1 WHERE d1.vec_id = s.vec_id
             |      ORDER BY d2, code LIMIT 1) AS c1,
             |    (SELECT code FROM d2t WHERE d2t.vec_id = s.vec_id
             |      ORDER BY d2, code LIMIT 1) AS c2
             |  FROM s WHERE vec_id >= 8),
             |scored AS (SELECT p.vec_id AS probe, c.vec_id,
             |    pd1.d2 + pd2.d2 AS approx_d2
             |  FROM s p
             |  JOIN codes c ON p.vec_id < 8
             |  JOIN d1 pd1 ON pd1.vec_id = p.vec_id AND pd1.code = c.c1
             |  JOIN d2t pd2 ON pd2.vec_id = p.vec_id AND pd2.code = c.c2),
             |ranked AS (SELECT probe, vec_id, approx_d2,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY approx_d2, vec_id) AS rn
             |  FROM scored),
             |ex AS (SELECT p.vec_id AS probe, c.vec_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, 65),
             |        i -> (p.qv[i] - c.qv[i]) * (p.qv[i] - c.qv[i]))),
             |      (a, t) -> a + t) AS exact_d2
             |  FROM s p JOIN s c ON p.vec_id < 8 AND c.vec_id >= 8),
             |ex3 AS (SELECT probe, vec_id FROM (
             |    SELECT probe, vec_id, row_number() OVER (
             |      PARTITION BY probe ORDER BY exact_d2, vec_id) AS re
             |    FROM ex) t WHERE re <= 3)
             |SELECT r.probe, r.rn, r.vec_id, r.approx_d2,
             |  ex3.probe IS NOT NULL AS in_exact_top3
             |FROM ranked r LEFT JOIN ex3
             |  ON r.probe = ex3.probe AND r.vec_id = ex3.vec_id
             |WHERE r.rn <= 3 ORDER BY r.probe, r.rn""".stripMargin)),

    // EMBEDDING DISPERSION — per-label diversity as the mean pairwise
    // squared L2 distance, WITHOUT the O(n²) pair expansion: the
    // centroid identity (1/n²)·ΣᵢΣⱼ‖xᵢ−xⱼ‖² = 2·(Σ‖x‖²/n − ‖x̄‖²),
    // cross-multiplied to the all-integer form 2·(n·Q − ‖Σx‖²)/n²
    // with Q = Σ‖x‖². Everything reduces in ONE aggregation pass over
    // the per-dimension explode: per (label, dim) the sums Σq and Σq²
    // — mergeable partials, map-side combine, no vector ever meets
    // another vector. Products widen to DECIMAL(38,0) before summing
    // (Σq² at 1e9 rows exceeds int64). Low dispersion flags a label
    // whose corpus collapsed to near-duplicates — the embedding-side
    // health check next to q31's explicit near-dup pairs.
    QueryDef(
      "q163_embedding_dispersion",
      (s, d) => {
        val dims = embeddings(s, d)
          .select(col("label"), posexplode(microQuantize(col("embedding")))
            .as(Seq("dim", "el")))
          .groupBy(col("label"), col("dim"))
          .agg(count(lit(1)).as("cnt"),
            sum(expr("CAST(el AS DECIMAL(38,0))")).as("s1"),
            sum(expr("CAST(el AS DECIMAL(38,0)) * el")).as("s2"))
        dims.groupBy(col("label"))
          .agg(max(col("cnt")).as("n_vecs"),
            sum(col("s2")).as("q_sum"),
            sum(expr("s1 * s1")).as("ssq"))
          .select(col("label"), col("n_vecs"),
            expr("CAST(q_sum div n_vecs AS BIGINT)").as("mean_norm2_micro2"),
            expr("CAST((2 * (CAST(n_vecs AS DECIMAL(38,0)) * q_sum - ssq))" +
              " div (CAST(n_vecs AS DECIMAL(38,0)) * n_vecs) AS BIGINT)")
              .as("disp_micro2"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT label,
             |    list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
             |  FROM embeddings),
             |u AS (SELECT label, unnest(q) AS el,
             |    generate_subscripts(q, 1) AS pos FROM e),
             |g AS (SELECT label, pos, count(*) AS cnt,
             |    sum(el) AS s1, sum(el * el) AS s2
             |  FROM u GROUP BY label, pos),
             |a AS (SELECT label, max(cnt) AS n_vecs,
             |    sum(s2) AS q_sum, sum(s1 * s1) AS ssq
             |  FROM g GROUP BY label)
             |SELECT label, n_vecs,
             |  CAST(q_sum // n_vecs AS BIGINT) AS mean_norm2_micro2,
             |  CAST((2 * (n_vecs * q_sum - ssq)) // (n_vecs * n_vecs)
             |    AS BIGINT) AS disp_micro2
             |FROM a ORDER BY label""".stripMargin)),

    // EMBEDDING CENTROID DRIFT — the vector-space sibling of q158's
    // train/serve TV drift: split each label's vectors into two
    // deterministic halves (vec_id parity — in production: the train
    // snapshot vs the serving window), compute both halves' centroids
    // in EXACT integer micro space (quantize → sum → integer div;
    // truncation is identical cross-engine, no double division
    // anywhere), and report the squared L2 distance between them. A
    // drifted label means its serving embeddings no longer live where
    // the trained index/classifier expects. Scale note: the drift
    // bound is set by the VALUE RANGE (micro centroids are bounded by
    // max|x|·10⁶), not the corpus size — Σ over 64 dims of (Δc)² caps
    // near 2.6e14 for unit-range vectors, far inside int64 at ANY row
    // count, which is why no DECIMAL widening is needed here. Shape:
    // one narrow posexplode, one (label, half, dim) aggregate —
    // map-side-combinable, corpus-linear.
    QueryDef(
      "q202_centroid_drift",
      (s, d) => {
        val g = embeddings(s, d)
          .select(col("label"), (col("vec_id") % 2).as("half"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .withColumn("el",
            expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"))
          .groupBy(col("label"), col("half"), col("dim"))
          .agg(sum(col("el")).as("sum_q"), count(lit(1)).as("n"))
          .withColumn("c", expr("sum_q div n"))
        val even = g.filter(col("half") === 0)
          .select(col("label"), col("dim"),
            col("c").as("c0"), col("n").as("n0"))
        val odd = g.filter(col("half") === 1)
          .select(col("label"), col("dim"),
            col("c").as("c1"), col("n").as("n1"))
        even.join(odd, Seq("label", "dim"))
          .groupBy(col("label"))
          .agg(max(col("n0")).as("n_even"), max(col("n1")).as("n_odd"),
            sum(expr("(c0 - c1) * (c0 - c1)")).as("drift_sq_micro"))
          .orderBy(col("label"))
      },
      Some("""WITH u AS (
             |  SELECT label, vec_id % 2 AS half, pos,
             |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS el
             |  FROM (SELECT label, vec_id, unnest(embedding) AS x,
             |          generate_subscripts(embedding, 1) AS pos
             |        FROM embeddings)),
             |g AS (
             |  SELECT label, half, pos,
             |    CAST(sum(el) AS BIGINT) // count(*) AS c,
             |    count(*) AS n
             |  FROM u GROUP BY label, half, pos)
             |SELECT e.label, max(e.n) AS n_even, max(o.n) AS n_odd,
             |  CAST(sum((e.c - o.c) * (e.c - o.c)) AS BIGINT)
             |    AS drift_sq_micro
             |FROM g e JOIN g o
             |  ON e.label = o.label AND e.pos = o.pos
             |  AND e.half = 0 AND o.half = 1
             |GROUP BY e.label ORDER BY e.label""".stripMargin)),

    // RANDOM-PROJECTION (Johnson-Lindenstrauss) ANN: project 64-dim
    // vectors onto 8 fixed ±1 directions (Achlioptas's database-
    // friendly JL matrix — signs are pseudorandom but FIXED, derived
    // from the quadratic-mix hash at build time, so every engine and
    // every re-run projects identically), shortlist top-20 per probe
    // by PROJECTED cosine (8 multiply-adds per pair instead of 64 —
    // the 8x per-pair cost cut is the whole point of JL at 100 TB,
    // and it composes with any bucketing scheme), then re-rank the
    // shortlist by exact 64-dim cosine. `in_exact_top3` audits recall
    // against the exhaustive ranking inside the checked result, the
    // q123 pattern. Probes broadcast; the corpus never shuffles.
    QueryDef(
      "q208_random_projection",
      (s, d) => {
        val signs = rpSigns
        val e = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .withColumn("pv", array((0 until 8).map(i =>
            projectDim(col("v"), signs(i))): _*))
        val probes = e.filter(col("vec_id") < 6)
          .select(col("vec_id").as("probe"), col("v").as("qv"),
            col("pv").as("qpv"))
        val corpus = e.filter(col("vec_id") >= 6)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wC = Window.partitionBy(col("probe"))
          .orderBy(col("rp_cos").desc, col("vec_id"))
        val cand = broadcast(probes).join(corpus, lit(true))
          .select(col("probe"), col("vec_id"),
            round(cosine(col("qpv"), col("pv")), 4).as("rp_cos"),
            col("qv"), col("v"))
          .withColumn("crn", row_number().over(wC))
          .filter(col("crn") <= 20)
        val wR = Window.partitionBy(col("probe"))
          .orderBy(col("cos").desc, col("vec_id"))
        val rr = cand
          .select(col("probe"), col("vec_id"),
            round(cosine(col("qv"), col("v")), 4).as("cos"))
          .withColumn("rn", row_number().over(wR).cast("long"))
          .filter(col("rn") <= 3)
        val wE = Window.partitionBy(col("probe"))
          .orderBy(col("cosx").desc, col("vec_id"))
        val exact3 = broadcast(probes)
          .join(corpus, lit(true))
          .select(col("probe"), col("vec_id"),
            round(cosine(col("qv"), col("v")), 4).as("cosx"))
          .withColumn("ern", row_number().over(wE))
          .filter(col("ern") <= 3)
          .select(col("probe").as("eprobe"), col("vec_id").as("evec"))
        rr.join(broadcast(exact3),
            col("probe") === col("eprobe") && col("vec_id") === col("evec"),
            "left")
          .select(col("probe"), col("rn"), col("vec_id"), col("cos"),
            col("evec").isNotNull.as("in_exact_top3"))
          .orderBy(col("probe"), col("rn"))
      },
      Some {
        val projCols = (0 until 8).map { i =>
          val lst = rpSigns(i).map(x =>
            if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
          s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list_transform(range(1, 65),
             |        i -> v[i] * ($lst)[i])),
             |      (s, t) -> s + t)""".stripMargin
        }.mkString(",\n    ")
        s"""WITH e AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |p AS (SELECT vec_id, v, [
           |    $projCols] AS pv FROM e),
           |pr AS (SELECT vec_id AS probe, v AS qv, pv AS qpv
           |  FROM p WHERE vec_id < 6),
           |co AS (SELECT vec_id, v, pv FROM p WHERE vec_id >= 6),
           |rp AS (SELECT pr.probe, co.vec_id,
           |    round(${cosSql("pr.qpv", "co.pv")}, 4) AS rp_cos,
           |    pr.qv, co.v
           |  FROM pr JOIN co ON true),
           |cand AS (SELECT probe, vec_id, qv, v,
           |    row_number() OVER (PARTITION BY probe
           |      ORDER BY rp_cos DESC, vec_id) AS crn
           |  FROM rp),
           |rscore AS (SELECT probe, vec_id,
           |    round(${cosSql("qv", "v")}, 4) AS cos
           |  FROM cand WHERE crn <= 20),
           |rr AS (SELECT probe, vec_id, cos,
           |    row_number() OVER (PARTITION BY probe
           |      ORDER BY cos DESC, vec_id) AS rn
           |  FROM rscore),
           |escore AS (SELECT pr.probe, co.vec_id,
           |    round(${cosSql("pr.qv", "co.v")}, 4) AS cosx
           |  FROM pr JOIN co ON true),
           |ex AS (SELECT probe, vec_id FROM (
           |  SELECT probe, vec_id,
           |    row_number() OVER (PARTITION BY probe
           |      ORDER BY cosx DESC, vec_id) AS ern
           |  FROM escore) WHERE ern <= 3)
           |SELECT r.probe, r.rn, r.vec_id, r.cos,
           |  x.vec_id IS NOT NULL AS in_exact_top3
           |FROM rr r LEFT JOIN ex x
           |  ON r.probe = x.probe AND r.vec_id = x.vec_id
           |WHERE r.rn <= 3 ORDER BY r.probe, r.rn""".stripMargin
      }),

    // INCREMENTAL ANN INDEX MAINTENANCE — IVF off the CHANGE FEED
    // (lakehouse x similarity): the corpus lives in a versioned table;
    // the coarse quantizer (q59's per-label integer-micro centroids)
    // is FROZEN at index build — the standard IVF operating mode,
    // where re-clustering is a rare offline event and ingest only
    // re-ASSIGNS. A drifted batch (every 7th vector sign-flipped)
    // lands via MERGE; maintenance then reads ONLY the CDC
    // postimages/inserts from `changesKeyed` and re-assigns those
    // rows against the frozen broadcast centroids — cost scales with
    // CHANGE VOLUME, not corpus size, which at 100 TB is the
    // difference between an index that keeps up with ingest and one
    // that rebuilds nightly. idx_v1 = idx_v0 minus changed keys plus
    // re-assignments (an anti-join + union, no corpus re-scan).
    // `n_reassigned` rides in the checked result so the oracle pins
    // the maintenance volume, and the probe search runs over the
    // POST-update index: a stale cell for a flipped vector surfaces
    // as a wrong neighbor, not a silent recall drop.
    QueryDef(
      "q219_ann_incremental",
      (s, d) => {
        import graft.sources.VersionedTable
        val cAgg = udaf(new graft.ops.VectorAggregates.CentroidAgg(64))
        val root = java.nio.file.Files
          .createTempDirectory("graft_annidx_").toString
        val emb = embeddings(s, d)
          .select(col("vec_id"), col("label"), col("embedding"))
        VersionedTable.commit(
          emb.filter(col("vec_id") >= 8)
            .repartitionByRange(4, col("vec_id")), root) // v0
        val base = VersionedTable.read(s, root, Some(0L))
          .select(col("vec_id"), col("label"),
            toDouble(col("embedding")).as("v"),
            microQuantize(col("embedding")).as("qv"))
        // frozen quantizer: 10 rows, persisted once — every assign()
        // below broadcasts it instead of re-running the UDAF
        val cents = base.groupBy(col("label")).agg(cAgg(col("qv")).as("c"))
          .select(col("label").as("cent_id"),
            transform(col("c.sums"), s0 => centroidMicro(s0, col("c.n")))
              .as("cent"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def assign(df: org.apache.spark.sql.DataFrame) =
          df.join(broadcast(cents), lit(true))
            .select(col("vec_id"), col("v"), col("cent_id"),
              l2DistSq(col("qv"), col("cent")).as("d2"))
            .groupBy(col("vec_id"))
            .agg(min(struct(col("d2"), col("cent_id"))).as("m"),
              first(col("v")).as("v"))
            .select(col("vec_id"), col("m.cent_id").as("cell"), col("v"))
        val idx0 = assign(base)
        // v1: the drifted batch MERGEs in (sign flip moves a vector to
        // the opposite side of every hyperplane through the origin —
        // guaranteed cell churn to catch a stale index)
        VersionedTable.mergeKeyed(s, root,
          emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 === 0)
            .withColumn("embedding",
              transform(col("embedding"), x => -x)),
          "vec_id")
        val changed = VersionedTable.changesKeyed(s, root, 0L,
            VersionedTable.latestVersion(root), "vec_id")
          .filter(col("_change").isin("insert", "update_postimage"))
          .select(col("vec_id"), toDouble(col("embedding")).as("v"),
            microQuantize(col("embedding")).as("qv"))
        val reassigned = assign(changed)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nre = reassigned.count() // change-volume-sized, audited below
        val idx1 = idx0
          .join(reassigned.select(col("vec_id")), Seq("vec_id"),
            "left_anti")
          .unionByName(reassigned)
        val probes = assign(emb.filter(col("vec_id") < 8)
            .select(col("vec_id"), toDouble(col("embedding")).as("v"),
              microQuantize(col("embedding")).as("qv")))
          .select(col("vec_id").as("probe"), col("cell").as("pcell"),
            col("v").as("pv"))
        val w = Window.partitionBy(col("probe"))
          .orderBy(col("cos").desc, col("vec_id"))
        broadcast(probes).join(idx1, col("pcell") === col("cell"))
          .select(col("probe"), col("pcell").as("cell"), col("vec_id"),
            round(cosine(col("pv"), col("v")), 4).as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("probe"), col("cell"), col("rn"), col("vec_id"),
            col("cos"), lit(nre).as("n_reassigned"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |base AS (SELECT vec_id, label, v,
             |    list_transform(v, x ->
             |      CAST(floor(x * 1000000) AS BIGINT)) AS qv
             |  FROM e WHERE vec_id >= 8),
             |u AS (SELECT label, unnest(qv) AS el,
             |    generate_subscripts(qv, 1) AS pos FROM base),
             |cm AS (SELECT label, pos,
             |    CAST(floor(CAST(CAST(sum(el) AS BIGINT) AS DOUBLE)
             |      / count(*) + 0.5) AS BIGINT) AS cv
             |  FROM u GROUP BY label, pos),
             |cents AS (SELECT label AS cent_id,
             |    list(cv ORDER BY pos) AS cent FROM cm GROUP BY label),
             |fin AS (SELECT vec_id,
             |    CASE WHEN vec_id % 7 = 0
             |      THEN list_transform(v, x -> -x) ELSE v END AS v
             |  FROM e WHERE vec_id >= 8),
             |finq AS (SELECT vec_id, v,
             |    list_transform(v, x ->
             |      CAST(floor(x * 1000000) AS BIGINT)) AS qv FROM fin),
             |prq AS (SELECT vec_id, v,
             |    list_transform(v, x ->
             |      CAST(floor(x * 1000000) AS BIGINT)) AS qv
             |  FROM e WHERE vec_id < 8),
             |idx AS (SELECT vec_id, v, cent_id AS cell FROM (
             |    SELECT f.vec_id, f.v, c.cent_id,
             |      row_number() OVER (PARTITION BY f.vec_id ORDER BY
             |        list_reduce(list_prepend(CAST(0 AS BIGINT),
             |          list_transform(range(1, len(f.qv) + 1),
             |            i -> (f.qv[i] - c.cent[i])
             |               * (f.qv[i] - c.cent[i]))),
             |          (a, t) -> a + t), c.cent_id) AS rn
             |    FROM finq f CROSS JOIN cents c) t WHERE rn = 1),
             |probes AS (SELECT vec_id AS probe, v AS pv,
             |    cent_id AS pcell FROM (
             |    SELECT p.vec_id, p.v, c.cent_id,
             |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
             |        list_reduce(list_prepend(CAST(0 AS BIGINT),
             |          list_transform(range(1, len(p.qv) + 1),
             |            i -> (p.qv[i] - c.cent[i])
             |               * (p.qv[i] - c.cent[i]))),
             |          (a, t) -> a + t), c.cent_id) AS rn
             |    FROM prq p CROSS JOIN cents c) t WHERE rn = 1),
             |scored AS (SELECT p.probe, p.pcell AS cell, i.vec_id,
             |    round(${cosSql("p.pv", "i.v")}, 4) AS cos
             |  FROM probes p JOIN idx i ON p.pcell = i.cell),
             |ranked AS (SELECT probe, cell, vec_id, cos,
             |    row_number() OVER (PARTITION BY probe
             |      ORDER BY cos DESC, vec_id) AS rn
             |  FROM scored)
             |SELECT probe, cell, rn, vec_id, cos,
             |  (SELECT count(*) FROM e
             |   WHERE vec_id >= 8 AND vec_id % 7 = 0) AS n_reassigned
             |FROM ranked WHERE rn <= 3 ORDER BY probe, rn""".stripMargin))
  )

  /** Fixed ±1 JL projection directions (8 x 64): sign = parity of the
    * quadratic-mixed Knuth hash of the flat index — pseudorandom,
    * engine-independent, identical on every run. */
  private lazy val rpSigns: IndexedSeq[IndexedSeq[Double]] =
    (0 until 8).map { i =>
      (0 until 64).map { j =>
        val h0 = ((i.toLong * 64 + j) * 2654435761L) % 1000000007L
        val m = (h0 * h0 + h0) % 1000000007L
        if (m % 2 == 0) 1.0 else -1.0
      }
    }

  /** One JL output coordinate: the left-fold dot of `v` with a
    * constant ±1 direction (same fold order as the DuckDB mirror, so
    * the doubles agree bit-for-bit). */
  private def projectDim(v: org.apache.spark.sql.Column,
      signs: Seq[Double]): org.apache.spark.sql.Column =
    aggregate(zip_with(v, array(signs.map(lit): _*), (x, sgn) => x * sgn),
      lit(0.0), (a, x) => a + x)
}
