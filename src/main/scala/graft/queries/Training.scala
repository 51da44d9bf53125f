package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shaping catalog (SURVEY.md §2b north star): the steps
  * between a curated corpus and actual model input — fixed-length token
  * chunking, sequence packing into context windows, source-balanced
  * corpus mixing, and embedding k-means for cluster-based curation.
  *
  * Everything is deterministic-by-construction (hash ranks instead of
  * rand(), integer token arithmetic, micro-quantized vector space) so
  * the DuckDB oracle reproduces results bit-for-bit and a production
  * re-run re-materializes the exact same training set — the property
  * a data pipeline needs for reproducible training runs.
  */
object Training {
  import Tables._

  private val P = TextOps.P

  /** Quadratic-mixed key hash (same family as q89's sampler and the HLL
    * kernel: affine-only Knuth leaves sequential ids structured). */
  private def keyHash(key: Column): Column = {
    val h0 = pmod(key * 2654435761L, lit(P))
    (h0 * h0 + h0) % P
  }

  val defs: Seq[QueryDef] = Seq(

    // Fixed-length token chunking with overlap: every document is cut
    // into windows of 32 tokens at stride 24 (8-token overlap carries
    // context across boundaries) — the doc -> training-example split.
    // Purely narrow work: explode chunk starts, slice the token array;
    // no shuffle until the final (display-only) sort, so it scales as
    // a map over the corpus. Each chunk carries the polynomial hash of
    // its joined text: the oracle then verifies chunk CONTENT, not just
    // counts/offsets.
    QueryDef(
      "q101_token_chunking",
      (s, d) => {
        val chunkLen = 32
        val stride = 24
        documents(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
          .select(col("doc_id"), col("ws"),
            explode(sequence(lit(0), size(col("ws")) - 1, lit(stride)))
              .as("start"))
          .select(col("doc_id"), col("start"),
            slice(col("ws"), col("start") + 1, lit(chunkLen)).as("chunk"))
          .select(col("doc_id"),
            (col("start") / stride).cast("long").as("chunk_idx"),
            col("start").cast("long").as("start"),
            size(col("chunk")).cast("long").as("chunk_tokens"),
            TextOps.polyHash(concat_ws(" ", col("chunk"))).as("chunk_hash"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
             |          FROM documents),
             |c AS (SELECT doc_id, ws,
             |        unnest(range(0, len(ws), 24)) AS start FROM t),
             |s AS (SELECT doc_id, start,
             |        ws[start + 1 : least(start + 32, len(ws))] AS chunk
             |      FROM c)
             |SELECT doc_id, start // 24 AS chunk_idx, start,
             |  len(chunk) AS chunk_tokens,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(array_to_string(chunk, ' '), ''),
             |      c -> CAST(ascii(c) AS BIGINT))),
             |    (h, c) -> (h*31 + c) % 1000000007) AS chunk_hash
             |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Sequence packing, concatenate-and-split style: per source, docs
    // are laid out in id order on one token tape and the tape is cut
    // every 512 tokens; a doc belongs to the pack where it STARTS, and
    // `n_straddlers` counts docs crossing a cut (the rows a loader
    // would split across examples). One window cumsum per source — the
    // packing plan is computed without moving any text, and at 100 TB
    // the plan (doc -> pack) is what the materialization job joins
    // back against the corpus.
    QueryDef(
      "q102_sequence_packing",
      (s, d) => {
        val budget = 512L
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        documents(s, d)
          .select(col("source"), col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("start_off", col("cum") - col("n_tokens"))
          .withColumn("pack_id", expr(s"start_off div ${budget}L"))
          .withColumn("straddles",
            expr(s"start_off div ${budget}L") =!= expr(s"(cum - 1) div ${budget}L"))
          .groupBy(col("source"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddlers"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("source"), col("pack_id"))
      },
      Some("""WITH t AS (SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT source, doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS cum
             |  FROM t),
             |p AS (SELECT source, doc_id, n_tokens,
             |    (cum - n_tokens) // 512 AS pack_id,
             |    ((cum - n_tokens) // 512) != ((cum - 1) // 512) AS straddles
             |  FROM c)
             |SELECT source, pack_id, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_straddlers,
             |  min(doc_id) AS first_doc
             |FROM p GROUP BY source, pack_id
             |ORDER BY source, pack_id""".stripMargin)),

    // Source-balanced corpus mixing: every source is downsampled to the
    // smallest source's token total (the max-entropy mix a training run
    // wants when one crawl dominates). Selection is a hash-rank greedy:
    // docs ordered by key hash, kept while the running token total fits
    // the budget — reproducible across retries/partitionings/engines,
    // and the kept set only shrinks-or-grows at the tail when the
    // budget moves (stable under incremental corpus growth, unlike
    // rand() sampling which reshuffles everything). Shapes: one
    // aggregate for totals, a single-row broadcast of the budget, one
    // window cumsum per source.
    QueryDef(
      "q103_corpus_mixing",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("source"), col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("h", keyHash(col("doc_id")))
        val budget = toks.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("tot"))
          .agg(min(col("tot")).as("budget"))
        val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .crossJoin(broadcast(budget))
          .withColumn("keep", col("cum") <= col("budget"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("n_tokens")).as("tokens_total"),
            sum(when(col("keep"), col("n_tokens")).otherwise(0L))
              .as("tokens_kept"),
            max(col("budget")).as("budget"))
          .withColumn("kept_permille",
            expr("tokens_kept * 1000 div tokens_total"))
          .orderBy(col("source"))
      },
      Some(s"""WITH t0 AS (SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    (doc_id * 2654435761) % $P AS h0
             |  FROM documents),
             |t AS (SELECT source, doc_id, n_tokens, (h0*h0 + h0) % $P AS h
             |  FROM t0),
             |b AS (SELECT min(tot) AS budget FROM
             |    (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM t
             |     GROUP BY source)),
             |c AS (SELECT source, doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS cum
             |  FROM t),
             |k AS (SELECT c.*, b.budget, c.cum <= b.budget AS keep
             |  FROM c CROSS JOIN b)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
             |  CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             |    AS tokens_kept,
             |  max(budget) AS budget,
             |  CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             |    * 1000 // CAST(sum(n_tokens) AS BIGINT) AS kept_permille
             |FROM k GROUP BY source ORDER BY source""".stripMargin)),

    // Embedding k-means (2 Lloyd rounds, k=8) — the clustering behind
    // cluster-balanced sampling and semantic dedup of training corpora.
    // Entirely in the shared micro-quantized integer space: distances
    // are exact long sums ([[graft.expressions.VectorExpressions]]
    // L2DistSq: 64 dims of (±2e6)² stays far inside int64), centroid
    // updates are integer-sum means — no float accumulation anywhere,
    // so the result is independent of partition order and merge order,
    // and the oracle unrolls the same two rounds bit-for-bit. Scale
    // shape per round: one broadcast of the k×dim centroid table, one
    // map-side-combined min(struct(dist, cid)) aggregation, one
    // mergeable centroid-sum aggregation — NO driver collect of
    // anything data-sized, rounds are a fixed small count. Seeds are
    // the 8 lowest hash-rank vectors (deterministic, spread by the
    // quadratic mix).
    QueryDef(
      "q104_kmeans_embeddings",
      (s, d) => {
        val k = 8
        val vecs = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id"), VectorOps.microQuantize(col("embedding")).as("q"))
          .withColumn("h", keyHash(col("vec_id")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val init = vecs.orderBy(col("h"), col("vec_id")).limit(k)
          .withColumn("cid",
            row_number().over(Window.orderBy(col("h"), col("vec_id")))
              .cast("long") - 1)
          .select(col("cid"), col("q").as("c"))
        // One Lloyd assignment: nearest centroid per vector, ties to the
        // lowest cid via lexicographic struct min (map-side combined —
        // the k×N candidate rows never shuffle, only N partial minima).
        def assign(cents: DataFrame): DataFrame =
          vecs.crossJoin(broadcast(cents))
            .select(col("vec_id"),
              struct(VectorOps.l2DistSq(col("q"), col("c")).as("d"),
                col("cid").as("cid")).as("dc"))
            .groupBy(col("vec_id")).agg(min(col("dc")).as("m"))
            .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"))
        // Centroid update: exact integer per-dim sums via the mergeable
        // CentroidAgg, then the shared floor(sum/n + 0.5) mean.
        def update(assigned: DataFrame): DataFrame = {
          val cAgg = udaf(new graft.ops.VectorAggregates.CentroidAgg(64))
          assigned.join(vecs.select(col("vec_id"), col("q")), "vec_id")
            .groupBy(col("cid")).agg(cAgg(col("q")).as("s"))
            .select(col("cid"),
              transform(col("s.sums"),
                x => VectorOps.centroidMicro(x, col("s.n"))).as("c"))
        }
        val a1 = assign(init)
        val c1 = update(a1)
        val a2 = assign(c1)
        val l1 = c1.select(col("cid"),
          aggregate(col("c"), lit(0L), (acc, x) => acc + x)
            .as("centroid_l1"))
        a2.groupBy(col("cid"))
          .agg(count(lit(1)).as("n_vectors"), sum(col("d")).as("inertia"))
          .join(l1, "cid")
          .select(col("cid"), col("n_vectors"), col("inertia"),
            col("centroid_l1"))
          .orderBy(col("cid"))
      },
      Some(s"""WITH v0 AS (SELECT vec_id,
             |    list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q,
             |    (vec_id * 2654435761) % $P AS h0
             |  FROM embeddings),
             |v AS (SELECT vec_id, q, (h0*h0 + h0) % $P AS h FROM v0),
             |c0 AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid,
             |    q AS c
             |  FROM v ORDER BY h, vec_id LIMIT 8),
             |d1 AS (SELECT v.vec_id, c.cid,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, len(v.q) + 1),
             |        i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))),
             |      (s, t) -> s + t) AS d
             |  FROM v CROSS JOIN c0 c),
             |a1 AS (SELECT vec_id, cid, d FROM
             |    (SELECT *, row_number() OVER (PARTITION BY vec_id
             |       ORDER BY d, cid) AS rn FROM d1)
             |  WHERE rn = 1),
             |u1 AS (SELECT a.cid, u.pos,
             |    CAST(floor(CAST(sum(u.el) AS DOUBLE) / count(*) + 0.5)
             |      AS BIGINT) AS cv
             |  FROM a1 a JOIN
             |    (SELECT vec_id, unnest(q) AS el,
             |       generate_subscripts(q, 1) AS pos FROM v) u
             |    ON a.vec_id = u.vec_id
             |  GROUP BY a.cid, u.pos),
             |c1 AS (SELECT cid, list(cv ORDER BY pos) AS c FROM u1
             |  GROUP BY cid),
             |d2 AS (SELECT v.vec_id, c.cid,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, len(v.q) + 1),
             |        i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))),
             |      (s, t) -> s + t) AS d
             |  FROM v CROSS JOIN c1 c),
             |a2 AS (SELECT vec_id, cid, d FROM
             |    (SELECT *, row_number() OVER (PARTITION BY vec_id
             |       ORDER BY d, cid) AS rn FROM d2)
             |  WHERE rn = 1),
             |l1 AS (SELECT cid,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), c),
             |      (s, t) -> s + t) AS centroid_l1
             |  FROM c1)
             |SELECT a.cid, count(*) AS n_vectors,
             |  CAST(sum(a.d) AS BIGINT) AS inertia,
             |  max(l.centroid_l1) AS centroid_l1
             |FROM a2 a JOIN l1 l ON a.cid = l.cid
             |GROUP BY a.cid ORDER BY a.cid""".stripMargin))
  )
}
