package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Deduplication catalog over the `documents` table (SURVEY.md §2b north
  * star): exact, MinHash+LSH, SimHash, and n-gram Jaccard. The testdata
  * plants near-duplicate pairs (3-word-shingle Jaccard ≈ 0.99, verified
  * empirically), so every entry returns a non-degenerate result.
  *
  * Scale design: no unblocked O(n²) comparison anywhere. MinHash and
  * SimHash both generate candidates through a bucket self-join (shuffle
  * on a short key; bucket sizes stay tiny because signatures of
  * non-duplicates are uniform), and only candidates pay the exact
  * verification cost. That is the shape that survives 100 TB.
  *
  * The hash arithmetic is the oracle-parity family from [[TextOps]] so
  * the DuckDB differential check verifies signatures bit-for-bit; the
  * xxhash64 production variants in TextOps are drop-in replacements.
  */
object Dedup {
  import Tables._

  /** DuckDB fragment: per doc, the distinct 3-word string shingles `sh`
    * (for exact-Jaccard verification) and the distinct shingle hashes
    * `hs` composed from per-token polynomial hashes (mirrors
    * [[TextOps.shingleHashes3]] bit-for-bit). */
  private val shingleSqlCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, ws, list_distinct(list_transform(range(1, len(ws) - 1),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      |       FROM t WHERE len(ws) >= 3),
      |th AS (SELECT doc_id, sh, list_transform(ws, w ->
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
      |          (h, c) -> (h*31 + c) % 1000000007)) AS th
      |      FROM sh),
      |h AS (SELECT doc_id, sh, list_distinct(list_transform(range(1, len(th) - 1),
      |        i -> (th[i]*1009 + th[i+1]*9176 + th[i+2]) % 1000000007)) AS hs
      |      FROM th)""".stripMargin

  /** Spark mirror: (doc_id, sh) — string shingles for verification.
    * Repartitioned off the single input split (CPU-bound derivation). */
  private def shingled(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        TextOps.wordShingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Spark mirror of the `h` CTE: (doc_id, sh, hs). The scan is
    * repartitioned first: the testdata table is one parquet file (one
    * input split), and the per-doc hash folds are CPU-bound — without
    * the spread they run on a single core. */
  private def hashed(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        TextOps.wordShingles(TextOps.tokens(col("text")), 3).as("sh"),
        TextOps.shingleHashes3(TextOps.tokens(col("text"))).as("hs"))
      .filter(size(col("sh")) > 0)

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: normalize (lower/trim/collapse-ws) then group — the
    // keep-lowest-id policy used by every dedup pass downstream.
    QueryDef(
      "q27_exact_dedup",
      (s, d) =>
        documents(s, d)
          .withColumn("norm",
            regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          .groupBy(col("norm"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"))
          .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM (SELECT doc_id,
             |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
             |      FROM documents) t
             |GROUP BY norm ORDER BY keep_id""".stripMargin)),

    // MinHash + LSH near-dup pipeline: shingle -> 12-perm signature ->
    // 4 bands x 3 rows -> bucket self-join -> exact-Jaccard verify.
    QueryDef(
      "q28_minhash_lsh",
      (s, d) => {
        // Persist the shingled corpus: it feeds three plan branches
        // (signature build + both sides of the verify join), and
        // without materialization each branch re-derives shingles from
        // raw text — worse, the size(sh)>0 predicate pushes down and
        // inlines the whole shingle expression into every scan's
        // filter, whose generated code is too large for the JIT and
        // runs interpreted (benched minutes instead of seconds). The
        // multi-pass-over-derived-corpus cache is the standard LSH
        // shape at 100 TB too (MEMORY_AND_DISK spills).
        val base = shingled(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Fully codegen'd signature path: explode the shingles, hash
        // each with 12 seeded xxhash64 expressions (whole-stage
        // codegen, no lambda interpretation), take per-doc minima in
        // one hash aggregate — map-side partial agg, and the groupBy
        // doubles as the materialization point for the band fan-out.
        // The oracle runs its own arithmetic MinHash: the two LSH
        // implementations are independent and still agree, because
        // hash values never reach the output — every candidate is
        // verified against exact shingle Jaccard >= 0.7 first.
        val sig = base
          .select(col("doc_id"), explode(col("sh")).as("s"))
          .groupBy(col("doc_id"))
          .agg(min(xxhash64(col("s"), lit(0))).as("m0"),
            (1 until 12).map(j => min(xxhash64(col("s"), lit(j))).as(s"m$j")): _*)
        val bands = sig.select(col("doc_id"), explode(array(
          (0 until 4).map(b => concat_ws(":", lit(b).cast("string") +:
            (0 until 3).map(r => col(s"m${b * 3 + r}").cast("string")): _*)): _*))
          .as("bucket"))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        cand
          .join(base.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
          .join(base.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
          .select(col("a"), col("b"),
            TextOps.jaccard(col("sha"), col("shb")).as("jaccard"))
          .filter(col("jaccard") >= 0.7)
          .orderBy(col("a"), col("b"))
      },
      // The oracle is EXHAUSTIVE: every pair's exact shingle Jaccard
      // (ground truth, no blocking). Matching it end-to-end proves the
      // LSH path has perfect recall at the 0.7 threshold on this data —
      // a stronger differential check than mirroring the banding.
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
             |          FROM documents),
             |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
             |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
             |       FROM t WHERE len(ws) >= 3)
             |SELECT p.doc_id AS a, q.doc_id AS b,
             |  round(len(list_intersect(p.sh, q.sh)) * 1.0 /
             |        len(list_distinct(list_concat(p.sh, q.sh))), 4) AS jaccard
             |FROM sh p JOIN sh q ON p.doc_id < q.doc_id
             |WHERE round(len(list_intersect(p.sh, q.sh)) * 1.0 /
             |            len(list_distinct(list_concat(p.sh, q.sh))), 4) >= 0.7
             |ORDER BY a, b""".stripMargin)),

    // SimHash near-dup: 16-bit signature, candidates from matching
    // 8-bit halves (a hamming<=... match must agree on one half), then
    // exact hamming filter. Charikar-style blocked dedup.
    QueryDef(
      "q29_simhash",
      (s, d) => {
        // Persisted: the signature table feeds both sides of the
        // half-bucket self-join, and materialization stops the un-CSE'd
        // signature expression from being re-evaluated per reference.
        val sim = hashed(s, d)
          .select(col("doc_id"), TextOps.simhash16(col("hs")).as("sim"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val halved = sim.select(col("doc_id"), col("sim"),
          explode(array(
            concat(lit("h"), floor(col("sim") / 256).cast("long").cast("string")),
            concat(lit("l"), (col("sim") % 256).cast("string")))).as("bucket"))
        halved.as("x")
          .join(halved.as("y"),
            col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
            col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
          .distinct()
          .withColumn("hamming",
            expr("bit_count(sim_a ^ sim_b)").cast("int"))
          .filter(col("hamming") <= 3)
          .select(col("a"), col("b"), col("hamming"))
          .orderBy(col("a"), col("b"))
      },
      Some(s"""WITH $shingleSqlCte,
             |sim AS (SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 16)),
             |    (acc, j) -> acc + CASE WHEN
             |        2 * list_reduce(list_prepend(CAST(0 AS BIGINT),
             |              list_transform(hs, h ->
             |                CAST(floor(h / power(2, j)) AS BIGINT) % 2)),
             |              (s, x) -> s + x) > len(hs)
             |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS sim
             |  FROM h),
             |halved AS (SELECT doc_id, sim,
             |  unnest(['h' || CAST(CAST(floor(sim / 256) AS BIGINT) AS VARCHAR),
             |          'l' || CAST(sim % 256 AS VARCHAR)]) AS bucket FROM sim),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
             |           x.sim AS sim_a, y.sim AS sim_b
             |         FROM halved x JOIN halved y
             |           ON x.bucket = y.bucket AND x.doc_id < y.doc_id)
             |SELECT a, b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
             |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
             |ORDER BY a, b""".stripMargin)),

    // n-gram Jaccard, probe-style: a small probe set (doc_id % 50 = 0,
    // broadcastable) scored against the whole corpus. Reports word-SET
    // Jaccard next to 3-gram Jaccard — the sets saturate (tiny shared
    // vocabulary), the shingles discriminate; that contrast is why the
    // pipeline shingles before hashing.
    QueryDef(
      "q30_ngram_jaccard",
      (s, d) => {
        // Persisted for the same reason as q28: probe and corpus sides
        // both read the derived arrays. Repartitioned so the per-doc
        // array building isn't pinned to the single input split.
        val base = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            array_distinct(TextOps.tokens(col("text"))).as("wset"),
            TextOps.wordShingles(TextOps.tokens(col("text")), 3).as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val probes = base.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("a"), col("wset").as("wa"), col("sh").as("sha"))
        probes.join(base.filter(col("doc_id") % 50 =!= 0), lit(true))
          .select(col("a"), col("doc_id").as("b"),
            TextOps.jaccard(col("wa"), col("wset")).as("word_jaccard"),
            TextOps.jaccard(col("sha"), col("sh")).as("shingle_jaccard"))
          .orderBy(col("shingle_jaccard").desc, col("a"), col("b"))
          .limit(50)
      },
      Some("""WITH base AS (SELECT doc_id,
             |    list_distinct(string_split(text, ' ')) AS wset,
             |    list_distinct(list_transform(
             |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             |      i -> string_split(text, ' ')[i] || ' ' ||
             |           string_split(text, ' ')[i+1] || ' ' ||
             |           string_split(text, ' ')[i+2])) AS sh
             |  FROM documents)
             |SELECT p.doc_id AS a, c.doc_id AS b,
             |  round(len(list_intersect(p.wset, c.wset)) * 1.0 /
             |        len(list_distinct(list_concat(p.wset, c.wset))), 4) AS word_jaccard,
             |  round(len(list_intersect(p.sh, c.sh)) * 1.0 /
             |        len(list_distinct(list_concat(p.sh, c.sh))), 4) AS shingle_jaccard
             |FROM base p JOIN base c
             |  ON p.doc_id % 50 = 0 AND c.doc_id % 50 != 0
             |ORDER BY shingle_jaccard DESC, a, b LIMIT 50""".stripMargin)),

    // Embedding-cosine near-dup, IVF-style label blocking: pairs are
    // only formed inside a partition key (label), one shuffle, no n².
    QueryDef(
      "q31_embedding_neardup",
      (s, d) => {
        import graft.ops.VectorOps._
        // Norms precomputed per vector (below the join), so each pair
        // costs ONE fold (the dot product) instead of three. Hoisting
        // sqrt(Σx²) out of the pair expression leaves the arithmetic
        // bit-identical — same values, same order.
        val e = embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
          .withColumn("nrm", l2norm(col("v")))
        e.as("x").join(e.as("y"),
            col("x.label") === col("y.label") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
            round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 4)
              .as("cos"))
          .filter(col("cos") >= 0.3)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH e0 AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |e AS (SELECT vec_id, label, v,
             |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list_transform(range(1, len(v) + 1), i -> v[i] * v[i])),
             |      (s, t) -> s + t)) AS nrm
             |  FROM e0),
             |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
             |  round(
             |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
             |      (s, t) -> s + t)
             |    / (x.nrm * y.nrm), 4) AS cos
             |  FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id)
             |SELECT a, b, cos FROM p WHERE cos >= 0.3 ORDER BY a, b""".stripMargin))
  )
}
