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

  /** DuckDB fragment: distinct 3-word shingles per doc (tokens `ws`). */
  private val shingleSqlCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      |       FROM t WHERE len(ws) >= 3),
      |h AS (SELECT doc_id, sh, list_transform(sh, s ->
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
      |          (h, c) -> (h*31 + c) % 1000000007)) AS hs
      |      FROM sh)""".stripMargin

  /** Spark mirror of `shingleSqlCte`: (doc_id, sh, hs). */
  private def shingled(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sh = documents(s, d)
      .select(col("doc_id"),
        TextOps.wordShingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    sh.withColumn("hs", transform(col("sh"), x => TextOps.polyHash(x)))
  }

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
        val base = shingled(s, d)
        val sig = base.withColumn("sig", TextOps.minhashSig(col("hs"), 12))
        val bands = sig.select(col("doc_id"),
          explode(TextOps.lshBands(col("sig"), 4, 3)).as("bucket"))
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
      Some(s"""WITH $shingleSqlCte,
             |sig AS (SELECT doc_id, list_transform(range(0, 12), j ->
             |          list_min(list_transform(hs, h ->
             |            (h*(2*j+1) + j*12345 + 67) % 1000000007))) AS sig
             |        FROM h),
             |bands AS (SELECT doc_id,
             |            unnest(list_transform(range(0, 4), b ->
             |              b::VARCHAR || ':' || sig[b*3+1]::VARCHAR || ':' ||
             |              sig[b*3+2]::VARCHAR || ':' || sig[b*3+3]::VARCHAR)) AS bucket
             |          FROM sig),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |         FROM bands x JOIN bands y
             |           ON x.bucket = y.bucket AND x.doc_id < y.doc_id)
             |SELECT cand.a, cand.b,
             |  round(len(list_intersect(p.sh, q.sh)) * 1.0 /
             |        len(list_distinct(list_concat(p.sh, q.sh))), 4) AS jaccard
             |FROM cand
             |JOIN sh p ON p.doc_id = cand.a
             |JOIN sh q ON q.doc_id = cand.b
             |WHERE round(len(list_intersect(p.sh, q.sh)) * 1.0 /
             |            len(list_distinct(list_concat(p.sh, q.sh))), 4) >= 0.7
             |ORDER BY a, b""".stripMargin)),

    // SimHash near-dup: 16-bit signature, candidates from matching
    // 8-bit halves (a hamming<=... match must agree on one half), then
    // exact hamming filter. Charikar-style blocked dedup.
    QueryDef(
      "q29_simhash",
      (s, d) => {
        val sim = shingled(s, d)
          .select(col("doc_id"), TextOps.simhash16(col("hs")).as("sim"))
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
        val base = documents(s, d).select(col("doc_id"),
          array_distinct(TextOps.tokens(col("text"))).as("wset"),
          TextOps.wordShingles(TextOps.tokens(col("text")), 3).as("sh"))
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
        val e = embeddings(s, d)
          .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
        e.as("x").join(e.as("y"),
            col("x.label") === col("y.label") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
            round(cosine(col("x.v"), col("y.v")), 4).as("cos"))
          .filter(col("cos") >= 0.3)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
             |  round(
             |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
             |      (s, t) -> s + t)
             |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |         list_transform(range(1, len(x.v) + 1), i -> x.v[i] * x.v[i])),
             |         (s, t) -> s + t))
             |     * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |         list_transform(range(1, len(y.v) + 1), i -> y.v[i] * y.v[i])),
             |         (s, t) -> s + t))), 4) AS cos
             |  FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id)
             |SELECT a, b, cos FROM p WHERE cos >= 0.3 ORDER BY a, b""".stripMargin))
  )
}
