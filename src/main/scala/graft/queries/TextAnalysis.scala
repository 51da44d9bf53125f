package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Text-analysis catalog over `documents` (SURVEY.md §2b): language-ID
  * heuristic, quality scoring, token counting, and document
  * fingerprinting. All per-document work is embarrassingly parallel
  * (narrow transformations — no shuffle until the final small
  * aggregation), which is exactly what a 100 TB text pipeline wants.
  */
object TextAnalysis {
  import Tables._

  /** Marker word lists per language for the n-gram/stopword-scoring
    * language-ID heuristic. Disjoint subsets of the corpus vocabulary;
    * scoring mechanism is what matters (count marker occurrences,
    * argmax with a fixed tie-break order). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("hash", "join", "merge", "window"),
    "en" -> Seq("the", "data", "query", "table"),
    "es" -> Seq("batch", "stream", "value", "vector"),
    "fr" -> Seq("filter", "sort", "group", "order"),
    "zh" -> Seq("spark", "column", "scan", "key"))

  val defs: Seq[QueryDef] = Seq(

    // Language-ID: score = marker-token occurrences per language,
    // prediction = first language (in fixed order) reaching the max
    // score. Output is the (actual, predicted) confusion matrix.
    QueryDef(
      "q34_lang_id",
      (s, d) => {
        val ws = TextOps.tokens(col("text"))
        val scores = markers.map { case (l, ms) =>
          l -> TextOps.countInSet(ws, ms)
        }
        val pred = markers.map(_._1).foldRight(lit("??")) { case (l, els) =>
          val sl = scores.toMap.apply(l)
          when(scores.filter(_._1 != l).map(_._2)
            .foldLeft(lit(true))((acc, o) => acc && sl >= o), l)
            .otherwise(els)
        }
        documents(s, d)
          .withColumn("predicted", pred)
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some {
        val sc = markers.map { case (l, ms) =>
          l -> s"len(list_filter(string_split(text, ' '), t -> t IN (${ms.map("'" + _ + "'").mkString(",")})))"
        }
        val caseChain = markers.map(_._1).map { l =>
          val sl = sc.toMap.apply(l)
          val ge = sc.filter(_._1 != l).map(o => s"$sl >= ${o._2}").mkString(" AND ")
          s"WHEN $ge THEN '$l'"
        }.mkString(" ")
        s"""SELECT lang, predicted, count(*) AS n_docs
           |FROM (SELECT lang, CASE $caseChain ELSE '??' END AS predicted
           |      FROM documents) t
           |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
      }),

    // Quality scoring: length/stopword/distinctness signals composed
    // into one score per document. Pure narrow projection.
    QueryDef(
      "q35_quality_score",
      (s, d) => {
        val ws = TextOps.tokens(col("text"))
        documents(s, d)
          .withColumn("n_tokens", size(ws))
          .withColumn("stop_ratio",
            round(TextOps.countInSet(ws, Seq("the", "a")) * lit(1.0)
              / col("n_tokens"), 4))
          .withColumn("distinct_ratio",
            round(size(array_distinct(ws)) * lit(1.0) / col("n_tokens"), 4))
          .withColumn("len_score",
            round(least(col("n_tokens") / lit(100.0), lit(1.0)), 4))
          // floor(x*1e4 + 0.5) instead of round(): identical input doubles
          // give identical integers in every engine — round() tie rules
          // (half-up vs banker's) differ between Spark and DuckDB.
          .withColumn("quality",
            floor((col("len_score") * 0.5 + (lit(1.0) - col("stop_ratio")) * 0.3
              + col("distinct_ratio") * 0.2) * 10000 + 0.5).cast("long"))
          .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
            col("distinct_ratio"), col("len_score"), col("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  round(len(list_filter(string_split(text, ' '),
             |      t -> t IN ('the', 'a'))) * 1.0
             |    / len(string_split(text, ' ')), 4) AS stop_ratio,
             |  round(len(list_distinct(string_split(text, ' '))) * 1.0
             |    / len(string_split(text, ' ')), 4) AS distinct_ratio,
             |  round(least(len(string_split(text, ' ')) / 100.0, 1.0), 4)
             |    AS len_score,
             |  CAST(floor((round(least(len(string_split(text, ' ')) / 100.0, 1.0), 4) * 0.5
             |    + (1.0 - round(len(list_filter(string_split(text, ' '),
             |          t -> t IN ('the', 'a'))) * 1.0
             |        / len(string_split(text, ' ')), 4)) * 0.3
             |    + round(len(list_distinct(string_split(text, ' '))) * 1.0
             |        / len(string_split(text, ' ')), 4) * 0.2) * 10000 + 0.5)
             |    AS BIGINT) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Token counting per language: whitespace tokens vs a BPE-ish
    // regex tokenizer ([a-z]+ | digit runs | single non-space symbol).
    QueryDef(
      "q36_token_stats",
      (s, d) =>
        documents(s, d)
          .withColumn("n_ws", size(TextOps.tokens(col("text"))))
          .withColumn("n_bpe",
            size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_ws")).as("total_ws_tokens"),
            sum(col("n_bpe")).as("total_bpe_tokens"),
            round(avg(col("n_ws")), 4).as("avg_ws_tokens"),
            sum(length(col("text"))).as("total_chars"))
          .orderBy(col("lang")),
      // CAST AS BIGINT on the sums: DuckDB sum(INTEGER) is HUGEINT
      // (float64 via pandas) vs Spark's BIGINT — hash-compare fix.
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
             |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
             |    AS BIGINT) AS total_bpe_tokens,
             |  round(avg(len(string_split(text, ' '))), 4) AS avg_ws_tokens,
             |  CAST(sum(length(text)) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Document fingerprinting: rolling polynomial hash of the
    // normalized text — the content-address used for incremental
    // re-crawl dedup. (Production: xxhash64; this is the
    // oracle-parity arithmetic form.)
    QueryDef(
      "q37_fingerprint",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            TextOps.polyHash(
              regexp_replace(lower(trim(col("text"))), "\\s+", " "))
              .as("fingerprint"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(
             |      string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''),
             |      c -> CAST(ascii(c) AS BIGINT))),
             |    (h, c) -> (h*31 + c) % 1000000007) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multimodal metadata plumbing, batch-shaped: documents as opaque
    // binary payloads (utf-8 bytes here; images/audio in production)
    // with derived frame-sampling arithmetic, aggregated per source.
    // The decode itself is stubbed — see graft.ops.Multimodal.
    QueryDef(
      "q38_multimodal_meta",
      (s, d) =>
        documents(s, d)
          .withColumn("n_bytes", octet_length(col("text")))
          .withColumn("n_frames", floor(col("n_bytes") / 64).cast("long"))
          .withColumn("n_sampled", least(col("n_frames"), lit(8)))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("n_frames")).as("total_frames"),
            sum(col("n_sampled")).as("total_sampled"))
          .orderBy(col("source")),
      // CAST AS BIGINT on the sums (DuckDB HUGEINT vs Spark BIGINT).
      Some("""SELECT source, count(*) AS n_media,
             |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  CAST(sum(CAST(floor(octet_length(encode(text)) / 64) AS BIGINT))
             |    AS BIGINT) AS total_frames,
             |  CAST(sum(least(CAST(floor(octet_length(encode(text)) / 64) AS BIGINT), 8))
             |    AS BIGINT) AS total_sampled
             |FROM documents GROUP BY source ORDER BY source""".stripMargin))
  )
}
