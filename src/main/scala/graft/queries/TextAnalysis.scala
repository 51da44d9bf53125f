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
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // TF-IDF-style term weighting, integer-exact: score = tf · N / df
    // in micro units via integer floor-division — the rarity-weighted
    // term score without ln(), whose libm rounding is not guaranteed
    // identical across engines (same monotone ordering in df for fixed
    // tf). Shape: explode → (doc,term) tf → term df → joint score →
    // per-doc top-3 window. df is a term-cardinality aggregate (small);
    // it broadcasts back onto the (doc,term) table.
    QueryDef(
      "q63_tfidf",
      (s, d) => {
        val tf = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score_micro").desc, col("term"))
        tf.join(broadcast(df), "term")
          .crossJoin(broadcast(n))
          .filter(col("doc_id") < 20)
          .withColumn("score_micro",
            expr("tf * 1000000L * n_docs div df"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("tf"),
            col("df"), col("score_micro"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH tfe AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tfe GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
             |    (t.tf * 1000000 * n.n_docs) // d.df AS score_micro
             |  FROM tf t JOIN df d USING (term) CROSS JOIN n
             |  WHERE t.doc_id < 20),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score_micro DESC, term) AS rk FROM sc)
             |SELECT doc_id, rk, term, tf, df, score_micro
             |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // PII redaction: plant deterministic contact strings, then scrub
    // with regex classes portable between Java regex and RE2 (character
    // classes + bounded repeats only — no lookaround, no backrefs).
    // Output carries the match counts, the scrubbed-text fingerprint
    // (compact strong check), and a no-residual flag re-scanning the
    // scrubbed text. DuckDB's regexp_replace needs the 'g' flag to
    // match Spark's replace-all default.
    QueryDef(
      "q64_pii_scrub",
      (s, d) => {
        val emailRe = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
        val phoneRe = "[0-9]{3}-[0-9]{4}"
        documents(s, d)
          .filter(col("doc_id") < 200)
          .withColumn("raw",
            concat(col("text"), lit(" contact: user"), col("doc_id"),
              lit("@mail.example or 555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          // regexp_extract_all via the Column API with lit(), NOT an
          // expr() string: the SQL parser processes backslash escapes
          // in string literals, silently turning the pattern's '\.'
          // into a match-any '.' — a different regex than the scrub
          // and oracle use.
          .withColumn("n_emails",
            size(regexp_extract_all(col("raw"), lit(emailRe), lit(0)))
              .cast("long"))
          .withColumn("n_phones",
            size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0)))
              .cast("long"))
          .withColumn("scrubbed",
            regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"))
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            TextOps.polyHash(col("scrubbed")).as("scrub_hash"),
            (!col("scrubbed").rlike(emailRe) &&
              !col("scrubbed").rlike(phoneRe)).as("no_residual"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH raw AS (SELECT doc_id,
             |    text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
             |    '@mail.example or 555-' ||
             |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
             |  FROM documents WHERE doc_id < 200),
             |scr AS (SELECT doc_id, raw,
             |    regexp_replace(
             |      regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+',
             |        '<EMAIL>', 'g'),
             |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
             |  FROM raw)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+'))
             |    AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}'))
             |    AS BIGINT) AS n_phones,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(scrubbed, ''),
             |      c -> CAST(ascii(c) AS BIGINT))),
             |    (h, c) -> (h*31 + c) % 1000000007) AS scrub_hash,
             |  NOT (regexp_matches(scrubbed, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+')
             |    OR regexp_matches(scrubbed, '[0-9]{3}-[0-9]{4}'))
             |    AS no_residual
             |FROM scr ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified sampling: per-stratum keep-rates
    // applied through a hash of the KEY, not rand() — reproducible
    // across retries, partitionings, and engines (a training-data
    // pipeline must be able to re-materialize the exact sample; a
    // rand()-based sampleBy cannot). Knuth multiplicative hash mod
    // 1000 per-mille selection.
    QueryDef(
      "q67_stratified_sample",
      (s, d) => {
        val rate = when(col("lang") === "en", 500)
          .when(col("lang") === "de", 250).otherwise(100)
        documents(s, d)
          .withColumn("keep",
            pmod(col("doc_id") * 2654435761L, lit(1000L)) < rate)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
            min(when(col("keep"), col("doc_id"))).as("first_kept"),
            max(when(col("keep"), col("doc_id"))).as("last_kept"))
          .withColumn("rate_mille",
            expr("n_sampled * 1000 div n_total"))
          .orderBy(col("lang"))
      },
      Some("""WITH k AS (SELECT lang, doc_id,
             |    (doc_id * 2654435761) % 1000 <
             |      CASE WHEN lang = 'en' THEN 500
             |           WHEN lang = 'de' THEN 250 ELSE 100 END AS keep
             |  FROM documents)
             |SELECT lang, count(*) AS n_total,
             |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_sampled,
             |  min(CASE WHEN keep THEN doc_id END) AS first_kept,
             |  max(CASE WHEN keep THEN doc_id END) AS last_kept,
             |  (CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             |    // count(*) AS rate_mille
             |FROM k GROUP BY lang ORDER BY lang""".stripMargin)),

    // Repetition quality signals (the Gopher-rules family): duplicate
    // word fraction, top-token fraction, duplicate 2-gram fraction —
    // all in exact integer micro units. Word multiset stats come from
    // an explode + two-level aggregation (scales: per-doc token counts
    // partial-aggregate map-side); the 2-gram multiset is a narrow
    // per-row array computation ([[TextOps.wordShinglesAll]] — the
    // NON-distinct form; dedup would erase exactly the signal being
    // measured).
    QueryDef(
      "q68_repetition_signals",
      (s, d) => {
        val ws = TextOps.tokens(col("text"))
        val wordStats = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), explode(ws).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("cnt")).as("top_cnt"))
        val gramStats = documents(s, d)
          .select(col("doc_id"),
            size(TextOps.wordShinglesAll(ws, 2)).cast("long").as("n_grams"),
            size(array_distinct(TextOps.wordShinglesAll(ws, 2))).cast("long")
              .as("n_distinct_grams"))
        wordStats.join(gramStats, "doc_id")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), col("n_tokens"),
            expr("(n_tokens - n_distinct) * 1000000L div n_tokens")
              .as("dup_word_micro"),
            expr("top_cnt * 1000000L div n_tokens").as("top_token_micro"),
            when(col("n_grams") > 0,
              expr("(n_grams - n_distinct_grams) * 1000000L div n_grams"))
              .otherwise(0L).as("dup_2gram_micro"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |wc AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
             |ws AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |    count(*) AS n_distinct, max(cnt) AS top_cnt
             |  FROM wc GROUP BY doc_id),
             |gs AS (SELECT doc_id,
             |    CAST(len(list_transform(range(1, len(string_split(text, ' '))),
             |      i -> string_split(text, ' ')[i] || ' ' ||
             |           string_split(text, ' ')[i+1])) AS BIGINT) AS n_grams,
             |    CAST(len(list_distinct(
             |      list_transform(range(1, len(string_split(text, ' '))),
             |        i -> string_split(text, ' ')[i] || ' ' ||
             |             string_split(text, ' ')[i+1]))) AS BIGINT)
             |      AS n_distinct_grams
             |  FROM documents)
             |SELECT w.doc_id, w.n_tokens,
             |  ((w.n_tokens - w.n_distinct) * 1000000) // w.n_tokens
             |    AS dup_word_micro,
             |  (w.top_cnt * 1000000) // w.n_tokens AS top_token_micro,
             |  CASE WHEN g.n_grams > 0
             |    THEN ((g.n_grams - g.n_distinct_grams) * 1000000) // g.n_grams
             |    ELSE 0 END AS dup_2gram_micro
             |FROM ws w JOIN gs g ON w.doc_id = g.doc_id
             |WHERE w.doc_id < 100 ORDER BY w.doc_id""".stripMargin)),

    // Corpus-curation capstone: the end-to-end training-data filter
    // chain composed from the catalog's own stages — minimum length,
    // stopword-signal (language-bearing docs), then exact dedup
    // keeping the lowest doc_id — with per-source survival accounting
    // at every stage. Each stage is a narrow filter or one aggregation
    // over the survivors; nothing rescans the raw corpus twice. This
    // is the shape of a 100 TB curation run: cheap narrow filters
    // first (cut early, before any shuffle), dedup on the reduced
    // survivor set last.
    QueryDef(
      "q74_corpus_pipeline",
      (s, d) => {
        val ws = TextOps.tokens(col("text"))
        val staged = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .withColumn("n_tokens", size(ws).cast("long"))
          .withColumn("pass_len", col("n_tokens") >= 20)
          .withColumn("pass_stop",
            TextOps.countInSet(ws, Seq("the", "a")) * 100 >= col("n_tokens") * 2)
          .withColumn("norm",
            regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        val keep = staged
          .filter(col("pass_len") && col("pass_stop"))
          .groupBy(col("norm"))
          .agg(min(col("doc_id")).as("keep_id"))
        val kept = staged
          .join(keep, staged("doc_id") === keep("keep_id"))
        staged.groupBy(col("source"))
          .agg(count(lit(1)).as("n_raw"),
            sum(when(col("pass_len"), 1L).otherwise(0L)).as("n_pass_len"),
            sum(when(col("pass_len") && col("pass_stop"), 1L).otherwise(0L))
              .as("n_pass_quality"))
          .join(
            kept.groupBy(col("source"))
              .agg(count(lit(1)).as("n_final"),
                sum(col("n_tokens")).as("final_tokens")),
            Seq("source"))
          .orderBy(col("source"))
      },
      Some("""WITH staged AS (SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    len(string_split(text, ' ')) >= 20 AS pass_len,
             |    len(list_filter(string_split(text, ' '),
             |      t -> t IN ('the', 'a'))) * 100 >=
             |      len(string_split(text, ' ')) * 2 AS pass_stop,
             |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
             |  FROM documents),
             |keep AS (SELECT norm, min(doc_id) AS keep_id FROM staged
             |  WHERE pass_len AND pass_stop GROUP BY norm),
             |kept AS (SELECT s.* FROM staged s JOIN keep k
             |  ON s.doc_id = k.keep_id),
             |raw AS (SELECT source, count(*) AS n_raw,
             |    CAST(sum(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_pass_len,
             |    CAST(sum(CASE WHEN pass_len AND pass_stop THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_pass_quality
             |  FROM staged GROUP BY source),
             |fin AS (SELECT source, count(*) AS n_final,
             |    CAST(sum(n_tokens) AS BIGINT) AS final_tokens
             |  FROM kept GROUP BY source)
             |SELECT r.source, r.n_raw, r.n_pass_len, r.n_pass_quality,
             |  f.n_final, f.final_tokens
             |FROM raw r JOIN fin f ON r.source = f.source
             |ORDER BY r.source""".stripMargin)),

    // One-pass data profiling (the `describe` a lakehouse publishes
    // next to every table): each row fans out to (column, value)
    // pairs via a generator — Catalyst plans a single Expand inside
    // the scan task, NOT one scan per column — then one partial+final
    // aggregation computes null rate, distinct count, and length
    // stats for every column together. Profiling k columns of a
    // 100 TB table costs one read this way; the per-column-query
    // form costs k reads. countDistinct skips NULLs in both engines.
    QueryDef(
      "q91_column_profile",
      (s, d) => {
        documents(s, d)
          .select(explode(array(
            struct(lit("lang").as("c"), col("lang").cast("string").as("v")),
            struct(lit("source").as("c"), col("source").as("v")),
            struct(lit("text").as("c"), col("text").as("v")))).as("kv"))
          .select(col("kv.c").as("column_name"), col("kv.v").as("v"))
          .groupBy(col("column_name"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"),
            min(length(col("v"))).as("min_len"),
            max(length(col("v"))).as("max_len"),
            sum(length(col("v")).cast("long")).as("sum_len"))
          .orderBy(col("column_name"))
      },
      Some("""WITH kv AS (
             |  SELECT 'lang' AS column_name, CAST(lang AS VARCHAR) AS v
             |    FROM documents
             |  UNION ALL SELECT 'source', source FROM documents
             |  UNION ALL SELECT 'text', text FROM documents)
             |SELECT column_name, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_null,
             |  count(DISTINCT v) AS n_distinct,
             |  CAST(min(length(v)) AS INT) AS min_len,
             |  CAST(max(length(v)) AS INT) AS max_len,
             |  CAST(sum(length(v)) AS BIGINT) AS sum_len
             |FROM kv GROUP BY column_name ORDER BY column_name""".stripMargin)),

    // The multimodal pipeline END-TO-END through the typed Dataset path
    // (q38 checks the metadata arithmetic only): documents → binary
    // payload records → batched mapPartitions decode (stub codec:
    // deterministic byte-fold checksum + fake features) → frame
    // sampling. This runs the real Encoders/mapPartitions/batching
    // machinery under the driver's differential check — the corpus is
    // printable ASCII, so the oracle's per-character fold reproduces
    // the stub's per-BYTE checksum exactly (byte == code point here;
    // on non-ASCII payloads only the Spark side is defined).
    QueryDef(
      "q109_multimodal_pipeline",
      (s, d) => {
        val media = graft.ops.Multimodal.fromDocuments(
          documents(s, d).repartition(s.sparkContext.defaultParallelism, col("doc_id")))
        val feats = graft.ops.Multimodal.extractFeatures(media)
        graft.ops.Multimodal.sampleFrames(feats)
          .select(col("media_id"), col("kind"),
            col("n_bytes"), col("checksum"),
            col("n_frames").cast("long").as("n_frames"),
            col("n_sampled").cast("long").as("n_sampled"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    (['image', 'audio', 'video'])[doc_id % 3 + 1] AS kind,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(text, ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |      (h, c) -> (h*31 + c) % 1000000007) AS checksum
             |  FROM documents),
             |f AS (SELECT media_id, kind, n_bytes, checksum,
             |    greatest(1, n_bytes // 64) AS n_frames
             |  FROM m)
             |SELECT media_id, kind, n_bytes, checksum, n_frames,
             |  least(8, (n_frames + 3) // 4) AS n_sampled
             |FROM f ORDER BY media_id""".stripMargin)),

    // REAL image decode through the multimodal path (q109 exercises
    // the batching/Encoder machinery with stub payloads; this entry
    // runs an ACTUAL codec): every document becomes a deterministic
    // grayscale PNG (pixel(i) = (doc_id·31 + i·7) mod 256, JDK PNG
    // writer), and graft.ops.Multimodal.decodeImages reads
    // width/height/pixel-sum back out of the decoded raster with
    // javax.imageio. Gray8 PNG is lossless, so the oracle can state
    // the pixel formula directly — a wrong decode (dimensions,
    // sample order, color model) breaks the hash. Fixture images are
    // tiny (≤ 8×6) so the SQL-side closed form stays cheap; the
    // Spark side is the same batched narrow mapPartitions that would
    // carry full-size frames at 100 TB (payloads never shuffle).
    QueryDef(
      "q124_image_decode",
      (s, d) => {
        import s.implicits._
        val media = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 8 + 1).toInt
            val h = (id % 6 + 1).toInt
            graft.ops.Multimodal.MediaRecord(
              id, "image", graft.ops.Multimodal.syntheticPng(id, w, h),
              w, h, 0)
          }
        graft.ops.Multimodal.decodeImages(media).toDF()
          .select(col("media_id"), col("width"), col("height"),
            col("n_pixels"), col("pixel_sum"), col("decoder"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(doc_id % 8 + 1 AS INT) AS width,
             |  CAST(doc_id % 6 + 1 AS INT) AS height,
             |  CAST((doc_id % 8 + 1) * (doc_id % 6 + 1) AS BIGINT)
             |    AS n_pixels,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(
             |      range(0, (doc_id % 8 + 1) * (doc_id % 6 + 1)),
             |      i -> (doc_id * 31 + i * 7) % 256)),
             |    (a, b) -> a + b) AS BIGINT) AS pixel_sum,
             |  'imageio' AS decoder
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Image RESIZE through the real codec (the thumbnail/preprocess
    // stage of a multimodal training pipeline): decode the q124
    // fixture PNGs, nearest-neighbor-resample to a fixed 4×4, and
    // checksum the RESIZED raster. Nearest-neighbor's index map
    // (src = ⌊dst·srcDim/outDim⌋) is integer-exact, so the oracle
    // composes it with the pixel-generator formula in closed form —
    // a wrong sample order, rounding mode, or up/downscale branch
    // breaks the hash. Same narrow batched stage as q124: at 100 TB
    // the full-resolution payloads live and die inside one
    // mapPartitions pass and only 4×4 summaries move on.
    QueryDef(
      "q126_image_resize",
      (s, d) => {
        import s.implicits._
        val media = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 8 + 1).toInt
            val h = (id % 6 + 1).toInt
            graft.ops.Multimodal.MediaRecord(
              id, "image", graft.ops.Multimodal.syntheticPng(id, w, h),
              w, h, 0)
          }
        graft.ops.Multimodal.resizeImages(media, outW = 4, outH = 4).toDF()
          .select(col("media_id"), col("src_w"), col("src_h"),
            col("width"), col("height"), col("pixel_sum"), col("decoder"))
          .orderBy(col("media_id"))
      },
      // pixel(y2,x2) of the 4×4 = generator(sy·W + sx) with
      // sy = y2·H div 4, sx = x2·W div 4 (j = y2·4 + x2 below)
      Some("""SELECT doc_id AS media_id,
             |  CAST(doc_id % 8 + 1 AS INT) AS src_w,
             |  CAST(doc_id % 6 + 1 AS INT) AS src_h,
             |  CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(range(0, 16), j ->
             |      (doc_id * 31 +
             |        (((j // 4) * (doc_id % 6 + 1) // 4) * (doc_id % 8 + 1)
             |          + ((j % 4) * (doc_id % 8 + 1) // 4)) * 7) % 256)),
             |    (a, b) -> a + b) AS BIGINT) AS pixel_sum,
             |  'imageio' AS decoder
             |FROM documents ORDER BY media_id""".stripMargin)),

    // REAL audio decode through the multimodal path — the WAV/PCM
    // sibling of q124's image codec, extending the multimodal family
    // beyond images with zero added dependencies (javax.sound.sampled
    // is JDK-only, offline-safe). Every document becomes a
    // deterministic 16-bit PCM mono WAV (sample(i) = (doc_id·31 +
    // i·7) mod 65536 − 32768, JDK WAV writer — integer-exact where a
    // float sine would be neither reproducible nor SQL-statable), and
    // Multimodal.decodeAudio reads rate/channels/sample-count back
    // out of the header and the exact sample-sum + energy out of the
    // decoded frames. PCM is lossless, so the oracle states the
    // waveform formula in closed form — a wrong endianness, sign
    // convention, header parse, or channel handling breaks the hash.
    // Clips are tiny (≤ 59 samples) so the SQL closed form stays
    // cheap; the Spark side is the same batched narrow mapPartitions
    // that would carry full-length clips at 100 TB (payloads never
    // shuffle; only fixed-width statistics move on).
    QueryDef(
      "q183_audio_decode",
      (s, d) => {
        import s.implicits._
        val media = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id")).as[Long]
          .map { id =>
            val n = (id % 50 + 10).toInt
            val rate = (8000 + (id % 4) * 4000).toInt
            graft.ops.Multimodal.MediaRecord(
              id, "audio", graft.ops.Multimodal.syntheticWav(id, n, rate),
              0, 0, rate)
          }
        graft.ops.Multimodal.decodeAudio(media).toDF()
          .select(col("media_id"), col("sample_rate"), col("channels"),
            col("n_samples"), col("sample_sum"), col("energy"),
            col("decoder"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
             |  CAST(1 AS INT) AS channels,
             |  CAST(doc_id % 50 + 10 AS BIGINT) AS n_samples,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(range(0, doc_id % 50 + 10),
             |      i -> (doc_id * 31 + i * 7) % 65536 - 32768)),
             |    (a, b) -> a + b) AS BIGINT) AS sample_sum,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(range(0, doc_id % 50 + 10),
             |      i -> ((doc_id * 31 + i * 7) % 65536 - 32768)
             |         * ((doc_id * 31 + i * 7) % 65536 - 32768))),
             |    (a, b) -> a + b) AS BIGINT) AS energy,
             |  'wavpcm' AS decoder
             |FROM documents ORDER BY media_id""".stripMargin)),

    // VIDEO FRAME SAMPLING — the third multimodal axis (images q124,
    // audio q183, now time): clips in a raw-frame container (GVID:
    // header + fixed-size frames; no video codec ships with the JDK,
    // so the container is synthetic but the ACCESS PATTERN is real),
    // decoded frame-SAMPLED — every 3rd frame up to 4 per clip, each
    // frame's stats read from only its own byte range via header
    // offset arithmetic. Unsampled frames are never touched: at
    // 100 TB of video, decode cost scales with frames KEPT, not
    // frames stored — the keyframe-seek property of a real container,
    // exercised end to end. Fixtures are closed-form
    // (pixel = (id·31 + f·17 + p·7) mod 251), so the oracle states
    // every sampled frame's exact pixel sum from the raw table; a
    // wrong offset, stride, or sign in the byte decode breaks the
    // hash, not just a count.
    QueryDef(
      "q217_video_frame_sample",
      (s, d) => {
        import s.implicits._
        val media = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id")).as[Long]
          .map { id =>
            val n = (id % 17 + 4).toInt
            graft.ops.Multimodal.MediaRecord(
              id, "video", graft.ops.Multimodal.syntheticVideo(id, n, 8, 6),
              8, 6, 0)
          }
        graft.ops.Multimodal.sampleVideoFrames(media, stride = 3, maxN = 4)
          .toDF()
          .select(col("media_id"), col("n_frames"), col("frame_idx"),
            col("frame_sum"), col("decoder"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(doc_id % 17 + 4 AS INT) AS n_frames,
             |  CAST(f AS INT) AS frame_idx,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(range(0, 48),
             |      p -> (doc_id * 31 + f * 17 + p * 7) % 251)),
             |    (a, b) -> a + b) AS BIGINT) AS frame_sum,
             |  'gvid' AS decoder
             |FROM documents, (SELECT unnest([0, 3, 6, 9]) AS f) fr
             |WHERE f < doc_id % 17 + 4
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // MULTI-PATTERN MATCH (Aho–Corasick) — blocklist/keyword tagging
    // in ONE pass over each document: the automaton is built once from
    // the pattern list on the driver (O(pattern chars) state, ships in
    // the closure like a broadcast), and every pattern's occurrences —
    // overlapping included, "scan" inside "scan query", "a a" twice in
    // "a a a" — are counted per position via dictionary-suffix links.
    // The naive alternative at 100 TB is one corpus scan (or one LIKE)
    // PER pattern; this is one scan total, no shuffle until the
    // 5-row aggregate. The oracle recomputes overlapping-substring
    // counts positionally, so a wrong failure link or a dropped
    // overlap breaks the hash.
    QueryDef(
      "q218_multi_pattern",
      (s, d) => {
        import s.implicits._
        val patterns =
          Seq("a a", "scan", "scan query", "table table", "value part")
        val ac = graft.ops.AhoCorasick.build(patterns)
        documents(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (_, t) =>
            val c = ac.countAll(t)
            // emit zeros too: the aggregate below needs doc counts per
            // pattern even when a pattern never fires
            patterns.indices.map(i => (patterns(i), c(i)))
          }
          .toDF("pattern", "cnt")
          .groupBy("pattern")
          .agg(sum(col("cnt")).as("n_matches"),
            sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_docs"))
          .orderBy(col("pattern"))
      },
      Some("""WITH pats AS (
             |  SELECT * FROM (VALUES ('a a'), ('scan'), ('scan query'),
             |    ('table table'), ('value part')) p(pattern)),
             |per_doc AS (
             |  SELECT d.doc_id, p.pattern,
             |    len(list_filter(range(0, len(d.text) - len(p.pattern) + 1),
             |      i -> substr(d.text, CAST(i + 1 AS INT),
             |             len(p.pattern)) = p.pattern)) AS cnt
             |  FROM documents d, pats p)
             |SELECT pattern,
             |  CAST(sum(cnt) AS BIGINT) AS n_matches,
             |  CAST(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_docs
             |FROM per_doc GROUP BY pattern ORDER BY pattern""".stripMargin)),

    // BPE ENCODE — the APPLY side of q155's trainer (tokenization at
    // corpus scale, the step that actually runs on 100 TB): train 4
    // merge rules (m=1, exact-greedy), then tokenize EVERY document by
    // applying the rules in priority order — each rule one greedy
    // left-to-right fold, chained in step order, which reproduces the
    // trainer's own final encoding for in-corpus words by
    // construction. The merge table is driver-side (it IS the model)
    // and enters the plan as literals — the degenerate broadcast — so
    // the whole encode is ONE NARROW PASS over the corpus: no shuffle
    // until the per-doc aggregate, the shape that tokenizes 100 TB.
    // Output is per-doc word/token counts plus an order-independent
    // sum of per-word encoding polyhashes — the oracle re-derives the
    // same 4 rules and replays the same folds, so a wrong rule order,
    // fold semantics, or separator handling breaks the hash (not just
    // the counts).
    QueryDef(
      "q184_bpe_encode",
      (s, d) => {
        val docs = documents(s, d)
        val (steps, _) = graft.ops.BpeTrainer.train(
          docs, rounds = 4, batchM = 1, audit = false)
        val Sep = graft.ops.BpeTrainer.Sep
        val enc0 = concat_ws(Sep, split(col("word"), ""))
        val encN = steps.sortBy(_.step).map(st => (st.lhs, st.rhs))
          .foldLeft(enc0)((e, r) =>
            graft.ops.BpeTrainer.applyMerges(e, Seq(r)))
        docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
          .filter(col("word") =!= "")
          .withColumn("enc", encN)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(size(split(col("enc"), Sep)).cast("long")).as("n_tokens"),
            sum(TextOps.polyHash(col("enc"))).as("enc_hash_sum"))
          .orderBy(col("doc_id"))
      },
      Some(bpeEncodeOracle)),

    // REPETITION QUALITY FILTER (the Gopher/Rae '21 repetition rules,
    // the n-gram half): a document whose 3-gram stream is dominated
    // by repeats is boilerplate/spam — score every doc by (1) its
    // duplicate-3-gram ratio (1 − distinct/total) and (2) the share
    // of its single most frequent 3-gram, both in exact integer ppm,
    // and flag docs crossing the 200k/100k thresholds. Shape: one
    // narrow explode of ALL 3-gram occurrences (duplicates kept —
    // that IS the signal; codegen'd WordShingles), one map-side-
    // combined (doc, shingle) count, one per-doc aggregate — a single
    // shuffle keyed by doc_id either way, the corpus-linear QA pass a
    // 100 TB cleaner runs before training. Top-20 worst by dup ratio.
    QueryDef(
      "q187_repetition_filter",
      (s, d) => {
        val sh = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), col("source"),
            explode(TextOps.wordShinglesAll(TextOps.tokens(col("text")), 3))
              .as("sh"))
          .groupBy(col("doc_id"), col("source"), col("sh"))
          .agg(count(lit(1)).as("c"))
        sh.groupBy(col("doc_id"), col("source"))
          .agg(sum(col("c")).as("n_sh"),
            count(lit(1)).as("n_distinct"),
            max(col("c")).as("max_c"))
          .withColumn("dup_ppm",
            expr("(n_sh - n_distinct) * 1000000 div n_sh"))
          .withColumn("top_ngram_ppm", expr("max_c * 1000000 div n_sh"))
          .withColumn("flagged",
            col("dup_ppm") > 200000 || col("top_ngram_ppm") > 100000)
          .orderBy(col("dup_ppm").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
             |  FROM documents),
             |sh AS (SELECT doc_id, source,
             |    unnest(list_transform(range(1, len(ws) - 1),
             |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
             |  FROM t WHERE len(ws) >= 3),
             |cnt AS (SELECT doc_id, source, sh, count(*) AS c
             |  FROM sh GROUP BY 1, 2, 3),
             |agg AS (SELECT doc_id, source,
             |    CAST(sum(c) AS BIGINT) AS n_sh,
             |    CAST(count(*) AS BIGINT) AS n_distinct,
             |    CAST(max(c) AS BIGINT) AS max_c
             |  FROM cnt GROUP BY 1, 2)
             |SELECT doc_id, source, n_sh, n_distinct, max_c,
             |  (n_sh - n_distinct) * 1000000 // n_sh AS dup_ppm,
             |  max_c * 1000000 // n_sh AS top_ngram_ppm,
             |  ((n_sh - n_distinct) * 1000000 // n_sh > 200000
             |    OR max_c * 1000000 // n_sh > 100000) AS flagged
             |FROM agg
             |ORDER BY dup_ppm DESC, doc_id LIMIT 20""".stripMargin)),

    // Inverted-index construction (the search-index build): term →
    // sorted posting list of containing docs, stopwords excluded by
    // RANK (the 5 highest-df terms — scale-stable where an absolute
    // df band is not: df grows linearly with the corpus). TWO-PASS
    // shape on purpose: pass 1 computes df and fixes the kept term
    // set (vocabulary-sized — it broadcasts); pass 2 collects
    // postings ONLY for kept terms. Collecting first and filtering
    // after would materialize the full posting list of every stopword
    // ("the" at 100 TB is millions of doc ids in one aggregation
    // buffer — the collect-then-filter OOM). Postings are emitted as
    // a bounded head plus an exact id-sum so the oracle checks list
    // CONTENT without shipping unbounded arrays.
    QueryDef(
      "q110_inverted_index",
      (s, d) => {
        val pairs = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("term"))
        val dfreq = pairs.groupBy(col("term"))
          .agg(count(lit(1)).as("df"))
          // vocabulary-sized table: the single-partition rank window
          // is over term COUNT, not corpus rows
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") > 5).drop("rk")
        pairs.join(broadcast(dfreq), "term")
          .groupBy(col("term"), col("df"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
            sum(col("doc_id")).as("postings_sum"))
          .select(col("term"), col("df"),
            array_join(slice(col("ids"), 1, 10), ",").as("head10"),
            col("postings_sum"))
          .orderBy(col("term"))
      },
      Some("""WITH pairs AS (SELECT DISTINCT doc_id,
             |    unnest(list_distinct(string_split(text, ' '))) AS term
             |  FROM documents),
             |df0 AS (SELECT term, count(*) AS df,
             |    row_number() OVER (ORDER BY count(*) DESC, term) AS rk
             |  FROM pairs GROUP BY term),
             |df AS (SELECT term, df FROM df0 WHERE rk > 5),
             |p AS (SELECT f.term, f.df,
             |    list(p.doc_id ORDER BY p.doc_id) AS ids,
             |    CAST(sum(p.doc_id) AS BIGINT) AS postings_sum
             |  FROM pairs p JOIN df f ON p.term = f.term
             |  GROUP BY f.term, f.df)
             |SELECT term, df,
             |  array_to_string(ids[1:10], ',') AS head10,
             |  postings_sum
             |FROM p ORDER BY term""".stripMargin)),

    // BM25 ranking (the retrieval scorer layered on q63's tf/df and
    // q110's index): score every document against a fixed probe query.
    // Integer-exact rational BM25 — ln() is not cross-engine stable
    // (libm rounding), so idf keeps its rational core (N-df+.5)/(df+.5)
    // un-logged: a strictly monotone transform of the classic idf, so
    // per-term ranking is preserved, and what matters here (identical
    // arithmetic both engines) is exact. With k1=1.2, b=0.75 and
    // everything scaled to integers:
    //   avgdl_milli = 1000·T/N        (corpus constant, one agg)
    //   dlr_milli   = 1e6·dl/avgdl_milli            (≈ 1000·dl/avgdl)
    //   score_micro = 22e9·tf·(2N-2df+1)
    //                 / ((2df+1)·(10000·tf + 3000 + 9·dlr_milli))
    // Scale shape: postings filtered to the probe terms map-side (the
    // probe is a literal set), df/N/T are broadcast scalars, one
    // integer-sum groupBy per doc (order-independent — float-sum order
    // would diverge between engines), top-20 TakeOrdered. Overflow
    // posture: the numerator 22e9·tf·(2N−2df+1) runs in DECIMAL(38,0)
    // — long math would wrap past tf·N ≈ 2e8 (~2e6 docs at this
    // corpus's ≤100-token tf, ~sf 40) and silently corrupt rankings
    // in non-ANSI mode; 38 digits hold to ~1e25 docs. The quotient
    // lands back in long range (score_micro ≤ 22e9·N/df/1e4, a long
    // through N ≈ 4e17 even at df=1). dl alone is int32 (size()) and
    // is widened explicitly below.
    QueryDef(
      "q112_bm25",
      (s, d) => {
        val probe = Seq("query", "join", "table", "spark")
        // Persisted: the tf branch and the corpus-constant aggregate
        // both read the tokenization; unpersisted, every run scans and
        // regex-splits the full text twice (the q29 lesson).
        val docs = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
          .persist()
        val tf = docs
          .select(col("doc_id"), size(col("ws")).as("dl"),
            explode(col("ws")).as("term"))
          .filter(col("term").isin(probe: _*))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val corpus = docs.agg(count(lit(1)).as("n_docs"),
          sum(size(col("ws"))).as("n_tokens"))
        tf.join(broadcast(dfc), "term")
          .crossJoin(broadcast(corpus))
          .withColumn("avgdl_milli", expr("n_tokens * 1000 div n_docs"))
          // dl is int32 (size()): the 1000000L literal widens the
          // multiply to long BEFORE it can overflow int32 on a >2147-
          // token document (ANSI mode would throw; non-ANSI would wrap
          // negative and silently diverge from the BIGINT oracle).
          .withColumn("dlr_milli", expr("dl * 1000000L div avgdl_milli"))
          .withColumn("score_micro", expr(
            """CAST(tf AS DECIMAL(38,0)) * 22000000000 * (2 * n_docs - 2 * df + 1)
              | div (CAST(2 * df + 1 AS DECIMAL(38,0))
              |      * (10000 * tf + 3000 + 9 * dlr_milli))"""
              .stripMargin))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms_hit"),
            sum(col("score_micro")).as("bm25_micro"))
          .orderBy(col("bm25_micro").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws
             |  FROM documents),
             |tfe AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term
             |  FROM docs),
             |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tfe
             |  WHERE term IN ('query', 'join', 'table', 'spark')
             |  GROUP BY 1, 2, 3),
             |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |corpus AS (SELECT count(*) AS n_docs,
             |    CAST(sum(len(ws)) AS BIGINT) AS n_tokens FROM docs),
             |scored AS (SELECT t.doc_id,
             |    CAST(CAST(t.tf AS HUGEINT) * 22000000000
             |        * (2 * c.n_docs - 2 * d.df + 1)
             |      // (CAST(2 * d.df + 1 AS HUGEINT) * (10000 * t.tf + 3000 +
             |         9 * (t.dl * 1000000 // (c.n_tokens * 1000 // c.n_docs))))
             |      AS BIGINT) AS score_micro
             |  FROM tf t JOIN dfc d USING (term) CROSS JOIN corpus c)
             |SELECT doc_id, count(*) AS n_terms_hit,
             |  CAST(sum(score_micro) AS BIGINT) AS bm25_micro
             |FROM scored GROUP BY doc_id
             |ORDER BY bm25_micro DESC, doc_id LIMIT 20""".stripMargin)),

    // Paragraph-level cross-corpus dedup (the C4/RefinedWeb line-dedup
    // op, the granularity between q27's whole-doc and q99's n-gram
    // membership): split every doc into non-overlapping 8-token units,
    // keep each distinct unit's FIRST occurrence corpus-wide (smallest
    // (doc_id, pos)), and report per-source survival. First-wins needs
    // a total order, not just min(doc_id) — one doc can repeat a unit
    // internally, and dropping both copies would over-delete.
    // Scale shape: explode units (narrow), ONE shuffle on the unit
    // text for the row_number window (state per unit = its occurrence
    // list; at 100 TB hash the unit to a 128-bit key and window on the
    // hash), then a per-source integer aggregation. No joins at all.
    QueryDef(
      "q113_paragraph_dedup",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("unit")).orderBy(col("doc_id"), col("pos"))
        documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), col("source"),
            posexplode(expr(
              """transform(sequence(0, cast(ceil(size(split(text, ' ')) / 8.0)
                | as int) - 1),
                | i -> concat_ws(' ', slice(split(text, ' '), i * 8 + 1, 8)))"""
                .stripMargin)))
          .withColumnRenamed("col", "unit")
          .withColumn("rn", row_number().over(w))
          .withColumn("kept", col("rn") === 1)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_units"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("kept"), 0L)
              .otherwise(size(split(col("unit"), " ")))).as("tokens_removed"))
          .withColumn("permille_kept", expr("n_kept * 1000 div n_units"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (SELECT doc_id, source,
             |    string_split(text, ' ') AS ws FROM documents),
             |units AS (SELECT doc_id, source, u.i AS pos,
             |    array_to_string(ws[u.i * 8 + 1 : u.i * 8 + 8], ' ') AS unit
             |  FROM docs,
             |    LATERAL (SELECT unnest(range(0,
             |      CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS i) u),
             |ranked AS (SELECT source, unit,
             |    row_number() OVER (PARTITION BY unit
             |      ORDER BY doc_id, pos) AS rn
             |  FROM units)
             |SELECT source, count(*) AS n_units,
             |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept,
             |  CAST(sum(CASE WHEN rn = 1 THEN 0
             |    ELSE len(string_split(unit, ' ')) END) AS BIGINT)
             |    AS tokens_removed,
             |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    * 1000 // count(*) AS permille_kept
             |FROM ranked GROUP BY source ORDER BY source""".stripMargin)),

    // Collocation mining — adjacent-bigram LIFT, the no-log PMI
    // variant (log() is not cross-engine stable; lift = the same
    // ranking signal as PMI, exact in integers):
    //   lift_micro = n_ab · N · 1e6  div  (n_a · n_b)
    // over DIRECTED adjacent bigrams with duplicates kept (the
    // multiset — a doc repeating a phrase strengthens it). Adjacency
    // bounds pair generation at N-1 bigrams per corpus, where
    // unrestricted co-occurrence would be quadratic per doc. Counts
    // join map-side (token/bigram vocab broadcast; domain scale
    // shuffles on the token instead, same shape). Overflow posture:
    // both product chains (n_ab·N·1e6 and n_a·n_b) run in
    // DECIMAL(38,0) — long math would wrap past N ≈ 2.7e6 corpus
    // tokens (~sf 1), silently reordering results in non-ANSI mode;
    // 38 digits cover any corpus this engine targets. The quotient is
    // back in long range by construction (lift ≤ 1e6·N / n_b ≤ 1e6·N).
    QueryDef(
      "q119_collocations",
      (s, d) => {
        val toks = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(TextOps.tokens(col("text")).as("ws"))
          .persist()
        val unigrams = toks.select(explode(col("ws")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
        val n = toks.select(explode(col("ws")).as("w"))
          .agg(count(lit(1)).as("n_tokens"))
        val bigrams = toks
          .select(explode(TextOps.wordShinglesAll(col("ws"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
        bigrams
          .withColumn("w1", split(col("bigram"), " ").getItem(0))
          .withColumn("w2", split(col("bigram"), " ").getItem(1))
          .join(broadcast(unigrams).withColumnRenamed("w", "w1")
            .withColumnRenamed("n_w", "n_a"), "w1")
          .join(broadcast(unigrams).withColumnRenamed("w", "w2")
            .withColumnRenamed("n_w", "n_b"), "w2")
          .crossJoin(broadcast(n))
          .withColumn("lift_micro",
            expr("""CAST(n_ab AS DECIMAL(38,0)) * n_tokens * 1000000
                   | div (CAST(n_a AS DECIMAL(38,0)) * n_b)""".stripMargin))
          .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
            col("lift_micro"))
          .orderBy(col("lift_micro").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH docs AS (SELECT string_split(text, ' ') AS ws
             |  FROM documents),
             |uni AS (SELECT unnest(ws) AS w FROM docs),
             |unigrams AS (SELECT w, count(*) AS n_w FROM uni GROUP BY w),
             |n AS (SELECT count(*) AS n_tokens FROM uni),
             |bi AS (SELECT unnest(list_transform(
             |    range(1, greatest(len(ws), 1)),
             |    i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM docs),
             |bigrams AS (SELECT bigram, count(*) AS n_ab FROM bi
             |  GROUP BY bigram HAVING count(*) >= 5)
             |SELECT b.bigram, b.n_ab, a1.n_w AS n_a, a2.n_w AS n_b,
             |  CAST(CAST(b.n_ab AS HUGEINT) * n.n_tokens * 1000000
             |    // (CAST(a1.n_w AS HUGEINT) * a2.n_w) AS BIGINT)
             |    AS lift_micro
             |FROM bigrams b
             |JOIN unigrams a1 ON a1.w = string_split(b.bigram, ' ')[1]
             |JOIN unigrams a2 ON a2.w = string_split(b.bigram, ' ')[2]
             |CROSS JOIN n
             |ORDER BY lift_micro DESC, bigram LIMIT 20""".stripMargin)),

    // Unigram-LM surprisal scoring (the CCNet/KenLM-style perplexity
    // filter, the standard "does this doc look like the corpus"
    // quality gate): per-token surprisal ≈ -log2 p(token) computed
    // INTEGER-EXACTLY as length(bin(N div c)) = floor(log2(N/c))+1 —
    // log()/ln() are not cross-engine stable, but the binary digit
    // count of an integer is, and it is a monotone step transform of
    // the true surprisal, so ranking is preserved. Per doc: token
    // count, total bits, and millibits/token (integer division — no
    // float means no cross-engine drift); output = the 20 most
    // surprising (least corpus-like) docs, the ones the filter would
    // drop. Scale shape: tokenization is narrow; the vocab is one
    // map-side-combined groupBy whose size grows SUBlinearly (Heaps'
    // law) so it broadcasts back onto the token stream (at true
    // domain scale swap the hint for a shuffle join — the plan is
    // otherwise unchanged); the corpus total is a single-row
    // broadcast. The token derivation is persisted: vocab build and
    // scoring both read it, and re-deriving means re-splitting every
    // document.
    QueryDef(
      "q129_unigram_surprisal",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("t"))
          .filter(col("t") =!= "")
          .persist()
        val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
        val tot = vocab.agg(sum(col("c")).as("n_total"))
        toks
          .join(broadcast(vocab), "t")
          .crossJoin(broadcast(tot))
          .withColumn("bits", length(bin(expr("n_total div c"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("bits")).as("total_bits"))
          .withColumn("millibits_per_token",
            expr("(total_bits * 1000) div n_tokens"))
          .orderBy(col("millibits_per_token").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, t FROM documents,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> x <> '')) AS u(t)),
             |vocab AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vocab),
             |scored AS (
             |  SELECT doc_id, length(bin(n_total // c)) AS bits
             |  FROM toks JOIN vocab USING (t) CROSS JOIN tot),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_tokens,
             |    CAST(sum(bits) AS BIGINT) AS total_bits
             |  FROM scored GROUP BY doc_id)
             |SELECT doc_id, n_tokens, total_bits,
             |  (total_bits * 1000) // n_tokens AS millibits_per_token
             |FROM agg
             |ORDER BY millibits_per_token DESC, doc_id LIMIT 20""".stripMargin)),

    // BPE vocabulary-induction step (tokenizer training): the
    // highest-frequency adjacent symbol pair across the corpus is the
    // next merge — this entry computes the full candidate table for
    // one round at character level (multiset counts: repeats within
    // and across tokens all strengthen the pair, exactly BPE's count).
    // Generation is bounded at length-1 pairs per token (adjacency,
    // never all-pairs), fully narrow until one map-side-combined
    // groupBy over a domain bounded by |alphabet|^2 — at 100 TB the
    // reduce side is tiny no matter the corpus, the canonical
    // heavy-fanout-in, bounded-key-domain aggregation. Top-20 by
    // count with pair tie-break = the merges a tokenizer trainer
    // would take.
    QueryDef(
      "q131_bpe_pair_merge",
      (s, d) => {
        documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("t"))
          .filter(length(col("t")) >= 2) // sequence(1,0) DESCENDS in
          // Spark (vs DuckDB range(1,1) = empty): 1-char tokens have
          // no pair and must be excluded before the transform
          .select(explode(expr(
            "transform(sequence(1, length(t) - 1), " +
              "i -> substring(t, i, 2))")).as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT t FROM documents,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> length(x) >= 2)) AS u(t)),
             |pairs AS (
             |  SELECT p FROM toks,
             |    unnest(list_transform(range(1, length(t)),
             |      i -> substring(t, i, 2))) AS v(p))
             |SELECT p AS pair, count(*) AS n FROM pairs
             |GROUP BY p ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // BPE TOKENIZER TRAINING — k=6 greedy merge rounds (Sennrich'16),
    // the multi-round completion of q131's single step, via
    // ops.BpeTrainer with batchM=1: the oracle pins EXACT sequential-
    // greedy semantics (one global argmax per merge with the fixed
    // (count desc, pair asc) tie-break), which is what m=1 degenerates
    // to — rank 1 always survives the disjointness filter, and the
    // single-rule fold's (last symbol, incoming) lookup is the same
    // separator-anchored suffix test the oracle's lambda spells out.
    // The audit pass is ON here (tokens_after per round; its monotone
    // shrink proves each apply ran corpus-wide). At production vocab
    // sizes this m=1 shape pays one driver round-trip per merge — the
    // batched q181 is the at-scale form; BpeTrainer's scaladoc states
    // the per-round cost bound.
    QueryDef(
      "q155_bpe_train",
      (s, d) => {
        import s.implicits._
        val (steps, _) = graft.ops.BpeTrainer.train(
          documents(s, d), rounds = 6, batchM = 1, audit = true)
        steps.map(st =>
            (st.step, st.lhs, st.rhs, st.merged, st.pairN, st.tokensAfter.get))
          .toDF("step", "lhs", "rhs", "merged", "pair_n", "tokens_after")
          .orderBy(col("step"))
      },
      Some(bpeOracle)),

    // BPE TRAINING, BATCHED — the at-scale shape the m=1 trainer
    // cannot reach: each ROUND selects the top-3 pairwise-DISJOINT
    // pairs from ONE corpus-wide count (candidates ranked (n desc, a,
    // b) within a pool of 8; a candidate survives iff it shares no
    // symbol with any higher-ranked candidate — the non-recursive
    // disjointness BpeTrainer.selectMerges documents) and applies all
    // of them in ONE greedy left-to-right fold (rule-set lookup on
    // (last symbol, incoming symbol)). Six merges in 2 driver
    // round-trips instead of q155's 6; at a 30k-vocab production run
    // with m=256 that is ~120 rounds instead of 30,000 — the driver
    // stops being the pacemaker. Audit off (no tokens_after pass).
    // The oracle replays the identical pipeline per round: pair
    // counts → ranked pool (row_number) → disjoint survivors
    // (NOT EXISTS over higher ranks) → top-3 → one list_reduce fold
    // whose rule set travels as a list of U+001E-joined keys.
    QueryDef(
      "q181_bpe_train_batched",
      (s, d) => {
        import s.implicits._
        val (steps, _) = graft.ops.BpeTrainer.train(
          documents(s, d), rounds = 2, batchM = 3, audit = false, pool = 8)
        steps.map(st => (st.round, st.rank, st.lhs, st.rhs, st.merged, st.pairN))
          .toDF("round", "rank", "lhs", "rhs", "merged", "pair_n")
          .orderBy(col("round"), col("rank"))
      },
      Some(bpeBatchedOracle)),

    // VOCABULARY COVERAGE / OOV RATE: build the top-k corpus
    // vocabulary (count desc, word asc — fully tie-broken so both
    // engines pick the identical set; k=16 against the synthetic
    // 31-word vocabulary ≈ a 32k vocab against open-web text — the
    // fixture keeps the rare tail measurable), then measure per
    // language what
    // fraction of token mass falls outside it — the coverage audit run
    // before freezing a tokenizer (high OOV in a language = its text
    // will fragment into bytes/unknowns and train badly). Shape: one
    // explode into (lang, word) counts (map-side combined), the word
    // ranking is a window over the VOCABULARY-sized aggregate (the
    // documented bounded-aggregate exception; at open-web vocab scale
    // swap in TopKAgg/CMS heavy-hitters — q65/q169 — for the exact
    // rank), vocab BROADCASTs back, and the per-lang rollup is 5 rows.
    // Integer-exact: oov_ppm = oov·10⁶ div tokens.
    QueryDef(
      "q193_vocab_oov",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lw = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy(col("lang"), col("w"))
          .agg(count(lit(1)).as("n"))
          .persist()
        val vocab = lw.groupBy(col("w")).agg(sum(col("n")).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cnt").desc, col("w"))))
          .filter(col("rk") <= 16)
          .select(col("w"))
        lw.join(broadcast(vocab.withColumn("in_vocab", lit(1L))),
            Seq("w"), "left")
          .groupBy(col("lang"))
          .agg(sum(col("n")).as("n_tokens"),
            sum(when(col("in_vocab").isNull, col("n")).otherwise(0L))
              .as("n_oov"))
          .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
          .orderBy(col("lang"))
      },
      Some("""WITH lw AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |c AS (
             |  SELECT lang, w, CAST(count(*) AS BIGINT) AS n
             |  FROM lw GROUP BY lang, w),
             |v AS (
             |  SELECT w FROM (
             |    SELECT w, row_number() OVER (
             |      ORDER BY sum(n) DESC, w) AS rk
             |    FROM c GROUP BY w) WHERE rk <= 16)
             |SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN v.w IS NULL THEN n ELSE 0 END)
             |    AS BIGINT) AS n_oov,
             |  CAST(sum(CASE WHEN v.w IS NULL THEN n ELSE 0 END) * 1000000
             |    // sum(n) AS BIGINT) AS oov_ppm
             |FROM c LEFT JOIN v ON c.w = v.w
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // KNESER–NEY CONTINUATION COUNTS: for each word, the RAW count
    // c(w) against the number of DISTINCT left contexts N1+(·w) — the
    // statistic KN smoothing replaces raw frequency with (a word seen
    // a million times after only one context, like the 'Francisco' in
    // 'San Francisco', should carry low unigram probability). The
    // versatility ratio N1+(·w)·10⁶ div c(w) separates boilerplate-
    // bound tokens (low) from genuinely versatile ones (high) — a
    // curation signal the raw count hides. Shape: one narrow
    // posexplode, bigrams by lead() inside each doc (one doc_id
    // shuffle), then (w1,w2)-distinct and per-w2 aggregates over
    // constant-width keys — corpus-linear, the LM-counts pipeline
    // shape at any scale.
    QueryDef(
      "q197_kn_continuation",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bigrams = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
          .withColumn("w2", lead(col("w"), 1).over(byDoc))
          .filter(col("w2").isNotNull)
          .select(col("w").as("w1"), col("w2"))
          .persist()
        val raw = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("c_w"))
        val cont = bigrams.distinct()
          .groupBy(col("w2")).agg(count(lit(1)).as("n_contexts"))
        raw.join(cont, Seq("w2"))
          .withColumn("versatility_ppm",
            expr("n_contexts * 1000000 div c_w"))
          .select(col("w2").as("word"), col("c_w"), col("n_contexts"),
            col("versatility_ppm"))
          .orderBy(col("n_contexts").desc, col("word"))
          .limit(20)
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS w,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |b AS (
             |  SELECT w AS w1,
             |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |  FROM w),
             |bg AS (SELECT w1, w2 FROM b WHERE w2 IS NOT NULL),
             |raw AS (
             |  SELECT w2, CAST(count(*) AS BIGINT) AS c_w
             |  FROM bg GROUP BY w2),
             |cont AS (
             |  SELECT w2, CAST(count(*) AS BIGINT) AS n_contexts
             |  FROM (SELECT DISTINCT w1, w2 FROM bg) GROUP BY w2)
             |SELECT raw.w2 AS word, raw.c_w, cont.n_contexts,
             |  cont.n_contexts * 1000000 // raw.c_w AS versatility_ppm
             |FROM raw JOIN cont ON raw.w2 = cont.w2
             |ORDER BY cont.n_contexts DESC, word
             |LIMIT 20""".stripMargin)),

    // POSITIONAL INDEX SEARCH — the query side of q110's inverted
    // index: a conjunctive (AND) query answered from per-term postings
    // and a PHRASE query answered from positional postings (adjacent
    // positions of the same doc — the reason real indexes store
    // positions, not just doc ids). Shape: ONE narrow posexplode
    // builds the postings; the conjunctive side is a per-doc
    // conditional aggregate (no per-term join chain — at 1000 terms
    // that would be 1000 joins; one pass with conditional sums is the
    // scalable form of "smallest-posting-first" when terms are
    // selective); the phrase side self-joins the SINGLE term's
    // postings on (doc, pos+1) — the join input is pre-filtered to
    // the phrase words, so the pairing is posting-sized, never
    // corpus-sized. Everything integer; top-20 fully tie-broken.
    QueryDef(
      "q201_phrase_search",
      (s, d) => {
        val post = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
          .persist()
        val conj = post
          .groupBy(col("doc_id"))
          .agg(
            sum(when(col("w") === "spark", 1L).otherwise(0L))
              .as("n_spark"),
            sum(when(col("w") === "query", 1L).otherwise(0L))
              .as("n_query"),
            sum(when(col("w") === "join", 1L).otherwise(0L))
              .as("n_join"))
          .filter(col("n_spark") > 0 && col("n_query") > 0 &&
            col("n_join") > 0)
        val dataPost = post.filter(col("w") === "data")
        val phrase = dataPost.as("x")
          .join(dataPost.as("y"),
            col("x.doc_id") === col("y.doc_id") &&
              col("y.pos") === col("x.pos") + 1)
          .groupBy(col("x.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("phrase_cnt"))
        conj.join(phrase, Seq("doc_id"), "left")
          .na.fill(0L, Seq("phrase_cnt"))
          .orderBy(col("phrase_cnt").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH post AS (
             |  SELECT doc_id,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos,
             |    unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |conj AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN w = 'spark' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_spark,
             |    CAST(sum(CASE WHEN w = 'query' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_query,
             |    CAST(sum(CASE WHEN w = 'join' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_join
             |  FROM post GROUP BY doc_id
             |  HAVING n_spark > 0 AND n_query > 0 AND n_join > 0),
             |dp AS (SELECT doc_id, pos FROM post WHERE w = 'data'),
             |phrase AS (
             |  SELECT x.doc_id, CAST(count(*) AS BIGINT) AS phrase_cnt
             |  FROM dp x JOIN dp y
             |    ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
             |  GROUP BY x.doc_id)
             |SELECT c.doc_id, c.n_spark, c.n_query, c.n_join,
             |  coalesce(p.phrase_cnt, 0) AS phrase_cnt
             |FROM conj c LEFT JOIN phrase p ON c.doc_id = p.doc_id
             |ORDER BY phrase_cnt DESC, c.doc_id
             |LIMIT 20""".stripMargin)),

    // KNESER-NEY BIGRAM PERPLEXITY FILTER: the production "how
    // corpus-like is this document" gate (CCNet/KenLM shape) — train
    // an absolute-discount (D = 0.75) bigram LM on the corpus, score
    // every document by its mean per-bigram surprisal, surface the 20
    // least corpus-like. P_kn(w2|w1) = max(c12-D,0)/c1 +
    // (D·n1+(w1·)/c1)·(n1+(·w2)/types) computed MICRO-INTEGER (fixed
    // division order both engines, so the rational arithmetic is
    // exact), and surprisal uses q129's integer-log2 trick —
    // length(bin(1e6 div p_micro)) is a monotone step transform of
    // -log2 p with zero libm drift. Model trained on the scored
    // corpus itself, so every bigram is in-vocabulary (no backoff-to-
    // unseen case to encode). Scale: the bigram stream is narrow and
    // persisted (model build + scoring read it once each); the model
    // join shuffles on the bigram key; prefix/continuation tables are
    // vocab-sized (Heaps-sublinear) and broadcast — at true domain
    // scale drop the hints and let AQE pick shuffle joins, the plan
    // is otherwise unchanged.
    QueryDef(
      "q209_kn_perplexity",
      (s, d) => {
        val bi = documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            explode(TextOps.wordShinglesAll(
              TextOps.tokens(col("text")), 2)).as("bigram"))
          .withColumn("w1", split(col("bigram"), " ").getItem(0))
          .withColumn("w2", split(col("bigram"), " ").getItem(1))
          .select(col("doc_id"), col("w1"), col("w2"))
          .persist()
        val model = bi.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
          .persist()
        val prefix = model.groupBy(col("w1"))
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
        val cont = model.groupBy(col("w2"))
          .agg(count(lit(1)).as("cont2"))
        val types = model.agg(count(lit(1)).as("t_types"))
        bi.join(model, Seq("w1", "w2"))
          .join(broadcast(prefix), Seq("w1"))
          .join(broadcast(cont), Seq("w2"))
          .crossJoin(broadcast(types))
          .withColumn("p_micro",
            expr("""greatest(c12 * 1000000 - 750000, 0) div c1
                   | + ((750000 * n1p) div c1)
                   |   * ((cont2 * 1000000) div t_types) div 1000000"""
              .stripMargin))
          .withColumn("b",
            expr("length(bin(1000000 div greatest(p_micro, 1)))"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("b").cast("long")).as("total_bits"))
          .withColumn("mbits_per_bigram",
            expr("(total_bits * 1000) div n_bigrams"))
          .orderBy(col("mbits_per_bigram").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws
             |  FROM documents),
             |bi AS (
             |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
             |  FROM toks,
             |    LATERAL (SELECT unnest(range(1, len(ws))) AS i) u
             |  WHERE len(ws) >= 2),
             |model AS (
             |  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
             |prefix AS (
             |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             |    count(*) AS n1p
             |  FROM model GROUP BY w1),
             |cont AS (
             |  SELECT w2, count(*) AS cont2 FROM model GROUP BY w2),
             |t AS (SELECT count(*) AS t_types FROM model),
             |scored AS (
             |  SELECT doc_id,
             |    greatest(c12 * 1000000 - 750000, 0) // c1
             |      + ((750000 * n1p) // c1)
             |        * ((cont2 * 1000000) // t_types) // 1000000
             |      AS p_micro
             |  FROM bi JOIN model USING (w1, w2)
             |    JOIN prefix USING (w1) JOIN cont USING (w2)
             |    CROSS JOIN t),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_bigrams,
             |    CAST(sum(length(bin(1000000 // greatest(p_micro, 1))))
             |      AS BIGINT) AS total_bits
             |  FROM scored GROUP BY doc_id)
             |SELECT doc_id, n_bigrams, total_bits,
             |  (total_bits * 1000) // n_bigrams AS mbits_per_bigram
             |FROM agg
             |ORDER BY mbits_per_bigram DESC, doc_id
             |LIMIT 20""".stripMargin))
  )

  /** The q155 oracle: the identical 6-round greedy-merge fixpoint in
    * DuckDB, one CTE chain per round (pair counts → argmax → fold),
    * symbols as chr(31)-joined strings folded with the same lambda. */
  private def bpeOracle: String = {
    def round(r: Int): String = {
      val prev = s"w${r - 1}"
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS n
         |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
         |        FROM (SELECT freq, string_split(enc, chr(31)) AS syms
         |              FROM $prev))
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT freq,
         |    list_reduce(string_split(enc, chr(31)), (acc, x) ->
         |      CASE WHEN (acc = b$r.a OR ends_with(acc, chr(31) || b$r.a))
         |          AND x = b$r.b
         |        THEN acc || x ELSE acc || chr(31) || x END) AS enc
         |  FROM $prev, b$r),
         |s$r AS (
         |  SELECT CAST($r AS BIGINT) AS step, a AS lhs, b AS rhs,
         |    a || b AS merged, CAST(n AS BIGINT) AS pair_n,
         |    (SELECT CAST(sum(freq * len(string_split(enc, chr(31))))
         |       AS BIGINT) FROM w$r) AS tokens_after
         |  FROM b$r)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS freq,
       |    array_to_string(string_split(word, ''), chr(31)) AS enc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |${(1 to 6).map(round).mkString(",\n")}
       |SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
       |UNION ALL SELECT * FROM s5 UNION ALL SELECT * FROM s6
       |ORDER BY step""".stripMargin
  }

  /** The q184 oracle: re-derive q155's first 4 merge rules (the same
    * argmax CTE chain as [[bpeOracle]], minus the audit), then encode
    * every document word by replaying the 4 single-rule folds in step
    * order and aggregate counts + the per-word polyhash sum. */
  private def bpeEncodeOracle: String = {
    def trainRound(r: Int): String = {
      val prev = s"w${r - 1}"
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS n
         |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
         |        FROM (SELECT freq, string_split(enc, chr(31)) AS syms
         |              FROM $prev))
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT freq,
         |    list_reduce(string_split(enc, chr(31)), (acc, x) ->
         |      CASE WHEN (acc = b$r.a OR ends_with(acc, chr(31) || b$r.a))
         |          AND x = b$r.b
         |        THEN acc || x ELSE acc || chr(31) || x END) AS enc
         |  FROM $prev, b$r)""".stripMargin
    }
    def encodeRound(r: Int): String =
      s"""e$r AS (
         |  SELECT doc_id,
         |    list_reduce(string_split(enc, chr(31)), (acc, x) ->
         |      CASE WHEN (acc = b$r.a OR ends_with(acc, chr(31) || b$r.a))
         |          AND x = b$r.b
         |        THEN acc || x ELSE acc || chr(31) || x END) AS enc
         |  FROM e${r - 1}, b$r)""".stripMargin
    s"""WITH w0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS freq,
       |    array_to_string(string_split(word, ''), chr(31)) AS enc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |${(1 to 4).map(trainRound).mkString(",\n")},
       |dw AS (SELECT doc_id, word FROM
       |    (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |     FROM documents) WHERE word <> ''),
       |e0 AS (SELECT doc_id,
       |    array_to_string(string_split(word, ''), chr(31)) AS enc
       |  FROM dw),
       |${(1 to 4).map(encodeRound).mkString(",\n")}
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(len(string_split(enc, chr(31)))) AS BIGINT) AS n_tokens,
       |  CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(enc, ''),
       |      c -> CAST(ascii(c) AS BIGINT))),
       |    (h, c) -> (h * 31 + c) % 1000000007)) AS BIGINT) AS enc_hash_sum
       |FROM e4 GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The q181 oracle: the identical 2-round batched trainer in DuckDB.
    * Per round: pair counts → candidates ranked (n desc, a, b) within a
    * pool of 8 (`row_number` + QUALIFY) → pairwise-disjoint survivors
    * (NOT EXISTS over higher ranks, the same conservative rule as
    * BpeTrainer.selectMerges) → top-3 by rank → ONE `list_reduce` fold
    * whose rule set travels as a list of chr(30)-joined keys looked up
    * against (last symbol, incoming symbol) — `list_contains` on the
    * cross-joined 1-row rule list, exactly the Spark fold. */
  private def bpeBatchedOracle: String = {
    def round(r: Int): String = {
      val prev = s"w${r - 1}"
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS n
         |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
         |        FROM (SELECT freq, string_split(enc, chr(31)) AS syms
         |              FROM $prev))
         |  GROUP BY 1, 2),
         |c$r AS (SELECT a, b, n,
         |    row_number() OVER (ORDER BY n DESC, a, b) AS r
         |  FROM p$r QUALIFY r <= 8),
         |k$r AS (SELECT a, b, n, r FROM c$r x
         |  WHERE NOT EXISTS (SELECT 1 FROM c$r y WHERE y.r < x.r
         |    AND (y.a = x.a OR y.a = x.b OR y.b = x.a OR y.b = x.b))),
         |s$r AS (SELECT a, b, n, row_number() OVER (ORDER BY r) AS rnk
         |  FROM k$r QUALIFY rnk <= 3),
         |r$r AS (SELECT list(a || chr(30) || b ORDER BY rnk) AS rkeys
         |  FROM s$r),
         |w$r AS (
         |  SELECT freq,
         |    list_reduce(string_split(enc, chr(31)), (acc, x) ->
         |      CASE WHEN list_contains(r$r.rkeys,
         |          list_extract(string_split(acc, chr(31)), -1) ||
         |          chr(30) || x)
         |        THEN acc || x ELSE acc || chr(31) || x END) AS enc
         |  FROM $prev, r$r),
         |o$r AS (SELECT CAST($r AS BIGINT) AS "round",
         |    CAST(rnk AS BIGINT) AS "rank", a AS lhs, b AS rhs,
         |    a || b AS merged, CAST(n AS BIGINT) AS pair_n
         |  FROM s$r)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS freq,
       |    array_to_string(string_split(word, ''), chr(31)) AS enc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |${(1 to 2).map(round).mkString(",\n")}
       |SELECT * FROM o1 UNION ALL SELECT * FROM o2
       |ORDER BY 1, 2""".stripMargin
  }
}
