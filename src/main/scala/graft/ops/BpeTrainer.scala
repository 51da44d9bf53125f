package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich '16) with BATCHED merge
  * selection — the at-scale shape of catalog entries q155/q181.
  *
  * Reference behavior: the reference pipeline has no tokenizer trainer;
  * this is north-star training-data surface (SURVEY.md §2b). The trainer
  * follows the standard distributed-BPE optimization: instead of one
  * global argmax (a driver round-trip) per merge, each ROUND selects the
  * top-`batchM` pairwise-DISJOINT pairs from one corpus-wide count and
  * applies them together, cutting driver actions per learned merge by
  * `batchM`×.
  *
  * Per-round cost bound (the 100 TB contract):
  *   - one explode + map-side-combined `groupBy` over the DISTINCT-WORD
  *     frequency table (vocab ≪ corpus; the raw text is touched exactly
  *     once, in [[wordTable]]) — reduce-side keys bounded by
  *     |current vocab|²,
  *   - one driver `collect` of ≤ `pool` candidate rows (the ONLY driver
  *     action; the merge table lives on the driver by definition),
  *   - one narrow fold re-encoding each word (a single `aggregate`
  *     expression whatever `batchM` is — rules travel as a literal
  *     key array, so expression depth does NOT grow with the batch),
  *   - one `localCheckpoint` (the GraphOps pattern — without it the
  *     lineage, and so the plan, would double every round),
  *   - IFF `audit` is on: one extra corpus-wide aggregation for the
  *     `tokens_after` telemetry. Off by default at scale.
  * Training v merges therefore costs ceil(v / batchM) rounds, each a
  * fixed small number of jobs — v/batchM driver round-trips instead of
  * the v a merge-at-a-time trainer pays (q155 keeps m=1 because its
  * oracle pins exact sequential-greedy semantics; q181 is the batched
  * shape).
  *
  * Batched-application semantics: the round's rules are looked up inside
  * ONE greedy left-to-right fold (current last symbol + incoming symbol
  * against the rule set), so a higher-ranked rule consuming a symbol
  * blocks a lower-ranked one at that position — deterministic, and
  * because selection only admits pairwise-disjoint rules, the common
  * case is order-independent. The DuckDB oracle replays the identical
  * fold (`list_reduce` + `list_contains`), making the batched trainer
  * hash-checkable end to end.
  */
object BpeTrainer {

  /** Symbol separator inside an encoded word. U+001F (unit separator)
    * never appears in the corpus tokens by contract — merged symbols
    * contain no separator, so suffix tests cannot false-anchor. */
  val Sep = "\u001f"

  /** Rule-key separator (lhs KeySep rhs). U+001E, same absence contract. */
  val KeySep = "\u001e"

  /** One learned merge: global `step`, the `round` it was selected in,
    * its `rank` within the round, and (when the audit pass is on) the
    * corpus token count after its round applied. */
  final case class Step(
      step: Long, round: Long, rank: Long,
      lhs: String, rhs: String, merged: String, pairN: Long,
      tokensAfter: Option[Long])

  /** Distinct-word frequency table `(freq, enc)` — the one aggregation
    * that reads the raw text; every training round after it runs over
    * this bounded table. `enc` is the character-level start encoding. */
  def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("enc", concat_ws(Sep, split(col("word"), "")))
      .select(col("freq"), col("enc"))

  /** Frequency-weighted adjacent-pair counts over the current encoding.
    * Generation is bounded at length-1 pairs per word (adjacency, never
    * all-pairs), fully narrow until one map-side-combined groupBy. */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(col("enc"), Sep)
    words
      .withColumn("syms", syms)
      .select(col("freq"), explode(expr(
        // size<2 guard: Spark's sequence(1, 0) DESCENDS ([1,0]), it
        // does not return empty — single-symbol words must
        // short-circuit to an empty pair list.
        "CASE WHEN size(syms) < 2 THEN array() " +
          "ELSE transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS a, " +
          "element_at(syms, i + 1) AS b)) END")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("n"))
  }

  /** Top-`m` pairwise-disjoint merge rules from a pair-count table.
    *
    * Candidates are ranked by (n desc, a, b); only the top `pool` are
    * considered. A candidate survives iff it shares NO symbol with ANY
    * higher-ranked candidate — selected or not. That conservative,
    * non-recursive disjointness (vs the recursive "higher-ranked
    * SELECTED" form) is chosen deliberately: it is expressible as a
    * self-anti-join (`NOT EXISTS` over lower ranks) with no driver
    * iteration, so the DuckDB oracle can replay it exactly. The first
    * `m` survivors (rank order) are the round's rules. Rank 1 always
    * survives, so m=1 degenerates to the exact global argmax. */
  def selectMerges(pairs: DataFrame, m: Int, pool: Int)
      : Seq[(String, String, Long)] = {
    val top = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(pool)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    top.zipWithIndex.filter { case ((a, b, _), i) =>
      top.take(i).forall { case (c, e, _) =>
        a != c && a != e && b != c && b != e }
    }.map(_._1).take(m).toSeq
  }

  /** Greedy left-to-right application of a round's rule set as ONE fold.
    *
    * At each step the accumulated string's LAST symbol plus the incoming
    * symbol is looked up in the literal rule-key array: on a hit the
    * incoming symbol glues on without a separator (forming the merged
    * symbol and blocking overlap re-use — greedy semantics), else it
    * appends with the separator. One `aggregate` expression regardless
    * of rule count — batch size does not deepen the expression tree. */
  def applyMerges(enc: Column, rules: Seq[(String, String)]): Column = {
    val keys = rules.map { case (a, b) => a + KeySep + b }
    val syms = split(enc, Sep)
    val rest = slice(syms, lit(2), size(syms) - 1)
    aggregate(rest, element_at(syms, 1),
      (acc, x) => when(
        array_contains(typedLit(keys),
          concat(element_at(split(acc, Sep), -1), lit(KeySep), x)),
        concat(acc, x)).otherwise(concat(acc, lit(Sep), x)))
  }

  /** Train `rounds` rounds of up to `batchM` merges each.
    *
    * Returns the learned merge table (driver-side — it is the model) and
    * the final word encoding. `audit` adds one corpus aggregation per
    * round recording `tokens_after` (the monotone token-count shrink
    * proving each apply ran corpus-wide); leave it off at scale. */
  def train(docs: DataFrame, rounds: Int, batchM: Int,
      audit: Boolean, pool: Int = 16): (Seq[Step], DataFrame) = {
    require(rounds >= 1 && batchM >= 1 && pool >= batchM,
      s"bpe train: rounds=$rounds batchM=$batchM pool=$pool")
    var words = wordTable(docs).localCheckpoint()
    val steps = Seq.newBuilder[Step]
    var step = 0L
    for (round <- 1 to rounds) {
      val sel = selectMerges(pairCounts(words), batchM, pool)
      if (sel.nonEmpty) {
        words = words
          .withColumn("enc", applyMerges(col("enc"), sel.map(t => (t._1, t._2))))
          .localCheckpoint()
        val tokensAfter =
          if (audit) Some(words
            .agg(sum(col("freq") * size(split(col("enc"), Sep))).as("t"))
            .collect()(0).getLong(0))
          else None
        sel.zipWithIndex.foreach { case ((a, b, n), i) =>
          step += 1
          steps += Step(step, round.toLong, i + 1L, a, b, a + b, n, tokensAfter)
        }
      }
    }
    (steps.result(), words)
  }
}
