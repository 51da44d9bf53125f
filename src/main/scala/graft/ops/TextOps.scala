package graft.ops

import graft.expressions.TextExpressions
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Column-level building blocks for the text / dedup pipeline (the
  * north-star LLM-training-data surface layered over the reference's
  * bookstore ETL — see SURVEY.md §2b).
  *
  * Everything here is a pure Catalyst `Column` expression built from
  * higher-order functions (`transform`/`aggregate`/`zip_with`) — no UDFs,
  * no serialization boundary, fully distributable. Two families:
  *
  *  - '''Oracle-parity kernels''' (`polyHash`, `minhashSig`, `simhash16`):
  *    left-fold integer arithmetic that DuckDB can reproduce bit-for-bit
  *    (`list_reduce` + the same mod-P math), so the driver's differential
  *    check covers the whole dedup pipeline, not just row counts.
  *  - '''Production kernels''' (`polyHashFast`, `minhashSigFast`): same
  *    shapes over Spark's codegen'd `xxhash64` — the 100 TB path, where
  *    cross-engine hash parity doesn't matter but throughput does.
  */
object TextOps {

  /** Modulus for the parity hash family. Chosen so every intermediate
    * (`h*31+c`, `h*(2k+1)+b`) stays far inside signed-64 range. */
  val P = 1000000007L

  private def wrap(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftColumnBridge.column(e)
  private def unwrap(c: Column) = GraftColumnBridge.expression(c)

  /** Deterministic polynomial rolling hash: left fold over code
    * points, `h -> (h*31 + code) mod P`. Cross-engine exact. */
  def polyHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * 31 + c) % P)

  /** Production hash: Spark's codegen'd 64-bit xxHash. */
  def polyHashFast(s: Column): Column = xxhash64(s)

  /** Let-binding for Column expressions: evaluates `e` ONCE and passes
    * it to `f` as a bound lambda variable. Catalyst does no common-
    * subexpression elimination across higher-order lambdas, so an
    * expression referenced k times is otherwise evaluated k times —
    * for a nested fold that compounds multiplicatively. */
  def letBind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Hash of every token (one char-fold per token — tokens are short;
    * hashing shingle STRINGS would re-fold every token n times).
    * Codegen'd loop ([[TextExpressions.PolyHashTokens]]); same fold
    * arithmetic as [[polyHash]] per token. */
  def tokenHashes(ws: Column): Column =
    wrap(TextExpressions.PolyHashTokens(unwrap(ws)))

  /** Interpreted HOF form of [[tokenHashes]] — semantics oracle. */
  def tokenHashesHof(ws: Column): Column = transform(ws, w => polyHash(w))

  /** Distinct 3-shingle hashes composed arithmetically from adjacent
    * token hashes: `(h1*1009 + h2*9176 + h3) mod P` — exact mirror in
    * DuckDB, ~3× fewer char-fold steps than hashing shingle strings.
    * Codegen'd ([[TextExpressions.ShingleHashes3]]); empty for docs
    * under 3 tokens, mirroring the oracle's empty `range`. */
  def shingleHashes3(ws: Column): Column =
    array_distinct(wrap(TextExpressions.ShingleHashes3(
      TextExpressions.PolyHashTokens(unwrap(ws)))))

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens belonging to a fixed set (duplicates counted) —
    * codegen'd ([[TextExpressions.CountInSet]]); the marker-scoring /
    * stopword-ratio kernel. Equivalent to
    * `size(filter(ws, _.isin(set: _*)))`. */
  def countInSet(ws: Column, set: Seq[String]): Column =
    wrap(TextExpressions.CountInSet(unwrap(ws), set))

  /** Distinct n-word shingles of a token array; empty when the doc has
    * fewer than n tokens (mirrors DuckDB's empty `range`). Codegen'd
    * ([[TextExpressions.WordShingles]]). */
  def wordShingles(ws: Column, n: Int): Column =
    array_distinct(wrap(TextExpressions.WordShingles(unwrap(ws), n)))

  /** ALL n-word shingles, duplicates kept (position i for every i) —
    * the multiset form repetition metrics need (a doc that repeats one
    * phrase has many duplicate shingles; dedup would erase the signal). */
  def wordShinglesAll(ws: Column, n: Int): Column =
    wrap(TextExpressions.WordShingles(unwrap(ws), n))

  /** Interpreted HOF form of [[wordShingles]] — semantics oracle.
    * `ws` is let-bound: it is typically `split(text, " ")`, referenced
    * n+2 times per shingle position here — without the binding each
    * reference re-splits the document (~3n× size(ws) regex splits per
    * row; profiled as THE bottleneck of the dedup suite, one
    * `UTF8String.split` frame burning a whole core). */
  def wordShinglesHof(ws: Column, n: Int): Column =
    letBind(ws) { w =>
      val starts = sequence(lit(1), size(w) - (n - 1))
      val mk = (i: Column) =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)
      when(size(w) >= n, array_distinct(transform(starts, mk)))
        .otherwise(array().cast("array<string>"))
    }

  /** k-permutation MinHash signature over hashed shingles:
    * `sig(j) = min_h (h*(2j+1) + j*12345 + 67) mod P`. Odd multipliers
    * keep every permutation a bijection on Z_P. Codegen'd single pass
    * ([[TextExpressions.MinHashSig]]): k multiply-adds per hash in one
    * primitive loop — the interpreted fold form benched as the
    * dominant cost of the LSH pipeline (~2400 lambda frames per doc). */
  def minhashSig(hashes: Column, k: Int): Column =
    wrap(TextExpressions.MinHashSig(unwrap(hashes), k))

  /** Interpreted HOF form of [[minhashSig]] — semantics oracle. ONE
    * fold over `hashes` (running per-permutation minima in the
    * accumulator); the transpose, k independent array_min passes,
    * re-evaluates `hashes` k times (no CSE across lambdas). */
  def minhashSigHof(hashes: Column, k: Int): Column =
    aggregate(
      hashes,
      array_repeat(lit(P), k), // P > any value mod P: identity for min
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)), j =>
          (h * (j * 2 + 1) + j * 12345 + 67) % P),
        (cur, cand) => least(cur, cand)))

  /** Production MinHash: per-permutation xxhash64 with the permutation
    * index folded into the seed column. */
  def minhashSigFast(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(shingles, s => xxhash64(s, j))))

  /** LSH band keys: the signature cut into `bands` bands of `r` rows;
    * each key is a "band:v1:v2:…" string — the bucket-join key. Equal
    * key ⇒ the two docs agree on all r signature rows of that band. */
  def lshBands(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(":",
        (Seq(b.cast("string")) ++
          (1 to r).map(i => element_at(sig, b * r + i).cast("string"))): _*))

  /** `bits`-wide SimHash over hashed shingles. Bit j is set when more
    * than half the shingle hashes have bit j set (tie -> 0, same rule
    * both engines; the oracle's floor-div by 2^j equals the
    * shift-and-mask here for the nonnegative hashes). Codegen'd
    * ([[TextExpressions.SimHashBits]]). Over the mod-P parity hashes
    * only bits 0..29 vary (P ≈ 2^30); use 30 there, wider only over
    * xxhash64 inputs. */
  def simhashBits(hashes: Column, bits: Int): Column =
    wrap(TextExpressions.SimHashBits(unwrap(hashes), bits))

  /** 16-bit SimHash (compat alias of [[simhashBits]]). */
  def simhash16(hashes: Column): Column = simhashBits(hashes, 16)

  /** Interpreted HOF form of [[simhashBits]] — semantics oracle. ONE
    * fold over `hashes` carrying (per-bit ones-counts, n) in a
    * struct accumulator, then a finish lambda majority-votes each bit
    * (the per-bit-outer-loop shape re-evaluates `hashes` bits×).
    *
    * Oracle domain = nonnegative hashes < 2^30 (the mod-P family): the
    * bit extraction here is double floor-division, which silently
    * loses low bits above 2^53 and floor-divides (≠ arithmetic-shift)
    * for negatives — so it canNOT check the codegen kernel over raw
    * xxhash64 inputs. Bounded to the domain it is correct on. */
  def simhashBitsHof(hashes: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 30,
      s"simhashBitsHof oracle covers the mod-P domain only (bits <= 30), " +
        s"got $bits — the codegen SimHashBits handles wider inputs")
    aggregate(
      hashes,
      struct(array_repeat(lit(0L), bits).as("c"), lit(0L).as("n")),
      (acc, h) => struct(
        zip_with(
          acc.getField("c"),
          transform(sequence(lit(0), lit(bits - 1)), j =>
            floor(h / pow(lit(2), j)).cast("long") % 2),
          (a, b) => a + b).as("c"),
        (acc.getField("n") + 1).as("n")),
      acc => aggregate(
        zip_with(
          acc.getField("c"), sequence(lit(0), lit(bits - 1)),
          (ones, j) => when(ones * 2 > acc.getField("n"),
            pow(lit(2), j).cast("long")).otherwise(0L)),
        lit(0L), (a, b) => a + b))
  }

  /** 16-bit HOF form (compat alias of [[simhashBitsHof]]). */
  def simhash16Hof(hashes: Column): Column = simhashBitsHof(hashes, 16)

  /** Set Jaccard of two (already-distinct) arrays, rounded — the
    * verify step after LSH candidate generation. Integer-count division
    * is exact, so both engines round identically. One hash-set build
    * per pair: |union| = |a| + |b| - |intersect| (arrays are distinct),
    * with the intersect size let-bound so it isn't computed twice. */
  def jaccard(a: Column, b: Column, scale: Int = 4): Column =
    letBind(size(array_intersect(a, b))) { i =>
      round(i * lit(1.0) / (size(a) + size(b) - i), scale)
    }

  /** [[jaccard]] over PRE-SORTED distinct arrays: the intersection is
    * one allocation-free merge pass ([[TextExpressions
    * .SortedIntersectCount]]) instead of a hash-set build per pair —
    * the right verify kernel when one corpus-side `array_sort` is
    * amortized over many candidate pairs per doc. Same integer-count
    * arithmetic as [[jaccard]], so oracle parity is unchanged. */
  def jaccardSorted(a: Column, b: Column, scale: Int = 4): Column =
    letBind(wrap(TextExpressions.SortedIntersectCount(unwrap(a), unwrap(b)))) {
      i => round(i * lit(1.0) / (size(a) + size(b) - i), scale)
    }

  /** Raw intersection count of two SORTED arrays (the kernel under
    * [[jaccardSorted]]), exposed for asymmetric measures — containment
    * |A∩B|/|A| divides by one side only, so the caller needs the
    * count, not a symmetric ratio. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    wrap(TextExpressions.SortedIntersectCount(unwrap(a), unwrap(b)))
}
