package graft.ops

import org.apache.spark.sql.Column
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

  /** Deterministic polynomial rolling hash: left fold over ASCII code
    * points, `h -> (h*31 + code) mod P`. Cross-engine exact. */
  def polyHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * 31 + c) % P)

  /** Production hash: Spark's codegen'd 64-bit xxHash. */
  def polyHashFast(s: Column): Column = xxhash64(s)

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles of a token array; empty when the doc has
    * fewer than n tokens (mirrors DuckDB's empty `range`). */
  def wordShingles(ws: Column, n: Int): Column = {
    val starts = sequence(lit(1), size(ws) - (n - 1))
    val mk = (i: Column) =>
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)
    when(size(ws) >= n, array_distinct(transform(starts, mk)))
      .otherwise(array().cast("array<string>"))
  }

  /** k-permutation MinHash signature over hashed shingles:
    * `sig(j) = min_h (h*(2j+1) + j*12345 + 67) mod P`. Odd multipliers
    * keep every permutation a bijection on Z_P. */
  def minhashSig(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(hashes, h => (h * (j * 2 + 1) + j * 12345 + 67) % P)))

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

  /** 16-bit SimHash over hashed shingles. Bit j is set when more than
    * half the shingle hashes have bit j set (tie -> 0, same rule both
    * engines). Uses floor-div by 2^j (exact in double for h < 2^53)
    * instead of shifts so DuckDB can mirror the arithmetic verbatim. */
  def simhash16(hashes: Column): Column =
    aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, j) => {
      val ones = aggregate(hashes, lit(0L), (s, h) =>
        s + floor(h / pow(lit(2), j)).cast("long") % 2)
      acc + when(ones * 2 > size(hashes), pow(lit(2), j).cast("long")).otherwise(0L)
    })

  /** Set Jaccard of two (already-distinct) arrays, rounded — the
    * verify step after LSH candidate generation. Integer-count division
    * is exact, so both engines round identically. */
  def jaccard(a: Column, b: Column, scale: Int = 4): Column =
    round(size(array_intersect(a, b)) * lit(1.0) / size(array_union(a, b)), scale)
}
