package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over micro-quantized integer vectors —
  * the clustering engine behind cluster-based corpus curation (q104
  * uses it directly; q106 samples from its partition).
  *
  * Everything runs in the shared `floor(x·1e6)` long space
  * ([[VectorOps.microQuantize]]): distances are exact int64 sums,
  * centroid updates are integer-sum means — no float accumulation, so
  * results are independent of partition/merge order and bit-reproducible
  * across engines. Scale shape per round: one broadcast of the k×dim
  * centroid table, one map-side-combined `min(struct(dist, cid))`
  * argmin, one mergeable centroid-sum aggregation. Nothing data-sized
  * ever reaches the driver; rounds are a fixed small count chosen by
  * the caller.
  */
object Kmeans {

  private val P = TextOps.P

  /** Quadratic-mixed key hash shared with the deterministic samplers
    * (q89 family): affine-only Knuth leaves sequential ids structured. */
  def keyHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h0 = pmod(key * 2654435761L, lit(P))
    (h0 * h0 + h0) % P
  }

  /** (vec_id, q, h): quantized vectors with their deterministic rank
    * hash. Callers persist this — every round reads it twice. */
  def quantize(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), VectorOps.microQuantize(col("embedding")).as("q"))
      .withColumn("h", keyHash(col("vec_id")))

  /** Deterministic seeds: the k lowest hash-rank vectors, cid 0..k-1
    * in rank order. (k rows — the single-partition window is fine.) */
  def seeds(vecs: DataFrame, k: Int): DataFrame =
    vecs.orderBy(col("h"), col("vec_id")).limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy(col("h"), col("vec_id")))
          .cast("long") - 1)
      .select(col("cid"), col("q").as("c"))

  /** One Lloyd assignment: nearest centroid per vector (ties to the
    * lowest cid via lexicographic struct min). The k×N candidate rows
    * partial-aggregate map-side — only N minima shuffle. */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(VectorOps.l2DistSq(col("q"), col("c")).as("d"),
          col("cid").as("cid")).as("dc"))
      .groupBy(col("vec_id")).agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"))

  /** Centroid update: exact integer per-dim sums via the mergeable
    * [[VectorAggregates.CentroidAgg]], then the shared
    * `floor(sum/n + 0.5)` integer mean. Empty clusters drop out. */
  def update(assigned: DataFrame, vecs: DataFrame, dim: Int): DataFrame = {
    val cAgg = udaf(new VectorAggregates.CentroidAgg(dim))
    assigned.join(vecs.select(col("vec_id"), col("q")), "vec_id")
      .groupBy(col("cid")).agg(cAgg(col("q")).as("s"))
      .select(col("cid"),
        transform(col("s.sums"),
          x => VectorOps.centroidMicro(x, col("s.n"))).as("c"))
  }

  /** `rounds` full Lloyd iterations from the deterministic seeds.
    * Returns (final assignment (vec_id, cid, d), final centroids
    * (cid, c)) — the assignment is against the LAST updated centroids. */
  def lloyd(vecs: DataFrame, k: Int, rounds: Int, dim: Int)
      : (DataFrame, DataFrame) = {
    require(rounds >= 1, s"kmeans: rounds must be >= 1, got $rounds")
    var cents = seeds(vecs, k)
    var a = assign(vecs, cents)
    var r = 1
    while (r < rounds + 1) {
      cents = update(a, vecs, dim)
      a = assign(vecs, cents)
      r += 1
    }
    (a, cents)
  }
}
