package graft.queries

import graft.{SparkSpecBase, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural invariants of the training-data shaping catalog (q101-
  * q104). The DuckDB differential check pins exact values; these pin
  * the PROPERTIES that make the operators correct-by-construction —
  * coverage, conservation, budget bounds, Lloyd improvement — so a
  * future edit that keeps oracle parity but breaks the semantics
  * (e.g. changing both sides' chunk rule to a lossy one) still fails.
  */
class TrainingSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q101: chunks tile every document — full coverage, exact lengths") {
    val chunks = run("q101_token_chunking")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val j = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("start") + col("chunk_tokens")).as("max_end"),
        min(col("start")).as("min_start"),
        max(col("chunk_tokens")).as("max_len"))
      .join(docs, "doc_id")
    // every doc chunked, first chunk at 0, last chunk ends at n,
    // chunk count = ceil(n / stride), no chunk exceeds the window
    assert(j.count() == docs.count())
    val bad = j.filter(
      col("min_start") =!= 0 || col("max_end") =!= col("n") ||
        col("max_len") > 32 ||
        col("n_chunks") =!= ceil(col("n") / lit(24.0)).cast("long"))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
  }

  test("q102: packing conserves tokens and bounds straddlers") {
    val packs = run("q102_sequence_packing")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).as("tok"),
        count(lit(1)).as("nd"))
    val j = packs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok2"), sum(col("n_docs")).as("nd2"),
        sum(col("n_straddlers")).as("st"), max(col("pack_id")).as("maxp"))
      .join(docs, "source")
    // conservation: every doc lands in exactly one pack; a doc starts
    // in a pack the tape actually reaches (maxp bounded by the tape
    // length — it may undershoot by straddle-only tail packs);
    // straddlers are docs crossing >= 1 of the (tok-1) div 512 cuts,
    // so their count can't exceed the cut count (a single doc longer
    // than the budget crosses several cuts but counts once, so no
    // lower bound is asserted)
    val bad = j.filter(col("tok2") =!= col("tok") || col("nd2") =!= col("nd")
      || col("st") > expr("(tok - 1) div 512")
      || col("maxp") > expr("(tok - 1) div 512"))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
  }

  test("q103: every source lands on the shared token budget") {
    val mix = run("q103_corpus_mixing").collect()
    val budget = mix.map(_.getAs[Long]("budget")).distinct
    assert(budget.length == 1) // single global budget
    for (r <- mix) {
      assert(r.getAs[Long]("tokens_kept") <= budget.head,
        s"${r.getAs[String]("source")} overshoots the budget")
      assert(r.getAs[Long]("n_kept") > 0 &&
        r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_total") >= budget.head,
        "budget must be min(source totals)")
    }
    // the smallest source is kept whole
    assert(mix.exists(r =>
      r.getAs[Long]("tokens_kept") == r.getAs[Long]("tokens_total")))
  }

  test("q104: k-means partitions all vectors; Lloyd round improved inertia") {
    val km = run("q104_kmeans_embeddings").collect()
    assert(km.map(_.getAs[Long]("n_vectors")).sum == 500)
    assert(km.length <= 8 && km.nonEmpty)
    // Round-1 baseline: inertia of assigning to the SEED centroids.
    // One full Lloyd round (assign + recenter + reassign) must not be
    // worse — the monotone-improvement property of Lloyd iteration
    // (integer centroid rounding can move it by at most ulps, which
    // the strict inequality margin here absorbs: seeds are raw
    // vectors, so round 1 improves massively on any non-degenerate
    // data).
    import graft.ops.{TextOps, VectorOps}
    val P = TextOps.P
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.microQuantize(col("embedding")).as("q"))
      .withColumn("h0", pmod(col("vec_id") * 2654435761L, lit(P)))
      .withColumn("h", expr(s"(h0*h0 + h0) % $P"))
    val init = vecs.orderBy(col("h"), col("vec_id")).limit(8)
      .select(monotonically_increasing_id().as("cid"), col("q").as("c"))
    val seedInertia = vecs.crossJoin(broadcast(init))
      .select(col("vec_id"), VectorOps.l2DistSq(col("q"), col("c")).as("d"))
      .groupBy(col("vec_id")).agg(min(col("d")).as("d"))
      .agg(sum(col("d"))).collect()(0).getLong(0)
    val finalInertia = km.map(_.getAs[Long]("inertia")).sum
    assert(finalInertia < seedInertia,
      s"Lloyd round did not improve: $finalInertia >= $seedInertia")
  }

  test("q105: every probe gets a valid (positive, hard-negative) pair") {
    val hn = run("q105_hard_negatives")
    val nProbes = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 40 === 0).count()
    assert(hn.count() == nProbes, "a probe lost its pair")
    val bad = hn.filter(col("pos_id") === col("neg_id") ||
      col("pos_d") < 0 || col("neg_d") < 0 ||
      col("margin") =!= col("neg_d") - col("pos_d"))
    assert(bad.count() == 0)
    // the positive really is same-label and the negative isn't
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label").as("l"))
    val wrong = hn
      .join(labels.withColumnRenamed("vec_id", "pos_id")
        .withColumnRenamed("l", "pos_l"), "pos_id")
      .join(labels.withColumnRenamed("vec_id", "neg_id")
        .withColumnRenamed("l", "neg_l"), "neg_id")
      .filter(col("pos_l") =!= col("label") || col("neg_l") === col("label"))
    assert(wrong.count() == 0, "pair labels violate the contract")
  }

  test("q106: every cluster is sampled to exactly the smallest size") {
    val cb = run("q106_cluster_balanced_sample").collect()
    val take = cb.map(_.getAs[Long]("take")).distinct
    assert(take.length == 1)
    assert(cb.map(_.getAs[Long]("n_total")).min == take.head,
      "take must be the smallest cluster size")
    for (r <- cb)
      assert(r.getAs[Long]("n_kept") == take.head,
        s"cluster ${r.getAs[Long]("cid")} not balanced")
  }

  test("q107: statuses partition the incoming batch; exact means exact") {
    val st = run("q107_incremental_dedup")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(st.count() == docs.filter(col("doc_id") % 10 === 9).count())
    // re-derive exact dups independently and compare the verdict
    val norm = docs.select(col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("n"))
    val exactTruth = norm.filter(col("doc_id") % 10 === 9).as("i")
      .join(norm.filter(col("doc_id") % 10 =!= 9).as("e"),
        col("i.n") === col("e.n"), "left_semi")
      .select(col("doc_id"))
    val claimed = st.filter(col("status") === "exact").select(col("doc_id"))
    assert(claimed.exceptAll(exactTruth).count() == 0 &&
      exactTruth.exceptAll(claimed).count() == 0,
      "exact verdicts diverge from ground truth")
  }

  test("q108: keeps exactly the better half of every source") {
    for (r <- run("q108_quality_blend").collect()) {
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs") / 2)
      assert(r.getAs[Long]("best_composite") <= r.getAs[Long]("cut_composite"))
    }
  }

  test("q101/q103 are deterministic across runs and partitionings") {
    for (name <- Seq("q101_token_chunking", "q103_corpus_mixing")) {
      val a = run(name).collect().toSeq
      val b = run(name).collect().toSeq
      assert(a == b, s"$name not reproducible")
    }
  }

  test("q182: model store round-trips losslessly and versions the model") {
    import graft.ops.Kmeans
    import graft.sources.VersionedTable
    val vecs = Kmeans.quantize(
      spark.read.parquet(s"$sf/embeddings.parquet")).persist()
    try {
      val (_, trained) = Kmeans.lloyd(vecs, k = 4, rounds = 1, dim = 64)
      val root = java.nio.file.Files
        .createTempDirectory("graft_model_spec_").toString
      VersionedTable.commit(trained, root) // v0
      // lossless: the stored model IS the trained model, exact longs
      def key(df: DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      assert(key(VersionedTable.read(spark, root).select("cid", "c"))
        == key(trained.select(col("cid"), col("c"))))
      // retrain (more rounds) overwrites as v1; v0 still serves the
      // exact old model — the reproducible-training-set guarantee
      val (_, retrained) = Kmeans.lloyd(vecs, k = 4, rounds = 2, dim = 64)
      VersionedTable.commit(retrained, root, "overwrite") // v1
      assert(key(VersionedTable.read(spark, root).select("cid", "c"))
        == key(retrained.select(col("cid"), col("c"))))
      assert(key(VersionedTable.read(spark, root, Some(0L))
        .select("cid", "c")) == key(trained.select(col("cid"), col("c"))))
      // consumers off the stored model assign identically to the trainer
      val (a2, _) = Kmeans.lloyd(vecs, k = 4, rounds = 2, dim = 64)
      val served = Kmeans.assign(vecs, VersionedTable.read(spark, root))
      assert(served.exceptAll(a2).count() == 0 &&
        a2.exceptAll(served).count() == 0,
        "serving from the store diverges from the trainer's assignment")
    } finally vecs.unpersist()
  }
}
