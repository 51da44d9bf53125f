package graft.ops

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based BpeTrainer checks against the pure-Scala reference
  * on randomly generated corpora (fixed seeds — failures reproduce):
  * the distributed trainer must equal the reference for BOTH m=1
  * (exact greedy) and batched rounds, on corpora with repeated
  * characters, single-char words, and heavy duplication — the shapes
  * where fold semantics and tie-breaks can silently diverge. */
class BpeTrainerPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Words over a 4-letter alphabet, lengths 1..6 — small enough that
    * pair counts collide and tie-breaks matter. */
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(80, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString)

  // ---- the reference (shared shapes with BpeTrainerSpec) ----------

  private def foldApply(syms: Vector[String],
      rules: Set[(String, String)]): Vector[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (acc.nonEmpty && rules((acc.last, x)))
        acc(acc.length - 1) = acc.last + x
      else acc += x
    }
    acc.toVector
  }

  private def pairCounts(words: Map[Vector[String], Long])
      : Map[(String, String), Long] =
    words.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.drop(1)).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def selectRef(counts: Map[(String, String), Long], m: Int,
      pool: Int): Seq[(String, String, Long)] = {
    val top = counts.toSeq.map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(pool)
    top.zipWithIndex.filter { case ((a, b, _), i) =>
      top.take(i).forall { case (c, e, _) =>
        a != c && a != e && b != c && b != e }
    }.map(_._1).take(m)
  }

  private def trainRef(freqs: Map[String, Long], rounds: Int, m: Int,
      pool: Int): Seq[(Int, Int, String, String, Long)] = {
    var words = freqs.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(Int, Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val sel = selectRef(pairCounts(words), m, pool)
      val rules = sel.map(t => (t._1, t._2)).toSet
      if (sel.nonEmpty)
        words = words.toSeq.map { case (syms, f) =>
          foldApply(syms, rules) -> f }.groupMapReduce(_._1)(_._2)(_ + _)
      sel.zipWithIndex.foreach { case ((a, b, n), i) =>
        out += ((r, i + 1, a, b, n)) }
    }
    out.result()
  }

  test("random corpora: trainer == reference for m=1 and batched (5 seeds)") {
    for (seed <- 1L to 5L) {
      val corpus = sample(corpusGen, seed)
      val freqs = corpus.groupMapReduce(identity)(_ => 1L)(_ + _)
      val docs = Seq(corpus.mkString(" ")).toDF("text")
      for ((rounds, m, pool) <- Seq((5, 1, 16), (2, 3, 8), (3, 2, 6))) {
        val (steps, _) = BpeTrainer.train(docs, rounds, m,
          audit = false, pool = pool)
        val ref = trainRef(freqs, rounds, m, pool)
        assert(steps.map(st => (st.round.toInt, st.rank.toInt, st.lhs,
          st.rhs, st.pairN)) == ref,
          s"seed=$seed rounds=$rounds m=$m pool=$pool")
      }
    }
  }

  test("random corpora: encode-after-train conserves characters (3 seeds)") {
    // Applying the learned rules never loses or invents characters:
    // for every word, the concatenation of its final symbols equals
    // the original word — the invariant a wrong fold breaks first.
    for (seed <- 11L to 13L) {
      val corpus = sample(corpusGen, seed)
      val docs = Seq(corpus.mkString(" ")).toDF("text")
      val (_, words) = BpeTrainer.train(docs, rounds = 4, batchM = 2,
        audit = false, pool = 8)
      val bad = words.collect().filter { r =>
        val enc = r.getString(1)
        enc.replace(BpeTrainer.Sep, "").isEmpty ||
          enc.split(BpeTrainer.Sep).mkString != enc.replace(BpeTrainer.Sep, "")
      }
      assert(bad.isEmpty, s"seed=$seed: ${bad.take(3).mkString(",")}")
      // and the encoded vocabulary still covers the corpus exactly
      val got = words.collect()
        .map(r => r.getString(1).replace(BpeTrainer.Sep, "") -> r.getLong(0))
        .toMap
      val want = corpus.groupMapReduce(identity)(_ => 1L)(_ + _)
      assert(got == want, s"seed=$seed vocabulary drifted")
    }
  }
}
