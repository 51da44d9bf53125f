package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

/** BpeTrainer contract: m=1 equals a pure-Scala sequential-greedy
  * reference (q155's pinned semantics), batched rounds select pairwise-
  * disjoint rules and apply them with the same fold, and batching
  * measurably cuts Spark jobs per learned merge (the q155 `weak`-grade
  * fix: the driver stops being the pacemaker). */
class BpeTrainerSpec extends SparkSpecBase {
  import spark.implicits._

  /** The classic BPE corpus (Sennrich '16 §3 shape). */
  private def fixtureDocs: DataFrame =
    Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest").toDF("text")

  private val fixtureFreqs = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  // ---- pure-Scala reference implementations ------------------------

  /** The fold BpeTrainer.applyMerges implements: left-to-right, the
    * accumulated last symbol + incoming symbol looked up in the rule
    * set; a hit glues (merged symbol becomes the new last), a miss
    * appends. */
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

  /** selectMerges' exact rule: rank (n desc, a, b), pool cap, keep a
    * candidate iff disjoint from EVERY higher-ranked candidate. */
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
    var words = freqs.map { case (w, f) =>
      w.map(_.toString).toVector -> f }
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

  // ---- specs -------------------------------------------------------

  test("wordTable counts distinct words with corpus frequency") {
    val words = BpeTrainer.wordTable(fixtureDocs)
      .collect().map(r => (r.getString(1).replace(BpeTrainer.Sep, ""),
        r.getLong(0))).toMap
    assert(words == fixtureFreqs)
  }

  test("m=1 training equals the sequential-greedy reference (q155 semantics)") {
    val (steps, _) = BpeTrainer.train(fixtureDocs, rounds = 6, batchM = 1,
      audit = true)
    val ref = trainRef(fixtureFreqs, rounds = 6, m = 1, pool = 16)
    assert(steps.map(st => (st.round.toInt, st.rank.toInt, st.lhs, st.rhs,
      st.pairN)) == ref)
    // the audit telemetry shrinks monotonically (each apply ran corpus-wide)
    val audits = steps.flatMap(_.tokensAfter)
    assert(audits == audits.sorted.reverse && audits.distinct == audits)
    // classic corpus: first merges build "est"/"lo" families
    assert(steps.head.pairN == 9L) // (e,s) in 6x newest + 3x widest
  }

  test("batched rounds: disjoint rules, fold application, reference match") {
    val (steps, words) = BpeTrainer.train(fixtureDocs, rounds = 2,
      batchM = 3, audit = false, pool = 8)
    val ref = trainRef(fixtureFreqs, rounds = 2, m = 3, pool = 8)
    assert(steps.map(st => (st.round.toInt, st.rank.toInt, st.lhs, st.rhs,
      st.pairN)) == ref)
    // per-round rules are pairwise disjoint
    steps.groupBy(_.round).values.foreach { rs =>
      val syms = rs.flatMap(st => Seq(st.lhs, st.rhs))
      assert(syms.distinct.size == syms.size,
        s"round rules share symbols: $rs")
    }
    // audit off ⇒ no telemetry
    assert(steps.forall(_.tokensAfter.isEmpty))
    // final encoding matches the reference fold end-state
    var refWords = fixtureFreqs.map { case (w, f) =>
      w.map(_.toString).toVector -> f }
    trainRef(fixtureFreqs, 2, 3, 8).groupBy(_._1).toSeq.sortBy(_._1)
      .foreach { case (_, rs) =>
        val rules = rs.map(t => (t._3, t._4)).toSet
        refWords = refWords.toSeq.map { case (syms, f) =>
          foldApply(syms, rules) -> f }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    val got = words.collect().map(r =>
      r.getString(1).split(BpeTrainer.Sep).toVector -> r.getLong(0)).toMap
    assert(got == refWords)
  }

  test("batching cuts Spark jobs per learned merge") {
    def jobsDuring(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // statusTracker is fed async off the listener bus — settle
      var (last, stable) = (-1, 0)
      while (stable < 3) {
        val n = spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).length
        if (n == last) stable += 1 else { last = n; stable = 0 }
        Thread.sleep(50)
      }
      last
    }
    // same 6 merges: one at a time vs 2 rounds of 3
    val greedy = jobsDuring("bpe-greedy") {
      BpeTrainer.train(fixtureDocs, rounds = 6, batchM = 1, audit = false)
    }
    val batched = jobsDuring("bpe-batched") {
      BpeTrainer.train(fixtureDocs, rounds = 2, batchM = 3, audit = false,
        pool = 8)
    }
    val audited = jobsDuring("bpe-audited") {
      BpeTrainer.train(fixtureDocs, rounds = 2, batchM = 3, audit = true,
        pool = 8)
    }
    assert(batched < greedy,
      s"batched=$batched jobs must undercut greedy=$greedy for 6 merges")
    assert(batched <= greedy / 2,
      s"3x batching should at least halve driver actions: $batched vs $greedy")
    assert(batched < audited, "the audit pass must be optional and off")
  }
}
