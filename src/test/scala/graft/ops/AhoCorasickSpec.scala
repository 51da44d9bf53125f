package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Automaton-only spec (no Spark): the catalog entry q218 exercises
  * the distributed path; here the matching semantics are pinned,
  * including the cases a broken failure or dictionary link would
  * miss. The property test cross-checks against a naive positional
  * scan — the same definition the DuckDB oracle uses. */
class AhoCorasickSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("counts overlapping self-matches") {
    val ac = AhoCorasick.build(Seq("a a"))
    assert(ac.countAll("a a a").toSeq == Seq(2L))
  }

  test("nested patterns both fire (dictionary-suffix links)") {
    val ac = AhoCorasick.build(Seq("scan", "scan query", "an"))
    val c = ac.countAll("scan query scan")
    assert(c.toSeq == Seq(2L, 1L, 2L))
  }

  test("failure links recover mid-pattern") {
    // after reading "abab", failing on 'd' must still find "abd"?
    // no — but "bab" ending inside the overlap must be found
    val ac = AhoCorasick.build(Seq("abab", "bab"))
    assert(ac.countAll("ababab").toSeq == Seq(2L, 2L))
  }

  test("no false positives on absent patterns") {
    val ac = AhoCorasick.build(Seq("zz", "query"))
    assert(ac.countAll("the quick query").toSeq == Seq(0L, 1L))
  }

  test("property: counts equal naive positional scan (200 seeded cases)") {
    // tiny alphabet maximizes pattern self- and cross-overlap — the
    // regime where failure/dictionary links actually carry the result
    val word = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', ' ')).map(_.mkString))
    val caseGen = for {
      text <- Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', ' ')).map(_.mkString))
      pats <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, word))
    } yield (text, pats.distinct)
    (1L to 200L).foreach { seed =>
      val (text, pats) = sample(caseGen, seed)
      if (pats.nonEmpty) {
        val got = AhoCorasick.build(pats).countAll(text).toSeq
        val want = pats.map(p => naive(text, p))
        assert(got == want,
          s"seed=$seed text='$text' pats=$pats: $got != $want")
      }
    }
  }
}
