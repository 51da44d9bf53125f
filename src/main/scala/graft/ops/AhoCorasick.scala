package graft.ops

import scala.collection.mutable

/** Aho–Corasick multi-pattern string matching: ONE pass over each
  * document finds every occurrence of every pattern, overlapping
  * included — the shape a blocklist/keyword-tagging stage needs at
  * corpus scale, where scanning 100 TB once per pattern (or running a
  * per-pattern `LIKE`) multiplies the read bill by the pattern count.
  * The automaton is built once on the driver from the (small) pattern
  * list and ships inside the task closure — O(total pattern chars)
  * state, broadcast-sized — while the text side stays a narrow
  * per-partition scan: no shuffle until the tiny per-pattern
  * aggregation.
  *
  * Counting semantics: every match END position is counted, so
  * patterns overlapping themselves ("a a" in "a a a") and each other
  * ("scan" inside "scan query") all register — the dictionary-suffix
  * link chain (`dictLink`) makes that O(matches), not O(patterns),
  * per position.
  *
  * Reference analog: the reference cleans text with per-column scalar
  * ops only (`workflow/Transformer.py:31-38`); multi-pattern tagging
  * is part of the training-data extension surface, not a port.
  */
final class AhoCorasick private (
    next: Array[Array[Int]],      // goto: node -> char -> node (-1 = none)
    fail: Array[Int],             // failure links
    patHere: Array[List[Int]],    // pattern indices ending exactly here
    dictLink: Array[Int],         // nearest fail-ancestor with a pattern
    val nPatterns: Int) extends Serializable {

  /** Occurrence count per pattern index (overlapping included). */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i) & 0x7f
      while (node != 0 && next(node)(c) == -1) node = fail(node)
      if (next(node)(c) != -1) node = next(node)(c)
      // harvest every pattern ending at this position via the
      // dictionary-suffix chain (each hop lands on a node that ends
      // at least one pattern, so total work is O(matches))
      var d = if (patHere(node).nonEmpty) node else dictLink(node)
      while (d != 0) {
        patHere(d).foreach(p => counts(p) += 1)
        d = dictLink(d)
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  /** Build the automaton (trie + BFS failure/dictionary links).
    * ASCII-only by construction: documents are lowercase word soup;
    * non-ASCII chars are masked to 7 bits (never present in either
    * side here, and a false transition only costs a missed match on
    * data that violates the stated domain). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty")
    val next = mutable.ArrayBuffer(Array.fill(128)(-1))
    val patHere = mutable.ArrayBuffer[List[Int]](Nil)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        val c = ch & 0x7f
        if (next(node)(c) == -1) {
          next += Array.fill(128)(-1)
          patHere += Nil
          next(node)(c) = next.length - 1
        }
        node = next(node)(c)
      }
      patHere(node) = pi :: patHere(node)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val dictLink = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    var c = 0
    while (c < 128) {
      val ch = next(0)(c)
      if (ch != -1) { fail(ch) = 0; queue += ch }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dictLink(u) =
        if (patHere(fail(u)).nonEmpty) fail(u) else dictLink(fail(u))
      var c = 0
      while (c < 128) {
        val v = next(u)(c)
        if (v != -1) {
          var f = fail(u)
          while (f != 0 && next(f)(c) == -1) f = fail(f)
          fail(v) = if (next(f)(c) != -1 && next(f)(c) != v) next(f)(c) else 0
          queue += v
        }
        c += 1
      }
    }
    new AhoCorasick(next.toArray, fail, patHere.toArray, dictLink,
      patterns.length)
  }
}
