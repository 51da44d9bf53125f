package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("t").select(c.as("r")).head().get(0)

  test("polyHash matches the reference fold arithmetic") {
    // ((0*31+97)*31+98)*31+99 = 96354, verified against DuckDB's
    // list_reduce over ascii codes.
    assert(one(TextOps.polyHash(lit("abc"))) === 96354L)
  }

  test("polyHash is order-sensitive and deterministic") {
    assert(one(TextOps.polyHash(lit("ab"))) !== one(TextOps.polyHash(lit("ba"))))
    assert(one(TextOps.polyHash(lit("ab"))) === one(TextOps.polyHash(lit("ab"))))
  }

  test("wordShingles: distinct n-grams, empty under n tokens") {
    val sh = one(TextOps.wordShingles(split(lit("a b c d"), " "), 3))
      .asInstanceOf[collection.Seq[String]]
    assert(sh === Seq("a b c", "b c d"))
    val short = one(TextOps.wordShingles(split(lit("a b"), " "), 3))
      .asInstanceOf[collection.Seq[String]]
    assert(short.isEmpty)
  }

  test("minhashSig: k values, each <= every permuted hash") {
    val hashes = array(lit(100L), lit(999L), lit(5L))
    val sig = one(TextOps.minhashSig(hashes, 4)).asInstanceOf[collection.Seq[Long]]
    assert(sig.length === 4)
    // permutation j=0 is identity*1+67: min is 5*1+67 = 72
    assert(sig.head === 72L)
  }

  test("near-identical shingle sets agree on most minhash components") {
    val a = (1 to 50).map(i => s"tok$i")
    val b = a.updated(25, "CHANGED")
    val df = Seq((a, b)).toDF("a", "b")
    val Seq(sa, sb) = df.select(
      TextOps.minhashSig(transform(col("a"), t => TextOps.polyHash(t)), 12).as("sa"),
      TextOps.minhashSig(transform(col("b"), t => TextOps.polyHash(t)), 12).as("sb"))
      .head().toSeq.map(_.asInstanceOf[collection.Seq[Long]])
    val agree = sa.zip(sb).count { case (x, y) => x == y }
    assert(agree >= 9, s"only $agree/12 components agree")
  }

  test("simhash16 stays in 16 bits and identical inputs collide") {
    val hs = array((1 to 20).map(i => lit(i * 7919L)): _*)
    val s1 = one(TextOps.simhash16(hs)).asInstanceOf[Long]
    assert(s1 >= 0L && s1 < 65536L)
    assert(one(TextOps.simhash16(hs)) === s1)
  }

  test("simhashBits: width bound respected, 16-bit prefix consistent") {
    val hs = array((1 to 20).map(i => lit(i * 7919L)): _*)
    val s30 = one(TextOps.simhashBits(hs, 30)).asInstanceOf[Long]
    assert(s30 >= 0L && s30 < (1L << 30))
    // widening the signature never changes the low bits
    assert((s30 & 0xffffL) === one(TextOps.simhash16(hs)).asInstanceOf[Long])
    // matches the interpreted HOF reference at the q29 width
    assert(s30 === one(TextOps.simhashBitsHof(hs, 30)).asInstanceOf[Long])
    intercept[IllegalArgumentException] {
      graft.expressions.TextExpressions.SimHashBits(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 63)
    }
  }

  test("codegen kernels match the interpreted HOF reference forms") {
    // Random-ish docs exercising short/long/duplicate/multibyte tokens.
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",
      "x",
      "tok tok tok tok tok",
      "héllo wörld naïve café déjà vu encore une fois",
      (1 to 300).map(i => s"w${i * 7 % 97}").mkString(" "))
    val df = docs.toDF("text")
    val ws = split(col("text"), " ")
    val rows = df.select(
      TextOps.tokenHashes(ws).as("th_c"),
      TextOps.tokenHashesHof(ws).as("th_h"),
      TextOps.minhashSig(TextOps.shingleHashes3(ws), 12).as("mh_c"),
      TextOps.minhashSigHof(TextOps.shingleHashes3(ws), 12).as("mh_h"),
      TextOps.simhash16(TextOps.shingleHashes3(ws)).as("sh_c"),
      TextOps.simhash16Hof(TextOps.shingleHashes3(ws)).as("sh_h"),
      TextOps.wordShingles(ws, 3).as("wsh_c"),
      TextOps.wordShinglesHof(ws, 3).as("wsh_h"),
      TextOps.countInSet(ws, Seq("the", "a", "café")).as("cnt_c"),
      size(filter(ws, t => t.isin("the", "a", "café"))).cast("long").as("cnt_h"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), "tokenHashes")
      assert(r.getSeq[Long](2) === r.getSeq[Long](3), "minhashSig")
      assert(r.getLong(4) === r.getLong(5), "simhash16")
      assert(r.getSeq[String](6) === r.getSeq[String](7), "wordShingles")
      assert(r.getLong(8) === r.getLong(9), "countInSet")
    }
  }

  test("codegen kernels: null array -> null, empty array -> identity") {
    val df = Seq((Option(Seq("a", "b", "c")), Option.empty[Seq[String]]))
      .toDF("ws", "nil")
    val r = df.select(
      TextOps.tokenHashes(col("nil")).as("th_null"),
      TextOps.wordShingles(col("nil"), 3).as("sh_null"),
      TextOps.minhashSig(TextOps.shingleHashes3(col("nil")), 4).as("mh_null"),
      TextOps.wordShingles(split(lit("a b"), " "), 3).as("sh_short"),
      TextOps.minhashSig(array().cast("array<long>"), 4).as("mh_empty"),
      TextOps.simhash16(array().cast("array<long>")).as("sim_empty"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      "null input must propagate null")
    assert(r.getSeq[String](3).isEmpty, "under-n tokens -> empty shingles")
    assert(r.getSeq[Long](4) === Seq.fill(4)(TextOps.P),
      "empty minhash = identity P per permutation")
    assert(r.getLong(5) === 0L, "empty simhash = 0")
  }

  test("jaccard: exact rational, identical and disjoint extremes") {
    val a = array(lit("x"), lit("y"))
    val b = array(lit("x"), lit("z"))
    assert(one(TextOps.jaccard(a, a)) === 1.0)
    assert(one(TextOps.jaccard(a, b)) === 0.3333)
  }

  test("jaccardSorted agrees with jaccard on random distinct-sorted sets") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    val rows = (0 until 200).map { _ =>
      val a = rnd.shuffle(vocab).take(1 + rnd.nextInt(20)).sorted
      val b = rnd.shuffle(vocab).take(1 + rnd.nextInt(20)).sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val mismatched = df.select(
        TextOps.jaccard(col("a"), col("b")).as("hash"),
        TextOps.jaccardSorted(col("a"), col("b")).as("merge"))
      .filter(not(col("hash") <=> col("merge")))
    assert(mismatched.count() === 0)
  }

  test("jaccardSorted extremes and empty-side behavior") {
    val a = array(lit("x"), lit("y"))
    val b = array(lit("x"), lit("z"))
    assert(one(TextOps.jaccardSorted(a, a)) === 1.0)
    assert(one(TextOps.jaccardSorted(a, b)) === 0.3333)
    val empty = array().cast("array<string>")
    assert(one(TextOps.jaccardSorted(a, empty)) === 0.0)
  }

  test("sorted-intersect of a NULL element fails with a descriptive error") {
    // NULL placed where the merge reaches it (the check is lazy: a
    // trailing NULL past the other side's exhaustion is never compared).
    val e = intercept[Exception] {
      Seq("x").toDF("t")
        .select(TextOps.jaccardSorted(
          array(lit(null).cast("string"), lit("a")), array(lit("a"))))
        .head()
    }
    assert(e.getMessage.contains("graft_sorted_intersect_count") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("graft_sorted_intersect_count"))
  }

  test("cardinality params fail at construction, not per-row") {
    import graft.expressions.{TextExpressions, VectorExpressions}
    import org.apache.spark.sql.catalyst.expressions.Literal
    intercept[IllegalArgumentException] {
      TextExpressions.MinHashSig(Literal(1L), 0)
    }
    intercept[IllegalArgumentException] {
      TextExpressions.MinHashSig(Literal(1L), -3)
    }
    intercept[IllegalArgumentException] {
      VectorExpressions.HyperplaneBucket(Literal(1.0), 64)
    }
    intercept[IllegalArgumentException] {
      VectorExpressions.HyperplaneBucket(Literal(1.0), 0)
    }
  }

  test("polyhash of a NULL token fails with a descriptive error") {
    val e = intercept[Exception] {
      Seq("x").toDF("t")
        .select(TextOps.tokenHashes(
          array(lit("a"), lit(null).cast("string"))))
        .head()
    }
    // The message must name the function — SQL callers can reach this
    // with graft_polyhash_tokens(array('a', NULL)).
    assert(e.getMessage.contains("graft_polyhash_tokens") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("graft_polyhash_tokens"))
  }
}
