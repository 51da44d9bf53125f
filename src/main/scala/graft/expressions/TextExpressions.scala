package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hash kernels
  * (SURVEY.md §2b: MinHash+LSH, SimHash, fingerprinting).
  *
  * Same motivation as [[VectorExpressions]]: the higher-order-function
  * forms in [[graft.ops.TextOps]] are interpreted per element, and the
  * signature kernels are nested folds (a 12-permutation MinHash over a
  * 200-shingle doc costs ~2400 interpreted lambda frames per row —
  * benched as the dominant cost of the dedup suite). Each expression
  * here generates one tight primitive loop, preserving the exact
  * oracle-parity arithmetic (mod P = 1e9+7 family) the DuckDB
  * differential check verifies bit-for-bit.
  *
  * All are null-intolerant on the array input and assume non-null
  * elements (guaranteed upstream: `split` never produces null tokens,
  * hash arrays are built by these same expressions).
  */
object TextExpressions {

  val P = 1000000007L

  /** Per-token polynomial rolling hash: for each token,
    * `fold(h, cp) = (h*31 + codepoint) % P` over the token's Unicode
    * code points — mirrors `ascii()` over DuckDB's `string_split(w,'')`
    * (code points, not UTF-16 units or bytes). */
  case class PolyHashTokens(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def prettyName: String = "graft_polyhash_tokens"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes = Seq(ArrayType(StringType))

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var k = 0
      while (k < n) {
        out(k) = hashTokenAt(arr, k)
        k += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val k = ctx.freshName("k")
        val out = ctx.freshName("out")
        s"""
           |final int $n = $a.numElements();
           |final long[] $out = new long[$n];
           |for (int $k = 0; $k < $n; $k++) {
           |  $out[$k] = $cls.MODULE$$.hashTokenAt($a, $k);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Element accessor for [[PolyHashTokens]] (eval + generated code).
    * The output type declares containsNull=false, so a NULL input token
    * must fail loudly — the internal pipeline never produces one
    * (`split` yields no null tokens), but the expression is exposed to
    * arbitrary SQL as graft_polyhash_tokens, where `array('a', NULL)`
    * would otherwise NPE deep inside the hash loop. */
  def hashTokenAt(arr: ArrayData, i: Int): Long = {
    if (arr.isNullAt(i)) throw new IllegalArgumentException(
      s"graft_polyhash_tokens: NULL token at index $i " +
        "(input array must have non-null elements)")
    hashToken(arr.getUTF8String(i))
  }

  /** Shared token-hash kernel (called from generated code too). Walks
    * Unicode code points so multi-byte characters hash identically to
    * the DuckDB `ascii()`-per-character mirror — decoded directly from
    * the UTF8String's bytes (no per-token JVM String allocation in the
    * hot loop; this kernel exists because allocation-heavy hashing was
    * the dedup suite's dominant cost). */
  def hashToken(s: UTF8String): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        // Invalid lead bytes (bare continuation 0x80-0xBF, 0xF8-0xFF)
        // hash as U+FFFD and consume ONE byte — swallowing following
        // bytes would silently shift every later character's hash.
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
        else if ((b0 & 0xf8) == 0xf0) { cp = b0 & 0x07; len = 4 }
        else { cp = 0xfffd }
        if (len > 1) {
          // A truncated or broken trail also degrades to U+FFFD (one
          // byte consumed) rather than hashing a bit-salvaged value.
          var k = 1
          var ok = i + len <= n
          while (ok && k < len) {
            val bk = s.getByte(i + k) & 0xff
            if ((bk & 0xc0) != 0x80) ok = false
            else { cp = (cp << 6) | (bk & 0x3f); k += 1 }
          }
          if (!ok) { cp = 0xfffd; len = 1 }
        }
      }
      h = (h * 31 + cp) % P
      i += len
    }
    h
  }

  /** Count of elements (duplicates included) that belong to a fixed
    * string set — the marker-scoring / stopword-ratio kernel
    * (`size(filter(ws, _.isin(set)))` costs one interpreted lambda
    * frame per token per set; language-ID scores 5 sets per doc).
    * The set is built once per expression and referenced from the
    * generated code. */
  case class CountInSet(child: Expression, set: Seq[String])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_count_in_set"
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(StringType))

    @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](set.size * 2)
      set.foreach(v => s.add(UTF8String.fromString(v)))
      s
    }

    override def nullSafeEval(a: Any): Any =
      countIn(a.asInstanceOf[ArrayData], lookup)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$"
      val setRef = ctx.addReferenceObj("graftSet", lookup,
        classOf[java.util.HashSet[UTF8String]].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $cls.MODULE$$.countIn($a, $setRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Membership-count kernel shared by eval and generated code. */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Adjacent-triple composition of token hashes:
    * `(th[i]*1009 + th[i+1]*9176 + th[i+2]) % P` for i in 0..n-3
    * (empty when n < 3). NOT deduplicated — wrap in `array_distinct`
    * for set semantics (mirrors the oracle's `list_distinct`). */
  case class ShingleHashes3(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def prettyName: String = "graft_shingle_hashes3"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes = Seq(ArrayType(LongType))

    override def nullSafeEval(a: Any): Any = {
      val th = a.asInstanceOf[ArrayData]
      val n = th.numElements()
      val m = math.max(n - 2, 0)
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        out(i) = (th.getLong(i) * 1009 + th.getLong(i + 1) * 9176 +
          th.getLong(i + 2)) % P
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
           |final int $n = $a.numElements();
           |final int $m = java.lang.Math.max($n - 2, 0);
           |final long[] $out = new long[$m];
           |for (int $i = 0; $i < $m; $i++) {
           |  $out[$i] = ($a.getLong($i) * 1009L + $a.getLong($i + 1) * 9176L +
           |    $a.getLong($i + 2)) % ${P}L;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-permutation MinHash signature over hashed shingles:
    * `sig[j] = min_h (h*(2j+1) + j*12345 + 67) % P`, identity `P` on an
    * empty input (P > any value mod P) — the exact arithmetic of
    * [[graft.ops.TextOps.minhashSig]] and the DuckDB oracle. One pass
    * over the hashes, k cheap multiply-adds per element. */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    // Analysis-time failure (SQL callers reach this via graft_minhash_sig);
    // unvalidated, a negative k would NegativeArraySizeException per-row
    // at execution instead.
    require(k >= 1, s"graft_minhash_sig: k must be >= 1, got $k")
    override def prettyName: String = "graft_minhash_sig"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes = Seq(ArrayType(LongType))

    override def nullSafeEval(a: Any): Any = {
      val hs = a.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val sig = Array.fill(k)(P)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val cand = (h * (2 * j + 1) + j * 12345L + 67) % P
          if (cand < sig(j)) sig(j) = cand
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val cand = ctx.freshName("cand")
        val sig = ctx.freshName("sig")
        s"""
           |final int $n = $a.numElements();
           |final long[] $sig = new long[$k];
           |java.util.Arrays.fill($sig, ${P}L);
           |for (int $i = 0; $i < $n; $i++) {
           |  final long $h = $a.getLong($i);
           |  for (int $j = 0; $j < $k; $j++) {
           |    final long $cand = ($h * (2L * $j + 1L) + $j * 12345L + 67L) % ${P}L;
           |    if ($cand < $sig[$j]) $sig[$j] = $cand;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** n-word shingles of a token array: element i is
    * `ws[i] + " " + ... + ws[i+n-1]`, empty when the doc has fewer than
    * n tokens. NOT deduplicated — wrap in `array_distinct` (mirrors
    * the oracle's `list_distinct` over the same concatenation). */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    require(n >= 1)
    override def prettyName: String = "graft_word_shingles"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def inputTypes = Seq(ArrayType(StringType))

    override def nullSafeEval(a: Any): Any =
      shingleConcat(a.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $cls.MODULE$$.shingleConcat($a, $n);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shingle-concat kernel shared by eval and generated code. One pass,
    * UTF8String byte-level concat (no JVM String round-trip). */
  def shingleConcat(ws: ArrayData, n: Int): GenericArrayData = {
    val len = ws.numElements()
    val m = math.max(len - (n - 1), 0)
    val out = new Array[AnyRef](m)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = ws.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED distinct string arrays — one
    * allocation-free merge pass. `array_intersect` builds a hash set
    * per CALL, which in a pairwise verify step means one set build per
    * candidate pair (the dedup suite evaluates 10^5..10^6 pairs per
    * batch — benched as the dominant verify cost); sorting each array
    * once upstream amortizes to one sort per DOC instead.
    *
    * Contract: both inputs ascending in UTF8String binary order (what
    * `array_sort` produces for strings) with no duplicates — the
    * caller sorts; unsorted input silently undercounts, so the op
    * wrapper [[graft.ops.TextOps.jaccardSorted]] owns the sorting. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_sorted_intersect_count"
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))

    override def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = TextExpressions.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = $cls.MODULE$$.sortedIntersectCount($a, $b);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Merge-count kernel shared by eval and generated code. NULL
    * elements fail loudly (exposed to arbitrary SQL like the other
    * kernels; a silent skip would miscount the union size too). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "graft_sorted_intersect_count: NULL array element " +
            "(inputs must be sorted arrays of non-null strings)")
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** `bits`-wide SimHash over hashed shingles: bit j set when more than
    * half the hashes have bit j set (strict majority, tie -> 0) — the
    * exact arithmetic of [[graft.ops.TextOps.simhashBits]]. Note the
    * useful width is bounded by the input hash domain: over the mod-P
    * parity hashes only bits 0..29 ever vary (P ≈ 2^30), so wider
    * signatures gain nothing there; over xxhash64 inputs up to 62 bits
    * are meaningful. */
  case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    // 62 keeps `1L << j` and the oracle's power(2, j) BIGINT-exact.
    require(bits >= 1 && bits <= 62,
      s"graft_simhash: bits must be in [1, 62], got $bits")
    override def prettyName: String = "graft_simhash"
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(LongType))

    override def nullSafeEval(a: Any): Any = {
      val hs = a.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val counts = new Array[Long](bits)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var j = 0
        while (j < bits) {
          counts(j) += (h >> j) & 1L
          j += 1
        }
        i += 1
      }
      var sim = 0L
      var j = 0
      while (j < bits) {
        if (counts(j) * 2 > n) sim |= 1L << j
        j += 1
      }
      sim
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val counts = ctx.freshName("counts")
        val sim = ctx.freshName("sim")
        s"""
           |final int $n = $a.numElements();
           |final long[] $counts = new long[$bits];
           |for (int $i = 0; $i < $n; $i++) {
           |  final long $h = $a.getLong($i);
           |  for (int $j = 0; $j < $bits; $j++) {
           |    $counts[$j] += ($h >> $j) & 1L;
           |  }
           |}
           |long $sim = 0L;
           |for (int $j = 0; $j < $bits; $j++) {
           |  if ($counts[$j] * 2 > $n) $sim |= 1L << $j;
           |}
           |${ev.value} = $sim;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
