package graft.expr

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE native expression over the token array.
  *
  * The shuffle-based formulation (explode shingles → distinct → groupBy(doc)
  * with numHashes min() aggregates) moves every shingle of every document
  * through two exchanges. But a document's shingles live in its own row —
  * the whole signature is a per-row scalar computation. This expression
  * evaluates it in one tight loop inside whole-stage codegen: shuffle
  * volume drops from O(docs·shingles) to zero (the signature itself is the
  * only thing downstream ops exchange).
  *
  * Math is bit-identical to the SQL oracle (TextQueries.sigCte): shingle =
  * space-joined n-gram of tokens, x = int(md5(shingle)[0:14 hex]) mod P,
  * sig[i] = min over shingles of (a_i·x + b_i) mod P. min over the shingle
  * multiset equals min over the distinct set, so no dedup pass is needed.
  * Returns an empty array when the document has < shingleSize tokens
  * (posexplode then emits no rows — same semantics as exploding no
  * shingles). */
case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val (aArr, bArr) = {
    val ps = MinHashSig.hashParams(numHashes)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], shingleSize, aArr, bArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      s"${ev.value} = graft.expr.MinHashSig.compute($c, $shingleSize, $aRef, $bRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
  * algorithm): hash every k-gram of the token array, slide a window of
  * `winSize` hashes, select each window's minimum; the fingerprint is the
  * distinct selected hashes (sorted ascending for determinism). Guarantees
  * any shared run of ≥ winSize+k-1 tokens yields a shared fingerprint.
  * Hashes are the 56-bit md5 prefix — exact cross-engine vs the DuckDB
  * list_transform/list_min oracle (tie positions don't matter because only
  * hash VALUES are kept). Fewer than winSize k-grams → one window over all
  * of them; fewer than k tokens → empty. Sliding min is a monotonic deque,
  * O(#grams) per row, inside whole-stage codegen. */
case class Winnow(child: Expression, k: Int, winSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], k, winSize)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Winnow.compute($c, $k, $winSize);")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  def compute(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val m = toks.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Long])
    val n = m - k + 1
    val hs = new Array[Long](n)
    val md = MinHashSig.md5.get()
    val sep = ' '.toByte
    var i = 0
    while (i < n) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(sep)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val dig = md.digest()
      var x = 0L
      var b = 0
      while (b < 7) { x = (x << 8) | (dig(b) & 0xffL); b += 1 }
      hs(i) = x
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (n <= w) {
      var mn = hs(0)
      i = 1
      while (i < n) { if (hs(i) < mn) mn = hs(i); i += 1 }
      sel.add(mn)
    } else {
      // monotonic deque of indices, increasing hash value front-to-back
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Jaro–Winkler similarity (Winkler '90) as a codegen'd expression —
  * the edit-distance complement for entity resolution on short strings
  * (names, titles): transposition-tolerant, prefix-boosted, O(len·window)
  * instead of Levenshtein's O(len²) DP.
  *
  * Semantics are DuckDB's `jaro_winkler_similarity` (the RapidFuzz
  * formulation the oracle runs): match window ⌊max(l₁,l₂)/2⌋−1,
  * transpositions counted over matched sequences, sim = (m/l₁ + m/l₂ +
  * (m−t)/m)/3 with that exact float op order, Winkler boost
  * `sim += prefix·0.1·(1−sim)` (common prefix capped at 4) only when
  * sim > 0.7. Bytes are compared (UTF8String), matching DuckDB's
  * byte-wise loop — identical on ASCII, consistently byte-wise on both
  * engines beyond it. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def compute(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.getBytes
    val b = sb.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val bound = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - bound)
      val hi = math.min(l2 - 1, i + bound)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val sim = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (sim <= 0.7) return sim
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && a(prefix) == b(prefix)) prefix += 1
    sim + prefix * 0.1 * (1.0 - sim)
  }
}

/** The engine-wide 56-bit md5 hash (`TextOps.hash56`) as one native
  * expression: first 7 digest bytes big-endian → long, the same value
  * as `conv(substring(md5(c), 1, 14), 16, 10)` (first 14 hex chars ARE
  * the first 7 bytes; conv's unsigned base-16 parse is the big-endian
  * byte fold). The SQL chain it replaces allocated a 32-char hex
  * string, a substring, and conv's base-conversion string per call —
  * ~70 call sites ride this hash (token hashing, md5-deterministic
  * sampling/banding), so the per-call garbage was engine-wide. Null in,
  * null out (UnaryExpression default), matching md5→conv→cast. */
case class Hash56(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash56_md5"

  override def nullSafeEval(input: Any): Any =
    Hash56.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Hash56.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Hash56 =
    copy(child = newChild)
}

object Hash56 {
  def compute(s: UTF8String): Long = {
    val md = MinHashSig.md5.get()
    md.reset()
    md.update(s.getBytes)
    val dig = md.digest()
    var x = 0L
    var b = 0
    while (b < 7) { x = (x << 8) | (dig(b) & 0xffL); b += 1 }
    x
  }
}

/** Intersection size of two SORTED, duplicate-free long arrays as one
  * merge pass — the verify-stage kernel of the prefix-Jaccard join
  * (SimJoin q412), replacing `size(array_intersect(a, b))`, whose
  * generic implementation builds a hash set per row (allocation per
  * candidate pair; ~1M pairs at sf0.1 on the template-heavy corpus).
  * Contract: both inputs strictly ascending (the `array_sort(
  * collect_list(distinct-hash))` frames) — equality with
  * array_intersect under that contract is pinned by SimExprSpec.
  * Null array in, null out; elements are non-null longs. */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_inter_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedInterCount.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.SortedInterCount.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** The whole prefix-Jaccard VERIFY stage as one allocation-free
  * expression over the two sorted token-hash arrays: the generalized
  * pair-prefix filter (PPJoin+'s suffix-side lemma) and the exact
  * intersection count with the standard early-abort bound
  * (inter_so_far + min(remaining) < α ⇒ the pair cannot reach
  * Jaccard ≥ τ). Replaces `arrays_overlap(slice(a,…), slice(b,…))` +
  * intersect — the two slice() calls allocated copies of both prefix
  * arrays per candidate pair (~6.35M pairs × ~KB at sf0.1).
  *
  * Result contract: for pairs with Jaccard ≥ τ the return value is the
  * EXACT intersection size (the abort bound can only fire when the true
  * count is provably below α ≤ ⌈τ/(1+τ)·(n_a+n_b)⌉, and the prefix
  * filter is the standard no-false-negative lemma); pairs below τ
  * return a value whose implied Jaccard is also below τ (0 on filter/
  * abort), so a downstream `jaccard ≥ τ` filter keeps an identical row
  * set with identical `inter` values — SimJoinSpec's oracle parity and
  * the q412 hash gate both pin this. α replays the Column-side float
  * program bit-for-bit: ceil((n_a+n_b)·(τ/(1+τ)) − 1e-9), the 1e-9
  * slack keeping float dust from ever over-pruning. */
case class PrefixJaccardInter(left: Expression, right: Expression,
    tau: Double) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "prefix_jaccard_inter"

  override def nullSafeEval(a: Any, b: Any): Any =
    PrefixJaccardInter.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], tau)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.PrefixJaccardInter.compute($a, $b, $tau);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PrefixJaccardInter =
    copy(left = newLeft, right = newRight)
}

object PrefixJaccardInter {
  def compute(a: ArrayData, b: ArrayData, tau: Double): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    // identical float program to the Column-side alpha: sizes summed as
    // ints, one double multiply by the precomputed tau/(1+tau), 1e-9
    // slack, ceil
    val aCeil = math.ceil((na + nb).toDouble * (tau / (1.0 + tau)) - 1e-9)
      .toInt
    val la = math.max(1, na - aCeil + 1)
    val lb = math.max(1, nb - aCeil + 1)
    // pair-prefix filter: the first la/lb elements (shared hash order)
    // must intersect for overlap >= aCeil to be possible
    var i = 0
    var j = 0
    var seen = false
    while (!seen && i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) seen = true
      else if (x < y) i += 1
      else j += 1
    }
    if (!seen) return 0L
    // exact merge count with the early-abort bound
    var n = 0L
    i = 0
    j = 0
    while (i < na && j < nb) {
      if (n + math.min(na - i, nb - j) < aCeil) return 0L
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** Content-defined chunks (the Rabin-style CDC boundary rule of
  * TextOps.cdcChunks) as ONE codegen'd expression over the text.
  *
  * The higher-order-function formulation it replaces evaluated
  * `ascii(substring(t, i + j, 1))` per (position, window-offset): each
  * `substring` walks the UTF8String from byte 0 to find character i+j,
  * so a length-n document cost O(n²·w) byte scans plus an interpreted
  * lambda per term (28 s for the q563 suite entry at sf0.1). This
  * expression decodes the codepoint sequence ONCE (O(bytes)), rolls the
  * window polynomial in O(1) per position via
  * h(i+1) = (h(i) − c[i]·baseᵂ⁻¹)·base + c[i+w] — exact in long, the
  * identical integer sequence as the Horner fold — and slices chunks as
  * byte ranges at character boundaries.
  *
  * Semantics replicated bit-for-bit (CdcExprSpec pins equality against
  * the HOF chain, multibyte included): char codes are Unicode
  * codepoints (Spark 4's `ascii` = codePointAt(0) of the first char),
  * boundary positions are 1-based with position 1 always a cut, a
  * boundary falls where h % mask == 0 (Java remainder), and each chunk
  * spans [cut, next cut). Inputs shorter than `window` chars yield the
  * whole text as one chunk (the caller filters length ≥ window anyway). */
case class CdcChunks(child: Expression, window: Int, base: Int, mask: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], window, base, mask)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.CdcChunks.compute($c, $window, $base, $mask);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  def compute(s: UTF8String, w: Int, base: Int, mask: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // character start offsets (UTF-8 lead bytes), one pass
    var nc = 0
    var i = 0
    while (i < nb) { if ((bytes(i) & 0xc0) != 0x80) nc += 1; i += 1 }
    if (nc < w)
      return new GenericArrayData(Array[AnyRef](s))
    val offs = new Array[Int](nc + 1)
    var c = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nc) = nb
    // codepoint per character (= Spark ascii(substring(t, p, 1))).
    // Continuation-byte reads are bounds-guarded (missing bytes read as
    // 0): a truncated multi-byte tail — reachable via binary→string
    // casts, which Spark does not validate — must degrade like the old
    // tolerant HOF chain, not throw AIOOBE (advice r13). Valid UTF-8
    // never takes the guard, so outputs are unchanged.
    def cont(idx: Int): Long = if (idx < nb) (bytes(idx) & 0x3f).toLong else 0L
    val code = new Array[Long](nc)
    c = 0
    while (c < nc) {
      val o = offs(c)
      val b0 = bytes(o) & 0xff
      code(c) =
        if (b0 < 0x80) b0
        else if (b0 < 0xe0)
          ((b0 & 0x1f).toLong << 6) | cont(o + 1)
        else if (b0 < 0xf0)
          ((b0 & 0x0f).toLong << 12) | (cont(o + 1) << 6) |
            cont(o + 2)
        else
          ((b0 & 0x07).toLong << 18) | (cont(o + 1) << 12) |
            (cont(o + 2) << 6) | cont(o + 3)
      c += 1
    }
    // rolling window polynomial, cut char-indices (0-based; 0 always cut)
    var basePow = 1L // base^(w-1)
    i = 1
    while (i < w) { basePow *= base; i += 1 }
    val cuts = new java.util.ArrayList[Integer]()
    cuts.add(0)
    var h = 0L
    i = 0
    while (i < w) { h = h * base + code(i); i += 1 }
    // a boundary at position 1 adds nothing: 1 is always a cut
    var p = 1
    val nPos = nc - w + 1
    while (p < nPos) {
      h = (h - code(p - 1) * basePow) * base + code(p + w - 1)
      if (h % mask == 0) cuts.add(p)
      p += 1
    }
    val k = cuts.size()
    val out = new Array[AnyRef](k)
    i = 0
    while (i < k) {
      val cs = offs(cuts.get(i))
      val ce = if (i + 1 < k) offs(cuts.get(i + 1)) else nb
      out(i) = UTF8String.fromBytes(bytes, cs, ce - cs)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashSig {
  /** Mersenne prime modulus; (2³¹−1)² < 2⁶³ keeps a·x+b inside int64. */
  val P: Long = 2147483647L

  /** MessageDigest.getInstance does a provider lookup — per-task, not
    * per-row (expressions evaluate on many rows per thread). */
  private[expr] val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Deterministic affine-permutation constants (same series as
    * TextOps.hashParams / the oracle SQL literals). */
  def hashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = (((i + 1).toLong * 1103515245L + 12345L) % P).max(1L)
      val b = ((i + 1).toLong * 69069L + 7L) % P
      (a, b)
    }

  def compute(toks: ArrayData, n: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val nTok = toks.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val nh = a.length
    val minima = Array.fill(nh)(Long.MaxValue)
    val md = md5.get()
    val sep = ' '.toByte
    var i = 0
    while (i <= nTok - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(sep)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val dig = md.digest()
      // first 14 hex chars of the md5 = high 56 bits = first 7 bytes
      var x = 0L
      var k = 0
      while (k < 7) { x = (x << 8) | (dig(k) & 0xffL); k += 1 }
      x %= P
      var h = 0
      while (h < nh) {
        val v = (x * a(h) + b(h)) % P
        if (v < minima(h)) minima(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(minima)
  }
}
