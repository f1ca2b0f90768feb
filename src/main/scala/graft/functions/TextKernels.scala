package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Row-kernel implementations shared by the interpreted `eval` path
  * and the generated code of the custom expressions: `doGenCode`
  * emits a single static-style call (`TextKernels$.MODULE$.xxx(...)`),
  * so the expression participates in whole-stage codegen — child
  * columns arrive through the generated unsafe-row accessors instead
  * of the boxed `Expression.eval(InternalRow)` detour CodegenFallback
  * takes per row. */
object TextKernels {

  final val MinHashP = 2147483647L

  def shingles(textU: UTF8String, n: Int, word: Boolean): ArrayData = {
    val text = textU.toString
    val out = new java.util.LinkedHashSet[String]()
    if (word) {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
    } else {
      var i = 0
      while (i + n <= text.length) {
        out.add(text.substring(i, i + n))
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    ArrayData.toArrayData(arr)
  }

  def simHash64(textU: UTF8String): Long = {
    val toks = textU.toString.split("\\s+")
    val lanes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = XxHash64Function.hash(
          UTF8String.fromString(toks(t)), StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) lanes(i) += 1 else lanes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (lanes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** Portable SimHash over pre-hashed tokens: bit j of the fingerprint
    * is set iff strictly more tokens than not have bit 0 set in the
    * j-th affine reshuffle (a_j·h + b_j) mod P of their polynomial
    * hash. Every step is non-negative 63-bit-safe integer arithmetic,
    * so an ANSI engine replays the exact fingerprint — unlike
    * [[simHash64]]'s xxhash64 lanes. nBits = as.length (≤ 62 keeps the
    * fingerprint a positive long). */
  def simHashPoly(hs: ArrayData, as: Array[Long], bs: Array[Long]): Long = {
    val nBits = as.length
    val n = hs.numElements()
    val ones = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < nBits) {
        if ((((as(j) * h + bs(j)) % MinHashP) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < nBits) { if (2 * ones(j) > n) fp |= (1L << j); j += 1 }
    fp
  }

  /** One BPE merge application: greedy left-to-right replacement of
    * adjacent symbol pair (l, r) with their concatenation — the
    * standard tokenizer-training step (Sennrich et al., ACL 2016).
    * Greedy-scan semantics equal the closed form "merge every match
    * position, except in runs of l==r keep only even offsets from the
    * run start" — which is what the SQL oracle replays. */
  def bpeMergeStep(a: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = a.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.getUTF8String(i).equals(l)
          && a.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(l, r)); i += 2
      } else { out.add(a.getUTF8String(i)); i += 1 }
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** T5-style span-corruption rendering: maximal masked runs collapse
    * to `<extra_id_k>` sentinels. `targets = false` renders the input
    * side (unmasked tokens + sentinels in place of each run);
    * `targets = true` renders the target side (each sentinel followed
    * by the tokens it hid). One JVM loop; single-space joined. */
  def spanCorrupt(toks: ArrayData, mask: ArrayData,
      targets: Boolean): UTF8String = {
    val n = toks.numElements()
    val sb = new java.lang.StringBuilder()
    var k = -1
    var prev = false
    var i = 0
    def app(s: String): Unit = {
      if (sb.length > 0) sb.append(' ')
      sb.append(s)
    }
    while (i < n) {
      val m = mask.getBoolean(i)
      if (m && !prev) { k += 1; app(s"<extra_id_$k>") }
      if (m == targets) app(toks.getUTF8String(i).toString)
      prev = m
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def minHashSig(hs: ArrayData, isString: Boolean,
      as: Array[Long], bs: Array[Long]): ArrayData = {
    val numPerms = as.length
    val n = hs.numElements()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = if (isString) {
        val x = XxHash64Function.hash(hs.getUTF8String(i), StringType, 42L)
        val m = x % MinHashP
        if (m < 0) m + MinHashP else m // pmod
      } else hs.getLong(i)
      var j = 0
      while (j < numPerms) {
        val p = (as(j) * h + bs(j)) % MinHashP
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  def jaccardHash(a: ArrayData, b: ArrayData): Double = {
    var x = a; var y = b
    if (x.numElements() > y.numElements()) { val t = x; x = y; y = t }
    val nx = x.numElements(); val ny = y.numElements()
    if (nx + ny == 0) return 0.0
    val set = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < ny) { if (set.contains(y.getUTF8String(i))) inter += 1; i += 1 }
    val uni = nx + ny - inter
    if (uni == 0) 0.0 else inter.toDouble / uni
  }

  def jaccardSorted(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements(); val ny = y.numElements()
    if (nx + ny == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val uni = nx + ny - inter
    if (uni == 0) 0.0 else inter.toDouble / uni
  }

  /** Rolling polynomial hash of every string in an array: (acc·31 +
    * codePoint) mod 1e9+7 over the characters of each element — the
    * q31 fingerprint fold, one JVM loop per element instead of a
    * nested interpreted aggregate-inside-transform tree (which costs
    * per-shingle-per-char interpretation in the LSH hot path). Code
    * points match both `ascii(split(s, ''))` on BMP text and DuckDB's
    * `ord(s[i])`. */
  /** Fused winnowing fingerprints (Schleimer et al.) over a
    * (pre-stripped, pre-lowered) string: hash every k-codepoint gram
    * with the q31 polynomial (mod 1e9+7), then pick the RIGHTMOST
    * minimal hash of every w-window (the single all-covering window
    * when m < w) with a monotone index deque — amortized O(n)
    * selection, O(n·k) hashing, ZERO intermediate arrays of gram
    * strings (the split-chars + transform/slice/concat_ws + HOF-fold
    * formulation this replaced allocated per gram and benched 8.1 s on
    * the sf0.1 corpus; this kernel is one JVM loop per row). Picks
    * return first-seen-distinct, encoded (hash << 32) | 1-based-pos —
    * hash < 2^30 and pos < 2^31, so the packing is exact and
    * distinctness on the encoded long IS pair distinctness. Tie
    * handling: a new equal hash evicts the older candidate (`>=` pop),
    * so the deque head is always the rightmost minimum — the order the
    * q177 oracle pins. Codepoint semantics match DuckDB's ord()
    * indexing on BMP text (same caveat as [[polyHashAll]]). */
  def winnowFingerprint(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    var n = 0
    var oi = 0
    while (oi < str.length) { n += 1; oi += Character.charCount(str.codePointAt(oi)) }
    val cps = new Array[Int](n)
    var ci = 0
    oi = 0
    while (oi < str.length) {
      val cp = str.codePointAt(oi); cps(ci) = cp; ci += 1
      oi += Character.charCount(cp)
    }
    val m = n - k + 1
    if (m < 1) return ArrayData.toArrayData(Array.empty[Long])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(i + j)) % 1000000007L; j += 1 }
      hs(i) = acc
      i += 1
    }
    val res = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    val idx = new Array[Int](m)
    var head = 0
    var tail = 0
    var j = 0
    while (j < m) {
      val h = hs(j)
      while (tail > head && hs(idx(tail - 1)) >= h) tail -= 1
      idx(tail) = j; tail += 1
      while (idx(head) < j - w + 1) head += 1
      if (j >= w - 1 || j == m - 1) {
        val b = idx(head)
        val enc = (hs(b) << 32) | (b + 1).toLong
        if (seen.add(enc)) res += enc
      }
      j += 1
    }
    ArrayData.toArrayData(res.toArray)
  }

  /** Content-defined chunking in one pass: a position p (1-based
    * codepoint index, p ≥ k) ends a chunk when the k-gram poly hash
    * ending at p satisfies `hash % div == 0`; the document end always
    * ends the final chunk. Emits one encoded long per chunk:
    * (chunkPolyHash << 32) | chunkLen — hash < 2^30 and codepoint
    * length < 2^32, so the pack is exact. Purely stateless per
    * position (no min/max-size clamps), which is exactly what lets an
    * external engine replay every boundary in ANSI SQL; size clamps
    * are a trivial kernel extension but make the rule sequential. */
  def cdcChunks(s: UTF8String, k: Int, div: Long): ArrayData = {
    val str = s.toString
    var n = 0
    var oi = 0
    while (oi < str.length) { n += 1; oi += Character.charCount(str.codePointAt(oi)) }
    if (n == 0) return ArrayData.toArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var ci = 0
    oi = 0
    while (oi < str.length) {
      val cp = str.codePointAt(oi); cps(ci) = cp; ci += 1
      oi += Character.charCount(cp)
    }
    val res = new scala.collection.mutable.ArrayBuffer[Long]()
    var chunkHash = 0L
    var start = 0
    var p = 0
    while (p < n) {
      chunkHash = (chunkHash * 31L + cps(p)) % 1000000007L
      var isCut = false
      if (p + 1 >= k) {
        var gh = 0L
        var j = p + 1 - k
        while (j <= p) { gh = (gh * 31L + cps(j)) % 1000000007L; j += 1 }
        isCut = gh % div == 0L
      }
      if (isCut || p == n - 1) {
        res += (chunkHash << 32) | (p - start + 1).toLong
        chunkHash = 0L
        start = p + 1
      }
      p += 1
    }
    ArrayData.toArrayData(res.toArray)
  }

  def polyHashAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var acc = 0L
      var k = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        acc = (acc * 31L + cp) % 1000000007L
        k += Character.charCount(cp)
      }
      out(i) = acc
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
