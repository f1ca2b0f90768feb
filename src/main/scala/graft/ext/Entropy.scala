package graft.ext

/** Lossless ENTROPY CODING for residual planes — the stage that
  * completes the inter-frame codec ladder within public scope
  * (H.264/VP9 = predict + transform + entropy-code; our `00dp`
  * chunks carried the prediction shape since round 12, this adds the
  * entropy stage): byte-level run-length pairs, then a canonical
  * Huffman code in the DEFLATE style — the code table travels as 256
  * code LENGTHS and both ends rebuild the same codes by the
  * canonical rule (sort by (length, symbol), assign consecutive
  * values), so the header costs 256 bytes, not a serialized tree.
  * Integer-exact end to end: encode ∘ decode is the identity on any
  * byte plane (spec-pinned byte-for-byte), which is what lets the
  * scene-cut oracle replay pixels through a REAL entropy decode.
  *
  * Why RLE first: within-scene residuals are the all-zero plane
  * (that is WHY codecs predict) — runs collapse 9600 zero pixels to
  * ~38 (run, value) pairs before the Huffman stage even starts; at a
  * scene cut the residual is dense and the Huffman stage carries the
  * load alone.
  *
  * The container body format (`00dp` chunk payload,
  * [[Video.muxAviInterEntropy]]):
  * {{{
  *   "GRES" magic | u8 mode | le32 w | le32 h | le32 nRle
  *   | mode 0: 256 code-length bytes
  *   | mode 1: u8 usedCount, then (symbol, length) byte pairs
  *   | MSB-first packed codes
  * }}}
  * Mode 1 (sparse table) is chosen whenever it is smaller — the
  * within-scene all-zero residual uses ~3 RLE symbols, and shipping
  * 256 length bytes for it would cost more than the plane (measured:
  * it made the entropy container LARGER than the PNG-residual one it
  * replaces).
  * Truncated or corrupt bitstreams fail LOUDLY (bit exhaustion, RLE
  * over/underrun, bad magic) — a silent wrong plane is how corrupt
  * media poisons a corpus. */
object Entropy {

  // ------------------------------------------------------------- RLE

  /** Byte-level run-length pairs: (run 1..255, value)*. */
  def rleEncode(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i)
      var run = 1
      while (i + run < bytes.length && bytes(i + run) == v && run < 255)
        run += 1
      out.write(run); out.write(v & 0xFF)
      i += run
    }
    out.toByteArray
  }

  /** Inverse of [[rleEncode]]; `n` is the expected plane size and
    * any mismatch is loud. */
  def rleDecode(pairs: Array[Byte], n: Int): Array[Byte] = {
    require(pairs.length % 2 == 0,
      s"RLE stream has odd length ${pairs.length}")
    val out = new Array[Byte](n)
    var i = 0; var o = 0
    while (i < pairs.length) {
      val run = pairs(i) & 0xFF
      require(run >= 1, s"RLE run of 0 at pair ${i / 2}")
      require(o + run <= n,
        s"RLE overrun: ${o + run} of $n at pair ${i / 2}")
      java.util.Arrays.fill(out, o, o + run, pairs(i + 1))
      o += run; i += 2
    }
    require(o == n, s"RLE underrun: decoded $o of $n bytes")
    out
  }

  // ----------------------------------------------- canonical Huffman

  /** Huffman code lengths per byte symbol (0 = symbol unused) — the
    * only thing the header has to carry. Single-symbol streams get
    * length 1 (a degenerate but decodable code). */
  private[ext] def codeLengths(freq: Array[Int]): Array[Int] = {
    final class Node(val w: Long, val sym: Int, val l: Node, val r: Node)
    val pq = new java.util.PriorityQueue[Node](
      (a: Node, b: Node) => java.lang.Long.compare(a.w, b.w))
    var used = 0
    var i = 0
    while (i < 256) {
      if (freq(i) > 0) { pq.add(new Node(freq(i), i, null, null)); used += 1 }
      i += 1
    }
    require(used >= 1, "cannot build a code over an empty stream")
    val lens = new Array[Int](256)
    if (used == 1) { lens(pq.poll().sym) = 1; return lens }
    while (pq.size() > 1) {
      val a = pq.poll(); val b = pq.poll()
      pq.add(new Node(a.w + b.w, -1, a, b))
    }
    def walk(n: Node, d: Int): Unit =
      if (n.sym >= 0) lens(n.sym) = d
      else { walk(n.l, d + 1); walk(n.r, d + 1) }
    walk(pq.poll(), 0)
    // depth is bounded by the Fibonacci growth of merge weights: a
    // 31-deep code needs ~1.3M input bytes with pathological skew —
    // far beyond a residual plane's RLE stream; refuse loudly rather
    // than overflow the Int canonical-code register (a 32-deep code
    // would wrap `code <<= 1` past Int.MaxValue and sign-extend into
    // the packing accumulator)
    require(lens.max <= 31, s"Huffman depth ${lens.max} exceeds 31")
    lens
  }

  /** Canonical code values from lengths — the DEFLATE assembly rule:
    * symbols sorted by (length, symbol) get consecutive codes,
    * starting at 0 and left-shifted at each length step. */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val codes = new Array[Int](256)
    var code = 0
    var len = 1
    val maxLen = lens.max
    while (len <= maxLen) {
      var s = 0
      while (s < 256) {
        if (lens(s) == len) { codes(s) = code; code += 1 }
        s += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  private val Magic = "GRES".getBytes("US-ASCII")

  // the ONE LE32 definition shared with the RIFF muxers (Video owns
  // it — a third private copy of endianness math in this package is
  // the drift class Commits/Scratch consolidation exists to prevent)
  private def le32(v: Int): Array[Byte] = Video.le32(v)
  private def rdLe32(b: Array[Byte], off: Int): Int = Video.rdLe32(b, off)

  /** Encode a `w`×`h` residual plane: RLE, then canonical Huffman,
    * framed with the GRES header. */
  def encodePlane(plane: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(plane.length == w * h,
      s"plane is ${plane.length} bytes, geometry says ${w * h}")
    val rle = rleEncode(plane)
    val freq = new Array[Int](256)
    rle.foreach(b => freq(b & 0xFF) += 1)
    val lens = codeLengths(freq)
    val codes = canonicalCodes(lens)
    val used = (0 until 256).filter(lens(_) > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val sparse = used.size < 128 // 1 + 2·used < 256
    out.write(if (sparse) 1 else 0)
    out.write(le32(w)); out.write(le32(h))
    out.write(le32(rle.length))
    if (sparse) {
      out.write(used.size)
      used.foreach { s => out.write(s); out.write(lens(s)) }
    } else lens.foreach(out.write)
    // MSB-first bit packing
    var acc = 0L; var nBits = 0
    rle.foreach { b =>
      val s = b & 0xFF
      acc = (acc << lens(s)) | codes(s)
      nBits += lens(s)
      while (nBits >= 8) {
        out.write(((acc >>> (nBits - 8)) & 0xFF).toInt)
        nBits -= 8
      }
    }
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xFF).toInt)
    out.toByteArray
  }

  /** True iff `bytes` is a GRES-framed plane (magic sniff — the same
    * dispatch-by-content rule every reader in this engine obeys). */
  def isEncodedPlane(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'R' &&
      bytes(2) == 'E' && bytes(3) == 'S'

  /** Decode a GRES-framed plane to (bytes, w, h). Loud on bad magic,
    * bit exhaustion, dangling bits that name no symbol, and RLE
    * geometry mismatch. */
  def decodePlane(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    require(isEncodedPlane(bytes) && bytes.length >= 18,
      "payload is not a GRES entropy-coded plane")
    val mode = bytes(4) & 0xFF
    require(mode == 0 || mode == 1, s"corrupt GRES header: mode $mode")
    val w = rdLe32(bytes, 5); val h = rdLe32(bytes, 9)
    val nRle = rdLe32(bytes, 13)
    require(w > 0 && h > 0 && nRle >= 2,
      s"corrupt GRES header: w=$w h=$h nRle=$nRle")
    // untrusted-header allocation bounds: a crafted nRle must not
    // allocate gigabytes before the bitstream is even read (every
    // symbol costs >= 1 bit, so nRle is bounded by the payload's bit
    // count), and w*h must not overflow Int into a small allocation
    require(nRle.toLong <= 8L * bytes.length,
      s"corrupt GRES header: nRle=$nRle exceeds the bitstream's " +
        s"capacity (${bytes.length} bytes)")
    require(w.toLong * h <= (1L << 28),
      s"corrupt GRES header: ${w}x$h plane exceeds the 2^28-pixel bound")
    val lens = new Array[Int](256)
    var bitsStart = 0
    if (mode == 0) {
      require(bytes.length >= 17 + 256, "truncated GRES code table")
      var s = 0
      while (s < 256) { lens(s) = bytes(17 + s) & 0xFF; s += 1 }
      bitsStart = 17 + 256
    } else {
      val used = bytes(17) & 0xFF
      require(used >= 1 && bytes.length >= 18 + 2 * used,
        "truncated GRES sparse code table")
      var i = 0
      while (i < used) {
        lens(bytes(18 + 2 * i) & 0xFF) = bytes(19 + 2 * i) & 0xFF
        i += 1
      }
      bitsStart = 18 + 2 * used
    }
    val maxLen = lens.max
    require(maxLen >= 1 && maxLen <= 31,
      s"corrupt GRES code table: max length $maxLen")
    // an OVER-subscribed length table (Kraft sum > 1) assembles
    // canonically into overlapping codes and can decode a WRONG
    // symbol without tripping any other guard — the one corruption
    // that would poison planes silently. (UNDER-subscription is safe:
    // an unassigned code value fails the per-length range check and
    // the bit loop runs out loudly.) Exception: a single used symbol
    // carries the degenerate len-1 code, inherently incomplete.
    val kraft = (0 until 256)
      .map(s => if (lens(s) > 0) 1L << (maxLen - lens(s)) else 0L).sum
    require(kraft <= (1L << maxLen),
      s"corrupt GRES code table: over-subscribed prefix code " +
        s"(Kraft sum $kraft > ${1L << maxLen})")
    // canonical decode tables: per length, the first code value and
    // the symbols of that length in canonical order
    val codes = canonicalCodes(lens)
    val symAt = Array.fill(maxLen + 1)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var sym = 0
    while (sym < 256) {
      if (lens(sym) > 0) symAt(lens(sym)) += sym
      sym += 1
    }
    val firstCode = new Array[Int](maxLen + 1)
    var len = 1
    while (len <= maxLen) {
      firstCode(len) =
        if (symAt(len).isEmpty) Int.MaxValue else codes(symAt(len).head)
      len += 1
    }
    val rle = new Array[Byte](nRle)
    var off = bitsStart; var bit = 7
    def nextBit(): Int = {
      require(off < bytes.length, "GRES bitstream exhausted mid-symbol")
      val b = (bytes(off) >> bit) & 1
      bit -= 1
      if (bit < 0) { bit = 7; off += 1 }
      b
    }
    var o = 0
    while (o < nRle) {
      var code = 0; var l = 0
      var found = -1
      while (found < 0) {
        code = (code << 1) | nextBit()
        l += 1
        require(l <= maxLen, s"GRES code longer than table depth $maxLen")
        if (l <= maxLen && symAt(l).nonEmpty) {
          val idx = code - firstCode(l)
          if (idx >= 0 && idx < symAt(l).length) found = symAt(l)(idx)
        }
      }
      rle(o) = found.toByte
      o += 1
    }
    (rleDecode(rle, w * h), w, h)
  }
}
