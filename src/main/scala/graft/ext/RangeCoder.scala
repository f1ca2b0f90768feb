package graft.ext

/** ADAPTIVE RANGE CODING for residual planes — the codec ladder's
  * final entropy rung within public scope (Witten-Neal-Cleary 1987
  * arithmetic coding, realized as Subbotin's byte-oriented CARRYLESS
  * range coder — the public-domain formulation H.264's CABAC and
  * every modern codec's entropy stage descend from): symbols are
  * coded in fractional bits against an ADAPTIVE order-0 byte model
  * that both ends update identically, so no code table ships at all
  * — the header is 17 bytes whatever the alphabet. This removes both
  * Huffman limitations at once: the integer-bit quantization (a
  * 0.1-bit symbol still costs 1 full bit under GRES) and the shipped
  * table (256 lengths, or the sparse pair list).
  *
  * Pipeline parity with [[Entropy]]: RLE first (within-scene
  * residuals are the all-zero plane; runs collapse 1152 zero pixels
  * to a handful of pairs before the coder starts), then the range
  * coder over the RLE byte stream. Integer-exact end to end — decode
  * ∘ encode is the identity on any byte plane (spec-pinned), which
  * is what lets the scene-cut oracle replay pixels through a REAL
  * adaptive arithmetic decode.
  *
  * The `00dp` body format (GRNG framing, dispatched by magic):
  * {{{
  *   "GRNG" | le32 w | le32 h | le32 nRle | range-coded RLE bytes
  * }}}
  *
  * Coder internals (the Subbotin discipline): 32-bit `low`/`range`
  * registers; a symbol with cumulative interval [cumLo, cumLo+freq)
  * of `total` narrows `range` proportionally; the top byte is
  * emitted when settled (`(low ^ low+range) < 2^24`), and when
  * `range` underflows 2^16 while the top byte straddles, `range` is
  * truncated to the low side (`-low & 0xFFFF`) — the carryless
  * trick that avoids bit-stuffing. The model: per-symbol counts
  * starting at 1, increment 24 per occurrence, halved (floor 1) when
  * the total would exceed 2^16 — the coder's `total ≤ 2^16` bound.
  * Truncated or corrupt bitstreams fail LOUDLY (byte exhaustion,
  * RLE over/underrun, bad magic, header bounds) — a silent wrong
  * plane is how corrupt media poisons a corpus. */
object RangeCoder {

  private val Magic = "GRNG".getBytes("US-ASCII")
  private val Top = 1L << 24
  private val Bot = 1L << 16
  private val Mask = 0xFFFFFFFFL
  private val Inc = 24
  private val TotalCap = (1 << 16) - Inc

  /** True iff `bytes` is a GRNG-framed plane. */
  def isEncodedPlane(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'R' &&
      bytes(2) == 'N' && bytes(3) == 'G'

  /** The adaptive order-0 model BOTH ends run in lockstep: per-byte
    * counts (init 1 — every symbol always codable), halve-rescale at
    * the coder's total bound. */
  private final class Model {
    val counts = Array.fill(256)(1)
    var total = 256
    def update(s: Int): Unit = {
      counts(s) += Inc
      total += Inc
      if (total > TotalCap) {
        var t = 0
        var i = 0
        while (i < 256) {
          counts(i) = (counts(i) + 1) >> 1 // halve, floor 1
          t += counts(i)
          i += 1
        }
        total = t
      }
    }
    def cumBelow(s: Int): Int = {
      var c = 0
      var i = 0
      while (i < s) { c += counts(i); i += 1 }
      c
    }
    /** Symbol whose cumulative interval contains `f`, with its
      * cumLo — the decoder's inverse lookup. */
    def find(f: Int): (Int, Int) = {
      var c = 0
      var i = 0
      while (c + counts(i) <= f) { c += counts(i); i += 1 }
      (i, c)
    }
  }

  private def le32(v: Int): Array[Byte] = Video.le32(v)
  private def rdLe32(b: Array[Byte], off: Int): Int = Video.rdLe32(b, off)

  /** Range-code `data` against the adaptive model. */
  private def code(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val m = new Model
    var low = 0L
    var range = Mask
    var i = 0
    while (i < data.length) {
      val s = data(i) & 0xFF
      val cumLo = m.cumBelow(s)
      val freq = m.counts(s)
      val r = range / m.total
      low = (low + r * cumLo) & Mask
      range = r * freq
      var go = true
      while (go) {
        if (((low ^ (low + range)) & Mask) < Top) ()
        else if (range < Bot) range = (0L - low) & (Bot - 1)
        else go = false
        if (go) {
          out.write(((low >>> 24) & 0xFF).toInt)
          low = (low << 8) & Mask
          range = (range << 8) & Mask
        }
      }
      m.update(s)
      i += 1
    }
    // flush: 4 bytes settle whatever remains in the window
    var k = 0
    while (k < 4) {
      out.write(((low >>> 24) & 0xFF).toInt)
      low = (low << 8) & Mask
      k += 1
    }
    out.toByteArray
  }

  /** Decode `n` symbols from the range-coded `bytes` starting at
    * `from`, mirroring [[code]]'s model and renormalization exactly. */
  private def decode(bytes: Array[Byte], from: Int, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    val m = new Model
    var low = 0L
    var range = Mask
    var off = from
    def nextByte(): Long = {
      require(off < bytes.length,
        "GRNG bitstream exhausted mid-symbol — truncated payload")
      val b = bytes(off) & 0xFF
      off += 1
      b.toLong
    }
    var codeReg = 0L
    var k = 0
    while (k < 4) { codeReg = ((codeReg << 8) | nextByte()) & Mask; k += 1 }
    var i = 0
    while (i < n) {
      val r = range / m.total
      val f0 = ((codeReg - low) & Mask) / r
      val f = if (f0 >= m.total) m.total - 1 else f0.toInt
      val (s, cumLo) = m.find(f)
      val freq = m.counts(s)
      low = (low + r * cumLo) & Mask
      range = r * freq
      var go = true
      while (go) {
        if (((low ^ (low + range)) & Mask) < Top) ()
        else if (range < Bot) range = (0L - low) & (Bot - 1)
        else go = false
        if (go) {
          codeReg = ((codeReg << 8) | nextByte()) & Mask
          low = (low << 8) & Mask
          range = (range << 8) & Mask
        }
      }
      out(i) = s.toByte
      m.update(s)
      i += 1
    }
    out
  }

  /** Encode a `w`×`h` residual plane: RLE ([[Entropy.rleEncode]] —
    * the shared first stage), then the adaptive range coder, framed
    * with the GRNG header. */
  def encodePlane(plane: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(plane.length == w * h,
      s"plane is ${plane.length} bytes, geometry says ${w * h}")
    val rle = Entropy.rleEncode(plane)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(le32(w)); out.write(le32(h))
    out.write(le32(rle.length))
    out.write(code(rle))
    out.toByteArray
  }

  /** Decode a GRNG-framed plane to (bytes, w, h). Loud on bad magic,
    * header bounds, byte exhaustion, and RLE geometry mismatch. */
  def decodePlane(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    require(isEncodedPlane(bytes) && bytes.length >= 16,
      "payload is not a GRNG range-coded plane")
    val w = rdLe32(bytes, 4); val h = rdLe32(bytes, 8)
    val nRle = rdLe32(bytes, 12)
    require(w > 0 && h > 0 && nRle >= 2,
      s"corrupt GRNG header: w=$w h=$h nRle=$nRle")
    // untrusted-header bounds. NOTE: a per-byte bitstream-capacity
    // bound (Entropy.decodePlane's >= 1 bit/symbol, sound for
    // Huffman) is UNSOUND here — an adaptive coder's repeated symbol
    // approaches probability 1 and costs ~0.006 bits at the count
    // cap, so a legal all-one-value plane compresses its RLE stream
    // >100x and would trip it (decode∘encode identity broken on
    // valid data). The sound bound is STRUCTURAL: every RLE pair is
    // 2 bytes covering >= 1 pixel, so nRle <= 2·w·h — which, with
    // the 2^28-pixel cap below, still stops a crafted header from
    // allocating beyond ~2x the plane the caller already asked for.
    require(w.toLong * h <= (1L << 28),
      s"corrupt GRNG header: ${w}x$h plane exceeds the 2^28-pixel bound")
    require(nRle.toLong <= 2L * w * h,
      s"corrupt GRNG header: nRle=$nRle exceeds the ${w}x$h plane's " +
        "structural RLE bound")
    // ... AND the adaptive-coder capacity bound, so a ~20-byte crafted
    // header can't pre-allocate the structural maximum (2·2^28 bytes)
    // before the first bitstream byte is validated. The SOUND form for
    // an adaptive coder (the per-byte >= 1 bit/symbol Huffman bound is
    // not): a symbol's cost is log2(total/freq) bits, and with counts
    // capped at TotalCap = 2^16 - 24 and 255 competitors floored at 1,
    // freq <= total - 255, so every symbol costs >= log2(65512/65257)
    // ~= 0.00563 bits — <= ~1422 symbols per bitstream byte, plus up
    // to ~5700 more riding the 32-bit register the 4 flush bytes
    // settle. 1500/byte + 6000 is strictly above both, so every legal
    // stream (including the >100x all-one-value plane) stays legal,
    // while the crafted-header allocation is capped at ~1500x the
    // bytes actually presented.
    require(nRle.toLong <= 1500L * (bytes.length - 16) + 6000L,
      s"corrupt GRNG header: nRle=$nRle exceeds the adaptive coder's " +
        s"capacity for ${bytes.length - 16} bitstream bytes")
    val rle = decode(bytes, 16, nRle)
    (Entropy.rleDecode(rle, w * h), w, h)
  }
}
