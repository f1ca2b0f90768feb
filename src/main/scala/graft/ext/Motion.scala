package graft.ext

/** MOTION-COMPENSATED prediction for the inter-frame video codec —
  * the MPEG-1-era rung (public knowledge since ISO/IEC 11172-2)
  * between whole-plane differencing and the entropy stage: the frame
  * is tiled into fixed-size blocks, each block searches the REFERENCE
  * frame for the best translated match (full-search block matching,
  * sum-of-absolute-differences metric), and what gets entropy-coded
  * is the per-block motion vector table plus the now-mostly-zero
  * prediction residual. A panning scene's whole-plane diff is dense
  * everywhere (every pixel moved); its motion-compensated residual is
  * zero wherever the pan found its match and dense only where new
  * content enters the frame — the payload collapse prediction exists
  * for, measured by the panning spec (MC container strictly smaller
  * than the entropy-only one on the same pixels).
  *
  * Everything stays INTEGER-EXACT: the residual is the mod-256
  * difference against the motion-shifted reference, so
  * reconstruction is bit-perfect and the scene-cut oracle replays
  * pixels through the full MC decode unchanged (the q257 hash is the
  * proof, oracle reused verbatim from q237).
  *
  * The `00dp` body format (GMCP framing, dispatched by magic like
  * every reader in this engine):
  * {{{
  *   "GMCP" | u8 blockSize | le32 w | le32 h
  *   | (s8 dx, s8 dy) per block, row-major over ceil(w/B)×ceil(h/B)
  *   | entropy-coded residual plane — GRES (RLE + canonical
  *     Huffman, [[Entropy.encodePlane]]) or GRNG (RLE + adaptive
  *     range coding, [[RangeCoder.encodePlane]]), dispatched by magic
  * }}}
  * Motion vectors point INTO the reference: cur(x,y) is predicted by
  * prev(x+dx, y+dy); candidates are restricted so the whole shifted
  * block stays inside the reference (the (0,0) vector is always
  * legal, so every block has a prediction). Determinism: candidates
  * are scanned in a pinned order ((0,0) first, then row-major over
  * the search window) and only a STRICTLY smaller SAD displaces the
  * incumbent — re-encoding the same pixels yields the same bytes.
  *
  * Corrupt containers fail LOUDLY (bad magic, truncated vector
  * table, a vector that walks a block out of the reference, residual
  * geometry drift) — a silent wrong plane is how corrupt media
  * poisons a corpus. */
object Motion {

  private val Magic = "GMCP".getBytes("US-ASCII")

  /** True iff `bytes` is a GMCP-framed predicted-frame body. */
  def isMcPlane(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'M' &&
      bytes(2) == 'C' && bytes(3) == 'P'

  private def blocksAcross(extent: Int, block: Int): Int =
    (extent + block - 1) / block

  /** Sum of absolute differences between cur's block at (x0, y0)
    * (bw×bh) and prev's block at (x0+dx, y0+dy); `stop` short-
    * circuits a candidate already worse than the incumbent. */
  private def sad(cur: Array[Byte], prev: Array[Byte], w: Int,
      x0: Int, y0: Int, bw: Int, bh: Int, dx: Int, dy: Int,
      stop: Int): Int = {
    var acc = 0
    var y = 0
    while (y < bh && acc < stop) {
      val cRow = (y0 + y) * w + x0
      val pRow = (y0 + y + dy) * w + x0 + dx
      var x = 0
      while (x < bw) {
        val d = (cur(cRow + x) & 0xFF) - (prev(pRow + x) & 0xFF)
        acc += (if (d < 0) -d else d)
        x += 1
      }
      y += 1
    }
    acc
  }

  /** Encode one predicted frame: block-match `cur` against `prev`
    * (both row-major w×h gray planes), emit the GMCP body. `block`
    * is the tile size (16 is the MPEG convention; edge tiles
    * truncate), `range` the full-search window radius in pixels. */
  def encodePredicted(cur: Array[Byte], prev: Array[Byte], w: Int,
      h: Int, block: Int = 16, range: Int = 4,
      planeCoder: (Array[Byte], Int, Int) => Array[Byte] =
        Entropy.encodePlane): Array[Byte] = {
    require(cur.length == w * h && prev.length == w * h,
      s"plane geometry mismatch: cur=${cur.length} prev=${prev.length} " +
        s"vs ${w}x$h")
    require(block >= 1 && block <= 255, s"block size $block")
    require(range >= 0 && range <= 127, s"search range $range")
    val nbx = blocksAcross(w, block)
    val nby = blocksAcross(h, block)
    val mvs = new Array[Byte](nbx * nby * 2)
    val res = new Array[Byte](w * h)
    // PREDICTOR seed: motion is spatially coherent (the MPEG
    // median-predictor insight) — the previous block's winning
    // vector is tried right after (0,0), so a global pan pays the
    // full window scan ONCE per frame and every later block exits
    // at SAD 0 on its second candidate. Deterministic: the seed is
    // itself a deterministic function of earlier blocks, and it can
    // only tighten `best` before the same pinned row-major scan.
    var seedDx = 0; var seedDy = 0
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        val x0 = bx * block; val y0 = by * block
        val bw = math.min(block, w - x0)
        val bh = math.min(block, h - y0)
        // (0,0) first — the static-scene fast path and the pinned
        // tie-break incumbent; then the seed; then row-major over
        // the window. The incumbent is displaced only by a STRICTLY
        // smaller SAD, so candidate order never changes the chosen
        // vector for distinct SADs and ties resolve to the earliest
        // candidate in this pinned order.
        var bestDx = 0; var bestDy = 0
        var best = sad(cur, prev, w, x0, y0, bw, bh, 0, 0, Int.MaxValue)
        if (best > 0 && (seedDx != 0 || seedDy != 0) &&
            x0 + seedDx >= 0 && x0 + seedDx + bw <= w &&
            y0 + seedDy >= 0 && y0 + seedDy + bh <= h) {
          val s = sad(cur, prev, w, x0, y0, bw, bh, seedDx, seedDy, best)
          if (s < best) { best = s; bestDx = seedDx; bestDy = seedDy }
        }
        var dy = -range
        while (dy <= range && best > 0) {
          var dx = -range
          while (dx <= range && best > 0) {
            if ((dx != 0 || dy != 0) &&
                (dx != bestDx || dy != bestDy) &&
                x0 + dx >= 0 && x0 + dx + bw <= w &&
                y0 + dy >= 0 && y0 + dy + bh <= h) {
              val s = sad(cur, prev, w, x0, y0, bw, bh, dx, dy, best)
              if (s < best) { best = s; bestDx = dx; bestDy = dy }
            }
            dx += 1
          }
          dy += 1
        }
        seedDx = bestDx; seedDy = bestDy
        val bi = (by * nbx + bx) * 2
        mvs(bi) = bestDx.toByte; mvs(bi + 1) = bestDy.toByte
        var y = 0
        while (y < bh) {
          val cRow = (y0 + y) * w + x0
          val pRow = (y0 + y + bestDy) * w + x0 + bestDx
          var x = 0
          while (x < bw) {
            res(cRow + x) =
              ((cur(cRow + x) & 0xFF) - (prev(pRow + x) & 0xFF)).toByte
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(block)
    out.write(Video.le32(w)); out.write(Video.le32(h))
    out.write(mvs)
    out.write(planeCoder(res, w, h))
    out.toByteArray
  }

  /** Decode a GMCP body against its reference plane: parse the
    * vector table, entropy-decode the residual, reconstruct
    * cur(x,y) = prev(x+dx, y+dy) + res(x,y) mod 256. Returns the
    * reconstructed w×h plane. Loud on magic/geometry/vector-bound
    * corruption. */
  def decodePredicted(bytes: Array[Byte], prev: Array[Byte],
      prevW: Int, prevH: Int): Array[Byte] = {
    require(isMcPlane(bytes) && bytes.length >= 13,
      "payload is not a GMCP motion-compensated frame")
    val block = bytes(4) & 0xFF
    require(block >= 1, s"corrupt GMCP header: block size $block")
    val w = Video.rdLe32(bytes, 5); val h = Video.rdLe32(bytes, 9)
    require(w == prevW && h == prevH,
      s"GMCP geometry ${w}x$h vs reference ${prevW}x$prevH")
    require(prev.length == w * h,
      s"reference plane is ${prev.length} bytes, geometry says ${w * h}")
    val nbx = blocksAcross(w, block)
    val nby = blocksAcross(h, block)
    val mvEnd = 13 + nbx * nby * 2
    require(bytes.length > mvEnd,
      s"truncated GMCP body: ${bytes.length} bytes, vector table " +
        s"needs $mvEnd")
    // the residual section dispatches by MAGIC like every reader in
    // this engine: GRES = RLE + canonical Huffman, GRNG = RLE +
    // adaptive range coding — same reconstruction after either
    val resBytes = java.util.Arrays.copyOfRange(bytes, mvEnd, bytes.length)
    val (res, rw, rh) =
      if (RangeCoder.isEncodedPlane(resBytes))
        RangeCoder.decodePlane(resBytes)
      else Entropy.decodePlane(resBytes)
    require(rw == w && rh == h,
      s"GMCP residual ${rw}x$rh vs declared ${w}x$h")
    val out = new Array[Byte](w * h)
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        val x0 = bx * block; val y0 = by * block
        val bw = math.min(block, w - x0)
        val bh = math.min(block, h - y0)
        val bi = (by * nbx + bx) * 2
        val dx = bytes(13 + bi).toInt; val dy = bytes(13 + bi + 1).toInt
        require(x0 + dx >= 0 && x0 + dx + bw <= w &&
          y0 + dy >= 0 && y0 + dy + bh <= h,
          s"corrupt GMCP vector ($dx,$dy) walks block ($bx,$by) out " +
            s"of the ${w}x$h reference")
        var y = 0
        while (y < bh) {
          val cRow = (y0 + y) * w + x0
          val pRow = (y0 + y + dy) * w + x0 + dx
          var x = 0
          while (x < bw) {
            out(cRow + x) =
              ((prev(pRow + x) & 0xFF) + (res(cRow + x) & 0xFF)).toByte
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    out
  }

  /** The motion vectors of a GMCP body, row-major (dx, dy) pairs —
    * the spec-visibility surface (pinning that a panning fixture
    * actually rides non-zero vectors, not just a smaller container). */
  def motionVectors(bytes: Array[Byte]): Seq[(Int, Int)] = {
    require(isMcPlane(bytes) && bytes.length >= 13,
      "payload is not a GMCP motion-compensated frame")
    val block = bytes(4) & 0xFF
    require(block >= 1, s"corrupt GMCP header: block size $block")
    val w = Video.rdLe32(bytes, 5); val h = Video.rdLe32(bytes, 9)
    // untrusted header: crafted large w/h used to overflow the Int
    // block count to a small/negative value, slipping past the length
    // require and returning a silently TRUNCATED vector list — the
    // bounds [[RangeCoder.decodePlane]] pins, plus a Long block count,
    // keep this reader fail-loud like decodePredicted (which is safe
    // only because it pins geometry to the caller's reference plane)
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 28),
      s"corrupt GMCP header: ${w}x$h exceeds the 2^28-pixel bound")
    val n = blocksAcross(w, block).toLong * blocksAcross(h, block)
    require(bytes.length >= 13 + n * 2, "truncated GMCP vector table")
    (0 until n.toInt).map(i =>
      (bytes(13 + 2 * i).toInt, bytes(13 + 2 * i + 1).toInt))
  }
}
