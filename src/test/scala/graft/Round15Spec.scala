package graft

import graft.ext.{Entropy, Images, MediaFiles, Motion, Multimodal,
  RangeCoder, Video}
import graft.streaming.Commits
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15: TOCTOU closure in the maintenance read paths (one
  * manifest snapshot serves both the bounded-read refusal check and
  * the roots; retention floors re-checked after the listing) and the
  * (path, mtime_ms) manifest dedup key — a re-modified archive file
  * re-manifests as a new row instead of being suppressed forever. */
class Round15Spec extends SparkSpec {

  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def landBatch(dir: String, id: Long, rows: Long): Unit =
    spark.range(rows)
      .select((col("id") + id * 1000000L).as("k"),
        (col("id") * 7).as("v"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/batch=$id")

  test("fragmentRoots against a held manifest snapshot: check and " +
      "roots see ONE upTo — and a pre-fold snapshot still reads the " +
      "pre-fold view within the grace interval") {
    val dir = tmpDir("snaproots")
    (0L until 4L).foreach(i => landBatch(dir, i, 100L))
    val preFold = Commits.runManifest(spark, dir)
    assert(preFold.upTo.isEmpty && preFold.runs.isEmpty)
    val preView = Commits.fragmentRoots(spark, dir, preFold).toSet
    assert(preView.size == 4)
    // a fold commits "concurrently" — the monitor's held snapshot
    // must keep reading the SAME logical view (grace keeps its inputs)
    Commits.compactFlatStore(spark, dir, rowSchema)
    assert(Commits.fragmentRoots(spark, dir, preFold).toSet == preView,
      "a fold invalidated a concurrent monitor's pre-fold roots " +
        "within the grace interval")
    val rows = spark.read.schema(rowSchema)
      .parquet(Commits.fragmentRoots(spark, dir, preFold): _*).count()
    assert(rows == 400L, "pre-fold snapshot view lost rows")
    // the post-fold snapshot pairs its own upTo with its own runs:
    // new tail fragments land, and roots from the HELD post-fold
    // manifest include exactly the tail NEWER than ITS mark
    val m = Commits.runManifest(spark, dir)
    assert(m.upTo.contains(3L) && m.runs.size == 1)
    (4L until 6L).foreach(i => landBatch(dir, i, 100L))
    val roots = Commits.fragmentRoots(spark, dir, m)
    assert(roots.count(_.contains("batch=")) == 2 &&
      roots.count(_.contains("run=")) == 1,
      s"held-snapshot roots inconsistent with its upTo: $roots")
  }

  test("readRanks/readLabels floor discipline: loud at or below the " +
      "floor, served above it, None-with-re-check when nothing " +
      "qualifies") {
    val dir = tmpDir("floorranks")
    (0L until 6L).foreach(i => landBatch(dir, i, 10L))
    Commits.retainNewest(spark, dir, keep = 2) // keeps 4,5; floor 4
    // above the floor: served
    assert(graft.streaming.GraphMaintenance
      .readRanks(spark, dir, beforeBatch = Some(5L)).nonEmpty)
    // at the floor: loud (snapshots before 4 are gone)
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.GraphMaintenance
        .readRanks(spark, dir, beforeBatch = Some(4L))
    }
    assert(ex.getMessage.contains("retention"))
    // unbounded read with no snapshots at all (retired store whose
    // marker outlived its data) returns None only after the floor
    // re-check passes — an un-floored empty dir is a legal None
    val empty = tmpDir("floorempty")
    new java.io.File(empty).mkdirs()
    assert(graft.streaming.GraphMaintenance
      .readRanks(spark, empty, beforeBatch = Some(9L)).isEmpty)
    assert(graft.streaming.ComponentMaintenance
      .readLabels(spark, empty, beforeBatch = Some(9L)).isEmpty)
  }

  test("manifest payload read-ahead: order-preserving, byte-identical " +
      "to the serial fetch, loud with the ORIGINAL cause on a fetch " +
      "failure, empty-safe") {
    val rows = (0L until 97L).map(i => (i, s"p$i"))
    val serial = rows.map { case (id, p) => (id, s"bytes:$p") }
    val ahead = MediaFiles.prefetched(rows.iterator, 4)(
      p => s"bytes:$p").toSeq
    assert(ahead == serial,
      "read-ahead changed the fetch surface or its order")
    assert(MediaFiles.prefetched(
      Iterator.empty[(Long, String)], 4)(p => p).isEmpty)
    // a failing fetch must surface ITS exception (the reader's loud
    // bounds), not the ExecutionException wrapper
    val ex = intercept[IllegalArgumentException] {
      MediaFiles.prefetched(rows.iterator, 4) { p =>
        require(p != "p7", s"boom at $p"); p
      }.toSeq
    }
    assert(ex.getMessage.contains("boom at p7"))
    // streamManifest end-to-end still lands the same payload surface
    // (the q251 wiring, one batch): manifest -> prefetch-fetched
    // payloads == the files on disk
    val docs = (0L until 40L).toDF("doc_id")
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id")
    val files = tmpDir("pffiles"); val manifest = tmpDir("pfmanifest")
    MediaFiles.writeMediaFiles(media, files)
    MediaFiles.appendManifest(spark, files, manifest, manifestFiles = 2)
    val got = scala.collection.mutable.Map.empty[Long, Int]
    val q = MediaFiles.streamManifest(spark, manifest, 8)
      .writeStream.option("checkpointLocation", tmpDir("pfck"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          got(r.getLong(0)) = java.util.Arrays.hashCode(
            r.getAs[Array[Byte]](1))
        }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val want = media.select(col("media_id"), col("payload")).collect()
      .map(r => (r.getLong(0), java.util.Arrays.hashCode(
        r.getAs[Array[Byte]](1)))).toMap
    assert(got.toMap == want,
      "prefetched streamManifest payload surface diverged")
  }

  // ---------------------------------------- motion compensation (GMCP)

  /** Panning fixture: a wide designed pattern windowed `shift` px
    * further right each frame — translation is the one content class
    * whole-plane differencing is worst at and block matching exists
    * for. */
  private def panningPlanes(pid: Long, w: Int, h: Int, shift: Int,
      nF: Int): Seq[Array[Byte]] = {
    val wideImg = Images.renderPatternImage(pid, w + shift * nF, h)
    val wr = wideImg.getRaster
    (0 until nF).map { f =>
      val p = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          p(y * w + x) = wr.getSample(x + f * shift, y, 0).toByte
          x += 1
        }
        y += 1
      }
      p
    }
  }

  private def grayImageOf(plane: Array[Byte], w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0, plane(y * w + x) & 0xFF)
        x += 1
      }
      y += 1
    }
    img
  }

  test("motion compensation is integer-exact (encode-decode identity), " +
      "a panning clip rides NON-ZERO vectors and beats the entropy-only " +
      "container, and a corrupt vector refuses loudly") {
    val w = Video.FrameW; val h = Video.FrameH
    val shift = 2; val nF = 6
    val planes = panningPlanes(91L, w, h, shift, nF)
    // direct round-trip + the vectors actually track the pan
    (1 until nF).foreach { f =>
      val enc = Motion.encodePredicted(planes(f), planes(f - 1), w, h)
      assert(java.util.Arrays.equals(
        Motion.decodePredicted(enc, planes(f - 1), w, h), planes(f)),
        s"MC reconstruction diverged at frame $f")
      val mvs = Motion.motionVectors(enc)
      assert(mvs.contains((shift, 0)),
        s"pan of ($shift,0) not found by block matching: $mvs")
    }
    // container comparison on identical pixels: MC strictly smaller
    // than the whole-plane-diff entropy container under motion
    val rasters = planes.map(grayImageOf(_, w, h))
    val codec = new Images.MediaCodec()
    try {
      val mc = Video.muxAviInterMc(rasters, codec)
      val ent = Video.muxAviInterEntropy(rasters, codec)
      assert(mc.length < ent.length,
        s"MC container ${mc.length}B not smaller than entropy-only " +
          s"${ent.length}B on the panning fixture")
      // reconstruction bit-exact through the full container walk
      Video.demuxFramesInter(mc, codec).foreach { case (i, img) =>
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            assert(r.getSample(x, y, 0) == (planes(i)(y * w + x) & 0xFF),
              s"pixel ($x,$y) of frame $i diverged through the MC demux")
            x += 1
          }
          y += 1
        }
      }
    } finally codec.dispose()
    // a vector that walks its block out of the reference is loud
    val enc = Motion.encodePredicted(planes(1), planes(0), w, h)
    enc(13) = 120.toByte // first block's dx
    val ex = intercept[IllegalArgumentException] {
      Motion.decodePredicted(enc, planes(0), w, h)
    }
    assert(ex.getMessage.contains("out"),
      s"expected the out-of-reference refusal, got: ${ex.getMessage}")
  }

  test("MC corpus scene cuts == intra corpus scene cuts (the q257 " +
      "surface is q237's, earned through the MC decode chain)") {
    val docs = (0L until 40L).toDF("doc_id")
    def keyed(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("media_id"), col("frame_idx"),
        col("hamming"), col("is_cut")))
        .collect().map(_.getString(0)).toSet
    val intra = keyed(Video.sceneCuts(spark, docs, "doc_id"))
    val mc = keyed(Video.sceneCutsInterMc(spark, docs, "doc_id"))
    assert(mc == intra && intra.nonEmpty,
      "MC corpus scene-cut surface diverged from the intra corpus")
  }

  test("adaptive range coder: decode∘encode is the identity on every " +
      "plane class (zero, dense, single-symbol, full-alphabet, " +
      "adversarial run boundaries), truncation and corruption are " +
      "loud, and dense planes code tighter than Huffman") {
    val w = Video.FrameW; val h = Video.FrameH
    val n = w * h
    def rt(plane: Array[Byte], name: String): Array[Byte] = {
      val enc = RangeCoder.encodePlane(plane, w, h)
      val (back, rw, rh) = RangeCoder.decodePlane(enc)
      assert(rw == w && rh == h, s"$name geometry drifted")
      assert(java.util.Arrays.equals(back, plane),
        s"$name plane diverged through the range coder")
      enc
    }
    rt(new Array[Byte](n), "all-zero")
    rt(Array.tabulate(n)(i => i.toByte), "full-alphabet")
    rt(Array.fill(n)(77.toByte), "single-symbol")
    // the >100x-compression class a HUFFMAN-style per-byte capacity
    // bound rejects: a LARGE all-one-value plane's RLE stream is
    // single-symbol and the adaptive coder drives its cost to ~0.006
    // bits/symbol — nRle (706 pairs at 300x300) dwarfs the coded
    // bytes (~32), so any "nRle <= 8*bytes" check breaks
    // decode∘encode on VALID data. The shipped bounds are the
    // structural nRle <= 2wh AND the adaptive-capacity
    // nRle <= 1500*bytes + 6000 (strictly above the coder's
    // ~0.0056-bit/symbol floor — this plane must stay legal under
    // both)
    locally {
      val big = Array.fill(300 * 300)(0xFF.toByte)
      val enc = RangeCoder.encodePlane(big, 300, 300)
      val (back, _, _) = RangeCoder.decodePlane(enc)
      assert(java.util.Arrays.equals(back, big),
        "large single-value plane diverged through the range coder")
    }
    // deterministic pseudo-noise (splitmix-style): the dense class
    val dense = Array.tabulate(n) { i =>
      var x = i.toLong + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      (x >>> 24).toByte
    }
    val encDense = rt(dense, "pseudo-noise")
    // runs straddling the 255 RLE cap and byte-boundary bit counts
    rt(Array.tabulate(n)(i => if (i % 509 < 255) 0.toByte
      else (i % 17).toByte), "run-boundary")
    // fractional-bit advantage: on a skewed-but-dense plane the
    // adaptive coder must beat Huffman's integer bits + shipped table
    val skewed = Array.tabulate(n) { i =>
      var x = i.toLong * 0x94d049bb133111ebL
      x ^= x >>> 29
      (if ((x & 7) == 0) (x >>> 40) & 0xFF else (x >>> 41) & 0x03).toByte
    }
    val encR = RangeCoder.encodePlane(skewed, w, h)
    val encH = Entropy.encodePlane(skewed, w, h)
    assert(encR.length < encH.length,
      s"range-coded ${encR.length}B not under Huffman ${encH.length}B " +
        "on the skewed dense plane")
    // loudness: truncation mid-stream, bad magic, crafted nRle
    val ex1 = intercept[IllegalArgumentException] {
      RangeCoder.decodePlane(
        java.util.Arrays.copyOf(encDense, encDense.length - 8))
    }
    assert(ex1.getMessage.contains("exhausted") ||
      ex1.getMessage.contains("RLE"),
      s"truncation must be loud, got: ${ex1.getMessage}")
    intercept[IllegalArgumentException] {
      RangeCoder.decodePlane("NOPE".getBytes ++ encDense.drop(4))
    }
    val crafted = encDense.clone()
    crafted(12) = 0xFF.toByte; crafted(13) = 0xFF.toByte
    crafted(14) = 0xFF.toByte; crafted(15) = 0x7F.toByte
    intercept[IllegalArgumentException] {
      RangeCoder.decodePlane(crafted)
    }
    // end-to-end: the MC + range-coded corpus earns the intra surface
    val docs = (0L until 30L).toDF("doc_id")
    def keyed(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("media_id"), col("frame_idx"),
        col("hamming"), col("is_cut")))
        .collect().map(_.getString(0)).toSet
    assert(keyed(Video.sceneCutsInterMcRange(spark, docs, "doc_id")) ==
      keyed(Video.sceneCuts(spark, docs, "doc_id")),
      "range-coded MC corpus scene-cut surface diverged")
  }

  test("A/V sync audit: a designed EXACT-SPAN container reads deficit " +
      "0, a short-audio one reads exactly its missing samples, and " +
      "the interleave skew is replayed from the chunk walk") {
    import graft.ext.Audio
    val codec = new Images.MediaCodec()
    try {
      val nF = 5
      val frames = (0 until nF).map(f => codec.encode(
        Images.renderPatternImage(40L + f, Video.FrameW, Video.FrameH)))
      // nominal samples/frame from the container's own clocks:
      // 8000 Hz at 10 fps -> 800
      val exact = Array.tabulate[Short](nF * 800)(i =>
        Audio.sampleAt(3L, perturb = false, i))
      val short = exact.take(nF * 800 - 137)
      val media = Seq(
        (1L, Video.muxAviAv(frames, exact, Video.FrameW, Video.FrameH)),
        (2L, Video.muxAviAv(frames, short, Video.FrameW, Video.FrameH)))
        .toDF("media_id", "payload")
      val rows = Video.avSyncAuditOf(spark, media).collect()
        .map(r => r.getLong(0) -> r).toMap
      val ex = rows(1L); val sh = rows(2L)
      assert(ex.getAs[Long]("sync_deficit") == 0L,
        s"exact-span clip must read deficit 0, got $ex")
      assert(ex.getAs[Long]("max_spread_skew") == 0L,
        "an exactly-divisible interleave must read spread skew 0")
      assert(sh.getAs[Long]("sync_deficit") == 137L,
        s"short-audio clip must read its missing 137 samples, got $sh")
      assert(sh.getAs[Int]("n_frames") == nF &&
        ex.getAs[Long]("n_samples") == (nF * 800).toLong)
      // skew formula replay: short clip's per = ceil(3863/5) = 773,
      // cum_i = min((i+1)*773, 3863); max |cum_i*5 - (i+1)*3863|
      val len = nF * 800L - 137L; val per = (len + nF - 1) / nF
      val want = (0 until nF).map { i =>
        math.abs(math.min((i + 1) * per, len) * nF - (i + 1) * len)
      }.max
      assert(sh.getAs[Long]("max_spread_skew") == want,
        s"spread skew diverged from the interleave formula: $sh vs $want")
    } finally codec.dispose()
  }

  test("a re-modified archive file RE-MANIFESTS as a new row (path " +
      "kept, new mtime) — the path-only suppression that pinned the " +
      "stale version forever is gone; unchanged files stay " +
      "exactly-once") {
    val docs = (0L until 60L).toDF("doc_id")
    val base = 1767225600000L // 2026-01-01T00:00:00Z
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id").withColumn("mtime_ms", lit(base))
    val files = tmpDir("remodfiles")
    val manifest = tmpDir("remodmanifest")
    MediaFiles.writeMediaFiles(media, files)
    MediaFiles.appendManifest(spark, files, manifest, manifestFiles = 1)
    val total = media.count()
    assert(spark.read.parquet(manifest).count() == total)
    // one file is re-modified in place: same path, a later mtime
    val touched = media.filter(col("media_id") === 0)
      .withColumn("mtime_ms", lit(base + 7200000L))
    MediaFiles.writeMediaFiles(touched, files)
    MediaFiles.appendManifest(spark, files, manifest,
      watermarkIso = Some("2026-01-01T02:00:00"), manifestFiles = 1)
    val m = spark.read.parquet(manifest)
    assert(m.count() == total + 1,
      "the re-modified file must re-manifest exactly once")
    val versions = m.filter(col("media_id") === 0)
      .select(col("mtime_ms")).collect().map(_.getLong(0)).toSet
    assert(versions == Set(base, base + 7200000L),
      s"expected both versions of the re-modified file, got $versions")
    assert(m.select(col("path"), col("mtime_ms")).distinct().count() ==
      total + 1, "manifest rows must stay unique on (path, mtime)")
    // newest-wins CURRENT view is one max-per-path away
    val current = m.groupBy(col("path"))
      .agg(max(col("mtime_ms")).as("mtime_ms"))
    assert(current.count() == total)
    // a third append at the same watermark is a no-op: the inclusive
    // boundary re-surfaces the touched file, the (path, mtime) key
    // suppresses it
    MediaFiles.appendManifest(spark, files, manifest,
      watermarkIso = Some("2026-01-01T02:00:00"), manifestFiles = 1)
    assert(spark.read.parquet(manifest).count() == total + 1,
      "re-append at the boundary must suppress the re-listed version")
  }
}
