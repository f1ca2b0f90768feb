package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Images}

/** Round-11: the generalized image path (arbitrary dimensions through
  * the exact rational area-average, JPEG via format sniffing), the
  * marker-less HLL fragment-commit fallback, and the capped prefix
  * join's slot-vs-pair ledger bound. */
class Round11Spec extends SparkSpec {

  import spark.implicits._

  /** Independent reference for the rational grid: the same overlap
    * geometry computed the slow textbook way — per (cell, pixel)
    * interval intersection over the FULL pixel range, BigInt
    * accumulation — sharing no loop structure with
    * [[Images.gridOf]]'s bounded x0/x1 scan. */
  private def refGridRational(pid: Long, pert: Boolean,
      w: Int, h: Int): Array[Int] =
    Array.tabulate(Images.GridRows * Images.GridCols) { k =>
      val cy = k / Images.GridCols
      val cx = k % Images.GridCols
      var s = BigInt(0)
      for (y <- 0 until h; x <- 0 until w) {
        val ox = math.min((cx + 1L) * w, (x + 1L) * Images.GridCols) -
          math.max(cx.toLong * w, x.toLong * Images.GridCols)
        val oy = math.min((cy + 1L) * h, (y + 1L) * Images.GridRows) -
          math.max(cy.toLong * h, y.toLong * Images.GridRows)
        if (ox > 0 && oy > 0)
          s += BigInt(ox) * oy * Images.grayAt(pid, pert, x, y)
      }
      (s / (BigInt(w) * h)).toInt
    }

  test("rational gridOf: non-divisible dims decode to the exact " +
      "rational box average, divisible dims to the plain block mean") {
    for (id <- Seq(0L, 3L, 7L, 25L, 57L, 444L)) {
      val pid = Images.baseId(id)
      val w = Images.varW(pid)
      val h = Images.varH(pid)
      val got = Images.decodeGrayGrid(Images.encodePng(id, w, h))
      assert(got.sameElements(
        refGridRational(pid, Images.isPerturbed(id), w, h)),
        s"rational grid diverged for id=$id dims=${w}x$h")
    }
    // divisible case: the rational formula must reduce to the block
    // mean q231's oracle pins (36x32 -> 4x4 blocks)
    val id = 11L
    val grid = Images.decodeGrayGrid(Images.encodePng(id))
    val bw = Images.DefaultW / Images.GridCols
    val bh = Images.DefaultH / Images.GridRows
    val block = Array.tabulate(72) { k =>
      val cy = k / 9; val cx = k % 9
      (for (dy <- 0 until bh; dx <- 0 until bw)
        yield Images.grayAt(id, perturb = false,
          cx * bw + dx, cy * bh + dy)).sum / (bw * bh)
    }
    assert(grid.sameElements(block))
  }

  test("JPEG: encode is deterministic, decode round-trips " +
      "deterministically, and JPEG payloads flow through the same " +
      "fingerprint chain as PNG via magic-byte sniffing") {
    val codec = new Images.MediaCodec()
    try {
      val img = {
        val b = new java.awt.image.BufferedImage(31, 22,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until 22; x <- 0 until 31)
          b.getRaster.setSample(x, y, 0, Images.grayAt(5L, false, x, y))
        b
      }
      val j1 = codec.encodeJpeg(img)
      val j2 = codec.encodeJpeg(img)
      assert(java.util.Arrays.equals(j1, j2), "JPEG encode not deterministic")
      val g1 = Images.gridOf(codec.decode(j1))
      val g2 = Images.gridOf(codec.decode(j1))
      assert(g1.sameElements(g2), "JPEG decode not deterministic")
      // lossy but close: the decoded grid stays within a small band of
      // the lossless PNG grid for a smooth-ish pattern
      val png = Images.gridOf(codec.decode(codec.encode(img)))
      assert(g1.zip(png).forall { case (a, b) => math.abs(a - b) <= 48 },
        "JPEG grid wildly off the PNG grid")
    } finally codec.dispose()
  }

  test("mixed PNG/JPEG corpus flows through dHashes: format is " +
      "sniffed per payload, and a non-divisible JPEG survives " +
      "the near-dup machinery") {
    val rows = (0L until 60L).map { id =>
      val c = new Images.MediaCodec()
      try {
        val w = 10 + (id % 13).toInt; val h = 9 + (id % 11).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until h; x <- 0 until w)
          img.getRaster.setSample(x, y, 0, Images.grayAt(id, false, x, y))
        val bytes = if (id % 2 == 0) c.encode(img) else c.encodeJpeg(img)
        (id, bytes)
      } finally c.dispose()
    }
    val media = rows.toDF("media_id", "payload")
    val fps = Images.dHashes(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size == 60)
    // banded join over the mixed-format fingerprints == brute force
    val got = Dedup.hammingPairsFromFingerprints(
        Images.dHashes(spark, media), "media_id", "dhash",
        maxDist = 3, chunks = 4, nBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want)
  }

  test("varDims pair surface == brute force over the decoded " +
      "fingerprints; designed copies surface at Hamming 0 with " +
      "copied geometry") {
    val n = 300L
    val ids = (0L until n).toDF("doc_id")
    val got = Images.dHashNearDupPairsVarDims(spark, ids, "doc_id",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = (0L until n).map { id =>
      val pid = Images.baseId(id)
      id -> Images.dHash64(Images.decodeGrayGrid(
        Images.encodePng(id, Images.varW(pid), Images.varH(pid))))
    }
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want)
    for (id <- 25L until n by 25L)
      assert(got.contains((id - 1, id, 0)), s"missing exact dup at $id")
  }

  test("MediaCodec.dispose is idempotent and the codec rejects " +
      "non-image payloads loudly") {
    val c = new Images.MediaCodec()
    val png = c.encode(new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY))
    assert(c.decode(png).getWidth == 9)
    intercept[IllegalArgumentException] {
      c.decode(Array[Byte](1, 2, 3, 4))
    }
    c.dispose(); c.dispose() // second call must be a no-op, not a throw
  }

  test("HllMaintenance: with job-commit markers DISABLED, finalized " +
      "part files count as committed (no silent empty merge) while " +
      "_temporary staging dirs stay invisible") {
    val outDir = tmpDir("hllnomark")
    val rows = (0L until 40L).map(i => (s"k${i % 3}", i)).toDF("key", "v")
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val old = hconf.get(key)
    try {
      hconf.setBoolean(key, false)
      // the committer now writes NO _SUCCESS marker...
      graft.streaming.HllMaintenance.writeFragment(
        rows, 0L, "key", xxhash64(col("v")), outDir)
      assert(!new java.io.File(s"$outDir/batch=0/_SUCCESS").exists(),
        "fixture invalid: marker was written despite the conf")
      // ...yet the merge must still see the finalized fragment
      val merged = graft.streaming.HllMaintenance
        .mergedRegisters(spark, outDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(merged.nonEmpty, "marker-less committed fragment was " +
        "silently excluded — the wrong-cardinality mode")
      // an in-flight write under the marker-less regime: _temporary
      // still present -> invisible
      val inflight = new java.io.File(s"$outDir/batch=1")
      assert(new java.io.File(inflight, "_temporary").mkdirs())
      val part0 = new java.io.File(s"$outDir/batch=0").listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.copy(part0.toPath,
        new java.io.File(inflight, part0.getName).toPath)
      val after = graft.streaming.HllMaintenance
        .mergedRegisters(spark, outDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(after == merged, "_temporary-staged fragment leaked in")
    } finally {
      if (old == null) hconf.unset(key) else hconf.set(key, old)
    }
  }

  test("capped prefix join ledger: sum(n_dropped) prices oriented " +
      "slots — between 1x and 2x the uncapped-vs-capped pair " +
      "difference") {
    // adversarial tiny-vocab corpus so the cap actually truncates
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (0L until 60L).map { i =>
      val toks = (0 until 8).map(j =>
        vocab(((i * 7 + j * 3) % 5).toInt))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val uncapped = Dedup.prefixFilterJaccardPairs(docs, "text",
        "doc_id", n = 3, thresholdNum = 3, thresholdDen = 5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (cappedDf, ledgerDf) = Dedup.prefixFilterJaccardPairsCapped(
      docs, "text", "doc_id", n = 3, thresholdNum = 3,
      thresholdDen = 5, maxCandidates = 2)
    val capped = cappedDf.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    val ledger = ledgerDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ledger.nonEmpty, "fixture failed to truncate — bound untested")
    ledger.foreach { case (_, c, k, d) => assert(c == k + d) }
    val droppedSlots = ledger.map(_._4).sum
    // The ledger prices CANDIDATE slots (pre-verify). Replay the cap
    // on the exposed candidate stage to get candidate-level truth:
    val cap = 2
    val candPairs = Dedup.prefixCandidates(docs, "text", "doc_id",
        3, 3, 5)._2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oriented = candPairs.toSeq.flatMap { case (a, b) =>
      Seq(a -> b, b -> a) }
    val keptSlots = oriented.groupBy(_._1).values.flatMap { slots =>
      slots.map(_._2).sorted.take(cap).map(p => (slots.head._1, p))
    }.toSet
    val keptCandPairs = candPairs.filter { case (a, b) =>
      keptSlots.contains((a, b)) && keptSlots.contains((b, a)) }
    val lostCandPairs = candPairs.size - keptCandPairs.size
    // identity: dropped slots = 2·|cand| − kept slots
    assert(droppedSlots == 2L * candPairs.size - keptSlots.size,
      "ledger slot arithmetic diverged from the candidate replay")
    // the scaladoc's bound: 1x..2x the candidate PAIR difference
    assert(lostCandPairs > 0, "fixture produced no lost candidate pairs")
    assert(droppedSlots >= lostCandPairs.toLong &&
      droppedSlots <= 2L * lostCandPairs,
      s"dropped slots $droppedSlots outside [1x,2x] of $lostCandPairs")
    // cap = MaxValue truncates nothing: empty ledger IS the proof
    val (_, fullLedger) = Dedup.prefixFilterJaccardPairsCapped(
      docs, "text", "doc_id", n = 3, thresholdNum = 3,
      thresholdDen = 5, maxCandidates = Int.MaxValue)
    assert(fullLedger.isEmpty)
  }

  test("capped near-dup E2E stage: every capped drop is a true " +
      "uncapped drop (uncapped survivors ⊆ capped survivors), and " +
      "the truncating run surfaces a non-empty ledger") {
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (0L until 80L).map { i =>
      val toks = (0 until 8).map(j => vocab(((i * 7 + j * 3) % 5).toInt))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val all = (0L until 80L).toSet
    val unc = graft.ext.Curation.nearDupDrop(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (cappedDf, ledger) = graft.ext.Curation.nearDupDropCapped(
      docs, "text", "doc_id", maxCandidates = 1)
    val cap = cappedDf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(unc.subsetOf(cap),
      "cap wrongly killed a doc the uncapped stage kept")
    assert((all -- cap).subsetOf(all -- unc),
      "capped stage dropped a non-duplicate")
    assert(ledger.count() > 0, "fixture failed to truncate")
    assert(cap != unc,
      "fixture spent no recall — containment untested in the strict case")
  }

  test("hammingDeltaPairsFromFingerprints == full rebuild filtered " +
      "to delta-touching pairs (nothing missed, nothing extra, " +
      "delta-internal pairs once)") {
    // fingerprints engineered so near-dups cross the base/delta line
    // in every combination: base-base (must NOT appear), base-delta,
    // delta-delta
    val fps = Seq(
      (1L, 0L), (2L, 1L),              // base-base pair (H=1)
      (3L, 1L << 40),                  // base, pairs with delta 10
      (10L, (1L << 40) | 2L),          // delta (H=1 vs 3)
      (11L, (1L << 40) | 3L),          // delta (H=1 vs 10, H=2 vs 3)
      (12L, java.lang.Long.MIN_VALUE)) // delta, isolated (sign bit)
    val base = fps.filter(_._1 < 10).toDF("id", "fp")
    val delta = fps.filter(_._1 >= 10).toDF("id", "fp")
    val got = Dedup.hammingDeltaPairsFromFingerprints(base, delta,
        "id", "fp", maxDist = 2, chunks = 4, nBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Dedup.hammingPairsFromFingerprints(fps.toDF("id", "fp"),
        "id", "fp", maxDist = 2, chunks = 4, nBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = full.filter { case (a, b, _) => a >= 10 || b >= 10 }
    assert(got == want)
    assert(full.contains((1L, 2L, 1)) && !got.contains((1L, 2L, 1)),
      "base-base pair leaked into (or vanished from) the fixture")
    assert(got.contains((10L, 11L, 1)), "delta-internal pair missing")
    assert(got.contains((3L, 10L, 1)), "base-delta pair missing")
  }

  test("autocorrPitch == brute-force argmax with smallest-lag " +
      "tie-break, map-only plan") {
    val ids = (0L until 60L).toDF("doc_id")
    val media = graft.ext.Audio.syntheticWavFrame(spark, ids, "doc_id")
    val pitch = graft.ext.Audio.autocorrPitch(spark, media)
    val got = pitch.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    for (id <- 0L until 60L) {
      val pid = Images.baseId(id)
      val s = Array.tabulate(graft.ext.Audio.clipLen(pid))(i =>
        graft.ext.Audio.sampleAt(pid, Images.isPerturbed(id), i))
      val rs = (40 to 72).map { lag =>
        lag -> (0 until s.length - lag)
          .foldLeft(0L)((acc, i) => acc + s(i).toLong * s(i + lag))
      }
      val best = rs.maxBy { case (lag, r) => (r, -lag) }
      assert(got(id) == ((best._1, best._2)), s"pitch diverged for $id")
    }
    // the only permitted shuffle is the pre-synthesis id spread
    // (8-byte ids — Images.spreadIds); once a payload exists the
    // pitch chain must stay map-only, so no exchange may carry
    // payload or sample bytes
    val exchanges = pitch.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(e.child.output.map(_.name) == Seq("doc_id"),
        s"pitch extraction shuffled more than the id spread: " +
          s"[${e.child.output.map(_.name).mkString(", ")}]")
    }
  }

  test("cross-modal consistency: image-dup pairs WITH matching text " +
      "are dropped, those with different text survive") {
    // doc pairs (0,1): same image pattern AND same text -> dropped;
    // (2,3): same image pattern, different text -> kept
    import org.apache.spark.sql.functions.{col, when, lit, concat}
    val docs = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
      // the image side is hand-built below (identical fingerprints),
      // so only the TEXT relation varies across the two pairs
      .withColumn("text",
        when(col("doc_id") < 2, lit("alpha beta gamma delta epsilon"))
          .when(col("doc_id") === 2,
            lit("one two three four five six"))
          .otherwise(lit("seven eight nine ten eleven twelve")))
    // image near-dup pairs from hand-built identical fingerprints
    val imgPairs = Seq((0L, 1L, 0), (2L, 3L, 0)).toDF(
      "doc_a", "doc_b", "hamming")
    val txtPairs = Dedup.prefixFilterJaccardPairs(docs, "text",
        "doc_id", n = 3, thresholdNum = 3, thresholdDen = 5)
      .select(col("doc_a"), col("doc_b"))
    val kept = imgPairs.join(txtPairs, Seq("doc_a", "doc_b"),
        "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((2L, 3L)),
      "same-image/same-text pair must drop; same-image/new-text " +
        "pair must survive")
  }

  test("mirror-aware dedup: pairs == brute-force 4-combo min over " +
      "both-orientation fingerprints; planted mirrors surface at " +
      "Hamming 0 where plain dHash misses them") {
    val n = 200L
    val ids = (0L until n).toDF("doc_id")
    val got = Images.dHashNearDupPairsMirrorAware(spark, ids, "doc_id",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same decode chain
    val codec = new Images.MediaCodec()
    val fps = try {
      val frame = Images.syntheticPngFrameWithMirrors(spark, ids,
        "doc_id").collect()
      frame.map { r =>
        val grid = Images.gridOf(codec.decode(r.getAs[Array[Byte]](1)))
        r.getLong(0) -> ((Images.dHash64(grid),
          Images.dHash64(Images.mirrorGrid(grid))))
      }.toMap
    } finally codec.dispose()
    val want = (for {
      a <- 0L until n; b <- (a + 1) until n
      (ao, am) = fps(a); (bo, bm) = fps(b)
      d = Seq(ao ^ bo, ao ^ bm, am ^ bo, am ^ bm)
        .map(java.lang.Long.bitCount).min if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want)
    // planted mirrored reposts: (id-1, id) at Hamming 0 via the
    // cross-orientation combo...
    for (id <- Seq(51L, 91L, 131L, 171L)) {
      assert(Images.isMirroredId(id))
      assert(got.contains((id - 1, id, 0)), s"mirror pair missing at $id")
      // ...which plain same-orientation dHash does NOT see (unless the
      // pattern happens to be symmetric — it never is on this fixture)
      val (ao, _) = fps(id - 1); val (bo, _) = fps(id)
      assert(java.lang.Long.bitCount(ao ^ bo) > 2,
        s"fixture degenerate at $id: plain dHash already matches")
    }
  }

  test("corrupt-media guards are LOUD: negative RIFF chunk size " +
      "(would otherwise loop forever), odd-byte PCM, zero-frame AVI, " +
      "too-short pitch clip") {
    // valid magic, then a chunk whose size field is negative
    val evil = new java.io.ByteArrayOutputStream()
    evil.write("RIFF".getBytes("US-ASCII"))
    evil.write(Array[Byte](32, 0, 0, 0)) // declared size 32
    evil.write("AVI ".getBytes("US-ASCII"))
    evil.write("00dc".getBytes("US-ASCII"))
    evil.write(Array[Byte](-8, -1, -1, -1)) // size = -8
    evil.write(new Array[Byte](20))
    intercept[IllegalArgumentException] {
      graft.ext.Video.demuxFrames(evil.toByteArray)
    }
    // truncated PCM: strip one byte off a valid WAV's tail — the JDK
    // reader frame-aligns what it can, so decode must either throw or
    // return ONLY complete samples (the decodeWav require backstops a
    // reader that ever surfaced a torn half-sample)
    val wav = graft.ext.Audio.encodeWav(Array.tabulate(100)(_.toShort))
    val dec = try Some(graft.ext.Audio.decodeWav(wav.dropRight(1)))
      catch { case _: Exception => None }
    dec.foreach(s => assert(s.length <= 100,
      "truncated WAV decoded to MORE samples than written"))
    // AVI with zero video chunks through the unified dispatch
    val emptyAvi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFF".getBytes("US-ASCII"))
      b.write(Array[Byte](4, 0, 0, 0))
      b.write("AVI ".getBytes("US-ASCII"))
      b.toByteArray
    }
    val bad = Seq((1L, emptyAvi)).toDF("media_id", "payload")
    val err = intercept[Exception] {
      graft.ext.Multimodal.unifiedFingerprints(spark, bad).collect()
    }
    assert(err.getMessage != null)
    // pitch over [40, 72] undefined for a 30-sample clip
    val shortWav = Seq((1L,
        graft.ext.Audio.encodeWav(Array.tabulate(30)(_.toShort))))
      .toDF("media_id", "payload")
    intercept[Exception] {
      graft.ext.Audio.autocorrPitch(spark, shortWav).collect()
    }
  }

  test("docs stay in sync: README's catalog count equals " +
      "Catalog.all.size, every query is oracled, names are unique") {
    val all = graft.queries.Catalog.all
    assert(all.map(_.name).distinct.size == all.size,
      "duplicate query names in the catalog")
    assert(all.forall(_.oracle.nonEmpty),
      "a catalog query lost its oracle — the driver would downgrade " +
        "it to a rows-only check")
    // resolve relative to the sbt working directory (the repo root),
    // not an absolute machine-specific path
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sys.props("user.dir"), "README.md")),
      "UTF-8")
    val m = "Catalog: (\\d+) queries".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README lost its 'Catalog: N queries' line")
    assert(m.get.group(1).toInt == all.size,
      s"README says ${m.get.group(1)} queries, catalog has ${all.size} " +
        "— sync the docs (this pin exists because the drift recurred)")
  }
}
