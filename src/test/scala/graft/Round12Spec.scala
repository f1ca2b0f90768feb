package graft

import java.awt.image.BufferedImage

import graft.ext.Images

/** Round-12: the explicit color-raster luminance rule, the shared
  * fragment-commit helper, and the capped cross-modal audit's
  * containment guarantees. */
class Round12Spec extends SparkSpec {

  test("gridOf: color rasters reduce to explicit integer BT.709 " +
      "luminance (bands are R,G,B for the JDK codecs), never a " +
      "silent red-channel read") {
    val codec = new Images.MediaCodec()
    try {
      // pure-color constant images pin the band order: a band-0 read
      // would see red=200 for the red image AND 0 for the green one;
      // the luminance rule sees 2126*200/10000=42 vs 7152*200/10000=143
      def solid(r: Int, g: Int, b: Int): BufferedImage = {
        val img = new BufferedImage(18, 16, BufferedImage.TYPE_3BYTE_BGR)
        for (y <- 0 until 16; x <- 0 until 18)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        img
      }
      def gridVia(img: BufferedImage): Array[Int] =
        Images.gridOf(codec.decode(codec.encode(img)))
      assert(gridVia(solid(200, 0, 0)).forall(_ == 2126 * 200 / 10000),
        "red-only image must read as its BT.709 luminance (42)")
      assert(gridVia(solid(0, 200, 0)).forall(_ == 7152 * 200 / 10000),
        "green-only image must read as its BT.709 luminance (143)")
      assert(gridVia(solid(0, 0, 200)).forall(_ == 722 * 200 / 10000),
        "blue-only image must read as its BT.709 luminance (14)")
      // a gray color image (R=G=B) must land exactly where the
      // 1-band grayscale raster of the same values lands: the
      // weights sum to 10000, so luminance(v,v,v) = v
      val v = 123
      assert(gridVia(solid(v, v, v)).forall(_ == v))
    } finally codec.dispose()
  }

  test("bounded prefix join: pairs are a subset of the uncapped " +
      "surface, the bounded audit contains the exact audit, and " +
      "every extra flag is marked suspect — on a corpus designed to " +
      "fire BOTH cost caps") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ext.Dedup
    // four designed image pairs (the %25 copy rule): (24,25) with
    // IDENTICAL unique text (consistent — must never be flagged);
    // (49,50) with disjoint texts (a TRUE inconsistency — flagged,
    // suspect=false: exactness untouched at its endpoints);
    // (74,75) identical text made of pure boilerplate shared with 20
    // filler docs (every prefix token hot -> pair lost to the TOKEN
    // cap); (99,100) identical text shared with docs 90..98 (the
    // smallest-partner rank cap evicts the pair at both endpoints ->
    // lost to the DOC cap)
    val boiler = "whiskey xray yankee zulu one two three four five"
    val group = "red orange yellow green blue indigo violet pink"
    val docs = (Seq(
      24L -> "alpha bravo charlie delta echo foxtrot golf",
      25L -> "alpha bravo charlie delta echo foxtrot golf",
      49L -> "hotel india juliet kilo lima mike november",
      50L -> "oscar papa quebec romeo sierra tango uniform") ++
      Seq(74L, 75L).map(_ -> boiler) ++
      (200L to 219L).map(_ -> boiler) ++
      (90L to 100L).map(_ -> group))
      .toDF("doc_id", "text")
    val img = graft.ext.Images.dHashNearDupPairs(spark, docs, "doc_id",
      maxDist = 2)
    val exact = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
      n = 3, thresholdNum = 3, thresholdDen = 5)
    val (bounded, docLedger, tokLedger) =
      Dedup.prefixFilterJaccardPairsBounded(docs, "text", "doc_id",
        n = 3, thresholdNum = 3, thresholdDen = 5,
        maxCandidates = 2, maxTokenDf = 15)
    val exactPairs = exact.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val boundedPairs = bounded.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(boundedPairs.subsetOf(exactPairs),
      "bounded pairs must be a deterministic subset of the exact join")
    assert(exactPairs.contains((24L, 25L)) && boundedPairs.contains((24L, 25L)))
    assert(exactPairs.contains((74L, 75L)) && !boundedPairs.contains((74L, 75L)),
      "the boilerplate pair must be lost to the hot-token skip")
    assert(exactPairs.contains((99L, 100L)) && !boundedPairs.contains((99L, 100L)),
      "the group pair must be lost to the per-doc candidate cap")
    assert(tokLedger.count() > 0, "token ledger must price the skip")
    val ledgerDocs = docLedger.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ledgerDocs.contains(99L) && ledgerDocs.contains(100L))
    // the audits: exact (q239 shape) vs bounded (q245 shape)
    def auditOf(txt: org.apache.spark.sql.DataFrame) =
      img.join(txt.select(col("doc_a"), col("doc_b")),
          Seq("doc_a", "doc_b"), "left_anti")
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactAudit = auditOf(exact)
    val boundedAudit = auditOf(bounded)
    assert(exactAudit.subsetOf(boundedAudit),
      "the bounded audit must never miss a true inconsistency")
    assert(exactAudit.contains((49L, 50L)))
    // (206,207) rides along: 207 % 50 == 7 makes it a designed
    // perturbed image copy inside the boilerplate fillers, so its
    // text pair is hot-skipped exactly like (74,75)
    assert(boundedAudit ==
      exactAudit + ((74L, 75L)) + ((99L, 100L)) + ((206L, 207L)),
      s"bounded audit surface off: $boundedAudit vs $exactAudit")
    // every extra flag is suspect: its endpoints are priced by a
    // ledger (74/75 carry hot tokens; 99/100 lost candidate slots)
    val hotDocs = docs.select(col("doc_id"),
        explode(Dedup.wordShingles(col("text"), 3)).as("_tok"))
      .join(tokLedger.select(col("token").as("_tok")), Seq("_tok"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val suspectDocs = ledgerDocs ++ hotDocs
    (boundedAudit -- exactAudit).foreach { case (a, bb) =>
      assert(suspectDocs.contains(a) || suspectDocs.contains(bb),
        s"extra audit flag ($a,$bb) not priced by any ledger")
    }
    assert(!suspectDocs.contains(49L) && !suspectDocs.contains(50L),
      "the true inconsistency must remain unsuspect")
  }

  test("BoundedOnce (cached single-execution variant) is " +
      "output-identical to the lazy bounded join on all three " +
      "surfaces, its shingle rows match a fresh tokenization, and " +
      "release() drops the cache") {
    import graft.ext.Dedup
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val (pairs, docLedger, tokLedger) =
      Dedup.prefixFilterJaccardPairsBounded(docs, "text", "doc_id",
        n = 3, thresholdNum = 3, thresholdDen = 5,
        maxCandidates = 1, maxTokenDf = 2)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val outs =
      Dedup.prefixFilterJaccardPairsBoundedOnce(docs, "text", "doc_id",
        n = 3, thresholdNum = 3, thresholdDen = 5,
        maxCandidates = 1, maxTokenDf = 2)
    try {
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairSet(outs.pairs) == pairSet(pairs))
      def ledgerSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(ledgerSet(outs.docLedger) == ledgerSet(docLedger))
      assert(ledgerSet(outs.tokenLedger) == ledgerSet(tokLedger))
      // the cached shingle rows are the corpus tokenization, not a
      // projection of the prefix: every (doc, shingle) occurrence
      val fresh = docs.select(col("doc_id").as("_id"),
          explode(Dedup.wordShingles(col("text"), 3)).as("_tok"))
        .groupBy("_id", "_tok").count()
      val cachedRows = outs.shingleRows.groupBy("_id", "_tok").count()
      assert(cachedRows.join(fresh, Seq("_id", "_tok", "count"))
        .count() == fresh.count() && cachedRows.count() == fresh.count())
      assert((spark.sparkContext.getPersistentRDDs.keySet --
          cachedBefore).nonEmpty,
        "the corpus cache must be live while outputs are consumed")
    } finally outs.release()
    assert(spark.sparkContext.getPersistentRDDs.keySet
        .subsetOf(cachedBefore),
      "release() must drop every cached corpus block")
  }

  test("bounded prefix join with caps above the corpus maxima is " +
      "IDENTICAL to the exact join, with empty ledgers") {
    import graft.ext.Dedup
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val exact = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
        n = 3, thresholdNum = 3, thresholdDen = 5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (b, docLedger, tokLedger) =
      Dedup.prefixFilterJaccardPairsBounded(docs, "text", "doc_id",
        n = 3, thresholdNum = 3, thresholdDen = 5,
        maxCandidates = 1 << 20, maxTokenDf = 1 << 20)
    val boundedPairs = b.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(boundedPairs == exact)
    assert(docLedger.count() == 0 && tokLedger.count() == 0,
      "empty ledgers ARE the proof the bounds changed nothing")
  }

  test("inter-frame codec: mux -> demux -> reconstruct is byte-exact " +
      "for every frame, predicted frames genuinely ride residual " +
      "planes, and single-scene runs compress below the intra mux") {
    import graft.ext.Video
    val codec = new Images.MediaCodec()
    try {
      for (id <- Seq(1L, 4L, 13L, 26L)) {
        val pid = Images.baseId(id)
        val rasters = (0 until Video.nFrames(pid)).map { f =>
          Images.renderPatternImage(Video.framePid(pid, f),
            Video.FrameW, Video.FrameH)
        }
        val inter = Video.muxAviInter(rasters, codec)
        val got = Video.demuxFramesInter(inter, codec).toSeq
        assert(got.size == rasters.size)
        got.foreach { case (i, img) =>
          for (y <- 0 until Video.FrameH; x <- 0 until Video.FrameW)
            assert(img.getRaster.getSample(x, y, 0) ==
              rasters(i).getRaster.getSample(x, y, 0),
              s"clip $id frame $i pixel ($x,$y) diverged after " +
                "reconstruction")
        }
        // the container truly carries predicted frames: the
        // intra-only walk must refuse it loudly (silently decoding a
        // residual plane as a picture is the corrupt-media mode)
        if (rasters.size > 1) {
          val e = intercept[IllegalArgumentException] {
            Video.demuxFrames(inter).foreach(_ => ())
          }
          assert(e.getMessage.contains("inter-coded"))
        }
        // zero-residual frames (within a scene) make the inter mux
        // strictly smaller than the intra mux — the compression
        // benefit that IS the reason real codecs predict
        val intra = Video.muxAvi(rasters.map(codec.encode), Video.FrameW,
          Video.FrameH)
        if (rasters.size > 1)
          assert(inter.length < intra.length,
            s"clip $id: inter ${inter.length}B vs intra ${intra.length}B")
      }
      // a predicted frame with no reference (truncated/mis-spliced
      // archive) fails loudly: rewrite the first movi chunk's fourcc
      // from 00dc to 00dp by byte surgery
      val rasters = (0 until 5).map(f =>
        Images.renderPatternImage(100L + f, Video.FrameW, Video.FrameH))
      val avi = Video.muxAviInter(rasters, codec)
      val pat = "00dc".getBytes("US-ASCII")
      val first = avi.indexOfSlice(pat)
      assert(first > 0)
      avi(first + 3) = 'p'.toByte
      val e = intercept[IllegalArgumentException] {
        Video.demuxFramesInter(avi, codec).foreach(_ => ())
      }
      assert(e.getMessage.contains("no reference"))
    } finally codec.dispose()
  }

  test("committedBatchDirs: one shared rule — skips non-numeric " +
      "names, honors upToBatch, and sees nothing before the dir " +
      "exists") {
    val dir = tmpDir("commits")
    import graft.streaming.Commits
    assert(Commits.committedBatchDirs(spark, s"$dir/nope").isEmpty)
    val p = java.nio.file.Paths.get(dir)
    for (b <- 0 to 2) {
      val d = p.resolve(s"batch=$b")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("_SUCCESS"), Array.empty[Byte])
      java.nio.file.Files.write(d.resolve("part-000.parquet"),
        Array[Byte](1))
    }
    java.nio.file.Files.createDirectories(p.resolve("batch=oops"))
    java.nio.file.Files.createDirectories(p.resolve("_spark_metadata"))
    val all = Commits.committedBatchDirs(spark, dir)
    assert(all.map(_.getName).sorted == Seq("batch=0", "batch=1", "batch=2"))
    val upTo = Commits.committedBatchDirs(spark, dir, upToBatch = Some(1L))
    assert(upTo.map(_.getName).sorted == Seq("batch=0", "batch=1"))
  }

  test("binaryFile media ingest: the file round-trip is byte-exact, " +
      "extensions lie exactly on the id % 7 == 3 schedule, and the " +
      "sniffed kind ignores the lie") {
    import graft.ext.{MediaFiles, Multimodal}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 120)
    val mixed = Multimodal.syntheticMixedFrame(spark, docs, "doc_id")
    val landing = tmpDir("mediaflat")
    MediaFiles.writeMediaFiles(mixed, landing)
    val back = MediaFiles.readMediaFiles(spark, landing)
    // the small-files law: scan parallelism is capped at the
    // session's shuffle parallelism however many files land (the
    // 4 MB-openCost bin-packing would otherwise hand streaming —
    // where AQE is off — hundreds of frozen tiny partitions)
    assert(back.rdd.getNumPartitions <=
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // byte-exact round-trip, row-complete
    val orig = mixed.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = back.select(col("media_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == orig.keySet, "ids lost or invented at the boundary")
    got.foreach { case (id, p) =>
      assert(java.util.Arrays.equals(p, orig(id)),
        s"payload bytes changed through the file boundary for $id")
    }
    // lie schedule: claimed extension wrong iff id % 7 == 3, and the
    // audit bit reproduces it through sniff-vs-name comparison
    val audit = MediaFiles.ingestAudit(spark, landing).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(4))).toMap
    audit.foreach { case (id, (kind, lied)) =>
      assert(lied == (id % 7 == 3), s"lie bit wrong for $id")
      assert(kind == Seq("image", "audio", "video")((id % 3).toInt),
        s"sniffed kind must come from payload magic, not the name: $id")
    }
  }

  test("binaryFile partitioned layout: filtering one modality prunes " +
      "the other modalities' FILES from the scan, and a metadata-only " +
      "projection prunes payload bytes out of the read schema") {
    import graft.ext.{MediaFiles, Multimodal}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 120)
    val mixed = Multimodal.syntheticMixedFrameGrouped(spark, docs, "doc_id")
    val landing = tmpDir("mediapart")
    MediaFiles.writeMediaFilesPartitioned(mixed, landing)
    val nAudio = new java.io.File(s"$landing/kind=audio").list().length
    val nAll = Seq("image", "audio", "video")
      .map(k => new java.io.File(s"$landing/kind=$k").list().length).sum
    assert(nAudio > 0 && nAll > nAudio, "fixture must be genuinely mixed")
    val pruned = MediaFiles.readMediaFiles(spark, landing)
      .filter(col("kind") === "audio")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scan.size == 1)
    assert(scan.head.metadata("PartitionFilters").contains("kind"),
      "the modality filter must reach the scan as a partition filter")
    val listed = scan.head.selectedPartitions.totalNumberOfFiles
    assert(listed == nAudio,
      s"scan listed $listed files; " +
        s"only the $nAudio audio files may survive pruning")
    // metadata-only projection: payload bytes never read
    val metaOnly = MediaFiles.readMediaFiles(spark, landing)
      .select(col("media_id"), col("claimed_ext"), col("n_bytes"))
    val metaScan = metaOnly.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(metaScan.size == 1)
    assert(!metaScan.head.requiredSchema.fieldNames.contains("content"),
      "a metadata projection must prune the content column from the scan")
    // and the lying file NAMES inside a truthful kind= dir still decode:
    // the q250 path (features over the pruned audio slice) matches a
    // direct decode of the audio payloads
    val viaFiles = graft.ext.Audio.features(spark,
        pruned.select(col("media_id"), col("payload")))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val direct = graft.ext.Audio.features(spark,
        mixed.filter(expr("cast(media_id as long) div 4") % 3 === 1)
          .select(col("media_id"), col("payload")))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(viaFiles == direct,
      "file-boundary audio features must equal the in-plan decode")
  }

  test("binaryFile STREAMING landing: the archive arrives in " +
      "file-count-shaped micro-batches, lying names flow through the " +
      "sniffed dispatch, and the streamed pair surface equals the " +
      "direct batch surface") {
    import graft.ext.{Dedup, MediaFiles, Multimodal}
    import graft.streaming.{Commits, MediaDedupMaintenance}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 120)
    val mixed = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id")
    val landing = tmpDir("binstreamland")
    MediaFiles.writeMediaFiles(mixed, landing)
    val nFiles = new java.io.File(landing).list().length
    assert(nFiles == 120)
    val mft = (nFiles + 2) / 3 // 3 micro-batches
    val storeDir = tmpDir("binstreamstore")
    val pairsDir = tmpDir("binstreampairs")
    MediaDedupMaintenance.startUnified(
      MediaFiles.streamMediaFiles(spark, landing, mft),
      storeDir, pairsDir, tmpDir("binstreamckpt")).awaitTermination()
    // micro-batch shaping: one committed store fragment per
    // file-count-sized trigger
    assert(Commits.committedBatchDirs(spark, storeDir).size == 3,
      "the landing must arrive in ceil(files/maxFilesPerTrigger) batches")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("doc_a"), col("doc_b"),
        col("hamming"), col("kind"))).collect()
        .map(_.getString(0)).toSet
    val streamed = rows(spark.read.parquet(pairsDir))
    val fps = Multimodal.unifiedFingerprints(spark, mixed)
      .select(col("media_id"), col("kind"),
        col("fp_lo").bitwiseOR(shiftleft(col("fp_hi"), 32)).as("dhash"))
    val batch = Seq("image", "audio", "video").map { k =>
      Dedup.hammingPairsFromFingerprints(
        fps.filter(col("kind") === k).select("media_id", "dhash"),
        "media_id", "dhash", maxDist = 2, chunks = 4, nBits = 64)
        .withColumn("kind", lit(k))
    }.reduce(_.unionByName(_))
    assert(streamed == rows(batch),
      "file-streamed unified pairs must equal the direct batch surface")
    assert(streamed.nonEmpty, "fixture produced no pairs at all")
  }

  test("incremental file ingest: stamped mtimes round-trip through " +
      "the source, modifiedAfter lists exactly the late wave, the " +
      "waves partition the corpus, and re-reading the same watermark " +
      "is idempotent") {
    import graft.ext.{MediaFiles, Multimodal}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 120)
    val base = 1767225600000L // 2026-01-01T00:00:00Z
    val landing = tmpDir("incland")
    MediaFiles.writeMediaFiles(
      Multimodal.syntheticMixedFrame(spark, docs, "doc_id")
        .withColumn("mtime_ms",
          lit(base) + (col("media_id") % 2) * lit(3600000L)),
      landing)
    // the stamped clock survives the boundary: the source's own
    // modificationTime column reads back the designed wave times
    val raw = spark.read.format("binaryFile").load(landing)
      .select(regexp_extract(col("path"), "media_(\\d+)\\.", 1)
        .cast("long").as("media_id"),
        unix_millis(col("modificationTime")).as("mt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    raw.foreach { case (id, mt) =>
      assert(mt == base + (id % 2) * 3600000L, s"mtime wrong for $id")
    }
    def idsAfter(wm: String): Set[Long] =
      MediaFiles.readMediaFilesModifiedAfter(spark, landing, wm)
        .select("media_id").collect().map(_.getLong(0)).toSet
    val late = idsAfter("2026-01-01T00:30:00")
    assert(late == (0L until 120L).filter(_ % 2 == 1).toSet,
      "the watermark must list exactly the late wave")
    assert(idsAfter("2026-01-01T00:30:00") == late,
      "same watermark, same delta — idempotent re-read")
    assert(idsAfter("2025-12-31T23:00:00") ==
      (0L until 120L).toSet, "a pre-corpus watermark sees everything")
    assert(idsAfter("2026-01-01T02:00:00").isEmpty,
      "a post-corpus watermark sees nothing")
  }

  test("oversized-payload guard: a length filter on the binaryFile " +
      "scan is PUSHED (the giant blob's bytes are never read) and " +
      "selects exactly the files under the cap") {
    import graft.ext.{MediaFiles, Multimodal}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 60)
    val landing = tmpDir("lenguard")
    MediaFiles.writeMediaFiles(
      Multimodal.syntheticMixedFrame(spark, docs, "doc_id"), landing)
    // plant the "corrupt 40 GB crawl blob" stand-in: a file too big
    // to decode, which the guard must skip WITHOUT reading
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "media_000000999.png"),
      Array.fill[Byte](512 * 1024)(7))
    val cap = 64 * 1024L
    val guarded = MediaFiles.readMediaFiles(spark, landing)
      .filter(col("n_bytes") < cap)
    val scan = guarded.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scan.size == 1)
    assert(scan.head.metadata("PushedFilters").contains("length"),
      s"the length guard must push to the scan: " +
        s"${scan.head.metadata("PushedFilters")}")
    val sizes = new java.io.File(landing).listFiles()
      .map(f => f.getName -> f.length()).toMap
    val expected = sizes.filter(_._2 < cap).keySet
      .map(n => n.stripPrefix("media_").takeWhile(_.isDigit).toLong)
    val got = guarded.select("media_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == expected && !got.contains(999L),
      "the guard must select exactly the under-cap files")
    // and the survivors still decode through the unified dispatch
    assert(Multimodal.unifiedFingerprints(spark,
        guarded.select(col("media_id"), col("payload")))
      .count() == expected.size)
  }
}
