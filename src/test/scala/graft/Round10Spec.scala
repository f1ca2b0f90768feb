package graft

import org.apache.spark.sql.functions._

import graft.ext.{GraphOps, Sampling}

/** Round-10 hardening pins: the shared PageRank round body covers the
  * weighted convergence telemetry, the streaming HLL merge ignores
  * uncommitted/foreign fragment dirs, and the Neyman isqrt guard
  * raises loudly past its 2^104 exactness bound. */
class Round10Spec extends SparkSpec {

  import spark.implicits._

  test("pageRankConvergence(weightCol) deltas match differences of " +
      "the weighted fixed point's per-iter states") {
    val edges = Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 2L, 2L),
      (2L, 0L, 5L), (3L, 0L, 1L)).toDF("src", "dst", "w")
    def fp(i: Int): Map[Long, Long] =
      GraphOps.pageRankFixedPoint(edges, "src", "dst", iters = i,
          weightCol = Some("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = GraphOps.pageRankConvergence(edges, "src", "dst",
        iters = 3, weightCol = Some("w"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val states = Map(0 -> fp(1).keys.map(_ -> 1000000L).toMap,
      1 -> fp(1), 2 -> fp(2), 3 -> fp(3))
    for (i <- 1 to 3) {
      val dm = states(i).map { case (n, r) =>
        math.abs(r - states(i - 1)(n)) }.sum
      val nc = states(i).count { case (n, r) => r != states(i - 1)(n) }
      assert(conv(i) == ((dm, nc.toLong)), s"iter $i diverged")
    }
  }

  test("HllMaintenance.mergedRegisters skips fragments without " +
      "_SUCCESS and non-numeric batch dirs instead of merging/throwing") {
    val outDir = tmpDir("hllsafe")
    val rows = (0L until 40L).map(i => (s"k${i % 3}", i))
      .toDF("key", "v")
    graft.streaming.HllMaintenance.writeFragment(
      rows, 0L, "key", xxhash64(col("v")), outDir)
    val committed = graft.streaming.HllMaintenance
      .mergedRegisters(spark, outDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(committed.nonEmpty)
    // an in-flight fragment: parquet part file present, no _SUCCESS —
    // must be invisible to the merge
    val inflight = new java.io.File(s"$outDir/batch=1")
    assert(inflight.mkdirs())
    rows.limit(5).write.mode("overwrite")
      .parquet(s"$outDir/batch=1_tmp")
    val part = new java.io.File(s"$outDir/batch=1_tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(inflight, part.getName).toPath)
    // a foreign dir with a non-numeric id — must be skipped, not thrown
    assert(new java.io.File(s"$outDir/batch=abc").mkdirs())
    val after = graft.streaming.HllMaintenance
      .mergedRegisters(spark, outDir, upToBatch = Some(99L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(after == committed,
      "uncommitted/non-numeric fragments leaked into the merge")
  }

  test("packMultimodal: heterogeneous-cost assignment matches the " +
      "reference cumsum, is bucketSpan-invariant, and interleaves " +
      "each image directly after its document's text") {
    val docs = (0L until 120L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val media = graft.ext.Images.syntheticPngFrame(spark,
      docs.filter(col("doc_id") % 3 === 0), "doc_id")
    val dims = graft.ext.Images.decodedMeta(spark, media)
    def run(span: Long) = graft.ext.Packing.packMultimodal(
        docs, "doc_id", "text", dims, patch = 14, budget = 40L,
        bucketSpan = span)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    val got = run(65536L)
    // two-phase bucketed prefix sum == one global cumsum, any span
    assert(run(7L) == got, "bucketSpan changed the assignment")
    // reference: interleaved id order, running offset
    val costs = (0L until 120L).flatMap { i =>
      val tc = i % 7 + 1
      Seq((i * 2, "text", tc)) ++
        (if (i % 3 == 0) Seq((i * 2 + 1, "image", 9L)) else Nil)
    }.sortBy(_._1)
    var off = 0L
    for ((id, kind, c) <- costs) {
      val (k, n, st, sh, so, sp) = got(id)
      assert(k == kind && n == c && st == off && sh == off / 40 &&
        so == off % 40 && sp == (off % 40 + c > 40), s"item $id diverged")
      off += c
    }
    // the image of doc d starts exactly where d's text ends
    for (i <- 0L until 120L by 3L)
      assert(got(i * 2 + 1)._3 == got(i * 2)._3 + got(i * 2)._2)
  }

  test("prefixFilterJaccardPairsCapped: capped output is a subset of " +
      "the uncapped pairs, a generous cap changes nothing, and the " +
      "truncation ledger prices the loss exactly") {
    // adversarial density: tiny vocabulary, heavy boilerplate overlap
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (0L until 60L).map { i =>
      val words = (0 until 12).map(j =>
        vocab(((i / 7 + j) % vocab.length).toInt))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(graft.ext.Dedup.prefixFilterJaccardPairs(
      docs, "text", "doc_id", n = 3, thresholdNum = 3, thresholdDen = 5))
    val (wide, wideStats) = graft.ext.Dedup.prefixFilterJaccardPairsCapped(
      docs, "text", "doc_id", n = 3, thresholdNum = 3, thresholdDen = 5,
      maxCandidates = 10000)
    assert(pairs(wide) == uncapped, "a generous cap must be a no-op")
    assert(wideStats.isEmpty, "no truncation may be reported at k=10000")
    val (tight, tightStats) = graft.ext.Dedup.prefixFilterJaccardPairsCapped(
      docs, "text", "doc_id", n = 3, thresholdNum = 3, thresholdDen = 5,
      maxCandidates = 2)
    val tightPairs = pairs(tight)
    assert(tightPairs.subsetOf(uncapped),
      "capped output must never invent a pair")
    val ledger = tightStats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ledger.forall { case (_, c, k, d) => c == k + d && k <= 2 })
    assert(ledger.nonEmpty,
      "the dense fixture must actually truncate at k=2")
    // emitted pairs still honor the threshold (precision unharmed)
    tight.collect().foreach(r =>
      assert(r.getDouble(2) >= 0.6 - 1e-12))
  }

  test("neymanQuotas raises loudly once a stratum radicand crosses " +
      "2^104 (the exact-isqrt validity bound)") {
    // two huge distinct values: n·Σx² − (Σx)² = (1e16 − 3e16)² ≈ 4e32
    // > 2^104 ≈ 2.03e31 — the float-seed ±1 guarantee is void here
    val huge = Seq((1L, "s", 10000000000000000L),
      (2L, "s", 30000000000000000L)).toDF("id", "st", "v")
    val e = intercept[Exception] {
      Sampling.neymanQuotas(huge, "st", col("v"), budget = 10L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("neymanQuotas")),
      s"expected the loud guard, got: ${e.getMessage}")
    // and well in range it still works: exact quotas on small ints
    val ok = Sampling.neymanQuotas(
      Seq((1L, "a", 2L), (2L, "a", 4L), (3L, "b", 5L), (4L, "b", 5L))
        .toDF("id", "st", "v"),
      "st", col("v"), budget = 10L)
    assert(ok.agg(sum(col("quota"))).head().getLong(0) == 10L)
  }
}
