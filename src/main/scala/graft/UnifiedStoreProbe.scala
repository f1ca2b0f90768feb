package graft

import org.apache.spark.sql.functions.col

/** Dev probe for the BANDED unified fingerprint store: seed a store
  * from `storeDocs` media in a few maintenance batches, then time
  * [[graft.streaming.MediaDedupMaintenance.processBatchUnified]] for
  * a TINY trickle delta — the steady-state arrival at 10⁹ stored
  * media. Run at two store sizes: if the banded layout does its job
  * the tiny-delta batch time stays flat while store size grows (scan
  * pruned to the delta's (band, bucket) cells; no store re-band,
  * re-shuffle, or rematerialization anywhere in the batch).
  *
  * With `trickleBatches > 0` the probe continues past the one-shot
  * phase attribution into the round-16 protocol: fold the seeded
  * store into run form, then run that many REAL maintenance batches
  * (`processBatchUnified`) with the size-tiered fold
  * (`compactUnifiedStore(maxRuns)`) every 4 batches — per-batch wall,
  * per-fold wall, and the live run set's manifest bytes after each
  * fold, at STORE scale (the r13 trickle rows measured the batch
  * only; the r15 accrual probe measured the fold only at sf0.1 where
  * wall is job-overhead-bound).
  *
  * usage: UnifiedStoreProbe <sfDir> <storeDocs> <deltaDocs>
  *          [trickleBatches] [maxRuns]
  */
object UnifiedStoreProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val storeDocs = if (args.length > 1) args(1).toInt else 25000
    val deltaDocs = if (args.length > 2) args(2).toInt else 200
    val trickleBatches = if (args.length > 3) args(3).toInt else 0
    val maxRuns = if (args.length > 4) args(4).toInt else 4
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq("store", "pairs", "land")
      .map(k => Scratch.createTempDir("usp" + k))
    try {
      val Seq(store, pairs, landing) = dirs.map(_.toString)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).limit(storeDocs)
      val media = graft.ext.Multimodal.syntheticMixedFrameGrouped(
        spark, docs, "doc_id")
      val t0 = System.nanoTime()
      // seed in 4 batches through the real maintenance unit
      (0 until 4).foreach { b =>
        graft.streaming.MediaDedupMaintenance.processBatchUnified(
          media.filter(col("media_id") % 4 === b), b.toLong, store,
          pairs)
      }
      val t1 = System.nanoTime()
      // trickle delta: fresh ids far outside the store's range
      val delta = graft.ext.Multimodal.syntheticMixedFrameGrouped(
        spark,
        spark.range(10L * 1000 * 1000, 10L * 1000 * 1000 + deltaDocs)
          .toDF("doc_id"),
        "doc_id")
      val t2 = System.nanoTime()
      // phase-attributed replica of processBatchUnified
      locally {
        import graft.streaming.{MediaDedupMaintenance => M}
        import org.apache.spark.sql.functions.shiftleft
        val p0 = System.nanoTime()
        val deltaFp = graft.ext.Multimodal.unifiedFingerprints(spark,
            delta.select(col("media_id"), col("payload")))
          .select(col("media_id"), col("kind"),
            col("fp_lo").bitwiseOR(shiftleft(col("fp_hi"), 32))
              .as("dhash"))
          .localCheckpoint()
        val deltaBanded = M.bandDelta(deltaFp, 2, 4,
          M.UnifiedStoreBuckets)
        val touched = M.touchedCells(deltaBanded)
        val p1 = System.nanoTime()
        M.unifiedBatchPairs(
          M.readBandedUnifiedFingerprints(spark, store), deltaBanded,
          deltaFp.select(col("media_id")), touched, 2, 4)
          .write.mode("overwrite").parquet(s"$pairs/batch=90")
        val p2 = System.nanoTime()
        deltaBanded
          .repartition(col("kind"), col("band"))
          .sortWithinPartitions(col("kind"), col("band"), col("bucket"))
          .write.mode("overwrite").partitionBy("kind", "band")
          .parquet(s"$store/batch=90")
        val p3 = System.nanoTime()
        org.apache.spark.sql.graftbridge.ColumnBridge
          .unpersistLocalCheckpoint(deltaFp)
        println(f"PHASES ckptTouched=${(p1 - p0) / 1e9}%.2f " +
          f"pairs=${(p2 - p1) / 1e9}%.2f " +
          f"fragment=${(p3 - p2) / 1e9}%.2f")
      }
      val t3 = System.nanoTime()
      val storeRows = graft.streaming.MediaDedupMaintenance
        .readUnifiedFingerprints(spark, store).count()
      println(f"PROBE banded-store storeDocs=$storeDocs " +
        f"deltaDocs=$deltaDocs storeRows=$storeRows " +
        f"seed=${(t1 - t0) / 1e9}%.1fs " +
        f"trickleBatch=${(t3 - t2) / 1e9}%.2fs")
      if (trickleBatches > 0) {
        import graft.streaming.{Commits, MediaDedupMaintenance => M}
        // steady state: the seeded store folded into run form
        M.compactUnifiedStore(spark, store, maxRuns)
        (1 to trickleBatches).foreach { i =>
          val d = graft.ext.Multimodal.syntheticMixedFrameGrouped(
            spark,
            spark.range(20000000L + i.toLong * deltaDocs,
              20000000L + (i + 1).toLong * deltaDocs).toDF("doc_id"),
            "doc_id")
          val b0 = System.nanoTime()
          M.processBatchUnified(d, 100L + i, store, pairs)
          val b1 = System.nanoTime()
          var foldS = 0.0
          var runLine = ""
          if (i % 4 == 0) {
            val f0 = System.nanoTime()
            M.compactUnifiedStore(spark, store, maxRuns)
            foldS = (System.nanoTime() - f0) / 1e9
            val m = Commits.runManifest(spark, store)
            runLine = m.runs
              .map(r => s"${r.name}:${r.bytes / 1024}KB").mkString(" ")
          }
          println(f"TRICKLE $i%02d batch=${(b1 - b0) / 1e9}%.2fs " +
            f"fold=$foldS%.2fs $runLine")
        }
      }
    } finally {
      dirs.foreach(Scratch.deleteRecursively)
      spark.stop()
    }
  }
}
