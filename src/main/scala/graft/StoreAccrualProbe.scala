package graft

import org.apache.spark.sql.functions.col

/** Dev probe for FRAGMENT ACCRUAL in the unified fingerprint store: a
  * long-lived stream lands one fragment dir per micro-batch, so
  * without compaction the per-batch listing/planning cost grows with
  * batch COUNT even when the delta is constant. Runs `nBatches`
  * constant-size batches through the real maintenance unit and prints
  * the first-5 vs last-5 per-batch wall — with `compactEvery` 0 the
  * tail should read measurably above the head; with folding on it
  * should stay flat.
  *
  * FOLD COST is timed separately (the per-batch walls exclude it):
  * `foldHead5`/`foldTail5` compare the first and last five folds'
  * wall — under the single-level fold (`maxRuns 1`) the tail folds
  * rewrite the whole store and grow linearly with store size; under
  * the size-tiered fold (`maxRuns 4`) per-fold cost tracks the
  * FOLDED bytes (tail + absorbed small runs), flat except the
  * occasional geometric big-merge.
  *
  * usage: StoreAccrualProbe <sfDirIgnored> <nBatches> <docsPerBatch>
  *          <compactEvery> [maxRuns]
  * (arg 0 kept for recorded-command compatibility; batch ids are
  * synthetic ranges, so no fixture is read)
  */
object StoreAccrualProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    // arg 0 (a fixture dir) is retained for CLI compatibility with
    // the recorded BASELINE command lines but is no longer read:
    // batches are ranged synthetic ids (see below)
    val nBatches = if (args.length > 1) args(1).toInt else 40
    val docsPer = if (args.length > 2) args(2).toInt else 60
    val compactEvery = if (args.length > 3) args(3).toInt else 0
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
    val dirs = Seq("store", "pairs")
      .map(k => Scratch.createTempDir("sap" + k))
    try {
      val Seq(store, pairs) = dirs.map(_.toString)
      // ranged synthetic ids, not the documents table: nBatches ×
      // docsPer distinct ids must exist however long the probe runs
      // (150 × 60 = 9000 > the sf0.1 table's 5000 — recycled ids
      // would plant cross-batch duplicates and grow the PAIR store,
      // contaminating the accrual signal with join output cost)
      val foldTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      // bytes the fold WROTE (the new run's manifest-recorded size) —
      // the machine-independent form of the write-amplification law:
      // at small store sizes per-fold WALL is job-overhead-dominated
      // and identical across maxRuns, but bytes written per fold is
      // O(store) under maxRuns=1 and O(folded tail) under tiering
      val foldBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
      val times = (0 until nBatches).map { b =>
        val batch = graft.ext.Multimodal.syntheticMixedFrameGrouped(
          spark,
          spark.range(b.toLong * docsPer, (b + 1).toLong * docsPer)
            .select(col("id").as("doc_id")),
          "doc_id")
        val t0 = System.nanoTime()
        graft.streaming.MediaDedupMaintenance.processBatchUnified(
          batch, b.toLong, store, pairs)
        val t1 = System.nanoTime()
        if (compactEvery > 0 && (b + 1) % compactEvery == 0) {
          // the byte-attribution manifest reads stay OUTSIDE the
          // fold-timing window — foldHead5/foldTail5 must time the
          // fold alone
          val next = graft.streaming.Commits.runManifest(spark, store).next
          val f0 = System.nanoTime()
          graft.streaming.MediaDedupMaintenance.compactUnifiedStore(
            spark, store, maxRuns)
          foldTimes += (System.nanoTime() - f0) / 1e6
          graft.streaming.Commits.runManifest(spark, store).runs
            .find(_.name == s"run=$next").foreach(foldBytes += _.bytes)
        }
        (t1 - t0) / 1e6
      }
      def avg(xs: Seq[Double]): Double =
        if (xs.isEmpty) 0.0 else xs.sum / xs.size
      println(f"PROBE accrual nBatches=$nBatches docsPer=$docsPer " +
        f"compactEvery=$compactEvery maxRuns=$maxRuns " +
        f"head5=${avg(times.slice(10, 15))}%.0fms " + // post-JIT window
        f"tail5=${avg(times.takeRight(5))}%.0fms " +
        f"foldHead5=${avg(foldTimes.take(5).toSeq)}%.0fms " +
        f"foldTail5=${avg(foldTimes.takeRight(5).toSeq)}%.0fms " +
        f"nFolds=${foldTimes.size} " +
        f"foldKbHead5=${avg(foldBytes.take(5).map(_ / 1024.0).toSeq)}%.0f " +
        f"foldKbTail5=${avg(foldBytes.takeRight(5).map(_ / 1024.0).toSeq)}%.0f " +
        f"foldKbTotal=${foldBytes.sum / 1024}%d " +
        f"storeRows=${graft.streaming.MediaDedupMaintenance
          .readUnifiedFingerprints(spark, store).count()}")
    } finally {
      dirs.foreach(Scratch.deleteRecursively)
      spark.stop()
    }
  }
}
