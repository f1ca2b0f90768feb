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
  * usage: StoreAccrualProbe <sfDir> <nBatches> <docsPerBatch> <compactEvery>
  */
object StoreAccrualProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nBatches = if (args.length > 1) args(1).toInt else 40
    val docsPer = if (args.length > 2) args(2).toInt else 60
    val compactEvery = if (args.length > 3) args(3).toInt else 0
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
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
      val times = (0 until nBatches).map { b =>
        val batch = graft.ext.Multimodal.syntheticMixedFrameGrouped(
          spark,
          docs.filter(col("doc_id") >= b.toLong * docsPer &&
            col("doc_id") < (b + 1).toLong * docsPer),
          "doc_id")
        val t0 = System.nanoTime()
        graft.streaming.MediaDedupMaintenance.processBatchUnified(
          batch, b.toLong, store, pairs)
        if (compactEvery > 0 && (b + 1) % compactEvery == 0)
          graft.streaming.MediaDedupMaintenance.compactUnifiedStore(
            spark, store)
        (System.nanoTime() - t0) / 1e6
      }
      def avg(xs: Seq[Double]): Double = xs.sum / xs.size
      println(f"PROBE accrual nBatches=$nBatches docsPer=$docsPer " +
        f"compactEvery=$compactEvery " +
        f"head5=${avg(times.slice(10, 15))}%.0fms " + // post-JIT window
        f"tail5=${avg(times.takeRight(5))}%.0fms " +
        f"storeRows=${graft.streaming.MediaDedupMaintenance
          .readUnifiedFingerprints(spark, store).count()}")
    } finally {
      dirs.foreach(Scratch.deleteRecursively)
      spark.stop()
    }
  }
}
