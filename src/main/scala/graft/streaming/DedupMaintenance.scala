package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming dedup maintenance — [[graft.ext.Dedup.minHashLshDeltaPairs]]
  * composed with Structured Streaming's foreachBatch, the way a crawl
  * actually runs dedup: documents arrive in micro-batches, each batch
  * is shingled/signed ONCE, joined band-by-band against the
  * accumulated document index, and two things land atomically per
  * batch — the batch's own index fragment (so tomorrow joins against
  * an index read, never a re-shingle) and the new near-dup pairs the
  * batch introduced. Pair emission is structurally exactly-once
  * across batches: a pair (a, b) with a in batch i ≤ batch j ∋ b is
  * discoverable only at batch j (at batch i, b's index row does not
  * exist yet), and batch-internal pairs only at their own batch.
  *
  * Delivery is exactly-once on storage by the
  * [[AnnIndexMaintenance]] discipline: both the fragment and the
  * pairs write `mode(Overwrite)` into their own `batch=<batchId>`
  * directory, and streaming checkpoints make replays batch-id-stable.
  * A replayed batch re-reads an index that may already contain its
  * own fragment — harmless by construction: self-joins are id-equal
  * (excluded), and delta×delta pairs rediscovered through the stale
  * fragment deduplicate against the fresh ones, so the overwrite
  * converges to the run-once bytes (spec-pinned).
  *
  * Scale shape per batch: the corpus-sized side is ONE scan of the
  * accumulated index's banded rows; the join keys the (small) delta
  * band table against it, so shuffle volume is O(|delta| × bands +
  * collided buckets) per day — full-corpus re-dedup is O(corpus ×
  * bands) per day and loses the previously-emitted-pairs bookkeeping
  * besides. */
object DedupMaintenance {

  private def indexSchema: StructType = StructType(Seq(
    StructField("_id", LongType),
    StructField("_sh", ArrayType(StringType)),
    StructField("_bands", ArrayType(StructType(Seq(
      StructField("_bandNo", IntegerType),
      StructField("_bandKey", StringType)))))))

  /** The accumulated doc index: the compacted base (if the store has
    * been folded — [[compactIndex]]) plus the committed fragments
    * newer than it; empty-with-schema before the first batch lands. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val roots = Commits.fragmentRoots(spark, indexDir)
    if (roots.nonEmpty)
      spark.read.schema(indexSchema).parquet(roots: _*)
        .select(col("_id"), col("_sh"), col("_bands"))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
  }

  /** LSM fold of the doc index ([[Commits.compactFlatStore]]): a
    * long-lived crawl's index otherwise accrues one fragment dir per
    * micro-batch forever — the accrual law measured on the media
    * store (StoreAccrualProbe: +79% per-batch wall at 150 fragments;
    * flat with folding) applies to any fragment store, and the text
    * index's rows are the HEAVIEST in the family (full shingle sets
    * ride each row for the exact-Jaccard verify). */
  def compactIndex(spark: SparkSession, indexDir: String): Unit =
    Commits.compactFlatStore(spark, indexDir, indexSchema)

  /** The idempotent unit of maintenance: index one micro-batch, emit
    * its delta pairs against everything landed so far, land its own
    * fragment. Replaying the same (batch, batchId) overwrites both
    * directories with identical bytes. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
      idCol: String, indexDir: String, pairsDir: String, n: Int = 3,
      numPerms: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.5,
      seed: Long = 42L): Unit = {
    val spark = batch.sparkSession
    val deltaIdx = Dedup.minHashDocIndex(batch, textCol, idCol, n,
      numPerms, rowsPerBand, seed)
      // the fragment is consumed twice below (pairs join + landing)
      // and the pairs join reads it band-exploded several times — cut
      // it rather than re-shingle the batch per consumer; released
      // before return, so nothing outlives the micro-batch
      .localCheckpoint()
    try {
      // exclude this batch's own fragment on replay: the fresh delta
      // index IS those rows — reading both would only re-derive the
      // same pairs, but filtering keeps the replay read-set minimal
      val baseIdx = readIndex(spark, indexDir)
        .join(deltaIdx.select(col("_id")), Seq("_id"), "left_anti")
      Dedup.minHashDeltaPairsFromIndex(baseIdx, deltaIdx, threshold)
        .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      deltaIdx.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    } finally {
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unpersistLocalCheckpoint(deltaIdx)
    }
  }

  /** Start maintaining the dedup index + pairs log from a streaming
    * `source` carrying (`idCol`, `textCol`). */
  def start(source: DataFrame, textCol: String, idCol: String,
      indexDir: String, pairsDir: String, checkpointDir: String,
      n: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, seed: Long = 42L,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, textCol, idCol, indexDir,
            pairsDir, n, numPerms, rowsPerBand, threshold, seed)
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            compactIndex(batch.sparkSession, indexDir)
        }
      }
      .start()
}
