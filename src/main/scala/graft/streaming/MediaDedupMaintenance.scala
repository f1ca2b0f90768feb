package graft.streaming

import graft.ext.{Dedup, Images}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming media-fingerprint maintenance — the media-modality twin
  * of [[DedupMaintenance]]: payloads arrive in micro-batches
  * (media_id, payload binary), each batch is DECODED ONCE through the
  * real codec chain ([[Images.dHashes]] — format-sniffed PNG/JPEG,
  * rational resize, 64-bit dHash), joined banded against the
  * accumulated fingerprint store
  * ([[Dedup.hammingDeltaPairsFromFingerprints]] — banding work sized
  * by the delta, stored² never enumerated), and two things land
  * atomically per batch: the batch's own 16-bytes-per-image
  * fingerprint fragment (tomorrow joins against a fingerprint READ,
  * never a re-decode — the payload is touched exactly once in its
  * lifetime) and the new near-dup pairs the batch introduced. Pair
  * emission is structurally exactly-once across batches: a pair
  * (a, b) with a in batch i ≤ batch j ∋ b is discoverable only at
  * batch j, batch-internal pairs only at their own batch.
  *
  * Delivery is exactly-once on storage by the maintenance-family
  * discipline: fragment and pairs both write `mode(Overwrite)` into
  * their own `batch=<batchId>` dir; checkpoints make replays
  * batch-id-stable, and a replayed batch converges to the run-once
  * bytes (spec-pinned).
  *
  * Scale shape per batch: decode is map-only over the delta
  * payloads; the corpus-sized side is ONE scan of the stored slim
  * fingerprints; shuffle volume is O(|delta| × bands + collided
  * buckets). A full-corpus re-fingerprint would re-DECODE the whole
  * archive daily — the one cost a 100-TB media store can never
  * repay. */
object MediaDedupMaintenance {

  private def fpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dhash", LongType)))

  /** The accumulated fingerprint store — COMMITTED `batch=<n>`
    * fragments only ([[Commits.committedBatchDirs]] — the
    * `_SUCCESS`-or-finalized-parts rule shared with
    * [[HllMaintenance]]): a monitor calling this while the stream is
    * mid-write for batch j must see the store as of batch j−1, never
    * a partial fragment. Empty-with-schema before the first batch;
    * non-`batch=<n>` names skipped. */
  def readFingerprints(spark: SparkSession, storeDir: String): DataFrame = {
    val dirs = Commits.committedBatchDirs(spark, storeDir)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fpSchema)
    else
      spark.read.schema(fpSchema).parquet(dirs.map(_.toString): _*)
        .select(col("media_id"), col("dhash"))
  }

  /** The delta-vs-store pair join of one micro-batch — exposed so the
    * physical plan can be audited directly (the streaming wrapper
    * hides the per-batch plan from the catalog path): banded Hamming
    * delta join, then — mirror-aware only — the composite-id collapse
    * ([[Images.collapseOrientationPairs]]). */
  private[graft] def batchPairs(base: DataFrame, deltaFp: DataFrame,
      maxDist: Int, chunks: Int, mirrorAware: Boolean): DataFrame = {
    val raw = Dedup.hammingDeltaPairsFromFingerprints(base, deltaFp,
      "media_id", "dhash", maxDist, chunks, nBits = 64)
    if (mirrorAware) Images.collapseOrientationPairs(raw) else raw
  }

  /** The idempotent unit: decode + fingerprint one micro-batch of
    * (media_id, payload), emit its delta pairs against everything
    * landed so far, land its own fragment.
    *
    * `mirrorAware` stores BOTH orientations' fingerprints per image
    * (composite ids media_id·2 + orient —
    * [[Images.dHashesBothOrientations]], one decode, 32 bytes/image
    * of state) and collapses emitted pairs to media level with the
    * minimum Hamming across orientation combos — so the STREAMED
    * store computes the SAME duplicate relation as the batch
    * mirror-aware path ([[Images.dHashNearDupPairsMirrorAware]]): a
    * mirrored repost arriving in a later micro-batch surfaces at
    * Hamming 0, which the plain-fingerprint store provably misses
    * (spec-pinned both ways). All four combos of a cross-batch pair
    * are visible at the later endpoint's batch (both its orientation
    * rows ride the delta), so min-collapse per batch equals the
    * full-corpus min. A store written in one mode must be read in
    * that mode — the modes' id spaces differ. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      pairsDir: String, maxDist: Int = 2, chunks: Int = 4,
      mirrorAware: Boolean = false): Unit = {
    val spark = batch.sparkSession
    // decode ONCE: the fingerprint frame is consumed twice (pairs
    // join reads it as the delta side of the banded join, then it
    // lands as the fragment) — cut it rather than re-run the codec
    // per consumer; released before return
    val payloads = batch.select(col("media_id"), col("payload"))
    val deltaFp = (if (mirrorAware)
        Images.dHashesBothOrientations(spark, payloads)
      else Images.dHashes(spark, payloads))
      .localCheckpoint()
    try {
      // exclude this batch's own fragment on replay (the fresh delta
      // IS those rows; base/delta id-disjointness is the delta
      // join's contract)
      val base = readFingerprints(spark, storeDir)
        .join(deltaFp.select(col("media_id")), Seq("media_id"),
          "left_anti")
      batchPairs(base, deltaFp, maxDist, chunks, mirrorAware)
        .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      deltaFp.write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
    } finally {
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unpersistLocalCheckpoint(deltaFp)
    }
  }

  /** Start maintaining the fingerprint store + pairs log from a
    * streaming `source` carrying (media_id, payload). */
  def start(source: DataFrame, storeDir: String, pairsDir: String,
      checkpointDir: String, maxDist: Int = 2, chunks: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      mirrorAware: Boolean = false): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, storeDir, pairsDir, maxDist,
            chunks, mirrorAware)
        }
      }
      .start()
}
