package graft.streaming

import graft.ext.{Dedup, Images, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, shiftleft}
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

  // ------------------------------------------- unified mixed modality

  private def unifiedFpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("dhash", LongType)))

  /** The accumulated MIXED-modality fingerprint store: (media_id,
    * kind, 64-bit fingerprint) — same committed-fragment discipline
    * as [[readFingerprints]]. */
  def readUnifiedFingerprints(spark: SparkSession,
      storeDir: String): DataFrame = {
    val dirs = Commits.committedBatchDirs(spark, storeDir)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        unifiedFpSchema)
    else
      spark.read.schema(unifiedFpSchema).parquet(dirs.map(_.toString): _*)
        .select(col("media_id"), col("kind"), col("dhash"))
  }

  private val UnifiedKinds = Seq("image", "audio", "video")

  /** The per-batch pair join of the unified store: one banded delta
    * join PER KIND (an image dHash and an audio energy fingerprint
    * agreeing on 62 bits is a collision, not a duplicate — kinds
    * never compare), unioned with the kind tagged on each pair. */
  private[graft] def unifiedBatchPairs(base: DataFrame,
      deltaFp: DataFrame, maxDist: Int, chunks: Int): DataFrame =
    UnifiedKinds.map { k =>
      Dedup.hammingDeltaPairsFromFingerprints(
        base.filter(col("kind") === k)
          .select(col("media_id"), col("dhash")),
        deltaFp.filter(col("kind") === k)
          .select(col("media_id"), col("dhash")),
        "media_id", "dhash", maxDist, chunks, nBits = 64)
        .withColumn("kind", lit(k))
    }.reduce(_.unionByName(_))

  /** The idempotent unit for a MIXED-modality archive: ONE decode
    * pass over the batch, each payload's kind sniffed from its magic
    * bytes and routed to its real codec
    * ([[Multimodal.unifiedFingerprints]] — image dHash, audio
    * energy-gradient, video first-frame dHash through the demux),
    * then per-kind delta joins against the accumulated store. This
    * is the maintenance shape a scraped-media archive needs: the
    * stream carries image+audio+video fragments in ONE store (kind
    * rides the 25-byte fingerprint row), content-type metadata is
    * never trusted, and each payload is still decoded exactly once
    * in its lifetime. */
  def processBatchUnified(batch: DataFrame, batchId: Long,
      storeDir: String, pairsDir: String, maxDist: Int = 2,
      chunks: Int = 4): Unit = {
    val spark = batch.sparkSession
    val deltaFp = Multimodal.unifiedFingerprints(spark,
        batch.select(col("media_id"), col("payload")))
      .select(col("media_id"), col("kind"),
        col("fp_lo").bitwiseOR(shiftleft(col("fp_hi"), 32)).as("dhash"))
      .localCheckpoint()
    // materialize the store read + anti-join ONCE: unifiedBatchPairs
    // embeds `base` in three per-kind branches, and un-materialized
    // each branch would re-scan the whole accumulated store parquet
    // every micro-batch (a cost that grows with every batch); the
    // frame is slim 25-byte fingerprint rows, same as deltaFp
    val base = readUnifiedFingerprints(spark, storeDir)
      .join(deltaFp.select(col("media_id")), Seq("media_id"),
        "left_anti")
      .localCheckpoint()
    try {
      unifiedBatchPairs(base, deltaFp, maxDist, chunks)
        .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      deltaFp.write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
    } finally {
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unpersistLocalCheckpoint(deltaFp)
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unpersistLocalCheckpoint(base)
    }
  }

  /** Start maintaining a unified mixed-modality fingerprint store +
    * per-kind pairs log from a streaming `source` of (media_id,
    * payload) whose payloads mix PNG/JPEG/WAV/AVI row by row. */
  def startUnified(source: DataFrame, storeDir: String,
      pairsDir: String, checkpointDir: String, maxDist: Int = 2,
      chunks: Int = 4,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatchUnified(batch, batchId, storeDir, pairsDir,
            maxDist, chunks)
        }
      }
      .start()
}
