package graft

import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions.col

/** Physical-plan audit for the media codec chains: the 100-TB
  * property that matters most is that PAYLOAD BYTES never cross an
  * exchange — fingerprints (16-32 bytes/row) shuffle, media payloads
  * stay partition-local from synthesis to decode. Checked
  * programmatically on the plan tree (every Shuffle/Broadcast
  * exchange's child output is payload-free), plus the catalog-wide
  * no-cartesian/no-nested-loop rules. Covers EVERY media catalog
  * query; rows that hide their distributed plans from the catalog
  * path — the three streaming queries (q243/q246/q248, per-batch
  * plans behind the stream wrapper) and the driver-localizing rows
  * (q245's cached composition, q249-q251's scratch-dir lifecycle) —
  * have their COMPOSITIONS audited directly, on the RAW
  * (un-checkpointed) lineage, which is stricter than what actually
  * executes. */
class MediaPlanSpec extends SparkSpec {

  private val media = Seq(
    "q231_image_dhash", "q232_multimodal_pack",
    "q234_image_dhash_vardims", "q235_audio_features",
    "q236_audio_neardup", "q237_video_scene_cuts",
    "q238_audio_pitch", "q239_crossmodal_consistency",
    "q240_image_dhash_delta", "q241_video_pack",
    "q242_unified_media_fp", "q244_image_mirror_dedup",
    "q247_video_inter_scene_cuts", "q253_video_entropy_scene_cuts",
    "q255_av_container_audit", "q257_video_mc_scene_cuts",
    "q258_av_sync_audit", "q259_video_range_scene_cuts",
    "q260_video_pan_mc_cuts", "q261_av_sync_varclock")

  private def auditPlan(name: String,
      plan: org.apache.spark.sql.execution.SparkPlan): Unit = {
    val s = plan.toString
    assert(!s.contains("CartesianProduct"),
      s"$name: cartesian product in plan")
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"$name: nested-loop join in plan")
    val exchanges = plan.collect {
      case e: ShuffleExchangeExec => ("shuffle", e.child.output)
      case e: BroadcastExchangeExec => ("broadcast", e.child.output)
    }
    // map-only (zero exchanges) is the ideal — q235's feature
    // extraction never shuffles at all; when exchanges exist they
    // must carry fingerprints, not payloads
    exchanges.foreach { case (kind, out) =>
      assert(!out.exists(_.name == "payload"),
        s"$name: media payload crosses a $kind exchange — " +
          s"[${out.map(_.name).mkString(", ")}]")
    }
  }

  test("media plans: payload bytes never cross an exchange; banded " +
      "joins keyed (no cartesian / nested-loop)") {
    val dir = sf("sf0.001")
    val qs = graft.queries.Catalog.all.filter(q => media.contains(q.name))
    assert(qs.size == media.size, "audit list went stale")
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      qs.foreach { q =>
        auditPlan(q.name, q.fn(spark, dir).queryExecution.executedPlan)
      }
    }
  }

  test("streaming per-batch plans (q243/q246/q248 compositions): " +
      "payload-free exchanges on the raw batch lineage") {
    import graft.ext.{Images, Multimodal}
    import graft.streaming.MediaDedupMaintenance
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"))
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      // q243's unit: plain fingerprints, delta vs base
      val plainMedia = Images.syntheticPngFrame(spark, docs, "doc_id")
        .select(col("media_id"), col("payload"))
      val plainBase = Images.dHashes(spark,
        plainMedia.filter(col("media_id") % 4 =!= 0))
      val plainDelta = Images.dHashes(spark,
        plainMedia.filter(col("media_id") % 4 === 0))
      auditPlan("q243 batchPairs",
        MediaDedupMaintenance.batchPairs(plainBase, plainDelta,
          maxDist = 2, chunks = 4, mirrorAware = false)
          .queryExecution.executedPlan)
      // q246's unit: both-orientation fingerprints + collapse
      val mirMedia = Images.syntheticPngFrameWithMirrors(spark, docs,
        "doc_id").select(col("media_id"), col("payload"))
      val mirBase = Images.dHashesBothOrientations(spark,
        mirMedia.filter(col("media_id") % 4 =!= 0))
      val mirDelta = Images.dHashesBothOrientations(spark,
        mirMedia.filter(col("media_id") % 4 === 0))
      auditPlan("q246 batchPairs(mirrorAware)",
        MediaDedupMaintenance.batchPairs(mirBase, mirDelta,
          maxDist = 2, chunks = 4, mirrorAware = true)
          .queryExecution.executedPlan)
      // q248's unit: unified three-codec dispatch, per-kind joins
      import org.apache.spark.sql.functions.shiftleft
      val mixed = Multimodal.syntheticMixedFrameGrouped(spark, docs,
        "doc_id")
      def fps(m: org.apache.spark.sql.DataFrame) =
        Multimodal.unifiedFingerprints(spark, m)
          .select(col("media_id"), col("kind"),
            col("fp_lo").bitwiseOR(shiftleft(col("fp_hi"), 32))
              .as("dhash"))
      val nb = MediaDedupMaintenance.UnifiedStoreBuckets
      val baseBanded = MediaDedupMaintenance.bandDelta(
        fps(mixed.filter(col("media_id") % 4 =!= 0)), 2, 4, nb)
      val deltaFp248 = fps(mixed.filter(col("media_id") % 4 === 0))
      val deltaBanded = MediaDedupMaintenance.bandDelta(
        deltaFp248, 2, 4, nb)
      auditPlan("q248 unifiedBatchPairs",
        MediaDedupMaintenance.unifiedBatchPairs(
          baseBanded, deltaBanded, deltaFp248.select(col("media_id")),
          MediaDedupMaintenance.touchedCells(deltaBanded),
          maxDist = 2, chunks = 4)
          .queryExecution.executedPlan)
    }
  }

  test("file-boundary plans (q249/q250 compositions): payload-free " +
      "exchanges over real binaryFile scans") {
    import graft.ext.{MediaFiles, Multimodal}
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 60)
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      val mixed = Multimodal.syntheticMixedFrame(spark, docs, "doc_id")
      val flat = tmpDir("planflat")
      MediaFiles.writeMediaFiles(mixed, flat)
      auditPlan("q249 ingestAudit",
        MediaFiles.ingestAudit(spark, flat)
          .queryExecution.executedPlan)
      val part = tmpDir("planpart")
      MediaFiles.writeMediaFilesPartitioned(mixed, part)
      auditPlan("q250 pruned audio features",
        graft.ext.Audio.features(spark,
          MediaFiles.readMediaFiles(spark, part)
            .filter(col("kind") === "audio")
            .select(col("media_id"), col("payload")))
          .queryExecution.executedPlan)
    }
  }

  test("q245's distributed composition (the catalog row collects " +
      "driver-local): payload-free exchanges across the fingerprint " +
      "chain, the bounded join, and the audit anti-join") {
    import graft.ext.{Dedup, Images}
    import org.apache.spark.sql.functions.{broadcast, lit}
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      val fps = Images.dHashes(spark,
        Images.syntheticPngFrame(spark, docs, "doc_id"))
      val img = Dedup.hammingPairsFromFingerprints(fps, "media_id",
        "dhash", maxDist = 2, chunks = 4, nBits = 64)
      auditPlan("q245 image pair chain",
        img.queryExecution.executedPlan)
      val outs = Dedup.prefixFilterJaccardPairsBoundedOnce(docs,
        "text", "doc_id", n = 3, thresholdNum = 3, thresholdDen = 5,
        maxCandidates = 1, maxTokenDf = 2)
      try {
        auditPlan("q245 bounded text pairs",
          outs.pairs.queryExecution.executedPlan)
        val hotDocs = outs.shingleRows
          .join(broadcast(outs.tokenLedger
            .select(col("token").as("_tok"))), Seq("_tok"))
          .select(col("_id").as("doc_id")).distinct()
        val suspect = outs.docLedger.select(col("doc_id"))
          .unionByName(hotDocs).distinct().withColumn("_s", lit(true))
        val out = img.join(outs.pairs.select(col("doc_a"), col("doc_b")),
            Seq("doc_a", "doc_b"), "left_anti")
          .join(broadcast(suspect.select(col("doc_id").as("doc_a"),
            col("_s").as("_sa"))), Seq("doc_a"), "left")
          .join(broadcast(suspect.select(col("doc_id").as("doc_b"),
            col("_s").as("_sb"))), Seq("doc_b"), "left")
        auditPlan("q245 audit join",
          out.queryExecution.executedPlan)
      } finally outs.release()
    }
  }
}
