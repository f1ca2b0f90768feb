package graft

import org.apache.spark.sql.functions.{col, concat_ws}

import graft.ext.{Dedup, Images}
import graft.streaming.MediaDedupMaintenance

/** Round-11: streaming media-fingerprint maintenance. Batched delta
  * pairs must union to exactly the full-corpus banded join (nothing
  * missed across batch boundaries, nothing doubled), each payload is
  * decoded exactly once in its lifetime (the store IS the decode
  * cache), and a replayed batchId converges to the run-once bytes. */
class MediaMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private def pairRows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(concat_ws("|", col("doc_a"), col("doc_b"), col("hamming")))
      .collect().map(_.getString(0)).toSet

  test("batch-union pair log == full-corpus banded join; replayed " +
      "batchId converges; the store is the decode cache") {
    val n = 160L
    val docs = (0L until n).toDF("doc_id")
    val media = Images.syntheticPngFrame(spark, docs, "doc_id")
      .select(col("media_id"), col("payload"))
    val landing = tmpDir("medialanding")
    val storeDir = tmpDir("mediastore")
    val pairsDir = tmpDir("mediapairs")
    val ckpt = tmpDir("mediackpt")
    media.repartitionByRange(4, col("media_id"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = MediaDedupMaintenance.start(src, storeDir, pairsDir, ckpt)
    q.awaitTermination()

    // ≥2 batches actually ran (maxFilesPerTrigger=1 over 4 files)
    val batches = new java.io.File(pairsDir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(batches.size >= 2, s"expected multiple batches, got $batches")

    val streamed = pairRows(spark.read.parquet(pairsDir))
    val full = pairRows(Dedup.hammingPairsFromFingerprints(
      Images.dHashes(spark, media), "media_id", "dhash",
      maxDist = 2, chunks = 4, nBits = 64))
    assert(streamed == full,
      "batched delta pairs must union to the full-corpus join")
    assert(full.nonEmpty, "fixture produced no pairs — parity untested")

    // the store is the decode cache: merged fingerprints == a direct
    // decode of the whole corpus
    val stored = MediaDedupMaintenance
      .readFingerprints(spark, storeDir)
      .select(concat_ws("|", col("media_id"), col("dhash")))
      .collect().map(_.getString(0)).toSet
    val direct = Images.dHashes(spark, media)
      .select(concat_ws("|", col("media_id"), col("dhash")))
      .collect().map(_.getString(0)).toSet
    assert(stored == direct)

    // replay idempotence: processing an already-stored subset under a
    // fresh batchId must leave the GLOBAL pair set and fingerprint
    // set unchanged (its pairs/fingerprints are rediscoveries), and
    // processing it twice converges to the same bytes
    val replay = spark.read.parquet(landing)
      .orderBy(col("media_id")).limit(40)
    MediaDedupMaintenance.processBatch(replay, 99L, storeDir, pairsDir)
    assert(pairRows(spark.read.parquet(pairsDir)) == streamed,
      "replaying stored media changed the global pair set")
    def storedSet(): Set[String] = MediaDedupMaintenance
      .readFingerprints(spark, storeDir)
      .select(concat_ws("|", col("media_id"), col("dhash")))
      .collect().map(_.getString(0)).toSet
    assert(storedSet() == stored,
      "replaying stored media changed the fingerprint set")
    MediaDedupMaintenance.processBatch(replay, 99L, storeDir, pairsDir)
    assert(pairRows(spark.read.parquet(pairsDir)) == streamed &&
      storedSet() == stored,
      "second replay of the same batchId did not converge")
  }

  test("mirror-aware streamed store == batch mirror-aware surface " +
      "(stream and batch agree on what a duplicate is); the plain " +
      "store provably misses the planted mirrors; replay converges") {
    val n = 160L
    val docs = (0L until n).toDF("doc_id")
    val media = Images.syntheticPngFrameWithMirrors(spark, docs, "doc_id")
      .select(col("media_id"), col("payload"))
    val landing = tmpDir("mirlanding")
    media.repartitionByRange(4, col("media_id"))
      .write.mode("overwrite").parquet(landing)
    def streamPairs(mirrorAware: Boolean): (Set[String], String, String) = {
      val storeDir = tmpDir("mirstore")
      val pairsDir = tmpDir("mirpairs")
      val src = spark.readStream
        .schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
      MediaDedupMaintenance.start(src, storeDir, pairsDir,
        tmpDir("mirckpt"), mirrorAware = mirrorAware)
        .awaitTermination()
      (pairRows(spark.read.parquet(pairsDir)), storeDir, pairsDir)
    }
    val (aware, awareStore, awarePairs) = streamPairs(mirrorAware = true)
    val batch = pairRows(Images.dHashNearDupPairsMirrorAware(
      spark, docs, "doc_id", maxDist = 2))
    assert(aware == batch,
      "streamed mirror-aware pairs must equal the batch surface")
    // the planted mirrors ((id-1, id) for id%40==11) surface at
    // Hamming 0 in the mirror-aware stream...
    val planted = (0L until n).filter(Images.isMirroredId)
      .map(id => s"${id - 1}|$id|0").toSet
    assert(planted.nonEmpty && planted.subsetOf(aware),
      s"planted mirrors missing from the streamed surface: $planted")
    // ...and are invisible to the plain store at ANY distance — the
    // round-11 batch-vs-stream divergence, now reproduced as the
    // designed negative
    val (plain, _, _) = streamPairs(mirrorAware = false)
    val plantedAnyDist = (0L until n).filter(Images.isMirroredId)
      .flatMap(id => plain.filter(_.startsWith(s"${id - 1}|$id|"))).toSet
    assert(plantedAnyDist.isEmpty,
      s"plain fingerprints unexpectedly caught mirrors: $plantedAnyDist")
    // replay idempotence holds in mirror mode too (composite ids
    // self-exclude through the same left_anti)
    val replay = spark.read.parquet(landing)
      .orderBy(col("media_id")).limit(40)
    MediaDedupMaintenance.processBatch(replay, 99L, awareStore,
      awarePairs, mirrorAware = true)
    assert(pairRows(spark.read.parquet(awarePairs)) == aware,
      "mirror-aware replay changed the global pair set")
  }

  test("unified mixed-modality stream: streamed per-kind pairs == " +
      "direct batch surface over the three real codecs, every kind " +
      "contributes, and kinds never cross") {
    import graft.ext.Multimodal
    import org.apache.spark.sql.functions.{lit, shiftleft}
    val docs = (0L until 240L).toDF("doc_id")
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id")
    val landing = tmpDir("unilanding")
    media.repartitionByRange(4, col("media_id"))
      .write.mode("overwrite").parquet(landing)
    val storeDir = tmpDir("unistore")
    val pairsDir = tmpDir("unipairs")
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    MediaDedupMaintenance.startUnified(src, storeDir, pairsDir,
      tmpDir("unickpt")).awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("doc_a"), col("doc_b"),
        col("hamming"), col("kind"))).collect()
        .map(_.getString(0)).toSet
    val streamed = rows(spark.read.parquet(pairsDir))
    // direct batch computation through the same codec dispatch
    val fps = Multimodal.unifiedFingerprints(spark, media)
      .select(col("media_id"), col("kind"),
        col("fp_lo").bitwiseOR(shiftleft(col("fp_hi"), 32)).as("dhash"))
    val batch = Seq("image", "audio", "video").map { k =>
      Dedup.hammingPairsFromFingerprints(
        fps.filter(col("kind") === k).select("media_id", "dhash"),
        "media_id", "dhash", maxDist = 2, chunks = 4, nBits = 64)
        .withColumn("kind", lit(k))
    }.reduce(_.unionByName(_))
    assert(streamed == rows(batch),
      "streamed unified pairs must equal the batch surface")
    Seq("image", "audio", "video").foreach { k =>
      assert(streamed.exists(_.endsWith(s"|$k")),
        s"fixture produced no $k pairs — that modality went untested")
    }
    // kinds never cross: both endpoints of every pair obey the
    // fixture's (id div 4) % 3 kind rule for the pair's own kind
    streamed.foreach { p =>
      val parts = p.split('|')
      assert((parts(0).toLong / 4) % 3 == (parts(1).toLong / 4) % 3,
        s"cross-kind pair leaked: $p")
    }
    // unified store replay converges (same anti-join discipline)
    val replay = spark.read.parquet(landing)
      .orderBy(col("media_id")).limit(60)
    MediaDedupMaintenance.processBatchUnified(replay, 99L, storeDir,
      pairsDir)
    assert(rows(spark.read.parquet(pairsDir)) == streamed,
      "unified replay changed the global pair set")
  }
}
