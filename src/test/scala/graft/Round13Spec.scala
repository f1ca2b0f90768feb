package graft

import graft.ext.{Images, MediaFiles, Multimodal}
import graft.streaming.MediaDedupMaintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Round-13: the BAND-PARTITIONED unified fingerprint store (per-batch
  * scan cost tracks the delta's bucket coverage, not store size) and
  * the manifest-backed file-stream equivalence. */
class Round13Spec extends SparkSpec {

  import spark.implicits._

  private def unifiedFps(payloads: DataFrame): DataFrame =
    Multimodal.unifiedFingerprints(spark, payloads)
      .select(col("media_id"), col("kind"),
        col("fp_lo").bitwiseOR(shiftleft(col("fp_hi"), 32)).as("dhash"))

  test("banded unified store: the per-batch scan carries partition " +
      "filters on (kind, band, bucket) and a tiny single-kind delta " +
      "reads a fraction of the store's files") {
    val docs = (0L until 240L).toDF("doc_id")
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id")
    val storeDir = tmpDir("bandedstore")
    val pairsDir = tmpDir("bandedpairs")
    // seed the store in 4 batches through the real maintenance
    val landing = tmpDir("bandedland")
    media.repartitionByRange(4, col("media_id"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    MediaDedupMaintenance.startUnified(src, storeDir, pairsDir,
      tmpDir("bandedckpt")).awaitTermination()
    val storeFiles = spark.read
      .option("basePath", storeDir).parquet(storeDir)
      .inputFiles.length
    assert(storeFiles > 10, s"store fixture too small: $storeFiles files")
    // a TINY image-only delta with fresh ids: the trickle arrival the
    // bucketed layout exists for
    val deltaDocs = (0L until 2L).map(_ + 5000L).toDF("doc_id")
    val deltaFp = unifiedFps(Images.syntheticPngFrame(spark, deltaDocs,
      "doc_id").select(col("media_id"), col("payload")))
    graft.streaming.EventsStream.withConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      val deltaBanded = MediaDedupMaintenance.bandDelta(deltaFp, 2, 4,
        MediaDedupMaintenance.UnifiedStoreBuckets)
      val pairs = MediaDedupMaintenance.unifiedBatchPairs(
        MediaDedupMaintenance.readBandedUnifiedFingerprints(spark,
          storeDir),
        deltaBanded, deltaFp.select(col("media_id")),
        MediaDedupMaintenance.touchedCells(deltaBanded),
        maxDist = 2, chunks = 4)
      pairs.collect() // fill scan metrics
      val scans = pairs.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(
              _.toString.contains("bandedstore")) => f
      }
      assert(scans.nonEmpty, "store scan not found in the batch plan")
      scans.foreach { f =>
        val pf = f.metadata.getOrElse("PartitionFilters", "")
        assert(pf.contains("kind") && pf.contains("band"),
          s"store scan must be partition-pruned to the delta's kind " +
            s"and bands, got PartitionFilters: $pf")
        val pushed = f.metadata.getOrElse("PushedFilters", "")
        assert(pushed.contains("bucket"),
          s"the delta's bucket cells must push into the parquet " +
            s"scan, got PushedFilters: $pushed")
      }
      val filesRead = scans.map(_.metrics("numFiles").value).sum
      assert(filesRead > 0, "image branch must read some store files")
      assert(filesRead < storeFiles / 2,
        s"tiny single-kind delta read $filesRead of $storeFiles store " +
          "files — kind/band dir pruning is not biting")
    }
    // and the logical store reader still reconstructs one row per
    // media from the band=0 slice
    val logical = MediaDedupMaintenance.readUnifiedFingerprints(spark,
      storeDir)
    assert(logical.groupBy(col("media_id")).count()
      .filter(col("count") > 1).isEmpty,
      "band=0 slice must carry exactly one row per media")
    assert(logical.count() == media.count(),
      "logical store lost media through the banded layout")
  }

  test("manifest-backed file stream == vanilla binaryFile stream: " +
      "same landing, identical pair surface") {
    val docs = (0L until 180L).toDF("doc_id")
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id")
    val landing = tmpDir("mfland")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(landing))
    MediaFiles.writeMediaFiles(media, landing)
    val nFiles = new java.io.File(landing).list().length
    def run(src: DataFrame, tag: String): Set[String] = {
      val pairs = tmpDir(s"mfpairs$tag")
      MediaDedupMaintenance.startUnified(src, tmpDir(s"mfstore$tag"),
        pairs, tmpDir(s"mfckpt$tag")).awaitTermination()
      spark.read.parquet(pairs)
        .select(concat_ws("|", col("doc_a"), col("doc_b"),
          col("hamming"), col("kind"))).collect()
        .map(_.getString(0)).toSet
    }
    val vanilla = run(MediaFiles.streamMediaFiles(spark, landing,
      math.max(1, (nFiles + 2) / 3)), "v")
    val manifestDir = tmpDir("mfmanifest")
    MediaFiles.appendManifest(spark, landing, manifestDir,
      manifestFiles = 3)
    val manifest = run(MediaFiles.streamManifest(spark, manifestDir, 1),
      "m")
    assert(vanilla.nonEmpty, "fixture produced no pairs")
    assert(manifest == vanilla,
      "manifest-backed stream changed the pair surface")
  }
}
