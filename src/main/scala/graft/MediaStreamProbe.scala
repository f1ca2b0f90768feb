package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe: the q251 pipeline with the StreamingQuery handle kept,
  * printing each micro-batch's `durationMs` breakdown (addBatch,
  * getBatch, latestOffset, walCommit, commitOffsets...) — the
  * attribution tool for file-STREAM driver overhead that
  * [[StageProbe]] can't see (it lives between stages, in the
  * source/offset-log machinery, not in tasks).
  *
  * Modes (arg 2, default `manifest`):
  *   - `vanilla`  — the measured-and-replaced shape: binaryFile
  *     streaming source straight over the landing dir (getBatch
  *     re-stats every archive file on the driver per batch, ~0.65
  *     ms/file — BASELINE Law 2).
  *   - `manifest` — the shipped q251 shape: list once into a slim
  *     parquet manifest, stream manifest deltas, fetch payload bytes
  *     executor-side (getBatch cost = listing manifest part files,
  *     O(ingest waves)).
  */
object MediaStreamProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "manifest"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq("store", "pairs", "ckpt", "land", "manifest")
      .map(k => Scratch.createTempDir("msp" + k))
    try {
      val Seq(store, pairs, ckpt, landing, manifestBase) =
        dirs.map(_.toString)
      val t0 = System.nanoTime()
      graft.ext.MediaFiles.writeMediaFiles(
        graft.ext.Multimodal.syntheticMixedFrameGrouped(spark,
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id"),
        landing)
      val t1 = System.nanoTime()
      val nFiles = new java.io.File(landing).list().length
      val src = mode match {
        case "vanilla" =>
          graft.ext.MediaFiles.streamMediaFiles(spark, landing,
            math.max(1, (nFiles + 3) / 4))
        case _ =>
          val manifest = s"$manifestBase/m"
          graft.ext.MediaFiles.appendManifest(spark, landing, manifest,
            manifestFiles = 4)
          graft.ext.MediaFiles.streamManifest(spark, manifest, 1)
      }
      val tA = System.nanoTime() // manifest append attributed apart
      val q = graft.streaming.MediaDedupMaintenance.startUnified(
        src, store, pairs, ckpt)
      q.awaitTermination()
      val t2 = System.nanoTime()
      val n = spark.read.parquet(pairs).count()
      println(f"PROBE q251-shape mode=$mode files=$nFiles pairs=$n " +
        f"write=${(t1 - t0) / 1e9}%.1fs " +
        f"append=${(tA - t1) / 1e9}%.1fs " +
        f"stream=${(t2 - tA) / 1e9}%.1fs")
      q.recentProgress.foreach { p =>
        println(s"BATCH ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
    } finally {
      dirs.foreach(Scratch.deleteRecursively)
      spark.stop()
    }
  }
}
