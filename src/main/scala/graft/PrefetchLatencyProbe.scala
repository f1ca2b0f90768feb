package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: [[graft.ext.MediaFiles.streamManifest]]'s bounded
  * read-ahead measured under INJECTED object-store latency — the
  * round-15 prefetch was justified by a time-to-first-byte argument
  * ("depth 4 hides one store round-trip behind the previous payload's
  * transfer") but every local measurement has TTFB ~= 0, so locally it
  * could only ever read as "insurance that costs nothing". This probe
  * routes the payload fetches through [[graft.sources.SlowFs]]
  * (`slowfs://`, a RawLocalFileSystem whose every `open()` sleeps a
  * configurable TTFB) and runs the SAME manifest stream at prefetch
  * depths {0 = serial, 1, 4, 8}:
  *
  * {{{
  *   sbt "runMain graft.PrefetchLatencyProbe [nFiles] [payloadKB] [delayMs]"
  * }}}
  *
  * Expected shape: serial wall >= files/task x TTFB by construction
  * (every open sleeps, one at a time); depth-4 divides the TTFB term
  * by ~4 (4 opens in flight per task); depth-8 probes saturation.
  * The depth-4 default in production stays justified exactly when the
  * depth-4 row sits near the transfer floor. */
object PrefetchLatencyProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val nFiles = if (args.length > 0) args(0).toInt else 2048
    val payloadKb = if (args.length > 1) args(1).toInt else 8
    val delayMs = if (args.length > 2) args(2).toInt else 25
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.hadoop.fs.slowfs.impl", "graft.sources.SlowFs")
      .config("spark.hadoop.fs.slowfs.open.delay.ms", delayMs.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val landing = Scratch.createTempDir("slowland")
    val manifestDir = Scratch.createTempDir("slowmanifest")
    val ckptBase = Scratch.createTempDir("slowckpt")
    try {
      // deterministic payload files, written directly (the probe
      // measures the FETCH side; synthesis is not under test)
      val body = Array.tabulate[Byte](payloadKb * 1024)(i => (i * 31).toByte)
      (0 until nFiles).foreach { i =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$landing/media_$i.bin"), body)
      }
      // slim manifest rows addressing the SAME local files through the
      // latency-injecting scheme
      (0 until nFiles).map(i =>
          (i.toLong, s"slowfs://$landing/media_$i.bin", 0L,
            body.length.toLong, "bin"))
        .toDF("media_id", "path", "mtime_ms", "n_bytes", "claimed_ext")
        .repartition(4)
        .write.parquet(s"$manifestDir/m")
      val filesPerTask = (nFiles + 31) / 32
      println(s"PROBE prefetch-latency files=$nFiles " +
        s"payloadKB=$payloadKb ttfbMs=$delayMs filesPerTask=$filesPerTask " +
        s"serialFloorSec=${filesPerTask * delayMs / 1000.0}")
      // warm-up pass (discarded): the FIRST streaming query in a JVM
      // absorbs ~3.5s of provider/codegen/listing init that would land
      // on whichever depth runs first and swamp the latency law
      Seq(-1, 0, 1, 4, 8).foreach { depth0 =>
        val depth = math.max(0, depth0)
        val t0 = System.nanoTime()
        val q = graft.ext.MediaFiles
          .streamManifest(spark, s"$manifestDir/m", 4,
            prefetchDepth = depth)
          .writeStream
          .option("checkpointLocation", s"$ckptBase/d$depth0")
          .foreachBatch {
            (df: org.apache.spark.sql.DataFrame, _: Long) =>
              val got = df.agg(
                count(lit(1)), sum(octet_length(col("payload"))))
                .collect()(0)
              require(got.getLong(0) > 0, "empty batch")
              ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        if (depth0 >= 0) println(f"DEPTH $depth%d wall=$dt%.2fs")
      }
    } finally {
      Seq(landing, manifestDir, ckptBase)
        .foreach(Scratch.deleteRecursively)
      spark.stop()
    }
  }
}
