package graft

import graft.ext.{MediaFiles, Multimodal}
import graft.streaming.Commits
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15: TOCTOU closure in the maintenance read paths (one
  * manifest snapshot serves both the bounded-read refusal check and
  * the roots; retention floors re-checked after the listing) and the
  * (path, mtime_ms) manifest dedup key — a re-modified archive file
  * re-manifests as a new row instead of being suppressed forever. */
class Round15Spec extends SparkSpec {

  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def landBatch(dir: String, id: Long, rows: Long): Unit =
    spark.range(rows)
      .select((col("id") + id * 1000000L).as("k"),
        (col("id") * 7).as("v"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/batch=$id")

  test("fragmentRoots against a held manifest snapshot: check and " +
      "roots see ONE upTo — and a pre-fold snapshot still reads the " +
      "pre-fold view within the grace interval") {
    val dir = tmpDir("snaproots")
    (0L until 4L).foreach(i => landBatch(dir, i, 100L))
    val preFold = Commits.runManifest(spark, dir)
    assert(preFold.upTo.isEmpty && preFold.runs.isEmpty)
    val preView = Commits.fragmentRoots(spark, dir, preFold).toSet
    assert(preView.size == 4)
    // a fold commits "concurrently" — the monitor's held snapshot
    // must keep reading the SAME logical view (grace keeps its inputs)
    Commits.compactFlatStore(spark, dir, rowSchema)
    assert(Commits.fragmentRoots(spark, dir, preFold).toSet == preView,
      "a fold invalidated a concurrent monitor's pre-fold roots " +
        "within the grace interval")
    val rows = spark.read.schema(rowSchema)
      .parquet(Commits.fragmentRoots(spark, dir, preFold): _*).count()
    assert(rows == 400L, "pre-fold snapshot view lost rows")
    // the post-fold snapshot pairs its own upTo with its own runs:
    // new tail fragments land, and roots from the HELD post-fold
    // manifest include exactly the tail NEWER than ITS mark
    val m = Commits.runManifest(spark, dir)
    assert(m.upTo.contains(3L) && m.runs.size == 1)
    (4L until 6L).foreach(i => landBatch(dir, i, 100L))
    val roots = Commits.fragmentRoots(spark, dir, m)
    assert(roots.count(_.contains("batch=")) == 2 &&
      roots.count(_.contains("run=")) == 1,
      s"held-snapshot roots inconsistent with its upTo: $roots")
  }

  test("readRanks/readLabels floor discipline: loud at or below the " +
      "floor, served above it, None-with-re-check when nothing " +
      "qualifies") {
    val dir = tmpDir("floorranks")
    (0L until 6L).foreach(i => landBatch(dir, i, 10L))
    Commits.retainNewest(spark, dir, keep = 2) // keeps 4,5; floor 4
    // above the floor: served
    assert(graft.streaming.GraphMaintenance
      .readRanks(spark, dir, beforeBatch = Some(5L)).nonEmpty)
    // at the floor: loud (snapshots before 4 are gone)
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.GraphMaintenance
        .readRanks(spark, dir, beforeBatch = Some(4L))
    }
    assert(ex.getMessage.contains("retention"))
    // unbounded read with no snapshots at all (retired store whose
    // marker outlived its data) returns None only after the floor
    // re-check passes — an un-floored empty dir is a legal None
    val empty = tmpDir("floorempty")
    new java.io.File(empty).mkdirs()
    assert(graft.streaming.GraphMaintenance
      .readRanks(spark, empty, beforeBatch = Some(9L)).isEmpty)
    assert(graft.streaming.ComponentMaintenance
      .readLabels(spark, empty, beforeBatch = Some(9L)).isEmpty)
  }

  test("manifest payload read-ahead: order-preserving, byte-identical " +
      "to the serial fetch, loud with the ORIGINAL cause on a fetch " +
      "failure, empty-safe") {
    val rows = (0L until 97L).map(i => (i, s"p$i"))
    val serial = rows.map { case (id, p) => (id, s"bytes:$p") }
    val ahead = MediaFiles.prefetched(rows.iterator, 4)(
      p => s"bytes:$p").toSeq
    assert(ahead == serial,
      "read-ahead changed the fetch surface or its order")
    assert(MediaFiles.prefetched(
      Iterator.empty[(Long, String)], 4)(p => p).isEmpty)
    // a failing fetch must surface ITS exception (the reader's loud
    // bounds), not the ExecutionException wrapper
    val ex = intercept[IllegalArgumentException] {
      MediaFiles.prefetched(rows.iterator, 4) { p =>
        require(p != "p7", s"boom at $p"); p
      }.toSeq
    }
    assert(ex.getMessage.contains("boom at p7"))
    // streamManifest end-to-end still lands the same payload surface
    // (the q251 wiring, one batch): manifest -> prefetch-fetched
    // payloads == the files on disk
    val docs = (0L until 40L).toDF("doc_id")
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id")
    val files = tmpDir("pffiles"); val manifest = tmpDir("pfmanifest")
    MediaFiles.writeMediaFiles(media, files)
    MediaFiles.appendManifest(spark, files, manifest, manifestFiles = 2)
    val got = scala.collection.mutable.Map.empty[Long, Int]
    val q = MediaFiles.streamManifest(spark, manifest, 8)
      .writeStream.option("checkpointLocation", tmpDir("pfck"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          got(r.getLong(0)) = java.util.Arrays.hashCode(
            r.getAs[Array[Byte]](1))
        }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val want = media.select(col("media_id"), col("payload")).collect()
      .map(r => (r.getLong(0), java.util.Arrays.hashCode(
        r.getAs[Array[Byte]](1)))).toMap
    assert(got.toMap == want,
      "prefetched streamManifest payload surface diverged")
  }

  test("a re-modified archive file RE-MANIFESTS as a new row (path " +
      "kept, new mtime) — the path-only suppression that pinned the " +
      "stale version forever is gone; unchanged files stay " +
      "exactly-once") {
    val docs = (0L until 60L).toDF("doc_id")
    val base = 1767225600000L // 2026-01-01T00:00:00Z
    val media = Multimodal.syntheticMixedFrameGrouped(spark, docs,
      "doc_id").withColumn("mtime_ms", lit(base))
    val files = tmpDir("remodfiles")
    val manifest = tmpDir("remodmanifest")
    MediaFiles.writeMediaFiles(media, files)
    MediaFiles.appendManifest(spark, files, manifest, manifestFiles = 1)
    val total = media.count()
    assert(spark.read.parquet(manifest).count() == total)
    // one file is re-modified in place: same path, a later mtime
    val touched = media.filter(col("media_id") === 0)
      .withColumn("mtime_ms", lit(base + 7200000L))
    MediaFiles.writeMediaFiles(touched, files)
    MediaFiles.appendManifest(spark, files, manifest,
      watermarkIso = Some("2026-01-01T02:00:00"), manifestFiles = 1)
    val m = spark.read.parquet(manifest)
    assert(m.count() == total + 1,
      "the re-modified file must re-manifest exactly once")
    val versions = m.filter(col("media_id") === 0)
      .select(col("mtime_ms")).collect().map(_.getLong(0)).toSet
    assert(versions == Set(base, base + 7200000L),
      s"expected both versions of the re-modified file, got $versions")
    assert(m.select(col("path"), col("mtime_ms")).distinct().count() ==
      total + 1, "manifest rows must stay unique on (path, mtime)")
    // newest-wins CURRENT view is one max-per-path away
    val current = m.groupBy(col("path"))
      .agg(max(col("mtime_ms")).as("mtime_ms"))
    assert(current.count() == total)
    // a third append at the same watermark is a no-op: the inclusive
    // boundary re-surfaces the touched file, the (path, mtime) key
    // suppresses it
    MediaFiles.appendManifest(spark, files, manifest,
      watermarkIso = Some("2026-01-01T02:00:00"), manifestFiles = 1)
    assert(spark.read.parquet(manifest).count() == total + 1,
      "re-append at the boundary must suppress the re-listed version")
  }
}
