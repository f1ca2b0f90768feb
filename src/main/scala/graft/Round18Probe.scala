package graft

import org.apache.spark.sql.functions._

/** Dev probe: the round-18 snapshot-table scale claims, measured.
  *
  * DV — [[graft.ops.SnapshotTable.deleteKeys]] commits a sidecar of
  * deleted keys and touches NO data partition, so a scattered point
  * delete costs O(delete keys); the tombstone path
  * ([[graft.ops.SnapshotTable.mergeCdc]] with op='D') pays a full
  * rewrite of every touched partition. The probe deletes the SAME
  * scattered key set (one key per partition — the worst case for
  * copy-on-write, the GDPR-erasure shape) both ways on identical
  * tables and reports the wall gap plus the read-side overhead the
  * sidecar costs (merge-on-read's price) before OPTIMIZE folds it.
  *
  * CHAIN — delta manifests + the `_head` pointer keep commit bytes
  * O(changed entries) and head resolution O(1)+O(chain) however many
  * versions and partitions accumulate. The probe drives commitManifest
  * directly (manifest text is a driver-side protocol — no Spark jobs
  * needed to measure it) through 1000 narrow commits over a
  * 400-entry table and reports: bytes of a delta vs a checkpoint
  * manifest, resolve(head) wall at v=100 vs v=1000 (flat = the claim),
  * and the listing cost the pointer replaces.
  *
  * usage: Round18Probe [nRows] [nParts] [nVersions]
  */
object Round18Probe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val nRows = if (args.length > 0) args(0).toLong else 5000000L
    val nParts = if (args.length > 1) args(1).toInt else 100
    val nVersions = if (args.length > 2) args(2).toInt else 1000
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.SnapshotTable
    import spark.implicits._
    val root = Scratch.createTempDir("r18probe")
    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label wall=$s%.2fs")
      (r, s)
    }
    try {
      // ---- DV vs tombstone rewrite: identical tables, same deletes.
      // 256-byte payloads so the touched-partition rewrite is BYTE-
      // bound (the 100-TB shape), not task-overhead-bound
      val base = spark.range(nRows).select(col("id").as("k"),
        rpad((col("id") % 997).cast("string"), 256, "x").as("v"),
        pmod(col("id"), lit(nParts)).cast("int").as("p"))
      SnapshotTable.merge(spark, s"$root/dv", base, "k", "v", Seq("p"),
        Some(1L))
      SnapshotTable.merge(spark, s"$root/cow", base, "k", "v", Seq("p"),
        Some(1L))
      // exactly one deleted key per partition (key k lives in
      // partition k mod nParts, so keys 0..nParts-1 hit every
      // partition once): every partition is "touched"
      val delKeys = (0L until nParts.toLong)
      timed(s"dv-delete ${delKeys.size} keys across $nParts parts " +
          "(sidecar, zero rewrites)") {
        SnapshotTable.deleteKeys(spark, s"$root/dv",
          delKeys.toDF("k"), "k", Some(2L))
      }
      timed(s"cdc-tombstone-delete same keys (rewrites ALL " +
          s"$nParts touched partitions)") {
        val feed = delKeys.map(k =>
          (k, "x", (k % nParts).toInt, 1L, "D"))
          .toDF("k", "v", "p", "seq", "op")
        SnapshotTable.mergeCdc(spark, s"$root/cow", feed, "k",
          Seq("seq"), "op", Seq("p"), Some(2L))
      }
      val (nDv, _) = timed("dv-read (merge-on-read anti-join)") {
        SnapshotTable.read(spark, s"$root/dv").count()
      }
      val (nCow, _) = timed("cow-read (plain scan)") {
        SnapshotTable.read(spark, s"$root/cow").count()
      }
      println(s"PROBE dv rows dv=$nDv cow=$nCow (must be equal)")
      timed("dv OPTIMIZE folds the sidecar away") {
        SnapshotTable.optimize(spark, s"$root/dv", Seq("p"))
      }
      val (nOpt, _) = timed("dv-read after fold (anti-join gone)") {
        SnapshotTable.read(spark, s"$root/dv").count()
      }
      println(s"PROBE dv rows after fold=$nOpt (must equal $nDv)")

      // ---- manifest chain: 1000 narrow commits over 400 entries,
      // driver-side protocol only
      val tdir = s"$root/chain/t"
      val entries0 = (0 until 400).map(i => SnapshotTable.Entry(
        s"v=1/__gp_p=$i", Map("k" -> ((s"${i * 1000}", s"${i * 1000 + 999}")))))
      SnapshotTable.commitManifest(spark, tdir, 1L, Some(1L), entries0,
        "k BIGINT,v STRING,p INT", Seq("p"), Seq("k"))
      var head = SnapshotTable.resolve(spark, tdir)
      val fs = new org.apache.hadoop.fs.Path(tdir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def bytesOf(v: Long): Long = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$tdir/_snap.$v")).getLen
      val (_, commitWall) = timed(s"chain ${nVersions} narrow commits " +
          "(1 of 400 entries changes each)") {
        (2 to nVersions).foreach { v =>
          val i = v % 400
          val updated = head.entries.map(e =>
            if (e.path.endsWith(s"__gp_p=$i"))
              SnapshotTable.Entry(s"v=$v/__gp_p=$i", e.stats)
            else e)
          SnapshotTable.commitManifest(spark, tdir, v.toLong,
            Some(v.toLong), updated, head.schemaDdl, head.partCols,
            head.statsKeys, base = Some(head))
          // track depth as the writer's guard decides it (a real
          // merge re-resolves; the probe avoids 1000 resolves so the
          // COMMIT timing stays pure) — cross-checked by re-resolving
          // every 50 commits
          head = head.copy(ver = v.toLong, entries = updated,
            depth =
              if (head.depth + 1 < SnapshotTable.ManifestCheckpointEvery)
                head.depth + 1
              else 0)
          if (v % 50 == 0) {
            val re = SnapshotTable.resolve(spark, tdir)
            assert(re.depth == head.depth &&
              re.entries.toSet == head.entries.toSet,
              s"probe depth tracking diverged at v=$v")
            head = re
          }
        }
      }
      println(f"PROBE chain commit avg=${commitWall / nVersions * 1000}%.2fms")
      val deltaBytes = (2 to nVersions).map(v => bytesOf(v.toLong))
      val fullBytes = bytesOf(1L)
      println(s"PROBE chain manifest bytes full=$fullBytes " +
        s"delta_median=${deltaBytes.sorted.apply(deltaBytes.size / 2)} " +
        s"delta_max=${deltaBytes.max}")
      def resolveWall(v: Long): Double = {
        val t0 = System.nanoTime()
        SnapshotTable.resolve(spark, tdir, Some(v))
        (System.nanoTime() - t0) / 1e9
      }
      // warm, then measure pinned resolves at both ends of history
      resolveWall(100L); resolveWall(nVersions.toLong)
      println(f"PROBE chain resolve v100=${resolveWall(100L) * 1000}%.2fms " +
        f"v$nVersions=${resolveWall(nVersions.toLong) * 1000}%.2fms (flat = claim)")
      val (_, headWall) = timed("chain resolve HEAD via _head pointer") {
        SnapshotTable.resolve(spark, tdir)
      }
      val (_, listWall) = timed(
        s"chain versions() listing ($nVersions manifests — the cost " +
          "the pointer replaces)") {
        SnapshotTable.versions(spark, tdir)
      }
      println(f"PROBE chain head_resolve=${headWall * 1000}%.2fms " +
        f"listing=${listWall * 1000}%.2fms")
    } finally {
      spark.stop()
    }
  }
}
