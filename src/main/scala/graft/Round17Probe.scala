package graft

import org.apache.spark.sql.functions._

/** Dev probe: the two round-17 snapshot-table scale claims, measured.
  *
  * SKEW — `writePartitioned` salts any partition whose merged rows
  * exceed `maxRowsPerTask` across ceil(n/cap) explicit write tasks.
  * The probe merges the SAME skewed delta (one partition holding 80%
  * of the rows) twice: once with the cap disabled (the pre-round-17
  * one-task-per-partition shape — the hot partition is one straggler
  * task) and once at a cap that splits it 8 ways. The wall gap is the
  * straggler cost the salt removes; at 100× (a multi-GB hot month)
  * the unsalted shape is also an executor-memory hazard, not just a
  * latency one.
  *
  * SKIP — `readRange` prunes manifest entries by their recorded key
  * min/max before listing a single file. The probe builds a table
  * whose partitions are key-correlated (bucket = k / span — the
  * layout skipping exists for), then times a 2-bucket range query
  * through the full scan+filter path (opens all dirs; parquet
  * row-group stats still prune ROWS, but every footer is read) vs
  * readRange (opens only the overlapping dirs). The gap is pure
  * listing/footer/scheduling overhead — the cost class that grows
  * with partition COUNT, which is exactly what explodes at 100 TB.
  *
  * usage: Round17Probe [nRows] [nParts]
  */
object Round17Probe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val nRows = if (args.length > 0) args(0).toLong else 10000000L
    val nParts = if (args.length > 1) args(1).toInt else 200
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
    val root = Scratch.createTempDir("r17probe")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    try {
      // ---- SKEW: 80% of rows in partition 0, the rest spread evenly
      val skewed = spark.range(nRows).select(col("id").as("k"),
        (col("id") % 1000).as("v"),
        when(col("id") % 5 =!= 0,
          lit(0)).otherwise(pmod(col("id") / 5, lit(nParts - 1)) + 1)
          .cast("int").as("p"))
      val hotRows = nRows * 4 / 5
      timed(s"skew-merge UNSALTED hot=$hotRows rows 1 task") {
        SnapshotTable.merge(spark, s"$root/skew_off", skewed, "k", "v",
          Seq("p"), Some(1L), maxRowsPerTask = Long.MaxValue)
      }
      timed(s"skew-merge SALTED hot=$hotRows rows " +
          s"${(hotRows + hotRows / 8 - 1) / (hotRows / 8)} tasks") {
        SnapshotTable.merge(spark, s"$root/skew_on", skewed, "k", "v",
          Seq("p"), Some(1L), maxRowsPerTask = hotRows / 8)
      }
      val a = SnapshotTable.read(spark, s"$root/skew_off").count()
      val b = SnapshotTable.read(spark, s"$root/skew_on").count()
      println(s"PROBE skew rows unsalted=$a salted=$b (must be equal)")

      // ---- SKIP: key-correlated buckets, 2-of-nParts range query
      val span = nRows / nParts
      val tbl = s"$root/skip"
      val corr = spark.range(nRows).select(col("id").as("k"),
        (col("id") % 1000).as("v"),
        (col("id") / span).cast("int").as("p"))
      timed(s"skip-base rows=$nRows buckets=$nParts") {
        SnapshotTable.merge(spark, tbl, corr, "k", "v", Seq("p"), Some(1L))
      }
      val lo = span * 7 + span / 2
      val hi = lo + span // straddles 2 buckets
      // warm the listing once so both timed reads price the same cache
      SnapshotTable.read(spark, tbl).count()
      val full = timed(s"skip-OFF full scan+filter over $nParts dirs") {
        SnapshotTable.read(spark, tbl)
          .filter(col("k") >= lo && col("k") <= hi).count()
      }
      val pruned = timed("skip-ON readRange over " +
          SnapshotTable.pruneByKey(SnapshotTable.resolve(spark, tbl),
            "k", Some(lo), Some(hi)).entries.size + " dirs") {
        SnapshotTable.readRange(spark, tbl, "k", Some(lo), Some(hi)).count()
      }
      println(s"PROBE skip rows full=$full pruned=$pruned (must be equal)")

      // ---- CDF: O(changed partitions), not O(table) — diff after a
      // narrow merge reads only the unshared entries; after OPTIMIZE
      // (all entries fresh, zero shared) the same diff is the full
      // O(table) join, returning EMPTY because content is identical
      // 50k updates whose keys span 5 of the table's key-correlated
      // buckets (k = 5*id keeps k/span in 0..4)
      val cdfDelta = spark.range(50000L).select(
        (col("id") * 5).as("k"), (col("id") % 1000 + 7).as("v"),
        ((col("id") * 5) / span).cast("int").as("p"))
      SnapshotTable.merge(spark, tbl, cdfDelta, "k", "v", Seq("p"),
        Some(2L))
      val (fe, te) = SnapshotTable.cdfEntries(
        SnapshotTable.resolve(spark, tbl, Some(1L)),
        SnapshotTable.resolve(spark, tbl, Some(2L)))
      val nNarrow = timed(s"cdf-NARROW v1→v2 entries=${fe.size}+${te.size}" +
          s" of $nParts") {
        SnapshotTable.changesBetween(spark, tbl, "k", 1L, 2L).count()
      }
      SnapshotTable.optimize(spark, tbl, Seq("p"))
      val nFull = timed(s"cdf-FULL v2→v3 zero shared entries " +
          s"(content-identical rewrite)") {
        SnapshotTable.changesBetween(spark, tbl, "k", 2L, 3L).count()
      }
      println(s"PROBE cdf narrow_changes=$nNarrow full_changes=$nFull " +
        "(full must be 0)")

      // ---- FSKIP: per-file bounds after OPTIMIZE ZORDER — a tight
      // range inside one bucket opens a fraction of the bucket's
      // files (footer-harvested manifest file stats), on top of the
      // dir-level prune
      timed(s"fskip-optimize zorder(k) ~4 files/bucket") {
        SnapshotTable.optimize(spark, tbl, Seq("p"),
          maxRowsPerTask = span / 4, zorderBy = Seq("k"))
      }
      val snapZ = SnapshotTable.resolve(spark, tbl)
      val nFilesTotal = snapZ.entries.map(_.fileStats.size).sum
      val tLo = span * 7 + 10
      val tHi = tLo + span / 10
      val pz = SnapshotTable.prunedReadPaths(tbl, snapZ, "k",
        Some(tLo), Some(tHi))
      val nTight = timed(s"fskip-ON tight range opens ${pz.size} of " +
          s"$nFilesTotal files (dir-level alone would open ~4)") {
        SnapshotTable.readRange(spark, tbl, "k", Some(tLo), Some(tHi))
          .count()
      }
      println(s"PROBE fskip rows=$nTight files_opened=${pz.size} " +
        s"files_total=$nFilesTotal")
    } finally {
      Scratch.deleteRecursively(root)
      spark.stop()
    }
  }
}
