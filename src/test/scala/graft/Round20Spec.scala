package graft

import graft.ops.SnapshotTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-20 (optimization round 2): the footer-derived commit path.
  * writeAndCommit's merge/optimize flows no longer run a pre-write
  * profile aggregation over a localCheckpoint barrier — the manifest
  * (entry list, per-entry row counts, entry/file bounds, the null-key
  * census) derives from the WRITTEN FILES' parquet footers, so
  * manifest ≡ written bytes holds by construction instead of by
  * barrier. These specs pin exactly that property, plus the edges the
  * restructure moved: the estimate-driven salted layout, the
  * all-deleted empty commit, and the post-write null-key refusal's
  * unchanged external contract. */
class Round20Spec extends SparkSpec {

  import spark.implicits._

  private def fs(dir: String) = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** The determinism argument as a property (r19 verdict #6): for
    * every committed entry, the manifest's recorded row count and
    * per-column bounds must equal what a fresh read of the entry's
    * bytes recomputes. */
  private def assertManifestMatchesBytes(dir: String): Unit = {
    val snap = SnapshotTable.resolve(spark, dir)
    snap.entries.foreach { e =>
      val df = spark.read.parquet(s"$dir/data/${e.path}")
      assert(e.rows.contains(df.count()),
        s"entry ${e.path}: manifest rows ${e.rows} != bytes")
      e.stats.foreach { case (c, (mn, mx)) =>
        val r = df.agg(min(col(c)).cast("string"),
          max(col(c)).cast("string")).head()
        assert(r.getString(0) == mn && r.getString(1) == mx,
          s"entry ${e.path} column $c: manifest bounds ($mn,$mx) != " +
            s"bytes (${r.getString(0)},${r.getString(1)})")
      }
    }
  }

  test("manifest ≡ written bytes: merge, mergeCdc, optimize and a " +
      "multi-stats-column merge all commit entry rows/bounds equal " +
      "to what their written files recompute") {
    val dir = tmpDir("m20bytes") + "/t"
    val base = (1L to 400L).map(k => (k, s"v$k", (k % 5).toInt))
      .toDF("k", "v", "p")
    SnapshotTable.merge(spark, dir, base, "k", "v", Seq("p"), Some(1L))
    assertManifestMatchesBytes(dir)
    // CDC: delete a slice, update another
    val feed = (1L to 400L by 7L).map(k =>
        (k, s"u$k", (k % 5).toInt, 2L, if (k % 3 == 0) "D" else "U"))
      .toDF("k", "v", "p", "seq", "op")
    SnapshotTable.mergeCdc(spark, dir, feed, "k", Seq("seq"), "op",
      Seq("p"), Some(2L))
    assertManifestMatchesBytes(dir)
    SnapshotTable.optimize(spark, dir, Seq("p"))
    assertManifestMatchesBytes(dir)
    // extra stats column (string) rides entry AND file bounds
    val dir2 = tmpDir("m20bytes2") + "/t"
    val wide = (1L to 300L).map(k => (k, f"s$k%04d", (k % 3).toInt))
      .toDF("k", "s", "p")
    SnapshotTable.merge(spark, dir2, wide, "k", "s", Seq("p"), Some(1L),
      statsCols = Seq("s"))
    assertManifestMatchesBytes(dir2)
    val snap2 = SnapshotTable.resolve(spark, dir2)
    assert(snap2.entries.forall(e => e.stats.contains("s") &&
      e.stats.contains("k") && e.fileStats.nonEmpty),
      "multi-column entry and file bounds must survive the " +
        "footer-derived commit")
  }

  test("estimate-driven salting still bounds tasks and files: a " +
      "maxRowsPerTask below the hot partition's size splits it, " +
      "content and manifest stay exact") {
    val dir = tmpDir("m20salt") + "/t"
    // one hot partition (600 rows), one cold (60)
    val df = ((1L to 600L).map(k => (k, s"v$k", 0)) ++
      (601L to 660L).map(k => (k, s"v$k", 1))).toDF("k", "v", "p")
    SnapshotTable.merge(spark, dir, df, "k", "v", Seq("p"), Some(1L),
      maxRowsPerTask = 100L)
    val snap = SnapshotTable.resolve(spark, dir)
    val hot = snap.entries.find(_.path.endsWith("__gp_p=0")).get
    assert(hot.rows.contains(600L))
    val hotFiles = fs(dir).listStatus(
      new Path(s"$dir/data/${hot.path}"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(hotFiles > 1,
      s"hot partition must split across tasks/files, got $hotFiles")
    assertManifestMatchesBytes(dir)
    assert(SnapshotTable.read(spark, dir).count() == 660L)
    // a full-overlap re-merge doubles the estimate but never the
    // content: bounds and rows stay exact, files stay bounded
    SnapshotTable.merge(spark, dir,
      df.withColumn("v", concat(lit("w"), col("k"))), "k", "v",
      Seq("p"), Some(2L), maxRowsPerTask = 100L)
    assertManifestMatchesBytes(dir)
    assert(SnapshotTable.read(spark, dir).count() == 660L)
  }

  test("a CDC feed that deletes every row of a touched partition " +
      "commits an entry list without it and leaves no staged husk") {
    val dir = tmpDir("m20empty") + "/t"
    SnapshotTable.merge(spark, dir,
      Seq((1L, "a", 1), (2L, "b", 2)).toDF("k", "v", "p"),
      "k", "v", Seq("p"), Some(1L))
    // delete the only row of p=1
    SnapshotTable.mergeCdc(spark, dir,
      Seq((1L, "a", 1, 1L, "D")).toDF("k", "v", "p", "seq", "op"),
      "k", Seq("seq"), "op", Seq("p"), Some(2L))
    val snap = SnapshotTable.resolve(spark, dir)
    assert(snap.ver == 2L)
    assert(snap.entries.map(e =>
      SnapshotTable.partitionValues(e)("p")) == Seq("2"))
    // the empty staged v=2 dir was reclaimed eagerly
    assert(!fs(dir).exists(new Path(s"$dir/data/v=2")),
      "an all-deleted commit must not leave an empty staged dir")
    assertManifestMatchesBytes(dir)
  }

  test("post-write null-key refusal keeps the external contract: " +
      "version unburned, content untouched, no manifest; the staged " +
      "attempt is unreferenced garbage the sweeps reclaim") {
    val dir = tmpDir("m20null") + "/t"
    SnapshotTable.merge(spark, dir, Seq((1L, "a", 1)).toDF("k", "v", "p"),
      "k", "v", Seq("p"), Some(1L))
    val bad = Seq((Some(2L), "b", 1), (None, "oops", 1))
      .toDF("k", "v", "p")
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, dir, bad, "k", "v", Seq("p"), Some(2L))
    }
    assert(ex.getMessage.contains("is null on 1 row"))
    assert(SnapshotTable.versions(spark, dir) == Seq(1L))
    assert(SnapshotTable.read(spark, dir).count() == 1L)
    // no in-flight marker left behind (the finally removed it)
    assert(!fs(dir).listStatus(new Path(dir))
      .exists(_.getPath.getName.startsWith("_inflight.")),
      "a refused commit must not leave its in-flight marker")
  }
}
