package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE definition of the maintenance-family commit-detection
  * rule (previously duplicated verbatim in [[HllMaintenance]] and
  * [[MediaDedupMaintenance]] — two copies of a subtle rule drift):
  * a `batch=<n>` fragment dir is COMMITTED when the `_SUCCESS` job
  * marker exists; when the deployment DISABLES job-commit markers
  * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`, common
  * on object stores — read off the LIVE Hadoop conf, so the rule
  * matches what the writer actually did), committed instead means
  * the dir holds finalized `part-*` data files and no `_temporary`
  * staging dir (the committer only renames part files out of
  * `_temporary` at commit, so their visibility IS the commit signal
  * there). Without the conditional fallback a marker-less deployment
  * silently merges ZERO fragments; with an UNconditional fallback a
  * marker-enabled deployment loses in-flight invisibility. */
object Commits {

  /** The compaction high-water mark of a fragment store — the batch
    * id up to (and including) which fragments have been FOLDED into
    * the store's `compact=<upTo>` base dir. Markers are VERSIONED
    * files (`_compacted.<upTo>`, max wins) created atomically AFTER
    * the compacted base commits and BEFORE any folded fragment is
    * deleted — so every crash window leaves a correct view: marker
    * missing → the un-folded fragments are still all present; marker
    * present → the compacted base it names is committed. A
    * rename-over-in-place single marker was rejected: its
    * delete-then-rename gap can lose the marker AFTER folded
    * fragments were deleted, which un-commits data. */
  def compactedUpTo(spark: SparkSession, dir: String): Option[Long] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_compacted."))
      .flatMap(_.stripPrefix("_compacted.").toLongOption)
      .maxOption
  }

  /** Commit a compaction at `upTo`: atomically create the versioned
    * marker (the compacted base `compact=<upTo>` must already be
    * fully written). Older markers are left behind — max wins, and
    * the next compaction's cleanup may remove them. */
  def writeCompactionMarker(spark: SparkSession, dir: String,
      upTo: Long): Unit = {
    val marker = new Path(dir, s"_compacted.$upTo")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, false)
    try out.write(upTo.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The readable roots of a possibly-compacted fragment store: the
    * `compact=<upTo>` base (when a marker commits one) plus the
    * committed `batch=<n>` fragments NEWER than it. The contract for
    * stores whose readers always consume EVERYTHING — point-in-time
    * monitors that read `upToBatch` views (e.g. the HLL register
    * store) must NOT be compacted, since a fold is irreversible. */
  def fragmentRoots(spark: SparkSession, dir: String): Seq[String] = {
    val upTo = compactedUpTo(spark, dir)
    val tail = committedBatchDirs(spark, dir)
      .filter(p => upTo.forall(u =>
        p.getName.stripPrefix("batch=").toLong > u))
    upTo.map(u => s"$dir/compact=$u").toSeq ++ tail.map(_.toString)
  }

  /** Generic LSM fold for a FLAT (un-partitioned) fragment store:
    * rewrite the current roots into one `compact=<upTo>` base, commit
    * the versioned marker, then delete the folded inputs — the same
    * crash-window discipline as the banded media fold
    * ([[graft.streaming.MediaDedupMaintenance.compactUnifiedStore]],
    * which owns the partitioned variant). No-op when nothing is
    * newer than the current base. */
  def compactFlatStore(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      outFiles: Int = 4): Unit = {
    val prior = compactedUpTo(spark, dir)
    val tail = committedBatchDirs(spark, dir)
      .filter(p => prior.forall(u =>
        p.getName.stripPrefix("batch=").toLong > u))
    if (tail.isEmpty) return
    val upTo = tail.map(_.getName.stripPrefix("batch=").toLong).max
    val roots = prior.map(u => s"$dir/compact=$u").toSeq ++
      tail.map(_.toString)
    spark.read.schema(schema).parquet(roots: _*)
      .repartition(outFiles)
      .write.mode("overwrite").parquet(s"$dir/compact=$upTo")
    writeCompactionMarker(spark, dir, upTo)
    cleanupFolded(spark, dir, upTo)
  }

  /** Delete a fold's inputs AFTER its marker commit: fragments ≤
    * upTo, superseded bases, stale markers. The ONE definition shared
    * by the flat and the partitioned (media) folds. */
  def cleanupFolded(spark: SparkSession, dir: String, upTo: Long): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).foreach { e =>
      val n = e.getPath.getName
      val stale =
        (n.startsWith("batch=") &&
          n.stripPrefix("batch=").toLongOption.exists(_ <= upTo)) ||
        (n.startsWith("compact=") &&
          n.stripPrefix("compact=").toLongOption.exists(_ < upTo)) ||
        (n.startsWith("_compacted.") &&
          n.stripPrefix("_compacted.").toLongOption.exists(_ < upTo))
      if (stale) fs.delete(e.getPath, true)
    }
  }

  /** Committed `batch=<n>` fragment dirs under `dir`, optionally
    * bounded by `upToBatch` (None = everything). Non-`batch=<n>`
    * names — including non-numeric ids — are skipped, not thrown on.
    * Empty when `dir` does not exist yet (pre-first-batch reads). */
  def committedBatchDirs(spark: SparkSession, dir: String,
      upToBatch: Option[Long] = None): Seq[Path] = {
    val path = new Path(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(hconf)
    val markersOn = hconf.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
    def committed(p: Path): Boolean =
      if (markersOn) fs.exists(new Path(p, "_SUCCESS"))
      else {
        // fragments may be PARTITIONED (kind=/band=/ subdirs — the
        // banded unified store), so finalized part files can live
        // one or two levels down; a top-level-only check would make
        // a marker-less deployment silently merge ZERO banded
        // fragments. Recurse shallowly: any finalized part-* file
        // beneath commits, any _temporary staging dir anywhere
        // un-commits (the committer renames out of it at commit).
        def scan(dir: Path, depth: Int): (Boolean, Boolean) = {
          val es = fs.listStatus(dir).toSeq
          var part = es.exists(e =>
            e.isFile && e.getPath.getName.startsWith("part-"))
          var temp = es.exists(_.getPath.getName == "_temporary")
          if (depth > 0)
            es.filter(e => e.isDirectory &&
                e.getPath.getName != "_temporary")
              .foreach { d =>
                val (p2, t2) = scan(d.getPath, depth - 1)
                part ||= p2; temp ||= t2
              }
          (part, temp)
        }
        val (part, temp) = scan(p, depth = 3)
        part && !temp
      }
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") &&
        p.getName.stripPrefix("batch=").toLongOption
          .exists(id => upToBatch.forall(id <= _)) &&
        committed(p))
  }
}
