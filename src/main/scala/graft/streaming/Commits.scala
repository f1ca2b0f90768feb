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
        val entries = fs.listStatus(p).toSeq
        entries.exists(e => e.isFile && e.getPath.getName.startsWith("part-")) &&
        !entries.exists(e => e.getPath.getName == "_temporary")
      }
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") &&
        p.getName.stripPrefix("batch=").toLongOption
          .exists(id => upToBatch.forall(id <= _)) &&
        committed(p))
  }
}
