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
