package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * marker-enabled deployment loses in-flight invisibility.
  *
  * This object also owns the fragment stores' LSM compaction
  * protocol, SIZE-TIERED (O'Neil et al. 1996 LSM-tree; the
  * RocksDB-universal-compaction shape): a store holds up to
  * `maxRuns` sorted RUNS (`run=<rid>` dirs) plus the un-folded
  * `batch=<n>` tail; each fold writes the tail as a new run and
  * absorbs existing runs SMALLEST-FIRST only while they are within
  * `sizeRatio` of the bytes being written anyway — so per-fold write
  * cost tracks the FOLDED bytes, not store size, and cumulative
  * compaction I/O over a long-lived stream is O(N log N) instead of
  * the single-level fold's O(N²/period). The live run set rides a
  * VERSIONED MANIFEST (`_runs.<ver>`, max version wins, written
  * atomically via tmp+rename AFTER the new run commits and BEFORE
  * any folded input is deleted) — every crash window leaves a
  * correct view: manifest missing → the previous manifest's inputs
  * are all still present; manifest present → the runs it names are
  * committed. Cleanup is GRACE-DEFERRED: a fold deletes only inputs
  * that were already dead in the PREVIOUS manifest, so a concurrent
  * monitor whose lazy scan planned against the pre-fold roots keeps
  * its files for at least one full maintenance interval (the
  * concurrent-monitor contract `readFingerprints`/`readIndex`
  * document; monitors slower than a whole fold interval are outside
  * it). A maintenance call that finds NOTHING to fold still runs the
  * cleanup, so an interrupted fold's garbage — or a retired stream's
  * grace leftovers — is reclaimed on the next call rather than
  * lingering forever. */
object Commits {

  /** One live sorted run of a tiered store: its directory name under
    * the store root (`run=<rid>`, or `compact=<upTo>` for a store
    * folded by the pre-tiered single-level code) and its byte size —
    * recorded in the manifest so tiering decisions never re-list
    * run contents. */
  final case class RunInfo(name: String, bytes: Long)

  /** The persisted state of a tiered store: `ver` the manifest
    * version (max wins), `upTo` the batch id up to (and including)
    * which fragments have been folded into runs (None = nothing
    * folded yet), `next` the next run id to allocate (monotonic —
    * a crashed fold's orphan run dir is either overwritten by the
    * reused id or swept as not-live), `runs` the live run set.
    * `persisted` is false for states synthesized from a legacy
    * `_compacted.<upTo>` marker or an empty store — cleanup must
    * never treat a synthesized view as licence to delete the legacy
    * marker it was synthesized FROM. */
  final case class RunManifest(ver: Long, upTo: Option[Long],
      next: Long, runs: Seq[RunInfo], persisted: Boolean)

  private def batchId(p: Path): Long =
    p.getName.stripPrefix("batch=").toLong

  private def storeFs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive byte size of one run/fragment dir — used only at fold
    * time on the handful of dirs being folded (runs carry their
    * bytes in the manifest; the content-summary walk is never run
    * over the whole store). */
  private def dirBytes(fs: FileSystem, p: Path): Long =
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L

  /** The current manifest of a possibly-tiered store: the
    * max-version `_runs.<ver>` file when one exists; synthesized
    * from the legacy single-level `_compacted.<upTo>` marker (the
    * base as one run) when only that exists; the empty state
    * otherwise. `sizeLegacy` controls whether the legacy synthesis
    * pays the one content-summary walk for the base's bytes — reads
    * don't need sizes, only the fold does. */
  def runManifest(spark: SparkSession, dir: String,
      sizeLegacy: Boolean = false): RunManifest = {
    val root = new Path(dir)
    val fs = storeFs(spark, dir)
    if (!fs.exists(root))
      return RunManifest(-1L, None, 0L, Nil, persisted = false)
    val names = fs.listStatus(root).toSeq.map(_.getPath.getName)
    val vers = names.filter(_.startsWith("_runs."))
      .flatMap(_.stripPrefix("_runs.").toLongOption)
    if (vers.nonEmpty) {
      val ver = vers.max
      val in = fs.open(new Path(root, s"_runs.$ver"))
      val text =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
          new String(bos.toByteArray, "UTF-8")
        } finally in.close()
      // loud on a torn manifest: the tmp+rename write makes one
      // impossible in normal operation, so a parse failure is real
      // corruption and silently treating it as empty would re-read
      // folded-away fragments as if never folded
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
      def one(k: String): Option[String] = {
        val vs = lines.filter(_.startsWith(k + "=")).map(_.drop(k.length + 1))
        require(vs.length <= 1, s"corrupt run manifest _runs.$ver: " +
          s"${vs.length} '$k=' lines")
        vs.headOption
      }
      val next = one("next").flatMap(_.toLongOption).getOrElse(
        throw new IllegalStateException(
          s"corrupt run manifest _runs.$ver in $dir: missing next="))
      val upTo = one("upTo").map(v => v.toLongOption.getOrElse(
        throw new IllegalStateException(
          s"corrupt run manifest _runs.$ver in $dir: bad upTo=$v")))
      // a run may be a `run=<rid>` dir or a surviving legacy
      // `compact=<upTo>` base carried over from the single-level code
      val runs = lines.filter(l =>
        l.startsWith("run=") || l.startsWith("compact=")).map { l =>
        val i = l.lastIndexOf(':')
        require(i > 0, s"corrupt run line '$l' in _runs.$ver")
        RunInfo(l.take(i), l.drop(i + 1).toLong)
      }.toSeq
      RunManifest(ver, upTo, next, runs, persisted = true)
    } else {
      names.filter(_.startsWith("_compacted."))
        .flatMap(_.stripPrefix("_compacted.").toLongOption)
        .maxOption match {
        case Some(u) =>
          val base = s"compact=$u"
          RunManifest(-1L, Some(u), 0L,
            Seq(RunInfo(base,
              if (sizeLegacy) dirBytes(fs, new Path(root, base)) else 0L)),
            persisted = false)
        case None => RunManifest(-1L, None, 0L, Nil, persisted = false)
      }
    }
  }

  /** Commit a manifest version: write to a tmp name, then rename —
    * the manifest is visible fully-written or not at all (the torn-
    * marker window an in-place create would leave). */
  private def writeRunManifest(spark: SparkSession, dir: String,
      m: RunManifest): Unit = {
    val fs = storeFs(spark, dir)
    val tmp = new Path(dir, s"_runs.${m.ver}.tmp")
    val dst = new Path(dir, s"_runs.${m.ver}")
    val out = fs.create(tmp, true)
    try {
      val body = (m.upTo.map(u => s"upTo=$u").toSeq ++
        Seq(s"next=${m.next}") ++
        m.runs.map(r => s"${r.name}:${r.bytes}")).mkString("\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    require(fs.rename(tmp, dst),
      s"failed to commit run manifest $dst — version collision?")
  }

  /** The readable roots of a possibly-compacted fragment store: the
    * live runs (from the manifest — or the legacy `compact=<upTo>`
    * base) plus the committed `batch=<n>` fragments NEWER than the
    * folded high-water mark. Folding is transparent to readers that
    * consume the whole store, and stays EXACT for aggregating stores
    * whose fold merges by an associative law (HLL register max,
    * count-min cell sum); what a fold does give up is the
    * point-in-time view BELOW the folded mark — a run mixes batches
    * and cannot be subset, so bounded reads there must refuse loudly
    * ([[foldedUpTo]]). Only wholesale-superseded SNAPSHOT stores
    * (PageRank ranks, component labels) are not foldable at all;
    * those take a RETENTION cut instead ([[retainNewest]]).
    *
    * Readers that pair a bounded-read refusal check with the roots
    * MUST use the manifest-taking overload with ONE
    * [[runManifest]] read — calling [[foldedUpTo]] and then this
    * method reads the manifest twice, and a concurrent fold
    * committing between the reads advances the mark past the bound
    * the check approved, silently including future batches. */
  def fragmentRoots(spark: SparkSession, dir: String): Seq[String] =
    fragmentRoots(spark, dir, runManifest(spark, dir))

  /** [[fragmentRoots]] against a caller-held manifest snapshot — the
    * check-then-read TOCTOU fix: the refusal check and the roots see
    * the SAME `upTo`/run set. The tail listing races only against
    * grace-deferred cleanup, which never deletes a fragment the
    * snapshot's `upTo` still includes. */
  def fragmentRoots(spark: SparkSession, dir: String,
      m: RunManifest): Seq[String] = {
    val tail = committedBatchDirs(spark, dir)
      .filter(p => m.upTo.forall(batchId(p) > _))
    m.runs.map(r => s"$dir/${r.name}") ++ tail.map(_.toString)
  }

  /** The folded high-water mark — fragments with ids ≤ this are
    * folded into runs and excluded from the tail by every reader. */
  def foldedUpTo(spark: SparkSession, dir: String): Option[Long] =
    runManifest(spark, dir).upTo

  /** The ONE safe form of a BOUNDED read over a foldable store: the
    * readable roots restricted to fragments with id ≤ `upToBatch`,
    * refusing loudly (message built by `refuse(foldedUpTo,
    * requestedBound)`) when the bound falls below the folded mark — a
    * run mixes batches and cannot be subset. Check and roots ride ONE
    * manifest read, so a concurrent fold committing mid-call can
    * never slip future batches past an already-approved bound (the
    * TOCTOU every bounded reader used to hand-roll — and that a new
    * reader copying from an unfixed template would reintroduce). */
  def boundedRoots(spark: SparkSession, dir: String,
      upToBatch: Option[Long],
      refuse: (Long, Long) => String): Seq[String] = {
    val m = runManifest(spark, dir)
    m.upTo.foreach(u =>
      upToBatch.foreach(b => require(b >= u, refuse(u, b))))
    fragmentRoots(spark, dir, m).filter { r =>
      val n = r.split('/').last
      !n.startsWith("batch=") ||
        upToBatch.forall(n.stripPrefix("batch=").toLong <= _)
    }
  }

  /** The ONE safe form of a retention-floored SNAPSHOT read: the
    * newest `batch=<n>` snapshot with id < `beforeBatch` (None = the
    * newest of all), refusing loudly when the bound falls at or below
    * a retention floor ([[retainNewest]]'s `_retained.<floor>`
    * marker). The floor is re-checked AFTER the listing — a
    * concurrent cut racing the list must trip the loud floor, never
    * return a silent None cold start — and a listed-then-deleted
    * snapshot retries against the strictly newer state (floors are
    * monotonic, so no livelock). `noun` names the store in the
    * refusal message. */
  def readNewestSnapshot(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      beforeBatch: Option[Long], noun: String)
      : Option[org.apache.spark.sql.DataFrame] = {
    val path = new Path(dir)
    val fs = storeFs(spark, dir)
    if (!fs.exists(path)) return None
    def floorCheck(): Unit =
      retainedFloor(spark, dir).foreach(f =>
        beforeBatch.foreach(b => require(b > f,
          s"$noun before batch $b were cut by retention " +
            s"(floor $f) — point-in-time read refused")))
    floorCheck()
    val ids = fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") =>
        s.stripPrefix("batch=").toLong }
      .filter(id => beforeBatch.forall(id < _))
    if (ids.isEmpty) {
      floorCheck()
      None
    } else {
      val chosen = new Path(path, s"batch=${ids.max}")
      if (fs.exists(chosen))
        Some(spark.read.schema(schema).parquet(chosen.toString))
      else {
        floorCheck()
        readNewestSnapshot(spark, dir, schema, beforeBatch, noun)
      }
    }
  }

  /** SIZE-TIERED fold of a fragment store — the generic protocol;
    * `rewrite(inputs, outDir)` owns the data layout (flat repartition
    * for row stores, partitionBy+sort for the banded media store).
    *
    * Per call: the committed tail (fragments newer than the folded
    * mark) becomes one new run; existing runs are absorbed
    * smallest-first while `run.bytes <= mergedBytes * sizeRatio`
    * (absorbing at most multiplies the write we were doing anyway —
    * the universal-compaction criterion, which leaves surviving runs
    * geometrically spaced, O(log store/batch) of them), then further
    * while the live run count would exceed `maxRuns`. With
    * `maxRuns = 1` every fold merges everything — the single-level
    * behavior, for stores small enough not to care.
    *
    * Crash-window discipline: new run written (Overwrite — a crashed
    * attempt's orphan is simply overwritten when its id is reused,
    * or swept as not-live) → manifest committed via tmp+rename →
    * grace cleanup of inputs dead since the PREVIOUS manifest. A
    * call with an empty tail runs just the cleanup, so interrupted
    * folds and retired streams converge to a garbage-free store on
    * the next maintenance call instead of never. */
  def tieredCompact(spark: SparkSession, dir: String,
      rewrite: (Seq[String], String) => Unit, maxRuns: Int = 4,
      sizeRatio: Double = 2.0): Unit = {
    require(maxRuns >= 1, s"maxRuns must be >= 1, got $maxRuns")
    val fs = storeFs(spark, dir)
    val prev = runManifest(spark, dir, sizeLegacy = true)
    val tail = committedBatchDirs(spark, dir)
      .filter(p => prev.upTo.forall(batchId(p) > _))
    if (tail.isEmpty) {
      if (prev.persisted) cleanup(spark, dir, prev)
      return
    }
    val newUpTo = (tail.map(batchId) ++ prev.upTo).max
    val tailBytes = math.max(1L, tail.map(p => dirBytes(fs, p)).sum)
    val sorted = prev.runs.sortBy(_.bytes)
    var mergedBytes = tailBytes
    var k = 0
    while (k < sorted.size && sorted(k).bytes <= mergedBytes * sizeRatio) {
      mergedBytes += sorted(k).bytes; k += 1
    }
    while (sorted.size - k + 1 > maxRuns && k < sorted.size) {
      mergedBytes += sorted(k).bytes; k += 1
    }
    val absorbed = sorted.take(k)
    val survivors = sorted.drop(k)
    val newName = s"run=${prev.next}"
    rewrite(tail.map(_.toString) ++ absorbed.map(r => s"$dir/${r.name}"),
      s"$dir/$newName")
    val newRun = RunInfo(newName, dirBytes(fs, new Path(dir, newName)))
    writeRunManifest(spark, dir, RunManifest(prev.ver + 1, Some(newUpTo),
      prev.next + 1, survivors :+ newRun, persisted = true))
    cleanup(spark, dir, prev)
  }

  /** Delete everything that was already DEAD as of manifest `m`:
    * fragments at or below its folded mark, run/compact dirs it does
    * not list (excluding run ids it had not allocated yet — those
    * belong to the fold that is committing right now), manifests
    * older than it, and — once any v2 manifest exists — the legacy
    * single-level markers it superseded. Called with the PREVIOUS
    * manifest at fold time (grace: this fold's own inputs stay one
    * more interval) and with the CURRENT manifest on an empty-tail
    * call (their grace has elapsed). */
  private def cleanup(spark: SparkSession, dir: String,
      m: RunManifest): Unit = {
    val root = new Path(dir)
    val fs = storeFs(spark, dir)
    if (!fs.exists(root)) return
    val live = m.runs.map(_.name).toSet
    val entries = fs.listStatus(root).toSeq
    val hasV2 = entries.exists(_.getPath.getName.startsWith("_runs."))
    entries.foreach { e =>
      val n = e.getPath.getName
      val stale =
        (n.startsWith("batch=") &&
          n.stripPrefix("batch=").toLongOption.exists(id =>
            m.upTo.exists(id <= _))) ||
        (n.startsWith("run=") && !live(n) &&
          n.stripPrefix("run=").toLongOption.exists(_ < m.next)) ||
        (n.startsWith("compact=") && !live(n)) ||
        (n.startsWith("_runs.") &&
          n.stripPrefix("_runs.").toLongOption.exists(_ < m.ver)) ||
        (n.startsWith("_compacted.") && hasV2)
      if (stale) fs.delete(e.getPath, true)
    }
  }

  /** Tiered LSM fold for a FLAT (un-partitioned) fragment store —
    * [[tieredCompact]] with the plain row layout. The partitioned
    * (banded) variant lives with its layout
    * ([[graft.streaming.MediaDedupMaintenance.compactUnifiedStore]]). */
  def compactFlatStore(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      outFiles: Int = 4, maxRuns: Int = 4,
      sizeRatio: Double = 2.0): Unit =
    tieredCompact(spark, dir, (inputs, out) =>
      spark.read.schema(schema).parquet(inputs: _*)
        .repartition(outFiles)
        .write.mode("overwrite").parquet(out),
      maxRuns, sizeRatio)

  /** RETENTION cut for SNAPSHOT/point-in-time stores — the complement
    * of folding for stores a fold would BREAK: complete-state
    * snapshot stores (graph edges, components) where old `batch=`
    * dirs are superseded wholesale, and register stores (HLL) whose
    * `upToBatch` point-in-time reads need every fragment within the
    * horizon. Keeps the newest `keep` committed fragments, deletes
    * the rest, and advances a versioned `_retained.<floor>` marker
    * (max wins, written BEFORE the deletes — the crash window leaves
    * the marker conservative, never data-less) so readers can refuse
    * loudly below the horizon ([[retainedFloor]]) instead of
    * returning silently-wrong partial state. */
  def retainNewest(spark: SparkSession, dir: String, keep: Int): Unit = {
    require(keep >= 1, s"retention must keep at least 1 snapshot, got $keep")
    val fs = storeFs(spark, dir)
    val committed = committedBatchDirs(spark, dir).sortBy(batchId)
    if (committed.size <= keep) return
    val victims = committed.dropRight(keep)
    val floor = batchId(committed(victims.size)) // oldest KEPT id
    val marker = new Path(dir, s"_retained.$floor")
    if (!fs.exists(marker)) {
      val out = fs.create(marker, false)
      try out.write(floor.toString.getBytes("UTF-8")) finally out.close()
    }
    victims.foreach(p => fs.delete(p, true))
    // older markers are now redundant (max wins) — sweep them
    fs.listStatus(new Path(dir)).foreach { e =>
      val n = e.getPath.getName
      if (n.startsWith("_retained.") &&
          n.stripPrefix("_retained.").toLongOption.exists(_ < floor))
        fs.delete(e.getPath, false)
    }
  }

  /** The oldest batch id retention has promised still exists — reads
    * at or above it are complete; a point-in-time read BELOW it must
    * refuse loudly (its fragments are gone). None = never cut. */
  def retainedFloor(spark: SparkSession, dir: String): Option[Long] = {
    val root = new Path(dir)
    val fs = storeFs(spark, dir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_retained."))
      .flatMap(_.stripPrefix("_retained.").toLongOption)
      .maxOption
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
