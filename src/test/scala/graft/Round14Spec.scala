package graft

import graft.streaming.{AnnIndexMaintenance, Commits, ComponentMaintenance,
  GraphMaintenance, HllMaintenance, SketchMaintenance, SuffixMaintenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14: SIZE-TIERED LSM compaction (per-fold cost tracks folded
  * bytes, not store size; grace-deferred cleanup; crash-window
  * manifests) and its rollout to every fragment store — suffix class
  * indexes + spans, ANN cell index, graph edge log, HLL/count-min
  * aggregating folds — plus retention cuts with loud floors for the
  * snapshot stores a fold would break. */
class Round14Spec extends SparkSpec {

  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def landBatch(dir: String, id: Long, rows: Long): Unit =
    spark.range(rows)
      .select((col("id") + id * 1000000L).as("k"),
        (col("id") * 7).as("v"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/batch=$id")

  private def storeContent(dir: String): Map[Long, Long] =
    spark.read.schema(rowSchema)
      .parquet(Commits.fragmentRoots(spark, dir): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("tiered fold: a small tail never rewrites the big run — " +
      "per-fold cost tracks folded bytes, run count stays bounded, " +
      "content is invariant") {
    val dir = tmpDir("tiered")
    (0L until 8L).foreach(i => landBatch(dir, i, 5000L))
    Commits.compactFlatStore(spark, dir, rowSchema)
    val m1 = Commits.runManifest(spark, dir)
    assert(m1.runs.size == 1 && m1.upTo.contains(7L),
      s"first fold must merge the whole tail into one run, got $m1")
    val bigRun = m1.runs.head
    val before = storeContent(dir)
    // ten small batches, folding each time: the big run must survive
    // UNTOUCHED (its manifest entry carries the same name and bytes —
    // it was never rewritten), small runs cascade among themselves
    (8L until 18L).foreach { i =>
      landBatch(dir, i, 50L)
      Commits.compactFlatStore(spark, dir, rowSchema)
      val m = Commits.runManifest(spark, dir)
      assert(m.runs.size <= 4,
        s"run count exceeded maxRuns after batch $i: $m")
      assert(m.runs.exists(r =>
        r.name == bigRun.name && r.bytes == bigRun.bytes),
        s"small-tail fold rewrote the big run at batch $i: $m — the " +
          "single-level O(store) write amplification is back")
    }
    assert(storeContent(dir).size == before.size + 10 * 50,
      "tiered folding lost or duplicated rows")
  }

  test("tiered fold crash window: deleting the newest manifest " +
      "restores the previous view exactly (grace kept its inputs); " +
      "re-folding converges") {
    val dir = tmpDir("crashwin")
    (0L until 4L).foreach(i => landBatch(dir, i, 300L))
    Commits.compactFlatStore(spark, dir, rowSchema)
    (4L until 6L).foreach(i => landBatch(dir, i, 300L))
    val preFold = storeContent(dir)
    Commits.compactFlatStore(spark, dir, rowSchema)
    val m2 = Commits.runManifest(spark, dir)
    assert(m2.ver == 1L, s"expected second manifest version, got $m2")
    val folded = storeContent(dir)
    assert(folded == preFold, "fold changed the logical content")
    // simulate a crash that loses the second fold's manifest commit:
    // the previous manifest's inputs are all still present (cleanup
    // is grace-deferred), so the view must be EXACTLY the pre-fold one
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "_runs.1"), false))
    assert(storeContent(dir) == preFold,
      "crash window between run write and manifest commit is not safe")
    // and the next fold re-runs the lost one and converges
    Commits.compactFlatStore(spark, dir, rowSchema)
    assert(storeContent(dir) == preFold,
      "re-fold after manifest loss diverged")
    assert(Commits.runManifest(spark, dir).upTo.contains(5L))
  }

  test("grace cleanup: folded inputs survive exactly one maintenance " +
      "interval, then an empty-tail call reclaims them") {
    val dir = tmpDir("grace")
    (0L until 3L).foreach(i => landBatch(dir, i, 100L))
    Commits.compactFlatStore(spark, dir, rowSchema)
    val names1 = new java.io.File(dir).list().toSet
    assert((0L until 3L).forall(i => names1.contains(s"batch=$i")),
      s"fold must grace-keep its inputs one interval, got $names1")
    // empty-tail maintenance call: grace has elapsed, garbage goes
    Commits.compactFlatStore(spark, dir, rowSchema)
    val names2 = new java.io.File(dir).list().toSet
    assert(!names2.exists(_.startsWith("batch=")),
      s"empty-tail call must reclaim grace-kept inputs, got $names2")
    assert(storeContent(dir).size == 300,
      "cleanup touched live data")
  }

  test("retention: retainNewest keeps the newest K snapshots, " +
      "advances the loud floor, never cuts below K") {
    val dir = tmpDir("retain")
    (0L until 6L).foreach(i => landBatch(dir, i, 10L))
    Commits.retainNewest(spark, dir, keep = 2)
    val names = new java.io.File(dir).list().toSet
    assert(names.contains("batch=4") && names.contains("batch=5") &&
      !names.contains("batch=0") && !names.contains("batch=3"),
      s"retention kept the wrong snapshots: $names")
    assert(Commits.retainedFloor(spark, dir).contains(4L))
    // idempotent / no-op when within budget
    Commits.retainNewest(spark, dir, keep = 2)
    assert(Commits.retainedFloor(spark, dir).contains(4L))
  }

  test("suffix store fold: folding every batch leaves spans and a " +
      "post-fold delta unchanged; stores end garbage-free after the " +
      "retire call") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
      .orderBy(length(col("text")).desc).limit(120)
    val landing = tmpDir("sfxland")
    docs.repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(landing)
    def run(compactEvery: Int, tag: String): (String, String, Set[String]) = {
      val idx = tmpDir(s"sfxidx$tag"); val spans = tmpDir(s"sfxsp$tag")
      val src = spark.readStream
        .schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
      SuffixMaintenance.start(src, "text", "doc_id", idx, spans,
        tmpDir(s"sfxck$tag"), compactEvery = compactEvery)
        .awaitTermination()
      (idx, spans, SuffixMaintenance.readSpans(spark, spans)
        .select(concat_ws("|", col("doc_id"), col("span_start"),
          col("span_end"))).collect().map(_.getString(0)).toSet)
    }
    val (_, _, plainSpans) = run(0, "off")
    val (foldedIdx, foldedSpansDir, foldedSpans) = run(1, "on")
    assert(foldedSpans == plainSpans,
      "suffix store folding changed the spans surface")
    // a post-fold batch still joins the folded indexes: a clone of an
    // already-landed (long) doc's text must produce removal spans
    // against the folded index — the whole clone duplicates
    val clone = docs.limit(1)
      .withColumn("doc_id", col("doc_id") + 7000000L)
    SuffixMaintenance.processBatch(clone, 900L, "text", "doc_id",
      foldedIdx, foldedSpansDir)
    assert(spark.read.parquet(s"$foldedSpansDir/batch=900")
      .filter(col("doc_id") >= 7000000L).count() >= 1,
      "post-fold clone found no spans against the folded index")
    // retire call; every store garbage-free, runs bounded
    SuffixMaintenance.compactStores(spark, foldedIdx, foldedSpansDir)
    SuffixMaintenance.compactStores(spark, foldedIdx, foldedSpansDir)
    Seq(s"$foldedIdx/r0", s"$foldedIdx/fin", foldedSpansDir).foreach { d =>
      val names = new java.io.File(d).list().toSeq
      assert(!names.exists(_.startsWith("batch=")) &&
        names.count(_.startsWith("run=")) <= 4,
        s"suffix store $d not folded clean: $names")
    }
  }

  test("ANN index fold: folding every batch leaves the probeable " +
      "index identical to the batch build; cell dirs survive inside " +
      "runs; probe results unchanged") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") < 300)
    val delta = emb.filter(col("vec_id") >= 300)
    // the Ext5Spec codebook convention: first 16 vectors as codewords
    val cb = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("_cb"),
        col("embedding").cast("array<double>").as("_cv"))
    val cents = Similarity.coarseCentroids(base, "vec_id", "embedding", 16)
    val indexDir = tmpDir("annfold")
    val landing = tmpDir("annfoldland")
    AnnIndexMaintenance.writeBase(base, "vec_id", "embedding", cents,
      cb, indexDir)
    delta.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    AnnIndexMaintenance.start(src, "vec_id", "embedding", cents, cb,
      indexDir, tmpDir("annfoldck"), compactEvery = 1)
      .awaitTermination()
    AnnIndexMaintenance.compactIndex(spark, indexDir) // retire
    val names = new java.io.File(indexDir).list().toSeq
    assert(!names.exists(_.startsWith("batch=")) &&
      names.count(_.startsWith("run=")) >= 1,
      s"ANN index not folded: $names")
    // cell= stays a partition level inside each run
    val run0 = names.filter(_.startsWith("run=")).head
    assert(new java.io.File(s"$indexDir/$run0").list()
      .exists(_.startsWith("cell=")),
      "fold lost the cell partition layout")
    val streamed = AnnIndexMaintenance.readIndex(spark, indexDir)
    val scratch = Similarity.ivfPqUpsertIndex(base.unionByName(delta),
      emb.filter(lit(false)), "vec_id", "embedding", cb)
    def keyed(df: DataFrame) = df.select(concat_ws("|", col("n_id"),
      col("cell").cast("long"), concat_ws(",", col("codes"))))
      .collect().map(_.getString(0)).toSet
    assert(keyed(streamed) == keyed(scratch),
      "folded streamed index diverged from the batch build")
    val probe = Similarity.ivfPqProbeIndex(
      emb.filter(col("vec_id") < 10), streamed, cents, cb,
      "vec_id", "embedding", k = 3, nProbe = 2)
    val direct = Similarity.ivfPqTopKWith(emb.filter(col("vec_id") < 10),
      emb, "vec_id", "embedding", k = 3, cb, nCells = 16, nProbe = 2)
    def pset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pset(probe) == pset(direct),
      "probe over the folded index diverged")
  }

  test("HLL register fold is EXACT for the principal read (max-merge " +
      "associativity) and refuses point-in-time reads below the " +
      "folded mark loudly") {
    val outA = tmpDir("hllplain"); val outB = tmpDir("hllfold")
    (0L until 5L).foreach { b =>
      val batch = spark.range(b * 200, (b + 1) * 200)
        .select((col("id") % 7).cast("string").as("key"),
          col("id"))
      HllMaintenance.writeFragment(batch, b, "key",
        xxhash64(col("id")), outA)
      HllMaintenance.writeFragment(batch, b, "key",
        xxhash64(col("id")), outB)
    }
    HllMaintenance.compactRegisters(spark, outB)
    def est(dir: String): Set[String] = {
      val df = HllMaintenance.mergedEstimate(spark, dir)
      df.select(concat_ws("|", df.columns.map(col).toIndexedSeq: _*))
        .collect().map(_.getString(0)).toSet
    }
    assert(est(outB) == est(outA) && est(outA).nonEmpty,
      "register fold changed the merged estimate")
    // reads at/above the folded mark stay exact; below refuses loudly
    assert(HllMaintenance.mergedRegisters(spark, outB,
      upToBatch = Some(4L)).count() > 0)
    val ex = intercept[IllegalArgumentException] {
      HllMaintenance.mergedRegisters(spark, outB, upToBatch = Some(2L))
        .count()
    }
    assert(ex.getMessage.contains("folded up to"),
      s"expected the loud folded-mark refusal, got: ${ex.getMessage}")
  }

  test("count-min cell fold is EXACT (sum-merge) and bounded; loud " +
      "below the folded mark") {
    val outA = tmpDir("cmplain"); val outB = tmpDir("cmfold")
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    (0L until 4L).foreach { b =>
      val batch = docs.filter(col("doc_id") % 4 === b)
      SketchMaintenance.writeFragment(batch, b, "text", outA)
      SketchMaintenance.writeFragment(batch, b, "text", outB)
    }
    SketchMaintenance.compactCells(spark, outB)
    def cells(dir: String): Map[(Int, Long), Long] =
      SketchMaintenance.mergedCells(spark, dir).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cells(outB) == cells(outA) && cells(outA).nonEmpty,
      "cell fold changed the merged sketch")
    val ex = intercept[IllegalArgumentException] {
      SketchMaintenance.mergedCells(spark, outB, upToBatch = Some(1L))
        .count()
    }
    assert(ex.getMessage.contains("folded up to"))
  }

  test("graph maintenance: edge-log fold + rank retention leave the " +
      "final ranks identical; historical reads refuse loudly") {
    val edges = (0L until 300L).map(i => (i % 40, (i * 7) % 40))
      .toDF("src", "dst")
    val landing = tmpDir("gfoldland")
    edges.repartitionByRange(3, col("src"))
      .write.mode("overwrite").parquet(landing)
    def run(fold: Boolean, tag: String): (String, String, Map[Long, Long]) = {
      val e = tmpDir(s"gfolde$tag"); val r = tmpDir(s"gfoldr$tag")
      val src = spark.readStream
        .schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
      GraphMaintenance.start(src, "src", "dst", e, r,
        tmpDir(s"gfoldck$tag"), refreshIters = 2,
        compactEvery = if (fold) 1 else 0,
        keepRanks = if (fold) 2 else 0)
        .awaitTermination()
      (e, r, GraphMaintenance.readRanks(spark, r).get.collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap)
    }
    val (_, _, plain) = run(fold = false, "off")
    val (foldedE, foldedR, folded) = run(fold = true, "on")
    assert(folded == plain && plain.nonEmpty,
      "edge fold + rank retention changed the rank table")
    // rank snapshots cut to the newest 2, floor advanced and loud
    val rnames = new java.io.File(foldedR).list().toSeq
    assert(rnames.count(_.startsWith("batch=")) <= 2,
      s"rank retention did not cut: $rnames")
    val floor = Commits.retainedFloor(spark, foldedR)
    assert(floor.nonEmpty)
    val ex = intercept[IllegalArgumentException] {
      GraphMaintenance.readRanks(spark, foldedR,
        beforeBatch = Some(floor.get))
    }
    assert(ex.getMessage.contains("retention"))
    // bounded edge read below the folded mark refuses loudly
    val exE = intercept[IllegalArgumentException] {
      GraphMaintenance.readEdges(spark, foldedE, upToBatch = Some(0L))
        .count()
    }
    assert(exE.getMessage.contains("folded up to"))
  }

  test("component maintenance retention: labels unchanged, stores " +
      "cut to the newest K, replay warm-start still present") {
    val edges = (0L until 200L).map(i => (i % 30, (i * 3) % 30))
      .toDF("src", "dst")
    val landing = tmpDir("cfoldland")
    edges.repartitionByRange(3, col("src"))
      .write.mode("overwrite").parquet(landing)
    def run(keep: Int, tag: String): (String, Map[Long, Long]) = {
      val e = tmpDir(s"crete$tag"); val l = tmpDir(s"cretl$tag")
      val src = spark.readStream
        .schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
      ComponentMaintenance.start(src, "src", "dst", e, l,
        tmpDir(s"cretck$tag"), keepState = keep)
        .awaitTermination()
      (l, ComponentMaintenance.readLabels(spark, l).get.collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap)
    }
    val (_, plain) = run(0, "off")
    val (cutL, cut) = run(2, "on")
    assert(cut == plain && plain.nonEmpty,
      "state retention changed the labeling")
    assert(new java.io.File(cutL).list()
      .count(_.startsWith("batch=")) <= 2,
      "label snapshots not cut")
  }
}
