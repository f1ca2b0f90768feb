package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off micro-bench: incremental-pair-count BPE training vs the
  * pre-round-7 full-recount loop, at merge counts k=8 and k=64 on the
  * sf0.01 documents table. Run alone (see BASELINE.md bench-hygiene
  * rule): `sbt "Test/runMain graft.BpeBench"`. */
object BpeBench {

  /** The pre-round-7 loop: a full corpus-pair recount every round. */
  private def trainRecount(docs: DataFrame, textCol: String,
      k: Int): Seq[(String, String, Long)] = {
    val cp = graft.ext.LocalCheckpoint
    var words = cp.cut(docs
      .select(explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .select(graft.ext.Bpe.codePointSyms(col("_w")).as("_sym"),
        col("_n")))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val top = graft.ext.Bpe.fullPairCounts(words)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, rt, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((l, rt, c))
        val old = words
        words = cp.cut(words.select(
          graft.functions.VectorFunctions.bpeMerge(col("_sym"),
            lit(l), lit(rt)).as("_sym"), col("_n")))
        cp.release(old)
        r += 1
      }
    }
    cp.release(words)
    out.toSeq
  }

  /** Total shuffle-write records across all stages while `f` runs —
    * the scale-predictive cost metric: at sf0.01 wall time is
    * fixed-job-overhead-dominated, but shuffle volume is what grows
    * 1000× at the 100 TB target. */
  private def shuffleRecords[A](spark: SparkSession)(f: => A): (A, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val a = f
    Thread.sleep(1000) // let the listener bus drain (private API)
    spark.sparkContext.removeSparkListener(listener)
    (a, acc.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm
    // warm BOTH paths' codegen/JIT on a tiny slice so the first
    // measured run doesn't absorb one-time compilation
    val tiny = docs.limit(50).cache()
    tiny.count()
    graft.ext.Bpe.train(tiny, "text", 2).collect()
    trainRecount(tiny, "text", 2)
    tiny.unpersist()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    Seq(8, 64).foreach { k =>
      val ((inc, tInc), shInc) = shuffleRecords(spark)(time(
        graft.ext.Bpe.train(docs, "text", k)
          .orderBy(col("rank")).collect()
          .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq))
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      val ((rec, tRec), shRec) =
        shuffleRecords(spark)(time(trainRecount(docs, "text", k)))
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      require(inc == rec, s"k=$k: merge lists diverge")
      println(f"[bpebench] k=$k incremental=$tInc%.1fs recount=$tRec%.1fs" +
        f" shuffle_records incremental=$shInc recount=$shRec" +
        f" lists_equal=${inc == rec}")
    }
    spark.stop()
  }
}
