package graft.streaming

import graft.ext.{GraphOps, ShuffleBarrier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming authority-rank maintenance — the q159 warm-start
  * discipline ([[GraphOps.pageRankFixedPoint]] with `initRanks`)
  * composed with Structured Streaming's foreachBatch, the way a crawl
  * actually refreshes source authority: link-graph edges arrive in
  * micro-batches, each batch lands its own distinct edge fragment,
  * and the rank table is refreshed with `refreshIters` warm-start
  * rounds over the accumulated edge log instead of re-running the
  * full cold power iteration per day.
  *
  * Exactly-once on storage by the [[AnnIndexMaintenance]] discipline:
  * both the edge fragment and the rank snapshot write
  * `mode(Overwrite)` into their own `batch=<batchId>` directory, and
  * streaming checkpoints make replays batch-id-stable. Batch i's rank
  * snapshot is a pure function of fragments with id ≤ i: the rank
  * refresh reads ONLY edge fragments `batch <= batchId` and warm
  * starts from the LATEST rank snapshot with id < batchId, so
  * replaying a batch after later batches have landed still reproduces
  * its original bytes (spec-pinned), unlike a head-of-log "current"
  * table which would absorb the future.
  *
  * Scale shape per batch: the edge log scan is one partition-pruned
  * read (fragments are physically separate directories), the refresh
  * pays `refreshIters` × (keyed join + map-side-combinable agg) — the
  * [[GraphOps.pageRankFixedPoint]] shape — and the warm start skips
  * the converged prefix a cold run would replay. At crawl scale the
  * daily delta is ~1% of the graph; one warm round over the union is
  * the whole daily cost. */
object GraphMaintenance {

  private def ranksSchema: StructType = StructType(Seq(
    StructField("node", LongType),
    StructField("rank_micro", LongType)))

  /** Latest landed rank snapshot with batch id < `beforeBatch`
    * (None = take the newest); None result when nothing has landed
    * yet (the first refresh runs cold). */
  def readRanks(spark: SparkSession, ranksDir: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(ranksDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val ids = fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") =>
        s.stripPrefix("batch=").toLong }
      .filter(id => beforeBatch.forall(id < _))
    if (ids.isEmpty) None
    else Some(spark.read.schema(ranksSchema)
      .parquet(s"$ranksDir/batch=${ids.max}"))
  }

  /** Accumulated edge log (fragments with id ≤ `upToBatch`; None =
    * everything landed). Empty-with-schema before the first batch. */
  def readEdges(spark: SparkSession, edgesDir: String,
      upToBatch: Option[Long] = None): DataFrame = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    val path = new org.apache.hadoop.fs.Path(edgesDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("batch=") &&
          upToBatch.forall(p.getName.stripPrefix("batch=").toLong <= _))
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs.map(_.toString): _*)
  }

  /** The idempotent unit of maintenance: land one micro-batch of
    * edges, refresh ranks over fragments ≤ batchId from the latest
    * earlier snapshot. Replaying the same (batch, batchId) overwrites
    * both directories with identical bytes. */
  def processBatch(batch: DataFrame, batchId: Long, srcCol: String,
      dstCol: String, edgesDir: String, ranksDir: String,
      refreshIters: Int = 1, dampMicro: Long = 850000L): Unit = {
    val spark = batch.sparkSession
    batch.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
      .write.mode("overwrite").parquet(s"$edgesDir/batch=$batchId")
    val edges = readEdges(spark, edgesDir, upToBatch = Some(batchId))
    val warm = readRanks(spark, ranksDir, beforeBatch = Some(batchId))
    GraphOps.pageRankFixedPoint(edges, "src", "dst",
        iters = refreshIters, dampMicro = dampMicro,
        cp = ShuffleBarrier, initRanks = warm)
      .write.mode("overwrite").parquet(s"$ranksDir/batch=$batchId")
  }

  /** Start maintaining the edge log + rank snapshots from a streaming
    * `source` carrying (`srcCol`, `dstCol`). */
  def start(source: DataFrame, srcCol: String, dstCol: String,
      edgesDir: String, ranksDir: String, checkpointDir: String,
      refreshIters: Int = 1, dampMicro: Long = 850000L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, srcCol, dstCol, edgesDir,
            ranksDir, refreshIters, dampMicro)
        }
      }
      .start()
}
