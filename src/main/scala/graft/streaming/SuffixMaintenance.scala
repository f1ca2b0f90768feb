package graft.streaming

import graft.ext.SuffixDedup
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ExactSubstr maintenance — the suffix-dedup twin of
  * [[DedupMaintenance]]: documents arrive in micro-batches; each
  * batch finds its duplicated `spanLen`-token spans against
  * everything landed so far via the STORED per-round class indexes
  * ([[graft.ext.SuffixDedup.deltaAgainstIndex]]), lands its own
  * index fragments (exactly the keys it introduced — landed keys are
  * never re-landed, so representatives stay stable), and lands its
  * to-remove spans. Keeper order is stream-time
  * first-occurrence-wins: the landed copy is kept, whatever its id —
  * the only order a fragment log can honor. Span emission is
  * structurally exactly-once: a doc's spans are computable only at
  * its own batch (its positions exist in no other batch).
  *
  * Delivery is exactly-once on storage by the [[AnnIndexMaintenance]]
  * discipline: every fragment and the spans write `mode(Overwrite)`
  * into their own `batch=<batchId>` directory and streaming
  * checkpoints make replays batch-id-stable. A replayed batch
  * re-reads indexes that may already contain its OWN fragments; those
  * rows are excluded DATA-LEVEL — a representative is a member, so a
  * row belongs to this batch iff its representative's doc id is one
  * of the batch's ids (ids are unique across the stream by contract),
  * and an anti-join against the batch's id sliver restores the
  * pre-batch read set exactly. Without that exclusion a replay would
  * see its own keys as landed and remove its own keepers
  * (spec-pinned convergence).
  *
  * Scale shape per batch: delta-local windows plus one keyed join
  * per round against an index READ — the corpus is never re-windowed
  * (the full-recompute alternative re-ranks every landed position
  * every day). */
object SuffixMaintenance {

  private val repType: StructType = StructType(Seq(
    StructField("d", LongType), StructField("p", IntegerType)))

  private def r0Schema = StructType(Seq(
    StructField("_tok", StringType), StructField("_br", repType)))
  private def rkSchema = StructType(Seq(
    StructField("_r", repType), StructField("_r2", repType),
    StructField("_brn", repType)))
  private def finSchema = StructType(Seq(
    StructField("_r", repType), StructField("_k2", repType),
    StructField("_bkeep", repType)))

  private def readFrags(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.schema(schema).parquet(dir)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Exclude rows this batch itself landed (replay): a row is ours
    * iff its representative's doc id is in the batch. */
  private def excludeOwn(frags: DataFrame, repCol: String,
      batchIds: DataFrame): DataFrame =
    frags.join(batchIds,
      frags(repCol).getField("d") === batchIds("_bid"), "left_anti")

  /** The idempotent unit of maintenance: find one micro-batch's spans
    * against the landed indexes, land its fragments and spans.
    * Replaying the same (batch, batchId) overwrites every directory
    * with identical bytes. `idCol` must be a unique long across the
    * stream. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
      idCol: String, indexDir: String, spansDir: String,
      spanLen: Int = 12): Unit = {
    val spark = batch.sparkSession
    val h = 63 - java.lang.Long.numberOfLeadingZeros(spanLen.toLong)
    val batchIds = batch
      .select(col(idCol).cast("long").as("_bid")).distinct()
      .localCheckpoint()
    try {
      val idx0 = excludeOwn(
        readFrags(spark, s"$indexDir/r0", r0Schema), "_br", batchIds)
      val idxKs = (1 to h.toInt).map(k => excludeOwn(
        readFrags(spark, s"$indexDir/r$k", rkSchema), "_brn", batchIds))
      // fin must be unique per key for the delta join: fragments are
      // disjoint by construction (only unseen keys land), but replay
      // hygiene aggregates anyway
      val fin = excludeOwn(
        readFrags(spark, s"$indexDir/fin", finSchema), "_bkeep", batchIds)
        .groupBy(col("_r"), col("_k2"))
        .agg(min(col("_bkeep")).as("_bkeep"))
      val (dups, frag0, fragKs, fragFin) = SuffixDedup.deltaAgainstIndex(
        batch, textCol, idCol, spanLen, idx0, idxKs, fin)
      // materialize EVERY output before the first overwrite: on replay
      // the lazy chains read this batch's own stale fragment files,
      // and overwriting those directories mid-job would yank files out
      // from under the later writes' scans (FAILED_READ_FILE). Eager
      // local checkpoints sever the lineage first; all are
      // batch-sized, and all are released before return.
      val outs = (SuffixDedup.spansOf(dups, idCol, spanLen)
        +: frag0 +: fragKs :+ fragFin).map(_.localCheckpoint())
      try {
        val spans +: f0 +: rest = outs: @unchecked
        spans.write.mode("overwrite").parquet(s"$spansDir/batch=$batchId")
        f0.write.mode("overwrite").parquet(s"$indexDir/r0/batch=$batchId")
        rest.init.zipWithIndex.foreach { case (f, i) =>
          f.write.mode("overwrite")
            .parquet(s"$indexDir/r${i + 1}/batch=$batchId")
        }
        rest.last.write.mode("overwrite")
          .parquet(s"$indexDir/fin/batch=$batchId")
      } finally outs.foreach(
        org.apache.spark.sql.graftbridge.ColumnBridge
          .unpersistLocalCheckpoint)
    } finally {
      org.apache.spark.sql.graftbridge.ColumnBridge
        .unpersistLocalCheckpoint(batchIds)
    }
  }

  /** All landed to-remove spans (every `batch=*` fragment). */
  def readSpans(spark: SparkSession, spansDir: String): DataFrame =
    readFrags(spark, spansDir, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("span_start", LongType),
      StructField("span_end", LongType))))

  /** Start maintaining the suffix-dedup indexes + spans log from a
    * streaming `source` carrying (`idCol`, `textCol`). */
  def start(source: DataFrame, textCol: String, idCol: String,
      indexDir: String, spansDir: String, checkpointDir: String,
      spanLen: Int = 12,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, textCol, idCol, indexDir,
            spansDir, spanLen)
        }
      }
      .start()
}
