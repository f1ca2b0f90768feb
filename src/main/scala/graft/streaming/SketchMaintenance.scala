package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming count-min-sketch maintenance — the live-feed twin of the
  * batch token-frequency sketch ([[TextAnalysis.countMinCells]]):
  * every micro-batch lands its own d×w cell fragment, and the current
  * corpus sketch is the CELL-WISE SUM of landed fragments — count-min
  * is mergeable by pure integer addition, so the merged sketch is
  * BIT-IDENTICAL to the batch build over the union (spec-pinned; no
  * approximate-merge caveat, unlike quantile or HLL-family sketches
  * whose merges reorder floating error).
  *
  * This is the frequency-monitor shape a 100 TB feed wants: per batch
  * one map-side-combinable aggregation into ≤ d·w cells (fragment
  * size is CONSTANT regardless of batch size), merge-on-read is a sum
  * over #batches × d·w tiny rows, and the merged sketch broadcasts to
  * downstream estimate probes. Exactly-once by the batchId-keyed
  * overwrite discipline shared with the other maintenance streams. */
object SketchMaintenance {

  private def cellSchema: StructType = StructType(Seq(
    StructField("row", IntegerType), StructField("col", LongType),
    StructField("cnt", LongType)))

  /** The idempotent unit: sketch one micro-batch and overwrite its
    * own `batch=<batchId>` fragment. */
  def writeFragment(batch: DataFrame, batchId: Long, textCol: String,
      outDir: String, d: Int = 4, w: Int = 512, seed: Long = 11L): Unit =
    TextAnalysis.countMinCells(batch, textCol, d, w, seed)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** The current corpus sketch: cell-wise sum of landed fragments
    * with id ≤ `upToBatch` (None = everything). Empty-with-schema
    * before the first batch. */
  def mergedCells(spark: SparkSession, outDir: String,
      upToBatch: Option[Long] = None): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("batch=") &&
          upToBatch.forall(p.getName.stripPrefix("batch=").toLong <= _))
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cellSchema)
    else spark.read.schema(cellSchema)
      .parquet(dirs.map(_.toString): _*)
      .groupBy(col("row"), col("col"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Start sketching the streaming `source` (must carry `textCol`). */
  def start(source: DataFrame, textCol: String, outDir: String,
      checkpointDir: String, d: Int = 4, w: Int = 512,
      seed: Long = 11L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          writeFragment(batch, batchId, textCol, outDir, d, w, seed)
        }
      }
      .start()
}
