package graft

import org.apache.spark.sql.functions.{col, concat_ws}

import graft.ext.TextAnalysis
import graft.streaming.SketchMaintenance

/** Round-9: streaming count-min maintenance — fragment sums must be
  * BIT-IDENTICAL to the batch sketch over the union (integer-mergeable,
  * no approximate-merge caveat), and a replayed batchId converges. */
class SketchMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("cell-wise fragment sum == the batch count-min build; replayed " +
      "batchId leaves the fragment area unchanged") {
    val docs = (0L until 48L).map { i =>
      (i, s"tok${i % 7} tok${i % 3} common word${i % 11} common")
    }.toDF("doc_id", "text")
    val landing = tmpDir("cmslanding")
    val outDir = tmpDir("cmsout")
    val ckpt = tmpDir("cmsckpt")
    docs.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = SketchMaintenance.start(src, "text", outDir, ckpt, d = 3, w = 64)
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("row"), col("col"), col("cnt")))
        .collect().map(_.getString(0)).toSet
    val merged = SketchMaintenance.mergedCells(spark, outDir)
    val batch = TextAnalysis.countMinCells(docs, "text", d = 3, w = 64)
    assert(rows(merged) == rows(batch),
      "fragment sums must be bit-identical to the batch sketch")
    assert(rows(merged).nonEmpty)
    // replay idempotence: the same (rows, batchId) written twice
    // leaves the fragment area — and thus the merged sketch — unchanged
    val extra = spark.read.parquet(landing)
      .orderBy(col("doc_id")).limit(12)
    SketchMaintenance.writeFragment(extra, 99L, "text", outDir,
      d = 3, w = 64)
    val once = rows(SketchMaintenance.mergedCells(spark, outDir))
    SketchMaintenance.writeFragment(extra, 99L, "text", outDir,
      d = 3, w = 64)
    assert(rows(SketchMaintenance.mergedCells(spark, outDir)) == once,
      "replaying a batchId must leave the merged sketch unchanged")
  }
}
