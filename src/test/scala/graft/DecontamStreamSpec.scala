package graft

import org.apache.spark.sql.functions.{col, concat_ws}

import graft.ext.Dedup
import graft.streaming.DecontamStream

/** Round-9: the streaming benchmark-decontamination monitor — N
  * micro-batches union to the batch gram-overlap audit, and a replayed
  * batchId converges instead of duplicating. */
class DecontamStreamSpec extends SparkSpec {

  import spark.implicits._

  test("streaming decontamination: micro-batched probes == the batch " +
      "audit row-for-row; a replayed batchId leaves the area unchanged") {
    // corpus with planted contamination: docs 0,10,20,... repeat the
    // benchmark sentence verbatim (overlap 1.0); docs 5,15,... splice
    // half of it (partial overlap); the rest share no 3-gram
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (0L until 40L).map { i =>
      val text =
        if (i % 10 == 0) bench
        else if (i % 10 == 5) s"noise$i alpha beta gamma delta word$i"
        else s"clean$i text$i body$i tail$i more$i"
      (i, text)
    }.toDF("doc_id", "text")
    val benchmark = Seq((1000L, bench)).toDF("doc_id", "text")
    val landing = tmpDir("deconlanding")
    val outDir = tmpDir("deconout")
    val ckpt = tmpDir("deconckpt")
    docs.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = DecontamStream.start(src, benchmark, "text", "doc_id",
      outDir, ckpt)
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("doc_id"), col("n_grams"),
        col("n_hit"))).collect().map(_.getString(0)).toSet
    val streamed = spark.read.parquet(outDir)
    val batchAudit = Dedup.gramOverlapScores(benchmark, docs,
      "text", "doc_id")
    assert(rows(streamed) == rows(batchAudit),
      "micro-batched probes must union to the batch audit exactly")
    // the planted contamination is visible: full-copy docs hit on
    // every gram, clean docs on none
    val byDoc = streamed.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byDoc(0L)._1 == byDoc(0L)._2 && byDoc(0L)._2 == 6L)
    assert(byDoc(5L)._2 == 2L, "spliced doc shares exactly 2 grams")
    assert(byDoc(1L)._2 == 0L)
    // replay idempotence under the batchId-keyed overwrite
    val grams = DecontamStream.gramIndex(benchmark, "text")
    val batch0 = spark.read.parquet(landing).limit(30)
    DecontamStream.writeFragment(batch0, 999L, grams, "text", "doc_id",
      3, outDir)
    val once = rows(spark.read.parquet(outDir))
    DecontamStream.writeFragment(batch0, 999L, grams, "text", "doc_id",
      3, outDir)
    assert(rows(spark.read.parquet(outDir)) == once,
      "replaying a batchId must leave the report area unchanged")
  }
}
