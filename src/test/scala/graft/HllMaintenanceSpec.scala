package graft

import org.apache.spark.sql.functions.{col, concat_ws, explode}

import graft.ext.{Hll, TextAnalysis}
import graft.streaming.HllMaintenance

/** Round-9: streaming HLL-register maintenance — fragment max-merge
  * must be BIT-IDENTICAL to the batch register build over the union
  * (integer registers, exact max-merge), the merged estimate must
  * equal the batch estimate, and a replayed batchId converges. */
class HllMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private def hashed(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source"), explode(
      graft.functions.VectorFunctions.polyHashAll(
        TextAnalysis.tokens(col("text")))).as("_h"))

  test("register fragment max == the batch register build; merged " +
      "estimate == batch estimate; replayed batchId converges") {
    val docs = (0L until 60L).map { i =>
      (i, s"src${i % 4}",
        s"alpha${i % 23} beta${i % 17} gamma${i * 7 % 31} delta common")
    }.toDF("doc_id", "source", "text")
    val landing = tmpDir("hlllanding")
    val outDir = tmpDir("hllout")
    val ckpt = tmpDir("hllckpt")
    docs.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = HllMaintenance.start(
      hashed(src), "source", col("_h"), outDir, ckpt)
    q.awaitTermination()
    def regRows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("key"), col("bkt"), col("reg")))
        .collect().map(_.getString(0)).toSet
    val merged = HllMaintenance.mergedRegisters(spark, outDir)
    val batch = Hll.registers(hashed(docs), "source", col("_h"))
      .withColumnRenamed("source", "key")
    assert(regRows(merged) == regRows(batch),
      "max-merged fragments must be bit-identical to the batch registers")
    assert(regRows(merged).nonEmpty)
    // the estimate built from merged registers equals the batch one
    def estRows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", df.columns.map(col): _*))
        .collect().map(_.getString(0)).toSet
    val estMerged = HllMaintenance.mergedEstimate(spark, outDir)
    val estBatch = Hll.registerEstimate(hashed(docs), "source", col("_h"))
      .withColumnRenamed("source", "key")
    assert(estRows(estMerged) == estRows(estBatch))
    // replay idempotence
    val extra = spark.read.parquet(landing)
      .orderBy(col("doc_id")).limit(15)
    HllMaintenance.writeFragment(hashed(extra), 99L, "source",
      col("_h"), outDir)
    val once = regRows(HllMaintenance.mergedRegisters(spark, outDir))
    HllMaintenance.writeFragment(hashed(extra), 99L, "source",
      col("_h"), outDir)
    assert(regRows(HllMaintenance.mergedRegisters(spark, outDir)) == once,
      "replaying a batchId must leave the merged registers unchanged")
  }

  test("day-keyed streaming registers feed the rolling-window merge " +
      "(q212's composition): window estimates == batch-built windows") {
    import org.apache.spark.sql.functions.{max => fmax}
    import org.apache.spark.sql.types.LongType
    val ev = (0L until 240L).map(i => (i % 4, i * 131 + 7))
      .toDF("day", "uid")
    val landing = tmpDir("hllwinland")
    val outDir = tmpDir("hllwinout")
    val ckpt = tmpDir("hllwinckpt")
    ev.repartitionByRange(3, col("uid"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    graft.streaming.HllMaintenance.start(
      src, "day", col("uid"), outDir, ckpt).awaitTermination()
    // rolling 2-day window merge over the STREAMED per-day registers
    val regs = graft.streaming.HllMaintenance
      .mergedRegisters(spark, outDir, keyType = LongType)
    val days = regs.select(col("key").as("day")).distinct()
    val win = days.join(regs,
        col("key").between(col("day") - 1, col("day")))
      .groupBy(col("day"), col("bkt")).agg(fmax(col("reg")).as("reg"))
    val streamed = Hll.estimateFromRegisters(win, "day")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // batch reference: registers straight from the rows, same window
    val bregs = Hll.registers(ev, "day", col("uid"))
    val bwin = days.join(bregs.withColumnRenamed("day", "key"),
        col("key").between(col("day") - 1, col("day")))
      .groupBy(col("day"), col("bkt")).agg(fmax(col("reg")).as("reg"))
    val batch = Hll.estimateFromRegisters(bwin, "day")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
