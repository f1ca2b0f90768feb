package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine.
  *
  * The reference job is itself a watermarked micro-batch incremental
  * stream (daily cron + per-table watermark dict, SURVEY §2.8); this
  * module expresses the same semantics with real Structured Streaming:
  * file source → event-time watermark → windowed aggregation, driven to
  * completion with Trigger.AvailableNow for batch-equivalent runs.
  */
object EventsStream {

  /** Schema of the events fixture, read from the file itself: a file
    * stream needs a declared schema, and fixture generations have
    * shipped `ts` both as TIMESTAMP(NANOS) (Spark reads it as a raw
    * LONG of nanos) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (TIMESTAMP_NTZ). Declaring the file's own schema keeps the
    * vectorized reader happy either way; [[tsMicros]] canonicalizes
    * downstream. One driver-side footer read at stream construction —
    * not per micro-batch. */
  def eventsSchema(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** Streaming source over a parquet fixture that may be a single
    * FILE (the driver's layout — FileStreamSource accepts only
    * directories, so stream the parent with a name glob) or a
    * DIRECTORY of part files (generated scale sets, production
    * landing dirs — stream it directly; a name glob on the parent
    * would match the directory entry and read nothing). Shared by
    * every file-backed stream in the engine. */
  def streamParquet(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rs = spark.readStream.schema(eventsSchema(spark, path))
    if (fs.getFileStatus(p).isDirectory) rs.parquet(path)
    else rs.option("pathGlobFilter", p.getName)
      .parquet(p.getParent.toString)
  }

  /** `ts` as epoch-microsecond LONG whatever the declared type; pure
    * integral arithmetic (1e18-scale nanos lose low bits in a double).
    * Works on streaming DataFrames — schema-driven, no data peek. */
  def tsMicros(df: DataFrame): Column =
    graft.ops.Normalize.epochMicros(df, "ts")

  /** Tumbling-window counts per event_type with a 1-hour watermark.
    * Returns the aggregated streaming DataFrame; callers pick the sink.
    * Output columns are final (window start text, type, count, decimal
    * sum) so batch and stream results are directly comparable. */
  def windowedCounts(spark: SparkSession, path: String,
      windowLen: String = "6 hours", slide: Option[String] = None)
      : DataFrame = {
    // slide < windowLen ⇒ HOPPING windows: each event lands in
    // windowLen/slide overlapping windows (state grows by that factor —
    // at scale prefer tumbling + a rolling-sum post-pass when the ratio
    // is large). None ⇒ tumbling.
    val win = slide.map(sl => window(col("ts"), windowLen, sl))
      .getOrElse(window(col("ts"), windowLen))
    val raw = streamParquet(spark, path)
    raw
      .withColumn("ts", timestamp_micros(tsMicros(raw)))
      .withWatermark("ts", "1 hour")
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("string").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Run the stream over the (static) fixture to completion via an
    * in-memory sink — batch-equivalent semantics, used by tests and the
    * oracle-checked q40. Complete mode keeps pre-watermark windows so
    * the result equals the batch aggregation. */
  def runToCompletion(spark: SparkSession, path: String,
      queryName: String = "events_windowed",
      windowLen: String = "6 hours", slide: Option[String] = None)
      : DataFrame =
    withStatePartitions(spark) {
    val q = windowedCounts(spark, path, windowLen, slide).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Stream-static equi-join, driven to completion: the static dim is
    * re-planned each micro-batch and BROADCAST into the stream — the
    * join is STATELESS (only stream-stream joins buffer state) and the
    * stream side never repartitions; each micro-batch's tasks probe the
    * broadcast table locally. That is the 100 TB shape for enriching an
    * event firehose with a dimension: shuffle volume is the aggregation
    * only, and a dim refresh is picked up at the next micro-batch
    * without restarting the query. Complete mode + AvailableNow makes
    * the bounded run equal the batch join+agg the oracle states. */
  def runEnrichedToCompletion(spark: SparkSession, path: String,
      dim: DataFrame, dimKey: String, groupCol: String,
      queryName: String = "events_enriched"): DataFrame =
    withStatePartitions(spark) {
      val q = streamParquet(spark, path)
        .join(broadcast(dim), col("user_id") === col(dimKey))
        .groupBy(col(groupCol), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("string").as("sum_value"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
    }

  /** Streaming state lives per shuffle partition; micro-batches over
    * bounded fixtures pay a state-store commit per partition per batch,
    * so size the state partitioning to the data, not the CPU count.
    *
    * Also skips the trailing no-data micro-batch: every bounded run in
    * this engine emits its results in the data batch itself (complete
    * mode re-emits full state; the stream-stream inner join and
    * NoTimeout sessions emit eagerly), so the extra batch only pays
    * another round of state commits. A pipeline that relies on
    * watermark-driven FINAL emission (append-mode windowed agg,
    * dropDuplicatesWithinWatermark, event-time timeouts) must keep
    * no-data batches on — don't route it through this wrapper.
    * Restores the session settings afterwards. */
  def withStatePartitions[T](spark: SparkSession, n: Int = 4,
      skipNoData: Boolean = true)(f: => T): T =
    withConf(spark, Seq(
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.streaming.noDataMicroBatches.enabled" -> (!skipNoData).toString))(f)

  /** Run `f` with session confs temporarily overridden, restoring
    * (set-back or unset) afterwards. */
  def withConf[T](spark: SparkSession, keys: Seq[(String, String)])(f: => T): T = {
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
