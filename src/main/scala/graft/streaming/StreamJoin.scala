package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream join: the canonical Spark pattern the reference's
  * batch-incremental design cannot express (SURVEY §2.8 "none") — two
  * live streams joined on an equi key PLUS an event-time range, with
  * watermarks on both sides so the state store can evict rows that can
  * no longer match.
  *
  * At 100 TB the knobs that matter: the equi key (user_id) hash-
  * partitions both sides so each state-store instance only holds its
  * key range; the time-range condition + watermark bound state size to
  * (rate × interval) per key instead of the whole history. Without the
  * range condition Spark must keep ALL past rows of both sides forever.
  */
object StreamJoin {

  /** Purchases joined to same-user errors that occur within
    * `[p.ts, p.ts + intervalMin)`. Both sides are independent streaming
    * readers over the same events fixture (ns→µs integral conversion),
    * 1-hour watermarks. Inner join → append semantics: results are
    * emitted as soon as both rows arrive, final result equals the batch
    * join, which is what the DuckDB oracle (q63) states. */
  def purchaseErrorJoin(spark: SparkSession, path: String,
      intervalMin: Int = 30, joinType: String = "inner"): DataFrame = {
    def side(eventType: String, pre: String): DataFrame = {
      val raw = EventsStream.streamParquet(spark, path)
      raw
        .filter(col("event_type") === eventType)
        .select(
          col("event_id").as(s"${pre}_id"),
          col("user_id").as(s"${pre}_user"),
          timestamp_micros(EventsStream.tsMicros(raw)).as(s"${pre}_ts"))
        .withWatermark(s"${pre}_ts", "1 hour")
    }
    side("purchase", "p").join(side("error", "e"),
      col("p_user") === col("e_user")
        && col("e_ts") >= col("p_ts")
        && col("e_ts") < col("p_ts") + expr(s"INTERVAL $intervalMin MINUTES"),
      joinType)
      .select(col("p_id"), col("e_id"),
        // coalesce so FULL OUTER keeps the key on error-only rows;
        // inner/left always have p_user, so those results are unchanged
        coalesce(col("p_user"), col("e_user")).as("user_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("delta_us"))
  }

  /** LEFT OUTER stream-stream join: matched rows emit eagerly like the
    * inner join; an UNMATCHED purchase emits its null-padded row only
    * once the global watermark (min over both sides' per-batch
    * max-event-time minus delay) passes the end of its join window
    * [p_ts, p_ts + interval) — only then can the state store prove no
    * error will ever arrive for it. Purchases whose window end is
    * still >= the final watermark when the bounded input drains stay
    * in state, unemitted: that cutoff IS the streaming semantics, and
    * the oracle states it (`p_ts + interval < final watermark`).
    *
    * Needs no-data micro-batches ON: the null emissions happen in the
    * watermark-advancing batch AFTER the last data batch, so this
    * deliberately bypasses the skipNoData fast path used by the
    * eager-emitting streams. */
  def runLeftOuterToCompletion(spark: SparkSession, path: String,
      intervalMin: Int = 30,
      queryName: String = "purchase_error_left_join"): DataFrame =
    runOuterToCompletion(spark, path, "left_outer", intervalMin, queryName)

  /** FULL OUTER adds the symmetric eviction: an unmatched ERROR emits
    * null-padded once the watermark passes its own event time (any
    * matching purchase would need p_ts <= e_ts, and rows below the
    * watermark are dropped as late) — vs the purchase side's
    * `p_ts + interval < watermark` cutoff. Both cutoffs are stated by
    * the q98 oracle. */
  def runOuterToCompletion(spark: SparkSession, path: String,
      joinType: String, intervalMin: Int = 30,
      queryName: String = "purchase_error_outer_join"): DataFrame =
    EventsStream.withStatePartitions(spark, skipNoData = false) {
      val q = purchaseErrorJoin(spark, path, intervalMin, joinType)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
    }

  /** Drive the join over the bounded fixture to completion (append mode,
    * memory sink, AvailableNow) and return the result table. */
  def runToCompletion(spark: SparkSession, path: String,
      intervalMin: Int = 30,
      queryName: String = "purchase_error_join"): DataFrame =
    EventsStream.withStatePartitions(spark) {
      val q = purchaseErrorJoin(spark, path, intervalMin).writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
    }
}
