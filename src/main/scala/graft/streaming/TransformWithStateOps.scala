package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** `transformWithState` — Spark 4's arbitrary-state streaming API (the
  * successor to the `flatMapGroupsWithState` used by [[Sessionize]]):
  * named typed state cells (value/list/map) with per-cell TTL, timers,
  * and mandatory RocksDB state backing. Where the reference's
  * batch-incremental design reprocesses each delta from scratch, this
  * keeps per-key state resident across micro-batches.
  *
  * Scale posture: state is hash-partitioned by the grouping key, so a
  * 1000-executor cluster holds 1/1000th of the keyspace per state
  * store; RocksDB spills cold keys to local disk instead of executor
  * heap, which is what makes 10^9-key state feasible. The
  * sort-within-key below is bounded by one key's rows in one
  * micro-batch, never the partition.
  */
object TransformWithStateOps {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class Seqd(user_id: Long, event_id: Long, seq_no: Long)

  /** Per-user monotone sequence numbers: a ValueState[Long] counter
    * carried across micro-batches; rows within a (key, batch) are
    * ordered by (ts, event_id) before numbering so the assignment is
    * deterministic.
    *
    * Equality with the batch window
    * row_number() OVER (PARTITION BY user ORDER BY ts, event_id) holds
    * only when all of a key's rows arrive in ONE micro-batch (true for
    * the single-file AvailableNow fixture driven by [[runSeqNo]]). If
    * the source splits input across batches (multiple files,
    * maxFilesPerTrigger), numbering follows batch-arrival order — still
    * monotone per key and gap-free, but not the global (ts, event_id)
    * order. Sources that need the global order across batches must
    * buffer by event time (ListState + watermark timers) before
    * numbering — same caveat as EventsStream.withStatePartitions
    * documents for skipNoData. */
  class SeqNoProcessor extends StatefulProcessor[Long, Ev, Seqd] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Seqd] = {
      var c = if (cnt.exists()) cnt.get() else 0L
      val out = rows.toArray.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        c += 1
        Seqd(key, e.event_id, c)
      }
      cnt.update(c)
      out.iterator
    }
  }

  /** Drive the sequencer over the bounded events fixture (AvailableNow,
    * memory sink) and return the sequenced table. */
  def runSeqNo(spark: SparkSession, path: String,
      queryName: String = "events_seqno"): DataFrame =
    EventsStream.withConf(spark, Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
      import spark.implicits._
      val raw = EventsStream.streamParquet(spark, path)
      val evs = raw
        .select(col("user_id"), col("event_id"),
          EventsStream.tsMicros(raw).as("ts_us"))
        .as[Ev]
      val q = evs.groupByKey(_.user_id)
        .transformWithState(new SeqNoProcessor,
          TimeMode.None(), OutputMode.Append())
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
    }
}
