package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful Structured Streaming: inactivity-gap sessionization with
  * flatMapGroupsWithState — the streaming face of the batch lag-window
  * sessionization (Catalog q17). Custom per-key state (current open
  * session) lives in the state store; closed sessions are emitted as
  * they close. At 100 TB this is the shape for continuous event
  * pipelines: state is partitioned by key across executors and
  * checkpointed incrementally.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_us: Long, event_id: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long,
      end_us: Long, n_events: Long)

  val GapUs: Long = 3600L * 1000000L // 1 hour, matches q17's gap

  /** Per-user fold: sort the batch's events, close a session whenever
    * the gap exceeds GapUs. The still-open session stays in state. */
  def fold(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var cur = state.getOption.orNull
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    sorted.foreach { e =>
      cur match {
        case null => cur = SessionState(e.ts_us, e.ts_us, 1)
        case s if e.ts_us - s.last > GapUs =>
          closed += ClosedSession(userId, s.start, s.last, s.n)
          cur = SessionState(e.ts_us, e.ts_us, 1)
        case s => cur = SessionState(s.start, e.ts_us, s.n + 1)
      }
    }
    if (cur != null) state.update(cur)
    closed.iterator
  }

  /** Run over the events fixture (single-file batch => one micro-batch,
    * so closed sessions = every session except each user's last). */
  def runToCompletion(spark: SparkSession, path: String,
      queryName: String = "events_sessions"): Dataset[ClosedSession] =
    EventsStream.withStatePartitions(spark) {
    import spark.implicits._
    val raw = EventsStream.streamParquet(spark, path)
    val events = raw
      .select(col("user_id"), EventsStream.tsMicros(raw).as("ts_us"),
        col("event_id"))
      .as[Event]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).as[ClosedSession]
  }
}
