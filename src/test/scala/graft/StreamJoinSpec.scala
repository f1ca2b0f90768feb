package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {

  test("stream-stream join equals the batch theta join") {
    val path = s"${sf()}/events.parquet"
    val got = StreamJoin.runToCompletion(spark, path,
        queryName = "spec_pe_join")
      .select("p_id", "e_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = eventsUs(path)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts_us").as("e_ts"))
    val want = p.join(e, col("p_user") === col("e_user")
        && col("e_ts") >= col("p_ts")
        && col("e_ts") < col("p_ts") + 30L * 60 * 1000000)
      .select("p_id", "e_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }
}
