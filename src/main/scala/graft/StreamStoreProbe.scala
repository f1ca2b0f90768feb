package graft

import org.apache.spark.sql.SparkSession

/** A/B the Structured Streaming state-store provider over the
  * bounded streaming family: default HDFS-backed vs RocksDB
  * (both ship with Spark — no new dependency). The bounded runs are
  * dominated by per-batch state commit cost at 4 state partitions,
  * which is exactly what the provider choice moves. Each query runs
  * under both providers (fresh internal checkpoints per run); the
  * printed JSON line carries both times per query. q85 (TWS) pins
  * RocksDB internally (transformWithState requires it) and is
  * excluded.
  *
  * Usage: StreamStoreProbe [sfDir] [names,comma,separated] */
object StreamStoreProbe {

  val DefaultNames: Seq[String] = Seq(
    "q40_stream_windowed", "q41_stream_sessions", "q42_stream_dedup",
    "q63_stream_stream_join", "q70_stream_hopping",
    "q84_stream_outer_join", "q97_stream_static_join",
    "q98_stream_full_outer")

  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else DefaultNames
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, provider: Option[String]): Double = {
      val keys = provider.toSeq.map(p =>
        "spark.sql.streaming.stateStore.providerClass" -> p)
      graft.streaming.EventsStream.withConf(spark, keys) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
    }
    // warm both providers' machinery once off the record
    run(names.head, None); run(names.head, Some(RocksDb))
    val cells = names.map { n =>
      val hdfs = run(n, None)
      val rocks = run(n, Some(RocksDb))
      s""""$n":{"hdfs_sec":${Jfmt.f2(hdfs)},"rocksdb_sec":${Jfmt.f2(rocks)}}"""
    }
    println(s"""{"sf":"$sfDir","providers":{${cells.mkString(",")}}}""")
    spark.stop()
  }
}
