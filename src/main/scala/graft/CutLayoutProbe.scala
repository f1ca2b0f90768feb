package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does a keyed localCheckpoint CUT carry its hash layout
  * into downstream joins/aggregates, or does AQE's adaptive wrapper
  * surface it as UnknownPartitioning (forcing a re-shuffle per
  * consumer)? Decides whether iterative jobs should lay their frozen
  * inputs out by join key before cutting — and documents the measured
  * answer either way. */
object CutLayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000)
      .select((col("id") % 50).as("k"), col("id").as("v"))
    def exchanges(p: String): Int =
      "Exchange hashpartitioning".r.findAllIn(p).length
    // keyed cut: repartition(k) then checkpoint
    val cut = df.repartition(col("k")).localCheckpoint()
    println("cut scan head: " + cut.queryExecution.executedPlan
      .toString.linesIterator.take(2).mkString(" | "))
    val agg = cut.groupBy(col("k")).count()
    agg.collect()
    println(s"agg-over-keyed-cut exchanges = " +
      exchanges(agg.queryExecution.executedPlan.toString))
    // join of two keyed cuts on k
    val cut2 = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
      .localCheckpoint()
    val j = cut.join(cut2, Seq("k"))
    j.collect()
    println(s"join-of-two-keyed-cuts exchanges = " +
      exchanges(j.queryExecution.executedPlan.toString))
    println(j.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("Aggregate")).mkString("\n"))
    println(agg.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("Aggregate")).mkString("\n"))
    // KEYED cut through the bridge: declared HashPartitioning
    val kcut = org.apache.spark.sql.graftbridge.ColumnBridge
      .localCheckpointKeyed(df, Seq("k"), 8)
    val kagg = kcut.groupBy(col("k")).count()
    kagg.collect()
    println(s"agg-over-DECLARED-cut exchanges = " +
      exchanges(kagg.queryExecution.executedPlan.toString))
    val kcut2 = org.apache.spark.sql.graftbridge.ColumnBridge
      .localCheckpointKeyed(df.groupBy(col("k"))
        .agg(sum(col("v")).as("s")), Seq("k"), 8)
    val kj = kcut.join(kcut2, Seq("k"))
    kj.collect()
    println(s"join-of-two-DECLARED-cuts exchanges = " +
      exchanges(kj.queryExecution.executedPlan.toString))
    // correctness: declared-cut join equals plain join
    val plain = df.join(df.groupBy(col("k")).agg(sum(col("v")).as("s")),
      Seq("k"))
    println("rows equal = " + (kj.count() == plain.count() &&
      kj.exceptAll(plain).isEmpty && plain.exceptAll(kj).isEmpty))
    spark.stop()
  }
}
