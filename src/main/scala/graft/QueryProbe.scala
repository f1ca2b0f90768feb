package graft
import org.apache.spark.sql.SparkSession
// dev probe: time one query, optionally print the formatted plan
object QueryProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.length > 2 && args(2) == "explain"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // SPARK_GRAFT_LOG=INFO surfaces DAGScheduler job timings when a
    // probe needs per-stage attribution (default stays quiet)
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, dir).explain("formatted")
    // warm
    val t0 = System.nanoTime(); val n1 = fn(spark, dir).count()
    val t1 = System.nanoTime(); val n2 = fn(spark, dir).count()
    val t2 = System.nanoTime()
    println(f"PROBE $name rows=$n1 cold=${(t1-t0)/1e9}%.2fs warm=${(t2-t1)/1e9}%.2fs")
    spark.stop()
  }
}
