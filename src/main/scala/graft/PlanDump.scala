package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: dump `.explain("formatted")` of catalog queries to
  * files — the plan evidence the optimization rounds commit under
  * plans/. Building a query's DataFrame RUNS its side effects
  * (snapshot merges, streams), so dumps run at a small SF.
  *
  * args: <outDir> [sfDir] [comma-separated names | "all"] [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val only: Option[Set[String]] =
      if (args.length > 2 && args(2) != "all")
        Some(args(2).split(",").toSet)
      else None
    val suffix = if (args.length > 3) args(3) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
        try {
          spark.catalog.clearCache()
          val memoKeep = graft.ext.FrameMemo.liveRddIds
          spark.sparkContext.getPersistentRDDs.valuesIterator
            .filter(r => !memoKeep.contains(r.id))
            .foreach(_.unpersist(blocking = true))
          spark.sessionState.catalog.getTempViewNames()
            .foreach(spark.catalog.dropTempView)
        } catch { case _: Throwable => }
      }
    spark.stop()
  }
}
