package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer
/** Dev probe: run one catalog query with a stage listener and print
  * a per-stage table (tasks, total executor run time, stage wall)
  * sorted by run time — the attribution tool for "where does the
  * wall go" questions the plain [[QueryProbe]] can't answer. An
  * 8-task heavy stage on a 32-core session is the signature of
  * parallelism bound by source-file count; a stage whose summed run
  * time is a multiple of its standalone cost is the signature of a
  * subtree re-executed per consumer (AQE futures racing exchange
  * reuse). Both signatures were how the q245 audit's 40–146 s 25×
  * swing was pinned and fixed in round 12. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer[(Int, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.numTasks,
            si.taskMetrics.executorRunTime, wall))
        }
      }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // drain straggler stage-completed events
    stages.synchronized {
      val cpu = stages.map(_._3).sum / 1000.0
      println(f"PROBE $name rows=$n wall=$wall%.2fs " +
        f"stages=${stages.size} cpuTotal=$cpu%.1fs")
      stages.sortBy(-_._3).take(25).foreach { case (id, nt, rt, w) =>
        println(f"STAGE id=$id%4d tasks=$nt%3d " +
          f"runTime=${rt / 1000.0}%8.1fs wall=${w / 1000.0}%7.1fs")
      }
    }
    spark.stop()
  }
}
