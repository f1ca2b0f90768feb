package graft

import org.apache.spark.sql.functions._

/** Dev probe: disjoint-writer conflict detection, priced.
  *
  * N writers target ONE snapshot table, each merging a delta into its
  * own partition (the `incrementalRunParallel`-onto-one-table shape).
  * Without conflict detection every lost claim rebases — re-reads its
  * touched partitions and recomputes the full merge — so N racers
  * cost up to N(N+1)/2 merge computations; with it, a loser whose
  * write set is disjoint from the winner's changed entries re-commits
  * its already-written staging (manifest I/O only) and N racers cost
  * exactly N. The probe runs the IDENTICAL barrier-raced workload
  * with [[graft.ops.SnapshotTable.fastRecommitEnabled]] off and on,
  * reporting wall time and the stage-write count (one `v=...` data
  * dir per merge computation — the direct evidence).
  *
  * usage: Round19Probe [nWriters] [rowsPerWriter]
  */
object Round19Probe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val nWriters = if (args.length > 0) args(0).toInt else 8
    val rowsPer = if (args.length > 1) args(1).toLong else 200000L
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.SnapshotTable
    import spark.implicits._
    val root = Scratch.createTempDir("r19probe")
    try {
      def seedAndRace(tag: String, fast: Boolean): (Double, Int, Int) = {
        val dir = s"$root/$tag/t"
        // seed every partition so racers merge into existing entries
        val seed = spark.range(nWriters.toLong * 1000L).select(
          col("id").as("k"), concat(lit("seed"), col("id")).as("v"),
          (col("id") % nWriters).cast("int").as("p"))
        SnapshotTable.merge(spark, dir, seed, "k", "v", Seq("p"), Some(1L))
        val baseDirs = stageDirs(spark, dir).size
        SnapshotTable.fastRecommitEnabled = fast
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(nWriters)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        val barrier = new java.util.concurrent.CyclicBarrier(nWriters)
        val t0 = System.nanoTime()
        try Await.result(Future.sequence((0 until nWriters).map { i =>
          Future {
            barrier.await()
            val delta = spark.range(rowsPer).select(
              (col("id") * nWriters + i + 1000000L).as("k"),
              concat(lit(s"w$i-"), col("id")).as("v"),
              lit(i).cast("int").as("p"))
            SnapshotTable.mergeRetrying(spark, dir, delta, "k", "v",
              Seq("p"), Some(10L + i))
          }
        }), Duration.Inf)
        finally { pool.shutdown(); SnapshotTable.fastRecommitEnabled = true }
        val wall = (System.nanoTime() - t0) / 1e9
        val stages = stageDirs(spark, dir).size - baseDirs
        val vers = SnapshotTable.versions(spark, dir).size
        (wall, stages, vers)
      }
      // rebase-only first (the before), then the fast path (the after)
      val (wallOff, stagesOff, versOff) = seedAndRace("off", fast = false)
      println(f"PROBE writers=$nWriters rowsPer=$rowsPer fast=off " +
        f"wall=$wallOff%.2fs stageWrites=$stagesOff versions=$versOff")
      val (wallOn, stagesOn, versOn) = seedAndRace("on", fast = true)
      println(f"PROBE writers=$nWriters rowsPer=$rowsPer fast=on " +
        f"wall=$wallOn%.2fs stageWrites=$stagesOn versions=$versOn")
      println(f"""{"metric":"disjoint_writer_race","writers":$nWriters,""" +
        f""""rows_per_writer":$rowsPer,""" +
        f""""rebase_wall_sec":$wallOff%.2f,"rebase_stage_writes":$stagesOff,""" +
        f""""fast_wall_sec":$wallOn%.2f,"fast_stage_writes":$stagesOn,""" +
        f""""speedup":${wallOff / wallOn}%.2f}""")

      // BRANCH PUBLISH law: fastForward is O(staged commits) manifest
      // I/O with ZERO data movement, so its wall time must stay FLAT
      // as the table grows — the number that separates a metadata
      // publish from any copy-based alternative (publishChanges'
      // landing pays O(changed rows) per range by design; the branch
      // door removes even that from the publish step).
      def wapPublish(tag: String, tableRows: Long): (Double, Double) = {
        val dir = s"$root/wap-$tag/t"
        val seed = spark.range(tableRows).select(
          col("id").as("k"), concat(lit("seed"), col("id")).as("v"),
          (col("id") % 64).cast("int").as("p"))
        SnapshotTable.merge(spark, dir, seed, "k", "v", Seq("p"), Some(1L))
        SnapshotTable.createBranch(spark, dir, "wap")
        val tS0 = System.nanoTime()
        (0 until 5).foreach { i =>
          val delta = spark.range(1000L).select(
            (col("id") + tableRows + i * 1000L).as("k"),
            concat(lit(s"c$i-"), col("id")).as("v"),
            lit(i % 64).cast("int").as("p"))
          SnapshotTable.merge(spark, dir, delta, "k", "v", Seq("p"),
            Some(10L + i), branch = Some("wap"))
        }
        val stageSec = (System.nanoTime() - tS0) / 1e9
        val tP0 = System.nanoTime()
        SnapshotTable.fastForward(spark, dir, "wap")
        val pubSec = (System.nanoTime() - tP0) / 1e9
        (stageSec, pubSec)
      }
      val (stageSmall, pubSmall) = wapPublish("small", 100000L)
      val (stageBig, pubBig) = wapPublish("big", 10000000L)
      println(f"PROBE wap small: stage5=$stageSmall%.2fs " +
        f"publish=$pubSmall%.3fs | big(100x rows): stage5=$stageBig%.2fs " +
        f"publish=$pubBig%.3fs")
      println(f"""{"metric":"branch_publish","staged_commits":5,""" +
        f""""publish_sec_at_100k_rows":$pubSmall%.3f,""" +
        f""""publish_sec_at_10m_rows":$pubBig%.3f,""" +
        f""""bytes_moved":0}""")
    } finally {
      Scratch.deleteRecursively(root)
      spark.stop()
    }
  }

  private def stageDirs(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, "data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }
}
