package graft

import org.apache.spark.sql.functions._

/** Dev probe: [[graft.ops.SnapshotTable]]'s 100-TB claim — MERGE cost
  * is O(delta + touched partitions), never O(table) — measured
  * directly. A base table of `nRows` across `nParts` partitions takes
  * one bulk merge; then two 50k-row deltas of IDENTICAL size merge:
  * one NARROW (all rows land in 5 partitions — the daily-delta shape)
  * and one BROAD (rows spread over every partition — the worst case
  * that degenerates to a full-table read). The narrow/broad gap IS
  * the partition-scoped copy-on-write win; OPTIMIZE's wall prices the
  * deliberate O(table) operation for contrast.
  *
  * usage: SnapshotTableProbe [nRows] [nParts] [deltaRows]
  */
object SnapshotTableProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val nRows = if (args.length > 0) args(0).toLong else 5000000L
    val nParts = if (args.length > 1) args(1).toInt else 200
    val deltaRows = if (args.length > 2) args(2).toLong else 50000L
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
    val root = Scratch.createTempDir("snapprobe")
    try {
      val tbl = s"$root/t"
      def timed[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"PROBE $label wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val base = spark.range(nRows).select(col("id").as("k"),
        (col("id") % 1000).as("v"),
        (col("id") % nParts).cast("int").as("p"))
      timed(s"merge-base rows=$nRows parts=$nParts") {
        SnapshotTable.merge(spark, tbl, base, "k", "v", Seq("p"), Some(1L))
      }
      // NARROW delta: 50k rows, 5 touched partitions (half updates,
      // half inserts — k = i*nParts + i%5 keeps p = k%nParts in 0..4)
      val narrow = spark.range(deltaRows).select(
        (col("id") * nParts + col("id") % 5).as("k"),
        (col("id") % 1000 + 7).as("v"),
        ((col("id") * nParts + col("id") % 5) % nParts).cast("int").as("p"))
      timed(s"merge-narrow rows=$deltaRows touched=5") {
        SnapshotTable.merge(spark, tbl, narrow, "k", "v", Seq("p"), Some(2L))
      }
      // BROAD delta: the SAME row count spread over every partition
      val broad = spark.range(deltaRows).select(
        (col("id") * 17 + 3).as("k"), (col("id") % 1000 + 9).as("v"),
        ((col("id") * 17 + 3) % nParts).cast("int").as("p"))
      timed(s"merge-broad rows=$deltaRows touched=$nParts") {
        SnapshotTable.merge(spark, tbl, broad, "k", "v", Seq("p"), Some(3L))
      }
      timed("optimize (deliberate O(table))") {
        SnapshotTable.optimize(spark, tbl, Seq("p"))
      }
      val m = SnapshotTable.resolve(spark, tbl)
      println(s"PROBE final ver=${m.ver} entries=${m.entries.size} " +
        s"rows=${SnapshotTable.read(spark, tbl).count()}")
    } finally {
      Scratch.deleteRecursively(root)
      spark.stop()
    }
  }
}
