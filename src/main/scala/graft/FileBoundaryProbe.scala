package graft

import org.apache.spark.sql.functions.col

/** Dev micro-probe: time the file-boundary pieces of q249 in
  * isolation — landing write, Hadoop recursive listing (the
  * packTarget walk), binaryFile DataFrame creation, metadata-only
  * count, payload count, full ingestAudit — to localize driver-side
  * gaps that stage timings can't see. */
object FileBoundaryProbe {
  def main(args: Array[String]): Unit = {
    Scratch.preferTmpfs()
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val landing = Scratch.createTempDir("fbp").toString
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PIECE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
      t("write")(graft.ext.MediaFiles.writeMediaFiles(
        graft.ext.Multimodal.syntheticMixedFrame(spark, docs, "doc_id"),
        landing))
      t("hadoopListing") {
        val p = new org.apache.hadoop.fs.Path(landing)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        var n = 0
        val it = fs.listFiles(p, true)
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      val df = t("readMediaFiles-create")(
        graft.ext.MediaFiles.readMediaFiles(spark, landing))
      t("metaCount")(df.select(col("media_id")).count())
      t("payloadCount")(
        df.select(col("media_id"), col("payload")).count())
      t("ingestAudit")(
        graft.ext.MediaFiles.ingestAudit(spark, landing).count())
      t("ingestAudit2")(
        graft.ext.MediaFiles.ingestAudit(spark, landing).count())
    } finally {
      Scratch.deleteRecursively(java.nio.file.Paths.get(landing))
      spark.stop()
    }
  }
}
