package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{GraphOps, Urls}

/** End-to-end crawl-graph pipeline probe — the graph-side companion
  * of [[E2eProbe]]'s curation chain: documents with embedded links →
  * link extraction + canonicalization (q185/q160 stages) → host-graph
  * edges → connected components (site communities, q191 stage) +
  * seed-personalized TrustRank (q197 stage) → authority-scored
  * documents with a top-k-per-community digest. Every stage
  * materializes to parquet and is wall-timed in isolation, same
  * discipline as E2eProbe.
  *
  * The synthesized link structure (two deterministic cross-host links
  * per doc over a 499-host universe, host ids parsed from the
  * canonical host string) keeps yields reproducible at any
  * [[ScaleFixture]] size while exercising every stage for real:
  * canonicalization collapses mixed-case/port/fragment spellings,
  * the host graph has genuine community structure (modular link
  * targets), and the seed set is a fixed host-id whitelist.
  *
  * Usage: GraphE2eProbe <fixtureDir> <outDir>. Prints one JSON line:
  * per-stage seconds and output rows. */
object GraphE2eProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stage(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$out/$name")
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$out/$name").count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = true))
      stages += ((name, sec, rows))
      System.err.println(f"[graph-e2e] $name $sec%.2fs $rows rows")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // two cross-host links per doc (messy + clean spellings) over a
    // 499-host universe; the doc's own host is doc_id mod 499
    stage("s0_synth") {
      docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(499)).as("src_host"),
        concat(col("text"),
          lit(" See HTTPS://WWW.Site"),
          pmod(col("doc_id") * 7, lit(499)).cast("string"),
          lit(".example.com:443/a/?z=1#f and http://site"),
          pmod(col("doc_id") * 13 + 1, lit(499)).cast("string"),
          lit(".example.com/b.")).as("text"))
    }

    stage("s1_links") {
      val in = spark.read.parquet(s"$out/s0_synth")
      val links = Urls.extractLinks(in, "text", "doc_id")
      // canonical host → numeric host id (the digits the synthesis
      // planted); joined back to the doc's own host for the edge
      links
        .join(in.select(col("doc_id"), col("src_host")), "doc_id")
        .select(col("doc_id"), col("src_host"),
          regexp_extract(col("dst_host"), "site([0-9]+)\\.", 1)
            .cast("long").as("dst_id"))
        .filter(col("dst_id").isNotNull &&
          col("src_host") =!= col("dst_id"))
        .withColumnRenamed("dst_id", "dst_host")
    }

    stage("s2_components") {
      val e = spark.read.parquet(s"$out/s1_links")
        .select(col("src_host"), col("dst_host")).distinct()
      GraphOps.connectedComponents(e, "src_host", "dst_host")
    }

    stage("s3_trustrank") {
      val e = spark.read.parquet(s"$out/s1_links")
        .select(col("src_host"), col("dst_host")).distinct()
      val seeds = e.select(col("src_host").as("node")).distinct()
        .filter(col("node") < 50)
      GraphOps.pageRankFixedPoint(e, "src_host", "dst_host",
        iters = 3, seedNodes = Some(seeds))
    }

    stage("s4_doc_digest") {
      val in = spark.read.parquet(s"$out/s0_synth")
        .select(col("doc_id"), col("src_host"))
      val comp = spark.read.parquet(s"$out/s2_components")
        .withColumnRenamed("node", "src_host")
      val rank = spark.read.parquet(s"$out/s3_trustrank")
        .withColumnRenamed("node", "src_host")
      val scored = in.join(comp, "src_host").join(rank, "src_host")
      scored
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("rank_micro").desc, col("doc_id"))))
        .filter(col("_rn") <= 5)
        .select(col("component"), col("doc_id"), col("src_host"),
          col("rank_micro"))
    }

    val cells = stages.map { case (n, s, r) =>
      s""""$n":{"sec":${Jfmt.f2(s)},"rows":$r}"""
    }
    println(s"""{"dir":"$dir","stages":{${cells.mkString(",")}}}""")
    spark.stop()
  }
}
