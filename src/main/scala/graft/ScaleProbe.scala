package graft

import org.apache.spark.sql.SparkSession

/** Two-point scaling probe for the dedup/ANN family: run the
  * documents/embeddings-only catalog queries against two fixture
  * dirs (e.g. sf0.1 and a [[ScaleFixture]]-generated 5× set) and
  * print per-query seconds side by side as ONE JSON line. The
  * interesting read is the growth RATIO against the row ratio —
  * blocked/banded/bucketed operators must grow sub-quadratically
  * (the all-pairs death is the thing the plan shapes rule out).
  *
  * Usage: ScaleProbe <dirA> <dirB> [names,comma,separated] */
object ScaleProbe {

  val DefaultNames: Seq[String] = Seq(
    "q20_dedup_exact", "q21_dedup_normkey", "q22_ngram_jaccard",
    "q51_dedup_clusters", "q118_minhash_portable",
    "q137_simhash_portable", "q140_line_dedup", "q160_url_dedup",
    "q25_cosine_topk", "q35_ivf_ann", "q143_ivfpq_residual_trained",
    "q151_authority_sample", "q158_unigram_train")

  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val names = if (args.length > 2) args(2).split(",").toSeq
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
    def run(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // the Bench hygiene rule: nothing may stay pinned between runs
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = true))
      (sec, n)
    }
    // warm the JVM/codegen on the smaller dir before timing
    run(names.head, dirA)
    val cells = names.map { n =>
      val (sa, ra) = run(n, dirA)
      val (sb, rb) = run(n, dirB)
      s""""$n":{"a_sec":${Jfmt.f2(sa)},"b_sec":${Jfmt.f2(sb)},"a_rows":$ra,"b_rows":$rb}"""
    }
    println(s"""{"dirA":"$dirA","dirB":"$dirB","queries":{${
      cells.mkString(",")}}}""")
    spark.stop()
  }
}
