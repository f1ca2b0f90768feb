package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Packing, Sampling, TextAnalysis, Urls}

/** End-to-end web-curation pipeline probe — the composed run a
  * platform review reads: raw documents → C4/script/blocklist/line
  * curation (q183's stage) → canonical-URL dedup (q160) →
  * MinHash-LSH near-dup removal (q118) → per-domain token-budget
  * sampling (q181) → sequence packing (q104), every stage
  * MATERIALIZED to parquet (what a production pipeline does between
  * stages) and wall-timed in isolation: each stage reads its
  * predecessor's parquet, so a stage's time is its own scan +
  * compute + write, not a fused lazy chain.
  *
  * Inputs are the documents fixture plus the catalog's deterministic
  * synth columns (q183's line structure for gate behavior — raw
  * fixture text has no sentence punctuation, so the C4 gate would
  * trivially empty the corpus — and q160's four-encodings URL per
  * doc), so stage yields are realistic and reproducible at any
  * [[ScaleFixture]] size. The token budget is held CONSTANT across
  * scales (a budget is an epoch-size decision, not a corpus
  * property); the budget-sample stage still scans and cumsums every
  * surviving row, so its wall time scales with the corpus, only the
  * output saturates.
  *
  * Usage: E2eProbe <fixtureDir> <outDir> [cap]. Prints one JSON
  * line: per-stage seconds and output rows. With cap > 0 the
  * near-dup stage (s3) runs the ADVERSARIAL-CORPUS mode instead of
  * the MinHash banding: the q233 capped exact prefix join
  * ([[graft.ext.Curation.nearDupDropCapped]]), bounding per-doc
  * verify work at `cap` candidates per orientation; the truncation
  * ledger lands in `<outDir>/s3_ledger` and its totals
  * (docs_truncated, slots_dropped) ride the JSON line — the loud
  * price sheet of the SLA bound.
  *
  * With a 4th arg `media`, the pipeline runs MULTIMODAL: an image
  * near-dup stage (s2m) lands between URL dedup and text near-dup —
  * each surviving doc's image decodes through the real codec chain
  * and mirror-aware dHash pairs drop the higher id of every match
  * ([[graft.ext.Images.dHashNearDupPairsMirrorAware]]), so a
  * mirrored-repost page is gone before the text stages pay for it.
  * Payload bytes never leave their partitions; only 16-byte
  * fingerprints shuffle. */
object E2eProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val cap = if (args.length > 2) args(2).toInt else 0
    val media = args.length > 3 && args(3) == "media"
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
      // Bench hygiene between stages
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = true))
      stages += ((name, sec, rows))
      System.err.println(f"[e2e] $name $sec%.2fs $rows rows")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // q183's synthesized line structure: kept intro line, two
    // boilerplate lines (one javascript-gated, one line-dedup'd),
    // a 4-in-5 good line, a 1-in-7 Cyrillic page, a 1-in-11 blocklist
    // hit — the gate-yield mix the curation stage is specified on
    val cyr = "Русские буквы тут доминируют над всеми латинскими " +
      "символами страницы целиком и полностью без сомнений и каждое " +
      "дополнительное слово усиливает их численное превосходство."
    val lines = array(
      concat(lit("Intro about "), substring(col("text"), 1, 40),
        lit(" here.")),
      lit("please enable javascript now."),
      lit("Share this article on social media today."),
      when(pmod(col("doc_id"), lit(5)) =!= 0,
        lit("One more good sentence. And another one here! " +
          "Plus a third?")),
      when(pmod(col("doc_id"), lit(7)) === 0, lit(cyr)),
      when(pmod(col("doc_id"), lit(11)) === 0,
        lit("Contains zzzspam and zzzscam words here.")))
    stage("s0_synth") {
      docs.select(col("doc_id"), col("source"),
        array_join(filter(lines, l => l.isNotNull), "\n").as("text"))
    }

    stage("s1_curate") {
      val in = spark.read.parquet(s"$out/s0_synth")
      Curation.webCurate(in, "text", "doc_id",
          terms = Seq("zzzspam", "zzzscam"), minLineWords = 3,
          minSentences = 2, maxHits = 2, minDocFreq = 3)
        .join(in.select(col("doc_id"), col("source")), "doc_id")
    }

    stage("s2_url_dedup") {
      val in = spark.read.parquet(s"$out/s1_curate")
      // q160's four deterministic encodings of the same logical page;
      // the host derives from the PAGE (a crawl fetches one page under
      // several url spellings) — a per-doc host would make every canon
      // url unique and the stage a no-op
      val page = (col("doc_id") / 4).cast("long")
      val host = concat(lit("site"), pmod(page, lit(50)))
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("HTTP://WWW."), upper(host),
            lit(".COM:80/Pg/"), page, lit("/?b=2&a=1#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://"), host,
            lit(".com/Pg/"), page, lit("?a=1&b=2")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("HTTPS://"), upper(host),
            lit(".com:443/Pg/"), page, lit("/ix.html#x")))
        .otherwise(
          concat(lit("https://"), host,
            lit(".com/Pg/"), page, lit("/ix.html")))
      val keepers = Urls.canonicalDedup(
        in.select(col("doc_id"), url.as("url")), "url", "doc_id")
        .select(col("keeper_id").as("doc_id"))
      in.join(keepers, "doc_id")
    }

    val s3input = if (media) "s2m_image_dedup" else "s2_url_dedup"
    if (media) {
      stage("s2m_image_dedup") {
        val in = spark.read.parquet(s"$out/s2_url_dedup")
        val drops = graft.ext.Images.dHashNearDupPairsMirrorAware(
            spark, in.select(col("doc_id")), "doc_id", maxDist = 2)
          .select(col("doc_b").as("doc_id")).distinct()
        in.join(drops, Seq("doc_id"), "left_anti")
      }
    }

    val s3name = if (cap > 0) "s3_neardup_capped" else "s3_minhash_dedup"
    stage(s3name) {
      val in = spark.read.parquet(s"$out/$s3input")
      if (cap > 0) {
        val (survivors, ledger) = Curation.nearDupDropCapped(in,
          "clean_text", "doc_id", maxCandidates = cap)
        ledger.write.mode("overwrite").parquet(s"$out/s3_ledger")
        survivors
      } else {
        val drops = Dedup.minHashLshPairsPortable(in, "clean_text",
            "doc_id", n = 3, numPerms = 16, rowsPerBand = 4,
            threshold = 0.5)
          .select(col("doc_b").as("doc_id")).distinct()
        in.join(drops, Seq("doc_id"), "left_anti")
      }
    }

    stage("s4_token_budget") {
      val in = spark.read.parquet(s"$out/$s3name")
        .withColumn("n_tokens",
          TextAnalysis.tokenCount(col("clean_text")).cast("long"))
      Sampling.tokenBudgetSample(in, "doc_id", "source", "n_tokens",
        budgetTokens = 30000L,
        weightsMicro = Seq("src0" -> 500000L, "src1" -> 250000L,
          "src2" -> 150000L, "src3" -> 100000L))
    }

    stage("s5_pack") {
      val in = spark.read.parquet(s"$out/s4_token_budget")
      Packing.packBudget(in, "doc_id", col("n_tokens"),
          budget = 1024L, bucketSpan = 64L)
        .withColumnRenamed("_id", "doc_id")
    }

    val cells = stages.map { case (n, s, r) =>
      s""""$n":{"sec":${Jfmt.f2(s)},"rows":$r}"""
    }
    val ledgerCell =
      if (cap <= 0) ""
      else {
        val l = spark.read.parquet(s"$out/s3_ledger")
          .agg(count(lit(1)), coalesce(sum(col("n_dropped")), lit(0L)))
          .collect()(0)
        s""","cap":$cap,"ledger":{"docs_truncated":${l.getLong(0)},""" +
          s""""slots_dropped":${l.getLong(1)}}"""
      }
    println(s"""{"dir":"$dir","stages":{${cells.mkString(",")}}$ledgerCell}""")
    spark.stop()
  }
}
