package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._

/** Round-7: authority-weighted sampling (PageRank mass as the mixture
  * prior) and its quota arithmetic. */
class Ext7Spec extends SparkSpec {

  test("authority mixture sample honors rank-proportional quotas " +
      "exactly, binding domain kept whole") {
    import spark.implicits._
    // 12 docs of A, 4 of B; ranks 3e6 vs 1e6 → weights 3:1. Scale =
    // min(12/3e6, 4/1e6) = 4e-6 → quotas floor(3e6·4e-6)=12,
    // floor(1e6·4e-6)=4: A is binding and kept whole here; shrink B's
    // rank to 5e5 → scale = min(4e-6, 8e-6) = 4e-6 → B quota 2.
    val docs = ((1 to 12).map(i => (i.toLong, "A")) ++
      (13 to 16).map(i => (i.toLong, "B"))).toDF("id", "dom")
    val ranks = Seq(("A", 3000000L), ("B", 1000000L))
      .toDF("dom", "rank_micro")
    val kept = Sampling.authorityMixtureSample(docs, "id", "dom", ranks)
      .collect().map(r => r.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(kept == Map("A" -> 12, "B" -> 4))
    val ranks2 = Seq(("A", 3000000L), ("B", 500000L))
      .toDF("dom", "rank_micro")
    val kept2 = Sampling.authorityMixtureSample(docs, "id", "dom", ranks2)
      .collect().map(r => r.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(kept2 == Map("A" -> 12, "B" -> 2))
  }

  test("authority mixture sample drops domains without a rank row and " +
      "picks the deterministic hash-rank subset") {
    import spark.implicits._
    val docs = ((1 to 6).map(i => (i.toLong, "A")) ++
      (7 to 9).map(i => (i.toLong, "C"))).toDF("id", "dom")
    val ranks = Seq(("A", 2000000L), ("B", 1000000L))
      .toDF("dom", "rank_micro")
    val kept = Sampling.authorityMixtureSample(docs, "id", "dom", ranks)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // C has no rank row → dropped entirely; A binds (6/2e6) → keeps
    // all 6. Same membership mixtureSample(Map("A"->2.0)) would pick.
    val viaMap = Sampling.mixtureSample(docs, "id", "dom",
        Map("A" -> 2.0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == viaMap)
    assert(kept.map(_._2) == Set("A") && kept.size == 6)
  }

  test("gopher quality gate: each rule fires on its triggering doc, " +
      "a clean doc passes") {
    import spark.implicits._
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "then runs off to the river bank with great speed today because " +
      "it must be home before dark falls on that quiet valley floor " +
      "where all of the other animals have gathered to rest and wait " +
      "for morning light to come back over the eastern hills again soon")
    val docs = Seq(
      (1L, good),                                    // passes the gate
      (2L, "short text only"),                       // n_words < 50
      (3L, Seq.fill(60)("# ##").mkString(" ")),      // symbol ratio
      (4L, (1 to 30).map(i => s"- item $i the of").mkString("\n")), // bullets
      (5L, Seq.fill(30)("same line of the day").mkString("\n"))     // dup lines
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.gopherQualityFlags(docs, "text",
        "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(9), r.getLong(1), r.getDouble(7))).toMap
    assert(out(1L)._1, s"clean doc rejected: ${out(1L)}")
    assert(!out(2L)._1 && out(2L)._2 == 3L)
    assert(!out(3L)._1)
    assert(!out(4L)._1)
    assert(!out(5L)._1 && out(5L)._3 > 0.9) // 30 lines, 1 distinct
  }

  test("pii redaction replaces emails, ipv4s, digit runs — counts " +
      "audited, placeholders never re-matched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.co.uk or 10.0.255.1 call 5551234567"),
      (2L, "ip 1.2.3.4.5 and short 123456 stay partial v1.2"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.piiRedact(docs, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == ("mail <EMAIL> or <IP> call <NUM>", 1L, 1L, 1L))
    // "1.2.3.4.5": the IPv4 pattern takes "1.2.3.4" (the .5 survives);
    // 6-digit run is below the 7-digit phone floor
    assert(out(2L) == ("ip <IP>.5 and short 123456 stay partial v1.2",
      0L, 1L, 0L))
    assert(out(3L) == ("no pii here at all", 0L, 0L, 0L))
  }

  test("hard negatives exclude same-group candidates and rank by " +
      "exact cosine") {
    import spark.implicits._
    // q=(1,0): A-group candidates must never appear; among B-group,
    // (1,0) dup direction ranks above the orthogonal (0,1)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), "A"),  // query
      (2L, Seq(1.0f, 0.1f), "A"),  // same group — excluded
      (3L, Seq(1.0f, 0.0f), "B"),  // cos 1.0 → rank 1
      (4L, Seq(0.7f, 0.7f), "B"),  // cos ~0.707 → rank 2
      (5L, Seq(0.0f, 1.0f), "C")   // cos 0 → rank 3
    ).toDF("id", "vec", "grp")
    val out = graft.ext.Retrieval.hardNegatives(
        vecs.filter(col("id") === 1L), vecs, "id", "vec", "grp", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(out == Set((1L, 3L, 1), (1L, 4L, 2), (1L, 5L, 3)))
  }

  test("top n-gram stats: run fold finds the argmax gram, smallest on " +
      "ties, exact char fractions, degenerate docs zeroed") {
    import spark.implicits._
    val docs = Seq(
      // "a b" ×3 (wrapping through "b a b"), tie-free; 9 non-ws chars
      (1L, "a b a b a b x"),
      // all bigrams count 1 → tie broken to lexicographically smallest
      (2L, "c d e"),
      (3L, "one"),  // < 2 tokens → zeros
      (4L, "")      // empty
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.topNgramStats(docs, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getDouble(3), r.getString(4), r.getLong(5))).toMap
    // doc1: "a b"×3, gram chars 2, denom 7 ("ababab x"→7 non-ws)
    assert(out(1L)._1 == "a b" && out(1L)._2 == 3L)
    assert(math.abs(out(1L)._3 - 3.0 * 2.0 / 7.0) < 1e-12)
    // doc1 trigrams: "a b a"×2 vs "b a b"×2 → tie → "a b a"
    assert(out(1L)._4 == "a b a" && out(1L)._5 == 2L)
    assert(out(2L)._1 == "c d" && out(2L)._2 == 1L)
    assert(out(3L) == (("", 0L, 0.0, "", 0L)))
    assert(out(4L) == (("", 0L, 0.0, "", 0L)))
  }

  test("shard manifest: totals partition the corpus, checksum is " +
      "order-independent") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, s"doc $i word " * (i % 5 + 1)))
      .toDF("doc_id", "text")
    val asg = graft.ext.Packing.packBudget(docs, "doc_id",
      graft.ext.TextAnalysis.tokenCount(col("text")), budget = 30L,
      bucketSpan = 8L)
    val fp = docs.select(col("doc_id").as("_id"),
      graft.ext.TextAnalysis.fingerprint(col("text")).as("_fp"))
    val m = graft.ext.Packing.shardManifest(asg, fp).collect()
    // every doc in exactly one shard; totals add up
    assert(m.map(_.getLong(1)).sum == 40L)
    val totalTokens = docs.select(sum(
      graft.ext.TextAnalysis.tokenCount(col("text")))).head.getLong(0)
    assert(m.map(_.getLong(2)).sum == totalTokens)
    // checksum ignores row order: recompute from a reversed-id frame
    val m2 = graft.ext.Packing.shardManifest(
      asg.orderBy(col("_id").desc), fp.orderBy(col("_id").desc))
      .collect()
    assert(m.map(r => r.getLong(0) -> r.getLong(5)).toMap ==
      m2.map(r => r.getLong(0) -> r.getLong(5)).toMap)
  }

  test("top n-gram run fold == naive group-count argmax on random " +
      "token streams (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // small alphabet forces heavy repetition and ties — the cases
    // where the run fold's tie-break or run accounting would slip
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "x"))
    val docs = (0 until 60).flatMap(i =>
        tokGen.apply(Gen.Parameters.default, Seed(i.toLong))
          .map(ts => (i.toLong, ts.mkString(" "))))
      .toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.topNgramStats(docs, "text",
        "doc_id", ns = Seq(2))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    val ref = docs.collect().map { r =>
      val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      val best =
        if (grams.isEmpty) ("", 0L)
        else {
          val counts = grams.groupBy(identity).view.mapValues(_.length)
          val (g, c) = counts.toSeq.minBy { case (g, c) => (-c, g) }
          (g, c.toLong)
        }
      r.getLong(0) -> best
    }.toMap
    assert(out == ref)
  }

  test("quality gate, pii redaction, and top-ngram stats are stream-safe: " +
      "streaming run equals the batch run row-for-row") {
    // the three new ops are pure map-only column expressions, so they
    // must compose into readStream→writeStream unchanged — the
    // property that lets one curation definition serve both the batch
    // backfill and the live crawl feed
    val dir = sf()
    val batchDf = spark.read.parquet(s"$dir/documents.parquet")
    def viaStream(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame, name: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val q = f(spark.readStream.schema(batchDf.schema)
          .option("pathGlobFilter", p.getName)
          .parquet(p.getParent.toString))
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table(name).collect().map(_.mkString("|")).toSet
      spark.catalog.dropTempView(name)
      rows
    }
    def ops = Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)](
      ("par_gate", df => graft.ext.TextAnalysis.gopherQualityFlags(
        df, "text", "doc_id")),
      ("par_pii", df => graft.ext.TextAnalysis.piiRedact(
        df, "text", "doc_id")),
      ("par_ngram", df => graft.ext.TextAnalysis.topNgramStats(
        df, "text", "doc_id")))
    ops.foreach { case (name, f) =>
      val streamed = viaStream(f, name)
      val batch = f(batchDf).collect().map(_.mkString("|")).toSet
      assert(streamed == batch, s"$name diverges between stream and batch")
    }
  }
}

/** Physical-shape gates for the round-6/7 heavy chains: the plan
  * properties that make them 100 TB-viable must not silently regress
  * under future edits. */
class Round7PlanShapeSpec extends SparkSpec {
  import graft.queries.Catalog
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  private def executed(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q143 trained-residual chain: the encode barrier is the ONLY " +
      "corpus-keyed exchange; everything else rides the query side") {
    val df = Catalog.all.find(_.name == "q143_ivfpq_residual_trained").get
      .fn(spark, sf())
    val plan = executed(df)
    val ex = "Exchange hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(ex.count(_ == "_id") == 1,
      s"expected exactly the one _id encode barrier, got $ex:\n$plan")
    assert(ex.forall(k => k == "_id" || k == "q_id"),
      s"corpus-keyed exchange beyond the documented barrier: $ex\n$plan")
    assert(!plan.contains("hashpartitioning(n_id"),
      s"index side shuffled on n_id:\n$plan")
  }

  test("q145 pagerank rounds: each per-round plan is join+aggregate, " +
      "never a window; state cut once per round plus the frozen inputs") {
    import spark.implicits._
    val captured = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val cp = new graft.ext.Checkpointer {
      def cut(df: DataFrame): DataFrame = { captured += df; df }
      def release(df: DataFrame): Unit = ()
    }
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    graft.ext.GraphOps.pageRankFixedPoint(edges, "s", "d", iters = 3,
      cp = cp)
    // e, nodes, outDeg + one cut per round — the INITIAL rank state
    // stays lazy since round 20 (a projection of the nodes cut with a
    // single consumer; cutting it was one wasted action per query)
    assert(captured.size == 6, s"expected 6 cuts, got ${captured.size}")
    captured.drop(3).zipWithIndex.foreach { case (round, i) =>
      val plan = round.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Window"),
        s"round ${i + 1} grew a window:\n$plan")
      assert(plan.contains("Join"), s"round ${i + 1} lost its join:\n$plan")
      assert(plan.contains("Aggregate"),
        s"round ${i + 1} lost its aggregate:\n$plan")
    }
  }

  test("q147 bpe training: per-round cluster work is exactly the delta " +
      "job and the word-table cut — no hidden full recount") {
    import spark.implicits._
    val k = 4
    val groupId = "bpe-jobcount-pin"
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(js.properties).exists(
            _.getProperty("spark.jobGroup.id") == groupId))
          counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val corpus = Seq(
        (1L, "abcdefgh abcdefgh abcd ijklmnop ijklmnop ijkl"))
        .toDF("doc_id", "text")
      def jobsFor(rounds: Int): Int = {
        counter.set(0)
        spark.sparkContext.setJobGroup(groupId, "bpe job-count pin")
        val merges = graft.ext.Bpe.train(corpus, "text", rounds).collect()
        spark.sparkContext.clearJobGroup()
        assert(merges.length == rounds)
        Thread.sleep(1000) // listener bus drain
        counter.get
      }
      val j4 = jobsFor(k)
      val j8 = jobsFor(2 * k)
      // a round is the affected-slice delta (2 jobs under AQE's
      // map-stage/result split) plus the word-table cut — NEVER a
      // full pair recount, whose jobs would also scale with corpus
      // aggregations. Setup (word cut + the ONE full pair count) and
      // the merge-list collect are constant, so the job count must be
      // exactly linear in k with slope <= 3.
      assert(j8 - j4 == 3 * k || j8 - j4 == 2 * k,
        s"jobs grew ${j8 - j4} over $k extra rounds (j4=$j4, j8=$j8) — " +
          "per-round work is no longer delta+cut")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
