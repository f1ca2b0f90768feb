package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, TrainMemo, Unigram}

/** Round-9: per-run tokenizer-training memoization ([[TrainMemo]]) —
  * the contract that a catalog/bench run trains each deterministic
  * tokenizer ONCE per distinct input, not once per query. */
class TrainMemoSpec extends SparkSpec {

  import graft.queries.Catalog

  private def docsAt(dir: String, rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    dir
  }

  test("TrainMemo.cached runs the training once per (params, input) " +
      "and replays the identical frame from the memo") {
    TrainMemo.clear()
    val dir = docsAt(tmpDir("memo"),
      Seq((1L, "ab ab cd"), (2L, "ab cd cd")))
    val in = spark.read.parquet(dir)
    var runs = 0
    def go() = TrainMemo.cached("spec:k2", in) {
      runs += 1; Bpe.train(in, "text", k = 2)
    }
    val a = go().orderBy("rank").collect()
    val b = go().orderBy("rank").collect()
    assert(runs == 1, "second call must come from the memo")
    assert(a.toSeq == b.toSeq)
    // a distinct parameter string is a distinct training
    TrainMemo.cached("spec:k1", in) { runs += 1; Bpe.train(in, "text", 1) }
    assert(runs == 2)
  }

  test("memo keys distinguish inputs that render identically: two " +
      "same-schema corpora at different paths train separately, and " +
      "two reads of the SAME path share one entry") {
    TrainMemo.clear()
    val d1 = docsAt(tmpDir("memoA"), Seq((1L, "xy xy xy")))
    val d2 = docsAt(tmpDir("memoB"), Seq((1L, "pq pq pq")))
    val m1 = Bpe.mergesMemoized(spark.read.parquet(d1), "text", k = 1)
    val m2 = Bpe.mergesMemoized(spark.read.parquet(d2), "text", k = 1)
    assert(m1 == Seq(("x", "y")) && m2 == Seq(("p", "q")),
      s"distinct corpora must not share a memo entry: $m1 / $m2")
    val before = Bpe.trainingsStarted.get()
    // independent read of the SAME directory: plan-equality key
    // (InMemoryFileIndex root-path equality) must hit the d1 entry
    val again = Bpe.mergesMemoized(spark.read.parquet(d1), "text", k = 1)
    assert(again == m1)
    assert(Bpe.trainingsStarted.get() == before,
      "re-reading the same path must not retrain")
  }

  test("trainMemoized/vocabMemoized equal their direct counterparts") {
    TrainMemo.clear()
    val dir = docsAt(tmpDir("memoEq"),
      Seq((1L, "the cat sat on the mat"), (2L, "the cat ran"),
        (3L, "mat cat mat")))
    val in = spark.read.parquet(dir)
    assert(Bpe.trainMemoized(in, "text", k = 4).orderBy("rank")
        .collect().toSeq ==
      Bpe.train(in, "text", k = 4).orderBy("rank").collect().toSeq)
    assert(Unigram.trainMemoized(in, "text").orderBy("piece")
        .collect().toSeq ==
      Unigram.train(in, "text").orderBy("piece").collect().toSeq)
    assert(Unigram.vocabMemoized(in, "text").sorted ==
      Unigram.train(in, "text").collect().map(_.getString(0)).toSeq.sorted)
  }

  test("two-stage ANN: re-rank recall >= raw ADC recall in aggregate " +
      "(the lift that justifies the exact stage)") {
    val df = Catalog.all.find(_.name == "q187_two_stage_recall").get
      .fn(spark, sf())
    val agg = df.agg(avg(col("recall_adc")), avg(col("recall_rerank")))
      .head()
    assert(agg.getDouble(1) >= agg.getDouble(0),
      s"re-ranked recall ${agg.getDouble(1)} fell below raw ADC " +
        s"recall ${agg.getDouble(0)} — the exact stage can only " +
        "re-order the candidate set toward the true ranking")
  }

  test("two-stage ANN equals the exact ranking restricted to stage-1 " +
      "candidates, and the plan is candidate-bounded (no cartesian " +
      "product, no partition-less window)") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val two = Similarity.twoStageTopK(q, emb, "vec_id", "embedding",
      k = 3, m = 8)
    // reference: exact cosine rank over EXACTLY the ADC top-8 set
    val cand = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", k = 8)
      .select(col("q_id"), col("n_id"))
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val ref = cand
      .join(vecs.withColumnRenamed("vec_id", "n_id")
        .withColumnRenamed("embedding", "_nv"), "n_id")
      .join(vecs.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("embedding", "_qv"), "q_id")
      .withColumn("_sim", Similarity.cosine(col("_qv"), col("_nv")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("_sim").desc, col("n_id").asc)))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"), col("rank"))
    assert(two.collect().toSet == ref.collect().toSet)
    val phys = two.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      "two-stage plan must never cross corpus-sized sides")
    // the ONLY partition-less windows allowed are densifyCodebook's
    // rank over the nCodewords-row codebook (a constant-bounded frame,
    // same contract as the catalog's TakeOrdered-bounded windows);
    // nothing corpus-sized may rank globally
    val badWindows = two.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty &&
            !w.child.output.exists(_.name.startsWith("_cb")) => w
    }
    assert(badWindows.isEmpty,
      "every corpus-sized ranking window must partition by q_id — a " +
        "global window funnels the corpus through one task:\n" +
        badWindows.mkString("\n"))
  }

  test("BPE maxPairs guard trips loudly on a large-alphabet corpus, " +
      "naming the bound and the observed pair cardinality") {
    import spark.implicits._
    // a CJK-range alphabet: 60 distinct codepoints arranged so nearly
    // every adjacent pair is distinct (~n^2 growth the guard exists
    // for), against a 64-entry bound
    val alpha = (0 until 60).map(i => (0x4E00 + i).toChar)
    val words = for (a <- alpha; b <- alpha) yield s"$a$b"
    val corpus = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      graft.ext.Bpe.train(corpus, "text", k = 32, maxPairs = 64).collect()
    }
    assert(ex.getMessage.contains("maxPairs=64"),
      s"guard must name the bound: ${ex.getMessage}")
    assert("observed >= (\\d+)".r.findFirstMatchIn(ex.getMessage)
        .exists(_.group(1).toInt > 64),
      s"guard must name the observed cardinality: ${ex.getMessage}")
  }

  test("catalog tokenizer family is one BPE + one unigram training " +
      "per run: q147+q148+q157+q158+q161 back to back") {
    TrainMemo.clear()
    val names = Seq("q147_bpe_train", "q148_bpe_encode", "q157_fertility",
      "q158_unigram_train", "q161_tokenizer_compare")
    val bpe0 = Bpe.trainingsStarted.get()
    val uni0 = Unigram.trainingsStarted.get()
    names.foreach { n =>
      val q = Catalog.all.find(_.name == n).getOrElse(
        fail(s"catalog entry $n missing"))
      assert(q.fn(spark, sf()).count() >= 0)
    }
    assert(Bpe.trainingsStarted.get() - bpe0 == 1,
      s"expected exactly ONE BPE training across ${names.size} " +
        s"tokenizer-family queries, got ${Bpe.trainingsStarted.get() - bpe0}")
    assert(Unigram.trainingsStarted.get() - uni0 == 1,
      s"expected exactly ONE unigram training, got " +
        s"${Unigram.trainingsStarted.get() - uni0}")
  }
}
