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
