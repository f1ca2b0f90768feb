package graft

import org.apache.spark.sql.functions._

import graft.ext.{FrameMemo, SuffixDedup}

/** Round-9: per-session memoization of distributed intermediates —
  * the contract that a catalog run derives the ExactSubstr span
  * table ONCE per (corpus, spanLen) and that q188/q189 share it. */
class FrameMemoSpec extends SparkSpec {

  import spark.implicits._

  private def corpusAt(dir: String): String = {
    val rows = Seq(
      (1L, "a b c d e f g h i j k l m n"),
      (2L, "x a b c d e f g h i j k l z"), // shares a 12-token run
      (3L, "p q r s t u v w"),
      (4L, "a b c d e f g h i j k l m n")) // exact dup of doc 1
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    dir
  }

  test("duplicateSpansMemoized computes once per (input, spanLen) and " +
      "replays the identical span table; stripSpansMemoized shares it") {
    FrameMemo.clear()
    val dir = corpusAt(tmpDir("fmemo"))
    val before = FrameMemo.computes.get()
    def spans() = SuffixDedup.duplicateSpansMemoized(
      spark.read.parquet(dir), "text", "doc_id", spanLen = 12)
    val a = spans().orderBy("doc_id", "span_start").collect().toSeq
    val b = spans().orderBy("doc_id", "span_start").collect().toSeq
    assert(FrameMemo.computes.get() == before + 1,
      "second call must replay the checkpoint, not re-derive")
    assert(a == b && a.nonEmpty)
    // the memoized table equals the direct derivation
    val direct = SuffixDedup.duplicateSpans(
        spark.read.parquet(dir), "text", "doc_id", spanLen = 12)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(a == direct)
    // stripSpansMemoized consumes the SAME entry — no new computation
    val stripped = SuffixDedup.stripSpansMemoized(
        spark.read.parquet(dir), "text", "doc_id", spanLen = 12)
      .orderBy("doc_id").collect().toSeq
    assert(FrameMemo.computes.get() == before + 1)
    val strippedDirect = SuffixDedup.stripSpans(
        spark.read.parquet(dir), "text", "doc_id", spanLen = 12)
      .orderBy("doc_id").collect().toSeq
    assert(stripped == strippedDirect)
  }

  test("memo keys distinguish spanLen and corpus: different parameters " +
      "or inputs never share an entry; clear() forgets") {
    FrameMemo.clear()
    val d1 = corpusAt(tmpDir("fmemoA"))
    val before = FrameMemo.computes.get()
    SuffixDedup.duplicateSpansMemoized(
      spark.read.parquet(d1), "text", "doc_id", 12).count()
    SuffixDedup.duplicateSpansMemoized(
      spark.read.parquet(d1), "text", "doc_id", 4).count()
    assert(FrameMemo.computes.get() == before + 2,
      "distinct spanLen must be a distinct derivation")
    assert(FrameMemo.size == 2)
    FrameMemo.clear()
    assert(FrameMemo.size == 0)
    SuffixDedup.duplicateSpansMemoized(
      spark.read.parquet(d1), "text", "doc_id", 12).count()
    assert(FrameMemo.computes.get() == before + 3,
      "clear() must force re-derivation")
    FrameMemo.clear()
  }
}
