package graft

import graft.ext.{Dedup, Retrieval, Sampling, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Round-5 second wave: exact-substring span removal, hybrid RRF
  * retrieval, deterministic hash split, incremental IVF upsert. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("non-owner spans are cut, owner text survives, short docs untouched") {
    // doc 0 owns "a b c d e f g h"; doc 1 repeats it (prefix), doc 2
    // repeats it mid-text; doc 3 is shorter than k; doc 4 repeats the
    // gram TWICE internally (both occurrences are non-owner).
    val docs = Seq(
      (0L, "a b c d e f g h x y"),
      (1L, "a b c d e f g h tail1 tail2"),
      (2L, "m1 m2 a b c d e f g h m3"),
      (3L, "too short"),
      (4L, "a b c d e f g h z1 z2 z3 z4 z5 z6 a b c d e f g h")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((10L, 0L, "a b c d e f g h x y")))
    assert(out(1L) == ((10L, 8L, "tail1 tail2")))
    assert(out(2L) == ((11L, 8L, "m1 m2 m3")))
    assert(out(3L) == ((2L, 0L, "too short")))
    // doc 4: spans [0,8) and [14,22) — 16 tokens removed, middle kept
    assert(out(4L) == ((22L, 16L, "z1 z2 z3 z4 z5 z6")))
  }

  test("overlapping spans merge into one island (no double count)") {
    // doc 10 owns tokens t0..t9; doc 11 contains t0..t9 → its 8-grams
    // at pos 0,1,2 all duplicate and overlap: one island [0,10).
    val ten = (0 until 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (10L, ten + " u1 u2"),
      (11L, ten + " v1 v2")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(10L) == ((12L, 0L, ten + " u1 u2")))
    assert(out(11L) == ((12L, 10L, "v1 v2")))
  }

  test("everything-removed doc yields empty clean_text, not null") {
    val g = (0 until 8).map(i => s"g$i").mkString(" ")
    val docs = Seq((20L, g), (21L, g)).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out(20L) == ((0L, g)))
    assert(out(21L) == ((8L, "")))
  }
}

class RrfFuseSpec extends SparkSpec {
  import spark.implicits._

  test("rrf sums both sides, single-sided ids contribute one term, ties break by id") {
    val sparse = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val dense = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, "id", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expect = Map(
      1L -> 1.0 / 61, 2L -> (1.0 / 62 + 1.0 / 61),
      3L -> 1.0 / 63, 4L -> 1.0 / 62)
    assert(out.length == 4)
    out.foreach { case (id, rrf, _) => assert(rrf == expect(id), s"id $id") }
    // fused order: 2 (two terms), then 1, then 4, then 3
    assert(out.sortBy(_._3).map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
  }

  test("rankTopN keeps exactly n and ranks dense from 1") {
    val df = (1L to 100L).map(i => (i, (i % 7).toDouble)).toDF("id", "s")
    val top = Retrieval.rankTopN(df, "id", "s", n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // score 6 for ids 6,13,20,27,34 — lowest ids win ties
    assert(top.toSeq.sortBy(_._2) ==
      Seq((6L, 1), (13L, 2), (20L, 3), (27L, 4), (34L, 5)))
  }
}

class HashSplitSpec extends SparkSpec {
  import spark.implicits._

  test("split is total, deterministic, and stable under corpus growth") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val cuts = Seq(("train", 80), ("val", 10), ("test", 10))
    val out = Sampling.hashSplit(docs, "doc_id", cuts)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == docs.count())
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    val n = out.size.toDouble
    val frac = out.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    // stability: assignments on a HALF corpus are the restriction of
    // the full-corpus assignment (the property random split lacks)
    val half = Sampling.hashSplit(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("split")))
    half.foreach { case (id, s) => assert(out(id) == s, s"doc $id moved") }
  }

  test("hashSplit is map-only: zero Exchange in the plan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = Sampling.hashSplit(docs, "doc_id", Seq(("a", 50), ("b", 50)))
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Exchange"), s"shuffle in a map-only split:\n$plan")
  }

  test("percentages must sum to 100") {
    val docs = spark.range(10).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq(("a", 50), ("b", 40)))
    }
  }
}

class IvfUpsertSpec extends SparkSpec {

  test("delta cells match a from-scratch assignment; totals add up") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val out = Similarity.ivfUpsert(base, delta, "vec_id", "embedding",
      nCells = 16).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    out.values.foreach { case (b, d, t) => assert(b + d == t) }
    assert(out.values.map(_._3).sum == emb.count())
    // the base occupancy must equal what a fresh full-corpus upsert
    // with an empty delta reports (the frozen-quantizer invariant)
    val baseOnly = Similarity.ivfUpsert(base, delta.filter(lit(false)),
      "vec_id", "embedding", nCells = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    baseOnly.foreach { case (cell, nb) =>
      assert(out(cell)._1 == nb, s"cell $cell base occupancy drifted")
    }
  }

  test("upsert assignment is windowless (zero-shuffle fold on both sides)") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val df = Similarity.ivfUpsert(emb.filter(col("vec_id") < 400),
      emb.filter(col("vec_id") >= 400), "vec_id", "embedding", nCells = 16)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Window"), s"window argmin resurfaced:\n$plan")
    assert(!plan.contains("windowspecdefinition(n_id"), plan.take(800))
  }
}

class SpanDedupPlanSpec extends SparkSpec {

  test("q128 ownership pass is map-side combinable, no cross product") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = Dedup.dedupSpans(docs, "text", "doc_id", k = 8)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("partial_min") || plan.contains("partial_"),
      s"ownership aggregation lost its map-side combine:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
