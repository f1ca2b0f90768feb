package graft

import org.apache.spark.sql.functions._

import graft.ext.Packing
import graft.ops.Profiling

/** Round-9: one-pass histogram quantile profiles and length-bucketed
  * padded batching — parity against exact references computed
  * in-test, winsorization robustness, and the bucketSpan-invariance
  * pin on the two-phase (no-global-window) rank reconstruction. */
class ProfilePackSpec extends SparkSpec {

  import spark.implicits._

  test("quantileProfile picks the ceil-threshold bucket edge and " +
      "lands within one width of the exact percentile on skewed data") {
    // heavy-tailed: many small, few huge
    val vals = (1L to 400L).map(i => (i, i % 37 + 3)) ++
      (401L to 410L).map(i => (i, 900L + i))
    val df = vals.toDF("id", "v").withColumn("k", lit("a"))
    val width = 10L
    val got = Profiling.quantileProfile(df, "k", col("v"), width)
      .head()
    val sorted = vals.map(_._2.toLong).sorted
    def exact(q: Int): Long = sorted((q * sorted.size + 99) / 100 - 1)
    def bucketLo(q: Int): Long = {
      // the contract: lower edge of the first bucket whose running
      // count reaches ceil(q*n/100)
      val hist = sorted.groupBy(_ / width).toSeq.sortBy(_._1)
      val thr = (q.toLong * sorted.size + 99) / 100
      var cum = 0L
      hist.collectFirst {
        case (b, vs) if { cum += vs.size; cum >= thr } => b * width
      }.get
    }
    val (p50, p95, p99) =
      (got.getAs[Long]("p50_lo"), got.getAs[Long]("p95_lo"),
        got.getAs[Long]("p99_lo"))
    assert(p50 == bucketLo(50) && p95 == bucketLo(95) && p99 == bucketLo(99))
    assert(math.abs(p50 - exact(50)) <= width &&
      math.abs(p95 - exact(95)) <= width &&
      math.abs(p99 - exact(99)) <= width)
    // winsorized mean: clipped at the p99 bucket's upper edge, so the
    // 10 ~1300-token outliers contribute at most cap each
    val cap = (bucketLo(99) / width + 1) * width - 1
    val wantWinsor = sorted.map(math.min(_, cap)).sum * 1000000L / sorted.size
    assert(got.getAs[Long]("winsor_mean_micro") == wantWinsor)
  }

  test("quantileProfile keys independently: each key's quantiles see " +
      "only its own rows") {
    val df = ((1L to 50L).map(i => ("lo", i % 5 + 1)) ++
      (1L to 50L).map(i => ("hi", 1000L + i % 5)))
      .toDF("k", "v")
    val rows = Profiling.quantileProfile(df, "k", col("v"), 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("p50_lo")).toMap
    assert(rows("lo") == 0L && rows("hi") == 1000L)
  }

  test("bucketBatches matches the brute-force pad computation and " +
      "partitions every sequence exactly once") {
    val docs = (0L until 137L).map(i => (i, (i * 13 + 5) % 97 + 1))
    val df = docs.toDF("id", "tok")
    val (bw, bs) = (16L, 8)
    val got = Packing.bucketBatches(df, "id", col("tok"), bw, bs)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_seqs"), r.getAs[Long]("n_batches"),
          r.getAs[Long]("pad_tokens"), r.getAs[Long]("padded_tokens"))))
      .toMap
    // brute force: per bin in id order, batches of bs, pad to batch max
    val want = docs.groupBy(_._2 / bw).map { case (lb, ds) =>
      val batches = ds.sortBy(_._1).map(_._2).grouped(bs).toSeq
      val padded = batches.map(b => b.max * b.size).sum
      val pad = batches.map(b => b.max * b.size - b.sum).sum
      lb -> ((ds.size.toLong, batches.size.toLong, pad, padded))
    }
    assert(got == want)
    assert(got.values.map(_._1).sum == 137L)
  }

  test("bucketBatches is bucketSpan-invariant: the two-phase rank " +
      "reconstruction equals the single-window formulation") {
    val docs = (0L until 200L).map(i => (i, (i * 7 + 3) % 50 + 1))
    val df = docs.toDF("id", "tok")
    val a = Packing.bucketBatches(df, "id", col("tok"), 8L, 4,
      bucketSpan = 65536L).orderBy("len_bucket").collect().toSeq
    val b = Packing.bucketBatches(df, "id", col("tok"), 8L, 4,
      bucketSpan = 7L).orderBy("len_bucket").collect().toSeq
    assert(a == b)
  }
}
