package graft

import org.apache.spark.sql.functions._

/** q44 (approx_count_distinct) can't hash-match a DuckDB oracle — the
  * HLL implementations differ — so its accuracy contract is pinned
  * here instead: within the documented rsd of the exact answer. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on the bench columns") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val err = math.abs(approx - exact) / exact
      assert(err < 0.05, s"${r.getString(0)}: approx=$approx exact=$exact err=$err")
    }
  }
}

/** DataSketches HLL (hll_sketch_agg family): the MERGEABLE distinct
  * sketch — per-partition/per-day sketches union associatively, the
  * shape that replaces re-scanning history for rolling distincts at
  * 100 TB. q99 runs the two-level plan; the contracts live here. */
class HllSketchSpec extends SparkSpec {

  test("hll union of per-day partials == direct global sketch; est near exact") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      .withColumn("_day", date_format(col("l_shipdate"), "yyyy-MM-dd"))
    // two-level: day sketches → union per flag (the q99 plan)
    val merged = li.groupBy(col("l_returnflag"), col("_day"))
      .agg(hll_sketch_agg(col("l_partkey")).as("_sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"))).as("est"))
    // single-level: one global sketch per flag
    val direct = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"),
        countDistinct(col("l_partkey")).as("exact"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d.nonEmpty && m.keySet == d.keySet)
    d.foreach { case (flag, (est, exact)) =>
      // register-wise max-merge is order/partition independent: the
      // unioned estimate must track the direct one
      val mergedEst = m(flag).toDouble
      assert(math.abs(mergedEst - est) / exact < 0.02,
        s"$flag: merged=$mergedEst direct=$est")
      assert(math.abs(est - exact) / exact < 0.03,
        s"$flag: est=$est exact=$exact")
    }
  }

  test("hll estimate stays in the error envelope under repartitioning") {
    // NOT exactly invariant: DataSketches uses the HIP estimator on a
    // single-stream build but falls back to the composite estimator
    // once partials merge, so a different partitioning can shift the
    // estimate a little (measured 2023 vs 1991 on this fixture). The
    // contract that holds — and what matters for planning at scale —
    // is that every merge path lands within the lgK error envelope.
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))))
        .head().getLong(0)
    Seq(est(li), est(li.repartition(17, col("l_orderkey"))),
        est(li.repartition(3))).foreach { e =>
      assert(math.abs(e - exact).toDouble / exact < 0.03,
        s"est=$e exact=$exact")
    }
  }
}

/** Theta sketches (custom TypedImperativeAggregate): distinct sketches
  * whose set INTERSECTION is estimable — q100's operation. Contracts:
  * estimates track exact within the lgK envelope, including through
  * repartitioned (multi-partial merge) builds, and the intersection
  * estimate tracks the exact overlap. */
class ThetaSketchSpec extends SparkSpec {
  import graft.functions.ThetaFunctions._

  test("per-flag sketches: estimate and A∩B intersection track exact") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val sk = li.groupBy(col("l_returnflag"))
      .agg(thetaSketchAgg(col("l_partkey")).as("sk"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Array[Byte]](1), r.getLong(2)))
      .toMap
    assert(sk.size >= 2)
    sk.foreach { case (flag, (bytes, exact)) =>
      val est = graft.functions.ThetaKernels.estimate(bytes)
      assert(math.abs(est - exact) / exact < 0.05, s"$flag: $est vs $exact")
    }
    // exact overlap of two flags vs the sketch intersection
    val Seq(fa, fb) = sk.keys.toSeq.sorted.take(2)
    val exactBoth = li.filter(col("l_returnflag") === fa)
      .select(col("l_partkey")).intersect(
        li.filter(col("l_returnflag") === fb).select(col("l_partkey")))
      .count()
    val estBoth = graft.functions.ThetaKernels.intersectEstimate(
      sk(fa)._1, sk(fb)._1)
    assert(math.abs(estBoth - exactBoth) / exactBoth < 0.08,
      s"intersection: est=$estBoth exact=$exactBoth")
  }

  test("theta sketch build is merge-tolerant (repartitioned == envelope)") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    def est(df: org.apache.spark.sql.DataFrame): Double = {
      val bytes = df.agg(thetaSketchAgg(col("l_partkey")).as("sk"))
        .head().getAs[Array[Byte]]("sk")
      graft.functions.ThetaKernels.estimate(bytes)
    }
    Seq(est(li), est(li.repartition(17, col("l_orderkey")))).foreach { e =>
      assert(math.abs(e - exact) / exact < 0.05, s"est=$e exact=$exact")
    }
  }

  test("theta functions reachable from SQL (extensions registration)") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    li.createOrReplaceTempView("theta_li")
    val r = spark.sql("""
      SELECT theta_estimate(theta_sketch_agg(l_partkey)) AS est
      FROM theta_li""").head().getDouble(0)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(r - exact) / exact < 0.05)
  }
}

/** Frequency estimation via count-min sketch: the mergeable heavy-
  * hitters sketch for 100 TB streams. Spark builds it distributed
  * (partial sketches merge associatively); CMS guarantees
  * est >= true and est <= true + eps*N with prob 1-delta. */
class CountMinSpec extends SparkSpec {

  test("count_min_sketch: overestimates only, within eps*N") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val eps = 0.001
    val n = li.count()
    val sketchBytes = li.select(
      count_min_sketch(col("l_suppkey"), lit(eps), lit(0.99), lit(42))
        .as("s")).head().getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = li.groupBy(col("l_suppkey")).count()
      .orderBy(col("count").desc).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    exact.foreach { case (k, cnt) =>
      val est = cms.estimateCount(k)
      assert(est >= cnt, s"CMS underestimated key $k: $est < $cnt")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"CMS error above eps*N for key $k: est=$est exact=$cnt")
    }
  }
}

/** approx_percentile: Greenwald-Khanna with accuracy a bounds rank
  * error by n/a — pinned against the exact percentile. */
class ApproxPercentileSpec extends SparkSpec {

  test("approx_percentile rank error within n/accuracy") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("x")).cache()
    val n = li.count()
    val acc = 1000
    val Array(approx, exactLo, exactHi) = {
      val a = li.select(expr(s"approx_percentile(x, 0.5, $acc)"))
        .head().getDouble(0)
      // exact values at the rank-error envelope bounds
      val sorted = li.orderBy(col("x")).collect().map(_.getDouble(0))
      val mid = (n * 0.5).toLong.toInt
      val slack = (n / acc).toInt + 1
      Array(a, sorted(math.max(0, mid - slack)),
        sorted(math.min(sorted.length - 1, mid + slack)))
    }
    assert(approx >= exactLo && approx <= exactHi,
      s"approx median $approx outside rank envelope [$exactLo, $exactHi]")
  }
}
