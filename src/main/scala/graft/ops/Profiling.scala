package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the "analyze table" data-quality report run
  * before a corpus enters training: per-column row/null/distinct
  * counts and min/max rendered as strings (representation-stable for
  * cross-engine comparison; callers format timestamps themselves per
  * the oracle-parity rules).
  *
  * One aggregation pass produces a single wide row that is exploded to
  * long format (column, n_rows, n_nulls, n_distinct, min_s, max_s) —
  * the scan is the only full-data operator. Exact multi-column
  * DISTINCT plans through Spark's Expand (input replicated once per
  * distinct aggregate): exact counts are what an audit wants and what
  * an external engine can replay; at extreme width or scale flip
  * `approximate = true` to swap in HLL sketches (approx_count_distinct,
  * one pass, no Expand) at ±2% error — engine-specific, so no oracle.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String],
      approximate: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    def nd(c: String): Column =
      if (approximate) approx_count_distinct(col(c))
      else countDistinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"), nd(c).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("_n").as("n_rows"),
      (col("_n") - col(s"_nn_$c")).as("n_nulls"),
      col(s"_nd_$c").as("n_distinct"),
      col(s"_mn_$c").as("min_s"),
      col(s"_mx_$c").as("max_s"))): _*)
    wide.select(explode(entries).as("p")).select(col("p.*"))
  }

  /** Fixed-width histogram of a non-negative integral expression —
    * the distribution panel of the profile report (length/token-count
    * histograms drive packing-budget and truncation choices). One
    * map-side-combinable aggregation; buckets are value div width, so
    * the binning needs no data-dependent bounds pass. */
  def histogram(df: DataFrame, value: Column, width: Long): DataFrame = {
    require(width > 0)
    df.select(value.cast("long").as("_v"))
      .withColumn("_bucket", expr(s"_v div ${width}L"))
      .groupBy(col("_bucket"))
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo"),
        max(col("_v")).as("hi"))
      .select(col("_bucket").as("bucket"),
        (col("_bucket") * width).as("bucket_lo"), col("n"),
        col("lo"), col("hi"))
  }

  /** Per-key quantile + winsorized-mean profile from ONE fixed-width
    * histogram pass — the scale-correct percentile panel. Exact
    * percentiles need a per-key global sort (`percentile` collapses
    * each key's values into one aggregation buffer;
    * `approx_percentile` is engine-internal and un-replayable); a
    * fixed-width histogram is ONE map-side-combinable aggregation
    * with bounded state (max value ÷ width buckets per key), and its
    * quantile estimates — the LOWER EDGE of the first bucket whose
    * running count reaches ⌈q·n/100⌉ — are deterministic integers any
    * engine replays (q193). Resolution is ±width by construction:
    * tune width to the tolerance the dashboard needs.
    *
    * Winsorized mean: values clipped at the top requested quantile's
    * bucket UPPER edge — the robust per-domain "typical length" that
    * one 10^6-token pathological document cannot drag (the reason
    * curation dashboards winsorize). Emitted in micro-units by
    * integral division, DECIMAL(38,0) intermediates.
    *
    * Plan: the slim (key, value) projection is cut once
    * ([[graft.ext.Checkpointer]] discipline — the histogram branch
    * and the clip pass both consume it; without the cut each would
    * re-derive the value expression, the expensive tokenize at
    * 100 TB); the cumulative window runs over the per-(key, bucket)
    * COUNT table (keys × buckets rows, not the corpus); the clip pass
    * joins a broadcast per-key cap table. Returns one row per key:
    * (key, n_rows, p<q>_lo per quantile, winsor_mean_micro). */
  def quantileProfile(df: DataFrame, keyCol: String, value: Column,
      width: Long, quantiles: Seq[Int] = Seq(50, 95, 99),
      cp: graft.ext.Checkpointer = graft.ext.LocalCheckpoint)
      : DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 1 && q <= 100),
      s"quantiles must be percentages in [1, 100], got $quantiles")
    import org.apache.spark.sql.expressions.Window
    val slim = cp.cutShared(
      df.select(col(keyCol).as("_k"), value.cast("long").as("_v")),
      Seq("_k"))
    val hist = slim
      .groupBy(col("_k"), expr(s"_v div ${width}L").as("_b"))
      .agg(count(lit(1)).as("_c"))
    val wK = Window.partitionBy(col("_k"))
    val cu = hist
      .withColumn("_cum", sum(col("_c")).over(wK.orderBy(col("_b"))))
      .withColumn("_n", sum(col("_c")).over(wK))
    val qAggs = quantiles.map { q =>
      min(when(col("_cum") >= expr(s"(${q}L * _n + 99) div 100"),
        col("_b"))).as(s"_b$q")
    }
    val qs = cu.groupBy(col("_k"))
      .agg(max(col("_n")).as("n_rows"), qAggs: _*)
    val top = quantiles.max
    val caps = qs.select(col("_k"),
      ((col(s"_b$top") + 1) * width - 1).as("_cap"))
    val winsor = slim.join(broadcast(caps), "_k")
      .groupBy(col("_k"))
      .agg(sum(least(col("_v"), col("_cap")))
        .cast("decimal(38,0)").as("_ws"))
    val outQ = quantiles.map(q =>
      (col(s"_b$q") * width).as(s"p${q}_lo"))
    qs.join(winsor, "_k")
      .select(col("_k").as(keyCol) +: col("n_rows") +: outQ :+
        expr("CAST((_ws * 1000000) div n_rows AS BIGINT)")
          .as("winsor_mean_micro"): _*)
  }
}
