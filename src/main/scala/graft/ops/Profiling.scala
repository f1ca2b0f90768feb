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
}
