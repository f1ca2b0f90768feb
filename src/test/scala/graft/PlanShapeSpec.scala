package graft

import graft.queries.Catalog
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.DataFrame

/** Plan-shape assertions for the catalog's scale-critical queries: at
  * 100 TB these properties (broadcast of dims, scan-level pushdown,
  * map-side partial aggregation) are the difference between one shuffle
  * of the fact table and several — the small-SF run only proves the
  * plan WOULD have that shape. AQE finalizes joins at runtime, so the
  * stream is materialized first and the final plan inspected. */
class PlanShapeSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.count() // let AQE re-plan with runtime stats
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def run(name: String): DataFrame =
    Catalog.all.find(_.name == name).get.fn(spark, sf("sf0.01"))

  test("q54 multi-join agg: dimension chain broadcasts; fact scan pruned") {
    val plan = finalPlan(run("q54_join_agg"))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected dim-side broadcasts, got:\n$plan")
    // lineitem scan must read only the join/agg columns
    val readSchema = plan.linesIterator
      .filter(_.contains("lineitem")).mkString
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"))
  }

  test("q01 pricing summary: partial (map-side) aggregation before the shuffle") {
    val plan = finalPlan(run("q01_pricing_summary"))
    // partial agg marker appears in both hash-agg flavors
    assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
    // shipdate filter reaches the parquet reader
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate")
      || plan.contains("LessThan(l_shipdate"), s"filter not pushed:\n$plan")
  }

  test("q03 semi-join: delta side broadcasts as LeftSemi") {
    val plan = finalPlan(run("q03_semijoin_2way"))
    assert(plan.contains("LeftSemi"), s"semi-join lost:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast semi:\n$plan")
  }

  test("runtime bloom-filter injection prunes the fact side of a filtered dim join") {
    // At 100 TB the dim filter's bloom sketch is broadcast and applied
    // AT THE FACT SCAN, skipping rows before the shuffle. Size
    // thresholds are tuned for clusters, so pin them down to let the
    // optimizer fire at test scale.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "500MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast joins use their own runtime DPP
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = sf("sf0.01")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val j = li.join(orders,
        li("l_orderkey") === orders("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q02 filter+project: predicate and projection reach the scan") {
    val plan = finalPlan(run("q02_filter_project"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"no pushed filter:\n$plan")
  }
}
