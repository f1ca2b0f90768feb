package graft

import graft.functions.TopKByValue
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  test("top-k aggregator: deterministic result, partial agg in plan") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, 100L), (1L, 30.0, 101L), (1L, 20.0, 102L),
      (1L, 30.0, 99L), // tie on value -> lower id wins rank
      (2L, 5.0, 200L)
    ).toDF("g", "value", "id")
    val topk = TopKByValue.topK(2)
    val out = df.groupBy($"g").agg(topk($"value", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.id".as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0, 99L), (1L, 1, 101L), (2L, 0, 200L)))

    val agg = df.groupBy($"g").agg(topk($"value", $"id").as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    // map-side combine: a partial ObjectHashAggregate/SortAggregate
    // must appear below the exchange
    assert(plan.contains("partial_topkbyvalue") ||
      plan.contains("partial_TopKByValue") ||
      (plan.contains("Aggregate") && plan.contains("partial")),
      s"no partial aggregation stage in:\n$plan")
  }

  test("merge is order-insensitive (repartition invariance)") {
    import spark.implicits._
    val big = (0 until 2000).map(i =>
      ((i % 7).toLong, (i * 37 % 101).toDouble, i.toLong)).toDF("g", "value", "id")
    val topk = TopKByValue.topK(3)
    def run(parts: Int) = big.repartition(parts).groupBy($"g")
      .agg(topk($"value", $"id").as("top"))
      .select($"g", posexplode($"top")).select($"g", $"pos", $"col.id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(1) == run(13))
  }
}
