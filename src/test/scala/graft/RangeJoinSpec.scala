package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned interval join == naive theta join, incl. boundary rows") {
    import spark.implicits._
    // deterministic fixture with rows ON the bin edges: ts multiples of
    // len, len-1, len+1 — the cases double division would mis-bin
    val len = 1000L
    val l = (0L until 400L).map(i => (i, i * 37L % 7000L)).toDF("lid", "lts")
    val r = (0L until 600L).map(i => (i, i * 23L % 7000L + (i % 3))).toDF("rid", "rts")
    val got = RangeJoin.intervalJoin(l, "lts", r, "rts", len)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = l.join(r, $"rts" >= $"lts" && $"rts" < $"lts" + len)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("plan is an equi hash join, not BroadcastNestedLoop/Cartesian") {
    import spark.implicits._
    val l = (0L until 50L).map(i => (i, i * 100L)).toDF("lid", "lts")
    val r = (0L until 50L).map(i => (i, i * 90L)).toDF("rid", "rts")
    val plan = RangeJoin.intervalJoin(l, "lts", r, "rts", 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
