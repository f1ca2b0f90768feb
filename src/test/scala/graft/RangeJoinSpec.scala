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

  test("optimizer rule rewrites a RAW theta range join to the binned plan") {
    import spark.implicits._
    val l = (0L until 300L).map(i => (i, i * 41L % 5000L)).toDF("lid", "lts")
    val r = (0L until 500L).map(i => (i, i * 29L % 5000L)).toDF("rid", "rts")
    // plain user-written theta join — no RangeJoin helper involved
    val joined = l.join(r, $"rts" >= $"lts" && $"rts" < $"lts" + 700L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire:\n$plan")
    // ground truth via an rule-proof formulation: residual filter after
    // a cross join on a tiny fixture, computed driver-side
    val lRows = l.as[(Long, Long)].collect()
    val rRows = r.as[(Long, Long)].collect()
    val want = (for { (lid, lts) <- lRows; (rid, rts) <- rRows
      if rts >= lts && rts < lts + 700L } yield (lid, rid)).toSet
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("rule leaves equi joins and bounded-below-only joins alone") {
    import spark.implicits._
    val l = (0L until 50L).map(i => (i, i * 10L)).toDF("lid", "lts")
    val r = (0L until 50L).map(i => (i, i * 10L)).toDF("rid", "rts")
    val equi = l.join(r, $"lid" === $"rid" && $"rts" >= $"lts")
    assert(!equi.queryExecution.executedPlan.toString.contains("_graft_bin"))
    val halfOpen = l.join(r, $"rts" >= $"lts") // no upper bound: not binnable
    assert(!halfOpen.queryExecution.executedPlan.toString.contains("_graft_bin"))
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
