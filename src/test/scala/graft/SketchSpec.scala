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
