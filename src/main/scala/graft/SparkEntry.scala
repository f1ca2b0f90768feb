package graft

import graft.queries.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's primary
    * operator shape (watermarked semi-join delta + aggregation,
    * gluejob.py:548-556) on the TPC-H-ish fixtures. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.join(orders.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "leftsemi")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data extension layer). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL for every oracle-checkable query; keys match
    * `queries`. Non-ANSI-expressible ops (engine-specific hashes,
    * approximate LSH) are omitted → rows-only check. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
