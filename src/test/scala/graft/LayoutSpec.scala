package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("reference layout: exact path scheme, one object per partition, prunable read-back") {
    val base = tmpDir("ref_layout")
    val table = "retail_orders"
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
      .select(col("o_orderkey").as("id"),
        col("o_orderdate").cast("string").as("created_at"),
        col("o_totalprice").cast("string").as("total"))
    val keyed = graft.ops.PartitionKeys.withCompanyYearMonth(df, "created_at")
    graft.ops.ReferenceLayout.write(keyed, base, table)

    // the reference's byte-exact path shape (gluejob.py:187): prefixed
    // dirs, unpadded ints, single {table}.parquet object, no marker
    val (y, m) = keyed.select(min("year"), min("month")).collect()(0) match {
      case r => (r.getInt(0), r.getInt(1))
    }
    val sample = new java.io.File(
      s"$base/$table/company=Locaweb/${table}_year=$y/${table}_month=$m/$table.parquet")
    assert(sample.isFile, s"missing ${sample.getPath}")
    assert(!new java.io.File(s"$base/$table/_SUCCESS").exists())
    val leaves = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
    assert(leaves.nonEmpty && leaves.forall(_.endsWith(s"/$table.parquet")))

    // read-back parity with standard column names + partition pruning
    val back = graft.ops.ReferenceLayout.read(spark, base, table)
    assert(back.count() == keyed.count())
    val pruned = back.filter(col("year") === y && col("month") === m)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains(s"${table}_year") && plan.contains("PartitionFilters"),
      plan.take(600))
    assert(pruned.count() ==
      keyed.filter(col("year") === y && col("month") === m).count())
  }

  test("clustered write prunes partitions and pushes sort-column filter") {
    val out = tmpDir("layout") + "/events_clustered"
    val ev = eventsUs(s"${sf()}/events.parquet")
    Layout.writeClustered(ev, out,
      partitionCols = Seq("event_type"), sortCols = Seq("ts_us"))

    val back = spark.read.parquet(out)
      .filter(col("event_type") === "click" && col("ts_us") > 0L)
    val plan = back.queryExecution.executedPlan.toString

    // partition predicate must land in PartitionFilters (pruned before
    // I/O), NOT PushedFilters; the sort-column predicate must be pushed
    // into the parquet reader where row-group stats apply.
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"))
    assert(plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("GreaterThan(ts_us"))

    // pruning: only the click directory is read
    val allParts = Layout.dataFileCount(spark, out)
    val clickParts = Layout.dataFileCount(spark, s"$out/event_type=click")
    assert(clickParts < allParts)
    assert(back.count() ==
      ev.filter(col("event_type") === "click" && col("ts_us") > 0L).count())
  }

  test("compact merges small files to ~target size") {
    val smallDir = tmpDir("layout") + "/small"
    val outDir = tmpDir("layout") + "/compacted"
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    ev.repartition(40).write.mode("overwrite").parquet(smallDir)
    assert(Layout.dataFileCount(spark, smallDir) == 40)
    Layout.compact(spark, smallDir, outDir, targetBytes = 1L << 20)
    val n = Layout.dataFileCount(spark, outDir)
    assert(n < 40)
    assert(spark.read.parquet(outDir).count() == ev.count())
  }
}

class DppSpec extends SparkSpec {

  test("dynamic partition pruning fires on partitioned fact x filtered dim") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("dpp")
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.ops.Layout.writeClustered(orders, s"$dir/orders_part",
      partitionCols = Seq("o_year"), sortCols = Seq("o_orderkey"))
    val fact = spark.read.parquet(s"$dir/orders_part")
    // dim: one row per year, filtered to a single year at runtime
    val dim = fact.select("o_year").distinct()
      .withColumn("pick", col("o_year") % 7)
    val joined = fact.join(dim.filter(col("pick") === 3), Seq("o_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no DPP subquery in plan:\n${plan.take(2000)}")
    assert(joined.count() > 0)
  }
}
