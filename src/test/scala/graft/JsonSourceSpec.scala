package graft

import graft.sources.JsonSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("updated_at", StringType)))

  test("jsonl roundtrip with explicit schema; corrupt lines quarantined") {
    val dir = tmpDir("jsonl")
    val f = java.nio.file.Paths.get(dir, "feed.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "a", "updated_at": "2026-01-01 00:00:00"}
        |{"id": 2, "name": "b", "updated_at": "2026-01-02 00:00:00"}
        |{not json at all
        |{"id": 3, "name": "c", "updated_at": "2026-01-03 00:00:00"}
        |""".stripMargin)

    // suites share one session and some exercise internally-checkpointing
    // operators whose blocks the ContextCleaner reclaims lazily — so the
    // release() contract is "no NEW pinned storage", not a globally
    // empty map (the global assert was flaky under suite-order/GC timing)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val split = JsonSource.split(JsonSource.read(spark, schema, dir))
    assert(split.good.columns.toSeq == Seq("id", "name", "updated_at"))
    assert(split.good.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    val quarantined = split.quarantined.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined(0).startsWith("{not json"))
    // release() frees the shared parsed cache (no pinned storage after)
    split.release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }

  test("json sink roundtrip preserves values") {
    val dir = tmpDir("jsonl") + "/out"
    val df = spark.read.parquet(s"${sf()}/nation.parquet")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.orderBy(col("n_nationkey")).collect().toSeq ==
      df.orderBy(col("n_nationkey")).collect().toSeq)
  }
}

class OrcSourceSpec extends SparkSpec {

  test("orc roundtrip: parity with the parquet fixture + pushdown") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("orc_rt")
    graft.sources.OrcSource.write(src, s"$dir/orders_orc")
    val back = graft.sources.OrcSource.read(spark, s"$dir/orders_orc")
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // predicate + projection reach the ORC scan like they do on parquet
    val plan = back.filter(col("o_orderkey") < 100)
      .select("o_orderkey", "o_orderstatus")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]"),
      s"missing ORC pushdown in:\n$plan")
  }
}
