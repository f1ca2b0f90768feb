package graft

import graft.ops.{Scd2, SkewJoin}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join == plain join on skewed keys") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (0 until 5000).map(i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot")).toDF("id", "k")
    val dim = Seq(("hot", 1L), ("k0", 2L), ("k3", 3L)).toDF("k", "v")
    val got = SkewJoin.saltedJoin(big, dim, "k", salt = 8)
      .select("id", "v").as[(Long, Long)].collect().toSet
    val want = big.join(dim, "k")
      .select("id", "v").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("big-side salt is deterministic (stable across re-evaluation)") {
    import spark.implicits._
    val big = (0 until 1000).map(i => (i.toLong, "hot")).toDF("id", "k")
    val dim = Seq(("hot", 1L)).toDF("k", "v")
    val j = SkewJoin.saltedJoin(big, dim, "k", salt = 4)
    // rand()-based salt would make two actions disagree on row counts
    assert(j.count() == j.count())
    assert(j.count() == 1000)
  }

  test("AQE splits the skewed partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // The declarative alternative to hand-salting: AQE observes the
    // skewed shuffle partition at stage boundary and splits it into
    // advisory-size reads. Thresholds lowered so the fixture's hot key
    // (~97% of rows, each padded to ~1 KB) trips the same logic that a
    // hot key trips at TB scale.
    graft.streaming.EventsStream.withConf(spark, Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")) {
      val pad = "x" * 1024
      val big = (0 until 4000).map(i =>
        (i.toLong, if (i % 32 == 0) s"k${i % 7}" else "hot", pad))
        .toDF("id", "k", "pad")
      val dim = (0 until 8).flatMap(i => Seq((s"k$i", i.toLong)))
        .toDF("k", "v").union(Seq(("hot", 99L)).toDF("k", "v"))
      val j = big.join(dim, "k").select("id", "v")
      // collect() the SAME DataFrame whose plan we inspect — a separate
      // count() would spawn its own execution and leave this plan
      // un-finalized
      val n = j.collect().length
      assert(n == 4000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$finalPlan")
    }
  }
}

class Scd2Spec extends SparkSpec {

  test("version chain: contiguous intervals, one current row per key") {
    import spark.implicits._
    val feed = Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-02-01 00:00:00", "b"),
      (1L, "2024-03-01 00:00:00", "c"),
      (2L, "2024-01-15 00:00:00", "x")
    ).toDF("id", "ts_s", "payload")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val v = Scd2.versions(feed, "id", "ts").cache()
    // exactly one current version per key
    val cur = v.filter(col("is_current")).groupBy(col("id")).count()
    assert(cur.collect().forall(_.getLong(1) == 1))
    // valid_to of version n == valid_from of version n+1 (contiguous)
    val rows = v.filter(col("id") === 1L).orderBy(col("valid_from"))
      .select(col("payload"), col("valid_to").cast("string")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(rows(0).getString(1) == "2024-02-01 00:00:00")
    assert(rows(1).getString(1) == "2024-03-01 00:00:00")
    assert(rows(2).getString(1) == null)
  }
}
