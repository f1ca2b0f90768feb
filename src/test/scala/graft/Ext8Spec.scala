package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Round-8 plan-shape pins: the q151 node-id fix (no global window on
  * the domain set) and the no-pinned-storage contract for the two
  * queries that previously cut in-plan (q151's sampler chain, q83's
  * fingerprint frame). */
class Round8PlanShapeSpec extends SparkSpec {

  import graft.queries.Catalog

  private def globalWindows(plan: LogicalPlan): Seq[LWindow] =
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }

  private def run(name: String): DataFrame = {
    val df = Catalog.all.find(_.name == name).get.fn(spark, sf())
    df.count()
    df
  }

  test("q151 authority sample: no single-partition global window " +
      "anywhere in the plan — node ids ride a hash-keyed aggregate") {
    val df = Catalog.all.find(_.name == "q151_authority_sample").get
      .fn(spark, sf())
    val bad = globalWindows(df.queryExecution.optimizedPlan)
    assert(bad.isEmpty,
      s"q151 grew ${bad.size} partition-less window(s) — every distinct " +
        s"domain would funnel through ONE task at crawl scale:\n" +
        bad.map(_.windowExpressions.mkString(", ")).mkString("\n"))
  }

  test("q151 and q83 pin no persistent storage: barriers, not " +
      "checkpoints, for lazily-returned catalog compositions") {
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    run("q151_authority_sample")
    run("q83_bloom_blocklist")
    // "no NEW pinned storage" rather than a global isEmpty: suites
    // share the session and run in parallel (JsonSourceSpec documents
    // the same pattern)
    assert(spark.sparkContext.getPersistentRDDs.keySet
        .subsetOf(pinnedBefore),
      "q151/q83 must not pin blocks a lazy catalog frame cannot release")
  }

  test("quotaSelect barrier shape: the corpus is shuffled+sorted exactly " +
      "once (the REPARTITION_BY_COL barrier under the rank window); every " +
      "other (dom,_bkt) exchange ships only post-partial-agg sliver rows") {
    import spark.implicits._
    val docs = (1 to 400).map(i => (i.toLong, "d" + (i % 7))).toDF("id", "dom")
    val out = graft.ext.Sampling.mixtureSample(docs, "id", "dom",
      Map("d0" -> 1.0, "d1" -> 2.0, "d2" -> 1.0), nBuckets = 8)
    out.count()
    val plan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    // exactly one explicit barrier (the window's distribution), and
    // exactly one corpus sort (the rank window's) — a second would
    // mean the offsets branch re-sorted the data side
    val barriers = "REPARTITION_BY_COL".r.findAllMatchIn(plan).size
    assert(barriers == 1,
      s"expected ONE repartition barrier, got $barriers:\n$plan")
    val windows = "(?m)^\\s*(?:\\S+ )?Window ".r.findAllMatchIn(plan).size
    assert(windows == 1, s"expected ONE rank window, got $windows:\n$plan")
    // the offsets branch's own (dom,_bkt) exchange must sit ABOVE a
    // partial aggregate (ships domains x buckets rows, not the corpus)
    val offsExchanges = plan.linesIterator.zipWithIndex.filter {
      case (l, _) => l.contains("Exchange hashpartitioning") &&
        l.contains("_bkt#") && !l.contains("REPARTITION_BY_COL")
    }.toList
    val lines = plan.linesIterator.toArray
    offsExchanges.foreach { case (_, i) =>
      val below = lines.slice(i + 1, i + 3).mkString("\n")
      assert(below.contains("HashAggregate"),
        s"(dom,_bkt) exchange at line $i is not post-partial-agg:\n$plan")
    }
  }
}
