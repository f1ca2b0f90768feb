package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._

/** Round-7: authority-weighted sampling (PageRank mass as the mixture
  * prior) and its quota arithmetic. */
class Ext7Spec extends SparkSpec {

  test("authority mixture sample honors rank-proportional quotas " +
      "exactly, binding domain kept whole") {
    import spark.implicits._
    // 12 docs of A, 4 of B; ranks 3e6 vs 1e6 → weights 3:1. Scale =
    // min(12/3e6, 4/1e6) = 4e-6 → quotas floor(3e6·4e-6)=12,
    // floor(1e6·4e-6)=4: A is binding and kept whole here; shrink B's
    // rank to 5e5 → scale = min(4e-6, 8e-6) = 4e-6 → B quota 2.
    val docs = ((1 to 12).map(i => (i.toLong, "A")) ++
      (13 to 16).map(i => (i.toLong, "B"))).toDF("id", "dom")
    val ranks = Seq(("A", 3000000L), ("B", 1000000L))
      .toDF("dom", "rank_micro")
    val kept = Sampling.authorityMixtureSample(docs, "id", "dom", ranks)
      .collect().map(r => r.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(kept == Map("A" -> 12, "B" -> 4))
    val ranks2 = Seq(("A", 3000000L), ("B", 500000L))
      .toDF("dom", "rank_micro")
    val kept2 = Sampling.authorityMixtureSample(docs, "id", "dom", ranks2)
      .collect().map(r => r.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(kept2 == Map("A" -> 12, "B" -> 2))
  }

  test("authority mixture sample drops domains without a rank row and " +
      "picks the deterministic hash-rank subset") {
    import spark.implicits._
    val docs = ((1 to 6).map(i => (i.toLong, "A")) ++
      (7 to 9).map(i => (i.toLong, "C"))).toDF("id", "dom")
    val ranks = Seq(("A", 2000000L), ("B", 1000000L))
      .toDF("dom", "rank_micro")
    val kept = Sampling.authorityMixtureSample(docs, "id", "dom", ranks)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // C has no rank row → dropped entirely; A binds (6/2e6) → keeps
    // all 6. Same membership mixtureSample(Map("A"->2.0)) would pick.
    val viaMap = Sampling.mixtureSample(docs, "id", "dom",
        Map("A" -> 2.0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == viaMap)
    assert(kept.map(_._2) == Set("A") && kept.size == 6)
  }
}
