package graft

import org.apache.spark.sql.functions._

import graft.ext.{GraphOps, Hll, Sampling}

/** Round-9 continuation operators: synchronous label propagation,
  * group-aware splitting, Neyman allocation, and the portable HLL
  * register sketch — each against an in-test reference
  * implementation plus its structural guarantees. */
class Round9bSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------- label propagation

  /** Reference synchronous LPA: most-frequent neighbor label, ties to
    * the smallest label — the exact determinization the operator
    * documents. */
  private def lpaRef(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
    val neigh = sym.groupBy(_._2).map { case (n, es) => n -> es.map(_._1) }
    var lab = neigh.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = neigh.map { case (n, ms) =>
        val votes = ms.map(lab).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation matches the synchronous min-tie-break " +
      "reference on an irregular graph (duplicate + reversed edges)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),          // triangle
      (3, 4),                          // pendant off the triangle
      (10, 11), (11, 12), (12, 10), (10, 12), // triangle w/ dup edge
      (12, 11),                        // reversed duplicate
      (20, 21),                        // isolated pair
      (5, 5))                          // self-loop: dropped
    val got = GraphOps.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lpaRef(edges, rounds = 3))
  }

  test("labelPropagation: two disjoint cliques collapse to their min " +
      "ids with correct community sizes") {
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(50L, 51L, 52L))
    val rows = GraphOps.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // in a clique every node sees the same vote multiset after round 1
    // minus its own absence; min-tie-break lands everyone on the min id
    assert(rows.filter(_._1 < 10).forall(r => r._2 == 1L && r._3 == 4L))
    assert(rows.filter(_._1 >= 50).forall(r => r._2 == 50L && r._3 == 3L))
  }

  test("labelPropagation is invariant under input partitioning and " +
      "edge order (the determinization claim)") {
    val edges = (0L until 200L).filter(_ % 40 != 39).map(i => (i, i + 1)) ++
      (0L until 200L).filter(_ % 40 < 38).map(i => (i, i + 2))
    val a = GraphOps.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.labelPropagation(
        new scala.util.Random(7).shuffle(edges).toDF("src", "dst")
          .repartition(7), "src", "dst", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  // ------------------------------------------------------- group split

  test("groupSplit: a group never straddles splits, assignment is " +
      "stable under corpus growth, and all splits are populated") {
    val big = (0L until 4000L).map(i => (i, i / 8)).toDF("id", "g")
    val a = Sampling.groupSplit(big, col("g"), 80, 10)
    val perGroup = a.groupBy("g")
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
    val bySplit = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"))
    // growth stability: the first half's assignment is a strict subset
    val half = Sampling.groupSplit(
        big.filter(col("id") < 2000), col("g"), 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = a.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(half.forall { case (id, sp) => full(id) == sp })
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(big, col("g"), 60, 40)
    }
  }

  // ------------------------------------------------ Neyman allocation

  private def isqrtRef(v: BigInt): Long = {
    if (v <= 0) 0L
    else {
      var x = BigInt(math.sqrt(v.toDouble).toLong + 2)
      while (x * x > v) x -= 1
      x.toLong
    }
  }

  test("neymanQuotas: exact isqrt weights, Hamilton quotas summing to " +
      "the budget, weight floor for zero-variance strata") {
    // stratum a: high variance; b: moderate; c: zero variance
    val rows =
      (0 until 40).map(i => ("a", if (i % 2 == 0) 1L else 99L)) ++
      (0 until 40).map(i => ("b", 10L + (i % 5))) ++
      (0 until 40).map(_ => ("c", 7L))
    val df = rows.toDF("s", "v")
    val q = Sampling.neymanQuotas(df, "s", col("v"), budget = 97L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // reference weights: isqrt(N·Σv² − (Σv)²), floored at 1
    val ref = rows.groupBy(_._1).map { case (s, vs) =>
      val n = BigInt(vs.size)
      val s1 = BigInt(vs.map(_._2).sum)
      val s2 = vs.map(v => BigInt(v._2) * v._2).sum
      s -> math.max(isqrtRef(n * s2 - s1 * s1), 1L)
    }
    assert(q.map { case (s, t) => s -> t._2 } == ref)
    assert(q.values.map(_._3).sum == 97L)
    assert(q("c")._2 == 1L)
    assert(q("a")._2 > q("b")._2)
  }

  test("neymanSample selects exactly min(quota, N) rows per stratum " +
      "in (hash31, id) order") {
    val rows = (0L until 30L).map(i => (i, "x", i % 3)) ++
      (100L until 104L).map(i => (i, "y", 50L))
    val df = rows.toDF("id", "s", "v")
    val quotas = Sampling.neymanQuotas(df, "s", col("v"), budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val sel = Sampling.neymanSample(df, "id", "s", col("v"), budget = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySt = sel.groupBy(_._2).map { case (s, v) => s -> v.size.toLong }
    for ((s, n) <- Seq("x" -> rows.count(_._2 == "x").toLong,
        "y" -> rows.count(_._2 == "y").toLong)) {
      assert(bySt.getOrElse(s, 0L) == math.min(quotas(s), n))
    }
  }

  // --------------------------------------------- prefix-filter join

  test("prefixFilterJaccardPairs == brute-force all-pairs at the " +
      "threshold (zero false negatives) on an adversarial fixture") {
    import graft.ext.Dedup
    // near-threshold pairs, shared-common vs shared-rare shingles,
    // length-skewed docs
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),      // high overlap with 1
      (3L, "a b c d e f x y z w"),      // moderate overlap with 1/2
      (4L, "p q r s t u v w x y"),
      (5L, "p q r s t u v w x y"),      // exact dup of 4
      (6L, "p q r s t zz uu vv ww xx"), // half overlap with 4
      (7L, "m n o"),                    // single shingle
      (8L, "m n o"),                    // dup of 7
      (9L, "completely different words here nothing shared at all ok"))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pf = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
      n = 3, thresholdNum = 3, thresholdDen = 5)
    val brute = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      blockCols = Seq(lit(1)), n = 3, threshold = 0.6)
    assert(pairSet(pf) == pairSet(brute))
    assert(pairSet(pf).contains((4L, 5L)) && pairSet(pf).contains((7L, 8L)))
  }

  test("property: prefix join == brute force on generated corpora " +
      "(6 seeds, small vocab forces near-threshold collisions)") {
    import graft.ext.Dedup
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // 8-word vocabulary + 5..12-word docs: dense shingle collisions,
    // many pairs land NEAR the threshold where pruning bugs would bite
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.listOfN(30, for {
      len <- Gen.chooseNum(5, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    (0 until 6).foreach { i =>
      val docs = docGen(Gen.Parameters.default, Seed(i.toLong)).get
        .zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val pf = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
          n = 3, thresholdNum = 3, thresholdDen = 5)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          blockCols = Seq(lit(1)), n = 3, threshold = 0.6)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pf == brute, s"seed $i diverged")
    }
  }

  // ------------------------------------------------------ HLL sketch

  test("Hll.registerEstimate: duplicate-idempotent, bucket count " +
      "bounded by m, and within the published error band") {
    // portable-hash stand-in: any well-mixed non-negative long works
    val h = (id: Long) => ((id % 2147483648L) * 2654435761L) % 2147483647L
    val uniq = (0L until 5000L).map(i => ("k", h(i * 7 + 1)))
    val dups = uniq ++ uniq ++ uniq.take(1000)
    val est1 = Hll.registerEstimate(
      uniq.toDF("k", "hh"), "k", col("hh")).collect().head
    val est2 = Hll.registerEstimate(
      dups.toDF("k", "hh"), "k", col("hh")).collect().head
    assert(est1.getLong(2) == est2.getLong(2),
      "register max must be duplicate-idempotent")
    assert(est1.getLong(1) <= 64L)
    // m=64 → relative stddev ≈ 1.04/√64 ≈ 13%; allow 3σ
    val est = est1.getLong(2).toDouble
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4,
      s"estimate $est too far from 5000")
    intercept[IllegalArgumentException] {
      Hll.registerEstimate(uniq.toDF("k", "hh"), "k", col("hh"), m = 48)
    }
  }

  test("weighted PageRank: all-ones weights == the unweighted fixed " +
      "point; weight skew shifts mass exactly as hand-derived") {
    val edges = Seq[(Long, Long)]((0, 1), (0, 2), (1, 2), (2, 0))
      .toDF("src", "dst")
    val unw = GraphOps.pageRankFixedPoint(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ones = GraphOps.pageRankFixedPoint(
        edges.withColumn("w", lit(1L)), "src", "dst", iters = 2,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unw == ones)
    // 0 →(w=3)→ 1, 0 →(w=1)→ 2: after one round node 1 receives
    // floor(1e6·0.85·3/4) and node 2 floor(1e6·0.85·1/4)
    val skew = Seq((0L, 1L, 3L), (0L, 2L, 1L)).toDF("src", "dst", "w")
    val r1 = GraphOps.pageRankFixedPoint(skew, "src", "dst", iters = 1,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) == 150000L + 637500L && r1(2L) == 150000L + 212500L)
    assert(r1(0L) == 150000L)
  }

  test("pageRankConvergence deltas match differences of the fixed " +
      "point's per-iter states (the copy-kept-in-sync pin)") {
    val edges = Seq[(Long, Long)]((0, 1), (1, 2), (2, 0), (0, 2),
      (3, 0)).toDF("src", "dst")
    def fp(i: Int): Map[Long, Long] =
      GraphOps.pageRankFixedPoint(edges, "src", "dst", iters = i)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = GraphOps.pageRankConvergence(edges, "src", "dst",
        iters = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val states = Map(0 -> fp(1).keys.map(_ -> 1000000L).toMap,
      1 -> fp(1), 2 -> fp(2), 3 -> fp(3))
    for (i <- 1 to 3) {
      val dm = states(i).map { case (n, r) =>
        math.abs(r - states(i - 1)(n)) }.sum
      val nc = states(i).count { case (n, r) => r != states(i - 1)(n) }
      assert(conv(i) == ((dm, nc.toLong)), s"iter $i diverged")
    }
  }

  // ------------------------------------------------- seed distances

  test("seedDistances matches reference BFS, honors the round bound, " +
      "and omits unreached nodes") {
    val edges = Seq[(Long, Long)](
      (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  // directed path
      (0, 10), (10, 3),                                // shortcut to 3
      (20, 21),                                        // unreachable isle
      (7, 0))                                          // upstream of seed
    val got = GraphOps.seedDistances(edges.toDF("src", "dst"),
        "src", "dst", Seq(0L).toDF("node"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference BFS capped at 4 hops
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var ref = Map(0L -> 0L)
    for (r <- 1L to 4L; (n, d) <- ref.toSeq if d == r - 1;
        m <- adj.getOrElse(n, Seq.empty) if !ref.contains(m))
      ref += (m -> r)
    assert(got == ref)
    assert(!got.contains(20L) && !got.contains(7L) && !got.contains(6L))
    assert(got(3L) == 2L, "shortcut must win over the path distance")
    assert(got.values.max <= 4L)
  }

  test("Hll.registers: window max-merge of per-day fragments equals " +
      "registers over the union (the rolling-window composition)") {
    val rows = (0L until 300L).map(i => (i % 3, i * 37 + 11))
    val df = rows.toDF("day", "uid")
    val perDay = Hll.registers(df, "day", col("uid"))
    val merged = perDay.groupBy(col("bkt"))
      .agg(max(col("reg")).as("reg"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = Hll.registers(
        df.withColumn("k", lit(1L)), "k", col("uid"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(merged == direct)
  }

  // --------------------------------------------- content-defined chunks

  test("cdcChunks: chunks tile the document exactly and a shared " +
      "passage chunks identically despite a shifted prefix") {
    import graft.ext.TextAnalysis
    val shared = ("the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep dark forest tonight") * 3
    val docs = Seq(
      (1L, "AAA" + shared),            // 3-char prefix
      (2L, "completely different lead-in text here: " + shared),
      (3L, "xyz"))                     // shorter than k → one chunk
    val df = docs.toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(df, "text", Seq("doc_id"),
      k = 8, div = 16L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // tiling: per-doc chunk lengths sum to the doc length
    val lens = ch.groupBy(_._1).map { case (id, cs) => id -> cs.map(_._3).sum }
    assert(lens == docs.map(d => d._1 -> d._2.length.toLong).toMap)
    // the sub-k doc is exactly one whole-doc chunk
    assert(ch.count(_._1 == 3L) == 1 && ch.find(_._1 == 3L).get._3 == 3L)
    // content-defined property: doc1 and doc2 share most chunk
    // identities from the shared passage even though its offset
    // differs — fixed-width chunking would share none
    val ids1 = ch.filter(_._1 == 1L).map(c => (c._2, c._3)).toSet
    val ids2 = ch.filter(_._1 == 2L).map(c => (c._2, c._3)).toSet
    val overlap = ids1.intersect(ids2).size.toDouble / ids1.size
    assert(overlap > 0.6, s"shared-passage chunk overlap $overlap too low")
  }

  test("Hll.registerEstimate small-range: linear counting kicks in " +
      "below 2.5m and lands near the exact count") {
    val h = (id: Long) => ((id % 2147483648L) * 2654435761L) % 2147483647L
    val small = (0L until 40L).map(i => ("k", h(i * 131 + 17)))
    val r = Hll.registerEstimate(
      small.toDF("k", "hh"), "k", col("hh")).collect().head
    val est = r.getLong(2).toDouble
    assert(math.abs(est - 40.0) / 40.0 < 0.3,
      s"small-range estimate $est too far from 40")
  }
}
