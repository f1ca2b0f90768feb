package graft

import org.apache.spark.sql.functions._

import graft.ext.GraphOps

/** Round-9: large-star/small-star connected components and
  * degree-oriented triangle counting — parity against brute-force
  * references computed in-test, plus the structural claims (log-round
  * convergence on a high-diameter path; exactly-once triangle
  * generation; canonical edge handling). */
class GraphAlgSpec extends SparkSpec {

  import spark.implicits._

  private def ccLabels(edges: Seq[(Long, Long)],
      maxIters: Int = 50): Map[Long, Long] =
    GraphOps.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst", maxIters = maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Union-find reference (path-halving), labels = component min. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    for ((a, b) <- edges if a != b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-root by construction: union always hangs larger under smaller
    nodes.map(n => n -> find(n)).toMap
  }

  test("connectedComponents matches union-find on an irregular graph " +
      "(multi-component, duplicate + reversed edges)") {
    val edges = (0L until 60L).map(i => (i, (i * 7 + 3) % 60)) ++
      Seq((100L, 101L), (101L, 100L), (102L, 103L), (103L, 104L),
        (200L, 200L), (104L, 102L)) // dup orientation, cycle, self-loop
    val got = ccLabels(edges)
    val want = ufLabels(edges.filter(e => e._1 != e._2))
    assert(got == want)
    // the self-looped node is edge-isolated and must NOT appear
    assert(!got.contains(200L))
  }

  test("a diameter-400 path converges in star rounds, not diameter " +
      "rounds, and labels collapse to the global min") {
    val edges = (0L until 400L).map(i => (i, i + 1))
    // min-label propagation would need ~400 rounds; star contraction
    // is logarithmic — 15 is generous headroom over log2(401) ≈ 8.6
    val got = ccLabels(edges, maxIters = 15)
    assert(got.size == 401 && got.values.forall(_ == 0L))
  }

  test("connectedComponents raises loudly when maxIters is too small " +
      "instead of shipping a half-contracted labeling") {
    val edges = (0L until 200L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      ccLabels(edges, maxIters = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponentsDelta equals the full recompute over " +
      "base ∪ delta, including merges, untouched components, and " +
      "singletons gaining their first edge") {
    val base = (0L until 30L).map(i => (i, i + 1)) ++ // one 31-chain
      Seq((100L, 101L), (102L, 103L)) ++ // two pairs
      Seq((200L, 200L)) // base singleton via self-loop: no edge
    val stored = GraphOps.connectedComponents(
      base.toDF("src", "dst"), "src", "dst")
    // merge the pairs, attach a brand-new node to the chain
    val delta = Seq((101L, 102L), (31L, 500L))
    val got = GraphOps.connectedComponentsDelta(stored,
        delta.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ufLabels((base ++ delta).filter(e => e._1 != e._2))
    assert(got == want)
  }

  test("the warm start converges where the cold recompute cannot: " +
      "stars + delta merge within a round budget that a long-chain " +
      "cold run exceeds") {
    val base = (0L until 300L).map(i => (i, i + 1)) ++
      (400L until 700L).map(i => (i, i + 1))
    val stored = GraphOps.connectedComponents(
      base.toDF("src", "dst"), "src", "dst")
    val delta = Seq((150L, 550L))
    val budget = 4
    val warm = GraphOps.connectedComponentsDelta(stored,
        delta.toDF("src", "dst"), "src", "dst", maxIters = budget)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm.size == 602 && warm.values.forall(_ == 0L))
    intercept[IllegalStateException] {
      ccLabels(base ++ delta, maxIters = budget)
    }
  }

  test("seed-personalized PageRank: all-seeds degenerates to the " +
      "uniform teleport; seed gating replays exact hand-derived ranks") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L))
      .toDF("src", "dst")
    val allNodes = Seq(0L, 1L, 2L, 3L).toDF("node")
    val uniform = GraphOps.pageRankFixedPoint(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allSeeded = GraphOps.pageRankFixedPoint(edges, "src", "dst",
        seedNodes = Some(allNodes))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(allSeeded == uniform,
      "seeding every node must equal the unpersonalized fixed point")
    // hand-derived: 0→1, seeds={0}; base lands only on 0, node 1
    // receives only decayed trust: r1(1)=850000 (from init 1e6),
    // r2(1)=r3(1)=floor(150000*0.85)=127500; node 0 has no in-edges.
    val chain = Seq((0L, 1L)).toDF("src", "dst")
    val got = GraphOps.pageRankFixedPoint(chain, "src", "dst",
        seedNodes = Some(Seq(0L).toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 150000L, 1L -> 127500L))
  }

  test("property: connectedComponents == union-find on generated " +
      "random graphs (8 seeds, mixed density, isolated-id gaps)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(60, for {
      a <- Gen.chooseNum(0L, 40L)
      b <- Gen.chooseNum(0L, 40L)
    } yield (a * 3, b * 3)) // id gaps: labels are values, not indexes
    (0 until 8).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(i.toLong)).get
        .filter(e => e._1 != e._2)
      assert(ccLabels(edges) == ufLabels(edges), s"seed $i diverged")
    }
  }

  /** Brute-force k-core: peel to fixpoint over an in-memory set. */
  private def bruteCore(edges: Seq[(Long, Long)], k: Int)
      : Map[Long, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var changed = true
    while (changed) {
      val deg = und.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = und.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != und.size
      und = next
    }
    und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  test("kCore matches the brute-force fixpoint; K5 is its own 4-core; " +
      "a tree vanishes entirely at k=2") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 40), (i, (i * 5 + 2) % 40))) ++
      Seq((100L, 101L), (101L, 102L)) // pendant path: peels away
    def run(k: Int) = GraphOps.kCore(edges.toDF("src", "dst"),
        "src", "dst", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) == bruteCore(edges, 2))
    assert(run(3) == bruteCore(edges, 3))
    val k5 = for { a <- 0L until 5L; b <- (a + 1) until 5L } yield (a, b)
    val core4 = GraphOps.kCore(k5.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core4 == (0L until 5L).map(_ -> 4L).toMap)
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    assert(GraphOps.kCore(tree.toDF("src", "dst"), "src", "dst", 2)
      .count() == 0)
  }

  test("kCoreRounds is an exact round count converging from above, " +
      "and kCore raises loudly when a pendant cascade outruns the " +
      "round budget") {
    // a triangle with a 6-node pendant chain: each round peels one
    // chain node; the triangle is the true 2-core
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)) ++
      (10L until 16L).map(i => (i, i + 1)) :+ (16L, 0L)
    def rounds(r: Int): Set[Long] =
      GraphOps.kCoreRounds(edges.toDF("src", "dst"), "src", "dst",
        k = 2, rounds = r).collect().map(_.getLong(0)).toSet
    val r1 = rounds(1); val r3 = rounds(3); val r7 = rounds(7)
    assert(r1.size > r3.size && r3.size > r7.size,
      "each round must peel further down the pendant chain")
    assert(r7 == Set(0L, 1L, 2L), "the triangle is the true 2-core")
    val ex = intercept[IllegalStateException] {
      GraphOps.kCore(edges.toDF("src", "dst"), "src", "dst", k = 2,
        maxRounds = 2)
    }
    assert(ex.getMessage.contains("peel rounds"))
  }

  test("randomWalks: every hop is a real directed edge, walks stop at " +
      "sinks, and a re-run emits the bit-identical corpus") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 0L),
      (2L, 4L)) // node 4 is a sink
    val df = edges.toDF("src", "dst")
    def run() = GraphOps.randomWalks(df, "src", "dst",
        walkLen = 5, walksPerNode = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val a = run()
    assert(a == run(), "the walk corpus must be reproducible")
    // each (start, walk) trace: consecutive steps follow real edges
    val eset = edges.toSet
    val byWalk = a.groupBy(t => (t._1, t._2))
    byWalk.values.foreach { trace =>
      val path = trace.toSeq.sortBy(_._3).map(_._4)
      path.sliding(2).foreach {
        case Seq(u, v) => assert(eset.contains((u, v)),
          s"hop $u->$v is not an edge")
        case _ => ()
      }
      // a trace ends before walkLen only at the sink
      if (path.size < 6) assert(path.last == 4L,
        s"early termination away from the sink: $path")
    }
    // walks starting AT the sink are the start row alone
    assert(byWalk((4L, 0L)).map(_._3) == Set(0L))
  }

  private def triRows(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long)] =
    GraphOps.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  /** O(n³) brute-force triangle reference over the undirected set. */
  private def bruteTri(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    def adj(a: Long, b: Long) =
      und.contains((math.min(a, b), math.max(a, b)))
    val tri = scala.collection.mutable.Map(nodes.map(n => n -> 0L): _*)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if adj(a, b) && adj(b, c) && adj(a, c)
    } { tri(a) += 1; tri(b) += 1; tri(c) += 1 }
    val deg = nodes.map(n =>
      n -> und.count(e => e._1 == n || e._2 == n).toLong).toMap
    nodes.map { n =>
      val (d, t) = (deg(n), tri(n))
      val lcc = if (d < 2) 0L else t * 2000000L / (d * (d - 1))
      n -> ((d, t, lcc))
    }.toMap
  }

  test("triangleCounts matches the O(n³) reference on an irregular " +
      "graph (duplicate orientations and self-loops dropped)") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 40), (i, (i * 5 + 2) % 40))) ++
      Seq((7L, 7L), (1L, 0L), (3L, 3L))
    assert(triRows(edges) == bruteTri(edges))
  }

  test("triangleCounts structural anchors: a star has zero triangles; " +
      "K5 is fully clustered (lcc_micro = 1e6 everywhere)") {
    val star = (1L to 8L).map(i => (0L, i))
    assert(triRows(star).values.forall { case (_, t, l) => t == 0 && l == 0 })
    val k5 = for {
      a <- 0L until 5L; b <- (a + 1) until 5L
    } yield (a, b)
    val got = triRows(k5)
    assert(got.size == 5 &&
      got.values.forall { case (d, t, l) => d == 4 && t == 6 && l == 1000000L })
  }
}
