package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality for corpus curation. Crawl-scale pipelines weight
  * documents by the authority of their source (CommonCrawl publishes
  * harmonic/PageRank centrality per domain and CCNet-descendant
  * recipes sample by it) — this is that signal, computed inside the
  * engine so the weighting joins the curation chain without an
  * external graph system. */
object GraphOps {

  /** Deterministic fixed-point PageRank: `iters` power-iteration
    * rounds over an integer-keyed edge list, every quantity an exact
    * Long in micro-units (1.0 ≡ 1 000 000) — rank updates are
    * r'(v) = (1e6 − damp) + Σ_{u→v} floor(r(u)·damp / (deg(u)·1e6)),
    * so the whole trajectory is order-independent and an external
    * engine replays the exact ranks (q145); float PageRank would
    * diverge across engines in the last ulp and break hashing.
    * Multiply/divide intermediates ride DECIMAL(38,0), so hub ranks
    * past the Long product bound (~1.08e13 micro at default damping)
    * stay exact instead of silently wrapping; the Long rank column
    * itself is exact while total rank mass n·1e6 fits, i.e. to ~10^12
    * nodes. Dangling-node mass is dropped (the standard
    * simplification), identically on both sides. Returns
    * (node, rank_micro).
    *
    * Scale shape per round: one keyed join of the rank state onto the
    * edge list (both hash-partitioned on the source key — at 10^9
    * edges pre-bucket both by src and the join is shuffle-free), one
    * map-side-combinable sum per destination, one left join back to
    * the node set. State between rounds is the node-cardinality rank
    * table, cut per round with the [[Checkpointer]] discipline
    * ([[ReliableCheckpoint]] for long jobs) so round k never replays
    * rounds 1..k−1; superseded cuts are released eagerly. */
  /** `seedNodes` (a `node` column) switches the teleport term to the
    * TrustRank shape (Gyöngyi et al. 2004): the per-round base mass
    * `1e6 − damp` lands ONLY on seed nodes; everything else receives
    * rank exclusively through links, so trust decays with link
    * distance from the seed set — the spam-demotion variant of the
    * same fixed point (q197). Initial state is unchanged (cold 1e6
    * everywhere unless `initRanks`), so the trajectory stays exactly
    * replayable round by round. */
  /** `weightCol` switches to weighted PageRank: contribution along an
    * edge is proportional to its positive integer weight over the
    * source's total out-weight (link multiplicity, click counts, …).
    * Duplicate (src, dst) rows sum their weights; `None` is exactly
    * the unweighted fixed point (all-ones weights make the formulas
    * identical term for term, so every existing oracle replays
    * unchanged). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampMicro: Long = 850000L,
      cp: Checkpointer = LocalCheckpoint,
      initRanks: Option[DataFrame] = None,
      seedNodes: Option[DataFrame] = None,
      weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1 && dampMicro > 0 && dampMicro < 1000000L)
    // the edge list, node set, and degree table are FROZEN across
    // rounds — cut each once, or every round re-derives the upstream
    // edge plan (for a derived graph that is the full source join)
    // keyed cuts: every consumer joins/aggregates e and outDeg on _src
    // and nodes on _n, so laying the cut out by that key lets the
    // downstream operators inherit the exchange's hash layout instead
    // of inserting their own shuffle per round
    val e = cp.cutShared(rankEdges(edges, srcCol, dstCol, weightCol),
      Seq("_src"))
    val bare = e.select(col("_src").as("_n"))
      .unionByName(e.select(col("_dst").as("_n"))).distinct()
    val base = 1000000L - dampMicro
    // the node table carries its own per-node teleport mass: the
    // uniform base, or — TrustRank — base at seeds and 0 elsewhere
    // (one seed join at setup, zero per-round cost)
    val nodes = cp.cutShared(seedNodes match {
      case Some(sd) => bare
        .join(sd.select(col("node").cast("long").as("_n"))
          .distinct().withColumn("_isSeed", lit(1)), Seq("_n"), "left")
        .select(col("_n"),
          when(col("_isSeed").isNotNull, lit(base)).otherwise(lit(0L))
            .as("_base"))
      case None => bare.select(col("_n"), lit(base).as("_base"))
    }, Seq("_n"))
    val outDeg = cp.cutShared(
      e.groupBy(col("_src")).agg(sum(col("_w")).as("_deg")), Seq("_src"))
    // warm start: resume power iteration from a stored (node,
    // rank_micro) fixed point — the incremental re-rank path after a
    // graph update, and how a multi-day 10^9-edge rank job restarts
    // without replaying finished rounds. Nodes absent from the warm
    // state enter at the cold 1e6. The INITIAL state stays LAZY (no
    // cutState): it is a projection (or one join) over already-cut
    // inputs with a single consumer — round 1 derives it for pennies,
    // and the cut would be one more action per query for nothing.
    var ranks = initRanks match {
      case Some(init) => nodes
        .join(init.select(col("node").as("_n"),
          col("rank_micro").as("_ir")), Seq("_n"), "left")
        .select(col("_n"), coalesce(col("_ir"), lit(1000000L)).as("_r"))
      case None => nodes.select(col("_n"), lit(1000000L).as("_r"))
    }
    var cutRanks: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val next = rankRound(e, outDeg, nodes, ranks, dampMicro)
      val old = cutRanks
      ranks = cp.cutState(next)
      cutRanks = Some(ranks)
      old.foreach(cp.release)
    }
    // the final rank cut is materialized (cuts are eager), so the
    // frozen inputs' blocks are dead weight — release them rather than
    // pin them in a long-lived shared session until the ContextCleaner
    // happens to reclaim them
    cp.release(e); cp.release(nodes); cp.release(outDeg)
    ranks.select(col("_n").as("node"), col("_r").as("rank_micro"))
  }

  /** Weighted-or-unit edge canonicalization shared by the rank
    * family: (src, dst) deduped with `_w` = summed positive weight
    * (weighted) or the constant 1 (unweighted) — `None` makes the
    * weighted round formula identical term for term to the classic
    * one, so every unweighted oracle replays unchanged. */
  private def rankEdges(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: Option[String]): DataFrame =
    // layout note: every round joins and aggregates this table on
    // _src — the _src-keyed layout itself is cutShared's job (the
    // keyed checkpoint declares HashPartitioning on the cut, see
    // LocalCheckpoint.cutShared), so the dedup here stays the plain
    // shape and pays no extra exchange of its own
    weightCol match {
      case Some(w) => edges.select(col(srcCol).cast("long").as("_src"),
          col(dstCol).cast("long").as("_dst"),
          col(w).cast("long").as("_w"))
        .filter(col("_w") > 0)
        .groupBy(col("_src"), col("_dst")).agg(sum(col("_w")).as("_w"))
      case None => edges.select(col(srcCol).cast("long").as("_src"),
          col(dstCol).cast("long").as("_dst")).distinct()
        .withColumn("_w", lit(1L))
    }

  /** ONE power-iteration round, shared verbatim by
    * [[pageRankFixedPoint]] and [[pageRankConvergence]] so the two
    * cannot drift (the Round9bSpec parity pin now guards a single
    * code path). DECIMAL(38,0) intermediates: `_r * damp` overflows
    * Long once a node's rank_micro exceeds ~1.08e13 (hub in-degree
    * ≳ 10^7 at default damping — realistic for popular domains at
    * crawl scale), and non-ANSI Spark would WRAP SILENTLY to wrong
    * ranks while an ANSI replay raises. `div` floors identically, so
    * values are bit-equal wherever Long arithmetic doesn't overflow,
    * and correct where it would. Rank mass itself is bounded by
    * n·1e6, so the Long rank column is exact to ~10^12 nodes.
    * `nodes` carries the per-node teleport `_base` (uniform, or
    * seeds-only for TrustRank). */
  private def rankRound(e: DataFrame, outDeg: DataFrame,
      nodes: DataFrame, ranks: DataFrame, dampMicro: Long): DataFrame = {
    val contrib = e
      .join(ranks.select(col("_n").as("_src"), col("_r")), "_src")
      .join(outDeg, "_src")
      .select(col("_dst").as("_n"),
        expr(s"(CAST(_r AS DECIMAL(38,0)) * ${dampMicro}L * _w)" +
          s" div (CAST(_deg AS DECIMAL(38,0)) * 1000000L)").as("_c"))
    nodes
      .join(contrib.groupBy(col("_n"))
          .agg(sum(col("_c").cast("decimal(38,0)")).as("_in")),
        Seq("_n"), "left")
      .select(col("_n"),
        (col("_base") + coalesce(col("_in").cast("long"), lit(0L)))
          .as("_r"))
  }

  /** Convergence telemetry for the PageRank fixed point: per round,
    * the total |Δrank| mass and the count of nodes that moved — the
    * dashboard that answers "how many iterations does THIS graph
    * need" with a number instead of a convention (the q145 family
    * pins iters=3; this is the evidence panel behind that choice).
    * Runs the IDENTICAL [[rankRound]] body the fixed point runs
    * (shared helper, not a copy), so telemetry covers the weighted
    * variant too: pass `weightCol` to profile q223's weighted rank.
    * Adds one keyed self-join of consecutive rank states per round.
    * Returns (iter, delta_mass_micro, n_changed). */
  def pageRankConvergence(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int = 3, dampMicro: Long = 850000L,
      cp: Checkpointer = LocalCheckpoint,
      weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1 && dampMicro > 0 && dampMicro < 1000000L)
    val e = cp.cutShared(rankEdges(edges, srcCol, dstCol, weightCol),
      Seq("_src"))
    val base = 1000000L - dampMicro
    val nodes = cp.cutShared(e.select(col("_src").as("_n"))
      .unionByName(e.select(col("_dst").as("_n"))).distinct()
      .withColumn("_base", lit(base)), Seq("_n"))
    val outDeg = cp.cutShared(
      e.groupBy(col("_src")).agg(sum(col("_w")).as("_deg")), Seq("_src"))
    // initial state lazy, exactly as the fixed point's (one cheap
    // projection of the nodes cut, single-consumer per round)
    var ranks = nodes.select(col("_n"), lit(1000000L).as("_r"))
    var cutRanks: Option[DataFrame] = None
    val spark = edges.sparkSession
    import spark.implicits._
    var rows = Seq.empty[(Int, Long, Long)]
    for (it <- 1 to iters) {
      // telemetry rides the ROUND'S OWN materialization: the old rank
      // joins in on the same _n the round's node join already
      // clusters by (no extra exchange), and the 1-row |Δ| aggregate
      // is an `observe` metric computed DURING the cut's job —
      // CollectMetrics is exactly-once per action by contract, so
      // this replaces the old per-round join + head() action (one
      // planned job per round instead of two, and no join of two
      // checkpointed states)
      val withOld = rankRound(e, outDeg, nodes, ranks, dampMicro)
        .join(ranks.select(col("_n"), col("_r").as("_old")), Seq("_n"))
      val (next, d, c) =
        if (cp.eager) {
          val obs = new org.apache.spark.sql.Observation()
          val cut = cp.cutState(withOld.observe(obs,
              sum(abs(col("_r") - col("_old"))).as("d"),
              sum(when(col("_r") =!= col("_old"), 1L).otherwise(0L))
                .as("c"))
            .select(col("_n"), col("_r")))
          val m = obs.get
          (cut, m("d").asInstanceOf[Long], m("c").asInstanceOf[Long])
        } else {
          // lazy barrier: the telemetry aggregate IS the round's
          // action, over the same carried-_old round output
          val cut = cp.cutState(withOld)
          val r = cut.agg(sum(abs(col("_r") - col("_old"))).as("d"),
            sum(when(col("_r") =!= col("_old"), 1L).otherwise(0L))
              .as("c")).head()
          (cut.select(col("_n"), col("_r")), r.getLong(0), r.getLong(1))
        }
      rows = rows :+ ((it, d, c))
      cutRanks.foreach(cp.release)
      ranks = next
      cutRanks = Some(next)
    }
    cp.release(e); cp.release(nodes); cp.release(outDeg)
    cutRanks.foreach(cp.release)
    rows.toDF("iter", "delta_mass_micro", "n_changed")
  }

  /** Deterministic fixed-point HITS (Kleinberg 1999): `iters`
    * alternating authority/hub rounds over an integer-keyed edge
    * list — a(v) = Σ_{u→v} h(u), then h(u) = Σ_{u→v} a(v) — with
    * every quantity an exact integer. Classic HITS ℓ²-normalizes
    * each round in floats; this engine instead runs the rounds RAW
    * in DECIMAL(38,0) (no data-dependent scalar mid-round, so each
    * round stays a single-consumer join+agg chain — a mid-round
    * max-rescale would make every round's state a two-consumer
    * subtree that doubles per round under a lineage barrier) and
    * scales ONCE at the end to micro-units of the maximum
    * (top node ≡ 1 000 000) by integral division, so any engine
    * replays the exact scores and the RANKING matches float HITS
    * (positive rescaling is order-preserving; documented deviation:
    * per-round relative magnitudes are not ℓ²-normalized).
    *
    * Exactness bound: raw values grow ≤ d^(2·iters)·1e6 for max
    * degree d — DECIMAL(38,0) holds d ≈ 10^7 (a very popular crawl
    * domain) at the default iters=2. Beyond that a sum overflows to
    * null (non-ANSI Spark) and the final projection raise_errors
    * LOUDLY instead of shipping silently-wrong scores; cap degree or
    * lower iters if it fires.
    *
    * Scale shape: per half-round, one keyed join of the score state
    * onto the edge list plus one map-side-combinable sum — the same
    * shape as [[pageRankFixedPoint]]; the edge list and node set are
    * frozen, cut once, keyed. The final rescale broadcasts a 1-row
    * max aggregate (the repo's scale-scalar idiom); under a lineage
    * barrier the max branch re-derives the last half-round once —
    * bounded, unlike the exponential mid-round alternative. Returns
    * (node, auth_micro, hub_micro). */
  def hitsFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, cp: Checkpointer = LocalCheckpoint,
      initHubs: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = cp.cutShared(edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst")).distinct(), Seq("_src"))
    val nodes = cp.cutShared(e.select(col("_src").as("_n"))
      .unionByName(e.select(col("_dst").as("_n"))).distinct(), Seq("_n"))
    val dec = "decimal(38,0)"
    // warm start: resume the alternating rounds from a stored
    // (node, auth_micro, hub_micro) result — the daily-refresh path
    // after an edge delta. Hub is the carry state (each iteration
    // reads hubs first); HITS is linear in the state, so resuming
    // from the end-rescaled micro-units preserves the RANKING the
    // rounds would have produced from the raw state (positive scaling
    // commutes with E^T/E), it only floors sub-micro precision — the
    // same documented deviation as the end rescale itself. Nodes
    // absent from the warm state enter at the cold 1e6.
    var hub = cp.cutState(initHubs match {
      case Some(init) => nodes
        .join(init.select(col("node").as("_n"),
          col("hub_micro").as("_ih")), Seq("_n"), "left")
        .select(col("_n"),
          coalesce(col("_ih").cast(dec), lit(1000000L).cast(dec))
            .as("_h"))
      case None => nodes.select(col("_n"),
        lit(1000000L).cast(dec).as("_h"))
    })
    var auth = hub // placeholder; iters >= 1 always overwrites
    // a node with NO incoming contributions is legitimately 0; a node
    // WITH contributions whose sum came back null hit decimal
    // overflow — coalescing that to 0 would ship silently-wrong
    // scores, so keep the contribution count and raise loudly
    def fold(state: DataFrame, stateCol: String, joinKey: String,
        groupKey: String, outCol: String): DataFrame =
      nodes.join(
          e.join(state.select(col("_n").as(joinKey), col(stateCol)),
              joinKey)
            .groupBy(col(groupKey))
            .agg(sum(col(stateCol)).as("_s"), count(lit(1)).as("_k")),
          nodes("_n") === col(groupKey), "left")
        .select(col("_n"),
          when(col("_k").isNotNull && col("_s").isNull,
            raise_error(lit("HITS overflow: a DECIMAL(38,0) score sum " +
              "exceeded 38 digits — lower iters or cap max degree")))
            .otherwise(coalesce(col("_s"), lit(0L).cast(dec)))
            .as(outCol))
    for (_ <- 1 to iters) {
      val oldA = auth
      auth = cp.cutState(fold(hub, "_h", "_src", "_dst", "_a"))
      if (!(oldA eq hub)) cp.release(oldA)
      val oldH = hub
      hub = cp.cutState(fold(auth, "_a", "_dst", "_src", "_h"))
      cp.release(oldH)
    }
    val raw = cp.cutShared(
      auth.join(hub, Seq("_n")), Seq("_n"))
    cp.release(e); cp.release(nodes)
    val mx = raw.agg(max(col("_a")).as("_ma"), max(col("_h")).as("_mh"))
    // the ×1e6 rescale can itself overflow 38 digits (raw > 1e32):
    // a null AFTER the division means overflow somewhere in the
    // multiply/divide chain (raw and max are never legitimately null
    // here), so any null result raises rather than ships
    def scaled(v: String, m: String) = {
      val s = expr(
        s"CAST((CAST($v AS DECIMAL(38,0)) * 1000000) div $m AS BIGINT)")
      when(s.isNull,
        raise_error(lit(s"HITS overflow: rescaling $v to micro-units " +
          "exceeded DECIMAL(38,0) — lower iters or cap max degree")))
        .otherwise(s)
    }
    raw.crossJoin(broadcast(mx))
      .select(col("_n").as("node"),
        scaled("_a", "_ma").as("auth_micro"),
        scaled("_h", "_mh").as("hub_micro"))
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al. 2014, "Connected Components in
    * MapReduce and Beyond") — component label = min node id, the
    * keeper rule every dedup-cluster consumer in this engine already
    * uses ([[Dedup.dupClusters]]'s contract). The reason this exists
    * NEXT TO min-label propagation: propagation converges in
    * O(diameter) rounds — a crawl-frontier chain of 10^4 pages is
    * 10^4 joins — while star contraction halves long paths every
    * alternation (O(log² n) worst case, ~log n observed), each round
    * two keyed window-min passes over the CURRENT edge set, which
    * only shrinks as stars collapse.
    *
    * Round anatomy (edges kept canonical big→small, `_a > _b`):
    * large-star symmetrizes and, per center u, hooks every LARGER
    * neighbor to m = min(Γ(u) ∪ {u}); small-star then hooks every
    * smaller-or-equal neighbor (and u itself) to the group min.
    * Both are ONE window-min over the grouping key + a projection —
    * no joins inside a round; convergence is detected by a 1-row
    * (count, xor-of-hashes) aggregate per round (driver state: two
    * longs — the hash is engine-internal loop control only, never
    * output). At the fixed point the edge set IS the component
    * assignment: stars (member → component min).
    *
    * Exact, deterministic, engine-portable output: (node, component)
    * for every node incident to an edge — min-of-ids arithmetic only,
    * so an external engine replays it as reachability min (q191's
    * recursive-CTE oracle). Self-loops are dropped; singleton nodes
    * never appear in the edge list and so (as throughout the dedup
    * family) don't appear in the output — union the node table with
    * label = own id downstream if the closed form is needed.
    *
    * Scale shape: state between rounds is the edge list itself, cut
    * per round ([[Checkpointer]] discipline, superseded cuts
    * released); window partitions are per-node adjacency (bounded by
    * max degree, and star rounds only ever REDUCE a node's degree
    * below its component size); nothing node- or corpus-cardinality
    * ever reaches the driver. */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, cp: Checkpointer = LocalCheckpoint,
      maxIters: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val rawEdges = edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("_a"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("_b"))
      .filter(col("_a") =!= col("_b"))
      .distinct()
    // (count, xor of per-edge hashes): order-independent fingerprint
    // of the edge set for loop control. xor (not sum) so no overflow
    // semantics are in play; a collision would only ever end the loop
    // one round early on a set that agrees in count AND 64-bit xor —
    // and the final state is re-checked by construction below.
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(_a, _b))"), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    // cut + fingerprint in ONE job where the checkpointer is eager:
    // the fingerprint rides the cut's materialization as an observe
    // metric (CollectMetrics, exactly-once per action), so each round
    // plans and runs one job instead of two. A lazy barrier keeps the
    // separate aggregate — its head() IS the round's action there.
    def cutFp(df: DataFrame): (DataFrame, (Long, Long)) =
      if (!cp.eager) {
        val c = cp.cutState(df); (c, fingerprint(c))
      } else {
        val obs = new org.apache.spark.sql.Observation()
        val c = cp.cutState(df.observe(obs, count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(_a, _b))"), lit(0L)).as("h")))
        val m = obs.get
        (c, (m("n").asInstanceOf[Long], m("h").asInstanceOf[Long]))
      }
    var (e, fp) = cutFp(rawEdges)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      // large-star: per center, hook every LARGER neighbor to the min
      // of the closed neighborhood. m <= u < v keeps _a > _b canonical.
      val sym = e.unionByName(
        e.select(col("_b").as("_a"), col("_a").as("_b")))
      // no distinct here: duplicate (v, m) pairs cannot change the
      // small-star window minima below, and small-star's own distinct
      // canonicalizes the round's output — one exchange saved per round
      val ls = sym
        .withColumn("_m", least(
          min(col("_b")).over(Window.partitionBy(col("_a"))), col("_a")))
        .filter(col("_b") > col("_a")) // strictly larger neighbors v
        .select(col("_b").as("_a"), col("_m").as("_b"))
      // small-star: per center u (canonical _a), hook the smaller
      // neighbors AND u itself to the group min c. x > c by minimality.
      val c = min(col("_b")).over(Window.partitionBy(col("_a")))
      val ss = ls
        .withColumn("_c", c)
        .select(explode(array(
            struct(col("_b").as("x"), col("_c").as("ctr")),
            struct(col("_a").as("x"), col("_c").as("ctr")))).as("_e"))
        .select(col("_e.x").as("_a"), col("_e.ctr").as("_b"))
        .filter(col("_a") =!= col("_b"))
        .distinct()
      val old = e
      val (ne, nfp) = cutFp(ss)
      e = ne
      cp.release(old)
      converged = nfp == fp
      fp = nfp
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters star rounds " +
          "— raise maxIters (expected ~log2 of the longest path)")
    // fixed point = stars; a member's single edge points at its
    // component min. min() guards the (never-observed) case of a
    // member with two star edges mid-collision.
    val members = e.groupBy(col("_a").as("node"))
      .agg(min(col("_b")).as("component"))
    val centers = e.select(col("_b").as("node")).distinct()
      .join(members.select(col("node")), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    members.unionByName(centers)
  }

  /** Incremental connected-components maintenance — the delta-vs-
    * stored-state shape of [[Dedup.minHashLshDeltaPairs]] /
    * [[SuffixDedup.duplicateSpansDelta]] for component labels:
    * yesterday's labeling IS a star edge set (member → component
    * min — exactly [[connectedComponents]]' fixed point), so new
    * edges fold in by re-running star contraction over stars ∪ delta.
    * The warm start is already maximally contracted — every old
    * component is depth-1 — so rounds scale with the DELTA's merge
    * structure (typically 2–3), never with the accumulated graph's
    * diameter; the cold recompute at the same `maxIters` fails loudly
    * on a long-chain graph (spec-pinned). Base singletons (label =
    * own id, no star edge) re-enter only if the delta touches them;
    * the rest carry their label through unchanged. Result is
    * bit-identical to a full recompute over base ∪ delta edges
    * (labels are reachability minima — algorithm-independent). */
  def connectedComponentsDelta(baseLabels: DataFrame, deltaEdges: DataFrame,
      srcCol: String, dstCol: String,
      cp: Checkpointer = LocalCheckpoint, maxIters: Int = 50): DataFrame = {
    val stars = baseLabels
      .filter(col("node") =!= col("component"))
      .select(col("node").as("_s"), col("component").as("_d"))
    val merged = connectedComponents(
      stars.unionByName(deltaEdges.select(
        col(srcCol).cast("long").as("_s"),
        col(dstCol).cast("long").as("_d"))),
      "_s", "_d", cp, maxIters)
    val untouched = baseLabels
      .join(merged.select(col("node")), Seq("node"), "left_anti")
    merged.unionByName(untouched.select(col("node"), col("component")))
  }

  /** One k-core peel round: drop every node whose degree in the
    * current subgraph is < k, and every edge touching one. */
  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val deg = e.select(col("_a").as("_n"))
      .unionByName(e.select(col("_b").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    val keep = deg.filter(col("_d") >= k).select(col("_n"))
    e.join(keep.withColumnRenamed("_n", "_a"), Seq("_a"), "left_semi")
      .join(keep.withColumnRenamed("_n", "_b"), Seq("_b"), "left_semi")
      .select(col("_a"), col("_b"))
  }

  private def canonEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("_a"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("_b"))
      .filter(col("_a") =!= col("_b"))
      .distinct()

  private def coreOut(e: DataFrame): DataFrame =
    e.select(col("_a").as("_n"))
      .unionByName(e.select(col("_b").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("core_deg"))
      .select(col("_n").as("node"), col("core_deg"))

  /** Bounded k-core peeling (Seidman 1983 cores; the standard
    * crawl-graph core/periphery signal — link farms sit in deep
    * cores, pendant spam chains peel off immediately): exactly
    * `rounds` rounds of "drop every node with degree < k in the
    * current subgraph", then the survivors with their subgraph
    * degree. An EXACT round count — no early stop — so the state is
    * a pure function of (edges, k, rounds) and an external engine
    * replays round by round (q201); peeling converges monotonically
    * from above, so round-R output ⊇ the true k-core for every R.
    * Per round: one map-combinable degree aggregate + two keyed
    * semi-joins; state is the (shrinking) edge set, cut per round.
    * Returns (node, core_deg). */
  def kCoreRounds(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int, cp: Checkpointer = LocalCheckpoint)
      : DataFrame = {
    require(k >= 1 && rounds >= 1,
      s"need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    var e = cp.cutState(canonEdges(edges, srcCol, dstCol))
    for (_ <- 1 to rounds) {
      val old = e
      e = cp.cutState(peelOnce(e, k))
      cp.release(old)
    }
    coreOut(e)
  }

  /** The true k-core: [[kCoreRounds]] iterated to the fixed point
    * (edge count stable — peeling only ever removes, so count
    * equality IS set equality), with a loud guard at `maxRounds`.
    * Worst-case rounds = the longest peel cascade (a pendant path
    * peels one node per round) — bound it or pre-trim degree-1
    * chains when the graph may contain them. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 100, cp: Checkpointer = LocalCheckpoint)
      : DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    var e = cp.cutState(canonEdges(edges, srcCol, dstCol))
    var n = e.count()
    var stable = false
    var it = 0
    while (!stable && it < maxRounds) {
      it += 1
      val old = e
      e = cp.cutState(peelOnce(e, k))
      cp.release(old)
      val m = e.count()
      stable = m == n
      n = m
    }
    if (!stable)
      throw new IllegalStateException(
        s"kCore did not converge in $maxRounds peel rounds — a pendant " +
          "cascade longer than the budget; raise maxRounds")
    coreOut(e)
  }

  /** Deterministic random-walk corpus (the DeepWalk/node2vec feeder,
    * Perozzi et al. 2014): `walksPerNode` walks of up to `walkLen`
    * steps from every node, the step-k neighbor chosen by a 31-bit
    * multiplicative hash of (current node, walk number, step, seed)
    * mod out-degree — pseudo-random mixing with ZERO rng state, so
    * any engine replays every walk exactly (q200's oracle) and a
    * re-run emits bit-identical corpora (the property a training
    * pipeline needs from its walk generator; true rng would make the
    * walk corpus unreproducible). Walks stop early at sinks (no
    * out-edges) — the standard directed-walk termination.
    *
    * Scale shape: the adjacency table (neighbor index per node via a
    * per-node window — bounded by degree) and the degree table are
    * built once; each step is ONE keyed join of the walk frontier
    * against the adjacency on (node, chosen index). State between
    * steps is the frontier (≤ nodes × walksPerNode rows, shrinking at
    * sinks), cut per step. Emits (start_node, walk_no, step, node) —
    * one row per visited position. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      walkLen: Int, walksPerNode: Int, seed: Long = 7L,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(walkLen >= 1 && walksPerNode >= 1,
      s"need walkLen >= 1 and walksPerNode >= 1, got $walkLen/$walksPerNode")
    val e = edges.select(col(srcCol).cast("long").as("_n"),
      col(dstCol).cast("long").as("_nb")).distinct()
    val adj = cp.cutShared(e
      .withColumn("_idx", row_number().over(
        Window.partitionBy(col("_n")).orderBy(col("_nb"))) - 1)
      .withColumn("_deg", count(lit(1)).over(
        Window.partitionBy(col("_n")))), Seq("_n"))
    val nodes = e.select(col("_n"))
      .unionByName(e.select(col("_nb").as("_n"))).distinct()
    val starts = nodes
      .select(col("_n").as("start_node"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L)))
          .as("walk_no"))
    var frontier = cp.cutState(
      starts.withColumn("_cur", col("start_node")))
    val frames = scala.collection.mutable.ArrayBuffer(
      frontier.withColumn("step", lit(0L))
        .select(col("start_node"), col("walk_no"), col("step"),
          col("_cur").as("node")))
    for (k <- 1 to walkLen) {
      val pick = pmod(
        col("_cur") * lit(2654435761L) +
          col("walk_no") * lit(1000003L) + lit(k * 97L) + lit(seed),
        lit(2147483647L)) % col("_deg")
      val next = frontier
        .join(adj, col("_cur") === col("_n"))
        .filter(col("_idx") === pick)
        .select(col("start_node"), col("walk_no"),
          col("_nb").as("_cur"))
      // every frontier stays referenced by its emitted frame — no
      // release until the union is consumed (unlike the rank loops,
      // whose superseded state truly is dead)
      frontier = cp.cutState(next)
      frames += frontier.withColumn("step", lit(k.toLong))
        .select(col("start_node"), col("walk_no"), col("step"),
          col("_cur").as("node"))
    }
    val out = frames.reduce(_ unionByName _)
    cp.release(adj)
    out
  }

  /** Exact triangle counting with degree orientation (the
    * node-iterator++ / "compact-forward" shape; Suri &
    * Vassilvitskii 2011 give the MapReduce account) — per-node
    * triangle counts and the local clustering coefficient, the
    * standard crawl-graph cohesion panel (link farms score near-
    * clique LCC; isolated syndication hubs score ~0).
    *
    * Why orientation matters at scale: naive wedge generation is
    * Σ deg(v)² — a 10^7-degree hub alone is 10^14 wedges. Orienting
    * every edge from the (degree, id)-SMALLER endpoint to the larger
    * caps out-degree at O(√m), so oriented wedges total O(m^{3/2})
    * worst case — each triangle generated exactly once, at its
    * (degree, id)-minimum apex.
    *
    * Plan: symmetrize+canonicalize once, one degree aggregate, the
    * orientation projection, one self-join on the apex (wedge
    * generation), one keyed join of wedges against oriented edges
    * (closure test), then an explode + keyed count distributes each
    * triangle to its three corners. Integer-exact throughout;
    * lcc_micro = 2·T·1e6 div (deg·(deg−1)) in DECIMAL(38,0)
    * intermediates. Returns (node, degree, n_tri, lcc_micro) for
    * every node with an edge. */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("_a"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("_b"))
      .filter(col("_a") =!= col("_b"))
      .distinct()
    val deg = und.select(col("_a").as("_n"))
      .unionByName(und.select(col("_b").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    // orient from (deg, id)-smaller to larger: struct comparison gives
    // the total order both engines replay
    val withDeg = und
      .join(deg.select(col("_n").as("_a"), col("_d").as("_da")), "_a")
      .join(deg.select(col("_n").as("_b"), col("_d").as("_db")), "_b")
    val oriented = withDeg.select(
      when(struct(col("_da"), col("_a")) < struct(col("_db"), col("_b")),
        struct(col("_a").as("s"), col("_b").as("t")))
        .otherwise(struct(col("_b").as("s"), col("_a").as("t")))
        .as("_e")).select(col("_e.s").as("_s"), col("_e.t").as("_t"))
    // wedges at apex _s: unordered out-neighbor pairs, canonical by id
    val w1 = oriented.select(col("_s"), col("_t").as("_u"))
    val w2 = oriented.select(col("_s"), col("_t").as("_v"))
    val wedges = w1.join(w2, "_s").filter(col("_u") < col("_v"))
    // closure: the third side in EITHER orientation (its own (deg,id)
    // order is independent of the wedge's id order)
    val closing = oriented.select(
        greatest(col("_s"), col("_t")).as("_hi"),
        least(col("_s"), col("_t")).as("_lo"))
    val tris = wedges.join(closing,
      col("_v") === col("_hi") && col("_u") === col("_lo"))
    val perNode = tris.select(explode(
        array(col("_s"), col("_u"), col("_v"))).as("_n"))
      .groupBy(col("_n")).agg(count(lit(1)).as("_t"))
    deg.join(perNode, Seq("_n"), "left")
      .select(col("_n").as("node"), col("_d").as("degree"),
        coalesce(col("_t"), lit(0L)).as("n_tri"),
        when(col("_d") < 2, lit(0L)).otherwise(expr(
          "CAST((CAST(coalesce(_t, 0) AS DECIMAL(38,0)) * 2000000)" +
            " div (_d * (_d - 1)) AS BIGINT)")).as("lcc_micro"))
  }

  /** Bounded-round BFS distances from a seed set (min-plus frontier
    * propagation along edge direction): the hop-distance-from-
    * whitelist feature that complements TrustRank's mass decay (q197)
    * — spam heuristics and crawl schedulers read "how many links from
    * a trusted host" as a number, and at bounded rounds the
    * computation is a pure function of (edges, seeds, rounds), so
    * every round replays in ANSI SQL. Nodes unreached within `rounds`
    * are absent from the output (no sentinel).
    *
    * Scale shape per round: one keyed join of the current distance
    * table onto the edge list (hash-partitioned on the source key)
    * and one map-side-combinable min-agg; state is the reached-node
    * table, cut per round. Returns (node, dist). */
  def seedDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, rounds: Int = 4,
      cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = cp.cutShared(edges.select(
        col(srcCol).cast("long").as("_src"),
        col(dstCol).cast("long").as("_dst"))
      .filter(col("_src") =!= col("_dst"))
      .distinct(), Seq("_src"))
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("_n"))
      .distinct().withColumn("_d", lit(0L))
    for (_ <- 1 to rounds) {
      val step = e
        .join(dist.select(col("_n").as("_src"), col("_d")), Seq("_src"))
        .select(col("_dst").as("_n"), (col("_d") + 1).as("_d"))
      dist = cp.cutState(dist.unionByName(step)
        .groupBy(col("_n")).agg(min(col("_d")).as("_d")))
    }
    dist.select(col("_n").as("node"), col("_d").as("dist"))
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007, Phys. Rev. E 76), determinized for replay: labels start
    * as node ids; each of `rounds` synchronous rounds every node
    * adopts the label that is most frequent among its neighbors'
    * PREVIOUS-round labels, ties broken by the smallest label. (The
    * textbook asynchronous sweep is visit-order-dependent and cannot
    * be hash-checked across engines; the synchronous min-tie-break
    * variant is a pure function of the edge set, so an external engine
    * replays every round exactly.) This is the cheap community signal
    * a crawl-curation pipeline uses to diversify sampling across site
    * clusters when full modularity methods (Louvain) are overkill.
    *
    * Scale shape per round: one keyed join of the label state onto the
    * symmetrized edge list (both hash-partitioned on the neighbor key)
    * and two keyed aggregations — the per-(node,label) vote count
    * combines map-side, and the per-node argmax rides a single
    * max(struct(count, −label)) agg instead of a window, so no sort
    * and no per-node row buffering. State between rounds is the
    * node-cardinality label table, cut with the [[Checkpointer]]
    * discipline so round k never replays rounds 1..k−1.
    * Returns (node, community, csize). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3, cp: Checkpointer = LocalCheckpoint): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges.select(col(srcCol).cast("long").as("_m"),
        col(dstCol).cast("long").as("_n"))
      .filter(col("_m") =!= col("_n"))
    // symmetric closure, deduped: (_m = neighbor, _n = receiver); laid
    // out by _m so each round's label join inherits the hash layout
    val sym = cp.cutShared(und.unionByName(
        und.select(col("_n").as("_m"), col("_m").as("_n")))
      .distinct(), Seq("_m"))
    var labels = sym.select(col("_m").as("_n")).distinct()
      .select(col("_n"), col("_n").as("_lab"))
    for (_ <- 1 to rounds) {
      val voted = sym
        .join(labels.select(col("_n").as("_m"), col("_lab")), Seq("_m"))
        .groupBy(col("_n"), col("_lab")).agg(count(lit(1)).as("_c"))
        // argmax by (count desc, label asc): labels are non-negative
        // node ids, so max over (count, −label) picks it exactly
        .groupBy(col("_n"))
        .agg(max(struct(col("_c"), (-col("_lab")).as("_neg"))).as("_w"))
        .select(col("_n"), (-col("_w._neg")).as("_lab"))
      labels = cp.cutState(voted)
    }
    val sizes = labels.groupBy(col("_lab")).agg(count(lit(1)).as("csize"))
    labels.join(sizes, Seq("_lab"))
      .select(col("_n").as("node"), col("_lab").as("community"),
        col("csize"))
  }
}
