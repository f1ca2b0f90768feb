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
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampMicro: Long = 850000L,
      cp: Checkpointer = LocalCheckpoint,
      initRanks: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && dampMicro > 0 && dampMicro < 1000000L)
    // the edge list, node set, and degree table are FROZEN across
    // rounds — cut each once, or every round re-derives the upstream
    // edge plan (for a derived graph that is the full source join)
    // keyed cuts: every consumer joins/aggregates e and outDeg on _src
    // and nodes on _n, so laying the cut out by that key lets the
    // downstream operators inherit the exchange's hash layout instead
    // of inserting their own shuffle per round
    val e = cp.cutShared(edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst")).distinct(), Seq("_src"))
    val nodes = cp.cutShared(e.select(col("_src").as("_n"))
      .unionByName(e.select(col("_dst").as("_n"))).distinct(), Seq("_n"))
    val outDeg = cp.cutShared(
      e.groupBy(col("_src")).agg(count(lit(1)).as("_deg")), Seq("_src"))
    val base = 1000000L - dampMicro
    // warm start: resume power iteration from a stored (node,
    // rank_micro) fixed point — the incremental re-rank path after a
    // graph update, and how a multi-day 10^9-edge rank job restarts
    // without replaying finished rounds. Nodes absent from the warm
    // state enter at the cold 1e6.
    var ranks = cp.cutState(initRanks match {
      case Some(init) => nodes
        .join(init.select(col("node").as("_n"),
          col("rank_micro").as("_ir")), Seq("_n"), "left")
        .select(col("_n"), coalesce(col("_ir"), lit(1000000L)).as("_r"))
      case None => nodes.select(col("_n"), lit(1000000L).as("_r"))
    })
    for (_ <- 1 to iters) {
      // DECIMAL(38,0) intermediates: `_r * damp` overflows Long once a
      // node's rank_micro exceeds ~1.08e13 (hub in-degree ≳ 10^7 at
      // default damping — realistic for popular domains at crawl
      // scale), and non-ANSI Spark would WRAP SILENTLY to wrong ranks
      // while an ANSI replay raises. `div` floors identically, so
      // values are bit-equal wherever Long arithmetic doesn't
      // overflow, and correct where it would. Rank mass itself is
      // bounded by n·1e6, so the Long rank column is exact to ~10^12
      // nodes.
      val contrib = e
        .join(ranks.select(col("_n").as("_src"), col("_r")), "_src")
        .join(outDeg, "_src")
        .select(col("_dst").as("_n"),
          expr(s"(CAST(_r AS DECIMAL(38,0)) * ${dampMicro}L)" +
            s" div (CAST(_deg AS DECIMAL(38,0)) * 1000000L)").as("_c"))
      val next = nodes
        .join(contrib.groupBy(col("_n"))
            .agg(sum(col("_c").cast("decimal(38,0)")).as("_in")),
          Seq("_n"), "left")
        .select(col("_n"),
          (lit(base) + coalesce(col("_in").cast("long"), lit(0L))).as("_r"))
      val old = ranks
      ranks = cp.cutState(next)
      cp.release(old)
    }
    // the final rank cut is materialized (cuts are eager), so the
    // frozen inputs' blocks are dead weight — release them rather than
    // pin them in a long-lived shared session until the ContextCleaner
    // happens to reclaim them
    cp.release(e); cp.release(nodes); cp.release(outDeg)
    ranks.select(col("_n").as("node"), col("_r").as("rank_micro"))
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
}
