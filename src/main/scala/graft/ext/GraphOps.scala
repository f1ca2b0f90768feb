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
}
