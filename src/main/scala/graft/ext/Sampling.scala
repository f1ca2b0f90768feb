package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — re-weighting a corpus to target domain
  * proportions (the "data mixing" step before pretraining). Given
  * target weights per domain, the sampler computes the largest total
  * the corpus can serve without upsampling (`scale = min_d count_d /
  * w_d` — the binding domain is kept whole) and keeps exactly
  * `floor(w_d * scale)` rows per domain, chosen by a deterministic
  * Knuth-multiplicative hash rank so any engine replays the identical
  * subset. Domains absent from the weight map are dropped.
  *
  * Shapes: the count and quota sides are domain-cardinality-tiny
  * (broadcast); the data side pays one rank window partitioned by
  * (domain, hash-range bucket) — NOT by domain alone, which would
  * serialize a 50-of-100-TB mega-domain into a single task. Bucket
  * boundaries align with the (hash, id) rank order, so per-bucket
  * ranks plus cumulative per-(domain, bucket) counts reconstruct the
  * exact global per-domain rank (the `Packing.epochShuffle` two-phase
  * prefix-sum discipline); the offsets side is domains × nBuckets
  * tiny rows, broadcast back. Exact quotas need that total ordering —
  * for approximate quotas a map-only hash-threshold filter (`h <
  * rate * 2^31`, quota ± binomial noise) is cheaper, as q67 does for
  * fixed rates.
  *
  * A domain present in the weight map but absent from the data simply
  * contributes no rows (the quota join is inner): the other domains'
  * quotas still honor THEIR weights against the feasible scale, so the
  * realized mixture is the target renormalized over present domains.
  */
object Sampling {

  /** 31-bit Knuth hash of a non-negative id — masked before the
    * multiply so products stay in Long (q67's overflow discipline). */
  private def hash31(id: org.apache.spark.sql.Column) =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(2147483647L))

  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double], nBuckets: Int = 256): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0) && nBuckets > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(domainCol, "_wt")
    // keyed barrier: `counts` is referenced twice (scale + quotas), and
    // without a common exchange each reference would re-run the full
    // corpus aggregation — the barrier is domain-cardinality tiny and
    // ReuseExchange serves both consumers from the single write
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_c"))
      .join(broadcast(wdf), domainCol)
      .repartition(col(domainCol))
    val scale = counts.agg(min(col("_c").cast("double") / col("_wt")).as("_scale"))
    val quotas = counts.crossJoin(broadcast(scale))
      .select(col(domainCol), floor(col("_wt") * col("_scale")).as("_keep"))
    quotaSelect(df, idCol, domainCol, quotas, nBuckets)
  }

  /** Authority-weighted domain mixing — the CCNet-style source-quality
    * prior: each domain's target weight is its PageRank mass
    * ([[GraphOps.pageRankFixedPoint]]'s rank_micro over the source
    * graph), so high-authority sources claim proportionally more of
    * the served corpus. Same exact-quota machinery as
    * [[mixtureSample]] (scale = the binding domain kept whole,
    * deterministic Knuth-hash-rank membership, replayable by any
    * engine), but the weight table arrives as a DATAFRAME
    * (`(domainCol, rank_micro)`, domain-cardinality rows, broadcast)
    * instead of a driver-side map — ranks flow straight from the
    * graph job without a collect. Domains with no rank row (sources
    * absent from the graph) are dropped, mirroring mixtureSample's
    * absent-weight semantics. */
  def authorityMixtureSample(df: DataFrame, idCol: String,
      domainCol: String, domainRanks: DataFrame,
      nBuckets: Int = 256): DataFrame = {
    // same double-reference barrier as mixtureSample — and here the
    // broadcast side carries the whole upstream PageRank chain, so an
    // un-deduped re-execution would replay the graph job per consumer
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_c"))
      .join(broadcast(domainRanks.select(col(domainCol),
        col("rank_micro").cast("double").as("_wt"))), domainCol)
      .repartition(col(domainCol))
    val scale = counts
      .agg(min(col("_c").cast("double") / col("_wt")).as("_scale"))
    val quotas = counts.crossJoin(broadcast(scale))
      .select(col(domainCol), floor(col("_wt") * col("_scale")).as("_keep"))
    quotaSelect(df, idCol, domainCol, quotas, nBuckets)
  }

  /** Temperature-scaled domain mixing (the multilingual-pretraining
    * re-balancing knob): target weight w_d ∝ count_d^α flattens the
    * natural distribution toward uniform as α → 0, and the quota
    * machinery then serves the largest total the corpus supports
    * without upsampling. Only α with ENGINE-EXACT arithmetic is
    * accepted — 0.5 (IEEE sqrt, correctly rounded everywhere) and 1.0
    * (identity, keeps all) — because `pow()` differs across libm
    * builds and would break cross-engine replay. */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
      alpha: Double = 0.5, nBuckets: Int = 256): DataFrame = {
    require(alpha == 0.5 || alpha == 1.0,
      "only alpha in {0.5, 1.0} is engine-exact (pow differs across libm)")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_c"))
    // double-reference barrier (scale + quotas), as in mixtureSample
    val weighted = counts.withColumn("_wt",
      if (alpha == 0.5) sqrt(col("_c").cast("double"))
      else col("_c").cast("double"))
      .repartition(col(domainCol))
    val scale = weighted
      .agg(min(col("_c").cast("double") / col("_wt")).as("_scale"))
    val quotas = weighted.crossJoin(broadcast(scale))
      .select(col(domainCol), floor(col("_wt") * col("_scale")).as("_keep"))
    quotaSelect(df, idCol, domainCol, quotas, nBuckets)
  }

  /** Per-domain document cap — the "max B documents per host/cluster"
    * rule every crawl pipeline applies somewhere: every domain keeps
    * at most `cap` rows, chosen by the same deterministic Knuth-hash
    * rank as the mixture samplers, so any engine replays the kept
    * set. Same two-phase (domain, bucket) machinery as
    * [[mixtureSample]] — a 50-of-100-TB mega-domain is capped without
    * ever serializing into one task. */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String,
      cap: Long, nBuckets: Int = 256): DataFrame = {
    require(cap > 0)
    val quotas = df.select(col(domainCol)).distinct()
      .withColumn("_keep", lit(cap))
    quotaSelect(df, idCol, domainCol, quotas, nBuckets)
  }

  /** Deterministic train/val/test assignment by portable hash bucket:
    * split(id) = the cut whose cumulative percentage first exceeds
    * hash31(id) mod 100. Map-only — NO shuffle, no state — and stable
    * under corpus growth: a document's split never changes when rows
    * are added or removed elsewhere (the property random sampling
    * lacks and every training pipeline needs for reproducible
    * held-out sets). `cuts` are (name, percent) and must sum to 100.
    * The Knuth hash replays on any engine, so the oracle checks the
    * exact assignment, not just the proportions. */
  def hashSplit(df: DataFrame, idCol: String,
      cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_._2 > 0)
      && cuts.map(_._2).sum == 100, "cut percentages must sum to 100")
    val bucket = pmod(hash31(col(idCol)), lit(100L))
    val bounds = cuts.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val chain = cuts.tail.zip(bounds.tail).dropRight(1).foldLeft(
      when(bucket < bounds.head, lit(cuts.head._1))) {
        case (acc, ((name, _), b)) => acc.when(bucket < b, lit(name))
      }.otherwise(lit(cuts.last._1))
    df.withColumn("split", chain)
  }

  /** DSIR-style data-selection scores (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"):
    * hashed bag-of-n-grams multinomials of a TARGET subset vs the
    * whole RAW corpus, and a per-doc importance score that ranks how
    * much each raw document "looks like" the target distribution —
    * the selection signal pretraining pipelines use to upweight
    * quality-like text without a trained classifier.
    *
    * The published method scores `log p_t(x) − log p_r(x)` in floats
    * and Gumbel-resamples; this engine keeps the repo's exact-integer
    * discipline instead: each bucket's add-one-smoothed probability
    * RATIO `(ct_b+1)(Tr+dim) / ((cr_b+1)(Tt+dim))` is quantized ONCE
    * to micro-units by integral division (DECIMAL(38,0) intermediates
    * — the BIGINT product overflows beyond ~3e9-gram corpora), and
    * the doc score is the exact Long `Σ_b c_b · ratio_b`, so any
    * engine replays every value bit-for-bit. Ranking by the linear
    * ratio sum weights high-ratio buckets harder than the log-sum
    * would (documented deviation from the paper — same add-one
    * models, integer-replayable score).
    *
    * Features: unigrams + bigrams of whitespace tokens through the
    * portable rolling-poly hash mod `dim` (the q118/q163 chain — the
    * fastText hashing trick, no vocabulary to ship). Token-less docs
    * have no grams and drop (q164's convention).
    *
    * Scale shape: DSIR is inherently two corpus passes — train the
    * bucket models, then score against them — and this is exactly two.
    * The model pass map-side-combines gram occurrences straight into
    * the dim-bounded stats table (≤ dim rows per partition reach its
    * exchange); the grand totals come from a single-partition window
    * over THAT ≤dim-row table, never from a re-aggregation whose
    * lineage would sneak in a third corpus scan (an intermediate
    * per-doc feature table was tried first: its three consumers prune
    * different columns, so ReuseExchange never fires and the corpus
    * was scanned three times). The scoring pass joins the ≤dim-row
    * broadcast ratio table to gram occurrences and folds them with ONE
    * doc-keyed exchange (map-side partial agg) — the corpus itself is
    * never shuffled. */
  def dsirScores(docs: DataFrame, textCol: String, idCol: String,
      isTarget: org.apache.spark.sql.Column, dim: Int = 1024): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = TextAnalysis.tokens(col(textCol))
    val base = docs.select(col(idCol).as("_id"), isTarget.as("_t"),
      toks.as("_w"))
    // sequence(1, n-1) REVERSES for n < 2 (Spark descends when stop <
    // start) — guard empties explicitly
    val bigrams = when(size(col("_w")) < 2,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("_w")) - 1),
        i => concat_ws(" ", element_at(col("_w"), i),
          element_at(col("_w"), i + 1))))
    val grams = base.select(col("_id"), col("_t"),
        explode(graft.functions.VectorFunctions.polyHashAll(
          concat(col("_w"), bigrams))).as("_h"))
      .select(col("_id"), col("_t"),
        pmod(col("_h"), lit(dim.toLong)).as("_f"))
    val stats = grams.groupBy(col("_f"))
      .agg(count(lit(1)).as("_cr"),
        count(when(col("_t"), lit(1))).as("_ct"))
    // totals over the dim-bounded stats table: a single-partition
    // window over ≤ dim rows, NOT over anything corpus-sized
    val w = Window.partitionBy(lit(1))
    val ratio = stats
      .withColumn("_tr", sum(col("_cr")).over(w))
      .withColumn("_tt", sum(col("_ct")).over(w))
      .withColumn("_ratio", expr(
        s"""CAST((CAST(_ct + 1 AS DECIMAL(38,0)) *
           CAST(_tr + $dim AS DECIMAL(38,0)) * 1000000) div
           (CAST(_cr + 1 AS DECIMAL(38,0)) *
            CAST(_tt + $dim AS DECIMAL(38,0))) AS BIGINT)"""))
      .select(col("_f"), col("_ratio"))
    grams.join(broadcast(ratio), Seq("_f"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("_ratio")).as("dsir_score"))
      .select(col("_id").as("doc_id"), col("n_grams"),
        col("dsir_score"),
        expr("dsir_score div n_grams").as("dsir_norm"))
  }

  /** Shared exact-quota selection: keep the `_keep` lowest-hash-rank
    * rows per domain via the two-phase (domain, hash-range bucket)
    * rank — cumulative bucket counts restore the global per-domain
    * rank, so no mega-domain ever serializes into one window task.
    * The slim (id, domain, quota, hash, bucket) rows go through ONE
    * `repartition(domain, _bkt)` exchange — NOT a checkpoint: the
    * samplers are lazily returned by catalog queries, so a cut here
    * could never be released and would pin a corpus-cardinality table
    * for the session's lifetime. The barrier's hash layout IS the
    * rank window's required distribution, so the corpus is shuffled
    * and sorted exactly once; the offsets branch deliberately does
    * NOT share it — column pruning gives it its own 2-column scan
    * whose map-side-combined aggregate ships only domains × nBuckets
    * rows, far cheaper than forcing both branches through one
    * un-pruned subtree. Net corpus cost: two narrow column scans,
    * one shuffle+sort, zero pinned blocks. */
  /** Token-budget mixture sampling — the epoch planner of a
    * pretraining mix: given per-domain mixture weights (micro-units
    * summing to ≤ 1e6) and a total token budget, give each domain the
    * quota budget·w/1e6 TOKENS (not documents) and fill it greedily
    * in the deterministic portable order (Knuth hash of id, tie id):
    * a document is selected iff the token mass of the documents
    * BEFORE it (same domain, hash order) is under quota — each domain
    * overshoots by at most one document and never undershoots while
    * documents remain, and any engine replays the exact pick set.
    * Returns (id, domain, tokens) of the selected documents.
    *
    * Scale shape: the per-domain running token sum runs on
    * (domain, bucket) slices via the [[quotaSelect]] two-phase
    * pattern — a bucket-local cumsum window behind a keyed
    * repartition barrier plus broadcast exclusive bucket-offset sums
    * aggregated map-side BEFORE the barrier — so no mega-domain
    * single-partition window exists at crawl scale; weights, quotas,
    * and offsets are all broadcast scalars/slivers. */
  def tokenBudgetSample(df: DataFrame, idCol: String, domainCol: String,
      tokensCol: String, budgetTokens: Long,
      weightsMicro: Seq[(String, Long)], nBuckets: Int = 64): DataFrame = {
    require(budgetTokens > 0 && nBuckets > 0)
    require(weightsMicro.nonEmpty && weightsMicro.forall(_._2 > 0),
      "weights must be positive micro-units")
    require(weightsMicro.map(_._2).sum <= 1000000L,
      "mixture weights must sum to <= 1e6 micro")
    val spark = df.sparkSession
    import spark.implicits._
    // quota in DECIMAL(38,0): budget × micro-weight overflows Long for
    // budgets above ~9.2e12 tokens (10T+-token epochs are the norm at
    // crawl scale), and a silent wraparound here means negative quotas
    // and an empty selection
    val quotas = weightsMicro.sortBy(_._1).toDF(domainCol, "_wm")
      .withColumn("_quota", expr(
        s"CAST((CAST(${budgetTokens}L AS DECIMAL(38,0)) * _wm) " +
          "div 1000000 AS BIGINT)"))
      .select(col(domainCol), col("_quota"))
    val span = (1L << 31) / nBuckets + 1L
    val pre = df.select(col(idCol), col(domainCol),
        col(tokensCol).cast("long").as("_tok"))
      .join(broadcast(quotas), domainCol)
      .withColumn("_h", hash31(col(idCol)))
      .withColumn("_bkt", expr(s"_h div ${span}L"))
    // barrier serves only the cumsum branch; the offsets branch
    // aggregates PRE-barrier rows so its partial agg combines
    // map-side (the quotaSelect discipline)
    val base = pre.repartition(col(domainCol), col("_bkt"))
    val local = base.withColumn("_ct", sum(col("_tok")).over(
      Window.partitionBy(col(domainCol), col("_bkt"))
        .orderBy(col("_h"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = pre.groupBy(col(domainCol), col("_bkt"))
      .agg(sum(col("_tok")).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.partitionBy(col(domainCol))
          .orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(domainCol), col("_bkt"), col("_off"))
    local.join(broadcast(offs), Seq(domainCol, "_bkt"))
      .filter(col("_off") + col("_ct") - col("_tok") < col("_quota"))
      .select(col(idCol), col(domainCol), col("_tok").as(tokensCol))
  }

  /** Neyman-allocation stratified sampling (Neyman 1934): split a
    * fixed labeling/eval budget across strata proportionally to
    * N_s·σ_s — high-variance strata get more of the budget, uniform
    * strata less, which minimizes the variance of the stratified
    * estimator. This is the principled way to spend a fixed
    * human-annotation budget over a heterogeneous corpus (the
    * quality-audit sampling step of a curation pipeline), vs the
    * proportional allocation q67 runs.
    *
    * Exact-integer discipline: N_s·σ_s = √(N_s·Σx² − (Σx)²), computed
    * as an integer square root — a float sqrt seeds the value and a
    * ±1 DECIMAL-compared correction makes it exact, so an engine with
    * a different sqrt ulp replays identically. The ±1 seed guarantee
    * holds only while the radicand stays below 2^104 (the double
    * mantissa bound; past it the seed can drift further, the BIGINT
    * seed itself can overflow near 1e38, and (y0+1)² can overflow
    * DECIMAL(38,0) to null so the CASE would silently mis-branch
    * under non-ANSI Spark) — so the radicand is GUARDED: any stratum
    * with n·Σx² − (Σx)² ≥ 2^104 raises loudly instead of shipping a
    * wrong weight. Token/length/count-scale valueCols sit ~15 orders
    * of magnitude under the bound; hitting it means the valueCol is
    * the wrong magnitude for exact Neyman arithmetic. Zero-variance
    * strata keep a weight floor of 1 (they stay sampleable; W stays
    * > 0).
    * Budget apportionment is largest-remainder (Hamilton): exact
    * DECIMAL base quotas + the leftover distributed by (remainder
    * desc, stratum asc). Selection inside each stratum is the
    * [[quotaSelect]] two-phase bucketed rank over (hash31(id), id)
    * order — no mega-stratum window at scale.
    *
    * Scale shape: one map-side-combinable moment agg (3 Longs per
    * stratum), driver-free DECIMAL quota arithmetic on the
    * strata-cardinality table (its two windows run over that bounded
    * frame, like q193's bucket table), then the bucketed selection.
    * Returns per-stratum (stratum, n_rows, weight, quota). */
  def neymanQuotas(df: DataFrame, strataCol: String, valueCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val d = valueCol.cast("decimal(19,0)")
    val m = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("n_rows"),
      sum(d).cast("decimal(38,0)").as("_s1"),
      sum(d * d).cast("decimal(38,0)").as("_s2"))
    // 2^104: the radicand bound under which the double-sqrt seed is
    // provably within ±1 of the true root and every square below
    // fits DECIMAL(38,0) — see the scaladoc guard discussion
    val maxV = BigDecimal("20282409603651670423947251286016")
    val withW = m
      .withColumn("_vraw", expr(
        "CAST(n_rows AS DECIMAL(38,0)) * _s2 - _s1 * _s1"))
      .withColumn("_v", when(col("_vraw") < lit(maxV), col("_vraw"))
        .otherwise(raise_error(lit("neymanQuotas: stratum radicand " +
          "n*sum(x^2) - sum(x)^2 >= 2^104 — exact isqrt guarantee " +
          "void; rescale valueCol"))))
      .withColumn("_y0", expr(
        "CAST(floor(sqrt(CAST(_v AS DOUBLE))) AS BIGINT)"))
      // exact isqrt: the float seed is within ±1 of the true root for
      // any _v below the guarded 2^104 bound; compare squares in
      // DECIMAL so no Long overflow and no ulp dependence survives
      .withColumn("_isq", expr(
        """CASE
          WHEN CAST(_y0 + 1 AS DECIMAL(38,0)) * (_y0 + 1) <= _v THEN _y0 + 1
          WHEN CAST(_y0 AS DECIMAL(38,0)) * _y0 <= _v THEN _y0
          ELSE _y0 - 1 END"""))
      .withColumn("weight", greatest(col("_isq"), lit(1L)))
    // quota arithmetic over the strata-cardinality frame: these
    // windows run over #strata rows (bounded dashboard state), not
    // corpus rows — the same justified-unpartitioned-window shape as
    // q193's bucket table
    val wTot = Window.partitionBy()
    val apportioned = withW
      .withColumn("_W", sum(col("weight")).over(wTot))
      .withColumn("_prod", expr(
        s"CAST(${budget}L AS DECIMAL(38,0)) * weight"))
      .withColumn("_base", expr("CAST(_prod div _W AS BIGINT)"))
      .withColumn("_rem", expr("CAST(_prod % _W AS BIGINT)"))
      .withColumn("_left", lit(budget) - sum(col("_base")).over(wTot))
      .withColumn("_rn", row_number().over(
        wTot.orderBy(col("_rem").desc, col(strataCol))))
      .withColumn("quota",
        col("_base") + when(col("_rn") <= col("_left"), 1L).otherwise(0L))
    apportioned.select(col(strataCol), col("n_rows"), col("weight"),
      col("quota"))
  }

  /** [[neymanQuotas]] + per-stratum selection of the first `quota`
    * rows in (hash31(id), id) order via the bucketed [[quotaSelect]].
    * Returns the selected (idCol, strataCol) rows. */
  def neymanSample(df: DataFrame, idCol: String, strataCol: String,
      valueCol: Column, budget: Long, nBuckets: Int = 64): DataFrame = {
    val q = neymanQuotas(df, strataCol, valueCol, budget)
      .select(col(strataCol), col("quota").as("_keep"))
    quotaSelect(df, idCol, strataCol, q, nBuckets)
  }

  private def quotaSelect(df: DataFrame, idCol: String, domainCol: String,
      quotas: DataFrame, nBuckets: Int): DataFrame = {
    val span = (1L << 31) / nBuckets + 1L
    val pre = df.select(col(idCol), col(domainCol))
      .join(broadcast(quotas), domainCol)
      .withColumn("_h", hash31(col(idCol)))
      .withColumn("_bkt", expr(s"_h div ${span}L"))
    // the barrier serves ONLY the window branch; the offsets branch
    // aggregates the PRE-barrier rows so its partial (map-side) agg
    // combines before any exchange — behind the barrier it would ship
    // every corpus row through a second shuffle just to count them
    val base = pre.repartition(col(domainCol), col("_bkt"))
    val local = base.withColumn("_rn", row_number().over(
      Window.partitionBy(col(domainCol), col("_bkt"))
        .orderBy(col("_h"), col(idCol))))
    val offs = pre.groupBy(col(domainCol), col("_bkt"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.partitionBy(col(domainCol))
          .orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(domainCol), col("_bkt"), col("_off"))
    local.join(broadcast(offs), Seq(domainCol, "_bkt"))
      .filter(col("_off") + col("_rn") <= col("_keep"))
      .select(col(idCol), col(domainCol))
  }

  /** Group-aware train/valid/test assignment: every row whose GROUP
    * key (site, host, author, conversation) hashes into the same
    * bucket lands in the same split, so no group straddles the
    * train/eval boundary — the standard defense against the
    * contamination mode q166's near-dup dashboard detects after the
    * fact (near-identical pages from one host split across train and
    * test). Row-hash splitting (q130) cannot give this guarantee;
    * group-hash splitting gives it by construction.
    *
    * Map-only — the assignment is a pure 31-bit Knuth hash of the
    * group key, no shuffle, no state, stable under corpus growth
    * (adding documents never moves an existing host's split, exactly
    * like q130's bucket discipline but at group granularity).
    * `trainPct`/`validPct` are integer percents; the remainder is
    * test. Adds a `split` column. */
  def groupSplit(df: DataFrame, groupCol: Column,
      trainPct: Int, validPct: Int): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"percents must partition 100, got train=$trainPct valid=$validPct")
    val b = pmod(hash31(groupCol), lit(100L))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + validPct, lit("valid"))
        .otherwise(lit("test")))
  }
}
