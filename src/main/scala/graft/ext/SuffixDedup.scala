package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication via suffix-array-style doubling
  * ranks (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better" — the ExactSubstr formulation): find every
  * duplicated token span of length ≥ `spanLen` across the corpus and
  * emit the merged to-remove intervals, keeping one occurrence per
  * duplicated substring.
  *
  * The scale problem this solves: the n-gram formulation
  * (q78/q128's gram ownership) materializes one gram PER POSITION of
  * length n — at the 50-token spans the paper uses, a 50× data
  * blowup before the first shuffle. Doubling ranks get length-L
  * substring EQUALITY with one row per position throughout
  * (Manber–Myers): round k assigns each position an id identifying
  * its 2^k-token substring from the PAIR of round-(k−1) ids at
  * (i, i + 2^{k-1}); after ⌊log₂ L⌋ rounds the classic overlapped
  * key `(id_h(i), id_h(i + L − 2^h))` with 2^h ≤ L < 2^{h+1} covers
  * [i, i+L) with two full blocks, so key equality ⟺ L-substring
  * equality. ⌈log₂ L⌉ rounds replace the L× gram explosion.
  *
  * The id trick: a suffix ARRAY needs ORDER-preserving dense ranks —
  * a global sort per round. Substring EQUALITY only needs
  * equality-preserving ids, and any injective function of the
  * equivalence class works; the cheapest distributed choice is the
  * class REPRESENTATIVE `min (doc, pos)` over the positions sharing
  * the substring — ONE keyed window aggregate per round (exchange on
  * the pair key), no global sort, no distinct + range-partition +
  * offset machinery, no join-back. Measured at sf0.1/L=12 this is
  * 13.3 s → ~4 s against the dense-rank formulation, with the same
  * classes on both engines.
  *
  * Determinism/portability: representatives are min-of-(doc,pos) —
  * pure integer arithmetic, identical in any engine; q188's oracle
  * replays every round with `min(packed) OVER (PARTITION BY id
  * pair)` and derives the identical keeper set.
  *
  * Truncation soundness: positions within 2^k of the document end
  * get the −∞ sentinel as some pair component, so a truncated
  * block's id can never equal a full block's; the span-fits filter
  * (i + L − 1 ≤ doc length) then guarantees both key blocks are
  * full.
  *
  * Scale shape: NO global window and no driver state anywhere — per
  * round one doc-keyed `lead` window and one class-keyed min window;
  * the finale is a class-keyed keeper window and a doc-keyed
  * gaps-and-islands interval merge. Everything shuffles one row per
  * token position. */
object SuffixDedup {

  /** Class-representative id of the rows sharing `keys`: the minimum
    * (doc, pos) struct over the class — injective across classes
    * (the representative is a member), deterministic, portable. */
  private def classRep(idCol: String, keys: Seq[Column]): Column =
    min(struct(col(idCol).as("d"), col("_pos").as("p")))
      .over(Window.partitionBy(keys: _*))

  /** The out-of-document sentinel pair component — below every real
    * (doc ≥ 0, pos ≥ 1) representative. */
  private def sentinel: Column =
    struct(lit(-1L).as("d"), lit(-1).as("p"))

  /** One position row per token: (idCol, _pos 1-based, _tok, _dlen).
    * `_dlen` rides along from the token array's size at explode time —
    * a per-doc window for it would cost a full exchange + sort. */
  private def positions(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("_ts"))
      .select(col(idCol), size(col("_ts")).as("_dlen"),
        posexplode(col("_ts")).as(Seq("_p0", "_tok")))
      .withColumn("_pos", col("_p0") + 1).drop("_p0")

  /** All duplicated length-`spanLen` token positions: (idCol, _pos,
    * keeper_id, keeper_pos) for every position whose span also occurs
    * elsewhere in the corpus, keeper = globally first occurrence
    * (min (doc, pos)) of that exact substring. The building block of
    * [[duplicateSpans]]; exposed for the parity spec vs the n-gram
    * formulation. */
  def duplicatePositions(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int): DataFrame = {
    require(spanLen >= 2, "spanLen >= 2: single tokens are vocabulary")
    val h = 63 - java.lang.Long.numberOfLeadingZeros(spanLen.toLong)
    val half = (1L << h).toInt // 2^h <= spanLen < 2^(h+1)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    var r = positions(docs, textCol, idCol)
      .withColumn("_r", classRep(idCol, Seq(col("_tok"))))
      .select(col(idCol), col("_pos"), col("_dlen"), col("_r"))
    for (k <- 1 to h.toInt) {
      val step = 1 << (k - 1)
      r = r
        .withColumn("_r2",
          coalesce(lead(col("_r"), step).over(byDoc), sentinel))
        .withColumn("_rn", classRep(idCol, Seq(col("_r"), col("_r2"))))
        .select(col(idCol), col("_pos"), col("_dlen"),
          col("_rn").as("_r"))
    }
    val off = spanLen - half
    val keyed = r
      .withColumn("_k2",
        if (off == 0) col("_r")
        else coalesce(lead(col("_r"), off).over(byDoc), sentinel))
      .filter(col("_pos") + (spanLen - 1) <= col("_dlen"))
    val grp = Window.partitionBy(col("_r"), col("_k2"))
    keyed
      .withColumn("_cnt", count(lit(1)).over(grp))
      .withColumn("_keep", min(struct(col(idCol), col("_pos"))).over(grp))
      .filter(col("_cnt") > 1)
      .select(col(idCol), col("_pos"),
        col("_keep").getField(idCol).as("keeper_id"),
        col("_keep").getField("_pos").as("keeper_pos"))
  }

  /** The deduplicated corpus itself: [[duplicateSpans]] APPLIED —
    * every document re-rendered with its to-remove token ranges
    * dropped (canonical single-space join). Token-less docs produce
    * no row (explode semantics, as throughout); a FULLY-covered doc
    * (e.g. an exact duplicate of an earlier doc) disappears — that is
    * whole-document dedup falling out of the span contract. The span
    * explode is bounded by the spans, not the corpus — duplicated
    * ranges are the rare case by construction — and the re-render is
    * one keyed anti-join plus an in-group sort of each document's own
    * tokens (array_sort of the collected (pos, tok) structs — per-doc
    * data, never a global sort). This is the q128 span-removal
    * contract driven by the suffix formulation instead of gram
    * ownership. */
  def stripSpans(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int): DataFrame =
    stripWith(docs, duplicateSpans(docs, textCol, idCol, spanLen),
      textCol, idCol)

  /** [[stripSpans]] reading the span table from the per-session
    * [[FrameMemo]] — the catalog-run path: q188 (the spans) and q189
    * (the spans applied) share one derivation per run instead of
    * re-running the doubling chain. Same result by construction
    * (spec-pinned). */
  def stripSpansMemoized(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int): DataFrame =
    stripWith(docs, duplicateSpansMemoized(docs, textCol, idCol, spanLen),
      textCol, idCol)

  private def stripWith(docs: DataFrame, spans: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val covered = spans
      .select(col(idCol).as("_cid"),
        explode(sequence(col("span_start"), col("span_end")))
          .as("_cpos"))
    val kept = positions(docs, textCol, idCol)
      .join(covered,
        col(idCol) === col("_cid") &&
          col("_pos").cast("long") === col("_cpos"),
        "left_anti")
    kept.groupBy(col(idCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s.getField("_tok")), " ").as("dedup_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** Merged to-remove token intervals per document: every
    * NON-KEEPER duplicated `spanLen`-token span, overlapping-or-
    * adjacent intervals coalesced (gaps-and-islands per doc) —
    * (idCol, span_start, span_end), 1-based inclusive token
    * positions. Remove these and exactly one occurrence of every
    * duplicated substring survives, the Lee et al. ExactSubstr
    * contract. */
  def duplicateSpans(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int): DataFrame =
    spansOf(duplicatePositions(docs, textCol, idCol, spanLen),
      idCol, spanLen)

  /** [[duplicateSpans]] through the per-session [[FrameMemo]]: the
    * span table is derived once per distinct (corpus plan, spanLen)
    * per session and replayed from its checkpoint thereafter — spans
    * are bounded by corpus DUPLICATION, small relative to the corpus
    * by construction, which is exactly [[FrameMemo]]'s storage
    * contract. */
  def duplicateSpansMemoized(docs: DataFrame, textCol: String,
      idCol: String, spanLen: Int): DataFrame =
    FrameMemo.cached(s"suffixSpans:$textCol:$idCol:$spanLen", docs)(
      duplicateSpans(docs, textCol, idCol, spanLen))

  /** Non-keeper duplicate positions → merged per-doc intervals
    * (gaps-and-islands, overlap-or-adjacent coalesced). Shared by the
    * batch entries and [[graft.streaming.SuffixMaintenance]]. */
  private[graft] def spansOf(dups: DataFrame, idCol: String,
      spanLen: Int): DataFrame = {
    val rm = dups
      .filter(!(col(idCol) === col("keeper_id") &&
        col("_pos") === col("keeper_pos")))
      .select(col(idCol), col("_pos").cast("long").as("_s"),
        (col("_pos") + (spanLen - 1)).cast("long").as("_e"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_s"), col("_e"))
    val islands = rm
      .withColumn("_pmax", max(col("_e")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pmax").isNull || col("_s") > col("_pmax") + 1, 1L)
          .otherwise(0L))
      .withColumn("_g", sum(col("_new")).over(byDoc))
    islands.groupBy(col(idCol), col("_g"))
      .agg(min(col("_s")).as("span_start"), max(col("_e")).as("span_end"))
      .drop("_g")
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Incremental ExactSubstr maintenance — the delta-vs-corpus shape
    * of [[Dedup.minHashLshDeltaPairs]] for exact spans: yesterday's
    * corpus is already deduped and its per-round class tables are
    * derivable once (storable, like the MinHash doc index); today's
    * DELTA finds its duplicated `spanLen`-spans against base ∪ delta
    * with per-round work sized by the DELTA — per round, delta
    * positions pair per-doc (delta-local lead), LOOK UP the pair in
    * the base round index (one keyed join against a static table),
    * and only pairs unseen in base form new classes (a delta-keyed
    * window). Base positions are never re-windowed.
    *
    * Id consistency: a delta position whose pair exists in base
    * ADOPTS the base representative, so mixed classes share one id
    * across both sides and the next round's lookup hits; delta-only
    * classes take the delta minimum — representatives are members,
    * so ids stay injective across classes regardless of which side
    * supplied them. The FINAL keeper is the union minimum
    * (`least(base keeper, delta keeper)`), which makes the result
    * bit-identical to a full recompute restricted to delta docs —
    * pinned by spec, including the adversarial case where a delta id
    * sorts BELOW a base id sharing its span (the delta copy becomes
    * the keeper and nothing is emitted for it).
    *
    * Returns delta-doc to-remove intervals only (the base is already
    * deduped — its spans were handled when it was the delta). */
  def duplicateSpansDelta(base: DataFrame, delta: DataFrame,
      textCol: String, idCol: String, spanLen: Int): DataFrame =
    spansOf(duplicatePositionsDelta(base, delta, textCol, idCol,
      spanLen), idCol, spanLen)

  /** Delta duplicate positions against STORED round indexes — the
    * streaming-maintenance entry ([[graft.streaming.SuffixMaintenance]]):
    * `idx0` maps tokens to landed representatives, `idxKs(k-1)` maps
    * round-k pairs, `fin` maps final keys to the landed keeper.
    * Unlike [[duplicatePositionsDelta]] (union-minimum keeper), the
    * LANDED keeper takes precedence regardless of id order —
    * stream-time first-occurrence-wins, the only keeper order a
    * fragment log can honor. Returns (duplicate positions,
    * r0 fragment, per-round fragments, fin fragment): each fragment
    * holds exactly the keys this delta introduced (landed keys are
    * never re-landed, so stored representatives stay stable).
    * Representative structs are (d, p) = (doc id AS LONG, position) —
    * the storable fixed schema. */
  private[graft] def deltaAgainstIndex(delta: DataFrame, textCol: String,
      idCol: String, spanLen: Int, idx0: DataFrame,
      idxKs: Seq[DataFrame], fin: DataFrame)
      : (DataFrame, DataFrame, Seq[DataFrame], DataFrame) = {
    require(spanLen >= 2, "spanLen >= 2: single tokens are vocabulary")
    val h = 63 - java.lang.Long.numberOfLeadingZeros(spanLen.toLong)
    require(idxKs.length == h.toInt,
      s"need $h round indexes for spanLen=$spanLen, got ${idxKs.length}")
    val half = (1L << h).toInt
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    def rep: Column =
      min(struct(col(idCol).cast("long").as("d"), col("_pos").as("p")))
    val withR0 = positions(delta, textCol, idCol)
      .join(idx0, Seq("_tok"), "left")
      .withColumn("_rr",
        coalesce(col("_br"), rep.over(Window.partitionBy(col("_tok")))))
    val frag0 = withR0.filter(col("_br").isNull)
      .select(col("_tok"), col("_rr").as("_br")).distinct()
    var deltaR = withR0.select(col(idCol), col("_pos"), col("_dlen"),
      col("_rr").as("_r"))
    val fragKs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (k <- 1 to h.toInt) {
      val step = 1 << (k - 1)
      val paired = deltaR
        .withColumn("_r2",
          coalesce(lead(col("_r"), step).over(byDoc), sentinel))
        .join(idxKs(k - 1), Seq("_r", "_r2"), "left")
        .withColumn("_rr", coalesce(col("_brn"),
          rep.over(Window.partitionBy(col("_r"), col("_r2")))))
      fragKs += paired.filter(col("_brn").isNull)
        .select(col("_r"), col("_r2"), col("_rr").as("_brn")).distinct()
      deltaR = paired.select(col(idCol), col("_pos"), col("_dlen"),
        col("_rr").as("_r"))
    }
    val off = spanLen - half
    val keyed = deltaR
      .withColumn("_k2",
        if (off == 0) col("_r")
        else coalesce(lead(col("_r"), off).over(byDoc), sentinel))
      .filter(col("_pos") + (spanLen - 1) <= col("_dlen"))
      .join(fin, Seq("_r", "_k2"), "left")
    val grp = Window.partitionBy(col("_r"), col("_k2"))
    val scored = keyed
      .withColumn("_dcnt", count(lit(1)).over(grp))
      .withColumn("_dkeep", rep.over(grp))
    val fragFin = scored.filter(col("_bkeep").isNull)
      .groupBy(col("_r"), col("_k2"))
      .agg(min(col("_dkeep")).as("_bkeep"))
    val dups = scored
      .filter(col("_bkeep").isNotNull || col("_dcnt") > 1)
      .withColumn("_keep", coalesce(col("_bkeep"), col("_dkeep")))
      .select(col(idCol), col("_pos"),
        col("_keep").getField("d").as("keeper_id"),
        col("_keep").getField("p").as("keeper_pos"))
    (dups, frag0, fragKs.toSeq, fragFin)
  }

  /** The delta half of [[duplicateSpansDelta]] before interval
    * merging: (idCol, _pos, keeper_id, keeper_pos) for every delta
    * position whose span occurs elsewhere in base ∪ delta. */
  def duplicatePositionsDelta(base: DataFrame, delta: DataFrame,
      textCol: String, idCol: String, spanLen: Int): DataFrame = {
    require(spanLen >= 2, "spanLen >= 2: single tokens are vocabulary")
    val h = 63 - java.lang.Long.numberOfLeadingZeros(spanLen.toLong)
    val half = (1L << h).toInt
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    // base chain, exactly as duplicatePositions — its (pair → rep)
    // tables are the per-round indexes a daily pipeline would store
    var baseR = positions(base, textCol, idCol)
      .withColumn("_r", classRep(idCol, Seq(col("_tok"))))
    val idx0 = baseR.select(col("_tok"), col("_r").as("_br")).distinct()
    baseR = baseR.select(col(idCol), col("_pos"), col("_dlen"), col("_r"))
    var deltaR = positions(delta, textCol, idCol)
      .join(idx0, Seq("_tok"), "left")
      .withColumn("_r",
        coalesce(col("_br"), classRep(idCol, Seq(col("_tok")))))
      .select(col(idCol), col("_pos"), col("_dlen"), col("_r"))
    for (k <- 1 to h.toInt) {
      val step = 1 << (k - 1)
      val basePaired = baseR
        .withColumn("_r2",
          coalesce(lead(col("_r"), step).over(byDoc), sentinel))
        .withColumn("_rn", classRep(idCol, Seq(col("_r"), col("_r2"))))
      val idxK = basePaired
        .select(col("_r"), col("_r2"), col("_rn").as("_brn")).distinct()
      baseR = basePaired.select(col(idCol), col("_pos"), col("_dlen"),
        col("_rn").as("_r"))
      deltaR = deltaR
        .withColumn("_r2",
          coalesce(lead(col("_r"), step).over(byDoc), sentinel))
        .join(idxK, Seq("_r", "_r2"), "left")
        .withColumn("_rn",
          coalesce(col("_brn"), classRep(idCol, Seq(col("_r"), col("_r2")))))
        .select(col(idCol), col("_pos"), col("_dlen"),
          col("_rn").as("_r"))
    }
    val off = spanLen - half
    def keyed(r: DataFrame): DataFrame = r
      .withColumn("_k2",
        if (off == 0) col("_r")
        else coalesce(lead(col("_r"), off).over(byDoc), sentinel))
      .filter(col("_pos") + (spanLen - 1) <= col("_dlen"))
    // base final-key keepers: the stored summary a delta run joins
    val baseFin = keyed(baseR).groupBy(col("_r"), col("_k2"))
      .agg(min(struct(col(idCol), col("_pos"))).as("_bkeep"))
    val grp = Window.partitionBy(col("_r"), col("_k2"))
    keyed(deltaR)
      .withColumn("_dcnt", count(lit(1)).over(grp))
      .withColumn("_dkeep", min(struct(col(idCol), col("_pos"))).over(grp))
      .join(baseFin, Seq("_r", "_k2"), "left")
      .filter(col("_bkeep").isNotNull || col("_dcnt") > 1)
      .withColumn("_keep",
        when(col("_bkeep").isNotNull,
          least(col("_bkeep"), col("_dkeep")))
          .otherwise(col("_dkeep")))
      .select(col(idCol), col("_pos"),
        col("_keep").getField(idCol).as("keeper_id"),
        col("_keep").getField("_pos").as("keeper_pos"))
  }
}
