package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data
  * run actually executes, built entirely from the catalog's verified
  * stages so the whole chain stays DuckDB-checkable:
  *
  *   language gate → quality gate → normalized-key dedup → PII scrub
  *   → per-doc stats.
  *
  * Plan shape at 100 TB: the two gates are pushed-down map filters
  * (no shuffle, prune early — they drop the bulk of the corpus before
  * anything pays a network hop); the dedup is the pipeline's ONE
  * shuffle, keyed on the normalized text (hash the key at real scale
  * instead of shipping the full string — same plan, ~16 bytes/row);
  * the scrub and stats are map-side again. Filters-first ordering is
  * load-bearing: dedup shuffle volume is proportional to what
  * survives the gates.
  */
object Curation {

  def curate(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.2): DataFrame = {
    val text = col(textCol)
    val gated = docs
      .filter(TextAnalysis.langIdHeuristic(text).isin("en", "en_like"))
      .filter(TextAnalysis.qualityScore(text) >= minQuality)
    val w = Window.partitionBy(Dedup.normKey(text)).orderBy(col(idCol).asc)
    gated
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol),
        TextAnalysis.tokenCount(text).as("n_tokens"),
        length(regexp_replace(text, "[0-9]+", "<NUM>")).as("clean_chars"))
  }

  /** The CCNet pipeline proper (Wenzek et al., LREC 2020), composed
    * from the verified stages: corpus-global line dedup
    * ([[Dedup.lineDedupGlobal]] — their shard-level duplicate-line
    * removal) → bigram-LM quality scoring of the CLEANED text
    * ([[TextAnalysis.bigramLmScores]] — scoring after dedup matters:
    * boilerplate lines would otherwise dominate the corpus LM counts
    * and score themselves fluent) → per-language head/middle/tail
    * bucketing ([[TextAnalysis.perplexityBuckets]]) → keep head and
    * middle, as the published recipe samples from. Returns
    * (idCol, langCol, bucket) for survivors.
    *
    * Scale shape is the union of its stages' shapes: line dedup's
    * keyed aggregations + one id join, the LM's keyed count
    * aggregations, and the two-phase bucketed rank — no stage adds a
    * window over a raw-corpus partition. The cleaned corpus
    * materializes once behind a repartition barrier (the LM chain
    * consumes it multiple times — bigram, context, vocab passes —
    * and ReuseExchange serves all of them from one map stage); a
    * localCheckpoint here would pin corpus blocks a lazily-returned
    * DataFrame can never release. */
  /** The MAP-ONLY curation kernel: Gopher quality gate
    * ([[TextAnalysis.gopherKeep]]) then PII redaction
    * ([[TextAnalysis.piiRedact]]) — no shuffle, no state, no
    * cross-document dependency, which is exactly what lets ONE
    * definition serve the batch backfill and the live streaming feed
    * ([[graft.streaming.CurationStream]]): a partition of the input
    * produces the corresponding partition of the output, so N
    * micro-batches over a split of the corpus union to the batch
    * run's rows bit-for-bit (spec-pinned). Returns
    * (idCol, clean_text, n_emails, n_ips, n_phones) for survivors. */
  def gateAndRedact(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    TextAnalysis.piiRedact(
      docs.filter(TextAnalysis.gopherKeep(col(textCol))), textCol, idCol)

  def ccnetCurate(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, minDocFreq: Int = 3, headFrac: Double = 0.1,
      midFrac: Double = 0.3): DataFrame = {
    val cleaned = Dedup.lineDedupGlobal(docs, textCol, idCol, minDocFreq)
      .repartition(col(idCol))
    val scored = TextAnalysis.bigramLmScores(cleaned, "clean_text", idCol)
      .join(docs.select(col(idCol).as("_id"), col(langCol)), Seq("_id"))
    TextAnalysis.perplexityBuckets(scored, "_id", langCol,
        "lm_mean_micro", headFrac, midFrac)
      .filter(col("bucket").isin("head", "middle"))
      .select(col("_id").as(idCol), col(langCol), col("bucket"))
  }

  /** [[curate]] fed from raw crawl HTML — [[TextAnalysis.extractText]]
    * (tag strip + line-quality boilerplate removal) runs as stage 0,
    * then the extracted text flows through the verified gate → dedup →
    * stats chain unchanged. The extraction is map-only, so the
    * composed pipeline keeps curate's one-shuffle shape and the gates
    * still prune before any network hop. */
  def curateHtml(docs: DataFrame, htmlCol: String, idCol: String,
      minQuality: Double = 0.2, minLineWords: Int = 3): DataFrame = {
    val extracted = TextAnalysis.extractText(docs, htmlCol, idCol,
        minLineWords)
      .select(col("_id").as(idCol), col("text"))
    curate(extracted, "text", idCol, minQuality)
  }

  /** The full training-prep chain, every stage one of the verified
    * operators: quality/language gates and normalized-key dedup
    * ([[curate]]) → cross-corpus decontamination against the held-out
    * eval split ([[Dedup.crossJaccardPairs]], survivors only — the
    * shingle pass runs on the post-dedup corpus, not the raw one) →
    * token-budget shard assignment ([[graft.ext.Packing.packBudget]]).
    * Composition preserves each stage's 100 TB shape: map gates first,
    * one keyed dedup shuffle, prefix-filtered contamination equi-join,
    * two-phase prefix-sum packing. */
  def trainPrep(docs: DataFrame, textCol: String, idCol: String,
      evalPred: Column, blockCols: Seq[Column], n: Int = 3,
      threshold: Double = 0.6, budget: Long = 1024L,
      minQuality: Double = 0.2): DataFrame = {
    val eval = docs.filter(evalPred)
    val train = docs.filter(!evalPred)
    val curated = curate(train, textCol, idCol, minQuality)
    val survivors = train.join(curated.select(col(idCol)), Seq(idCol))
    val bad = Dedup.crossJaccardPairs(survivors, eval, textCol, idCol,
        blockCols, n, threshold)
      .select(col("left_id").as(idCol)).distinct()
    val clean = curated.join(bad, Seq(idCol), "left_anti")
    graft.ext.Packing.packBudget(clean, idCol, col("n_tokens"), budget)
      .select(col("_id").as(idCol), col("n_tokens"), col("start"),
        col("shard"))
  }

  /** Embedding-driven semantic curation — the cross-modal pipeline
    * step where vector-space dedup decides which TEXTS survive:
    * [[Similarity.semDeDup]] keepers (cosine near-dup exemplars within
    * coarse cells) gate the document corpus, then the quality gate and
    * per-doc stats run on the survivors only.
    *
    * Shapes at 100 TB: semDeDup pays its slim cell-key pair join on
    * the embedding side; the keeper set joins back to the documents as
    * (id, cell) rows — broadcast-able after heavy dedup, an equi-join
    * on the id otherwise; the gate and token stats are map-side on the
    * survivors. Documents without an embedding row are dropped (inner
    * join) — at training scale an unembedded doc has no dedup
    * evidence, so it doesn't enter the curated pool. */
  def semanticCurate(docs: DataFrame, textCol: String, idCol: String,
      embeddings: DataFrame, vecIdCol: String, vecCol: String,
      threshold: Double = 0.4, nCells: Int = 16,
      minQuality: Double = 0.2): DataFrame = {
    val keep = Similarity
      .semDeDup(embeddings, vecIdCol, vecCol, threshold, nCells)
      .filter(col("kept") === 1)
      .select(col("vec_id").as(idCol), col("cell"))
    docs.join(keep, idCol)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol), col("cell"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
  }

  /** Near-dup cluster collapse: given [[Dedup.dupClusters]] labels,
    * keep the best doc per cluster (longest by token count, min id
    * tiebreak) — the "keep one representative" step after clustering.
    * The keeper choice is a bounded per-cluster top-1, not a sort. */
  def clusterKeepers(docs: DataFrame, clusters: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("_ntok"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("_ntok").desc, col("doc_id").asc)
    clusters.join(scored, "doc_id")
      .select(col("cluster_id"), col("doc_id"), col("_ntok"),
        row_number().over(w).as("_rk"),
        count(lit(1)).over(Window.partitionBy(col("cluster_id")))
          .as("n_docs"))
      .filter(col("_rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper_id"),
        col("n_docs"))
  }

  /** The EXACT near-dup drop stage: verified prefix-join pairs
    * ([[Dedup.prefixFilterJaccardPairs]]), drop the larger id of
    * every pair (doc_b — the deterministic min-id-keeper rule the
    * catalog's dedup family uses throughout). The uncapped twin of
    * [[nearDupDropCapped]], exposed so the capped/uncapped E2E
    * containment is a testable surface. */
  def nearDupDrop(in: DataFrame, textCol: String, idCol: String,
      n: Int = 3, thresholdNum: Int = 3,
      thresholdDen: Int = 5): DataFrame = {
    val drops = Dedup.prefixFilterJaccardPairs(in, textCol, idCol, n,
        thresholdNum, thresholdDen)
      .select(col("doc_b").as(idCol)).distinct()
    in.join(drops, Seq(idCol), "left_anti")
  }

  /** The ADVERSARIAL-CORPUS near-dup drop stage: the q233 capped
    * prefix join as an E2E pipeline stage. On a boilerplate-dense
    * corpus the exact join's candidate set grows with pair density
    * (the 25× probe's cost law); an SLA-bound production run caps
    * per-doc verify work at `maxCandidates` and pays in RECALL, not
    * correctness — capped pairs ⊆ uncapped pairs, so every doc the
    * capped stage drops is a true near-dup (uncapped survivors ⊆
    * capped survivors; some dups survive, none are wrongly killed —
    * the right failure direction for a dedup SLA). The price is
    * LOUD: returns (survivors, ledger) where the ledger is the q233
    * per-doc truncation sheet, surfaced in the E2E probe output so
    * an operator sees exactly how much recall the cap spent. */
  def nearDupDropCapped(in: DataFrame, textCol: String, idCol: String,
      n: Int = 3, thresholdNum: Int = 3, thresholdDen: Int = 5,
      maxCandidates: Int = 64): (DataFrame, DataFrame) = {
    val (pairs, ledger) = Dedup.prefixFilterJaccardPairsCapped(in,
      textCol, idCol, n, thresholdNum, thresholdDen, maxCandidates)
    val drops = pairs.select(col("doc_b").as(idCol)).distinct()
    (in.join(drops, Seq(idCol), "left_anti"), ledger)
  }

  /** The round-8 web-curation front end, every stage a verified
    * operator: C4 page cleaning (line rules + page keep,
    * [[TextAnalysis.c4Clean]]) → dominant-script gate on the CLEANED
    * text ([[TextAnalysis.scriptLabel]] = latin) → blocklist gate
    * ([[TextAnalysis.blocklistKeep]]) → corpus-global line-frequency
    * boilerplate removal ([[graft.ext.Dedup.lineDedupGlobal]]) for
    * the template lines c4's static rules can't know about. Returns
    * (idCol, clean_text) for every gate survivor.
    *
    * Scale shape: the three gates are Column expressions fused into
    * ONE map-only select-and-filter — no joins between stages, no
    * shuffle until the line dedup's slim-key doc-frequency agg — so
    * the pipeline prunes maximally before its first exchange, and the
    * corpus text crosses the wire only in the final id-keyed
    * boilerplate join. */
  def webCurate(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], minLineWords: Int = 3, minSentences: Int = 2,
      maxHits: Int = 2, minDocFreq: Int = 3): DataFrame = {
    val gated = TextAnalysis.c4Clean(docs, textCol, idCol,
        minLineWords, minSentences)
      .filter(col("keep"))
      .select(col(idCol), col("clean_text"))
      .filter(TextAnalysis.scriptLabel(col("clean_text")) === "latin")
      .filter(TextAnalysis.blocklistKeep(col("clean_text"), terms,
        maxHits))
    Dedup.lineDedupGlobal(gated, "clean_text", idCol, minDocFreq)
  }
}
